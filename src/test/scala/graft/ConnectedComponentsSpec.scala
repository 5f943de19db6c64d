package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation: convergence past diameter 2 (chains/rings, where
  * one round is not enough), disjoint components, and determinism.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain of 8 converges to the min id (diameter 7 > one round)") {
    val chain = (10L until 17L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got === (10L to 17L).map(_ -> 10L).toMap)
  }

  test("two disjoint rings stay separate") {
    val ringA = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val ringB = Seq((7L, 8L), (8L, 9L), (9L, 7L))
    val got = cc(ringA ++ ringB)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("isolated pair + star") {
    val got = cc(Seq((100L, 5L), (5L, 50L), (5L, 6L), (200L, 300L)))
    assert(got(100L) === 5L && got(50L) === 5L && got(6L) === 5L && got(5L) === 5L)
    assert(got(200L) === 200L && got(300L) === 200L)
  }

  test("refuses to return unconverged labels (chain longer than maxIter)") {
    import spark.implicits._
    val longChain = (0L until 10L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(longChain.toDF("a", "b"), maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("deterministic across runs") {
    val edges = Seq((3L, 9L), (9L, 4L), (1L, 2L), (4L, 12L))
    assert(cc(edges) === cc(edges))
  }
}
