package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star contraction: convergence on chains and rings
  * (including chains far beyond any per-round diameter bound), disjoint
  * components, determinism, and union-find equivalence on random graphs.
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

  test("path graph of length 200 converges in O(log n) rounds (default maxIter)") {
    // the O(diameter) propagation loop threw here; large-star/small-star
    // needs ~6 rounds
    val path = (0L until 200L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got === (0L to 200L).map(_ -> 0L).toMap)
  }

  test("refuses to return unconverged labels (maxIter below the log bound)") {
    import spark.implicits._
    val longChain = (0L until 200L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(longChain.toDF("a", "b"), maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("self-loop-only vertex is a singleton component") {
    val got = cc(Seq((42L, 42L), (1L, 2L)))
    assert(got === Map(42L -> 42L, 1L -> 1L, 2L -> 1L))
  }

  test("equivalent to union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      // reference: driver-side union-find with min-id canonicalization
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      assert(cc(edges) === expected)
    }
  }

  test("deterministic across runs") {
    val edges = Seq((3L, 9L), (9L, 4L), (1L, 2L), (4L, 12L))
    assert(cc(edges) === cc(edges))
  }
}
