package graft
// (SpatialJoinRuleSpec below exercises the automatic routing added in r3)

import graft.operators.SpatialJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §4.3 grid join: must produce EXACTLY the BNL range-join pairs while
  * planning as an equi-join on the grid cell (shuffle-able, no
  * BroadcastNestedLoopJoin in the join itself).
  */
class SpatialJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def boxes(n: Int, seed: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val x = TextFunctions.splitmix64(seed * 1000L + i).abs % 1000 / 1.0
      val y = TextFunctions.splitmix64(seed * 2000L + i).abs % 1000 / 1.0
      (i.toLong, x, y, x + 30.0, y + 40.0)
    }.toDF("id", "xmin", "ymin", "xmax", "ymax")
  }

  test("grid join equals BNL range join, plans as equi-join") {
    import spark.implicits._
    val a = boxes(150, 1)
    val b = boxes(120, 2)

    val grid = SpatialJoin.bboxIntersectJoin(a, b, cell = 50.0)
    val gridPairs = grid.as[(Long, Long)].collect().toSet

    val bnl = a.alias("a").join(b.alias("b"),
        col("a.xmin") <= col("b.xmax") && col("b.xmin") <= col("a.xmax") &&
        col("a.ymin") <= col("b.ymax") && col("b.ymin") <= col("a.ymax"))
      .select(col("a.id").as("lid"), col("b.id").as("rid"))
      .as[(Long, Long)].collect().toSet

    assert(gridPairs === bnl)
    assert(gridPairs.nonEmpty)

    val plan = grid.queryExecution.executedPlan.toString
    assert(plan.contains("__cell"), "join key is the grid cell")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"expected equi join:\n$plan")
  }
}
