package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  test("asOf picks latest right row at ts <= left ts, per key; inclusive ties") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 5L, "r5"), (1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("k", "rts", "rv")

    val out = AsOfJoin.asOf(left, right,
        partitionCols = Seq("k"), leftTs = "ts", rightTs = "rts",
        rightVals = Seq("rv"))
      .select("k", "lv", "rv").as[(Long, String, String)]
      .collect().toSet

    assert(out === Set(
      (1L, "l1", "r10"), // tie at ts=10 matches inclusively
      (1L, "l2", "r15"),
      (2L, "l3", null))) // right ts=9 > left ts=5 -> no match
  }
}
