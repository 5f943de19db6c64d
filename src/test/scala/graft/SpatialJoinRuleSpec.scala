package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans.SpatialJoinRule semantics that the b17c oracle cannot show:
  * duplicate-row multiplicity through the reference-point dedup, envelopes
  * spanning many grid cells, null geometries, and the equi-key /
  * broadcast-hint skip guards. Ground truth is the SAME join with a
  * broadcast hint — the rule skips hinted joins, so that path is Spark's
  * stock nested-loop answer.
  */
class SpatialJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def boxes(rows: Seq[(Long, Double, Double, Double, Double)], gcol: String) = {
    import spark.implicits._
    rows.toDF("id", "xmin", "ymin", "xmax", "ymax")
      .select(col("id"), GeoFunctions.st_makebox(col("xmin"), col("ymin"),
        col("xmax"), col("ymax")).as(gcol))
  }

  test("routed join preserves duplicate-row multiplicity (reference-point dedup, no distinct)") {
    // two IDENTICAL left rows, and boxes spanning several 500-unit cells
    val l = boxes(Seq(
      (1L, 0.0, 0.0, 1200.0, 700.0), // spans 3x2 cells
      (1L, 0.0, 0.0, 1200.0, 700.0), // exact duplicate
      (2L, 5000.0, 5000.0, 5100.0, 5100.0)), "ga")
    val r = boxes(Seq(
      (10L, 900.0, 600.0, 1600.0, 1300.0), // overlaps box 1 in several cells
      (11L, -400.0, -300.0, 100.0, 50.0), // overlaps box 1 near origin
      (12L, 9000.0, 9000.0, 9001.0, 9001.0)), "gb")

    val routed = l.join(r, GeoFunctions.st_intersects(col("ga"), col("gb")))
      .select(l("id").as("lid"), r("id").as("rid"))
    val plan = routed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not route:\n$plan")

    // ground truth: hinted join (rule skips it) -> stock BNL
    val rh = r.hint("broadcast")
    val truth = l.join(rh, GeoFunctions.st_intersects(col("ga"), col("gb")))
      .select(l("id").as("lid"), rh("id").as("rid"))
    assert(truth.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))

    def counted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(row => (row.getLong(0), row.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val got = counted(routed)
    assert(got === counted(truth))
    // the duplicate left row must yield each pair TWICE
    assert(got((1L, 10L)) === 2 && got((1L, 11L)) === 2)
  }

  test("null geometries drop from the routed inner join, as in the stock plan") {
    import spark.implicits._
    val l = boxes(Seq((1L, 0.0, 0.0, 10.0, 10.0)), "ga")
      .unionByName(Seq(99L).toDF("id").withColumn("ga", lit(null).cast("binary")))
    val r = boxes(Seq((10L, 5.0, 5.0, 15.0, 15.0)), "gb")
    val routed = l.join(r, GeoFunctions.st_intersects(col("ga"), col("gb")))
    assert(routed.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("cross-side equi key disables the rewrite (hash join already avoids BNL)") {
    val l = boxes(Seq((1L, 0.0, 0.0, 10.0, 10.0)), "ga")
    val r = boxes(Seq((1L, 5.0, 5.0, 15.0, 15.0)), "gb").withColumnRenamed("id", "rid")
    val q = l.join(r, col("id") === col("rid") &&
      GeoFunctions.st_intersects(col("ga"), col("gb")))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_cell"), s"rule fired despite equi key:\n$plan")
    assert(q.count() === 1)
  }
}
