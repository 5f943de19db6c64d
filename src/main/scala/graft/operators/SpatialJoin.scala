package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-salted spatial join (SURVEY.md §4.3): pairs of rows whose bounding
  * boxes intersect.
  *
  * The naive formulation — a theta-join on four range predicates — plans as
  * a broadcast-nested-loop: O(n*m) comparisons, a non-starter at scale.
  * Instead each bbox explodes to the fixed-grid cells it covers and the
  * join becomes a plain EQUI-join on the cell id (shuffle-partitioned by
  * cell, AQE-skew-splittable), with the exact envelope test as a
  * post-filter and a distinct to dedup boxes that share several cells.
  * This is the standard PBSM/grid pattern (e.g. SpatialSpark, Sedona's
  * partitioned joins) expressed as a pure DataFrame rewrite — no custom
  * physical operator needed.
  *
  * Inputs carry (id, xmin, ymin, xmax, ymax). `cell` size trades shuffle
  * fan-out (small cells -> more replicas) against per-cell pair blowup
  * (big cells -> more candidates); at 100 TB pick ~= median bbox size.
  */
object SpatialJoin {

  def bboxIntersectJoin(
      left: DataFrame, right: DataFrame, cell: Double): DataFrame = {
    def cells(df: DataFrame, p: String): DataFrame = {
      val cellsOf = expr(
        s"""flatten(transform(
             sequence(CAST(floor(${p}xmin / $cell) AS BIGINT), CAST(floor(${p}xmax / $cell) AS BIGINT)),
             cx -> transform(
               sequence(CAST(floor(${p}ymin / $cell) AS BIGINT), CAST(floor(${p}ymax / $cell) AS BIGINT)),
               cy -> concat(cast(cx AS STRING), ':', cast(cy AS STRING)))))""")
      df.select(col("*"), explode(cellsOf).as("__cell"))
    }
    val l = cells(left.select(
      col(left.columns(0)).as("lid"), col("xmin").as("lxmin"), col("ymin").as("lymin"),
      col("xmax").as("lxmax"), col("ymax").as("lymax")), "l")
    val r = cells(right.select(
      col(right.columns(0)).as("rid"), col("xmin").as("rxmin"), col("ymin").as("rymin"),
      col("xmax").as("rxmax"), col("ymax").as("rymax")), "r")
    l.join(r, l("__cell") === r("__cell"))
      .filter(col("lxmin") <= col("rxmax") && col("rxmin") <= col("lxmax") &&
        col("lymin") <= col("rymax") && col("rymin") <= col("lymax"))
      .select(col("lid"), col("rid"))
      .distinct()
  }
}
