package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2 C13): for every left row, attach the columns of
  * the latest right row whose time key is <= the left row's time key, within
  * the same partition key(s).
  *
  * Spark-first design: Spark has no native as-of join, and the naive
  * formulation (theta-join on `r.ts <= l.ts` + arg_max) is a broadcast-
  * nested-loop — O(n*m) and unusable at 100 TB. This implementation is the
  * classic union-tag-window plan:
  *
  *   union(left tagged, right tagged)
  *     -> window partitionBy(keys) orderBy(ts, tag) last(ignoreNulls)
  *     -> filter(tag == left)
  *
  * One shuffle on the partition keys (same cost as any equi-join on them),
  * sort within partitions, no cartesian blow-up; AQE handles skewed keys.
  * Right rows at exactly ts sort before left rows at ts (tag ordering), so
  * the match is inclusive (<=), matching DuckDB's ASOF JOIN semantics.
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      rows providing the as-of values
    * @param partitionCols equal-key columns present in BOTH inputs
    * @param leftTs     event-time column name on `left`
    * @param rightTs    event-time column name on `right`
    * @param rightVals  columns of `right` to carry to the output. NOTE:
    *                   null values inside a matched right row fall through
    *                   to the previous right row (`last(_, ignoreNulls)`
    *                   fill) — supply non-null value columns, or add an
    *                   `is_match` marker column (lit(true)) to detect it.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tag = "__asof_tag"
    val ts = "__asof_ts"

    // Align both sides on (partitionCols, ts, tag, leftCols..., rightVals...).
    val l = left
      .withColumn(tag, lit(1))
      .withColumn(ts, col(leftTs))
      .select((partitionCols ++ Seq(ts, tag) ++ leftCols.filterNot(partitionCols.contains))
        .map(col) ++ rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn(tag, lit(0))
      .withColumn(ts, col(rightTs))
      .select((partitionCols ++ Seq(ts, tag)).map(col) ++
        leftCols.filterNot(partitionCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)

    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(ts).asc, col(tag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r).select(
      (partitionCols ++ Seq(ts, tag) ++ leftCols.filterNot(partitionCols.contains)).map(col) ++
        rightVals.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)

    filled.filter(col(tag) === 1).drop(tag, ts)
  }
}
