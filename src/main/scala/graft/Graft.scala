package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Session factory + shared helpers for the graft engine.
  *
  * Engine-wide defaults are chosen for the 100 TB design point (SURVEY.md §4,
  * §7): AQE on (runtime shuffle coalescing + skew-join splitting), UTC session
  * time zone (oracle parity), shuffle partitions sized to cores for local runs
  * (a real cluster overrides via spark-submit conf).
  */
object Graft {

  /** Build (or reuse) a session with engine defaults. */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    prepare(spark)
  }

  /** Reference-parity entry point: `read_geoparquet(path)`. */
  def readGeoParquet(spark: SparkSession, path: String): DataFrame =
    geo.GeoParquet.read(spark, path)

  /** Reference-parity entry point: `gdf.to_geoparquet(path)` — also
    * available as `df.writeGeoParquet(path)` via GeoParquet.GeoDataFrameOps.
    */
  def writeGeoParquet(df: DataFrame, path: String,
      geometryColumn: String = "geometry"): Unit =
    geo.GeoParquet.write(df, path, Seq(geometryColumn))

  /** Ensure engine function registration on a session we did not build
    * (Verify/Bench receive a driver-configured session).
    */
  def prepare(spark: SparkSession): SparkSession = {
    GeoFunctionRegistry.registerAll(spark)
    TextFunctionRegistry.registerAll(spark)
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.StEnvelope.register(spark)
    graft.functions.WkbPredicates.register(spark) // native st_intersects & co.
    graft.functions.WkbAccessors.register(spark) // after UDF registry: SQL
    // names st_x/st_y route to the native expressions
    graft.plans.SpatialFilterRule.register(spark)
    spark
  }

  // --- Oracle-exact arithmetic helpers (SURVEY.md §5.2) -------------------
  //
  // Double sums are order-dependent; Spark (partial+final over 32 partitions)
  // and DuckDB (8 threads) would disagree in the last ulps. Fixed-point
  // money columns (2dp; o_totalprice 4dp) are summed as exact integer cents
  // instead: codegen'd long adds, order-independent, and ~6x faster than
  // decimal aggregation (measured: 5 decimal sums over 600k rows = 745 ms
  // vs 177 ms as longs). The final /100.0 is one double division written
  // identically in the DuckDB oracle — bit-identical results.
  //
  // Overflow bound: |cents| sums stay exact below 2^63 and convert to
  // double identically on both engines. Squared-cents power sums (c16) can
  // exceed that at bench scale — those keep the decimal path (dec2/dec4).

  // floor(x*100 + 0.5) rather than round(): Spark's Round on DoubleType
  // allocates a BigDecimal per row; floor is a codegen'd Math.floor. The
  // +0.5 shift rounds half-up (exact ties cannot occur for fixed-point
  // data), correct for negatives too. Spark's floor(double) is LongType.

  /** Exact integer cents of a 2-decimal double column. */
  def cents2(c: Column): Column = floor(c * 100 + lit(0.5))

  /** Exact integer ten-thousandths of a 4-decimal double column. */
  def cents4(c: Column): Column = floor(c * 10000 + lit(0.5))

  /** Exact 2-decimal reading of a money-like double column (decimal path,
    * for power sums whose cents form could overflow long).
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact 4-decimal reading (decimal path). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent exact sum of a 2-decimal double column → double. */
  def sumD2(c: Column): Column = sum(cents2(c)).cast("double") / lit(100.0)

  /** Order-independent exact sum of a 4-decimal double column → double. */
  def sumD4(c: Column): Column = sum(cents4(c)).cast("double") / lit(10000.0)

  /** Exact average of a 2-decimal double column: cents sum, two double
    * divisions — bit-identical across engines.
    */
  def avgD2(c: Column): Column = (sum(cents2(c)).cast("double") / lit(100.0)) / count(c)

  /** Oracle-side SQL for sumD2/sumD4/avgD2 (DuckDB dialect; hugeint sums
    * convert to the same doubles as Spark's longs).
    */
  def sqlSumD2(x: String): String =
    s"CAST(sum(CAST(floor(($x)*100 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE)"
  def sqlSumD4(x: String): String =
    s"CAST(sum(CAST(floor(($x)*10000 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(10000 AS DOUBLE)"
  def sqlAvgD2(x: String): String =
    s"(${sqlSumD2(x)}) / count($x)"

  /** Final ORDER BY for a provably small result (post-aggregation /
    * top-k — output bounded by group count, not input size).
    *
    * A plain `orderBy` plans a range-partitioning exchange whose bounds
    * come from an extra SAMPLING JOB over the child — the child plan runs
    * twice. For a bounded output the scale-correct plan is the one every
    * distributed engine uses for a final small ORDER BY: shuffle the few
    * rows to one partition and sort there (the "driver merge"). Upstream
    * stages keep full parallelism — only the already-small result
    * serializes. Saves one job + one stage per query (measured in
    * BENCH notes).
    */
  def sortSmall(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
