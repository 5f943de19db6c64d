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
    GeoFunctionRegistry.registerAll(spark)
    TextFunctionRegistry.registerAll(spark)
    spark
  }

  /** Ensure engine function registration on a session we did not build
    * (Verify/Bench receive a driver-configured session).
    */
  def prepare(spark: SparkSession): SparkSession = {
    GeoFunctionRegistry.registerAll(spark)
    TextFunctionRegistry.registerAll(spark)
    spark
  }

  // --- Oracle-exact arithmetic helpers (SURVEY.md §5.2) -------------------
  //
  // Double sums are order-dependent; Spark (partial+final over 32 partitions)
  // and DuckDB (8 threads) would disagree in the last ulps. Summing in
  // decimal is exact and order-independent, so both engines produce
  // bit-identical results; we cast back to double for a stable output schema.
  // Testdata prices/discounts are exact 2-decimal doubles (o_totalprice 4dp),
  // so the decimal cast is lossless.

  /** Exact 2-decimal reading of a money-like double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact 4-decimal reading (o_totalprice). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent exact sum of a 2-decimal double column → double. */
  def sumD2(c: Column): Column = sum(dec2(c)).cast("double")

  /** Order-independent exact sum of a 4-decimal double column → double. */
  def sumD4(c: Column): Column = sum(dec4(c)).cast("double")

  /** Exact average of a 2-decimal double column: decimal sum, one double
    * division — bit-identical across engines.
    */
  def avgD2(c: Column): Column = sum(dec2(c)).cast("double") / count(c)
}
