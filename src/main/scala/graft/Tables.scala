package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (TESTDATA.md): 10 parquet tables per scale-factor
  * dir. Plain `spark.read.parquet` — Catalyst's vectorized reader, predicate
  * pushdown and column pruning all apply (SURVEY.md §4.2); nothing custom.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` normalization — the driver has shipped two physical forms:
    *  - TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
    *    ([PARQUET_TYPE_ILLEGAL]): read nanos as a long (session conf below)
    *    and truncate to microseconds with exact integer division (`div`,
    *    not `/` — ns-epoch values exceed double's 2^53 mantissa);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    *    TIMESTAMP_NTZ: cast to session-local TIMESTAMP (session tz is UTC
    *    everywhere, so the wall-clock value is unchanged — exactly what the
    *    DuckDB oracle sees reading the same naive µs values).
    * Both normalize to the same µs TIMESTAMP column; every declared oracle
    * query buckets or formats ts at ≥second granularity (SURVEY.md §1.2).
    */
  // Plan-handle cache: spark.read.parquet pays file listing + footer schema
  // read (~60 ms) on EVERY call; the returned DataFrame is an immutable
  // logical plan, safe to reuse within a session. Keyed by session so a
  // restarted driver session doesn't see stale file indexes.
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((System.identityHashCode(spark), dir, name),
      _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Guarded on the actual physical type: a re-staged copy of events
    // (Bench layout cache) already holds µs TIMESTAMP and needs no
    // conversion.
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => df
    } else df
  }

  /** Register every table as a temp view named after itself (C37 SQL entry
    * point; also what pairs 1:1 with the DuckDB oracle's view names).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
