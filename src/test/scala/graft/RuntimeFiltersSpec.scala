package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two runtime safety nets the 100 TB story leans on, PROVEN to engage
  * rather than assumed from configuration:
  *
  *  - runtime bloom-filter pruning: a selective filter on the build side of
  *    a shuffle join injects a bloom-filter semi-filter into the probe-side
  *    scan, so the big side drops non-joining rows BEFORE the shuffle —
  *    at 100 TB that is the difference between shuffling a full fact table
  *    and shuffling the joined slice;
  *  - AQE skew-join splitting: a pathologically skewed key is split into
  *    multiple tasks at runtime instead of stalling one straggler executor.
  *
  * Both tests lower the size thresholds (local data is KB-scale; production
  * defaults are MB/GB-scale) — the MECHANISM under test is identical, only
  * the trigger volume differs.
  */
class RuntimeFiltersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter: selective dim filter injects might_contain on the fact scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local fixtures are far below the production-scale defaults
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // force a shuffle join: broadcast would not need the runtime filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val lineitem = Tables(spark, dir, "lineitem")
      val orders = Tables(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000)
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString()
      assert(optimized.toLowerCase.contains("might_contain"),
        s"no bloom filter injected:\n$optimized")
      // and it actually runs: the filtered result matches the unfiltered plan
      val expected = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
          .collect().toSeq
      }
      assert(joined.collect().toSeq === expected)
    }
  }

  test("AQE skew join: a hot key splits into multiple tasks at runtime") {
    // one pathological key (0) carrying 200k fact rows vs 100 normal keys
    // of 10 rows each; the dim side is uniform, so ALL the skew is one
    // shuffle partition on the fact side
    val hot = spark.range(0, 200000)
      .select(lit(0L).as("k"), col("id").as("v"), sha2(col("id").cast("string"), 256).as("pad"))
    val cold = spark.range(0, 1000)
      .select((col("id") % 100 + 1).as("k"), col("id").as("v"),
        sha2(col("id").cast("string"), 256).as("pad"))
    val left = hot.union(cold)
    val right = spark.range(0, 101).select(col("id").as("k"), (col("id") * 10).as("w"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      val joined = left.join(right, "k")
      // execute THIS query execution (count() would plan a separate one),
      // so AQE finalizes the inspected plan with real runtime sizes
      assert(joined.collect().length === 201000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skew-split:\n$plan")
    }
  }
}
