package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §4 co-located joins: tables bucketed on the join key must join with NO
  * Exchange on either side — the pre-shuffle that makes repeated fact-fact
  * joins affordable at 100 TB (pay the shuffle once at write time).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle") {
    val dir = TestSpark.sfDir
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously crashed run can leave orphaned managed-table dirs
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }

    Tables(spark, dir, "orders")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables(spark, dir, "lineitem")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // disable auto-broadcast so the join exercises the bucket alignment
    // (at 100 TB neither fact side broadcasts anyway)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    joined.collect()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // keep only the executed (final) plan — AQE appends the initial plan
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val joinSection = plan.substring(plan.indexOf("Join"))
    // the join's children must be bucket-aligned scans, not exchanges
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a co-located equi join:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"join inputs should be pre-bucketed (no shuffle):\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"bucketed scan expected:\n$plan")

    // same result as the plain join
    val expect = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
  }
}
