package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DenseKeyFlags

/** The domain-adaptive semi/anti count (c09 shipping hybrid): the dense
  * bitmap aggregate must agree with the flag-aggregate form bit-for-bit,
  * and the domain guard must route wide key domains to the
  * domain-proportional fallback (the 100 TB safety argument).
  */
class DenseKeyFlagsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("aggregator verdict matches a hand-computed reference") {
    // keys 0..9; member set {1,3,5,7,9}; disc {1,3,4,5}; taxed {5,9}
    // verdict = |member ∧ disc ∧ ¬taxed| = |{1,3}| = 2
    val agg = new DenseKeyFlags.DenseFlagAgg(1)
    var b = agg.zero
    Seq(1L, 3L, 5L, 7L, 9L).foreach(k => b = agg.reduce(b, (k, 4)))
    Seq(1L, 3L, 4L, 5L).foreach(k => b = agg.reduce(b, (k, 1)))
    Seq(5L, 9L).foreach(k => b = agg.reduce(b, (k, 2)))
    assert(agg.finish(b) === 2L)
    // out-of-domain keys are ignored, not mis-binned
    b = agg.reduce(b, (64L, 4)); b = agg.reduce(b, (-1L, 1))
    assert(agg.finish(b) === 2L)
    // packed form decodes to the same verdict
    val p = new DenseKeyFlags.DensePackedAgg(1)
    var pb = p.zero
    Seq(1L, 3L, 5L, 7L, 9L).foreach(k => pb = p.reduce(pb, k * 8 + 4))
    Seq(1L, 3L, 4L, 5L).foreach(k => pb = p.reduce(pb, k * 8 + 1))
    Seq(5L, 9L).foreach(k => pb = p.reduce(pb, k * 8 + 2))
    assert(p.finish(pb) === 2L)
    // merge is a bitwise union: splitting the input stream is lossless
    val half1 = Seq(1L, 3L).foldLeft(p.zero)((s, k) => p.reduce(s, k * 8 + 4))
    val half2 = Seq(5L, 7L, 9L).foldLeft(p.zero)((s, k) => p.reduce(s, k * 8 + 4))
    val m = p.merge(half1, half2)
    var mm = Seq(1L, 3L, 4L, 5L).foldLeft(m)((s, k) => p.reduce(s, k * 8 + 1))
    mm = Seq(5L, 9L).foldLeft(mm)((s, k) => p.reduce(s, k * 8 + 2))
    assert(p.finish(mm) === 2L)
  }

  test("c09 dense path agrees with the flag-agg fallback on the test tables") {
    // run the SHIPPING query (dense path engages at test SF: key span
    // well under DomainMax) and re-derive the answer with the fallback
    // plan shape inline
    val shipped = SparkEntry.queries("c09_semi_anti")(spark, dir)
      .head().getLong(0)
    val p = Tables(spark, dir, "part").select(col("p_partkey"))
    val l = Tables(spark, dir, "lineitem")
    val keys = l.select(col("l_partkey"),
      (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
      .filter(col("disc") || col("taxed"))
      .groupBy(col("l_partkey"))
      .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
      .filter(col("disc") && !col("taxed"))
    val flagAgg = keys.join(broadcast(p),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .agg(count(lit(1)).as("n")).head().getLong(0)
    assert(shipped === flagAgg)
    assert(shipped > 0L, "degenerate fixture: no qualifying keys at all")
  }

  test("wide key domain routes to the flag-agg fallback (no bitmap blow-up)") {
    // a dim whose key span exceeds DomainMax must take the join plan —
    // the bitmap would be gigabytes of state per task
    val tmp = java.nio.file.Files.createTempDirectory("densewide").toString
    val wideKeys = Seq(1L, 5L, 1L << 40) // span ~2^40 >> DomainMax
    spark.createDataFrame(
        spark.sparkContext.parallelize(wideKeys.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p_partkey",
            org.apache.spark.sql.types.LongType))))
      .write.parquet(s"$tmp/part.parquet")
    val li = Seq((1L, 0.10, 0.01), (5L, 0.10, 0.10), (1L << 40, 0.01, 0.01))
    spark.createDataFrame(li).toDF("l_partkey", "l_discount", "l_tax")
      .write.parquet(s"$tmp/lineitem.parquet")
    val df = SparkEntry.queries("c09_semi_anti")(spark, tmp)
    // plan shape: the fallback's semi join is present (dense has no join)
    assert(df.queryExecution.executedPlan.toString.contains("Join"),
      df.queryExecution.executedPlan.toString)
    // key 1: disc && !taxed && member → counts; key 5 taxed; 2^40 no disc
    assert(df.head().getLong(0) === 1L)
  }
}
