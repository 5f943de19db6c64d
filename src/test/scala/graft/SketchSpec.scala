package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E14 PROP tier: sketches aren't oracle-able (internals differ per
  * engine); assert documented error bounds against exact results instead.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("approx_count_distinct within rsd bound of exact") {
    val li = Tables(spark, dir, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    // 0.05 rsd => assert within 4 sigma
    assert(math.abs(approx - exact) / exact <= 0.20,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val li = Tables(spark, dir, "lineitem")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_p50"),
      min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi")).collect()(0)
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    val span = row.getDouble(3) - row.getDouble(2)
    assert(math.abs(approx - exact) <= span * 0.02,
      s"approx $approx vs exact $exact (span $span)")
  }

  test("count-min sketch heavy hitters: estimates overcount-only, within eps*N") {
    // the streaming-friendly heavy-hitters path: one pass builds a
    // fixed-size sketch (mergeable across partitions — the aggregate's
    // partial+final IS a sketch merge), exact top-k verifies the bound.
    // CM sketches NEVER undercount; overcount is bounded by eps*N at the
    // configured confidence.
    val toks = Tables(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val n = toks.count()
    val eps = 0.001
    val bytes = toks
      .agg(expr(s"count_min_sketch(tok, ${eps}d, 0.99d, 42)")).collect()(0)
      .getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
    val top = toks.groupBy(col("tok")).count()
      .orderBy(col("count").desc, col("tok")).limit(20).collect()
    top.foreach { r =>
      val (tok, exact) = (r.getString(0), r.getLong(1))
      // the SQL aggregate adds strings as UTF-8 bytes; query the same way
      val est = sk.estimateCount(tok.getBytes("UTF-8"))
      assert(est >= exact, s"'$tok': CM estimate $est undercounts exact $exact")
      assert(est <= exact + (eps * n).toLong + 1,
        s"'$tok': CM estimate $est exceeds exact $exact + eps*N")
    }
  }
}
