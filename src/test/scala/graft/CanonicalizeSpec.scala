package graft

import graft.operators.Canonicalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CanonicalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hash is stable across partitionings and column order") {
    import spark.implicits._
    val df = Seq((3L, "c", 1.5), (1L, "a", 2.25), (2L, null, Double.NaN))
      .toDF("id", "s", "v")
    val h1 = Canonicalize.hash(df.repartition(7))
    val h2 = Canonicalize.hash(df.coalesce(1))
    val h3 = Canonicalize.hash(df.select(col("v"), col("id"), col("s")))
    assert(h1 === h2)
    assert(h1 === h3) // column order normalized by name sort
  }

  test("hash is sensitive to cell changes, field boundaries and row order") {
    import spark.implicits._
    val a = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val b = Seq((1L, 10.0), (2L, 20.000001)).toDF("id", "v")
    assert(Canonicalize.hash(a) !== Canonicalize.hash(b))
    // field-boundary collision guard: ("ab","c") vs ("a","bc")
    val f1 = Seq(("ab", "c")).toDF("x", "y")
    val f2 = Seq(("a", "bc")).toDF("x", "y")
    assert(Canonicalize.hash(f1) !== Canonicalize.hash(f2))
  }

  test("map-typed columns hash (SQL ORDER BY would reject them)") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 1, "b" -> 2)), (2L, Map("c" -> 3)))
      .toDF("id", "m")
    val h1 = Canonicalize.hash(df.repartition(5))
    val h2 = Canonicalize.hash(df.coalesce(1))
    assert(h1 === h2)
  }

  test("matches on a real query result across shuffle widths") {
    val q = SparkEntry.queries("c14_pricing_summary")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val h1 = Canonicalize.hash(q(spark, TestSpark.sfDir))
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val h2 = Canonicalize.hash(q(spark, TestSpark.sfDir))
      assert(h1 === h2)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
