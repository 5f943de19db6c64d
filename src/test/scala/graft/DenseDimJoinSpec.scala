package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DenseDimJoin

class DenseDimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lookup + notNull filter reproduces the inner equi-join exactly") {
    import spark.implicits._
    val dim = Seq((0L, 3), (1L, 7), (2L, 0), (5L, 120)).toDF("k", "v")
    // fact keys cover: present, the gap at 3/4, past the domain, negative
    val fact = Seq(0L, 1L, 2L, 3L, 4L, 5L, 9L, -1L, 0L).toDF("fk")
    val look = DenseDimJoin.lookup(spark, dim, "k", "v")
    val got = fact.withColumn("v", look(col("fk")))
      .filter(col("v").isNotNull)
      .orderBy("fk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val want = fact.join(dim, col("fk") === col("k"))
      .select(col("fk"), col("v"))
      .orderBy("fk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === want)
    assert(got === Seq((0L, 3), (0L, 3), (1L, 7), (2L, 0), (5L, 120)))
  }

  test("absent keys, out-of-domain and negative keys are NULL (never wrong values)") {
    import spark.implicits._
    val dim = Seq((2L, 11)).toDF("k", "v")
    val look = DenseDimJoin.lookup(spark, dim, "k", "v")
    val got = Seq(0L, 1L, 2L, 3L, -5L, 1000000L).toDF("fk")
      .select(look(col("fk")).as("v")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(got === Seq(None, None, Some(11), None, None, None))
  }

  test("interpreted eval agrees with codegen (the aggregate-probe path)") {
    import spark.implicits._
    val dim = (0 until 200 by 3).map(i => (i.toLong, i % 25)).toDF("k", "v")
    val look = DenseDimJoin.lookup(spark, dim, "k", "v")
    val fact = (0L until 200L).toDF("fk")
    // force both paths: a plain projection (codegen) and a groupBy over
    // the looked-up value (still codegen) vs collect-side re-derivation
    val agg = fact.withColumn("v", look(col("fk")))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = (0 until 200 by 3).groupBy(_ % 25).map { case (v, ks) => v -> ks.size.toLong }
    assert(agg === want)
  }

  test("reject, don't guess: values past a byte and domains too sparse to pack") {
    import spark.implicits._
    val bigVal = Seq((0L, 300)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      DenseDimJoin.lookup(spark, bigVal, "k", "v")
    }
    val sparse = Seq((5000000000L, 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      DenseDimJoin.lookup(spark, sparse, "k", "v", maxSlots = 1 << 20)
    }
    val negKey = Seq((-1L, 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      DenseDimJoin.lookup(spark, negKey, "k", "v")
    }
    // duplicate keys would MULTIPLY inner-join output; a lookup cannot
    // reproduce that — reject rather than silently last-win
    val dup = Seq((3L, 1), (3L, 2)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      DenseDimJoin.lookup(spark, dup, "k", "v")
    }
    // a NULL dimension row must reject, not NPE or drop silently
    val withNull = Seq((Some(1L), Some(5)), (None, Some(6))).toDF("k", "v")
    intercept[IllegalArgumentException] {
      DenseDimJoin.lookup(spark, withNull, "k", "v")
    }
  }
}
