package graft

import graft.operators.Salted
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting must change the distribution, not the answer: equivalence with
  * the plain formulations on a deliberately skewed dataset (one key owns
  * 90% of rows).
  */
class SaltedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def skewed = {
    import spark.implicits._
    ((1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble)))
      .toDF("k", "v")
  }

  test("saltedSumCount equals plain groupBy agg") {
    import spark.implicits._
    val salted = Salted.saltedSumCount(skewed, Seq("k"), "v")
      .select(col("k"), col("sum_v"), col("cnt"))
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (k, (s, c)) =>
      assert(salted(k)._2 === c, s"count $k")
      assert(math.abs(salted(k)._1 - s) < 1e-6, s"sum $k")
    }
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val dim = Seq(("hot", 1), ("k1", 2), ("k7", 3)).toDF("k", "tag")
    val salted = Salted.saltedJoin(skewed, dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("tag").as("t"))
      .as[(String, Long, Long)].collect().toSet
    val plain = skewed.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("tag").as("t"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }
}
