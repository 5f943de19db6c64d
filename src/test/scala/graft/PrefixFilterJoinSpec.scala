package graft

import graft.operators.PrefixFilterJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PrefixFilterJoin is the scale-safe replacement for the raw
  * shared-token candidate generator (r5 verdict's one quadratic shape),
  * so its spec pins the two claims the design stands on:
  *  1. LOSSLESS — the τ-filtered output equals the brute-force all-pairs
  *     result on adversarial and randomized corpora (a candidate
  *     generator that drops a qualifying pair is wrong, not slow);
  *  2. BOUNDED — the candidate-generation table's max per-token bucket is
  *     far below the raw token table's (hot tokens sort out of prefixes),
  *     which is the actual fix for the n(n−1)/2 hot-key explosion.
  */
class PrefixFilterJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toksDf(docs: Seq[(Long, Seq[String])]) = {
    import spark.implicits._
    docs.toDF("doc_id", "toks")
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("tok"))
  }

  private def brute(docs: Seq[(Long, Seq[String])], tau: Double): Set[(Long, Long, Int)] = {
    val sets = docs.map { case (id, ts) => id -> ts.distinct.toSet }
    (for {
      (i1, s1) <- sets; (i2, s2) <- sets if i1 < i2
      inter = (s1 & s2).size
      if s1.nonEmpty && s2.nonEmpty &&
        inter.toDouble / (s1.size + s2.size - inter) >= tau
    } yield (i1, i2, inter)).toSet
  }

  private def engine(docs: Seq[(Long, Seq[String])], tau: Double): Set[(Long, Long, Int)] =
    PrefixFilterJoin.pairs(toksDf(docs), "doc_id", "tok", tau)
      .filter(PrefixFilterJoin.jaccard >= tau)
      .select(col("d1"), col("d2"), col("inter")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("adversarial corpus with a universal stopword: lossless at two thresholds") {
    // every doc shares "the" — the raw generator would emit n(n-1)/2
    // candidates on that one key; the result must still be exact
    val docs: Seq[(Long, Seq[String])] =
      (0L until 40L).map { i =>
        val base = Seq("the", s"rare$i", s"tail${i % 7}", s"mid${i % 3}", "common")
        // 10 near-dup pairs: doc 2k+1 = doc 2k plus one extra token
        if (i % 2 == 1 && i < 20) i -> ((0L until 40L).find(_ == i - 1).map(j =>
          Seq("the", s"rare${j}", s"tail${j % 7}", s"mid${j % 3}", "common")).get :+ s"extra$i")
        else i -> base
      }
    for (tau <- Seq(0.8, 0.5))
      assert(engine(docs, tau) === brute(docs, tau), s"mismatch at tau=$tau")
  }

  test("exact integer tau*size boundary pair is not dropped (epsilon guard)") {
    // |x|=20, |y|=19, y ⊂ x: J = 19/20 = 0.95 exactly — floating ceil of
    // 0.95*20 must not round to 20 and shorten x's prefix below the lemma
    val x = (0 until 20).map(i => s"t$i")
    val y = x.take(19)
    val docs = Seq(1L -> x, 2L -> y)
    assert(engine(docs, 0.95) === Set((1L, 2L, 19)))
  }

  test("randomized corpora match brute force (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val universe = (0 until 30).map(i => s"u$i")
      val docs: Seq[(Long, Seq[String])] = (0L until 50L).map { i =>
        val sz = 3 + rnd.nextInt(10)
        i -> rnd.shuffle(universe).take(sz)
      } ++ Seq(100L -> universe.take(8), 101L -> universe.take(8),
        102L -> (universe.take(8) :+ "u29")) // planted dups
      for (tau <- Seq(0.9, 0.7))
        assert(engine(docs, tau) === brute(docs, tau),
          s"trial $trial tau=$tau diverged from brute force")
    }
  }

  test("prefix buckets are bounded: hot tokens sort out of candidate generation") {
    // 200 docs all sharing two stopwords; raw max bucket = 200 (→ 19900
    // pairs on one key); the prefix table must keep every bucket tiny
    val docs: Seq[(Long, Seq[String])] = (0L until 200L).map { i =>
      i -> Seq("the", "and", s"a$i", s"b$i", s"c${i % 50}", s"d${i % 25}")
    }
    val toks = toksDf(docs)
    val rawMax = toks.groupBy("tok").count()
      .agg(max("count")).collect()(0).getLong(0)
    val preMax = PrefixFilterJoin.prefixTokens(toks, "doc_id", "tok", 0.8)
      .groupBy("ptok").count().agg(max("count")).collect()(0).getLong(0)
    assert(rawMax === 200L)
    // prefix = 2 rarest of 6 tokens: the per-doc a_i/b_i singletons and
    // occasionally the 4/8-doc c/d tokens — never "the"/"and"
    assert(preMax <= 8L, s"prefix bucket grew to $preMax")
    // and the candidate pair volume is linear-ish, not n^2/2
    val cands = PrefixFilterJoin.pairs(toks, "doc_id", "tok", 0.8).count()
    assert(cands < 1000L, s"candidate count $cands suggests a hot-key blowup")
  }
}
