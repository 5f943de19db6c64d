package graft

import org.scalatest.funsuite.AnyFunSuite

/** SemDedup.verdicts on a hand-built corpus where every expected verdict
  * is known by construction. The driver gate (e39) checks the clustered
  * corpus against the independent DuckDB re-derivation; this spec pins
  * the semantics directly: threshold cut, min-id canonical partner,
  * chain collapse toward the earliest id, and per-bucket isolation.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cs = Array(
    Array(1f, 0f, 0f, 0f),
    Array(0f, 1f, 0f, 0f))

  //  bucket 0: 0 (axis), 1 (~0.99875 to 0 — dup), 5 (~0.995 to 0 — dup,
  //    and ~0.9988 to 1, but the canonical partner must be min id 0)
  //  bucket 1: 2 (diagonal-ish, kept), 3 (axis, kept — sim(2,3)≈0.72),
  //    4 (~1.0 to 3 — dup)
  private val vecs = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(1f, 0.05f, 0f, 0f)),
    (2L, Seq(0.7f, 0.72f, 0f, 0f)),
    (3L, Seq(0f, 1f, 0f, 0f)),
    (4L, Seq(0f, 1f, 0.001f, 0f)),
    (5L, Seq(1f, 0.1f, 0f, 0f)))

  test("verdicts: threshold cut, min-id partner, chain collapse") {
    val out = operators.SemDedup
      .verdicts(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        cs, tau = 0.99)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(byId(0L) === ((0L, "kept", -1L)))
    assert(byId(1L) === ((0L, "dropped", 0L)))
    assert(byId(5L) === ((0L, "dropped", 0L)),
      "canonical partner is the EARLIEST qualifying id, not the most similar")
    assert(byId(2L) === ((1L, "kept", -1L)))
    assert(byId(3L) === ((1L, "kept", -1L)), "sim(2,3) ~ 0.72 is below tau")
    assert(byId(4L) === ((1L, "dropped", 3L)))
    val s4 = out.find(_.getLong(0) == 4L).get.getDouble(4)
    assert(s4 >= 0.99 && s4 <= 1.0, "dropped row carries the partner sim")
  }

  test("tau = 1.0-ish keeps everything distinct") {
    val out = operators.SemDedup
      .verdicts(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        cs, tau = 1.1)
      .collect()
    assert(out.forall(_.getString(2) == "kept"))
  }

  // ---- skewed-bucket split (VERDICT r7 item 4) ----

  /** 12 distinct base vectors near axis 0 (pairwise cosine << 0.9999)
    * plus an EXACT copy of each at id+100 — one hot bucket where every
    * true dup pair must survive the split (identical vectors have
    * identical sub-centroid cosines, hence the same sub-bucket).
    */
  private val hotVecs: Seq[(Long, Seq[Float])] = {
    val bases = (0 until 12).map { i =>
      i.toLong -> Seq(10f,
        (i % 3 - 1) * (1f + i / 3f), ((i + 1) % 4 - 1.5f) * 0.8f,
        math.sin(i.toDouble).toFloat * 2f)
    }
    bases ++ bases.map { case (i, v) => (i + 100L) -> v }
  }

  test("default maxBucket leaves assignments unsplit (sub = 0 everywhere)") {
    val asg = operators.SemDedup.assignments(
      hotVecs.toDF("vec_id", "embedding"), "vec_id", "embedding", cs)
    assert(asg.collect().forall(_.getAs[Int]("sub") == 0))
  }

  test("hot bucket splits into multiple sub-buckets; cold buckets keep sub 0") {
    val asg = operators.SemDedup.assignments(
        hotVecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        cs, maxBucket = 6, subK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(asg.length === 24)
    val subs = asg.filter(_._2 == 0L).map(_._3).distinct
    assert(subs.length > 1, s"hot bucket did not split: subs=${subs.toSeq}")
    assert(subs.forall(s => s >= 0 && s < 4))
    // the largest (bucket, sub) group is strictly smaller than the bucket
    val maxGroup = asg.groupBy(r => (r._2, r._3)).map(_._2.length).max
    assert(maxGroup < 24)
  }

  test("split only refines: every exact-dup pair is still found with its partner") {
    val out = operators.SemDedup.verdicts(
        hotVecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        cs, tau = 0.9999, maxBucket = 6, subK = 4)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    (0 until 12).foreach { i =>
      assert(out(i.toLong) === (("kept", -1L)), s"base $i must stay kept")
      assert(out(i + 100L) === (("dropped", i.toLong)),
        s"copy of $i must drop toward its identical base even after the split")
    }
  }
}
