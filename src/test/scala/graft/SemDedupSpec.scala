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
}
