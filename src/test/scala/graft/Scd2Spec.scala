package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of operators.Scd2 on a hand-built change log: interval
  * construction, delete closure (no row of its own), is_current, and the
  * NULL-deleteFlag row (treated as an upsert, not silently dropped —
  * ADVICE r7).
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(changes: Seq[(Long, String, Long, java.lang.Boolean)])
      : Seq[(Long, String, Long, Option[Long], Boolean)] =
    graft.operators.Scd2.build(
        changes.toDF("k", "payload", "version", "deleted"),
        "k", "version", "deleted")
      .orderBy(col("k"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSeq

  test("upsert chain: each state closed by the next; last is current") {
    val out = run(Seq(
      (1L, "a", 1L, false), (1L, "b", 2L, false), (1L, "c", 5L, false)))
    assert(out === Seq(
      (1L, "a", 1L, Some(2L), false),
      (1L, "b", 2L, Some(5L), false),
      (1L, "c", 5L, None, true)))
  }

  test("delete closes the prior interval and emits no row; key has no current state") {
    val out = run(Seq(
      (2L, "x", 1L, false), (2L, "x", 3L, true)))
    assert(out === Seq((2L, "x", 1L, Some(3L), false)))
  }

  test("re-insert after delete opens a fresh current interval") {
    val out = run(Seq(
      (3L, "old", 1L, false), (3L, "old", 2L, true), (3L, "new", 4L, false)))
    assert(out === Seq(
      (3L, "old", 1L, Some(2L), false),
      (3L, "new", 4L, None, true)))
  }

  test("NULL deleteFlag is an upsert: the row survives and opens its interval") {
    val out = run(Seq(
      (4L, "a", 1L, false), (4L, "b", 2L, null)))
    assert(out === Seq(
      (4L, "a", 1L, Some(2L), false),
      (4L, "b", 2L, None, true)))
  }

  test("keys are independent: one key's delete does not leak into another") {
    val out = run(Seq(
      (5L, "k5", 1L, false), (6L, "k6", 1L, false), (6L, "k6", 2L, true)))
    assert(out === Seq(
      (5L, "k5", 1L, None, true),
      (6L, "k6", 1L, Some(2L), false)))
  }
}
