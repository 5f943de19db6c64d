package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of operators.LineDedup on a hand-built corpus: frequency
  * threshold, order preservation, within-doc duplicate handling, and the
  * all-boilerplate document.
  */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], tau: Int): Map[Long, (Int, Int, String)] =
    graft.operators.LineDedup.clean(
        docs.toDF("doc_id", "content"), tau)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap

  test("lines in >= tau distinct docs are dropped; unique lines keep order") {
    val out = run(Seq(
      0L -> "alpha\nbeta\ncommon footer",
      1L -> "gamma\ncommon footer",
      2L -> "delta\ncommon footer"), tau = 3)
    assert(out(0L) === ((3, 2, "alpha\nbeta")))
    assert(out(1L) === ((2, 1, "gamma")))
    assert(out(2L) === ((2, 1, "delta")))
  }

  test("frequency counts distinct documents, not occurrences") {
    // 'dup' appears 3 times across 2 docs — df=2 < tau=3, so every
    // occurrence survives (including both copies inside doc 3).
    val out = run(Seq(
      3L -> "dup\ndup",
      4L -> "dup\nsolo"), tau = 3)
    assert(out(3L) === ((2, 2, "dup\ndup")))
    assert(out(4L) === ((2, 2, "dup\nsolo")))
  }

  test("a document of pure boilerplate empties to '' with n_kept 0") {
    val out = run(Seq(
      5L -> "footer",
      6L -> "footer",
      7L -> "footer\nkeep me"), tau = 2)
    assert(out(5L) === ((1, 0, "")))
    assert(out(6L) === ((1, 0, "")))
    assert(out(7L) === ((2, 1, "keep me")))
  }

  test("lineDf matches the countDistinct reference (r19 scan-local dedup kernel)") {
    // r19 moved the per-document dedup scan-local (array_distinct before
    // the explode + plain count); this pins it against the old two-phase
    // countDistinct form on within-doc repeats, shared lines and the
    // empty-content row.
    val docs = Seq(10L -> "x\nx\ny", 11L -> "x\nz\nz", 12L -> "", 13L -> "y")
      .toDF("doc_id", "content")
    val got = graft.operators.LineDedup.lineDf(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = docs
      .select(col("doc_id"), explode(split(col("content"), "\n")).as("line"))
      .groupBy("line").agg(countDistinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === ref)
    assert(got === Map("x" -> 2L, "y" -> 2L, "z" -> 1L, "" -> 1L))
  }

  test("tau above every frequency is the identity") {
    val docs = Seq(8L -> "a\nb\nc", 9L -> "a\nb")
    val out = run(docs, tau = 100)
    assert(out(8L) === ((3, 3, "a\nb\nc")))
    assert(out(9L) === ((2, 2, "a\nb")))
  }
}
