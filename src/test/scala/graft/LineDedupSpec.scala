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

  test("tau above every frequency is the identity") {
    val docs = Seq(8L -> "a\nb\nc", 9L -> "a\nb")
    val out = run(docs, tau = 100)
    assert(out(8L) === ((3, 3, "a\nb\nc")))
    assert(out(9L) === ((2, 2, "a\nb")))
  }
}
