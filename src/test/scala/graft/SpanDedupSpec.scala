package graft

import org.scalatest.funsuite.AnyFunSuite

/** SpanDedup.sharedSpans over hand-built corpora where every maximal
  * shared span is known by construction. k = 4, minSpan = 4 throughout
  * (small enough to reason by hand).
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], k: Int = 4, minSpan: Int = 4)
      : Set[(Long, Int, Int, String)] =
    graft.operators.SpanDedup
      .sharedSpans(docs.toDF("id", "text"), "id", "text", k, minSpan)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a passage shared mid-document is found maximally in BOTH docs") {
    val passage = "p0 p1 p2 p3 p4 p5" // 6 tokens
    val a = s"${words("a", 5)} $passage ${words("x", 5)}" // passage at 5
    val b = s"${words("b", 3)} $passage ${words("y", 4)}" // passage at 3
    assert(spans(Seq(1L -> a, 2L -> b)) === Set(
      (1L, 5, 6, passage), (2L, 3, 6, passage)))
  }

  test("no shared k-shingle -> no spans") {
    assert(spans(Seq(1L -> words("a", 10), 2L -> words("b", 10))) === Set())
  }

  test("two disjoint shared passages stay two spans, not one") {
    val p = "p0 p1 p2 p3"
    val q = "q0 q1 q2 q3"
    val a = s"$p ${words("a", 6)} $q"     // p at 0, q at 10
    val b = s"$q ${words("b", 7)} $p"     // q at 0, p at 11
    assert(spans(Seq(1L -> a, 2L -> b)) === Set(
      (1L, 0, 4, p), (1L, 10, 4, q), (2L, 0, 4, q), (2L, 11, 4, p)))
  }

  test("span at document start and at document end") {
    val p = "p0 p1 p2 p3 p4"
    val a = s"$p ${words("a", 4)}"  // starts the doc
    val b = s"${words("b", 4)} $p"  // ends the doc
    assert(spans(Seq(1L -> a, 2L -> b)) === Set(
      (1L, 0, 5, p), (2L, 4, 5, p)))
  }

  test("minSpanTokens filters short shared runs") {
    val p = "p0 p1 p2 p3" // exactly k — survives minSpan=4, dies at 5
    val a = s"${words("a", 4)} $p"
    val b = s"$p ${words("b", 4)}"
    assert(spans(Seq(1L -> a, 2L -> b), minSpan = 5) === Set())
    assert(spans(Seq(1L -> a, 2L -> b), minSpan = 4) === Set(
      (1L, 4, 4, p), (2L, 0, 4, p)))
  }

  test("a span shared by many docs reports once per doc (df, not pairs)") {
    val p = "p0 p1 p2 p3 p4"
    val docs = (0 until 6).map(i => i.toLong -> s"${words(s"u$i", i + 1)} $p")
    val got = spans(docs)
    assert(got.size === 6)
    assert(got.map(_._4) === Set(p))
    assert(got.map(t => (t._1, t._2)) === (0 until 6).map(i => (i.toLong, i + 1)).toSet)
  }

  test("overlapping shared shingles within one doc merge into one maximal span") {
    // doc 1 contains p0..p7; doc 2 contains p0..p5, doc 3 contains p2..p7:
    // doc 1's shared positions are continuous -> ONE span p0..p7 even
    // though no single partner shares all of it
    val a = "p0 p1 p2 p3 p4 p5 p6 p7"
    val b = s"p0 p1 p2 p3 p4 p5 ${words("b", 4)}"
    val c = s"${words("c", 4)} p2 p3 p4 p5 p6 p7"
    val got = spans(Seq(1L -> a, 2L -> b, 3L -> c))
    assert(got.contains((1L, 0, 8, a)))
    assert(got.contains((2L, 0, 6, "p0 p1 p2 p3 p4 p5")))
    assert(got.contains((3L, 4, 6, "p2 p3 p4 p5 p6 p7")))
  }

  test("documents shorter than k are ignored, not errors") {
    assert(spans(Seq(1L -> "a b", 2L -> "a b")) === Set())
  }

  private def removed(docs: Seq[(Long, String)], k: Int = 4, minSpan: Int = 4)
      : Map[Long, (Int, Int, String)] =
    graft.operators.SpanDedup
      .removeSpans(docs.toDF("id", "text"), "id", "text", k, minSpan)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap

  test("removal: lowest doc keeps the passage, every other doc loses it") {
    val p = "p0 p1 p2 p3 p4"
    val a = s"${words("a", 3)} $p ${words("x", 2)}"
    val b = s"$p ${words("b", 4)}"
    val c = s"${words("c", 2)} $p"
    val got = removed(Seq(1L -> a, 2L -> b, 3L -> c))
    assert(got(1L) === ((10, 0, a)))                        // keeper: untouched
    assert(got(2L) === ((9, 5, words("b", 4))))             // span excised
    assert(got(3L) === ((7, 5, words("c", 2))))
  }

  test("removal: doc with nothing shared passes through") {
    val got = removed(Seq(1L -> words("a", 8), 2L -> words("b", 8)))
    assert(got(1L) === ((8, 0, words("a", 8))))
    assert(got(2L) === ((8, 0, words("b", 8))))
  }

  test("removal: same-head overlap family resolves to one keeper") {
    // doc1 p0..p7, doc2 p0..p5: both spans head with the p0-shingle ->
    // doc1 keeps, doc2 excises. doc3's p2..p7 span heads with the
    // p2-shingle, a DIFFERENT family whose only member is doc3 -> doc3
    // keeps (the documented per-family limitation).
    val a = "p0 p1 p2 p3 p4 p5 p6 p7"
    val b = s"p0 p1 p2 p3 p4 p5 ${words("b", 4)}"
    val c = s"${words("c", 4)} p2 p3 p4 p5 p6 p7"
    val got = removed(Seq(1L -> a, 2L -> b, 3L -> c))
    assert(got(1L) === ((8, 0, a)))
    assert(got(2L) === ((10, 6, words("b", 4))))
    assert(got(3L)._2 === 0)
  }

  test("removal: multiple spans in one doc are both excised") {
    val p = "p0 p1 p2 p3"
    val q = "q0 q1 q2 q3"
    val a = s"$p $q"                      // doc 1 holds both passages
    val b = s"${words("b", 2)} $p ${words("y", 2)} $q"
    val got = removed(Seq(1L -> a, 2L -> b))
    assert(got(1L) === ((8, 0, a)))
    assert(got(2L) === ((12, 8, s"${words("b", 2)} ${words("y", 2)}")))
  }
}
