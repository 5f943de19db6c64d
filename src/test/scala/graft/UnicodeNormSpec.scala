package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** nfc_normalize / strip_accents must match DuckDB's functions of the same
  * name char-for-char — that is the entire point of registering them under
  * those names (the e36 oracle pairs 1:1). Every expected value below was
  * produced by DuckDB (utf8proc) itself via
  * `SELECT nfc_normalize(v), strip_accents(v)` and is pinned here as
  * explicit codepoints (string literals cannot distinguish composed from
  * decomposed input, which is exactly what these functions act on).
  *
  * The Hangul-Jamo row is the load-bearing one: NFD decomposes syllables
  * to Jamo (NOT combining marks), and DuckDB returns the recomposed
  * form — a strip that skips the final NFC pass fails exactly there.
  */
class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cp(cps: Int*): String = {
    val sb = new java.lang.StringBuilder
    cps.foreach(sb.appendCodePoint)
    sb.toString
  }

  // (label, input, duckdb nfc_normalize, duckdb strip_accents)
  private val vectors: Seq[(String, String, String, String)] = Seq(
    ("ascii", "plain ascii stays", "plain ascii stays", "plain ascii stays"),
    ("composed cafe", cp(0x63, 0x61, 0x66, 0xE9),
      cp(0x63, 0x61, 0x66, 0xE9), "cafe"),
    ("decomposed cafe", cp(0x63, 0x61, 0x66, 0x65, 0x301),
      cp(0x63, 0x61, 0x66, 0xE9), "cafe"),
    ("composed nandu", cp(0xF1, 0x61, 0x6E, 0x64, 0xFA),
      cp(0xF1, 0x61, 0x6E, 0x64, 0xFA), "nandu"),
    ("decomposed nandu", cp(0x6E, 0x303, 0x61, 0x6E, 0x64, 0x75, 0x301),
      cp(0xF1, 0x61, 0x6E, 0x64, 0xFA), "nandu"),
    // U+0229 e-with-cedilla + combining acute: no composed e-cedilla-acute
    // exists, so NFC keeps the pair; strip drops BOTH marks.
    ("e-cedilla + acute", cp(0x229, 0x301), cp(0x229, 0x301), "e"),
    ("e + cedilla + acute", cp(0x65, 0x327, 0x301), cp(0x229, 0x301), "e"),
    // a + ogonek + acute: NFC composes a+ogonek to U+0105, acute stays.
    ("a + ogonek + acute", cp(0x61, 0x328, 0x301, 0x62),
      cp(0x105, 0x301, 0x62), cp(0x61, 0x62)),
    ("fi ligature (compat-only)", cp(0xFB01, 0x72, 0x65),
      cp(0xFB01, 0x72, 0x65), cp(0xFB01, 0x72, 0x65)),
    ("fullwidth A (compat-only)", cp(0xFF21, 0x73), cp(0xFF21, 0x73), cp(0xFF21, 0x73)),
    ("o-slash + sharp-s (no decomposition)", cp(0xF8, 0xDF), cp(0xF8, 0xDF), cp(0xF8, 0xDF)),
    ("CJK untouched", cp(0x4E2D, 0x6587, 0x30C6), cp(0x4E2D, 0x6587, 0x30C6),
      cp(0x4E2D, 0x6587, 0x30C6)),
    ("hangul composed", cp(0xD55C, 0xAD6D, 0xC5B4),
      cp(0xD55C, 0xAD6D, 0xC5B4), cp(0xD55C, 0xAD6D, 0xC5B4)),
    ("hangul jamo recomposes", cp(0x1112, 0x1161, 0x11AB), cp(0xD55C), cp(0xD55C)),
    ("supplementary + accent", cp(0x1F600, 0xE9), cp(0x1F600, 0xE9), cp(0x1F600, 0x65)),
    ("empty", "", "", ""))

  test("nfc_normalize and strip_accents match the DuckDB vector table") {
    Graft.prepare(spark)
    val got = vectors.map(_._2).toDF("v")
      .select(expr("nfc_normalize(v)"), expr("strip_accents(v)"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    vectors.zip(got).foreach { case ((label, _, expNfc, expStrip), (gotNfc, gotStrip)) =>
      assert(gotNfc === expNfc, s"nfc_normalize: $label")
      assert(gotStrip === expStrip, s"strip_accents: $label")
    }
  }

  test("null propagates; ascii passes through") {
    Graft.prepare(spark)
    val out = Seq((1, "abc"), (2, null)).toDF("id", "v")
      .select(col("id"), expr("nfc_normalize(v)").as("n"), expr("strip_accents(v)").as("s"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "abc" && out(0).getString(2) === "abc")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("idempotence: applying either function twice is a no-op") {
    Graft.prepare(spark)
    val out = vectors.map(_._2).toDF("v")
      .select(expr("nfc_normalize(v)").as("n1"),
        expr("nfc_normalize(nfc_normalize(v))").as("n2"),
        expr("strip_accents(v)").as("s1"),
        expr("strip_accents(strip_accents(v))").as("s2"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getString(2) === r.getString(3))
    }
  }
}
