package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** char_trigrams (the native linear-time Generator behind e33/d14) must be
  * row-for-row identical to the column-algebra chain it replaced —
  * explode(transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)))
  * — including multi-byte codepoints, where "identical" means the same
  * codepoint-counting semantics UTF8String.substring uses.
  */
class CharTrigramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaGenerator(texts: Seq[String]): Seq[(Int, String)] = {
    Graft.prepare(spark)
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
      .select(col("id"), expr("char_trigrams(t)"))
      .collect().toSeq.map(r => (r.getInt(0), r.getString(1)))
  }

  private def viaSubstringChain(texts: Seq[String]): Seq[(Int, String)] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
      .filter(length(col("t")) >= 3) // the chain needs the sequence() guard
      .select(col("id"),
        explode(expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")).as("tri"))
      .collect().toSeq.map(r => (r.getInt(0), r.getString(1)))

  test("identical to the substring chain on ASCII, multi-byte, and mixed text") {
    val texts = Seq(
      "hello world",
      "abc",
      "ab",            // shorter than one trigram -> no rows
      "a",
      "",
      "日本語のテキスト",   // 3-byte CJK codepoints
      "mix日ed中文and ascii",
      "aaéébb",   // 2-byte codepoints
      "😀😁😂x", // supplementary (4-byte) codepoints
      "   ",
      "tab\tand\nnewline")
    assert(viaGenerator(texts) === viaSubstringChain(texts))
  }

  test("randomized parity sweep over a mixed-width alphabet") {
    val alphabet = "abz 09é中日😀" // widths 1,2,3,4
    // fixed-seed LCG so the sweep is deterministic
    var x = 0x2545f4914f6cdd1dL
    def nextInt(bound: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % bound).toInt + bound) % bound
    }
    // alphabet as codepoint strings (the emoji is 2 UTF-16 chars)
    val cps: Array[String] = {
      val b = Seq.newBuilder[String]
      var i = 0
      while (i < alphabet.length) {
        val n = Character.charCount(alphabet.codePointAt(i))
        b += alphabet.substring(i, i + n)
        i += n
      }
      b.result().toArray
    }
    val texts = (0 until 50).map { _ =>
      val len = nextInt(30)
      (0 until len).map(_ => cps(nextInt(cps.length))).mkString
    }
    assert(viaGenerator(texts) === viaSubstringChain(texts))
  }

  test("null input emits no rows") {
    val out = Seq((1, "abcd"), (2, null)).toDF("id", "t")
      .select(col("id"), expr("char_trigrams(t)"))
      .collect().toSeq.map(r => (r.getInt(0), r.getString(1)))
    assert(out === Seq((1, "abc"), (1, "bcd")))
  }
}
