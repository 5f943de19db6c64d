package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Hostile-input fuzz for the two char-walking scalar expressions
  * (html_text, url_normalize): seeded pseudo-random soup built from the
  * fragments that exercise their state machines. The decoders' envelope
  * discipline (DecoderFuzzSpec precedent): never throw, and hold the
  * stated output invariants on EVERY input.
  */
class TextScalarFuzzSpec extends AnyFunSuite {

  private val htmlFragments = Array(
    "<", ">", "&", "%", "\"", "'", "=", "/", " ", "\t", "\n", "\r",
    "<div", "<div>", "</div>", "<!--", "-->", "<!", "<?", "<script>",
    "</script>", "<script/>", "<style>", "</style>", "class=\"a>b\"",
    "title='x>y'", "&amp;", "&lt;", "&#65;", "&#x41;", "&bogus;", "&#;",
    "&#xZZ;", "&nbsp;", "text", "word", "1 < 2", "a>b", "p0 p1",
    "<![CDATA[", "]]>", "é", "中", "\u0000", "\u0007", "%3C", "--")

  private val urlFragments = Array(
    "http://", "HTTPS://", "ftp:", "//", ":", "/", "?", "#", "@", "%",
    "a.com", "EXAMPLE.COM", ":80", ":443", ":8080", "/a/b", "/./", "/../",
    "%41", "%7e", "%2F", "%2E", "%zz", "%2", "q=1", "&r=2", "[2001:DB8::1]",
    "user:pw", "..", ".", "x", "", "mailto:", "No-Scheme", "1:2")

  private def soup(fragments: Array[String], rnd: scala.util.Random): String = {
    val n = 1 + rnd.nextInt(20)
    val sb = new StringBuilder
    (0 until n).foreach(_ => sb.append(fragments(rnd.nextInt(fragments.length))))
    sb.toString
  }

  test("html_text: never throws; whitespace-normalized, trimmed, never longer") {
    val rnd = new scala.util.Random(42)
    (0 until 1000).foreach { i =>
      val in = soup(htmlFragments, rnd)
      val out = graft.functions.HtmlStrip.htmlText(UTF8String.fromString(in)).toString
      assert(out.length <= in.length, s"[$i] grew: '$in' -> '$out'")
      assert(!out.contains('\n') && !out.contains('\r') && !out.contains('\t'),
        s"[$i] raw whitespace survived: '$in' -> '$out'")
      assert(!out.contains("  "), s"[$i] uncollapsed spaces: '$in' -> '$out'")
      assert(out == out.trim, s"[$i] untrimmed: '$in' -> '$out'")
    }
  }

  test("url_normalize: never throws and is idempotent") {
    val rnd = new scala.util.Random(43)
    (0 until 1000).foreach { i =>
      val in = soup(urlFragments, rnd)
      val once = graft.functions.UrlNormalize.normalize(UTF8String.fromString(in)).toString
      val twice = graft.functions.UrlNormalize.normalize(UTF8String.fromString(once)).toString
      assert(twice === once, s"[$i] not idempotent: '$in' -> '$once' -> '$twice'")
    }
  }

  test("html_links: never throws; every link is an href the input contains pre-decode") {
    val rnd = new scala.util.Random(44)
    (0 until 1000).foreach { i =>
      val in = soup(htmlFragments ++ Array("<a ", "<a>", "</a>", "href=",
        "href=\"/x\"", "href='y'", "href=z", "<a href=\"/q?a>b\">"), rnd)
      val arr = graft.functions.HtmlLinks.links(UTF8String.fromString(in))
      // envelope only: terminate, no throw, array materializes
      (0 until arr.numElements()).foreach(j => arr.getUTF8String(j).toString)
    }
  }

  test("html_blocks: never throws; per-block invariants hold on every soup") {
    val rnd = new scala.util.Random(47)
    (0 until 1000).foreach { i =>
      val in = soup(htmlFragments ++ Array("<p>", "</p>", "<div>", "<br>",
        "<a href=x>", "</a>", "<nav>", "</footer>"), rnd)
      val arr = graft.functions.HtmlBlocks.blocks(UTF8String.fromString(in))
      (0 until arr.numElements()).foreach { j =>
        val r = arr.getStruct(j, 2)
        val txt = r.getUTF8String(0).toString
        val links = r.getInt(1)
        assert(txt.nonEmpty && txt == txt.trim && !txt.contains("  "),
          s"[$i/$j] block not collapsed/trimmed: '$txt'")
        assert(links >= 0 && links <= txt.length,
          s"[$i/$j] link chars $links out of range for '$txt'")
      }
    }
  }

  test("url_resolve: never throws; absolute results start with the base or ref scheme") {
    val rnd = new scala.util.Random(45)
    val bases = Array("http://a/b/c/d;p?q", "https://h", "ftp://x/y/", "junk", "")
    (0 until 1000).foreach { i =>
      val b = bases(rnd.nextInt(bases.length))
      val r = soup(urlFragments, rnd)
      val out = graft.functions.UrlResolve.resolve(
        UTF8String.fromString(b), UTF8String.fromString(r))
      if (b == "junk" || b == "") assert(out == null, s"[$i] junk base resolved '$r'")
      else if (out != null) {
        val o = out.toString
        assert(o.contains(':'), s"[$i] no scheme: '$b' + '$r' -> '$o'")
        // resolution then normalization must compose without throwing
        graft.functions.UrlNormalize.normalize(out)
      }
    }
  }

  test("html_text output is stable under the golden wrappers for real corpus text") {
    // the e34b construction applied to a few real documents end-to-end in
    // pure JVM (no Spark job): wrapper + strip must return the text
    val spark = TestSpark.spark
    val texts = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .limit(20).collect().map(_.getAs[String]("text"))
    texts.foreach { t =>
      val html = s"""<html><body><p class="q>r" title='a>b'>$t</p></body></html>"""
      val out = graft.functions.HtmlStrip.htmlText(UTF8String.fromString(html)).toString
      assert(out === t.trim.replaceAll("\\s+", " "))
    }
  }
}
