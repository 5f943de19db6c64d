package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Golden vectors for the char-level `html_text` extractor — each row is a
  * case the e34 regex chain cannot (or can only accidentally) handle,
  * with the HTML5-correct expectation stated inline. Direct function
  * tests (no Spark session needed) plus one SQL registration check.
  */
class HtmlStripSpec extends AnyFunSuite {

  private def strip(html: String): String =
    HtmlStripHelper.strip(html)

  test("quoted attribute values may contain '>' (the regex killer)") {
    assert(strip("""<div class="x>y" title='a>b'>inner</div>""") === "inner")
    assert(strip("""<p data-q="1>2>3">a</p><p>b</p>""") === "a b")
  }

  test("script/style are RAWTEXT: content skipped to the real close tag") {
    assert(strip("""<script type="a>b">if (a<b && c>d) { }</script>ok""") === "ok")
    assert(strip("""<style media="x>y">p:after{content:">"}</style>ok""") === "ok")
    // HTML5: a close tag "inside" a JS string still terminates raw text
    assert(strip("""<script>var s = "</script>"; rest</script>x""")
      === "\"; rest x")
    // close tag with whitespace / attributes before '>'
    assert(strip("""<script>a=1</script  >done""") === "done")
    assert(strip("""<SCRIPT>a=1</SCRIPT>case""") === "case")
    // self-closed <script/> still enters raw text (HTML5 ignores the /)
    assert(strip("""<script/>hidden</script>vis""") === "vis")
    // unterminated raw text swallows to EOF
    assert(strip("""before<script>never closed""") === "before")
  }

  test("comments per HTML5: first --> closes; tail renders as text") {
    assert(strip("""a<!-- outer <!-- inner --> tail -->b""") === "a tail -->b")
    assert(strip("""a<!-- unterminated""") === "a")
    assert(strip("""<!--c-->x<!--d-->""") === "x")
  }

  test("bogus comments (doctype, processing instructions) skip to '>'") {
    assert(strip("""<!DOCTYPE html><p>t</p>""") === "t")
    assert(strip("""<?php echo 1; ?>t""") === "t")
  }

  test("'<' not opening a tag is literal text") {
    assert(strip("""<p>1 < 2 and 3 > 1</p>""") === "1 < 2 and 3 > 1")
    assert(strip("""a < b""") === "a < b")
    assert(strip("""5<6""") === "5<6")
  }

  test("entities decode once, never re-scanned; invalid stay literal") {
    assert(strip("""&amp;amp; &lt;tag&gt; &quot;q&quot; &apos;a&apos;""")
      === "&amp; <tag> \"q\" 'a'")
    assert(strip("""A&nbsp;B""") === "A B")
    assert(strip("""&#65;&#x42;&#x63;""") === "ABc")
    assert(strip("""&bogus; &#xZZ; &#1114112; &#xD800; & x""")
      === "&bogus; &#xZZ; &#1114112; &#xD800; & x")
    // entity-smuggled markup stays text (decode happens in TEXT state,
    // decoded output is never re-parsed)
    assert(strip("""&lt;script&gt;alert(1)&lt;/script&gt;""")
      === "<script>alert(1)</script>")
  }

  test("tags and comments separate words; whitespace collapses; ends trim") {
    assert(strip("""<p>a</p><p>b</p>""") === "a b")
    assert(strip("""a<b>bold</b>c""") === "a bold c")
    assert(strip(" \n\t <p>  x \r\n y  </p> ") === "x y")
    assert(strip("""<br><hr/>""") === "")
    assert(strip("""<ul><li>a<li>b</ul>""") === "a b")
  }

  test("unterminated tag at EOF emits nothing (HTML5 EOF-in-tag)") {
    assert(strip("""done<div class="x""") === "done")
    assert(strip("""done<a href='y""") === "done")
  }

  test("non-ASCII and astral text passes through") {
    assert(strip("""<p>café 中文 𝔘𝔫𝔦</p>""") === "café 中文 𝔘𝔫𝔦")
  }

  test("null-safe SQL registration as html_text") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = Seq("""<div title="a>b">ok</div>""", null)
      .toDF("h").selectExpr("html_text(h) AS t").collect()
    assert(r(0).getString(0) === "ok")
    assert(r(1).isNullAt(0))
  }
}

/** Indirection so the spec body reads as vectors. */
private object HtmlStripHelper {
  def strip(html: String): String =
    graft.functions.HtmlStrip.htmlText(UTF8String.fromString(html)).toString
}
