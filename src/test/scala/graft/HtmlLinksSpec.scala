package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Golden vectors for the char-level `html_links` extractor — the
  * anchor-tag cases a regex `href="..."` scan gets wrong, each with the
  * HTML5-correct expectation. Direct function tests, no Spark session.
  */
class HtmlLinksSpec extends AnyFunSuite {

  private def links(html: String): Seq[String] = {
    val a = graft.functions.HtmlLinks.links(UTF8String.fromString(html))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("basic anchors in document order; non-anchor hrefs ignored") {
    assert(links("""<a href="/x">1</a><p><a href='y'>2</a></p>""")
      === Seq("/x", "y"))
    assert(links("""<link href="/css"><area href="/map"><a href="/a">x</a>""")
      === Seq("/a"))
  }

  test("quoted '>' inside other attributes does not end the tag") {
    assert(links("""<a title="x>y" href="/real">t</a>""") === Seq("/real"))
    assert(links("""<a href="/q?a>b">t</a>""") === Seq("/q?a>b"))
  }

  test("anchors in comments, bogus comments and raw text are not links") {
    assert(links("""<!-- <a href="/hidden">h</a> --><a href="/vis">v</a>""")
      === Seq("/vis"))
    assert(links("""<script>document.write('<a href="/js">');</script><a href="/ok">o</a>""")
      === Seq("/ok"))
    assert(links("""<style>a:after{content:'<a href=/css>'}</style><a href=/ok2>o</a>""")
      === Seq("/ok2"))
    assert(links("""<!doctype html <a href="/bogus">><a href="/real">r</a>""")
      === Seq("/real"))
  }

  test("attribute forms: unquoted, case-insensitive name, first href wins") {
    assert(links("""<a href=/unquoted rel=nofollow>x</a>""") === Seq("/unquoted"))
    assert(links("""<a HREF="/caps">x</a>""") === Seq("/caps"))
    assert(links("""<a href="/first" href="/second">x</a>""") === Seq("/first"))
    assert(links("""<a id=z href = "/spaced">x</a>""") === Seq("/spaced"))
  }

  test("entities in the value decode once; empty/valueless href kept") {
    assert(links("""<a href="/e?a=1&amp;b=2">x</a>""") === Seq("/e?a=1&b=2"))
    assert(links("""<a href="&amp;amp;">x</a>""") === Seq("&amp;"))
    assert(links("""<a href="">self</a><a href>bare</a>""") === Seq("", ""))
  }

  test("closing tags and EOF-in-tag contribute nothing") {
    assert(links("""</a href="/not"><a href="/yes">x</a>""") === Seq("/yes"))
    assert(links("""<a href="/truncated""") === Seq.empty)
    assert(links("""text with no tags, 1 < 2""") === Seq.empty)
  }

  // ---------------- html_anchors: anchor TEXT extraction ----------------

  private def anchors(html: String): Seq[(String, String)] = {
    val arr = graft.functions.HtmlLinks.anchors(UTF8String.fromString(html))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
  }

  test("anchors: text collected, inner tags separate, entities decode, ws collapses") {
    assert(anchors("""<a href="/p">  read   this </a>""") === Seq(("/p", "read this")))
    assert(anchors("""<a href="/b">bold<b>strong</b>end</a>""")
      === Seq(("/b", "bold strong end")))
    assert(anchors("""<a href="/e">x &amp; y</a>""") === Seq(("/e", "x & y")))
  }

  test("anchors: new <a> implicitly closes the open one; EOF closes too") {
    assert(anchors("""<a href="/x">outer <a href="/y">inner</a>""")
      === Seq(("/x", "outer"), ("/y", "inner")))
    assert(anchors("""<a href="/z">tail text""") === Seq(("/z", "tail text")))
  }

  test("anchors: comments, script bodies and stray '<' inside text") {
    assert(anchors("""<a href="/c">a<!-- hidden -->b</a>""")
      === Seq(("/c", "a b")))
    assert(anchors("""<script>'<a href=/js>x</a>'</script><a href="/r">real</a>""")
      === Seq(("/r", "real")))
    assert(anchors("""<a href="/lt">1 < 2</a>""") === Seq(("/lt", "1 < 2")))
  }

  test("anchors: href rules match html_links (first wins, quotes, valueless)") {
    assert(anchors("""<a title="x>y" HREF='/q' href=/dup>t</a>""")
      === Seq(("/q", "t")))
    assert(anchors("""<a href>bare</a>""") === Seq(("", "bare")))
    // an <a> with NO href attribute is a named anchor target, not a
    // link — emits nothing (links() parity; a "" here would resolve to
    // the page itself and pollute the anchor-text index)
    assert(anchors("""<a name="top">Introduction</a><a href="/r">real</a>""")
      === Seq(("/r", "real")))
  }

  test("anchors: hostile soup terminates, never throws, hrefs agree with links()") {
    val rnd = new scala.util.Random(52)
    val tokens = Seq("<a ", "href", "=", "\"", "'", ">", "</a>", "<!--", "-->",
      "<b>", "</b>", "<script>", "</script>", "text ", "&amp;", "<", "/x",
      " name=t ", "é", "<a href=/q>")
    (0 until 1000).foreach { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(30)).foreach(_ => sb.append(tokens(rnd.nextInt(tokens.length))))
      val html = sb.toString
      val as = anchors(html) // must not throw
      // href parity: every href emitted by anchors() is one links() emits
      // (anchors may emit FEWER only never — both walk the same tags);
      // exact multiset equality pins the shared discipline
      assert(as.map(_._1) === links(html), html)
    }
  }
}
