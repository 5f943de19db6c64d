package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HtmlMeta, MetaCharset}
import org.apache.spark.unsafe.types.UTF8String

/** Golden vectors for `html_meta` (title / description / lang / charset
  * extraction) and the byte-level WHATWG meta prescan + full in-document
  * sniff cascade (`meta_charset` / `detect_charset_html` /
  * `sniff_text_html`). Each parser rule pinned in isolation, hostile
  * shapes from the html_text family reused, plus never-throw fuzz.
  */
class HtmlMetaSpec extends AnyFunSuite {

  private def m(html: String): (String, String, String, String) = {
    val r = HtmlMeta.meta(UTF8String.fromString(html))
    def f(i: Int): String = if (r.isNullAt(i)) null else r.getUTF8String(i).toString
    (f(0), f(1), f(2), f(3))
  }
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---------------- html_meta: title ----------------

  test("title: first element wins, entities decode once, whitespace collapses") {
    val (t, _, _, _) = m("<html><head><title>  A &amp;\n B  </title><title>no</title></head>")
    assert(t === "A & B")
  }

  test("title: empty element is empty string, absent is null") {
    assert(m("<title></title>")._1 === "")
    assert(m("<p>no title</p>")._1 === null)
  }

  test("title: RCDATA — inner '<' is literal text, not a tag") {
    assert(m("<title>a < b</title>")._1 === "a < b")
    // a <b> inside title is text too (RCDATA has no elements)
    assert(m("<title>x <b>y</b> z</title>")._1 === "x <b>y</b> z")
  }

  test("title inside a comment or script body is not a title") {
    assert(m("<!-- <title>ghost</title> --><title>real</title>")._1 === "real")
    assert(m("<script>document.write('<title>js</title>')</script><title>real</title>")._1 === "real")
  }

  test("title: quoted '>' in an earlier attribute does not derail the walk") {
    assert(m("""<div data-x="a>b"><title>ok</title></div>""")._1 === "ok")
  }

  test("title: unterminated at EOF yields the remaining text") {
    assert(m("<title>tail")._1 === "tail")
  }

  // ---------------- html_meta: description ----------------

  test("description: case-insensitive name, first content wins in-tag") {
    val h = """<META NAME="Description" CONTENT="first" content="dup">"""
    assert(m(h)._2 === "first")
  }

  test("description: entities decode, whitespace collapses; later meta can supply it") {
    assert(m("""<meta name=description content=" a&amp;b   c ">""")._2 === "a&b c")
    // a description-less meta does not block a later one
    val h = """<meta name="description"><meta name="description" content="real">"""
    assert(m(h)._2 === "real")
  }

  test("description: unrelated meta names yield nothing") {
    assert(m("""<meta name="keywords" content="a,b">""")._2 === null)
  }

  // ---------------- html_meta: lang ----------------

  test("lang: first html tag's lang, lowercased and trimmed; empty is null") {
    assert(m("""<html LANG=" EN-us "><body/></html>""")._3 === "en-us")
    assert(m("""<html lang=""><html lang="fr">""")._3 === null) // first html wins, empty -> null
    assert(m("""<body lang="de">""")._3 === null) // only <html> carries page lang
  }

  // ---------------- html_meta: charset ----------------

  test("charset: meta charset attr, lowercased, unfolded") {
    assert(m("""<meta charset="UTF-8">""")._4 === "utf-8")
    assert(m("""<meta charset=ISO-8859-1>""")._4 === "iso-8859-1") // field as authored
  }

  test("charset: http-equiv content-type form, quoted and unquoted params") {
    assert(m("""<meta http-equiv="Content-Type" content="text/html; charset=Windows-1252">""")._4
      === "windows-1252")
    assert(m("""<meta http-equiv=content-type content="text/html; charset='utf-8'">""")._4
      === "utf-8")
  }

  test("charset: first declaration in document order wins across both forms") {
    val h = """<meta http-equiv=content-type content="text/html; charset=a1">
              |<meta charset=b2>""".stripMargin
    // 'a1' is the first YIELDING meta at the html_meta layer (no folding)
    assert(m(h)._4 === "a1")
  }

  test("charset: http-equiv of another kind yields nothing") {
    assert(m("""<meta http-equiv="refresh" content="5; charset=utf-8 is not real">""")._4 === null)
  }

  // ---------------- charsetFromContent algorithm ----------------

  test("extract-from-content: whitespace around '=', quote rules, ; terminator") {
    import HtmlMeta.charsetFromContent
    assert(charsetFromContent("text/html; charset = utf-8") === "utf-8")
    assert(charsetFromContent("charset='w-1'; x") === "w-1")
    assert(charsetFromContent("""charset="q2"rest""") === "q2")
    assert(charsetFromContent("charset='unclosed") === null)
    assert(charsetFromContent("nocharsethere") === null)
    // 'charset' with no '=' continues scanning to a later one
    assert(charsetFromContent("charset charset=late") === "late")
    assert(charsetFromContent("x-charset=wins-too") === "wins-too")
  }

  // ---------------- meta_charset byte prescan ----------------

  private def pre(s: String): String = MetaCharset.prescan(s.getBytes("ISO-8859-1"))

  test("prescan: charset attr and http-equiv both yield, labels fold") {
    assert(pre("""<meta charset=utf-8>""") === "utf-8")
    assert(pre("""<meta charset="ISO-8859-1">""") === "windows-1252") // Encoding Standard fold
    assert(pre("""<meta http-equiv="Content-Type" content="text/html; charset=latin1">""")
      === "windows-1252")
    assert(pre("""<meta charset=UTF-16LE>""") === "utf-8") // utf-16 family folds to utf-8
    assert(pre("""<meta charset=x-user-defined>""") === "windows-1252")
  }

  test("prescan: unknown label continues to a later meta; none -> null") {
    assert(pre("""<meta charset=klingon><meta charset=utf-8>""") === "utf-8")
    assert(pre("""<meta charset=klingon>""") === null)
    assert(pre("<p>hello</p>") === null)
  }

  test("prescan: comments and quote-traps are excluded") {
    assert(pre("""<!-- <meta charset=utf-8> --><p>x</p>""") === null)
    assert(pre("""<!--> <meta charset=utf-8>""") === "utf-8") // <!--> closes immediately
    assert(pre("""<div data-x="<meta charset=utf-8>"></div>""") === null)
  }

  test("prescan: only the first 1024 bytes count; structures open at the window abort") {
    val pad = "x" * 1100
    assert(pre(pad + "<meta charset=utf-8>") === null)
    val inWindow = "<p>" + ("x" * 900) + "</p><meta charset=utf-8>"
    assert(pre(inWindow) === "utf-8")
    // comment still open at the 1024 boundary hides everything after
    assert(pre("<!--" + ("y" * 1200) + "--><meta charset=utf-8>") === null)
  }

  test("prescan: meta needs the http-equiv to be content-type for the content form") {
    assert(pre("""<meta content="charset=utf-8">""") === null)
    assert(pre("""<meta http-equiv=refresh content="charset=utf-8">""") === null)
  }

  // ---------------- full cascade: detect_charset_html / sniff_text_html ----------------

  private def det(b: Array[Byte]): String = MetaCharset.charsetOf(b).toString
  private def txt(b: Array[Byte]): String = MetaCharset.sniffText(b).toString

  test("cascade: BOM outranks a contradicting meta") {
    val b = bytes(0xef, 0xbb, 0xbf) ++
      "<meta charset=windows-1252><p>café</p>".getBytes("UTF-8")
    assert(det(b) === "UTF-8")
    assert(txt(b).contains("café"))
  }

  test("cascade: meta prescan outranks UTF-8 validity (the mojibake rule)") {
    // valid UTF-8 bytes, but the page DECLARES windows-1252: browsers
    // decode per the declaration, so é (C3 A9) renders as Ã©
    val b = "<meta charset=windows-1252><p>café</p>".getBytes("UTF-8")
    assert(det(b) === "windows-1252")
    assert(txt(b).contains("cafÃ©"))
  }

  test("cascade: no meta falls through to strict UTF-8 validation, then 1252") {
    assert(det("<p>café</p>".getBytes("UTF-8")) === "UTF-8")
    val cp = "<p>quote ".getBytes("US-ASCII") ++ bytes(0x93, 0x94) ++ "</p>".getBytes("US-ASCII")
    assert(det(cp) === "windows-1252")
    assert(txt(cp).contains("“”"))
  }

  test("cascade: meta declaring utf-8 on broken bytes decodes with U+FFFD, never throws") {
    val b = "<meta charset=utf-8><p>".getBytes("US-ASCII") ++ bytes(0xff, 0xfe) ++
      "</p>".getBytes("US-ASCII")
    assert(det(b) === "utf-8")
    assert(txt(b).contains("�"))
  }

  // ---------------- never-throw fuzz ----------------

  test("html_meta and the prescan terminate and never throw on hostile soup") {
    val rnd = new scala.util.Random(47)
    val tokens = Seq("<meta ", "charset", "=", "\"", "'", ">", "<!--", "-->",
      "<title>", "</title>", "http-equiv", "content", "utf-8", "&amp;", "<", "a",
      "é", " ", "/", "<html lang=", "name=description ")
    (0 until 1000).foreach { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(30)).foreach(_ => sb.append(tokens(rnd.nextInt(tokens.length))))
      val s = sb.toString
      val r = HtmlMeta.meta(UTF8String.fromString(s)) // must not throw
      assert(r.numFields === 4)
      val b = s.getBytes("UTF-8")
      MetaCharset.prescan(b) // must not throw
      MetaCharset.sniffText(b) // must not throw
    }
    (0 until 500).foreach { _ =>
      val b = Array.fill(rnd.nextInt(96))(rnd.nextInt(256).toByte)
      MetaCharset.prescan(b)
      MetaCharset.sniffText(b)
    }
  }

  test("SQL surface: all four functions registered and typed") {
    val spark = TestSpark.spark
    Graft.prepare(spark)
    val r = spark.sql("""SELECT
        html_meta('<html lang=en><title>T</title><meta charset=UTF-8>') AS hm,
        meta_charset(cast('<meta charset=latin1>' AS BINARY)) AS mc,
        detect_charset_html(cast('plain' AS BINARY)) AS dc,
        sniff_text_html(cast('<meta charset=windows-1252>ok' AS BINARY)) AS st""").head()
    val hm = r.getStruct(0)
    assert(hm.getString(0) === "T" && hm.getString(2) === "en" && hm.getString(3) === "utf-8")
    assert(r.getString(1) === "windows-1252")
    assert(r.getString(2) === "UTF-8")
    // sniff decodes the WHOLE document (stripping is html_text's job)
    assert(r.getString(3) === "<meta charset=windows-1252>ok")
  }
}
