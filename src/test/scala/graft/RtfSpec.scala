package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Rtf

class RtfSpec extends AnyFunSuite {

  private def parse(rtf: String): Option[Vector[String]] =
    Rtf.paragraphs(rtf.getBytes("ISO-8859-1"))

  test("fixture round-trip: mixed plain/hex/unicode runs; destinations and bin never leak") {
    val paras = Seq("Plain para one", "café & 中文 here", "braces {x} and \\slash")
    val got = Rtf.paragraphs(Rtf.makeRtf(paras)).get
    assert(got === paras.toVector)
    val joined = got.mkString
    assert(!joined.contains("Times"))
    assert(!joined.contains("GHOST"))
    assert(!joined.contains("generator"))
  }

  test("unicode escapes: \\uN with uc fallback skipping, negative-N 16-bit convention") {
    // uc1 default: the '?' after \u igores exactly one fallback char
    assert(parse("{\\rtf1 a\\u233?b\\par}") === Some(Vector("aéb")))
    // uc2: two fallback chars skipped, including a \'hh as ONE
    assert(parse("{\\rtf1\\uc2 a\\u233?\\'3fb\\par}") === Some(Vector("aéb")))
    // negative N: -1536 = 64000 = U+FA00
    assert(parse("{\\rtf1 \\u-1536?x\\par}") ===
      Some(Vector("切x")))
    // uc state restores on group close
    assert(parse("{\\rtf1 {\\uc3 }\\u233?z\\par}") === Some(Vector("éz")))
  }

  test("hex escapes decode through cp1252; control symbols render") {
    // \~ is a NON-BREAKING space: U+00A0, not 0x20
    assert(parse("{\\rtf1 \\'e9\\'80 and\\~nb\\_hy\\par}") ===
      Some(Vector("\u00e9\u20ac and\u00a0nb-hy")))
    assert(parse("{\\rtf1 tab\\tab here\\line two\\par}") ===
      Some(Vector("tab\there\ntwo")))
  }

  test("\\binN skips raw bytes blind — hostile braces inside cannot desync the parse") {
    val pre = "{\\rtf1 before{\\pict\\bin6 ".getBytes("ISO-8859-1")
    val hostile = Array[Byte]('}', '}', '{', 0, '\\', '{')
    val post = "}after\\par}".getBytes("ISO-8859-1")
    val got = Rtf.paragraphs(pre ++ hostile ++ post)
    assert(got === Some(Vector("beforeafter")))
  }

  test("field results emit; field instructions (ignorable destination) do not") {
    val rtf = "{\\rtf1 see {\\field{\\*\\fldinst HYPERLINK \"http://x\"}" +
      "{\\fldrslt the link}}.\\par}"
    assert(parse(rtf) === Some(Vector("see the link.")))
  }

  test("rejects: unbalanced braces, truncation, bad magic, bad hex escape, unknown control symbol") {
    assert(parse("{\\rtf1 missing close\\par") === None)
    assert(parse("{\\rtf1 early close}}") === None)
    assert(parse("plain text") === None)
    assert(parse("{\\rtf1 \\'zz\\par}") === None)
    assert(parse("{\\rtf1 \\#odd\\par}") === None)
    assert(Rtf.paragraphs(null) === None)
    // \bin length past EOF
    assert(parse("{\\rtf1 {\\pict\\bin999 x}\\par}") === None)
  }

  test("raw newlines between tokens are not text; \\<newline> is a paragraph-ish break") {
    assert(parse("{\\rtf1 one\ntwo\\par}") === Some(Vector("onetwo")))
    assert(parse("{\\rtf1 one\\\ntwo\\par}") === Some(Vector("one\ntwo")))
  }
}
