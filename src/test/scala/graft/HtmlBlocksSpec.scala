package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Golden vectors for the `html_blocks` segmenter: block-boundary
  * flushing, inline-tag word separation, anchor-char accounting, and
  * the shared html_text discipline (comments, RAWTEXT, quoted '>',
  * entities). Direct function tests, no Spark session.
  */
class HtmlBlocksSpec extends AnyFunSuite {

  private def blocks(html: String): Seq[(String, Int)] = {
    val a = graft.functions.HtmlBlocks.blocks(UTF8String.fromString(html))
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getInt(1))
    }
  }

  test("block tags flush; inline tags separate words within a block") {
    assert(blocks("<p>one two</p><div>three</div>")
      === Seq(("one two", 0), ("three", 0)))
    assert(blocks("<p>a<b>bold</b>c</p>") === Seq(("a bold c", 0)))
    assert(blocks("line one<br>line two") === Seq(("line one", 0), ("line two", 0)))
  }

  test("anchor text chars count toward links; separators do not") {
    assert(blocks("""<nav><a href="/">home</a> <a href="/a">about</a></nav>""")
      === Seq(("home about", 9)))
    assert(blocks("""<p>read <a href="/x">this link</a> now</p>""")
      === Seq(("read this link now", 8))) // "thislink" = 8 anchor chars
  }

  test("unclosed anchor stops at the block boundary (per-block accounting)") {
    assert(blocks("""<div><a href="/x">everything</div><p>clean</p>""")
      === Seq(("everything", 10), ("clean", 0)))
  }

  test("comments, RAWTEXT and quoted '>' follow the html_text discipline") {
    assert(blocks("""<p>keep<!-- <p>gone</p> --></p>""") === Seq(("keep", 0)))
    assert(blocks("""<script>var p = "<p>x</p>";</script><p>real</p>""")
      === Seq(("real", 0)))
    assert(blocks("""<p title="a>b">t</p>""") === Seq(("t", 0)))
    assert(blocks("""<p>1 &amp; 2 &lt;ok&gt;</p>""") === Seq(("1 & 2 <ok>", 0)))
  }

  test("blank blocks drop; text outside any tag is its own block") {
    assert(blocks("<div>  </div><p>x</p>") === Seq(("x", 0)))
    assert(blocks("bare text") === Seq(("bare text", 0)))
    assert(blocks("") === Seq.empty)
  }
}
