package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Epub, ZipArchive}

class EpubSpec extends AnyFunSuite {

  private val chs = (0 until 4).map(i =>
    (s"ch$i.xhtml", s"<html><body><p>chapter $i body</p></body></html>"))
  private val book = Epub.makeEpub(chs)

  test("chapters come back in SPINE order even though the zip stores them reversed") {
    val got = Epub.chapters(book).get
    assert(got.map(_._1) === Vector(0, 1, 2, 3))
    assert(got.map(_._2) === chs.map(_._1).toVector)
    assert(got.map(_._3) === chs.map(_._2).toVector)
    // premise check: the container really does store chapters reversed
    val names = ZipArchive.members(book).get.map(_.name)
    val chapterNames = names.filter(_.endsWith(".xhtml"))
    assert(chapterNames === chs.reverse.map(c => s"OEBPS/${c._1}"))
  }

  test("OCF mimetype discipline: wrong name, position, method, or content rejects") {
    val ms = ZipArchive.members(book).get
    def rebuilt(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] =
      ZipArchive.makeZip(entries)
    val asEntries = ms.map(m => (m.name, m.data, m.method != 0))
    // mimetype not first
    assert(Epub.chapters(rebuilt(asEntries.tail :+ asEntries.head)) === None)
    // mimetype DEFLATED (OCF requires stored)
    val deflated = asEntries.updated(0, (asEntries.head._1, asEntries.head._2, true))
    assert(Epub.chapters(rebuilt(deflated)) === None)
    // wrong content
    val wrong = asEntries.updated(0,
      ("mimetype", "application/zip".getBytes("US-ASCII"), false))
    assert(Epub.chapters(rebuilt(wrong)) === None)
  }

  test("missing container.xml, dangling spine idref, missing chapter member reject") {
    val ms = ZipArchive.members(book).get.map(m => (m.name, m.data, m.method != 0))
    val noContainer = ms.filterNot(_._1 == "META-INF/container.xml")
    assert(Epub.chapters(ZipArchive.makeZip(noContainer)) === None)
    // drop one chapter member: its spine entry dangles → whole book rejects
    val noCh2 = ms.filterNot(_._1 == "OEBPS/ch2.xhtml")
    assert(Epub.chapters(ZipArchive.makeZip(noCh2)) === None)
    // spine referencing an id absent from the manifest
    val opfIdx = ms.indexWhere(_._1 == "OEBPS/content.opf")
    val opf = new String(ms(opfIdx)._2, "UTF-8")
    val badOpf = opf.replace("idref=\"ch0\"", "idref=\"ghost\"")
    val swapped = ms.updated(opfIdx,
      ("OEBPS/content.opf", badOpf.getBytes("UTF-8"), true))
    assert(Epub.chapters(ZipArchive.makeZip(swapped)) === None)
  }

  test("commented-out itemrefs and rootfiles are ignored, not honored") {
    val ms = ZipArchive.members(book).get.map(m => (m.name, m.data, m.method != 0))
    val opfIdx = ms.indexWhere(_._1 == "OEBPS/content.opf")
    val opf = new String(ms(opfIdx)._2, "UTF-8")
    // a commented-out itemref naming a manifest id that RESOLVES: if the
    // comment leaks into the spine, ch0 appears twice (wrong output)
    val ghosted = opf.replace("<spine>",
      "<spine>\n    <!-- <itemref idref=\"ch0\"/> -->")
    val withGhost = ms.updated(opfIdx,
      ("OEBPS/content.opf", ghosted.getBytes("UTF-8"), true))
    val got = Epub.chapters(ZipArchive.makeZip(withGhost)).get
    assert(got.map(_._2) === chs.map(_._1).toVector, "comment leaked into spine")
    // a commented-out rootfile BEFORE the real one must not win
    val cIdx = ms.indexWhere(_._1 == "META-INF/container.xml")
    val cx = new String(ms(cIdx)._2, "UTF-8")
    val decoyed = cx.replace("<rootfiles>",
      "<rootfiles>\n    <!-- <rootfile full-path=\"OEBPS/ghost.opf\"/> -->")
    val withDecoy = ms.updated(cIdx,
      ("META-INF/container.xml", decoyed.getBytes("UTF-8"), true))
    assert(Epub.chapters(ZipArchive.makeZip(withDecoy)).get.size === chs.size)
  }

  test("percent-encoded and dot-segment hrefs resolve; root escape rejects") {
    // member stored with a space; manifest href percent-encodes it, and
    // one href routes through a ../ that re-enters OEBPS
    val ms = ZipArchive.members(book).get.map(m => (m.name, m.data, m.method != 0))
    val opfIdx = ms.indexWhere(_._1 == "OEBPS/content.opf")
    val opf = new String(ms(opfIdx)._2, "UTF-8")
    val renamed = ms.map {
      case ("OEBPS/ch1.xhtml", d, z) => ("OEBPS/ch one.xhtml", d, z)
      case e => e
    }
    val opf2 = opf
      .replace("href=\"ch1.xhtml\"", "href=\"ch%20one.xhtml\"")
      .replace("href=\"ch2.xhtml\"", "href=\"../OEBPS/./ch2.xhtml\"")
    val rebuilt = ZipArchive.makeZip(renamed.updated(opfIdx,
      ("OEBPS/content.opf", opf2.getBytes("UTF-8"), true)))
    val got = Epub.chapters(rebuilt).get
    assert(got.map(_._3) === chs.map(_._2).toVector, "content must be unchanged")
    // an href escaping the archive root rejects the book
    val escape = opf.replace("href=\"ch3.xhtml\"", "href=\"../../etc\"")
    val esc = ZipArchive.makeZip(ms.updated(opfIdx,
      ("OEBPS/content.opf", escape.getBytes("UTF-8"), true)))
    assert(Epub.chapters(esc) === None)
  }

  test("underlying zip corruption rejects through the composed walk") {
    // flip inside the STORED mimetype content — a CRC-covered data byte
    // (an arbitrary mid-file flip may land in an unauthenticated zip
    // header field the format itself does not protect)
    val needle = "epub+zip".getBytes("US-ASCII")
    val at = book.indexOfSlice(needle)
    assert(at > 0, "stored mimetype bytes must be findable")
    val k = book.clone()
    k(at) = (k(at) ^ 0x40).toByte
    assert(Epub.chapters(k) === None)
    for (cut <- Seq(3, 30, book.length / 2, book.length - 5))
      assert(Epub.chapters(book.take(cut)) === None, s"cut=$cut")
    assert(Epub.chapters("not an epub at all".getBytes) === None)
  }
}
