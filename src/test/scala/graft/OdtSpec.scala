package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Odt, ZipArchive}

class OdtSpec extends AnyFunSuite {

  private val paras = Seq(
    (true, "Heading one"),
    (false, "body a&b <q> text"),
    (false, "second paragraph"))
  private val doc = Odt.makeOdt(paras)

  test("paragraphs and headings extract in order; spans strip; entities decode") {
    assert(Odt.paragraphs(doc) === Some(paras.toVector))
  }

  test("annotations and commented-out paragraphs never emit") {
    val got = Odt.paragraphs(doc).get.map(_._2).mkString("\n")
    assert(!got.contains("NOTE"))
    assert(!got.contains("GHOST"))
  }

  test("ODF whitespace model: text:s expands by count, tab and line-break render") {
    val ms = ZipArchive.members(doc).get.map(m => (m.name, m.data, m.method != 0))
    val cIdx = ms.indexWhere(_._1 == "content.xml")
    val xml = new String(ms(cIdx)._2, "UTF-8")
    val para = "<text:p>a<text:s text:c=\"3\"/>b<text:tab/>c<text:line-break/>d<text:s/>e</text:p>"
    val swapped = xml.substring(0, xml.indexOf("<text:")) + para +
      "</office:text></office:body></office:document-content>"
    val got = Odt.paragraphs(ZipArchive.makeZip(ms.updated(cIdx,
      ("content.xml", swapped.getBytes("UTF-8"), true))))
    assert(got === Some(Vector((false, "a   b\tc\nd e"))))
  }

  test("text:c beyond Int range rejects (None), never NumberFormatException") {
    val ms = ZipArchive.members(doc).get.map(m => (m.name, m.data, m.method != 0))
    val cIdx = ms.indexWhere(_._1 == "content.xml")
    val xml = new String(ms(cIdx)._2, "UTF-8")
    // 9999999999 > Int.MaxValue: .toInt would throw; 25-digit run breaks
    // even Long parsing — both must reject via the range path
    for (count <- Seq("9999999999", "9" * 25)) {
      val para = s"""<text:p>a<text:s text:c="$count"/>b</text:p>"""
      val swapped = xml.substring(0, xml.indexOf("<text:")) + para +
        "</office:text></office:body></office:document-content>"
      val got = Odt.paragraphs(ZipArchive.makeZip(ms.updated(cIdx,
        ("content.xml", swapped.getBytes("UTF-8"), true))))
      assert(got === None)
    }
  }

  test("package rejects: wrong mimetype content, deflated mimetype, not-first, missing content.xml") {
    val ms = ZipArchive.members(doc).get.map(m => (m.name, m.data, m.method != 0))
    // wrong media type
    val wrongMime = ms.map {
      case ("mimetype", _, st) =>
        ("mimetype", "application/vnd.oasis.opendocument.spreadsheet"
          .getBytes("ISO-8859-1"), st)
      case other => other
    }
    assert(Odt.paragraphs(ZipArchive.makeZip(wrongMime)) === None)
    // mimetype not physically first
    assert(Odt.paragraphs(ZipArchive.makeZip(
      ms.filterNot(_._1 == "mimetype") ++ ms.filter(_._1 == "mimetype"))) === None)
    // deflated mimetype
    assert(Odt.paragraphs(ZipArchive.makeZip(ms.map {
      case ("mimetype", d, _) => ("mimetype", d, true)
      case other => other
    })) === None)
    // missing content.xml
    assert(Odt.paragraphs(ZipArchive.makeZip(
      ms.filterNot(_._1 == "content.xml"))) === None)
    assert(Odt.paragraphs(null) === None)
  }

  test("CRC-covered corruption rejects the whole file") {
    // flip a byte inside content.xml's deflated data
    val idx = {
      val needle = "content.xml".getBytes("US-ASCII")
      var i = 30; var at = -1
      while (at < 0 && i + needle.length <= doc.length) {
        if ((0 until needle.length).forall(k => doc(i + k) == needle(k)) &&
          doc(i - 30) == 'P' && doc(i - 29) == 'K' && doc(i - 28) == 3) at = i
        i += 1
      }
      at
    }
    assert(idx > 0)
    val evil = doc.clone()
    evil(idx + 30) = (evil(idx + 30) ^ 0x2a).toByte
    assert(Odt.paragraphs(evil) === None)
  }
}
