package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Docx, ZipArchive}

class DocxSpec extends AnyFunSuite {

  private val paras = Seq(
    "Hello office world",
    "a&b <c> \"quoted\" 'apos'",
    "tabs and spaces survive  doubled")
  private val doc = Docx.makeDocx(paras)

  test("paragraphs reassemble across split runs, entities decoded") {
    assert(Docx.paragraphs(doc) === Some(paras.toVector))
  }

  test("tracked deletions, field instructions, and commented-out runs never emit") {
    val got = Docx.paragraphs(doc).get.mkString("\n")
    assert(!got.contains("REVISION"))
    assert(!got.contains("PAGE"))
    assert(!got.contains("COMMENTED"))
  }

  test("main part is found through the officeDocument relationship, not a fixed path") {
    val moved = Docx.makeDocx(paras, mainPart = "content/main.xml")
    assert(Docx.paragraphs(moved) === Some(paras.toVector))
    // premise: word/document.xml really is absent
    assert(!ZipArchive.members(moved).get.exists(_.name == "word/document.xml"))
  }

  test("OPC rejects: missing [Content_Types].xml, missing rels, dangling target, wrong content type") {
    val ms = ZipArchive.members(doc).get.map(m => (m.name, m.data, m.method != 0))
    assert(Docx.paragraphs(ZipArchive.makeZip(
      ms.filterNot(_._1 == "[Content_Types].xml"))) === None)
    assert(Docx.paragraphs(ZipArchive.makeZip(
      ms.filterNot(_._1 == "_rels/.rels"))) === None)
    assert(Docx.paragraphs(ZipArchive.makeZip(
      ms.filterNot(_._1 == "word/document.xml"))) === None)
    // content type declared for the wrong part name → unresolvable → reject
    val ctIdx = ms.indexWhere(_._1 == "[Content_Types].xml")
    val ct = new String(ms(ctIdx)._2, "UTF-8")
      .replace("/word/document.xml", "/word/other.xml")
    assert(Docx.paragraphs(ZipArchive.makeZip(ms.updated(ctIdx,
      ("[Content_Types].xml", ct.getBytes("UTF-8"), true)))) === None)
  }

  test("Default-by-extension content-type rule resolves when no Override matches") {
    val ms = ZipArchive.members(doc).get.map(m => (m.name, m.data, m.method != 0))
    val ctIdx = ms.indexWhere(_._1 == "[Content_Types].xml")
    val mainCt =
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"
    val ct =
      s"""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |  <Default Extension="xml" ContentType="$mainCt"/>
         |</Types>""".stripMargin
    val got = Docx.paragraphs(ZipArchive.makeZip(ms.updated(ctIdx,
      ("[Content_Types].xml", ct.getBytes("UTF-8"), true))))
    assert(got === Some(paras.toVector))
  }

  test("tab and break leaves render as control characters in document order") {
    val xmlPara = "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t>" +
      "<w:br/><w:t>c</w:t><w:cr/></w:r></w:p>"
    val ms = ZipArchive.members(doc).get.map(m => (m.name, m.data, m.method != 0))
    val mIdx = ms.indexWhere(_._1 == "word/document.xml")
    val xml = new String(ms(mIdx)._2, "UTF-8")
    val swapped = xml.substring(0, xml.indexOf("<w:p>")) + xmlPara +
      "<w:sectPr/></w:body></w:document>"
    val got = Docx.paragraphs(ZipArchive.makeZip(ms.updated(mIdx,
      ("word/document.xml", swapped.getBytes("UTF-8"), true))))
    assert(got === Some(Vector("a\tb\nc\n")))
  }

  test("numeric entities decode; unknown entities stay verbatim") {
    assert(Docx.unescape("&#65;&#x42;&amp;&bogus;") === "AB&&bogus;")
    // astral-plane numeric entity survives the surrogate round trip
    assert(Docx.unescape("&#x1F600;") === new String(Character.toChars(0x1F600)))
  }

  test("CRC-covered zip corruption rejects the whole file") {
    // flip a byte inside the deflated main part's data region (first
    // occurrence of the name is the LOCAL header at offset idx-30;
    // data begins at idx+17, so idx+40 is 23 bytes into the deflate
    // stream): inflate either fails or the decoded CRC mismatches —
    // the walk must reject (None), never yield silently-wrong text
    val idx = indexOfSlice(doc, "word/document.xml".getBytes("US-ASCII"))
    assert(idx > 0)
    val corrupted = doc.clone()
    corrupted(idx + 40) = (corrupted(idx + 40) ^ 0x5a).toByte
    assert(Docx.paragraphs(corrupted) === None)
  }

  /** First occurrence of `needle` that sits in a LOCAL-header name
    * field (PK\3\4 signature 30 bytes earlier) — a deflated part's
    * body could in principle contain the same byte run.
    */
  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 30
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length && hay(i - 30) == 'P' && hay(i - 29) == 'K' &&
        hay(i - 28) == 3 && hay(i - 27) == 4) return i
      i += 1
    }
    -1
  }
}
