package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DOCX text extraction — office documents are a first-class
  * pretraining source (institutional archives, public-records drops,
  * document dumps all ship `.docx`). A DOCX is an OPC package
  * (ECMA-376 Part 2): a zip whose part roles are declared, not
  * implied by path — so this operator, like [[Epub]], is a
  * COMPOSITION of validated machinery: the CRC-verifying
  * [[ZipArchive]] walk underneath plus the scoped-regex XML field
  * discipline, with the OPC indirection honored rather than
  * hardcoded.
  *
  * Validation (OPC + WordprocessingML, reject-don't-guess):
  *  - `[Content_Types].xml` must exist, and the MAIN DOCUMENT PART's
  *    content type must resolve (Override by part name first, then
  *    Default by extension — the spec's two-level rule) to the
  *    WordprocessingML main-document type;
  *  - `_rels/.rels` must carry an `officeDocument` relationship whose
  *    Target names the main part — the part is FOUND THROUGH THE
  *    RELATIONSHIP, never assumed at `word/document.xml` (producers
  *    may legally place it elsewhere; the fixture rotates the path to
  *    prove the routing);
  *  - a dangling target, a missing content-type declaration, or any
  *    underlying zip inconsistency rejects the whole file.
  *
  * Text semantics (the exclusion discipline is the point — each of
  * these, if leaked, silently corrupts a training corpus):
  *  - one row per `<w:p>` paragraph, `<w:t>` runs concatenated in
  *    document order (Word splits a single visual word across runs at
  *    every formatting boundary, so concatenation must be exact);
  *  - `<w:tab/>` → TAB, `<w:br/>` / `<w:cr/>` → LF;
  *  - tracked DELETIONS (`<w:del>` wrappers and any stray
  *    `<w:delText>`) never emit — they are revision history, not text;
  *  - field instruction codes (`<w:instrText>`, e.g. ` PAGE `,
  *    ` HYPERLINK "…" `) never emit — they are machine instructions
  *    whose cached result, if any, lives in ordinary `<w:t>` runs;
  *  - XML comments strip before any scan (a commented-out run must
  *    not emit);
  *  - XML entities (named + numeric) decode, so `&amp;` in storage is
  *    `&` in the corpus.
  *
  * Shape at 100 TB: per-file parallelism (a document is the natural
  * split unit), scan-local walk, zero shuffle.
  */
object Docx {

  private val MainCt =
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"
  private val OfficeDocRel =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"

  // compiled once per JVM (per-document hot path)
  private val CommentR = "(?s)<!--.*?-->".r
  private val OverrideR = "<Override\\b[^>]*>".r
  private val DefaultR = "<Default\\b[^>]*>".r
  private val PartNameR = "\\bPartName=\"([^\"]+)\"".r
  private val ExtensionR = "\\bExtension=\"([^\"]+)\"".r
  private val CtR = "\\bContentType=\"([^\"]+)\"".r
  private val RelR = "<Relationship\\b[^>]*>".r
  private val RelTypeR = "\\bType=\"([^\"]+)\"".r
  private val TargetR = "\\bTarget=\"([^\"]+)\"".r
  // a paragraph: <w:p> or <w:p attrs> up to </w:p>; w:p never nests in
  // another w:p (tables nest w:p inside w:tc, not w:p inside w:p), so
  // the non-greedy span is exact. Self-closing <w:p/> is an empty
  // paragraph.
  private val ParaR = "(?s)<w:p(?:\\s[^>]*)?/>|<w:p(?:\\s[^>]*)?>.*?</w:p>".r
  private val DelR = "(?s)<w:del(?:\\s[^>]*)?>.*?</w:del>".r
  private val InstrR = "(?s)<w:instrText(?:\\s[^>]*)?>.*?</w:instrText>".r
  private val DelTextR = "(?s)<w:delText(?:\\s[^>]*)?>.*?</w:delText>".r
  // text-bearing leaves, in document order
  private val LeafR =
    "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>|<w:tab\\s*/>|<w:br(?:\\s[^>]*)?/>|<w:cr\\s*/>".r

  /** XML entity decode: the five named entities plus numeric
    * (`&#NNN;` / `&#xHHH;`) forms. Unknown entities are left verbatim
    * — a lenient decode here would be silent corruption, and leaving
    * the raw text visible makes the problem findable downstream.
    */
  private[graft] def unescape(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else ""
        val rep: String = ent match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            try { new String(Character.toChars(Integer.parseInt(e.drop(2), 16))) }
            catch { case _: Exception => null }
          case e if e.startsWith("#") =>
            try { new String(Character.toChars(Integer.parseInt(e.drop(1)))) }
            catch { case _: Exception => null }
          case _ => null
        }
        if (rep != null) { sb.append(rep); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Resolve a part's content type per OPC's two-level rule:
    * Override by exact part name wins, else Default by extension.
    * `part` is archive-member form (no leading slash).
    */
  private def contentTypeOf(ctXml: String, part: String): Option[String] = {
    val byName = OverrideR.findAllIn(ctXml).collectFirst {
      case tag if PartNameR.findFirstMatchIn(tag).exists(_.group(1) == "/" + part) =>
        CtR.findFirstMatchIn(tag).map(_.group(1))
    }.flatten
    byName.orElse {
      val ext = part.lastIndexOf('.') match {
        case -1 => return None
        case i => part.substring(i + 1)
      }
      DefaultR.findAllIn(ctXml).collectFirst {
        case tag if ExtensionR.findFirstMatchIn(tag)
            .exists(_.group(1).equalsIgnoreCase(ext)) =>
          CtR.findFirstMatchIn(tag).map(_.group(1))
      }.flatten
    }
  }

  /** Paragraph texts in document order; None on any OPC violation or
    * underlying zip inconsistency.
    */
  def paragraphs(zipBytes: Array[Byte]): Option[Vector[String]] = {
    val ms = ZipArchive.members(zipBytes).getOrElse(return None)
    val byName = ms.map(m => m.name -> m).toMap
    val ctPart = byName.getOrElse("[Content_Types].xml", return None)
    val ctXml = CommentR.replaceAllIn(
      new String(ctPart.data, java.nio.charset.StandardCharsets.UTF_8), " ")
    val rels = byName.getOrElse("_rels/.rels", return None)
    val relXml = CommentR.replaceAllIn(
      new String(rels.data, java.nio.charset.StandardCharsets.UTF_8), " ")
    // the officeDocument relationship names the main part; a package-
    // root rel Target may carry a leading '/', which strips to the
    // archive-member form
    val target = RelR.findAllIn(relXml).collectFirst {
      case tag if RelTypeR.findFirstMatchIn(tag)
          .exists(_.group(1) == OfficeDocRel) =>
        TargetR.findFirstMatchIn(tag).map(_.group(1))
    }.flatten.getOrElse(return None)
    val mainPart = if (target.startsWith("/")) target.drop(1) else target
    if (!contentTypeOf(ctXml, mainPart).contains(MainCt)) return None
    val main = byName.getOrElse(mainPart, return None)
    val xml = CommentR.replaceAllIn(
      new String(main.data, java.nio.charset.StandardCharsets.UTF_8), " ")
    val out = Vector.newBuilder[String]
    ParaR.findAllIn(xml).foreach { para =>
      // strip revision/instruction content BEFORE collecting leaves
      val kept = DelTextR.replaceAllIn(
        InstrR.replaceAllIn(DelR.replaceAllIn(para, ""), ""), "")
      val sb = new StringBuilder
      LeafR.findAllMatchIn(kept).foreach { m =>
        if (m.group(1) != null) sb.append(unescape(m.group(1)))
        else if (m.matched.startsWith("<w:tab")) sb.append('\t')
        else sb.append('\n') // w:br / w:cr
      }
      out += sb.toString
    }
    Some(out.result())
  }

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("para_idx", IntegerType),
    StructField("text", StringType)))

  /** binaryFile-shaped relation of `.docx` files → one row per
    * paragraph, in document order. A malformed file contributes zero
    * rows.
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        paragraphs(r.getAs[Array[Byte]](1)) match {
          case Some(ps) => ps.iterator.zipWithIndex.map { case (t, i) =>
            Row(fname, i, t)
          }
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fixture writer. Every paragraph is split across MULTIPLE runs at
    * an arbitrary character boundary (Word's formatting-boundary run
    * splits), with `xml:space="preserve"` carried so leading/trailing
    * spaces inside runs survive; each document plants a tracked
    * deletion, a field instruction, and a commented-out run that must
    * all be EXCLUDED. `mainPart` rotates the document part's location
    * to prove OPC relationship routing.
    */
  def makeDocx(paragraphs: Seq[String],
      mainPart: String = "word/document.xml"): Array[Byte] = {
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |  <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |  <Override PartName="/$mainPart" ContentType="$MainCt"/>
         |</Types>""".stripMargin
    val relsXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |  <Relationship Id="rId1" Type="$OfficeDocRel" Target="/$mainPart"/>
         |</Relationships>""".stripMargin
    val body = paragraphs.zipWithIndex.map { case (p, i) =>
      // split each paragraph into two runs at a deterministic cut
      val cut = if (p.isEmpty) 0 else 1 + (p.length * 2 / 3 - 1).max(0)
      val (a, b) = p.splitAt(cut)
      s"""    <w:p><w:pPr><w:pStyle w:val="Normal"/></w:pPr>""" +
        s"""<w:r><w:t xml:space="preserve">${esc(a)}</w:t></w:r>""" +
        s"""<w:del w:id="$i"><w:r><w:delText>REVISION-$i</w:delText></w:r></w:del>""" +
        s"""<!-- <w:r><w:t>COMMENTED-$i</w:t></w:r> -->""" +
        s"""<w:r><w:instrText xml:space="preserve"> PAGE </w:instrText></w:r>""" +
        s"""<w:r><w:t xml:space="preserve">${esc(b)}</w:t></w:r></w:p>"""
    }.mkString("\n")
    val documentXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |  <w:body>
         |$body
         |    <w:sectPr><w:pgSz w:w="11906" w:h="16838"/></w:sectPr>
         |  </w:body>
         |</w:document>""".stripMargin
    ZipArchive.makeZip(Seq(
      ("[Content_Types].xml", contentTypes.getBytes("UTF-8"), true),
      ("_rels/.rels", relsXml.getBytes("UTF-8"), true),
      (mainPart, documentXml.getBytes("UTF-8"), true)))
  }
}
