package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EPUB ingest — the container book corpora actually arrive in
  * (Project Gutenberg, Standard Ebooks, library drops all publish
  * EPUB). An EPUB is an OCF zip (EPUB OCF 3.0, a public W3C spec)
  * whose reading order lives in the OPF package document — so this
  * operator is a COMPOSITION of validated machinery: the
  * CRC-verifying [[ZipArchive]] walk underneath, plus the scoped-
  * regex XML field extraction discipline the wiki/PDF parsers use.
  *
  * Validation (OCF/OPF, reject-don't-guess):
  *  - the FIRST zip entry must be named `mimetype`, STORED
  *    (method 0), with exactly `application/epub+zip` as content —
  *    the OCF magic carried inside the container;
  *  - `META-INF/container.xml` must exist and name the OPF via
  *    `full-path`;
  *  - the OPF must resolve: every spine `idref` must name a manifest
  *    item whose `href` (resolved against the OPF's directory) exists
  *    in the archive — a dangling spine entry rejects the whole book
  *    rather than yielding a silently-shorter text;
  *  - chapters emit in SPINE order, NOT zip order (the fixture stores
  *    them reversed to prove the distinction — reading order is the
  *    package document's, never the container's).
  *
  * Shape at 100 TB: per-file parallelism (a book is the natural split
  * unit), scan-local walk, zero shuffle; text cleanup downstream is
  * column algebra (the e34 strip chain).
  */
object Epub {

  private val Mime = "application/epub+zip"

  // compiled once per JVM (per-book hot path)
  private val CommentR = "(?s)<!--.*?-->".r
  private val RootfileR = "<rootfile\\b[^>]*>".r
  private val FullPathR = "\\bfull-path=\"([^\"]+)\"".r
  private val ItemR = "<item\\b[^>]*>".r
  private val IdR = "\\bid=\"([^\"]+)\"".r
  private val HrefR = "\\bhref=\"([^\"]+)\"".r
  private val ItemrefR = "<itemref\\b[^>]*>".r
  private val IdrefR = "\\bidref=\"([^\"]+)\"".r
  /** Manifest hrefs are IRIs: percent-decode (byte-level, so
    * multi-byte UTF-8 escapes like `%C3%A9` reassemble correctly) and
    * resolve `../` / `./` segments against the OPF's directory — a
    * spec-valid `My%20Chapter.xhtml` must find the archive member
    * `My Chapter.xhtml`, and a nested OPF may reach siblings via
    * `..`. None when the path escapes the archive root.
    */
  private def pctDecode(s: String): String = {
    if (!s.contains('%')) return s
    val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bo = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    while (i < in.length) {
      if (in(i) == '%' && i + 2 < in.length &&
          Character.digit(in(i + 1), 16) >= 0 &&
          Character.digit(in(i + 2), 16) >= 0) {
        bo.write((Character.digit(in(i + 1), 16) << 4) |
          Character.digit(in(i + 2), 16))
        i += 3
      } else { bo.write(in(i)); i += 1 }
    }
    new String(bo.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
  private def resolveHref(base: String, href: String): Option[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    (base + pctDecode(href)).split("/").foreach {
      case "" | "." => // empty (from //) and self segments drop
      case ".." =>
        if (out.isEmpty) return None // escapes the archive root
        else out.remove(out.length - 1)
      case s => out += s
    }
    if (out.isEmpty) None else Some(out.mkString("/"))
  }

  /** (spineIdx, href, xhtml) per spine item; None on any OCF/OPF
    * violation or underlying zip inconsistency. XML COMMENTS are
    * stripped before any scan — a commented-out rootfile or itemref
    * (publishers do this) must neither enter the spine nor shadow the
    * real package path.
    */
  def chapters(zipBytes: Array[Byte]): Option[Vector[(Int, String, String)]] = {
    // OCF mandates mimetype PHYSICALLY first (local entry at offset 0,
    // stored) — that is the sniffable magic. members() yields central-
    // directory order, which a permuting tool may legally reorder, so
    // the physical check reads the first local header directly: name
    // length 8, name "mimetype", method 0 at the fixed offsets.
    if (zipBytes.length < 38 ||
        zipBytes(0) != 'P' || zipBytes(1) != 'K' ||
        zipBytes(2) != 3 || zipBytes(3) != 4 ||
        (zipBytes(8) & 0xff) != 0 || (zipBytes(9) & 0xff) != 0 || // stored
        (zipBytes(26) & 0xff) != 8 || (zipBytes(27) & 0xff) != 0 ||
        new String(zipBytes, 30, 8,
          java.nio.charset.StandardCharsets.US_ASCII) != "mimetype")
      return None
    val ms = ZipArchive.members(zipBytes).getOrElse(return None)
    val mimeEntry = ms.find(_.name == "mimetype").getOrElse(return None)
    if (mimeEntry.method != 0 ||
        new String(mimeEntry.data,
          java.nio.charset.StandardCharsets.US_ASCII) != Mime) return None
    val byName = ms.map(m => m.name -> m).toMap
    val container = byName.getOrElse("META-INF/container.xml", return None)
    val cx = CommentR.replaceAllIn(
      new String(container.data, java.nio.charset.StandardCharsets.UTF_8), " ")
    val opfPath = RootfileR.findFirstIn(cx)
      .flatMap(tag => FullPathR.findFirstMatchIn(tag).map(_.group(1)))
      .getOrElse(return None)
    val opf = byName.getOrElse(opfPath, return None)
    val ox = CommentR.replaceAllIn(
      new String(opf.data, java.nio.charset.StandardCharsets.UTF_8), " ")
    val base = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    // manifest: id → href, read INSIDE each item tag (scoped — the
    // wiki-parser rule: fields only from their own element)
    val items = ItemR.findAllIn(ox).toVector.flatMap { tag =>
      for {
        id <- IdR.findFirstMatchIn(tag).map(_.group(1))
        href <- HrefR.findFirstMatchIn(tag).map(_.group(1))
      } yield id -> href
    }.toMap
    val spine = ItemrefR.findAllIn(ox).toVector.flatMap(tag =>
      IdrefR.findFirstMatchIn(tag).map(_.group(1)))
    if (spine.isEmpty) return None
    val out = Vector.newBuilder[(Int, String, String)]
    spine.zipWithIndex.foreach { case (idref, i) =>
      val href = items.getOrElse(idref, return None)
      val resolved = resolveHref(base, href).getOrElse(return None)
      val m = byName.getOrElse(resolved, return None)
      out += ((i, href,
        new String(m.data, java.nio.charset.StandardCharsets.UTF_8)))
    }
    Some(out.result())
  }

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("spine_idx", IntegerType),
    StructField("href", StringType),
    StructField("xhtml", StringType)))

  /** binaryFile-shaped relation of `.epub` files → one row per spine
    * chapter, in reading order. A malformed book contributes zero rows.
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        chapters(r.getAs[Array[Byte]](1)) match {
          case Some(cs) => cs.iterator.map { case (i, href, xhtml) =>
            Row(fname, i, href, xhtml)
          }
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** Fixture writer: chapters (href → xhtml) in SPINE order; the zip
    * stores them REVERSED so spine-vs-container ordering is proven.
    * OPF lives under `OEBPS/` so href resolution against the package
    * directory is exercised.
    */
  def makeEpub(chapterSeq: Seq[(String, String)]): Array[Byte] = {
    val containerXml =
      """<?xml version="1.0"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |  <rootfiles>
        |    <rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
        |  </rootfiles>
        |</container>""".stripMargin
    val manifest = chapterSeq.zipWithIndex.map { case ((href, _), i) =>
      s"""    <item id="ch$i" href="$href" media-type="application/xhtml+xml"/>"""
    }.mkString("\n")
    val spine = chapterSeq.indices
      .map(i => s"""    <itemref idref="ch$i"/>""").mkString("\n")
    val opf =
      s"""<?xml version="1.0"?>
         |<package version="3.0" xmlns="http://www.idpf.org/2007/opf" unique-identifier="uid">
         |  <metadata><dc:identifier id="uid" xmlns:dc="http://purl.org/dc/elements/1.1/">fixture</dc:identifier></metadata>
         |  <manifest>
         |$manifest
         |  </manifest>
         |  <spine>
         |$spine
         |  </spine>
         |</package>""".stripMargin
    val entries: Seq[(String, Array[Byte], Boolean)] =
      Seq(("mimetype", Mime.getBytes("US-ASCII"), false),
        ("META-INF/container.xml", containerXml.getBytes("UTF-8"), true),
        ("OEBPS/content.opf", opf.getBytes("UTF-8"), true)) ++
        chapterSeq.reverse.map { case (href, xhtml) =>
          (s"OEBPS/$href", xhtml.getBytes("UTF-8"), true)
        }
    ZipArchive.makeZip(entries)
  }
}
