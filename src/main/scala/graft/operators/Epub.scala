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

  /** (spineIdx, href, xhtml) per spine item; None on any OCF/OPF
    * violation or underlying zip inconsistency.
    */
  def chapters(zipBytes: Array[Byte]): Option[Vector[(Int, String, String)]] = {
    val ms = ZipArchive.members(zipBytes).getOrElse(return None)
    val first = ms.headOption.getOrElse(return None)
    if (first.name != "mimetype" || first.method != 0 ||
        new String(first.data,
          java.nio.charset.StandardCharsets.US_ASCII) != Mime) return None
    val byName = ms.map(m => m.name -> m).toMap
    val container = byName.getOrElse("META-INF/container.xml", return None)
    val cx = new String(container.data, java.nio.charset.StandardCharsets.UTF_8)
    val opfPath = "full-path=\"([^\"]+)\"".r.findFirstMatchIn(cx)
      .map(_.group(1)).getOrElse(return None)
    val opf = byName.getOrElse(opfPath, return None)
    val ox = new String(opf.data, java.nio.charset.StandardCharsets.UTF_8)
    val base = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    // manifest: id → href, read INSIDE each item tag (scoped — the
    // wiki-parser rule: fields only from their own element)
    val items = "<item\\b[^>]*>".r.findAllIn(ox).toVector.flatMap { tag =>
      for {
        id <- "\\bid=\"([^\"]+)\"".r.findFirstMatchIn(tag).map(_.group(1))
        href <- "\\bhref=\"([^\"]+)\"".r.findFirstMatchIn(tag).map(_.group(1))
      } yield id -> href
    }.toMap
    val spine = "<itemref\\b[^>]*>".r.findAllIn(ox).toVector.flatMap(tag =>
      "\\bidref=\"([^\"]+)\"".r.findFirstMatchIn(tag).map(_.group(1)))
    if (spine.isEmpty) return None
    val out = Vector.newBuilder[(Int, String, String)]
    spine.zipWithIndex.foreach { case (idref, i) =>
      val href = items.getOrElse(idref, return None)
      val m = byName.getOrElse(base + href, return None)
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
