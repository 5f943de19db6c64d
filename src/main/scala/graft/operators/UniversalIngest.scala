package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Universal mixed-drop ingest — the integration layer the format
  * decoders exist FOR: a real corpus drop is one directory of
  * whatever producers emitted (recordings beside databases beside
  * archives beside scans), and the pipeline's first two moves are
  * (1) route every file by its BYTES ([[graft.functions.MimeSniff]];
  * Content-Type and extensions lie) and (2) hand it to the matching
  * strict decoder. This operator is that dispatch, emitting the
  * per-file unit count each decoder defines (paragraph / row / record
  * / page / frame / packet / block / member / line) — the fan-out
  * denominator every downstream budget needs.
  *
  * The dispatch table covers the content-routable decoder family;
  * formats whose container is a generic zip (DOCX, EPUB) route to the
  * zip label by design — container-level sniffing cannot read
  * [Content_Types].xml — and count zip members. A file whose sniffed
  * decoder then REJECTS it contributes zero rows (mislabeled or
  * corrupt content must not half-ingest), and unrouted labels
  * contribute zero rows rather than a guess.
  *
  * Shape at 100 TB: per-file parallelism, scan-local sniff + decode,
  * zero shuffle.
  */
object UniversalIngest {

  /** (mime, unitCount) for one payload; None when the sniffed label
    * has no decoder here or the decoder rejects the bytes.
    */
  def unitCount(bytes: Array[Byte]): Option[(String, Long)] = {
    val mime = graft.functions.MimeSniff.mimeOf(bytes)
    val n: Option[Long] = mime match {
      case "audio/flac" => Flac.decode(bytes).map(_.nSamples)
      case "audio/ogg" => Ogg.info(bytes).map(_.nPackets.toLong)
      case "audio/mpeg" => Mp3.info(bytes).map(_.nFrames.toLong)
      case "application/vnd.sqlite3" =>
        Sqlite.tableNames(bytes).flatMap(_.headOption)
          .flatMap(t => Sqlite.rows(bytes, t)).map(_.length.toLong)
      case "application/avro" => AvroOcf.decode(bytes).map(_.records.length.toLong)
      case "image/tiff" => Tiff.decode(bytes).map(_.length.toLong)
      case "image/x-icon" => Ico.entries(bytes).map(_.length.toLong)
      case "image/avif" | "image/heif" =>
        Heif.info(bytes).map(_.nItems.toLong)
      case "image/webp" =>
        WebpL.decode(bytes).map(img => img.width.toLong * img.height)
      case "video/webm" => Webm.info(bytes).map(_.nBlocks.toLong)
      case "application/x-7z-compressed" =>
        SevenZip.members(bytes).map(_.length.toLong)
      case "application/x-lz4" =>
        Lz4Shards.decompress(bytes)
          .map(b => b.count(_ == '\n'.toByte).toLong)
      case "application/zip" => ZipArchive.members(bytes).map(_.length.toLong)
      case "application/rtf" => Rtf.paragraphs(bytes).map(_.length.toLong)
      case "application/vnd.oasis.opendocument.text" =>
        Odt.paragraphs(bytes).map(_.length.toLong)
      case "application/epub+zip" => Epub.chapters(bytes).map(_.length.toLong)
      case _ => None
    }
    n.map(mime -> _)
  }

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("mime", StringType),
    StructField("n_units", LongType)))

  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { it =>
      it.flatMap { r =>
        unitCount(r.getAs[Array[Byte]](1)) match {
          case Some((mime, n)) => Iterator.single(Row(r.getString(0), mime, n))
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }
}
