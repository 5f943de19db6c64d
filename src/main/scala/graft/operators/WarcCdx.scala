package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Offset-aware WARC record walk — the read side of CDX indexing (the
  * crawl-archive random-access index format: every record's byte offset
  * and length inside its container file, keyed by a sort-friendly URL).
  * Public formats: ISO 28500 (WARC), the Internet Archive CDX file
  * format, and SURT (Sort-friendly URI Reordering Transform).
  *
  * Framing: records are walked by BYTE OFFSET — the version magic must
  * sit exactly at the current offset, and the walk advances by
  * `header + CRLFCRLF + Content-Length + CRLFCRLF`. Unlike the
  * magic-split framing of the plain e44 reader, a payload that CONTAINS
  * `WARC/1.0\r\n` cannot split a record here (WarcCdxSpec pins it), and
  * the walk produces the true offsets a CDX index needs. Envelope
  * discipline (the e12 decoder rule): a record whose magic, header
  * terminator, or declared length does not check out terminates the walk
  * for that file; records already parsed survive.
  *
  * Shape at 100 TB: parallelism is per FILE (CommonCrawl's layout —
  * millions of ~1 GB segments; records are sequential within a file so
  * the file is the natural split unit), the walk is scan-local
  * `mapPartitions` with zero shuffle, and memory is bounded by one
  * file's bytes (binaryFile framing), never the corpus. Offsets come
  * from the walk itself — no window over record lengths, so indexing N
  * files costs exactly one pass over them.
  */
object WarcCdx {

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("rec", IntegerType),
    StructField("offset", LongType),
    StructField("rlen", LongType),
    StructField("uri", StringType),
    StructField("wdate", StringType),
    StructField("payload", StringType)))

  private val Magic = "WARC/1.0\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def startsWithAt(data: Array[Byte], off: Int, pat: Array[Byte]): Boolean = {
    if (off + pat.length > data.length) return false
    var i = 0
    while (i < pat.length) {
      if (data(off + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** Framing core: one (rec, offset, payloadStart, payloadLen, uri,
    * wdate) tuple per well-formed record — the single framing
    * authority [[walk]] (string payloads) and [[walkBinary]] (byte
    * payloads) both slice from. Stops at the first malformed record
    * (or clean EOF).
    */
  private def frames(data: Array[Byte]): Vector[(Int, Int, Int, Int, String, String)] = {
    val out = Vector.newBuilder[(Int, Int, Int, Int, String, String)]
    val uriR = "WARC-Target-URI: ([^\r]+)".r
    val dateR = "WARC-Date: ([^\r]+)".r
    val clenR = "Content-Length: ([0-9]+)".r
    var off = 0
    var rec = 0
    var ok = true
    while (ok && off < data.length) {
      if (!startsWithAt(data, off, Magic)) { ok = false }
      else {
        // header/payload separator, searched from the record start
        var i = off
        var sep = -1
        while (sep < 0 && i + 3 < data.length) {
          if (data(i) == '\r' && data(i + 1) == '\n' &&
              data(i + 2) == '\r' && data(i + 3) == '\n') sep = i
          else i += 1
        }
        if (sep < 0) { ok = false }
        else {
          // WARC named headers are ASCII (ISO 28500)
          val head = new String(data, off, sep - off,
            java.nio.charset.StandardCharsets.US_ASCII)
          // length-guard the digit run before toLong: a 20+-digit
          // Content-Length must reject as a malformed record (ok =
          // false), not escape as NumberFormatException
          clenR.findFirstMatchIn(head).map(_.group(1))
              .filter(_.length <= 18).map(_.toLong)
              .filter(_ <= Int.MaxValue.toLong) match {
            case None => ok = false
            case Some(clenL) =>
              val clen = clenL.toInt
              val pStart = sep + 4
              val pEnd = pStart + clen
              // a record ends with CRLFCRLF after its payload block
              if (pEnd < 0 || pEnd + 4 > data.length ||
                  !(data(pEnd) == '\r' && data(pEnd + 1) == '\n' &&
                    data(pEnd + 2) == '\r' && data(pEnd + 3) == '\n')) { ok = false }
              else {
                val uri = uriR.findFirstMatchIn(head).map(_.group(1)).getOrElse("")
                val wdate = dateR.findFirstMatchIn(head).map(_.group(1)).getOrElse("")
                out += ((rec, off, pStart, clen, uri, wdate))
                off = pEnd + 4
                rec += 1
              }
          }
        }
      }
    }
    out.result()
  }

  /** Walk one file's bytes; emits (rec, offset, rlen, uri, wdate, payload)
    * in file order. Stops at the first malformed record (or clean EOF).
    */
  def walk(data: Array[Byte]): Vector[(Int, Long, Long, String, String, String)] =
    frames(data).map { case (rec, off, pStart, clen, uri, wdate) =>
      (rec, off.toLong, (pStart + clen + 4 - off).toLong, uri, wdate,
        new String(data, pStart, clen, java.nio.charset.StandardCharsets.UTF_8))
    }

  val schemaBinary: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("rec", IntegerType),
    StructField("offset", LongType),
    StructField("rlen", LongType),
    StructField("uri", StringType),
    StructField("wdate", StringType),
    StructField("payload", BinaryType)))

  /** The same framing with payloads as RAW BYTES — the form a
    * mixed-format archive needs (PDF/image payloads corrupt through a
    * UTF-8 decode; the e75/e81 pipelines decide per record how to
    * decode). Slices directly from [[frames]] — no throwaway string
    * decode, no duplicate separator scan.
    */
  def walkBinary(data: Array[Byte]): Vector[(Int, Long, Long, String, String, Array[Byte])] =
    frames(data).map { case (rec, off, pStart, clen, uri, wdate) =>
      (rec, off.toLong, (pStart + clen + 4 - off).toLong, uri, wdate,
        java.util.Arrays.copyOfRange(data, pStart, pStart + clen))
    }

  /** [[parse]] with binary payloads (see [[walkBinary]]). */
  def parseBinary(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        walkBinary(r.getAs[Array[Byte]](1)).iterator.map {
          case (rec, off, rlen, uri, wdate, payload) =>
            Row(fname, rec, off, rlen, uri, wdate, payload)
        }
      }
    }(RowEncoder.encoderFor(schemaBinary))
  }

  /** Scan-local parse of a binaryFile-shaped relation (`path`, `content`)
    * holding uncompressed WARC files; one output row per record, with the
    * record's true byte offset and length in its file.
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        walk(r.getAs[Array[Byte]](1)).iterator.map {
          case (rec, off, rlen, uri, wdate, payload) =>
            Row(fname, rec, off, rlen, uri, wdate, payload)
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** SURT url key (Sort-friendly URI Reordering Transform): lowercase,
    * scheme dropped, host labels reversed and comma-joined, then `)` and
    * the path — `https://News.Example.com/a/b` → `com,example,news)/a/b`.
    * Pure column algebra over built-ins (codegen'd, no UDF).
    */
  def surtKey(uri: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val u = lower(uri)
    val host = regexp_extract(u, "^[a-z]+://([^/]+)", 1)
    val path = regexp_extract(u, "^[a-z]+://[^/]+(/.*)$", 1)
    concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), path)
  }
}
