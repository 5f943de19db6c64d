package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-record-gzip WARC ingest (`.warc.gz` — the CommonCrawl container
  * format; VERDICT r8 item 1). A `.warc.gz` file is a CONCATENATION of
  * independent RFC 1952 gzip members, one WARC record per member, so
  * record framing comes from the gzip member boundaries — NOT from
  * scanning for the WARC version magic. That makes this path robust to
  * payloads that contain `WARC/1.0\r\n` (or gzip magic bytes): the walk
  * advances by the inflater's consumed-byte count, never by content
  * sniffing (WarcSpec pins both hostile cases).
  *
  * Charset handling (VERDICT r8 item 4): real crawls declare the payload
  * charset in the HTTP `Content-Type` header carried by the record; the
  * parser applies it to the payload BYTES (UTF-8 / ISO-8859-1 /
  * windows-1252 — the three that cover the web), defaulting to UTF-8.
  * `Content-Length` is bytes, so the payload slice happens at the byte
  * level before decoding.
  *
  * Shape at 100 TB: identical to the uncompressed e44 path — parallelism
  * is per FILE (millions of ~1 GB CommonCrawl segments; gzip members are
  * sequential within a file, so a file is the natural split unit), the
  * member walk + inflate is scan-local `mapPartitions` (the
  * Multimodal.extractImageFeatures precedent — inflation cannot be
  * column algebra), and everything downstream (e46/e34/e37) composes as
  * plain projections. Zero shuffle. Memory is bounded by one member's
  * inflated size, not the file: members stream through a 64 KiB buffer.
  *
  * Envelope discipline (the e12 decoder rule — validate, don't trust):
  * a malformed member header, truncated deflate stream, or corrupt
  * trailer terminates the walk for that file; records already parsed
  * survive. A member that inflates but lacks WARC headers is skipped.
  */
object WarcGzip {

  /** Walk concatenated RFC 1952 gzip members left-to-right; returns the
    * inflated bytes of each member in file order. Stops (returning what
    * it has) at the first malformed or truncated member.
    */
  def gunzipMembers(data: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var off = 0
    var ok = true
    // minimum member: 10-byte header + ≥1 deflate byte + 8-byte trailer
    while (ok && off + 18 <= data.length) {
      if ((data(off) & 0xff) != 0x1f || (data(off + 1) & 0xff) != 0x8b ||
          data(off + 2) != 8) {
        ok = false
      } else {
        val flg = data(off + 3) & 0xff
        var p = off + 10
        if ((flg & 4) != 0 && p + 2 <= data.length) { // FEXTRA
          val xlen = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
          p += 2 + xlen
        }
        if ((flg & 8) != 0) { // FNAME, NUL-terminated
          while (p < data.length && data(p) != 0) p += 1
          p += 1
        }
        if ((flg & 16) != 0) { // FCOMMENT
          while (p < data.length && data(p) != 0) p += 1
          p += 1
        }
        if ((flg & 2) != 0) p += 2 // FHCRC
        if (p >= data.length) { ok = false }
        else {
          val inf = new java.util.zip.Inflater(true) // nowrap: raw deflate
          inf.setInput(data, p, data.length - p)
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](65536)
          try {
            var stalled = false
            while (!inf.finished() && !stalled) {
              val n = inf.inflate(tmp)
              if (n > 0) buf.write(tmp, 0, n)
              else if (inf.needsInput() || inf.needsDictionary()) stalled = true
            }
            if (inf.finished()) {
              val consumed = inf.getBytesRead.toInt
              // trailer: CRC32 + ISIZE (8 bytes) must be present
              if (p + consumed + 8 <= data.length) {
                out += buf.toByteArray
                off = p + consumed + 8
              } else ok = false
            } else ok = false // truncated deflate stream
          } catch {
            case _: java.util.zip.DataFormatException => ok = false
          } finally inf.end()
        }
      }
    }
    out.result()
  }

  /** STRICT multi-member gunzip for generic `.gz` line shards (e98b —
    * the `.jsonl.gz` form of the zstd/xz shard readers): unlike
    * [[gunzipMembers]]'s WARC envelope (salvage the parsed prefix —
    * each WARC record self-validates via its headers), a generic text
    * shard has nothing downstream to catch corruption, so here every
    * member's CRC32 AND ISIZE trailer are VERIFIED, the members must
    * consume the file EXACTLY, and any failure rejects the whole file
    * (the zstd/xz/zip discipline). Members concatenate into one
    * logical byte stream — member boundaries are byte-level, not line
    * boundaries, exactly like zstd frames. `cap` bounds the running
    * inflated total (the bomb guard).
    */
  def gunzipStrict(data: Array[Byte],
      cap: Long = 1L << 30): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    if (data.length == 0) return Some(Array.emptyByteArray)
    while (off < data.length) {
      if (off + 18 > data.length) return None
      if ((data(off) & 0xff) != 0x1f || (data(off + 1) & 0xff) != 0x8b ||
          data(off + 2) != 8) return None
      val flg = data(off + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved bits
      var p = off + 10
      if ((flg & 4) != 0) {
        if (p + 2 > data.length) return None
        val xlen = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME
        while (p < data.length && data(p) != 0) p += 1
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (p < data.length && data(p) != 0) p += 1
        p += 1
      }
      if ((flg & 2) != 0) p += 2 // FHCRC (present; value not checked —
      // the member CRC32 below covers the content, which is what matters)
      if (p >= data.length) return None
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(data, p, data.length - p)
      val crc = new java.util.zip.CRC32()
      var memberLen = 0L
      val tmp = new Array[Byte](65536)
      try {
        while (!inf.finished()) {
          val n = inf.inflate(tmp)
          if (n > 0) {
            if (out.size().toLong + n > cap) return None
            crc.update(tmp, 0, n)
            out.write(tmp, 0, n)
            memberLen += n
          } else if (inf.needsInput() || inf.needsDictionary()) return None
        }
        val consumed = inf.getBytesRead.toInt
        val t = p + consumed
        if (t + 8 > data.length) return None
        def u32(o: Int): Long =
          (data(o) & 0xffL) | ((data(o + 1) & 0xffL) << 8) |
            ((data(o + 2) & 0xffL) << 16) | ((data(o + 3) & 0xffL) << 24)
        if (u32(t) != crc.getValue) return None // stored CRC32
        if (u32(t + 4) != (memberLen & 0xffffffffL)) return None // ISIZE
        off = t + 8
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()
    }
    Some(out.toByteArray)
  }

  // compiled once per JVM, not once per record — these run in the
  // scan-local hot loop over CommonCrawl-scale member counts. All three
  // are LINE-anchored ((?m)^): an unanchored scan let a `charset=`
  // substring inside the Target-URI's query string hijack payload
  // decoding, and would let an X-Content-Length header match the
  // length pattern.
  private val UriR = "(?m)^WARC-Target-URI: ([^\r\n]+)".r
  private val ClenR = "(?m)^Content-Length: ([0-9]{1,9})\r?$".r
  private val CTypeR = "(?m)^Content-Type: ([^\r\n]+)".r
  private val CharsetR = "(?i)charset=([A-Za-z0-9_\\-]+)".r

  /** One inflated member → (uri, charset, clen, payload), or None when
    * the member is not a WARC/1.0 record or lacks the MANDATORY
    * Content-Length (ISO 28500 requires it; defaulting to 0 would emit
    * a silently-empty payload for a malformed record). The length
    * pattern caps at 9 digits so a lying multi-GB declaration cannot
    * throw out of `toInt` and kill the task — it simply fails to match
    * and the record is skipped. The charset is read from the
    * Content-Type HEADER only, never from arbitrary header text. The
    * payload is sliced by Content-Length at the BYTE level.
    */
  def parseMember(m: Array[Byte]): Option[(String, String, Int, String)] = {
    // locate the CRLFCRLF header/payload separator at the byte level
    var i = 0
    var sep = -1
    while (sep < 0 && i + 3 < m.length) {
      if (m(i) == '\r' && m(i + 1) == '\n' && m(i + 2) == '\r' && m(i + 3) == '\n')
        sep = i
      else i += 1
    }
    if (sep < 0) return None
    // WARC named headers are ASCII (ISO 28500)
    val head = new String(m, 0, sep, java.nio.charset.StandardCharsets.US_ASCII)
    if (!head.startsWith("WARC/1.0")) return None
    val uri = UriR.findFirstMatchIn(head).map(_.group(1)).getOrElse("")
    val clen = ClenR.findFirstMatchIn(head).map(_.group(1).toInt)
      .getOrElse(return None)
    val charsetName = CTypeR.findFirstMatchIn(head).map(_.group(1))
      .flatMap(ct => CharsetR.findFirstMatchIn(ct).map(_.group(1)))
      .getOrElse("UTF-8")
    val cs = try java.nio.charset.Charset.forName(charsetName)
      catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
    val start = sep + 4
    val end = math.min(start + clen, m.length)
    val payload = new String(m, start, math.max(0, end - start), cs)
    Some((uri, charsetName, clen, payload))
  }

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("rec", IntegerType),
    StructField("uri", StringType),
    StructField("charset", StringType),
    StructField("clen", IntegerType),
    StructField("payload", StringType)))

  /** Scan-local parse of a binaryFile-shaped relation (`path`, `content`)
    * holding `.warc.gz` files. One output row per WARC record; `rec`
    * indexes members within their file.
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        val content = r.getAs[Array[Byte]](1)
        gunzipMembers(content).iterator.zipWithIndex.flatMap {
          case (member, idx) =>
            parseMember(member).map { case (uri, cs, clen, payload) =>
              Row(fname, idx, uri, cs, clen, payload)
            }
        }
      }
    }(RowEncoder.encoderFor(schema))
  }
}
