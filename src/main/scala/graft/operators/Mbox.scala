package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** mbox / RFC 5322 + MIME mail ingest — mailing-list archives are a
  * classic pretraining source (kernel lists, Apache archives, Usenet
  * exports, the corporate-mail corpora every pile carries), and they
  * ship as mbox files of MIME messages. From-scratch implementation of
  * the public specs (RFC 4155 mbox, RFC 5322 message format, RFC 2045
  * MIME, RFC 2047 encoded words):
  *
  *  - mbox framing: messages begin at `From ` postmark lines (the
  *    first line MUST be one), `>From`-stuffing in bodies is reversed
  *    exactly one level, both LF and CRLF line endings handled;
  *  - headers: case-insensitive names, RFC 5322 FOLDING unwrapped
  *    (continuation lines begin with SP/HTAB), a header without a
  *    colon rejects the message;
  *  - RFC 2047 encoded-words in Subject/From decode — BOTH the B
  *    (base64) and Q (quoted-printable-like, `_` = space) forms,
  *    charset honored, adjacent encoded words joined without the
  *    intervening whitespace per the spec;
  *  - MIME: Content-Type parameters parsed quoted or bare
  *    (boundary, charset); multipart subtypes recurse (depth-capped) with
  *    EXACT boundary-line matching (`--boundary` and the
  *    `--boundary--` terminator at line starts); the preamble and
  *    epilogue are discarded per RFC 2046;
  *  - Content-Transfer-Encoding: 7bit/8bit/binary pass through,
  *    QUOTED-PRINTABLE decodes strictly (`=XX` hex, soft line breaks;
  *    a malformed escape rejects the message — lenient QP silently
  *    corrupts text), BASE64 decodes through a STRICT own decoder
  *    (alphabet + line breaks only, padding enforced; the JDK MIME
  *    decoder silently skips garbage, which is exactly the leniency
  *    this engine rejects);
  *  - text/plain parts decode per their charset parameter and
  *    concatenate in order; non-text parts are counted, not guessed
  *    at.
  *
  * Shape at 100 TB: an archive file is the natural split unit —
  * per-file parallelism, scan-local parse, zero shuffle (a production
  * variant splits WITHIN an mbox on postmark lines, which the format
  * supports).
  */
object Mbox {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---------------- strict decoders ----------------

  private val B64 = {
    val t = new Array[Int](128)
    java.util.Arrays.fill(t, -1)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    alpha.zipWithIndex.foreach { case (c, i) => t(c) = i }
    t
  }

  /** Strict base64: alphabet + CR/LF only, `=` padding enforced. */
  private[graft] def base64Strict(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    var padding = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r' || c == '\n') ()
      else if (c == '=') padding += 1
      else {
        if (padding > 0) throw Malformed // data after padding
        if (c >= 128 || B64(c) < 0) throw Malformed
        acc = (acc << 6) | B64(c)
        nbits += 6
        if (nbits >= 8) {
          nbits -= 8
          out.write((acc >> nbits) & 0xff)
        }
      }
      i += 1
    }
    if (padding > 2) throw Malformed
    // leftover bits must be zero padding consistent with '=' count
    if (nbits > 0 && (acc & ((1 << nbits) - 1)) != 0) throw Malformed
    if ((nbits == 4 && padding != 2) || (nbits == 2 && padding != 1) ||
      (nbits == 0 && padding != 0) || nbits == 6) throw Malformed
    out.toByteArray
  }

  /** Strict quoted-printable: `=XX`, soft breaks; bad escapes reject. */
  private[graft] def qpDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2 // soft LF
        else if (i + 2 < s.length && s.charAt(i + 1) == '\r' &&
          s.charAt(i + 2) == '\n') i += 3 // soft CRLF
        else if (i + 2 < s.length) {
          val hex = s.substring(i + 1, i + 3)
          if (!hex.forall(h => "0123456789ABCDEFabcdef".indexOf(h) >= 0))
            throw Malformed
          out.write(Integer.parseInt(hex, 16))
          i += 3
        } else throw Malformed
      } else {
        if (c > 255) throw Malformed
        out.write(c)
        i += 1
      }
    }
    out.toByteArray
  }

  private def charsetOf(label: String): java.nio.charset.Charset =
    try java.nio.charset.Charset.forName(label.trim)
    catch { case _: Exception => throw Malformed }

  /** RFC 2047 encoded-words: `=?charset?B|Q?payload?=`; adjacent
    * encoded words join without the separating whitespace.
    */
  private[graft] def decode2047(s: String): String = {
    val Word = "=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=".r
    val sb = new StringBuilder
    var last = 0
    var lastWasWord = false
    var lastEnd = -1
    Word.findAllMatchIn(s).foreach { m =>
      val between = s.substring(last, m.start)
      if (!(lastWasWord && between.forall(c => c == ' ' || c == '\t')))
        sb.append(between)
      val cs = charsetOf(m.group(1))
      val decoded = m.group(2).toUpperCase match {
        case "B" => new String(base64Strict(m.group(3)), cs)
        case _ =>
          val q = m.group(3).replace('_', ' ')
          new String(qpDecode(q), cs)
      }
      sb.append(decoded)
      last = m.end
      lastWasWord = true
      lastEnd = m.end
    }
    sb.append(s.substring(last))
    sb.toString
  }

  // ---------------- message model ----------------

  final case class Message(fromAddr: String, subject: String, date: String,
      nParts: Int, text: String)

  private def splitLines(s: String): Array[String] =
    s.split("\n", -1).map(l => if (l.endsWith("\r")) l.dropRight(1) else l)

  /** Parse one RFC 5322 message (headers + MIME body). */
  private[graft] def parseMessage(raw: String): Message = {
    val lines = splitLines(raw)
    // unfold headers
    val headers = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    while (i < lines.length && lines(i).nonEmpty) {
      val line = lines(i)
      if (line.head == ' ' || line.head == '\t') {
        if (headers.isEmpty) throw Malformed // continuation before any header
        val (k, v) = headers.last
        headers(headers.length - 1) = (k, v + " " + line.trim)
      } else {
        val colon = line.indexOf(':')
        if (colon <= 0) throw Malformed
        headers += ((line.substring(0, colon).trim.toLowerCase(
          java.util.Locale.ROOT), line.substring(colon + 1).trim))
      }
      i += 1
    }
    if (i >= lines.length) throw Malformed // no body separator
    val body = lines.drop(i + 1).mkString("\n")
    def header(name: String): Option[String] =
      headers.collectFirst { case (`name`, v) => v }
    val (nParts, text) = parseEntity(
      header("content-type").getOrElse("text/plain"),
      header("content-transfer-encoding").getOrElse("7bit"),
      body, 0)
    Message(
      decode2047(header("from").getOrElse(throw Malformed)),
      decode2047(header("subject").getOrElse("")),
      header("date").getOrElse(""),
      nParts, text)
  }

  /** One MIME entity → (partCount, concatenated text). */
  private def parseEntity(contentType: String, cte: String, body: String,
      depth: Int): (Int, String) = {
    if (depth > 8) throw Malformed
    val ct = contentType.toLowerCase(java.util.Locale.ROOT)
    val mediaType = ct.takeWhile(_ != ';').trim
    def param(name: String): Option[String] = {
      val P = ("(?i)[;\\s]" + name + "\\s*=\\s*(\"([^\"]*)\"|[^;\\s]+)").r
      P.findFirstMatchIn(contentType).map(m =>
        if (m.group(2) != null) m.group(2) else m.group(1))
    }
    if (mediaType.startsWith("multipart/")) {
      val boundary = param("boundary").getOrElse(throw Malformed)
      if (boundary.isEmpty || boundary.length > 70) throw Malformed
      val lines = splitLines(body)
      val open = "--" + boundary
      val close = "--" + boundary + "--"
      val parts = scala.collection.mutable.ArrayBuffer[Vector[String]]()
      var cur: scala.collection.mutable.ArrayBuffer[String] = null
      var closed = false
      lines.foreach { line =>
        if (closed) () // epilogue: discarded per RFC 2046
        else if (line == close) {
          if (cur == null) throw Malformed
          parts += cur.toVector
          cur = null
          closed = true
        } else if (line == open) {
          if (cur != null) parts += cur.toVector
          cur = scala.collection.mutable.ArrayBuffer[String]()
        } else if (cur != null) cur += line
        // else: preamble, discarded
      }
      if (!closed) throw Malformed // no terminating boundary
      var n = 0
      val texts = Vector.newBuilder[String]
      parts.foreach { partLines =>
        // each part: headers, blank, body
        var j = 0
        val ph = scala.collection.mutable.ArrayBuffer[(String, String)]()
        while (j < partLines.length && partLines(j).nonEmpty) {
          val line = partLines(j)
          if (line.head == ' ' || line.head == '\t') {
            if (ph.isEmpty) throw Malformed
            val (k, v) = ph.last
            ph(ph.length - 1) = (k, v + " " + line.trim)
          } else {
            val colon = line.indexOf(':')
            if (colon <= 0) throw Malformed
            ph += ((line.substring(0, colon).trim.toLowerCase(
              java.util.Locale.ROOT), line.substring(colon + 1).trim))
          }
          j += 1
        }
        val pBody = partLines.drop(j + 1).mkString("\n")
        def pHeader(name: String): Option[String] =
          ph.collectFirst { case (`name`, v) => v }
        val (pn, pt) = parseEntity(
          pHeader("content-type").getOrElse("text/plain"),
          pHeader("content-transfer-encoding").getOrElse("7bit"),
          pBody, depth + 1)
        n += pn
        if (pt.nonEmpty) texts += pt
      }
      (n, texts.result().mkString("\n"))
    } else {
      val bytes = cte.trim.toLowerCase(java.util.Locale.ROOT) match {
        case "7bit" | "8bit" | "binary" =>
          body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        case "quoted-printable" => qpDecode(body)
        case "base64" => base64Strict(body)
        case _ => throw Malformed // unknown coding: reject, don't guess
      }
      if (mediaType == "text/plain" || (mediaType.isEmpty && depth == 0)) {
        val cs = charsetOf(param("charset").getOrElse("us-ascii"))
        (1, new String(bytes, cs))
      } else (1, "") // counted, not guessed at
    }
  }

  /** All messages of one mbox file; None on ANY framing/format
    * violation.
    */
  def messages(bytes: Array[Byte]): Option[Vector[Message]] = {
    try {
      if (bytes == null || bytes.length == 0) throw Malformed
      val content = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val lines = splitLines(content)
      if (!lines.head.startsWith("From ")) throw Malformed // postmark first
      val rawMessages = Vector.newBuilder[String]
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      var started = false
      lines.foreach { line =>
        if (line.startsWith("From ")) {
          if (started) rawMessages += cur.mkString("\n")
          cur = scala.collection.mutable.ArrayBuffer[String]()
          started = true
        } else if (started) {
          // reverse one level of From-stuffing
          cur += (if (line.matches("^>+From .*")) line.substring(1) else line)
        } else throw Malformed
      }
      if (started) rawMessages += cur.mkString("\n")
      val msgs = rawMessages.result()
      // a trailing blank line after the last message is mbox-normal;
      // strip ONE trailing empty line per message (the separator)
      Some(msgs.map(m => parseMessage(m.stripSuffix("\n"))))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------- Spark surface ----------------

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("msg_idx", IntegerType),
    StructField("from_addr", StringType),
    StructField("subject", StringType),
    StructField("n_parts", IntegerType),
    StructField("text", StringType)))

  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { it =>
      it.flatMap { r =>
        val fname = r.getString(0)
        messages(r.getAs[Array[Byte]](1)) match {
          case Some(ms) => ms.iterator.zipWithIndex.map { case (m, i) =>
            Row(fname, i, m.fromAddr, m.subject, m.nParts, m.text)
          }
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  // ---------------- writer (fixture reverse direction) ----------------

  def b64Encode(s: String, cs: String = "UTF-8"): String = {
    val raw = java.util.Base64.getEncoder.encodeToString(s.getBytes(cs))
    raw.grouped(72).mkString("\n")
  }

  def qpEncode(s: String): String =
    s.flatMap { c =>
      if (c == '=') "=3D"
      else if (c < 128 && c != '\n') c.toString
      else c.toString.getBytes("UTF-8")
        .map(b => f"=${b & 0xff}%02X").mkString
    }
}
