package graft.operators

/** HTTP response-payload decoding for WARC response records — the two
  * transformations nearly every REAL crawled payload arrives under
  * (RFC 9112): `Transfer-Encoding: chunked` framing (hex-length chunk
  * lines, terminated by a zero chunk) and `Content-Encoding: gzip`
  * compression (RFC 1952, via the JDK's GZIPInputStream — the same
  * public-codec rule as the PNG/PDF Flate paths), plus the deflate,
  * zstd (r11) and brotli (r13, `operators.Brotli` — RFC 7932 with the
  * static dictionary) content codings. Order per spec:
  * Transfer-Encoding frames the WIRE, so dechunking runs first,
  * then content decoding; the combined chunked(gzip(body)) case is
  * exercised explicitly.
  *
  * Envelope: a malformed head, bad chunk framing, truncated gzip
  * stream, or an encoding this decoder does not speak returns None —
  * never an exception (HttpBodySpec fuzzes truncation and mutation).
  * Bodies decode as UTF-8 with U+FFFD replacement (charset layering is
  * e44b/e44c/e44d's job; this operator's contract is the TRANSPORT
  * layer).
  *
  * Scale shape: one self-contained call per record — scan-local over a
  * binary-payload WARC walk, zero shuffle.
  */
object HttpBody {

  // compiled once per JVM — decode runs per record in the scan-local
  // hot loop (millions of records per crawl segment)
  private val StatusR = "^HTTP/1\\.[01] ([0-9]{3})".r
  private val ContentTypeR = "(?im)^Content-Type: *([^\r\n]+)".r
  private val TransferEncR = "(?im)^Transfer-Encoding: *([^\r\n]+)".r
  private val ContentEncR = "(?im)^Content-Encoding: *([^\r\n]+)".r

  /** (status, mime, encoding-label, decoded text); None = malformed. */
  def decode(payload: Array[Byte]): Option[(Int, String, String, String)] = {
    try {
      var sep = -1
      var i = 0
      while (sep < 0 && i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
            payload(i + 2) == '\r' && payload(i + 3) == '\n') sep = i
        else i += 1
      }
      if (sep < 0) return None
      val head = new String(payload, 0, sep,
        java.nio.charset.StandardCharsets.US_ASCII)
      val status = StatusR.findFirstMatchIn(head).map(_.group(1).toInt)
        .getOrElse(return None)
      def header(r: scala.util.matching.Regex): Option[String] =
        r.findFirstMatchIn(head).map(_.group(1).trim)
      val mime = header(ContentTypeR).getOrElse("")
      val te = header(TransferEncR).map(_.toLowerCase)
      val ce = header(ContentEncR).map(_.toLowerCase)
      var body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
      val label = new StringBuilder
      te match {
        case Some("chunked") =>
          body = dechunk(body).getOrElse(return None)
          label.append("chunked")
        case Some(_) => return None // unknown transfer coding
        case None =>
      }
      ce match {
        case Some("gzip") | Some("x-gzip") =>
          body = gunzip(body).getOrElse(return None)
          if (label.nonEmpty) label.append("+")
          label.append("gzip")
        case Some("deflate") =>
          body = inflateBody(body).getOrElse(return None)
          if (label.nonEmpty) label.append("+")
          label.append("deflate")
        case Some("zstd") =>
          // RFC 8878 §7.2 registers 'zstd' as an HTTP content coding
          // (modern CDNs serve it); the shard reader's frame walk
          // applies as-is — exact-consume, window bound, bomb cap
          body = ZstdShards.inflate(body, cap = MaxBodyBytes).getOrElse(return None)
          if (label.nonEmpty) label.append("+")
          label.append("zstd")
        case Some("br") =>
          // RFC 7932 §10 registers 'br'; modern CDNs serve it by
          // default — decoded by the repo's own RFC 7932 implementation
          // (operators.Brotli, r13), static dictionary included
          body = Brotli.decompress(body, cap = MaxBodyBytes).getOrElse(return None)
          if (label.nonEmpty) label.append("+")
          label.append("br")
        case Some("identity") | None =>
        case Some(_) => return None // unknown content coding — reject
        // loudly rather than pass bytes through as confident garbage
      }
      if (label.isEmpty) label.append("identity")
      val text = new String(body, java.nio.charset.StandardCharsets.UTF_8)
      Some((status, mime, label.toString, text))
    } catch { case _: Exception => None }
  }

  /** RFC 9112 §7.1 chunked decoding: hex size line (extensions after
    * `;` ignored), chunk bytes, CRLF, repeated until the zero chunk.
    * Trailers after the zero chunk are ignored. None on any framing
    * violation.
    */
  def dechunk(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    var done = false
    while (!done) {
      // read the size line up to CRLF
      var j = i
      while (j + 1 < body.length && !(body(j) == '\r' && body(j + 1) == '\n')) j += 1
      if (j + 1 >= body.length) return None
      val line = new String(body, i, j - i,
        java.nio.charset.StandardCharsets.US_ASCII)
      val hexPart = line.takeWhile(_ != ';').trim
      // cap the digit run BEFORE parseLong (a 17-hex-digit line would
      // throw out of parseLong), and bound the size by the REMAINING
      // body with long arithmetic — `start + size.toInt` could wrap
      // negative for sizes near Int.MaxValue and sail past the bounds
      // check into an out-of-bounds write
      if (hexPart.isEmpty || hexPart.length > 8 ||
          !hexPart.forall(c => Character.digit(c, 16) >= 0))
        return None
      val size = java.lang.Long.parseLong(hexPart, 16)
      val start = j + 2
      if (size < 0 || size > body.length.toLong - start) return None
      if (size == 0) { done = true }
      else {
        val end = start + size.toInt
        if (end + 2 > body.length) return None
        out.write(body, start, size.toInt)
        if (!(body(end) == '\r' && body(end + 1) == '\n')) return None
        i = end + 2
      }
    }
    Some(out.toByteArray)
  }

  /** Per-body decompressed cap: deflate's ~1032:1 max ratio means a KB
    * of hostile body can declare a GB (the running-total rule from the
    * zstd/xz shard readers, applied to transport decoding too).
    */
  val MaxBodyBytes: Long = 256L << 20

  /** RFC 1952 gzip via the JDK stream; None on truncation/corruption
    * or on breaching the body cap.
    */
  def gunzip(body: Array[Byte]): Option[Array[Byte]] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(body))
      val out = new java.io.ByteArrayOutputStream(body.length * 4 + 64)
      val buf = new Array[Byte](8192)
      var k = in.read(buf)
      while (k >= 0) {
        if (out.size().toLong + k > MaxBodyBytes) return None
        out.write(buf, 0, k)
        k = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** `Content-Encoding: deflate` (RFC 9110): nominally a zlib stream
    * (RFC 1950), but a well-known population of real servers sends RAW
    * deflate (the historic misreading) — every robust client tries
    * zlib first and falls back to raw, and so does this decoder. Both
    * paths are capped and reject truncation/corruption.
    */
  def inflateBody(body: Array[Byte]): Option[Array[Byte]] =
    inflateWith(body, nowrap = false).orElse(inflateWith(body, nowrap = true))

  private def inflateWith(body: Array[Byte], nowrap: Boolean): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      inf.setInput(body)
      val out = new java.io.ByteArrayOutputStream(body.length * 4 + 64)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k > 0) {
          if (out.size().toLong + k > MaxBodyBytes) return None
          out.write(buf, 0, k)
        } else if (inf.needsInput() || inf.needsDictionary()) return None
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Writer-side helpers for fixtures/specs. */
  def gzip(data: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(data); g.close()
    bo.toByteArray
  }

  /** zlib-wrapped deflate (the RFC 1950 form `Content-Encoding:
    * deflate` nominally means).
    */
  def deflateZlib(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val k = d.deflate(buf)
        bo.write(buf, 0, k)
      }
      bo.toByteArray
    } finally d.end()
  }

  def chunk(data: Array[Byte], sizes: Seq[Int]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit =
      bo.write(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var off = 0
    sizes.foreach { sz =>
      val n = math.min(sz, data.length - off)
      if (n > 0) {
        w(Integer.toHexString(n) + "\r\n")
        bo.write(data, off, n)
        w("\r\n")
        off += n
      }
    }
    if (off < data.length) {
      w(Integer.toHexString(data.length - off) + "\r\n")
      bo.write(data, off, data.length - off)
      w("\r\n")
    }
    w("0\r\n\r\n")
    bo.toByteArray
  }
}
