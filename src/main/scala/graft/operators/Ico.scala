package graft.operators

/** ICO / CUR container walk — the favicon format, ubiquitous in any web
  * crawl drop (r16, VERDICT item 4: implementable with zero new
  * reference decoders — payloads are the PNG / BMP-DIB families the
  * repo already decodes).
  *
  * Layout (public, the Windows ICONDIR resource format):
  *   ICONDIR:  reserved u16le (=0) | type u16le (1=icon, 2=cursor) |
  *             count u16le
  *   ENTRY×count (16 bytes each):
  *             width u8 (0 ⇒ 256) | height u8 (0 ⇒ 256) | colorCount u8 |
  *             reserved u8 | planes u16le (cursor: hotspot X) |
  *             bitCount u16le (cursor: hotspot Y) | bytesInRes u32le |
  *             imageOffset u32le
  *   payload:  a complete PNG stream (8-byte signature), or a DIB —
  *             BITMAPINFOHEADER with biHeight DOUBLED (XOR image + the
  *             1bpp AND mask), no BITMAPFILEHEADER.
  *
  * Reject-don't-guess: structural violations (bad reserved/type, entry
  * out of file bounds, truncated payload header, odd doubled DIB
  * height, bomb dims) return None rather than partial rows. Directory
  * dims are reported separately from payload dims — real favicons lie
  * in the directory, and the payload header is authoritative.
  *
  * Shape at 100 TB: per-file scan-local walk inside a binaryFile scan —
  * zero shuffle, bomb caps before any allocation.
  */
object Ico {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Directory bomb cap: a real icon resource holds a handful of sizes;
    * 256 entries is already far past anything a browser emits.
    */
  val MaxEntries = 256

  /** Per-image dimension cap (ICO dims are u8-coded so ≤256 by format,
    * but DIB/PNG headers inside can claim anything — cap before alloc).
    */
  val MaxDim = 4096

  /** One directory entry, payload-header-verified.
    *
    * @param kind      "icon" | "cursor" (file-level type)
    * @param dirW/dirH the directory's u8 dims after the 0⇒256 rule
    * @param width/height payload-header dims (PNG IHDR / DIB header with
    *                  the doubled-height rule applied)
    * @param hotspotX/Y cursor hotspot; -1 for icons (the fields hold
    *                  planes/bitCount there)
    * @param format    "png" | "dib"
    * @param bitCount  DIB biBitCount; PNG bit depth × channels
    */
  final case class Entry(idx: Int, kind: String, dirW: Int, dirH: Int,
      width: Int, height: Int, hotspotX: Int, hotspotY: Int,
      format: String, bitCount: Int, payloadOff: Int, payloadLen: Int)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def u32be(b: Array[Byte], o: Int): Long =
    (b(o + 3) & 0xffL) | ((b(o + 2) & 0xffL) << 8) |
      ((b(o + 1) & 0xffL) << 16) | ((b(o) & 0xffL) << 24)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte], off: Int, len: Int): Boolean =
    len >= 24 && (0 until 8).forall(i => b(off + i) == PngSig(i))

  def entries(b: Array[Byte]): Option[Vector[Entry]] = {
    try {
      if (b == null || b.length < 6 + 16) throw Malformed
      if (u16le(b, 0) != 0) throw Malformed // ICONDIR reserved
      val kind = u16le(b, 2) match {
        case 1 => "icon"
        case 2 => "cursor"
        case _ => throw Malformed
      }
      val count = u16le(b, 4)
      if (count < 1 || count > MaxEntries) throw Malformed
      val dirEnd = 6 + 16 * count
      if (dirEnd > b.length) throw Malformed
      val out = Vector.newBuilder[Entry]
      var i = 0
      while (i < count) {
        val e = 6 + 16 * i
        val dirW = { val v = b(e) & 0xff; if (v == 0) 256 else v }
        val dirH = { val v = b(e + 1) & 0xff; if (v == 0) 256 else v }
        // entry reserved byte (e+3) is 0 per spec but real writers put
        // junk there — tolerated, it carries no layout information
        val f4 = u16le(b, e + 4)
        val f6 = u16le(b, e + 6)
        val len = u32le(b, e + 8)
        val off = u32le(b, e + 12)
        if (off < dirEnd || len < 16 || off + len > b.length) throw Malformed
        val (hx, hy) = if (kind == "cursor") (f4, f6) else (-1, -1)
        val oi = off.toInt
        val li = len.toInt
        val entry =
          if (isPng(b, oi, li)) {
            // IHDR is the first chunk by spec: len(4) type(4) at +8,
            // width/height BE at +16/+20, bit depth +24, color type +25
            if (li < 33) throw Malformed
            val w = u32be(b, oi + 16)
            val h = u32be(b, oi + 20)
            if (w < 1 || h < 1 || w > MaxDim || h > MaxDim) throw Malformed
            val depth = b(oi + 24) & 0xff
            val channels = (b(oi + 25) & 0xff) match {
              case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
              case _ => throw Malformed
            }
            Entry(i, kind, dirW, dirH, w.toInt, h.toInt, hx, hy,
              "png", depth * channels, oi, li)
          } else {
            // DIB: BITMAPINFOHEADER (40) or the BMP v4/v5 extensions
            val biSize = u32le(b, oi)
            if (biSize != 40 && biSize != 108 && biSize != 124) throw Malformed
            if (li < biSize) throw Malformed
            val w = u32le(b, oi + 4).toInt
            val h2 = u32le(b, oi + 8).toInt // doubled: XOR + AND mask
            if (w < 1 || h2 < 2 || (h2 & 1) != 0) throw Malformed
            val h = h2 / 2
            if (w > MaxDim || h > MaxDim) throw Malformed
            val bpp = u16le(b, oi + 14)
            Entry(i, kind, dirW, dirH, w, h, hx, hy, "dib", bpp, oi, li)
          }
        out += entry
        i += 1
      }
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Raw payload bytes of one entry (bounds were verified by entries). */
  def payload(b: Array[Byte], e: Entry): Array[Byte] =
    java.util.Arrays.copyOfRange(b, e.payloadOff, e.payloadOff + e.payloadLen)

  /** Channel sums over a 32bpp BI_RGB DIB entry's XOR image: (sumB,
    * sumG, sumR, sumA, nPx). Bottom-up row order doesn't matter for a
    * sum. None for non-32bpp/compressed DIBs and for PNG entries (those
    * decode through the general PNG path, Multimodal.pngChannelSums).
    */
  def dib32ChannelSums(b: Array[Byte], e: Entry): Option[(Long, Long, Long, Long, Long)] = {
    if (e.format != "dib" || e.bitCount != 32) return None
    val oi = e.payloadOff
    val biSize = u32le(b, oi)
    if (u32le(b, oi + 16) != 0) return None // biCompression != BI_RGB
    val nPx = e.width.toLong * e.height
    val start = oi + biSize.toInt // 32bpp: no color table
    if (start + nPx * 4 > e.payloadOff + e.payloadLen) return None
    var sb = 0L; var sg = 0L; var sr = 0L; var sa = 0L
    var p = start
    val end = start + nPx.toInt * 4
    while (p < end) {
      sb += b(p) & 0xff; sg += b(p + 1) & 0xff
      sr += b(p + 2) & 0xff; sa += b(p + 3) & 0xff
      p += 4
    }
    Some((sb, sg, sr, sa, nPx))
  }

  // ---------------- fixture writers (test/oracle side) ----------------

  /** One payload spec for [[makeIco]]: PNG (8-bit truecolor, the
    * makePngPixels stored-deflate layout so hex oracles can walk its
    * pixels) or a 32bpp BI_RGB DIB with an all-opaque AND mask.
    */
  final case class PayloadSpec(format: String, w: Int, h: Int)

  private def splitmix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def makeDib32(w: Int, h: Int, seed: Long): Array[Byte] = {
    val maskStride = ((w + 31) / 32) * 4
    val buf = java.nio.ByteBuffer
      .allocate(40 + w * h * 4 + maskStride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(40).putInt(w).putInt(h * 2) // doubled height
    buf.putShort(1).putShort(32).putInt(0) // planes, bpp, BI_RGB
    buf.putInt(w * h * 4).putInt(0).putInt(0).putInt(0).putInt(0)
    var s = seed
    var i = 0
    while (i < w * h * 4) { s = splitmix64(s); buf.put((s & 0xff).toByte); i += 1 }
    // AND mask: all zero = fully opaque
    buf.put(new Array[Byte](maskStride * h))
    buf.array()
  }

  /** Write an ICO (`cursor = false`) or CUR file whose entries carry the
    * given payloads; cursor hotspots are (idx*3, idx*5). Directory dims
    * follow the payloads (the u8 0⇒256 rule applies at 256).
    */
  def makeIco(specs: Seq[PayloadSpec], seed: Long, cursor: Boolean = false): Array[Byte] = {
    require(specs.nonEmpty && specs.size <= MaxEntries)
    val payloads = specs.zipWithIndex.map { case (p, i) =>
      p.format match {
        case "png" => Multimodal.makePngPixels(p.w, p.h, seed + i)
        case "dib" => makeDib32(p.w, p.h, seed + i)
        case other => throw new IllegalArgumentException(other)
      }
    }
    val dirEnd = 6 + 16 * specs.size
    val total = dirEnd + payloads.map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putShort(0).putShort(if (cursor) 2 else 1).putShort(specs.size.toShort)
    var off = dirEnd
    specs.zip(payloads).zipWithIndex.foreach { case ((p, bytes), i) =>
      def dim(v: Int): Byte = { require(v >= 1 && v <= 256); (v & 0xff).toByte }
      buf.put(dim(p.w)).put(dim(p.h)).put(0.toByte).put(0.toByte)
      if (cursor) buf.putShort((i * 3).toShort).putShort((i * 5).toShort)
      else buf.putShort(1.toShort).putShort(32.toShort)
      buf.putInt(bytes.length).putInt(off)
      off += bytes.length
    }
    payloads.foreach(buf.put)
    buf.array()
  }
}
