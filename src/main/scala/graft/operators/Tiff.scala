package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TIFF decode — the format scanned-document corpora actually ship
  * (archival book scans, newspaper digitization drops, and fax/records
  * dumps publish multi-page TIFF; it is to scan corpora what PDF is to
  * born-digital documents). From-scratch implementation of the public
  * TIFF 6.0 specification: BOTH byte orders (`II`/`MM`), the IFD entry
  * walk with SHORT/LONG value coercion and inline-vs-offset value
  * placement resolved by size, multi-page files via the next-IFD
  * chain (cycle-guarded), strip assembly (RowsPerStrip < height →
  * real multi-strip layout), 8-bit grayscale and RGB, and the three
  * compressions baseline readers meet: none, PackBits (spec §9), and
  * LZW — the LZW filter is a COMPOSITION: ISO 32000's LZWDecode
  * (`PdfText.lzwDecode`, already validated against reference PDFs) IS
  * the TIFF algorithm, early-change variant included.
  *
  * Reject-don't-guess: magic and the 42 must verify, IFD entry counts
  * and value offsets bounds-check, required tags must be present,
  * strip offsets/byte-counts must lie inside the file, every strip
  * must decompress to EXACTLY its expected byte length (PackBits
  * over/under-run and LZW truncation reject), bits-per-sample other
  * than 8, palette/CMYK photometrics, tiled layout, and planar
  * configuration 2 all reject loudly rather than half-decode, and the
  * page walk carries a cycle guard plus a pixel bomb cap checked
  * BEFORE allocation.
  *
  * Shape at 100 TB: a scan file is the natural split unit — per-file
  * parallelism, scan-local decode, zero shuffle; page stats are
  * emitted per IFD so a 500-page book scan parallelizes downstream.
  */
object Tiff {

  private val MaxPixels = 1 << 24 // per page, checked before allocation
  private val MaxPages = 4096

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class Rd(b: Array[Byte], le: Boolean) {
    def u16(o: Int): Int = {
      if (o < 0 || o + 2 > b.length) throw Malformed
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    def u32(o: Int): Long = {
      if (o < 0 || o + 4 > b.length) throw Malformed
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    }
  }

  final case class Page(width: Int, height: Int, samplesPerPixel: Int,
      compression: Int, pixels: Array[Byte]) // interleaved, row-major

  /** All pages, in IFD-chain order; None on ANY spec violation. */
  def decode(bytes: Array[Byte]): Option[Vector[Page]] = {
    try {
      if (bytes == null || bytes.length < 8) throw Malformed
      val le = (bytes(0), bytes(1)) match {
        case ('I', 'I') => true
        case ('M', 'M') => false
        case _ => throw Malformed
      }
      val r = new Rd(bytes, le)
      if (r.u16(2) != 42) throw Malformed
      val out = Vector.newBuilder[Page]
      val visited = new java.util.HashSet[Long]()
      var ifd = r.u32(4)
      var pages = 0
      while (ifd != 0) {
        if (!visited.add(ifd)) throw Malformed // IFD cycle
        pages += 1
        if (pages > MaxPages) throw Malformed
        out += decodePage(bytes, r, ifd.toInt)
        val n = r.u16(ifd.toInt)
        ifd = r.u32(ifd.toInt + 2 + 12 * n)
      }
      if (pages == 0) throw Malformed
      Some(out.result())
    } catch {
      case Malformed => None
      case _: PdfText.PdfError => None // LZW violations from the shared filter
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** One IFD's tag map: tag → (type, count, valueField offset). */
  private def decodePage(b: Array[Byte], r: Rd, ifd: Int): Page = {
    val n = r.u16(ifd)
    if (n == 0 || n > 512) throw Malformed
    var e = 0
    val tags = new java.util.HashMap[Int, (Int, Long, Int)]()
    var lastTag = -1
    while (e < n) {
      val o = ifd + 2 + 12 * e
      val tag = r.u16(o)
      // the spec requires ascending tag order; writers honor it and it
      // makes a malformed directory detectable
      if (tag <= lastTag) throw Malformed
      lastTag = tag
      tags.put(tag, (r.u16(o + 2), r.u32(o + 4), o + 8))
      e += 1
    }
    def scalar(tag: Int, default: Long = -1): Long = {
      val t = tags.get(tag)
      if (t == null) {
        if (default >= 0) return default
        throw Malformed
      }
      val (ty, count, vo) = t
      if (count != 1) throw Malformed
      ty match {
        case 3 => r.u16(vo).toLong
        case 4 => r.u32(vo)
        case _ => throw Malformed
      }
    }
    /** A SHORT/LONG array: inline when it fits the 4-byte value field,
      * else at the value offset.
      */
    def vec(tag: Int): Vector[Long] = {
      val t = tags.get(tag)
      if (t == null) throw Malformed
      val (ty, count, vo) = t
      if (count < 1 || count > (1 << 20)) throw Malformed
      val width = ty match {
        case 3 => 2
        case 4 => 4
        case _ => throw Malformed
      }
      val base = if (count * width <= 4) vo else {
        val off = r.u32(vo)
        if (off < 0 || off + count * width > b.length) throw Malformed
        off.toInt
      }
      (0 until count.toInt).map { i =>
        if (width == 2) r.u16(base + 2 * i).toLong else r.u32(base + 4 * i)
      }.toVector
    }
    val width = scalar(256).toInt
    val height = scalar(257).toInt
    val compression = scalar(259, default = 1).toInt
    val photometric = scalar(262).toInt
    val spp = scalar(277, default = 1).toInt
    if (width <= 0 || height <= 0) throw Malformed
    if (width.toLong * height > MaxPixels) throw Malformed // bomb cap
    if (spp != 1 && spp != 3) throw Malformed
    // grayscale (1 = BlackIsZero) or RGB (2); palette (3), CMYK (5),
    // WhiteIsZero (0) reject loudly — a mis-mapped photometric is
    // silently-inverted or false-color pixels
    if (!(photometric == 1 && spp == 1) && !(photometric == 2 && spp == 3))
      throw Malformed
    // BitsPerSample: REQUIRED here — the spec default is 1 bit
    // (bilevel), which this reader does not decode; accepting an
    // absent tag as 8-bit would rely on the exact-consume check to
    // catch the mismatch instead of saying why
    if (!tags.containsKey(258) || vec(258) != Vector.fill(spp)(8L))
      throw Malformed
    if (scalar(284, default = 1) != 1) throw Malformed // planar chunky only
    if (tags.containsKey(322) || tags.containsKey(323)) throw Malformed // tiles
    val rowsPerStrip = scalar(278, default = height.toLong).toInt
    if (rowsPerStrip <= 0) throw Malformed
    val offsets = vec(273)
    val counts = vec(279)
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    if (offsets.length != nStrips || counts.length != nStrips) throw Malformed
    val rowBytes = width * spp
    val pixels = new Array[Byte](rowBytes * height)
    var strip = 0
    while (strip < nStrips) {
      val off = offsets(strip)
      val len = counts(strip)
      if (off < 0 || len < 0 || len > (64 << 20) || off + len > b.length)
        throw Malformed
      val raw = java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt)
      val rows = math.min(rowsPerStrip, height - strip * rowsPerStrip)
      val expect = rows * rowBytes
      val data = compression match {
        case 1 => raw
        case 5 => PdfText.lzwDecode(raw, earlyChange = true) // TIFF §13 = ISO 32000 §7.4.4
        case 32773 => unpackBits(raw, expect)
        case _ => throw Malformed // reject, don't guess (incl. CCITT, JPEG-in-TIFF)
      }
      if (data.length != expect) throw Malformed // exact strip consume
      System.arraycopy(data, 0, pixels, strip * rowsPerStrip * rowBytes, expect)
      strip += 1
    }
    Page(width, height, spp, compression, pixels)
  }

  /** PackBits (TIFF 6.0 §9): n in 0..127 → n+1 literals; n in
    * -127..-1 → next byte repeated 1-n times; -128 is a no-op. The
    * output must land EXACTLY on `expect` (the caller re-checks).
    */
  private def unpackBits(in: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = 0
    var o = 0
    while (i < in.length) {
      val n = in(i); i += 1
      if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > in.length || o + cnt > expect) throw Malformed
        System.arraycopy(in, i, out, o, cnt)
        i += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (i >= in.length || o + cnt > expect) throw Malformed
        java.util.Arrays.fill(out, o, o + cnt, in(i))
        i += 1; o += cnt
      }
    }
    if (o != expect) throw Malformed
    out
  }

  // ---------------- Spark surface ----------------

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("page", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("spp", IntegerType),
    StructField("mean0", DoubleType),
    StructField("mean1", DoubleType),
    StructField("mean2", DoubleType)))

  /** binaryFile-shaped relation of `.tiff` files → one stats row per
    * PAGE (multi-page scans parallelize downstream). Channel means are
    * computed in the scan-local walk; a malformed file contributes
    * zero rows.
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { it =>
      it.flatMap { r =>
        val fname = r.getString(0)
        decode(r.getAs[Array[Byte]](1)) match {
          case Some(ps) => ps.iterator.zipWithIndex.map { case (p, i) =>
            val n = p.width * p.height
            val sums = new Array[Long](p.samplesPerPixel)
            var k = 0
            while (k < p.pixels.length) {
              sums(k % p.samplesPerPixel) += p.pixels(k) & 0xff
              k += 1
            }
            def mean(c: Int): Any =
              if (c < p.samplesPerPixel)
                BigDecimal(sums(c).toDouble / n)
                  .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
              else null
            Row(fname, i, p.width, p.height, p.samplesPerPixel,
              mean(0), mean(1), mean(2))
          }
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  // ---------------- writer (fixture reverse direction) ----------------

  private def packBits(in: Array[Byte]): Array[Byte] = {
    // simple run-length packer: emit runs ≥ 3 as repeats, else literals
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < in.length) {
      var run = 1
      while (i + run < in.length && in(i + run) == in(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(1 - run); out.write(in(i)); i += run
      } else {
        var lit = i + run
        var litRun = 1
        while (lit < in.length && litRun < 128) {
          // stop literals when a ≥3 run starts
          var r2 = 1
          while (lit + r2 < in.length && in(lit + r2) == in(lit) && r2 < 3) r2 += 1
          if (r2 >= 3) lit = in.length + 1 // sentinel: break
          else { lit += 1; litRun += 1 }
        }
        val end = math.min(if (lit > in.length) lit - 1 else lit, in.length)
        val cnt = end - i
        out.write(cnt - 1)
        out.write(in, i, cnt)
        i = end
      }
    }
    out.toByteArray
  }

  /** TIFF LZW encoder (early change) — the fixture's reverse
    * direction for compression 5; `PdfText.lzwDecode` and real
    * readers must both invert it.
    */
  private def lzwEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var nbits = 0
    def put(code: Int, width: Int): Unit = {
      cur = (cur << width) | code
      nbits += width
      while (nbits >= 8) {
        out.write(((cur >> (nbits - 8)) & 0xff).toInt)
        nbits -= 8
      }
    }
    val dict = new java.util.HashMap[String, Int]()
    def reset(): Unit = {
      dict.clear()
      (0 until 256).foreach(i => dict.put(i.toChar.toString, i))
    }
    reset()
    var next = 258
    var width = 9
    put(256, width) // Clear
    var w = ""
    var i = 0
    while (i < in.length) {
      val c = (in(i) & 0xff).toChar
      val wc = w + c
      if (dict.containsKey(wc)) w = wc
      else {
        put(dict.get(w), width)
        dict.put(wc, next)
        next += 1
        // width pairing with the early-change DECODER: the decoder's
        // table lags the encoder's by one entry and bumps at
        // 2^w - 1, so the encoder bumps when its own count reaches
        // 2^w (TiffSpec pins a >512-entry page across the boundary)
        if (next == 512) width = 10
        else if (next == 1024) width = 11
        else if (next == 2048) width = 12
        else if (next == 4096) {
          put(256, width); reset(); next = 258; width = 9
        }
        w = c.toString
      }
      i += 1
    }
    if (w.nonEmpty) put(dict.get(w), width)
    put(257, width) // EOI
    if (nbits > 0) out.write(((cur << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Multi-page TIFF writer: one IFD per page, strip-split at
    * `rowsPerStrip`, per-page compression from `comps` (1/5/32773),
    * either byte order.
    */
  def makeTiff(pages: Seq[(Int, Int, Int, Int => Byte)], comps: Seq[Int],
      littleEndian: Boolean, rowsPerStrip: Int = 2): Array[Byte] = {
    require(pages.nonEmpty && comps.length == pages.length)
    // layout: header(8) then, per page, [strips | external arrays | IFD];
    // IFD offsets are known once each page's local block is rendered, so
    // the header and next-IFD chain are patched at assembly
    var cursor = 8
    val pageBlobs = pages.zip(comps).map { case ((width, height, spp, px), comp) =>
      val rowBytes = width * spp
      val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
      val strips = (0 until nStrips).map { s =>
        val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
        val rawStrip = Array.tabulate(rows * rowBytes)(k =>
          px(s * rowsPerStrip * rowBytes + k))
        comp match {
          case 1 => rawStrip
          case 5 => lzwEncode(rawStrip)
          case 32773 => packBits(rawStrip)
        }
      }
      (width, height, spp, comp, strips)
    }
    // layout: [strips + bps arrays + offset arrays][IFD] per page
    val rendered = pageBlobs.map { case (width, height, spp, comp, strips) =>
      val local = new java.io.ByteArrayOutputStream()
      def l16(v: Int): Unit = {
        if (littleEndian) { local.write(v & 0xff); local.write((v >>> 8) & 0xff) }
        else { local.write((v >>> 8) & 0xff); local.write(v & 0xff) }
      }
      def l32(v: Long): Unit = {
        if (littleEndian) {
          local.write((v & 0xff).toInt); local.write(((v >>> 8) & 0xff).toInt)
          local.write(((v >>> 16) & 0xff).toInt); local.write(((v >>> 24) & 0xff).toInt)
        } else {
          local.write(((v >>> 24) & 0xff).toInt); local.write(((v >>> 16) & 0xff).toInt)
          local.write(((v >>> 8) & 0xff).toInt); local.write((v & 0xff).toInt)
        }
      }
      val stripOffs = Vector.newBuilder[Long]
      strips.foreach { s =>
        stripOffs += (cursor + local.size()).toLong
        local.write(s)
      }
      val offs = stripOffs.result()
      // external arrays (strip offsets/counts; bps when spp=3)
      val offArrayPos =
        if (strips.length > 1) { val p = cursor + local.size(); offs.foreach(l32); p }
        else -1
      val cntArrayPos =
        if (strips.length > 1) { val p = cursor + local.size(); strips.foreach(s => l32(s.length.toLong)); p }
        else -1
      val bpsArrayPos =
        if (spp == 3) { val p = cursor + local.size(); (0 until 3).foreach(_ => l16(8)); l16(0); p }
        else -1
      if (local.size() % 2 == 1) local.write(0) // IFDs are word-aligned
      val ifdPos = cursor + local.size()
      // IFD: entries ASCENDING by tag
      final case class Ent(tag: Int, ty: Int, count: Long, value: Long)
      val entries = Vector(
        Ent(256, 4, 1, width.toLong),
        Ent(257, 4, 1, height.toLong),
        if (spp == 3) Ent(258, 3, 3, bpsArrayPos.toLong)
        else Ent(258, 3, 1, 8L),
        Ent(259, 3, 1, comp.toLong),
        Ent(262, 3, 1, if (spp == 3) 2L else 1L),
        if (strips.length > 1) Ent(273, 4, strips.length.toLong, offArrayPos.toLong)
        else Ent(273, 4, 1, offs.head),
        Ent(277, 3, 1, spp.toLong),
        Ent(278, 4, 1, rowsPerStrip.toLong),
        if (strips.length > 1) Ent(279, 4, strips.length.toLong, cntArrayPos.toLong)
        else Ent(279, 4, 1, strips.head.length.toLong))
      l16(entries.length)
      entries.foreach { en =>
        l16(en.tag); l16(en.ty); l32(en.count)
        if (en.ty == 3 && en.count == 1) { l16(en.value.toInt); l16(0) }
        else l32(en.value)
      }
      val nextIfdField = local.size() // patched by caller ordering below
      l32(0L) // placeholder next-IFD
      val bytes = local.toByteArray
      cursor += bytes.length
      (bytes, ifdPos, nextIfdField)
    }
    // chain the IFDs
    val blobs = rendered.toArray
    var i = 0
    while (i < blobs.length - 1) {
      val (bytes, _, nextField) = blobs(i)
      val nextIfd = blobs(i + 1)._2
      val v = nextIfd.toLong
      if (littleEndian) {
        bytes(nextField) = (v & 0xff).toByte
        bytes(nextField + 1) = ((v >>> 8) & 0xff).toByte
        bytes(nextField + 2) = ((v >>> 16) & 0xff).toByte
        bytes(nextField + 3) = ((v >>> 24) & 0xff).toByte
      } else {
        bytes(nextField) = ((v >>> 24) & 0xff).toByte
        bytes(nextField + 1) = ((v >>> 16) & 0xff).toByte
        bytes(nextField + 2) = ((v >>> 8) & 0xff).toByte
        bytes(nextField + 3) = (v & 0xff).toByte
      }
      i += 1
    }
    // final assembly: header points at the FIRST page's IFD
    val fin = new java.io.ByteArrayOutputStream()
    fin.write(if (littleEndian) 'I' else 'M')
    fin.write(if (littleEndian) 'I' else 'M')
    def f16(v: Int): Unit = {
      if (littleEndian) { fin.write(v & 0xff); fin.write((v >>> 8) & 0xff) }
      else { fin.write((v >>> 8) & 0xff); fin.write(v & 0xff) }
    }
    def f32(v: Long): Unit = {
      if (littleEndian) {
        fin.write((v & 0xff).toInt); fin.write(((v >>> 8) & 0xff).toInt)
        fin.write(((v >>> 16) & 0xff).toInt); fin.write(((v >>> 24) & 0xff).toInt)
      } else {
        fin.write(((v >>> 24) & 0xff).toInt); fin.write(((v >>> 16) & 0xff).toInt)
        fin.write(((v >>> 8) & 0xff).toInt); fin.write((v & 0xff).toInt)
      }
    }
    f16(42)
    f32(blobs(0)._2.toLong)
    blobs.foreach { case (bytes, _, _) => fin.write(bytes) }
    fin.toByteArray
  }
}
