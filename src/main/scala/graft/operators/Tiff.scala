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
  * real multi-strip layout), TILED organization (§15, edge tiles
  * coded full-size and clipped), 8-bit grayscale and RGB, BILEVEL
  * (1-bit — the default when BitsPerSample is absent, per spec; both
  * WhiteIsZero and BlackIsZero, normalized on output to black=0 /
  * white=255 grayscale bytes), and the compressions scanned corpora
  * meet: none, PackBits (spec §9), LZW — a COMPOSITION: ISO 32000's
  * LZWDecode (`PdfText.lzwDecode`, already validated against
  * reference PDFs) IS the TIFF algorithm, early-change included —
  * and the CCITT codings (composed from `CcittG4`, this repo's
  * from-scratch T.4/T.6 codec; bilevel + WhiteIsZero only):
  * Compression 4 = Group 4 two-dimensional — how archival book scans,
  * patents and newspaper digitization actually ship —
  * Compression 2 = the byte-aligned Modified Huffman 1-D rows, and
  * Compression 3 = T.4 Group 3 with EOL framing — 1-D and 2-D
  * (T4Options bit 0: a tag bit per row, 2-D rows decoded by the same
  * vertical/horizontal/pass machinery as G4), plain and byte-aligned
  * EOLs (bit 2); T.4 uncompressed mode rejects (all r13).
  *
  * Reject-don't-guess: magic and the 42 must verify, IFD entry counts
  * and value offsets bounds-check, required tags must be present,
  * segment offsets/byte-counts must lie inside the file, every strip
  * or tile must decompress to EXACTLY its expected byte length
  * (PackBits over/under-run and LZW truncation reject), bits-per-
  * sample other than 1 or 8, palette/CMYK photometrics, 8-bit
  * WhiteIsZero, T.4 uncompressed mode (T4Options bit 1),
  * G4 uncompressed mode (T6Options ≠ 0), FillOrder 2 outside the
  * bit-oriented bilevel codings (where real fax hardware writes it —
  * undone by per-byte bit reversal), mixed
  * strip+tile directories, non-multiple-of-16 tile dims, and planar
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
    // BitsPerSample: absent means the spec default of 1 (bilevel); any
    // explicit value other than all-1 or all-8 rejects (16-bit, mixed)
    val depth =
      if (!tags.containsKey(258)) 1
      else vec(258) match {
        case v if v == Vector.fill(spp)(8L) => 8
        case v if v == Vector.fill(spp)(1L) => 1
        case _ => throw Malformed
      }
    // accepted combinations, everything else loud:
    //  - 8-bit gray (photometric 1 = BlackIsZero) / 8-bit RGB (2)
    //  - bilevel (depth 1, spp 1): photometric 0 (WhiteIsZero — the
    //    fax/scan default) or 1; output normalized to black=0/white=255
    //    grayscale bytes either way
    // palette (3), CMYK (5), 8-bit WhiteIsZero all reject — a
    // mis-mapped photometric is silently-inverted or false-color pixels
    val ok =
      (depth == 8 && photometric == 1 && spp == 1) ||
      (depth == 8 && photometric == 2 && spp == 3) ||
      (depth == 1 && spp == 1 && (photometric == 0 || photometric == 1))
    if (!ok) throw Malformed
    if (scalar(284, default = 1) != 1) throw Malformed // planar chunky only
    // FillOrder 2 (LSB-first bit fill) is how real fax hardware writes
    // CCITT data (r13b): legal for the bit-oriented codings, undone by
    // a per-byte bit reversal before decode. For byte-oriented or
    // 8-bit data it is meaningless and stays rejected rather than
    // silently ignored.
    val fillOrder = scalar(266, default = 1).toInt
    if (fillOrder != 1 && fillOrder != 2) throw Malformed
    if (fillOrder == 2 && !(depth == 1 && (compression == 1 ||
      compression == 2 || compression == 3 || compression == 4)))
      throw Malformed
    // compression legality per depth; G3 (2 = MH-RLE, 3 = T.4) stays a
    // documented rejection — G4 is what scanned corpora ship
    compression match {
      case 1 | 5 | 32773 => ()
      case 2 | 3 | 4 =>
        // the CCITT codings — MH 1-D (2), T.4 G3 1-D with EOLs (3),
        // G4 (4); data is coded white/black directly, so accept only
        // the unambiguous fax photometric (0 = WhiteIsZero)
        if (depth != 1) throw Malformed
        if (photometric != 0) throw Malformed
        if (compression == 4 && scalar(293, default = 0) != 0)
          throw Malformed // T6Options: no uncompressed mode
        // T4Options: bit 0 = 2-D coding (r13b: supported — tag bit per
        // row, 2-D rows share the G4 line machinery), bit 1 =
        // uncompressed mode (reject), bit 2 = byte-aligned EOLs
        if (compression == 3 && (scalar(292, default = 0) & ~5L) != 0)
          throw Malformed
      case _ => throw Malformed // reject, don't guess (incl. JPEG-in-TIFF)
    }
    val g3Aligned = compression == 3 && (scalar(292, default = 0) & 4L) != 0
    val g3TwoDim = compression == 3 && (scalar(292, default = 0) & 1L) != 0

    /** Decompress one segment (strip or tile) of `segW`×`segRows`
      * pixels to UNPACKED bytes: depth-8 interleaved samples, or for
      * depth 1 one byte per pixel normalized to black=0 / white=255.
      */
    def decodeSegment(off: Long, len: Long, segW: Int, segRows: Int): Array[Byte] = {
      if (off < 0 || len < 0 || len > (64 << 20) || off + len > b.length)
        throw Malformed
      val raw = java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt)
      if (fillOrder == 2) { // undo LSB-first fill: reverse bits per byte
        var i = 0
        while (i < raw.length) {
          raw(i) = (java.lang.Integer.reverse(raw(i) & 0xff) >>> 24).toByte
          i += 1
        }
      }
      if (compression == 4 || compression == 3 || compression == 2) {
        val bits = (compression match {
          case 4 => CcittG4.decode(raw, segW, segRows)
          case 3 => CcittG4.decodeG3(raw, segW, segRows, g3Aligned, g3TwoDim)
          case _ => CcittG4.decodeMh(raw, segW, segRows)
        }).getOrElse(throw Malformed)
        // G4 runs are white/black by definition; photometric 0 verified
        val px = new Array[Byte](bits.length)
        var i = 0
        while (i < bits.length) {
          px(i) = if (bits(i) == 0) 255.toByte else 0.toByte
          i += 1
        }
        px
      } else {
        // packed layout: depth-8 → segW*spp bytes/row; depth-1 → rows
        // pad to a byte boundary per row (TIFF 6.0 §「Image Data」)
        val packedRow = if (depth == 8) segW * spp else (segW + 7) / 8
        val expect = packedRow * segRows
        val data = compression match {
          case 1 => raw
          case 5 => PdfText.lzwDecode(raw, earlyChange = true) // TIFF §13 = ISO 32000 §7.4.4
          case 32773 => unpackBits(raw, expect)
        }
        if (data.length != expect) throw Malformed // exact segment consume
        if (depth == 8) data
        else {
          // expand bits → bytes, normalizing photometric: WhiteIsZero
          // (0): bit 0 = white; BlackIsZero (1): bit 0 = black
          val whiteBit = if (photometric == 0) 0 else 1
          val px = new Array[Byte](segW * segRows)
          var r0 = 0
          while (r0 < segRows) {
            var x = 0
            while (x < segW) {
              val bit = (data(r0 * packedRow + (x >> 3)) >> (7 - (x & 7))) & 1
              px(r0 * segW + x) = if (bit == whiteBit) 255.toByte else 0.toByte
              x += 1
            }
            r0 += 1
          }
          px
        }
      }
    }

    val rowBytes = width * spp // output is always unpacked bytes
    val pixels = new Array[Byte](rowBytes * height)
    val tiled = tags.containsKey(322) || tags.containsKey(323) ||
      tags.containsKey(324) || tags.containsKey(325)
    if (tiled) {
      // tiled organization (TIFF 6.0 §15): tile dims are multiples of
      // 16; edge tiles are coded at FULL tile size and clipped here.
      // Strip and tile tags are mutually exclusive — both present is a
      // malformed directory.
      if (tags.containsKey(273) || tags.containsKey(279) ||
        tags.containsKey(278)) throw Malformed
      val tw = scalar(322).toInt
      val tl = scalar(323).toInt
      if (tw <= 0 || tl <= 0 || tw % 16 != 0 || tl % 16 != 0) throw Malformed
      if (tw.toLong * tl > MaxPixels) throw Malformed
      val across = (width + tw - 1) / tw
      val down = (height + tl - 1) / tl
      val offsets = vec(324)
      val counts = vec(325)
      if (offsets.length != across * down || counts.length != across * down)
        throw Malformed
      var ty = 0
      while (ty < down) {
        var tx = 0
        while (tx < across) {
          val idx = ty * across + tx
          val seg = decodeSegment(offsets(idx), counts(idx), tw, tl)
          val copyW = math.min(tw, width - tx * tw) * spp
          val copyRows = math.min(tl, height - ty * tl)
          var r0 = 0
          while (r0 < copyRows) {
            System.arraycopy(seg, r0 * tw * spp, pixels,
              (ty * tl + r0) * rowBytes + tx * tw * spp, copyW)
            r0 += 1
          }
          tx += 1
        }
        ty += 1
      }
    } else {
      val rowsPerStrip = scalar(278, default = height.toLong).toInt
      if (rowsPerStrip <= 0) throw Malformed
      val offsets = vec(273)
      val counts = vec(279)
      val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
      if (offsets.length != nStrips || counts.length != nStrips) throw Malformed
      var strip = 0
      while (strip < nStrips) {
        val rows = math.min(rowsPerStrip, height - strip * rowsPerStrip)
        val data = decodeSegment(offsets(strip), counts(strip), width, rows)
        System.arraycopy(data, 0, pixels, strip * rowsPerStrip * rowBytes,
          rows * rowBytes)
        strip += 1
      }
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
        // literal run: extend until a ≥3 repeat starts or 128 bytes.
        // (r13 fix: the old sentinel jumped `end` to the array end when
        // a repeat followed the literals, emitting a >128 literal count
        // that wraps negative — surfaced by zero-padded edge tiles,
        // where literals are always followed by a long zero run)
        var lit = i + run
        var litRun = run
        var stop = false
        while (!stop && lit < in.length && litRun < 128) {
          var r2 = 1
          while (lit + r2 < in.length && in(lit + r2) == in(lit) && r2 < 3) r2 += 1
          if (r2 >= 3) stop = true
          else { lit += 1; litRun += 1 }
        }
        val end = math.min(lit, in.length)
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

  /** Writer-side page descriptor. `px(k)` yields the DECODED pixel
    * byte at flat interleaved index k — gray/RGB samples for depth 8;
    * for depth 1 a 0 (black) / nonzero (white) value that the writer
    * packs to bits under `photometric` (0 = WhiteIsZero, the fax
    * default; 1 = BlackIsZero). `tile` switches the page from strips
    * to tiled organization (dims must be multiples of 16).
    */
  final case class PageSpec(width: Int, height: Int, spp: Int,
      depth: Int, photometric: Int, comp: Int, px: Int => Byte,
      tile: Option[(Int, Int)] = None, rowsPerStrip: Int = 2,
      t6opts: Int = 0, fillOrder: Int = 1, t4opts: Int = 0) // option knobs

  /** Multi-page TIFF writer: one IFD per page, strip-split at
    * `rowsPerStrip`, per-page compression from `comps` (1/5/32773),
    * either byte order. 8-bit pages only (the r12 surface); the
    * general form is `makeTiffExt`.
    */
  def makeTiff(pages: Seq[(Int, Int, Int, Int => Byte)], comps: Seq[Int],
      littleEndian: Boolean, rowsPerStrip: Int = 2): Array[Byte] = {
    require(pages.nonEmpty && comps.length == pages.length)
    makeTiffExt(pages.zip(comps).map { case ((w, h, spp, f), comp) =>
      PageSpec(w, h, spp, 8, if (spp == 3) 2 else 1, comp, f,
        tile = None, rowsPerStrip = rowsPerStrip)
    }, littleEndian)
  }

  /** General multi-page writer: 8-bit gray/RGB and bilevel pages,
    * strips or tiles, compressions none/LZW/PackBits/CCITT-G4, either
    * byte order. Layout: header(8) then, per page,
    * [segments | external arrays | IFD]; the next-IFD chain is patched
    * at assembly.
    */
  def makeTiffExt(pages: Seq[PageSpec], littleEndian: Boolean): Array[Byte] = {
    require(pages.nonEmpty)
    pages.foreach { p =>
      require(p.depth == 8 || (p.depth == 1 && p.spp == 1))
      require((p.comp != 4 && p.comp != 3 && p.comp != 2) ||
        (p.depth == 1 && p.photometric == 0))
      p.tile.foreach { case (tw, tl) =>
        require(tw > 0 && tl > 0 && tw % 16 == 0 && tl % 16 == 0)
      }
    }
    var cursor = 8

    /** Encode one segment (strip rows [y0, y0+rows) at full width, or a
      * tile at (x0, y0) of tw×tl) to its compressed bytes. Out-of-image
      * pixels (tile padding) are white for bilevel, 0 for 8-bit.
      */
    def segment(p: PageSpec, x0: Int, y0: Int, segW: Int, segRows: Int): Array[Byte] = {
      def sample(x: Int, y: Int, c: Int): Byte =
        if (x >= p.width || y >= p.height) {
          if (p.depth == 1) 1 else 0 // pad: white / zero
        } else p.px((y * p.width + x) * p.spp + c)
      if (p.comp == 4 || p.comp == 3 || p.comp == 2) {
        // the CcittG4 encoders take 1 = black bytes
        val black = new Array[Byte](segW * segRows)
        var i = 0
        while (i < black.length) {
          val x = x0 + i % segW
          val y = y0 + i / segW
          black(i) = if (sample(x, y, 0) == 0) 1 else 0
          i += 1
        }
        val enc = p.comp match {
          case 4 => CcittG4.encode(black, segW, segRows)
          case 3 => CcittG4.encodeG3(black, segW, segRows,
            (p.t4opts & 4) != 0, (p.t4opts & 1) != 0)
          case _ => CcittG4.encodeMh(black, segW, segRows)
        }
        if (p.fillOrder == 2) enc.map(b =>
          (java.lang.Integer.reverse(b & 0xff) >>> 24).toByte)
        else enc
      } else {
        val raw: Array[Byte] =
          if (p.depth == 8)
            Array.tabulate(segW * segRows * p.spp) { k =>
              val px = k / p.spp
              sample(x0 + px % segW, y0 + px / segW, k % p.spp)
            }
          else {
            val packedRow = (segW + 7) / 8
            val out = new Array[Byte](packedRow * segRows)
            val whiteBit = if (p.photometric == 0) 0 else 1
            var y = 0
            while (y < segRows) {
              var x = 0
              while (x < segW) {
                val white = sample(x0 + x, y0 + y, 0) != 0
                val bit = if (white) whiteBit else 1 - whiteBit
                if (bit == 1)
                  out(y * packedRow + (x >> 3)) =
                    (out(y * packedRow + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
                x += 1
              }
              y += 1
            }
            out
          }
        val body = p.comp match {
          case 1 => raw
          case 5 => lzwEncode(raw)
          case 32773 => packBits(raw)
        }
        if (p.fillOrder == 2 && p.depth == 1 && p.comp == 1)
          body.map(b => (java.lang.Integer.reverse(b & 0xff) >>> 24).toByte)
        else body
      }
    }

    val rendered = pages.map { p =>
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
      // render segments in file order, collecting their offsets
      val segs: Seq[Array[Byte]] = p.tile match {
        case Some((tw, tl)) =>
          val across = (p.width + tw - 1) / tw
          val down = (p.height + tl - 1) / tl
          for (ty <- 0 until down; tx <- 0 until across)
            yield segment(p, tx * tw, ty * tl, tw, tl)
        case None =>
          val nStrips = (p.height + p.rowsPerStrip - 1) / p.rowsPerStrip
          (0 until nStrips).map { s =>
            val rows = math.min(p.rowsPerStrip, p.height - s * p.rowsPerStrip)
            segment(p, 0, s * p.rowsPerStrip, p.width, rows)
          }
      }
      val segOffs = Vector.newBuilder[Long]
      segs.foreach { s =>
        segOffs += (cursor + local.size()).toLong
        local.write(s)
      }
      val offs = segOffs.result()
      // external arrays (offsets/counts when >1 segment; bps when spp=3)
      val offArrayPos =
        if (segs.length > 1) { val q = cursor + local.size(); offs.foreach(l32); q }
        else -1
      val cntArrayPos =
        if (segs.length > 1) { val q = cursor + local.size(); segs.foreach(s => l32(s.length.toLong)); q }
        else -1
      val bpsArrayPos =
        if (p.spp == 3) { val q = cursor + local.size(); (0 until 3).foreach(_ => l16(p.depth)); l16(0); q }
        else -1
      if (local.size() % 2 == 1) local.write(0) // IFDs are word-aligned
      val ifdPos = cursor + local.size()
      final case class Ent(tag: Int, ty: Int, count: Long, value: Long)
      val segTags: Vector[Ent] = p.tile match {
        case Some((tw, tl)) => Vector(
          Ent(322, 3, 1, tw.toLong),
          Ent(323, 3, 1, tl.toLong),
          if (segs.length > 1) Ent(324, 4, segs.length.toLong, offArrayPos.toLong)
          else Ent(324, 4, 1, offs.head),
          if (segs.length > 1) Ent(325, 4, segs.length.toLong, cntArrayPos.toLong)
          else Ent(325, 4, 1, segs.head.length.toLong))
        case None => Vector(
          if (segs.length > 1) Ent(273, 4, segs.length.toLong, offArrayPos.toLong)
          else Ent(273, 4, 1, offs.head),
          Ent(278, 4, 1, p.rowsPerStrip.toLong),
          if (segs.length > 1) Ent(279, 4, segs.length.toLong, cntArrayPos.toLong)
          else Ent(279, 4, 1, segs.head.length.toLong))
      }
      val entries = (Vector(
        Ent(256, 4, 1, p.width.toLong),
        Ent(257, 4, 1, p.height.toLong),
        if (p.spp == 3) Ent(258, 3, 3, bpsArrayPos.toLong)
        else Ent(258, 3, 1, p.depth.toLong),
        Ent(259, 3, 1, p.comp.toLong),
        Ent(262, 3, 1, p.photometric.toLong),
        Ent(277, 3, 1, p.spp.toLong)) ++
        (if (p.fillOrder != 1) Vector(Ent(266, 3, 1, p.fillOrder.toLong)) else Vector()) ++
        (if (p.comp == 3) Vector(Ent(292, 4, 1, p.t4opts.toLong)) else Vector()) ++
        (if (p.comp == 4) Vector(Ent(293, 4, 1, p.t6opts.toLong)) else Vector()) ++
        segTags).sortBy(_.tag)
      l16(entries.length)
      entries.foreach { en =>
        l16(en.tag); l16(en.ty); l32(en.count)
        if (en.ty == 3 && en.count == 1) { l16(en.value.toInt); l16(0) }
        else l32(en.value)
      }
      val nextIfdField = local.size()
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
      val v = blobs(i + 1)._2.toLong
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
