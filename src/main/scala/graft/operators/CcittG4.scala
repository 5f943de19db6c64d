package graft.operators

/** CCITT Group 4 (ITU-T T.6) two-dimensional bilevel coding — the
  * compression scanned-document corpora actually use: archival book
  * scans, patent images and newspaper digitization overwhelmingly ship
  * G4-compressed bilevel TIFF (TIFF 6.0 §11, Compression = 4).
  * From-scratch implementation of the public T.4/T.6 specification:
  * the full Modified Huffman run-length tables (white and black
  * terminating codes 0–63, make-up codes 64–1728, and the shared
  * extended make-up codes 1792–2560 of T.4 §2 Tables 1–3), and the
  * 2-D vertical/horizontal/pass mode coding of T.4 §2.2.4 with the
  * T.6 rule that EVERY line codes against the previous line (an
  * imaginary all-white line above the first). The same tables also
  * serve the 1-D "Modified Huffman" coding of TIFF Compression 2
  * (`decodeMh`/`encodeMh`, rows byte-aligned, no EOLs).
  *
  * Reject-don't-guess: unknown mode or run codes, runs crossing the
  * line end, non-monotone coding transitions, the 2-D extension code
  * (uncompressed mode — T6Options must have declared it, and this
  * reader rejects that declaration upstream), any EOL inside the data
  * (T.6 has none), and trailing garbage all reject; after the last
  * row the decoder accepts an optional EOFB followed by < 8 zero pad
  * bits, or < 8 zero pad bits alone (TIFF writers may omit EOFB per
  * TIFF 6.0 §11: "the decoder should stop after the expected number
  * of lines").
  *
  * Both directions are implemented (the encoder is the fixture
  * writer's reverse path); TiffSpec pins hand-derived bitstreams
  * computed from the published tables independently of either side,
  * plus round-trips over adversarial run patterns.
  */
object CcittG4 {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---------------- Modified Huffman tables (ITU-T T.4 §2.1.2) ----------
  // Written as the spec publishes them — one "bits" string per code —
  // so each entry is checkable against the standard character by
  // character.

  private val WhiteTerm: Array[String] = Array(
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100",
    "110101", "101010", "101011", "0100111", "0001100", "0001000",
    "0010111", "0000011", "0000100", "0101000", "0101011", "0010011",
    "0100100", "0011000", "00000010", "00000011", "00011010", "00011011",
    "00010010", "00010011", "00010100", "00010101", "00010110", "00010111",
    "00101000", "00101001", "00101010", "00101011", "00101100", "00101101",
    "00000100", "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000", "01011001",
    "01011010", "01011011", "01001010", "01001011", "00110010", "00110011",
    "00110100")

  private val WhiteMakeup: Array[(Int, String)] = Array(
    64 -> "11011", 128 -> "10010", 192 -> "010111", 256 -> "0110111",
    320 -> "00110110", 384 -> "00110111", 448 -> "01100100",
    512 -> "01100101", 576 -> "01101000", 640 -> "01100111",
    704 -> "011001100", 768 -> "011001101", 832 -> "011010010",
    896 -> "011010011", 960 -> "011010100", 1024 -> "011010101",
    1088 -> "011010110", 1152 -> "011010111", 1216 -> "011011000",
    1280 -> "011011001", 1344 -> "011011010", 1408 -> "011011011",
    1472 -> "010011000", 1536 -> "010011001", 1600 -> "010011010",
    1664 -> "011000", 1728 -> "010011011")

  private val BlackTerm: Array[String] = Array(
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111")

  private val BlackMakeup: Array[(Int, String)] = Array(
    64 -> "0000001111", 128 -> "000011001000", 192 -> "000011001001",
    256 -> "000001011011", 320 -> "000000110011", 384 -> "000000110100",
    448 -> "000000110101", 512 -> "0000001101100", 576 -> "0000001101101",
    640 -> "0000001001010", 704 -> "0000001001011", 768 -> "0000001001100",
    832 -> "0000001001101", 896 -> "0000001110010", 960 -> "0000001110011",
    1024 -> "0000001110100", 1088 -> "0000001110101", 1152 -> "0000001110110",
    1216 -> "0000001110111", 1280 -> "0000001010010", 1344 -> "0000001010011",
    1408 -> "0000001010100", 1472 -> "0000001010101", 1536 -> "0000001011010",
    1600 -> "0000001011011", 1664 -> "0000001100100", 1728 -> "0000001100101")

  // T.4 §2.1.3 extended make-up codes, common to both colours.
  private val ExtMakeup: Array[(Int, String)] = Array(
    1792 -> "00000001000", 1856 -> "00000001100", 1920 -> "00000001101",
    1984 -> "000000010010", 2048 -> "000000010011", 2112 -> "000000010100",
    2176 -> "000000010101", 2240 -> "000000010110", 2304 -> "000000010111",
    2368 -> "000000011100", 2432 -> "000000011101", 2496 -> "000000011110",
    2560 -> "000000011111")

  /** Decode lookup: key = (bitLen << 16) | code, value = run. */
  private def buildLookup(term: Array[String],
      makeup: Array[(Int, String)]): java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    def add(run: Int, bits: String): Unit = {
      val code = java.lang.Integer.parseInt(bits, 2)
      val key = (bits.length << 16) | code
      require(!m.containsKey(key), s"duplicate MH code $bits")
      m.put(key, run)
    }
    term.zipWithIndex.foreach { case (bits, run) => add(run, bits) }
    makeup.foreach { case (run, bits) => add(run, bits) }
    ExtMakeup.foreach { case (run, bits) => add(run, bits) }
    m
  }
  private val WhiteLookup = buildLookup(WhiteTerm, WhiteMakeup)
  private val BlackLookup = buildLookup(BlackTerm, BlackMakeup)
  private val MaxCodeLen = 13 // longest MH code (black make-up ≥ 512)

  /** Encode lookup: run → bits. */
  private def buildEnc(term: Array[String],
      makeup: Array[(Int, String)]): java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String]()
    term.zipWithIndex.foreach { case (bits, run) => m.put(run, bits) }
    makeup.foreach { case (run, bits) => m.put(run, bits) }
    ExtMakeup.foreach { case (run, bits) => m.put(run, bits) }
    m
  }
  private val WhiteEnc = buildEnc(WhiteTerm, WhiteMakeup)
  private val BlackEnc = buildEnc(BlackTerm, BlackMakeup)

  // ---------------- bit IO (MSB-first, the fax bit order) ---------------

  private final class BitIn(b: Array[Byte]) {
    var pos = 0 // bit position
    val end: Int = b.length * 8
    def bit(): Int = {
      if (pos >= end) throw Malformed
      val v = (b(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def remaining: Int = end - pos
    /** All bits from pos to end are zero (trailing pad). */
    def restZero: Boolean = {
      var p = pos
      while (p < end) {
        if (((b(p >>> 3) >> (7 - (p & 7))) & 1) != 0) return false
        p += 1
      }
      true
    }
  }

  private final class BitOut {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    /** Emit zero bits so that `next` more bits would end on a byte
      * boundary (the aligned-EOL fill rule).
      */
    def fillToAlign(next: Int): Unit = {
      val target = (8 - ((n + next) & 7)) & 7
      var i = 0
      while (i < target) { put("0"); i += 1 }
    }
    def put(bits: String): Unit = {
      var i = 0
      while (i < bits.length) {
        cur = (cur << 1) | (if (bits.charAt(i) == '1') 1 else 0)
        n += 1
        if (n == 8) { buf.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    def alignByte(): Unit =
      if (n > 0) { buf.write(cur << (8 - n)); cur = 0; n = 0 }
    def finish(): Array[Byte] = {
      alignByte()
      buf.toByteArray
    }
  }

  // ---------------- decoder ----------------

  /** One MH-coded run of `white` colour: zero or more make-up codes
    * then one terminating code; the accumulated run is capped by the
    * caller's line width (bomb guard).
    */
  private def readRun(in: BitIn, white: Boolean, cap: Int): Int = {
    val lookup = if (white) WhiteLookup else BlackLookup
    var total = 0
    var terminating = false
    while (!terminating) {
      var code = 0
      var len = 0
      var run = -1
      while (run < 0) {
        if (len >= MaxCodeLen) throw Malformed // no such code
        code = (code << 1) | in.bit()
        len += 1
        val v = lookup.get((len << 16) | code)
        if (v != null) run = v
      }
      total += run
      if (total > cap) throw Malformed
      terminating = run < 64 // make-up codes are all ≥ 64
    }
    total
  }

  /** Decode a T.6 block of exactly `rows` lines of `width` pixels.
    * Returns one byte per pixel, 1 = black, 0 = white, row-major.
    */
  def decode(data: Array[Byte], width: Int, rows: Int): Option[Array[Byte]] = {
    try {
      if (data == null || width <= 0 || rows <= 0) throw Malformed
      if (width.toLong * rows > (1L << 26)) throw Malformed // bomb cap
      val in = new BitIn(data)
      val out = new Array[Byte](width * rows)
      // changing elements of the reference line, ascending; the line
      // above row 0 is imaginary all-white (zero changes)
      var ref = new Array[Int](0)
      val line = new Array[Byte](width)
      var row = 0
      while (row < rows) {
        decode2dLine(in, width, ref, line)
        System.arraycopy(line, 0, out, row * width, width)
        ref = changes(line, width)
        row += 1
      }
      // optional EOFB (two T.4 EOLs: 000000000001 ×2), then zero pad < 8
      if (in.remaining >= 24) {
        val save = in.pos
        var ok = true
        var k = 0
        while (ok && k < 2) {
          var z = 0
          while (ok && z < 11) { if (in.bit() != 0) ok = false; z += 1 }
          if (ok && in.bit() != 1) ok = false
          k += 1
        }
        if (!ok) in.pos = save
      }
      if (in.remaining >= 8 || !in.restZero) throw Malformed
      Some(out)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** One 2-D coded line against reference transitions `ref`, painted
    * into `line` (shared by T.6 and the 2-D rows of T.4 Group 3).
    */
  private def decode2dLine(in: BitIn, width: Int, ref: Array[Int],
      line: Array[Byte]): Unit = {
    java.util.Arrays.fill(line, 0.toByte)
    var a0 = -1
    var white = true
    var ri = 0 // monotone cursor into ref
    while (a0 < width) {
      // b1: first reference change > a0 whose parity matches the
      // colour we are looking for (even index = change to black)
      while (ri < ref.length && ref(ri) <= a0) ri += 1
      var bi = ri
      val wantEven = white
      if (bi < ref.length && ((bi & 1) == 0) != wantEven) bi += 1
      val b1 = if (bi < ref.length) ref(bi) else width
      val b2 = if (bi + 1 < ref.length) ref(bi + 1) else width
      // mode code
      if (in.bit() == 1) { // V0
        vertical(line, width, a0, b1, white)
        a0 = b1; white = !white
      } else if (in.bit() == 1) { // 01x
        if (in.bit() == 1) { // 011 VR1
          vertical(line, width, a0, b1 + 1, white); a0 = b1 + 1; white = !white
        } else { // 010 VL1
          vertical(line, width, a0, b1 - 1, white); a0 = b1 - 1; white = !white
        }
      } else if (in.bit() == 1) { // 001 horizontal
        val s = if (a0 < 0) 0 else a0
        val r1 = readRun(in, white, width)
        val r2 = readRun(in, !white, width)
        val a1 = s + r1
        val a2 = a1 + r2
        if (a2 > width) throw Malformed
        paint(line, s, a1, white)
        paint(line, a1, a2, !white)
        a0 = a2 // colour unchanged
        // a0 may equal its previous value only through zero runs;
        // r1 = r2 = 0 would loop forever
        if (r1 == 0 && r2 == 0) throw Malformed
      } else if (in.bit() == 1) { // 0001 pass
        val s = if (a0 < 0) 0 else a0
        if (b2 > width || b2 < s) throw Malformed
        paint(line, s, b2, white)
        a0 = b2 // colour unchanged; b2 > a0 always holds (changes
        // are strictly ascending past b1 > a0), so progress is sure
      } else if (in.bit() == 1) { // 00001x VR2/VL2
        if (in.bit() == 1) { vertical(line, width, a0, b1 + 2, white); a0 = b1 + 2 }
        else { vertical(line, width, a0, b1 - 2, white); a0 = b1 - 2 }
        white = !white
      } else if (in.bit() == 1) { // 000001x VR3/VL3
        if (in.bit() == 1) { vertical(line, width, a0, b1 + 3, white); a0 = b1 + 3 }
        else { vertical(line, width, a0, b1 - 3, white); a0 = b1 - 3 }
        white = !white
      } else {
        // 0000001 = 2-D extension (uncompressed mode) — rejected;
        // 0000000... = EOL territory, which 2-D line data cannot contain
        throw Malformed
      }
    }
    if (a0 != width) throw Malformed // vertical overshoot past line end
  }

  /** Vertical-mode fill: run of `white` colour from max(a0,0) to a1;
    * a1 must land in [0, width] and strictly advance.
    */
  private def vertical(line: Array[Byte], width: Int, a0: Int, a1: Int,
      white: Boolean): Unit = {
    if (a1 < 0 || a1 > width || a1 <= a0) throw Malformed
    paint(line, if (a0 < 0) 0 else a0, a1, white)
  }

  private def paint(line: Array[Byte], from: Int, until: Int,
      white: Boolean): Unit = {
    if (from < 0 || until < from || until > line.length) throw Malformed
    if (!white) java.util.Arrays.fill(line, from, until, 1.toByte)
    // white pixels are already 0 (the line is zero-filled)
  }

  /** Changing-element positions of a painted line, ascending. Index
    * parity encodes colour: even = change to black, odd = to white
    * (lines start imaginarily white).
    */
  private def changes(line: Array[Byte], width: Int): Array[Int] = {
    val out = Vector.newBuilder[Int]
    var prev: Byte = 0
    var i = 0
    while (i < width) {
      if (line(i) != prev) { out += i; prev = line(i) }
      i += 1
    }
    out.result().toArray
  }

  // ------------- Modified Huffman 1-D (TIFF Compression 2) -------------

  /** TIFF 6.0 §10 "Modified Huffman" decode: each row is 1-D coded as
    * alternating white/black runs (a zero-length white run leads a row
    * starting black), EVERY ROW begins on a byte boundary, no EOL
    * codes. Returns 1 byte per pixel (1 = black); None on any
    * violation including trailing garbage after the final row.
    */
  def decodeMh(data: Array[Byte], width: Int, rows: Int): Option[Array[Byte]] = {
    try {
      if (data == null || width <= 0 || rows <= 0) throw Malformed
      if (width.toLong * rows > (1L << 26)) throw Malformed // bomb cap
      val in = new BitIn(data)
      val out = new Array[Byte](width * rows)
      var row = 0
      while (row < rows) {
        var x = 0
        var white = true
        while (x < width) {
          val run = readRun(in, white, width - x)
          // only the leading white run of a row may be zero-length
          // (a row starting black); any other zero run cannot advance
          if (run == 0 && !(white && x == 0)) throw Malformed
          if (!white) java.util.Arrays.fill(out, row * width + x,
            row * width + x + run, 1.toByte)
          x += run
          white = !white
        }
        // row padding to the byte boundary must be zero bits
        while ((in.pos & 7) != 0) { if (in.bit() != 0) throw Malformed }
        row += 1
      }
      if (in.pos != in.end) throw Malformed // exact segment consume
      Some(out)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** MH 1-D encode (fixture reverse path): alternating runs per row,
    * zero-padded to each row's byte boundary.
    */
  def encodeMh(pixels: Array[Byte], width: Int, rows: Int): Array[Byte] = {
    require(pixels.length == width * rows && width > 0 && rows > 0)
    val out = new BitOut
    var row = 0
    while (row < rows) {
      var x = 0
      var white = true
      while (x < width) {
        var run = 0
        while (x + run < width &&
          ((pixels(row * width + x + run) == 0) == white)) run += 1
        emitRun(out, white, run)
        x += run
        white = !white
      }
      out.alignByte()
      row += 1
    }
    out.finish()
  }

  // ------------- T.4 Group 3 1-D (TIFF Compression 3) -------------

  /** TIFF Compression 3: every row — including the first — is
    * preceded by an EOL code (000000000001), optionally front-padded
    * with zero fill bits; with `alignedEol` (T4Options bit 2) each EOL
    * must END on a byte boundary. In the 1-D form (T4Options bit 0
    * clear) row data is the same MH run coding as Compression 2 but
    * rows are NOT byte-aligned; in the 2-D form (`twoDim`, bit 0 set)
    * a tag bit follows each EOL — 1 = the row is 1-D coded, 0 = 2-D
    * coded against the previous row with the same vertical/horizontal/
    * pass machinery as G4. The FIRST row must be 1-D (T.4 has no
    * reference line yet). After the last row only zero padding to the
    * byte boundary may remain (TIFF writers do not emit RTC). None on
    * any violation.
    */
  def decodeG3(data: Array[Byte], width: Int, rows: Int,
      alignedEol: Boolean, twoDim: Boolean = false): Option[Array[Byte]] = {
    try {
      if (data == null || width <= 0 || rows <= 0) throw Malformed
      if (width.toLong * rows > (1L << 26)) throw Malformed // bomb cap
      val in = new BitIn(data)
      val out = new Array[Byte](width * rows)
      val line = new Array[Byte](width)
      var ref = new Array[Int](0)
      var row = 0
      while (row < rows) {
        // fill bits then EOL. T.4 §4.1.2 permits ARBITRARILY long zero
        // fill (inserted to satisfy minimum scan-line transmission
        // time), so the bound is a generous per-row sanity cap (8 KiB
        // of fill), not the old 64-bit one that rejected spec-legal
        // fax-derived TIFFs (ADVICE r13). Total work stays linear in
        // the input either way: every fill bit is consumed exactly
        // once, and exhaustion rejects via the bit reader.
        var zeros = 0
        var one = false
        while (!one) {
          if (in.bit() == 1) one = true
          else {
            zeros += 1
            if (zeros > (1 << 16)) throw Malformed // runaway fill
          }
        }
        if (zeros < 11) throw Malformed // not an EOL
        if (alignedEol && (in.pos & 7) != 0) throw Malformed
        val oneD = if (!twoDim) true else in.bit() == 1
        if (twoDim && row == 0 && !oneD) throw Malformed // no ref line yet
        if (oneD) {
          java.util.Arrays.fill(line, 0.toByte)
          var x = 0
          var white = true
          while (x < width) {
            val run = readRun(in, white, width - x)
            if (run == 0 && !(white && x == 0)) throw Malformed
            if (!white) java.util.Arrays.fill(line, x, x + run, 1.toByte)
            x += run
            white = !white
          }
        } else decode2dLine(in, width, ref, line)
        System.arraycopy(line, 0, out, row * width, width)
        ref = changes(line, width)
        row += 1
      }
      if (in.remaining >= 8 || !in.restZero) throw Malformed
      Some(out)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** G3 encode: EOL (byte-aligned via zero fill when `alignedEol`)
    * before every row; in the 2-D form a tag bit after each EOL with a
    * 1-D row every `k`th line (the T.4 K-parameter discipline, K = 4)
    * and 2-D rows against the previous line; zero-padded tail.
    */
  def encodeG3(pixels: Array[Byte], width: Int, rows: Int,
      alignedEol: Boolean, twoDim: Boolean = false, k: Int = 4): Array[Byte] = {
    require(pixels.length == width * rows && width > 0 && rows > 0 && k >= 1)
    val out = new BitOut
    val line = new Array[Byte](width)
    var ref = new Array[Int](0)
    var row = 0
    while (row < rows) {
      if (alignedEol) out.fillToAlign(12) // zeros so the EOL ends aligned
      out.put("000000000001")
      var i = 0
      while (i < width) {
        line(i) = if (pixels(row * width + i) != 0) 1 else 0
        i += 1
      }
      val oneD = !twoDim || row % k == 0
      if (twoDim) out.put(if (oneD) "1" else "0")
      if (oneD) {
        var x = 0
        var white = true
        while (x < width) {
          var run = 0
          while (x + run < width && ((line(x + run) == 0) == white)) run += 1
          emitRun(out, white, run)
          x += run
          white = !white
        }
      } else encode2dLine(out, width, changes(line, width), ref)
      ref = changes(line, width)
      row += 1
    }
    out.finish()
  }

  // ---------------- encoder (fixture reverse path) ----------------

  private def emitRun(out: BitOut, white: Boolean, run0: Int): Unit = {
    val enc = if (white) WhiteEnc else BlackEnc
    var run = run0
    while (run > 2560) { out.put(enc.get(2560)); run -= 2560 }
    if (run >= 64) {
      val mk = (run / 64) * 64
      out.put(enc.get(mk))
      run -= mk
    }
    out.put(enc.get(run))
  }

  /** Encode `rows` lines of `width` pixels (1 byte per pixel, nonzero
    * = black) as a T.6 block ending in EOFB, zero-padded to a byte.
    */
  def encode(pixels: Array[Byte], width: Int, rows: Int): Array[Byte] = {
    require(pixels.length == width * rows && width > 0 && rows > 0)
    val out = new BitOut
    var ref = new Array[Int](0)
    val line = new Array[Byte](width)
    var row = 0
    while (row < rows) {
      var i = 0
      while (i < width) {
        line(i) = if (pixels(row * width + i) != 0) 1 else 0
        i += 1
      }
      val cur = changes(line, width)
      encode2dLine(out, width, cur, ref)
      ref = cur
      row += 1
    }
    out.put("000000000001"); out.put("000000000001") // EOFB
    out.finish()
  }

  /** One 2-D coded line from coding transitions `cur` against
    * reference transitions `ref` (shared by T.6 and 2-D T.4 rows).
    */
  private def encode2dLine(out: BitOut, width: Int, cur: Array[Int],
      ref: Array[Int]): Unit = {
    var a0 = -1
    var white = true
    var ci = 0 // cursor into cur: next coding change > a0
    var ri = 0
    while (a0 < width) {
      while (ci < cur.length && cur(ci) <= a0) ci += 1
      val a1 = if (ci < cur.length) cur(ci) else width
      while (ri < ref.length && ref(ri) <= a0) ri += 1
      var bi = ri
      if (bi < ref.length && ((bi & 1) == 0) != white) bi += 1
      val b1 = if (bi < ref.length) ref(bi) else width
      val b2 = if (bi + 1 < ref.length) ref(bi + 1) else width
      if (b2 < a1) {
        out.put("0001") // pass
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) {
        (a1 - b1) match {
          case 0 => out.put("1")
          case 1 => out.put("011")
          case 2 => out.put("000011")
          case 3 => out.put("0000011")
          case -1 => out.put("010")
          case -2 => out.put("000010")
          case -3 => out.put("0000010")
        }
        a0 = a1; white = !white
      } else {
        val a2 = if (ci + 1 < cur.length) cur(ci + 1) else width
        val s = if (a0 < 0) 0 else a0
        out.put("001")
        emitRun(out, white, a1 - s)
        emitRun(out, !white, a2 - a1)
        a0 = a2
      }
    }
  }
}
