package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Progressive JPEG: an in-test ENCODER implementing the full T.81
  * Annex G successive-approximation Huffman procedure (spectral bands,
  * EOB runs, ZRL-in-refinement, buffered correction bits) feeds the
  * engine decoder streams it cannot have memorized, and the result is
  * checked against an independent direct (non-separable) IDCT of the
  * ORIGINAL coefficients — any asymmetry between the encoder's G.1.2.2/
  * G.1.2.3 emission and the decoder's consumption shifts bits and fails.
  * The byte-aligned fixture generator (the e12p oracle twin) round-trips
  * too, plus progression-validation rejects.
  */
class JpegProgressiveSpec extends AnyFunSuite {

  // ---- shared encoding machinery -----------------------------------

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private def category(v: Int): Int = {
    var m = math.abs(v); var t = 0
    while (m != 0) { m >>= 1; t += 1 }
    t
  }

  private class BitWriter {
    val out = new java.io.ByteArrayOutputStream
    private var acc = 0
    private var n = 0
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); n += 1
      if (n == 8) {
        out.write(acc & 0xff)
        if ((acc & 0xff) == 0xff) out.write(0x00) // stuffing
        acc = 0; n = 0
      }
    }
    def bits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    def flush(): Unit = while (n != 0) bit(1) // 1-pad to a byte boundary
  }

  /** Uniform in-test tables: DC categories 0..11 as 4-bit codes (code =
    * symbol), AC = every RS with size != 15 as 9-bit codes (code = list
    * index = sym − (sym >> 4)).
    */
  private def acCode(bw: BitWriter, sym: Int): Unit =
    bw.bits(sym - (sym >> 4), 9)

  /** Per-scan T.81 G.1.2 emitters over one component's blocks (zigzag-
    * order quantized coefficients), shared by the gray and color
    * encoders. `blocks` are visited in the order given.
    */
  private class ScanEncoder(bw: BitWriter) {
    private var eobrun = 0
    private val eobBuf = scala.collection.mutable.ArrayBuffer.empty[Int]

    def flushEobrun(): Unit = if (eobrun > 0) {
      var rr = 0
      while ((eobrun >> (rr + 1)) > 0) rr += 1
      acCode(bw, rr << 4)
      if (rr > 0) bw.bits(eobrun - (1 << rr), rr)
      eobBuf.foreach(bw.bit)
      eobBuf.clear()
      eobrun = 0
    }

    def acFirst(qc: Array[Int], ss: Int, se: Int, al: Int): Unit = {
      val tv = (ss to se).map { k =>
        val v = qc(k)
        if (v >= 0) v >> al else -((-v) >> al)
      }
      if (tv.forall(_ == 0)) {
        eobrun += 1
        if (eobrun == 0x7fff) flushEobrun()
      } else {
        flushEobrun()
        var r = 0
        tv.foreach { v =>
          if (v == 0) r += 1
          else {
            while (r > 15) { acCode(bw, 0xf0); r -= 16 }
            val s = category(v)
            acCode(bw, (r << 4) | s)
            bw.bits(if (v >= 0) v else v - 1, s)
            r = 0
          }
        }
        if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) flushEobrun() }
      }
    }

    def acRefine(qc: Array[Int], ss: Int, se: Int, al: Int): Unit = {
      val absv = (ss to se).map(k => math.abs(qc(k)) >> al).toArray
      val eobPos = (ss to se).reverse.find(k => absv(k - ss) == 1).getOrElse(ss - 1)
      var r = 0
      val br = scala.collection.mutable.ArrayBuffer.empty[Int]
      var k = ss
      while (k <= se) {
        val temp = absv(k - ss)
        if (temp == 0) r += 1
        else {
          while (r > 15 && k <= eobPos) {
            flushEobrun()
            acCode(bw, 0xf0)
            r -= 16
            br.foreach(bw.bit); br.clear()
          }
          if (temp > 1) br += (temp & 1) // history: correction bit
          else { // newly significant: run, sign, then buffered bits
            flushEobrun()
            acCode(bw, (r << 4) | 1)
            bw.bit(if (qc(k) >= 0) 1 else 0)
            br.foreach(bw.bit); br.clear()
            r = 0
          }
        }
        k += 1
      }
      if (r > 0 || br.nonEmpty) {
        eobrun += 1
        eobBuf ++= br
        if (eobrun == 0x7fff) flushEobrun()
      }
    }
  }

  private def dcFirstDiff(bw: BitWriter, diff: Int): Unit = {
    val t = category(diff)
    bw.bits(t, 4)
    if (t > 0) bw.bits(if (diff >= 0) diff else diff - 1, t)
  }

  private def segment(bos: java.io.ByteArrayOutputStream, marker: Int,
      payload: Array[Byte]): Unit = {
    bos.write(0xff); bos.write(marker)
    val len = payload.length + 2
    bos.write((len >> 8) & 0xff); bos.write(len & 0xff)
    bos.write(payload)
  }

  private def dhtPayloads: Seq[Array[Byte]] = {
    val dc = java.nio.ByteBuffer.allocate(1 + 16 + 12)
    dc.put(0x00.toByte)
    (1 to 16).foreach(l => dc.put(if (l == 4) 12.toByte else 0.toByte))
    (0 to 11).foreach(s => dc.put(s.toByte))
    val acSyms = (0 until 256).filter(v => (v & 15) != 15)
    val ac = java.nio.ByteBuffer.allocate(1 + 16 + acSyms.length)
    ac.put(0x10.toByte)
    (1 to 16).foreach(l => ac.put(if (l == 9) acSyms.length.toByte else 0.toByte))
    acSyms.foreach(s => ac.put(s.toByte))
    Seq(dc.array(), ac.array())
  }

  /** Grayscale progressive encoder: blocks in raster order, zigzag-order
    * quantized coefficients, arbitrary scan script (ss, se, ah, al).
    */
  private def encodeProgressive(w: Int, h: Int, q: Array[Int],
      blocks: Seq[Array[Int]], script: Seq[(Int, Int, Int, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream
    bos.write(0xff); bos.write(0xd8)
    segment(bos, 0xdb, (Array(0) ++ q).map(_.toByte)) // DQT, 8-bit, id 0
    val sof = java.nio.ByteBuffer.allocate(1 + 2 + 2 + 1 + 3)
    sof.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      .put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
    segment(bos, 0xc2, sof.array())
    dhtPayloads.foreach(p => segment(bos, 0xc4, p))
    script.foreach { case (ss, se, ah, al) =>
      segment(bos, 0xda,
        Array(1, 1, 0x00, ss, se, (ah << 4) | al).map(_.toByte))
      val bw = new BitWriter
      val enc = new ScanEncoder(bw)
      if (ss == 0) {
        if (ah == 0) {
          var pred = 0
          blocks.foreach { qc =>
            val v = qc(0) >> al
            dcFirstDiff(bw, v - pred)
            pred = v
          }
        } else blocks.foreach(qc => bw.bit((qc(0) >> al) & 1))
      } else {
        if (ah == 0) blocks.foreach(qc => enc.acFirst(qc, ss, se, al))
        else blocks.foreach(qc => enc.acRefine(qc, ss, se, al))
        enc.flushEobrun()
      }
      bw.flush()
      bos.write(bw.out.toByteArray)
    }
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }

  // ---- the independent reference ------------------------------------

  /** Direct (non-separable) IDCT of the original zigzag-order quantized
    * blocks → jpegGraySums quad, with edge cropping.
    */
  private def refSums(w: Int, h: Int, q: Array[Int],
      blocks: Seq[Array[Int]]): (Long, Long, Int, Int) = {
    val bw = (w + 7) / 8
    var sum = 0L
    var mn = 256
    var mx = -1
    for (by <- 0 until (h + 7) / 8; bx <- 0 until bw) {
      val qc = blocks(by * bw + bx)
      val d = new Array[Int](64)
      (0 until 64).foreach(k => d(zigzag(k)) = qc(k) * q(k))
      for (py <- 0 until 8; px <- 0 until 8) {
        val ix = bx * 8 + px
        val iy = by * 8 + py
        if (ix < w && iy < h) {
          var acc = 0.0
          for (v <- 0 until 8; u <- 0 until 8) {
            val cu = if (u == 0) math.sqrt(0.5) else 1.0
            val cv = if (v == 0) math.sqrt(0.5) else 1.0
            acc += cu * cv / 4.0 * d(v * 8 + u) *
              math.cos((2 * px + 1) * u * math.Pi / 16) *
              math.cos((2 * py + 1) * v * math.Pi / 16)
          }
          val s = math.max(0, math.min(255, math.floor(acc + 128.5).toInt))
          sum += s
          if (s < mn) mn = s
          if (s > mx) mx = s
        }
      }
    }
    (sum, w.toLong * h, mn, mx)
  }

  /** Random zigzag-order quantized blocks tuned to exercise refinement:
    * many |v| ∈ {1,2,3} (newly-significant at low Al), sparse tails with
    * long zero gaps (ZRL + EOB runs), occasional larger values.
    */
  private def randBlocks(n: Int, seed: Long): Seq[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val qc = new Array[Int](64)
      qc(0) = rnd.nextInt(201) - 100
      (1 until 64).foreach { k =>
        val roll = rnd.nextInt(100)
        if (roll < 10) qc(k) = rnd.nextInt(7) - 3
        else if (roll < 14) qc(k) = (rnd.nextInt(60) + 4) * (if (rnd.nextBoolean()) 1 else -1)
      }
      qc
    }
  }

  private val q1: Array[Int] = Array.tabulate(64)(k => 1 + k % 5)

  // ---- tests --------------------------------------------------------

  test("spectral selection only: DC scan + one AC band scan") {
    val blocks = randBlocks(12, 1L) // 24x32
    val bytes = encodeProgressive(24, 32, q1, blocks, Seq((0, 0, 0, 0), (1, 63, 0, 0)))
    assert(Multimodal.jpegGraySums(bytes) === Some(refSums(24, 32, q1, blocks)))
    // spec-legal 0xFF fill padding before markers is skipped in the
    // progressive walk too (ADVICE r10 — same envelope as jpegExif)
    val padded = bytes.take(2) ++ Array.fill(3)(0xff.toByte) ++ bytes.drop(2)
    assert(Multimodal.jpegGraySums(padded) === Multimodal.jpegGraySums(bytes))
  }

  test("split AC bands decode to the same image") {
    val blocks = randBlocks(15, 2L) // 40x24
    val bytes = encodeProgressive(40, 24, q1, blocks,
      Seq((0, 0, 0, 0), (1, 5, 0, 0), (6, 20, 0, 0), (21, 63, 0, 0)))
    assert(Multimodal.jpegGraySums(bytes) === Some(refSums(40, 24, q1, blocks)))
  }

  test("successive approximation: one refinement level, DC and AC") {
    val blocks = randBlocks(12, 3L)
    val bytes = encodeProgressive(32, 24, q1, blocks,
      Seq((0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0), (1, 63, 1, 0)))
    assert(Multimodal.jpegGraySums(bytes) === Some(refSums(32, 24, q1, blocks)))
  }

  test("deep progression: Al=2 start, split bands, interleaved refinements") {
    val blocks = randBlocks(20, 4L) // 40x32
    val bytes = encodeProgressive(40, 32, q1, blocks, Seq(
      (0, 0, 0, 2), (1, 5, 0, 2), (6, 63, 0, 2),
      (0, 0, 2, 1), (1, 5, 2, 1), (0, 0, 1, 0),
      (6, 63, 2, 1), (1, 5, 1, 0), (6, 63, 1, 0)))
    assert(Multimodal.jpegGraySums(bytes) === Some(refSums(40, 32, q1, blocks)))
  }

  test("partial file: DC-only progression renders the DC image") {
    val blocks = randBlocks(6, 5L) // 24x16
    val dcOnly = blocks.map { qc =>
      val z = new Array[Int](64); z(0) = qc(0); z
    }
    val bytes = encodeProgressive(24, 16, q1, blocks, Seq((0, 0, 0, 0)))
    assert(Multimodal.jpegGraySums(bytes) === Some(refSums(24, 16, q1, dcOnly)))
  }

  test("edge crop: non-multiple-of-8 dimensions count only visible pixels") {
    val blocks = randBlocks(14, 6L) // 52x12 -> 7x2 blocks
    val bytes = encodeProgressive(52, 12, q1, blocks,
      Seq((0, 0, 0, 1), (1, 63, 0, 0), (0, 0, 1, 0)))
    assert(Multimodal.jpegGraySums(bytes) === Some(refSums(52, 12, q1, blocks)))
  }

  test("fixture generator round-trips against its own dc chain (oracle twin)") {
    for (i <- 0 until 5) {
      val wB = 3 + i
      val hB = 1 + (i % 2)
      val q0 = 1 + (i % 3)
      val bytes = Multimodal.makeJpegProgressivePixels(wB, hB, q0, 16000 + i)
      // independent twin: hex-walk the scan bytes exactly like the oracle
      val blocks = wB * hB
      var sv = 0
      var sum = 0L
      var mn = 256
      var mx = -1
      (0 until blocks).foreach { j =>
        val bits = bytes(135 + 2 * j) & 0xff
        sv += (if (bits < 128) bits - 255 else bits)
        val bit = (bytes(144 + 2 * blocks + j / 8) & 0xff) >> (7 - j % 8) & 1
        val dc = 2 * sv + bit
        val v = math.max(0, math.min(255, math.round(128 + dc * q0 / 8.0).toInt))
        sum += 64L * v
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      assert(Multimodal.jpegGraySums(bytes) ===
        Some((sum, 64L * blocks, mn, mx)), s"fixture $i")
    }
  }

  /** Color progressive encoder: 4:4:4 or 4:2:0 (luma sampling hv ∈
    * {1,2}², chroma 1×1, dims multiples of 8·hv so real grids equal the
    * MCU-padded ones). DC scans interleave all three components in MCU
    * order with per-component predictors; AC scans are single-component
    * in component-grid raster order — the two orders differ under 4:2:0,
    * which is exactly the geometry this exercises. Scripts: entries
    * (comp, ss, se, ah, al) with comp = −1 for the interleaved DC scans.
    */
  private def encodeProgressiveColor(w: Int, h: Int, hv: (Int, Int),
      qY: Array[Int], qC: Array[Int], comps: Seq[Seq[Array[Int]]],
      script: Seq[(Int, Int, Int, Int, Int)]): Array[Byte] = {
    val (hs, vs) = hv
    val mx = (w + 8 * hs - 1) / (8 * hs)
    val my = (h + 8 * vs - 1) / (8 * vs)
    val gwY = mx * hs // luma grid width (== real width here)
    val bos = new java.io.ByteArrayOutputStream
    bos.write(0xff); bos.write(0xd8)
    segment(bos, 0xdb, (Array(0) ++ qY).map(_.toByte))
    segment(bos, 0xdb, (Array(1) ++ qC).map(_.toByte))
    val sof = java.nio.ByteBuffer.allocate(1 + 2 + 2 + 1 + 9)
    sof.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(1.toByte).put(((hs << 4) | vs).toByte).put(0.toByte)
      .put(2.toByte).put(0x11.toByte).put(1.toByte)
      .put(3.toByte).put(0x11.toByte).put(1.toByte)
    segment(bos, 0xc2, sof.array())
    dhtPayloads.foreach(p => segment(bos, 0xc4, p))
    script.foreach { case (comp, ss, se, ah, al) =>
      val bw = new BitWriter
      if (ss == 0 && comp == -1) { // interleaved DC over Y, Cb, Cr
        segment(bos, 0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00,
          ss, se, (ah << 4) | al).map(_.toByte))
        val pred = new Array[Int](3)
        for (mcuY <- 0 until my; mcuX <- 0 until mx) {
          // luma: hs×vs blocks in raster order within the MCU
          for (bv <- 0 until vs; bh <- 0 until hs) {
            val qc = comps(0)((mcuY * vs + bv) * gwY + mcuX * hs + bh)
            if (ah == 0) {
              val v = qc(0) >> al
              dcFirstDiff(bw, v - pred(0)); pred(0) = v
            } else bw.bit((qc(0) >> al) & 1)
          }
          for (ci <- 1 to 2) {
            val qc = comps(ci)(mcuY * mx + mcuX)
            if (ah == 0) {
              val v = qc(0) >> al
              dcFirstDiff(bw, v - pred(ci)); pred(ci) = v
            } else bw.bit((qc(0) >> al) & 1)
          }
        }
      } else { // single-component scan in grid raster order
        segment(bos, 0xda, Array(1, comp + 1, 0x00,
          ss, se, (ah << 4) | al).map(_.toByte))
        val enc = new ScanEncoder(bw)
        if (ss == 0) {
          if (ah == 0) {
            var pred = 0
            comps(comp).foreach { qc =>
              val v = qc(0) >> al
              dcFirstDiff(bw, v - pred); pred = v
            }
          } else comps(comp).foreach(qc => bw.bit((qc(0) >> al) & 1))
        } else {
          if (ah == 0) comps(comp).foreach(qc => enc.acFirst(qc, ss, se, al))
          else comps(comp).foreach(qc => enc.acRefine(qc, ss, se, al))
          enc.flushEobrun()
        }
      }
      bw.flush()
      bos.write(bw.out.toByteArray)
    }
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }

  /** Direct-IDCT color reference mirroring jpegPixelStats' contract:
    * per-component IDCT, nearest-neighbor chroma upsampling, JFIF
    * conversion with ⌊x+0.5⌋ rounding and clamps; minY/maxY over luma.
    */
  private def refColorStats(w: Int, h: Int, hv: (Int, Int),
      qY: Array[Int], qC: Array[Int],
      comps: Seq[Seq[Array[Int]]]): Multimodal.JpegStats = {
    val (hs, vs) = hv
    val mx = (w + 8 * hs - 1) / (8 * hs)
    def plane(blocks: Seq[Array[Int]], q: Array[Int], bw: Int): Array[Array[Int]] = {
      blocks.map { qc =>
        val d = new Array[Int](64)
        (0 until 64).foreach(k => d(zigzag(k)) = qc(k) * q(k))
        val px = new Array[Int](64)
        for (py <- 0 until 8; pxx <- 0 until 8) {
          var acc = 0.0
          for (v <- 0 until 8; u <- 0 until 8) {
            val cu = if (u == 0) math.sqrt(0.5) else 1.0
            val cv = if (v == 0) math.sqrt(0.5) else 1.0
            acc += cu * cv / 4.0 * d(v * 8 + u) *
              math.cos((2 * pxx + 1) * u * math.Pi / 16) *
              math.cos((2 * py + 1) * v * math.Pi / 16)
          }
          px(py * 8 + pxx) = math.max(0, math.min(255, math.floor(acc + 128.5).toInt))
        }
        px
      }.toArray
    }
    def sample(pl: Array[Array[Int]], bw: Int, x: Int, y: Int): Int =
      pl((y / 8) * bw + x / 8)((y % 8) * 8 + x % 8)
    val yPl = plane(comps(0), qY, mx * hs)
    val cbPl = plane(comps(1), qC, mx)
    val crPl = plane(comps(2), qC, mx)
    def clamp(v: Int) = math.max(0, math.min(255, v))
    var (sr, sg, sb) = (0L, 0L, 0L)
    var mn = 256
    var mxY = -1
    for (y <- 0 until h; x <- 0 until w) {
      val yy = sample(yPl, mx * hs, x, y)
      val cb = sample(cbPl, mx, x / hs, y / vs)
      val cr = sample(crPl, mx, x / hs, y / vs)
      sr += clamp(math.floor(yy + 1.402 * (cr - 128) + 0.5).toInt)
      sg += clamp(math.floor(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt)
      sb += clamp(math.floor(yy + 1.772 * (cb - 128) + 0.5).toInt)
      if (yy < mn) mn = yy
      if (yy > mxY) mxY = yy
    }
    Multimodal.JpegStats(w, h, 3, sr, sg, sb, mn, mxY)
  }

  test("color 4:4:4 progressive: interleaved DC, per-component AC bands") {
    val qY = Array.tabulate(64)(k => 1 + k % 4)
    val qC = Array.tabulate(64)(k => 2 + k % 3)
    val w = 24; val h = 16 // 3x2 blocks per component
    val comps = Seq(randBlocks(6, 10L), randBlocks(6, 11L), randBlocks(6, 12L))
    val bytes = encodeProgressiveColor(w, h, (1, 1), qY, qC, comps, Seq(
      (-1, 0, 0, 0, 1), // DC first for all comps, Al=1
      (0, 1, 63, 0, 0), (1, 1, 20, 0, 0), (2, 1, 63, 0, 1),
      (-1, 0, 0, 1, 0), // DC refinement
      (1, 21, 63, 0, 0), (2, 1, 63, 1, 0)))
    assert(Multimodal.jpegPixelStats(bytes) ===
      Some(refColorStats(w, h, (1, 1), qY, qC, comps)))
  }

  test("color 4:2:0 progressive: MCU-order DC walk vs raster-order AC walk") {
    val qY = Array.tabulate(64)(k => 1 + k % 3)
    val qC = Array.fill(64)(2)
    val w = 32; val h = 32 // 2x2 MCUs -> luma 4x4 blocks, chroma 2x2
    val comps = Seq(randBlocks(16, 20L), randBlocks(4, 21L), randBlocks(4, 22L))
    val bytes = encodeProgressiveColor(w, h, (2, 2), qY, qC, comps, Seq(
      (-1, 0, 0, 0, 1),
      (0, 1, 5, 0, 1), (0, 6, 63, 0, 0), (1, 1, 63, 0, 0), (2, 1, 63, 0, 0),
      (-1, 0, 0, 1, 0),
      (0, 1, 5, 1, 0)))
    assert(Multimodal.jpegPixelStats(bytes) ===
      Some(refColorStats(w, h, (2, 2), qY, qC, comps)))
  }

  test("color 4:2:2 progressive: single-axis subsampling geometry") {
    val qY = Array.tabulate(64)(k => 1 + k % 4)
    val qC = Array.fill(64)(3)
    val w = 32; val h = 16 // luma 2x1: 2x2 MCUs -> luma 4x2 blocks, chroma 2x2
    val comps = Seq(randBlocks(8, 30L), randBlocks(4, 31L), randBlocks(4, 32L))
    val bytes = encodeProgressiveColor(w, h, (2, 1), qY, qC, comps, Seq(
      (-1, 0, 0, 0, 0),
      (0, 1, 63, 0, 1), (1, 1, 63, 0, 0), (2, 1, 63, 0, 0),
      (0, 1, 63, 1, 0)))
    assert(Multimodal.jpegPixelStats(bytes) ===
      Some(refColorStats(w, h, (2, 1), qY, qC, comps)))
  }

  test("progression violations reject: AC before DC, wrong refinement order") {
    val blocks = randBlocks(4, 7L)
    // AC scan before any DC scan
    assert(Multimodal.jpegGraySums(
      encodeProgressive(16, 16, q1, blocks, Seq((1, 63, 0, 0), (0, 0, 0, 0)))).isEmpty)
    // refinement skipping a level (Ah=1 after Al=2)
    assert(Multimodal.jpegGraySums(
      encodeProgressive(16, 16, q1, blocks, Seq((0, 0, 0, 2), (0, 0, 1, 0)))).isEmpty)
    // band coded twice at the same precision
    assert(Multimodal.jpegGraySums(
      encodeProgressive(16, 16, q1, blocks, Seq((0, 0, 0, 0), (0, 0, 0, 0)))).isEmpty)
    // truncated mid-scan: no EOI
    val ok = encodeProgressive(16, 16, q1, blocks, Seq((0, 0, 0, 0), (1, 63, 0, 0)))
    assert(Multimodal.jpegGraySums(ok).isDefined)
    assert(Multimodal.jpegGraySums(ok.take(ok.length - 6)).isEmpty)
  }
}
