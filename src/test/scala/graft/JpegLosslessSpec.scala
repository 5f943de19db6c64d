package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Lossless JPEG (SOF3, T.81 Annex H) decode driven by an in-test
  * encoder (the JpegPixelSpec pattern): arbitrary sample grids are
  * encoded with a real multi-symbol Huffman table, bit packing and
  * FF00 stuffing, then must decode to the stats computed DIRECTLY from
  * the raw grid — the decoder's predictor recursion, EXTEND arithmetic
  * and entropy walk all have to be right for the sums to land. The
  * byte-aligned fixture generator (makeJpegLossless) is checked against
  * a nibble-chain reference, and every envelope rejection is pinned.
  */
class JpegLosslessSpec extends AnyFunSuite {

  /** In-test SOF3 encoder: canonical Huffman with all 17 categories at
    * code length 5 (code of category i = i, 5 bits — Kraft 17/32 ≤ 1),
    * scan-selected predictor, interleaved 1×1 components, FF00
    * stuffing, 1-padded final byte.
    */
  private def encode(planes: Array[Array[Array[Int]]], precision: Int,
      predictor: Int): Array[Byte] = {
    val nComp = planes.length
    val h = planes(0).length
    val w = planes(0)(0).length
    val bits = new scala.collection.mutable.ArrayBuffer[Int]()
    def put(v: Int, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1))

    val half = 1 << (precision - 1)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        (0 until nComp).foreach { c =>
          val p = planes(c)
          val pred =
            if (y == 0 && x == 0) half
            else if (y == 0) p(0)(x - 1)
            else if (x == 0) p(y - 1)(0)
            else {
              val a = p(y)(x - 1); val b = p(y - 1)(x); val cc = p(y - 1)(x - 1)
              predictor match {
                case 1 => a
                case 2 => b
                case 3 => cc
                case 4 => a + b - cc
                case 5 => a + ((b - cc) >> 1)
                case 6 => b + ((a - cc) >> 1)
                case _ => (a + b) >> 1
              }
            }
          // T.81 modulo-65536 difference, represented in [-32767, 32768]
          var d = (p(y)(x) - pred) & 0xffff
          if (d > 32768) d -= 65536
          val t = if (d == 32768) 16 else 32 - Integer.numberOfLeadingZeros(math.abs(d))
          put(t, 5) // category code = category, 5 bits
          if (t > 0 && t < 16)
            put(if (d < 0) d + (1 << t) - 1 else d, t)
        }
      }
    }
    while (bits.length % 8 != 0) bits += 1 // 1-padding
    val entropy = new scala.collection.mutable.ArrayBuffer[Byte]()
    bits.grouped(8).foreach { g =>
      val byte = g.foldLeft(0)((acc, b) => (acc << 1) | b)
      entropy += byte.toByte
      if (byte == 0xff) entropy += 0x00.toByte // stuffing
    }

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    u16(0xffd8) // SOI
    u16(0xffc4); u16(2 + 1 + 16 + 17); out.write(0x00) // DHT class 0
    (1 to 16).foreach(l => out.write(if (l == 5) 17 else 0))
    (0 to 16).foreach(out.write)
    u16(0xffc3); u16(8 + 3 * nComp)
    out.write(precision); u16(h); u16(w); out.write(nComp)
    (0 until nComp).foreach { c =>
      out.write(c + 1); out.write(0x11); out.write(0)
    }
    u16(0xffda); u16(6 + 2 * nComp); out.write(nComp)
    (0 until nComp).foreach { c => out.write(c + 1); out.write(0x00) }
    out.write(predictor); out.write(0); out.write(0) // Ss, Se, Ah/Al
    out.write(entropy.toArray)
    u16(0xffd9) // EOI
    out.toByteArray
  }

  private def gridStats(planes: Array[Array[Array[Int]]])
      : (Long, Long, Long, Int, Int) = {
    val flat0 = planes(0).flatten
    val s0 = planes(0).flatten.map(_.toLong).sum
    val s1 = if (planes.length == 1) s0 else planes(1).flatten.map(_.toLong).sum
    val s2 = if (planes.length == 1) s0 else planes(2).flatten.map(_.toLong).sum
    (s0, s1, s2, flat0.min, flat0.max)
  }

  private def randGrid(h: Int, w: Int, max: Int, seed: Long): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(h, w)(rnd.nextInt(max + 1))
  }

  test("all 7 predictors round-trip an 8-bit grayscale grid") {
    (1 to 7).foreach { p =>
      val g = Array(randGrid(7, 9, 255, 100 + p))
      val st = Multimodal.jpegPixelStats(encode(g, 8, p))
        .getOrElse(fail(s"predictor $p rejected"))
      val (s0, _, _, mn, mx) = gridStats(g)
      assert((st.w, st.h, st.nComp) === (9, 7, 1), s"predictor $p")
      assert((st.sumR, st.minY, st.maxY) === (s0, mn, mx), s"predictor $p")
    }
  }

  test("12-bit and 16-bit precisions decode verbatim (no 8-bit clamp)") {
    val g12 = Array(randGrid(5, 6, 4095, 7))
    val st12 = Multimodal.jpegPixelStats(encode(g12, 12, 4)).get
    val (s12, _, _, mn12, mx12) = gridStats(g12)
    assert((st12.sumR, st12.minY, st12.maxY) === (s12, mn12, mx12))

    val g16 = Array(randGrid(4, 5, 65535, 8))
    val st16 = Multimodal.jpegPixelStats(encode(g16, 16, 1)).get
    val (s16, _, _, mn16, mx16) = gridStats(g16)
    assert((st16.sumR, st16.minY, st16.maxY) === (s16, mn16, mx16))
  }

  test("SSSS=16 (diff exactly 32768, no extra bits) decodes") {
    // first sample 0 against the 2^15 seed prediction: d = -32768 ≡ 32768
    val g = Array(Array(Array(0, 32768), Array(0, 32768)))
    val st = Multimodal.jpegPixelStats(encode(g, 16, 1)).get
    assert(st.sumR === 65536L)
    assert((st.minY, st.maxY) === (0, 32768))
  }

  test("3-component interleaved samples stay verbatim (no YCbCr matrix)") {
    val planes = Array(randGrid(4, 6, 255, 21), randGrid(4, 6, 255, 22),
      randGrid(4, 6, 255, 23))
    val st = Multimodal.jpegPixelStats(encode(planes, 8, 7)).get
    val (s0, s1, s2, mn, mx) = gridStats(planes)
    assert((st.nComp, st.sumR, st.sumG, st.sumB) === (3, s0, s1, s2))
    assert((st.minY, st.maxY) === (mn, mx))
  }

  test("FF bytes in the entropy stream survive via 00 stuffing") {
    // alternating 0/255 generates category-8 all-ones magnitude bits —
    // plenty of FF bytes to stuff
    val g = Array(Array.fill(6)(Array.tabulate(8)(x => if (x % 2 == 0) 0 else 255)))
    val bytes = encode(g, 8, 1)
    val st = Multimodal.jpegPixelStats(bytes).get
    val (s0, _, _, mn, mx) = gridStats(g)
    assert((st.sumR, st.minY, st.maxY) === (s0, mn, mx))
  }

  test("flat image is all category-0 differences") {
    val g = Array(Array.fill(5, 5)(77))
    val st = Multimodal.jpegPixelStats(encode(g, 8, 2)).get
    assert((st.sumR, st.minY, st.maxY) === (25L * 77, 77, 77))
  }

  test("byte-aligned fixture decodes to the nibble-chain reference") {
    (0 until 4).foreach { i =>
      val n = 16 + 6 * i
      val bytes = Multimodal.makeJpegLossless(n, seed = 4200 + i)
      // reference: chain EXTENDed low nibbles from the fixed offset 47
      var v = 128L
      var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      (0 until n).foreach { j =>
        val nib = bytes(47 + j) & 0x0f
        v += (if (nib >= 8) nib else nib - 15)
        sum += v; mn = math.min(mn, v.toInt); mx = math.max(mx, v.toInt)
      }
      val st = Multimodal.jpegPixelStats(bytes).getOrElse(fail(s"fixture $i rejected"))
      assert((st.w, st.h) === (n, 1))
      assert((st.sumR, st.minY, st.maxY) === (sum, mn, mx), s"fixture $i")
      assert(mn >= 128 && mx <= 143, "walk escaped the documented band")
    }
    // spec-legal 0xFF fill padding before markers is skipped in the
    // lossless walk too (ADVICE r10 — same envelope as jpegExif)
    val base = Multimodal.makeJpegLossless(16, seed = 4242L)
    val padded = base.take(2) ++ Array.fill(3)(0xff.toByte) ++ base.drop(2)
    assert(Multimodal.jpegPixelStats(padded) === Multimodal.jpegPixelStats(base))
    assert(Multimodal.jpegPixelStats(base).isDefined)
  }

  test("envelope: point transform, restart interval, bad predictor, sampling reject") {
    val g = Array(randGrid(3, 3, 255, 9))
    val ok = encode(g, 8, 1)
    assert(Multimodal.jpegPixelStats(ok).isDefined)
    def patched(f: Array[Byte] => Unit): Option[_] = {
      val c = ok.clone(); f(c); Multimodal.jpegPixelStats(c)
    }
    // locate SOS by scanning for FFDA
    var sos = -1
    (0 until ok.length - 1).foreach(i =>
      if (sos < 0 && (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xda) sos = i)
    val ss = sos + 2 + 2 + 1 + 2 // marker, len, nComp, comp pair
    assert((ok(ss) & 0xff) === 1, "Ss offset sanity")
    assert(patched(c => c(ss) = 0).isEmpty, "predictor 0 must reject")
    assert(patched(c => c(ss) = 8).isEmpty, "predictor 8 must reject")
    assert(patched(c => c(ss + 2) = 2).isEmpty, "point transform must reject")
    // sampling byte: SOF3 at FFC3; comp sampling = sofStart + 2+2+1+2+2+1+1+1
    var sof = -1
    (0 until ok.length - 1).foreach(i =>
      if (sof < 0 && (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc3) sof = i)
    assert(patched(c => c(sof + 11) = 0x21).isEmpty, "2x1 sampling must reject")
  }
}
