package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tiff

class TiffSpec extends AnyFunSuite {

  private def px(seed: Int, spp: Int): Int => Byte =
    k => (((seed * 31 + k * 7) % 251) & 0xff).toByte

  private def flat(p: Tiff.Page): Seq[Int] = p.pixels.toSeq.map(_ & 0xff)

  test("single gray page round-trips under all three compressions, both endiannesses") {
    for (comp <- Seq(1, 5, 32773); le <- Seq(true, false)) {
      val f = px(9, 1)
      val t = Tiff.makeTiff(Seq((11, 7, 1, f)), Seq(comp), littleEndian = le)
      val got = Tiff.decode(t).getOrElse(fail(s"comp=$comp le=$le rejected"))
      assert(got.length === 1)
      val p = got.head
      assert((p.width, p.height, p.samplesPerPixel) === ((11, 7, 1)))
      assert(flat(p) === (0 until 77).map(k => f(k) & 0xff))
    }
  }

  test("multi-page mixed-compression RGB file: pages in chain order, strip-split layout") {
    val fs = (0 until 4).map(i => px(100 + i, 3))
    val t = Tiff.makeTiff(
      fs.zipWithIndex.map { case (f, i) => (6 + i, 5, 3, f) },
      Seq(1, 5, 32773, 5), littleEndian = true, rowsPerStrip = 2)
    val got = Tiff.decode(t).get
    assert(got.length === 4)
    got.zipWithIndex.foreach { case (p, i) =>
      assert(p.width === 6 + i)
      assert(p.samplesPerPixel === 3)
      assert(flat(p) === (0 until (6 + i) * 5 * 3).map(k => fs(i)(k) & 0xff))
    }
  }

  test("LZW pages large enough to cross the 9->10 bit code-width boundary round-trip") {
    // 80x60 gray with a high-entropy generator creates >512 dictionary
    // entries — the width-pairing between our encoder and the shared
    // ISO 32000 decoder is what this pins
    val f: Int => Byte = k => ((k * 97 + (k >> 3) * 57 + (k >> 7) * 31) & 0xff).toByte
    val t = Tiff.makeTiff(Seq((80, 60, 1, f)), Seq(5), littleEndian = false,
      rowsPerStrip = 60)
    val p = Tiff.decode(t).get.head
    assert(flat(p) === (0 until 4800).map(k => f(k) & 0xff))
  }

  test("header and IFD rejects: magic, 42, empty, out-of-range strip, lying strip count") {
    val t = Tiff.makeTiff(Seq((8, 4, 1, px(1, 1))), Seq(1), littleEndian = true)
    def mut(f: Array[Byte] => Unit): Array[Byte] = { val c = t.clone(); f(c); c }
    assert(Tiff.decode(mut(_(0) = 'X')) === None)
    assert(Tiff.decode(mut(_(2) = 43)) === None)
    assert(Tiff.decode(Array[Byte]('I', 'I', 42, 0)) === None)
    assert(Tiff.decode(null) === None)
    assert(Tiff.decode(t.dropRight(6)) === None) // truncated IFD tail
  }

  test("PackBits over-run and under-run reject (exact strip consume)") {
    val t = Tiff.makeTiff(Seq((8, 2, 1, px(3, 1))), Seq(32773),
      littleEndian = true, rowsPerStrip = 2)
    // the single strip's data sits between the header and the IFD;
    // flipping its first control byte to a large literal run overruns
    val got = Tiff.decode(t).get.head // premise: intact decodes
    assert(got.width === 8)
    val evil = t.clone()
    evil(8) = 0x7f // literal run of 128 where 16 bytes remain
    assert(Tiff.decode(evil) === None)
  }

  test("unsupported shapes reject loudly: 16-bit samples, palette photometric, tiles, CCITT") {
    // hand-tweak a valid file's IFD entries (II layout: tag at fixed offsets)
    val t = Tiff.makeTiff(Seq((8, 4, 1, px(5, 1))), Seq(1), littleEndian = true)
    def patchShortValue(tag: Int, v: Int): Array[Byte] = {
      val c = t.clone()
      // IFD starts after 8-byte header + strip data (+pad); find it via
      // the header pointer
      val ifd = ((c(4) & 0xff) | ((c(5) & 0xff) << 8) |
        ((c(6) & 0xff) << 16) | ((c(7) & 0xff) << 24))
      val n = (c(ifd) & 0xff) | ((c(ifd + 1) & 0xff) << 8)
      (0 until n).foreach { e =>
        val o = ifd + 2 + 12 * e
        val tg = (c(o) & 0xff) | ((c(o + 1) & 0xff) << 8)
        if (tg == tag) { c(o + 8) = (v & 0xff).toByte; c(o + 9) = ((v >> 8) & 0xff).toByte }
      }
      c
    }
    assert(Tiff.decode(patchShortValue(258, 16)) === None)   // 16-bit samples
    assert(Tiff.decode(patchShortValue(262, 3)) === None)    // palette
    assert(Tiff.decode(patchShortValue(262, 0)) === None)    // WhiteIsZero
    assert(Tiff.decode(patchShortValue(259, 2)) === None)    // CCITT G3
    assert(Tiff.decode(patchShortValue(259, 7)) === None)    // JPEG-in-TIFF
  }

  test("IFD cycle and pixel bomb reject fast") {
    val t = Tiff.makeTiff(Seq((8, 4, 1, px(7, 1))), Seq(1), littleEndian = true)
    // point the next-IFD field back at the first IFD
    val ifd = ((t(4) & 0xff) | ((t(5) & 0xff) << 8) |
      ((t(6) & 0xff) << 16) | ((t(7) & 0xff) << 24))
    val n = (t(ifd) & 0xff) | ((t(ifd + 1) & 0xff) << 8)
    val nextF = ifd + 2 + 12 * n
    val cyc = t.clone()
    cyc(nextF) = (ifd & 0xff).toByte; cyc(nextF + 1) = ((ifd >> 8) & 0xff).toByte
    assert(Tiff.decode(cyc) === None)
    // a 65535x65535 declared page must reject before allocating
    val bomb = t.clone()
    def patchLongValue(tag: Int, v: Long): Unit = {
      (0 until n).foreach { e =>
        val o = ifd + 2 + 12 * e
        val tg = (bomb(o) & 0xff) | ((bomb(o + 1) & 0xff) << 8)
        if (tg == tag) (0 until 4).foreach(i =>
          bomb(o + 8 + i) = ((v >> (8 * i)) & 0xff).toByte)
      }
    }
    patchLongValue(256, 65535L)
    patchLongValue(257, 65535L)
    val t0 = System.nanoTime()
    assert(Tiff.decode(bomb) === None)
    assert(System.nanoTime() - t0 < 1e9)
  }

  test("out-of-order IFD tags reject (the spec requires ascending order)") {
    val t = Tiff.makeTiff(Seq((8, 4, 1, px(2, 1))), Seq(1), littleEndian = true)
    val ifd = ((t(4) & 0xff) | ((t(5) & 0xff) << 8) |
      ((t(6) & 0xff) << 16) | ((t(7) & 0xff) << 24))
    val c = t.clone()
    // swap the first two 12-byte entries
    val tmp = new Array[Byte](12)
    System.arraycopy(c, ifd + 2, tmp, 0, 12)
    System.arraycopy(c, ifd + 14, c, ifd + 2, 12)
    System.arraycopy(tmp, 0, c, ifd + 14, 12)
    assert(Tiff.decode(c) === None)
  }
}
