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

  test("unsupported shapes reject loudly: 16-bit samples, palette photometric, 8-bit WhiteIsZero, CCITT-on-8-bit") {
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
    assert(Tiff.decode(patchShortValue(259, 2)) === None)    // CCITT on 8-bit
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

  // ---------------- r13: bilevel, CCITT G4, tiles ----------------

  /** Bilevel pixel function: 0 = black, 255 = white, deterministic. */
  private def bw(seed: Int): Int => Byte =
    k => if (((seed * 31 + k * 7) % 251) % 2 == 0) 0 else 255.toByte

  test("bilevel strips round-trip under none/LZW/PackBits, both photometrics, BitsPerSample present or defaulted") {
    for (comp <- Seq(1, 5, 32773); photo <- Seq(0, 1); le <- Seq(true, false)) {
      val f = bw(comp + photo)
      // width 19: rows pad to byte boundaries mid-byte
      val t = Tiff.makeTiffExt(Seq(Tiff.PageSpec(19, 5, 1, 1, photo, comp, f,
        rowsPerStrip = 2)), littleEndian = le)
      val p = Tiff.decode(t).getOrElse(fail(s"comp=$comp photo=$photo rejected")).head
      assert((p.width, p.height, p.samplesPerPixel) === ((19, 5, 1)))
      // output is normalized black=0/white=255 regardless of photometric
      assert(flat(p) === (0 until 95).map(k => f(k) & 0xff))
    }
  }

  test("an ABSENT BitsPerSample tag means bilevel (the spec default of 1)") {
    // surgically remove the 258 entry from a single-strip bilevel file:
    // the IFD is the file's last block, strip offsets are inline and
    // point backwards, so dropping one 12-byte entry is layout-safe
    val f = bw(23)
    val t = Tiff.makeTiffExt(Seq(Tiff.PageSpec(19, 3, 1, 1, 0, 1, f,
      rowsPerStrip = 3)), littleEndian = true)
    val ifd = ((t(4) & 0xff) | ((t(5) & 0xff) << 8) |
      ((t(6) & 0xff) << 16) | ((t(7) & 0xff) << 24))
    val n = (t(ifd) & 0xff) | ((t(ifd + 1) & 0xff) << 8)
    val entryAt = (0 until n).find { e =>
      val o = ifd + 2 + 12 * e
      ((t(o) & 0xff) | ((t(o + 1) & 0xff) << 8)) == 258
    }.get
    val cut = ifd + 2 + 12 * entryAt
    val out = t.take(cut) ++ t.drop(cut + 12)
    out(ifd) = ((n - 1) & 0xff).toByte
    out(ifd + 1) = (((n - 1) >> 8) & 0xff).toByte
    val p = Tiff.decode(out).getOrElse(fail("default-bilevel rejected")).head
    assert(flat(p) === (0 until 57).map(k => f(k) & 0xff))
  }

  test("G4-compressed bilevel strips decode exactly (each strip its own T.6 block)") {
    for (le <- Seq(true, false)) {
      val f = bw(17)
      val t = Tiff.makeTiffExt(Seq(Tiff.PageSpec(100, 9, 1, 1, 0, 4, f,
        rowsPerStrip = 4)), littleEndian = le) // strips of 4, 4, 1 rows
      val p = Tiff.decode(t).getOrElse(fail("G4 rejected")).head
      assert(p.compression === 4)
      assert(flat(p) === (0 until 900).map(k => f(k) & 0xff))
    }
  }

  test("MH 1-D and G3-EOL bilevel strips decode exactly (1-D and 2-D forms); T.4 uncompressed mode rejects") {
    for ((comp, t4) <- Seq((2, 0), (3, 0), (3, 4), (3, 1), (3, 5)); le <- Seq(true, false)) {
      val f = bw(comp * 10 + t4)
      val t = Tiff.makeTiffExt(Seq(Tiff.PageSpec(90, 7, 1, 1, 0, comp, f,
        rowsPerStrip = 3, t4opts = t4)), littleEndian = le)
      val p = Tiff.decode(t).getOrElse(fail(s"comp=$comp t4=$t4 rejected")).head
      assert(flat(p) === (0 until 630).map(k => f(k) & 0xff))
    }
    // T.4 uncompressed mode (T4Options bit 1) rejects
    val tun = Tiff.makeTiffExt(Seq(Tiff.PageSpec(90, 4, 1, 1, 0, 3, bw(9),
      t4opts = 2)), littleEndian = true)
    assert(Tiff.decode(tun) === None)
  }

  test("tiled pages decode with edge-tile clipping: gray LZW, RGB uncompressed, bilevel G4") {
    val g = px(41, 1)
    val t1 = Tiff.makeTiffExt(Seq(Tiff.PageSpec(40, 25, 1, 8, 1, 5, g,
      tile = Some((16, 16)))), littleEndian = true) // 3x2 tiles, both edges clip
    val p1 = Tiff.decode(t1).getOrElse(fail("tiled gray rejected")).head
    assert(flat(p1) === (0 until 1000).map(k => g(k) & 0xff))

    val rgb = px(42, 3)
    val t2 = Tiff.makeTiffExt(Seq(Tiff.PageSpec(18, 17, 3, 8, 2, 1, rgb,
      tile = Some((16, 16)))), littleEndian = false)
    val p2 = Tiff.decode(t2).getOrElse(fail("tiled RGB rejected")).head
    assert(flat(p2) === (0 until 18 * 17 * 3).map(k => rgb(k) & 0xff))

    val b = bw(43)
    val t3 = Tiff.makeTiffExt(Seq(Tiff.PageSpec(50, 40, 1, 1, 0, 4, b,
      tile = Some((32, 16)))), littleEndian = true)
    val p3 = Tiff.decode(t3).getOrElse(fail("tiled G4 rejected")).head
    assert(flat(p3) === (0 until 2000).map(k => b(k) & 0xff))
  }

  test("mixed strip+tile pages and multi-page files with every layout chain correctly") {
    val fs = Seq(px(50, 1), bw(51), px(52, 3))
    val t = Tiff.makeTiffExt(Seq(
      Tiff.PageSpec(11, 7, 1, 8, 1, 32773, fs(0), rowsPerStrip = 3),
      Tiff.PageSpec(33, 20, 1, 1, 0, 4, fs(1), tile = Some((16, 16))),
      Tiff.PageSpec(6, 5, 3, 8, 2, 5, fs(2), rowsPerStrip = 2)),
      littleEndian = false)
    val got = Tiff.decode(t).get
    assert(got.length === 3)
    assert(flat(got(0)) === (0 until 77).map(k => fs(0)(k) & 0xff))
    assert(flat(got(1)) === (0 until 660).map(k => fs(1)(k) & 0xff))
    assert(flat(got(2)) === (0 until 90).map(k => fs(2)(k) & 0xff))
  }

  test("G4/bilevel: T6Options uncompressed mode rejects, FillOrder 2 round-trips for CCITT only, 8-bit G4 and BlackIsZero G4 reject, bad tile dims, strip tags in a tiled directory") {
    // G4 with T6Options declaring uncompressed mode must reject
    val t6 = Tiff.makeTiffExt(Seq(Tiff.PageSpec(100, 4, 1, 1, 0, 4, bw(1),
      t6opts = 4)), littleEndian = true)
    assert(Tiff.decode(t6) === None)
    // FillOrder 2 (LSB-first fill, how fax hardware writes CCITT):
    // round-trips for the bit-oriented codings via per-byte reversal…
    for (comp <- Seq(1, 2, 3, 4)) {
      val f = bw(40 + comp)
      val fo = Tiff.makeTiffExt(Seq(Tiff.PageSpec(90, 4, 1, 1, 0, comp, f,
        fillOrder = 2)), littleEndian = true)
      val p = Tiff.decode(fo).getOrElse(fail(s"FillOrder2 comp=$comp rejected")).head
      assert(flat(p) === (0 until 360).map(k => f(k) & 0xff), s"comp=$comp")
    }
    // …and stays rejected where it is meaningless (8-bit, byte-oriented)
    val fo8 = Tiff.makeTiffExt(Seq(Tiff.PageSpec(8, 4, 1, 8, 1, 1, px(2, 1),
      fillOrder = 2)), littleEndian = true)
    assert(Tiff.decode(fo8) === None)
    // patch helpers over a valid G4 file
    val ok = Tiff.makeTiffExt(Seq(Tiff.PageSpec(100, 4, 1, 1, 0, 4, bw(3))),
      littleEndian = true)
    assert(Tiff.decode(ok).isDefined)
    def patchShort(src: Array[Byte], tag: Int, v: Int): Array[Byte] = {
      val c = src.clone()
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
    // relabeling G4 data as MH/G3 must fail THEIR strict decoders
    assert(Tiff.decode(patchShort(ok, 259, 2)) === None)
    assert(Tiff.decode(patchShort(ok, 259, 3)) === None)
    assert(Tiff.decode(patchShort(ok, 262, 1)) === None) // BlackIsZero G4
    // 8-bit G4: take a valid gray file and flip compression to 4
    val gray = Tiff.makeTiff(Seq((8, 4, 1, px(5, 1))), Seq(1), littleEndian = true)
    assert(Tiff.decode(patchShort(gray, 259, 4)) === None)
    // tile width not a multiple of 16
    val tiled = Tiff.makeTiffExt(Seq(Tiff.PageSpec(40, 25, 1, 8, 1, 1, px(6, 1),
      tile = Some((16, 16)))), littleEndian = true)
    assert(Tiff.decode(tiled).isDefined)
    assert(Tiff.decode(patchShort(tiled, 322, 20)) === None)
    assert(Tiff.decode(patchShort(tiled, 323, 0)) === None)
    // a strip tag surfacing in a tiled directory: renumber
    // StripByteCounts(279) in a STRIP file to TileWidth(322) — order
    // stays ascending, and the directory now mixes layouts
    val strip = Tiff.makeTiff(Seq((8, 4, 1, px(7, 1))), Seq(1), littleEndian = true)
    val mixed = strip.clone()
    val ifd = ((mixed(4) & 0xff) | ((mixed(5) & 0xff) << 8) |
      ((mixed(6) & 0xff) << 16) | ((mixed(7) & 0xff) << 24))
    val nn = (mixed(ifd) & 0xff) | ((mixed(ifd + 1) & 0xff) << 8)
    (0 until nn).foreach { e =>
      val o = ifd + 2 + 12 * e
      val tg = (mixed(o) & 0xff) | ((mixed(o + 1) & 0xff) << 8)
      if (tg == 279) { mixed(o) = (322 & 0xff).toByte; mixed(o + 1) = ((322 >> 8) & 0xff).toByte }
    }
    assert(Tiff.decode(mixed) === None)
  }

  test("PackBits literals followed by a long run round-trip (r13 encoder fix: the literal count must stop at the run, not wrap past 128)") {
    // exactly the padded-edge-tile shape that surfaced the bug: a short
    // literal prefix then hundreds of identical bytes
    val f: Int => Byte = k => if (k < 16) (k % 7 + 1).toByte else 0
    val t = Tiff.makeTiffExt(Seq(Tiff.PageSpec(16, 20, 1, 8, 1, 32773, f,
      rowsPerStrip = 20)), littleEndian = true)
    val p = Tiff.decode(t).getOrElse(fail("literal+run PackBits rejected")).head
    assert(flat(p) === (0 until 320).map(k => f(k) & 0xff))
    // and the two-equal-bytes-then-literals prefix (litRun under-count)
    val g: Int => Byte = k => Seq(9, 9, 1, 2, 3, 4, 5, 6, 7, 8)(k % 10).toByte
    val t2 = Tiff.makeTiffExt(Seq(Tiff.PageSpec(10, 30, 1, 8, 1, 32773, g,
      rowsPerStrip = 30)), littleEndian = true)
    assert(flat(Tiff.decode(t2).get.head) === (0 until 300).map(k => g(k) & 0xff))
    // PackBits on PACKED BILEVEL tiles with padding (the e106 class)
    val b: Int => Byte = k => if (((k * 7) % 251) % 2 == 0) 0 else 255.toByte
    val t3 = Tiff.makeTiffExt(Seq(Tiff.PageSpec(35, 33, 1, 1, 0, 32773, b,
      tile = Some((16, 16)))), littleEndian = false)
    assert(flat(Tiff.decode(t3).get.head) === (0 until 35 * 33).map(k => b(k) & 0xff))
  }

  test("truncated G4 strip data rejects (decode cannot run past the segment)") {
    val t = Tiff.makeTiffExt(Seq(Tiff.PageSpec(100, 4, 1, 1, 0, 4, bw(9))),
      littleEndian = true)
    // shrink the single strip's byte count by patching the LONG value
    val c = t.clone()
    val ifd = ((c(4) & 0xff) | ((c(5) & 0xff) << 8) |
      ((c(6) & 0xff) << 16) | ((c(7) & 0xff) << 24))
    val n = (c(ifd) & 0xff) | ((c(ifd + 1) & 0xff) << 8)
    (0 until n).foreach { e =>
      val o = ifd + 2 + 12 * e
      val tg = (c(o) & 0xff) | ((c(o + 1) & 0xff) << 8)
      if (tg == 279) { c(o + 8) = 2; c(o + 9) = 0; c(o + 10) = 0; c(o + 11) = 0 }
    }
    assert(Tiff.decode(c) === None)
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
