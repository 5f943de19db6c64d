package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bcj, Xz}

class XzSpec extends AnyFunSuite {

  // deterministic corpus shapes: repetitive text (matches + rep0),
  // low-entropy structured lines (cross-chunk matches), binary
  private def textPayload(n: Int): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (sb.length < n) {
      sb.append(s"""{"doc_id":$i,"body":"the quick brown fox ${i % 7} jumps over the lazy dog ${i % 13}"}\n""")
      i += 1
    }
    sb.toString.take(n).getBytes("UTF-8")
  }
  private def binaryPayload(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 131 + (i >> 3) * 7 + (i >> 9)) % 251).toByte)

  test("round-trips: every check type, single and multi chunk, raw splice") {
    for {
      payload <- Seq(textPayload(50000), binaryPayload(20000),
        "short".getBytes("UTF-8"), Array.fill(70000)('a'.toByte))
      check <- Seq(0, 1, 4, 10)
    } {
      val xz = Xz.makeXz(payload, check = check, chunkLen = 1 << 14)
      assert(Xz.decompress(xz).map(_.toSeq) === Some(payload.toSeq),
        s"check=$check len=${payload.length}")
    }
    val p = textPayload(60000)
    val spliced = Xz.makeXz(p, check = 4, chunkLen = 1 << 13, rawSplice = true)
    assert(Xz.decompress(spliced).map(_.toSeq) === Some(p.toSeq))
  }

  test("cross-chunk matches actually compress (the shared-dictionary proof)") {
    val p = textPayload(60000) // highly repetitive across 8 KiB chunks
    val xz = Xz.makeXz(p, check = 4, chunkLen = 1 << 13)
    assert(xz.length < p.length / 2, s"compressed ${xz.length} of ${p.length}")
  }

  test("concatenated streams and 4-aligned stream padding decode; garbage rejects") {
    val a = textPayload(5000)
    val b = binaryPayload(3000)
    val xa = Xz.makeXz(a, check = 1)
    val xb = Xz.makeXz(b, check = 10)
    val pad = Array.fill[Byte](8)(0)
    assert(Xz.decompress(xa ++ xb).map(_.toSeq) === Some((a ++ b).toSeq))
    assert(Xz.decompress(xa ++ pad ++ xb ++ pad).map(_.toSeq) === Some((a ++ b).toSeq))
    assert(Xz.decompress(xa ++ Array[Byte](1, 2, 3)) === None) // tail garbage
    assert(Xz.decompress(xa ++ pad.take(3)) === None) // misaligned padding
  }

  test("truncation rejects at every cut") {
    val xz = Xz.makeXz(textPayload(20000), check = 4)
    for (cut <- Seq(3, 11, 12, 40, xz.length / 2, xz.length - 12, xz.length - 1))
      assert(Xz.decompress(xz.take(cut)) === None, s"cut=$cut")
  }

  test("every container CRC is live: flipping each region rejects") {
    val xz = Xz.makeXz(textPayload(9000), check = 1)
    def flipAt(i: Int): Array[Byte] = {
      val k = xz.clone(); k(i) = (k(i) ^ 0x20).toByte; k
    }
    assert(Xz.decompress(flipAt(6)) === None) // stream flags
    assert(Xz.decompress(flipAt(14)) === None) // block header body
    assert(Xz.decompress(flipAt(xz.length / 2)) === None) // compressed data
    assert(Xz.decompress(flipAt(xz.length - 1)) === None) // footer magic
    assert(Xz.decompress(flipAt(xz.length - 7)) === None) // footer flags
    assert(Xz.decompress(flipAt(xz.length - 14)) === None) // index area
  }

  test("content-check verification catches a payload flip under all four ids") {
    for (check <- Seq(1, 4, 10)) {
      val xz = Xz.makeXz(textPayload(6000), check = check)
      // flip a byte in the compressed body: either the lzma decode or the
      // content check must refuse — never silent wrong bytes
      var rejected = 0
      for (i <- 30 until math.min(xz.length - 40, 130)) {
        val k = xz.clone(); k(i) = (k(i) ^ 0x01).toByte
        if (Xz.decompress(k).isEmpty) rejected += 1
      }
      assert(rejected == 100, s"check=$check: $rejected/100 flips rejected")
    }
  }

  test("unknown filter ids and reserved flag bits reject loudly") {
    val xz = Xz.makeXz(textPayload(2000), check = 0)
    // block header starts at 12; layout: size, flags, filterId, propLen, props
    val badFilter = xz.clone()
    badFilter(14) = 0x03 // delta filter id — out of scope by design
    // fix the header CRC so the reject is the FILTER, not the checksum
    patchBlockHeaderCrc(badFilter)
    assert(Xz.decompress(badFilter) === None)
    val badFlags = xz.clone()
    badFlags(13) = 0x04 // reserved bit in block flags
    patchBlockHeaderCrc(badFlags)
    assert(Xz.decompress(badFlags) === None)
  }
  private def patchBlockHeaderCrc(b: Array[Byte]): Unit = {
    val bhSize = ((b(12) & 0xff) + 1) * 4
    val c = new java.util.zip.CRC32()
    c.update(b, 12, bhSize - 4)
    val v = c.getValue.toInt
    b(12 + bhSize - 4) = (v & 0xff).toByte
    b(12 + bhSize - 3) = ((v >>> 8) & 0xff).toByte
    b(12 + bhSize - 2) = ((v >>> 16) & 0xff).toByte
    b(12 + bhSize - 1) = ((v >>> 24) & 0xff).toByte
  }

  test("decompressed-bytes cap rejects a bomb-shaped file during the walk") {
    val big = Array.fill(1 << 20)('z'.toByte)
    val xz = Xz.makeXz(big, check = 0)
    assert(xz.length < 5000, "bomb premise: high ratio")
    assert(Xz.decompress(xz, cap = 1 << 16) === None)
    assert(Xz.decompress(xz).map(_.length) === Some(1 << 20))
  }

  test("CRC64 matches the xz polynomial on known-shape input") {
    // self-consistency + structure: crc64 of empty is 0, and differs per byte
    assert(Xz.crc64(Array.emptyByteArray, 0, 0) === 0L)
    val a = Xz.crc64("123456789".getBytes("US-ASCII"), 0, 9)
    // ECMA-182 reflected check value for "123456789"
    assert(a === 0x995dc9bbdf1939faL)
  }

  // ---- bidirectional interop with the system xz (the libbz2 precedent):
  // gated on the binary being present; these are the tests that prove the
  // spec implementation against the reference implementation.
  private def haveXz: Boolean =
    try {
      val p = new ProcessBuilder("xz", "--version").start()
      p.getInputStream.readAllBytes(); p.waitFor() == 0
    } catch { case _: Exception => false }

  /** xz gained --riscv in 5.6; probe the long help for the flag */
  private def haveXzRiscv: Boolean =
    try {
      val p = new ProcessBuilder("xz", "--long-help").start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor() == 0 && out.contains("--riscv")
    } catch { case _: Exception => false }

  private def runXz(args: Seq[String], stdin: Array[Byte]): Array[Byte] = {
    // stdin via a temp file: feeding a large payload down the child's
    // stdin pipe while its stdout pipe fills would deadlock both sides
    val tmp = java.io.File.createTempFile("xzspec", ".bin")
    try {
      java.nio.file.Files.write(tmp.toPath, stdin)
      val p = new ProcessBuilder(("xz" +: args): _*)
        .redirectInput(tmp)
        .start()
      val out = p.getInputStream.readAllBytes()
      assert(p.waitFor() == 0, s"xz ${args.mkString(" ")} failed")
      out
    } finally tmp.delete()
  }

  test(".lzma alone-format round-trips: known size, marker-terminated, wide props") {
    for {
      p <- Seq(textPayload(30000), binaryPayload(12000), "t".getBytes("UTF-8"))
      known <- Seq(true, false)
    } {
      val f = Xz.makeLzma(p, knownSize = known)
      assert(Xz.decompressAlone(f).map(_.toSeq) === Some(p.toSeq),
        s"known=$known len=${p.length}")
    }
    // lc+lp > 4 is legal in .lzma (forbidden only in LZMA2): props 103
    // = lc 4, lp 1, pb 2
    val p = textPayload(8000)
    val wide = Xz.makeLzma(p, knownSize = false, props = 103)
    assert(Xz.decompressAlone(wide).map(_.toSeq) === Some(p.toSeq))
  }

  test(".lzma rejects: truncation, bad props, size lies, trailing garbage, bomb") {
    val p = textPayload(10000)
    val f = Xz.makeLzma(p, knownSize = true)
    for (cut <- Seq(0, 5, 13, 20, f.length / 2, f.length - 1))
      assert(Xz.decompressAlone(f.take(cut)) === None, s"cut=$cut")
    val badProps = f.clone(); badProps(0) = 225.toByte
    assert(Xz.decompressAlone(badProps) === None)
    // header claims one byte more than the stream produces
    val lie = f.clone(); lie(5) = ((p.length + 1) & 0xff).toByte
    assert(Xz.decompressAlone(lie) === None)
    assert(Xz.decompressAlone(f ++ Array[Byte](0)) === None) // trailing byte
    // marker-terminated bomb: huge run, tiny cap
    val bomb = Xz.makeLzma(Array.fill(1 << 20)('y'.toByte), knownSize = false)
    assert(bomb.length < 8192)
    assert(Xz.decompressAlone(bomb, cap = 1 << 16) === None)
    // known-size bomb: declared size over cap must reject BEFORE allocating
    val declared = Xz.makeLzma(p, knownSize = true)
    // patch declared size to 2^40
    val big = declared.clone()
    big(5) = 0; big(6) = 0; big(7) = 0; big(8) = 0
    big(9) = 1; big(10) = 0; big(11) = 0; big(12) = 0
    assert(Xz.decompressAlone(big) === None)
  }

  test(".lzma size field: only the all-ones sentinel means unknown; 2^63 rejects") {
    val f = Xz.makeLzma(textPayload(200), knownSize = false) // marker form
    // declared size 2^63: negative-as-Long but NOT the unknown sentinel —
    // a lying header, not a marker-terminated stream
    val k = f.clone()
    (5 until 12).foreach(i => k(i) = 0)
    k(12) = 0x80.toByte
    assert(Xz.decompressAlone(k) === None)
  }

  test("encoder bounds match distances by the declared dict size (1 MiB)") {
    // a 3-gram repeated ~1.4 MiB apart: the hash candidate is further
    // back than the declared dictionary, so the encoder must emit
    // literals there — and the file must round-trip through BOTH our
    // decoder and (when present) the reference one
    val n = (3 << 19) / 2 * 3 // 1.5 MiB
    val p = new Array[Byte](n)
    var i = 0
    while (i < n) { p(i) = ((i * 131 + (i >> 7)) % 251).toByte; i += 1 }
    System.arraycopy("UNIQUEMARK".getBytes("US-ASCII"), 0, p, 0, 10)
    System.arraycopy("UNIQUEMARK".getBytes("US-ASCII"), 0, p, n - 20, 10)
    val xz = Xz.makeXz(p, check = 4, chunkLen = 1 << 14)
    assert(Xz.decompress(xz).map(_.toSeq) === Some(p.toSeq))
    if (haveXz) assert(runXz(Seq("-d", "-c"), xz).toSeq === p.toSeq)
  }

  test("oversized chunk fields fail loudly at construction, never emit silently") {
    intercept[IllegalArgumentException] {
      Xz.makeXz(textPayload(300000), check = 0, chunkLen = 100000,
        rawSplice = true)
    }
  }

  test("INTEROP: .lzma both directions with the reference implementation") {
    assume(haveXz, "system xz not present")
    for (p <- Seq(textPayload(60000), binaryPayload(20000))) {
      val real = runXz(Seq("-z", "-c", "--format=lzma"), p)
      assert(Xz.decompressAlone(real).map(_.toSeq) === Some(p.toSeq))
      for (known <- Seq(true, false)) {
        val ours = Xz.makeLzma(p, knownSize = known)
        val back = runXz(Seq("-d", "-c", "--format=lzma"), ours)
        assert(back.toSeq === p.toSeq, s"known=$known")
      }
    }
  }

  test("INTEROP: our decoder reads real xz output (presets, checks, extreme)") {
    assume(haveXz, "system xz not present")
    val payloads = Seq(textPayload(120000), binaryPayload(40000),
      Array.fill(200000)('x'.toByte), "tiny".getBytes("UTF-8"))
    val variants = Seq(
      Seq("-z", "-c", "-0"), Seq("-z", "-c", "-6"), Seq("-z", "-c", "-9e"),
      Seq("-z", "-c", "-6", "--check=crc32"), Seq("-z", "-c", "-6", "--check=none"),
      Seq("-z", "-c", "-6", "--check=sha256"),
      Seq("-z", "-c", "-6", "--block-size=16384")) // multi-block stream
    for (p <- payloads; v <- variants) {
      val real = runXz(v, p)
      assert(Xz.decompress(real).map(_.toSeq) === Some(p.toSeq),
        s"xz ${v.mkString(" ")} len=${p.length}")
    }
  }

  test("INTEROP: real xz decodes our fixture output byte-exactly") {
    assume(haveXz, "system xz not present")
    for {
      p <- Seq(textPayload(80000), binaryPayload(30000))
      check <- Seq(0, 1, 4, 10)
      raw <- Seq(false, true)
    } {
      val ours = Xz.makeXz(p, check = check, chunkLen = 1 << 13, rawSplice = raw)
      val back = runXz(Seq("-d", "-c"), ours)
      assert(back.toSeq === p.toSeq, s"check=$check raw=$raw")
    }
  }

  // ---------------- r13: x86 BCJ filter chain ----------------

  /** Pseudo-x86: random bytes with frequent E8/E9 opcodes whose
    * operand MSBs rotate through 00/FF/random — the operand overlap
    * and mask-correction paths all fire.
    */
  private def x86ish(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len)
    r.nextBytes(b)
    var i = 0
    while (i < len - 6) {
      if (r.nextInt(10) < 4) {
        b(i) = (if (r.nextBoolean()) 0xe8 else 0xe9).toByte
        b(i + 4) = (r.nextInt(4) match {
          case 0 => 0x00
          case 1 => 0xff
          case _ => r.nextInt(256)
        }).toByte
        i += r.nextInt(8) + 1
      } else i += r.nextInt(6) + 1
    }
    b
  }

  private def bcjPayloads: Seq[Array[Byte]] =
    (0 until 8).map(s => x86ish(s, 2000 + s * 371)) ++ Seq(
      Array.fill(500)(0xe8.toByte), // overlapping-run fixed point
      (0 until 400).map(i => if (i % 5 == 0) 0xe8.toByte else 0x00.toByte).toArray,
      Array.tabulate(300)(i => (if (i % 7 == 0) 0xe9 else 0xff).toByte),
      Array[Byte](0xe8.toByte), Array[Byte]()) // under the 5-byte floor

  test("BCJ x86 raw filter: hand-pinned conversion and self-inverse on adversarial runs") {
    // E8 at pos 4, operand 0x10 LE: encode adds ip+pos+5 = 9 -> 0x19
    val in = "AAAA".getBytes("US-ASCII") ++
      Array[Byte](0xe8.toByte, 0x10, 0, 0, 0) ++ "BBBB".getBytes("US-ASCII")
    val enc = Bcj.x86(in, encode = true)
    assert(enc.toSeq === ("AAAA".getBytes("US-ASCII") ++
      Array[Byte](0xe8.toByte, 0x19, 0, 0, 0) ++ "BBBB".getBytes("US-ASCII")).toSeq)
    assert(Bcj.x86(enc, encode = false).toSeq === in.toSeq)
    for ((p, i) <- bcjPayloads.zipWithIndex)
      assert(Bcj.x86(Bcj.x86(p, encode = true), encode = false).toSeq === p.toSeq,
        s"payload $i")
  }

  test("INTEROP: xz --x86 output decodes exactly through the BCJ+LZMA2 chain") {
    assume(haveXz, "system xz not present")
    for ((p, i) <- bcjPayloads.zipWithIndex if p.length > 0) {
      val real = runXz(Seq("-z", "-c", "--x86", "--lzma2=preset=1"), p)
      assert(Xz.decompress(real).map(_.toSeq) === Some(p.toSeq), s"payload $i")
      // and with a different check + preset
      val real2 = runXz(Seq("-z", "-c", "--check=crc32", "--x86", "--lzma2=preset=6"), p)
      assert(Xz.decompress(real2).map(_.toSeq) === Some(p.toSeq), s"payload $i crc32")
    }
  }

  test("INTEROP: real xz decodes our BCJ-chained fixture output byte-exactly") {
    assume(haveXz, "system xz not present")
    for ((p, i) <- bcjPayloads.zipWithIndex if p.length > 4) {
      val ours = Xz.makeXz(p, check = 4, bcjX86 = true)
      assert(Xz.decompress(ours).map(_.toSeq) === Some(p.toSeq), s"self $i")
      val back = runXz(Seq("-d", "-c"), ours)
      assert(back.toSeq === p.toSeq, s"payload $i")
    }
  }

  test("filter-chain rejects: delta id, x86 with declared start offset, 3-filter chains") {
    val p = x86ish(3, 4000)
    val ours = Xz.makeXz(p, check = 1, bcjX86 = true)
    assert(Xz.decompress(ours).isDefined) // premise
    // block header starts at byte 12: [size][flags][0x04][0][0x21][1][dict]
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = ours.clone()
      f(c)
      // re-seal the block-header CRC32 (bytes 12 .. 12+bhSize-4)
      val bhSize = ((c(12) & 0xff) + 1) * 4
      val crc = new java.util.zip.CRC32()
      crc.update(c, 12, bhSize - 4)
      val v = crc.getValue
      c(12 + bhSize - 4) = (v & 0xff).toByte
      c(12 + bhSize - 3) = ((v >> 8) & 0xff).toByte
      c(12 + bhSize - 2) = ((v >> 16) & 0xff).toByte
      c(12 + bhSize - 1) = ((v >> 24) & 0xff).toByte
      c
    }
    assert(c14(patched(c => c(14) = 0x03)) === None) // delta filter id
    assert(c14(patched(c => c(15) = 4)) === None) // x86 props: start offset
    assert(c14(patched(c => c(13) = 2)) === None) // 3 filters declared
  }

  private def c14(bytes: Array[Byte]): Option[Seq[Byte]] =
    Xz.decompress(bytes).map(_.toSeq)

  // ---------------- r14: delta + ARM64 BCJ filter chains ----------------

  /** Reference-filtered bytes: walk a single-stream single-block xz
    * file the reference encoder wrote and decode ONLY its LZMA2 layer —
    * what remains is the reference implementation's raw pre-filter
    * output, the strongest possible differential pin for our filter
    * transforms (byte-exact equality, not just round-trip agreement).
    */
  private def refFilteredBytes(xzFile: Array[Byte]): Array[Byte] = {
    val bhSize = ((xzFile(12) & 0xff) + 1) * 4
    Xz.lzma2Decode(xzFile, 12 + bhSize, xzFile.length, 1L << 26, 1L << 26)._1
  }

  /** Pseudo-AArch64: 4-byte words biased toward BL opcodes, ADRP words
    * with page immediates clustered around the ±512 MiB guard-window
    * edges, and plain noise; some lengths leave an unfiltered tail.
    */
  private def arm64ish(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len)
    var i = 0
    while (i + 4 <= len) {
      val w = r.nextInt(10) match {
        case 0 | 1 | 2 => (0x25 << 26) | (r.nextInt() & 0x03ffffff) // BL
        case 3 | 4 =>
          // ADRP with immediates at/near the guard edges and inside
          val imm = r.nextInt(6) match {
            case 0 => r.nextInt(0x20000) // well inside, positive
            case 1 => 0x1ffff + r.nextInt(3) - 1 // positive edge
            case 2 => 0x1e0000 + r.nextInt(0x20000) // negative half
            case 3 => 0x1e0000 + r.nextInt(3) - 1 // negative edge
            case _ => r.nextInt() & 0x1fffff // anywhere in 21 bits
          }
          0x90000000 | ((imm & 3) << 29) | (((imm >>> 2) & 0x7ffff) << 5) | r.nextInt(32)
        case _ => r.nextInt()
      }
      b(i) = (w & 0xff).toByte; b(i + 1) = ((w >>> 8) & 0xff).toByte
      b(i + 2) = ((w >>> 16) & 0xff).toByte; b(i + 3) = ((w >>> 24) & 0xff).toByte
      i += 4
    }
    while (i < len) { b(i) = r.nextInt(256).toByte; i += 1 }
    b
  }

  private def sweepN: Int =
    sys.env.get("GRAFT_XZ_SWEEP").map(_.toInt).getOrElse(24)

  private def arm64Payloads: Seq[Array[Byte]] =
    (0 until sweepN).map(s => arm64ish(s, 512 + s * 137 + (s % 4))) ++ Seq(
      Array.fill(64)(0x94.toByte), // BL soup (LE top bytes land anywhere)
      arm64ish(99, 4), arm64ish(98, 7), // one word; word + 3-byte tail
      Array[Byte](1, 2, 3), Array[Byte]()) // under the 4-byte floor

  test("ARM64 BCJ raw filter: hand-pinned BL/ADRP conversions and self-inverse") {
    // BL at byte offset 8, imm 0x10: encode adds pc>>2 = 2 → imm 0x12
    def le(w: Long): Array[Byte] = Array((w & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, ((w >> 16) & 0xff).toByte, ((w >> 24) & 0xff).toByte)
    val in = le(0x11111111L) ++ le(0x22222222L) ++ le(0x94000010L)
    val enc = Bcj.arm64(in, encode = true)
    assert(enc.toSeq === (le(0x11111111L) ++ le(0x22222222L) ++ le(0x94000012L)).toSeq)
    assert(Bcj.arm64(enc, encode = false).toSeq === in.toSeq)
    // ADRP imm 5 (immlo 1, immhi 1, rd 1) at page offset 1: encode adds
    // pc>>12 = 1 → imm 6 (immlo 2, immhi 1)
    val page = new Array[Byte](4096 + 4)
    System.arraycopy(le(0xb0000021L), 0, page, 4096, 4)
    val pe = Bcj.arm64(page, encode = true)
    assert(pe.slice(4096, 4100).toSeq === le(0xd0000021L).toSeq)
    assert(Bcj.arm64(pe, encode = false).toSeq === page.toSeq)
    // ADRP with imm outside the ±512 MiB window is untouched: imm
    // 0x20000 (first value past the positive edge)
    val out = le(0x90000000L | ((0x20000L & 3) << 29) | (((0x20000L >> 2) & 0x7ffff) << 5))
    assert(Bcj.arm64(out, encode = true).toSeq === out.toSeq)
    for ((p, i) <- arm64Payloads.zipWithIndex)
      assert(Bcj.arm64(Bcj.arm64(p, encode = true), encode = false).toSeq === p.toSeq,
        s"payload $i")
  }

  test("delta raw filter: hand-pinned subtraction and self-inverse across distances") {
    val in = Array[Byte](10, 20, 35, 51, 70)
    assert(Bcj.delta(in, 1, encode = true).toSeq ===
      Seq[Byte](10, 10, 15, 16, 19))
    assert(Bcj.delta(in, 2, encode = true).toSeq ===
      Seq[Byte](10, 20, 25, 31, 35))
    for {
      dist <- Seq(1, 2, 3, 4, 8, 16, 255, 256)
      len <- Seq(0, 1, dist - 1, dist, dist + 1, 1000)
      if len >= 0
    } {
      val p = binaryPayload(len)
      assert(Bcj.delta(Bcj.delta(p, dist, encode = true), dist, encode = false)
        .toSeq === p.toSeq, s"dist=$dist len=$len")
    }
  }

  test("INTEROP: reference-filtered bytes are byte-exact (arm64, delta, x86)") {
    assume(haveXz, "system xz not present")
    for ((p, i) <- arm64Payloads.zipWithIndex if p.length > 0) {
      val real = runXz(Seq("-z", "-c", "--arm64", "--lzma2=preset=0"), p)
      assert(refFilteredBytes(real).toSeq === Bcj.arm64(p, encode = true).toSeq,
        s"arm64 payload $i: our filter output diverges from the reference's")
    }
    for {
      dist <- Seq(1, 2, 4, 16, 256)
      p <- Seq(binaryPayload(777), textPayload(1500), arm64ish(7, 333))
    } {
      val real = runXz(Seq("-z", "-c", s"--delta=dist=$dist", "--lzma2=preset=0"), p)
      assert(refFilteredBytes(real).toSeq === Bcj.delta(p, dist, encode = true).toSeq,
        s"delta dist=$dist")
    }
    // retro-pin the r13 x86 filter through the same strongest lens
    for ((p, i) <- bcjPayloads.zipWithIndex if p.length > 0) {
      val real = runXz(Seq("-z", "-c", "--x86", "--lzma2=preset=0"), p)
      assert(refFilteredBytes(real).toSeq === Bcj.x86(p, encode = true).toSeq,
        s"x86 payload $i")
    }
  }

  test("INTEROP: xz --arm64 / --delta output decodes through the full chain") {
    assume(haveXz, "system xz not present")
    for ((p, i) <- arm64Payloads.zipWithIndex if p.length > 0) {
      val real = runXz(Seq("-z", "-c", "--arm64", "--lzma2=preset=1"), p)
      assert(Xz.decompress(real).map(_.toSeq) === Some(p.toSeq), s"arm64 $i")
    }
    for (dist <- Seq(1, 4, 256)) {
      val p = binaryPayload(4000)
      val real = runXz(Seq("-z", "-c", "--check=crc32", s"--delta=dist=$dist",
        "--lzma2=preset=6"), p)
      assert(Xz.decompress(real).map(_.toSeq) === Some(p.toSeq), s"delta $dist")
    }
    // a 3-filter chain: delta then x86 then LZMA2 (header-order proof)
    val p3 = x86ish(11, 3000)
    val real3 = runXz(Seq("-z", "-c", "--delta=dist=2", "--x86",
      "--lzma2=preset=1"), p3)
    assert(Xz.decompress(real3).map(_.toSeq) === Some(p3.toSeq))
    val p4 = arm64ish(12, 2800)
    val real4 = runXz(Seq("-z", "-c", "--delta=dist=4", "--arm64",
      "--lzma2=preset=1"), p4)
    assert(Xz.decompress(real4).map(_.toSeq) === Some(p4.toSeq))
  }

  test("INTEROP: real xz decodes our delta/arm64/multi-filter fixtures byte-exactly") {
    assume(haveXz, "system xz not present")
    import Xz.{Arm64Filter, DeltaFilter, X86Filter}
    val cases: Seq[(Array[Byte], Seq[Xz.PreFilter])] = Seq(
      (arm64ish(21, 5000), Seq(Arm64Filter)),
      (binaryPayload(6000), Seq(DeltaFilter(1))),
      (binaryPayload(2300), Seq(DeltaFilter(256))),
      (x86ish(22, 4000), Seq(DeltaFilter(2), X86Filter)),
      (arm64ish(23, 3600), Seq(DeltaFilter(4), Arm64Filter)))
    for (((p, fs), i) <- cases.zipWithIndex) {
      val ours = Xz.makeXz(p, check = 4, filters = fs)
      assert(Xz.decompress(ours).map(_.toSeq) === Some(p.toSeq), s"self $i")
      val back = runXz(Seq("-d", "-c"), ours)
      assert(back.toSeq === p.toSeq, s"case $i")
    }
  }

  test("filter rejects hold: undefined id, arm64 with start offset, delta with bad props") {
    val p = arm64ish(31, 2000)
    val ours = Xz.makeXz(p, check = 1, filters = Seq(Xz.Arm64Filter))
    assert(Xz.decompress(ours).isDefined) // premise
    // block header at 12: [size][flags][0x0a][0][0x21][1][dict]
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = ours.clone(); f(c); patchBlockHeaderCrc(c); c
    }
    assert(c14(patched(c => c(14) = 0x0c)) === None) // undefined id
    // 0x06/0x0b are now the SUPPORTED ia64/riscv filters — declaring
    // one over arm64-filtered data mis-converts and the content check
    // rejects: never silent wrong bytes
    assert(c14(patched(c => c(14) = 0x0b)) === None)
    assert(c14(patched(c => c(14) = 0x06)) === None)
    assert(c14(patched(c => c(15) = 4)) === None) // arm64 start offset
    // a WRONG branch id from the supported family (declares ARM over
    // arm64-filtered data): the filter gate passes but the content
    // check MUST catch the mis-conversion — never silent wrong bytes
    assert(c14(patched(c => c(14) = 0x07)) === None)
    val od = Xz.makeXz(p, check = 1, filters = Seq(Xz.DeltaFilter(3)))
    assert(Xz.decompress(od).isDefined)
    def patchedD(f: Array[Byte] => Unit): Array[Byte] = {
      val c = od.clone(); f(c); patchBlockHeaderCrc(c); c
    }
    assert(c14(patchedD(c => c(15) = 0)) === None) // delta props absent
    assert(c14(patchedD(c => c(15) = 2)) === None) // delta props oversized
  }

  /** Pseudo-IA64: 16-byte bundles rotating branch/non-branch templates
    * with slots at/around the convert condition (top4=5, bits 11:9 = 0)
    * and immediates spanning the 21-bit wrap, plus partial-bundle tails.
    */
  private def ia64ish(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len)
    r.nextBytes(b)
    var i = 0
    while (i + 16 <= len) {
      if (r.nextInt(3) != 0) {
        val template = Seq(16, 17, 18, 19, 22, 23, 24, 25, 28, 29, 0, 5, 13)(r.nextInt(13))
        var v = BigInt(template)
        for (s <- 0 until 3) {
          val top4 = if (r.nextInt(2) == 0) 5L else r.nextInt(16).toLong
          val mid = if (r.nextInt(3) == 0) r.nextInt(8).toLong else 0L
          val slot = (top4 << 37) | ((r.nextInt() & 1L) << 36) |
            ((r.nextInt() & 0xfffffL) << 13) | (mid << 9) | (r.nextInt(512).toLong)
          v |= BigInt(slot & ((1L << 41) - 1)) << (5 + 41 * s)
        }
        val bytes = v.toByteArray.reverse.padTo(16, 0.toByte)
        System.arraycopy(bytes, 0, b, i, 16)
      }
      i += 16
    }
    b
  }

  test("INTEROP: ia64 reference-filtered bytes are byte-exact (oracle-probed template/slot machinery)") {
    assume(haveXz, "system xz not present")
    for (s <- 0 until sweepN) {
      val p = ia64ish(s, 640 + s * 97 + (s % 16))
      assert(Bcj.ia64(Bcj.ia64(p, true), false).toSeq === p.toSeq, s"rt $s")
      val real = runXz(Seq("-z", "-c", "--ia64", "--lzma2=preset=0"), p)
      assert(refFilteredBytes(real).toSeq === Bcj.ia64(p, true).toSeq,
        s"ia64 payload $s: our filter output diverges from the reference's")
      assert(Xz.decompress(real).map(_.toSeq) === Some(p.toSeq), s"chain $s")
    }
    val p = ia64ish(4242, 4800)
    val ours = Xz.makeXz(p, check = 4, filters = Seq(Xz.Ia64Filter))
    assert(Xz.decompress(ours).map(_.toSeq) === Some(p.toSeq))
    assert(runXz(Seq("-d", "-c"), ours).toSeq === p.toSeq, "ia64 reverse")
  }

  test("GOLDEN: 39 committed reference-encoded filter-chain streams decode byte-exactly") {
    // every branch/delta chain x 3 presets/checks, produced by the
    // reference xz at generation time (Test/runMain graft.GoldenGen) and
    // COMMITTED — the interop evidence survives sandboxes without the
    // binary (the brotli 72-stream precedent)
    val in = getClass.getResourceAsStream("/golden/xz_branch_streams.json")
    assert(in != null, "missing golden resource")
    val txt = new String(in.readAllBytes(), "UTF-8"); in.close()
    val entry = """"([a-z0-9+\-]+)":\s*\{"payload":\s*"([^"]*)",\s*"stream":\s*"([^"]*)"\}""".r
    val b64 = java.util.Base64.getDecoder
    val hits = entry.findAllMatchIn(txt).toSeq
    assert(hits.length === 39)
    hits.foreach { m =>
      val payload = b64.decode(m.group(2))
      val stream = b64.decode(m.group(3))
      assert(Xz.decompress(stream).map(_.toSeq) === Some(payload.toSeq),
        s"golden ${m.group(1)}")
    }
  }

  // ------- r14b: the rest of the simple branch family (arm/armt/ppc/sparc)

  /** Per-architecture pseudo-code generators biased toward the
    * convertible instruction forms (plus noise and odd tails).
    */
  private def armish(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len); r.nextBytes(b)
    var i = 0
    while (i + 4 <= len) {
      if (r.nextInt(3) == 0) b(i + 3) = 0xeb.toByte // BL
      i += 4
    }
    b
  }
  private def thumbish(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len); r.nextBytes(b)
    var i = 0
    while (i + 4 <= len) {
      if (r.nextInt(3) == 0) {
        b(i + 1) = (0xf0 | r.nextInt(8)).toByte
        b(i + 3) = (0xf8 | r.nextInt(8)).toByte
      }
      i += 2 + 2 * r.nextInt(2)
    }
    b
  }
  private def ppcish(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len); r.nextBytes(b)
    var i = 0
    while (i + 4 <= len) {
      if (r.nextInt(3) == 0) {
        b(i) = (0x48 | r.nextInt(4)).toByte
        b(i + 3) = ((b(i + 3) & 0xfc) | 1).toByte // LK=1, AA random
      }
      i += 4
    }
    b
  }
  private def sparcish(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len); r.nextBytes(b)
    var i = 0
    while (i + 4 <= len) {
      if (r.nextInt(3) == 0) {
        if (r.nextBoolean()) { b(i) = 0x40; b(i + 1) = (b(i + 1) & 0x3f).toByte }
        else { b(i) = 0x7f; b(i + 1) = (b(i + 1) | 0xc0).toByte }
      }
      i += 4
    }
    b
  }

  /** Pseudo-RISC-V: JAL (rd rotating through link and non-link regs),
    * AUIPC pairs (matching and mismatching rs1, every excluded rd,
    * descriptors with low2 ∈ {0,3}), natural auipc-x2 masquerade
    * shapes, compressed-width phase shifts, and noise — every branch
    * of the convert/protect/skip machinery fires.
    */
  private def riscvish(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len)
    r.nextBytes(b)
    var i = 0
    def put32(o: Int, w: Int): Unit = {
      b(o) = (w & 0xff).toByte; b(o + 1) = ((w >>> 8) & 0xff).toByte
      b(o + 2) = ((w >>> 16) & 0xff).toByte; b(o + 3) = ((w >>> 24) & 0xff).toByte
    }
    while (i + 8 <= len) {
      r.nextInt(8) match {
        case 0 | 1 => // JAL, rd biased to x1/x5 but also others
          val rd = Seq(1, 5, 1, 5, 2, 7, 0)(r.nextInt(7))
          put32(i, 0x6f | (rd << 7) | (r.nextInt() & 0xfffff000))
          i += 4
        case 2 | 3 | 4 => // AUIPC + second word
          val rd = r.nextInt(32)
          put32(i, 0x17 | (rd << 7) | (r.nextInt() & 0xfffff000))
          val rs1 = if (r.nextBoolean()) rd else r.nextInt(32)
          val low2 = if (r.nextInt(4) == 0) r.nextInt(3) else 3
          put32(i + 4, (r.nextInt() & ~(0x1f << 15) & ~3) | (rs1 << 15) | low2)
          i += 8
        case 5 => // natural auipc x2 with a descriptor-shaped hi20
          val rs1 = r.nextInt(32)
          val low2 = if (r.nextInt(3) == 0) 0 else 3
          val desc = (r.nextInt() & 0xffffc & ~(0x1f << 15)) | (rs1 << 15) | low2
          put32(i, 0x117 | (desc << 12))
          i += 4
        case 6 => i += 2 // compressed-width phase shift
        case _ => i += 4 // leave noise
      }
    }
    b
  }

  test("INTEROP: riscv reference-filtered bytes are byte-exact (oracle-probed machinery)") {
    assume(haveXz, "system xz not present")
    // the riscv filter landed in xz 5.6; the runtime's xz has drifted
    // across rounds (5.4 <-> 5.8) -- capability-probe, don't assert.
    // The 39 committed binary-independent goldens stay as the pin.
    assume(haveXzRiscv, "system xz lacks --riscv (pre-5.6)")
    for (s <- 0 until sweepN) {
      val p = riscvish(s, 700 + s * 131)
      assert(Bcj.riscv(Bcj.riscv(p, true), false).toSeq === p.toSeq, s"rt $s")
      val real = runXz(Seq("-z", "-c", "--riscv", "--lzma2=preset=0"), p)
      assert(refFilteredBytes(real).toSeq === Bcj.riscv(p, true).toSeq,
        s"riscv payload $s: our filter output diverges from the reference's")
      assert(Xz.decompress(real).map(_.toSeq) === Some(p.toSeq), s"chain $s")
    }
    val p = riscvish(1717, 4000)
    val ours = Xz.makeXz(p, check = 4, filters = Seq(Xz.RiscvFilter))
    assert(Xz.decompress(ours).map(_.toSeq) === Some(p.toSeq))
    assert(runXz(Seq("-d", "-c"), ours).toSeq === p.toSeq, "riscv reverse")
  }

  test("INTEROP: arm/armthumb/powerpc/sparc reference-filtered bytes are byte-exact") {
    assume(haveXz, "system xz not present")
    val fams: Seq[(String, Int => Array[Byte], (Array[Byte], Boolean) => Array[Byte], Xz.PreFilter)] = Seq(
      ("arm", (s: Int) => armish(s, 600 + s * 97), Bcj.arm _, Xz.ArmFilter),
      ("armthumb", (s: Int) => thumbish(s, 600 + s * 97), Bcj.armThumb _, Xz.ArmThumbFilter),
      ("powerpc", (s: Int) => ppcish(s, 600 + s * 97), Bcj.ppc _, Xz.PpcFilter),
      ("sparc", (s: Int) => sparcish(s, 600 + s * 97), Bcj.sparc _, Xz.SparcFilter))
    for ((flag, gen, filt, pf) <- fams) {
      for (s <- 0 until sweepN) {
        val p = gen(s)
        // self-inverse first
        assert(filt(filt(p, true), false).toSeq === p.toSeq, s"$flag rt $s")
        val real = runXz(Seq("-z", "-c", s"--$flag", "--lzma2=preset=0"), p)
        assert(refFilteredBytes(real).toSeq === filt(p, true).toSeq,
          s"$flag payload $s: our filter output diverges from the reference's")
        assert(Xz.decompress(real).map(_.toSeq) === Some(p.toSeq), s"$flag chain $s")
      }
      // reverse: real xz decodes our fixture with this filter declared
      val p = gen(17)
      val ours = Xz.makeXz(p, check = 4, filters = Seq(pf))
      assert(Xz.decompress(ours).map(_.toSeq) === Some(p.toSeq))
      assert(runXz(Seq("-d", "-c"), ours).toSeq === p.toSeq, s"$flag reverse")
    }
  }
}
