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

}
