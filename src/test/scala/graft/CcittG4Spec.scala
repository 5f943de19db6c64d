package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CcittG4

/** T.6 codec pins. The hand-pinned bitstreams below were derived ON
  * PAPER from the published ITU-T T.4 code tables and the T.6 coding
  * procedure — they validate the table transcription and the mode
  * logic independently of BOTH the encoder and the decoder (a
  * transcription error shared by the two sides would round-trip
  * cleanly but fail these pins).
  */
class CcittG4Spec extends AnyFunSuite {

  private val EOFB = "000000000001" * 2

  private def toBytes(bits: String): Array[Byte] = {
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    padded.grouped(8).map(s => java.lang.Integer.parseInt(s, 2).toByte).toArray
  }

  private def toBits(bytes: Array[Byte]): String =
    bytes.map(b => String.format("%8s",
      Integer.toBinaryString(b & 0xff)).replace(' ', '0')).mkString

  /** black-run description → pixel row (1 = black). */
  private def row(width: Int, blackRanges: (Int, Int)*): Array[Byte] = {
    val r = new Array[Byte](width)
    blackRanges.foreach { case (from, until) =>
      (from until until).foreach(i => r(i) = 1)
    }
    r
  }

  test("hand pin: all-white line codes as a single V0") {
    val px = row(8)
    assert(toBits(CcittG4.encode(px, 8, 1)) === toBytes("1" + EOFB).pipe(toBits))
    // decode side, WITHOUT EOFB (TIFF writers may omit it)
    assert(CcittG4.decode(toBytes("1"), 8, 1).get.toSeq === px.toSeq)
    assert(CcittG4.decode(toBytes("1" + EOFB), 8, 1).get.toSeq === px.toSeq)
  }

  test("hand pin: 4w 5b 7w = horizontal(white4=1011, black5=0011) + V0") {
    val px = row(16, (4, 9))
    val bits = "001" + "1011" + "0011" + "1"
    assert(toBits(CcittG4.encode(px, 16, 1)) === toBits(toBytes(bits + EOFB)))
    assert(CcittG4.decode(toBytes(bits), 16, 1).get.toSeq === px.toSeq)
  }

  test("hand pin: second row via VR1 then V0 V0 against the first") {
    val r1 = row(16, (4, 9))
    val r2 = row(16, (5, 9))
    val px = r1 ++ r2
    val bits = "001" + "1011" + "0011" + "1" + // row 1 as above
      "011" + "1" + "1" // row 2: VR1 (b1=4→a1=5), V0, V0
    assert(toBits(CcittG4.encode(px, 16, 2)) === toBits(toBytes(bits + EOFB)))
    assert(CcittG4.decode(toBytes(bits), 16, 2).get.toSeq === px.toSeq)
  }

  test("hand pin: line starting black uses white run 0 (00110101) and a black make-up (64=0000001111)") {
    val px = row(200, (0, 70)) // 70 black then 130 white
    val bits = "001" + "00110101" + "0000001111" + "0010" + "1"
    // white 0, black make-up 64, black terminating 6, then V0 to end
    assert(toBits(CcittG4.encode(px, 200, 1)) === toBits(toBytes(bits + EOFB)))
    assert(CcittG4.decode(toBytes(bits), 200, 1).get.toSeq === px.toSeq)
  }

  test("hand pin: white make-up 128 (10010) + white 0, black make-up 64 + black 8 (000101)") {
    val px = row(200, (128, 200)) // 128 white then 72 black
    val bits = "001" + "10010" + "00110101" + "0000001111" + "000101"
    assert(toBits(CcittG4.encode(px, 200, 1)) === toBits(toBytes(bits + EOFB)))
    assert(CcittG4.decode(toBytes(bits), 200, 1).get.toSeq === px.toSeq)
  }

  test("hand pin: pass mode when the reference run ends left of the coding run") {
    val r1 = row(200, (10, 20))
    val r2 = row(200, (30, 40))
    val px = r1 ++ r2
    val row1 = "001" + "00111" + "0000100" + "1" // 10w,10b then V0
    val row2 = "0001" + // pass over the reference's [10,20) run
      "001" + "00111" + "0000100" + // horizontal 10 white, 10 black
      "1" // V0 to line end
    val bits = row1 + row2
    assert(toBits(CcittG4.encode(px, 200, 2)) === toBits(toBytes(bits + EOFB)))
    assert(CcittG4.decode(toBytes(bits), 200, 2).get.toSeq === px.toSeq)
  }

  test("hand pin: VL2 codes 000010") {
    val r1 = row(200, (10, 20))
    val r2 = row(200, (8, 20))
    val px = r1 ++ r2
    val row1 = "001" + "00111" + "0000100" + "1"
    val row2 = "000010" + "1" + "1" // VL2, V0, V0
    assert(toBits(CcittG4.encode(px, 200, 2)) === toBits(toBytes(row1 + row2 + EOFB)))
    assert(CcittG4.decode(toBytes(row1 + row2), 200, 2).get.toSeq === px.toSeq)
  }

  test("extended make-up codes round-trip (runs past 2560)") {
    val px = row(3000, (2700, 3000)) // white 2700 = 2560 + 128 + 12
    val got = CcittG4.decode(CcittG4.encode(px, 3000, 1), 3000, 1).get
    assert(got.toSeq === px.toSeq)
  }

  test("random and structured images round-trip exactly") {
    for (width <- Seq(1, 2, 17, 64, 333); height <- Seq(1, 2, 9); seed <- Seq(3, 11)) {
      var s = seed * 2654435761L
      val px = Array.tabulate[Byte](width * height) { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        (((s >>> 33) & 1)).toByte
      }
      val got = CcittG4.decode(CcittG4.encode(px, width, height), width, height)
      assert(got.isDefined, s"w=$width h=$height seed=$seed rejected")
      assert(got.get.toSeq === px.toSeq, s"w=$width h=$height seed=$seed")
    }
    // long alternating runs (every vertical offset ±1..3 exercised)
    for (width <- Seq(65, 130)) {
      val px = Array.tabulate[Byte](width * 8) { k =>
        val y = k / width; val x = k % width
        if ((x + y) % 7 < 3) 1 else 0
      }
      assert(CcittG4.decode(CcittG4.encode(px, width, 8), width, 8).get.toSeq === px.toSeq)
    }
  }

  test("rejects: extension code, EOL in data, truncation, nonzero pad, run past width, vertical overshoot") {
    assert(CcittG4.decode(toBytes("0000001000"), 8, 1) === None) // 2-D extension
    assert(CcittG4.decode(toBytes("000000000001" + "1"), 8, 1) === None) // EOL first
    assert(CcittG4.decode(toBytes("0011011"), 16, 1) === None) // truncated horizontal
    assert(CcittG4.decode(toBytes("1" + "1000000"), 8, 1) === None) // nonzero pad
    assert(CcittG4.decode(toBytes("001" + "001000" + "11"), 8, 1) === None) // white 12 > width 8
    assert(CcittG4.decode(toBytes("011"), 8, 1) === None) // VR1 past line end (a1=9)
    assert(CcittG4.decode(null, 8, 1) === None)
    assert(CcittG4.decode(toBytes("1"), 0, 1) === None)
    // EOFB then MORE data = trailing garbage
    assert(CcittG4.decode(toBytes("1" + EOFB + "00000000"), 8, 1) === None)
  }

  test("decoder never crashes on random bytes (fuzz)") {
    var s = 0x9e3779b97f4a7c15L
    (0 until 2000).foreach { i =>
      val len = 1 + (i % 40)
      val b = Array.tabulate[Byte](len) { _ =>
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & 0xff).toByte
      }
      CcittG4.decode(b, 1 + (i % 100), 1 + (i % 7)) // Option either way
    }
  }


  // ---------------- r13b: TIFF Compression 2 (MH 1-D) ----------------

  test("MH 1-D hand pins: byte-aligned rows from the published tables") {
    // 4w 3b 9w: white4=1011, black3=10, white9=10100 -> 11 bits + pad
    val r1 = row(16, (4, 7))
    val bits1 = "1011" + "10" + "10100"
    assert(toBits(CcittG4.encodeMh(r1, 16, 1)) === toBits(toBytes(bits1)))
    assert(CcittG4.decodeMh(toBytes(bits1), 16, 1).get.toSeq === r1.toSeq)
    // row starting black: leading zero-length white run (00110101)
    val r2 = row(8, (0, 3))
    val bits2 = "00110101" + "10" + "1100" // white0, black3, white5
    assert(toBits(CcittG4.encodeMh(r2, 8, 1)) === toBits(toBytes(bits2)))
    assert(CcittG4.decodeMh(toBytes(bits2), 8, 1).get.toSeq === r2.toSeq)
    // two rows: EACH begins on a byte boundary (the TIFF §10 rule) —
    // the encoder's row-1 bytes must be EXACTLY the single-row encoding
    val px = r1 ++ row(16, (5, 9))
    val enc = CcittG4.encodeMh(px, 16, 2)
    assert(enc.take(2).toSeq === CcittG4.encodeMh(r1, 16, 1).toSeq)
    assert(CcittG4.decodeMh(enc, 16, 2).get.toSeq === px.toSeq)
  }

  test("MH 1-D round-trips: random rows, make-up runs, byte-alignment per row") {
    for (width <- Seq(1, 7, 64, 200, 3000); height <- Seq(1, 3, 8)) {
      var s = width * 31 + height
      val px = Array.tabulate[Byte](width * height) { _ =>
        s = s * 1103515245 + 12345; ((s >>> 16) & 1).toByte
      }
      val enc = CcittG4.encodeMh(px, width, height)
      assert(CcittG4.decodeMh(enc, width, height).get.toSeq === px.toSeq,
        s"w=$width h=$height")
    }
    val long = row(3000, (0, 2700)) // black makeup chain past 2560
    assert(CcittG4.decodeMh(CcittG4.encodeMh(long, 3000, 1), 3000, 1).get.toSeq === long.toSeq)
  }

  test("MH 1-D rejects: zero run mid-row, nonzero row padding, trailing garbage, truncation") {
    // white4, black0 (0000110111) — a zero black run mid-row cannot advance
    assert(CcittG4.decodeMh(toBytes("1011" + "0000110111" + "00"), 16, 1) === None)
    // nonzero pad bits after a complete row
    assert(CcittG4.decodeMh(toBytes("1011" + "10" + "10100" + "00001"), 16, 1) === None)
    // trailing byte after the final row
    val ok = CcittG4.encodeMh(row(16, (4, 7)), 16, 1)
    assert(CcittG4.decodeMh(ok ++ Array[Byte](0x55), 16, 1) === None)
    assert(CcittG4.decodeMh(ok.dropRight(1), 16, 2) === None) // truncated
    assert(CcittG4.decodeMh(null, 16, 1) === None)
  }


  // ---------------- r13b: TIFF Compression 3 (G3 1-D, EOL-framed) -------

  test("G3 1-D hand pins: EOL before every row, aligned and unaligned forms") {
    val EOL = "000000000001"
    val r1 = row(16, (4, 7)) // 4w 3b 9w = 1011 10 10100
    val bits = EOL + "1011" + "10" + "10100" + EOL + "1011" + "10" + "10100"
    val px = r1 ++ r1
    assert(toBits(CcittG4.encodeG3(px, 16, 2, alignedEol = false)) ===
      toBits(toBytes(bits)))
    assert(CcittG4.decodeG3(toBytes(bits), 16, 2, alignedEol = false).get.toSeq === px.toSeq)
    // aligned form: zero fill so every EOL ends on a byte boundary
    val enc = CcittG4.encodeG3(px, 16, 2, alignedEol = true)
    assert(CcittG4.decodeG3(enc, 16, 2, alignedEol = true).get.toSeq === px.toSeq)
    // first EOL of the aligned form occupies bits 0..11 with 4 fill? no:
    // 12 EOL bits from position 0 must END at bit 16 → 4 leading zeros
    assert(toBits(enc).take(16) === "0000" + EOL)
  }

  test("G3 1-D round-trips: random rows, both alignment forms, make-up runs") {
    for (width <- Seq(1, 17, 200, 1728); height <- Seq(1, 4); al <- Seq(false, true)) {
      var s = width * 7 + height + (if (al) 1 else 0)
      val px = Array.tabulate[Byte](width * height) { _ =>
        s = s * 1103515245 + 12345; ((s >>> 16) & 1).toByte
      }
      val enc = CcittG4.encodeG3(px, width, height, al)
      assert(CcittG4.decodeG3(enc, width, height, al).get.toSeq === px.toSeq,
        s"w=$width h=$height aligned=$al")
    }
  }

  test("G3 1-D rejects: missing EOL, short EOL, runaway fill, misaligned EOL, trailing garbage") {
    val EOL = "000000000001"
    val good = EOL + "1011" + "10" + "10100"
    assert(CcittG4.decodeG3(toBytes(good), 16, 1, alignedEol = false).isDefined)
    // row data with no EOL at all
    assert(CcittG4.decodeG3(toBytes("1011" + "10" + "10100"), 16, 1, false) === None)
    // only 10 zeros before the 1: not an EOL
    assert(CcittG4.decodeG3(toBytes("0000000000" + "1" + "1011" + "10" + "10100"), 16, 1, false) === None)
    // 69 bits of fill before the EOL: SPEC-LEGAL (T.4 permits arbitrary
    // fill for minimum scan-line time — ADVICE r13 raised the old
    // 64-bit cap that rejected real fax-derived TIFFs)
    assert(CcittG4.decodeG3(toBytes("0" * 80 + "1" + "1011" + "10" + "10100"),
      16, 1, false).get.toSeq === row(16, (4, 7)).toSeq)
    // ~8 KiB of fill on ONE row still decodes...
    assert(CcittG4.decodeG3(toBytes("0" * 65500 + "1" + "1011" + "10" + "10100"),
      16, 1, false).isDefined)
    // ...but past the sanity cap is runaway garbage, not fill
    assert(CcittG4.decodeG3(toBytes("0" * 66000 + "1" + "1011" + "10" + "10100"),
      16, 1, false) === None)
    // aligned mode but the EOL ends mid-byte
    assert(CcittG4.decodeG3(toBytes(good), 16, 1, alignedEol = true) === None)
    // a whole extra byte after the final row
    val enc = CcittG4.encodeG3(row(16, (4, 7)), 16, 1, alignedEol = false)
    assert(CcittG4.decodeG3(enc ++ Array[Byte](0x70), 16, 1, false) === None)
    assert(CcittG4.decodeG3(null, 16, 1, false) === None)
  }

  test("G3 2-D: tag bits select 1-D/2-D rows; 2-D rows reuse the G4 line coder (hand pin + round-trips)") {
    val EOL = "000000000001"
    // rows: r1 = 4w 3b 9w (1-D, tag 1), r2 = 5w 2b 9w (2-D, tag 0)
    val r1 = row(16, (4, 7))
    val r2 = row(16, (5, 7))
    val px = r1 ++ r2
    // r2 vs r1: changes cur=[5,7], ref=[4,7]: a1=5,b1=4 -> VR1 (011);
    // then a1=7,b1=7 -> V0 (1); then a1=16,b1=16 -> V0 (1)
    val bits = EOL + "1" + "1011" + "10" + "10100" + // tag1 + MH row
      EOL + "0" + "011" + "1" + "1" // tag0 + VR1 V0 V0
    assert(toBits(CcittG4.encodeG3(px, 16, 2, alignedEol = false, twoDim = true)) ===
      toBits(toBytes(bits)))
    assert(CcittG4.decodeG3(toBytes(bits), 16, 2, alignedEol = false,
      twoDim = true).get.toSeq === px.toSeq)
    // round-trips: both alignment forms, K-discipline, larger images
    for (width <- Seq(1, 17, 200, 1728); height <- Seq(1, 5, 9); al <- Seq(false, true)) {
      var seed = width + height * 31 + (if (al) 7 else 0)
      val p2 = Array.tabulate[Byte](width * height) { _ =>
        seed = seed * 1103515245 + 12345; ((seed >>> 16) & 1).toByte
      }
      val enc = CcittG4.encodeG3(p2, width, height, al, twoDim = true)
      assert(CcittG4.decodeG3(enc, width, height, al, twoDim = true).get.toSeq === p2.toSeq,
        s"w=$width h=$height aligned=$al")
    }
    // a 2-D tag on the FIRST row rejects (no reference line exists)
    assert(CcittG4.decodeG3(toBytes(EOL + "0" + "011" + "1" + "1"), 16, 1,
      alignedEol = false, twoDim = true) === None)
  }

  private implicit class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
