package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flac

class FlacSpec extends AnyFunSuite {

  /** Deterministic PCM: bounded so FIXED-order-2 residuals on the
    * 17-bit side channel stay inside the encoder's 18-bit escape raw.
    */
  private def pcm(channels: Int, n: Int, seed: Long): Array[Array[Int]] =
    Array.tabulate(channels)(ch =>
      Array.tabulate(n)(i => ((seed * 31 + ch * 17 + i.toLong * 7) % 2001).toInt - 1000))

  test("stereo round-trip across all four channel assignments and every subframe rotation") {
    // 1300 samples = 6 blocks of 256 (last short) → the per-frame
    // rotation covers independent/LS/RS/MS, VERBATIM/FIXED1/FIXED2,
    // 4-bit and 5-bit Rice methods, partition order 1, escape-to-raw
    val in = pcm(2, 1300, 12345L)
    val enc = Flac.encode(in, 16000, 16)
    val out = Flac.decode(enc).get
    assert(out.sampleRate === 16000)
    assert(out.channels === 2)
    assert(out.bps === 16)
    assert(out.nSamples === 1300L)
    assert(out.pcm(0).toSeq === in(0).toSeq)
    assert(out.pcm(1).toSeq === in(1).toSeq)
  }

  test("mono round-trip, including a CONSTANT subframe block") {
    val base = pcm(1, 700, 99L)
    // make one whole 256-block constant → CONSTANT subframe path
    java.util.Arrays.fill(base(0), 256, 512, -42)
    val out = Flac.decode(Flac.encode(base, 8000, 16)).get
    assert(out.channels === 1)
    assert(out.pcm(0).toSeq === base(0).toSeq)
  }

  test("wasted-bits subframes round-trip (samples sharing low zero bits)") {
    val in = pcm(2, 520, 7L)
    in.foreach(ch => (0 until ch.length).foreach(i => ch(i) = ch(i) << 3))
    val out = Flac.decode(Flac.encode(in, 44100, 16)).get
    assert(out.pcm(0).toSeq === in(0).toSeq)
    assert(out.pcm(1).toSeq === in(1).toSeq)
  }

  test("every CRC tier rejects corruption: header CRC-8, frame CRC-16, PCM MD5") {
    val enc = Flac.encode(pcm(2, 600, 3L), 16000, 16)
    assert(Flac.decode(enc).isDefined)
    // STREAMINFO is 4 (magic) + 4 (block hdr) + 34 bytes; frames start at 42.
    // Flip inside the first frame header (sync at 42; header bytes follow).
    def flip(i: Int): Array[Byte] = {
      val c = enc.clone(); c(i) = (c(i) ^ 0x10).toByte; c
    }
    assert(Flac.decode(flip(46)) === None)       // frame header byte → CRC-8
    assert(Flac.decode(flip(enc.length / 2)) === None) // mid-frame data → CRC-16
    // MD5 mismatch: flip a byte of the stored signature (bytes 26..41)
    assert(Flac.decode(flip(28)) === None)
  }

  test("truncation and trailing garbage reject") {
    val enc = Flac.encode(pcm(1, 300, 5L), 16000, 16)
    assert(Flac.decode(enc.dropRight(1)) === None)
    assert(Flac.decode(enc.take(42)) === None)   // metadata only, no frames
    assert(Flac.decode(enc ++ Array[Byte](0, 1, 2)) === None)
  }

  test("declared-total bomb rejects before allocation; sample-count mismatch rejects") {
    val enc = Flac.encode(pcm(1, 300, 5L), 16000, 16)
    // STREAMINFO total-samples is a 36-bit field ending at byte 25
    // (4 magic + 4 hdr + 13 bytes in, bits 4..39 of the info block's
    // bytes 13..17: bytes 21..25 of the file). Set it huge.
    val bomb = enc.clone()
    bomb(22) = 0xff.toByte; bomb(23) = 0xff.toByte; bomb(24) = 0xff.toByte
    val t0 = System.nanoTime()
    assert(Flac.decode(bomb) === None)
    assert(System.nanoTime() - t0 < 1e9)
    // off-by-one declared count (also breaks MD5, but the count check
    // fires first and must fire even for md5-less files)
    val off = enc.clone()
    off(25) = (off(25) ^ 0x01).toByte
    assert(Flac.decode(off) === None)
  }

  test("non-fLaC magic, truncated STREAMINFO, and duplicate STREAMINFO reject") {
    val enc = Flac.encode(pcm(1, 300, 5L), 16000, 16)
    val badMagic = enc.clone(); badMagic(0) = 'g'.toByte
    assert(Flac.decode(badMagic) === None)
    assert(Flac.decode(enc.take(20)) === None)
    assert(Flac.decode(Array[Byte]()) === None)
    assert(Flac.decode(null) === None)
  }

  test("a padding metadata block between STREAMINFO and frames is walked over") {
    val enc = Flac.encode(pcm(1, 300, 11L), 16000, 16)
    // un-set the last-block flag on STREAMINFO, splice a PADDING block
    val out = new java.io.ByteArrayOutputStream()
    out.write(enc, 0, 4)
    out.write(enc(4) & 0x7f) // STREAMINFO, no longer last
    out.write(enc, 5, 37)    // rest of streaminfo hdr + 34 bytes
    out.write(0x81)          // last block, type 1 = PADDING
    out.write(0); out.write(0); out.write(4)
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(enc, 42, enc.length - 42)
    val spliced = out.toByteArray
    val got = Flac.decode(spliced).get
    assert(got.pcm(0).toSeq === Flac.decode(enc).get.pcm(0).toSeq)
  }
}
