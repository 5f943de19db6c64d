package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mp3

class Mp3Spec extends AnyFunSuite {

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  test("MPEG-1 Layer III CBR: frame count, samples, duration arithmetic exact") {
    // 44100 Hz, 128 kbps: frame = 144*128000/44100 = 417 (+pad)
    val frames = (0 until 10).map(i =>
      Mp3.makeFrame(3, 3, brIdx = 9, srIdx = 0, padding = i % 3 == 0,
        mono = false, seed = i))
    assert(frames(1).length === 417)
    assert(frames(0).length === 418) // padded
    val m = Mp3.info(cat(frames: _*)).get
    assert(m.nFrames === 10)
    assert(m.totalSamples === 11520L)
    assert(m.sampleRate === 44100)
    assert(m.channels === 2)
    assert(!m.vbr)
    assert(m.meanBitrateKbps === 128.0)
  }

  test("all three versions and layers walk with their own tables (incl. Layer I slot rule)") {
    // MPEG1 L1 at 32 kbps/32kHz: (12*32000/32000 + 0)*4 = 48 bytes, 384 samples
    val l1 = Mp3.makeFrame(3, 1, brIdx = 1, srIdx = 2, padding = false,
      mono = true, seed = 1)
    assert(l1.length === 48)
    assert(Mp3.info(cat(l1, l1)).get.totalSamples === 768L)
    // MPEG2 L3: 576 samples/frame, its own bitrate table (idx 1 = 8 kbps)
    val m2 = Mp3.makeFrame(2, 3, brIdx = 1, srIdx = 1, padding = false,
      mono = true, seed = 2) // 24000 Hz: 72*8000/24000 = 24 bytes
    assert(m2.length === 24)
    val i2 = Mp3.info(cat(m2, m2, m2)).get
    assert(i2.totalSamples === 1728L)
    assert(i2.sampleRate === 24000)
    // MPEG2.5 L2
    val m25 = Mp3.makeFrame(0, 2, brIdx = 4, srIdx = 2, padding = false,
      mono = false, seed = 3)
    assert(Mp3.info(m25).get.sampleRate === 8000)
  }

  test("VBR detection: rotating bitrate indexes flag vbr and mean is exact") {
    val frames = (0 until 6).map(i =>
      Mp3.makeFrame(3, 3, brIdx = 5 + (i % 3) * 2, srIdx = 1, padding = false,
        mono = false, seed = i)) // 64, 96, 128 kbps rotating
    val m = Mp3.info(cat(frames: _*)).get
    assert(m.vbr)
    assert(m.meanBitrateKbps === (64 + 96 + 128) * 2 / 6.0)
  }

  test("ID3v2 prefix (incl. footer flag) and ID3v1 tail skip exactly") {
    val f = Mp3.makeFrame(3, 3, brIdx = 9, srIdx = 0, padding = false,
      mono = false, seed = 9)
    val plain = Mp3.info(cat(f, f)).get
    assert(Mp3.info(cat(Mp3.makeId3v2(77), f, f, Mp3.makeId3v1())).get === plain)
    // footer flag: 10 extra bytes after the tag body
    val tag = Mp3.makeId3v2(40)
    tag(5) = 0x10
    val withFooter = cat(tag, new Array[Byte](10), f, f)
    assert(Mp3.info(withFooter).get === plain)
  }

  test("rejects: free bitrate, reserved indexes, stray bytes, truncation, mid-file rate change") {
    val f = Mp3.makeFrame(3, 3, brIdx = 9, srIdx = 0, padding = false,
      mono = false, seed = 4)
    assert(Mp3.info(cat(f, f).dropRight(1)) === None)      // truncated frame
    assert(Mp3.info(cat(f, Array[Byte](0), f)) === None)   // stray byte
    assert(Mp3.info(Array[Byte]()) === None)
    assert(Mp3.info(null) === None)
    // free-format bitrate (index 0)
    val free = f.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(Mp3.info(free) === None)
    // reserved sample-rate index (3)
    val badSr = f.clone(); badSr(2) = (badSr(2) | 0x0c).toByte
    assert(Mp3.info(badSr) === None)
    // reserved version (01)
    val badV = f.clone(); badV(1) = ((badV(1) & ~0x18) | 0x08).toByte
    assert(Mp3.info(badV) === None)
    // a sample-rate change mid-file is a splice, not VBR
    val other = Mp3.makeFrame(3, 3, brIdx = 9, srIdx = 1, padding = false,
      mono = false, seed = 5)
    assert(Mp3.info(cat(f, other)) === None)
    // ID3v2 with a non-syncsafe size byte
    val badTag = Mp3.makeId3v2(10)
    badTag(7) = 0x80.toByte
    assert(Mp3.info(cat(badTag, f)) === None)
  }
}
