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

  // ---------------- r13: Xing/Info VBR headers ----------------

  test("Xing header: stats cover the audio frames only; declared count and bytes enforced") {
    val audio = (0 until 8).map(i =>
      Mp3.makeFrame(3, 3, brIdx = 2 + i % 5, srIdx = 0, padding = false,
        mono = false, seed = i))
    val audioBytes = audio.map(_.length.toLong).sum
    val x = Mp3.makeXingFrame(3, 3, 9, 0, mono = false, magic = "Xing",
      declaredFrames = 8, audioBytes = audioBytes, withBytes = true,
      withToc = true, withQuality = true)
    val m = Mp3.info(cat((x +: audio): _*)).get
    assert(m.nFrames === 8) // NOT 9: the metadata frame is excluded
    assert(m.totalSamples === 8L * 1152)
    assert(m.vbr === true)
    // mean over the audio frames alone (brIdx 2..6 -> 40,48,56,64,80 kbps)
    val kbps = (0 until 8).map(i => Seq(40, 48, 56, 64, 80)(i % 5))
    assert(math.abs(m.meanBitrateKbps - kbps.sum.toDouble / 8) < 1e-9)
    // the byte arithmetic WOULD have counted 9 frames; pin the divergence
    assert(cat((x +: audio): _*).length === (x.length + audioBytes).toInt)
  }

  test("Xing magic forces vbr=true even when the audio bitrates are constant; Info forces false") {
    val audio = (0 until 5).map(i =>
      Mp3.makeFrame(3, 3, brIdx = 9, srIdx = 1, padding = false, mono = true, seed = i))
    val ab = audio.map(_.length.toLong).sum
    val x = Mp3.makeXingFrame(3, 3, 9, 1, mono = true, magic = "Xing",
      declaredFrames = 5, audioBytes = ab, withBytes = false, withToc = false)
    assert(Mp3.info(cat((x +: audio): _*)).get.vbr === true)
    val inf = Mp3.makeXingFrame(3, 3, 9, 1, mono = true, magic = "Info",
      declaredFrames = 5, audioBytes = ab, withBytes = true, withToc = false)
    val mi = Mp3.info(cat((inf +: audio): _*)).get
    assert(mi.vbr === false)
    assert(mi.nFrames === 5)
  }

  test("Xing header works behind an ID3v2 prefix and before an ID3v1 tail") {
    val audio = (0 until 6).map(i =>
      Mp3.makeFrame(3, 3, brIdx = 3 + i % 4, srIdx = 2, padding = i % 2 == 0,
        mono = false, seed = i))
    val ab = audio.map(_.length.toLong).sum
    val x = Mp3.makeXingFrame(3, 3, 9, 2, mono = false, magic = "Xing",
      declaredFrames = 6, audioBytes = ab, withBytes = true, withToc = true)
    val file = cat((Mp3.makeId3v2(64) +: x +: audio) :+ Mp3.makeId3v1(): _*)
    val m = Mp3.info(file).get
    assert(m.nFrames === 6)
    assert(m.totalSamples === 6L * 1152)
  }

  test("Xing rejects: lying byte size, Info over VBR audio (validated headers only)") {
    val audio = (0 until 4).map(i =>
      Mp3.makeFrame(3, 3, brIdx = 2 + i, srIdx = 0, padding = false,
        mono = false, seed = i))
    val ab = audio.map(_.length.toLong).sum
    // declared bytes off by one: the header validated (count matches the
    // walk) and then lies about the stream size — corrupt, reject
    val lieB = Mp3.makeXingFrame(3, 3, 9, 0, mono = false, magic = "Xing",
      declaredFrames = 4, audioBytes = ab + 1, withBytes = true, withToc = false)
    assert(Mp3.info(cat((lieB +: audio): _*)) === None)
    // Info magic over genuinely varying audio bitrates
    val infoVbr = Mp3.makeXingFrame(3, 3, 9, 0, mono = false, magic = "Info",
      declaredFrames = 4, audioBytes = ab, withBytes = false, withToc = false)
    assert(Mp3.info(cat((infoVbr +: audio): _*)) === None)
  }

  test("ADVICE r13: collision-shaped magic falls back to audio, never rejects the file") {
    val audio = (0 until 4).map(i =>
      Mp3.makeFrame(3, 3, brIdx = 2 + i, srIdx = 0, padding = false,
        mono = false, seed = i))
    val ab = audio.map(_.length.toLong).sum
    // declared 5, actual 4: the walk is ground truth — the "header" is
    // adjudicated payload collision; ALL 5 frames count as audio
    val lie = Mp3.makeXingFrame(3, 3, 9, 0, mono = false, magic = "Xing",
      declaredFrames = 5, audioBytes = ab, withBytes = false, withToc = false)
    val m = Mp3.info(cat((lie +: audio): _*)).get
    assert(m.nFrames === 5 && m.totalSamples === 5L * 1152)
    // undefined flag bits: not a Xing header — audio fallback, same rows
    val ok = Mp3.makeXingFrame(3, 3, 9, 0, mono = false, magic = "Xing",
      declaredFrames = 4, audioBytes = ab, withBytes = false, withToc = false)
    assert(Mp3.info(cat((ok +: audio): _*)).get.nFrames === 4) // premise
    val badFlags = ok.clone()
    badFlags(4 + 32 + 4 + 2) = 1 // sets bit 16 of the flags word
    val mf = Mp3.info(cat((badFlags.asInstanceOf[Array[Byte]] +: audio): _*)).get
    assert(mf.nFrames === 5)
    // a magic frame with zero audio frames after it: one audio frame
    val alone = Mp3.makeXingFrame(3, 3, 9, 0, mono = false, magic = "Xing",
      declaredFrames = 1, audioBytes = 0, withBytes = false, withToc = false)
    assert(Mp3.info(alone).get.nFrames === 1)
  }

  test("ADVICE r13: a spec-legal header WITHOUT the frames field is honored (count from the walk)") {
    val audio = (0 until 6).map(i =>
      Mp3.makeFrame(3, 3, brIdx = 2 + i % 3, srIdx = 0, padding = false,
        mono = false, seed = i))
    val ab = audio.map(_.length.toLong).sum
    val x = Mp3.makeXingFrame(3, 3, 9, 0, mono = false, magic = "Xing",
      declaredFrames = 0, audioBytes = ab, withBytes = true, withToc = true,
      withFrames = false)
    val m = Mp3.info(cat((x +: audio): _*)).get
    // the metadata frame is still excluded: the walk supplies the count
    assert(m.nFrames === 6 && m.totalSamples === 6L * 1152)
    assert(m.vbr === true) // Xing magic forces vbr
    // and the lying-bytes check stays live on the frameless form
    val lieB = Mp3.makeXingFrame(3, 3, 9, 0, mono = false, magic = "Xing",
      declaredFrames = 0, audioBytes = ab + 1, withBytes = true,
      withToc = false, withFrames = false)
    assert(Mp3.info(cat((lieB +: audio): _*)) === None)
  }
}
