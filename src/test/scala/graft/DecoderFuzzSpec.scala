package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input fuzz for every binary decoder: the documented contract is
  * "truncated/invalid → None", NEVER an exception — these run inside
  * executors over arbitrary user files, where an escaped
  * ArrayIndexOutOfBounds fails the whole query. Three attack families per
  * decoder: every truncation prefix of a valid file (the classic decoder
  * fuzz), random byte arrays, and single-byte mutations of valid files at
  * seeded random offsets. The assertions only require Option-ness — any
  * throw fails the test with the offending input identified.
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "decodeBmpHeader" -> Multimodal.decodeBmpHeader _,
    "decodePngHeader" -> Multimodal.decodePngHeader _,
    "decodeGifHeader" -> Multimodal.decodeGifHeader _,
    "decodeJpegHeader" -> Multimodal.decodeJpegHeader _,
    "decodeMp4Header" -> Multimodal.decodeMp4Header _,
    "decodeWavHeader" -> Multimodal.decodeWavHeader _,
    "bmpChannelSums" -> Multimodal.bmpChannelSums _,
    "pngChannelSums" -> Multimodal.pngChannelSums _,
    "gifChannelSums" -> Multimodal.gifChannelSums _,
    "wavSampleStats" -> Multimodal.wavSampleStats _,
    "jpegPixelStats" -> Multimodal.jpegPixelStats _,
    "jpegGraySums" -> Multimodal.jpegGraySums _,
    "imageAHash64" -> Multimodal.imageAHash64 _,
    "audioEnvelopeHash64" -> Multimodal.audioEnvelopeHash64 _,
    // r15: the lossy-WebP pipeline (container routing + VP8 + ALPH)
    "webpDecode" -> graft.operators.WebpL.decode _,
    "vp8DecodeYuv" -> graft.operators.Vp8.decodeYuv _,
    // r16: ICO/CUR directory walk + HEIF-family container walk
    "icoEntries" -> graft.operators.Ico.entries _,
    "heifInfo" -> graft.operators.Heif.info _,
    // r18: full pixel decode of both HEIF payload codecs + raw HEVC
    "heifDecode" -> graft.operators.Heif.decode _,
    "hevcDecode" -> graft.operators.hevc.HevcDecoder.decode _)

  /** Committed reference-encoded members for the valid set (r15). */
  private def lossyWebp(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream("/golden/vp8_streams.json")
    val fx = new String(in.readAllBytes(), "UTF-8")
    in.close()
    val i = fx.indexOf("\"" + name + "\"")
    require(i >= 0, name)
    val j = fx.indexOf("\"webp\"", i)
    val k = fx.indexOf('"', fx.indexOf(':', j) + 1)
    fx.substring(k + 1, fx.indexOf('"', k + 1))
      .grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  private val valids: Seq[(String, Array[Byte])] = Seq(
    "bmp" -> Multimodal.makeBmp(9, 7, seed = 1L),
    "png" -> Multimodal.makePngPixels(6, 5, seed = 2L),
    "gif" -> Multimodal.makeGifPixels(8, 6, seed = 3L),
    "gifint" -> Multimodal.makeGifPixels(8, 9, seed = 3L, interlaced = true),
    "giflct" -> Multimodal.makeGifPixels(8, 8, seed = 3L, localPalette = true),
    "wav" -> Multimodal.makeWav(2, 16000, 64, seed = 4L),
    "mp4" -> Multimodal.makeMp4(minorVersion = 0L, timescale = 1000,
      duration = 5000, mediaBytes = 64, seed = 5L),
    "jpg" -> Multimodal.makeJpeg(64, 48, nComp = 3, seed = 6L),
    // pixel-bearing JPEG layouts: gray, 4:4:4 color, 4:2:0, 4:1:1,
    // restart markers
    "jpgpx" -> Multimodal.makeJpegPixels(4, 3, q0 = 2, seed = 7L),
    "jpgcolor" -> Multimodal.makeJpegColorPixels(3, 2, q0 = 2, seed = 8L),
    "jpg420" -> Multimodal.makeJpeg420Pixels(2, 2, q0 = 2, seed = 9L),
    "jpg411" -> Multimodal.makeJpeg411Pixels(2, 2, q0 = 2, seed = 12L),
    "jpgrst" -> Multimodal.makeJpegRestartPixels(4, 2, q0 = 2, dri = 3, seed = 10L),
    "jpgprog" -> Multimodal.makeJpegProgressivePixels(4, 2, q0 = 2, seed = 11L),
    "jpgll" -> Multimodal.makeJpegLossless(20, seed = 13L),
    "webpvp8" -> lossyWebp("checker_16x16_q50"),
    "webpalpha" -> lossyWebp("alpha_checker_q30"),
    // r16: ICO with mixed PNG+DIB payloads, CUR with hotspots
    "ico" -> graft.operators.Ico.makeIco(Seq(
      graft.operators.Ico.PayloadSpec("png", 6, 5),
      graft.operators.Ico.PayloadSpec("dib", 8, 8)), seed = 14L),
    "cur" -> graft.operators.Ico.makeIco(Seq(
      graft.operators.Ico.PayloadSpec("dib", 4, 4)), seed = 15L, cursor = true),
    // r16: reference-encoded HEIF-family members (smallest of each codec)
    "avif" -> graft.queries.Curation.avifHeifMembers()
      .find(_._1 == "a420_7x5.avif").get._2,
    "heic" -> graft.queries.Curation.avifHeifMembers()
      .find(_._1 == "h420_31x17.heic").get._2,
    // r18: a raw annex-B HEVC elementary stream (from the committed
    // goldens — WPP member, exercises the substream plumbing)
    "hevcraw" -> {
      val in = getClass.getResourceAsStream("/graft/hevc_goldens.jsonl")
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      in.close()
      val ln = lines.find(_.contains("\"name\": \"wpp\"")).get
      val h = "\"hex\":\\s*\"([0-9a-f]+)\"".r.findFirstMatchIn(ln).get.group(1)
      h.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray
    })

  private def mustNotThrow(what: String, bytes: Array[Byte],
      name: String, f: Array[Byte] => Any): Unit =
    try { f(bytes); () }
    catch { case e: Exception =>
      fail(s"$name threw ${e.getClass.getSimpleName} on $what (len ${bytes.length}): ${e.getMessage}")
    }

  test("every truncation prefix of every valid fixture decodes to an Option, never throws") {
    for {
      (vn, v) <- valids
      len <- 0 to v.length
      (dn, d) <- decoders
    } mustNotThrow(s"$vn truncated to $len", v.take(len), dn, d)
  }

  test("random byte arrays never throw") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 300).foreach { i =>
      val bytes = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(bytes)
      decoders.foreach { case (dn, d) =>
        mustNotThrow(s"random #$i", bytes, dn, d)
      }
    }
  }

  test("single-byte mutations of valid files never throw") {
    val rnd = new scala.util.Random(77L)
    for {
      (vn, v) <- valids
      _ <- 1 to 150
    } {
      val m = v.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      decoders.foreach { case (dn, d) =>
        mustNotThrow(s"mutated $vn", m, dn, d)
      }
    }
  }

  test("chunk declarations at the file tail never read past the end") {
    // a chunk/box HEADER that fits while its declared FIELDS don't — the
    // exact shape the prefix-truncation family can miss when a decoder
    // has a minimum-length floor (WAV's 44) larger than the header
    val wavTail = {
      // RIFF/WAVE + 20-byte junk chunk + "fmt " declaring sz=16 but only
      // 2 payload bytes before EOF (total 50 >= the 44-byte floor)
      val out = java.nio.ByteBuffer.allocate(50)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(42).put("WAVE".getBytes("US-ASCII"))
      out.put("junk".getBytes("US-ASCII")).putInt(20).put(new Array[Byte](20))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1.toShort)
      out.array()
    }
    val mp4Tail = {
      // valid ftyp + a moov declaring an mvhd whose fields run past EOF
      val out = java.nio.ByteBuffer.allocate(16 + 8 + 12)
      out.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("mp41".getBytes("US-ASCII")).putInt(0)
      out.putInt(8 + 12).put("moov".getBytes("US-ASCII"))
      out.putInt(40).put("mvhd".getBytes("US-ASCII")).putInt(0) // sz 40, 4 bytes present
      out.array()
    }
    decoders.foreach { case (dn, d) =>
      mustNotThrow("wav tail-fmt", wavTail, dn, d)
      mustNotThrow("mp4 tail-mvhd", mp4Tail, dn, d)
    }
  }

  test("multi-byte (length/size field) mutations of valid files never throw") {
    // size/offset fields are where hostile values bite: splat extreme
    // values over 4-byte windows across the whole header region
    val rnd = new scala.util.Random(99L)
    val splats = Seq(
      Array(0xff, 0xff, 0xff, 0xff), Array(0x00, 0x00, 0x00, 0x80),
      Array(0xff, 0xff, 0xff, 0x7f), Array(0x01, 0x00, 0x00, 0x00))
      .map(_.map(_.toByte))
    for {
      (vn, v) <- valids
      _ <- 1 to 100
    } {
      val m = v.clone()
      val off = rnd.nextInt(math.max(1, m.length - 4))
      val s = splats(rnd.nextInt(splats.length))
      System.arraycopy(s, 0, m, off, math.min(4, m.length - off))
      decoders.foreach { case (dn, d) =>
        mustNotThrow(s"splatted $vn@$off", m, dn, d)
      }
    }
  }
}
