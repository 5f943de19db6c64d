package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MP3 frame walk — the compressed format speech corpora actually
  * ship (Common Voice publishes MP3; podcast and radio archives are
  * MP3 end to end). Full audio decode (hybrid filterbank + Huffman)
  * is out of scope BY DESIGN; what a corpus pipeline needs first is
  * exact FRAMING: per-file duration, bitrate shape (CBR vs VBR),
  * sample rate and channel layout — the fields that drive
  * segmentation budgets and quality gates. This is the e12t
  * MP4-sample-table approach applied to MPEG audio: the walk is
  * byte-exact against the public header arithmetic (ISO 11172-3 /
  * 13818-3), not a heuristic scan.
  *
  * Handled framing, all from the spec tables:
  *  - MPEG-1, MPEG-2 and MPEG-2.5, Layers I/II/III — per-version
  *    bitrate tables, sample-rate tables, samples-per-frame, and the
  *    Layer-I ×4 slot rule;
  *  - ID3v2 prefix (syncsafe 28-bit size, footer flag honored) and
  *    ID3v1 128-byte tail skipped exactly;
  *  - the whole file must be EXACTLY tag + frames + tag — stray bytes
  *    between frames, a truncated final frame, free-format bitrate
  *    (index 0) and the reserved bitrate/samplerate/version/layer
  *    indexes all reject the file (reject-don't-guess: a "robust"
  *    resync scan silently miscounts duration on corrupt files);
  *  - Xing/Info VBR headers (r13): a Layer-III first frame carrying
  *    the "Xing" (VBR) or "Info" (CBR) magic at the canonical
  *    post-side-info offset is a METADATA frame, not audio — the
  *    emitted frame count / samples / duration / mean bitrate cover
  *    the audio frames only. Strict convention, enforced not guessed:
  *    the declared frame count MUST equal the walked audio frames
  *    (the Xing frame itself excluded), the optional bytes field MUST
  *    equal the frames-region length (Xing frame through stream end),
  *    undefined flag bits reject, an "Info" magic over audio frames
  *    whose bitrates vary is a contradiction and rejects, and the
  *    header must fit inside its frame.
  *
  * Per-file emission: frame count, exact total samples, duration,
  * sample rate, channel count, CBR/VBR verdict and mean bitrate.
  *
  * Shape at 100 TB: a recording is the natural split unit — per-file
  * parallelism, scan-local walk, zero shuffle.
  */
object Mp3 {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // bitrate tables, kbit/s; index 0 (free) and 15 (reserved) reject.
  // rows: MPEG1-L1, MPEG1-L2, MPEG1-L3, MPEG2/2.5-L1, MPEG2/2.5-L2/L3
  private val BitrateKbps: Array[Array[Int]] = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))

  private val SampleRates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  final case class FrameInfo(version: Int, layer: Int, bitrateKbps: Int,
      sampleRate: Int, channels: Int, samples: Int, bytes: Int)

  /** Parse the 4-byte header at `o`; Malformed on any reserved/free
    * field.
    */
  private def frameAt(b: Array[Byte], o: Int): FrameInfo = {
    if (o + 4 > b.length) throw Malformed
    val h = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if ((h >>> 21) != 0x7ff) throw Malformed // 11 sync bits
    val version = ((h >>> 19) & 3).toInt     // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    if (version == 1) throw Malformed
    val layerCode = ((h >>> 17) & 3).toInt   // 3=L1, 2=L2, 1=L3, 0=reserved
    if (layerCode == 0) throw Malformed
    val layer = 4 - layerCode                // 1, 2, 3
    val brIdx = ((h >>> 12) & 15).toInt
    if (brIdx == 0 || brIdx == 15) throw Malformed // free format / reserved
    val srIdx = ((h >>> 10) & 3).toInt
    if (srIdx == 3) throw Malformed
    val padding = ((h >>> 9) & 1).toInt
    val mode = ((h >>> 6) & 3).toInt
    val mpeg1 = version == 3
    val tableRow =
      if (mpeg1) layer - 1
      else if (layer == 1) 3
      else 4
    val bitrate = BitrateKbps(tableRow)(brIdx - 1) * 1000
    val sampleRate = SampleRates(version)(srIdx)
    val samples =
      if (layer == 1) 384
      else if (layer == 2) 1152
      else if (mpeg1) 1152
      else 576 // L3, MPEG2/2.5
    // frame length per spec: L1 counts 4-byte slots
    val len =
      if (layer == 1) (12 * bitrate / sampleRate + padding) * 4
      else samples / 8 * bitrate / sampleRate + padding
    if (len < 4) throw Malformed
    FrameInfo(version, layer, bitrate / 1000, sampleRate,
      if (mode == 3) 1 else 2, samples, len)
  }

  /** Frame byte length at `o`, or -1 when the 4 bytes there are not a
    * valid non-reserved frame header — the O(1) probe MIME sniffing
    * uses (a bare 11-bit sync alone false-positives on e.g. UTF-16LE
    * BOMs; real sniffers demand header-arithmetic consistency).
    */
  def frameLengthAt(b: Array[Byte], o: Int): Int =
    try frameAt(b, o).bytes catch {
      case Malformed => -1
      case _: ArrayIndexOutOfBoundsException => -1
    }

  final case class Mp3Info(nFrames: Int, totalSamples: Long, sampleRate: Int,
      channels: Int, vbr: Boolean, meanBitrateKbps: Double)

  /** Strict whole-file walk; None on any framing violation. */
  def info(b: Array[Byte]): Option[Mp3Info] = {
    try {
      if (b == null || b.length < 4) throw Malformed
      var p = 0
      // ID3v2 prefix: syncsafe size; footer flag adds 10
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        if ((b(3) & 0xff) == 0xff || (b(4) & 0xff) == 0xff) throw Malformed
        val flags = b(5) & 0xff
        var size = 0
        var i = 6
        while (i < 10) {
          val x = b(i) & 0xff
          if ((x & 0x80) != 0) throw Malformed // syncsafe bytes are 7-bit
          size = (size << 7) | x
          i += 1
        }
        p = 10 + size + (if ((flags & 0x10) != 0) 10 else 0)
        if (p >= b.length) throw Malformed
      }
      // ID3v1 tail
      var end = b.length
      if (end - p >= 128 && b(end - 128) == 'T' && b(end - 127) == 'A' &&
        b(end - 126) == 'G') end = end - 128
      val framesStart = p
      var nFrames = 0
      var totalSamples = 0L
      var sampleRate = -1
      var channels = -1
      var bitrateSumKbps = 0L
      var firstBitrate = -1
      var firstSamples = 0
      var vbr = false
      // Xing/Info header on the first frame: (isVbrMagic,
      // declaredFrames — None when flags bit 0 is clear, which the
      // Xing spec permits (ADVICE r13) — and declaredBytes or -1)
      var xing: Option[(Boolean, Option[Int], Long)] = None
      // observed-bitrate variation among AUDIO frames only (frames ≥ 1
      // when a Xing frame leads)
      var audioFirstBitrate = -1
      var audioVbr = false
      while (p < end) {
        val f = frameAt(b, p)
        if (p + f.bytes > end) throw Malformed // truncated final frame
        if (nFrames == 0) {
          sampleRate = f.sampleRate; channels = f.channels
          firstBitrate = f.bitrateKbps
          firstSamples = f.samples
          if (f.layer == 3) {
            // canonical offset: header(4) + CRC(2 when protection bit
            // is 0) + Layer-III side info (MPEG1: 17 mono / 32 stereo;
            // MPEG2/2.5: 9 / 17)
            val crc = if ((b(p + 1) & 1) == 0) 2 else 0
            val side =
              if (f.version == 3) { if (f.channels == 1) 17 else 32 }
              else { if (f.channels == 1) 9 else 17 }
            val off = p + 4 + crc + side
            if (off + 8 <= p + f.bytes) {
              val magic = new String(b, off, 4,
                java.nio.charset.StandardCharsets.ISO_8859_1)
              if (magic == "Xing" || magic == "Info") {
                def be32(o: Int): Long =
                  ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
                    ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
                // ADVICE r13: a magic string at the canonical offset can
                // (rarely) be real audio payload, and the spec permits a
                // header WITHOUT the frames field (flags bit 0 clear) —
                // a structurally invalid "header" therefore means "this
                // is an audio frame", never "reject the file"
                val flags = be32(off + 4)
                var valid = (flags & ~0xfL) == 0 // undefined bits: collision
                var q = off + 8
                var declaredOpt: Option[Int] = None
                if (valid && (flags & 1) != 0) {
                  val declared = be32(q); q += 4
                  if (declared < 1 || declared > (1 << 22)) valid = false
                  else declaredOpt = Some(declared.toInt)
                }
                var declaredBytes = -1L
                if (valid && (flags & 2) != 0) { declaredBytes = be32(q); q += 4 }
                if ((flags & 4) != 0) q += 100 // TOC
                if ((flags & 8) != 0) q += 4 // quality
                if (q > p + f.bytes) valid = false // header past its frame
                if (valid) xing = Some((magic == "Xing", declaredOpt, declaredBytes))
              }
            }
          }
        } else {
          // a sample-rate or channel change mid-file is a splice, not
          // a VBR stream — reject
          if (f.sampleRate != sampleRate || f.channels != channels)
            throw Malformed
          if (f.bitrateKbps != firstBitrate) vbr = true
          if (audioFirstBitrate < 0) audioFirstBitrate = f.bitrateKbps
          else if (f.bitrateKbps != audioFirstBitrate) audioVbr = true
        }
        nFrames += 1
        if (nFrames > (1 << 22)) throw Malformed // bomb cap
        totalSamples += f.samples
        bitrateSumKbps += f.bitrateKbps
        p += f.bytes
      }
      if (p != end) throw Malformed // exact consume
      if (nFrames == 0) throw Malformed
      xing match {
        case Some((isVbrMagic, declaredOpt, declaredBytes))
            if nFrames - 1 >= 1 && declaredOpt.forall(_ == nFrames - 1) =>
          // the header agrees with the walked ground truth (or omits
          // the count, which the spec allows — the walk supplies it)
          val audio = nFrames - 1
          if (declaredBytes >= 0 && declaredBytes != (end - framesStart))
            throw Malformed // lying stream size
          if (!isVbrMagic && audioVbr) throw Malformed // "Info" over VBR audio
          Some(Mp3Info(audio, totalSamples - firstSamples, sampleRate,
            channels, isVbrMagic,
            (bitrateSumKbps - firstBitrate).toDouble / audio))
        case _ =>
          // no header, OR the declared count disagrees with the walk /
          // no audio follows the magic — the walk is ground truth and
          // the "header" is adjudicated a payload collision (ADVICE
          // r13): count every frame as audio rather than reject
          Some(Mp3Info(nFrames, totalSamples, sampleRate, channels, vbr,
            bitrateSumKbps.toDouble / nFrames))
      }
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------- Spark surface ----------------

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("n_frames", IntegerType),
    StructField("total_samples", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("vbr", BooleanType),
    StructField("duration_ms", DoubleType),
    StructField("mean_kbps", DoubleType)))

  /** binaryFile-shaped relation of `.mp3` files → one framing row per
    * file; a malformed file contributes zero rows.
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { it =>
      it.flatMap { r =>
        val fname = r.getString(0)
        info(r.getAs[Array[Byte]](1)) match {
          case Some(m) =>
            def r6(d: Double): Double = BigDecimal(d)
              .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
            Iterator.single(Row(fname, m.nFrames, m.totalSamples,
              m.sampleRate, m.channels, m.vbr,
              r6(m.totalSamples * 1000.0 / m.sampleRate),
              r6(m.meanBitrateKbps)))
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  // ---------------- writer (fixture reverse direction) ----------------

  /** One synthetic frame: a spec-exact header plus deterministic
    * payload bytes to the computed frame length. `brIdx` indexes the
    * version/layer bitrate table (1–14).
    */
  def makeFrame(version: Int, layer: Int, brIdx: Int, srIdx: Int,
      padding: Boolean, mono: Boolean, seed: Int): Array[Byte] = {
    require(version == 3 || version == 2 || version == 0)
    require(layer >= 1 && layer <= 3 && brIdx >= 1 && brIdx <= 14 && srIdx <= 2)
    val layerCode = 4 - layer
    val h = (0x7ffL << 21) | (version.toLong << 19) | (layerCode.toLong << 17) |
      (1L << 16) | // protection: none (bit set = no CRC)
      (brIdx.toLong << 12) | (srIdx.toLong << 10) |
      ((if (padding) 1L else 0L) << 9) |
      ((if (mono) 3L else 1L) << 6)
    val hdr = Array[Byte](
      ((h >>> 24) & 0xff).toByte, ((h >>> 16) & 0xff).toByte,
      ((h >>> 8) & 0xff).toByte, (h & 0xff).toByte)
    val f = frameAt(hdr, 0) // reuse the real arithmetic
    val out = new Array[Byte](f.bytes)
    System.arraycopy(hdr, 0, out, 0, 4)
    var i = 4
    while (i < out.length) {
      // payload must never contain a sync-looking run (0xFF 0xE0+);
      // masking to 7 bits guarantees it
      out(i) = ((seed * 31 + i * 7) % 128).toByte
      i += 1
    }
    out
  }

  /** A Xing/Info metadata frame (the fixture reverse direction for the
    * r13 VBR-header handling): an ordinary spec-exact frame whose
    * payload carries `magic` + flags + the declared audio-frame count
    * at the canonical post-side-info offset, optionally the stream
    * byte size (this frame + `audioBytes`), a 100-byte TOC and a
    * quality field.
    */
  def makeXingFrame(version: Int, layer: Int, brIdx: Int, srIdx: Int,
      mono: Boolean, magic: String, declaredFrames: Int, audioBytes: Long,
      withBytes: Boolean, withToc: Boolean, withQuality: Boolean = false,
      seed: Int = 0, withFrames: Boolean = true): Array[Byte] = {
    require(magic == "Xing" || magic == "Info")
    val frame = makeFrame(version, layer, brIdx, srIdx,
      padding = false, mono = mono, seed = seed)
    val side =
      if (version == 3) { if (mono) 17 else 32 }
      else { if (mono) 9 else 17 }
    var q = 4 + side
    def be32(v: Long): Unit = {
      frame(q) = ((v >>> 24) & 0xff).toByte
      frame(q + 1) = ((v >>> 16) & 0xff).toByte
      frame(q + 2) = ((v >>> 8) & 0xff).toByte
      frame(q + 3) = (v & 0xff).toByte
      q += 4
    }
    val fieldsLen = 8 + (if (withFrames) 4 else 0) + (if (withBytes) 4 else 0) +
      (if (withToc) 100 else 0) + (if (withQuality) 4 else 0)
    require(q + fieldsLen <= frame.length, "frame too short for the header")
    magic.getBytes("US-ASCII").copyToArray(frame, q); q += 4
    be32((if (withFrames) 1L else 0L) | (if (withBytes) 2L else 0L) |
      (if (withToc) 4L else 0L) | (if (withQuality) 8L else 0L))
    if (withFrames) be32(declaredFrames.toLong)
    if (withBytes) be32(frame.length + audioBytes)
    if (withToc) { (0 until 100).foreach(i => frame(q + i) = (i * 255 / 99).toByte); q += 100 }
    if (withQuality) be32(50L)
    frame
  }

  def makeId3v2(size: Int): Array[Byte] = {
    require(size >= 0 && size < (1 << 28))
    val out = new Array[Byte](10 + size)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4; out(4) = 0; out(5) = 0
    out(6) = ((size >>> 21) & 0x7f).toByte
    out(7) = ((size >>> 14) & 0x7f).toByte
    out(8) = ((size >>> 7) & 0x7f).toByte
    out(9) = (size & 0x7f).toByte
    var i = 10
    while (i < out.length) { out(i) = (i % 96 + 32).toByte; i += 1 }
    out
  }

  def makeId3v1(): Array[Byte] = {
    val out = new Array[Byte](128)
    out(0) = 'T'; out(1) = 'A'; out(2) = 'G'
    out
  }
}
