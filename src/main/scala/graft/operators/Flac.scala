package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FLAC decode — the lossless codec audio corpora actually ship
  * (LibriSpeech, Common Voice exports, archival speech drops publish
  * FLAC, not WAV). The runtime carries no FLAC codec, so this is a
  * from-scratch implementation of the public format spec (xiph.org
  * FLAC format / RFC 9639) in the bzip2/JPEG/LZMA tradition: MSB-first
  * bitstream, STREAMINFO metadata walk, frame headers with UTF-8-coded
  * frame numbers and CRC-8, subframes (CONSTANT / VERBATIM / FIXED
  * orders 0–4 / LPC orders 1–32, wasted-bits), Rice-coded residual
  * partitions (both 4-bit and 5-bit parameter methods, escape-to-raw),
  * all four stereo decorrelation modes (independent, left/side,
  * right/side, mid/side), and the frame CRC-16.
  *
  * Self-validation is unusually strong in this format and ALL of it is
  * enforced (reject-don't-guess): every frame header's CRC-8 and every
  * frame's CRC-16 must verify, the decoded sample count must equal
  * STREAMINFO's declared total (when declared), and the MD5 of the
  * decoded interleaved PCM must equal STREAMINFO's signature (when
  * present) — a single wrong sample anywhere in the predictor/Rice
  * stack rejects the file rather than yielding silently-wrong audio.
  *
  * Envelope guards: ≤ 8 channels (the format maximum), ≤ 32 bps,
  * ≤ 2^22 total samples per file (bomb cap — a few-KB hostile file
  * must not declare gigasample buffers; the cap is checked BEFORE
  * allocation), metadata-block and frame reads bounds-checked
  * throughout, trailing garbage after the last frame rejects.
  *
  * The encoder is the fixture's reverse direction: real Rice coding
  * (with per-frame parameter choice, partition orders 0/1, an
  * escape-coded rotation), FIXED predictors, all four channel
  * assignments, wasted-bits subframes, and the true PCM MD5 — so the
  * decoder's acceptance of fixture output exercises every decode path
  * against construction arithmetic.
  *
  * Shape at 100 TB: a recording is the natural split unit — per-file
  * parallelism, scan-local decode, zero shuffle; downstream stats are
  * column algebra over the emitted per-channel PCM arrays.
  */
object Flac {

  private val MaxTotalSamples = 1 << 22
  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(),
    Array(1),
    Array(2, -1),
    Array(3, -3, 1),
    Array(4, -6, 4, -1))

  // ---------------- CRCs (FLAC's two polynomials) ----------------

  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      t(i) = c; i += 1
    }
    t
  }
  private def crc8(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0; var i = off
    while (i < off + len) { c = crc8Table((c ^ (b(i) & 0xff)) & 0xff); i += 1 }
    c
  }
  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      t(i) = c; i += 1
    }
    t
  }
  private def crc16(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0; var i = off
    while (i < off + len) { c = (((c << 8) & 0xffff) ^ crc16Table(((c >> 8) ^ (b(i) & 0xff)) & 0xff)); i += 1 }
    c
  }

  // ---------------- MSB-first bit I/O ----------------

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class BitReader(val b: Array[Byte], var pos: Int) {
    var bit: Int = 0 // 0..7, MSB first
    def byteAligned: Boolean = bit == 0
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def readBit(): Int = {
      if (pos >= b.length) throw Malformed
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def bits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def sbits(n: Int): Int = {
      val v = bits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt else v.toInt
    }
    def unary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (b.length.toLong * 8)) throw Malformed
      }
      q
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1).toInt); i -= 1 }
    }
    def align(): Unit = while (nb != 0) writeBit(0)
    def bytes: Array[Byte] = { require(nb == 0); out.toByteArray }
  }

  // ---------------- UTF-8-coded frame/sample numbers ----------------

  private def readUtf8Num(r: BitReader): Long = {
    val b0 = r.bits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var n = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) throw Malformed
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val c = r.bits(8).toInt
      if ((c & 0xc0) != 0x80) throw Malformed
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }
  private def writeUtf8Num(w: BitWriter, value: Long): Unit = {
    if (value < 0x80) { w.bits(value, 8); return }
    // n continuation bytes carry 6n bits; the lead byte carries 6-n
    var n = 1
    while (value >= (1L << (5 * n + 6))) n += 1
    val lead = ((0xfe << (6 - n)) & 0xff) | ((value >> (6 * n)) & ((1 << (6 - n)) - 1)).toInt
    w.bits(lead.toLong, 8)
    var i = n - 1
    while (i >= 0) { w.bits(0x80L | ((value >> (6 * i)) & 0x3f), 8); i -= 1 }
  }

  // ---------------- decode ----------------

  final case class FlacStream(sampleRate: Int, channels: Int, bps: Int,
      nSamples: Long, pcm: Array[Array[Int]])

  /** Strict whole-file decode; None on ANY spec violation. */
  def decode(bytes: Array[Byte]): Option[FlacStream] = {
    try { Some(decodeOrThrow(bytes)) }
    catch { case Malformed => None; case _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeOrThrow(bytes: Array[Byte]): FlacStream = {
    if (bytes == null || bytes.length < 42) throw Malformed
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
      throw Malformed
    var p = 4
    // metadata walk: first block MUST be STREAMINFO (34 bytes)
    var last = false
    var first = true
    var sampleRate = 0; var channels = 0; var bps = 0
    var totalDeclared = 0L
    var md5 = new Array[Byte](16)
    var minBlock = 0; var maxBlock = 0
    while (!last) {
      if (p + 4 > bytes.length) throw Malformed
      val hdr = bytes(p) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val blen = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      p += 4
      if (p + blen > bytes.length) throw Malformed
      if (first) {
        if (btype != 0 || blen != 34) throw Malformed
        val r = new BitReader(bytes, p)
        minBlock = r.bits(16).toInt
        maxBlock = r.bits(16).toInt
        r.bits(24); r.bits(24) // min/max frame size (0 = unknown)
        sampleRate = r.bits(20).toInt
        channels = r.bits(3).toInt + 1
        bps = r.bits(5).toInt + 1
        totalDeclared = r.bits(36)
        md5 = java.util.Arrays.copyOfRange(bytes, p + 18, p + 34)
        if (sampleRate == 0 || channels > 8 || bps > 32 || bps < 4) throw Malformed
        if (minBlock < 16 || maxBlock < minBlock) throw Malformed
        if (totalDeclared > MaxTotalSamples) throw Malformed
        first = false
      } else if (btype == 0 || btype == 127) throw Malformed // dup streaminfo / invalid
      p += blen
    }
    if (first) throw Malformed
    // frames — buffers GROW as real data decodes (the r11 decodeAlone
    // lesson: never allocate a declared size before bytes validate)
    val cap = if (totalDeclared > 0) totalDeclared.toInt else MaxTotalSamples
    var pcm = Array.fill(channels)(new Array[Int](math.min(cap, 1 << 14)))
    var total = 0
    while (p < bytes.length) {
      val (chBuf, n, next) = decodeFrame(bytes, p, sampleRate, channels, bps)
      if (total + n > cap) throw Malformed // bomb / over-declared guard
      if (total + n > pcm(0).length) {
        val grow = math.min(cap, math.max(pcm(0).length * 2, total + n))
        pcm = pcm.map(a => java.util.Arrays.copyOf(a, grow))
      }
      var c = 0
      while (c < channels) {
        System.arraycopy(chBuf(c), 0, pcm(c), total, n)
        c += 1
      }
      total += n
      p = next
    }
    if (totalDeclared > 0 && total != totalDeclared) throw Malformed
    // MD5 over interleaved little-endian PCM (when signature present)
    if (md5.exists(_ != 0)) {
      val width = (bps + 7) / 8
      val dig = java.security.MessageDigest.getInstance("MD5")
      val buf = new Array[Byte](channels * width)
      var i = 0
      while (i < total) {
        var ch = 0
        while (ch < channels) {
          val s = pcm(ch)(i)
          var k = 0
          while (k < width) { buf(ch * width + k) = ((s >> (8 * k)) & 0xff).toByte; k += 1 }
          ch += 1
        }
        dig.update(buf)
        i += 1
      }
      if (!java.util.Arrays.equals(dig.digest(), md5)) throw Malformed
    }
    val out = pcm.map(a => java.util.Arrays.copyOf(a, total))
    FlacStream(sampleRate, channels, bps, total.toLong, out)
  }

  /** One frame starting at byte `p`; returns (channelBufs, samples, nextPos). */
  private def decodeFrame(bytes: Array[Byte], p: Int, sampleRate: Int,
      channels: Int, bps: Int): (Array[Array[Int]], Int, Int) = {
    val r = new BitReader(bytes, p)
    if (r.bits(14) != 0x3ffe) throw Malformed // sync
    if (r.readBit() != 0) throw Malformed     // reserved
    r.readBit()                               // blocking strategy
    val bsCode = r.bits(4).toInt
    val srCode = r.bits(4).toInt
    val chAsgn = r.bits(4).toInt
    val ssCode = r.bits(3).toInt
    if (r.readBit() != 0) throw Malformed     // reserved
    readUtf8Num(r)                            // frame/sample number
    val blockSize = bsCode match {
      case 0 => throw Malformed
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.bits(8).toInt + 1
      case 7 => r.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match {
      case 0 => // from STREAMINFO
      case 12 => r.bits(8) // kHz
      case 13 | 14 => r.bits(16)
      case 15 => throw Malformed
      case _ => // table codes: fine
    }
    val frameBps = ssCode match {
      case 0 => bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw Malformed
    }
    if (frameBps != bps) throw Malformed // must agree with STREAMINFO
    val frameChannels = if (chAsgn < 8) chAsgn + 1 else 2
    if (chAsgn > 10) throw Malformed
    if (frameChannels != channels) throw Malformed
    // CRC-8 covers the header bytes up to (not including) the crc byte
    r.align()
    val hdrEnd = r.pos
    val crcHdr = r.bits(8).toInt
    if (crc8(bytes, p, hdrEnd - p) != crcHdr) throw Malformed
    // subframes
    val chBuf = Array.fill(channels)(new Array[Int](blockSize))
    var ch = 0
    while (ch < channels) {
      val sideBits = chAsgn match {
        case 8 => if (ch == 1) 1 else 0  // left/side
        case 9 => if (ch == 0) 1 else 0  // right/side
        case 10 => if (ch == 1) 1 else 0 // mid/side
        case _ => 0
      }
      decodeSubframe(r, blockSize, bps + sideBits, chBuf(ch))
      ch += 1
    }
    r.align()
    // frame CRC-16 covers everything from the sync up to the footer
    val frameEnd = r.pos
    val crcF = r.bits(16).toInt
    if (crc16(bytes, p, frameEnd - p) != crcF) throw Malformed
    // stereo decorrelation
    chAsgn match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) { chBuf(1)(i) = chBuf(0)(i) - chBuf(1)(i); i += 1 }
      case 9 => // right/side: left = right + side
        var i = 0
        while (i < blockSize) {
          val right = chBuf(1)(i); val side = chBuf(0)(i)
          chBuf(0)(i) = right + side
          i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chBuf(1)(i)
          val mid = (chBuf(0)(i) << 1) | (side & 1)
          chBuf(0)(i) = (mid + side) >> 1
          chBuf(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ =>
    }
    (chBuf, blockSize, r.pos)
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int,
      out: Array[Int]): Unit = {
    if (r.readBit() != 0) throw Malformed // zero pad bit
    val t = r.bits(6).toInt
    var wasted = 0
    if (r.readBit() == 1) { wasted = 1 + r.unary() }
    val effBps = bps - wasted
    if (effBps <= 0) throw Malformed
    t match {
      case 0 => // CONSTANT
        val v = r.sbits(effBps)
        java.util.Arrays.fill(out, 0, n, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { out(i) = r.sbits(effBps); i += 1 }
      case x if x >= 8 && x <= 12 => // FIXED order 0..4
        val order = x - 8
        if (order > n) throw Malformed
        var i = 0
        while (i < order) { out(i) = r.sbits(effBps); i += 1 }
        decodeResidual(r, n, order, out)
        restoreFixed(out, n, order)
      case x if x >= 32 => // LPC order 1..32
        val order = x - 31
        if (order > n) throw Malformed
        var i = 0
        while (i < order) { out(i) = r.sbits(effBps); i += 1 }
        val precM1 = r.bits(4).toInt
        if (precM1 == 15) throw Malformed
        val prec = precM1 + 1
        val shift = r.sbits(5)
        if (shift < 0) throw Malformed
        val coefs = new Array[Int](order)
        var k = 0
        while (k < order) { coefs(k) = r.sbits(prec); k += 1 }
        decodeResidual(r, n, order, out)
        var j = order
        while (j < n) {
          var acc = 0L
          var c = 0
          while (c < order) { acc += coefs(c).toLong * out(j - 1 - c); c += 1 }
          out(j) = out(j) + (acc >> shift).toInt
          j += 1
        }
      case _ => throw Malformed
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  private def restoreFixed(out: Array[Int], n: Int, order: Int): Unit = {
    val coefs = FixedCoefs(order)
    var i = order
    while (i < n) {
      var acc = 0L
      var c = 0
      while (c < order) { acc += coefs(c).toLong * out(i - 1 - c); c += 1 }
      out(i) = out(i) + acc.toInt
      i += 1
    }
  }

  /** Rice-partitioned residual into out(order until n). */
  private def decodeResidual(r: BitReader, n: Int, order: Int,
      out: Array[Int]): Unit = {
    val method = r.bits(2).toInt
    if (method > 1) throw Malformed
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.bits(4).toInt
    val parts = 1 << partOrder
    if ((n & (parts - 1)) != 0) throw Malformed // blockSize divisible
    val perPart = n >> partOrder
    if (perPart <= 0 || (partOrder == 0 && perPart < order)) throw Malformed
    var idx = order
    var part = 0
    while (part < parts) {
      val count = if (part == 0) perPart - order else perPart
      if (count < 0) throw Malformed
      val param = r.bits(paramBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt
        var i = 0
        while (i < count) {
          out(idx) = if (raw == 0) 0 else r.sbits(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val u = (q.toLong << param) | r.bits(param)
          out(idx) = (if ((u & 1) == 0) u >>> 1 else -((u >>> 1) + 1)).toInt
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }

  // ---------------- encode (fixture writer) ----------------

  /** Encode interleaved-by-channel PCM (pcm(ch)(i)) as a FLAC file.
    * Fixed 256-sample blocks (code 7 framing; the last block may be
    * short), per-frame channel-assignment rotation over all four
    * stereo modes (mono stays independent), per-(frame,channel)
    * subframe rotation over VERBATIM / FIXED(1) / FIXED(2) with real
    * Rice coding (partition order 1 every third frame, 5-bit-parameter
    * method every fourth, escape-to-raw every fifth), wasted-bits
    * emission when samples share low zero bits, and the true PCM MD5
    * in STREAMINFO.
    */
  def encode(pcm: Array[Array[Int]], sampleRate: Int, bps: Int): Array[Byte] = {
    val channels = pcm.length
    require(channels >= 1 && channels <= 2, "fixture encoder: mono/stereo")
    val n = pcm(0).length
    val blockSize = 256
    val width = (bps + 7) / 8
    val dig = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      var ch = 0
      while (ch < channels) {
        val s = pcm(ch)(i)
        var k = 0
        while (k < width) { dig.update(((s >> (8 * k)) & 0xff).toByte); k += 1 }
        ch += 1
      }
      i += 1
    }
    val md5 = dig.digest()
    val head = new BitWriter
    head.bits(0x664c6143L, 32) // fLaC
    head.bits(0x80L, 8)        // last block, STREAMINFO
    head.bits(34L, 24)
    head.bits(blockSize.toLong, 16) // min block
    head.bits(blockSize.toLong, 16) // max block (last short block is legal)
    head.bits(0L, 24); head.bits(0L, 24) // frame sizes unknown
    head.bits(sampleRate.toLong, 20)
    head.bits((channels - 1).toLong, 3)
    head.bits((bps - 1).toLong, 5)
    head.bits(n.toLong, 36)
    md5.foreach(b => head.bits((b & 0xff).toLong, 8))
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.bytes)
    var frame = 0
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      out.write(encodeFrame(pcm, off, bs, frame, channels, bps))
      off += bs
      frame += 1
    }
    out.toByteArray
  }

  private def encodeFrame(pcm: Array[Array[Int]], off: Int, bs: Int,
      frame: Int, channels: Int, bps: Int): Array[Byte] = {
    val chAsgn =
      if (channels == 1) 0
      else frame % 4 match {
        case 0 => 1  // independent stereo
        case 1 => 8  // left/side
        case 2 => 9  // right/side
        case _ => 10 // mid/side
      }
    // build the (possibly decorrelated) channel buffers
    val bufs = Array.fill(if (channels == 1) 1 else 2)(new Array[Int](bs))
    val sideBitsOf = new Array[Int](bufs.length)
    if (channels == 1) {
      System.arraycopy(pcm(0), off, bufs(0), 0, bs)
    } else chAsgn match {
      case 1 =>
        System.arraycopy(pcm(0), off, bufs(0), 0, bs)
        System.arraycopy(pcm(1), off, bufs(1), 0, bs)
      case 8 => // left + side
        var i = 0
        while (i < bs) {
          bufs(0)(i) = pcm(0)(off + i)
          bufs(1)(i) = pcm(0)(off + i) - pcm(1)(off + i)
          i += 1
        }
        sideBitsOf(1) = 1
      case 9 => // side + right
        var i = 0
        while (i < bs) {
          bufs(0)(i) = pcm(0)(off + i) - pcm(1)(off + i)
          bufs(1)(i) = pcm(1)(off + i)
          i += 1
        }
        sideBitsOf(0) = 1
      case 10 => // mid + side
        var i = 0
        while (i < bs) {
          val l = pcm(0)(off + i); val r = pcm(1)(off + i)
          bufs(0)(i) = (l + r) >> 1
          bufs(1)(i) = l - r
          i += 1
        }
        sideBitsOf(1) = 1
    }
    val w = new BitWriter
    w.bits(0x3ffeL, 14)
    w.bits(0L, 1) // reserved
    w.bits(0L, 1) // fixed-blocksize strategy
    w.bits(7L, 4) // 16-bit block size at end
    w.bits(0L, 4) // sample rate from STREAMINFO
    w.bits(chAsgn.toLong, 4)
    w.bits(4L, 3) // 16-bit sample size code (fixture is 16-bit)
    w.bits(0L, 1) // reserved
    writeUtf8Num(w, frame.toLong)
    w.bits((bs - 1).toLong, 16)
    w.align()
    val hdr = w.bytes
    val w2 = new BitWriter
    hdr.foreach(b => w2.bits((b & 0xff).toLong, 8))
    w2.bits(crc8(hdr, 0, hdr.length).toLong, 8)
    var ch = 0
    while (ch < bufs.length) {
      encodeSubframe(w2, bufs(ch), bs, bps + sideBitsOf(ch), frame + ch)
      ch += 1
    }
    w2.align()
    val body = w2.bytes
    val w3 = new BitWriter
    body.foreach(b => w3.bits((b & 0xff).toLong, 8))
    w3.bits(crc16(body, 0, body.length).toLong, 16)
    w3.bytes
  }

  private def encodeSubframe(w: BitWriter, samples: Array[Int], n: Int,
      bps: Int, rot: Int): Unit = {
    // wasted bits: emit when every sample shares low zero bits
    var wasted = 0
    if (samples.exists(_ != 0)) {
      var common = 32
      var i = 0
      while (i < n && common > 0) {
        if (samples(i) != 0)
          common = math.min(common, java.lang.Integer.numberOfTrailingZeros(samples(i)))
        i += 1
      }
      wasted = math.min(common, 4) // cap: keep fixture shapes modest
    }
    val eff = samples.map(_ >> wasted)
    val effBps = bps - wasted
    val allEqual = eff.forall(_ == eff(0))
    w.bits(0L, 1) // pad
    if (allEqual) {
      w.bits(0L, 6) // CONSTANT
      writeWasted(w, wasted)
      w.bits(eff(0).toLong & ((1L << effBps) - 1), effBps)
      return
    }
    rot % 3 match {
      case 0 =>
        w.bits(1L, 6) // VERBATIM
        writeWasted(w, wasted)
        var i = 0
        while (i < n) { w.bits(eff(i).toLong & ((1L << effBps) - 1), effBps); i += 1 }
      case k =>
        val order = k // FIXED order 1 or 2
        w.bits((8 + order).toLong, 6)
        writeWasted(w, wasted)
        var i = 0
        while (i < order) { w.bits(eff(i).toLong & ((1L << effBps) - 1), effBps); i += 1 }
        val res = new Array[Int](n - order)
        var j = order
        while (j < n) {
          res(j - order) =
            if (order == 1) eff(j) - eff(j - 1)
            else eff(j) - 2 * eff(j - 1) + eff(j - 2)
          j += 1
        }
        encodeResidual(w, res, n, order, rot)
    }
  }

  private def writeWasted(w: BitWriter, wasted: Int): Unit = {
    if (wasted == 0) w.bits(0L, 1)
    else {
      w.bits(1L, 1)
      var i = 0
      while (i < wasted - 1) { w.bits(0L, 1); i += 1 }
      w.bits(1L, 1) // unary terminator: wasted = 1 + zeros
    }
  }

  private def encodeResidual(w: BitWriter, res: Array[Int], n: Int,
      order: Int, rot: Int): Unit = {
    val method = if (rot % 4 == 3) 1 else 0
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = if (rot % 3 == 2 && (n & 1) == 0 && (n >> 1) > order) 1 else 0
    w.bits(method.toLong, 2)
    w.bits(partOrder.toLong, 4)
    val parts = 1 << partOrder
    val perPart = n >> partOrder
    var idx = 0
    var part = 0
    while (part < parts) {
      val count = if (part == 0) perPart - order else perPart
      if (rot % 5 == 4) {
        // escape-to-raw partition: 17 bits holds any 16-bit-domain residual
        w.bits(escape.toLong, paramBits)
        val raw = 18
        w.bits(raw.toLong, 5)
        var i = 0
        while (i < count) {
          w.bits(res(idx).toLong & ((1L << raw) - 1), raw)
          idx += 1; i += 1
        }
      } else {
        // pick the Rice parameter from the partition's mean magnitude
        var sum = 0L
        var i = 0
        while (i < count) { sum += math.abs(res(idx + i).toLong); i += 1 }
        var param = 0
        while (param < escape - 1 && (1L << param) < (2 * sum / math.max(1, count) + 1))
          param += 1
        w.bits(param.toLong, paramBits)
        i = 0
        while (i < count) {
          val e = res(idx); idx += 1
          val u = if (e >= 0) e.toLong << 1 else ((-e.toLong) << 1) - 1
          val q = (u >> param).toInt
          var z = 0
          while (z < q) { w.bits(0L, 1); z += 1 }
          w.bits(1L, 1)
          w.bits(u & ((1L << param) - 1), param)
          i += 1
        }
      }
      part += 1
    }
  }

  // ---------------- Spark surface ----------------

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bps", IntegerType),
    StructField("n_samples", LongType),
    StructField("pcm", ArrayType(ArrayType(IntegerType)))))

  /** binaryFile-shaped relation of `.flac` files → one row per file
    * with per-channel PCM arrays. A malformed file contributes zero
    * rows. Downstream stats are column algebra (aggregate/zip_with).
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        decode(r.getAs[Array[Byte]](1)) match {
          case Some(f) => Iterator.single(Row(fname, f.sampleRate, f.channels,
            f.bps, f.nSamples, f.pcm.toSeq.map(_.toSeq)))
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }
}
