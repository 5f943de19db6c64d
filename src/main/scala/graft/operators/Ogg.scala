package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ogg container walk with Opus/Vorbis identification — the container
  * modern voice corpora ship (`.opus` is the dominant speech-drop
  * format; YouTube-derived audio and Wikimedia audio are Ogg).
  * Full psychoacoustic decode is out of scope BY DESIGN (the MP3
  * precedent); the corpus-pipeline facts are the container's:
  * duration from granule arithmetic, channels, sample rate, packet
  * and page counts.
  *
  * From-scratch implementation of the public specs (RFC 3533 Ogg,
  * RFC 7845 Opus-in-Ogg, Vorbis I):
  *  - page framing: capture pattern, version 0, header-type flags,
  *    64-bit granule positions, stream serial, page sequence, segment
  *    lacing table;
  *  - the page CRC is VERIFIED on every page (the Ogg polynomial
  *    0x04c11db7, unreflected, zero init/xorout, CRC field zeroed);
  *  - packet reassembly honors the lacing rule exactly — a 255 value
  *    continues, <255 terminates — including packets SPANNING pages
  *    via the continued-packet flag (the fixture plants one);
  *  - strictness: BOS exactly on the first page, EOS exactly on the
  *    last, page sequence numbers consecutive, single-stream files
  *    only (multiplexed serials reject loudly), a continued flag
  *    without a pending packet (or a pending packet without the flag)
  *    rejects, trailing bytes reject, per-file byte/packet bomb caps;
  *  - codec identification from the first packet: OpusHead (version
  *    1, channel count, pre-skip, input sample rate) or the Vorbis I
  *    ident header (version 0, channels, rate, the framing bit) —
  *    anything else rejects rather than guessing;
  *  - duration: Opus granules run on the 48 kHz clock minus pre-skip
  *    (RFC 7845 §4); Vorbis granules are sample counts at the
  *    declared rate.
  *
  * Shape at 100 TB: a recording is the natural split unit — per-file
  * parallelism, scan-local walk, zero shuffle.
  */
object Ogg {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // the Ogg CRC: 0x04c11db7, not reflected, init 0, xorout 0
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c; i += 1
    }
    t
  }
  private def crc(b: Array[Byte], off: Int, len: Int, zeroFrom: Int,
      zeroLen: Int): Int = {
    var c = 0
    var i = off
    while (i < off + len) {
      val x = if (i >= zeroFrom && i < zeroFrom + zeroLen) 0 else b(i) & 0xff
      c = (c << 8) ^ crcTable(((c >>> 24) ^ x) & 0xff)
      i += 1
    }
    c
  }

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def leU64(b: Array[Byte], o: Int): Long =
    leU32(b, o) | (leU32(b, o + 4) << 32)

  final case class OggInfo(codec: String, channels: Int, sampleRate: Int,
      preSkip: Int, lastGranule: Long, nPages: Int, nPackets: Int,
      durationMs: Double)

  /** Strict whole-file walk; None on ANY container violation. */
  def info(b: Array[Byte]): Option[OggInfo] = {
    try {
      if (b == null || b.length < 28) throw Malformed
      var p = 0
      var serial = -1L
      var expectSeq = 0L
      var nPages = 0
      var lastGranule = -1L
      var sawEos = false
      val packets = Vector.newBuilder[Array[Byte]]
      var nPackets = 0
      var pending: java.io.ByteArrayOutputStream = null
      var totalBytes = 0L
      while (p < b.length) {
        if (sawEos) throw Malformed // pages after EOS
        if (p + 27 > b.length) throw Malformed
        if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' || b(p + 3) != 'S')
          throw Malformed
        if (b(p + 4) != 0) throw Malformed // version
        val flags = b(p + 5) & 0xff
        val granule = leU64(b, p + 6)
        val pageSerial = leU32(b, p + 14)
        val seq = leU32(b, p + 18)
        val pageCrc = leU32(b, p + 22).toInt
        val nSegs = b(p + 26) & 0xff
        if (p + 27 + nSegs > b.length) throw Malformed
        var bodyLen = 0
        var s = 0
        while (s < nSegs) { bodyLen += b(p + 27 + s) & 0xff; s += 1 }
        val pageLen = 27 + nSegs + bodyLen
        if (p + pageLen > b.length) throw Malformed
        if (crc(b, p, pageLen, p + 22, 4) != pageCrc) throw Malformed
        // stream discipline
        if (nPages == 0) {
          if ((flags & 0x02) == 0) throw Malformed // first page must be BOS
          serial = pageSerial
          expectSeq = seq
        } else {
          if ((flags & 0x02) != 0) throw Malformed // second BOS = multiplex
          if (pageSerial != serial) throw Malformed // foreign stream
        }
        if (seq != expectSeq) throw Malformed // page loss is data loss
        expectSeq += 1
        if ((flags & 0x04) != 0) sawEos = true
        // continued-packet discipline
        if ((flags & 0x01) != 0) { if (pending == null) throw Malformed }
        else if (pending != null && nPages > 0) throw Malformed
        // packet reassembly via lacing values
        var off = p + 27 + nSegs
        s = 0
        while (s < nSegs) {
          val lace = b(p + 27 + s) & 0xff
          if (pending == null) pending = new java.io.ByteArrayOutputStream()
          pending.write(b, off, lace)
          totalBytes += lace
          if (totalBytes > (256L << 20)) throw Malformed // bomb cap
          off += lace
          if (lace < 255) {
            packets += pending.toByteArray
            nPackets += 1
            if (nPackets > (1 << 20)) throw Malformed
            pending = null
          }
          s += 1
        }
        if (granule != -1L) {
          if (granule < lastGranule) throw Malformed // granules regress
          lastGranule = granule
        }
        nPages += 1
        p += pageLen
      }
      if (nPages == 0 || !sawEos) throw Malformed
      if (pending != null) throw Malformed // packet never terminated
      val ps = packets.result()
      if (ps.isEmpty) throw Malformed
      val first = ps.head
      // codec identification — reject, don't guess
      if (first.length >= 19 && new String(first, 0, 8, "ISO-8859-1") == "OpusHead") {
        if ((first(8) & 0xff) != 1) throw Malformed // version
        val channels = first(9) & 0xff
        val preSkip = leU16(first, 10)
        val inputRate = leU32(first, 12).toInt
        if (channels < 1) throw Malformed
        if (ps.length < 2 ||
          new String(ps(1), 0, math.min(8, ps(1).length), "ISO-8859-1") != "OpusTags")
          throw Malformed // RFC 7845 mandates the comment header
        val samples = lastGranule - preSkip
        if (samples < 0) throw Malformed
        Some(OggInfo("opus", channels, inputRate, preSkip, lastGranule,
          nPages, ps.length, samples * 1000.0 / 48000.0))
      } else if (first.length >= 30 && first(0) == 1 &&
        new String(first, 1, 6, "ISO-8859-1") == "vorbis") {
        if (leU32(first, 7) != 0) throw Malformed // vorbis version
        val channels = first(11) & 0xff
        val rate = leU32(first, 12).toInt
        if (channels < 1 || rate <= 0) throw Malformed
        if ((first(29) & 0x01) != 1) throw Malformed // framing bit
        Some(OggInfo("vorbis", channels, rate, 0, lastGranule,
          nPages, ps.length, lastGranule * 1000.0 / rate))
      } else throw Malformed
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------- Spark surface ----------------

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("codec", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_pages", IntegerType),
    StructField("n_packets", IntegerType),
    StructField("duration_ms", DoubleType)))

  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { it =>
      it.flatMap { r =>
        val fname = r.getString(0)
        info(r.getAs[Array[Byte]](1)) match {
          case Some(m) =>
            Iterator.single(Row(fname, m.codec, m.channels, m.sampleRate,
              m.nPages, m.nPackets,
              BigDecimal(m.durationMs)
                .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble))
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  // ---------------- writer (fixture reverse direction) ----------------

  /** One Ogg page over pre-laced segments. */
  private def makePage(flags: Int, granule: Long, serial: Long, seq: Long,
      laces: Seq[Int], body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](27 + laces.length + body.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(4) = 0
    out(5) = flags.toByte
    var i = 0
    while (i < 8) { out(6 + i) = ((granule >>> (8 * i)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < 4) {
      out(14 + i) = ((serial >>> (8 * i)) & 0xff).toByte
      out(18 + i) = ((seq >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out(26) = laces.length.toByte
    laces.zipWithIndex.foreach { case (l, k) => out(27 + k) = l.toByte }
    System.arraycopy(body, 0, out, 27 + laces.length, body.length)
    val c = crc(out, 0, out.length, 22, 4)
    i = 0
    while (i < 4) { out(22 + i) = ((c >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  /** Lace one whole packet (255-runs + terminator). */
  private def lacesOf(len: Int): Seq[Int] =
    Seq.fill(len / 255)(255) :+ (len % 255)

  def makeOpusHead(channels: Int, preSkip: Int, inputRate: Int): Array[Byte] = {
    val out = new Array[Byte](19)
    "OpusHead".getBytes("ISO-8859-1").copyToArray(out)
    out(8) = 1
    out(9) = channels.toByte
    out(10) = (preSkip & 0xff).toByte; out(11) = ((preSkip >>> 8) & 0xff).toByte
    var i = 0
    while (i < 4) { out(12 + i) = ((inputRate >>> (8 * i)) & 0xff).toByte; i += 1 }
    // output gain 0, mapping family 0
    out
  }

  def makeVorbisIdent(channels: Int, rate: Int): Array[Byte] = {
    val out = new Array[Byte](30)
    out(0) = 1
    "vorbis".getBytes("ISO-8859-1").copyToArray(out, 1)
    out(11) = channels.toByte
    var i = 0
    while (i < 4) { out(12 + i) = ((rate >>> (8 * i)) & 0xff).toByte; i += 1 }
    out(28) = (6 | (8 << 4)).toByte // blocksizes 2^6 / 2^8
    out(29) = 1 // framing bit
    out
  }

  /** A complete single-stream file: ident packet on the BOS page, a
    * comment packet, then `audio` packets — one per page, except one
    * LARGE packet deliberately split ACROSS two pages mid-stream (the
    * continued-packet path), and the last page flagged EOS. Granules
    * advance by `granulePerPacket` on every page that ENDS a packet.
    */
  def makeFile(ident: Array[Byte], comment: Array[Byte],
      audio: Seq[Array[Byte]], serial: Long, granulePerPacket: Long,
      preSkip: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var seq = 0L
    out.write(makePage(0x02, 0, serial, seq, lacesOf(ident.length), ident))
    seq += 1
    out.write(makePage(0, -1L, serial, seq, lacesOf(comment.length), comment))
    seq += 1
    var granule = preSkip
    audio.zipWithIndex.foreach { case (pkt, i) =>
      granule += granulePerPacket
      val eos = if (i == audio.length - 1) 0x04 else 0
      if (pkt.length > 300 && i == audio.length / 2) {
        // split mid-packet: first page carries a 255-run prefix (packet
        // unterminated, granule -1), the continuation page ends it
        val cut = 255 * (pkt.length / 510).max(1)
        val head = java.util.Arrays.copyOfRange(pkt, 0, cut)
        val tail = java.util.Arrays.copyOfRange(pkt, cut, pkt.length)
        out.write(makePage(0, -1L, serial, seq, Seq.fill(cut / 255)(255), head))
        seq += 1
        out.write(makePage(0x01 | eos, granule, serial, seq,
          lacesOf(tail.length), tail))
        seq += 1
      } else {
        out.write(makePage(eos, granule, serial, seq,
          lacesOf(pkt.length), pkt))
        seq += 1
      }
    }
    out.toByteArray
  }
}
