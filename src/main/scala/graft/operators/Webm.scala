package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Matroska/WebM EBML walk — the web's video container (WebM is what
  * browser-sourced and YouTube-derived video corpora arrive in;
  * Matroska is the archive standard). Codec bitstream decode is out
  * of scope BY DESIGN (the MP4/MP3 precedent, honestly labeled); the
  * corpus-pipeline facts are the container's: document type, duration
  * from TimestampScale arithmetic, per-track codec/geometry/audio
  * shape, and cluster/block counts that size downstream frame-sample
  * budgets.
  *
  * From-scratch implementation of the public EBML + Matroska specs
  * (RFC 8794, the Matroska element registry):
  *  - EBML varints for IDs (marker kept) and sizes (marker stripped);
  *    reserved all-ones sizes ("unknown size", live-remux artifacts)
  *    reject loudly — a reader guessing where an unsized cluster ends
  *    invents data;
  *  - children must tile their master element EXACTLY (a child
  *    overrunning its parent rejects, trailing slack rejects);
  *  - unknown element IDs are SKIPPED — that is the spec's required
  *    forward-compatibility behavior, not leniency (the proto/Avro
  *    rule again);
  *  - Matroska CRC-32 elements, when present as a master's first
  *    child, are VERIFIED over the remainder of that master (the
  *    spec's coverage rule) — the fixture carries one on Info;
  *  - the EBML header must declare doctype matroska or webm; Segment →
  *    Info (TimestampScale default 1 000 000 ns, Duration float32/64),
  *    Tracks → TrackEntry (type, CodecID, Video PixelWidth/Height,
  *    Audio SamplingFrequency/Channels), Clusters counted with their
  *    SimpleBlocks;
  *  - depth caps, element-count caps, and size bounds before every
  *    allocation.
  *
  * Shape at 100 TB: a video file is the natural split unit — per-file
  * parallelism, scan-local walk, zero shuffle.
  */
object Webm {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class Rd(val b: Array[Byte], var p: Int, val end: Int) {
    def u8(): Int = { if (p >= end) throw Malformed; val v = b(p) & 0xff; p += 1; v }
    /** Element ID: 1–4 bytes, the length marker KEPT in the value. */
    def ebmlId(): Long = {
      val first = u8()
      val extra =
        if ((first & 0x80) != 0) 0
        else if ((first & 0x40) != 0) 1
        else if ((first & 0x20) != 0) 2
        else if ((first & 0x10) != 0) 3
        else throw Malformed
      var v = first.toLong
      var i = 0
      while (i < extra) { v = (v << 8) | u8(); i += 1 }
      v
    }
    /** Element size: 1–8 bytes, marker stripped; all-ones rejects. */
    def ebmlSize(): Long = {
      val first = u8()
      var len = 1
      var mask = 0x80
      while (len <= 8 && (first & mask) == 0) { len += 1; mask >>= 1 }
      if (len > 8) throw Malformed
      var v = (first & (mask - 1)).toLong
      var ones = (first & (mask - 1)) == mask - 1
      var i = 1
      while (i < len) {
        val x = u8()
        if (x != 0xff) ones = false
        v = (v << 8) | x
        i += 1
      }
      if (ones) throw Malformed // unknown size: reject, don't guess
      v
    }
    def uint(n: Int): Long = {
      if (n < 1 || n > 8) throw Malformed
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    def float(n: Int): Double = {
      if (n == 4) java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble
      else if (n == 8) java.lang.Double.longBitsToDouble(uint(8))
      else throw Malformed
    }
    def str(n: Int): String = {
      if (p + n > end) throw Malformed
      val s = new String(b, p, n, java.nio.charset.StandardCharsets.UTF_8)
      p += n
      s
    }
    def skip(n: Long): Unit = {
      if (n < 0 || p + n > end) throw Malformed
      p += n.toInt
    }
    def sub(n: Long): Rd = {
      if (n < 0 || p + n > end) throw Malformed
      val r = new Rd(b, p, p + (n.toInt)); p += n.toInt; r
    }
    def atEnd: Boolean = p == end
  }

  final case class Track(trackType: Int, codec: String,
      width: Int, height: Int, sampleRate: Double, channels: Int)

  final case class WebmInfo(docType: String, timestampScale: Long,
      durationTicks: Double, tracks: Vector[Track], nClusters: Int,
      nBlocks: Int) {
    def durationMs: Double = durationTicks * timestampScale / 1e6
  }

  /** Walk a master element's children; `handler` returns true when it
    * consumed the element, false to skip it (unknown → skipped, the
    * spec's required behavior). If the first child is CRC-32 (0xBF),
    * it is verified over the REST of the master.
    */
  private def children(r: Rd, depth: Int)(handler: (Long, Long, Rd) => Boolean): Unit = {
    if (depth > 16) throw Malformed
    var first = true
    while (!r.atEnd) {
      val id = r.ebmlId()
      val size = r.ebmlSize()
      if (first && id == 0xBFL) {
        if (size != 4) throw Malformed
        val want = {
          val c = r.sub(4)
          c.uint(1) | (c.uint(1) << 8) | (c.uint(1) << 16) | (c.uint(1) << 24)
        }
        val crc = new java.util.zip.CRC32
        crc.update(r.b, r.p, r.end - r.p)
        if (crc.getValue != want) throw Malformed
      } else {
        if (size > r.end - r.p) throw Malformed // child overruns parent
        if (!handler(id, size, r)) r.skip(size)
      }
      first = false
    }
  }

  /** Strict whole-file walk; None on ANY container violation. */
  def info(bytes: Array[Byte]): Option[WebmInfo] = {
    try {
      if (bytes == null || bytes.length < 8) throw Malformed
      val top = new Rd(bytes, 0, bytes.length)
      // EBML header
      val hdrId = top.ebmlId()
      if (hdrId != 0x1A45DFA3L) throw Malformed
      val hdr = top.sub(top.ebmlSize())
      var docType = ""
      children(hdr, 0) { (id, size, r) =>
        id match {
          case 0x4282 => docType = r.str(size.toInt); true
          case _ => false
        }
      }
      if (docType != "matroska" && docType != "webm") throw Malformed
      // Segment
      if (top.ebmlId() != 0x18538067L) throw Malformed
      val seg = top.sub(top.ebmlSize())
      if (!top.atEnd) throw Malformed // trailing bytes after the segment
      var tsScale = 1000000L
      var duration = -1.0
      val tracks = Vector.newBuilder[Track]
      var nClusters = 0
      var nBlocks = 0
      children(seg, 1) { (id, size, r) =>
        id match {
          case 0x1549A966L => // Info
            val in = r.sub(size)
            children(in, 2) { (iid, isz, ir) =>
              iid match {
                case 0x2AD7B1 => tsScale = ir.uint(isz.toInt); true
                case 0x4489 => duration = ir.float(isz.toInt); true
                case _ => false
              }
            }
            true
          case 0x1654AE6BL => // Tracks
            val tr = r.sub(size)
            children(tr, 2) { (tid, tsz, trr) =>
              if (tid == 0xAE) { // TrackEntry
                val te = trr.sub(tsz)
                var ttype = -1
                var codec = ""
                var w = -1; var h = -1
                var rate = -1.0; var ch = -1
                children(te, 3) { (eid, esz, er) =>
                  eid match {
                    case 0x83 => ttype = er.uint(esz.toInt).toInt; true
                    case 0x86 => codec = er.str(esz.toInt); true
                    case 0xE0 => // Video
                      val v = er.sub(esz)
                      children(v, 4) { (vid, vsz, vr) =>
                        vid match {
                          case 0xB0 => w = vr.uint(vsz.toInt).toInt; true
                          case 0xBA => h = vr.uint(vsz.toInt).toInt; true
                          case _ => false
                        }
                      }
                      true
                    case 0xE1 => // Audio
                      val a = er.sub(esz)
                      children(a, 4) { (aid, asz, ar) =>
                        aid match {
                          case 0xB5 => rate = ar.float(asz.toInt); true
                          case 0x9F => ch = ar.uint(asz.toInt).toInt; true
                          case _ => false
                        }
                      }
                      true
                    case _ => false
                  }
                }
                if (ttype < 0 || codec.isEmpty) throw Malformed
                tracks += Track(ttype, codec, w, h, rate, ch)
                true
              } else false
            }
            true
          case 0x1F43B675L => // Cluster
            nClusters += 1
            if (nClusters > (1 << 20)) throw Malformed
            val cl = r.sub(size)
            children(cl, 2) { (cid, csz, cr) =>
              if (cid == 0xA3) { // SimpleBlock
                nBlocks += 1
                if (nBlocks > (1 << 22)) throw Malformed
                cr.skip(csz)
                true
              } else false
            }
            true
          case _ => false
        }
      }
      if (tracks.result().isEmpty) throw Malformed
      Some(WebmInfo(docType, tsScale, duration, tracks.result(),
        nClusters, nBlocks))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------- Spark surface ----------------

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("doc_type", StringType),
    StructField("duration_ms", DoubleType),
    StructField("n_tracks", IntegerType),
    StructField("video_codec", StringType),
    StructField("video_w", IntegerType),
    StructField("video_h", IntegerType),
    StructField("audio_codec", StringType),
    StructField("audio_rate", DoubleType),
    StructField("audio_channels", IntegerType),
    StructField("n_clusters", IntegerType),
    StructField("n_blocks", IntegerType)))

  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { it =>
      it.flatMap { r =>
        val fname = r.getString(0)
        info(r.getAs[Array[Byte]](1)) match {
          case Some(m) =>
            val video = m.tracks.find(_.trackType == 1)
            val audio = m.tracks.find(_.trackType == 2)
            Iterator.single(Row(fname, m.docType,
              BigDecimal(m.durationMs)
                .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble,
              m.tracks.length,
              video.map(_.codec).orNull,
              video.map(v => Integer.valueOf(v.width)).orNull,
              video.map(v => Integer.valueOf(v.height)).orNull,
              audio.map(_.codec).orNull,
              audio.map(a => java.lang.Double.valueOf(a.sampleRate)).orNull,
              audio.map(a => Integer.valueOf(a.channels)).orNull,
              m.nClusters, m.nBlocks))
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  // ---------------- writer (fixture reverse direction) ----------------

  private def idBytes(id: Long): Array[Byte] = {
    // IDs are stored verbatim (marker included)
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    Array.tabulate(n)(i => ((id >>> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def sizeBytes(size: Long): Array[Byte] = {
    require(size >= 0)
    var n = 1
    while (n <= 8 && size >= (1L << (7 * n)) - 1) n += 1 // avoid the all-ones pattern
    require(n <= 8)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = ((size >>> (8 * (n - 1 - i))) & 0xff).toByte; i += 1 }
    out(0) = (out(0) | (0x80 >> (n - 1))).toByte
    out
  }

  def el(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ sizeBytes(body.length.toLong) ++ body

  def elUint(id: Long, v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    el(id, Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte))
  }

  def elFloat64(id: Long, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    el(id, Array.tabulate(8)(i => ((bits >>> (8 * (7 - i))) & 0xff).toByte))
  }

  def elStr(id: Long, s: String): Array[Byte] =
    el(id, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Video-track KEYFRAME payloads in stream order (r15, the
    * e12w-MJPEG precedent carried to WebM): resolves the video track's
    * TrackNumber in a FIRST pass over the Segment (Matroska permits
    * Tracks after Clusters), then walks Cluster → SimpleBlock and
    * Cluster → BlockGroup → Block, keeping only that track's keyframes
    * (SimpleBlock flag 0x80; for BlockGroup, absence of ReferenceBlock)
    * — interleaved audio blocks and non-key video blocks are skipped by
    * CONTAINER rules, so a mis-filtered block lands undecodable bytes
    * downstream and the row goes red rather than silently wrong. Laced
    * video blocks (flags & 0x06) reject the file: the payload would
    * carry lace headers inline and decode to garbage. Returns
    * (frameIdx, absoluteTsTicks, payload); None on any container
    * violation.
    */
  def videoKeyframes(bytes: Array[Byte]): Option[Vector[(Int, Long, Array[Byte])]] = {
    try {
      if (bytes == null || bytes.length < 8) throw Malformed
      val top = new Rd(bytes, 0, bytes.length)
      if (top.ebmlId() != 0x1A45DFA3L) throw Malformed
      top.skip(top.ebmlSize())
      if (top.ebmlId() != 0x18538067L) throw Malformed
      val segSize = top.ebmlSize()
      if (segSize > top.end - top.p) throw Malformed
      val segStart = top.p
      val segEnd = segStart + segSize.toInt
      // Pass 1: resolve the video track number (Tracks may follow Clusters).
      var videoTrack = -1L
      children(new Rd(bytes, segStart, segEnd), 0) { (id, size, r) =>
        if (id == 0x1654AE6BL) { // Tracks
          val tr = r.sub(size)
          children(tr, 1) { (tid, tsz, trr) =>
            if (tid == 0xAE) {
              val te = trr.sub(tsz)
              var num = -1L
              var ttype = -1
              children(te, 2) { (eid, esz, er) =>
                eid match {
                  case 0xD7 => num = er.uint(esz.toInt); true
                  case 0x83 => ttype = er.uint(esz.toInt).toInt; true
                  case _ => false
                }
              }
              if (ttype == 1) {
                if (videoTrack >= 0) throw Malformed // one video track
                videoTrack = num
              }
              true
            } else false
          }
          true
        } else false
      }
      if (videoTrack < 0) throw Malformed
      val out = Vector.newBuilder[(Int, Long, Array[Byte])]
      var n = 0
      // Shared SimpleBlock/Block header parse: (track, relTs, flags, payload
      // reader positioned past the header). Caller decides keyframe-ness.
      def blockHeader(blk: Rd): (Long, Long, Long) = {
        val track = blk.ebmlSize() // track number is a vint
        val rel = (blk.uint(1) << 8 | blk.uint(1)).toShort.toLong
        val flags = blk.uint(1)
        (track, rel, flags)
      }
      def emit(blk: Rd, clusterTs: Long, rel: Long): Unit = {
        n += 1
        if (n > (1 << 16)) throw Malformed
        out += ((n - 1, clusterTs + rel,
          java.util.Arrays.copyOfRange(blk.b, blk.p, blk.end)))
      }
      // Pass 2: Clusters only.
      children(new Rd(bytes, segStart, segEnd), 0) { (id, size, r) =>
        if (id == 0x1F43B675L) { // Cluster
          var clusterTs = 0L
          val cl = r.sub(size)
          children(cl, 1) { (cid, csz, cr) =>
            cid match {
              case 0xE7 => clusterTs = cr.uint(csz.toInt); true
              case 0xA3 => // SimpleBlock
                val blk = cr.sub(csz)
                val (track, rel, flags) = blockHeader(blk)
                if (track == videoTrack) {
                  if ((flags & 0x06) != 0) throw Malformed // laced video
                  if ((flags & 0x80) != 0) emit(blk, clusterTs, rel)
                }
                true
              case 0xA0 => // BlockGroup: keyframe iff no ReferenceBlock
                val grp = cr.sub(csz)
                var pend: Rd = null
                var pendRel = 0L
                var refd = false
                children(grp, 2) { (gid, gsz, gr) =>
                  gid match {
                    case 0xA1 => // Block
                      val blk = gr.sub(gsz)
                      val (track, rel, flags) = blockHeader(blk)
                      if (track == videoTrack) {
                        if ((flags & 0x06) != 0) throw Malformed // laced
                        if (pend != null) throw Malformed // one Block/group
                        pend = blk; pendRel = rel
                      }
                      true
                    case 0xFB => refd = true; false // ReferenceBlock
                    case _ => false
                  }
                }
                if (pend != null && !refd) emit(pend, clusterTs, pendRel)
                true
              case _ => false
            }
          }
          true
        } else false
      }
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Fixture reverse direction for [[videoKeyframes]]: a two-track WebM
    * (V_VP8 video + A_VORBIS junk audio) whose video track carries the
    * given key-frame payloads (flag 0x80) plus one deterministic
    * NON-key junk block per cluster (flag 0) — both distractor classes
    * the extractor must skip by container rules alone.
    */
  def makeWebmVp8(width: Int, height: Int, frames: Seq[Array[Byte]],
      seed: Long): Array[Byte] = {
    val hdr = el(0x1A45DFA3L,
      elUint(0x4286, 1) ++ elStr(0x4282, "webm") ++
        elUint(0x4287, 4) ++ elUint(0x4285, 2))
    val info = el(0x1549A966L, withCrc(
      elUint(0x2AD7B1, 1000000L) ++ elFloat64(0x4489, frames.size * 40.0)))
    val trackBytes = el(0x1654AE6BL,
      el(0xAE, elUint(0xD7, 1L) ++ elUint(0x83, 1L) ++
        elStr(0x86, "V_VP8") ++
        el(0xE0, elUint(0xB0, width.toLong) ++ elUint(0xBA, height.toLong))) ++
      el(0xAE, elUint(0xD7, 2L) ++ elUint(0x83, 2L) ++
        elStr(0x86, "A_VORBIS") ++
        el(0xE1, elFloat64(0xB5, 48000.0) ++ elUint(0x9F, 2L))))
    def block(track: Int, rel: Int, flags: Int, data: Array[Byte]): Array[Byte] =
      el(0xA3, Array[Byte]((0x80 | track).toByte, ((rel >> 8) & 0xff).toByte,
        (rel & 0xff).toByte, flags.toByte) ++ data)
    val clusters = frames.zipWithIndex.map { case (f, i) =>
      val junk = Array.tabulate(6 + (i % 5))(k =>
        ((seed + i * 31 + k * 7) & 0xff).toByte)
      el(0x1F43B675L, elUint(0xE7, i * 40L) ++
        block(2, 1, 0x00, junk) ++             // audio distractor
        block(1, 0, 0x80, f) ++                // the key frame
        block(1, 20, 0x00, junk.map(b => (b ^ 0x5a).toByte))) // non-key junk
    }
    hdr ++ el(0x18538067L,
      info ++ trackBytes ++
        (if (clusters.isEmpty) Array[Byte]() else clusters.reduce(_ ++ _)))
  }

  /** CRC-32 first-child element covering `rest` (the spec's rule). */
  def withCrc(rest: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32
    crc.update(rest)
    val v = crc.getValue
    el(0xBF, Array.tabulate(4)(i => ((v >>> (8 * i)) & 0xff).toByte)) ++ rest
  }

  def makeWebm(docType: String, durationTicks: Double, tsScale: Long,
      tracks: Seq[Track], blocksPerCluster: Seq[Int]): Array[Byte] = {
    val hdr = el(0x1A45DFA3L,
      elUint(0x4286, 1) ++ elStr(0x4282, docType) ++
        elUint(0x4287, 4) ++ elUint(0x4285, 2))
    val info = el(0x1549A966L, withCrc(
      elUint(0x2AD7B1, tsScale) ++ elFloat64(0x4489, durationTicks)))
    val trackBytes = el(0x1654AE6BL, tracks.zipWithIndex.map { case (t, i) =>
      val sub =
        if (t.trackType == 1)
          el(0xE0, elUint(0xB0, t.width.toLong) ++ elUint(0xBA, t.height.toLong))
        else
          el(0xE1, elFloat64(0xB5, t.sampleRate) ++ elUint(0x9F, t.channels.toLong))
      el(0xAE, elUint(0xD7, i + 1L) ++ elUint(0x83, t.trackType.toLong) ++
        elStr(0x86, t.codec) ++ sub)
    }.reduce(_ ++ _))
    val clusters = blocksPerCluster.zipWithIndex.map { case (nb, ci) =>
      val blocks = (0 until nb).map { bi =>
        // SimpleBlock body: track vint, 16-bit timestamp, flags, data
        el(0xA3, Array[Byte](0x81.toByte, 0, (ci * 16 + bi).toByte, 0) ++
          Array.tabulate(8 + bi)(k => (k * 5 + ci).toByte))
      }
      el(0x1F43B675L, elUint(0xE7, ci * 1000L) ++
        (if (blocks.isEmpty) Array[Byte]() else blocks.reduce(_ ++ _)))
    }
    val seg = el(0x18538067L,
      info ++ trackBytes ++
        (if (clusters.isEmpty) Array[Byte]() else clusters.reduce(_ ++ _)))
    hdr ++ seg
  }
}
