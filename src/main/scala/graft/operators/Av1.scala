package graft.operators

/** AV1 OBU-layer parsing (r16) — the first committed slice of the AV1
  * bitstream work the fired libavif/libheif trigger unlocked (full
  * intra-frame pixel decode is the scoped r17 headline; NOTES_r16).
  *
  * Implements, per the public AV1 Bitstream & Decoding Process
  * Specification (AOM, v1.0.0 w/ Errata):
  *  - OBU framing (§5.3): header byte, extension, leb128 sizes;
  *  - the COMPLETE sequence_header_obu (§5.5): both the reduced-still
  *    and the full operating-points path (timing info, decoder model,
  *    per-op parameters), frame dimension bit widths and max dims,
  *    feature flags, and the full color_config — bit depth from
  *    high_bitdepth/twelve_bit, monochrome, the sRGB shortcut,
  *    profile-dependent subsampling, chroma sample position.
  *
  * Every field this parser emits is cross-domain pinned: e119's
  * fixture compares the BITSTREAM-parsed values against what the
  * REFERENCE DECODER (libavif) reports for the same members, and
  * HeifSpec's live sweep does the same against freshly
  * reference-encoded streams across random configs. Reject-don't-
  * guess: reserved/forbidden bits, oversized leb128, truncation →
  * None.
  */
object Av1 {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Fully-parsed sequence header (the fields downstream ingest needs;
    * feature flags that only matter to the decoder are validated in
    * passing but not surfaced).
    */
  final case class SeqHeader(
      profile: Int, stillPicture: Boolean, reducedStill: Boolean,
      maxWidth: Int, maxHeight: Int, bitDepth: Int, monochrome: Boolean,
      subsamplingX: Int, subsamplingY: Int, colorRange: Boolean,
      colorPrimaries: Int, transferCharacteristics: Int,
      matrixCoefficients: Int, filmGrain: Boolean)

  /** MSB-first fixed-width bit reader over a byte slice (§4: f(n)). */
  private final class Bits(b: Array[Byte], off: Int, end: Int) {
    private var bitPos = off.toLong * 8

    def f(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = (bitPos >> 3).toInt
        if (byteIdx >= end) throw Malformed
        val bit = (b(byteIdx) >> (7 - (bitPos & 7)).toInt) & 1
        v = (v << 1) | bit
        bitPos += 1
        i += 1
      }
      v
    }

    /** uvlc() (§4.10.3): leadingZeros then f(leadingZeros) + offset. */
    def uvlc(): Long = {
      var lz = 0
      while (f(1) == 0) {
        lz += 1
        if (lz > 32) throw Malformed
      }
      if (lz == 32) return (1L << 32) - 1
      f(lz).toLong + (1L << lz) - 1
    }
  }

  /** Parse the first sequence-header OBU in an OBU stream (an AV1 item
    * payload / av1C configOBUs). None on malformed framing or a stream
    * with no sequence header reachable.
    */
  def sequenceHeader(payload: Array[Byte]): Option[SeqHeader] = {
    try {
      if (payload == null || payload.length < 1) throw Malformed
      var p = 0
      while (p < payload.length) {
        val hdr = payload(p) & 0xff
        if ((hdr & 0x80) != 0) throw Malformed // obu_forbidden_bit
        val oType = (hdr >> 3) & 15
        val hasExt = (hdr >> 2) & 1
        val hasSize = (hdr >> 1) & 1
        if ((hdr & 1) != 0) throw Malformed // obu_reserved_1bit
        var q = p + 1 + hasExt
        var size = -1L
        if (hasSize == 1) {
          size = 0L
          var shift = 0
          var more = true
          while (more) {
            if (q >= payload.length || shift > 56) throw Malformed
            val byte = payload(q) & 0xff
            q += 1
            size |= (byte & 0x7fL) << shift
            more = (byte & 0x80) != 0
            shift += 7
          }
          if (q + size > payload.length) throw Malformed
        }
        if (oType == 1) // OBU_SEQUENCE_HEADER
          return Some(parseSeq(payload, q,
            if (size >= 0) q + size.toInt else payload.length))
        if (size < 0) throw Malformed // unsized non-seq OBU: cannot skip
        p = q + size.toInt
        if (p <= q && size > 0) throw Malformed
      }
      throw Malformed // no sequence header in the stream
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** sequence_header_obu() (§5.5.1) + color_config() (§5.5.2). */
  private def parseSeq(b: Array[Byte], off: Int, end: Int): SeqHeader = {
    val r = new Bits(b, off, end)
    val profile = r.f(3)
    if (profile > 2) throw Malformed
    val still = r.f(1) == 1
    val reduced = r.f(1) == 1
    if (reduced && !still) throw Malformed // spec: reduced implies still
    var decoderModelPresent = false
    var bufferDelayBits = 0
    if (reduced) {
      r.f(5) // seq_level_idx[0]
    } else {
      val timingPresent = r.f(1) == 1
      if (timingPresent) {
        r.f(32); r.f(32) // num_units_in_display_tick, time_scale
        if (r.f(1) == 1) r.uvlc() // equal_picture_interval → num_ticks
        decoderModelPresent = r.f(1) == 1
        if (decoderModelPresent) {
          bufferDelayBits = r.f(5) + 1
          r.f(32) // num_units_in_decoding_tick
          r.f(5); r.f(5) // buffer_removal / frame_presentation lengths
        }
      }
      val initialDisplayDelayPresent = r.f(1) == 1
      val opCnt = r.f(5) + 1
      var i = 0
      while (i < opCnt) {
        r.f(12) // operating_point_idc
        val level = r.f(5)
        if (level > 7) r.f(1) // seq_tier
        if (decoderModelPresent && r.f(1) == 1) {
          r.f(bufferDelayBits) // decoder_buffer_delay
          r.f(bufferDelayBits) // encoder_buffer_delay
          r.f(1) // low_delay_mode_flag
        }
        if (initialDisplayDelayPresent && r.f(1) == 1)
          r.f(4) // initial_display_delay_minus_1
        i += 1
      }
    }
    val wBits = r.f(4) + 1
    val hBits = r.f(4) + 1
    val maxW = r.f(wBits) + 1
    val maxH = r.f(hBits) + 1
    if (maxW > (1 << 16) || maxH > (1 << 16)) throw Malformed
    var frameIdNumbers = false
    if (!reduced) frameIdNumbers = r.f(1) == 1
    if (frameIdNumbers) { r.f(4); r.f(3) }
    r.f(1) // use_128x128_superblock
    r.f(1) // enable_filter_intra
    r.f(1) // enable_intra_edge_filter
    if (!reduced) {
      r.f(1); r.f(1); r.f(1); r.f(1) // interintra/masked/warped/dual
      val orderHint = r.f(1) == 1
      if (orderHint) { r.f(1); r.f(1) } // jnt_comp, ref_frame_mvs
      val forceScreen = if (r.f(1) == 1) 2 else r.f(1)
      if (forceScreen > 0) { if (r.f(1) == 0) r.f(1) } // integer_mv
      if (orderHint) r.f(3) // order_hint_bits_minus_1
    }
    r.f(1) // enable_superres
    r.f(1) // enable_cdef
    r.f(1) // enable_restoration
    // ---- color_config (§5.5.2) ----
    val highBitdepth = r.f(1) == 1
    val bitDepth =
      if (profile == 2 && highBitdepth) { if (r.f(1) == 1) 12 else 10 }
      else if (highBitdepth) 10
      else 8
    val mono = if (profile == 1) false else r.f(1) == 1
    val (primaries, transfer, matrix) =
      if (r.f(1) == 1) (r.f(8), r.f(8), r.f(8))
      else (2, 2, 2) // unspecified
    var subX = 1
    var subY = 1
    var range = false
    if (mono) {
      range = r.f(1) == 1
    } else if (primaries == 1 && transfer == 13 && matrix == 0) {
      range = true // sRGB: full range, 4:4:4
      subX = 0; subY = 0
    } else {
      range = r.f(1) == 1
      if (profile == 0) { subX = 1; subY = 1 }
      else if (profile == 1) { subX = 0; subY = 0 }
      else {
        if (bitDepth == 12) {
          subX = r.f(1)
          subY = if (subX == 1) r.f(1) else 0
        } else { subX = 1; subY = 0 }
      }
      if (subX == 1 && subY == 1) r.f(2) // chroma_sample_position
    }
    if (!mono) r.f(1) // separate_uv_delta_q
    val filmGrain = r.f(1) == 1
    SeqHeader(profile, still, reduced, maxW, maxH, bitDepth, mono,
      subX, subY, range, primaries, transfer, matrix, filmGrain)
  }
}
