package graft.operators.hevc

import HevcBits.{Malformed, Reader, Unsupported}

/** HEVC parameter-set and slice-header parsing (spec 7.3.2.2, 7.3.3,
  * 7.3.6) — the intra-still subset HEIC payloads use. Anything the
  * decoder does not implement rejects loudly with the feature named
  * (the reject-don't-guess discipline; see HevcDecoder's scope note).
  */
object HevcHeaders {

  final case class Sps(
      chromaFormatIdc: Int,
      picWidth: Int,
      picHeight: Int,
      confWinLeft: Int, confWinRight: Int, confWinTop: Int,
      confWinBottom: Int,
      bitDepth: Int,
      log2CtbSize: Int,
      log2MinCb: Int,
      log2MinTb: Int,
      log2MaxTb: Int,
      maxTransformHierarchyDepthIntra: Int,
      ampEnabled: Boolean,
      saoEnabled: Boolean,
      strongIntraSmoothing: Boolean) {
    def ctbSize: Int = 1 << log2CtbSize
    def picWidthInCtbs: Int = (picWidth + ctbSize - 1) >> log2CtbSize
    def picHeightInCtbs: Int = (picHeight + ctbSize - 1) >> log2CtbSize
    def subW: Int = if (chromaFormatIdc == 1 || chromaFormatIdc == 2) 2 else 1
    def subH: Int = if (chromaFormatIdc == 1) 2 else 1
  }

  final case class Pps(
      signDataHiding: Boolean,
      initQp: Int,
      cuQpDeltaEnabled: Boolean,
      diffCuQpDeltaDepth: Int,
      cbQpOffset: Int,
      crQpOffset: Int,
      sliceChromaQpOffsetsPresent: Boolean,
      entropyCodingSync: Boolean,
      loopFilterAcrossSlices: Boolean,
      deblockingDisabled: Boolean,
      betaOffsetDiv2: Int,
      tcOffsetDiv2: Int)

  final case class SliceHeader(
      sliceQp: Int,
      saoLuma: Boolean,
      saoChroma: Boolean,
      cbQpOffset: Int,
      crQpOffset: Int,
      entryPoints: Array[Int],
      dataBitPos: Int)

  /** Parse the SPS fields the intra decoder needs (7.3.2.2). */
  def parseSps(rbsp: Array[Byte]): Sps = {
    val r = new Reader(rbsp)
    r.u(4) // sps_video_parameter_set_id
    val maxSub = r.u(3)
    if (maxSub != 0) throw new Unsupported("sps sub-layers")
    r.u1() // sps_temporal_id_nesting_flag
    r.u(96) // profile_tier_level (general only, 0 sub-layers)
    r.ue() // sps_seq_parameter_set_id
    val chromaFormatIdc = r.ue()
    if (chromaFormatIdc == 3 && r.u1() == 1)
      throw new Unsupported("separate colour planes")
    if (chromaFormatIdc > 1)
      throw new Unsupported(s"chroma format $chromaFormatIdc")
    val w = r.ue()
    val h = r.ue()
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.u1() == 1) {
      cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
    }
    val bdLuma = r.ue() + 8
    val bdChroma = r.ue() + 8
    if (bdLuma != 8 || bdChroma != 8)
      throw new Unsupported(s"bit depth $bdLuma/$bdChroma")
    r.ue() // log2_max_pic_order_cnt_lsb
    val subOrdering = r.u1()
    var i = if (subOrdering == 1) 0 else maxSub
    while (i <= maxSub) { r.ue(); r.ue(); r.ue(); i += 1 }
    val log2MinCb = r.ue() + 3
    val log2CtbSize = log2MinCb + r.ue()
    val log2MinTb = r.ue() + 2
    val log2MaxTb = log2MinTb + r.ue()
    r.ue() // max_transform_hierarchy_depth_inter
    val maxTHDIntra = r.ue()
    if (r.u1() == 1) throw new Unsupported("scaling lists")
    val amp = r.u1() == 1
    val sao = r.u1() == 1
    if (r.u1() == 1) throw new Unsupported("pcm")
    if (r.ue() != 0) throw new Unsupported("short-term rps (inter)")
    if (r.u1() == 1) throw new Unsupported("long-term ref pics")
    r.u1() // sps_temporal_mvp_enabled_flag
    val sis = r.u1() == 1
    // vui/extensions not needed — stop here
    Sps(chromaFormatIdc, w, h, cl, cr, ct, cb, bdLuma, log2CtbSize,
      log2MinCb, log2MinTb, log2MaxTb, maxTHDIntra, amp, sao, sis)
  }

  /** Parse the PPS fields the intra decoder needs (7.3.3). */
  def parsePps(rbsp: Array[Byte]): Pps = {
    val r = new Reader(rbsp)
    r.ue() // pps id
    r.ue() // sps id
    if (r.u1() == 1) throw new Unsupported("dependent slice segments")
    r.u1() // output_flag_present
    if (r.u(3) != 0) throw new Unsupported("extra slice header bits")
    val sdh = r.u1() == 1
    if (r.u1() == 1) throw new Unsupported("cabac_init_present")
    r.ue(); r.ue() // num_ref_idx defaults
    val initQp = r.se() + 26
    if (r.u1() == 1) throw new Unsupported("constrained intra pred")
    if (r.u1() == 1) throw new Unsupported("transform skip")
    val cuQpDelta = r.u1() == 1
    val dqpDepth = if (cuQpDelta) r.ue() else 0
    val cbQpOff = r.se()
    val crQpOff = r.se()
    val sliceChromaQp = r.u1() == 1
    r.u1(); r.u1() // weighted pred flags
    if (r.u1() == 1) throw new Unsupported("transquant bypass")
    val tiles = r.u1() == 1
    val wpp = r.u1() == 1
    if (tiles) throw new Unsupported("tiles")
    val lfAcross = r.u1() == 1
    var deblockDisabled = false
    var beta2 = 0
    var tc2 = 0
    if (r.u1() == 1) { // deblocking_filter_control_present
      if (r.u1() == 1) throw new Unsupported("deblocking override")
      deblockDisabled = r.u1() == 1
      if (!deblockDisabled) { beta2 = r.se(); tc2 = r.se() }
    }
    if (r.u1() == 1) throw new Unsupported("pps scaling list")
    r.u1() // lists_modification_present
    r.ue() // log2_parallel_merge_level_minus2
    if (r.u1() == 1) throw new Unsupported("slice header extension")
    Pps(sdh, initQp, cuQpDelta, dqpDepth, cbQpOff, crQpOff, sliceChromaQp,
      wpp, lfAcross, deblockDisabled, beta2, tc2)
  }

  /** Parse an I-slice segment header (7.3.6.1); returns the header and
    * leaves the reader byte-aligned at the first slice-data bit. */
  def parseSliceHeader(r: Reader, nalType: Int, sps: Sps,
      pps: Pps): SliceHeader = {
    val first = r.u1() == 1
    if (!first) throw new Unsupported("multi-slice picture")
    if (nalType >= 16 && nalType <= 23) r.u1() // no_output_of_prior_pics
    r.ue() // slice_pps_id
    if (nalType != 19 && nalType != 20)
      throw new Unsupported(s"non-IDR slice nal $nalType")
    val sliceType = r.ue()
    if (sliceType != 2) throw new Unsupported(s"slice type $sliceType")
    var saoLuma = false
    var saoChroma = false
    if (sps.saoEnabled) {
      saoLuma = r.u1() == 1
      if (sps.chromaFormatIdc != 0) saoChroma = r.u1() == 1
    }
    val qp = pps.initQp + r.se()
    var cbOff = pps.cbQpOffset
    var crOff = pps.crQpOffset
    if (pps.sliceChromaQpOffsetsPresent) {
      cbOff += r.se(); crOff += r.se()
    }
    if (pps.loopFilterAcrossSlices &&
        (saoLuma || saoChroma || !pps.deblockingDisabled)) {
      r.u1() // slice_loop_filter_across_slices_enabled_flag
    }
    var entries = Array.empty[Int]
    if (pps.entropyCodingSync) {
      val n = r.ue()
      if (n > 0) {
        val len = r.ue() + 1
        entries = Array.tabulate(n)(_ => r.u(len) + 1)
      }
    }
    // byte_alignment() (7.3.2.10): an UNCONDITIONAL 1 bit, then zeros —
    // it consumes a full byte when the header already ends aligned
    if (r.u1() != 1) throw Malformed
    while ((r.pos & 7) != 0) {
      if (r.u1() != 0) throw Malformed
    }
    if (qp < 0 || qp > 51) throw Malformed
    SliceHeader(qp, saoLuma, saoChroma, cbOff, crOff, entries, r.pos)
  }
}
