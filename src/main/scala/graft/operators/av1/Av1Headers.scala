package graft.operators.av1

/** AV1 OBU-layer + header parsing for the pixel decoder (spec 5.5/5.9):
  * a RICHER sequence-header parse than `operators.Av1.sequenceHeader`
  * (which serves container stats) — the decoder needs the tool flags —
  * plus the full intra-frame uncompressed header and tile-group
  * slicing. Still-image scope: KEY / INTRA_ONLY frames only;
  * show_existing_frame, reference frames and the inter-only syntax are
  * rejected loudly (reject-don't-guess, as everywhere in the ingest
  * layer).
  */
object Av1Headers {

  object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  /** parseable but uses a tool the decoder does not implement yet */
  final case class Unsupported(what: String) extends RuntimeException(what) {
    override def fillInStackTrace(): Throwable = this
  }

  final class Bits(val b: Array[Byte], startBit: Long, endByte: Int) {
    var pos: Long = startBit
    def f(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = (pos >> 3).toInt
        if (byteIdx >= endByte) throw Malformed
        v = (v << 1) | ((b(byteIdx) >> (7 - (pos & 7).toInt)) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def su(n: Int): Int = { // f(n) then sign bit (spec su(1+n))
      val v = f(n)
      if (f(1) == 1) -v else v
    }
    def uvlc(): Long = {
      var lz = 0
      while (f(1) == 0) { lz += 1; if (lz > 32) throw Malformed }
      if (lz == 32) return (1L << 32) - 1
      f(lz).toLong + (1L << lz) - 1
    }
    def byteAlign(): Unit = while ((pos & 7) != 0) pos += 1
    def ns(n: Int): Int = { // spec ns(n) non-symmetric
      val w = 32 - Integer.numberOfLeadingZeros(n - 1) // FloorLog2(n-1)+1
      val m = (1 << w) - n
      val v = f(w - 1)
      if (v < m) v else (v << 1) - m + f(1)
    }
  }

  // ---------------- sequence header ----------------
  final case class Seq(
      profile: Int, stillPicture: Boolean, reducedStill: Boolean,
      frameWidthBits: Int, frameHeightBits: Int,
      maxWidth: Int, maxHeight: Int,
      frameIdNumbers: Boolean, deltaFrameIdLen: Int, frameIdLen: Int,
      use128x128Superblock: Boolean, enableFilterIntra: Boolean,
      enableIntraEdgeFilter: Boolean,
      forceScreenContentTools: Int, forceIntegerMv: Int,
      orderHintBits: Int,
      enableSuperres: Boolean, enableCdef: Boolean,
      enableRestoration: Boolean,
      bitDepth: Int, monochrome: Boolean,
      subsamplingX: Int, subsamplingY: Int,
      separateUvDeltaQ: Boolean, filmGrain: Boolean,
      decoderModelPresent: Boolean)

  def parseSeq(r: Bits): Seq = {
    val profile = r.f(3)
    if (profile > 2) throw Malformed
    val still = r.f(1) == 1
    val reduced = r.f(1) == 1
    if (reduced && !still) throw Malformed
    var decoderModel = false
    var bufferDelayBits = 0
    var forceScreen = 2
    var forceInt = 2
    var orderHintBits = 0
    if (reduced) {
      r.f(5)
    } else {
      val timing = r.f(1) == 1
      if (timing) {
        r.f(32); r.f(32)
        if (r.f(1) == 1) r.uvlc()
        decoderModel = r.f(1) == 1
        if (decoderModel) {
          bufferDelayBits = r.f(5) + 1
          r.f(32); r.f(5); r.f(5)
        }
      }
      val initialDisplayDelay = r.f(1) == 1
      val opCnt = r.f(5) + 1
      var i = 0
      while (i < opCnt) {
        r.f(12)
        val level = r.f(5)
        if (level > 7) r.f(1)
        if (decoderModel && r.f(1) == 1) {
          r.f(bufferDelayBits); r.f(bufferDelayBits); r.f(1)
        }
        if (initialDisplayDelay && r.f(1) == 1) r.f(4)
        i += 1
      }
    }
    val wBits = r.f(4) + 1
    val hBits = r.f(4) + 1
    val maxW = r.f(wBits) + 1
    val maxH = r.f(hBits) + 1
    var frameIds = false
    var deltaLen = 0
    var idLen = 0
    if (!reduced) frameIds = r.f(1) == 1
    if (frameIds) { deltaLen = r.f(4) + 2; idLen = r.f(3) + deltaLen + 1 }
    val use128 = r.f(1) == 1
    val filterIntra = r.f(1) == 1
    val intraEdge = r.f(1) == 1
    if (!reduced) {
      r.f(1); r.f(1); r.f(1); r.f(1)
      val orderHint = r.f(1) == 1
      if (orderHint) { r.f(1); r.f(1) }
      forceScreen = if (r.f(1) == 1) 2 else r.f(1)
      if (forceScreen > 0) {
        forceInt = if (r.f(1) == 1) 2 else r.f(1)
      } else forceInt = 2
      if (orderHint) orderHintBits = r.f(3) + 1
    } else { forceScreen = 2; forceInt = 2 } // spec: SELECT_* for reduced
    val superres = r.f(1) == 1
    val cdef = r.f(1) == 1
    val restoration = r.f(1) == 1
    // color_config
    val highBd = r.f(1) == 1
    val bitDepth =
      if (profile == 2 && highBd) { if (r.f(1) == 1) 12 else 10 }
      else if (highBd) 10
      else 8
    val mono = if (profile == 1) false else r.f(1) == 1
    val (prim, trans, mat) =
      if (r.f(1) == 1) (r.f(8), r.f(8), r.f(8)) else (2, 2, 2)
    var subX = 1
    var subY = 1
    if (mono) {
      r.f(1) // color range
    } else if (prim == 1 && trans == 13 && mat == 0) {
      subX = 0; subY = 0
    } else {
      r.f(1)
      if (profile == 0) { subX = 1; subY = 1 }
      else if (profile == 1) { subX = 0; subY = 0 }
      else {
        if (bitDepth == 12) {
          subX = r.f(1)
          subY = if (subX == 1) r.f(1) else 0
        } else { subX = 1; subY = 0 }
      }
      if (subX == 1 && subY == 1) r.f(2)
    }
    val sepUv = if (mono) false else r.f(1) == 1
    val grain = r.f(1) == 1
    Seq(profile, still, reduced, wBits, hBits, maxW, maxH, frameIds,
      deltaLen, idLen, use128, filterIntra, intraEdge, forceScreen,
      forceInt, orderHintBits, superres, cdef, restoration, bitDepth,
      mono, subX, subY, sepUv, grain, decoderModel)
  }

  // ---------------- frame header (intra-only scope) ----------------
  final class Frame {
    var frameType = 0 // 0 KEY, 2 INTRA_ONLY
    var showFrame = true
    var disableCdfUpdate = false
    var allowScreenContentTools = false
    var allowIntrabc = false
    var width = 0
    var height = 0
    var upscaledWidth = 0
    var superresDenom = 8
    var renderWidth = 0
    var renderHeight = 0
    var disableFrameEndUpdateCdf = false
    // tiles
    var tileColsLog2 = 0
    var tileRowsLog2 = 0
    var tileCols = 1
    var tileRows = 1
    var tileColStartSb: Array[Int] = null // length tileCols+1 (in SBs)
    var tileRowStartSb: Array[Int] = null
    var contextUpdateTileId = 0
    var tileSizeBytes = 4
    // quantization
    var baseQIdx = 0
    var deltaQYDc = 0
    var deltaQUDc = 0
    var deltaQUAc = 0
    var deltaQVDc = 0
    var deltaQVAc = 0
    var usingQMatrix = false
    var qmY = 0; var qmU = 0; var qmV = 0
    // segmentation
    var segmentationEnabled = false
    var segFeatureEnabled: Array[Array[Boolean]] = Array.fill(8, 8)(false)
    var segFeatureData: Array[Array[Int]] = Array.fill(8, 8)(0)
    var segLastActive = 0
    var segPreSkid = 0
    // deltas
    var deltaQPresent = false
    var deltaQRes = 0
    var deltaLfPresent = false
    var deltaLfRes = 0
    var deltaLfMulti = false
    // loop filter
    var lfLevel: Array[Int] = Array(0, 0, 0, 0)
    var lfSharpness = 0
    var lfDeltaEnabled = false
    var lfRefDeltas: Array[Int] = Array(1, 0, 0, 0, -1, 0, -1, -1)
    var lfModeDeltas: Array[Int] = Array(0, 0)
    // cdef
    var cdefDamping = 3
    var cdefBits = 0
    var cdefStrengthBitPos = -1L // dev: bit offset of the strength list
    var cdefYPri: Array[Int] = Array.fill(8)(0)
    var cdefYSec: Array[Int] = Array.fill(8)(0)
    var cdefUVPri: Array[Int] = Array.fill(8)(0)
    var cdefUVSec: Array[Int] = Array.fill(8)(0)
    // restoration
    var lrType: Array[Int] = Array(0, 0, 0) // 0 none 1 wiener 2 sgr 3 switchable
    var lrUnitShift = 0
    var lrUvShift = 0
    // tx mode
    var txModeSelect = false
    var codedLossless = false
    var allLossless = false
    var reducedTxSet = false
    var losslessSeg: Array[Boolean] = Array.fill(8)(true)
    var segQIdx: Array[Int] = Array.fill(8)(0)

    var miCols = 0
    var miRows = 0
    var sbSize = 64
  }

  private def readDeltaQ(r: Bits): Int =
    if (r.f(1) == 1) r.su(6) else 0

  /** spec seg_feature_bits / signed */
  private val SegBits = Array(8, 6, 6, 6, 6, 3, 0, 0)
  private val SegSigned = Array(true, true, true, true, true, false,
    false, false)
  private val SegMax = Array(255, 63, 63, 63, 63, 7, 0, 0)

  def parseFrame(seq: Seq, r: Bits): Frame = {
    val fh = new Frame
    var errorResilient = false
    if (seq.reducedStill) {
      fh.frameType = 0
      fh.showFrame = true
      errorResilient = true // spec: KEY && show -> 1
    } else {
      if (r.f(1) == 1) throw Unsupported("show_existing_frame")
      fh.frameType = r.f(2)
      if (fh.frameType != 0 && fh.frameType != 2)
        throw Unsupported("inter frame")
      fh.showFrame = r.f(1) == 1
      if (fh.showFrame && seq.decoderModelPresent)
        throw Unsupported("temporal_point_info")
      if (!fh.showFrame) r.f(1) // showable_frame
      errorResilient =
        if (fh.frameType == 0 && fh.showFrame) true
        else r.f(1) == 1
    }
    fh.disableCdfUpdate = r.f(1) == 1
    fh.allowScreenContentTools =
      if (seq.forceScreenContentTools == 2) r.f(1) == 1
      else seq.forceScreenContentTools == 1
    if (fh.allowScreenContentTools && seq.forceIntegerMv == 2)
      r.f(1) // force_integer_mv (intra frames force 1 regardless)
    if (seq.frameIdNumbers) r.f(seq.frameIdLen)
    val frameSizeOverride =
      if (seq.reducedStill) false
      else r.f(1) == 1
    if (seq.orderHintBits > 0) r.f(seq.orderHintBits)
    // primary_ref_frame: not coded for intra
    if (seq.decoderModelPresent) throw Unsupported("buffer_removal")
    // refresh_frame_flags
    if (!(fh.frameType == 0 && fh.showFrame)) r.f(8)
    // (error-resilient ref_order_hint loop requires enable_order_hint;
    // our stills never set it with refresh != all, but handle anyway)
    if (errorResilient && seq.orderHintBits > 0) {
      var i = 0
      while (i < 8) { r.f(seq.orderHintBits); i += 1 }
    }
    // frame_size
    if (frameSizeOverride) {
      fh.width = r.f(seq.frameWidthBits) + 1
      fh.height = r.f(seq.frameHeightBits) + 1
    } else {
      fh.width = seq.maxWidth
      fh.height = seq.maxHeight
    }
    // superres
    fh.upscaledWidth = fh.width
    if (seq.enableSuperres && r.f(1) == 1) {
      fh.superresDenom = r.f(3) + 9
      fh.width = (fh.upscaledWidth * 8 + (fh.superresDenom / 2)) /
        fh.superresDenom
      throw Unsupported("superres")
    }
    fh.miCols = 2 * ((fh.width + 7) >> 3)
    fh.miRows = 2 * ((fh.height + 7) >> 3)
    // render size
    if (r.f(1) == 1) {
      fh.renderWidth = r.f(16) + 1
      fh.renderHeight = r.f(16) + 1
    } else {
      fh.renderWidth = fh.upscaledWidth
      fh.renderHeight = fh.height
    }
    if (fh.allowScreenContentTools && fh.upscaledWidth == fh.width)
      fh.allowIntrabc = r.f(1) == 1
    if (fh.allowIntrabc) throw Unsupported("intrabc")
    fh.disableFrameEndUpdateCdf =
      if (seq.reducedStill || fh.disableCdfUpdate) true
      else r.f(1) == 1
    fh.sbSize = if (seq.use128x128Superblock) 128 else 64
    tileInfo(seq, fh, r)
    quantizationParams(seq, fh, r)
    segmentationParams(fh, r)
    // delta q / delta lf
    if (fh.baseQIdx > 0) fh.deltaQPresent = r.f(1) == 1
    if (fh.deltaQPresent) fh.deltaQRes = r.f(2)
    if (fh.deltaQPresent) {
      if (!fh.allowIntrabc) fh.deltaLfPresent = r.f(1) == 1
      if (fh.deltaLfPresent) {
        fh.deltaLfRes = r.f(2)
        fh.deltaLfMulti = r.f(1) == 1
      }
    }
    computeLossless(seq, fh)
    loopFilterParams(seq, fh, r)
    cdefParams(seq, fh, r)
    lrParams(seq, fh, r)
    // read_tx_mode
    fh.txModeSelect = if (fh.codedLossless) false else r.f(1) == 1
    // frame_reference_mode / skip_mode / warped: nothing for intra
    fh.reducedTxSet = r.f(1) == 1
    // global motion: nothing for intra
    // film grain
    if (seq.filmGrain && fh.showFrame) {
      if (r.f(1) == 1) throw Unsupported("film grain")
    }
    fh
  }

  private def tileLog2(blkSize: Int, target: Int): Int = {
    var k = 0
    while ((blkSize << k) < target) k += 1
    k
  }

  private def tileInfo(seq: Seq, fh: Frame, r: Bits): Unit = {
    val sbShift = if (seq.use128x128Superblock) 5 else 4
    val sbCols = (fh.miCols + (1 << sbShift) - 1) >> sbShift
    val sbRows = (fh.miRows + (1 << sbShift) - 1) >> sbShift
    val sbSizeLog2 = sbShift + 2
    val maxTileWidthSb = 4096 >> sbSizeLog2
    val maxTileAreaSb = (4096 * 2304) >> (2 * sbSizeLog2)
    val minLog2TileCols = tileLog2(maxTileWidthSb, sbCols)
    val maxLog2TileCols = tileLog2(1, math.min(sbCols, 64))
    val maxLog2TileRows = tileLog2(1, math.min(sbRows, 64))
    val minLog2Tiles = math.max(minLog2TileCols,
      tileLog2(maxTileAreaSb, sbRows * sbCols))
    val uniform = r.f(1) == 1
    val colStarts = scala.collection.mutable.ArrayBuffer[Int]()
    val rowStarts = scala.collection.mutable.ArrayBuffer[Int]()
    if (uniform) {
      fh.tileColsLog2 = minLog2TileCols
      while (fh.tileColsLog2 < maxLog2TileCols && r.f(1) == 1)
        fh.tileColsLog2 += 1
      val tileWidthSb = (sbCols + (1 << fh.tileColsLog2) - 1) >>
        fh.tileColsLog2
      var startSb = 0
      while (startSb < sbCols) { colStarts += startSb; startSb += tileWidthSb }
      colStarts += sbCols
      val minLog2TileRows = math.max(minLog2Tiles - fh.tileColsLog2, 0)
      fh.tileRowsLog2 = minLog2TileRows
      while (fh.tileRowsLog2 < maxLog2TileRows && r.f(1) == 1)
        fh.tileRowsLog2 += 1
      val tileHeightSb = (sbRows + (1 << fh.tileRowsLog2) - 1) >>
        fh.tileRowsLog2
      startSb = 0
      while (startSb < sbRows) { rowStarts += startSb; startSb += tileHeightSb }
      rowStarts += sbRows
    } else {
      var widestTileSb = 0
      var startSb = 0
      while (startSb < sbCols) {
        colStarts += startSb
        val maxW = math.min(sbCols - startSb, maxTileWidthSb)
        val sizeSb = r.ns(maxW) + 1
        widestTileSb = math.max(widestTileSb, sizeSb)
        startSb += sizeSb
      }
      colStarts += sbCols
      fh.tileColsLog2 = tileLog2(1, colStarts.length - 1)
      var maxTileAreaSb2 = maxTileAreaSb
      if (minLog2Tiles > 0) maxTileAreaSb2 = maxTileAreaSb >> (minLog2Tiles + 1)
      val maxTileHeightSb = math.max(maxTileAreaSb2 / math.max(widestTileSb, 1), 1)
      startSb = 0
      while (startSb < sbRows) {
        rowStarts += startSb
        val maxH = math.min(sbRows - startSb, maxTileHeightSb)
        val sizeSb = r.ns(maxH) + 1
        startSb += sizeSb
      }
      rowStarts += sbRows
      fh.tileRowsLog2 = tileLog2(1, rowStarts.length - 1)
    }
    fh.tileCols = colStarts.length - 1
    fh.tileRows = rowStarts.length - 1
    fh.tileColStartSb = colStarts.toArray
    fh.tileRowStartSb = rowStarts.toArray
    if (fh.tileColsLog2 > 0 || fh.tileRowsLog2 > 0) {
      fh.contextUpdateTileId = r.f(fh.tileRowsLog2 + fh.tileColsLog2)
      fh.tileSizeBytes = r.f(2) + 1
    }
  }

  private def quantizationParams(seq: Seq, fh: Frame, r: Bits): Unit = {
    fh.baseQIdx = r.f(8)
    fh.deltaQYDc = readDeltaQ(r)
    if (!seq.monochrome) {
      val diffUv = if (seq.separateUvDeltaQ) r.f(1) == 1 else false
      fh.deltaQUDc = readDeltaQ(r)
      fh.deltaQUAc = readDeltaQ(r)
      if (diffUv) {
        fh.deltaQVDc = readDeltaQ(r)
        fh.deltaQVAc = readDeltaQ(r)
      } else {
        fh.deltaQVDc = fh.deltaQUDc
        fh.deltaQVAc = fh.deltaQUAc
      }
    }
    fh.usingQMatrix = r.f(1) == 1
    if (fh.usingQMatrix) {
      fh.qmY = r.f(4)
      fh.qmU = r.f(4)
      fh.qmV = if (!seq.separateUvDeltaQ) fh.qmU else r.f(4)
      throw Unsupported("qmatrix")
    }
  }

  private def segmentationParams(fh: Frame, r: Bits): Unit = {
    fh.segmentationEnabled = r.f(1) == 1
    if (fh.segmentationEnabled) {
      // intra frame: primary_ref is NONE -> update_map=1, update_data=1
      var i = 0
      while (i < 8) {
        var j = 0
        while (j < 8) {
          if (r.f(1) == 1) {
            fh.segFeatureEnabled(i)(j) = true
            if (SegBits(j) > 0) {
              val v = if (SegSigned(j)) r.su(SegBits(j)) else r.f(SegBits(j))
              val lim = SegMax(j)
              fh.segFeatureData(i)(j) =
                if (SegSigned(j)) math.max(-lim, math.min(lim, v))
                else math.max(0, math.min(lim, v))
            }
            if (j != 0) throw Unsupported("segmentation feature " + j)
          }
          j += 1
        }
        i += 1
      }
      var last = 0
      i = 0
      while (i < 8) {
        var j = 0
        while (j < 8) {
          if (fh.segFeatureEnabled(i)(j)) {
            last = i
            if (j >= 5) fh.segPreSkid = 1
          }
          j += 1
        }
        i += 1
      }
      fh.segLastActive = last
    }
  }

  private def computeLossless(seq: Seq, fh: Frame): Unit = {
    var coded = true
    var i = 0
    while (i < 8) {
      val q =
        if (fh.segmentationEnabled && fh.segFeatureEnabled(i)(0))
          math.max(0, math.min(255, fh.baseQIdx + fh.segFeatureData(i)(0)))
        else fh.baseQIdx
      fh.segQIdx(i) = q
      val lossless = q == 0 && fh.deltaQYDc == 0 && fh.deltaQUAc == 0 &&
        fh.deltaQUDc == 0 && fh.deltaQVAc == 0 && fh.deltaQVDc == 0
      fh.losslessSeg(i) = lossless
      if (!lossless) coded = false
      i += 1
    }
    fh.codedLossless = coded
    fh.allLossless = coded && (fh.width == fh.upscaledWidth)
  }

  private def loopFilterParams(seq: Seq, fh: Frame, r: Bits): Unit = {
    if (fh.codedLossless || fh.allowIntrabc) {
      fh.lfLevel = Array(0, 0, 0, 0)
      fh.lfRefDeltas = Array(1, 0, 0, 0, -1, 0, -1, -1)
      fh.lfModeDeltas = Array(0, 0)
      return
    }
    fh.lfLevel(0) = r.f(6)
    fh.lfLevel(1) = r.f(6)
    if (!seq.monochrome && (fh.lfLevel(0) > 0 || fh.lfLevel(1) > 0)) {
      fh.lfLevel(2) = r.f(6)
      fh.lfLevel(3) = r.f(6)
    }
    fh.lfSharpness = r.f(3)
    fh.lfDeltaEnabled = r.f(1) == 1
    if (fh.lfDeltaEnabled && r.f(1) == 1) {
      var i = 0
      while (i < 8) {
        if (r.f(1) == 1) fh.lfRefDeltas(i) = r.su(6)
        i += 1
      }
      i = 0
      while (i < 2) {
        if (r.f(1) == 1) fh.lfModeDeltas(i) = r.su(6)
        i += 1
      }
    }
  }

  private def cdefParams(seq: Seq, fh: Frame, r: Bits): Unit = {
    if (fh.codedLossless || fh.allowIntrabc || !seq.enableCdef) {
      fh.cdefBits = 0
      fh.cdefYPri(0) = 0; fh.cdefYSec(0) = 0
      fh.cdefUVPri(0) = 0; fh.cdefUVSec(0) = 0
      fh.cdefDamping = 3
      return
    }
    fh.cdefStrengthBitPos = r.pos + 2 + 2 // dev: for stream patching
    fh.cdefDamping = r.f(2) + 3
    fh.cdefBits = r.f(2)
    var i = 0
    while (i < (1 << fh.cdefBits)) {
      fh.cdefYPri(i) = r.f(4)
      fh.cdefYSec(i) = { val s = r.f(2); if (s == 3) 4 else s }
      if (!seq.monochrome) {
        fh.cdefUVPri(i) = r.f(4)
        fh.cdefUVSec(i) = { val s = r.f(2); if (s == 3) 4 else s }
      }
      i += 1
    }
  }

  private def lrParams(seq: Seq, fh: Frame, r: Bits): Unit = {
    if (fh.allLossless || fh.allowIntrabc || !seq.enableRestoration) {
      fh.lrType = Array(0, 0, 0)
      return
    }
    val remap = Array(0, 3, 1, 2) // NONE, SWITCHABLE, WIENER, SGRPROJ
    var usesLr = false
    var usesChroma = false
    val n = if (seq.monochrome) 1 else 3
    var i = 0
    while (i < n) {
      fh.lrType(i) = remap(r.f(2))
      if (fh.lrType(i) != 0) { usesLr = true; if (i > 0) usesChroma = true }
      i += 1
    }
    if (usesLr) {
      if (seq.use128x128Superblock) fh.lrUnitShift = r.f(1) + 1
      else {
        fh.lrUnitShift = r.f(1)
        if (fh.lrUnitShift == 1) fh.lrUnitShift += r.f(1)
      }
      if (seq.subsamplingX == 1 && seq.subsamplingY == 1 && usesChroma)
        fh.lrUvShift = r.f(1)
    }
  }
}
