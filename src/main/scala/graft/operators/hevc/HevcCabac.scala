package graft.operators.hevc

import HevcBits.Malformed

/** CABAC arithmetic decoding engine (spec 9.3.4.3) with the I-slice
  * context set. Engine tables come from [[HevcTables]] (binary-
  * extracted, cross-library-verified). WPP substream handling:
  * [[initSubstream]] re-initializes the engine at a byte offset and
  * [[saveStates]]/[[restoreStates]] implement the 2-CTU sync rule.
  */
final class HevcCabac(val data: Array[Byte]) {
  import HevcCabac._

  // context state: pStateIdx (6 bits) << 1 | valMps
  val ctx = new Array[Int](NumCtx)

  private var range = 0
  private var offset = 0
  private var bytePos = 0

  def initContexts(sliceQp: Int): Unit = {
    val qp = math.max(0, math.min(51, sliceQp))
    var i = 0
    while (i < NumCtx) {
      val initValue = InitFlat(i)
      val m = (initValue >> 4) * 5 - 45
      val n = ((initValue & 15) << 3) - 16
      val pre = math.max(1, math.min(126, ((m * qp) >> 4) + n))
      ctx(i) =
        if (pre <= 63) ((63 - pre) << 1) // mps 0
        else (((pre - 64) << 1) | 1)
      i += 1
    }
  }

  private var bitInByte = 0
  private def nextBit(): Int = {
    if (bytePos >= data.length) {
      // spec allows reading past the end as zeros during the final
      // renorms of the last bins
      bitInByte += 1
      if (bitInByte > 64) throw Malformed
      return 0
    }
    val v = (data(bytePos) >> (7 - bitInByte)) & 1
    bitInByte += 1
    if (bitInByte == 8) { bitInByte = 0; bytePos += 1 }
    v
  }

  /** (Re-)start arithmetic decoding at a byte offset (9.3.2.5) — the
    * slice-data start or a WPP substream entry point. */
  def initAt(byteOffset: Int): Unit = {
    bytePos = byteOffset
    bitInByte = 0
    range = 510
    offset = 0
    var i = 0
    while (i < 9) { offset = (offset << 1) | nextBit(); i += 1 }
    if (offset >= 510) throw Malformed
  }

  def decodeBin(ctxIdx: Int): Int = {
    val s = ctx(ctxIdx)
    val pState = s >> 1
    val mps = s & 1
    val qIdx = (range >> 6) & 3
    val lps = HevcTables.RangeTabLps(pState * 4 + qIdx)
    range -= lps
    var bin = 0
    if (offset >= range) {
      bin = 1 - mps
      offset -= range
      range = lps
      if (pState == 0) {
        ctx(ctxIdx) = (HevcTables.TransIdxLps(0) << 1) | (1 - mps)
      } else {
        ctx(ctxIdx) = (HevcTables.TransIdxLps(pState) << 1) | mps
      }
    } else {
      bin = mps
      val next = if (pState < 62) pState + 1 else pState
      ctx(ctxIdx) = (next << 1) | mps
    }
    while (range < 256) {
      range <<= 1
      offset = (offset << 1) | nextBit()
    }
    bin
  }

  def decodeBypass(): Int = {
    offset = (offset << 1) | nextBit()
    if (offset >= range) { offset -= range; 1 } else 0
  }

  def decodeBypassN(n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) { v = (v << 1) | decodeBypass(); i += 1 }
    v
  }

  /** end_of_slice_segment_flag / pcm terminate bin (9.3.4.3.5). */
  def decodeTerminate(): Int = {
    range -= 2
    if (offset >= range) 1
    else {
      while (range < 256) {
        range <<= 1
        offset = (offset << 1) | nextBit()
      }
      0
    }
  }

  /** Truncated-Rice bypass suffix + k-th order Exp-Golomb
    * (coeff_abs_level_remaining, 9.3.3.13). */
  def decodeCoeffAbsLevelRemaining(rice: Int): Int = {
    // unary prefix over bypass bins, capped at 4 then EG(rice+1)
    var prefix = 0
    while (prefix < 32 && decodeBypass() == 1) prefix += 1
    if (prefix >= 32) throw Malformed
    if (prefix <= 3) {
      (prefix << rice) + (if (rice > 0) decodeBypassN(rice) else 0)
    } else {
      val egk = prefix - 3 + rice
      (((1 << (prefix - 3)) + 3 - 1) << rice) + decodeBypassN(egk)
    }
  }

  /** Context-state snapshot for WPP sync (9.3.2.3). */
  def saveStates(dst: Array[Int]): Unit = System.arraycopy(ctx, 0, dst, 0,
    NumCtx)
  def restoreStates(src: Array[Int]): Unit = System.arraycopy(src, 0, ctx,
    0, NumCtx)
}

object HevcCabac {
  // flat context layout (I-slice initType 0 only)
  val SaoMerge = 0
  val SaoTypeIdx = 1
  val SplitCu = 2 // 3
  val PartMode = 5
  val PrevIntraLuma = 6
  val ChromaPredMode = 7
  val SplitTransform = 8 // 3
  val CbfLuma = 11 // 2
  val CbfChroma = 13 // 5
  val CuQpDeltaAbs = 18 // 2
  val LastX = 20 // 18
  val LastY = 38 // 18
  val SubBlock = 56 // 4
  val Sig = 60 // 42
  val Greater1 = 102 // 24
  val Greater2 = 126 // 6
  val NumCtx = 132

  private[graft] val InitFlat: Array[Int] = {
    import HevcTables._
    val out = new Array[Int](NumCtx)
    def put(at: Int, vals: Array[Int]): Unit =
      System.arraycopy(vals, 0, out, at, vals.length)
    put(SaoMerge, initSaoMerge)
    put(SaoTypeIdx, initSaoTypeIdx)
    put(SplitCu, initSplitCu)
    put(PartMode, initPartMode)
    put(PrevIntraLuma, initPrevIntraLuma)
    put(ChromaPredMode, initChromaPredMode)
    put(SplitTransform, initSplitTransform)
    put(CbfLuma, initCbfLuma)
    put(CbfChroma, initCbfChroma)
    put(CuQpDeltaAbs, initCuQpDeltaAbs)
    put(LastX, initLastPrefix)
    put(LastY, initLastPrefix)
    put(SubBlock, initSubBlock)
    put(Sig, initSigCoeff)
    put(Greater1, initGreater1)
    put(Greater2, initGreater2)
    out
  }
}
