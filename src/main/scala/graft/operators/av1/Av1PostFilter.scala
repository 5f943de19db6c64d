package graft.operators.av1

/** Deblocking loop filter (spec 7.14): frame-wide vertical-edge pass
  * then horizontal-edge pass per plane, edge taps selected from the
  * two adjacent transform sizes (4/8/14 luma, 4/6 chroma), thresholds
  * from the frame filter levels and sharpness. Intra-frame scope: all
  * blocks reference INTRA, so levels are uniform per plane/pass
  * (segmentation and delta-LF streams reject upstream).
  */
object Av1LoopFilter {
  import Av1Consts._
  import Av1Headers.Unsupported

  def apply(d: Av1FrameDecode): Unit = {
    val fh = d.fh
    if (fh.deltaLfPresent) throw Unsupported("delta_lf")
    if (fh.lfLevel(0) == 0 && fh.lfLevel(1) == 0 &&
      fh.lfLevel(2) == 0 && fh.lfLevel(3) == 0) return

    var plane = 0
    while (plane < d.numPlanes) {
      {
      var pass = 0
      while (pass < 2) {
        val lvl = levelFor(d, plane, pass)
        if (lvl > 0) filterPass(d, plane, pass, lvl)
        pass += 1
      }
      plane += 1
      }
    }
  }

  private def levelFor(d: Av1FrameDecode, plane: Int, pass: Int): Int = {
    val fh = d.fh
    val base = plane match {
      case 0 => fh.lfLevel(pass)
      case 1 => fh.lfLevel(2)
      case _ => fh.lfLevel(3)
    }
    if (base == 0) 0
    else if (fh.lfDeltaEnabled) {
      // all blocks are INTRA: refDeltas[0] applies, scaled per spec
      val shift = base >> 5
      math.max(0, math.min(63, base + (fh.lfRefDeltas(0) << shift)))
    } else base
  }

  private def filterPass(d: Av1FrameDecode, plane: Int, pass: Int,
      lvl: Int): Unit = {
    val fh = d.fh
    val subX = if (plane == 0) 0 else d.subX
    val subY = if (plane == 0) 0 else d.subY
    val pw = d.planeW(plane)
    val ph = d.planeH(plane)
    val vw = d.cropW(plane) // visible bounds: edges beyond are unfiltered
    val vh = d.cropH(plane)
    val buf = d.planes(plane)
    val bd = d.bd
    val scale = bd - 8
    // thresholds
    val sharpness = fh.lfSharpness
    val shift = if (sharpness > 4) 2 else if (sharpness > 0) 1 else 0
    var limit0 =
      if (sharpness > 0) math.max(1, math.min(9 - sharpness, lvl >> shift))
      else math.max(1, lvl)
    val blimit0 = 2 * (lvl + 2) + limit0
    val thresh0 = lvl >> 4
    val limit = limit0 << scale
    val blimit = blimit0 << scale
    val thresh = thresh0 << scale
    val flatT = 1 << scale
    val hiv = d.pixMax

    val rowStep = 1 << subY
    val colStep = 1 << subX
    val miCols = d.miCols
    val miRows = d.miRows

    // for chroma, block attribution is the bottom-right mi of the 2x2
    // luma group (the block that coded the chroma of that unit)
    @inline def miIdx(r: Int, c: Int): Int =
      if (plane == 0) r * miCols + c
      else math.min(r | subY, miRows - 1) * miCols + math.min(c | subX, miCols - 1)
    @inline def txOf(r: Int, c: Int): Int =
      if (plane == 0) d.txSzY(r * miCols + c) else d.txSzUV(miIdx(r, c))

    var row = 0
    while (row < miRows) {
      var col = 0
      while (col < miCols) {
        val xP = (col >> subX) * 4
        val yP = (row >> subY) * 4
        val skipEdge =
          if (pass == 0) xP == 0 || xP >= vw
          else yP == 0 || yP >= vh
        if (!skipEdge) {
          val tx = txOf(row, col)
          val curDim = if (pass == 0) TxW(tx) else TxH(tx)
          val pos = if (pass == 0) xP else yP
          val isTxEdge = pos % curDim == 0
          if (isTxEdge) {
            val (pr, pc) =
              if (pass == 0) (row, col - colStep) else (row - rowStep, col)
            val prevTx = txOf(pr, pc)
            val prevDim = if (pass == 0) TxW(prevTx) else TxH(prevTx)
            // block edge when the (plane-aligned) prediction-block
            // origin coincides with this edge position
            val originMi =
              if (pass == 0) d.blockOriginC(miIdx(row, col)) & ~subX
              else d.blockOriginR(miIdx(row, col)) & ~subY
            val originP2 = (originMi >> (if (pass == 0) subX else subY)) * 4
            val isBlockEdge = pos == originP2
            val skipCur = d.skips(miIdx(row, col))
            val skipPrev = d.skips(miIdx(pr, pc))
            if (isBlockEdge || !skipCur || !skipPrev) {
              val minDim = math.min(curDim, prevDim)
              val taps =
                if (plane == 0) { if (minDim >= 16) 14 else if (minDim >= 8) 8 else 4 }
                else { if (minDim >= 8) 6 else 4 }
              // filter 4 sample lines (one 4x4 unit)
              var k = 0
              while (k < 4) {
                if (pass == 0) {
                  val y = yP + k
                  if (y < vh)
                    filterLine(buf, y * pw + xP, 1, taps, limit, blimit,
                      thresh, flatT, hiv)
                } else {
                  val x = xP + k
                  if (x < vw)
                    filterLine(buf, yP * pw + x, pw, taps, limit, blimit,
                      thresh, flatT, hiv)
                }
                k += 1
              }
            }
          }
        }
        col += colStep
      }
      row += rowStep
    }
  }

  /** filter one sample line across an edge: buf(base) = q0,
    * buf(base - step) = p0.
    */
  private def filterLine(buf: Array[Int], base: Int, step: Int,
      taps: Int, limit: Int, blimit: Int, thresh: Int, flatT: Int,
      hiv: Int): Unit = {
    @inline def p(i: Int): Int = buf(base - (i + 1) * step)
    @inline def q(i: Int): Int = buf(base + i * step)
    @inline def sp(i: Int, v: Int): Unit = buf(base - (i + 1) * step) = v
    @inline def sq(i: Int, v: Int): Unit = buf(base + i * step) = v
    @inline def ab(x: Int): Int = math.abs(x)
    @inline def r3(x: Int): Int = (x + 4) >> 3
    @inline def r4(x: Int): Int = (x + 8) >> 4

    val p0 = p(0); val p1 = p(1)
    val q0 = q(0); val q1 = q(1)
    // base mask (2 taps each side)
    var mask = ab(p1 - p0) <= limit && ab(q1 - q0) <= limit &&
      ab(p0 - q0) * 2 + ab(p1 - q1) / 2 <= blimit
    if (!mask) return

    val bdClampHi = (hiv + 1) / 2 - 1 // (1 << (bd-1)) - 1
    val bdClampLo = -(hiv + 1) / 2
    @inline def c3(x: Int): Int =
      if (x < bdClampLo) bdClampLo else if (x > bdClampHi) bdClampHi else x
    @inline def clip1(x: Int): Int =
      if (x < 0) 0 else if (x > hiv) hiv else x

    def filter4(): Unit = {
      val hev = ab(p1 - p0) > thresh || ab(q1 - q0) > thresh
      var f = if (hev) c3(p1 - q1) else 0
      f = c3(f + 3 * (q0 - p0))
      val f1 = c3(f + 4) >> 3
      val f2 = c3(f + 3) >> 3
      sq(0, clip1(q0 - f1))
      sp(0, clip1(p0 + f2))
      if (!hev) {
        val f3 = (f1 + 1) >> 1
        sq(1, clip1(q1 - f3))
        sp(1, clip1(p1 + f3))
      }
    }

    taps match {
      case 4 => filter4()
      case 6 =>
        val p2 = p(2); val q2 = q(2)
        mask = mask && ab(p2 - p1) <= limit && ab(q2 - q1) <= limit
        if (!mask) return
        val flat = ab(p1 - p0) <= flatT && ab(q1 - q0) <= flatT &&
          ab(p2 - p0) <= flatT && ab(q2 - q0) <= flatT
        if (flat) {
          val op1 = r3(p2 * 3 + p1 * 2 + p0 * 2 + q0)
          val op0 = r3(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1)
          val oq0 = r3(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2)
          val oq1 = r3(p0 + q0 * 2 + q1 * 2 + q2 * 3)
          sp(1, op1); sp(0, op0); sq(0, oq0); sq(1, oq1)
        } else filter4()
      case _ =>
        val p2 = p(2); val p3 = p(3)
        val q2 = q(2); val q3 = q(3)
        mask = mask && ab(p2 - p1) <= limit && ab(q2 - q1) <= limit &&
          ab(p3 - p2) <= limit && ab(q3 - q2) <= limit
        if (!mask) { return }
        val flat = ab(p1 - p0) <= flatT && ab(q1 - q0) <= flatT &&
          ab(p2 - p0) <= flatT && ab(q2 - q0) <= flatT &&
          ab(p3 - p0) <= flatT && ab(q3 - q0) <= flatT
        if (taps == 14) {
          val p4 = p(4); val p5 = p(5); val p6 = p(6)
          val q4 = q(4); val q5 = q(5); val q6 = q(6)
          val flat2 = ab(p4 - p0) <= flatT && ab(q4 - q0) <= flatT &&
            ab(p5 - p0) <= flatT && ab(q5 - q0) <= flatT &&
            ab(p6 - p0) <= flatT && ab(q6 - q0) <= flatT
          if (flat && flat2) {
            sp(5, r4(p6 * 7 + p5 * 2 + p4 + p3 + p2 + p1 + p0 + q0))
            sp(4, r4(p6 * 5 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0 + q1))
            sp(3, r4(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1 + q2))
            sp(2, r4(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1 + q2 + q3))
            sp(1, r4(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 + q0 + q1 + q2 + q3 + q4))
            sp(0, r4(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 + q1 + q2 + q3 + q4 + q5))
            sq(0, r4(q6 + q5 + q4 + q3 + q2 + q1 * 2 + q0 * 2 + p0 + p1 + p2 + p3 + p4 + p5))
            sq(1, r4(q6 * 2 + q5 + q4 + q3 + q2 * 2 + q1 * 2 + q0 + p0 + p1 + p2 + p3 + p4))
            sq(2, r4(q6 * 3 + q5 + q4 + q3 * 2 + q2 * 2 + q1 + q0 + p0 + p1 + p2 + p3))
            sq(3, r4(q6 * 4 + q5 + q4 * 2 + q3 * 2 + q2 + q1 + q0 + p0 + p1 + p2))
            sq(4, r4(q6 * 5 + q5 * 2 + q4 * 2 + q3 + q2 + q1 + q0 + p0 + p1))
            sq(5, r4(q6 * 7 + q5 * 2 + q4 + q3 + q2 + q1 + q0 + p0))
            return
          }
        }
        if (flat) {
          sp(2, r3(p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0))
          sp(1, r3(p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1))
          sp(0, r3(p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2))
          sq(0, r3(p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3))
          sq(1, r3(p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3))
          sq(2, r3(p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3))
        } else filter4()
    }
  }
}

/** CDEF (spec 7.15). Staged: zero-strength frames pass through;
  * nonzero strengths reject until the CDEF fixture stage lands.
  */
object Av1Cdef {
  import Av1Headers.Unsupported

  def apply(d: Av1FrameDecode): Unit = {
    val fh = d.fh
    var any = false
    var i = 0
    while (i < (1 << fh.cdefBits)) {
      if (fh.cdefYPri(i) != 0 || fh.cdefYSec(i) != 0 ||
        fh.cdefUVPri(i) != 0 || fh.cdefUVSec(i) != 0) any = true
      i += 1
    }
    if (!d.seq.enableCdef || fh.codedLossless) return
    if (any) throw Unsupported("cdef")
  }
}
