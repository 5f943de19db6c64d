package graft.operators.av1

/** AV1 loop restoration (spec 7.17): Wiener and self-guided (sgrproj)
  * filters over restoration units, processed in 64-luma-px stripes
  * offset by -8. Sources: rows INSIDE the current stripe read the CDEF
  * output; rows outside clamp to stripe +/- 2 and read the DEBLOCKED
  * (pre-CDEF) frame — the spec's get_source_sample. No superres on
  * this profile, so UpscaledCurrFrame == CurrFrame.
  *
  * Sgr s-values are the precomputed libaom av1_sgr_params constants,
  * verified against the spec formula
  * s = ((1 << SGRPROJ_MTABLE_BITS) + n*n*e/2) / (n*n*e) (NOTES_r17).
  */
object Av1Restoration {

  /** Sgr_Params radii per set: (r0, r1) */
  val SgrRadius: Array[Array[Int]] = Array(
    Array(2, 1), Array(2, 1), Array(2, 1), Array(2, 1),
    Array(2, 1), Array(2, 1), Array(2, 1), Array(2, 1),
    Array(2, 1), Array(2, 1), Array(0, 1), Array(0, 1),
    Array(0, 1), Array(0, 1), Array(2, 0), Array(2, 0))

  /** Sgr s per set/pass (0 where the pass is disabled) */
  private val SgrS: Array[Array[Int]] = Array(
    Array(140, 3236), Array(112, 2158), Array(93, 1618), Array(80, 1438),
    Array(70, 1295), Array(58, 1177), Array(47, 1079), Array(37, 996),
    Array(30, 925), Array(25, 863), Array(0, 2589), Array(0, 1618),
    Array(0, 1177), Array(0, 925), Array(56, 0), Array(22, 0))

  def apply(d: Av1FrameDecode, deblocked: Array[Array[Int]]): Unit = {
    if (!d.usesLr || d.fh.allowIntrabc) return
    var pl = 0
    while (pl < d.numPlanes) {
      if (d.fh.lrType(pl) != 0) restorePlane(d, pl, deblocked(pl))
      pl += 1
    }
  }

  private def restorePlane(d: Av1FrameDecode, pl: Int,
      deblocked: Array[Int]): Unit = {
    val cdefSrc = d.planes(pl).clone() // CDEF output (reads never see writes)
    val out = d.planes(pl)
    val pw = d.planeW(pl)
    val vw = d.cropW(pl)
    val vh = d.cropH(pl)
    val shY = if (pl == 0) 0 else d.subY
    val unitSize = d.lrSize(pl)
    val unitRows = d.lrUnitRows(pl)
    val unitCols = d.lrUnitCols(pl)
    val bd = d.bd

    var y0 = 0
    while (y0 < vh) {
      val lumaY = y0 << shY
      val stripeNum = (lumaY + 8) / 64
      val ssY = (-8 + stripeNum * 64) >> shY // stripe start (may be < 0)
      val seY = ssY + (64 >> shY) - 1
      val yEnd = math.min(vh - 1, seY)
      val unitRow = math.min(unitRows - 1,
        (((y0 << shY) + 8) >> shY) / unitSize)

      // stripe-aware source fetch (spec 7.17.1 get_source_sample)
      @inline def src(x0: Int, yy0: Int): Int = {
        val x = math.max(0, math.min(vw - 1, x0))
        var y = math.max(0, math.min(vh - 1, yy0))
        if (y >= ssY && y <= seY) cdefSrc(y * pw + x)
        else {
          y = math.max(ssY - 2, math.min(seY + 2, y))
          y = math.max(0, math.min(vh - 1, y))
          deblocked(y * pw + x)
        }
      }

      var uc = 0
      while (uc < unitCols) {
        val xStart = uc * unitSize
        val xEnd = if (uc == unitCols - 1) vw else (uc + 1) * unitSize
        val idx = unitRow * unitCols + uc
        d.lrUnitType(pl)(idx) match {
          case 1 =>
            wienerRect(d, pl, idx, src, out, pw, bd,
              xStart, xEnd, y0, yEnd + 1)
          case 2 =>
            sgrRect(d, pl, idx, src, out, pw, bd,
              xStart, xEnd, y0, yEnd + 1)
          case _ => () // RESTORE_NONE: cdef output stays
        }
        uc += 1
      }
      y0 = yEnd + 1
    }
  }

  /** Wiener filter over one (stripe x unit) rectangle (spec 7.17.4) */
  private def wienerRect(d: Av1FrameDecode, pl: Int, idx: Int,
      src: (Int, Int) => Int, out: Array[Int], pw: Int, bd: Int,
      xStart: Int, xEnd: Int, yStart: Int, yEnd: Int): Unit = {
    val taps = d.lrWiener(pl)
    // pass 0 = vertical, pass 1 = horizontal; 7-tap from 3 coded coeffs
    def filt7(pass: Int): Array[Int] = {
      val c0 = taps(idx * 6 + pass * 3)
      val c1 = taps(idx * 6 + pass * 3 + 1)
      val c2 = taps(idx * 6 + pass * 3 + 2)
      Array(c0, c1, c2, 128 - 2 * (c0 + c1 + c2), c2, c1, c0)
    }
    val vf = filt7(0)
    val hf = filt7(1)
    val ir0 = if (bd == 12) 5 else 3
    val ir1 = if (bd == 12) 9 else 11
    val hOff = 1 << (bd + 6) // 1 << (bd + FILTER_BITS - 1)
    val vOff = 1 << (bd + ir1 - 1)
    val limit = (1 << (bd + 1 + 7 - ir0)) - 1
    val hi = d.pixMax
    val w = xEnd - xStart
    val h = yEnd - yStart
    // horizontal pass over rows yStart-3 .. yEnd+2, cols xStart..xEnd
    val iw = w
    val ih = h + 6
    val inter = new Array[Int](iw * ih)
    var i = 0
    while (i < ih) {
      val y = yStart + i - 3
      var j = 0
      while (j < iw) {
        val x = xStart + j
        var s = 0L
        var t = 0
        while (t < 7) { s += hf(t).toLong * src(x + t - 3, y); t += 1 }
        var v = ((s + hOff + (1L << (ir0 - 1))) >> ir0).toInt
        if (v < 0) v = 0
        if (v > limit) v = limit
        inter(i * iw + j) = v
        j += 1
      }
      i += 1
    }
    // vertical pass
    i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        var s = 0L
        var t = 0
        while (t < 7) { s += vf(t).toLong * inter((i + t) * iw + j); t += 1 }
        var v = ((s - vOff + (1L << (ir1 - 1))) >> ir1).toInt
        if (v < 0) v = 0
        if (v > hi) v = hi
        out((yStart + i) * pw + xStart + j) = v
        j += 1
      }
      i += 1
    }
  }

  /** self-guided filter over one rectangle (spec 7.17.3) */
  private def sgrRect(d: Av1FrameDecode, pl: Int, idx: Int,
      src: (Int, Int) => Int, out: Array[Int], pw: Int, bd: Int,
      xStart: Int, xEnd: Int, yStart: Int, yEnd: Int): Unit = {
    val set = d.lrSgrSet(pl)(idx)
    val xqd0 = d.lrSgrXqd(pl)(idx * 2)
    val xqd1 = d.lrSgrXqd(pl)(idx * 2 + 1)
    val r0 = SgrRadius(set)(0)
    val r1 = SgrRadius(set)(1)
    val w = xEnd - xStart
    val h = yEnd - yStart
    val flt0 = if (r0 != 0) boxFilter(src, bd, xStart, yStart, w, h,
      r0, SgrS(set)(0)) else null
    val flt1 = if (r1 != 0) boxFilter(src, bd, xStart, yStart, w, h,
      r1, SgrS(set)(1)) else null
    // xq derivation (libaom av1_decode_xq; the r17 drill pinned the
    // both-passes case: xq1 is NORMALIZED, not the raw coded xqd1)
    var xq0 = 0
    var xq1 = 0
    if (r0 == 0) { xq0 = 0; xq1 = (1 << 7) - xqd1 }
    else if (r1 == 0) { xq0 = xqd0; xq1 = 0 }
    else { xq0 = xqd0; xq1 = (1 << 7) - xq0 - xqd1 }
    val hi = d.pixMax
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        val u = src(xStart + j, yStart + i) << 4 // SGRPROJ_RST_BITS
        var v = u.toLong << 7 // SGRPROJ_PRJ_BITS
        if (r0 != 0) v += xq0.toLong * (flt0(i * w + j) - u)
        if (r1 != 0) v += xq1.toLong * (flt1(i * w + j) - u)
        var s = ((v + (1L << 10)) >> 11).toInt // PRJ_BITS + RST_BITS
        if (s < 0) s = 0
        if (s > hi) s = hi
        out((yStart + i) * pw + xStart + j) = s
        j += 1
      }
      i += 1
    }
  }

  /** one box-filter pass (spec 7.17.3); returns the filtered plane
    * values for the rectangle
    */
  private def boxFilter(src: (Int, Int) => Int, bd: Int,
      x0: Int, y0: Int, w: Int, h: Int, r: Int, s: Int): Array[Int] = {
    val n = (2 * r + 1) * (2 * r + 1)
    val oneOverN = ((1 << 12) + (n >> 1)) / n // SGRPROJ_RECIP_BITS
    // A/B over i,j in -1..h / -1..w; for r==2 only rows with
    // ((i + y0?) parity) -- per libaom: computed at relative odd i
    val aw = w + 2
    val A = new Array[Int](aw * (h + 2))
    val B = new Array[Int](aw * (h + 2))
    // r==2 computes A/B only at ODD relative rows (-1, 1, 3, ...); even
    // output rows read the rows above/below, odd rows their own
    var i = -1
    while (i < h + 1) {
      if (r != 2 || (i & 1) != 0) {
        var j = -1
        while (j < w + 1) {
          var a = 0L
          var b = 0L
          var dy = -r
          while (dy <= r) {
            var dx = -r
            while (dx <= r) {
              val c = src(x0 + j + dx, y0 + i + dy)
              a += c.toLong * c
              b += c
              dx += 1
            }
            dy += 1
          }
          val shift2 = 2 * (bd - 8)
          val d2 = if (shift2 == 0) a else (a + (1L << (shift2 - 1))) >> shift2
          val c2 = if (bd == 8) b else (b + (1L << (bd - 9))) >> (bd - 8)
          val p = math.max(0L, d2 * n - c2 * c2)
          val z = ((p * s + (1L << 19)) >> 20).toInt // SGRPROJ_MTABLE_BITS
          val a2 =
            if (z >= 255) 256
            else if (z == 0) 1
            else ((z << 8) + (z >> 1)) / (z + 1) // SGRPROJ_SGR_BITS
          val b2 = ((1 << 8) - a2).toLong * b * oneOverN
          A((i + 1) * aw + (j + 1)) = a2
          B((i + 1) * aw + (j + 1)) = ((b2 + (1L << 11)) >> 12).toInt
          j += 1
        }
      }
      i += 1
    }
    val outF = new Array[Int](w * h)
    i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        val k = (i + 1) * aw + (j + 1)
        var a = 0L
        var b = 0L
        var shift = 0
        if (r == 2) {
          if ((i & 1) == 0) {
            // even rows: rows i-1 / i+1 were computed
            a = (A(k - aw) + A(k + aw)).toLong * 6 +
              (A(k - aw - 1) + A(k - aw + 1) +
                A(k + aw - 1) + A(k + aw + 1)).toLong * 5
            b = (B(k - aw) + B(k + aw)).toLong * 6 +
              (B(k - aw - 1) + B(k - aw + 1) +
                B(k + aw - 1) + B(k + aw + 1)).toLong * 5
            shift = 9 // SGRPROJ_SGR_BITS + 5 - SGRPROJ_RST_BITS
          } else {
            a = A(k).toLong * 6 + (A(k - 1) + A(k + 1)).toLong * 5
            b = B(k).toLong * 6 + (B(k - 1) + B(k + 1)).toLong * 5
            shift = 8
          }
        } else {
          a = (A(k) + A(k - 1) + A(k + 1) + A(k - aw) + A(k + aw)).toLong * 4 +
            (A(k - aw - 1) + A(k - aw + 1) +
              A(k + aw - 1) + A(k + aw + 1)).toLong * 3
          b = (B(k) + B(k - 1) + B(k + 1) + B(k - aw) + B(k + aw)).toLong * 4 +
            (B(k - aw - 1) + B(k - aw + 1) +
              B(k + aw - 1) + B(k + aw + 1)).toLong * 3
          shift = 9
        }
        val v = a * src(x0 + j, y0 + i) + b
        outF(i * w + j) = ((v + (1L << (shift - 1))) >> shift).toInt
        j += 1
      }
      i += 1
    }
    outF
  }
}
