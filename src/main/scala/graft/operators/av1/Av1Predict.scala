package graft.operators.av1

/** Intra prediction (spec 7.11.2): basic modes, directional zones with
  * the normative edge filter / upsampling, CfL and filter-intra.
  *
  * Edge arrays use a +2 index offset: arr(i + 2) = spec array[i], so
  * spec indices -2..-1 (needed by zone-2 negative bases and
  * upsampling) are representable. The caller prepares availability
  * replication; helpers here implement the corner/edge filters and
  * upsampling in place.
  */
object Av1Predict {
  import Av1Consts._

  private val smWeights = Av1Tables.flat("sm_weights")
  private val drDeriv = Av1Tables.flat("dr_intra_derivative")

  final val Off = 2 // index offset of spec position 0 in edge arrays

  private def smOff(d: Int): Int = d match {
    case 4 => 0
    case 8 => 4
    case 16 => 12
    case 32 => 28
    case 64 => 60
    case _ => throw new IllegalArgumentException(s"sm dim $d")
  }

  @inline private def r2(x: Int, n: Int): Int = (x + (1 << (n - 1))) >> n

  /** DC / V / H / SMOOTH* / PAETH. above(Off + i) = AboveRow[i],
    * left(Off + i) = LeftCol[i]; corner at index Off - 1.
    */
  def basicPredict(mode: Int, out: Array[Int], w: Int, h: Int,
      above: Array[Int], left: Array[Int], haveAbove: Boolean,
      haveLeft: Boolean, bd: Int): Unit = {
    mode match {
      case DC_PRED =>
        var sum = 0
        var cnt = 0
        if (haveAbove) {
          var i = 0; while (i < w) { sum += above(Off + i); i += 1 }; cnt += w
        }
        if (haveLeft) {
          var i = 0; while (i < h) { sum += left(Off + i); i += 1 }; cnt += h
        }
        val dc = if (cnt == 0) 1 << (bd - 1) else (sum + (cnt >> 1)) / cnt
        java.util.Arrays.fill(out, 0, w * h, dc)
      case V_PRED =>
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) { out(r * w + c) = above(Off + c); c += 1 }
          r += 1
        }
      case H_PRED =>
        var r = 0
        while (r < h) {
          java.util.Arrays.fill(out, r * w, r * w + w, left(Off + r))
          r += 1
        }
      case PAETH_PRED =>
        val tl = above(Off - 1)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val t = above(Off + c)
            val l = left(Off + r)
            val base = t + l - tl
            val pT = math.abs(base - t)
            val pL = math.abs(base - l)
            val pTl = math.abs(base - tl)
            out(r * w + c) =
              if (pL <= pT && pL <= pTl) l
              else if (pT <= pTl) t
              else tl
            c += 1
          }
          r += 1
        }
      case SMOOTH_PRED =>
        val wOffH = smOff(h)
        val wOffW = smOff(w)
        val below = left(Off + h - 1)
        val right = above(Off + w - 1)
        var r = 0
        while (r < h) {
          val wv = smWeights(wOffH + r)
          var c = 0
          while (c < w) {
            val wh = smWeights(wOffW + c)
            val p = wv * above(Off + c) + (256 - wv) * below +
              wh * left(Off + r) + (256 - wh) * right
            out(r * w + c) = r2(p, 9)
            c += 1
          }
          r += 1
        }
      case SMOOTH_V_PRED =>
        val wOffH = smOff(h)
        val below = left(Off + h - 1)
        var r = 0
        while (r < h) {
          val wv = smWeights(wOffH + r)
          var c = 0
          while (c < w) {
            out(r * w + c) = r2(wv * above(Off + c) + (256 - wv) * below, 8)
            c += 1
          }
          r += 1
        }
      case SMOOTH_H_PRED =>
        val wOffW = smOff(w)
        val right = above(Off + w - 1)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val wh = smWeights(wOffW + c)
            out(r * w + c) = r2(wh * left(Off + r) + (256 - wh) * right, 8)
            c += 1
          }
          r += 1
        }
      case _ => throw new IllegalStateException(s"basicPredict $mode")
    }
  }

  // ---------------- directional (spec 7.11.2.4) ----------------
  def directionalPredict(out: Array[Int], w: Int, h: Int, pAngle: Int,
      above: Array[Int], left: Array[Int], upsampleAbove: Boolean,
      upsampleLeft: Boolean): Unit = {
    val upA = if (upsampleAbove) 1 else 0
    val upL = if (upsampleLeft) 1 else 0
    if (pAngle < 90) {
      val dx = drDeriv(pAngle >> 1)
      val maxBaseX = (w + h - 1) << upA
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) {
          val idx = (i + 1) * dx
          val base = (idx >> (6 - upA)) + (j << upA)
          val shift = ((idx << upA) >> 1) & 0x1f
          out(i * w + j) =
            if (base < maxBaseX)
              r2(above(Off + base) * (32 - shift) +
                above(Off + base + 1) * shift, 5)
            else above(Off + maxBaseX)
          j += 1
        }
        i += 1
      }
    } else if (pAngle > 90 && pAngle < 180) {
      val dx = drDeriv((180 - pAngle) >> 1)
      val dy = drDeriv((pAngle - 90) >> 1)
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) {
          val idxX = (j << 6) - (i + 1) * dx
          val baseX = idxX >> (6 - upA)
          out(i * w + j) =
            if (baseX >= -(1 << upA)) {
              val shift = ((idxX << upA) >> 1) & 0x1f
              r2(above(Off + baseX) * (32 - shift) +
                above(Off + baseX + 1) * shift, 5)
            } else {
              val idxY = (i << 6) - (j + 1) * dy
              val baseY = idxY >> (6 - upL)
              val shift = ((idxY << upL) >> 1) & 0x1f
              r2(left(Off + baseY) * (32 - shift) +
                left(Off + baseY + 1) * shift, 5)
            }
          j += 1
        }
        i += 1
      }
    } else if (pAngle > 180) {
      val dy = drDeriv((270 - pAngle) >> 1)
      val maxBaseY = (w + h - 1) << upL
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) {
          val idx = (j + 1) * dy
          val base = (idx >> (6 - upL)) + (i << upL)
          val shift = ((idx << upL) >> 1) & 0x1f
          out(i * w + j) =
            if (base < maxBaseY)
              r2(left(Off + base) * (32 - shift) +
                left(Off + base + 1) * shift, 5)
            else left(Off + maxBaseY)
          j += 1
        }
        i += 1
      }
    } else if (pAngle == 90) {
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) { out(i * w + j) = above(Off + j); j += 1 }
        i += 1
      }
    } else { // 180
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) { out(i * w + j) = left(Off + i); j += 1 }
        i += 1
      }
    }
  }

  // ---------------- edge preparation helpers ----------------

  /** spec 7.11.2.9 intra_edge_filter_strength */
  def filterStrength(w: Int, h: Int, filterType: Int, delta: Int): Int = {
    val d = math.abs(delta)
    val blkWh = w + h
    if (filterType == 0) {
      if (blkWh <= 8) { if (d >= 56) 1 else 0 }
      else if (blkWh <= 12) { if (d >= 40) 1 else 0 }
      else if (blkWh <= 16) { if (d >= 40) 1 else 0 }
      else if (blkWh <= 24) {
        if (d >= 32) 3 else if (d >= 16) 2 else if (d >= 8) 1 else 0
      } else if (blkWh <= 32) {
        if (d >= 32) 3 else if (d >= 4) 2 else 1
      } else 3
    } else {
      if (blkWh <= 8) { if (d >= 64) 2 else if (d >= 40) 1 else 0 }
      else if (blkWh <= 16) { if (d >= 48) 2 else if (d >= 20) 1 else 0 }
      else if (blkWh <= 24) { if (d >= 4) 3 else 0 }
      else 3
    }
  }

  /** spec 7.11.2.11 use_intra_edge_upsample */
  def useUpsample(w: Int, h: Int, delta: Int, filterType: Int): Boolean = {
    val d = math.abs(delta)
    val blkWh = w + h
    if (d <= 0 || d >= 40) false
    else if (filterType == 1) blkWh <= 8
    else blkWh <= 16
  }

  private val EdgeKernel: Array[Array[Int]] = Array(
    Array(0, 4, 8, 4, 0), Array(0, 5, 6, 5, 0), Array(2, 4, 4, 4, 2))

  /** spec 7.11.2.12 intra_edge_filter: filters edge(Off-1 .. Off+sz-2)
    * i.e. spec positions -1..sz-2? No: spec filters positions
    * 0..sz-1 of the buffer that STARTS at the corner; here `start` is
    * the spec index of the first entry (use -1 to include the corner)
    * and sz the count.
    */
  def edgeFilter(edge: Array[Int], start: Int, sz: Int,
      strength: Int): Unit = {
    if (strength == 0 || sz <= 1) return
    val k = EdgeKernel(strength - 1)
    val src = new Array[Int](sz)
    var i = 0
    while (i < sz) { src(i) = edge(Off + start + i); i += 1 }
    i = 1
    while (i < sz) {
      var s = 0
      var j = 0
      while (j < 5) {
        val idx = math.max(0, math.min(sz - 1, i - 2 + j))
        s += k(j) * src(idx)
        j += 1
      }
      edge(Off + start + i) = (s + 8) >> 4
      i += 1
    }
  }

  /** spec 7.11.2.10 upsample_intra_edge: doubles the first `sz`
    * entries (spec positions 0..sz-1) into positions -2..2*sz-2.
    */
  def upsampleEdge(edge: Array[Int], sz: Int, bd: Int): Unit = {
    // dup = [e[-1], e[-1], e[0..sz-1], e[sz-1]]; even outputs keep the
    // original samples, odd outputs are the (-1,9,9,-1)/16 half-pels.
    val dup = new Array[Int](sz + 3)
    dup(0) = edge(Off - 1)
    dup(1) = edge(Off - 1)
    var i = 0
    while (i < sz) { dup(i + 2) = edge(Off + i); i += 1 }
    dup(sz + 2) = edge(Off + sz - 1)
    val hi = (1 << bd) - 1
    edge(Off - 2) = dup(0)
    i = 0
    while (i < sz) {
      var s = -dup(i) + 9 * dup(i + 1) + 9 * dup(i + 2) - dup(i + 3)
      s = math.max(0, math.min(hi, (s + 8) >> 4))
      edge(Off + 2 * i - 1) = s
      edge(Off + 2 * i) = dup(i + 2)
      i += 1
    }
  }

  // ---------------- filter intra (spec 7.11.2.3) ----------------
  /** normative 4x2-patch filter taps per mode [5][8][7] */
  private val FilterIntraTaps: Array[Array[Array[Int]]] = Array(
    Array(
      Array(-6, 10, 0, 0, 0, 12, 0), Array(-5, 2, 10, 0, 0, 9, 0),
      Array(-3, 1, 1, 10, 0, 7, 0), Array(-3, 1, 1, 2, 10, 5, 0),
      Array(-4, 6, 0, 0, 0, 2, 12), Array(-3, 2, 6, 0, 0, 2, 9),
      Array(-3, 2, 2, 6, 0, 2, 7), Array(-3, 1, 2, 2, 6, 3, 5)),
    Array(
      Array(-10, 16, 0, 0, 0, 10, 0), Array(-6, 0, 16, 0, 0, 6, 0),
      Array(-4, 0, 0, 16, 0, 4, 0), Array(-2, 0, 0, 0, 16, 2, 0),
      Array(-10, 16, 0, 0, 0, 0, 10), Array(-6, 0, 16, 0, 0, 0, 6),
      Array(-4, 0, 0, 16, 0, 0, 4), Array(-2, 0, 0, 0, 16, 0, 2)),
    Array(
      Array(-8, 8, 0, 0, 0, 16, 0), Array(-8, 0, 8, 0, 0, 16, 0),
      Array(-8, 0, 0, 8, 0, 16, 0), Array(-8, 0, 0, 0, 8, 16, 0),
      Array(-4, 4, 0, 0, 0, 0, 16), Array(-4, 0, 4, 0, 0, 0, 16),
      Array(-4, 0, 0, 4, 0, 0, 16), Array(-4, 0, 0, 0, 4, 0, 16)),
    Array(
      Array(-2, 8, 0, 0, 0, 10, 0), Array(-1, 3, 8, 0, 0, 6, 0),
      Array(-1, 2, 3, 8, 0, 4, 0), Array(0, 1, 2, 3, 8, 2, 0),
      Array(-1, 4, 0, 0, 0, 3, 10), Array(-1, 3, 4, 0, 0, 4, 6),
      Array(-1, 2, 3, 4, 0, 4, 4), Array(-1, 2, 2, 3, 4, 3, 3)),
    Array(
      Array(-12, 14, 0, 0, 0, 14, 0), Array(-10, 0, 14, 0, 0, 12, 0),
      Array(-9, 0, 0, 14, 0, 11, 0), Array(-8, 0, 0, 0, 14, 10, 0),
      Array(-10, 12, 0, 0, 0, 0, 14), Array(-9, 1, 12, 0, 0, 0, 12),
      Array(-8, 0, 0, 12, 0, 1, 11), Array(-7, 0, 0, 1, 12, 1, 9)))

  /** filter-intra prediction over a w x h block (w,h <= 32; processed
    * in 4x2 patches using previously predicted samples).
    */
  def filterIntraPredict(mode: Int, out: Array[Int], w: Int, h: Int,
      above: Array[Int], left: Array[Int], bd: Int): Unit = {
    val hi = (1 << bd) - 1
    // working canvas with 1-sample border on top and left
    val cw = w + 1
    val buf = new Array[Int]((h + 1) * cw)
    buf(0) = above(Off - 1)
    var j = 0
    while (j < w) { buf(1 + j) = above(Off + j); j += 1 }
    var i = 0
    while (i < h) { buf((i + 1) * cw) = left(Off + i); i += 1 }
    val taps = FilterIntraTaps(mode)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p0 = buf(y * cw + x)
        val p1 = buf(y * cw + x + 1)
        val p2 = buf(y * cw + x + 2)
        val p3 = buf(y * cw + x + 3)
        val p4 = buf(y * cw + x + 4)
        val p5 = buf((y + 1) * cw + x)
        val p6 = buf((y + 2) * cw + x)
        var py = 0
        while (py < 2) {
          var px = 0
          while (px < 4) {
            val t = taps(4 * py + px)
            // taps order: (p0..p6) weights
            val s = t(0) * p0 + t(1) * p1 + t(2) * p2 + t(3) * p3 +
              t(4) * p4 + t(5) * p5 + t(6) * p6
            val v = math.max(0, math.min(hi, (s + 8) >> 4))
            buf((y + 1 + py) * cw + x + 1 + px) = v
            px += 1
          }
          py += 1
        }
        x += 4
      }
      y += 2
    }
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = buf((y + 1) * cw + x + 1); x += 1 }
      y += 1
    }
  }

  // ---------------- CfL (spec 7.11.5) ----------------
  /** apply cfl: pred = dc + (alpha * ac) >> 6, clip; `ac` is the
    * luma AC contribution array (already averaged/subtracted).
    */
  def cflPredict(out: Array[Int], w: Int, h: Int, ac: Array[Int],
      alpha: Int, bd: Int): Unit = {
    val hi = (1 << bd) - 1
    var i = 0
    while (i < w * h) {
      val scaled = {
        val v = alpha * ac(i)
        val a = math.abs(v)
        val s = (a + 32) >> 6
        if (v < 0) -s else s
      }
      val p = out(i) + scaled
      out(i) = math.max(0, math.min(hi, p))
      i += 1
    }
  }
}
