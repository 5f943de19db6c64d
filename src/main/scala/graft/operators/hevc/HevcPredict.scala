package graft.operators.hevc

/** Intra sample prediction (spec 8.4.4.2): reference-sample gather +
  * substitution, mode-dependent smoothing (incl. the 32x32 strong /
  * bilinear filter), and the planar / DC / angular predictors.
  *
  * The caller supplies an availability test (inside picture AND
  * already reconstructed in decode order — constrained intra pred is
  * rejected at the PPS, so decoded samples are always usable).
  */
object HevcPredict {
  import HevcTables.{IntraPredAngle, InvAngle}

  /** Predict an nTbS x nTbS block at (x0, y0) of `plane` (stride
    * `planeStride`), writing predictions in place. `avail(x, y)`
    * answers sample availability in plane coordinates. */
  def predict(plane: Array[Int], planeStride: Int, x0: Int, y0: Int,
      nTbS: Int, mode: Int, cIdx: Int, bitDepth: Int,
      strongIntraSmoothing: Boolean, avail: (Int, Int) => Boolean): Unit = {
    val size2 = 2 * nTbS
    // reference samples: left[0..2N-1] downward, corner, top[0..2N-1]
    val left = new Array[Int](size2)
    val top = new Array[Int](size2)
    var corner = 0
    val haveFlags = new Array[Boolean](2 * size2 + 1)
    // layout of haveFlags: 0..2N-1 = left bottom-up (index 0 = deepest
    // left sample p[-1][2N-1]), 2N = corner, 2N+1.. = top left-to-right
    def sampleAt(x: Int, y: Int): Int = plane(y * planeStride + x)
    var i = 0
    while (i < size2) {
      val y = y0 + size2 - 1 - i
      val ok = x0 > 0 && y < Int.MaxValue && avail(x0 - 1, y)
      haveFlags(i) = ok
      if (ok) left(size2 - 1 - i) = sampleAt(x0 - 1, y)
      i += 1
    }
    val cornerOk = x0 > 0 && y0 > 0 && avail(x0 - 1, y0 - 1)
    haveFlags(size2) = cornerOk
    if (cornerOk) corner = sampleAt(x0 - 1, y0 - 1)
    i = 0
    while (i < size2) {
      val x = x0 + i
      val ok = y0 > 0 && avail(x, y0 - 1)
      haveFlags(size2 + 1 + i) = ok
      if (ok) top(i) = sampleAt(x, y0 - 1)
      i += 1
    }
    // substitution (8.4.4.2.2)
    val anyAvail = haveFlags.exists(identity)
    if (!anyAvail) {
      val mid = 1 << (bitDepth - 1)
      java.util.Arrays.fill(left, mid)
      java.util.Arrays.fill(top, mid)
      corner = mid
    } else {
      // scan from index 0 (deepest left) to the end, filling gaps from
      // the previous available sample; the first run fills from the
      // first available one
      def get(idx: Int): Int =
        if (idx < size2) left(size2 - 1 - idx)
        else if (idx == size2) corner
        else top(idx - size2 - 1)
      def set(idx: Int, v: Int): Unit =
        if (idx < size2) left(size2 - 1 - idx) = v
        else if (idx == size2) corner = v
        else top(idx - size2 - 1) = v
      if (!haveFlags(0)) {
        var j = 1
        while (!haveFlags(j)) j += 1
        set(0, get(j))
        haveFlags(0) = true
      }
      var j = 1
      while (j < haveFlags.length) {
        if (!haveFlags(j)) set(j, get(j - 1))
        j += 1
      }
    }
    // filtering (8.4.4.2.3) — luma only
    var fLeft = left
    var fTop = top
    var fCorner = corner
    if (cIdx == 0 && mode != 1 && nTbS > 4) {
      val minDist = math.min(math.abs(mode - 26), math.abs(mode - 10))
      val thresh = nTbS match {
        case 8 => 7
        case 16 => 1
        case 32 => 0
        case _ => 100
      }
      val filterFlag = mode == 0 || minDist > thresh
      if (filterFlag) {
        val biIntFlag = strongIntraSmoothing && nTbS == 32 && {
          val bd5 = 1 << (bitDepth - 5)
          math.abs(corner + top(size2 - 1) - 2 * top(nTbS - 1)) < bd5 &&
          math.abs(corner + left(size2 - 1) - 2 * left(nTbS - 1)) < bd5
        }
        val nl = new Array[Int](size2)
        val nt = new Array[Int](size2)
        if (biIntFlag) {
          var k = 0
          while (k < size2 - 1) {
            nt(k) = ((63 - k) * corner + (k + 1) * top(size2 - 1) + 32) >> 6
            nl(k) = ((63 - k) * corner + (k + 1) * left(size2 - 1) + 32) >> 6
            k += 1
          }
          nt(size2 - 1) = top(size2 - 1)
          nl(size2 - 1) = left(size2 - 1)
          fCorner = corner
        } else {
          fCorner = (left(0) + 2 * corner + top(0) + 2) >> 2
          var k = 0
          while (k < size2 - 1) {
            val l0 = if (k == 0) corner else left(k - 1)
            nl(k) = (l0 + 2 * left(k) + left(k + 1) + 2) >> 2
            val t0 = if (k == 0) corner else top(k - 1)
            nt(k) = (t0 + 2 * top(k) + top(k + 1) + 2) >> 2
            k += 1
          }
          // endpoints are copied UNfiltered (8.4.4.2.3)
          nl(size2 - 1) = left(size2 - 1)
          nt(size2 - 1) = top(size2 - 1)
        }
        fLeft = nl
        fTop = nt
      }
    }

    val maxVal = (1 << bitDepth) - 1
    def clip(v: Int): Int = math.max(0, math.min(maxVal, v))
    def out(x: Int, y: Int, v: Int): Unit =
      plane((y0 + y) * planeStride + (x0 + x)) = v

    if (mode == 0) {
      // planar (8.4.4.2.4)
      val log2 = java.lang.Integer.numberOfTrailingZeros(nTbS)
      var y = 0
      while (y < nTbS) {
        var x = 0
        while (x < nTbS) {
          val v = ((nTbS - 1 - x) * fLeft(y) + (x + 1) * fTop(nTbS) +
            (nTbS - 1 - y) * fTop(x) + (y + 1) * fLeft(nTbS) + nTbS) >>
            (log2 + 1)
          out(x, y, v)
          x += 1
        }
        y += 1
      }
    } else if (mode == 1) {
      // DC (8.4.4.2.5) — uses UNfiltered refs
      val log2 = java.lang.Integer.numberOfTrailingZeros(nTbS)
      var sum = nTbS
      var k = 0
      while (k < nTbS) { sum += left(k) + top(k); k += 1 }
      val dc = sum >> (log2 + 1)
      var y = 0
      while (y < nTbS) {
        var x = 0
        while (x < nTbS) { out(x, y, dc); x += 1 }
        y += 1
      }
      if (cIdx == 0 && nTbS < 32) {
        out(0, 0, (left(0) + 2 * dc + top(0) + 2) >> 2)
        var x = 1
        while (x < nTbS) { out(x, 0, (top(x) + 3 * dc + 2) >> 2); x += 1 }
        var yy = 1
        while (yy < nTbS) {
          out(0, yy, (left(yy) + 3 * dc + 2) >> 2)
          yy += 1
        }
      }
    } else {
      // angular (8.4.4.2.6)
      val angle = IntraPredAngle(mode - 2)
      if (mode >= 18) {
        // main reference = top row
        val ref = new Array[Int](3 * nTbS + 1) // index shift nTbS
        val base = nTbS
        ref(base) = fCorner
        var x = 0
        while (x < size2) { ref(base + 1 + x) = fTop(x); x += 1 }
        if (angle < 0) {
          // spec invAngle is negative; with the positive magnitude the
          // projected left index is ((-x)*inv + 128 >> 8) - 1
          val inv = InvAngle(-angle)
          val lastIdx = (nTbS * angle) >> 5
          var xx = -1
          while (xx >= lastIdx) {
            // the deepest projected index can exceed 2N-1 for the
            // shallowest angles (it is never read then) — clamp
            ref(base + xx) =
              fLeft(math.min(size2 - 1, ((-xx * inv + 128) >> 8) - 1))
            xx -= 1
          }
        }
        var y = 0
        while (y < nTbS) {
          val iIdx = ((y + 1) * angle) >> 5
          val iFact = ((y + 1) * angle) & 31
          var x2 = 0
          while (x2 < nTbS) {
            val v =
              if (iFact == 0) ref(base + 1 + x2 + iIdx)
              else ((32 - iFact) * ref(base + 1 + x2 + iIdx) +
                iFact * ref(base + 2 + x2 + iIdx) + 16) >> 5
            out(x2, y, v)
            x2 += 1
          }
          y += 1
        }
        if (mode == 26 && cIdx == 0 && nTbS < 32) {
          var yy = 0
          while (yy < nTbS) {
            out(0, yy, clip(fTop(0) + ((fLeft(yy) - fCorner) >> 1)))
            yy += 1
          }
        }
      } else {
        // horizontal-family: main reference = left column (transposed)
        val ref = new Array[Int](3 * nTbS + 1)
        val base = nTbS
        ref(base) = fCorner
        var y = 0
        while (y < size2) { ref(base + 1 + y) = fLeft(y); y += 1 }
        if (angle < 0) {
          val inv = InvAngle(-angle)
          val lastIdx = (nTbS * angle) >> 5
          var xx = -1
          while (xx >= lastIdx) {
            ref(base + xx) =
              fTop(math.min(size2 - 1, ((-xx * inv + 128) >> 8) - 1))
            xx -= 1
          }
        }
        var x = 0
        while (x < nTbS) {
          val iIdx = ((x + 1) * angle) >> 5
          val iFact = ((x + 1) * angle) & 31
          var y2 = 0
          while (y2 < nTbS) {
            val v =
              if (iFact == 0) ref(base + 1 + y2 + iIdx)
              else ((32 - iFact) * ref(base + 1 + y2 + iIdx) +
                iFact * ref(base + 2 + y2 + iIdx) + 16) >> 5
            out(x, y2, v)
            y2 += 1
          }
          x += 1
        }
        if (mode == 10 && cIdx == 0 && nTbS < 32) {
          var xx = 0
          while (xx < nTbS) {
            out(xx, 0, clip(fLeft(0) + ((fTop(xx) - fCorner) >> 1)))
            xx += 1
          }
        }
      }
    }
  }
}
