package graft.operators.hevc

import HevcHeaders.Pps

/** In-loop filters: deblocking (spec 8.7.2) and SAO (spec 8.7.3).
  *
  * Intra-only simplification: every TU/CU boundary has boundary
  * strength 2 (both sides intra-predicted), so the edge bitmaps the
  * decoder records during transform-tree traversal ARE the bS=2 edge
  * set; PU (NxN) boundaries are 4-aligned inside 8x8 CUs and never hit
  * the 8-sample deblocking grid. The filter order is normative:
  * all vertical edges of the picture, then all horizontal edges over
  * the vertically-filtered samples. SAO runs on the deblocked picture
  * against a snapshot (the offsets must not chain).
  */
object HevcPostFilter {
  import HevcTables.{ChromaQpMap, DeblockBeta, DeblockTc}

  // ------------------------------------------------------- deblocking
  def deblock(luma: Array[Int], cbP: Array[Int], crP: Array[Int],
      alignW: Int, alignH: Int, picW: Int, picH: Int, mono: Boolean,
      qpGrid: Array[Byte], gW: Int, edgeVer: Array[Boolean],
      edgeHor: Array[Boolean], pps: Pps, bd: Int): Unit = {
    val vw = alignW / 8 + 1
    val hw = alignH / 8 + 1
    val maxVal = (1 << bd) - 1
    val cW = alignW >> 1

    def qpAt(x: Int, y: Int): Int = qpGrid((y >> 2) * gW + (x >> 2)).toInt

    // ---- luma vertical edges
    var x = 8
    while (x < picW) {
      var y4 = 0
      while ((y4 << 2) < picH) {
        if (edgeVer(y4 * vw + (x >> 3))) {
          val y0 = y4 << 2
          val segH = math.min(4, picH - y0)
          if (segH == 4)
            lumaEdge(luma, alignW, x, y0, vertical = true,
              qpAt(x - 1, y0), qpAt(x, y0), pps, bd, maxVal)
        }
        y4 += 1
      }
      x += 8
    }
    // ---- chroma vertical edges (bS always 2; chroma 8-grid => luma 16)
    if (!mono) {
      var xc = 8
      while ((xc << 1) < picW) {
        val xl = xc << 1
        var y4c = 0
        while ((y4c << 3) < picH) {
          // chroma segment of 4 rows = luma rows y4c*8 .. +8
          val ylTop = y4c << 3
          // the luma edge flag rows covering this chroma segment
          val f1 = edgeVer((ylTop >> 2) * vw + (xl >> 3))
          if (f1) {
            val segRows = math.min(4, (picH >> 1) - (y4c << 2))
            var r = 0
            while (r < segRows) {
              val yc = (y4c << 2) + r
              chromaCol(cbP, crP, cW, xc, yc,
                qpAt(xl - 1, ylTop), qpAt(xl, ylTop), pps, bd, maxVal,
                vertical = true)
              r += 1
            }
          }
          y4c += 1
        }
        xc += 8
      }
    }
    // ---- luma horizontal edges
    var y = 8
    while (y < picH) {
      var x4 = 0
      while ((x4 << 2) < picW) {
        if (edgeHor(x4 * hw + (y >> 3))) {
          val x0 = x4 << 2
          val segW = math.min(4, picW - x0)
          if (segW == 4)
            lumaEdge(luma, alignW, x0, y, vertical = false,
              qpAt(x0, y - 1), qpAt(x0, y), pps, bd, maxVal)
        }
        x4 += 1
      }
      y += 8
    }
    // ---- chroma horizontal edges
    if (!mono) {
      var yc = 8
      while ((yc << 1) < picH) {
        val yl = yc << 1
        var x4c = 0
        while ((x4c << 3) < picW) {
          val xlLeft = x4c << 3
          val f1 = edgeHor((xlLeft >> 2) * hw + (yl >> 3))
          if (f1) {
            val segCols = math.min(4, (picW >> 1) - (x4c << 2))
            var cIt = 0
            while (cIt < segCols) {
              val xc = (x4c << 2) + cIt
              chromaCol(cbP, crP, cW, xc, yc,
                qpAt(xlLeft, yl - 1), qpAt(xlLeft, yl), pps, bd, maxVal,
                vertical = false)
              cIt += 1
            }
          }
          x4c += 1
        }
        yc += 8
      }
    }
  }

  /** One luma 4-sample edge segment; bS = 2 (intra). For a vertical
    * edge, (ex, ey) is the top sample of the edge column; horizontal:
    * the left sample of the edge row. */
  private def lumaEdge(p: Array[Int], stride: Int, ex: Int, ey: Int,
      vertical: Boolean, qpP: Int, qpQ: Int, pps: Pps, bd: Int,
      maxVal: Int): Unit = {
    val qpL = (qpP + qpQ + 1) >> 1
    val bIdx = clip3(0, 51, qpL + (pps.betaOffsetDiv2 << 1))
    val beta = DeblockBeta(bIdx) << (bd - 8)
    val tIdx = clip3(0, 53, qpL + 2 + (pps.tcOffsetDiv2 << 1))
    val tc = DeblockTc(tIdx) << (bd - 8)
    if (tc == 0 && beta == 0) return

    @inline def at(i: Int, k: Int): Int =
      if (vertical) p((ey + k) * stride + (ex + i)) else
        p((ey + i) * stride + (ex + k))
    @inline def put(i: Int, k: Int, v: Int): Unit =
      if (vertical) p((ey + k) * stride + (ex + i)) = v else
        p((ey + i) * stride + (ex + k)) = v
    // i: -4..3 across the edge (p3..p0 q0..q3), k: 0..3 along

    def dpq(k: Int): (Int, Int) = {
      val dp = math.abs(at(-3, k) - 2 * at(-2, k) + at(-1, k))
      val dq = math.abs(at(2, k) - 2 * at(1, k) + at(0, k))
      (dp, dq)
    }
    val (dp0, dq0) = dpq(0)
    val (dp3, dq3) = dpq(3)
    val d = dp0 + dq0 + dp3 + dq3
    if (d >= beta) return

    def strongAt(k: Int, dpk: Int, dqk: Int): Boolean = {
      2 * (dpk + dqk) < (beta >> 2) &&
      math.abs(at(-4, k) - at(-1, k)) + math.abs(at(0, k) - at(3, k)) <
        (beta >> 3) &&
      math.abs(at(-1, k) - at(0, k)) < ((5 * tc + 1) >> 1)
    }
    val strong = strongAt(0, dp0, dq0) && strongAt(3, dp3, dq3)

    var k = 0
    while (k < 4) {
      val p3 = at(-4, k); val p2 = at(-3, k); val p1 = at(-2, k)
      val p0 = at(-1, k)
      val q0 = at(0, k); val q1 = at(1, k); val q2 = at(2, k)
      val q3 = at(3, k)
      if (strong) {
        put(-1, k, clip3(p0 - 2 * tc, p0 + 2 * tc,
          (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3))
        put(-2, k, clip3(p1 - 2 * tc, p1 + 2 * tc,
          (p2 + p1 + p0 + q0 + 2) >> 2))
        put(-3, k, clip3(p2 - 2 * tc, p2 + 2 * tc,
          (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3))
        put(0, k, clip3(q0 - 2 * tc, q0 + 2 * tc,
          (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3))
        put(1, k, clip3(q1 - 2 * tc, q1 + 2 * tc,
          (p0 + q0 + q1 + q2 + 2) >> 2))
        put(2, k, clip3(q2 - 2 * tc, q2 + 2 * tc,
          (p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3))
      } else {
        var delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        if (math.abs(delta) < tc * 10) {
          delta = clip3(-tc, tc, delta)
          put(-1, k, clip0(p0 + delta, maxVal))
          put(0, k, clip0(q0 - delta, maxVal))
          val dEp = dp0 + dp3 < ((beta + (beta >> 1)) >> 3)
          val dEq = dq0 + dq3 < ((beta + (beta >> 1)) >> 3)
          if (dEp) {
            val dp = clip3(-(tc >> 1), tc >> 1,
              (((p2 + p0 + 1) >> 1) - p1 + delta) >> 1)
            put(-2, k, clip0(p1 + dp, maxVal))
          }
          if (dEq) {
            val dq = clip3(-(tc >> 1), tc >> 1,
              (((q2 + q0 + 1) >> 1) - q1 - delta) >> 1)
            put(1, k, clip0(q1 + dq, maxVal))
          }
        }
      }
      k += 1
    }
  }

  /** One chroma sample pair across an edge (bS = 2), both planes. */
  private def chromaCol(cbP: Array[Int], crP: Array[Int], stride: Int,
      xc: Int, yc: Int, qpP: Int, qpQ: Int, pps: Pps, bd: Int,
      maxVal: Int, vertical: Boolean): Unit = {
    val qpL = (qpP + qpQ + 1) >> 1
    // chroma deblock uses the pps offset only (spec 8.7.2.5.5)
    val qpi = clip3(0, 57, qpL + pps.cbQpOffset)
    val qpc = if (qpi > 43) qpi - 6 else ChromaQpMap(qpi)
    val qpiCr = clip3(0, 57, qpL + pps.crQpOffset)
    val qpcCr = if (qpiCr > 43) qpiCr - 6 else ChromaQpMap(qpiCr)
    var plane = 0
    while (plane < 2) {
      val p = if (plane == 0) cbP else crP
      val q = if (plane == 0) qpc else qpcCr
      val tIdx = clip3(0, 53, q + 2 + (pps.tcOffsetDiv2 << 1))
      val tc = DeblockTc(tIdx) << (bd - 8)
      if (tc != 0) {
        @inline def at(i: Int): Int =
          if (vertical) p(yc * stride + (xc + i)) else
            p((yc + i) * stride + xc)
        @inline def put(i: Int, v: Int): Unit =
          if (vertical) p(yc * stride + (xc + i)) = v else
            p((yc + i) * stride + xc) = v
        val p1 = at(-2); val p0 = at(-1); val q0 = at(0); val q1 = at(1)
        val delta = clip3(-tc, tc, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
        put(-1, clip0(p0 + delta, maxVal))
        put(0, clip0(q0 - delta, maxVal))
      }
      plane += 1
    }
  }

  // -------------------------------------------------------------- SAO
  def sao(luma: Array[Int], cbP: Array[Int], crP: Array[Int],
      alignW: Int, alignH: Int, picW: Int, picH: Int, mono: Boolean,
      log2Ctb: Int, wCtbs: Int, hCtbs: Int, saoType: Array[Array[Byte]],
      saoOff: Array[Array[Array[Int]]], saoPos: Array[Array[Byte]],
      bd: Int, saoLuma: Boolean, saoChroma: Boolean): Unit = {
    val maxVal = (1 << bd) - 1
    val cW = alignW >> 1
    val snapY = luma.clone()
    val snapCb = if (mono) null else cbP.clone()
    val snapCr = if (mono) null else crP.clone()
    val nComp = if (mono) 1 else 3
    var ctbY = 0
    while (ctbY < hCtbs) {
      var ctbX = 0
      while (ctbX < wCtbs) {
        val idx = ctbY * wCtbs + ctbX
        var c = 0
        while (c < nComp) {
          val enabled = if (c == 0) saoLuma else saoChroma
          val typ = saoType(idx)(c)
          if (enabled && typ != 0) {
            val (plane, snap, stride, pw, ph, shift) =
              if (c == 0) (luma, snapY, alignW, picW, picH, 0)
              else if (c == 1) (cbP, snapCb, cW, picW >> 1, picH >> 1, 1)
              else (crP, snapCr, cW, picW >> 1, picH >> 1, 1)
            val bx0 = (ctbX << log2Ctb) >> shift
            val by0 = (ctbY << log2Ctb) >> shift
            val bx1 = math.min(((ctbX + 1) << log2Ctb) >> shift, pw)
            val by1 = math.min(((ctbY + 1) << log2Ctb) >> shift, ph)
            val offs = saoOff(idx)(c)
            if (typ == 1) {
              // band offset
              val pos = saoPos(idx)(c) & 31
              val bandShift = bd - 5
              var y = by0
              while (y < by1) {
                var x = bx0
                while (x < bx1) {
                  val i = y * stride + x
                  val v = snap(i)
                  val band = v >> bandShift
                  val rel = (band - pos) & 31
                  if (rel < 4)
                    plane(i) =
                      math.max(0, math.min(maxVal, v + offs(rel)))
                  x += 1
                }
                y += 1
              }
            } else {
              // edge offset
              val eo = saoPos(idx)(c) & 3
              val (dx0, dy0, dx1, dy1) = eo match {
                case 0 => (-1, 0, 1, 0)
                case 1 => (0, -1, 0, 1)
                case 2 => (-1, -1, 1, 1)
                case _ => (1, -1, -1, 1)
              }
              var y = by0
              while (y < by1) {
                var x = bx0
                while (x < bx1) {
                  val nx0 = x + dx0; val ny0 = y + dy0
                  val nx1 = x + dx1; val ny1 = y + dy1
                  if (nx0 >= 0 && ny0 >= 0 && nx0 < pw && ny0 < ph &&
                      nx1 >= 0 && ny1 >= 0 && nx1 < pw && ny1 < ph) {
                    val i = y * stride + x
                    val v = snap(i)
                    val s0 = Integer.signum(v - snap(ny0 * stride + nx0))
                    val s1 = Integer.signum(v - snap(ny1 * stride + nx1))
                    val raw = 2 + s0 + s1
                    val cat =
                      if (raw == 2) 0 else if (raw < 2) raw + 1 else raw
                    if (cat != 0)
                      plane(i) =
                        math.max(0, math.min(maxVal, v + offs(cat - 1)))
                  }
                  x += 1
                }
                y += 1
              }
            }
          }
          c += 1
        }
        ctbX += 1
      }
      ctbY += 1
    }
  }

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  @inline private def clip0(v: Int, hi: Int): Int =
    if (v < 0) 0 else if (v > hi) hi else v
}
