package graft.operators.av1

/** Dev drill tool (r18, speed-4 classes): decode a calibration member
  * while overwriting ONE block's reconstructed pixels (all planes, the
  * block's extent) with the REFERENCE decoder's values, then diff the
  * whole frame. Discriminates the two failure shapes:
  *
  *  - exact after the patch  -> the entropy stream never desynced; the
  *    bug is a local pixel defect in that block (prediction/transform),
  *    and the downstream corruption was intra-prediction propagation.
  *  - still corrupt after it -> real arithmetic-decoder desync at or
  *    before that block.
  *
  *   sbt 'Test/runMain graft.operators.av1.Av1BlockPatch <vec.jsonl> <r> <c>'
  */
object Av1BlockPatch {

  private def hexBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val line = scala.io.Source.fromFile(args(0)).getLines()
      .find(_.nonEmpty).get
    val pr = if (args(1) == "fi") -1 else args(1).toInt
    val pc = if (args(1) == "fi") -1 else args(2).toInt
    def strField(key: String): String = {
      val k = "\"" + key + "\": \""
      val i = line.indexOf(k) + k.length
      line.substring(i, line.indexOf('"', i))
    }
    def numField(key: String): Int = {
      val k = "\"" + key + "\":"
      val i = line.indexOf(k) + k.length
      var j = i
      while (line(j) == ' ') j += 1
      var e = j
      while (e < line.length && line(e).isDigit) e += 1
      line.substring(j, e).toInt
    }
    val payload = hexBytes(strField("payload"))
    val w = numField("w")
    val h = numField("h")
    val depth = numField("depth")
    val planesBody = {
      val k = "\"planes\":"
      var i = line.indexOf(k) + k.length
      while (line(i) != '[') i += 1
      line.substring(i + 1, line.indexOf(']', i))
    }
    val refPlanes = planesBody.split(",")
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).map(hexBytes)
    @inline def refAt(pl: Int, pw: Int, i: Int): Int =
      if (depth == 8) refPlanes(pl)(i) & 0xff
      else (refPlanes(pl)(2 * i) & 0xff) | ((refPlanes(pl)(2 * i + 1) & 0xff) << 8)

    // mode: "r c" patches one block; "fi <minMode>" patches every
    // filter-intra block with mode >= minMode (-9 = all fi blocks).
    // GRAFT_AV1_AUDIT: additionally report own-rect diff for EVERY
    // block right after its reconstruction (decode-order attribution).
    val audit = System.getenv("GRAFT_AV1_AUDIT") != null
    val fiMin = if (args(1) == "fi") args(2).toInt else Int.MaxValue
    var patched = 0
    Av1Decoder.blockPatch = (d, r, c, bSize, fiMode) => {
      if (r == pr && c == pc && fiMin == Int.MaxValue &&
          System.getenv("GRAFT_AV1_GRIDDUMP") != null) {
        var pl0 = 0
        while (pl0 < d.numPlanes) {
          val shX = if (pl0 == 0) 0 else d.subX
          val shY = if (pl0 == 0) 0 else d.subY
          val pw = d.cropW(pl0)
          val ph = d.cropH(pl0)
          val x0 = ((c >> shX) << shX >> shX) * 4
          val y0 = ((r >> shY) << shY >> shY) * 4
          val x1 = math.min(pw,
            x0 + math.max(1, Av1Consts.BlockW4(bSize) >> shX) * 4)
          val y1 = math.min(ph,
            y0 + math.max(1, Av1Consts.BlockH4(bSize) >> shY) * 4)
          println(s"[grid] plane $pl0 block rect ($x0..$x1)x($y0..$y1)")
          var yy = y0
          while (yy < y1) {
            val m = (x0 until x1).map(xx =>
              f"${d.planes(pl0)(yy * d.planeW(pl0) + xx)}%4d").mkString
            val rf = (x0 until x1).map(xx =>
              f"${refAt(pl0, pw, yy * pw + xx)}%4d").mkString
            println(s"[grid]   mine $m   ref $rf")
            yy += 1
          }
          pl0 += 1
        }
      }
      if (audit) {
        // per-plane own-rect diff, decode-order
        val parts = (0 until d.numPlanes).map { pl0 =>
          val shX = if (pl0 == 0) 0 else d.subX
          val shY = if (pl0 == 0) 0 else d.subY
          val pw = d.cropW(pl0)
          val ph = d.cropH(pl0)
          val x0 = ((c >> shX) << shX >> shX) * 4
          val y0 = ((r >> shY) << shY >> shY) * 4
          val x1 = math.min(pw,
            x0 + math.max(1, Av1Consts.BlockW4(bSize) >> shX) * 4)
          val y1 = math.min(ph,
            y0 + math.max(1, Av1Consts.BlockH4(bSize) >> shY) * 4)
          var n = 0
          var mx = 0
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              val dd = math.abs(d.planes(pl0)(yy * d.planeW(pl0) + xx) -
                refAt(pl0, pw, yy * pw + xx))
              if (dd != 0) { n += 1; mx = math.max(mx, dd) }
              xx += 1
            }
            yy += 1
          }
          (n, mx)
        }
        if (parts.map(_._1).sum > 0)
          println(s"[audit] block ($r,$c) bs=$bSize fi=$fiMode " +
            s"ownDiff=${parts.map(_._1).mkString("/")} " +
            s"maxd=${parts.map(_._2).mkString("/")}")
        if (System.getenv("GRAFT_AV1_WATCHPX") != null)
          println(s"[watchpx] after ($r,$c): px(16,24)=" +
            d.planes(0)(24 * d.planeW(0) + 16))
        val watch = System.getenv("GRAFT_AV1_WATCH")
        if (watch != null) {
          val Array(wr, wc) = watch.split(" ").map(_.toInt)
          if (r == wr && c == wc) {
            val x0 = c * 4
            val y0 = r * 4
            val x1 = math.min(d.cropW(0), x0 + Av1Consts.BlockW4(bSize) * 4)
            val y1 = math.min(d.cropH(0), y0 + Av1Consts.BlockH4(bSize) * 4)
            var yy = y0
            while (yy < y1) {
              val m = (x0 until x1).map(xx =>
                f"${d.planes(0)(yy * d.planeW(0) + xx)}%4d").mkString
              val rf = (x0 until x1).map(xx =>
                f"${refAt(0, d.cropW(0), yy * d.cropW(0) + xx)}%4d").mkString
              println(s"[watch]   mine $m   ref $rf")
              yy += 1
            }
          }
        }
      }
      if ((r == pr && c == pc && fiMin == Int.MaxValue) ||
          (fiMin != Int.MaxValue && fiMode >= fiMin)) {
        if (fiMin != Int.MaxValue && fiMode >= 0) {
          // diff the block's own pixels BEFORE patching: since every
          // earlier error has been patched, its neighbors are exact, so
          // a nonzero count here is this block's OWN prediction bug.
          var own = 0
          var ownFirst = ""
          var pl0 = 0
          while (pl0 < d.numPlanes) {
            val shX = if (pl0 == 0) 0 else d.subX
            val shY = if (pl0 == 0) 0 else d.subY
            val pw = d.cropW(pl0)
            val ph = d.cropH(pl0)
            val x0 = ((c >> shX) << shX >> shX) * 4
            val y0 = ((r >> shY) << shY >> shY) * 4
            val x1 = math.min(pw,
              x0 + math.max(1, Av1Consts.BlockW4(bSize) >> shX) * 4)
            val y1 = math.min(ph,
              y0 + math.max(1, Av1Consts.BlockH4(bSize) >> shY) * 4)
            var yy = y0
            while (yy < y1) {
              var xx = x0
              while (xx < x1) {
                if (d.planes(pl0)(yy * d.planeW(pl0) + xx) !=
                    refAt(pl0, pw, yy * pw + xx)) {
                  own += 1
                  if (ownFirst.isEmpty)
                    ownFirst = s" first=pl$pl0($xx,$yy) " +
                      s"mine=${d.planes(pl0)(yy * d.planeW(pl0) + xx)} " +
                      s"ref=${refAt(pl0, pw, yy * pw + xx)}"
                }
                xx += 1
              }
              yy += 1
            }
            pl0 += 1
          }
          println(s"[blockpatch] fi block ($r,$c) bs=$bSize mode=$fiMode " +
            s"ownDiff=$own$ownFirst")
        }
        patched += 1
        val bw4 = Av1Consts.BlockW4(bSize)
        val bh4 = Av1Consts.BlockH4(bSize)
        val nPl =
          if (System.getenv("GRAFT_AV1_LUMAONLY") != null) 1 else d.numPlanes
        var pl = 0
        while (pl < nPl) {
          val shX = if (pl == 0) 0 else d.subX
          val shY = if (pl == 0) 0 else d.subY
          val pw = d.cropW(pl)
          val ph = d.cropH(pl)
          // block pixel extent in this plane (chroma rounded to the
          // covering chroma block)
          val x0 = ((c >> shX) << shX >> shX) * 4
          val y0 = ((r >> shY) << shY >> shY) * 4
          val x1 = math.min(pw, x0 + math.max(1, bw4 >> shX) * 4)
          val y1 = math.min(ph, y0 + math.max(1, bh4 >> shY) * 4)
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              d.planes(pl)(yy * d.planeW(pl) + xx) = refAt(pl, pw, yy * pw + xx)
              xx += 1
            }
            yy += 1
          }
          pl += 1
        }
      }
    }
    try {
      val res = Av1Decoder.decodeOrThrow(payload)
      println(s"[blockpatch] patched block ($pr,$pc) x$patched")
      for (pl <- refPlanes.indices) {
        val pw = if (pl == 0) w else (w + res.subX) >> res.subX
        val ph = if (pl == 0) h else (h + res.subY) >> res.subY
        var nd = 0
        var first = -1
        var i = 0
        while (i < pw * ph) {
          if (res.planes(pl)(i) != refAt(pl, pw, i)) {
            nd += 1
            if (first < 0) first = i
          }
          i += 1
        }
        println(s"[blockpatch] plane $pl ndiff=$nd" +
          (if (first >= 0) s" first=(${first % pw},${first / pw})" else ""))
        if (nd > 0 && System.getenv("GRAFT_AV1_MAP") != null) {
          var yy = 0
          while (yy < ph) {
            val rowS = (0 until pw).map { xx =>
              if (res.planes(pl)(yy * pw + xx) != refAt(pl, pw, yy * pw + xx))
                'X' else '.'
            }.mkString
            println(s"[map$pl] $rowS")
            yy += 1
          }
        }
      }
    } finally Av1Decoder.blockPatch = null
  }
}
