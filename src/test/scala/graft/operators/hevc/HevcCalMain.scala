package graft.operators.hevc

/** Dev-time calibration driver for the HEVC decoder (the av1cal
  * discipline): reads JSON-lines produced by
  * `scripts/hevc_reference.py cal` — annexb stream hex + libde265's
  * decoded planes — and diffs this decoder against them, reporting
  * the first divergent pixel per plane. Run:
  *   sbt 'Test/runMain graft.operators.hevc.HevcCalMain <vecs.jsonl>'
  */
object HevcCalMain {

  private def hexBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  private def strField(line: String, key: String): String = {
    val k = "\"" + key + "\": \""
    val k2 = "\"" + key + "\":\""
    val i0 = line.indexOf(k)
    val i = if (i0 >= 0) i0 + k.length else {
      val j = line.indexOf(k2)
      if (j < 0) return null
      j + k2.length
    }
    val e = line.indexOf('"', i)
    line.substring(i, e)
  }

  private def intArray(line: String, key: String): Array[Int] = {
    val k = "\"" + key + "\":"
    var i = line.indexOf(k) + k.length
    while (line(i) != '[') i += 1
    val e = line.indexOf(']', i)
    val body = line.substring(i + 1, e).trim
    if (body.isEmpty) Array()
    else body.split(",").map(_.trim.toInt)
  }

  private def strArray(line: String, key: String): Array[String] = {
    val k = "\"" + key + "\":"
    var i = line.indexOf(k) + k.length
    while (line(i) != '[') i += 1
    val e = line.indexOf(']', i)
    val body = line.substring(i + 1, e).trim
    if (body.isEmpty) Array()
    else body.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  def main(args: Array[String]): Unit = {
    val src = scala.io.Source.fromFile(args(0))
    var pass = 0
    var fail = 0
    var err = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for (line <- src.getLines() if line.nonEmpty) {
      val name = strField(line, "name")
      val data = hexBytes(strField(line, "hex"))
      val pw = intArray(line, "pw")
      val ph = intArray(line, "ph")
      val pix = strArray(line, "pix").map(hexBytes)
      if (sys.env.contains("GRAFT_HEVCCAL_TRACE") &&
          sys.env("GRAFT_HEVCCAL_TRACE") == name) {
        // decode-order first-divergence trace: compare each TU region
        // against the (cropped) reference plane as soon as it recons
        var reported = 0
        HevcDecoder.onTu = (cIdx, x, y, size, mode, cbf, plane, stride) =>
          if (reported < 12 && cIdx < pw.length) {
            val w = pw(cIdx)
            val h = ph(cIdx)
            val ref = pix(cIdx)
            var dy = 0
            var done = false
            while (dy < size && !done) {
              var dx = 0
              while (dx < size && !done) {
                val xx = x + dx
                val yy = y + dy
                if (xx < w && yy < h) {
                  val ours = plane(yy * stride + xx)
                  val rv = ref(yy * w + xx) & 0xff
                  if (ours != rv) {
                    println(s"[hevccal] TRACE $name first-div TU " +
                      s"c$cIdx ($x,$y)x$size mode=$mode cbf=$cbf at " +
                      s"($xx,$yy) ours=$ours ref=$rv")
                    reported += 1
                    done = true
                  }
                }
                dx += 1
              }
              dy += 1
            }
          }
      }
      if (sys.env.contains("GRAFT_HEVCCAL_HDR")) {
        try {
          val nals = graft.operators.hevc.HevcBits.annexBNals(data)
          for (nal <- nals) {
            val t = (nal(0) >> 1) & 0x3f
            if (t <= 21) {
              val rb = graft.operators.hevc.HevcBits.rbsp(nal, 2)
              val sps2 = nals.collectFirst {
                case n2 if ((n2(0) >> 1) & 0x3f) == 33 =>
                  HevcHeaders.parseSps(
                    graft.operators.hevc.HevcBits.rbsp(n2, 2))
              }.get
              val pps2 = nals.collectFirst {
                case n2 if ((n2(0) >> 1) & 0x3f) == 34 =>
                  HevcHeaders.parsePps(
                    graft.operators.hevc.HevcBits.rbsp(n2, 2))
              }.get
              val r = new graft.operators.hevc.HevcBits.Reader(rb)
              val sh2 = HevcHeaders.parseSliceHeader(r, t, sps2, pps2)
              println(s"[hevccal] HDR $name qp=${sh2.sliceQp} " +
                s"saoL=${sh2.saoLuma} saoC=${sh2.saoChroma} " +
                s"entries=${sh2.entryPoints.mkString(",")} " +
                s"dataBitPos=${sh2.dataBitPos} initQp=${pps2.initQp}")
            }
          }
        } catch { case e: Throwable =>
          println(s"[hevccal] HDR $name EX ${e.getMessage}") }
      }
      try {
        (Some(HevcDecoder.decodeOrThrow(data)):
            Option[HevcDecoder.Planes]) match {
          case None =>
            err += 1
            failures += s"$name: decode returned None"
          case Some(pl) =>
            var ok = true
            var msg = ""
            if (pl.planes.length != pw.length) {
              ok = false
              msg = s"plane count ${pl.planes.length} vs ${pw.length}"
            } else {
              var p = 0
              while (p < pw.length && ok) {
                val ours = pl.planes(p)
                val w = pw(p)
                val h = ph(p)
                if (ours.length != w * h) {
                  ok = false
                  msg = s"plane $p dims: ${ours.length} vs ${w}x$h"
                } else {
                  val ref = pix(p)
                  var i = 0
                  var nDiff = 0
                  var first = -1
                  var maxd = 0
                  while (i < w * h) {
                    val d = math.abs(ours(i) - (ref(i) & 0xff))
                    if (d != 0) {
                      nDiff += 1
                      if (first < 0) first = i
                      if (d > maxd) maxd = d
                    }
                    i += 1
                  }
                  if (nDiff > 0) {
                    ok = false
                    msg = s"plane $p ${w}x$h ndiff=$nDiff maxd=$maxd " +
                      s"first=(${first % w},${first / w}) " +
                      s"ours=${ours(first)} ref=${ref(first) & 0xff}"
                  }
                }
                p += 1
              }
            }
            if (ok) pass += 1
            else {
              fail += 1
              failures += s"$name: $msg"
              if (sys.env.contains("GRAFT_HEVCCAL_DUMP")) {
                var p = 0
                while (p < pl.planes.length) {
                  val f = new java.io.FileOutputStream(
                    s"/tmp/hevccal_${name}_p$p.bin")
                  f.write(pl.planes(p).map(_.toByte))
                  f.close()
                  p += 1
                }
              }
            }
        }
      } catch {
        case e: Throwable =>
          err += 1
          failures += s"$name: ${e.getClass.getSimpleName} ${e.getMessage}"
          if (sys.env.contains("GRAFT_HEVCCAL_STACK"))
            e.getStackTrace.take(6).foreach(f =>
              println(s"[hevccal]   at $f"))
      } finally HevcDecoder.onTu = null
    }
    src.close()
    failures.take(40).foreach(f => println(s"[hevccal] FAIL $f"))
    println(s"[hevccal] pass=$pass fail=$fail err=$err")
    if (fail + err > 0) sys.exit(1)
  }
}
