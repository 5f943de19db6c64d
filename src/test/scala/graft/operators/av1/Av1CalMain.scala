package graft.operators.av1

/** Dev-time calibration driver: reads JSON-lines vectors produced by
  * target/scratch/av1cal.py (reference-encoded payload + reference-
  * decoded planes) and diffs this decoder against them, reporting the
  * first divergent pixel per plane. Run:
  *   sbt 'Test/runMain graft.operators.av1.Av1CalMain <vecs.jsonl>'
  */
object Av1CalMain {

  private def hexBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  // minimal JSON field extraction (flat object, string/num/array fields)
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
  private def numField(line: String, key: String): Int = {
    val k = "\"" + key + "\":"
    val i = line.indexOf(k) + k.length
    var j = i
    while (j < line.length && (line(j) == ' ')) j += 1
    var e = j
    while (e < line.length && line(e).isDigit) e += 1
    line.substring(j, e).toInt
  }
  private def planesField(line: String): Array[String] = {
    val k = "\"planes\":"
    var i = line.indexOf(k) + k.length
    while (line(i) != '[') i += 1
    val e = line.indexOf(']', i)
    val body = line.substring(i + 1, e)
    if (body.trim.isEmpty) Array()
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
      val w = numField(line, "w")
      val h = numField(line, "h")
      val depth = numField(line, "depth")
      val payload = hexBytes(strField(line, "payload"))
      val refPlanes = planesField(line).map(hexBytes)
      try {
        val res = Av1Decoder.decodeOrThrow(payload)
        var ok = true
        var msg = ""
        for (pl <- refPlanes.indices if ok) {
          val pw = if (pl == 0) w else (w + res.subX) >> res.subX
          val phh = if (pl == 0) h else (h + res.subY) >> res.subY
          val mine = res.planes(pl)
          val ref = refPlanes(pl)
          var i = 0
          var bad = -1
          var nbad = 0
          var maxd = 0
          while (i < pw * phh) {
            val rv =
              if (depth == 8) ref(i) & 0xff
              else (ref(2 * i) & 0xff) | ((ref(2 * i + 1) & 0xff) << 8)
            if (mine(i) != rv) {
              if (bad < 0) bad = i
              nbad += 1
              maxd = math.max(maxd, math.abs(mine(i) - rv))
            }
            i += 1
          }
          if (bad >= 0) {
            ok = false
            val rv =
              if (depth == 8) ref(bad) & 0xff
              else (ref(2 * bad) & 0xff) | ((ref(2 * bad + 1) & 0xff) << 8)
            msg = s"plane $pl first-diff at (${bad % pw},${bad / pw}) " +
              s"mine=${mine(bad)} ref=$rv [${pw}x$phh] ndiff=$nbad maxd=$maxd"
            if (System.getenv("GRAFT_AV1_DIFFMAP") != null) {
              val sb = new StringBuilder("\n")
              var yy = 0
              while (yy < phh) {
                var xx = 0
                while (xx < pw) {
                  val i2 = yy * pw + xx
                  val rv2 =
                    if (depth == 8) ref(i2) & 0xff
                    else (ref(2 * i2) & 0xff) | ((ref(2 * i2 + 1) & 0xff) << 8)
                  sb.append(if (mine(i2) == rv2) '.' else 'X')
                  xx += 1
                }
                sb.append('\n')
                yy += 1
              }
              println(name + msg + sb.toString)
            }
          }
        }
        if (System.getenv("GRAFT_AV1_DUMPP") != null) {
          val fos = new java.io.FileOutputStream(
            System.getenv("GRAFT_AV1_DUMPP") + "/" + name + ".bin")
          for (pl <- res.planes.indices; v <- res.planes(pl))
            fos.write(Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
          fos.close()
        }
        if (ok) pass += 1
        else { fail += 1; failures += s"$name: $msg" }
      } catch {
        case e: Throwable =>
          err += 1
          val st = e.getStackTrace.take(3).mkString(" | ")
          failures += s"$name: EXC ${e.getClass.getSimpleName} ${e.getMessage} @ $st"
      }
    }
    src.close()
    println(s"pass=$pass fail=$fail err=$err")
    failures.take(64).foreach(f => println("  " + f))
  }
}
