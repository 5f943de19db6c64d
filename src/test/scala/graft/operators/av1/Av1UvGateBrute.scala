package graft.operators.av1

/** Dev harness: brute-force the palette_uv_mode ctx-0 icdf value by
  * decoding a known-pixel vector under each candidate and testing
  * pixel-exactness (msac only sees icdf>>6, so step 64 + refine).
  */
object Av1UvGateBrute {
  def main(args: Array[String]): Unit = {
    val line = scala.io.Source.fromFile(args(0)).getLines().next()
    def strField(key: String): String = {
      val r = ("\"" + key + "\":\\s*\"([^\"]*)\"").r
      r.findFirstMatchIn(line).get.group(1)
    }
    def numField(key: String): Int = {
      val r = ("\"" + key + "\":\\s*(\\d+)").r
      r.findFirstMatchIn(line).get.group(1).toInt
    }
    val w = numField("w"); val h = numField("h"); val depth = numField("depth")
    def hexBytes(s: String): Array[Byte] = {
      val out = new Array[Byte](s.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      out
    }
    val payload = hexBytes(strField("payload"))
    val planesBody = ("\"planes\":\\s*\\[([^\\]]*)\\]").r
      .findFirstMatchIn(line).get.group(1)
    val refPlanes = planesBody.split(",").map(_.trim.stripPrefix("\"")
      .stripSuffix("\"")).map(hexBytes)
    val hits = scala.collection.mutable.ArrayBuffer[Int]()
    val candidates: Seq[Int] =
      if (args.length > 1) args(1).split(",").toSeq.flatMap { span =>
        val p = span.split("-"); (p(0).toInt to p(1).toInt)
      } else (32 until 32768 by 64)
    val whichCtx1 = args.length > 2 && args(2) == "ctx1"
    for (v0 <- candidates) {
      val v = v0
      if (whichCtx1) Av1CdfCtx.uvGate1Override = v
      else Av1CdfCtx.uvGateOverride = v
      try {
        val res = Av1Decoder.decodeOrThrow(payload)
        var ok = true
        for (pl <- refPlanes.indices if ok) {
          val pw = if (pl == 0) w else (w + res.subX) >> res.subX
          val phh = if (pl == 0) h else (h + res.subY) >> res.subY
          val mine = res.planes(pl); val ref = refPlanes(pl)
          var i = 0
          while (ok && i < pw * phh) {
            val rv = if (depth == 8) ref(i) & 0xff
              else (ref(2 * i) & 0xff) | ((ref(2 * i + 1) & 0xff) << 8)
            if (mine(i) != rv) ok = false
            i += 1
          }
        }
        if (ok) hits += v
      } catch { case _: Throwable => }
    }
    println("hits: " + hits.mkString(","))
  }
}
