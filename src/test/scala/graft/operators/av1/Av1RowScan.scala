package graft.operators.av1

/** Dev drill tool (r18, 64-class coefficient rows): scan every
  * effective probability value for ONE txb_skip cdf row (the row index
  * within the frame's q-context slice) and report which values decode
  * the member pixel-exact. A unique hit IS the reference default for
  * that row (same method as Av1PsplitScan).
  *
  *   sbt 'Test/runMain graft.operators.av1.Av1RowScan <vec.jsonl> <rowIdx>'
  */
object Av1RowScan {

  def main(args: Array[String]): Unit = {
    val line = scala.io.Source.fromFile(args(0)).getLines()
      .find(_.nonEmpty).get
    val rowIdx = args(1).toInt

    def hexBytes(s: String): Array[Byte] = {
      val out = new Array[Byte](s.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      out
    }
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

    def ndiff(res: Av1Decoder.Planes): Int = {
      var nd = 0
      val mine = res.planes(0)
      val ref = refPlanes(0)
      var i = 0
      while (i < w * h) {
        val rv =
          if (depth == 8) ref(i) & 0xff
          else (ref(2 * i) & 0xff) | ((ref(2 * i + 1) & 0xff) << 8)
        if (mine(i) != rv) nd += 1
        i += 1
      }
      nd
    }

    var best = Int.MaxValue
    val hits = scala.collection.mutable.ArrayBuffer[Int]()
    val bests = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    Av1CdfCtx.txbSkipOverrideRow = rowIdx
    var v6 = 1
    while (v6 < 512) {
      Av1CdfCtx.txbSkipOverrideVal = v6 << 6
      try {
        Av1Decoder.decode(payload).foreach { res =>
          val nd = ndiff(res)
          if (nd == 0) hits += v6
          if (nd < best) best = nd
          bests += ((v6, nd))
        }
      } catch { case _: Throwable => () }
      v6 += 1
    }
    Av1CdfCtx.txbSkipOverrideRow = -1
    println(s"[rowscan] row $rowIdx exact hits (val>>6): ${hits.mkString(",")}")
    println(s"[rowscan] best ndiff=$best at " +
      bests.filter(_._2 == best).take(10).map(_._1).mkString(","))
  }
}
