package graft.operators.av1

/** Dev drill tool (r18, speed-4 classes): scan every possible 9-bit
  * effective psplit value (only psplit >> 6 reaches the arithmetic
  * decoder) for ONE gathered split_or_* read, and report which values
  * make the whole frame decode pixel-exact against the reference
  * planes. The matching value IS the reference encoder's gathered
  * probability at that read — comparing it against candidate gather
  * formulas over the traced cdf row identifies the wrong term.
  *
  *   sbt 'Test/runMain graft.operators.av1.Av1PsplitScan <vec.jsonl> <r> <c> <bSize>'
  */
object Av1PsplitScan {

  def main(args: Array[String]): Unit = {
    val line = scala.io.Source.fromFile(args(0)).getLines()
      .find(_.nonEmpty).get
    val tr = args(1).toInt
    val tc = args(2).toInt
    val tb = args(3).toInt

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

    // (ndiff, first-diff luma index) for a decode; (-1,-1) = rejected
    def score(res: Av1Decoder.Planes): (Int, Int) = {
      var nd = 0
      var first = -1
      val mine = res.planes(0)
      val ref = refPlanes(0)
      var i = 0
      while (i < w * h) {
        val rv =
          if (depth == 8) ref(i) & 0xff
          else (ref(2 * i) & 0xff) | ((ref(2 * i + 1) & 0xff) << 8)
        if (mine(i) != rv) {
          nd += 1
          if (first < 0) first = i
        }
        i += 1
      }
      (nd, first)
    }

    var best = Int.MaxValue
    val results = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    var v6 = 1 // psplit >> 6; 0 would make the interval empty
    while (v6 < 512) {
      val p = v6 << 6
      Av1Decoder.psplitOverride =
        (r, c, b) => if (r == tr && c == tc && b == tb) p else -1
      try {
        Av1Decoder.decode(payload).foreach { res =>
          val (nd, first) = score(res)
          results += ((v6, nd, first))
          if (nd < best) best = nd
        }
      } catch { case _: Throwable => () }
      v6 += 1
    }
    Av1Decoder.psplitOverride = null
    val exactHits = results.filter(_._2 == 0).map(_._1)
    println(s"[psplitscan] exact hits (psplit>>6): ${exactHits.mkString(",")}")
    println(s"[psplitscan] best ndiff=$best at: " +
      results.filter(_._2 == best).take(12)
        .map(t => s"v6=${t._1} first=(${t._3 % w},${t._3 / w})")
        .mkString("; "))
  }
}
