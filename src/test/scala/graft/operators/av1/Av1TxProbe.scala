package graft.operators.av1

/** Dev probe: checks every coefficient basis vector of inverse2d
  * against a float orthonormal IDCT (scale fitted on the DC basis).
  * A structural butterfly bug shows up as specific coefficient indices
  * whose basis output diverges beyond rounding. Run:
  *   Test/runMain graft.operators.av1.Av1TxProbe <txSz> [txType]
  */
object Av1TxProbe {
  import Av1Consts._

  def main(args: Array[String]): Unit = {
    val txSz = args(0).toInt
    val txType = if (args.length > 1) args(1).toInt else 0
    val w = TxW(txSz)
    val h = TxH(txSz)
    val cw = math.min(32, w)
    val ch = math.min(32, h)

    def idctBasis(n: Int, k: Int): Array[Double] = {
      val out = new Array[Double](n)
      val s = if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      var i = 0
      while (i < n) {
        out(i) = s * math.cos(math.Pi * (2 * i + 1) * k / (2.0 * n))
        i += 1
      }
      out
    }
    def adstBasis(n: Int, k: Int): Array[Double] = {
      // AV1 iadst basis: x_i = sum_k c_k sin(pi (2i+1)(2k+1) / 4n)
      val out = new Array[Double](n)
      val s = math.sqrt(2.0 / n)
      var i = 0
      while (i < n) {
        out(i) = s * math.sin(math.Pi * (2 * i + 1) * (2 * k + 1) / (4.0 * n))
        i += 1
      }
      out
    }
    def basis1d(kind: Int, n: Int, k: Int): Array[Double] = kind match {
      case 0 => idctBasis(n, k)
      case 1 => adstBasis(n, k)
      case 2 => { val o = new Array[Double](n); o(k) = 1.0; o }
    }
    // The float twin below only models the DCT basis; probing another
    // txType against it would report false divergences (ADVICE r17).
    // The basis coverage for ALL 16 types lives in Av1Spec's per-basis
    // pin; this dev main stays DCT-only and says so loudly.
    require(txType == 0,
      s"Av1TxProbe models DCT_DCT only (got txType=$txType); " +
        "use Av1Spec's all-tx-size basis test for other types")
    val (rowKind, colKind) = (0, 0)

    // calibrate scale on DC
    def intOut(k: Int): Array[Int] = {
      val co = new Array[Int](w * h)
      val row = k / cw
      val col = k % cw
      co(row * w + col) = 1024
      Av1Transform.inverse2d(co, txSz, txType, 10)
      co
    }
    def floatOut(k: Int): Array[Double] = {
      val row = k / cw
      val col = k % cw
      val bw = basis1d(rowKind, w, col)
      val bh = basis1d(colKind, h, row)
      val out = new Array[Double](w * h)
      var r = 0
      while (r < h) {
        var c2 = 0
        while (c2 < w) { out(r * w + c2) = 1024.0 * bh(r) * bw(c2); c2 += 1 }
        r += 1
      }
      out
    }
    val i0 = intOut(0)
    val f0 = floatOut(0)
    var num = 0.0; var den = 0.0
    for (i <- 0 until w * h) { num += i0(i).toDouble * f0(i); den += f0(i) * f0(i) }
    val scale = num / den
    println(s"tx=$txSz ${w}x$h scale=$scale")
    var bad = 0
    for (k <- 0 until cw * ch) {
      val io = intOut(k)
      val fo = floatOut(k)
      var maxd = 0.0
      for (i <- 0 until w * h) maxd = math.max(maxd, math.abs(io(i) - scale * fo(i)))
      if (maxd > 3.0) {
        bad += 1
        if (bad <= 24)
          println(f"  k=$k%4d (r=${k / cw},c=${k % cw}) maxd=$maxd%.1f")
      }
    }
    println(s"bad=$bad of ${cw * ch}")
  }
}
