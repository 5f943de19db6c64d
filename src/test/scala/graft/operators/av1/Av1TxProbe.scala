package graft.operators.av1

/** Dev: compare inverse2d against a float IDCT at 10-bit coefficient
  * scale (smoke for intermediate clipping).
  */
object Av1TxProbe {
  def main(args: Array[String]): Unit = {
    val w = 32; val h = 32
    for (bd <- Seq(8, 10)) {
      val coefs = new Array[Int](w * h)
      coefs(0) = -23757; coefs(1) = -8050; coefs(3) = -700; coefs(5) = -350
      val out = coefs.clone()
      Av1Transform.inverse2d(out, 3 /*TX_32X32*/, 0 /*DCT_DCT*/, bd)
      // float reference: 2D IDCT-II with AV1 scaling:
      // out = idct_col(idct_row(in) >> rowShift) >> 4, basis cos
      def idct1d(v: Array[Double]): Array[Double] = {
        val n = v.length
        Array.tabulate(n) { x =>
          var s = 0.0
          for (k <- 0 until n) {
            val c = if (k == 0) math.sqrt(0.5) else 1.0
            s += c * v(k) * math.cos(math.Pi * (2 * x + 1) * k / (2.0 * n))
          }
          s * math.sqrt(2.0 / n) * 2 // AV1 1D gain sqrt(n)*... unit-ish
        }
      }
      // AV1 32x32: row pass gain sqrt(32)*? with RowShift 2 and final >>4:
      // net 2D scaling = 4 (per spec design: output = resid * 1)
      val rows = Array.tabulate(h)(r => idct1d(Array.tabulate(w)(c2 => coefs(r * w + c2).toDouble)))
      val colsIn = Array.tabulate(w)(c2 => Array.tabulate(h)(r => rows(r)(c2) / 4.0))
      val cols = colsIn.map(idct1d)
      val ref00 = cols(0)(0) / 16.0 * 2 // fudge: compare magnitudes
      println(s"bd=$bd int resid00=${out(0)} float-approx=${ref00}")
    }
  }
}
