package graft.operators.hevc

/** Inverse transform + dequantization (spec 8.6.3 / 8.6.4).
  *
  * The inverse transform is computed as two 1-D matrix passes against
  * the normative integer basis ([[HevcTables.T32]] / [[HevcTables.Dst4]],
  * binary-verified): a column pass with shift 7 and 16-bit clip, then
  * a row pass with shift (20 - bitDepth). Matrix form is bit-exact
  * with the spec's partial-butterfly factorization — the butterflies
  * are just a fast evaluation of the same integer dot products.
  */
object HevcTransform {
  import HevcTables.{Dst4, LevelScale, T32}

  /** Dequantize in place (8.6.3, flat m=16 — scaling lists rejected at
    * the SPS). levels: row-major nTbS x nTbS. */
  def dequant(levels: Array[Int], log2Size: Int, qp: Int,
      bitDepth: Int): Unit = {
    val bdShift = bitDepth + log2Size - 5
    val add = 1 << (bdShift - 1)
    val scale = LevelScale(qp % 6) << (qp / 6)
    val n = 1 << (log2Size << 1)
    var i = 0
    while (i < n) {
      val v = levels(i).toLong * 16L * scale
      val d = (v + add) >> bdShift
      levels(i) =
        math.max(-32768L, math.min(32767L, d)).toInt
      i += 1
    }
  }

  /** In-place 2-D inverse transform of an nTbS x nTbS block.
    * dst4 selects DST-VII (intra luma 4x4). */
  def inverse(coefs: Array[Int], log2Size: Int, useDst: Boolean,
      bitDepth: Int): Unit = {
    val n = 1 << log2Size
    val stride = 32 / n // row k of the n-point DCT = T32 row k*stride
    def basis(r: Int, j: Int): Int =
      if (useDst) Dst4(r)(j) else T32(r * stride)(j)

    // pass 1 (vertical: transform columns), shift 7, clip to 16 bit
    val tmp = new Array[Int](n * n)
    var c = 0
    while (c < n) {
      var i = 0
      while (i < n) {
        var sum = 0L
        var k = 0
        while (k < n) {
          sum += basis(k, i).toLong * coefs(k * n + c)
          k += 1
        }
        val v = (sum + 64) >> 7
        tmp(i * n + c) = math.max(-32768L, math.min(32767L, v)).toInt
        i += 1
      }
      c += 1
    }
    // pass 2 (horizontal: transform rows), shift 20 - bitDepth
    val shift2 = 20 - bitDepth
    val add2 = 1L << (shift2 - 1)
    var r = 0
    while (r < n) {
      var j = 0
      while (j < n) {
        var sum = 0L
        var k = 0
        while (k < n) {
          sum += basis(k, j).toLong * tmp(r * n + k)
          k += 1
        }
        val v = (sum + add2) >> shift2
        coefs(r * n + j) = math.max(-32768L, math.min(32767L, v)).toInt
        j += 1
      }
      r += 1
    }
  }
}
