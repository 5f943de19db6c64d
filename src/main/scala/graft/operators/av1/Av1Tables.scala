package graft.operators.av1

/** Loader for the AV1 default-CDF / normative-table resource emitted by
  * `scripts/av1_tables.py` (see that script's header for provenance:
  * every row cross-checked byte-identical across at least two of
  * libaom / libgav1 / dav1d on this runtime; the data itself is public
  * normative content from the AV1 Bitstream & Decoding Process
  * Specification, "Default CDF Tables" et al.).
  *
  * Storage convention for CDF rows: N-symbol cdf = (N-1) inverse-CDF
  * probabilities (32768 - cumulative, strictly non-increasing); the
  * runtime context ([[Av1CdfCtx]]) appends the shared
  * zero-prob/adaptation-counter slot (counter caps at 32 < 1<<6, so the
  * symbol-decode threshold for the last symbol still reads 0 — the
  * spec's packing trick).
  */
object Av1Tables {

  final case class Table(dims: Array[Int], syms: Array[Int],
      data: Array[Int]) {
    def rows: Int = dims.product
    /** probs of row r when all rows share a symbol count */
    def row(r: Int): Array[Int] = {
      val n = syms(0) - 1
      java.util.Arrays.copyOfRange(data, r * n, r * n + n)
    }
  }

  lazy val tables: Map[String, Table] = {
    val in = getClass.getResourceAsStream("/graft/av1_default_cdfs.bin")
    require(in != null, "av1_default_cdfs.bin missing from classpath")
    val text = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.US_ASCII)
    in.close()
    val lines = text.split("\n")
    require(lines(0) == "AV1CDF1", "bad av1 cdf resource magic")
    val out = Map.newBuilder[String, Table]
    var i = 1
    while (lines(i) != "END") {
      val name = lines(i)
      val dims = lines(i + 1).split(",").map(_.toInt)
      val symsLine = lines(i + 2)
      val hex = lines(i + 3)
      val data = new Array[Int](hex.length / 4)
      var j = 0
      while (j < data.length) {
        // u16 LE pairs in hex
        val lo = Integer.parseInt(hex.substring(j * 4, j * 4 + 2), 16)
        val hi = Integer.parseInt(hex.substring(j * 4 + 2, j * 4 + 4), 16)
        data(j) = lo | (hi << 8)
        j += 1
      }
      val nrows = dims.product
      val syms: Array[Int] =
        if (symsLine.startsWith("v:")) symsLine.drop(2).split(",").map(_.toInt)
        else {
          val s = symsLine.toInt
          Array.fill(nrows)(s)
        }
      out += name -> Table(dims, syms, data)
      i += 4
    }
    out.result()
  }

  def apply(name: String): Table = tables(name)

  /** non-CDF u16 table as a plain array */
  def flat(name: String): Array[Int] = tables(name).data

  // -------- generated scan orders (rule validated against libaom and
  // libgav1 for all 14 coded sizes; three goldens committed in the
  // resource and pinned by Av1Spec) --------
  /** scan order for a w x h transform (w,h <= 32): array of coefficient
    * positions (row-major index r*w+c) in scan order.
    * square: anti-diagonal zigzag (even diagonals bottom-up, odd
    * top-down); wide (w>h): every diagonal bottom-up; tall: top-down.
    */
  def diagScan(w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var k = 0
    var d = 0
    while (d < w + h - 1) {
      val rLo = math.max(0, d - w + 1)
      val rHi = math.min(h - 1, d)
      val bottomUp = (w == h && d % 2 == 0) || w > h
      if (bottomUp) {
        var r = rHi
        while (r >= rLo) { out(k) = r * w + (d - r); k += 1; r -= 1 }
      } else {
        var r = rLo
        while (r <= rHi) { out(k) = r * w + (d - r); k += 1; r += 1 }
      }
      d += 1
    }
    out
  }

  /** column-major scan (used for the horizontal 1D transform class) */
  def colScan(w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var k = 0
    var c = 0
    while (c < w) {
      var r = 0
      while (r < h) { out(k) = r * w + c; k += 1; r += 1 }
      c += 1
    }
    out
  }

  /** row-major scan (used for the vertical 1D transform class) */
  def rowScan(w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) { out(i) = i; i += 1 }
    out
  }
}
