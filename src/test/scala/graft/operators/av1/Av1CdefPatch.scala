package graft.operators.av1

/** Dev harness: zero out the cdef strength fields of a raw AV1 payload
  * (fixed-size bit fields, in place) and write the patched payload.
  * Used to compare reference no-cdef output against ours.
  */
object Av1CdefPatch {
  def main(a: Array[String]): Unit = {
    val in = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(a(0)))
    // parse to locate the strength bits
    var seq: Av1Headers.Seq = null
    var fh: Av1Headers.Frame = null
    var p = 0
    while (p < in.length && fh == null) {
      val hdr = in(p) & 0xff
      val oType = (hdr >> 3) & 15
      val hasExt = (hdr >> 2) & 1
      var q = p + 1 + hasExt
      var size = 0L
      var shift = 0
      var more = true
      while (more) {
        val b = in(q) & 0xff; q += 1
        size |= (b & 0x7fL) << shift; more = (b & 0x80) != 0; shift += 7
      }
      val end = q + size.toInt
      oType match {
        case 1 => seq = Av1Headers.parseSeq(new Av1Headers.Bits(in, q.toLong * 8, end))
        case 3 | 6 =>
          fh = Av1Headers.parseFrame(seq, new Av1Headers.Bits(in, q.toLong * 8, end))
        case _ => ()
      }
      p = end
    }
    require(fh != null && fh.cdefStrengthBitPos >= 0, "no cdef params")
    val out = in.clone()
    var bit = fh.cdefStrengthBitPos
    @inline def zero(n: Int): Unit = {
      var k = 0
      while (k < n) {
        val byteI = (bit >> 3).toInt
        val m = 0x80 >> (bit & 7)
        out(byteI) = (out(byteI) & ~m).toByte
        bit += 1
        k += 1
      }
    }
    var i = 0
    while (i < (1 << fh.cdefBits)) {
      zero(6) // y pri + sec
      if (!seq.monochrome) zero(6)
      i += 1
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(a(1)), out)
    println(s"patched ${1 << fh.cdefBits} strength entries at bit ${fh.cdefStrengthBitPos}")
  }
}
