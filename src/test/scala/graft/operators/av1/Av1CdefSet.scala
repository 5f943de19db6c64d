package graft.operators.av1

/** Dev harness: set cdef strength entry 0 of a raw AV1 payload to the
  * given (yPri, ySecRaw, uvPri, uvSecRaw) bit values.
  */
object Av1CdefSet {
  def main(a: Array[String]): Unit = {
    val in = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(a(0)))
    var seq: Av1Headers.Seq = null
    var fh: Av1Headers.Frame = null
    var p = 0
    while (p < in.length && fh == null) {
      val hdr = in(p) & 0xff
      val oType = (hdr >> 3) & 15
      var q = p + 1 + ((hdr >> 2) & 1)
      var size = 0L; var shift = 0; var more = true
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
    require(fh != null && fh.cdefStrengthBitPos >= 0)
    val out = in.clone()
    var bit = fh.cdefStrengthBitPos
    def put(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        val byteI = (bit >> 3).toInt
        val m = 0x80 >> (bit & 7)
        if (((v >> k) & 1) == 1) out(byteI) = (out(byteI) | m).toByte
        else out(byteI) = (out(byteI) & ~m).toByte
        bit += 1; k -= 1
      }
    }
    put(a(2).toInt, 4); put(a(3).toInt, 2)
    if (!seq.monochrome) { put(a(4).toInt, 4); put(a(5).toInt, 2) }
    java.nio.file.Files.write(java.nio.file.Paths.get(a(1)), out)
  }
}
