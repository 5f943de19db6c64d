package graft.operators.hevc

/** HEVC bitstream plumbing: annex-B / length-prefixed NAL walks, RBSP
  * de-escape (emulation-prevention removal, spec 7.3.1.1) and the
  * fixed/Exp-Golomb bit reader used by the header parsers.
  */
object HevcBits {

  object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  final class Unsupported(val what: String) extends RuntimeException(what) {
    override def fillInStackTrace(): Throwable = this
  }

  /** Split an annex-B elementary stream into NAL units (bodies without
    * start codes). */
  def annexBNals(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    val n = b.length
    var start = -1
    while (i + 2 < n) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) {
        if (start >= 0) {
          var end = i
          // a 4-byte start code's leading zero belongs to the code
          if (end > start && b(end - 1) == 0) end -= 1
          out += java.util.Arrays.copyOfRange(b, start, end)
        }
        start = i + 3
        i += 3
      } else i += 1
    }
    if (start >= 0 && start <= n) {
      out += java.util.Arrays.copyOfRange(b, start, n)
    }
    out.result()
  }

  /** De-escape EBSP -> RBSP (drop emulation_prevention_three_byte). */
  def rbsp(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length - from)
    var i = from
    var zeros = 0
    while (i < nal.length) {
      val v = nal(i)
      if (zeros >= 2 && v == 3) {
        zeros = 0 // skip the escape byte
      } else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** MSB-first bit reader with ue(v)/se(v), over RBSP bytes. */
  final class Reader(val b: Array[Byte]) {
    var pos = 0 // bit position

    def bitsLeft: Int = b.length * 8 - pos

    def u1(): Int = {
      if (pos >= b.length * 8) throw Malformed
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }

    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }

    def ue(): Int = {
      var z = 0
      while (u1() == 0) {
        z += 1
        if (z > 31) throw Malformed
      }
      if (z == 0) 0 else (1 << z) - 1 + u(z)
    }

    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }

    def byteAlign(): Unit = { pos = (pos + 7) & ~7 }
  }
}
