package graft.operators

/** BCJ2 — 7-Zip's four-stream x86 branch converter (coder id
  * 03 03 01 1B), the DEFAULT filter common 7-Zip versions apply to
  * executables, so exe-bearing `.7z` archives hit it more often than
  * plain BCJ (VERDICT r13 ranked it the most-hit remaining archive
  * reject). Unlike BCJ it is not a size-preserving in-place rewrite:
  * the encoder REMOVES each converted CALL/JMP/Jcc rel32 operand from
  * the main byte stream and routes the absolute target to a separate
  * stream (calls and jumps compress separately, far better), and a
  * range-coded bit stream records the per-site convert/skip decision:
  *
  *   stream 0 `main` — the bytes, minus converted operands
  *   stream 1 `call` — 4-byte BIG-endian absolute targets of E8 sites
  *   stream 2 `jump` — same for E9 and 0F 8x (Jcc near) sites
  *   stream 3 `rc`   — LZMA-style binary range coder (11-bit adaptive
  *                     probabilities, 2 + 256 contexts: one for Jcc,
  *                     one for E9, one per preceding byte for E8)
  *
  * Implemented from the published algorithm (the 7-Zip/LZMA SDK BCJ2
  * coder; the range coder is LZMA's standard bit coder). Evidence
  * discipline (NOTES_r14 memo — the BCJ-x86/brotli pattern): this
  * runtime carries libarchive 3.8.2 with its independent BCJ2 decoder
  * (`bsdtar`), so every encoder detail — context selection, range
  * arithmetic, operand routing, tail-candidate semantics — is
  * differentially validated by reference extraction of our archives
  * (SevenZipSpec), on top of hand-pinned range-coder goldens and
  * adversarial round-trips. A decoded bit's cost model: nothing is
  * executed; the transform is deterministic byte surgery, CRC-checked
  * by the surrounding folder.
  *
  * Exact-consume: decode requires main/call/jump fully drained and at
  * most 4 unread rc bytes (the encoder's 5-byte flush tail minus the
  * init byte the decoder re-reads — pinned by the round-trip suite).
  */
object Bcj2 {

  private val BitModelTotal = 2048 // 11-bit probabilities
  private val MoveBits = 5
  private val TopValue = 1L << 24

  @inline private def isCandidate(prev: Int, b: Int): Boolean =
    (b & 0xfe) == 0xe8 || (prev == 0x0f && (b & 0xf0) == 0x80)

  @inline private def probIndex(prev: Int, b: Int): Int =
    if (b == 0xe8) 2 + prev else if (b == 0xe9) 1 else 0

  @inline private def be32(a: Array[Byte], o: Int): Long =
    ((a(o) & 0xffL) << 24) | ((a(o + 1) & 0xffL) << 16) |
      ((a(o + 2) & 0xffL) << 8) | (a(o + 3) & 0xffL)

  /** Decode the four streams into `outLen` bytes. None on ANY
    * malformation: stream under/overrun, a convert bit with no room
    * for the operand, or unread leftovers past the rc flush slack.
    */
  def decode(main: Array[Byte], call: Array[Byte], jump: Array[Byte],
      rc: Array[Byte], outLen: Int): Option[Array[Byte]] = {
    if (outLen < 0 || rc.length < 5) return None
    val out = new Array[Byte](outLen)
    val probs = Array.fill(2 + 256)(BitModelTotal / 2)
    var range = 0xffffffffL
    var code = 0L
    var rcPos = 0
    // init: 5 bytes; the first is the encoder's zero cache byte whose
    // value never reaches `code`'s 32 bits
    var i = 0
    while (i < 5) { code = ((code << 8) | (rc(rcPos) & 0xff)) & 0xffffffffL; rcPos += 1; i += 1 }
    var mp = 0
    var cp = 0
    var jp = 0
    var o = 0
    var prev = 0
    var ok = true
    while (ok && o < outLen) {
      if (mp >= main.length) ok = false
      else {
        val b = main(mp) & 0xff; mp += 1
        out(o) = b.toByte; o += 1
        if (isCandidate(prev, b)) {
          // range-decode the convert/skip bit
          val idx = probIndex(prev, b)
          val ttt = probs(idx)
          val bound = (range >>> 11) * ttt
          var bit = 0
          if (code < bound) {
            range = bound
            probs(idx) = ttt + ((BitModelTotal - ttt) >> MoveBits)
          } else {
            range -= bound
            code -= bound
            probs(idx) = ttt - (ttt >> MoveBits)
            bit = 1
          }
          if (range < TopValue) {
            if (rcPos >= rc.length) ok = false
            else {
              range = (range << 8) & 0xffffffffL
              code = ((code << 8) | (rc(rcPos) & 0xff)) & 0xffffffffL
              rcPos += 1
            }
          }
          if (ok && bit == 1) {
            val src =
              if (b == 0xe8) {
                if (cp + 4 > call.length) { ok = false; 0L }
                else { val s = be32(call, cp); cp += 4; s }
              } else {
                if (jp + 4 > jump.length) { ok = false; 0L }
                else { val s = be32(jump, jp); jp += 4; s }
              }
            if (ok) {
              if (o + 4 > outLen) ok = false
              else {
                val dest = (src - (o.toLong + 4)) & 0xffffffffL
                out(o) = (dest & 0xff).toByte
                out(o + 1) = ((dest >> 8) & 0xff).toByte
                out(o + 2) = ((dest >> 16) & 0xff).toByte
                out(o + 3) = ((dest >> 24) & 0xff).toByte
                o += 4
                prev = ((dest >> 24) & 0xff).toInt
              }
            }
          } else prev = b
        } else prev = b
      }
    }
    if (!ok || mp != main.length || cp != call.length || jp != jump.length ||
      rc.length - rcPos > 4) None
    else Some(out)
  }

  /** Encode `data` into the four streams. `convert` decides per
    * candidate site (output position of the opcode byte, opcode) —
    * pluggable so the differential corpus covers convert-all,
    * convert-none and pseudo-random policies; sites with fewer than 4
    * following bytes always code a 0 bit (the operand cannot exist).
    */
  def encode(data: Array[Byte],
      convert: (Int, Int) => Boolean = (_, _) => true)
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    val main = new java.io.ByteArrayOutputStream()
    val call = new java.io.ByteArrayOutputStream()
    val jump = new java.io.ByteArrayOutputStream()
    val rcOut = new java.io.ByteArrayOutputStream()
    val probs = Array.fill(2 + 256)(BitModelTotal / 2)
    var low = 0L
    var range = 0xffffffffL
    var cache = 0
    var cacheSize = 1L
    def shiftLow(): Unit = {
      if (low < 0xff000000L || low > 0xffffffffL) {
        var c = cache
        var n = cacheSize
        while (n != 0) {
          rcOut.write(((c + (low >>> 32)) & 0xff).toInt)
          c = 0xff
          n -= 1
        }
        cacheSize = 0
        cache = ((low >>> 24) & 0xff).toInt
      }
      cacheSize += 1
      low = (low << 8) & 0xffffffffL
    }
    def encodeBit(idx: Int, bit: Int): Unit = {
      val ttt = probs(idx)
      val bound = (range >>> 11) * ttt
      if (bit == 0) {
        range = bound
        probs(idx) = ttt + ((BitModelTotal - ttt) >> MoveBits)
      } else {
        low += bound
        range -= bound
        probs(idx) = ttt - (ttt >> MoveBits)
      }
      while (range < TopValue) { range = (range << 8) & 0xffffffffL; shiftLow() }
    }
    var p = 0
    var prev = 0
    while (p < data.length) {
      val b = data(p) & 0xff
      main.write(b)
      p += 1
      if (isCandidate(prev, b)) {
        val can = p + 4 <= data.length
        val doIt = can && convert(p - 1, b)
        encodeBit(probIndex(prev, b), if (doIt) 1 else 0)
        if (doIt) {
          val rel = (data(p) & 0xffL) | ((data(p + 1) & 0xffL) << 8) |
            ((data(p + 2) & 0xffL) << 16) | ((data(p + 3) & 0xffL) << 24)
          val abs = (rel + p.toLong + 4) & 0xffffffffL
          val tgt = if (b == 0xe8) call else jump
          tgt.write(((abs >> 24) & 0xff).toInt)
          tgt.write(((abs >> 16) & 0xff).toInt)
          tgt.write(((abs >> 8) & 0xff).toInt)
          tgt.write((abs & 0xff).toInt)
          prev = (data(p + 3) & 0xff)
          p += 4
        } else prev = b
      } else prev = b
    }
    var i = 0
    while (i < 5) { shiftLow(); i += 1 } // flush
    (main.toByteArray, call.toByteArray, jump.toByteArray, rcOut.toByteArray)
  }
}
