package graft.operators

/** From-scratch LZMA decoder + encoder core (the public LZMA
  * specification: Igor Pavlov's lzma-specification.txt, 7-Zip public
  * domain reference semantics) — the entropy layer under `.xz`/LZMA2
  * ([[Xz]]). Pure JVM, no codec libraries: unlike zstd, the runtime
  * ships no LZMA implementation, so this is a spec implementation in
  * the bzip2/JPEG tradition of this repo.
  *
  * Model recap (probabilities are 11-bit, init 1024, adaptive shift
  * 5): a symbol is either a LITERAL (8-bit bit-tree over a context of
  * the previous byte's high `lc` bits and the position's low `lp`
  * bits; in states ≥ 7 the "matched literal" form steers by the byte
  * at distance rep0 until prediction and data diverge), or a MATCH
  * (length coder + 6-bit position slot + fixed/aligned distance
  * bits), or a REP match reusing one of the last four distances, with
  * a 1-byte short-rep form. A 12-state machine conditions everything
  * on what came before.
  *
  * The decoder works on one growing output buffer per block so LZMA2
  * chunk resets compose naturally: a dict reset fences how far back
  * distances may reach AND restarts the position context
  * ([[LzmaState.dictStart]] — xz-utils semantics: posState and the
  * `lp` literal context are relative to the dictionary position, not
  * the block).
  *
  * Corruption anywhere (range-coder starvation, distance past the
  * dict fence, size overrun, unclean drain) raises [[Lzma.Corrupt]],
  * which callers convert to a loud whole-file reject — never partial
  * bytes.
  */
object Lzma {

  final class Corrupt extends RuntimeException("lzma corrupt")
  private def bad(): Nothing = throw new Corrupt

  private val ProbInit: Short = 1024 // kBitModelTotal/2

  // ---------------------------------------------------------------- range
  /** Range decoder (spec §Range Decoder): 32-bit range/code, byte-wise
    * normalization when range drops under 2^24 — a single `if`, exactly
    * mirrored by the encoder so both sides see the same renormalization
    * sequence. The first stream byte must be 0.
    */
  final class RangeDec(buf: Array[Byte], var pos: Int, val end: Int) {
    var range: Int = -1 // 0xFFFFFFFF
    var code: Int = 0
    if (pos >= end || buf(pos) != 0) bad()
    pos += 1
    private var i0 = 0
    while (i0 < 4) { code = (code << 8) | nextByte(); i0 += 1 }

    private def nextByte(): Int = {
      if (pos >= end) bad()
      val b = buf(pos) & 0xff; pos += 1; b
    }
    @inline private def normalize(): Unit =
      if ((range & 0xff000000) == 0) {
        range = range << 8
        code = (code << 8) | nextByte()
      }

    def decodeBit(probs: Array[Short], idx: Int): Int = {
      val v = probs(idx)
      val bound = (range >>> 11) * v
      val bit =
        if (java.lang.Integer.compareUnsigned(code, bound) < 0) {
          probs(idx) = (v + ((2048 - v) >>> 5)).toShort
          range = bound
          0
        } else {
          probs(idx) = (v - (v >>> 5)).toShort
          code -= bound
          range -= bound
          1
        }
      normalize()
      bit
    }

    def decodeDirectBits(n: Int): Int = {
      var res = 0
      var k = n
      while (k > 0) {
        range = range >>> 1
        code -= range
        val t = 0 - (code >>> 31)
        code += range & t
        normalize()
        res = (res << 1) + t + 1
        k -= 1
      }
      res
    }

    /** True iff the stream drained cleanly (code returns to 0). */
    def finishedClean: Boolean = code == 0
  }

  /** Range encoder — the exact mirror (the SDK's shift-low carry
    * machinery). Probabilities adapt identically to the decoder so the
    * two stay in lockstep.
    */
  final class RangeEnc(out: java.io.ByteArrayOutputStream) {
    private var low: Long = 0
    private var range: Int = -1
    private var cacheSize: Long = 1
    private var cache: Int = 0

    private def shiftLow(): Unit = {
      val lowHi = (low >>> 32).toInt
      if (lowHi != 0 || low < 0xff000000L) {
        var temp = cache
        var n = cacheSize
        while (n != 0) {
          out.write((temp + lowHi) & 0xff)
          temp = 0xff
          n -= 1
        }
        cacheSize = 0
        cache = ((low >>> 24) & 0xff).toInt
      }
      cacheSize += 1
      low = (low & 0x00ffffffL) << 8
    }

    def encodeBit(probs: Array[Short], idx: Int, bit: Int): Unit = {
      val v = probs(idx)
      val bound = (range >>> 11) * v
      if (bit == 0) {
        probs(idx) = (v + ((2048 - v) >>> 5)).toShort
        range = bound
      } else {
        probs(idx) = (v - (v >>> 5)).toShort
        low += bound & 0xffffffffL
        range -= bound
      }
      if ((range & 0xff000000) == 0) { range = range << 8; shiftLow() }
    }

    def encodeDirectBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        range = range >>> 1
        if (((v >>> k) & 1) != 0) low += range & 0xffffffffL
        if ((range & 0xff000000) == 0) { range = range << 8; shiftLow() }
        k -= 1
      }
    }

    def flush(): Unit = { var i = 0; while (i < 5) { shiftLow(); i += 1 } }
  }

  // ------------------------------------------------------------ bit trees
  private def treeDecode(rc: RangeDec, probs: Array[Short], off: Int, n: Int): Int = {
    var m = 1
    var k = n
    while (k > 0) { m = (m << 1) + rc.decodeBit(probs, off + m); k -= 1 }
    m - (1 << n)
  }
  private def treeReverseDecode(rc: RangeDec, probs: Array[Short], off: Int, n: Int): Int = {
    var m = 1
    var sym = 0
    var i = 0
    while (i < n) {
      val b = rc.decodeBit(probs, off + m)
      m = (m << 1) + b
      sym |= b << i
      i += 1
    }
    sym
  }
  private def treeEncode(rc: RangeEnc, probs: Array[Short], off: Int, n: Int, sym: Int): Unit = {
    var m = 1
    var k = n - 1
    while (k >= 0) {
      val b = (sym >>> k) & 1
      rc.encodeBit(probs, off + m, b)
      m = (m << 1) + b
      k -= 1
    }
  }
  private def treeReverseEncode(rc: RangeEnc, probs: Array[Short], off: Int, n: Int, sym: Int): Unit = {
    var m = 1
    var i = 0
    while (i < n) {
      val b = (sym >>> i) & 1
      rc.encodeBit(probs, off + m, b)
      m = (m << 1) + b
      i += 1
    }
  }

  // --------------------------------------------------------- length coder
  /** choice(2) + low[16×8] + mid[16×8] + high[256]; value 0..271 maps to
    * match length 2..273.
    */
  private final class LenCoder {
    val choice = Array.fill[Short](2)(ProbInit)
    val low = Array.fill[Short](16 << 3)(ProbInit)
    val mid = Array.fill[Short](16 << 3)(ProbInit)
    val high = Array.fill[Short](256)(ProbInit)
    def decode(rc: RangeDec, posState: Int): Int =
      if (rc.decodeBit(choice, 0) == 0) treeDecode(rc, low, posState << 3, 3)
      else if (rc.decodeBit(choice, 1) == 0) 8 + treeDecode(rc, mid, posState << 3, 3)
      else 16 + treeDecode(rc, high, 0, 8)
    def encode(rc: RangeEnc, posState: Int, v: Int): Unit =
      if (v < 8) { rc.encodeBit(choice, 0, 0); treeEncode(rc, low, posState << 3, 3, v) }
      else if (v < 16) {
        rc.encodeBit(choice, 0, 1); rc.encodeBit(choice, 1, 0)
        treeEncode(rc, mid, posState << 3, 3, v - 8)
      } else {
        rc.encodeBit(choice, 0, 1); rc.encodeBit(choice, 1, 1)
        treeEncode(rc, high, 0, 8, v - 16)
      }
  }

  // ---------------------------------------------------------------- state
  /** Full adaptive state of one LZMA stream: probability models, the
    * 12-state machine, the four rep distances, and the dict-reset
    * fence. Persists across LZMA2 chunks; [[resetState]] re-initializes
    * the models (LZMA2 state-reset semantics) without touching the
    * fence.
    */
  final class LzmaState(var lc: Int, var lp: Int, var pb: Int) {
    var isMatch: Array[Short] = _
    var isRep: Array[Short] = _
    var isRepG0: Array[Short] = _
    var isRepG1: Array[Short] = _
    var isRepG2: Array[Short] = _
    var isRep0Long: Array[Short] = _
    var posSlot: Array[Short] = _
    var specPos: Array[Short] = _
    var align: Array[Short] = _
    var literal: Array[Short] = _
    private[Lzma] var lenC: LenCoder = _
    private[Lzma] var repLenC: LenCoder = _
    var state: Int = 0
    var rep0: Int = 0
    var rep1: Int = 0
    var rep2: Int = 0
    var rep3: Int = 0
    /** Output index of the last dict reset: distances may not reach
      * before it, and position contexts count from it.
      */
    var dictStart: Int = 0
    /** Declared dictionary size (xz filter props): a NEW match distance
      * ≥ this rejects even when the bytes happen to sit in the block
      * buffer — real decoders bound the window by the declaration. The
      * ENCODER bounds its match search by the same field so fixtures
      * stay self-consistent with the dict size their headers declare.
      */
    var dictLimit: Int = Int.MaxValue
    /** Encoder-side 3-byte-hash match dictionary, carried ACROSS chunks
      * (rebuilding from dictStart per chunk made multi-chunk encoding
      * quadratic). Cleared on dict reset — matches must not cross it.
      */
    private[operators] var encHash: java.util.HashMap[Integer, Integer] =
      new java.util.HashMap[Integer, Integer]()
    def clearEncHash(): Unit = encHash = new java.util.HashMap[Integer, Integer]()
    resetState()

    /** Props byte: d = (pb·5 + lp)·9 + lc, d ≤ 224. LZMA2 adds the
      * constraint lc + lp ≤ 4; the legacy `.lzma` framing does not
      * (lc up to 8 and lp up to 4 are legal there — `lzma2 = false`).
      */
    def setProps(d: Int, lzma2: Boolean = true): Unit = {
      if (d < 0 || d > 224) bad()
      lc = d % 9
      val r = d / 9
      lp = r % 5
      pb = r / 5
      if (pb > 4 || (lzma2 && lc + lp > 4)) bad()
    }

    def resetState(): Unit = {
      isMatch = Array.fill[Short](12 << 4)(ProbInit)
      isRep = Array.fill[Short](12)(ProbInit)
      isRepG0 = Array.fill[Short](12)(ProbInit)
      isRepG1 = Array.fill[Short](12)(ProbInit)
      isRepG2 = Array.fill[Short](12)(ProbInit)
      isRep0Long = Array.fill[Short](12 << 4)(ProbInit)
      posSlot = Array.fill[Short](4 << 6)(ProbInit)
      specPos = Array.fill[Short](128)(ProbInit)
      align = Array.fill[Short](16)(ProbInit)
      literal = Array.fill[Short](0x300 << (lc + lp))(ProbInit)
      lenC = new LenCoder
      repLenC = new LenCoder
      state = 0; rep0 = 0; rep1 = 0; rep2 = 0; rep3 = 0
    }
  }

  // --------------------------------------------------------------- decode
  /** Decode exactly `unpackLen` bytes of one LZMA2 chunk into `out` at
    * `outPos0`, reading compressed bytes `data[cPos, cEnd)`. The chunk
    * must consume its compressed bytes exactly and the range coder must
    * drain clean. Throws [[Corrupt]] on any inconsistency.
    */
  def decodeChunk(st: LzmaState, data: Array[Byte], cPos: Int, cEnd: Int,
      out: Array[Byte], outPos0: Int, unpackLen: Int): Unit = {
    val rc = new RangeDec(data, cPos, cEnd)
    val pbMask = (1 << st.pb) - 1
    val lpMask = (1 << st.lp) - 1
    var outPos = outPos0
    val outEnd = outPos0 + unpackLen
    if (outEnd > out.length) bad()
    while (outPos < outEnd) {
      val posState = (outPos - st.dictStart) & pbMask
      if (rc.decodeBit(st.isMatch, (st.state << 4) + posState) == 0) {
        // literal
        val prev = if (outPos > st.dictStart) out(outPos - 1) & 0xff else 0
        val litState =
          (((outPos - st.dictStart) & lpMask) << st.lc) + (prev >>> (8 - st.lc))
        val off = 0x300 * litState
        var symbol = 1
        if (st.state >= 7) {
          if (outPos - st.rep0 - 1 < st.dictStart) bad()
          var matchByte = out(outPos - st.rep0 - 1) & 0xff
          var steering = true
          while (steering && symbol < 0x100) {
            val matchBit = (matchByte >>> 7) & 1
            matchByte = (matchByte << 1) & 0xff
            val bit = rc.decodeBit(st.literal, off + ((1 + matchBit) << 8) + symbol)
            symbol = (symbol << 1) | bit
            if (matchBit != bit) steering = false
          }
        }
        while (symbol < 0x100)
          symbol = (symbol << 1) | rc.decodeBit(st.literal, off + symbol)
        out(outPos) = (symbol & 0xff).toByte
        outPos += 1
        st.state =
          if (st.state < 4) 0 else if (st.state < 10) st.state - 3 else st.state - 6
      } else if (rc.decodeBit(st.isRep, st.state) != 0) {
        // rep match
        if (outPos == st.dictStart) bad() // nothing to repeat yet
        if (rc.decodeBit(st.isRepG0, st.state) == 0) {
          if (rc.decodeBit(st.isRep0Long, (st.state << 4) + posState) == 0) {
            // short rep: a single byte at rep0
            st.state = if (st.state < 7) 9 else 11
            if (outPos - st.rep0 - 1 < st.dictStart) bad()
            out(outPos) = out(outPos - st.rep0 - 1)
            outPos += 1
          } else {
            val len = st.repLenC.decode(rc, posState) + 2
            st.state = if (st.state < 7) 8 else 11
            outPos = copyMatch(st, out, outPos, outEnd, len)
          }
        } else {
          var dist = 0
          if (rc.decodeBit(st.isRepG1, st.state) == 0) dist = st.rep1
          else {
            if (rc.decodeBit(st.isRepG2, st.state) == 0) dist = st.rep2
            else { dist = st.rep3; st.rep3 = st.rep2 }
            st.rep2 = st.rep1
          }
          st.rep1 = st.rep0
          st.rep0 = dist
          val len = st.repLenC.decode(rc, posState) + 2
          st.state = if (st.state < 7) 8 else 11
          outPos = copyMatch(st, out, outPos, outEnd, len)
        }
      } else {
        // new match
        st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = st.rep0
        val lenVal = st.lenC.decode(rc, posState)
        st.state = if (st.state < 7) 7 else 10
        val lenState = math.min(lenVal, 3)
        val slot = treeDecode(rc, st.posSlot, lenState << 6, 6)
        var dist = slot
        if (slot >= 4) {
          val nd = (slot >> 1) - 1
          dist = (2 | (slot & 1)) << nd
          if (slot < 14)
            // spec: PosDecoders + dist - posSlot, tree index m starts at 1
            // (max access: slot 13 → 96 - 13 + 31 = 114, the array's last)
            dist += treeReverseDecode(rc, st.specPos, dist - slot, nd)
          else {
            dist += rc.decodeDirectBits(nd - 4) << 4
            dist += treeReverseDecode(rc, st.align, 0, 4)
          }
        }
        if (dist == -1) bad() // end marker: LZMA2 chunks are size-framed
        if (java.lang.Integer.compareUnsigned(dist, st.dictLimit) >= 0) bad()
        st.rep0 = dist
        outPos = copyMatch(st, out, outPos, outEnd, lenVal + 2)
      }
    }
    if (rc.pos != cEnd || !rc.finishedClean) bad()
  }

  private def copyMatch(st: LzmaState, out: Array[Byte], outPos0: Int,
      outEnd: Int, len: Int): Int = {
    var outPos = outPos0
    if (outPos - st.rep0 - 1 < st.dictStart) bad()
    if (outPos + len > outEnd) bad() // sizes are exact; overrun = corrupt
    var i = 0
    while (i < len) {
      out(outPos) = out(outPos - st.rep0 - 1)
      outPos += 1
      i += 1
    }
    outPos
  }

  /** Decode one LZMA-ALONE stream (the legacy `.lzma` framing, which
    * [[decodeChunk]] cannot serve: its size may be UNKNOWN, terminated
    * by the in-stream end marker — dist 0xFFFFFFFF — that size-framed
    * LZMA2 chunks must reject). `expected < 0` means marker-terminated;
    * `expected ≥ 0` means exactly that many bytes, with an OPTIONAL
    * trailing marker (the spec allows both). Either way the compressed
    * bytes must be consumed exactly and the range coder drain clean.
    * Output grows against `cap` (the bomb guard).
    *
    * MAINTENANCE: the symbol loop below is [[decodeChunk]]'s twin —
    * they differ only in termination (marker vs exact size), buffer
    * ownership (local growable vs the caller's shared block buffer at
    * an offset) and the dict fence (always 0 here). A shared core
    * would force a write-sink indirection into the hot loop; instead
    * BOTH copies are pinned independently against the reference
    * implementation (XzSpec's bidirectional xz/--format=lzma interop),
    * so a fix applied to one and not the other fails a spec rather
    * than drifting silently. Fix symbol-level bugs in BOTH places.
    */
  def decodeAlone(st: LzmaState, data: Array[Byte], cPos: Int, cEnd: Int,
      expected: Long, cap: Int): Array[Byte] = {
    val rc = new RangeDec(data, cPos, cEnd)
    val pbMask = (1 << st.pb) - 1
    val lpMask = (1 << st.lp) - 1
    if (expected > cap) bad() // before allocation: a declared-TB size must
    // not reach `new Array` (the bomb guard orders before the buffer).
    // Known sizes still start SMALL and grow through ensure(): an
    // 18-byte hostile file declaring exactly `cap` must not buy a
    // cap-sized allocation before its first compressed byte validates.
    var out = new Array[Byte](
      if (expected >= 0) math.min(expected, 64L << 10).toInt else 64 << 10)
    var outPos = 0
    def ensure(n: Int): Unit = {
      if (n > cap) bad()
      if (n > out.length) {
        var c2 = out.length.toLong
        while (c2 < n) c2 *= 2
        out = java.util.Arrays.copyOf(out, math.min(c2, cap.toLong).toInt)
      }
    }
    var done = false
    while (!done) {
      if (expected >= 0 && outPos == expected && rc.pos == cEnd) done = true
      else {
        val posState = outPos & pbMask
        if (rc.decodeBit(st.isMatch, (st.state << 4) + posState) == 0) {
          if (expected >= 0 && outPos >= expected) bad()
          val prev = if (outPos > 0) out(outPos - 1) & 0xff else 0
          val litState = ((outPos & lpMask) << st.lc) + (prev >>> (8 - st.lc))
          val off = 0x300 * litState
          var symbol = 1
          if (st.state >= 7) {
            if (outPos - st.rep0 - 1 < 0) bad()
            var matchByte = out(outPos - st.rep0 - 1) & 0xff
            var steering = true
            while (steering && symbol < 0x100) {
              val matchBit = (matchByte >>> 7) & 1
              matchByte = (matchByte << 1) & 0xff
              val bit = rc.decodeBit(st.literal, off + ((1 + matchBit) << 8) + symbol)
              symbol = (symbol << 1) | bit
              if (matchBit != bit) steering = false
            }
          }
          while (symbol < 0x100)
            symbol = (symbol << 1) | rc.decodeBit(st.literal, off + symbol)
          ensure(outPos + 1)
          out(outPos) = (symbol & 0xff).toByte
          outPos += 1
          st.state =
            if (st.state < 4) 0 else if (st.state < 10) st.state - 3 else st.state - 6
        } else if (rc.decodeBit(st.isRep, st.state) != 0) {
          if (outPos == 0) bad()
          if (expected >= 0 && outPos >= expected) bad()
          if (rc.decodeBit(st.isRepG0, st.state) == 0) {
            if (rc.decodeBit(st.isRep0Long, (st.state << 4) + posState) == 0) {
              st.state = if (st.state < 7) 9 else 11
              if (outPos - st.rep0 - 1 < 0) bad()
              ensure(outPos + 1)
              out(outPos) = out(outPos - st.rep0 - 1)
              outPos += 1
            } else {
              val len = st.repLenC.decode(rc, posState) + 2
              st.state = if (st.state < 7) 8 else 11
              ensure(outPos + len)
              outPos = copyMatch(st, out, outPos, outPos + len, len)
            }
          } else {
            var dist = 0
            if (rc.decodeBit(st.isRepG1, st.state) == 0) dist = st.rep1
            else {
              if (rc.decodeBit(st.isRepG2, st.state) == 0) dist = st.rep2
              else { dist = st.rep3; st.rep3 = st.rep2 }
              st.rep2 = st.rep1
            }
            st.rep1 = st.rep0
            st.rep0 = dist
            val len = st.repLenC.decode(rc, posState) + 2
            st.state = if (st.state < 7) 8 else 11
            ensure(outPos + len)
            outPos = copyMatch(st, out, outPos, outPos + len, len)
          }
        } else {
          st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = st.rep0
          val lenVal = st.lenC.decode(rc, posState)
          st.state = if (st.state < 7) 7 else 10
          val lenState = math.min(lenVal, 3)
          val slot = treeDecode(rc, st.posSlot, lenState << 6, 6)
          var dist = slot
          if (slot >= 4) {
            val nd = (slot >> 1) - 1
            dist = (2 | (slot & 1)) << nd
            if (slot < 14)
              dist += treeReverseDecode(rc, st.specPos, dist - slot, nd)
            else {
              dist += rc.decodeDirectBits(nd - 4) << 4
              dist += treeReverseDecode(rc, st.align, 0, 4)
            }
          }
          if (dist == -1) {
            // end marker: with a known size it must land exactly there
            if (expected >= 0 && outPos != expected) bad()
            done = true
          } else {
            if (expected >= 0 && outPos >= expected) bad()
            if (java.lang.Integer.compareUnsigned(dist, st.dictLimit) >= 0) bad()
            st.rep0 = dist
            val len = lenVal + 2
            ensure(outPos + len)
            outPos = copyMatch(st, out, outPos, outPos + len, len)
          }
        }
      }
    }
    if (rc.pos != cEnd || !rc.finishedClean) bad()
    java.util.Arrays.copyOf(out, outPos)
  }

  // --------------------------------------------------------------- encode
  private def posSlotOf(dist: Int): Int =
    if (dist < 4) dist
    else {
      val k = 31 - Integer.numberOfLeadingZeros(dist) // top bit index
      (k << 1) + ((dist >>> (k - 1)) & 1)
    }

  /** Encode `in[from, until)` as one LZMA2 chunk body (no control
    * framing, no end marker — sizes frame the chunk), continuing the
    * adaptive state `st`. A greedy 3-byte-hash matcher emits literals,
    * matches and rep0 matches — enough to exercise every decoder path
    * while staying obviously correct; matches may reach back into
    * earlier chunks of the same block (cross-chunk dictionary).
    */
  def encodeChunk(st: LzmaState, in: Array[Byte], from: Int, until: Int,
      endMarker: Boolean = false): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val rc = new RangeEnc(bo)
    val pbMask = (1 << st.pb) - 1
    val lpMask = (1 << st.lp) - 1
    val hash = st.encHash // accumulated by prior chunks of this block
    var pos = from
    while (pos < until) {
      val posState = (pos - st.dictStart) & pbMask
      // greedy probe: last position sharing our next 3 bytes; a
      // candidate past the DECLARED dict size is unusable — the
      // decoder (and real xz) reject such distances, so the encoder
      // must never emit them even when the block buffer holds the bytes
      var bestLen = 0
      var bestDist = 0
      if (pos + 2 < until) {
        val cand = hash.get(key(in, pos))
        if (cand != null && cand.intValue >= st.dictStart &&
            (pos - cand.intValue - 1) < st.dictLimit) {
          val c = cand.intValue
          val maxL = math.min(until - pos, 273)
          var l = 0
          while (l < maxL && in(c + l) == in(pos + l)) l += 1
          if (l >= 3) { bestLen = l; bestDist = pos - c - 1 }
        }
      }
      if (bestLen >= 3) {
        rc.encodeBit(st.isMatch, (st.state << 4) + posState, 1)
        if (bestDist == st.rep0) {
          rc.encodeBit(st.isRep, st.state, 1)
          rc.encodeBit(st.isRepG0, st.state, 0)
          rc.encodeBit(st.isRep0Long, (st.state << 4) + posState, 1)
          st.repLenC.encode(rc, posState, bestLen - 2)
          st.state = if (st.state < 7) 8 else 11
        } else {
          rc.encodeBit(st.isRep, st.state, 0)
          st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = st.rep0
          st.rep0 = bestDist
          st.lenC.encode(rc, posState, bestLen - 2)
          st.state = if (st.state < 7) 7 else 10
          val lenState = math.min(bestLen - 2, 3)
          val slot = posSlotOf(bestDist)
          treeEncode(rc, st.posSlot, lenState << 6, 6, slot)
          if (slot >= 4) {
            val nd = (slot >> 1) - 1
            val base = (2 | (slot & 1)) << nd
            val rest = bestDist - base
            if (slot < 14) treeReverseEncode(rc, st.specPos, base - slot, nd, rest)
            else {
              rc.encodeDirectBits(rest >>> 4, nd - 4)
              treeReverseEncode(rc, st.align, 0, 4, rest & 15)
            }
          }
        }
        var j = pos
        val stop = math.min(pos + bestLen, until - 2)
        while (j < stop) { hash.put(key(in, j), Integer.valueOf(j)); j += 1 }
        pos += bestLen
      } else {
        // literal
        rc.encodeBit(st.isMatch, (st.state << 4) + posState, 0)
        val prev = if (pos > st.dictStart) in(pos - 1) & 0xff else 0
        val litState =
          (((pos - st.dictStart) & lpMask) << st.lc) + (prev >>> (8 - st.lc))
        val off = 0x300 * litState
        val sym = in(pos) & 0xff
        if (st.state >= 7) {
          var matchByte = in(pos - st.rep0 - 1) & 0xff
          var m = 1
          var steering = true
          var i = 7
          while (i >= 0) {
            val bit = (sym >>> i) & 1
            if (steering) {
              val matchBit = (matchByte >>> 7) & 1
              matchByte = (matchByte << 1) & 0xff
              rc.encodeBit(st.literal, off + ((1 + matchBit) << 8) + m, bit)
              if (matchBit != bit) steering = false
            } else {
              rc.encodeBit(st.literal, off + m, bit)
            }
            m = (m << 1) | bit
            i -= 1
          }
        } else {
          treeEncode(rc, st.literal, off, 8, sym)
        }
        st.state =
          if (st.state < 4) 0 else if (st.state < 10) st.state - 3 else st.state - 6
        if (pos + 2 < until) hash.put(key(in, pos), Integer.valueOf(pos))
        pos += 1
      }
    }
    if (endMarker) {
      // dist 0xFFFFFFFF: slot 63, 26 one direct bits, align 0xF — the
      // `.lzma` stream terminator ([[decodeAlone]]'s unknown-size stop)
      val posState = (until - st.dictStart) & pbMask
      rc.encodeBit(st.isMatch, (st.state << 4) + posState, 1)
      rc.encodeBit(st.isRep, st.state, 0)
      st.lenC.encode(rc, posState, 0)
      treeEncode(rc, st.posSlot, 0, 6, 63)
      rc.encodeDirectBits(0x3ffffff, 26)
      treeReverseEncode(rc, st.align, 0, 4, 0xf)
    }
    rc.flush()
    bo.toByteArray
  }

  private def key(in: Array[Byte], i: Int): Integer =
    Integer.valueOf(((in(i) & 0xff) << 16) | ((in(i + 1) & 0xff) << 8) | (in(i + 2) & 0xff))
}
