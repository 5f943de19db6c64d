package graft.operators

/** bzip2 from scratch — the compression Wikipedia dumps and many
  * archival corpora actually ship under (.xml.bz2), which the JDK has
  * no codec for. Decode follows the public format (the bzip2 1.0
  * on-disk layout): MSB-first bitstream, per-block 48-bit magics,
  * Huffman over the MTF+RLE2 symbol stream with 50-symbol selector
  * groups and delta-coded code lengths, bijective RUNA/RUNB zero-run
  * decoding, inverse Burrows–Wheeler via the counting/T-vector
  * construction, the outer RLE1 (4-equal-bytes + count) layer, and the
  * bzip2 CRC-32 (MSB-first, poly 0x04C11DB7 — NOT the reflected zlib
  * CRC) verified per block and combined over the stream. The
  * deprecated `randomized` flag rejects. Anything malformed or
  * truncated yields None — never garbage bytes (decoder-family
  * envelope); declared block sizes bound all allocation.
  *
  * The compressor side exists for fixtures (the in-test-encoder
  * discipline of the LZW/JPEG/PNG writers): rotation-sort BWT, a
  * fixed-length Huffman table (legal, suboptimal — two identical
  * groups, all-zero selectors), real RLE1/MTF/RLE2 and real CRCs, so
  * every decoder path decodes bits the format defines, not bits the
  * decoder wishes for.
  */
object Bzip2 {

  // bzip2 CRC-32: MSB-first (unreflected), poly 0x04C11DB7
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private def crcOf(data: Array[Byte], from: Int, until: Int): Int = {
    var c = 0xffffffff
    var i = from
    while (i < until) {
      c = (c << 8) ^ crcTable(((c >>> 24) ^ (data(i) & 0xff)) & 0xff)
      i += 1
    }
    ~c
  }

  private final class BitReader(b: Array[Byte]) {
    var pos = 0L // bit cursor in a LONG: a >512 MiB shard overflows Int bits
    def bit(): Int = {
      val bi = (pos >>> 3).toInt
      if (bi >= b.length) throw new IllegalArgumentException("EOF")
      val v = (b(bi) >> (7 - (pos & 7L)).toInt) & 1
      pos += 1
      v
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def result(): Array[Byte] = {
      while (nb != 0) bit(0) // pad the final byte with zero bits
      out.toByteArray
    }
  }

  private val BlockMagic = 0x314159265359L
  private val EndMagic = 0x177245385090L

  /** Full-stream decompress; None for anything outside the envelope. */
  def decompress(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      if (data == null || data.length < 14) return None
      val br = new BitReader(data)
      val out = new java.io.ByteArrayOutputStream()
      // MULTISTREAM: Wikipedia's standard "multistream" dumps (and
      // pbzip2/lbzip2 output) are concatenated byte-aligned BZh
      // streams — after each stream's end magic + CRC the next must
      // begin immediately, and anything else trailing rejects (the
      // ZipArchive appended-garbage discipline).
      var maxBlock = 0
      var combined = 0
      var done = false
      def streamHeader(): Boolean = {
        val bi = (br.pos >>> 3).toInt
        if (bi + 4 > data.length) return false
        if (data(bi) != 'B' || data(bi + 1) != 'Z' || data(bi + 2) != 'h')
          return false
        val level = data(bi + 3) - '0'
        if (level < 1 || level > 9) return false
        maxBlock = level * 100000
        combined = 0
        br.pos += 32
        true
      }
      if (!streamHeader()) return None
      while (!done) {
        val magic = br.bits(48)
        if (magic == EndMagic) {
          val streamCrc = br.bits(32).toInt
          if (streamCrc != combined) return None
          br.pos = (br.pos + 7) & ~7L // streams are byte-aligned
          if ((br.pos >>> 3) == data.length) done = true
          else if (!streamHeader()) return None // trailing garbage
        } else if (magic != BlockMagic) return None
        else {
          val blockCrc = br.bits(32).toInt
          if (br.bit() != 0) return None // deprecated `randomized` blocks
          val origPtr = br.bits(24).toInt
          // ---- symbol map (16 + up-to-16 × 16 bits) ----
          val used = new Array[Boolean](256)
          val used16 = br.bits(16).toInt
          var nUsed = 0
          var i = 0
          while (i < 16) {
            if ((used16 & (0x8000 >>> i)) != 0) {
              val m = br.bits(16).toInt
              var j = 0
              while (j < 16) {
                if ((m & (0x8000 >>> j)) != 0) { used(i * 16 + j) = true; nUsed += 1 }
                j += 1
              }
            }
            i += 1
          }
          if (nUsed == 0) return None
          val seqToUnseq = new Array[Int](nUsed)
          var k = 0
          i = 0
          while (i < 256) { if (used(i)) { seqToUnseq(k) = i; k += 1 }; i += 1 }
          val nSyms = nUsed + 2
          val eob = nSyms - 1
          // ---- group/selector tables ----
          val nGroups = br.bits(3).toInt
          if (nGroups < 2 || nGroups > 6) return None
          val nSelectors = br.bits(15).toInt
          if (nSelectors < 1 || nSelectors > 18002) return None
          val selMtf = Array.tabulate(nGroups)(identity)
          val selectors = new Array[Int](nSelectors)
          i = 0
          while (i < nSelectors) {
            var j = 0
            while (br.bit() == 1) { j += 1; if (j >= nGroups) return None }
            val v = selMtf(j)
            while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
            selMtf(0) = v
            selectors(i) = v
            i += 1
          }
          // ---- delta-coded code lengths per group ----
          val lens = Array.ofDim[Int](nGroups, nSyms)
          var g = 0
          while (g < nGroups) {
            var c = br.bits(5).toInt
            var s = 0
            while (s < nSyms) {
              var loop = true
              while (loop) {
                if (c < 1 || c > 20) return None
                if (br.bit() == 0) loop = false
                else if (br.bit() == 0) c += 1
                else c -= 1
              }
              lens(g)(s) = c
              s += 1
            }
            g += 1
          }
          // ---- canonical decode tables (the hbCreateDecodeTables shape) ----
          val limit = Array.ofDim[Int](nGroups, 24)
          val base = Array.ofDim[Int](nGroups, 24)
          val perm = Array.ofDim[Int](nGroups, nSyms)
          val minLens = new Array[Int](nGroups)
          val maxLens = new Array[Int](nGroups)
          g = 0
          while (g < nGroups) {
            var minL = 32
            var maxL = 0
            var s = 0
            while (s < nSyms) {
              if (lens(g)(s) < minL) minL = lens(g)(s)
              if (lens(g)(s) > maxL) maxL = lens(g)(s)
              s += 1
            }
            minLens(g) = minL; maxLens(g) = maxL
            var pp = 0
            var l = minL
            while (l <= maxL) {
              s = 0
              while (s < nSyms) {
                if (lens(g)(s) == l) { perm(g)(pp) = s; pp += 1 }
                s += 1
              }
              l += 1
            }
            val cnt = new Array[Int](24)
            s = 0
            while (s < nSyms) { cnt(lens(g)(s) + 1) += 1; s += 1 }
            var x = 1
            while (x < 24) { cnt(x) += cnt(x - 1); x += 1 }
            var vec = 0
            l = minL
            while (l <= maxL) {
              vec += cnt(l + 1) - cnt(l)
              limit(g)(l) = vec - 1
              vec <<= 1
              l += 1
            }
            l = minL + 1
            while (l <= maxL) {
              base(g)(l) = ((limit(g)(l - 1) + 1) << 1) - cnt(l)
              l += 1
            }
            // base at minLen is the cumulative count below it
            base(g)(minL) = cnt(minL)
            g += 1
          }
          // ---- Huffman + RLE2/MTF decode into the BWT string ----
          var groupNo = -1
          var groupPos = 0
          var gSel = 0
          def nextSym(): Int = {
            if (groupPos == 0) {
              groupNo += 1
              if (groupNo >= nSelectors) throw new IllegalArgumentException("selectors exhausted")
              groupPos = 50
              gSel = selectors(groupNo)
            }
            groupPos -= 1
            var zn = minLens(gSel)
            var zvec = br.bits(zn).toInt
            while (zvec > limit(gSel)(zn)) {
              zn += 1
              if (zn > maxLens(gSel)) throw new IllegalArgumentException("bad code")
              zvec = (zvec << 1) | br.bit()
            }
            val idx = zvec - base(gSel)(zn)
            if (idx < 0 || idx >= nSyms) throw new IllegalArgumentException("bad code")
            perm(gSel)(idx)
          }
          val mtf = seqToUnseq.clone()
          val bwt = new Array[Byte](maxBlock)
          var nblock = 0
          var sym = nextSym()
          while (sym != eob) {
            if (sym <= 1) {
              var run = 0L
              var kk = 0
              while (sym <= 1) {
                run += (sym + 1).toLong << kk
                kk += 1
                if (kk > 24) return None
                sym = nextSym()
              }
              val b0 = mtf(0)
              if (nblock + run > maxBlock) return None
              var r = 0L
              while (r < run) { bwt(nblock) = b0.toByte; nblock += 1; r += 1 }
            } else {
              val j = sym - 1
              if (j >= nUsed) return None
              val v = mtf(j)
              var x = j
              while (x > 0) { mtf(x) = mtf(x - 1); x -= 1 }
              mtf(0) = v
              if (nblock >= maxBlock) return None
              bwt(nblock) = v.toByte
              nblock += 1
              sym = nextSym()
            }
          }
          if (nblock == 0 || origPtr >= nblock) return None
          // ---- inverse BWT (counting / T-vector) ----
          val cftab = new Array[Int](257)
          i = 0
          while (i < nblock) { cftab((bwt(i) & 0xff) + 1) += 1; i += 1 }
          i = 1
          while (i <= 256) { cftab(i) += cftab(i - 1); i += 1 }
          val tt = new Array[Int](nblock)
          i = 0
          while (i < nblock) {
            val uc = bwt(i) & 0xff
            tt(cftab(uc)) = i
            cftab(uc) += 1
            i += 1
          }
          val pre = new Array[Byte](nblock)
          var p = tt(origPtr)
          i = 0
          while (i < nblock) { pre(i) = bwt(p); p = tt(p); i += 1 }
          // ---- outer RLE1 decode (4 equal bytes + count) ----
          // block CRC accumulates INCREMENTALLY as bytes emit — copying
          // the whole output buffer per block would be quadratic across
          // a multi-block stream (review finding r10)
          var crc = 0xffffffff
          def emit(b: Int): Unit = {
            crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ b) & 0xff)
            out.write(b)
          }
          var run1 = 0
          var last = -1
          i = 0
          while (i < nblock) {
            val b = pre(i) & 0xff
            if (b == last) run1 += 1 else { last = b; run1 = 1 }
            emit(b)
            i += 1
            if (run1 == 4) {
              if (i >= nblock) return None // count byte missing
              val extra = pre(i) & 0xff
              i += 1
              var e = 0
              while (e < extra) { emit(b); e += 1 }
              run1 = 0
              last = -1
            }
          }
          if (~crc != blockCrc) return None
          combined = ((combined << 1) | (combined >>> 31)) ^ blockCrc
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Fixture compressor: MULTI-BLOCK level-1 bzip2 — input split into
    * 80000-byte segments (RLE1's worst case expands 4→5, so a segment
    * always fits the 100000-byte block bound), each compressed by
    * [[compressBlock]], with the combined stream CRC chained
    * rotate-left-1-then-xor per the format. Legal bzip2 that any
    * conforming decoder (including real bunzip2) reads, and the
    * fixture path that exercises the decoder's multi-block loop.
    */
  def compress(input: Array[Byte]): Array[Byte] = {
    // blocks are bit-packed back to back with NO byte alignment between
    // them, so the whole stream flows through one BitWriter and only
    // the final partial byte pads
    val bw = new BitWriter()
    var combined = 0
    if (input.isEmpty) {
      // the legal 14-byte empty stream libbz2 itself emits
      bw.bits(EndMagic, 48)
      bw.bits(0L, 32)
      return "BZh1".getBytes("US-ASCII") ++ bw.result()
    }
    var off = 0
    do {
      val end = math.min(off + 80000, input.length)
      combined = ((combined << 1) | (combined >>> 31)) ^
        compressBlock(java.util.Arrays.copyOfRange(input, off, end), bw)
      off = end
    } while (off < input.length)
    bw.bits(EndMagic, 48)
    bw.bits(combined.toLong & 0xffffffffL, 32)
    "BZh1".getBytes("US-ASCII") ++ bw.result()
  }

  /** One block's bits into `bw`; returns the block CRC. */
  private def compressBlock(input: Array[Byte], bw: BitWriter): Int = {
    // ---- RLE1: runs of 4..255+4 become 4 bytes + count ----
    val rle1 = {
      val o = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < input.length) {
        val b = input(i)
        var run = 1
        while (i + run < input.length && input(i + run) == b && run < 255 + 4) run += 1
        if (run >= 4) {
          o.write(b); o.write(b); o.write(b); o.write(b)
          o.write(run - 4)
        } else {
          var r = 0
          while (r < run) { o.write(b); r += 1 }
        }
        i += run
      }
      o.toByteArray
    }
    val n = rle1.length
    require(n > 0 && n <= 100000, s"segment must fit a level-1 block after RLE1: $n")
    // ---- BWT by rotation sort ----
    val idx = (0 until n).toArray.map(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      def compare(a: Integer, b: Integer): Int = {
        var i = 0
        while (i < n) {
          val x = rle1((a + i) % n) & 0xff
          val y = rle1((b + i) % n) & 0xff
          if (x != y) return x - y
          i += 1
        }
        0
      }
    })
    val bwt = new Array[Byte](n)
    var origPtr = -1
    var i = 0
    while (i < n) {
      val s = idx(i).intValue()
      if (s == 0) origPtr = i
      bwt(i) = rle1((s + n - 1) % n)
      i += 1
    }
    // ---- MTF + RLE2 ----
    val used = new Array[Boolean](256)
    i = 0
    while (i < n) { used(bwt(i) & 0xff) = true; i += 1 }
    val seq = (0 until 256).filter(used).toArray
    val nUsed = seq.length
    val nSyms = nUsed + 2
    val eob = nSyms - 1
    val mtf = seq.clone()
    val syms = scala.collection.mutable.ArrayBuffer.empty[Int]
    var zeroRun = 0L
    def flushRun(): Unit = {
      var r = zeroRun
      while (r > 0) {
        if ((r & 1L) == 1L) { syms += 0; r = (r - 1) / 2 } // RUNA
        else { syms += 1; r = (r - 2) / 2 } // RUNB
      }
      zeroRun = 0
    }
    i = 0
    while (i < n) {
      val v = bwt(i) & 0xff
      var j = 0
      while (mtf(j) != v) j += 1
      if (j == 0) zeroRun += 1
      else {
        flushRun()
        syms += (j + 1)
        var x = j
        while (x > 0) { mtf(x) = mtf(x - 1); x -= 1 }
        mtf(0) = v
      }
      i += 1
    }
    flushRun()
    syms += eob
    // ---- fixed-length Huffman: L bits per symbol, 2 identical groups ----
    var codeLen = 1
    while ((1 << codeLen) < nSyms) codeLen += 1
    if (codeLen < 2) codeLen = 2 // delta coding needs 1..20; keep ≥ 2
    val nSelectors = (syms.length + 49) / 50
    val blockCrc = crcOf(input, 0, input.length)
    bw.bits(BlockMagic, 48)
    bw.bits(blockCrc.toLong & 0xffffffffL, 32)
    bw.bit(0) // not randomized
    bw.bits(origPtr.toLong, 24)
    // symbol map
    var used16 = 0
    i = 0
    while (i < 16) {
      var j = 0
      var any = false
      while (j < 16) { if (used(i * 16 + j)) any = true; j += 1 }
      if (any) used16 |= 0x8000 >>> i
      i += 1
    }
    bw.bits(used16.toLong, 16)
    i = 0
    while (i < 16) {
      if ((used16 & (0x8000 >>> i)) != 0) {
        var m = 0
        var j = 0
        while (j < 16) { if (used(i * 16 + j)) m |= 0x8000 >>> j; j += 1 }
        bw.bits(m.toLong, 16)
      }
      i += 1
    }
    bw.bits(2L, 3) // nGroups = 2
    bw.bits(nSelectors.toLong, 15)
    i = 0
    while (i < nSelectors) { bw.bit(0); i += 1 } // selector 0 every group
    var g = 0
    while (g < 2) {
      bw.bits(codeLen.toLong, 5)
      var s = 0
      while (s < nSyms) { bw.bit(0); s += 1 } // all lengths = codeLen
      g += 1
    }
    // with equal lengths the canonical code of symbol s is s itself
    syms.foreach(s => bw.bits(s.toLong, codeLen))
    blockCrc
  }
}
