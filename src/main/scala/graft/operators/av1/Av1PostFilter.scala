package graft.operators.av1

/** Deblocking loop filter (spec 7.14). Stage-gated: streams whose
  * filter levels are all zero (lossless, or encoder-chosen level 0)
  * pass through; nonzero levels reject until the staged reference
  * fixtures land (NOTES_r17 step 5).
  */
object Av1LoopFilter {
  import Av1Headers.Unsupported

  def apply(d: Av1FrameDecode): Unit = {
    val fh = d.fh
    if (fh.lfLevel(0) == 0 && fh.lfLevel(1) == 0 &&
      fh.lfLevel(2) == 0 && fh.lfLevel(3) == 0) return
    throw Unsupported("deblocking")
  }
}

/** CDEF (spec 7.15). Same staging as the loop filter. */
object Av1Cdef {
  import Av1Headers.Unsupported

  def apply(d: Av1FrameDecode): Unit = {
    val fh = d.fh
    var any = false
    var i = 0
    while (i < (1 << fh.cdefBits)) {
      if (fh.cdefYPri(i) != 0 || fh.cdefYSec(i) != 0 ||
        fh.cdefUVPri(i) != 0 || fh.cdefUVSec(i) != 0) any = true
      i += 1
    }
    if (!d.seq.enableCdef || fh.codedLossless) return
    if (any) throw Unsupported("cdef")
  }
}
