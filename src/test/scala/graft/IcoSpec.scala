package graft

import graft.operators.Ico
import org.scalatest.funsuite.AnyFunSuite

/** ICO/CUR container walk (r16): directory arithmetic, the u8 0⇒256
  * rule, payload-format sniffing (PNG vs DIB), cursor hotspots, the
  * doubled-height AND-mask rule, the 32bpp XOR channel sums, and the
  * reject-don't-guess framing rules. DecoderFuzzSpec carries the
  * truncation/mutation/soup families; e118's DuckDB hex walk is the
  * independent oracle.
  */
class IcoSpec extends AnyFunSuite {

  private def mk(specs: (String, Int, Int)*): Array[Byte] =
    Ico.makeIco(specs.map { case (f, w, h) => Ico.PayloadSpec(f, w, h) }, 42L)

  test("multi-entry ICO: per-entry kind/dims/format from the payload headers") {
    val es = Ico.entries(mk(("png", 16, 16), ("dib", 8, 10), ("png", 33, 9))).get
    assert(es.map(_.format) === Vector("png", "dib", "png"))
    assert(es.map(e => (e.width, e.height)) ===
      Vector((16, 16), (8, 10), (33, 9)))
    assert(es.map(e => (e.dirW, e.dirH)) ===
      Vector((16, 16), (8, 10), (33, 9)))
    assert(es.forall(_.kind == "icon"))
    assert(es.forall(e => e.hotspotX == -1 && e.hotspotY == -1))
    assert(es.map(_.bitCount) === Vector(24, 32, 24))
    assert(es.map(_.idx) === Vector(0, 1, 2))
  }

  test("the u8 0⇒256 rule: a 256-wide member round-trips through the zero byte") {
    val b = Ico.makeIco(Seq(Ico.PayloadSpec("png", 256, 84)), 7L)
    assert((b(6) & 0xff) === 0) // directory width byte is 0
    val e = Ico.entries(b).get.head
    assert(e.dirW === 256 && e.width === 256 && e.height === 84)
  }

  test("CUR: kind=cursor and hotspots from the repurposed planes/bitCount fields") {
    val es = Ico.entries(Ico.makeIco(Seq(
      Ico.PayloadSpec("dib", 16, 16), Ico.PayloadSpec("png", 24, 24)),
      9L, cursor = true)).get
    assert(es.forall(_.kind == "cursor"))
    assert(es.map(e => (e.hotspotX, e.hotspotY)) === Vector((0, 0), (3, 5)))
  }

  test("dib32ChannelSums matches a direct byte recompute; None for PNG entries") {
    val b = mk(("dib", 5, 3), ("png", 6, 4))
    val es = Ico.entries(b).get
    val (sb, sg, sr, sa, n) = Ico.dib32ChannelSums(b, es(0)).get
    assert(n === 15L)
    // recompute straight off the payload: header(40) then w*h*4 BGRA bytes
    val p = Ico.payload(b, es(0))
    val exp = Array(0L, 0L, 0L, 0L)
    (0 until 15 * 4).foreach(i => exp(i % 4) += p(40 + i) & 0xff)
    assert((sb, sg, sr, sa) === ((exp(0), exp(1), exp(2), exp(3))))
    assert(Ico.dib32ChannelSums(b, es(1)).isEmpty)
  }

  test("rejects: reserved, bad type, zero count, truncated dir, OOB entry, odd DIB height") {
    val good = mk(("dib", 4, 4))
    assert(Ico.entries(good).isDefined) // premise
    assert(Ico.entries(Array[Byte]()).isEmpty)
    assert(Ico.entries(good.take(20)).isEmpty) // truncated directory
    val badReserved = good.clone(); badReserved(0) = 1
    assert(Ico.entries(badReserved).isEmpty)
    val badType = good.clone(); badType(2) = 3
    assert(Ico.entries(badType).isEmpty)
    val zeroCount = good.clone(); zeroCount(4) = 0
    assert(Ico.entries(zeroCount).isEmpty)
    val oobOffset = good.clone()
    oobOffset(6 + 15) = 0x10 // imageOffset MSB → offset ≥ 2^28, far past EOF
    assert(Ico.entries(oobOffset).isEmpty)
    // odd doubled height: biHeight at payload+8 — make it odd
    val oddH = good.clone()
    val poff = 6 + 16 // single entry, payload right after the directory
    oddH(poff + 8) = 7 // 7 is odd → reject
    assert(Ico.entries(oddH).isEmpty)
  }

  test("MimeSniff routes ICO and CUR to image/x-icon; near-misses stay unrouted") {
    assert(graft.functions.MimeSniff.mimeOf(mk(("png", 4, 4))) === "image/x-icon")
    assert(graft.functions.MimeSniff.mimeOf(
      Ico.makeIco(Seq(Ico.PayloadSpec("dib", 4, 4)), 1L, cursor = true)) === "image/x-icon")
    val badType = mk(("png", 4, 4)); badType(2) = 3
    assert(graft.functions.MimeSniff.mimeOf(badType) !== "image/x-icon")
    val zeroCount = mk(("png", 4, 4)); zeroCount(4) = 0; zeroCount(5) = 0
    assert(graft.functions.MimeSniff.mimeOf(zeroCount) !== "image/x-icon")
  }

  test("UniversalIngest counts ICO entries as units") {
    assert(graft.operators.UniversalIngest.unitCount(
      mk(("png", 4, 4), ("dib", 8, 8))) === Some(("image/x-icon", 2L)))
  }
}
