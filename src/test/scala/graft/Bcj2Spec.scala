package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bcj2

class Bcj2Spec extends AnyFunSuite {

  /** x86-ish corpus: E8/E9 calls, 0F 8x Jcc, operand bytes that
    * themselves form candidate prefixes (0x0F operand MSBs), candidates
    * in the final 4 bytes, and plain noise.
    */
  private def payload(seed: Int, len: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](len)
    r.nextBytes(b)
    var i = 0
    while (i < len) {
      r.nextInt(8) match {
        case 0 => b(i) = 0xe8.toByte
        case 1 => b(i) = 0xe9.toByte
        case 2 =>
          b(i) = 0x0f.toByte
          if (i + 1 < len) b(i + 1) = (0x80 | r.nextInt(16)).toByte
        case 3 => if (i + 4 < len) b(i + 4) = 0x0f.toByte // operand MSB 0F
        case _ =>
      }
      i += r.nextInt(6) + 1
    }
    b
  }

  private val policies: Seq[(String, (Int, Int) => Boolean)] = Seq(
    ("all", (_: Int, _: Int) => true),
    ("none", (_: Int, _: Int) => false),
    ("even-sites", (pos: Int, _: Int) => pos % 2 == 0),
    ("calls-only", (_: Int, b: Int) => b == 0xe8),
    ("hash", (pos: Int, b: Int) => ((pos * 2654435761L + b) & 7) < 3))

  test("round-trips across policies, shapes and tail candidates") {
    val shapes = (0 until 12).map(s => payload(s, 300 + s * 211)) ++ Seq(
      Array.fill(64)(0xe8.toByte), // overlapping call soup
      Array[Byte](0xe8.toByte), // single candidate, no operand room
      Array[Byte](0x0f.toByte, 0x84.toByte), // Jcc with no operand room
      "plain text with no opcodes at all".getBytes("US-ASCII"),
      Array[Byte](), // empty
      payload(77, 5000))
    for {
      p <- shapes
      (pname, pol) <- policies
    } {
      val (m, c, j, rc) = Bcj2.encode(p, pol)
      val back = Bcj2.decode(m, c, j, rc, p.length)
      assert(back.map(_.toSeq) === Some(p.toSeq), s"$pname len=${p.length}")
      // stream accounting: converted operands left main for call/jump
      assert(m.length + c.length + j.length === p.length ||
        (c.isEmpty && j.isEmpty && m.length == p.length))
      // rc flush slack is the pinned ≤4 bytes
      assert(rc.length >= 5)
    }
  }

  test("hand-pinned conversion: one converted call site routes its absolute target") {
    // E8 at output pos 4, rel32 operand 0x10 (LE): absolute = 0x10 +
    // (5 + 4) = 0x19, carried BIG-endian on the call stream; main drops
    // the operand
    val in = "AAAA".getBytes("US-ASCII") ++
      Array[Byte](0xe8.toByte, 0x10, 0, 0, 0) ++ "BBBB".getBytes("US-ASCII")
    val (m, c, j, rc) = Bcj2.encode(in)
    assert(m.toSeq === ("AAAA".getBytes("US-ASCII") :+ 0xe8.toByte) ++ "BBBB".getBytes("US-ASCII").toSeq)
    assert(c.toSeq === Seq[Byte](0, 0, 0, 0x19))
    assert(j.isEmpty)
    assert(Bcj2.decode(m, c, j, rc, in.length).map(_.toSeq) === Some(in.toSeq))
  }

  test("malformed streams reject: truncated call/jump/rc, wrong output length, garbage tails") {
    val p = payload(5, 1200)
    val (m, c, j, rc) = Bcj2.encode(p)
    assert(c.length >= 8, "premise: at least two converted calls")
    assert(Bcj2.decode(m, c.dropRight(4), j, rc, p.length) === None)
    assert(Bcj2.decode(m, c, j.dropRight(4), rc, p.length).isEmpty || j.isEmpty)
    assert(Bcj2.decode(m.dropRight(1), c, j, rc, p.length) === None)
    assert(Bcj2.decode(m, c, j, rc.take(4), p.length) === None) // under init size
    assert(Bcj2.decode(m, c, j, rc, p.length - 1) === None) // main not drained
    assert(Bcj2.decode(m, c, j, rc ++ Array.fill[Byte](5)(0), p.length) === None) // rc tail
    assert(Bcj2.decode(m, c ++ Array.fill[Byte](4)(0), j, rc, p.length) === None)
  }
}
