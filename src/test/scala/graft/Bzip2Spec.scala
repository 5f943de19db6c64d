package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bzip2

class Bzip2Spec extends AnyFunSuite {

  private def rt(data: Array[Byte]): Unit = {
    val z = Bzip2.compress(data)
    assert(z.take(3).toSeq === "BZh".getBytes("US-ASCII").toSeq)
    val back = Bzip2.decompress(z)
    assert(back.isDefined, "decompress returned None")
    assert(back.get.toSeq === data.toSeq)
  }

  test("round-trips: text, runs, binary, single byte, all-equal") {
    rt("hello bzip2 world".getBytes("UTF-8"))
    rt("banana banana banana banana".getBytes("UTF-8"))
    rt(("abc" * 300 + "xyzzy" + "\n" * 10).getBytes("UTF-8"))
    rt(Array.tabulate(1000)(i => ((i * 7 + i * i) % 251).toByte))
    rt(Array[Byte](42))
    rt(Array.fill(500)(7.toByte)) // long equal run exercises RLE1 both ways
    rt(Array.fill(259)(9.toByte)) // exactly the RLE1 run cap
    val mixed = (0 until 2000).map(i =>
      if (i % 37 < 5) 'a'.toByte else ('a' + i % 17).toByte).toArray
    rt(mixed)
  }

  test("wikipedia-dump-shaped XML round-trips") {
    val xml = ("<mediawiki><page><title>Page 1</title><ns>0</ns>" +
      "<text>The '''quick''' [[fox|brown]] jumps {{over}} lazy dogs. " * 30 +
      "</text></page></mediawiki>").getBytes("UTF-8")
    rt(xml)
  }

  test("corruption rejects: flipped payload byte breaks the block CRC") {
    val z = Bzip2.compress("the corpus payload to protect".getBytes("UTF-8"))
    // flip one bit somewhere in the symbol stream (past the headers)
    val k = z.clone()
    k(k.length / 2) = (k(k.length / 2) ^ 0x10).toByte
    assert(Bzip2.decompress(k) === None)
  }

  test("truncation and garbage reject cleanly, never throw") {
    val z = Bzip2.compress(("abcdef" * 50).getBytes("UTF-8"))
    for (cut <- Seq(2, 4, 10, z.length / 2, z.length - 2))
      assert(Bzip2.decompress(z.take(cut)) === None)
    assert(Bzip2.decompress("BZh9not really".getBytes("UTF-8")) === None)
    assert(Bzip2.decompress("random bytes".getBytes("UTF-8")) === None)
    assert(Bzip2.decompress(null) === None)
    assert(Bzip2.decompress(Array.emptyByteArray) === None)
  }

  test("wrong stream level digit and bad magics reject") {
    val z = Bzip2.compress("x".getBytes("UTF-8"))
    val k = z.clone(); k(3) = '0'.toByte
    assert(Bzip2.decompress(k) === None)
    val k2 = z.clone(); k2(4) = (k2(4) ^ 0x80).toByte // first magic bit
    assert(Bzip2.decompress(k2) === None)
  }

  test("multi-block streams round-trip (combined CRC chains across blocks)") {
    // > 80000 bytes forces the encoder to emit 3 blocks, exercising the
    // decoder's multi-block loop and the rotl-xor combined stream CRC
    val big = Array.tabulate(200000)(i => ('a' + (i * 31 + i / 997) % 26).toByte)
    val z = Bzip2.compress(big)
    val back = Bzip2.decompress(z)
    assert(back.isDefined && back.get.toSeq === big.toSeq)
    // corrupting the SECOND block's region must reject via its CRC
    val k = z.clone()
    k(k.length * 2 / 3) = (k(k.length * 2 / 3) ^ 0x08).toByte
    assert(Bzip2.decompress(k) === None)
  }

  test("bidirectional interop with real libbz2 (skipped if python3 absent)") {
    import scala.sys.process._
    val py = try { Seq("python3", "-c", "import bz2").! == 0 } catch { case _: Exception => false }
    assume(py, "python3/bz2 unavailable — interop exercised in-session instead")
    val dir = java.nio.file.Files.createTempDirectory("bzinterop")
    val data = ("interoperability corpus payload é " * 120).getBytes("UTF-8")
    // theirs decodes ours
    val ours = dir.resolve("ours.bz2")
    java.nio.file.Files.write(ours, Bzip2.compress(data))
    val plain = dir.resolve("plain.bin")
    java.nio.file.Files.write(plain, data)
    val theirs = dir.resolve("theirs.bz2")
    val code = Seq("python3", "-c",
      s"""import bz2,sys
d=bz2.decompress(open('$ours','rb').read())
assert d==open('$plain','rb').read(), 'mismatch'
open('$theirs','wb').write(bz2.compress(open('$plain','rb').read()))
""").!
    assert(code === 0, "libbz2 failed to decode our stream byte-exactly")
    // ours decodes theirs (real multi-table Huffman, optimized lengths)
    val back = Bzip2.decompress(java.nio.file.Files.readAllBytes(theirs))
    assert(back.isDefined && back.get.toSeq === data.toSeq)
  }

  test("multistream: concatenated BZh streams decode as one corpus; tails reject") {
    // the Wikipedia 'multistream' dump form: independent streams
    // back to back, each byte-aligned
    val a = "first stream part ".getBytes("UTF-8")
    val b = "second stream part".getBytes("UTF-8")
    val cat = Bzip2.compress(a) ++ Bzip2.compress(b)
    assert(Bzip2.decompress(cat).get.toSeq === (a ++ b).toSeq)
    // appended garbage after a valid stream rejects (the zip discipline)
    assert(Bzip2.decompress(Bzip2.compress(a) ++ "junk".getBytes("UTF-8")) === None)
    // a truncated second stream rejects
    assert(Bzip2.decompress(cat.dropRight(3)) === None)
  }

  test("empty input round-trips as the legal 14-byte empty stream") {
    val z = Bzip2.compress(Array.emptyByteArray)
    assert(z.length === 14)
    assert(Bzip2.decompress(z).get.isEmpty)
  }
}
