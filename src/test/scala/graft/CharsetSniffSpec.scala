package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CharsetSniff

/** Golden vectors for the charset sniffer: every cascade rule and every
  * strict-UTF-8 rejection class pinned, plus decode correctness against
  * JVM reference decoding and the never-throw envelope.
  */
class CharsetSniffSpec extends AnyFunSuite {

  private def det(b: Array[Byte]): String = CharsetSniff.charsetOf(b).toString
  private def txt(b: Array[Byte]): String = CharsetSniff.sniffText(b).toString
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("BOMs win outright and are consumed") {
    assert(det(bytes(0xef, 0xbb, 0xbf) ++ "hi".getBytes("UTF-8")) === "UTF-8")
    assert(txt(bytes(0xef, 0xbb, 0xbf) ++ "hi".getBytes("UTF-8")) === "hi")
    assert(det(bytes(0xff, 0xfe) ++ "hi".getBytes("UTF-16LE")) === "UTF-16LE")
    assert(txt(bytes(0xff, 0xfe) ++ "hi".getBytes("UTF-16LE")) === "hi")
    assert(det(bytes(0xfe, 0xff) ++ "hi".getBytes("UTF-16BE")) === "UTF-16BE")
    assert(txt(bytes(0xfe, 0xff) ++ "hi".getBytes("UTF-16BE")) === "hi")
  }

  test("valid multi-byte UTF-8 detects as UTF-8; ASCII trivially does") {
    assert(det("café €10 中文".getBytes("UTF-8")) === "UTF-8")
    assert(txt("café €10 中文".getBytes("UTF-8")) === "café €10 中文")
    assert(det("plain ascii".getBytes("US-ASCII")) === "UTF-8")
    assert(det(Array.emptyByteArray) === "UTF-8")
    assert(txt(Array.emptyByteArray) === "")
  }

  test("every strict-UTF-8 rejection class falls back to windows-1252") {
    val cases = Seq(
      "lone continuation" -> bytes('a', 0x80),
      "overlong 2-byte C0" -> bytes(0xc0, 0xaf),
      "overlong 2-byte C1" -> bytes(0xc1, 0x81),
      "overlong 3-byte E0" -> bytes(0xe0, 0x80, 0x80),
      "surrogate ED A0" -> bytes(0xed, 0xa0, 0x80),
      "overlong 4-byte F0" -> bytes(0xf0, 0x80, 0x80, 0x80),
      "beyond U+10FFFF F4 90" -> bytes(0xf4, 0x90, 0x80, 0x80),
      "F5 head" -> bytes(0xf5, 0x80),
      "truncated 3-byte tail" -> bytes('o', 'k', 0xe2, 0x82),
      "bad continuation range" -> bytes(0xc3, 0x20))
    for ((what, b) <- cases)
      assert(det(b) === "windows-1252", what)
  }

  test("windows-1252 decode maps the C1 range to its real codepoints") {
    // 93 94 85 96: smart quotes, ellipsis, en-dash — the bytes latin-1
    // would mis-decode as C1 control characters
    val b = "quote ".getBytes("US-ASCII") ++ bytes(0x93, 0x94, 0x85, 0x96)
    assert(det(b) === "windows-1252")
    assert(txt(b) === "quote “”…–")
  }

  test("never throws, replacement character on undecodable bytes") {
    val rnd = new scala.util.Random(46)
    (0 until 500).foreach { _ =>
      val b = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      det(b); txt(b) // envelope: terminate, no exception
    }
    // a BOM followed by invalid UTF-8 decodes with U+FFFD, never throws
    val hostile = bytes(0xef, 0xbb, 0xbf, 0xc0, 0xaf)
    assert(txt(hostile).contains('�'))
  }
}
