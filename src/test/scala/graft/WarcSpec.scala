package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** queries.Curation.parseWarc on hand-built WARC bytes — pins the
  * CONTENT-LENGTH payload mechanism beyond the e44/d16 fixture: a
  * payload containing the `\r\n\r\n` header separator must come back
  * intact (the first separator after the headers only marks the
  * boundary; the slice length comes from the header), and multi-record
  * files index records in file order.
  */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(uri: String, payload: String): String =
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"

  private def parse(name: String, content: String) =
    queries.Curation.parseWarc(
        Seq((s"/x/$name", content.getBytes("UTF-8")))
          .toDF("path", "content"))
      .orderBy(col("rec"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3),
        r.getString(4)))

  test("payload containing the CRLFCRLF separator survives intact") {
    val hostile = "line one\r\n\r\nline two after a blank line"
    val out = parse("a.warc", rec("https://h/1", hostile))
    assert(out === Array(("a.warc", 0, "https://h/1",
      hostile.getBytes("UTF-8").length, hostile)))
  }

  test("multi-record file: records index in file order with their own lengths") {
    val p1 = "short"
    val p2 = "a longer second payload"
    val out = parse("b.warc", rec("https://h/1", p1) + rec("https://h/2", p2))
    assert(out === Array(
      ("b.warc", 0, "https://h/1", p1.length, p1),
      ("b.warc", 1, "https://h/2", p2.length, p2)))
  }

  test("a payload that LOOKS like headers is not re-parsed as a record") {
    // contains header-shaped lines but no version magic — stays payload
    val tricky = "WARC-Type: response\r\nContent-Length: 999"
    val out = parse("c.warc", rec("https://h/3", tricky))
    assert(out === Array(("c.warc", 0, "https://h/3",
      tricky.getBytes("UTF-8").length, tricky)))
  }

  // --- gzip member walk (operators.WarcGzip — VERDICT r8 item 1 pins) ---

  private def gzMember(payload: String, charset: String = "UTF-8"): Array[Byte] = {
    val cs = java.nio.charset.Charset.forName(charset)
    val body = payload.getBytes(cs)
    val head = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://h/x\r\n" +
      s"Content-Type: text/html; charset=$charset\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(head); gz.write(body); gz.write("\r\n\r\n".getBytes)
    gz.close()
    bos.toByteArray
  }

  private def parseGz(content: Array[Byte]) =
    operators.WarcGzip.parse(
        Seq(("/x/g.warc.gz", content)).toDF("path", "content"))
      .orderBy(col("rec"))
      .collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getInt(4),
        r.getString(5)))

  test("gz: concatenated members index in file order with their own payloads") {
    val out = parseGz(gzMember("first") ++ gzMember("second, longer payload"))
    assert(out === Array(
      (0, "https://h/x", "UTF-8", 5, "first"),
      (1, "https://h/x", "UTF-8", 22, "second, longer payload")))
  }

  test("gz: a payload containing gzip magic bytes cannot split a member") {
    // the gzip magic bytes 1f 8b 08 round-trip 1:1 through ISO-8859-1; a reader that
    // re-synced on the magic instead of walking inflater-consumed lengths
    // would frame a phantom member here
    val hostile = "x\u001f\u008b\u0008y"
    val out = parseGz(gzMember(hostile, "ISO-8859-1") ++ gzMember("tail"))
    assert(out === Array(
      (0, "https://h/x", "ISO-8859-1", 5, hostile),
      (1, "https://h/x", "UTF-8", 4, "tail")))
  }

  test("gz: payload containing WARC version magic stays one record (gzip framing)") {
    val hostile = "WARC/1.0\r\nWARC-Type: response\r\n\r\nnot a record"
    val out = parseGz(gzMember(hostile))
    assert(out === Array((0, "https://h/x", "UTF-8",
      hostile.getBytes("UTF-8").length, hostile)))
  }

  test("gz: declared charset applies — cp1252 0x80/0x96 are not latin-1") {
    val text = "price €9 – now" // € and en-dash
    val out = parseGz(gzMember(text, "windows-1252"))
    // byte length under cp1252: every char is 1 byte
    assert(out === Array((0, "https://h/x", "windows-1252",
      text.length, text)))
    // the same BYTES under a latin-1 reading would differ
    val latin1 = new String(text.getBytes(
      java.nio.charset.Charset.forName("windows-1252")),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(latin1 !== text)
  }

  test("gz: a charset= substring in the Target-URI cannot hijack payload decoding") {
    // é in UTF-8 = 0xC3 0xA9; a latin-1 misdecode would yield Ã©
    val payload = "café"
    val member = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://h/p?charset=ISO-8859-1\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      payload).getBytes("UTF-8")
    val got = graft.operators.WarcGzip.parseMember(member)
    assert(got.map(_._2) === Some("utf-8"), "charset must come from Content-Type")
    assert(got.map(_._4) === Some(payload))
  }

  test("gz: a lying multi-GB Content-Length skips the record instead of killing the task") {
    val member = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://h/x\r\n" +
      "Content-Length: 9999999999\r\n\r\nbody").getBytes("UTF-8")
    assert(graft.operators.WarcGzip.parseMember(member) === None)
    // and a missing MANDATORY Content-Length is malformed, not empty
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://h/x\r\n\r\nbody").getBytes("UTF-8")
    assert(graft.operators.WarcGzip.parseMember(noLen) === None)
  }

  test("gz: a truncated trailing member terminates the walk; prior records survive") {
    val whole = gzMember("complete record")
    val truncated = gzMember("lost").dropRight(12) // cuts into the deflate+trailer
    val out = parseGz(whole ++ truncated)
    assert(out === Array((0, "https://h/x", "UTF-8", 15, "complete record")))
  }

  test("gz: garbage between members terminates the walk (no resync guessing)") {
    val out = parseGz(gzMember("kept") ++ "JUNKJUNKJUNKJUNKJUNK".getBytes ++ gzMember("lost"))
    assert(out === Array((0, "https://h/x", "UTF-8", 4, "kept")))
  }
}
