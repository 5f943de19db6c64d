package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** operators.WarcCdx — the offset-aware walk behind the e51 CDX index.
  * Pins the framing properties that distinguish it from magic-split
  * framing (parseWarc): records advance by byte offset + Content-Length,
  * so hostile payloads cannot split records and emitted offsets are the
  * true file positions; envelope violations stop the walk without losing
  * records already parsed. Plus the SURT key algebra on hand vectors.
  */
class WarcCdxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(uri: String, payload: String,
      date: String = "2026-08-14T01:02:03Z"): String =
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"

  private def walk(content: String) =
    operators.WarcCdx.walk(content.getBytes("UTF-8"))

  test("payload containing the version magic cannot split a record") {
    // magic-split framing would break this into two records; the offset
    // walk slices by Content-Length and sees exactly one
    val hostile = "prefix WARC/1.0\r\nWARC-Type: response\r\n suffix"
    val out = walk(rec("https://h/1", hostile))
    assert(out.map(t => (t._1, t._4, t._6)) === Vector((0, "https://h/1", hostile)))
  }

  test("offsets are true byte positions; rlen covers header+payload+CRLFCRLF") {
    val r1 = rec("https://h/1", "first payload")
    val r2 = rec("https://h/2", "second, longer payload body")
    val r3 = rec("https://h/3", "third")
    val out = walk(r1 + r2 + r3)
    assert(out.map(t => (t._1, t._2, t._3)) === Vector(
      (0, 0L, r1.length.toLong),
      (1, r1.length.toLong, r2.length.toLong),
      (2, (r1.length + r2.length).toLong, r3.length.toLong)))
    // each record's bytes really start with the magic at its offset
    val all = (r1 + r2 + r3).getBytes("UTF-8")
    out.foreach { t =>
      assert(new String(all, t._2.toInt, 10, "UTF-8") === "WARC/1.0\r\n")
    }
  }

  test("truncated final record: walk stops, prior records survive") {
    val good = rec("https://h/1", "intact")
    val truncated = rec("https://h/2", "this payload is cut").dropRight(12)
    val out = walk(good + truncated)
    assert(out.map(_._4) === Vector("https://h/1"))
  }

  test("garbage between records stops the walk (offset discipline, no resync)") {
    val good = rec("https://h/1", "ok")
    val out = walk(good + "JUNK" + rec("https://h/2", "never reached"))
    assert(out.map(_._4) === Vector("https://h/1"))
  }

  test("missing Content-Length stops the walk") {
    val bad = "WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
    assert(walk(bad) === Vector())
    assert(walk(rec("https://h/1", "ok") + bad).map(_._4) === Vector("https://h/1"))
  }

  test("parse: DataFrame form carries fname and per-file record index") {
    val c = rec("https://h/1", "a") + rec("https://h/2", "bb")
    val out = operators.WarcCdx.parse(
        Seq(("/x/f.warc", c.getBytes("UTF-8"))).toDF("path", "content"))
      .orderBy(col("rec")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(4)))
    assert(out === Array(
      ("f.warc", 0, 0L, "https://h/1"),
      ("f.warc", 1, rec("https://h/1", "a").length.toLong, "https://h/2")))
  }

  test("binary walk: hostile byte payloads round-trip EXACTLY") {
    // a payload carrying CRLFCRLF, the WARC magic, AND invalid UTF-8 —
    // the string walk would U+FFFD the bad bytes; walkBinary must
    // return the payload byte-for-byte (the PDF-in-WARC requirement)
    val payload = "head\r\n\r\nWARC/1.0\r\nmid".getBytes("US-ASCII") ++
      Array(0xff.toByte, 0x93.toByte, 0x00.toByte) ++
      "tail".getBytes("US-ASCII")
    val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://h/bin\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII")
    val file = head ++ payload ++ "\r\n\r\n".getBytes("US-ASCII") ++
      rec("https://h/2", "after").getBytes("UTF-8")
    val out = operators.WarcCdx.walkBinary(file)
    assert(out.length === 2)
    assert(out(0)._4 === "https://h/bin")
    assert(out(0)._6.toSeq === payload.toSeq) // byte-exact
    assert(out(1)._4 === "https://h/2")
    assert(new String(out(1)._6, "UTF-8") === "after")
    // offsets identical to the string walk's framing
    val sw = operators.WarcCdx.walk(file)
    assert(out.map(t => (t._1, t._2, t._3)) === sw.map(t => (t._1, t._2, t._3)))
  }

  test("SURT key: labels reversed, lowercased, scheme dropped") {
    val out = Seq(
        "https://News.Example.COM/A/b?q=1",
        "http://a.b.c.d/x",
        "https://single/",
        "https://nopath.example.com")
      .toDF("uri")
      .select(operators.WarcCdx.surtKey(col("uri")).as("k"))
      .collect().map(_.getString(0))
    assert(out === Array(
      "com,example,news)/a/b?q=1",
      "d,c,b,a)/x",
      "single)/",
      "com,example,nopath)")) // no path → bare host key
  }
}
