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
}
