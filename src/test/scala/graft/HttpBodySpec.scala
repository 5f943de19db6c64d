package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HttpBody

/** operators.HttpBody — transport-layer decoding of crawled HTTP
  * payloads: chunked framing, gzip content coding, their composition,
  * and the clean-reject envelope.
  */
class HttpBodySpec extends AnyFunSuite {

  private def resp(headers: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\n$headers\r\n").getBytes("US-ASCII") ++ body

  private val text = "hello crawl é€ world".getBytes("UTF-8")

  test("identity body decodes verbatim") {
    val p = resp("Content-Type: text/html\r\n", text)
    assert(HttpBody.decode(p) ===
      Some((200, "text/html", "identity", new String(text, "UTF-8"))))
  }

  test("gzip body inflates; x-gzip alias accepted") {
    val p = resp("Content-Type: text/html\r\nContent-Encoding: gzip\r\n",
      HttpBody.gzip(text))
    assert(HttpBody.decode(p).map(_._4) === Some(new String(text, "UTF-8")))
    assert(HttpBody.decode(p).map(_._3) === Some("gzip"))
    val p2 = resp("Content-Encoding: x-gzip\r\n", HttpBody.gzip(text))
    assert(HttpBody.decode(p2).map(_._4) === Some(new String(text, "UTF-8")))
  }

  test("deflate: zlib form decodes; RAW-stream server bug decodes via fallback") {
    val p = resp("Content-Type: text/html\r\nContent-Encoding: deflate\r\n",
      HttpBody.deflateZlib(text))
    assert(HttpBody.decode(p) ===
      Some((200, "text/html", "deflate", new String(text, "UTF-8"))))
    // the historic misreading: servers that send raw deflate (no zlib
    // header/adler) — every robust client falls back, so do we
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(text); d.finish()
    val bo = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val k = d.deflate(buf); bo.write(buf, 0, k) }
    d.end()
    val pRaw = resp("Content-Encoding: deflate\r\n", bo.toByteArray)
    assert(HttpBody.decode(pRaw).map(_._4) === Some(new String(text, "UTF-8")))
  }

  test("zstd content coding decodes through the capped frame walk") {
    val p = resp("Content-Type: text/html\r\nContent-Encoding: zstd\r\n",
      graft.operators.ZstdShards.makeFrame(text))
    assert(HttpBody.decode(p) ===
      Some((200, "text/html", "zstd", new String(text, "UTF-8"))))
    // truncated zstd body rejects the record
    val trunc = resp("Content-Encoding: zstd\r\n",
      graft.operators.ZstdShards.makeFrame(text).dropRight(3))
    assert(HttpBody.decode(trunc) === None)
  }

  test("br content coding decodes (r13: operators.Brotli); malformed br rejects") {
    val p = resp("Content-Encoding: br\r\n",
      graft.operators.Brotli.storeEncode(text))
    assert(HttpBody.decode(p) ===
      Some((200, "", "br", new String(text, "UTF-8"))))
    // chunked + br compose in wire order like gzip does
    val cb = resp("Transfer-Encoding: chunked\r\nContent-Encoding: br\r\n",
      HttpBody.chunk(graft.operators.Brotli.storeEncode(text), Seq(4, 9)))
    assert(HttpBody.decode(cb).map(_._3) === Some("chunked+br"))
    val bad = resp("Content-Encoding: br\r\n", Array[Byte](0x1b, 0x00, 0x00))
    assert(HttpBody.decode(bad) === None)
  }

  test("chunked framing reassembles across arbitrary chunk splits") {
    val p = resp("Transfer-Encoding: chunked\r\n",
      HttpBody.chunk(text, Seq(1, 7, 3, 100)))
    assert(HttpBody.decode(p) ===
      Some((200, "", "chunked", new String(text, "UTF-8"))))
    // chunk extension after ';' is ignored
    val withExt = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5;ext=1\r\nhello\r\n0\r\n\r\n").getBytes("US-ASCII")
    assert(HttpBody.decode(withExt).map(_._4) === Some("hello"))
  }

  test("chunked + gzip compose in wire order (dechunk first, then gunzip)") {
    val p = resp(
      "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      HttpBody.chunk(HttpBody.gzip(text), Seq(5, 9)))
    assert(HttpBody.decode(p) ===
      Some((200, "", "chunked+gzip", new String(text, "UTF-8"))))
  }

  test("envelope: unknown codings, bad framing, truncations reject to None") {
    assert(HttpBody.decode(resp("Content-Encoding: br\r\n", text)) === None) // raw text is not a br stream
    assert(HttpBody.decode(resp("Content-Encoding: compress\r\n", text)) === None)
    assert(HttpBody.decode(resp("Transfer-Encoding: deflate\r\n", text)) === None)
    // bad chunk size line
    val bad = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "zz\r\nhello\r\n0\r\n\r\n").getBytes("US-ASCII")
    assert(HttpBody.decode(bad) === None)
    // missing zero chunk
    val noend = resp("Transfer-Encoding: chunked\r\n",
      "5\r\nhello\r\n".getBytes("US-ASCII"))
    assert(HttpBody.decode(noend) === None)
    // truncated gzip
    val tg = resp("Content-Encoding: gzip\r\n", HttpBody.gzip(text).take(8))
    assert(HttpBody.decode(tg) === None)
    // no header separator / no status line
    assert(HttpBody.decode("HTTP/1.1 200 OK\r\nX: y".getBytes("US-ASCII")) === None)
    assert(HttpBody.decode(resp("", text).drop(9)) === None)
  }

  test("never throws on mutation/truncation fuzz") {
    val base = resp("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      HttpBody.chunk(HttpBody.gzip(text), Seq(4, 4, 50)))
    val rnd = new scala.util.Random(51)
    (0 until base.length by 3).foreach(k => HttpBody.decode(base.take(k)))
    (0 until 300).foreach { _ =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      HttpBody.decode(b)
    }
  }
}
