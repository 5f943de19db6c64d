package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WarcGzip

class GzipStrictSpec extends AnyFunSuite {

  private def member(bytes: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(bytes); gz.finish()
    bo.toByteArray
  }
  private val payload =
    (0 until 30).map(i => s"""{"i":$i,"v":"${"q" * (i % 11)}"}""")
      .mkString("", "\n", "\n").getBytes("UTF-8")

  test("multi-member concatenation round-trips; boundaries are byte-level") {
    for (n <- Seq(1, 2, 3, 5)) {
      val cut = payload.length / n
      val file = (0 until n).map { m =>
        val until = if (m == n - 1) payload.length else (m + 1) * cut
        member(java.util.Arrays.copyOfRange(payload, m * cut, until))
      }.reduce(_ ++ _)
      assert(WarcGzip.gunzipStrict(file).map(_.toSeq) === Some(payload.toSeq), s"n=$n")
    }
    assert(WarcGzip.gunzipStrict(Array.emptyByteArray).map(_.length) === Some(0))
  }

  test("stored CRC32 and ISIZE are LIVE: flipping either rejects") {
    val file = member(payload)
    val crcFlip = file.clone()
    crcFlip(file.length - 6) = (crcFlip(file.length - 6) ^ 0x01).toByte
    assert(WarcGzip.gunzipStrict(crcFlip) === None)
    val isizeFlip = file.clone()
    isizeFlip(file.length - 2) = (isizeFlip(file.length - 2) ^ 0x01).toByte
    assert(WarcGzip.gunzipStrict(isizeFlip) === None)
    // the LENIENT warc walk accepts both (trailer unread there — each
    // WARC record self-validates downstream); the strict/lenient split
    // is deliberate, pin it
    assert(WarcGzip.gunzipMembers(crcFlip).nonEmpty)
  }

  test("truncation, reserved FLG bits, trailing garbage, bad magic reject") {
    val file = member(payload)
    for (cut <- Seq(1, 5, 12, file.length / 2, file.length - 4, file.length - 1))
      assert(WarcGzip.gunzipStrict(file.take(cut)) === None, s"cut=$cut")
    val flg = file.clone(); flg(3) = (flg(3) | 0x20).toByte
    assert(WarcGzip.gunzipStrict(flg) === None)
    assert(WarcGzip.gunzipStrict(file ++ "x".getBytes) === None)
    assert(WarcGzip.gunzipStrict("plainly not gzip".getBytes) === None)
  }

  test("bomb cap bounds the running inflated total") {
    val big = member(Array.fill(1 << 20)('z'.toByte))
    assert(big.length < 4096)
    assert(WarcGzip.gunzipStrict(big, cap = 1 << 16) === None)
    assert(WarcGzip.gunzipStrict(big).map(_.length) === Some(1 << 20))
  }

  test("INTEROP: python3 gzip both directions (the independent implementation here)") {
    // python3's gzip module is the independent implementation available
    // here: it must read our multi-member file, and we must read its
    // output (FNAME flag set by default when given a filename).
    val tmp = java.io.File.createTempFile("gzs", ".bin")
    val out = java.io.File.createTempFile("gzs", ".gz")
    try {
      java.nio.file.Files.write(tmp.toPath, payload)
      val enc = new ProcessBuilder("python3", "-c",
        s"import gzip,shutil; shutil.copyfileobj(open('${tmp.getPath}','rb'), gzip.open('${out.getPath}','wb'))").start()
      enc.getInputStream.readAllBytes()
      assume(enc.waitFor() == 0, "python3 gzip not usable")
      val theirs = java.nio.file.Files.readAllBytes(out.toPath)
      assert(WarcGzip.gunzipStrict(theirs).map(_.toSeq) === Some(payload.toSeq))
      // reverse: python reads our 3-member concatenation
      val cut = payload.length / 3
      val ours = (0 until 3).map { m =>
        val until = if (m == 2) payload.length else (m + 1) * cut
        member(java.util.Arrays.copyOfRange(payload, m * cut, until))
      }.reduce(_ ++ _)
      java.nio.file.Files.write(out.toPath, ours)
      val dec = new ProcessBuilder("python3", "-c",
        s"import gzip,sys; sys.stdout.buffer.write(gzip.open('${out.getPath}','rb').read())").start()
      val back = dec.getInputStream.readAllBytes()
      assume(dec.waitFor() == 0)
      assert(back.toSeq === payload.toSeq)
    } finally { tmp.delete(); out.delete() }
  }
}
