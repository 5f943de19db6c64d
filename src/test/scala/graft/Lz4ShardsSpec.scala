package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lz4Shards

class Lz4ShardsSpec extends AnyFunSuite {

  private def payload(n: Int, seed: Int): Array[Byte] = {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val sb = new StringBuilder
    var i = 0
    while (sb.length < n) { sb.append(words((seed + i) % 5)).append(' '); i += 1 }
    sb.toString.take(n).getBytes("UTF-8")
  }

  test("frames round-trip across the flag lattice; concatenation and skippables walk") {
    val p1 = payload(100000, 1) // multi-block at 64 KB
    val p2 = payload(3000, 2)
    for {
      bc <- Seq(true, false)
      cs <- Seq(true, false)
      cc <- Seq(true, false)
    } {
      val f = Lz4Shards.makeFrame(p1, blockChecksum = bc, contentSize = cs,
        contentChecksum = cc)
      assert(Lz4Shards.decompress(f).get.toSeq === p1.toSeq, s"$bc $cs $cc")
    }
    val concat = Lz4Shards.makeFrame(p1) ++ Lz4Shards.makeSkippable(37) ++
      Lz4Shards.makeFrame(p2, linked = true)
    assert(Lz4Shards.decompress(concat).get.toSeq === (p1 ++ p2).toSeq)
  }

  test("incompressible payloads ride uncompressed blocks") {
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(5000)(rnd.nextInt(256).toByte)
    val f = Lz4Shards.makeFrame(noise, blockChecksum = true)
    assert(Lz4Shards.decompress(f).get.toSeq === noise.toSeq)
  }

  test("every checksum tier rejects: header HC, block XXH32, content XXH32; size lies reject") {
    val p = payload(50000, 3)
    val f = Lz4Shards.makeFrame(p, blockChecksum = true, contentSize = true)
    assert(Lz4Shards.decompress(f).isDefined)
    def flip(i: Int): Array[Byte] = {
      val c = f.clone(); c(i) = (c(i) ^ 0x11).toByte; c
    }
    assert(Lz4Shards.decompress(flip(4)) === None)  // FLG → HC mismatch
    assert(Lz4Shards.decompress(flip(20)) === None) // block data → XXH32
    assert(Lz4Shards.decompress(flip(f.length - 2)) === None) // content cksum
    assert(Lz4Shards.decompress(f.dropRight(1)) === None)
    assert(Lz4Shards.decompress(f ++ Array[Byte](9)) === None) // trailing garbage
    assert(Lz4Shards.decompress(Array[Byte]()) === None)
    assert(Lz4Shards.decompress(null) === None)
    // declared content size lies (patch the u64 at offset 6 — after
    // magic+FLG+BD — then re-fix HC so ONLY the size lie is on trial)
    val lied = f.clone()
    lied(6) = (lied(6) ^ 0x01).toByte
    val xxh = net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
    lied(14) = (((xxh.hash(lied, 4, 10, 0) >> 8) & 0xff)).toByte
    assert(Lz4Shards.decompress(lied) === None)
  }

  test("multi-block LINKED frames reject loudly; single-block linked decode") {
    val p = payload(3000, 4)
    val single = Lz4Shards.makeFrame(p, linked = true)
    assert(Lz4Shards.decompress(single).get.toSeq === p.toSeq)
    // craft a 2-block linked frame: take an independent 2-block frame
    // and clear FLG's independence bit, re-fixing HC — the blocks are
    // actually independent so bytes would be right, but the walk cannot
    // KNOW that and must reject
    val multi = Lz4Shards.makeFrame(payload(100000, 5))
    val evil = multi.clone()
    evil(4) = (evil(4) & ~0x20).toByte
    val xxh = net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
    evil(6) = (((xxh.hash(evil, 4, 2, 0) >> 8) & 0xff)).toByte
    assert(Lz4Shards.decompress(evil) === None)
  }

  // ---- bidirectional interop with the reference implementations ----

  test("lz4-java's own frame reader decodes our writer's output byte-exactly") {
    val p = payload(80000, 6)
    val f = Lz4Shards.makeFrame(p, blockChecksum = true, contentSize = true)
    val in = new net.jpountz.lz4.LZ4FrameInputStream(
      new java.io.ByteArrayInputStream(f))
    val got = in.readAllBytes()
    in.close()
    assert(got.toSeq === p.toSeq)
  }

  test("our walk decodes lz4-java's LZ4FrameOutputStream output byte-exactly") {
    val p = payload(90000, 7)
    val bo = new java.io.ByteArrayOutputStream()
    val os = new net.jpountz.lz4.LZ4FrameOutputStream(bo)
    os.write(p); os.close()
    assert(Lz4Shards.decompress(bo.toByteArray).get.toSeq === p.toSeq)
  }

  private def haveLz4: Boolean =
    try {
      val pr = new ProcessBuilder("lz4", "--version").start()
      pr.getInputStream.readAllBytes(); pr.waitFor() == 0
    } catch { case _: Exception => false }

  private def runLz4(args: Seq[String], stdin: Array[Byte]): Array[Byte] = {
    val tmp = java.io.File.createTempFile("lz4spec", ".bin")
    try {
      java.nio.file.Files.write(tmp.toPath, stdin)
      val pr = new ProcessBuilder(("lz4" +: args :+ tmp.getAbsolutePath :+ "-c"): _*)
        .start()
      val out = pr.getInputStream.readAllBytes()
      assert(pr.waitFor() == 0, s"lz4 ${args.mkString(" ")} failed")
      out
    } finally tmp.delete()
  }

  test("the system lz4 CLI decodes our frames; we decode CLI output (incl. -BI and --content-size)") {
    assume(haveLz4, "system lz4 not present")
    val p = payload(120000, 8)
    // our writer → CLI -d
    val ours = Lz4Shards.makeFrame(p, blockChecksum = true, contentChecksum = true)
    assert(runLz4(Seq("-d"), ours).toSeq === p.toSeq)
    // CLI (block-independent; shard workloads pass -BI) → our walk
    val cli = runLz4(Seq("-1", "-BI", "--content-size"), p)
    assert(Lz4Shards.decompress(cli).get.toSeq === p.toSeq)
    val cli9 = runLz4(Seq("-9", "-B4", "-BI", "-BX"), p) // 64KB blocks + block checksums
    assert(Lz4Shards.decompress(cli9).get.toSeq === p.toSeq)
  }
}
