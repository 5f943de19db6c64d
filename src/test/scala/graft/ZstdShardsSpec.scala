package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZstdShards

class ZstdShardsSpec extends AnyFunSuite {

  private val lines = (0 until 25).map(i => s"""{"id":$i,"t":"${"x" * (i % 17)}"}""")

  test("single-frame shard round-trips to the exact line sequence") {
    val shard = ZstdShards.makeShard(lines, 1)
    val out = ZstdShards.inflate(shard).map(ZstdShards.toLines)
    assert(out === Some(lines.toVector))
  }

  test("multi-frame shard with mid-line cuts and skippable frames round-trips") {
    for (n <- Seq(2, 3, 5, 7)) {
      val shard = ZstdShards.makeShard(lines, n)
      val out = ZstdShards.inflate(shard).map(ZstdShards.toLines)
      assert(out === Some(lines.toVector), s"nFrames=$n")
    }
  }

  test("frame boundaries are byte-level: a cut frame is NOT a record boundary") {
    // 3 frames over 25 lines: the payload split offsets cannot all land on
    // line ends (line lengths vary), so at least one line spans frames —
    // prove it by decompressing each zstd frame separately and checking
    // the pieces are not individually line-complete.
    val shard = ZstdShards.makeShard(lines, 3)
    var off = 0
    var sawSplitLine = false
    while (off < shard.length) {
      val sz = com.github.luben.zstd.Zstd.findFrameCompressedSize(shard, off).toInt
      val magic = (shard(off) & 0xff) | ((shard(off + 1) & 0xff) << 8) |
        ((shard(off + 2) & 0xff) << 16) | ((shard(off + 3) & 0xff) << 24)
      if (magic != 0xfd2fb528) () // skippable
      else {
        val piece = ZstdShards.inflate(java.util.Arrays.copyOfRange(shard, off, off + sz)).get
        if (piece.nonEmpty && piece.last != '\n') sawSplitLine = true
      }
      off += sz
    }
    assert(sawSplitLine, "expected at least one frame to end mid-line")
  }

  test("empty input yields zero lines; empty trailing line convention holds") {
    assert(ZstdShards.inflate(Array.emptyByteArray).map(_.length) === Some(0))
    assert(ZstdShards.toLines(Array.emptyByteArray) === Vector.empty)
    assert(ZstdShards.toLines("a\nb\n".getBytes("UTF-8")) === Vector("a", "b"))
    assert(ZstdShards.toLines("a\nb".getBytes("UTF-8")) === Vector("a", "b"))
    assert(ZstdShards.toLines("a\n\nb\n".getBytes("UTF-8")) === Vector("a", "", "b"))
  }

  test("truncation rejects: every prefix cut of a shard returns None") {
    val shard = ZstdShards.makeShard(lines, 2)
    for (cut <- Seq(1, 3, 7, shard.length / 3, shard.length / 2, shard.length - 1))
      assert(ZstdShards.inflate(shard.take(cut)) === None, s"cut=$cut")
  }

  test("appended garbage and unknown magic reject the whole file") {
    val shard = ZstdShards.makeShard(lines, 1)
    assert(ZstdShards.inflate(shard ++ "tail garbage".getBytes("UTF-8")) === None)
    assert(ZstdShards.inflate("not a zstd stream at all".getBytes("UTF-8")) === None)
  }

  test("corrupt frame body rejects (checksum/entropy damage, not framing)") {
    val shard = ZstdShards.makeShard(lines, 1)
    val k = shard.clone()
    k(k.length - 5) = (k(k.length - 5) ^ 0x41).toByte
    assert(ZstdShards.inflate(k) === None)
  }

  test("decompressed-bytes cap rejects a bomb-shaped shard during streaming") {
    val big = Array.fill(1 << 20)('z'.toByte) // 1 MiB of one byte: tiny frame
    val frame = ZstdShards.makeFrame(big)
    assert(frame.length < 4096, "bomb premise: high ratio")
    assert(ZstdShards.inflate(frame, cap = 1 << 16) === None)
    assert(ZstdShards.inflate(frame).map(_.length) === Some(1 << 20))
  }

  test("skippable frame variants 0..15 and empty payloads are skipped") {
    val payload = "k:v\n".getBytes("UTF-8")
    val parts = Seq(
      ZstdShards.makeSkippable(Array.emptyByteArray, 0),
      ZstdShards.makeFrame(payload),
      ZstdShards.makeSkippable(Array.fill(33)(1.toByte), 15))
    val all = parts.reduce(_ ++ _)
    assert(ZstdShards.inflate(all).map(_.toSeq) === Some(payload.toSeq))
  }

  test("skippable-only file inflates to zero bytes, zero lines") {
    val only = ZstdShards.makeSkippable(Array.fill(5)(9.toByte), 3)
    assert(ZstdShards.inflate(only).map(_.length) === Some(0))
  }

  test("truncated skippable frame (declared length past EOF) rejects") {
    val sk = ZstdShards.makeSkippable(Array.fill(40)(2.toByte), 1)
    assert(ZstdShards.inflate(sk.take(sk.length - 10)) === None)
  }

  // ---- interop with the system zstd CLI (gated, the xz-spec pattern):
  // zstd-jni wraps libzstd, but the FRAME WALK (concatenation, skippable
  // frames, exact-consume) is ours — the CLI is the independent producer
  // and consumer of that framing.
  private def haveZstd: Boolean =
    try {
      val p = new ProcessBuilder("zstd", "--version").start()
      p.getInputStream.readAllBytes(); p.waitFor() == 0
    } catch { case _: Exception => false }

  private def runZstd(args: Seq[String], stdin: Array[Byte]): Array[Byte] = {
    val tmp = java.io.File.createTempFile("zstspec", ".bin")
    try {
      java.nio.file.Files.write(tmp.toPath, stdin)
      val p = new ProcessBuilder(("zstd" +: args :+ "-c" :+ tmp.getPath): _*).start()
      val out = p.getInputStream.readAllBytes()
      assert(p.waitFor() == 0, s"zstd ${args.mkString(" ")} failed")
      out
    } finally tmp.delete()
  }

  test("INTEROP: CLI frames decode (incl. --long); CLI decodes our shards") {
    assume(haveZstd, "system zstd not present")
    val payload = lines.mkString("", "\n", "\n").getBytes("UTF-8")
    for (level <- Seq("-1", "-9", "-19")) {
      val real = runZstd(Seq(level), payload)
      assert(ZstdShards.inflate(real).map(_.toSeq) === Some(payload.toSeq), level)
    }
    // CLI-concatenated frames = one logical stream (cat of two compressions)
    val two = runZstd(Seq("-3"), payload) ++ runZstd(Seq("-3"), payload)
    assert(ZstdShards.inflate(two).map(_.toSeq) === Some((payload ++ payload).toSeq))
    // our multi-frame + skippable shard decodes via the reference CLI
    val ours = ZstdShards.makeShard(lines, 4)
    val back = runZstd(Seq("-d"), ours)
    assert(back.toSeq === payload.toSeq)
    // --long=30 CLI output on small content still DECLARES only the
    // window the content needs (libzstd clamps the descriptor), so it
    // must DECODE — long-mode producers with reasonable windows work
    val big = Array.tabulate(1 << 21)(i => ((i * 31) & 0xff).toByte)
    val longFrame = runZstd(Seq("--long=30", "-3"), big)
    assert(ZstdShards.inflate(longFrame).map(_.length) === Some(1 << 21))
  }

  test("a crafted 1 GiB window descriptor rejects at the 128 MiB bound") {
    // hostile framing, not CLI-producible: magic + FHD 0x00 (window
    // descriptor present, no content size) + window byte 0xA0 →
    // exponent 10 + 20 = 30 → 1 GiB declared window. The descriptor
    // drives libzstd's allocation, so the reader's enforced 2^27 limit
    // must reject BEFORE any block parsing is attempted.
    val crafted = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0x00, 0xa0.toByte, 0x01, 0x00, 0x00) // + a raw empty-ish block tail
    assert(ZstdShards.inflate(crafted) === None)
  }
}
