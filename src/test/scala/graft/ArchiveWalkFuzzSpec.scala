package graft

import graft.operators.{TarShards, WarcCdx, WarcGzip}
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input fuzz for the archive byte walks (WARC offset walk, gzip
  * member walk, ustar walk) — the same contract the e12 decoder fuzz
  * pins: arbitrary bytes must TERMINATE with a (possibly empty) prefix of
  * valid records, NEVER throw — these run inside executors over user
  * files. Attack families: every truncation prefix of a valid archive,
  * seeded random byte arrays, and single-byte mutations of valid
  * archives. Beyond not-throwing, two walk-specific invariants hold: a
  * walk never emits overlapping/backtracking records (offsets strictly
  * increase by rlen), and a mutation BEFORE a record can only affect that
  * record or later ones, never resurrect more records than the original.
  */
class ArchiveWalkFuzzSpec extends AnyFunSuite {

  private def warcRec(uri: String, payload: String): String =
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"

  private val validWarc: Array[Byte] =
    (warcRec("https://h/1", "alpha beta") + warcRec("https://h/2", "x" * 700) +
      warcRec("https://h/3", "")).getBytes("UTF-8")

  private val validTar: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Seq(("a.txt", 5), ("b.txt", 512), ("c.txt", 0)).foreach { case (n, sz) =>
      val body = Array.tabulate(sz)(i => (i % 251).toByte)
      out.write(TarShards.header(n, sz.toLong))
      out.write(body)
      val pad = (512 - sz % 512) % 512
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  private val validGz: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Seq("first member", "second " * 100).foreach { s =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(s.getBytes("UTF-8")); gz.finish()
    }
    out.toByteArray
  }

  private val walks: Seq[(String, Array[Byte], Array[Byte] => Int)] = Seq(
    ("WarcCdx.walk", validWarc, b => WarcCdx.walk(b).size),
    ("TarShards.walkTar", validTar, b => TarShards.walkTar(b).size),
    ("WarcGzip.gunzipMembers", validGz, b => WarcGzip.gunzipMembers(b).size))

  test("every truncation prefix of a valid archive terminates without throwing") {
    walks.foreach { case (name, valid, walk) =>
      (0 until valid.length).foreach { n =>
        val got = walk(valid.take(n))
        assert(got <= walk(valid), s"$name prefix $n emitted MORE than the full archive")
      }
    }
  }

  test("seeded random byte soup terminates without throwing") {
    val rng = new scala.util.Random(0x51C2)
    walks.foreach { case (_, _, walk) =>
      (0 until 300).foreach { _ =>
        val b = new Array[Byte](rng.nextInt(2048))
        rng.nextBytes(b)
        walk(b) // must not throw
      }
    }
  }

  test("single-byte mutations of valid archives terminate; record count never grows") {
    val rng = new scala.util.Random(0x51C3)
    walks.foreach { case (name, valid, walk) =>
      val base = walk(valid)
      (0 until 400).foreach { _ =>
        val m = valid.clone()
        m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
        assert(walk(m) <= base, s"$name mutation resurrected extra records")
      }
    }
  }

  // ---- compressed-container decoders (r11: zstd / xz / lzma) — the same
  // executor-side contract: arbitrary bytes → Option, NEVER a throw. On
  // top of that, the checksum-bearing containers carry a stronger
  // invariant fuzz can check: no single-byte flip may SILENTLY change the
  // decoded content — every flip must either reject (None) or leave the
  // output byte-identical (a flip confined to skippable-frame payload).
  private val fuzzPayload: Array[Byte] =
    (0 until 40).map(i => s"""{"i":$i,"t":"${"p" * (i % 23)}"}""")
      .mkString("", "\n", "\n").getBytes("UTF-8")
  private val inflaters: Seq[(String, Array[Byte], Array[Byte] => Option[Seq[Byte]])] = Seq(
    ("ZstdShards.inflate",
      graft.operators.ZstdShards.makeShard(
        (0 until 40).map(i => s"""{"i":$i,"t":"${"p" * (i % 23)}"}"""), 3),
      b => graft.operators.ZstdShards.inflate(b).map(_.toSeq)),
    ("Xz.decompress",
      graft.operators.Xz.makeXz(fuzzPayload, check = 4, chunkLen = 512,
        rawSplice = true),
      b => graft.operators.Xz.decompress(b).map(_.toSeq)),
    ("Xz.decompressAlone",
      graft.operators.Xz.makeLzma(fuzzPayload, knownSize = false),
      b => graft.operators.Xz.decompressAlone(b).map(_.toSeq)),
    ("Xz.decompress(bcj)", // r13: the two-filter x86 chain
      graft.operators.Xz.makeXz(
        fuzzPayload ++ Array.tabulate(256)(i =>
          (if (i % 6 == 0) 0xe8 else i).toByte),
        check = 4, chunkLen = 512, bcjX86 = true),
      b => graft.operators.Xz.decompress(b).map(_.toSeq)),
    ("Xz.decompress(riscv)", // r14: oracle-probed pair/protect machinery
      graft.operators.Xz.makeXz(
        fuzzPayload ++ Array.tabulate(300)(i => (i % 4 match {
          case 0 => if (i % 12 == 0) 0xef else 0x17
          case 1 => 0x31
          case _ => i * 37
        }).toByte),
        check = 4, chunkLen = 512, filters = Seq(graft.operators.Xz.RiscvFilter)),
      b => graft.operators.Xz.decompress(b).map(_.toSeq)),
    ("Xz.decompress(delta+arm64)", // r14: 3-entry chain in header order
      graft.operators.Xz.makeXz(
        fuzzPayload ++ Array.tabulate(256)(i =>
          (if (i % 4 == 3) 0x94 else i * 31).toByte),
        check = 4, chunkLen = 512,
        filters = Seq(graft.operators.Xz.DeltaFilter(2),
          graft.operators.Xz.Arm64Filter)),
      b => graft.operators.Xz.decompress(b).map(_.toSeq)),
    ("SevenZip.members(bcj2)", { // r14: the four-stream folder graph
        val branchy = Array.tabulate(900)(i =>
          (if (i % 5 == 0) 0xe8 else if (i % 7 == 0) 0xe9 else i * 37).toByte)
        graft.operators.SevenZip.makeArchive(
          Seq(("bcj2-lzma2", Seq(("a.bin", branchy)))))
      },
      b => graft.operators.SevenZip.members(b)
        .map(_.flatMap { case (n, d) => n.getBytes("UTF-8").toSeq ++ d.toSeq })))

  test("compressed containers: every truncation prefix and byte soup, no throws") {
    val rng = new scala.util.Random(0x51C5)
    inflaters.foreach { case (name, valid, f) =>
      (0 until valid.length).foreach { n =>
        try { f(valid.take(n)); () }
        catch { case e: Exception =>
          fail(s"$name threw ${e.getClass.getSimpleName} at prefix $n")
        }
      }
      (0 until 300).foreach { _ =>
        val b = new Array[Byte](rng.nextInt(2048))
        rng.nextBytes(b)
        try { f(b); () }
        catch { case e: Exception =>
          fail(s"$name threw ${e.getClass.getSimpleName} on soup")
        }
      }
      // soup behind a valid magic penetrates deeper than raw soup
      (0 until 200).foreach { _ =>
        val tail = new Array[Byte](rng.nextInt(1024))
        rng.nextBytes(tail)
        val b = valid.take(12) ++ tail
        try { f(b); () }
        catch { case e: Exception =>
          fail(s"$name threw ${e.getClass.getSimpleName} on magic+soup")
        }
      }
    }
  }

  test("compressed containers: every single-bit flip rejects or is content-identical") {
    inflaters.foreach { case (name, valid, f) =>
      val base = f(valid).get
      (0 until valid.length).foreach { i =>
        Seq(0x01, 0x80).foreach { bit =>
          val m = valid.clone()
          m(i) = (m(i) ^ bit).toByte
          f(m) match {
            case None => // rejected: fine
            case Some(got) =>
              // .lzma has NO checksum — a flip in its range-coded stream
              // may legally decode to different bytes; the no-silent-
              // corruption claim is only made where the format backs it
              if (name != "Xz.decompressAlone")
                assert(got == base,
                  s"$name: flip at $i/$bit silently CHANGED content")
          }
        }
      }
    }
  }

  test("WARC offsets strictly increase by rlen — no overlap, no backtrack") {
    val rng = new scala.util.Random(0x51C4)
    (0 until 200).foreach { _ =>
      val m = validWarc.clone()
      m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      val out = WarcCdx.walk(m)
      out.sliding(2).foreach {
        case Vector(a, b) => assert(a._2 + a._3 === b._2)
        case _ =>
      }
      out.headOption.foreach(h => assert(h._2 === 0L))
    }
  }
}
