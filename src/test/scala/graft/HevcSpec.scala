package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Heif
import graft.operators.hevc._

/** HEVC intra pixel decoder pins (r18) — the Av1Spec discipline:
  *  - the committed e119 HEIC members decode pixel-exact (expected
  *    per-plane means recorded from the reference decoder, libde265,
  *    at fixture time);
  *  - committed BINARY-INDEPENDENT goldens (annexb + plane SHA-256
  *    from libde265 at generation time) pin every encoder stage of the
  *    r18 drill ladder with zero runtime library dependency;
  *  - a LIVE full-plane differential sweep against freshly
  *    reference-encoded random configs (capability-gated on
  *    libheif/libde265 presence — the runtime drifts);
  *  - structural pins for the binary-extracted normative tables.
  */
class HevcSpec extends AnyFunSuite {

  private lazy val members: Map[String, Array[Byte]] =
    graft.queries.Curation.avifHeifMembers().toMap

  private def planeMean(p: graft.operators.av1.Av1Decoder.Planes,
      i: Int): Double = {
    val a = p.planes(i)
    var s = 0.0
    var k = 0
    while (k < a.length) { s += a(k); k += 1 }
    BigDecimal(s / a.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
  }

  // reference plane means of the committed heic members (libde265 over
  // the extracted hvc1 payload, ispe-cropped — scripts/
  // avif_heif_reference.py fixture refresh, r18)
  private val Expected
      : Map[String, (Double, Option[Double], Option[Double])] = Map(
    "h420_48x32.heic" -> ((126.357422, Some(126.997396), Some(130.278646))),
    "h420_31x17.heic" -> ((128.626186, Some(127.034722), Some(126.555556))),
    "hmono_40x24.heic" -> ((128.851042, None, None)),
    "h420_64x64.heic" -> ((125.568848, Some(128.200195), Some(128.02832))))

  test("committed HEIC members: full pixel decode matches libde265") {
    Expected.foreach { case (name, (y, u, v)) =>
      val d = Heif.decode(members(name))
        .getOrElse(fail(s"$name: decode rejected"))
      assert(planeMean(d.primary, 0) === y, name)
      u.foreach(e => assert(planeMean(d.primary, 1) === e, name))
      v.foreach(e => assert(planeMean(d.primary, 2) === e, name))
      if (u.isEmpty) assert(d.primary.monochrome, name)
      assert(d.primary.width === d.info.width, name)
      assert(d.primary.height === d.info.height, name)
    }
  }

  test("committed goldens: every drill-ladder stage decodes to the " +
      "reference plane SHAs (binary-independent)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/hevc_goldens.jsonl"))
    val lines = src.getLines().toList
    src.close()
    assert(lines.size === 8)
    lines.foreach { ln =>
      val name = "\"name\":\\s*\"([a-z]+)\"".r
        .findFirstMatchIn(ln).get.group(1)
      val hex = "\"hex\":\\s*\"([0-9a-f]+)\"".r
        .findFirstMatchIn(ln).get.group(1)
      val shas = "\"sha\":\\s*\\[([^\\]]*)\\]".r
        .findFirstMatchIn(ln).get.group(1)
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      val data = hex.grouped(2)
        .map(x => Integer.parseInt(x, 16).toByte).toArray
      val pl = HevcDecoder.decode(data)
        .getOrElse(fail(s"$name: decode rejected"))
      assert(pl.planes.length === shas.length, name)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      pl.planes.zip(shas).foreach { case (plane, want) =>
        md.reset()
        plane.foreach(v => md.update(v.toByte))
        val got = md.digest().map("%02x".format(_)).mkString
        assert(got === want, name)
      }
    }
  }

  private def haveLive: Boolean =
    new java.io.File("/usr/bin/python3").exists() &&
      new java.io.File("/lib/x86_64-linux-gnu/libheif.so.1").exists() &&
      new java.io.File("/lib/x86_64-linux-gnu/libde265.so.0").exists()

  private def runCal(n: Int, seed: Long, params: Seq[String]): Unit = {
    assume(haveLive, "libheif/libde265 not on this runtime")
    val outFile = java.io.File.createTempFile("hevccal", ".jsonl")
    val cmd = Seq("python3", "scripts/hevc_reference.py", "cal",
      n.toString, seed.toString) ++ params :+ outFile.getAbsolutePath
    val p = new ProcessBuilder(cmd: _*).start()
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, err.take(2000))
    val src = scala.io.Source.fromFile(outFile)
    val lines = src.getLines().toList
    src.close()
    outFile.delete()
    assert(lines.size === n)
    lines.foreach { ln =>
      val hex = "\"hex\":\\s*\"([0-9a-f]+)\"".r
        .findFirstMatchIn(ln).get.group(1)
      val pix = "\"pix\":\\s*\\[([^\\]]*)\\]".r
        .findFirstMatchIn(ln).get.group(1)
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      val data = hex.grouped(2)
        .map(x => Integer.parseInt(x, 16).toByte).toArray
      val pl = HevcDecoder.decode(data)
        .getOrElse(fail(s"rejected: ${ln.take(60)}"))
      assert(pl.planes.length === pix.length, ln.take(60))
      pl.planes.zip(pix).foreach { case (plane, refHex) =>
        assert(plane.length * 2 === refHex.length, ln.take(60))
        var i = 0
        while (i < plane.length) {
          val r = Integer.parseInt(refHex.substring(2 * i, 2 * i + 2), 16)
          assert(plane(i) === r,
            s"pixel $i: ${ln.take(60)}")
          i += 1
        }
      }
    }
  }

  test("LIVE full-plane sweep: 15 fresh default-config (WPP+SAO+deblock) " +
      "x265 encodes decode bit-exact vs libde265") {
    runCal(15, 20260818L, Seq.empty)
  }

  test("LIVE full-plane sweep: 10 filters-off encodes (residual/intra " +
      "isolation stage) decode bit-exact") {
    runCal(10, 20260819L,
      Seq("x265:sao=0", "x265:no-deblock=1", "x265:wpp=0"))
  }

  test("reject-don't-guess: non-HEVC and truncated payloads return None") {
    assert(HevcDecoder.decode(Array[Byte](0, 0, 0, 1, 0x40)).isEmpty)
    assert(HevcDecoder.decode(Array.fill[Byte](64)(0x55)).isEmpty)
    // a valid member truncated mid-slice must reject, not crash
    val good = members("h420_64x64.heic")
    assert(Heif.decode(java.util.Arrays.copyOf(good, good.length / 2))
      .isEmpty)
  }

  test("normative tables: structural pins of the binary-extracted data") {
    import HevcTables._
    // DCT matrix generation vs the library-extracted seeds
    assert(T32(0).forall(_ == 64))
    assert(T32(1).take(4).toSeq === Seq(90, 90, 88, 85))
    assert(T32(16).take(4).toSeq === Seq(64, -64, -64, 64))
    assert(T32(31).take(4).toSeq === Seq(4, -13, 22, -31))
    // every row has norm ~64*sqrt(32) (orthogonality of the integer DCT)
    (0 until 32).foreach { r =>
      val n2 = T32(r).map(v => v * v).sum
      assert(math.abs(n2 - 64 * 64 * 32) <= 1800, s"row $r norm $n2")
    }
    assert(Dst4.flatten.sum === 368) // fixed integer DST checksum
    assert(Dst4(0).toSeq === Seq(29, 55, 74, 84))
    assert(RangeTabLps.length === 256 && TransIdxLps.length === 64)
    assert(RangeTabLps.take(4).toSeq === Seq(128, 176, 208, 240))
    assert(TransIdxLps(62) === 38 && TransIdxLps(63) === 63)
    assert(DeblockBeta(51) === 64 && DeblockTc(53) === 24)
    assert(ChromaQpMap(43) === 37 && ChromaQpMap(29) === 29)
    assert(graft.operators.hevc.HevcCabac.InitFlat.length ===
      graft.operators.hevc.HevcCabac.NumCtx)
  }
}
