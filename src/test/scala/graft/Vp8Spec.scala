package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vp8

/** VP8 (lossy WebP) decoder pins.
  *
  * Evidence tiers, per the xz/brotli/BCJ2 precedent:
  *  1. 102 committed REFERENCE-ENCODED streams (libwebp, qualities
  *     10–90 via the one-shot API plus advanced-config members covering
  *     the simple loop filter, 8 token partitions, 4 segments and
  *     filter strengths 0–90) must decode to the reference's exact
  *     Y/U/V planes AND the reference's exact fancy-upsampled RGBA —
  *     recorded as SHA-256 at generation time (scripts/
  *     vp8_reference.py), so the pin runs UNGATED in binary-less
  *     sandboxes.
  *  2. A LIVE randomized differential sweep (the 400-seed standard)
  *     against WebPDecodeYUV/WebPDecodeRGBA when python3 + libwebp are
  *     present on the runtime.
  *  3. Reject family + mutation fuzz (never throws).
  */
class Vp8Spec extends AnyFunSuite {

  private def json(name: String): String = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"missing $name")
    val s = new String(in.readAllBytes(), "UTF-8")
    in.close()
    s
  }

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  private def sha256(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  // fields appear in insertion order: w, h, webp, y_sha, u_sha, v_sha, rgba_sha
  private case class Case(name: String, w: Int, h: Int, webp: Array[Byte],
      ySha: String, uSha: String, vSha: String, rgbaSha: String)

  private def jstr(obj: String, key: String): String = {
    val i = obj.indexOf("\"" + key + "\"")
    assert(i >= 0, key)
    val j = obj.indexOf('"', obj.indexOf(':', i) + 1)
    obj.substring(j + 1, obj.indexOf('"', j + 1))
  }

  private def jint(obj: String, key: String): Int = {
    val i = obj.indexOf("\"" + key + "\"")
    assert(i >= 0, key)
    var j = obj.indexOf(':', i) + 1
    while (obj(j) == ' ') j += 1
    var e = j
    while (e < obj.length && obj(e).isDigit) e += 1
    obj.substring(j, e).toInt
  }

  private lazy val goldens: Seq[Case] = {
    val fx = json("/golden/vp8_streams.json")
    val entry = """"([A-Za-z0-9_]+)":\s*\{""".r
    entry.findAllMatchIn(fx).map { m =>
      val obj = fx.substring(m.end, fx.indexOf('}', m.end))
      Case(m.group(1), jint(obj, "w"), jint(obj, "h"), hex(jstr(obj, "webp")),
        jstr(obj, "y_sha"), jstr(obj, "u_sha"), jstr(obj, "v_sha"),
        jstr(obj, "rgba_sha"))
    }.toSeq
  }

  /** Full-container decode (both profiles + ALPH alpha) → RGBA bytes. */
  private def rgbaOf(webp: Array[Byte]): Array[Byte] = {
    val img = graft.operators.WebpL.decode(webp).get
    val out = new Array[Byte](img.pixels.length * 4)
    var i = 0
    while (i < img.pixels.length) {
      val px = img.pixels(i)
      out(4 * i) = ((px >>> 16) & 0xff).toByte
      out(4 * i + 1) = ((px >>> 8) & 0xff).toByte
      out(4 * i + 2) = (px & 0xff).toByte
      out(4 * i + 3) = ((px >>> 24) & 0xff).toByte
      i += 1
    }
    out
  }

  test("114 reference-encoded streams decode to the reference's exact YUV planes") {
    assert(goldens.size === 114)
    goldens.foreach { c =>
      val payload = Vp8.vp8Chunk(c.webp)
      assert(payload.isDefined, c.name)
      val got = Vp8.decodeYuv(payload.get)
      assert(got.isDefined, c.name)
      val yuv = got.get
      assert(yuv.width === c.w, c.name)
      assert(yuv.height === c.h, c.name)
      assert(sha256(yuv.y) === c.ySha, s"${c.name}: Y plane")
      assert(sha256(yuv.u) === c.uSha, s"${c.name}: U plane")
      assert(sha256(yuv.v) === c.vSha, s"${c.name}: V plane")
    }
  }

  test("fancy-upsampled RGBA (incl. ALPH alpha planes) matches WebPDecodeRGBA byte-exactly") {
    goldens.foreach { c =>
      assert(sha256(rgbaOf(c.webp)) === c.rgbaSha, s"${c.name}: RGBA")
    }
    assert(goldens.count(_.name.startsWith("alpha")) === 12)
  }

  test("rejects: empty, inter-frame, bad start code, truncation, animation, bomb dims") {
    val good = goldens.head.webp
    assert(Vp8.decode(null) === None)
    assert(Vp8.decode(Array.empty[Byte]) === None)
    assert(Vp8.decodeYuv(Array.empty[Byte]) === None)
    val payload = Vp8.vp8Chunk(good).get
    // inter-frame bit
    val inter = payload.clone(); inter(0) = (inter(0) | 1).toByte
    assert(Vp8.decodeYuv(inter) === None)
    // bad start code
    val badSc = payload.clone(); badSc(3) = 0x9c.toByte
    assert(Vp8.decodeYuv(badSc) === None)
    // header truncation
    (1 until 10).foreach(n => assert(Vp8.decodeYuv(payload.take(n)) === None, s"len $n"))
    // first-partition size beyond buffer
    val shortP = payload.take(11)
    assert(Vp8.decodeYuv(shortP) === None || Vp8.decodeYuv(shortP).isDefined == false)
    // dimension bomb: 16383x16383 > pixel cap
    val bomb = payload.clone()
    bomb(6) = 0xff.toByte; bomb(7) = 0x3f.toByte
    bomb(8) = 0xff.toByte; bomb(9) = 0x3f.toByte
    assert(Vp8.decodeYuv(bomb) === None)
    // animation container
    val anim = good.clone()
    anim(12) = 'A'; anim(13) = 'N'; anim(14) = 'I'; anim(15) = 'M'
    assert(Vp8.decode(anim) === None)
  }

  test("mutation fuzz: single-byte corruptions decode or reject, never throw") {
    val c = goldens.find(_.name.startsWith("checker_33x29_q50")).getOrElse(goldens(20))
    val payload = Vp8.vp8Chunk(c.webp).get
    assert(Vp8.decodeYuv(payload).isDefined) // premise
    var k = 0
    while (k < payload.length) {
      Seq(0x01, 0x10, 0x80).foreach { bit =>
        val m = payload.clone()
        m(k) = (m(k) ^ bit).toByte
        Vp8.decodeYuv(m) // Option either way; VP8 carries no checksum
      }
      k += math.max(1, payload.length / 256)
    }
    // byte soup
    var s = 0x9e3779b97f4a7c15L
    (0 until 2000).foreach { j =>
      val b = Array.tabulate[Byte](10 + (j % 80)) { _ =>
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & 0xff).toByte
      }
      Vp8.decodeYuv(b)
    }
  }

  test("VP8-in-WebM keyframe extraction: container filtering + payload decode seam") {
    import graft.operators.Webm
    val gs = goldens.take(3)
    val payloads = gs.map(c => Vp8.vp8Chunk(c.webp).get)
    val webm = Webm.makeWebmVp8(gs.head.w, gs.head.h, payloads, seed = 42)
    // the walker itself must still accept the two-track file
    assert(Webm.info(webm).isDefined)
    val frames = Webm.videoKeyframes(webm).get
    // exactly the key frames — audio blocks and non-key junk skipped
    assert(frames.size === 3)
    frames.zip(gs).zipWithIndex.foreach { case (((idx, ts, payload), c), i) =>
      assert(idx === i)
      assert(ts === 40L * i)
      val yuv = Vp8.decodeYuv(payload).get
      assert(sha256(yuv.y) === c.ySha, c.name)
      assert(sha256(yuv.u) === c.uSha, c.name)
      assert(sha256(yuv.v) === c.vSha, c.name)
    }
    // mutation fuzz over the container: decode-or-reject, never throw
    var s = 0x1234567890abcdefL
    (0 until 400).foreach { _ =>
      val m = webm.clone()
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      m((s & 0x7fffffff).toInt % m.length) =
        ((s >>> 32) & 0xff).toByte
      Webm.videoKeyframes(m).foreach(_.foreach { case (_, _, p) =>
        Vp8.decodeYuv(p)
      })
    }
  }

  test("WebM extraction edge rules (r16 ADVICE): Tracks-after-Clusters, BlockGroup, lacing") {
    import graft.operators.Webm
    val g = goldens.head
    val payload = Vp8.vp8Chunk(g.webp).get
    val hdr = Webm.el(0x1A45DFA3L,
      Webm.elUint(0x4286, 1) ++ Webm.elStr(0x4282, "webm") ++
        Webm.elUint(0x4287, 4) ++ Webm.elUint(0x4285, 2))
    val tracks = Webm.el(0x1654AE6BL,
      Webm.el(0xAE, Webm.elUint(0xD7, 1L) ++ Webm.elUint(0x83, 1L) ++
        Webm.elStr(0x86, "V_VP8") ++
        Webm.el(0xE0, Webm.elUint(0xB0, g.w.toLong) ++ Webm.elUint(0xBA, g.h.toLong))))
    def simpleBlock(track: Int, flags: Int, data: Array[Byte]): Array[Byte] =
      Webm.el(0xA3, Array[Byte]((0x80 | track).toByte, 0, 0, flags.toByte) ++ data)
    def seg(body: Array[Byte]): Array[Byte] = hdr ++ Webm.el(0x18538067L, body)

    // 1) Matroska permits Tracks AFTER Clusters: two-pass resolve must
    //    still find the video track (the one-pass walk returned Some(empty)).
    val cluster = Webm.el(0x1F43B675L,
      Webm.elUint(0xE7, 0L) ++ simpleBlock(1, 0x80, payload))
    val outOfOrder = Webm.videoKeyframes(seg(cluster ++ tracks)).get
    assert(outOfOrder.size === 1)
    assert(Vp8.decodeYuv(outOfOrder.head._3).isDefined)

    // 2) BlockGroup-stored frames: Block with no ReferenceBlock = keyframe
    //    (kept); with ReferenceBlock = dependent frame (skipped).
    def blockGroup(refd: Boolean, data: Array[Byte]): Array[Byte] =
      Webm.el(0xA0,
        Webm.el(0xA1, Array[Byte](0x81.toByte, 0, 0, 0) ++ data) ++
          (if (refd) Webm.elUint(0xFB, 0L) else Array[Byte]()))
    val bgCluster = Webm.el(0x1F43B675L,
      Webm.elUint(0xE7, 0L) ++ blockGroup(refd = false, payload) ++
        blockGroup(refd = true, payload))
    val bg = Webm.videoKeyframes(seg(tracks ++ bgCluster)).get
    assert(bg.size === 1) // the ReferenceBlock'd group is skipped
    assert(java.util.Arrays.equals(bg.head._3, payload))

    // 3) Laced VIDEO blocks reject the file (payload would carry lace
    //    headers inline); laced AUDIO blocks on another track are skipped
    //    by track filter and stay harmless.
    val laced = Webm.el(0x1F43B675L,
      Webm.elUint(0xE7, 0L) ++ simpleBlock(1, 0x80 | 0x06, payload))
    assert(Webm.videoKeyframes(seg(tracks ++ laced)).isEmpty)
    val twoTracks = Webm.el(0x1654AE6BL,
      Webm.el(0xAE, Webm.elUint(0xD7, 1L) ++ Webm.elUint(0x83, 1L) ++
        Webm.elStr(0x86, "V_VP8") ++
        Webm.el(0xE0, Webm.elUint(0xB0, g.w.toLong) ++ Webm.elUint(0xBA, g.h.toLong))) ++
      Webm.el(0xAE, Webm.elUint(0xD7, 2L) ++ Webm.elUint(0x83, 2L) ++
        Webm.elStr(0x86, "A_VORBIS") ++
        Webm.el(0xE1, Webm.elFloat64(0xB5, 48000.0) ++ Webm.elUint(0x9F, 2L))))
    val audioLaced = Webm.el(0x1F43B675L,
      Webm.elUint(0xE7, 0L) ++ simpleBlock(2, 0x06, Array[Byte](1, 2, 3)) ++
        simpleBlock(1, 0x80, payload))
    assert(Webm.videoKeyframes(seg(twoTracks ++ audioLaced)).get.size === 1)
  }

  test("truncated token partition rejects (ran-dry check, r16 ADVICE)") {
    // Chop real golden streams short: the bool decoder's zero-fill must
    // not hand back Some(garbage). Detectability bound: a cut that stays
    // inside the legitimate ≤2-byte decoder lookahead is indistinguishable
    // from a valid end-of-stream by ANY decoder (libwebp's eof_ grants the
    // same one-virtual-byte grace and would accept such cuts too), and
    // tiny low-entropy streams can sit entirely inside that window — so
    // the must-reject assertion targets DENSE streams with substantial
    // cuts, where the partition genuinely runs dry.
    var checked = 0
    goldens.foreach { c =>
      val payload = Vp8.vp8Chunk(c.webp).get
      if (payload.length >= 300) {
        assert(Vp8.decodeYuv(payload).isDefined, c.name) // premise
        Seq(payload.length / 4, payload.length / 2).foreach { cut =>
          val t = java.util.Arrays.copyOf(payload, payload.length - cut)
          assert(Vp8.decodeYuv(t).isEmpty,
            s"${c.name} cut=$cut: Some(garbage) from a dry partition")
          checked += 1
        }
      }
    }
    assert(checked >= 20, s"only $checked truncation cases ran — golden set shrank?")
  }

  test("LIVE 400-case differential sweep vs libwebp (gated on python3 + libwebp)") {
    val probe = try {
      val p = new ProcessBuilder("python3", "-c",
        "import ctypes; ctypes.CDLL('libwebp.so.7').WebPDecodeYUV; print('ok')")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor() == 0 && out.contains("ok")
    } catch { case _: Exception => false }
    assume(probe, "python3 + libwebp not on this runtime")
    val p = new ProcessBuilder("python3", "scripts/vp8_reference.py",
      "sweep", "400", "20150815").start()
    val lines = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, err.take(2000))
    assert(lines.size === 400)
    lines.foreach { ln =>
      val name = jstr(ln, "name")
      val webp = hex(jstr(ln, "webp"))
      val yuv = Vp8.decodeYuv(Vp8.vp8Chunk(webp).getOrElse(fail(s"$name: container")))
        .getOrElse(fail(s"$name: decode"))
      assert(yuv.width === jint(ln, "w") && yuv.height === jint(ln, "h"), name)
      assert(sha256(yuv.y) === jstr(ln, "y_sha"), s"$name: Y")
      assert(sha256(yuv.u) === jstr(ln, "u_sha"), s"$name: U")
      assert(sha256(yuv.v) === jstr(ln, "v_sha"), s"$name: V")
      assert(sha256(rgbaOf(webp)) === jstr(ln, "rgba_sha"), s"$name: RGBA")
    }
  }
}
