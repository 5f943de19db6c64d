package graft

import graft.operators.Heif
import org.scalatest.funsuite.AnyFunSuite

/** HEIF-family container walk (r16). The e119 fixture pins all 12
  * reference-encoded members against libavif/libheif-derived expected
  * rows; this spec covers the member spot-checks plus the paths the
  * reference writers don't emit — irot, reject rules — via a
  * hand-built minimal container. DecoderFuzzSpec carries the
  * truncation/mutation/soup families.
  */
class HeifSpec extends AnyFunSuite {

  private lazy val members = graft.queries.Curation.avifHeifMembers().toMap

  test("reference-encoded AVIF members: dims/depth/alpha/seq-header fields") {
    val a = Heif.info(members("a420_33x21.avif")).get
    assert(a.brand === "avif" && a.itemType === "av01")
    assert((a.width, a.height, a.depth) === ((33, 21, 8)))
    assert(!a.hasAlpha && a.nItems === 1)
    assert(a.seqProfile === Some(0) && a.stillPicture === Some(true))

    val al = Heif.info(members("a444_alpha_11x7.avif")).get
    assert(al.hasAlpha && al.nItems === 2)
    assert(al.seqProfile === Some(1)) // 4:4:4 → high profile

    val tb = Heif.info(members("a420_10bit_16x12.avif")).get
    assert(tb.depth === 10)

    // full sequence-header parse agrees with the container + reference
    // across the member family (cross-domain: bitstream vs ispe/pixi)
    members.keys.filter(_.endsWith(".avif")).foreach { name =>
      val i = Heif.info(members(name)).get
      assert(i.obuMaxW === Some(i.width), name)
      assert(i.obuMaxH === Some(i.height), name)
      assert(i.obuBitDepth === Some(i.depth), name)
      assert(i.stillPicture === Some(true), name)
    }
    val mono = Heif.info(members("a400_24x16.avif")).get
    assert(mono.obuMono === Some(true))
    assert((mono.obuSubX, mono.obuSubY) === ((Some(1), Some(1))))
    val s444 = Heif.info(members("a444_17x9.avif")).get
    assert(s444.obuMono === Some(false))
    assert((s444.obuSubX, s444.obuSubY) === ((Some(0), Some(0))))
  }

  test("LIVE sequence-header sweep vs libavif (gated on python3 + libavif)") {
    val probe = try {
      val p = new ProcessBuilder("python3", "-c",
        "import ctypes; ctypes.CDLL('libavif.so.15').avifEncoderWrite; print('ok')")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor() == 0 && out.contains("ok")
    } catch { case _: Exception => false }
    assume(probe, "python3 + libavif not on this runtime")
    val p = new ProcessBuilder("python3", "scripts/avif_heif_reference.py",
      "sweep", "60", "20260815").start()
    val lines = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, err.take(2000))
    assert(lines.size === 60)
    def jint(s: String, k: String): Int =
      ("\"" + k + "\":\\s*(-?\\d+)").r.findFirstMatchIn(s).get.group(1).toInt
    def jbool(s: String, k: String): Boolean =
      ("\"" + k + "\":\\s*(true|false)").r.findFirstMatchIn(s).get.group(1).toBoolean
    def jhex(s: String): Array[Byte] = {
      val h = ("\"hex\":\\s*\"([0-9a-f]+)\"").r.findFirstMatchIn(s).get.group(1)
      h.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray
    }
    lines.foreach { ln =>
      val i = Heif.info(jhex(ln)).getOrElse(fail(s"rejected: ${ln.take(80)}"))
      assert(i.itemType === "av01")
      assert(i.width === jint(ln, "width"), ln.take(60))
      assert(i.height === jint(ln, "height"), ln.take(60))
      assert(i.obuMaxW === Some(jint(ln, "width")), ln.take(60))
      assert(i.obuMaxH === Some(jint(ln, "height")), ln.take(60))
      assert(i.obuBitDepth === Some(jint(ln, "depth")), ln.take(60))
      assert(i.depth === jint(ln, "depth"), ln.take(60))
      assert(i.hasAlpha === jbool(ln, "has_alpha"), ln.take(60))
      assert(i.obuMono === Some(jbool(ln, "mono")), ln.take(60))
      assert(i.obuSubX === Some(jint(ln, "sub_x")), ln.take(60))
      assert(i.obuSubY === Some(jint(ln, "sub_y")), ln.take(60))
      assert(i.stillPicture === Some(true), ln.take(60))
    }
  }

  test("reference-encoded HEIC members: grid primary resolution") {
    val g = Heif.info(members("h420_48x32.heic")).get
    assert(g.brand === "heic" && g.itemType === "grid")
    assert((g.width, g.height) === ((48, 32))) // logical dims, not the padded tile
    assert(g.depth === 8) // pixi resolved through the dimg child
    assert(g.seqProfile.isEmpty && g.stillPicture.isEmpty)

    val c = Heif.info(members("h420_64x64.heic")).get
    assert(c.itemType === "hvc1" && c.nItems === 1)
  }

  // ---- minimal hand-built container for irot + reject coverage ----

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
    out.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
    out.array()
  }
  private def full(typ: String, body: Array[Byte], version: Int = 0): Array[Byte] =
    box(typ, Array[Byte]((version & 0xff).toByte, 0, 0, 0) ++ body)
  private def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Pack (value, bitWidth) fields MSB-first, zero-padded to bytes. */
  private def packBits(spec: (Int, Int)*): Array[Byte] = {
    val sb = new StringBuilder
    spec.foreach { case (v, w) =>
      val s = Integer.toBinaryString(v)
      require(s.length <= w, s"$v does not fit $w bits")
      sb.append("0" * (w - s.length)).append(s)
    }
    while (sb.length % 8 != 0) sb.append('0')
    sb.toString.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
  }

  /** A complete, minimal reduced-still sequence header: profile 2,
    * still 1, 9×7, 8-bit, 4:2:2 (profile 2's forced subsampling at
    * depth ≤ 10), all features off.
    */
  private val miniSeqPayload: Array[Byte] = packBits(
    (2, 3), // seq_profile
    (1, 1), // still_picture
    (1, 1), // reduced_still_picture_header
    (0, 5), // seq_level_idx[0]
    (3, 4), // frame_width_bits_minus_1 → 4-bit widths
    (2, 4), // frame_height_bits_minus_1 → 3-bit heights
    (8, 4), // max_frame_width_minus_1 = 8 → 9
    (6, 3), // max_frame_height_minus_1 = 6 → 7
    (0, 1), (0, 1), (0, 1), // sb128 / filter_intra / intra_edge
    (0, 1), (0, 1), (0, 1), // superres / cdef / restoration
    (0, 1), // high_bitdepth → 8-bit
    (0, 1), // mono_chrome = 0
    (0, 1), // color_description_present = 0
    (0, 1), // color_range
    (0, 1), // separate_uv_delta_q
    (0, 1)) // film_grain_params_present
  private val miniObu: Array[Byte] =
    Array[Byte](0x0a, miniSeqPayload.length.toByte) ++ miniSeqPayload

  /** One-item av01 container; mdat holds the sized sequence-header OBU
    * above (profile 2, still_picture 1, max dims 9×7).
    */
  private def makeMini(irotAngle: Int): Array[Byte] = {
    val ftyp = box("ftyp", "avif".getBytes ++ be32(0) ++ "avifmif1".getBytes)
    val hdlr = full("hdlr", be32(0) ++ "pict".getBytes ++ new Array[Byte](12))
    val pitm = full("pitm", be16(1))
    val infe = full("infe", be16(1) ++ be16(0) ++ "av01".getBytes :+ 0.toByte,
      version = 2)
    val iinf = full("iinf", be16(1) ++ infe)
    val ispe = full("ispe", be32(9) ++ be32(7))
    val pixi = full("pixi", Array[Byte](1, 8))
    val irot = box("irot", Array[Byte]((irotAngle & 3).toByte))
    val av1c = box("av1C", Array[Byte](0x81.toByte, 0x08, 0, 0))
    val nProps = if (irotAngle > 0) 4 else 3
    val ipco = box("ipco",
      ispe ++ pixi ++ av1c ++ (if (irotAngle > 0) irot else Array[Byte]()))
    val ipma = full("ipma", be32(1) ++ be16(1) ++
      (Array[Byte](nProps.toByte) ++ (1 to nProps).map(_.toByte)))
    val iprp = box("iprp", ipco ++ ipma)
    val obu = miniObu
    val metaNoIloc = hdlr ++ pitm ++ iinf ++ iprp
    // iloc v0: sizes (4,4), base 0, 1 item: id 1, dri 0, 1 extent
    def meta(mdatBodyOff: Int) = full("meta", metaNoIloc ++
      full("iloc", Array[Byte](0x44, 0) ++ be16(1) ++
        be16(1) ++ be16(0) ++ be16(1) ++ be32(mdatBodyOff) ++ be32(obu.length)))
    val withoutMdat = ftyp ++ meta(0)
    val mdatBody = withoutMdat.length + 8
    ftyp ++ meta(mdatBody) ++ box("mdat", obu)
  }

  test("hand-built container: irot parses; full seq-header fields surface") {
    val i = Heif.info(makeMini(irotAngle = 2)).get
    assert(i.irot === 2)
    assert((i.width, i.height, i.depth) === ((9, 7, 8)))
    assert(i.seqProfile === Some(2) && i.stillPicture === Some(true))
    assert((i.obuMaxW, i.obuMaxH) === ((Some(9), Some(7))))
    assert(i.obuBitDepth === Some(8) && i.obuMono === Some(false))
    // profile 2 at depth ≤ 10 forces 4:2:2
    assert((i.obuSubX, i.obuSubY) === ((Some(1), Some(0))))
    assert(Heif.info(makeMini(irotAngle = 0)).get.irot === 0)
  }

  test("rejects: non-pict handler, missing ispe, bomb dims, bad iloc method, no seq OBU") {
    val good = makeMini(0)
    assert(Heif.info(good).isDefined) // premise
    assert(Heif.info(Array[Byte]()).isEmpty)
    assert(Heif.info(good.take(40)).isEmpty)
    // corrupt the hdlr 'pict' tag
    val notPict = good.clone()
    val h = indexOfSlice(notPict, "pict")
    notPict(h) = 'v'.toByte
    assert(Heif.info(notPict).isEmpty)
    // bomb dims: patch ispe width to 2^30
    val bomb = good.clone()
    val is = indexOfSlice(bomb, "ispe")
    bomb(is + 8) = 0x40
    assert(Heif.info(bomb).isEmpty)
    // OBU header becomes a non-seq unsized OBU → reject, not garbage
    val noSeq = good.clone()
    noSeq(noSeq.length - miniObu.length) = 0x30 // type 6 (frame), has_size=0
    assert(Heif.info(noSeq).isEmpty)
  }

  test("MimeSniff brands: avif/heic route; plain mp4 stays video/mp4") {
    assert(graft.functions.MimeSniff.mimeOf(members("a420_7x5.avif")) === "image/avif")
    assert(graft.functions.MimeSniff.mimeOf(members("h420_31x17.heic")) === "image/heif")
    val mp4 = graft.operators.Multimodal.makeMp4(0L, 1000, 5000, 64, 5L)
    assert(graft.functions.MimeSniff.mimeOf(mp4) === "video/mp4")
  }

  test("UniversalIngest counts HEIF items as units") {
    assert(graft.operators.UniversalIngest.unitCount(
      members("a420_alpha_20x14.avif")) === Some(("image/avif", 2L)))
    assert(graft.operators.UniversalIngest.unitCount(
      members("h420_64x64.heic")) === Some(("image/heif", 1L)))
  }

  private def indexOfSlice(hay: Array[Byte], needle: String): Int = {
    val n = needle.getBytes("ISO-8859-1")
    (0 to hay.length - n.length).find(i =>
      n.indices.forall(j => hay(i + j) == n(j))).get
  }
}
