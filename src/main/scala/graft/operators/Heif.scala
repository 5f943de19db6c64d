package graft.operators

/** HEIF-family container walk (AVIF / HEIC) — r16, the codec-trigger
  * discipline: libavif (aom enc/dec + dav1d dec) and libheif (x265 enc
  * + libde265 dec) appeared on the runtime this round, unblocking
  * reference-pinned ingest of the two formats crawls now serve to
  * Chrome/Safari. This operator is the CONTAINER layer (the part a
  * 100 TB ingest needs for routing, stats, dedup keys and decode
  * budgeting). Sample decode now covers BOTH payload codecs: av01
  * via [[graft.operators.av1.Av1Decoder]] (r16-r17) and hvc1 via
  * [[graft.operators.hevc.HevcDecoder]] (r18) — each a from-scratch
  * intra decoder reference-pinned by its differential sweep.
  *
  * Layout (public ISOBMFF / HEIF / AVIF specs — ISO 14496-12, 23008-12,
  * AOM AVIF): ftyp brand, then a `meta` FULL box holding hdlr('pict'),
  * pitm (primary item), iinf/infe (item ids + 4cc types), iloc (extent
  * table; construction methods 0 = absolute file offsets and 1 =
  * idat-relative both occur in the wild — libavif writes 0, libheif 1),
  * idat, iprp/ipco (property pool: ispe dims, pixi bit depth, av1C,
  * hvcC, auxC auxiliary-type urn, irot) + ipma (item → 1-based property
  * indices), iref (auxl: auxiliary → master; dimg: grid → coded tiles).
  *
  * Resolution rules this walk implements (each pinned by the
  * reference-derived e119 fixture):
  *  - dims come from the PRIMARY item's associated ispe (libheif emits
  *    a `grid` primary whose ispe carries the logical dims; the padded
  *    coded tile has its own);
  *  - depth is the primary's pixi, falling back to the first dimg
  *    child's pixi (grid items carry no pixi);
  *  - has_alpha means: some item carries an alpha auxC urn AND auxl-
  *    references the primary or one of its dimg children;
  *  - for av01 primaries the first sequence-header OBU in the payload
  *    yields (seq_profile, still_picture) — a from-scratch OBU walk,
  *    the first slice of the AV1 bitstream work.
  *
  * Reject-don't-guess: missing/duplicate required boxes, non-'pict'
  * handlers, unknown iloc construction methods, out-of-bounds extents
  * and bomb dims all return None. Shape at 100 TB: per-file scan-local
  * walk, zero shuffle, bomb caps before allocation.
  */
object Heif {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  val MaxItems = 4096
  val MaxDim = 1 << 15
  private val MaxBoxDepth = 16

  /** One file's container facts (fields mirror the e119 fixture). The
    * obu* fields come from the FULL sequence-header parse
    * ([[Av1.sequenceHeader]]) of av01 primaries — cross-domain pinned
    * against the reference decoder's report of the same members — and
    * are None for non-AV1 primaries.
    */
  final case class Info(brand: String, itemType: String, width: Int,
      height: Int, depth: Int, hasAlpha: Boolean, nItems: Int, irot: Int,
      primaryBytes: Long, seqProfile: Option[Int],
      stillPicture: Option[Boolean], obuMaxW: Option[Int],
      obuMaxH: Option[Int], obuBitDepth: Option[Int],
      obuMono: Option[Boolean], obuSubX: Option[Int], obuSubY: Option[Int])

  private def u16(b: Array[Byte], o: Int): Int = {
    if (o < 0 || o + 2 > b.length) throw Malformed
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw Malformed
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def uN(b: Array[Byte], o: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    v
  }
  private def fourcc(b: Array[Byte], o: Int): String = {
    if (o < 0 || o + 4 > b.length) throw Malformed
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ISO-8859-1")
  }

  /** Walk child boxes of [start, end); f(type, bodyStart, bodyEnd). */
  private def boxes(b: Array[Byte], start: Int, end: Int, depth: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    if (depth > MaxBoxDepth) throw Malformed
    var p = start
    while (p + 8 <= end) {
      var size = u32(b, p)
      val typ = fourcc(b, p + 4)
      var body = p + 8
      if (size == 1L) { size = u64(b, p + 8); body = p + 16 }
      else if (size == 0L) size = (end - p).toLong
      if (size < body - p || p + size > end) throw Malformed
      f(typ, body, p + size.toInt)
      p += size.toInt
    }
  }

  private final case class Extent(method: Int, off: Long, len: Long)

  /** decoded primary pixels (+ alpha plane stream when present):
    * AV1 payloads through [[graft.operators.av1.Av1Decoder]] and HEVC
    * (hvc1) payloads through [[graft.operators.hevc.HevcDecoder]] —
    * both from-scratch intra decoders, reference-pinned by their
    * differential sweeps (Av1Spec / HevcSpec). None for unsupported
    * primaries or tool combinations (reject-don't-guess). HEVC output
    * is cropped to the container's logical (ispe) dims top-left, the
    * libheif convention for the single-tile grid layout.
    */
  final case class Decoded(info: Info,
      primary: graft.operators.av1.Av1Decoder.Planes,
      alpha: Option[graft.operators.av1.Av1Decoder.Planes])

  def decode(b: Array[Byte]): Option[Decoded] =
    parse(b).flatMap { case (info, payload, alphaPayload) =>
      if (info.itemType == "av01") {
        payload.flatMap(graft.operators.av1.Av1Decoder.decode).map { pl =>
          Decoded(info, pl,
            alphaPayload.flatMap(graft.operators.av1.Av1Decoder.decode))
        }
      } else {
        payload.flatMap(hevcDecodeCropped(_, info.width, info.height))
          .map { pl =>
            Decoded(info, pl, alphaPayload.flatMap(a =>
              hevcDecodeCropped(a, info.width, info.height)))
          }
      }
    }

  /** HEVC decode + top-left crop to the ispe dims, converted into the
    * shared Planes shape. */
  private def hevcDecodeCropped(annexB: Array[Byte], w: Int,
      h: Int): Option[graft.operators.av1.Av1Decoder.Planes] =
    graft.operators.hevc.HevcDecoder.decode(annexB).flatMap { pl =>
      if (pl.width < w || pl.height < h) None
      else {
        def crop(plane: Array[Int], srcW: Int, outW: Int,
            outH: Int): Array[Int] = {
          val out = new Array[Int](outW * outH)
          var y = 0
          while (y < outH) {
            System.arraycopy(plane, y * srcW, out, y * outW, outW)
            y += 1
          }
          out
        }
        val planes =
          if (pl.monochrome) Array(crop(pl.planes(0), pl.width, w, h))
          else {
            val cw = (w + 1) >> 1
            val ch = (h + 1) >> 1
            Array(crop(pl.planes(0), pl.width, w, h),
              crop(pl.planes(1), (pl.width + 1) >> 1, cw, ch),
              crop(pl.planes(2), (pl.width + 1) >> 1, cw, ch))
          }
        Some(graft.operators.av1.Av1Decoder.Planes(w, h, pl.bitDepth,
          pl.subX, pl.subY, pl.monochrome, planes))
      }
    }

  def info(b: Array[Byte]): Option[Info] = parse(b).map(_._1)

  private def parse(b: Array[Byte])
      : Option[(Info, Option[Array[Byte]], Option[Array[Byte]])] = {
    try {
      if (b == null || b.length < 16) throw Malformed
      // ftyp must be the first box
      if (fourcc(b, 4) != "ftyp") throw Malformed
      val ftypSize = u32(b, 0).toInt
      if (ftypSize < 16 || ftypSize > b.length) throw Malformed
      val brand = fourcc(b, 8)

      var metaSeen = false
      var hdlrPict = false
      var primary = -1L
      var nItems = -1
      val itemType = scala.collection.mutable.Map.empty[Long, String]
      val extents = scala.collection.mutable.Map.empty[Long, Vector[Extent]]
      var idatRange: Option[(Int, Int)] = None
      var props = Vector.empty[(String, Int, Int)] // ipco order, 1-based
      val assoc = scala.collection.mutable.Map.empty[Long, Vector[Int]]
      val refs = scala.collection.mutable.ListBuffer
        .empty[(String, Long, Vector[Long])] // (type, from, to*)

      boxes(b, 0, b.length, 0) { (typ, bs, be) =>
        if (typ == "meta") {
          if (metaSeen) throw Malformed
          metaSeen = true
          boxes(b, bs + 4, be, 1) { (t2, ms, me) =>
            t2 match {
              case "hdlr" =>
                hdlrPict = fourcc(b, ms + 8) == "pict"
              case "pitm" =>
                primary = if (b(ms) == 0) u16(b, ms + 4).toLong else u32(b, ms + 4)
              case "iinf" =>
                val v = b(ms) & 0xff
                val cnt = if (v == 0) u16(b, ms + 4).toLong else u32(b, ms + 4)
                if (cnt < 1 || cnt > MaxItems) throw Malformed
                nItems = cnt.toInt
                boxes(b, ms + (if (v == 0) 6 else 8), me, 2) { (t3, is, _) =>
                  if (t3 == "infe") {
                    val ev = b(is) & 0xff
                    if (ev < 2) throw Malformed // pre-v2 infe: not HEIF
                    val id = if (ev == 2) u16(b, is + 4).toLong else u32(b, is + 4)
                    val t4 = fourcc(b, is + (if (ev == 2) 8 else 10))
                    itemType(id) = t4
                  }
                }
                if (itemType.size != nItems) throw Malformed
              case "idat" =>
                idatRange = Some((ms, me))
              case "iloc" =>
                val ver = b(ms) & 0xff
                if (ver > 2) throw Malformed
                var p = ms + 4
                val offSz = (b(p) & 0xff) >> 4
                val lenSz = b(p) & 0x0f
                p += 1
                val baseSz = (b(p) & 0xff) >> 4
                val idxSz = if (ver >= 1) b(p) & 0x0f else 0
                p += 1
                Seq(offSz, lenSz, baseSz, idxSz).foreach { s =>
                  if (s != 0 && s != 4 && s != 8) throw Malformed
                }
                val cnt = if (ver < 2) { val c = u16(b, p); p += 2; c }
                  else { val c = u32(b, p).toInt; p += 4; c }
                if (cnt < 0 || cnt > MaxItems) throw Malformed
                var i = 0
                while (i < cnt) {
                  val id = if (ver < 2) { val v = u16(b, p).toLong; p += 2; v }
                    else { val v = u32(b, p); p += 4; v }
                  var method = 0
                  if (ver >= 1) { method = u16(b, p) & 0x0f; p += 2 }
                  p += 2 // data_reference_index
                  val base = uN(b, p, baseSz); p += baseSz
                  val ecnt = u16(b, p); p += 2
                  if (ecnt > 64) throw Malformed
                  var es = Vector.empty[Extent]
                  var j = 0
                  while (j < ecnt) {
                    p += idxSz
                    val eo = uN(b, p, offSz); p += offSz
                    val el = uN(b, p, lenSz); p += lenSz
                    es :+= Extent(method, base + eo, el)
                    j += 1
                  }
                  extents(id) = es
                  i += 1
                }
              case "iprp" =>
                boxes(b, ms, me, 2) { (t3, ps, pe) =>
                  t3 match {
                    case "ipco" =>
                      boxes(b, ps, pe, 3) { (t4, cs, ce) =>
                        props :+= ((t4, cs, ce))
                      }
                    case "ipma" =>
                      val v = b(ps) & 0xff
                      val fl = u32(b, ps) & 0xffffff
                      var q = ps + 4
                      val ec = u32(b, q).toInt; q += 4
                      if (ec < 0 || ec > MaxItems) throw Malformed
                      var i = 0
                      while (i < ec) {
                        val id = if (v == 0) { val x = u16(b, q).toLong; q += 2; x }
                          else { val x = u32(b, q); q += 4; x }
                        val ac = b(q) & 0xff; q += 1
                        var as = Vector.empty[Int]
                        var j = 0
                        while (j < ac) {
                          val pi = if ((fl & 1) != 0) { val x = u16(b, q) & 0x7fff; q += 2; x }
                            else { val x = b(q) & 0x7f; q += 1; x }
                          as :+= pi
                          j += 1
                        }
                        assoc(id) = as
                        i += 1
                      }
                    case _ => ()
                  }
                }
              case "iref" =>
                val v = b(ms) & 0xff
                if (v > 1) throw Malformed
                boxes(b, ms + 4, me, 2) { (t3, rs, _) =>
                  val from = if (v == 0) u16(b, rs).toLong else u32(b, rs)
                  val rc = if (v == 0) u16(b, rs + 2) else u16(b, rs + 4)
                  if (rc > MaxItems) throw Malformed
                  var tos = Vector.empty[Long]
                  var j = 0
                  while (j < rc) {
                    tos :+= (if (v == 0) u16(b, rs + 4 + 2 * j).toLong
                      else u32(b, rs + 6 + 4 * j))
                    j += 1
                  }
                  refs += ((t3, from, tos))
                }
              case _ => ()
            }
          }
        }
      }

      if (!metaSeen || !hdlrPict || primary < 0 || nItems < 1) throw Malformed
      val pType = itemType.getOrElse(primary, throw Malformed)

      def propsOf(id: Long): Vector[(String, Int, Int)] =
        assoc.getOrElse(id, Vector.empty).flatMap { pi =>
          if (pi < 1 || pi > props.size) throw Malformed
          Some(props(pi - 1))
        }
      def firstProp(id: Long, typ: String): Option[(Int, Int)] =
        propsOf(id).collectFirst { case (t, s, e) if t == typ => (s, e) }

      // dims: the primary's ispe (FULL box: 4 + w u32 + h u32)
      val (w, h) = firstProp(primary, "ispe") match {
        case Some((s, _)) => (u32(b, s + 4), u32(b, s + 8))
        case None => throw Malformed
      }
      if (w < 1 || h < 1 || w > MaxDim || h > MaxDim) throw Malformed

      // dimg children (grid → coded tiles)
      val dimgChildren = refs.collect {
        case ("dimg", f, tos) if f == primary => tos
      }.flatten.toVector

      // depth: primary's pixi, else first dimg child's (FULL: 4 +
      // num_channels u8 + bits u8 per channel)
      def pixiOf(id: Long): Option[Int] = firstProp(id, "pixi").map {
        case (s, e) =>
          val nc = b(s + 4) & 0xff
          if (nc < 1 || s + 5 + nc > e) throw Malformed
          b(s + 5) & 0xff
      }
      val depth = pixiOf(primary)
        .orElse(dimgChildren.iterator.flatMap(pixiOf(_).iterator).nextOption())
        .getOrElse(throw Malformed)

      // alpha: an item with an alpha auxC urn that auxl-references the
      // primary or one of its dimg children
      val alphaTargets = (primary +: dimgChildren).toSet
      val alphaItem: Option[Long] = itemType.keys.find { id =>
        firstProp(id, "auxC").exists { case (s, e) =>
          val urnEnd0 = {
            var q = s + 4
            while (q < e && b(q) != 0) q += 1
            q
          }
          val urn = new String(b, s + 4, urnEnd0 - (s + 4), "ISO-8859-1")
          (urn.startsWith("urn:mpeg:mpegB:cicp:systems:auxiliary:alpha") ||
            urn.startsWith("urn:mpeg:hevc:2015:auxid:1")) &&
            refs.exists { case (t, f, tos) =>
              t == "auxl" && f == id && tos.exists(alphaTargets)
            }
        }
      }
      val hasAlpha = alphaItem.isDefined

      val irot = firstProp(primary, "irot").map { case (s, _) => b(s) & 3 }
        .getOrElse(0)

      // iloc payload resolution for the primary
      val pExts = extents.getOrElse(primary, throw Malformed)
      val primaryBytes = pExts.map(_.len).sum
      def payloadOf(id: Long): Array[Byte] = {
        val es = extents.getOrElse(id, throw Malformed)
        val total = es.map(_.len).sum
        if (total > (1L << 26)) throw Malformed // 64 MiB bomb cap
        val out = new Array[Byte](total.toInt)
        var w0 = 0
        es.foreach { ex =>
          val abs = ex.method match {
            case 0 => ex.off
            case 1 =>
              val (is, ie) = idatRange.getOrElse(throw Malformed)
              if (ex.off + ex.len > ie - is) throw Malformed
              is + ex.off
            case _ => throw Malformed // method 2 (item) unsupported
          }
          if (abs < 0 || abs + ex.len > b.length) throw Malformed
          System.arraycopy(b, abs.toInt, out, w0, ex.len.toInt)
          w0 += ex.len.toInt
        }
        out
      }

      // av01: the FULL sequence-header parse (Av1.sequenceHeader)
      val seq: Option[Av1.SeqHeader] =
        if (pType == "av01")
          Some(Av1.sequenceHeader(payloadOf(primary)).getOrElse(throw Malformed))
        else None

      val info = Info(brand, pType, w.toInt, h.toInt, depth, hasAlpha,
        nItems, irot, primaryBytes, seq.map(_.profile),
        seq.map(_.stillPicture), seq.map(_.maxWidth), seq.map(_.maxHeight),
        seq.map(_.bitDepth), seq.map(_.monochrome),
        seq.map(_.subsamplingX), seq.map(_.subsamplingY))
      // hvc1: the coded item is the primary itself, or — libheif's
      // layout — the single dimg child of a grid primary. The payload
      // handed out is an assembled annex-B stream: hvcC parameter sets
      // (ISO 14496-15 8.3.3.1) + the item's length-prefixed NALs.
      def hevcAnnexB(id: Long): Array[Byte] = {
        val (hs, he) = firstProp(id, "hvcC").getOrElse(throw Malformed)
        if (he - hs < 23) throw Malformed
        val nalSz = (b(hs + 21) & 3) + 1
        val out = new java.io.ByteArrayOutputStream()
        val start = Array[Byte](0, 0, 0, 1)
        var q = hs + 22
        val nArr = b(q) & 0xff
        q += 1
        var a = 0
        while (a < nArr) {
          q += 1 // completeness + NAL type
          val cnt = u16(b, q)
          q += 2
          var k = 0
          while (k < cnt) {
            val len = u16(b, q)
            q += 2
            if (q + len > he) throw Malformed
            out.write(start)
            out.write(b, q, len)
            q += len
            k += 1
          }
          a += 1
        }
        val payload = payloadOf(id)
        var r = 0
        while (r < payload.length) {
          if (r + nalSz > payload.length) throw Malformed
          var len = 0L
          var i2 = 0
          while (i2 < nalSz) {
            len = (len << 8) | (payload(r + i2) & 0xffL)
            i2 += 1
          }
          r += nalSz
          if (r + len > payload.length) throw Malformed
          out.write(start)
          out.write(payload, r, len.toInt)
          r += len.toInt
        }
        out.toByteArray
      }
      val hevcCoded: Option[Long] =
        if (pType == "hvc1") Some(primary)
        else if (pType == "grid" && dimgChildren.size == 1 &&
            itemType.get(dimgChildren.head).contains("hvc1"))
          Some(dimgChildren.head)
        else None

      val primaryPayload =
        if (pType == "av01") Some(payloadOf(primary))
        else hevcCoded.map(hevcAnnexB)
      val alphaPayload =
        if (pType == "av01") alphaItem.map(payloadOf)
        else if (hevcCoded.isDefined)
          alphaItem.filter(id => itemType.get(id).contains("hvc1"))
            .map(hevcAnnexB)
        else None
      Some((info, primaryPayload, alphaPayload))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }
}
