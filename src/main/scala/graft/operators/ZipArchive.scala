package graft.operators

/** ZIP archive reader — the container data drops and scraped bundles
  * actually arrive in (APPNOTE.TXT / PKZIP format). The reader is
  * central-directory-driven, as the spec requires: the End Of Central
  * Directory record is located by scanning backward through the
  * trailing comment region, each central entry is read for the
  * authoritative name/method/sizes/CRC, and the member DATA position
  * resolves through that entry's LOCAL header (whose name/extra
  * lengths may legally differ from the central copy). Stored (method
  * 0) and raw-deflate (method 8) members decode; the CRC-32 of every
  * decoded member is VERIFIED — a corrupt archive rejects as None,
  * never yields silently wrong bytes. Zip64, encryption, multi-disk
  * and exotic methods reject cleanly (None). Per-file scan-local work:
  * the operator runs at read parallelism with zero shuffle.
  *
  * Envelope guards: ≤ 4096 entries, ≤ 64 MiB declared uncompressed
  * per member, inflate output must match the declared size exactly
  * (zip-bomb + truncation discipline shared with the other decoders).
  */
object ZipArchive {

  /** One member: central-directory metadata + verified decoded bytes. */
  final case class ZipMember(name: String, method: Int, compSize: Long,
      size: Long, crc: Long, data: Array[Byte])

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def leU64(b: Array[Byte], o: Int): Long =
    leU32(b, o) | (leU32(b, o + 4) << 32)

  /** All members, decoded and CRC-verified; None for anything outside
    * the envelope. Member order is central-directory order (the order
    * the archive declares).
    */
  def members(b: Array[Byte]): Option[Seq[ZipMember]] = {
    try {
      if (b == null || b.length < 22) return None
      // EOCD: PK\5\6, somewhere in the last 64 KiB + 22 (comment max)
      val scanFrom = math.max(0, b.length - 22 - 0xffff)
      var eocd = -1
      var p = b.length - 22
      while (eocd < 0 && p >= scanFrom) {
        if (b(p) == 0x50 && b(p + 1) == 0x4b && b(p + 2) == 0x05 &&
          b(p + 3) == 0x06 &&
          // self-consistency: the comment must run exactly to EOF
          p + 22 + leU16(b, p + 20) == b.length) eocd = p
        else p -= 1
      }
      if (eocd < 0) return None
      var nEntries = leU16(b, eocd + 10).toLong
      var cdSize = leU32(b, eocd + 12)
      var cdOff = leU32(b, eocd + 16)
      if (leU16(b, eocd + 4) != 0 || leU16(b, eocd + 6) != 0)
        return None // multi-disk
      if (leU16(b, eocd + 8).toLong != nEntries) return None
      // zip64 (APPNOTE 4.3.14/4.3.15): an EOCD64 locator immediately
      // precedes the EOCD; masked EOCD fields (0xFFFF / 0xFFFFFFFF)
      // resolve from the EOCD64 record. A masked field with NO locator —
      // or a locator pointing at anything but a self-consistent EOCD64 —
      // rejects like every other framing inconsistency.
      val masked = nEntries == 0xffffL || cdSize == 0xffffffffL ||
        cdOff == 0xffffffffL
      val cdEnd: Long =
        if (eocd >= 20 && leU32(b, eocd - 20) == 0x07064b50L) {
          val loc = eocd - 20
          if (leU32(b, loc + 4) != 0 || leU32(b, loc + 16) != 1)
            return None // multi-disk
          val e64 = leU64(b, loc + 8)
          if (e64 < 0 || e64 + 56 > loc) return None
          if (leU32(b, e64.toInt) != 0x06064b50L) return None
          if (leU64(b, e64.toInt + 4) < 44L) return None // declared record size
          if (leU32(b, e64.toInt + 16) != 0 || leU32(b, e64.toInt + 20) != 0)
            return None // multi-disk
          val n1 = leU64(b, e64.toInt + 24)
          val n2 = leU64(b, e64.toInt + 32)
          if (n1 != n2) return None
          val cdSize64 = leU64(b, e64.toInt + 40)
          val cdOff64 = leU64(b, e64.toInt + 48)
          // unmasked EOCD fields must AGREE with the 64-bit record
          if (nEntries != 0xffffL && nEntries != n1) return None
          if (cdSize != 0xffffffffL && cdSize != cdSize64) return None
          if (cdOff != 0xffffffffL && cdOff != cdOff64) return None
          nEntries = n1; cdSize = cdSize64; cdOff = cdOff64
          e64 // the central directory must run exactly up to the EOCD64
        } else if (masked) return None
        else eocd.toLong
      if (nEntries > 4096) return None
      if (cdOff < 0 || cdOff + cdSize > cdEnd) return None
      val out = Seq.newBuilder[ZipMember]
      var o = cdOff.toInt
      var e = 0
      while (e < nEntries) {
        if (o + 46 > eocd || leU32(b, o) != 0x02014b50L) return None
        val flags = leU16(b, o + 8)
        val method = leU16(b, o + 10)
        val crc = leU32(b, o + 16)
        var comp = leU32(b, o + 20)
        var size = leU32(b, o + 24)
        val nameLen = leU16(b, o + 28)
        val extraLen = leU16(b, o + 30)
        val cmtLen = leU16(b, o + 32)
        var lho = leU32(b, o + 42)
        // masked 32-bit fields resolve from the zip64 extra (tag 0x0001):
        // 8-byte values in fixed order — uncompressed, compressed, local
        // header offset — present exactly for the fields that are masked
        if (comp == 0xffffffffL || size == 0xffffffffL || lho == 0xffffffffL) {
          var p = o + 46 + nameLen
          val pe = p + extraLen
          var found = false
          while (p + 4 <= pe && !found) {
            val tag = leU16(b, p)
            val tlen = leU16(b, p + 2)
            if (p + 4 + tlen > pe) return None
            if (tag == 1) {
              var q = p + 4
              val qe = p + 4 + tlen
              if (size == 0xffffffffL) {
                if (q + 8 > qe) return None; size = leU64(b, q); q += 8
              }
              if (comp == 0xffffffffL) {
                if (q + 8 > qe) return None; comp = leU64(b, q); q += 8
              }
              if (lho == 0xffffffffL) {
                if (q + 8 > qe) return None; lho = leU64(b, q); q += 8
              }
              found = true
            }
            p += 4 + tlen
          }
          if (!found) return None // masked field with no zip64 extra
          if (comp < 0 || size < 0 || lho < 0) return None
        }
        if ((flags & 0x1) != 0) return None // encrypted
        if (size > (64L << 20)) return None // zip-bomb declared size
        // the WHOLE entry (name + extra + comment) must stay inside the
        // declared central directory — an over-declared final entry is
        // as malformed as a truncated one
        if (o + 46 + nameLen + extraLen + cmtLen > cdOff + cdSize) return None
        // IBM437 (the zip default) lives in the OPTIONAL jdk.charsets
        // module — fall back to ISO-8859-1 on minimal runtimes rather
        // than rejecting every non-UTF8-flagged archive wholesale
        val cs =
          if ((flags & 0x800) != 0) java.nio.charset.StandardCharsets.UTF_8
          else if (java.nio.charset.Charset.isSupported("IBM437"))
            java.nio.charset.Charset.forName("IBM437")
          else java.nio.charset.StandardCharsets.ISO_8859_1
        val name = new String(b, o + 46, nameLen, cs)
        // member data position resolves through the LOCAL header — its
        // own name/extra lengths, which may differ from the central copy
        if (lho + 30 > b.length || leU32(b, lho.toInt) != 0x04034b50L)
          return None
        val dataOff = lho + 30 + leU16(b, lho.toInt + 26) + leU16(b, lho.toInt + 28)
        if (dataOff + comp > b.length) return None
        val raw = java.util.Arrays.copyOfRange(b, dataOff.toInt,
          (dataOff + comp).toInt)
        val data = method match {
          case 0 =>
            if (comp != size) return None
            raw
          case 8 =>
            val inf = new java.util.zip.Inflater(true) // raw deflate
            try {
              inf.setInput(raw)
              val buf = new Array[Byte](size.toInt)
              var got = 0
              while (got < size && !inf.finished()) {
                val k = inf.inflate(buf, got, size.toInt - got)
                if (k == 0 && inf.needsInput()) return None // truncated
                got += k
              }
              // output must match the declared size EXACTLY — shorter is
              // truncation, more pending output is a lying header
              if (got != size || inf.inflate(new Array[Byte](1)) != 0)
                return None
              buf
            } finally inf.end()
          case _ => return None // implode/bzip2/lzma/... out of envelope
        }
        val c = new java.util.zip.CRC32
        c.update(data)
        if (c.getValue != crc) return None
        out += ZipMember(name, method, comp, size, crc, data)
        o += 46 + nameLen + extraLen + cmtLen
        e += 1
      }
      // the walk must consume EXACTLY the declared central directory —
      // ending short (cdSize over-declared) is the same self-consistency
      // failure as any other mismatched length field
      if (o != cdOff + cdSize) return None
      Some(out.result())
    } catch { case _: Exception => None }
  }

  /** Fixture writer: local headers + data, central directory, EOCD.
    * Fixed DOS timestamp (repo no-RNG/no-clock rule); `deflate = true`
    * members compress with raw deflate at default level. Member names
    * are written as UTF-8 with the language flag set.
    */
  def makeZip(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def deflateRaw(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(data); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end()
      bo.toByteArray
    }
    val metas = entries.map { case (name, data, defl) =>
      val nameB = name.getBytes("UTF-8")
      val comp = if (defl) deflateRaw(data) else data
      val c = new java.util.zip.CRC32
      c.update(data)
      val lho = out.size()
      le32(0x04034b50L); le16(20); le16(0x800); le16(if (defl) 8 else 0)
      le16(0x6000); le16(0x5a21) // fixed DOS time/date
      le32(c.getValue); le32(comp.length); le32(data.length)
      le16(nameB.length); le16(0)
      out.write(nameB); out.write(comp)
      (nameB, defl, comp.length, data.length, c.getValue, lho)
    }
    val cdOff = out.size()
    metas.foreach { case (nameB, defl, comp, size, crc, lho) =>
      le32(0x02014b50L); le16(20); le16(20); le16(0x800)
      le16(if (defl) 8 else 0); le16(0x6000); le16(0x5a21)
      le32(crc); le32(comp); le32(size)
      le16(nameB.length); le16(0); le16(0); le16(0); le16(0)
      le32(0); le32(lho)
      out.write(nameB)
    }
    val cdSize = out.size() - cdOff
    le32(0x06054b50L); le16(0); le16(0)
    le16(entries.length); le16(entries.length)
    le32(cdSize); le32(cdOff); le16(0)
    out.toByteArray
  }

  /** Fixture writer: the same archive content in zip64 FRAMING — central
    * entries mask compressed/uncompressed/offset behind 0xFFFFFFFF with
    * the real values in a 0x0001 extra field, and the EOCD masks entry
    * count and directory size/offset behind an EOCD64 record + locator.
    * Members stay small (the 64 MiB cap is a content bound, zip64 a
    * FRAMING bound — >4 GiB archives routinely hold small members);
    * local headers keep real 32-bit sizes, which is legal — the central
    * directory is authoritative.
    */
  def makeZip64(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def le64(v: Long): Unit = { le32(v & 0xffffffffL); le32((v >>> 32) & 0xffffffffL) }
    def deflateRaw(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(data); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end()
      bo.toByteArray
    }
    val metas = entries.map { case (name, data, defl) =>
      val nameB = name.getBytes("UTF-8")
      val comp = if (defl) deflateRaw(data) else data
      val c = new java.util.zip.CRC32
      c.update(data)
      val lho = out.size()
      le32(0x04034b50L); le16(45); le16(0x800); le16(if (defl) 8 else 0)
      le16(0x6000); le16(0x5a21)
      le32(c.getValue); le32(comp.length); le32(data.length)
      le16(nameB.length); le16(0)
      out.write(nameB); out.write(comp)
      (nameB, defl, comp.length, data.length, c.getValue, lho)
    }
    val cdOff = out.size()
    metas.foreach { case (nameB, defl, comp, size, crc, lho) =>
      le32(0x02014b50L); le16(45); le16(45); le16(0x800)
      le16(if (defl) 8 else 0); le16(0x6000); le16(0x5a21)
      le32(crc); le32(0xffffffffL); le32(0xffffffffL) // masked comp/size
      le16(nameB.length); le16(4 + 24); le16(0); le16(0); le16(0)
      le32(0); le32(0xffffffffL) // masked local-header offset
      out.write(nameB)
      // zip64 extra: uncompressed, compressed, offset (the masked order)
      le16(1); le16(24); le64(size); le64(comp); le64(lho)
    }
    val cdSize = out.size() - cdOff
    val e64 = out.size()
    le32(0x06064b50L); le64(44) // EOCD64 record, fixed-part size
    le16(45); le16(45); le32(0); le32(0)
    le64(entries.length); le64(entries.length)
    le64(cdSize); le64(cdOff)
    le32(0x07064b50L); le32(0); le64(e64); le32(1) // locator
    le32(0x06054b50L); le16(0); le16(0)
    le16(0xffff); le16(0xffff) // masked entry counts
    le32(0xffffffffL); le32(0xffffffffL); le16(0) // masked size/offset
    out.toByteArray
  }
}
