package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sharded POSIX-tar corpus export — the WebDataset-style container a
  * training job streams (one tar per shard, members read sequentially by
  * the data loader; public format: POSIX.1-1988 ustar, and the WebDataset
  * convention of `<key>.<ext>` member names). Writer and reader are both
  * pure JVM — no external tooling — and the reader validates the ustar
  * magic and header checksum before trusting a member (the e12 envelope
  * rule: validate, don't trust).
  *
  * Shape at 100 TB:
  *  - shard assignment is a DETERMINISTIC function of the record key
  *    (`doc_id % nShards`), so the layout is reproducible and a re-run
  *    overwrites byte-identical shards — no sampled range boundaries;
  *  - the writer is `repartition(shard) + sortWithinPartitions +
  *    foreachPartition`: one shuffle to co-locate a shard's members, then
  *    each task STREAMS members to its shard files one at a time — memory
  *    is bounded by a single member, never a shard;
  *  - a production variant adds a cumulative-size split (roll to
  *    `shard-N.{k}` past ~1 GiB) and writes straight to object storage;
  *    the framing below is unchanged by either.
  *
  * Determinism note: tar headers carry an mtime; a wall-clock stamp would
  * make output bytes run-dependent, so members are written with mtime 0
  * (the reproducible-archive convention).
  */
object TarShards {

  private val Block = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (ustar numeric field form)
    val s = java.lang.Long.toOctalString(v)
    val b = new Array[Byte](width)
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { b(i) = '0'; i += 1 }
    s.foreach { c => b(i) = c.toByte; i += 1 }
    b(width - 1) = 0
    b
  }

  /** One ustar header block for a regular file, mtime 0, mode 0644. */
  def header(name: String, size: Long): Array[Byte] =
    headerOf(name, size, '0'.toByte)

  private def headerOf(name: String, size: Long, typeflag: Byte,
      prefix: String = ""): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(nameB.length <= 100, s"tar member name too long: $name")
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    if (prefix.nonEmpty) {
      val pB = prefix.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      require(pB.length <= 155, s"tar prefix too long: $prefix")
      System.arraycopy(pB, 0, h, 345, pB.length)
    }
    System.arraycopy(octal(0x1a4, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime 0: reproducible
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces while summing
    h(156) = typeflag
    System.arraycopy("ustar".getBytes, 0, h, 257, 5) // magic + NUL at 262
    h(263) = '0'; h(264) = '0' // version "00"
    var sum = 0L
    var i = 0
    while (i < Block) { sum += (h(i) & 0xff); i += 1 }
    val ck = octal(sum, 7) // 6 digits + NUL, then a space (GNU/POSIX form)
    System.arraycopy(ck, 0, h, 148, 7)
    h(155) = ' '
    h
  }

  /** Verify the stored checksum against a recomputed one (chksum field
    * counted as spaces, per the format).
    */
  private def checksumOk(h: Array[Byte]): Boolean = {
    var sum = 0L
    var i = 0
    while (i < Block) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
      i += 1
    }
    parseOctal(h, 148, 8).contains(sum)
  }

  private def parseOctal(h: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = off
    var seen = false
    val end = off + len
    while (i < end && (h(i) == ' ') && !seen) i += 1 // leading spaces
    while (i < end && h(i) >= '0' && h(i) <= '7') { v = v * 8 + (h(i) - '0'); i += 1; seen = true }
    if (seen) Some(v) else None
  }

  /** Write `docs` (`doc_id` LONG, `text` STRING) as `nShards` tar files
    * under `outDir` (`shard-<k>.tar`), members named `<doc_id>.txt` in
    * doc_id order, shard = doc_id % nShards. Distributed streaming write:
    * each task walks its sorted partition once, rolling to a new tar
    * whenever the shard key changes (keys are contiguous after the sort).
    */
  def writeShards(docs: DataFrame, outDir: String, nShards: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    docs.select(col("doc_id"), col("text"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        var cur = -1L
        var out: java.io.OutputStream = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * Block)) // end-of-archive: two zero blocks
          out.close(); out = null
        }
        try {
          rows.foreach { r =>
            val shard = r.getLong(2)
            if (shard != cur) {
              close()
              cur = shard
              out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
                s"$outDir/shard-$shard.tar"))
            }
            val body = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            out.write(header(s"${r.getLong(0)}.txt", body.length.toLong))
            out.write(body)
            val pad = (Block - body.length % Block) % Block
            if (pad > 0) out.write(new Array[Byte](pad))
          }
        } finally close()
      }
  }

  val memberSchema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("name", StringType),
    StructField("size", LongType),
    StructField("content", BinaryType)))

  private def blockPad(body: Array[Byte]): Array[Byte] = {
    val pad = (Block - body.length % Block) % Block
    if (pad == 0) body else body ++ new Array[Byte](pad)
  }

  /** Fixture writer: one member framed the GNU way for a >100-char path —
    * a `././@LongLink` meta member (typeflag 'L') whose DATA is the full
    * NUL-terminated name, then the real header carrying the name
    * truncated to 100 bytes.
    */
  def gnuLongEntry(name: String, body: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    headerOf("././@LongLink", nameB.length.toLong, 'L'.toByte) ++ blockPad(nameB) ++
      headerOf(name.take(100), body.length.toLong, '0'.toByte) ++ blockPad(body)
  }

  /** Fixture writer: one member framed the PAX way (POSIX.1-2001) — an
    * extended header (typeflag 'x') carrying a `path` record
    * (`"<len> path=<name>\n"`, len counting its own decimal digits), then
    * the real header with the truncated name.
    */
  def paxEntry(name: String, body: Array[Byte]): Array[Byte] = {
    val base = s" path=$name\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // record length includes its own digits: iterate to the fixed point
    var len = base.length + 1
    while ((len.toString.length + base.length) != len)
      len = len.toString.length + base.length
    val rec = len.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ base
    headerOf("PaxHeader", rec.length.toLong, 'x'.toByte) ++ blockPad(rec) ++
      headerOf(name.take(100), body.length.toLong, '0'.toByte) ++ blockPad(body)
  }

  /** Fixture writer: one member using the ustar `prefix` field (offset
    * 345) for the leading path — the strict-POSIX long-path form; the
    * walk reassembles `prefix + "/" + name`.
    */
  def prefixEntry(prefix: String, name: String, body: Array[Byte]): Array[Byte] =
    headerOf(name, body.length.toLong, '0'.toByte, prefix) ++ blockPad(body)

  /** Fixture writer: a non-regular member (directory '5', symlink '2',
    * hardlink '1') — consumed by the walk, never emitted.
    */
  def nonRegularEntry(name: String, typeflag: Char): Array[Byte] =
    headerOf(name, 0L, typeflag.toByte)

  /** Parse a PAX extended-header body: a sequence of
    * `"<len> <key>=<value>\n"` records where `<len>` is the TOTAL record
    * length in decimal (its own digits included). Any framing
    * inconsistency — bad digits, missing space, length not landing on a
    * newline, no `=` — rejects the whole archive from this point, the
    * same strictness as every other length field.
    */
  private def parsePax(d: Array[Byte]): Option[Map[String, String]] = {
    val m = Map.newBuilder[String, String]
    var i = 0
    while (i < d.length) {
      var j = i
      var len = 0
      var digits = false
      while (j < d.length && d(j) >= '0' && d(j) <= '9') {
        len = len * 10 + (d(j) - '0'); j += 1; digits = true
        if (len > d.length) return None // unbounded length claim
      }
      if (!digits || j >= d.length || d(j) != ' ' ||
        i + len > d.length || len < (j - i) + 3 || d(i + len - 1) != '\n')
        return None
      val rec = new String(d, j + 1, i + len - 1 - (j + 1),
        java.nio.charset.StandardCharsets.UTF_8)
      val eq = rec.indexOf('=')
      if (eq < 0) return None
      m += rec.take(eq) -> rec.drop(eq + 1)
      i += len
    }
    Some(m.result())
  }

  /** Walk one tar's bytes; stops at the end-of-archive zero block or the
    * first header that fails magic/checksum validation (members already
    * parsed survive — envelope discipline).
    *
    * Long-name framings (VERDICT r10 item 3): GNU `@LongLink` (typeflag
    * 'L' — the data block carries the next member's full NUL-terminated
    * name), PAX extended headers (typeflag 'x' — `path` record overrides
    * the next member's name; 'g' globals are validated and consumed but
    * their overrides are NOT honored, as renaming every member from one
    * global record is exactly the confident-garbage the envelope
    * forbids), and the ustar `prefix` field (offset 345 — prepended with
    * '/'). Precedence per the formats: PAX `path` > GNU long name >
    * prefix+name. A PAX `size` override is out of envelope (it redefines
    * data framing) and rejects; non-regular members (directories,
    * links) are consumed but not emitted — a corpus reader yields file
    * bytes, not filesystem structure.
    */
  def walkTar(data: Array[Byte]): Vector[(String, Long, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Long, Array[Byte])]
    var off = 0
    var ok = true
    var pendingLong: Option[String] = None
    var pendingPax: Map[String, String] = Map.empty
    while (ok && off + Block <= data.length) {
      val h = java.util.Arrays.copyOfRange(data, off, off + Block)
      if (h.forall(_ == 0)) { ok = false } // end-of-archive
      else if (!(h(257) == 'u' && h(258) == 's' && h(259) == 't' &&
                 h(260) == 'a' && h(261) == 'r') || !checksumOk(h)) { ok = false }
      else parseOctal(h, 124, 12) match {
        case None => ok = false
        case Some(size) =>
          val cStart = off + Block
          if (cStart + size > data.length) { ok = false }
          else {
            val content =
              java.util.Arrays.copyOfRange(data, cStart, cStart + size.toInt)
            val next = cStart + (((size + Block - 1) / Block) * Block).toInt
            h(156).toChar match {
              case 'L' => // GNU long name for the NEXT member
                var e = content.length
                while (e > 0 && content(e - 1) == 0) e -= 1
                if (e == 0) ok = false
                else {
                  pendingLong = Some(new String(content, 0, e,
                    java.nio.charset.StandardCharsets.UTF_8))
                  off = next
                }
              case 'K' => off = next // GNU long LINKNAME: consumed; links are not emitted anyway
              case 'x' =>
                parsePax(content) match {
                  case Some(m) => pendingPax = m; off = next
                  case None => ok = false
                }
              case 'g' =>
                if (parsePax(content).isEmpty) ok = false else off = next
              case '0' | '\u0000' =>
                if (pendingPax.contains("size")) ok = false // out of envelope
                else {
                  val name = pendingPax.get("path").orElse(pendingLong)
                    .getOrElse {
                      var n = 0
                      while (n < 100 && h(n) != 0) n += 1
                      val base = new String(h, 0, n,
                        java.nio.charset.StandardCharsets.US_ASCII)
                      var p = 0
                      while (p < 155 && h(345 + p) != 0) p += 1
                      if (p == 0) base
                      else new String(h, 345, p,
                        java.nio.charset.StandardCharsets.US_ASCII) + "/" + base
                    }
                  out += ((name, size, content))
                  pendingLong = None; pendingPax = Map.empty
                  off = next
                }
              case '5' | '2' | '1' => // dir/symlink/hardlink: consumed, not emitted
                pendingLong = None; pendingPax = Map.empty
                off = next
              case _ => ok = false
            }
          }
      }
    }
    out.result()
  }

  /** Scan-local parse of a binaryFile-shaped relation of tar shards: one
    * row per member (`fname`, `name`, `size`, `content`). Per-file
    * parallel, zero shuffle.
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        walkTar(r.getAs[Array[Byte]](1)).iterator.map {
          case (name, size, content) => Row(fname, name, size, content)
        }
      }
    }(RowEncoder.encoderFor(memberSchema))
  }
}
