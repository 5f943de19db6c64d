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
  def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(nameB.length <= 100, s"tar member name too long: $name")
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    System.arraycopy(octal(0x1a4, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime 0: reproducible
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces while summing
    h(156) = '0' // typeflag: regular file
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

  /** Walk one tar's bytes; stops at the end-of-archive zero block or the
    * first header that fails magic/checksum validation (members already
    * parsed survive — envelope discipline).
    */
  def walkTar(data: Array[Byte]): Vector[(String, Long, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Long, Array[Byte])]
    var off = 0
    var ok = true
    while (ok && off + Block <= data.length) {
      val h = java.util.Arrays.copyOfRange(data, off, off + Block)
      if (h.forall(_ == 0)) { ok = false } // end-of-archive
      else if (!(h(257) == 'u' && h(258) == 's' && h(259) == 't' &&
                 h(260) == 'a' && h(261) == 'r') || !checksumOk(h)) { ok = false }
      else parseOctal(h, 124, 12) match {
        case None => ok = false
        case Some(size) =>
          var n = 0
          while (n < 100 && h(n) != 0) n += 1
          val name = new String(h, 0, n, java.nio.charset.StandardCharsets.US_ASCII)
          val cStart = off + Block
          if (cStart + size > data.length) { ok = false }
          else {
            out += ((name, size,
              java.util.Arrays.copyOfRange(data, cStart, cStart + size.toInt)))
            val padded = ((size + Block - 1) / Block) * Block
            off = cStart + padded.toInt
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
