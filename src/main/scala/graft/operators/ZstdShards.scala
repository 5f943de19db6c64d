package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `.jsonl.zst` / `.txt.zst` shard ingest — the container modern bulk
  * corpora actually ship (RedPajama, Dolma, OSCAR, CC derivatives all
  * publish zstd-framed JSONL shards; RFC 8878 is to 2020s data drops
  * what gzip was to the 2010s). Decompression goes through zstd-jni,
  * which Spark itself ships on every executor's classpath (shuffle/
  * parquet codec) — the JDK-Inflater precedent from the PNG/WARC paths:
  * no new dependency, and no from-scratch re-implementation of a codec
  * the runtime already carries natively.
  *
  * Framing (RFC 8878 §3): a file is a CONCATENATION of frames — zstd
  * frames (magic 0xFD2FB528 LE) and skippable frames (magic
  * 0x184D2A5? LE, 4-byte LE length + opaque payload — the form seekable
  * indexes and archiver metadata ride in). The walk advances by
  * `Zstd.findFrameCompressedSize` (libzstd's own frame-boundary
  * arithmetic, exact for both frame kinds), decompresses zstd frames,
  * skips skippable ones, and must consume the file EXACTLY — trailing
  * garbage, a truncated final frame, or an unknown magic rejects the
  * whole file (the zip/tar exact-consume discipline: confident garbage
  * is worse than a loud drop). Frame boundaries are byte-level, NOT
  * line-level: a JSONL line may span two frames, so lines are split
  * only after frames concatenate.
  *
  * Bomb guard: zstd's max ratio is ~2^17:1, so a KB-sized hostile file
  * can declare TBs. Decompressed bytes accumulate against
  * [[MaxInflatedBytes]] DURING streaming (64 KiB steps) — the stts
  * lesson: guard the running total, not each declared unit — and a
  * file past the cap rejects before materializing.
  *
  * Shape at 100 TB: parallelism is per file (shards are the split
  * unit; frames are sequential within a shard), the walk is scan-local
  * `mapPartitions`, memory is one shard's inflated size bounded by the
  * cap, zero shuffle; everything downstream composes as projections.
  */
object ZstdShards {

  /** Per-file decompressed-size cap. Real shards run 100–500 MB
    * decompressed; 1 GiB passes every sane producer and stops declared
    * TBs cold.
    */
  val MaxInflatedBytes: Long = 1L << 30

  private val ZstdMagic = 0xfd2fb528
  private def isSkippable(magic: Int): Boolean =
    (magic & 0xfffffff0) == 0x184d2a50

  private def magicAt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Concatenated-frame decompression with exact-consume + cap
    * discipline; None on any malformation. `cap` is a test seam.
    */
  def inflate(data: Array[Byte],
      cap: Long = MaxInflatedBytes): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    try {
      while (off < data.length) {
        if (off + 4 > data.length) return None // partial magic
        val magic = magicAt(data, off)
        if (!isSkippable(magic) && magic != ZstdMagic) return None
        val fsz = com.github.luben.zstd.Zstd
          .findFrameCompressedSize(data, off)
        if (fsz <= 0 || off + fsz > data.length) return None // truncated
        if (magic == ZstdMagic) {
          val in = new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(data, off, fsz.toInt))
          // window-descriptor limit ENFORCED at 2^27 = 128 MiB (libzstd's
          // own streaming default; zstd-jni's wrapper defaults to
          // UNLIMITED — fuzzed and found, the CLI-interop spec pins it):
          // the descriptor drives libzstd's window allocation, so
          // honoring a larger declared window (`--long=31` producers)
          // would hand a hostile header a 2 GiB allocation per scan task
          // before the output cap ever sees a byte. Frames needing a
          // bigger window reject loudly — the same bound-vs-salvage
          // trade as the 64 MiB zip member cap.
          in.setLongMax(27)
          try {
            val tmp = new Array[Byte](65536)
            var n = in.read(tmp)
            while (n >= 0) {
              if (out.size().toLong + n > cap) return None // bomb guard
              out.write(tmp, 0, n)
              n = in.read(tmp)
            }
          } finally in.close()
        }
        off += fsz.toInt
      }
      Some(out.toByteArray)
    } catch {
      // IOException: corrupt frame body / checksum mismatch mid-stream;
      // ZstdException: findFrameCompressedSize on a truncated or
      // malformed frame header (zstd-jni surfaces libzstd error codes as
      // this RuntimeException, not as a negative return)
      case _: java.io.IOException => None
      case _: com.github.luben.zstd.ZstdException => None
    }
  }

  /** Inflated bytes → UTF-8 lines (LF-separated, trailing newline
    * optional — the JSONL convention).
    */
  def toLines(bytes: Array[Byte]): Vector[String] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (s.isEmpty) Vector.empty
    else {
      val ls = s.split("\n", -1).toVector
      if (ls.last.isEmpty) ls.init else ls
    }
  }

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("line_no", IntegerType),
    StructField("line", StringType)))

  /** Shared line-shard scaffold for every compressed-container reader
    * ([[parse]] here, [[Xz.parse]]): binaryFile rows → (fname, line_no,
    * line) through a per-file decode function that may dispatch on the
    * file name. One scaffold so the row shape and line convention
    * cannot drift between container families. A malformed file
    * contributes zero rows (envelope discipline).
    */
  def parseWith(raw: DataFrame,
      decode: (String, Array[Byte]) => Option[Array[Byte]]): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        decode(fname, r.getAs[Array[Byte]](1)) match {
          case Some(bytes) =>
            toLines(bytes).iterator.zipWithIndex.map {
              case (line, i) => Row(fname, i, line)
            }
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** binaryFile-shaped relation (`path`, `content`) of `.zst` shards →
    * one row per decompressed line.
    */
  def parse(raw: DataFrame): DataFrame =
    parseWith(raw, (_, b) => inflate(b))

  // ------------------------------------------------------------------
  // Fixture construction (the reverse direction, for driver oracles and
  // specs): content compresses through the same zstd-jni the reader
  // trusts, but FRAMING is laid out here — multi-frame splits at
  // arbitrary byte offsets (mid-line) and interleaved skippable frames,
  // so a reader that mishandles either drops whole shards.
  // ------------------------------------------------------------------

  /** One zstd frame over `bytes` — WITH the XXH64 content checksum
    * (`--no-check` producers exist in the wild and decode fine, but the
    * fixture carries the strongest self-verification the format offers,
    * so the corruption spec is deterministic: libzstd verifies the
    * checksum when present and the reader surfaces that as a reject).
    */
  def makeFrame(bytes: Array[Byte]): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try { ctx.setChecksum(true); ctx.setLevel(3); ctx.compress(bytes) }
    finally ctx.close()
  }

  /** A skippable frame (magic 0x184D2A50 + variant nibble) carrying
    * opaque payload.
    */
  def makeSkippable(payload: Array[Byte], variant: Int = 0): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0x184d2a50 | (variant & 0xf))
    b.putInt(payload.length)
    b.put(payload)
    b.array()
  }

  /** Shard = the UTF-8 lines, LF-joined with trailing LF, cut into
    * `nFrames` zstd frames at byte offsets that deliberately land
    * mid-line, with a skippable frame between each pair.
    */
  def makeShard(lines: Seq[String], nFrames: Int): Array[Byte] = {
    val payload = lines.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.max(1, math.min(nFrames, payload.length))
    val cut = payload.length / n
    val out = new java.io.ByteArrayOutputStream()
    (0 until n).foreach { i =>
      val from = i * cut
      val until = if (i == n - 1) payload.length else (i + 1) * cut
      if (i > 0)
        out.write(makeSkippable(Array.fill(4 + i)(0x5a.toByte), i))
      out.write(makeFrame(java.util.Arrays.copyOfRange(payload, from, until)))
    }
    out.toByteArray
  }
}
