package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord shard read/write + a minimal `tf.Example` codec — the
  * training-data interchange format half the ecosystem's pipelines
  * emit and consume. A corpus engine that can't round-trip TFRecord
  * can't hand its output to (or take its input from) those stacks,
  * so this sits beside the WebDataset tar exporter ([[TarShards]]) as
  * a first-class sink/source pair.
  *
  * Framing (the public TensorFlow record format):
  * {{{
  *   uint64  length         (LE)
  *   uint32  masked_crc32c(length bytes)   (LE)
  *   byte    data[length]
  *   uint32  masked_crc32c(data)           (LE)
  * }}}
  * where `mask(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8` over
  * uint32. CRC32C (Castagnoli) comes from `java.util.zip.CRC32C` —
  * the JDK carries the codec natively (the Inflater precedent; the
  * spec's published check value is pinned in the spec suite).
  *
  * Read discipline (reject-don't-guess, like every decoder here):
  * both CRCs verify per record, a record must fit the 64 MiB
  * envelope BEFORE any allocation (a lying multi-GB length skips
  * nothing — the file rejects), truncation mid-record and trailing
  * garbage reject the whole file.
  *
  * The payload codec is a from-scratch minimal protobuf wire-format
  * implementation for `tf.Example` (bytes/float/int64 feature lists,
  * packed AND unpacked repeated forms, unknown fields SKIPPED — that
  * is the proto spec's required behavior, not leniency; malformed
  * varints / overrunning lengths / group wire-types reject). The
  * encoder emits features in sorted-key order so output is
  * deterministic byte-for-byte.
  *
  * Shape at 100 TB: write is repartition(nShards) + per-partition
  * streaming append (no driver materialization); read-back is
  * per-file parallel, scan-local, zero shuffle.
  */
object TfRecord {

  private val MaskDelta = 0xa282ead8
  private val MaxRecord = 64 << 20

  private def crc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    c.getValue.toInt
  }

  private def mask(crc: Int): Int =
    ((crc >>> 15) | (crc << 17)) + MaskDelta

  private def leU32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def leU64(b: Array[Byte], o: Int): Long =
    (leU32(b, o) & 0xffffffffL) | ((leU32(b, o + 4) & 0xffffffffL) << 32)

  private def putLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** All record payloads, CRC-verified; None on any framing
    * inconsistency (truncation, trailing bytes, lying length, bad
    * CRC). The length guard runs BEFORE allocation.
    */
  def records(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (b == null) return None
    val out = Vector.newBuilder[Array[Byte]]
    var p = 0
    while (p < b.length) {
      if (p + 12 > b.length) return None
      val len = leU64(b, p)
      if (len < 0 || len > MaxRecord) return None
      val n = len.toInt
      // long arithmetic: near the 2 GiB array limit p + n could wrap
      // an int bounds check negative and slip past it
      if (p + 12L + n + 4 > b.length) return None
      if (leU32(b, p + 8) != mask(crc32c(b, p, 8))) return None
      if (leU32(b, p + 12 + n) != mask(crc32c(b, p + 12, n))) return None
      out += java.util.Arrays.copyOfRange(b, p + 12, p + 12 + n)
      p += 12 + n + 4
    }
    Some(out.result())
  }

  /** One framed record, appended to `out`. */
  def writeRecord(out: java.io.ByteArrayOutputStream, data: Array[Byte]): Unit = {
    val lenBytes = new Array[Byte](8)
    var v = data.length.toLong
    var i = 0
    while (i < 8) { lenBytes(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
    out.write(lenBytes)
    putLe32(out, mask(crc32c(lenBytes, 0, 8)))
    out.write(data)
    putLe32(out, mask(crc32c(data, 0, data.length)))
  }

  def make(recs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach(writeRecord(out, _))
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // minimal tf.Example protobuf (wire format per the public spec):
  //   Example    { Features features = 1; }
  //   Features   { map<string, Feature> feature = 1; }
  //   Feature    { oneof: BytesList=1 | FloatList=2 | Int64List=3 }
  //   BytesList  { repeated bytes value = 1; }
  //   FloatList  { repeated float value = 1 [packed]; }
  //   Int64List  { repeated int64 value = 1 [packed]; }
  // ------------------------------------------------------------------

  sealed trait FeatureValue
  final case class BytesFeature(values: Seq[Array[Byte]]) extends FeatureValue
  final case class FloatFeature(values: Seq[Float]) extends FeatureValue
  final case class Int64Feature(values: Seq[Long]) extends FeatureValue

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def lenDelim(out: java.io.ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, body.length.toLong)
    out.write(body)
  }

  private def featureBytes(fv: FeatureValue): Array[Byte] = {
    val list = new java.io.ByteArrayOutputStream()
    val kind = fv match {
      case BytesFeature(vs) =>
        vs.foreach(v => lenDelim(list, 1, v)); 1
      case FloatFeature(vs) =>
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach(f => putLe32(packed, java.lang.Float.floatToRawIntBits(f)))
        lenDelim(list, 1, packed.toByteArray); 2
      case Int64Feature(vs) =>
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        lenDelim(list, 1, packed.toByteArray); 3
    }
    val feature = new java.io.ByteArrayOutputStream()
    lenDelim(feature, kind, list.toByteArray)
    feature.toByteArray
  }

  /** Deterministic encoder: features emitted in sorted-key order. */
  def encodeExample(features: Seq[(String, FeatureValue)]): Array[Byte] = {
    val fs = new java.io.ByteArrayOutputStream()
    features.sortBy(_._1).foreach { case (name, fv) =>
      val entry = new java.io.ByteArrayOutputStream()
      lenDelim(entry, 1, name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      lenDelim(entry, 2, featureBytes(fv))
      lenDelim(fs, 1, entry.toByteArray)
    }
    val ex = new java.io.ByteArrayOutputStream()
    lenDelim(ex, 1, fs.toByteArray)
    ex.toByteArray
  }

  // --- decoder: a tiny strict wire-format reader ---

  private final class Reader(b: Array[Byte], var p: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        if (p >= end) throw Malformed
        val x = b(p); p += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      throw Malformed
    }
    def slice(n: Int): Reader = {
      if (n < 0 || p + n > end) throw Malformed
      val r = new Reader(b, p, p + n); p += n; r
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || p + n > end) throw Malformed
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out
    }
    def fixed32(): Int = {
      if (p + 4 > end) throw Malformed
      val v = leU32(b, p); p += 4; v
    }
    def fixed64(): Long = {
      if (p + 8 > end) throw Malformed
      val v = leU64(b, p); p += 8; v
    }
    def hasMore: Boolean = p < end
    /** Skip an unknown field — REQUIRED proto behavior, not leniency.
      * Deprecated group wire types (3/4) reject.
      */
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => fixed64(); ()
      case 2 => val n = varint(); bytes(checkedInt(n)); ()
      case 5 => fixed32(); ()
      case _ => throw Malformed
    }
  }
  private object Malformed extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  private def checkedInt(n: Long): Int =
    if (n < 0 || n > MaxRecord) throw Malformed else n.toInt

  private def decodeFeature(r: Reader): FeatureValue = {
    var out: FeatureValue = null
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (field, wt) match {
        case (1, 2) => // BytesList
          val vs = Seq.newBuilder[Array[Byte]]
          val lr = r.slice(checkedInt(r.varint()))
          while (lr.hasMore) {
            val t = lr.varint()
            if (t == 0x0a) vs += lr.bytes(checkedInt(lr.varint()))
            else lr.skip((t & 7).toInt)
          }
          out = BytesFeature(vs.result())
        case (2, 2) => // FloatList: packed (field 1, wt 2) or unpacked (wt 5)
          val vs = Seq.newBuilder[Float]
          val lr = r.slice(checkedInt(r.varint()))
          while (lr.hasMore) {
            val t = lr.varint()
            if (t == 0x0a) {
              val pr = lr.slice(checkedInt(lr.varint()))
              while (pr.hasMore) vs += java.lang.Float.intBitsToFloat(pr.fixed32())
            } else if (t == 0x0d) vs += java.lang.Float.intBitsToFloat(lr.fixed32())
            else lr.skip((t & 7).toInt)
          }
          out = FloatFeature(vs.result())
        case (3, 2) => // Int64List: packed (field 1, wt 2) or unpacked (wt 0)
          val vs = Seq.newBuilder[Long]
          val lr = r.slice(checkedInt(r.varint()))
          while (lr.hasMore) {
            val t = lr.varint()
            if (t == 0x0a) {
              val pr = lr.slice(checkedInt(lr.varint()))
              while (pr.hasMore) vs += pr.varint()
            } else if (t == 0x08) vs += lr.varint()
            else lr.skip((t & 7).toInt)
          }
          out = Int64Feature(vs.result())
        case _ => r.skip(wt)
      }
    }
    if (out == null) throw Malformed
    out
  }

  /** Feature map; None on any wire-format violation. */
  def decodeExample(b: Array[Byte]): Option[Map[String, FeatureValue]] = {
    try {
      val out = Map.newBuilder[String, FeatureValue]
      val r = new Reader(b, 0, b.length)
      while (r.hasMore) {
        val tag = r.varint()
        if (tag == 0x0a) { // features
          val fr = r.slice(checkedInt(r.varint()))
          while (fr.hasMore) {
            val ft = fr.varint()
            if (ft == 0x0a) { // one map entry
              val er = fr.slice(checkedInt(fr.varint()))
              var key: String = null
              var value: FeatureValue = null
              while (er.hasMore) {
                val et = er.varint()
                if (et == 0x0a)
                  key = new String(er.bytes(checkedInt(er.varint())),
                    java.nio.charset.StandardCharsets.UTF_8)
                else if (et == 0x12)
                  value = decodeFeature(er.slice(checkedInt(er.varint())))
                else er.skip((et & 7).toInt)
              }
              if (key == null || value == null) throw Malformed
              out += key -> value
            } else fr.skip((ft & 7).toInt)
          }
        } else r.skip((tag & 7).toInt)
      }
      Some(out.result())
    } catch { case Malformed => None }
  }

  // ------------------------------------------------------------------
  // Spark surface
  // ------------------------------------------------------------------

  val schema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("rec_idx", IntegerType),
    StructField("payload", BinaryType)))

  /** binaryFile-shaped relation → one row per framed record. A file
    * with any framing inconsistency contributes zero rows.
    */
  def parse(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        records(r.getAs[Array[Byte]](1)) match {
          case Some(rs) => rs.iterator.zipWithIndex.map { case (d, i) =>
            Row(fname, i, d)
          }
          case None => Iterator.empty
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  val docSchema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("rec_idx", IntegerType),
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Single-pass read of document shards: framing walk + tf.Example
    * decode, pulling the `doc_id` int64 and `text` bytes features.
    * Any record that fails to decode (or lacks the features) rejects
    * its whole FILE — a shard that half-reads is corrupt, not short.
    */
  def parseDocs(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val fname = r.getString(0)
        val decoded: Option[Vector[Row]] =
          records(r.getAs[Array[Byte]](1)).flatMap { rs =>
            val out = Vector.newBuilder[Row]
            var ok = true
            var i = 0
            while (ok && i < rs.length) {
              decodeExample(rs(i)).map(fs =>
                  (fs.get("doc_id"), fs.get("text"))) match {
                case Some((Some(Int64Feature(Seq(id))),
                    Some(BytesFeature(Seq(t))))) =>
                  out += Row(fname, i, id,
                    new String(t, java.nio.charset.StandardCharsets.UTF_8))
                case _ => ok = false
              }
              i += 1
            }
            if (ok) Some(out.result()) else None
          }
        decoded.map(_.iterator).getOrElse(Iterator.empty)
      }
    }(RowEncoder.encoderFor(docSchema))
  }

  /** Distributed shard writer: (doc_id, text) rows → `nShards`
    * TFRecord files of tf.Example records, streamed per partition
    * (the [[TarShards.writeShards]] pattern — no driver
    * materialization; a production variant rolls shards past a size
    * budget and targets object storage, framing unchanged).
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
        def close(): Unit = if (out != null) { out.close(); out = null }
        try {
          rows.foreach { r =>
            val shard = r.getLong(2)
            if (shard != cur) {
              close()
              cur = shard
              out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
                s"$outDir/shard-$shard.tfrecord"))
            }
            val ex = encodeExample(Seq(
              "doc_id" -> Int64Feature(Seq(r.getLong(0))),
              "text" -> BytesFeature(Seq(r.getString(1)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)))))
            val buf = new java.io.ByteArrayOutputStream()
            writeRecord(buf, ex)
            out.write(buf.toByteArray)
          }
        } finally close()
      }
  }
}
