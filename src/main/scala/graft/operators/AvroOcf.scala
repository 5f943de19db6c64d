package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro Object Container File ingest — the row-oriented interchange
  * format data-platform exports actually ship (Kafka archive dumps,
  * warehouse unloads, event-log drops publish `.avro`). Spark's
  * optional `spark-avro` module is not on this runtime, so this is a
  * from-scratch implementation of the public Avro 1.x specification
  * (container format + binary encoding): the `Obj\1` header, the
  * metadata map, 16-byte sync markers verified per block, zigzag
  * varints, and a schema-driven datum decoder covering the FULL type
  * system — records (nested, named-type references, recursion
  * depth-capped), enums, arrays and maps in both positive-count and
  * negative-count/size block forms, unions, fixed, and all eight
  * primitives.
  *
  * Block codecs: `null`, `deflate` (raw RFC 1951 via the JDK Inflater
  * — the zstd-jni precedent: the runtime carries the codec),
  * `snappy` (snappy-java, ON the Spark classpath as the shuffle
  * codec; Avro appends a 4-byte big-endian CRC32 of the UNCOMPRESSED
  * data which is verified, not skipped), and `zstandard` (zstd-jni,
  * window-descriptor limit enforced at libzstd's own 2^27 streaming
  * bound — the ZstdShards lesson). Unknown codecs reject loudly.
  *
  * Reject-don't-guess: every varint bounds-checks, every declared
  * length/count guards BEFORE allocation against a 64 MiB envelope, a
  * block's datums must consume its bytes EXACTLY, each block's sync
  * marker must equal the header's, truncation and trailing garbage
  * reject the file, union/enum indexes must be in range, schema JSON
  * parses with a strict recursive-descent parser (no Jackson
  * leniency), and unresolvable named-type references reject.
  *
  * `AvroOcfSpec` proves the decoder against the REFERENCE
  * implementation: files written by `org.apache.avro`'s own
  * DataFileWriter (bundled with Spark) across all four codecs and a
  * type-system-wide schema read back value-exact.
  *
  * Shape at 100 TB: a container file is the natural split unit —
  * per-file parallelism, scan-local decode, zero shuffle. (A
  * production variant splits WITHIN a file on sync markers — the
  * format is designed for it — which would matter for multi-GB
  * single files; per-file parallelism is the right grain for shard
  * corpora.)
  */
object AvroOcf {

  private val MaxLen = 64 << 20
  private val MaxDepth = 64

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---------------- strict JSON (schema document) ----------------

  sealed trait Json
  final case class JStr(s: String) extends Json
  final case class JNum(d: Double) extends Json
  final case class JBool(b: Boolean) extends Json
  case object JNull extends Json
  final case class JArr(items: Vector[Json]) extends Json
  final case class JObj(fields: Vector[(String, Json)]) extends Json {
    def get(k: String): Option[Json] = fields.collectFirst { case (`k`, v) => v }
  }

  private final class JsonP(s: String) {
    private var i = 0
    private var depth = 0
    private def err(): Nothing = throw Malformed
    private def ws(): Unit =
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def eat(c: Char): Unit = {
      ws(); if (i < s.length && s.charAt(i) == c) i += 1 else err()
    }
    private def peek(): Char = {
      ws(); if (i < s.length) s.charAt(i) else err()
    }
    def value(): Json = {
      depth += 1
      if (depth > 128) err()
      val v = peek() match {
        case '{' =>
          eat('{')
          val fs = Vector.newBuilder[(String, Json)]
          if (peek() != '}') {
            var more = true
            while (more) {
              val k = string(); eat(':'); fs += k -> value()
              if (peek() == ',') { eat(',') } else more = false
            }
          }
          eat('}'); JObj(fs.result())
        case '[' =>
          eat('[')
          val it = Vector.newBuilder[Json]
          if (peek() != ']') {
            var more = true
            while (more) {
              it += value()
              if (peek() == ',') { eat(',') } else more = false
            }
          }
          eat(']'); JArr(it.result())
        case '"' => JStr(string())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => JNum(number())
      }
      depth -= 1
      v
    }
    private def lit(l: String): Unit = {
      ws()
      if (i + l.length > s.length || s.substring(i, i + l.length) != l) err()
      i += l.length
    }
    private def string(): String = {
      eat('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) err()
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) err()
              val hex = s.substring(i + 1, i + 5)
              // non-hex digits must reject through err() (decoder
              // envelope only catches Malformed), not NumberFormatException
              if (!hex.forall(h => (h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') || (h >= 'A' && h <= 'F'))) err()
              sb.append(Integer.parseInt(hex, 16).toChar)
              i += 4
            case _ => err()
          }
        } else sb.append(c)
        i += 1
      }
      if (i >= s.length) err()
      i += 1
      sb.toString
    }
    private def number(): Double = {
      ws()
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && "0123456789.eE+-".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) err()
      try s.substring(start, i).toDouble catch { case _: Exception => err() }
    }
    def parseAll(): Json = {
      val v = value(); ws(); if (i != s.length) err(); v
    }
  }

  // ---------------- schema model ----------------

  sealed trait Schema
  case object SNull extends Schema
  case object SBool extends Schema
  case object SInt extends Schema
  case object SLong extends Schema
  case object SFloat extends Schema
  case object SDouble extends Schema
  case object SBytes extends Schema
  case object SString extends Schema
  final case class SRecord(name: String, fields: Vector[(String, Schema)]) extends Schema
  final case class SEnum(name: String, symbols: Vector[String]) extends Schema
  final case class SArray(items: Schema) extends Schema
  final case class SMap(values: Schema) extends Schema
  final case class SUnion(branches: Vector[Schema]) extends Schema
  final case class SFixed(name: String, size: Int) extends Schema
  /** A forward/self reference to a named type (resolved lazily so
    * recursive schemas terminate).
    */
  final case class SRef(name: String, env: java.util.HashMap[String, Schema]) extends Schema

  /** Parse a schema document. Named types register in `env` under
    * their FULLNAME (namespace honored); later references resolve by
    * fullname or, per the spec's shortcut usage, bare name.
    */
  def parseSchema(json: String): Schema = {
    val env = new java.util.HashMap[String, Schema]()
    def walk(j: Json, ns: String): Schema = j match {
      case JStr(s) => s match {
        case "null" => SNull
        case "boolean" => SBool
        case "int" => SInt
        case "long" => SLong
        case "float" => SFloat
        case "double" => SDouble
        case "bytes" => SBytes
        case "string" => SString
        case name =>
          val full = if (name.contains('.') || ns.isEmpty) name else s"$ns.$name"
          if (env.containsKey(full) || env.containsKey(name)) SRef(
            if (env.containsKey(full)) full else name, env)
          else throw Malformed // unknown named type
      }
      case JArr(items) =>
        if (items.isEmpty) throw Malformed
        SUnion(items.map(walk(_, ns)))
      case o: JObj =>
        val t = o.get("type").getOrElse(throw Malformed)
        t match {
          case JStr("record") | JStr("error") =>
            val name = o.get("name") match {
              case Some(JStr(n)) => n
              case _ => throw Malformed
            }
            val ns2 = o.get("namespace") match {
              case Some(JStr(n)) => n
              case _ => ns
            }
            val full = if (name.contains('.')) name
              else if (ns2.isEmpty) name else s"$ns2.$name"
            // register BEFORE fields so self-references resolve
            val ref = SRef(full, env)
            env.put(full, ref) // placeholder; replaced below
            val fields = o.get("fields") match {
              case Some(JArr(fs)) => fs.map {
                case fo: JObj =>
                  val fn = fo.get("name") match {
                    case Some(JStr(n)) => n
                    case _ => throw Malformed
                  }
                  fn -> walk(fo.get("type").getOrElse(throw Malformed), ns2)
                case _ => throw Malformed
              }
              case _ => throw Malformed
            }
            val rec = SRecord(full, fields)
            env.put(full, rec)
            rec
          case JStr("enum") =>
            val name = o.get("name") match {
              case Some(JStr(n)) => n
              case _ => throw Malformed
            }
            val full = if (name.contains('.') || ns.isEmpty) name else s"$ns.$name"
            val syms = o.get("symbols") match {
              case Some(JArr(ss)) => ss.map {
                case JStr(s) => s
                case _ => throw Malformed
              }
              case _ => throw Malformed
            }
            val e = SEnum(full, syms)
            env.put(full, e)
            e
          case JStr("fixed") =>
            val name = o.get("name") match {
              case Some(JStr(n)) => n
              case _ => throw Malformed
            }
            val full = if (name.contains('.') || ns.isEmpty) name else s"$ns.$name"
            val size = o.get("size") match {
              case Some(JNum(d)) if d >= 0 && d <= MaxLen && d == d.floor => d.toInt
              case _ => throw Malformed
            }
            val f = SFixed(full, size)
            env.put(full, f)
            f
          case JStr("array") =>
            SArray(walk(o.get("items").getOrElse(throw Malformed), ns))
          case JStr("map") =>
            SMap(walk(o.get("values").getOrElse(throw Malformed), ns))
          case inner => walk(inner, ns) // {"type":"int","logicalType":...}
        }
      case _ => throw Malformed
    }
    walk(new JsonP(json).parseAll(), "")
  }

  private def deref(s: Schema): Schema = s match {
    case SRef(n, env) =>
      val r = env.get(n)
      if (r == null || r.isInstanceOf[SRef]) throw Malformed
      r
    case other => other
  }

  // ---------------- decoded value model ----------------

  sealed trait AvValue
  case object VNull extends AvValue
  final case class VBool(b: Boolean) extends AvValue
  final case class VInt(v: Int) extends AvValue
  final case class VLong(v: Long) extends AvValue
  final case class VFloat(v: Float) extends AvValue
  final case class VDouble(v: Double) extends AvValue
  final case class VBytes(b: Vector[Byte]) extends AvValue
  final case class VString(s: String) extends AvValue
  final case class VRecord(fields: Vector[(String, AvValue)]) extends AvValue {
    def apply(k: String): AvValue =
      fields.collectFirst { case (`k`, v) => v }.getOrElse(VNull)
  }
  final case class VEnum(symbol: String) extends AvValue
  final case class VArray(items: Vector[AvValue]) extends AvValue
  final case class VMap(entries: Vector[(String, AvValue)]) extends AvValue

  // ---------------- binary decoder ----------------

  private final class Dec(b: Array[Byte], var p: Int, val end: Int) {
    def varlong(): Long = {
      var shift = 0
      var acc = 0L
      while (shift < 70) {
        if (p >= end) throw Malformed
        val x = b(p); p += 1
        acc |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) {
          return (acc >>> 1) ^ -(acc & 1) // zigzag
        }
        shift += 7
      }
      throw Malformed
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || n > MaxLen || p + n > end) throw Malformed
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out
    }
    def checkedLen(): Int = {
      val n = varlong()
      if (n < 0 || n > MaxLen) throw Malformed
      n.toInt
    }
    def u8(): Int = { if (p >= end) throw Malformed; val v = b(p) & 0xff; p += 1; v }
    def atEnd: Boolean = p == end
  }

  private def decodeDatum(d: Dec, schema: Schema, depth: Int): AvValue = {
    if (depth > MaxDepth) throw Malformed
    deref(schema) match {
      case SNull => VNull
      case SBool => d.u8() match {
        case 0 => VBool(false)
        case 1 => VBool(true)
        case _ => throw Malformed
      }
      case SInt =>
        val v = d.varlong()
        if (v < Int.MinValue || v > Int.MaxValue) throw Malformed
        VInt(v.toInt)
      case SLong => VLong(d.varlong())
      case SFloat =>
        val bs = d.bytes(4)
        VFloat(java.lang.Float.intBitsToFloat(
          (bs(0) & 0xff) | ((bs(1) & 0xff) << 8) | ((bs(2) & 0xff) << 16) |
            ((bs(3) & 0xff) << 24)))
      case SDouble =>
        val bs = d.bytes(8)
        var bits = 0L
        var i = 7
        while (i >= 0) { bits = (bits << 8) | (bs(i) & 0xffL); i -= 1 }
        VDouble(java.lang.Double.longBitsToDouble(bits))
      case SBytes => VBytes(d.bytes(d.checkedLen()).toVector)
      case SString => VString(new String(d.bytes(d.checkedLen()),
        java.nio.charset.StandardCharsets.UTF_8))
      case SRecord(_, fields) =>
        VRecord(fields.map { case (n, t) => n -> decodeDatum(d, t, depth + 1) })
      case SEnum(_, symbols) =>
        val i = d.varlong()
        if (i < 0 || i >= symbols.length) throw Malformed
        VEnum(symbols(i.toInt))
      case SFixed(_, size) => VBytes(d.bytes(size).toVector)
      case SUnion(branches) =>
        val i = d.varlong()
        if (i < 0 || i >= branches.length) throw Malformed
        decodeDatum(d, branches(i.toInt), depth + 1)
      case SArray(items) =>
        val out = Vector.newBuilder[AvValue]
        var n = d.varlong()
        var total = 0L
        while (n != 0) {
          if (n == Long.MinValue) throw Malformed // -n would stay negative
          if (n < 0) { n = -n; d.checkedLen() } // block byte size: validated, unused
          if (n > MaxLen) throw Malformed
          total += n
          if (total > MaxLen) throw Malformed
          var i = 0L
          while (i < n) { out += decodeDatum(d, items, depth + 1); i += 1 }
          n = d.varlong()
        }
        VArray(out.result())
      case SMap(values) =>
        val out = Vector.newBuilder[(String, AvValue)]
        var n = d.varlong()
        var total = 0L
        while (n != 0) {
          if (n == Long.MinValue) throw Malformed
          if (n < 0) { n = -n; d.checkedLen() }
          if (n > MaxLen) throw Malformed
          total += n
          if (total > MaxLen) throw Malformed
          var i = 0L
          while (i < n) {
            val k = new String(d.bytes(d.checkedLen()),
              java.nio.charset.StandardCharsets.UTF_8)
            out += k -> decodeDatum(d, values, depth + 1)
            i += 1
          }
          n = d.varlong()
        }
        VMap(out.result())
      case _: SRef => throw Malformed // deref already resolved or threw
    }
  }

  /** Decode exactly ONE datum from raw binary-encoding bytes
    * (exact-consume) — the hook the spec uses to pin encoding forms
    * the reference writer doesn't emit (negative-count blocks).
    */
  def decodeSingle(bytes: Array[Byte], schema: Schema): Option[AvValue] =
    try {
      val d = new Dec(bytes, 0, bytes.length)
      val v = decodeDatum(d, schema, 0)
      if (!d.atEnd) throw Malformed
      Some(v)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  // ---------------- block codecs ----------------

  private def inflateRaw(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 20))
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) throw Malformed // truncated/needs-dict
        out.write(buf, 0, n)
        if (out.size() > MaxLen) throw Malformed // bomb cap
      }
      if (inf.getRemaining != 0) throw Malformed // trailing garbage in block
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => throw Malformed
    } finally inf.end()
  }

  private def unsnappy(b: Array[Byte]): Array[Byte] = {
    // Avro's snappy codec: snappy body + 4-byte BIG-ENDIAN CRC32 of the
    // UNCOMPRESSED bytes — verified, never skipped
    if (b.length < 4) throw Malformed
    val body = java.util.Arrays.copyOfRange(b, 0, b.length - 4)
    val out = try {
      if (!org.xerial.snappy.Snappy.isValidCompressedBuffer(body)) throw Malformed
      if (org.xerial.snappy.Snappy.uncompressedLength(body) > MaxLen) throw Malformed
      org.xerial.snappy.Snappy.uncompress(body)
    } catch { case _: java.io.IOException => throw Malformed }
    val crc = new java.util.zip.CRC32
    crc.update(out)
    val want = ((b(b.length - 4) & 0xffL) << 24) | ((b(b.length - 3) & 0xffL) << 16) |
      ((b(b.length - 2) & 0xffL) << 8) | (b(b.length - 1) & 0xffL)
    if (crc.getValue != want) throw Malformed
    out
  }

  private def unzstd(b: Array[Byte]): Array[Byte] = {
    try {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(b))
      // window-descriptor limit enforced (the ZstdShards lesson)
      in.setLongMax(27)
      val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 20))
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > MaxLen) throw Malformed
        n = in.read(buf)
      }
      in.close()
      out.toByteArray
    } catch { case _: java.io.IOException => throw Malformed }
  }

  // ---------------- container walk ----------------

  final case class OcfFile(schema: Schema, schemaJson: String, codec: String,
      records: Vector[AvValue])

  /** Strict whole-file decode; None on ANY container/encoding/schema
    * violation.
    */
  def decode(bytes: Array[Byte]): Option[OcfFile] = {
    try {
      if (bytes == null || bytes.length < 4 + 16) throw Malformed
      if (bytes(0) != 'O' || bytes(1) != 'b' || bytes(2) != 'j' || bytes(3) != 1)
        throw Malformed
      val d = new Dec(bytes, 4, bytes.length)
      // file metadata: a map<bytes>
      var schemaJson: String = null
      var codec = "null"
      var n = d.varlong()
      while (n != 0) {
        if (n == Long.MinValue) throw Malformed
        if (n < 0) { n = -n; d.checkedLen() }
        if (n > 4096) throw Malformed
        var i = 0L
        while (i < n) {
          val k = new String(d.bytes(d.checkedLen()),
            java.nio.charset.StandardCharsets.UTF_8)
          val v = d.bytes(d.checkedLen())
          if (k == "avro.schema") schemaJson =
            new String(v, java.nio.charset.StandardCharsets.UTF_8)
          else if (k == "avro.codec") codec =
            new String(v, java.nio.charset.StandardCharsets.UTF_8)
          i += 1
        }
        n = d.varlong()
      }
      if (schemaJson == null) throw Malformed
      val schema = parseSchema(schemaJson)
      val sync = d.bytes(16)
      val records = Vector.newBuilder[AvValue]
      var totalRecords = 0L
      while (!d.atEnd) {
        val count = d.varlong()
        if (count <= 0) throw Malformed
        totalRecords += count
        if (totalRecords > (1L << 24)) throw Malformed // bomb cap
        val size = d.checkedLen()
        val raw = d.bytes(size)
        val data = codec match {
          case "null" => raw
          case "deflate" => inflateRaw(raw)
          case "snappy" => unsnappy(raw)
          case "zstandard" => unzstd(raw)
          case _ => throw Malformed // unknown codec: reject, don't guess
        }
        val bd = new Dec(data, 0, data.length)
        var i = 0L
        while (i < count) { records += decodeDatum(bd, schema, 0); i += 1 }
        if (!bd.atEnd) throw Malformed // datums must consume the block EXACTLY
        if (!java.util.Arrays.equals(d.bytes(16), sync)) throw Malformed
      }
      Some(OcfFile(schema, schemaJson, codec, records.result()))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------- Spark surface ----------------

  val docSchema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("rec_idx", IntegerType),
    StructField("doc_id", LongType),
    StructField("body", StringType),
    StructField("stars", IntegerType),
    StructField("esum", DoubleType)))

  /** binaryFile-shaped relation of `.avro` files → typed rows of the
    * fixture's Doc record (long doc_id, string body, union{null,int}
    * stars, array<double> emb folded to its sum). A file with ANY
    * container violation — or a record that doesn't match the shape —
    * contributes zero rows.
    */
  def parseDocs(raw: DataFrame): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { it =>
      it.flatMap { r =>
        val fname = r.getString(0)
        val decoded = decode(r.getAs[Array[Byte]](1)).flatMap { f =>
          val out = Vector.newBuilder[Row]
          var ok = true
          f.records.zipWithIndex.foreach {
            case (rec: VRecord, i) =>
              (rec("doc_id"), rec("body"), rec("stars"), rec("emb")) match {
                case (VLong(id), VString(body), stars, VArray(emb)) =>
                  val starVal: Any = stars match {
                    case VInt(s) => s
                    case VNull => null
                    case _ => ok = false; null
                  }
                  var esum = 0.0
                  emb.foreach {
                    case VDouble(x) => esum += x
                    case _ => ok = false
                  }
                  out += Row(fname, i, id, body, starVal, esum)
                case _ => ok = false
              }
            case _ => ok = false
          }
          if (ok) Some(out.result()) else None
        }
        decoded.map(_.iterator).getOrElse(Iterator.empty)
      }
    }(RowEncoder.encoderFor(docSchema))
  }
}
