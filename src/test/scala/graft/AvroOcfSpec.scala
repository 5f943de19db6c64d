package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AvroOcf
import graft.operators.AvroOcf._
import org.apache.avro.{Schema => ASchema}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.file.{CodecFactory, DataFileWriter}

/** Decoder proven against the REFERENCE implementation: every fixture
  * here is written by org.apache.avro's own DataFileWriter (the
  * library bundled with Spark).
  */
class AvroOcfSpec extends AnyFunSuite {

  private val docSchemaJson =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"body","type":"string"},
      |{"name":"stars","type":["null","int"]},
      |{"name":"emb","type":{"type":"array","items":"double"}}]}""".stripMargin

  private def writeDocs(codec: CodecFactory, n: Int,
      syncEvery: Int = 0): Array[Byte] = {
    val schema = new ASchema.Parser().parse(docSchemaJson)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec)
    w.create(schema, out)
    (1 to n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("doc_id", i.toLong)
      r.put("body", s"body-$i &<>")
      r.put("stars", if (i % 3 == 0) null else Integer.valueOf(i % 7))
      val emb = new java.util.ArrayList[java.lang.Double]()
      (0 until 4).foreach(j => emb.add(i * 0.5 + j))
      r.put("emb", emb)
      w.append(r)
      if (syncEvery > 0 && i % syncEvery == 0) w.sync()
    }
    w.close()
    out.toByteArray
  }

  private def checkDocs(f: OcfFile, n: Int): Unit = {
    assert(f.records.length === n)
    (1 to n).foreach { i =>
      val r = f.records(i - 1).asInstanceOf[VRecord]
      assert(r("doc_id") === VLong(i.toLong))
      assert(r("body") === VString(s"body-$i &<>"))
      assert(r("stars") === (if (i % 3 == 0) VNull else VInt(i % 7)))
      assert(r("emb") === VArray((0 until 4).map(j => VDouble(i * 0.5 + j)).toVector))
    }
  }

  test("reference-written files decode value-exact under all four codecs") {
    for ((codec, name) <- Seq(
      (CodecFactory.nullCodec(), "null"),
      (CodecFactory.deflateCodec(6), "deflate"),
      (CodecFactory.snappyCodec(), "snappy"),
      (CodecFactory.zstandardCodec(3), "zstandard"))) {
      val bytes = writeDocs(codec, 25)
      val f = AvroOcf.decode(bytes).getOrElse(fail(s"codec $name rejected"))
      assert(f.codec === name)
      checkDocs(f, 25)
    }
  }

  test("multi-block files (explicit sync boundaries) decode whole and ordered") {
    val bytes = writeDocs(CodecFactory.deflateCodec(3), 50, syncEvery = 7)
    checkDocs(AvroOcf.decode(bytes).get, 50)
  }

  test("the full type system decodes: nested records, enum, fixed, map, bytes, float, recursion") {
    val json =
      """{"type":"record","name":"All","namespace":"t","fields":[
        |{"name":"b","type":"boolean"},
        |{"name":"i","type":"int"},
        |{"name":"f","type":"float"},
        |{"name":"by","type":"bytes"},
        |{"name":"e","type":{"type":"enum","name":"Color","symbols":["RED","GREEN","BLUE"]}},
        |{"name":"fx","type":{"type":"fixed","name":"Four","size":4}},
        |{"name":"m","type":{"type":"map","values":"long"}},
        |{"name":"inner","type":{"type":"record","name":"Inner","fields":[
        |  {"name":"x","type":"double"},
        |  {"name":"next","type":["null","Inner"]}]}}]}""".stripMargin
    val schema = new ASchema.Parser().parse(json)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    val r = new GenericData.Record(schema)
    r.put("b", java.lang.Boolean.TRUE)
    r.put("i", Integer.valueOf(-42))
    r.put("f", java.lang.Float.valueOf(1.25f))
    r.put("by", java.nio.ByteBuffer.wrap(Array[Byte](1, 2, 0x7f)))
    r.put("e", new GenericData.EnumSymbol(schema.getField("e").schema(), "GREEN"))
    r.put("fx", new GenericData.Fixed(schema.getField("fx").schema(),
      Array[Byte](9, 8, 7, 6)))
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    m.put("k1", 10L); m.put("k2", -20L)
    r.put("m", m)
    val innerSchema = schema.getField("inner").schema()
    val tail = new GenericData.Record(innerSchema)
    tail.put("x", java.lang.Double.valueOf(2.5))
    tail.put("next", null)
    val head = new GenericData.Record(innerSchema)
    head.put("x", java.lang.Double.valueOf(1.5))
    head.put("next", tail)
    r.put("inner", head)
    w.append(r); w.close()
    val f = AvroOcf.decode(out.toByteArray).get
    val got = f.records.head.asInstanceOf[VRecord]
    assert(got("b") === VBool(true))
    assert(got("i") === VInt(-42))
    assert(got("f") === VFloat(1.25f))
    assert(got("by") === VBytes(Vector[Byte](1, 2, 0x7f)))
    assert(got("e") === VEnum("GREEN"))
    assert(got("fx") === VBytes(Vector[Byte](9, 8, 7, 6)))
    assert(got("m") === VMap(Vector("k1" -> VLong(10L), "k2" -> VLong(-20L))))
    val inner = got("inner").asInstanceOf[VRecord]
    assert(inner("x") === VDouble(1.5))
    val next = inner("next").asInstanceOf[VRecord]
    assert(next("x") === VDouble(2.5))
    assert(next("next") === VNull)
  }

  test("negative-count blocked array form decodes (the form the reference writer skips)") {
    // array<long> [3,4]: block count -2, block byte size 2, items, terminator 0
    // zigzag: -2 → 3, 2 → 4, 3 → 6, 4 → 8, 0 → 0
    val raw = Array[Byte](3, 4, 6, 8, 0)
    val schema = AvroOcf.parseSchema("""{"type":"array","items":"long"}""")
    assert(AvroOcf.decodeSingle(raw, schema) ===
      Some(VArray(Vector(VLong(3L), VLong(4L)))))
    // a lying block byte-size must not matter for correctness (the spec
    // says readers MAY use it to skip; we validate bounds only) but a
    // truncated item list must reject
    assert(AvroOcf.decodeSingle(Array[Byte](3, 4, 6), schema) === None)
  }

  test("container rejects: magic, sync mismatch, truncation, trailing garbage, unknown codec") {
    val bytes = writeDocs(CodecFactory.nullCodec(), 10)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = bytes.clone(); f(c); c
    }
    assert(AvroOcf.decode(mut(_(0) = 'X')) === None)
    // per-block sync marker: flip a byte of the LAST 16 (the trailing
    // block's sync must equal the header's)
    assert(AvroOcf.decode(mut(c => c(c.length - 3) = (c(c.length - 3) ^ 0x5a).toByte)) === None)
    assert(AvroOcf.decode(bytes.dropRight(1)) === None)
    assert(AvroOcf.decode(bytes ++ Array[Byte](1, 2, 3)) === None)
    assert(AvroOcf.decode(null) === None)
    assert(AvroOcf.decode(Array[Byte]('O', 'b', 'j', 1)) === None)
    // unknown codec name rejects loudly (never a pass-through guess):
    // the library refuses to write reserved meta keys, so hand-frame a
    // container whose avro.codec names something we don't carry
    def zz(v: Long): Array[Byte] = {
      var u = (v << 1) ^ (v >> 63)
      val o = Vector.newBuilder[Byte]
      while ((u & ~0x7fL) != 0) { o += ((u & 0x7f) | 0x80).toByte; u >>>= 7 }
      (o += u.toByte).result().toArray
    }
    def s(x: String): Array[Byte] = {
      val b = x.getBytes("UTF-8"); zz(b.length.toLong) ++ b
    }
    val schemaJson = """{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}"""
    val hand = new java.io.ByteArrayOutputStream()
    hand.write(Array[Byte]('O', 'b', 'j', 1))
    hand.write(zz(2)) // two metadata entries
    hand.write(s("avro.schema")); hand.write(s(schemaJson))
    hand.write(s("avro.codec")); hand.write(s("bzip2codec-nope"))
    hand.write(zz(0))
    val sync16 = Array.tabulate[Byte](16)(_.toByte)
    hand.write(sync16)
    hand.write(zz(1)); hand.write(zz(1)); hand.write(zz(5)) // count=1, size=1, datum x=5 (zigzag... 1 byte)
    hand.write(sync16)
    assert(AvroOcf.decode(hand.toByteArray) === None)
  }

  test("malformed \\u escape in embedded schema JSON rejects (None), never NumberFormatException") {
    def zz(v: Long): Array[Byte] = {
      var u = (v << 1) ^ (v >> 63)
      val o = Vector.newBuilder[Byte]
      while ((u & ~0x7fL) != 0) { o += ((u & 0x7f) | 0x80).toByte; u >>>= 7 }
      (o += u.toByte).result().toArray
    }
    def s(x: String): Array[Byte] = {
      val b = x.getBytes("UTF-8"); zz(b.length.toLong) ++ b
    }
    // name carries a \uZZZZ escape: 4 chars present but not hex digits
    val schemaJson = "{\"type\":\"record\",\"name\":\"R\\uZZZZ\"," +
      "\"fields\":[{\"name\":\"x\",\"type\":\"long\"}]}"
    val hand = new java.io.ByteArrayOutputStream()
    hand.write(Array[Byte]('O', 'b', 'j', 1))
    hand.write(zz(1))
    hand.write(s("avro.schema")); hand.write(s(schemaJson))
    hand.write(zz(0))
    val sync16 = Array.tabulate[Byte](16)(_.toByte)
    hand.write(sync16)
    hand.write(zz(1)); hand.write(zz(2)); hand.write(zz(5))
    hand.write(sync16)
    assert(AvroOcf.decode(hand.toByteArray) === None)
    // a VALID \u escape still decodes through the same path
    assert(AvroOcf.parseSchema("{\"type\":\"record\",\"name\":\"R\\u0041\"," +
      "\"fields\":[]}") != null)
  }

  test("datum-level rejects: union index out of range, enum overflow, block over-consume") {
    val u = AvroOcf.parseSchema("""["null","int"]""")
    assert(AvroOcf.decodeSingle(Array[Byte](4), u) === None)    // index 2 of 2
    assert(AvroOcf.decodeSingle(Array[Byte](1), u) === None)    // negative index
    assert(AvroOcf.decodeSingle(Array[Byte](2, 6), u) === Some(VInt(3)))
    val e = AvroOcf.parseSchema(
      """{"type":"enum","name":"E","symbols":["A","B"]}""")
    assert(AvroOcf.decodeSingle(Array[Byte](4), e) === None)    // symbol 2 of 2
    // trailing byte after a complete datum must reject (exact consume)
    assert(AvroOcf.decodeSingle(Array[Byte](2, 6, 0), u) === None)
    // int range: a zigzag value past Int.MaxValue under "int" rejects
    val i32 = AvroOcf.parseSchema("\"int\"")
    val big = Array[Byte](0xfe.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x1f) // 2^32-1 zigzag
    assert(AvroOcf.decodeSingle(big, i32) === None)
    // a block count of Long.MinValue survives negation (-MinValue ==
    // MinValue) — must reject, not slip past the bounds as a negative
    val arr = AvroOcf.parseSchema("""{"type":"array","items":"long"}""")
    val minVal = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x01, 0)
    assert(AvroOcf.decodeSingle(minVal, arr) === None)
  }

  test("schema rejects: malformed JSON, unknown named reference, missing fields, bad size") {
    def bad(s: String): Unit =
      assert(intercept[Exception](AvroOcf.parseSchema(s)) != null, s)
    bad("""{"type":"record","name":"R"}""")                 // no fields
    bad("""{"type":"record","fields":[]}""")                // no name
    bad("""{"type":"array"}""")                             // no items
    bad("""{"type":"fixed","name":"F","size":-1}""")        // bad size
    bad("""{"type":"record","name":"R","fields":[{"name":"x","type":"Nope"}]}""")
    bad("""{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]} garbage""")
  }

  test("a deflate bomb block rejects at the cap, fast") {
    // 128 MiB of zeros deflates to ~127 KB; the 64 MiB inflate cap must
    // trip without materializing the whole payload
    val big = new Array[Byte](128 << 20)
    val def6 = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(big); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    // hand-frame a container with that block
    val schema = new ASchema.Parser().parse("""{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}""")
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(schema, out)
    val r = new GenericData.Record(schema); r.put("x", 1L)
    w.append(r); w.close()
    val base = out.toByteArray
    // splice: keep header+sync, replace the data block with the bomb
    // (count=1, size=def6.length, def6, sync) — find the first sync by
    // re-reading the header through our own metadata walk offsets: the
    // library writes header || block; the final 16 bytes are the sync,
    // and the first sync copy sits right after the metadata. Simplest
    // robust splice: locate the LAST 16 bytes (sync) and rebuild.
    val sync = base.takeRight(16)
    val headerEnd = {
      // find the first occurrence of sync after position 4
      var i = 4
      var found = -1
      while (found < 0 && i + 16 <= base.length) {
        if (java.util.Arrays.equals(java.util.Arrays.copyOfRange(base, i, i + 16), sync))
          found = i
        i += 1
      }
      found + 16
    }
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(base, 0, headerEnd)
    def zig(v: Long): Array[Byte] = {
      var u = (v << 1) ^ (v >> 63)
      val o = Vector.newBuilder[Byte]
      while ((u & ~0x7fL) != 0) { o += ((u & 0x7f) | 0x80).toByte; u >>>= 7 }
      o += u.toByte
      o.result().toArray
    }
    bomb.write(zig(1))
    bomb.write(zig(def6.length.toLong))
    bomb.write(def6)
    bomb.write(sync)
    val t0 = System.nanoTime()
    assert(AvroOcf.decode(bomb.toByteArray) === None)
    assert(System.nanoTime() - t0 < 5e9)
  }
}
