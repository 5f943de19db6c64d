package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TfRecord
import graft.operators.TfRecord.{BytesFeature, FloatFeature, Int64Feature}

class TfRecordSpec extends AnyFunSuite {

  test("CRC32C is the Castagnoli polynomial: published check value pins the JDK codec") {
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes("US-ASCII"))
    assert(c.getValue === 0xE3069283L)
  }

  test("record framing round-trips, including the empty record") {
    val recs = Seq(Array[Byte](), "hello".getBytes("UTF-8"),
      Array.tabulate(1000)(i => (i * 7).toByte))
    val framed = TfRecord.make(recs)
    val back = TfRecord.records(framed).get
    assert(back.length === 3)
    recs.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("golden frame bytes: a one-byte record's full framing is pinned") {
    // length=1 LE u64, masked crc32c of those 8 bytes, data, masked crc
    val framed = TfRecord.make(Seq(Array[Byte]('A')))
    assert(framed.length === 8 + 4 + 1 + 4)
    assert(framed.take(8).toSeq === Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
    assert(framed(12) === 'A'.toByte)
    // the masked CRCs round-trip through the reader (reader recomputes
    // both independently)
    assert(TfRecord.records(framed).isDefined)
  }

  test("payload corruption, length-crc corruption, truncation, trailing garbage all reject") {
    val framed = TfRecord.make(Seq("payload-bytes".getBytes("UTF-8")))
    def flip(i: Int): Array[Byte] = {
      val c = framed.clone(); c(i) = (c(i) ^ 0x1).toByte; c
    }
    assert(TfRecord.records(flip(14)) === None)              // data byte
    assert(TfRecord.records(flip(9)) === None)               // length crc
    assert(TfRecord.records(flip(1)) === None)               // length itself
    assert(TfRecord.records(framed.dropRight(1)) === None)   // truncated
    assert(TfRecord.records(framed :+ 0.toByte) === None)    // trailing byte
  }

  test("a lying multi-GB length rejects before allocation") {
    val hostile = new Array[Byte](16)
    hostile(5) = 0x01 // length = 2^40
    val t0 = System.nanoTime()
    assert(TfRecord.records(hostile) === None)
    assert((System.nanoTime() - t0) < 1e9)
  }

  test("tf.Example encode: hand-derived golden wire bytes pinned") {
    val ex = TfRecord.encodeExample(Seq(
      "id" -> Int64Feature(Seq(5L))))
    // Example{1: Features{1: entry{1:"id", 2: Feature{3: Int64List{1:[5]}}}}}
    val expected = Array[Int](
      0x0a, 0x0d,             // Example.features, len 13
      0x0a, 0x0b,             // Features.feature map entry, len 11
      0x0a, 0x02, 'i', 'd',   // entry key "id"
      0x12, 0x05,             // entry value Feature, len 5
      0x1a, 0x03,             // Feature.int64_list, len 3
      0x0a, 0x01, 0x05        // Int64List.value packed: [5]
    ).map(_.toByte)
    assert(ex.toSeq === expected.toSeq)
    assert(TfRecord.decodeExample(ex).get ===
      Map("id" -> Int64Feature(Seq(5L))))
  }

  test("multi-feature example round-trips with floats bit-exact and key order canonical") {
    val feats = Seq(
      "text" -> BytesFeature(Seq("héllo".getBytes("UTF-8"))),
      "emb" -> FloatFeature(Seq(1.5f, -0.0f, Float.MinPositiveValue)),
      "ids" -> Int64Feature(Seq(-1L, 0L, Long.MaxValue, Long.MinValue)))
    val ex = TfRecord.encodeExample(feats)
    // sorted-key determinism: encoding a permutation yields identical bytes
    val ex2 = TfRecord.encodeExample(feats.reverse)
    assert(ex.sameElements(ex2))
    val back = TfRecord.decodeExample(ex).get
    assert(new String(back("text").asInstanceOf[BytesFeature].values.head,
      "UTF-8") === "héllo")
    val fb = back("emb").asInstanceOf[FloatFeature].values
    assert(fb.map(java.lang.Float.floatToRawIntBits) ===
      feats(1)._2.asInstanceOf[FloatFeature].values
        .map(java.lang.Float.floatToRawIntBits))
    assert(back("ids") === feats(2)._2)
  }

  test("unpacked int64/float repeated forms decode (proto2-style writers emit them)") {
    // hand-build: Feature{3: Int64List{ 1: varint 7, 1: varint 300 }} unpacked
    def vbytes(v: Long): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      var x = v
      while ((x & ~0x7fL) != 0) { o.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      o.write(x.toInt); o.toByteArray
    }
    val list = Array[Byte](0x08) ++ vbytes(7) ++ Array[Byte](0x08) ++ vbytes(300)
    val feature = Array[Byte](0x1a, list.length.toByte) ++ list
    val entry = Array[Byte](0x0a, 0x03, 'i', 'd', 's') ++
      Array[Byte](0x12, feature.length.toByte) ++ feature
    val features = Array[Byte](0x0a, entry.length.toByte) ++ entry
    val ex = Array[Byte](0x0a, features.length.toByte) ++ features
    assert(TfRecord.decodeExample(ex).get ===
      Map("ids" -> Int64Feature(Seq(7L, 300L))))
  }

  test("unknown fields are SKIPPED (spec behavior); malformed varints and groups reject") {
    val base = TfRecord.encodeExample(Seq("id" -> Int64Feature(Seq(9L))))
    // append an unknown top-level field 15, wire type 0
    val extended = base ++ Array[Byte](0x78, 0x2a)
    assert(TfRecord.decodeExample(extended).get ===
      Map("id" -> Int64Feature(Seq(9L))))
    // truncated varint (continuation bit on the last byte)
    assert(TfRecord.decodeExample(Array[Byte](0x0a, 0x01, 0x80.toByte)) === None)
    // deprecated group wire type at top level
    assert(TfRecord.decodeExample(Array[Byte](0x0b)) === None)
    // length overrunning the buffer
    assert(TfRecord.decodeExample(Array[Byte](0x0a, 0x7f, 0x00)) === None)
  }
}
