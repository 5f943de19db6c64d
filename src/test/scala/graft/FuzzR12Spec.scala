package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-cutting fuzz over the r12 decoder family: every decoder must
  * return (None | Some) on arbitrary input — truncations of VALID
  * fixtures at every sampled length, single-byte flips at sampled
  * positions, and random soup — and never let a Throwable escape the
  * envelope (the classes that have bitten before: StackOverflowError,
  * NegativeArraySizeException, OutOfMemoryError from lying sizes).
  */
class FuzzR12Spec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x122f)

  private def fuzzOne(name: String, valid: Array[Byte],
      decode: Array[Byte] => Any): Unit = {
    // premise: the valid fixture decodes
    decode(valid)
    // truncations: every length up to 64, then strided
    var n = 0
    while (n < valid.length) {
      decode(java.util.Arrays.copyOf(valid, n))
      n += (if (n < 64) 1 else math.max(1, valid.length / 97))
    }
    // single-byte flips at 200 sampled positions
    (0 until 200).foreach { _ =>
      val c = valid.clone()
      val i = rnd.nextInt(c.length)
      c(i) = (c(i) ^ (1 + rnd.nextInt(255))).toByte
      decode(c)
    }
    // random soup, assorted sizes
    (0 until 200).foreach { _ =>
      decode(Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte))
    }
    // valid prefix + garbage tail
    (0 until 50).foreach { _ =>
      decode(valid ++ Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(256).toByte))
    }
  }

  test("Docx") {
    fuzzOne("docx", operators.Docx.makeDocx(Seq("one & two", "three")),
      b => operators.Docx.paragraphs(b))
  }

  test("TfRecord") {
    val recs = Seq(operators.TfRecord.encodeExample(Seq(
      "doc_id" -> operators.TfRecord.Int64Feature(Seq(5L)),
      "text" -> operators.TfRecord.BytesFeature(Seq("hello".getBytes("UTF-8"))))))
    val framed = operators.TfRecord.make(recs)
    fuzzOne("tfrecord", framed, b => {
      operators.TfRecord.records(b).foreach(_.foreach(operators.TfRecord.decodeExample))
    })
  }

  test("Flac") {
    val pcm = Array.tabulate(2, 700)((ch, i) => ((i * 7 + ch * 13) % 801) - 400)
    fuzzOne("flac", operators.Flac.encode(pcm, 16000, 16),
      b => operators.Flac.decode(b))
  }

  test("Sqlite") {
    import operators.Sqlite._
    val db = operators.Sqlite.makeDb("docs",
      "CREATE TABLE docs(doc_id INTEGER PRIMARY KEY, body TEXT, n INTEGER, s REAL)",
      0, (1 to 30).map(i => (i.toLong, Seq[SqlValue](SqlInt(i.toLong),
        SqlText("b" * (10 + i)), SqlInt(i.toLong), SqlReal(i * 0.5)))))
    fuzzOne("sqlite", db, b => operators.Sqlite.rows(b, "docs"))
  }

  test("AvroOcf") {
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val schema = new ASchema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"long"},{"name":"s","type":"string"}]}""")
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    (1 to 20).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("x", i.toLong); r.put("s", s"row-$i")
      w.append(r)
    }
    w.close()
    fuzzOne("avro", out.toByteArray, b => operators.AvroOcf.decode(b))
  }

  test("Tiff") {
    val t = operators.Tiff.makeTiff(
      Seq((9, 6, 3, (k: Int) => ((k * 7) % 251).toByte),
        (7, 5, 1, (k: Int) => ((k * 11) % 251).toByte)),
      Seq(5, 32773), littleEndian = true)
    fuzzOne("tiff", t, b => operators.Tiff.decode(b))
    // r13 families: G4-bilevel strips and a tiled page
    val g4 = operators.Tiff.makeTiffExt(Seq(operators.Tiff.PageSpec(
      60, 8, 1, 1, 0, 4,
      (k: Int) => if ((k * 11 % 251) % 2 == 0) 0 else 255.toByte,
      rowsPerStrip = 4)), littleEndian = false)
    fuzzOne("tiff-g4", g4, b => operators.Tiff.decode(b))
    val tiled = operators.Tiff.makeTiffExt(Seq(operators.Tiff.PageSpec(
      20, 18, 1, 8, 1, 5, (k: Int) => ((k * 13) % 251).toByte,
      tile = Some((16, 16)))), littleEndian = true)
    fuzzOne("tiff-tiled", tiled, b => operators.Tiff.decode(b))
    // r13b: G3 2-D with aligned EOLs and FillOrder 2
    val g3 = operators.Tiff.makeTiffExt(Seq(operators.Tiff.PageSpec(
      50, 9, 1, 1, 0, 3,
      (k: Int) => if ((k * 13 % 251) % 2 == 0) 0 else 255.toByte,
      rowsPerStrip = 9, t4opts = 5, fillOrder = 2)), littleEndian = true)
    fuzzOne("tiff-g3-2d", g3, b => operators.Tiff.decode(b))
  }

  test("Mp3") {
    val f = new java.io.ByteArrayOutputStream()
    f.write(operators.Mp3.makeId3v2(30))
    (0 until 6).foreach(j => f.write(operators.Mp3.makeFrame(3, 3, 5 + j % 3,
      1, padding = j % 2 == 0, mono = false, seed = j)))
    f.write(operators.Mp3.makeId3v1())
    fuzzOne("mp3", f.toByteArray, b => operators.Mp3.info(b))
  }

  test("Ogg") {
    val f = operators.Ogg.makeFile(operators.Ogg.makeOpusHead(1, 312, 16000),
      "OpusTags".getBytes("ISO-8859-1"),
      (0 until 4).map(i => Array.tabulate(350)(k => (k + i).toByte)),
      serial = 5L, granulePerPacket = 960L, preSkip = 312L)
    fuzzOne("ogg", f, b => operators.Ogg.info(b))
  }

  test("Webm") {
    val f = operators.Webm.makeWebm("webm", 5000.0, 1000000L,
      Seq(operators.Webm.Track(1, "V_VP9", 640, 360, -1, -1),
        operators.Webm.Track(2, "A_OPUS", -1, -1, 48000.0, 2)),
      blocksPerCluster = Seq(2, 3))
    fuzzOne("webm", f, b => operators.Webm.info(b))
  }

  test("SevenZip") {
    val ms = (0 until 4).map(i =>
      (s"f$i.txt", Array.tabulate(200 + i * 31)(k => (32 + (k * 7 + i) % 90).toByte)))
    val arch = operators.SevenZip.makeArchive(Seq(("lzma", ms)),
      encodedHeader = true)
    fuzzOne("7z", arch, b => operators.SevenZip.members(b))
  }

  test("WebpL") {
    val pix = Array.tabulate(12 * 9)(i =>
      (255 << 24) | ((i * 7 % 256) << 16) | ((i * 11 % 256) << 8) | (i * 5 % 256))
    val f = operators.WebpL.makePixels(12, 9, pix,
      predictorMode = Some(11), colorCte = Some((33, 66, 99)),
      subtractGreen = true)
    fuzzOne("webp", f, b => operators.WebpL.decode(b))
  }

  test("Mbox") {
    val m = ("From a@x Thu Jan  1 00:00:00 2026\n" +
      "From: a@x\nSubject: =?UTF-8?B?aGk=?=\n" +
      "Content-Type: multipart/mixed; boundary=bb\n\n" +
      "--bb\nContent-Type: text/plain\nContent-Transfer-Encoding: quoted-printable\n\n" +
      "a=3Db\n--bb\nContent-Transfer-Encoding: base64\n\naGVsbG8=\n--bb--\n")
      .getBytes("ISO-8859-1")
    fuzzOne("mbox", m, b => operators.Mbox.messages(b))
  }

  test("Odt") {
    fuzzOne("odt", operators.Odt.makeOdt(Seq((true, "Head"), (false, "body & more"))),
      b => operators.Odt.paragraphs(b))
  }

  test("Rtf") {
    fuzzOne("rtf", operators.Rtf.makeRtf(Seq("one café {x}", "two \\ back")),
      b => operators.Rtf.paragraphs(b))
  }

  test("Lz4Shards") {
    val p = ("{\"a\":1}\n" * 400).getBytes("UTF-8")
    val f = operators.Lz4Shards.makeFrame(p, blockChecksum = true,
      contentSize = true) ++ operators.Lz4Shards.makeSkippable(9) ++
      operators.Lz4Shards.makeFrame(p.take(100), linked = true)
    fuzzOne("lz4", f, b => operators.Lz4Shards.decompress(b))
  }
}
