package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MimeSniff

/** Magic-byte MIME sniffing: the format families the e74 fixture does
  * not exercise, ordering/precedence rules, and the never-throw
  * envelope.
  */
class MimeSniffSpec extends AnyFunSuite {

  private def m(b: Array[Byte]): String = MimeSniff.mimeOf(b)
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("image and container families by magic") {
    assert(m("GIF89a".getBytes("ISO-8859-1") ++ bytes(1, 2)) === "image/gif")
    assert(m("GIF87a".getBytes("ISO-8859-1")) === "image/gif")
    assert(m("BM".getBytes("ISO-8859-1") ++ bytes(0, 0)) === "image/bmp")
    assert(m(bytes(0, 0, 0, 0x18) ++ "ftypisom".getBytes("ISO-8859-1"))
      === "video/mp4")
    assert(m(bytes(0x50, 0x4b, 0x03, 0x04)) === "application/zip")
    val tar = new Array[Byte](300)
    "ustar".getBytes("ISO-8859-1").copyToArray(tar, 257)
    assert(m(tar) === "application/x-tar")
  }

  test("precedence: RIFF without WAVE is not wav; PK without version is not zip") {
    // RIFF + AVI payload: RIFF matched but WAVE absent -> falls through
    val avi = "RIFF".getBytes("ISO-8859-1") ++ bytes(0, 0, 0, 0) ++
      "AVI LIST".getBytes("ISO-8859-1")
    assert(m(avi) !== "audio/wav")
    assert(m("PKZZZZ".getBytes("ISO-8859-1")) !== "application/zip")
  }

  test("markup detection skips BOM and whitespace, case-insensitive doctype") {
    assert(m(bytes(0xef, 0xbb, 0xbf) ++ "\n <html>".getBytes("UTF-8"))
      === "text/html")
    assert(m("<!dOcTyPe HtMl><p>".getBytes("UTF-8")) === "text/html")
    // XHTML: the XML declaration wins (self-description)
    assert(m("<?xml version=\"1.0\"?><html>".getBytes("UTF-8")) === "text/xml")
  }

  test("text vs binary fallback rides the strict UTF-8 walk") {
    assert(m("plain words".getBytes("UTF-8")) === "text/plain")
    assert(m("café 中文".getBytes("UTF-8")) === "text/plain")
    // UTF-16 BOM payloads are text
    assert(m(bytes(0xff, 0xfe) ++ "hi".getBytes("UTF-16LE")) === "text/plain")
    assert(m(bytes(0x00, 0x93, 0x96)) === "application/octet-stream")
  }

  test("the r12 decoder family by magic, with REAL writer output where cheap") {
    assert(m("fLaC".getBytes("ISO-8859-1") ++ bytes(0x80)) === "audio/flac")
    // a real Ogg page from the fixture writer
    val ogg = graft.operators.Ogg.makeFile(
      graft.operators.Ogg.makeOpusHead(1, 0, 16000),
      "OpusTags".getBytes("ISO-8859-1"),
      Seq(Array[Byte](1, 2, 3)), serial = 1L, granulePerPacket = 960L,
      preSkip = 0L)
    assert(m(ogg) === "audio/ogg")
    // a real SQLite database from the writer
    val db = graft.operators.Sqlite.makeDb("t",
      "CREATE TABLE t(a INTEGER PRIMARY KEY, b TEXT, c INTEGER, d REAL)", 0,
      Seq((1L, Seq(graft.operators.Sqlite.SqlInt(1), graft.operators.Sqlite.SqlText("x"),
        graft.operators.Sqlite.SqlInt(1), graft.operators.Sqlite.SqlReal(0.5)))))
    assert(m(db) === "application/vnd.sqlite3")
    assert(m(bytes('7', 'z', 0xBC, 0xAF, 0x27, 0x1C)) === "application/x-7z-compressed")
    assert(m("Obj".getBytes("ISO-8859-1") ++ bytes(1, 2)) === "application/avro")
    assert(m(bytes('I', 'I', 0x2A, 0x00)) === "image/tiff")
    assert(m(bytes('M', 'M', 0x00, 0x2A)) === "image/tiff")
    assert(m(bytes(0x1A, 0x45, 0xDF, 0xA3, 0x01)) === "video/webm")
    assert(m(bytes(0xFD) ++ "7zXZ".getBytes("ISO-8859-1") ++ bytes(0))
      === "application/x-xz")
    assert(m(bytes(0x28, 0xB5, 0x2F, 0xFD, 0x01)) === "application/zstd")
    assert(m(bytes(0x04, 0x22, 0x4D, 0x18, 0x64)) === "application/x-lz4")
    assert(m("BZh9".getBytes("ISO-8859-1") ++ bytes(0x31)) === "application/x-bzip2")
    // MP3: ID3 prefix and a VALID frame sync (from the fixture writer)
    assert(m(graft.operators.Mp3.makeId3v2(10)) === "audio/mpeg")
    assert(m(graft.operators.Mp3.makeFrame(3, 3, 9, 0, padding = false,
      mono = false, seed = 1)) === "audio/mpeg")
    // a sync with a RESERVED bitrate index must NOT label mp3
    assert(m(bytes(0xFF, 0xFB, 0xF0, 0x00)) !== "audio/mpeg")
    // JPEG SOI wins over the mp3 sync rung (FF D8 FF)
    assert(m(bytes(0xFF, 0xD8, 0xFF, 0xE0)) === "image/jpeg")
    // 'BZh' without a legal level digit is not bzip2
    assert(m("BZhX".getBytes("ISO-8859-1")) !== "application/x-bzip2")
    // RTF prefix
    assert(m("{\\rtf1 x}".getBytes("ISO-8859-1")) === "application/rtf")
    // the DESIGNED package sniff: mimetype content at fixed offset 38
    val odt = graft.operators.Odt.makeOdt(Seq((false, "x")))
    assert(m(odt) === "application/vnd.oasis.opendocument.text")
    val epub = graft.operators.Epub.makeEpub(Seq(("c1.xhtml", "<html><body><p>x</p></body></html>")))
    assert(m(epub) === "application/epub+zip")
    // a plain zip (no mimetype-first entry) stays zip
    assert(m(graft.operators.ZipArchive.makeZip(Seq(
      ("a.txt", "hi".getBytes("UTF-8"), true)))) === "application/zip")
  }

  test("never throws on truncations and soup") {
    val rnd = new scala.util.Random(50)
    (0 until 500).foreach { _ =>
      m(Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte))
    }
    assert(m(Array.emptyByteArray) === "text/plain") // empty = trivially UTF-8
  }

  test("SQL surface registered") {
    val spark = TestSpark.spark
    Graft.prepare(spark)
    val r = spark.sql(
      "SELECT detect_mime(cast('%PDF-1.7' AS BINARY)) AS a").head()
    assert(r.getString(0) === "application/pdf")
  }
}
