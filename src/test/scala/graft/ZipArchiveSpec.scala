package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZipArchive

class ZipArchiveSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes("UTF-8")

  test("stored + deflated members round-trip with verified CRCs") {
    val entries = Seq(
      ("a.txt", b("hello zip"), false),
      ("dir/b.txt", b("compressed content " * 20), true),
      ("c.bin", Array.tabulate(256)(_.toByte), false))
    val z = ZipArchive.makeZip(entries)
    val m = ZipArchive.members(z).get
    assert(m.map(_.name) === Seq("a.txt", "dir/b.txt", "c.bin"))
    assert(m.map(_.method) === Seq(0, 8, 0))
    m.zip(entries).foreach { case (got, (_, want, _)) =>
      assert(got.data.toSeq === want.toSeq)
      assert(got.size === want.length.toLong)
    }
    // deflate actually compressed the repetitive member
    assert(m(1).compSize < m(1).size)
  }

  test("non-ASCII UTF-8 member names survive (language flag set)") {
    val z = ZipArchive.makeZip(Seq(("日本語/файл.txt", b("x"), true)))
    assert(ZipArchive.members(z).get.head.name === "日本語/файл.txt")
  }

  test("a flipped payload byte breaks the CRC and rejects the archive") {
    val z = ZipArchive.makeZip(Seq(("a.txt", b("payload bytes here"), false)))
    val at = new String(z, "ISO-8859-1").indexOf("payload")
    val k = z.clone(); k(at) = 'X'.toByte
    assert(ZipArchive.members(k) === None)
  }

  test("EOCD is found through a trailing comment; garbage tails reject") {
    val z = ZipArchive.makeZip(Seq(("a.txt", b("x"), false)))
    // a zip with a comment: rewrite the comment length and append
    val withComment = z.dropRight(2) ++ Array[Byte](4, 0) ++ b("tail")
    assert(ZipArchive.members(withComment).get.head.name === "a.txt")
    // appended garbage WITHOUT fixing the comment length: the EOCD
    // self-consistency check (comment runs to EOF) rejects
    assert(ZipArchive.members(z ++ b("junk")) === None)
  }

  test("truncation, encryption and exotic methods reject cleanly") {
    val z = ZipArchive.makeZip(Seq(("a.txt", b("hello hello hello"), true)))
    for (cut <- Seq(5, z.length / 2, z.length - 3))
      assert(ZipArchive.members(z.take(cut)) === None)
    // flip the central-directory method field to 6 (implode)
    val cd = new String(z, "ISO-8859-1").lastIndexOf("PK")
    val k = z.clone(); k(cd + 10) = 6.toByte
    assert(ZipArchive.members(k) === None)
    // set the encryption bit in the central flags
    val k2 = z.clone(); k2(cd + 8) = (k2(cd + 8) | 1).toByte
    assert(ZipArchive.members(k2) === None)
    assert(ZipArchive.members(null) === None)
    assert(ZipArchive.members(b("PK")) === None)
  }

  test("a lying uncompressed size (zip-bomb header) rejects") {
    val z = ZipArchive.makeZip(Seq(("a.txt", b("small"), true)))
    val cd = new String(z, "ISO-8859-1").lastIndexOf("PK")
    // declare a larger uncompressed size than the stream yields
    val k = z.clone(); k(cd + 24) = (k(cd + 24) + 1).toByte
    assert(ZipArchive.members(k) === None)
  }

  test("zip64 framing: EOCD64 + masked fields round-trip; rejects stay strict") {
    val entries = Seq(
      ("a.txt", b("hello zip64"), false),
      ("dir/b.txt", b("compressed content " * 20), true),
      ("c.bin", Array.tabulate(256)(_.toByte), false))
    val z = ZipArchive.makeZip64(entries)
    val m = ZipArchive.members(z).get
    assert(m.map(_.name) === Seq("a.txt", "dir/b.txt", "c.bin"))
    m.zip(entries).foreach { case (got, (_, want, _)) =>
      assert(got.data.toSeq === want.toSeq)
    }
    // truncation anywhere rejects
    for (cut <- Seq(5, z.length / 2, z.length - 3, z.length - 30))
      assert(ZipArchive.members(z.take(cut)) === None)
    // flipping a payload byte still breaks the CRC
    val at = new String(z, "ISO-8859-1").indexOf("hello")
    val k = z.clone(); k(at) = 'X'.toByte
    assert(ZipArchive.members(k) === None)
    // corrupting the EOCD64 signature orphans the masked EOCD → reject
    val e64At = {
      val s = new String(z, "ISO-8859-1")
      s.indexOf("PK")
    }
    val k2 = z.clone(); k2(e64At + 3) = 0x05.toByte
    assert(ZipArchive.members(k2) === None)
    // a masked central field with its zip64 extra tag corrupted rejects
    val cdAt = new String(z, "ISO-8859-1").indexOf("PK")
    val extraTagAt = cdAt + 46 + "a.txt".length
    val k3 = z.clone(); k3(extraTagAt) = 9.toByte // tag 0x0001 -> 0x0009
    assert(ZipArchive.members(k3) === None)
    // appended garbage after a valid zip64 archive rejects (EOCD comment
    // self-consistency, the standing discipline)
    assert(ZipArchive.members(z ++ b("junk")) === None)
  }

  test("central-directory span discipline: over-declared entry and slack cdSize reject") {
    val z = ZipArchive.makeZip(Seq(("a.txt", b("alpha"), false),
      ("b.txt", b("beta"), false)))
    val s = new String(z, "ISO-8859-1")
    // (1) the FINAL entry declares an extra field that runs past the
    //     declared central-directory end — must reject (review r10)
    val lastCd = s.lastIndexOf("PK")
    val k = z.clone(); k(lastCd + 30) = 4.toByte // extraLen 0 -> 4
    assert(ZipArchive.members(k) === None)
    // (2) cdSize over-declared with slack bytes between the last entry
    //     and the EOCD: the walk must consume EXACTLY cdSize, so ending
    //     short of it is a reject, not a silent accept
    val eocdAt = s.lastIndexOf("PK")
    val slack = z.take(eocdAt) ++ Array[Byte](0, 0, 0, 0) ++ z.drop(eocdAt)
    val szAt = eocdAt + 4 + 12
    val cdSize = ((slack(szAt) & 0xffL) | ((slack(szAt + 1) & 0xffL) << 8) |
      ((slack(szAt + 2) & 0xffL) << 16) | ((slack(szAt + 3) & 0xffL) << 24)) + 4
    slack(szAt) = (cdSize & 0xff).toByte
    slack(szAt + 1) = ((cdSize >> 8) & 0xff).toByte
    slack(szAt + 2) = ((cdSize >> 16) & 0xff).toByte
    slack(szAt + 3) = ((cdSize >> 24) & 0xff).toByte
    assert(ZipArchive.members(slack) === None)
    // the unmodified archive still reads
    assert(ZipArchive.members(z).get.map(_.name) === Seq("a.txt", "b.txt"))
  }
}
