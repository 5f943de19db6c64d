package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** operators.TarShards — ustar framing round-trip (the e52 export
  * container). Pins the 512-block arithmetic at its boundaries (sizes
  * 0/1/511/512/513), checksum validation (a corrupted header stops the
  * walk without losing parsed members), end-of-archive handling, the
  * distributed writer's shard layout, and that written archives are
  * byte-deterministic (mtime 0 — no wall-clock in the output).
  */
class TarShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import operators.TarShards

  private def member(name: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(TarShards.header(name, body.length.toLong))
    out.write(body)
    val pad = (512 - body.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
    out.toByteArray
  }

  private def archive(members: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach(out.write)
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  test("block-boundary sizes round-trip byte-exact: 0, 1, 511, 512, 513") {
    val bodies = Seq(0, 1, 511, 512, 513).map { n =>
      (s"m$n.bin", Array.tabulate(n)(i => ((i * 7 + n) % 256).toByte))
    }
    val tar = archive(bodies.map { case (n, b) => member(n, b) }: _*)
    val out = TarShards.walkTar(tar)
    assert(out.map(_._1) === bodies.map(_._1).toVector)
    out.zip(bodies).foreach { case ((_, size, content), (_, body)) =>
      assert(size === body.length.toLong)
      assert(content.toSeq === body.toSeq)
    }
  }

  test("corrupted header checksum stops the walk; parsed members survive") {
    val good = member("ok.txt", "hello".getBytes)
    val bad = member("bad.txt", "world".getBytes)
    bad(0) = 'X'.toByte // name change invalidates the stored checksum
    val out = TarShards.walkTar(archive(good, bad))
    assert(out.map(_._1) === Vector("ok.txt"))
  }

  test("member truncated past the archive end is rejected; walk stops") {
    val good = member("ok.txt", "hello".getBytes)
    val cut = member("cut.txt", Array.fill(600)('a'.toByte)).take(700)
    val out = TarShards.walkTar(good ++ cut)
    assert(out.map(_._1) === Vector("ok.txt"))
  }

  test("end-of-archive zero block terminates before trailing garbage") {
    val tar = archive(member("a.txt", "x".getBytes)) ++ Array.fill(512)('Z'.toByte)
    assert(TarShards.walkTar(tar).map(_._1) === Vector("a.txt"))
  }

  test("distributed writer: deterministic shard layout, ordered members, re-run byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("tarspec").toString
    val docs = (0L until 37L).map(i => (i, s"doc $i body " + ("x" * (i * 11 % 700).toInt)))
      .toDF("doc_id", "text")
    TarShards.writeShards(docs, dir, 4)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files === Array("shard-0.tar", "shard-1.tar", "shard-2.tar", "shard-3.tar"))
    val parsed = TarShards.parse(
        spark.read.format("binaryFile").load(dir))
      .select(col("fname"), col("name"), col("content").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(parsed.length === 37)
    parsed.foreach { case (fname, name, body) =>
      val id = name.stripSuffix(".txt").toLong
      assert(fname === s"shard-${id % 4}.tar")
      assert(body === s"doc $id body " + ("x" * (id * 11 % 700).toInt))
    }
    // members are in doc_id order within each shard
    parsed.groupBy(_._1).foreach { case (_, ms) =>
      val ids = ms.map(_._2.stripSuffix(".txt").toLong).toSeq
      assert(ids === ids.sorted)
    }
    // re-run overwrites byte-identically (mtime 0: no wall-clock leaks)
    val first = files.map(f =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$f")).toSeq)
    TarShards.writeShards(docs, dir, 4)
    val second = files.map(f =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$f")).toSeq)
    assert(first.toSeq === second.toSeq)
  }

  test("non-ASCII member bodies: size is the byte length, content survives") {
    val body = "café €10 — naïve".getBytes("UTF-8")
    val out = TarShards.walkTar(archive(member("u.txt", body)))
    assert(out.head._2 === body.length.toLong)
    assert(new String(out.head._3, "UTF-8") === "café €10 — naïve")
  }
}
