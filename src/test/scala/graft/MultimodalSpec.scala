package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E12 plumbing: binaryFile -> batched mapPartitions feature extraction.
  * The decode is a documented stub; schema, batch shape and determinism
  * are the real assertions.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def blobs = {
    val dir = "/tmp/graft_test/mm_blobs"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    (0 until 10).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"$dir/img$i%02d.bin"),
        s"fake-image-payload-$i".getBytes("UTF-8"))
    }
    spark.read.format("binaryFile").load(dir)
  }

  test("feature extraction: schema, row count, determinism, feature dim") {
    val out = Multimodal.extractImageFeatures(blobs, batchSize = 3)
    assert(out.schema === Multimodal.featureSchema)
    val rows = out.orderBy(col("path")).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Seq[Float]]("features").length === Multimodal.FeatureDim)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("channels") === 3)
    }
    // determinism across runs
    val again = Multimodal.extractImageFeatures(blobs, batchSize = 7)
      .orderBy(col("path")).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("audio decode stub: valid rate, deterministic") {
    val c = "audio-bytes".getBytes("UTF-8")
    val (rate, n, feats) = Multimodal.decodeAudioStub(c)
    assert(Set(8000, 16000, 22050, 44100, 48000).contains(rate))
    assert(n >= 1000 && feats.length === Multimodal.FeatureDim)
    assert(Multimodal.decodeAudioStub(c)._3.toSeq === feats.toSeq)
  }

  test("frame sampling stub: n frames, deterministic") {
    val c = "video-bytes".getBytes("UTF-8")
    val f1 = Multimodal.frameSampleStub(c, 4)
    val f2 = Multimodal.frameSampleStub(c, 4)
    assert(f1.length === 4)
    assert(f1.map(_.toSeq).toSeq === f2.map(_.toSeq).toSeq)
    assert(f1(0).toSeq !== f1(1).toSeq)
  }
}
