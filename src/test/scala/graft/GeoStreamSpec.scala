package graft

import graft.streaming.GeoStreamWriter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming GeoParquet ingest: file-stream source → st_point transform →
  * per-batch GeoParquet sink; every batch directory carries the geo
  * footer, and the union reads back complete.
  */
class GeoStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed points land as GeoParquet batches with footers") {
    import spark.implicits._
    val srcDir = "/tmp/graft_test/geostream_src"
    val outDir = "/tmp/graft_test/geostream_out"
    val ckpt = "/tmp/graft_test/geostream_ckpt"
    Seq(srcDir, outDir, ckpt).foreach { d =>
      val f = new java.io.File(d)
      if (f.exists()) {
        def rm(x: java.io.File): Unit = {
          if (x.isDirectory) x.listFiles().foreach(rm)
          x.delete()
        }
        rm(f)
      }
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    (0 until 40).map(i => s"$i,${i * 1.5},${i * -0.5}")
      .grouped(20).zipWithIndex.foreach { case (lines, i) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$srcDir/part$i.csv"),
          lines.mkString("\n").getBytes("UTF-8"))
      }

    val stream = spark.readStream
      .schema("id LONG, x DOUBLE, y DOUBLE")
      .option("maxFilesPerTrigger", "1") // force ≥2 micro-batches
      .csv(srcDir)
      .select(col("id"), GeoFunctions.st_point(col("x"), col("y")).as("geometry"))

    stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(GeoStreamWriter.sink(outDir, "geometry"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination(120000)

    val batches = new java.io.File(outDir).listFiles().filter(_.getName.startsWith("batch="))
    assert(batches.length >= 2, s"want ≥2 batch dirs, got ${batches.map(_.getName).toSeq}")
    batches.foreach { b =>
      val meta = graft.geo.GeoParquet.readMetadata(spark, b.getAbsolutePath)
      assert(meta.isDefined && meta.get.primaryColumn === "geometry", b.getName)
    }
    val back = GeoStreamWriter.readAll(spark, outDir)
    assert(back.count() === 40)
    assert(back.select(GeoFunctions.st_x(col("geometry")).as("x")).agg(max("x"))
      .collect().head.getDouble(0) === 39 * 1.5)
  }
}
