package graft

import graft.functions.ZOrder
import graft.geo.GeoParquet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: the Column-algebra Morton code matches a reference
  * bit-interleave, and a clustered GeoParquet write produces files whose
  * bounding boxes are drastically tighter than an unclustered write —
  * which is what makes `__bbox` statistics selective at scale.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference Morton interleave (loop form). */
  private def mortonRef(xi: Long, yi: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((xi >> i) & 1L) << (2 * i)
      z |= ((yi >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("Column-algebra Morton code equals the reference bit interleave") {
    import spark.implicits._
    // quantization over [0, 2^21) with unit cells: zorder quantizes
    // v/(2^21-1)*(2^21-1) = v exactly for integers in range
    val cells = (1L << 21) - 1
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (123456L, 654321L),
      (cells, cells), (cells, 0L), (0L, cells), (1048576L, 2097151L))
    val df = samples.toDF("xi", "yi")
      .select(col("xi"), col("yi"),
        ZOrder.zorder(col("xi").cast("double"), col("yi").cast("double"),
          0.0, 0.0, cells.toDouble, cells.toDouble).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("clustered write: per-file bboxes are far tighter than unclustered") {
    import spark.implicits._
    // deterministic pseudo-random points over [0,1000)^2
    val pts = (0 until 5000).map { i =>
      val h = TextFunctions.splitmix64(i.toLong + 99)
      val x = ((h >>> 11) % 1000000L) / 1000.0
      val y = ((TextFunctions.splitmix64(h) >>> 11) % 1000000L) / 1000.0
      (i.toLong, GeoFunctions.stPointF(x, y))
    }
    val df = pts.toDF("id", "geometry").repartition(8)

    def totalBboxArea(path: String): Double = {
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .select(min(GeoFunctions.st_x(col("geometry"))).as("x0"),
              max(GeoFunctions.st_x(col("geometry"))).as("x1"),
              min(GeoFunctions.st_y(col("geometry"))).as("y0"),
              max(GeoFunctions.st_y(col("geometry"))).as("y1"))
            .collect().head
          (r.getDouble(1) - r.getDouble(0)) * (r.getDouble(3) - r.getDouble(2))
        }.sum
    }

    val plain = "/tmp/graft_test/z_plain"
    val clustered = "/tmp/graft_test/z_clustered"
    GeoParquet.write(df, plain, Seq("geometry"))
    GeoParquet.write(df, clustered, Seq("geometry"), spatialClusterFiles = Some(8))

    val aPlain = totalBboxArea(plain)
    val aClustered = totalBboxArea(clustered)
    // 8 random-content files each span ~the whole extent (sum ≈ 8×10^6);
    // 8 z-range files tile it (sum ≈ 10^6 + fringe). 3x headroom on the
    // ≥4x expected improvement keeps the test robust.
    assert(aClustered < aPlain / 3.0,
      s"clustered=$aClustered plain=$aPlain — clustering had no locality effect")
    // same rows survive
    assert(spark.read.parquet(clustered).count() === 5000)
    assert(GeoParquet.readMetadata(spark, clustered).isDefined)
  }
}
