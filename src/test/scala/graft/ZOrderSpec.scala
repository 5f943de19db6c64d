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
    val cells = (1L << 21) - 1
    // mirror quant's double arithmetic exactly (same op order), so the
    // assertion tests the INTERLEAVE and not an unguaranteed float
    // identity like v/(2^21-1)*(2^21-1) == v
    def quantRef(v: Long): Long = {
      val scaled = (v.toDouble - 0.0) / cells.toDouble * cells.toDouble
      math.floor(math.min(math.max(scaled, 0.0), cells.toDouble)).toLong
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (123456L, 654321L),
      (cells, cells), (cells, 0L), (0L, cells), (1048576L, 2097151L),
      (77777L, 1999999L), (31L, 1L << 20))
    val df = samples.toDF("xi", "yi")
      .select(col("xi"), col("yi"),
        ZOrder.zorder(col("xi").cast("double"), col("yi").cast("double"),
          0.0, 0.0, cells.toDouble, cells.toDouble).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === mortonRef(quantRef(r.getLong(0)), quantRef(r.getLong(1))),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("degenerate bbox (one axis collapsed) and out-of-range inputs do not crash under ANSI") {
    import spark.implicits._
    // all points on y = 5: ymin == ymax in the global envelope
    val rows = Seq((0.0, 5.0), (10.0, 5.0), (1e18, 5.0), (-1e18, 5.0))
      .toDF("x", "y")
      .select(ZOrder.zorder(col("x"), col("y"), 0.0, 5.0, 10.0, 5.0).as("z"))
      .collect()
    assert(rows.length === 4)
    // far-out x clamps to the edge cells rather than overflowing the cast
    assert(rows.map(_.getLong(0)).forall(z => z >= 0L))
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
