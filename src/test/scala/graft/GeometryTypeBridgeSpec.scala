package graft

import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Native GeometryType bridge (SURVEY.md §2 B16/A4 stretch): Spark 4.1
  * ships built-in `st_geomfromwkb`/`st_asbinary` behind
  * spark.sql.geospatial.enabled. PROP: graft's canonical WKB (2D,
  * little-endian, no SRID) round-trips through the native GEOMETRY type
  * byte-for-byte — the engine's at-rest representation is forward
  * compatible with Spark's native type, so a future migration is a type
  * annotation, not a data rewrite.
  */
class GeometryTypeBridgeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.geospatial.enabled", "true")
    s
  }
  private val gf = new GeometryFactory()

  private def samples[A](g: Gen[A], n: Int = 30): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val coord = Gen.chooseNum(-180.0, 180.0)

  private def assertRoundtrips(wkbs: Seq[Array[Byte]]): Unit = {
    import spark.implicits._
    val rows = wkbs.toDF("g")
      .selectExpr("g", "st_asbinary(st_geomfromwkb(g)) AS rt")
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]](1).toSeq === r.getAs[Array[Byte]](0).toSeq)
    }
  }

  test("PROP: canonical point WKB round-trips the native GEOMETRY type byte-for-byte") {
    assertRoundtrips(samples(Gen.zip(coord, coord)).map { case (x, y) =>
      GeoFunctions.toWkb(gf.createPoint(new Coordinate(x, y)))
    })
  }

  test("PROP: canonical polygon (box) WKB round-trips byte-for-byte") {
    assertRoundtrips(
      samples(Gen.zip(coord, coord, Gen.chooseNum(0.1, 50.0), Gen.chooseNum(0.1, 50.0)), 20)
        .map { case (x, y, w, h) => GeoFunctions.stMakeBoxF(x, y, x + w, y + h) })
  }

  test("mixed-type WKB (point + polygon + multipoint) survives the native type") {
    val geoms = Seq(
      GeoFunctions.toWkb(gf.createPoint(new Coordinate(1.0, 2.0))),
      GeoFunctions.stMakeBoxF(0.0, 0.0, 5.0, 5.0),
      GeoFunctions.toWkb(gf.createMultiPointFromCoords(
        Array(new Coordinate(-1, -1), new Coordinate(3, 4)))))
    assertRoundtrips(geoms)
  }
}
