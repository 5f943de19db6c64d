package graft

import graft.functions.StEnvelope
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.io.WKBWriter
import org.scalatest.funsuite.AnyFunSuite

/** Native byte-walking st_envelope vs the JTS UDF: identical values over
  * the full 2D WKB grammar, both endiannesses, and the plan carries the
  * Expression (no ScalaUDF) on the covering-column path.
  */
class StEnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val gf = new GeometryFactory()

  private def envOf(wkb: Array[Byte]): (Double, Double, Double, Double) = {
    import spark.implicits._
    val r = Seq(wkb).toDF("g")
      .select(GeoFunctions.stEnvelopeStruct(col("g")).as("e"))
      .select("e.xmin", "e.ymin", "e.xmax", "e.ymax").collect().head
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("matches the JTS UDF on points, lines, polygons, multis (little-endian)") {
    val geoms = Seq(
      gf.createPoint(new Coordinate(3.5, -2.25)),
      gf.createLineString(Array(new Coordinate(0, 0), new Coordinate(10, 5), new Coordinate(-3, 7))),
      gf.createPolygon(Array(new Coordinate(1, 1), new Coordinate(4, 1),
        new Coordinate(4, 9), new Coordinate(1, 9), new Coordinate(1, 1))),
      gf.createMultiPointFromCoords(Array(new Coordinate(-5, -5), new Coordinate(2, 8))),
      gf.createGeometryCollection(Array(
        gf.createPoint(new Coordinate(100, 200)),
        gf.createLineString(Array(new Coordinate(-1, -1), new Coordinate(0, 0))))))
    geoms.foreach { g =>
      val wkb = GeoFunctions.toWkb(g)
      val e = g.getEnvelopeInternal
      assert(envOf(wkb) === ((e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)), g.toText)
    }
  }

  test("big-endian WKB walks identically") {
    val g = gf.createPolygon(Array(new Coordinate(-7, 2), new Coordinate(3, 2),
      new Coordinate(3, 11), new Coordinate(-7, 11), new Coordinate(-7, 2)))
    val be = new WKBWriter(2, 1).write(g) // ByteOrderValues.BIG_ENDIAN
    assert(envOf(be) === ((-7.0, 2.0, 3.0, 11.0)))
  }

  test("unknown grammar falls back to JTS (SRID-bearing EWKB)") {
    val g = gf.createPoint(new Coordinate(6.0, 7.0))
    g.setSRID(4326)
    val ewkb = new WKBWriter(2, 2, true).write(g) // includeSRID: flagged type
    assert(envOf(ewkb) === ((6.0, 7.0, 6.0, 7.0)))
  }

  test("covering-column plan uses the native expression, not a ScalaUDF") {
    // non-literal source so constant folding can't evaluate the projection
    // at plan time (a folded StEnvelope is fine, but proves nothing here)
    val df = spark.range(10).toDF("id")
      .select(GeoFunctions.st_point(col("id").cast("double"), lit(0.0)).as("g"))
      .select(GeoFunctions.stEnvelopeStruct(col("g")).as("__bbox"))
    val hasNative = df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[StEnvelope]))
    assert(hasNative, df.queryExecution.optimizedPlan.toString)
    assert(df.collect().length === 10)
  }

  test("empty geometry yields NULL (codegen isNull propagation, no NPE)") {
    import spark.implicits._
    val empty = GeoFunctions.toWkb(gf.createPolygon()) // POLYGON EMPTY
    val point = GeoFunctions.toWkb(gf.createPoint(new Coordinate(1, 1)))
    // non-literal source so the projection goes through whole-stage codegen
    val rows = Seq((0L, empty), (1L, point)).toDF("id", "g")
      .repartition(2)
      .select(col("id"), GeoFunctions.stEnvelopeStruct(col("g")).as("e"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1), "empty geometry must produce a NULL struct")
    assert(rows(1).getStruct(1).getDouble(0) === 1.0)
  }

  test("SQL name st_envelope_native is registered") {
    import spark.implicits._
    val wkb = GeoFunctions.toWkb(gf.createPoint(new Coordinate(5, -5)))
    val r = Seq(wkb).toDF("g")
      .selectExpr("st_envelope_native(g) AS e").select("e.xmin", "e.ymax").collect().head
    assert(r.getDouble(0) === 5.0 && r.getDouble(1) === -5.0)
  }
}
