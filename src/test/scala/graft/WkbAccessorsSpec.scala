package graft

import graft.functions.WkbCoordinate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native StX/StY expressions: fast byte path must agree with the JTS UDFs
  * on points (both endiannesses), and fall back correctly for non-point
  * and EWKB inputs.
  */
class WkbAccessorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fast path agrees with JTS on LE points; direct byte decode exact") {
    val wkb = GeoFunctions.stPointF(123.456, -78.9)
    assert(WkbCoordinate.read(wkb, 5) === 123.456)
    assert(WkbCoordinate.read(wkb, 13) === -78.9)
  }

  test("big-endian points decode via the byte-order flag") {
    val g = GeoFunctions.fromWkb(GeoFunctions.stPointF(1.5, 2.5))
    val be = new org.locationtech.jts.io.WKBWriter(2, 1, false).write(g) // XDR
    assert(be(0) === 0.toByte)
    assert(WkbCoordinate.read(be, 5) === 1.5)
    assert(WkbCoordinate.read(be, 13) === 2.5)
  }

  test("non-point and EWKB inputs fall back to JTS") {
    val box = GeoFunctions.stMakeBoxF(3.0, 4.0, 10.0, 12.0)
    assert(WkbCoordinate.read(box, 5) === 3.0) // first ring coordinate
    val srid = GeoFunctions.stSetSridF(GeoFunctions.stPointF(7.0, 8.0), 4326)
    assert(srid.length !== 21) // EWKB with SRID: not the fast-path shape
    assert(WkbCoordinate.read(srid, 5) === 7.0)
    assert(WkbCoordinate.read(srid, 13) === 8.0)
  }

  test("SQL st_x/st_y route to the native expression inside codegen") {
    Graft.prepare(spark)
    val df = spark.range(100).toDF("id")
      .withColumn("pt", GeoFunctions.st_point(col("id").cast("double") * 1.5,
        col("id").cast("double") * -2.0))
      .selectExpr("id", "st_x(pt) AS x", "st_y(pt) AS y")
    df.collect().foreach { r =>
      assert(r.getDouble(1) === r.getLong(0) * 1.5)
      assert(r.getDouble(2) === r.getLong(0) * -2.0)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("st_x(pt") && !plan.toLowerCase.contains("scalaudf"),
      s"expected native expression in plan:\n$plan")
  }
}
