package graft

import org.scalatest.funsuite.AnyFunSuite

/** GOLDEN + PROP tier for the GeoJSON codec (geo.GeoJson): byte-stable
  * canonical output for known geometries, write∘parse identity over every
  * geometry type, and strict-parser robustness (tolerate foreign members,
  * reject malformed text loudly).
  */
class GeoJsonSpec extends AnyFunSuite {
  import GeoFunctions._

  private def roundTrip(wkt: String): Unit = {
    val wkb = stGeomFromTextF(wkt)
    val json = stAsGeoJsonF(wkb)
    assert(stGeomFromGeoJsonF(json).sameElements(wkb),
      s"$wkt did not round-trip through $json")
  }

  test("GOLDEN: canonical output strings") {
    assert(stAsGeoJsonF(stPointF(1.0, 2.5)) ===
      """{"type":"Point","coordinates":[1,2.5]}""")
    assert(stAsGeoJsonF(stGeomFromTextF("LINESTRING (0 0, 1 1, 2 0)")) ===
      """{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}""")
    assert(stAsGeoJsonF(stMakeBoxF(0, 0, 2, 1)) ===
      """{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,1],[0,1],[0,0]]]}""")
    assert(stAsGeoJsonF(stGeomFromTextF("MULTIPOINT ((1 2), (3 4))")) ===
      """{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""")
    assert(stAsGeoJsonF(stGeomFromTextF(
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")) ===
      """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1,2]},{"type":"LineString","coordinates":[[0,0],[1,1]]}]}""")
  }

  test("PROP: write then parse is the identity for every geometry type") {
    Seq(
      "POINT (3.25 -7.5)",
      "MULTIPOINT ((1 2), (3 4), (5 6))",
      "LINESTRING (0 0, 1.5 2.25, -3 4)",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      // polygon with a hole
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))"
    ).foreach(roundTrip)
  }

  test("writer: -0.0 round-trips bit-exactly; empties and non-finite ordinates handled") {
    // -0.0 must not canonicalize to "0": the WKB identity is BIT identity
    val negZero = stPointF(-0.0, 2.0)
    val json = stAsGeoJsonF(negZero)
    assert(json === """{"type":"Point","coordinates":[-0.0,2]}""")
    assert(stGeomFromGeoJsonF(json).sameElements(negZero))
    // a non-finite-ordinate point reads back from WKB as POINT EMPTY (JTS
    // semantics) — RFC 7946 empties are an empty coordinates array, and
    // they round-trip
    val emptyJson = stAsGeoJsonF(stPointF(Double.NaN, 1.0))
    assert(emptyJson === """{"type":"Point","coordinates":[]}""")
    assert(stAsGeoJsonF(stGeomFromGeoJsonF(emptyJson)) === emptyJson)
    // non-finite ordinates that genuinely reach the writer (possible in
    // non-point geometries) have no JSON representation: fail loudly
    // rather than emit text the parser would reject
    val gfac = new org.locationtech.jts.geom.GeometryFactory()
    val badLine = gfac.createLineString(Array(
      new org.locationtech.jts.geom.Coordinate(0, 0),
      new org.locationtech.jts.geom.Coordinate(Double.PositiveInfinity, 1)))
    intercept[IllegalArgumentException] { geo.GeoJson.write(badLine) }
  }

  test("parser: whitespace, member order, foreign members and bbox tolerated") {
    val messy =
      """ { "bbox" : [0, 0, 4, 4],
            "coordinates" : [ 1.0 , 2.0 ],
            "extra" : { "nested": [true, null, "s"] },
            "type" : "Point" } """
    assert(stGeomFromGeoJsonF(messy).sameElements(stPointF(1.0, 2.0)))
    // 3D positions: extra ordinates ignored (2D engine)
    assert(stGeomFromGeoJsonF("""{"type":"Point","coordinates":[1,2,99]}""")
      .sameElements(stPointF(1.0, 2.0)))
  }

  test("parser: malformed input fails loudly, never a silent wrong geometry") {
    Seq(
      """{"coordinates":[1,2]}""", // missing type
      """{"type":"Point"}""", // missing coordinates
      """{"type":"Pointy","coordinates":[1,2]}""", // unknown type
      """{"type":"Point","coordinates":[1,2]} trailing""", // trailing content
      """{"type":"Point","coordinates":[1]}""", // short position
      """{"type":"Polygon","coordinates":[[[0,0],[1,0]]]}""" // open ring (JTS rejects)
    ).foreach { bad =>
      assertThrows[IllegalArgumentException](stGeomFromGeoJsonF(bad))
    }
    assert(stGeomFromGeoJsonF(null) === null)
    assert(stAsGeoJsonF(null) === null)
  }

  test("parser: pathological nesting is a clean parse error, not a StackOverflowError") {
    // 10k opening brackets would otherwise recurse the executor stack into
    // an Error; the depth guard turns it into the normal failure mode
    val bomb = """{"type":"Point","coordinates":""" + "[" * 10000
    assertThrows[IllegalArgumentException](stGeomFromGeoJsonF(bomb))
    val bboxBomb = """{"bbox":""" + "[" * 10000
    assertThrows[IllegalArgumentException](stGeomFromGeoJsonF(bboxBomb))
    // wide-but-shallow stays fine: a collection of 100 sibling points
    val wide = (1 to 100).map(i =>
      s"""{"type":"Point","coordinates":[$i,$i]}""").mkString(
      """{"type":"GeometryCollection","geometries":[""", ",", "]}")
    assert(GeoFunctions.fromWkb(stGeomFromGeoJsonF(wide)).getNumGeometries === 100)
  }
}
