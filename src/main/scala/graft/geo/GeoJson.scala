package graft.geo

import org.locationtech.jts.geom._

/** GeoJSON (RFC 7946) geometry codec — the JSON interchange sibling of the
  * WKT surface (SURVEY.md §2 A6): `st_asgeojson` / `st_geomfromgeojson`
  * over the engine's WKB representation. Hand-rolled on both sides so the
  * emitted text is CANONICAL (fixed key order, no whitespace, Java shortest
  * double repr) — byte-stable output for golden fixtures and dedup keys.
  *
  * Scope: the seven RFC geometry types, 2D positions, no `bbox`/foreign
  * members (parser SKIPS unknown members; writer never emits them). CRS is
  * carried by GeoParquet metadata, not inline (RFC 7946 removed inline CRS).
  */
object GeoJson {

  // ---- writer ------------------------------------------------------------

  private def num(d: Double): String = {
    // NaN/Infinity have no JSON representation — "NaN" in coordinates is
    // invalid RFC 7946 the PARSER would then reject, silently breaking the
    // advertised write∘parse identity. Fail loudly at the writer instead.
    if (java.lang.Double.isNaN(d) || d.isInfinite)
      throw new IllegalArgumentException(s"non-finite ordinate in GeoJSON writer: $d")
    // -0.0 is excluded from the integral fast path (0.0 == -0.0 but
    // doubleToRawLongBits differ): it must print "-0.0" to round-trip
    // bit-exactly rather than canonicalize to "0".
    if (d == d.floor && math.abs(d) < 1e15 && d.toLong.toDouble == d &&
      java.lang.Double.doubleToRawLongBits(d) != java.lang.Double.doubleToRawLongBits(-0.0))
      d.toLong.toString // integral doubles print bare: 1 not 1.0 (JSON-idiomatic)
    else d.toString
  }

  private def pos(c: Coordinate): String = s"[${num(c.x)},${num(c.y)}]"
  private def ring(r: LineString): String =
    r.getCoordinates.map(pos).mkString("[", ",", "]")
  private def polyCoords(p: Polygon): String =
    (Seq(ring(p.getExteriorRing)) ++
      (0 until p.getNumInteriorRing).map(i => ring(p.getInteriorRingN(i))))
      .mkString("[", ",", "]")

  def write(g: Geometry): String = g match {
    // POINT EMPTY has a null coordinate in JTS (it is also what WKBReader
    // produces for a non-finite-ordinate point) — RFC 7946 represents
    // every empty geometry as an empty coordinates array
    case p: Point if p.isEmpty => """{"type":"Point","coordinates":[]}"""
    case p: Point => s"""{"type":"Point","coordinates":${pos(p.getCoordinate)}}"""
    case mp: MultiPoint =>
      val cs = (0 until mp.getNumGeometries)
        .map(i => pos(mp.getGeometryN(i).asInstanceOf[Point].getCoordinate))
      s"""{"type":"MultiPoint","coordinates":${cs.mkString("[", ",", "]")}}"""
    case l: LineString => s"""{"type":"LineString","coordinates":${ring(l)}}"""
    case ml: MultiLineString =>
      val cs = (0 until ml.getNumGeometries)
        .map(i => ring(ml.getGeometryN(i).asInstanceOf[LineString]))
      s"""{"type":"MultiLineString","coordinates":${cs.mkString("[", ",", "]")}}"""
    case p: Polygon => s"""{"type":"Polygon","coordinates":${polyCoords(p)}}"""
    case mp: MultiPolygon =>
      val cs = (0 until mp.getNumGeometries)
        .map(i => polyCoords(mp.getGeometryN(i).asInstanceOf[Polygon]))
      s"""{"type":"MultiPolygon","coordinates":${cs.mkString("[", ",", "]")}}"""
    case gc: GeometryCollection =>
      val gs = (0 until gc.getNumGeometries).map(i => write(gc.getGeometryN(i)))
      s"""{"type":"GeometryCollection","geometries":${gs.mkString("[", ",", "]")}}"""
    case other => throw new IllegalArgumentException(
      s"unsupported geometry type: ${other.getGeometryType}")
  }

  // ---- parser ------------------------------------------------------------

  /** Minimal recursive-descent JSON reader for the GeoJSON geometry
    * grammar: objects, arrays, numbers, strings (with escapes), literals.
    * Throws IllegalArgumentException with position info on malformed input
    * — fail loud, never a silently-wrong geometry.
    */
  private final class P(s: String) {
    private var i = 0
    // recursion tracks input nesting; unguarded, 10k bytes of '[' would
    // throw StackOverflowError (an Error, not an exception — it can kill
    // the executor task ungracefully). Valid GeoJSON nests <= 5 levels;
    // 64 leaves headroom while keeping hostile input a clean parse error.
    private var depth = 0
    private def descend(): Unit = {
      depth += 1
      if (depth > 64) err("nesting too deep")
    }
    private def ascend(): Unit = depth -= 1
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"GeoJSON parse error at $i: $msg")
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def eat(c: Char): Unit = { ws(); if (i < s.length && s.charAt(i) == c) i += 1 else err(s"expected '$c'") }
    def peek(): Char = { ws(); if (i < s.length) s.charAt(i) else err("unexpected end") }
    def tryEat(c: Char): Boolean = { ws(); if (i < s.length && s.charAt(i) == c) { i += 1; true } else false }
    def atEnd(): Boolean = { ws(); i >= s.length }

    def string(): String = {
      eat('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length) err("dangling escape")
          s.charAt(i + 1) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'n' => sb.append('\n')
            case 't' => sb.append('\t'); case 'r' => sb.append('\r')
            case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
            case 'u' =>
              if (i + 5 >= s.length) err("short unicode escape")
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 4
            case other => err(s"bad escape \\$other")
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      eat('"')
      sb.toString
    }

    def number(): Double = {
      ws()
      val start = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
      if (i == start) err("expected number")
      try s.substring(start, i).toDouble
      catch { case _: NumberFormatException => err(s"bad number '${s.substring(start, i)}'") }
    }

    /** Skip any JSON value (for unknown members like bbox). */
    def skipValue(): Unit = peek() match {
      case '{' =>
        descend()
        eat('{')
        if (!tryEat('}')) {
          do { string(); eat(':'); skipValue() } while (tryEat(','))
          eat('}')
        }
        ascend()
      case '[' =>
        descend()
        eat('[')
        if (!tryEat(']')) { do skipValue() while (tryEat(',')); eat(']') }
        ascend()
      case '"' => string(); ()
      case 't' | 'f' | 'n' =>
        while (i < s.length && s.charAt(i).isLetter) i += 1
      case _ => number(); ()
    }

    /** Parse nested coordinate arrays to a depth-tagged tree. */
    sealed trait Coords
    case class Pos(x: Double, y: Double) extends Coords
    case class Arr(items: Vector[Coords]) extends Coords

    def coords(): Coords = {
      descend()
      eat('[')
      val out = if (peek() == ']') { // empty geometry (RFC 7946 empties)
        eat(']')
        Arr(Vector.empty)
      } else if (peek() == '[') { // nested array
        val items = Vector.newBuilder[Coords]
        do items += coords() while (tryEat(','))
        eat(']')
        Arr(items.result())
      } else { // position: 2+ numbers, extra ordinates ignored (2D engine)
        val x = number(); eat(','); val y = number()
        while (tryEat(',')) number()
        eat(']')
        Pos(x, y)
      }
      ascend()
      out
    }

    /** Parse one geometry object → JTS. */
    def geometry(gf: GeometryFactory): Geometry = {
      descend()
      eat('{')
      var typ: Option[String] = None
      var cs: Option[Coords] = None
      var geoms: Option[Vector[Geometry]] = None
      if (!tryEat('}')) {
        do {
          val key = string(); eat(':')
          key match {
            case "type" => typ = Some(string())
            case "coordinates" => cs = Some(coords())
            case "geometries" =>
              eat('[')
              val b = Vector.newBuilder[Geometry]
              if (!tryEat(']')) { do b += geometry(gf) while (tryEat(',')); eat(']') }
              geoms = Some(b.result())
            case _ => skipValue() // bbox and foreign members: tolerated
          }
        } while (tryEat(','))
        eat('}')
      }
      val t = typ.getOrElse(err("missing \"type\""))

      def asPos(c: Coords): Coordinate = c match {
        case Pos(x, y) => new Coordinate(x, y)
        case _ => err(s"$t: expected a position")
      }
      def asPosArr(c: Coords): Array[Coordinate] = c match {
        case Arr(items) => items.map(asPos).toArray
        case _ => err(s"$t: expected an array of positions")
      }
      def asRings(c: Coords): Polygon = c match {
        case Arr(items) =>
          val rings = items.map(r => gf.createLinearRing(asPosArr(r)))
          if (rings.isEmpty) err("Polygon: empty coordinates")
          gf.createPolygon(rings.head, rings.tail.toArray)
        case _ => err("Polygon: expected ring arrays")
      }
      def sub(c: Coords): Vector[Coords] = c match {
        case Arr(items) => items
        case _ => err(s"$t: expected nested arrays")
      }

      val g = t match {
        case "Point" => cs.getOrElse(err("missing coordinates")) match {
          case Arr(items) if items.isEmpty => gf.createPoint() // POINT EMPTY
          case c => gf.createPoint(asPos(c))
        }
        case "MultiPoint" =>
          gf.createMultiPoint(
            sub(cs.getOrElse(err("missing coordinates"))).map(p => gf.createPoint(asPos(p))).toArray)
        case "LineString" =>
          gf.createLineString(asPosArr(cs.getOrElse(err("missing coordinates"))))
        case "MultiLineString" =>
          gf.createMultiLineString(
            sub(cs.getOrElse(err("missing coordinates"))).map(l => gf.createLineString(asPosArr(l))).toArray)
        case "Polygon" => asRings(cs.getOrElse(err("missing coordinates")))
        case "MultiPolygon" =>
          gf.createMultiPolygon(
            sub(cs.getOrElse(err("missing coordinates"))).map(asRings).toArray)
        case "GeometryCollection" =>
          gf.createGeometryCollection(geoms.getOrElse(err("missing geometries")).toArray)
        case other => err(s"unknown geometry type '$other'")
      }
      ascend()
      g
    }
  }

  def parse(s: String, gf: GeometryFactory): Geometry = {
    val p = new P(s)
    val g = p.geometry(gf)
    if (!p.atEnd())
      throw new IllegalArgumentException("GeoJSON parse error: trailing content")
    g
  }
}
