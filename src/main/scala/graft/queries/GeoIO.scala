package graft.queries

import graft.{GeoFunctions => G, QueryBlock, QueryDef, Tables}
import graft.geo.GeoParquet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoParquet I/O round-trips (SURVEY.md §2 A1/A2): write a WKB dataset
  * with `geo` footer metadata, read it back through the footer-aware
  * reader, recompute coordinates; the oracle computes the same values
  * straight from the source table — equality proves the round-trip was
  * lossless (non-geo columns AND geometry bytes).
  */
object GeoIO extends QueryBlock {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)
  private val scratch = graft.Graft.scratchDir

  val queries: Map[String, QueryDef] = Map(
    // A1/A2 — point dataset round-trip (+ CRS carry-through A7, asserted in
    // ScalaTest; here the data path).
    "a01_geoparquet_points" -> QueryDef(
      (s, dir) => {
        val out = s"$scratch/geo_points"
        val src = t(s, dir, "customer")
          .filter(col("c_custkey") < 1000)
          .select(col("c_custkey"), col("c_acctbal"),
            G.st_point(col("c_acctbal"), col("c_custkey").cast("double")).as("geometry"))
        GeoParquet.write(src, out, Seq("geometry"))
        GeoParquet.read(s, out)
          .select(col("c_custkey"), col("c_acctbal"),
            G.st_x(col("geometry")).as("x"), G.st_y(col("geometry")).as("y"),
            G.st_geometrytype(col("geometry")).as("gtype"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_acctbal, c_acctbal AS x, CAST(c_custkey AS DOUBLE) AS y,
        'Point' AS gtype
        FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey""")),

    // A2/A3 — footer interop oracle: the `geo` JSON our writer injects is
    // read back by DuckDB's parquet_kv_metadata — a fully independent
    // decoder of the at-rest format (byte-level interop, not just
    // self-round-trip).
    "a03_geo_footer" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val out = s"$scratch/geo_footer"
        val src = t(s, dir, "nation")
          .select(col("n_nationkey"),
            G.st_point(col("n_nationkey").cast("double"),
              col("n_regionkey").cast("double")).as("geometry"))
          .coalesce(1)
        GeoParquet.write(src, out, Seq("geometry"))
        val json = GeoParquet.readMetadata(s, out).get.toJson
        Seq(json).toDF("geo_json")
      },
      Some(s"""SELECT DISTINCT decode(value) AS geo_json
        FROM parquet_kv_metadata('$scratch/geo_footer/*.parquet')
        WHERE decode(key) = 'geo'""")),

    // A3+ — GeoParquet 1.1 covering declaration (r9): the same footer
    // check with `addBboxColumn = true` — the written key must carry the
    // 1.1 `covering` object (four [column, field] bbox paths naming
    // `__bbox_geometry`) and the 1.1.0 version stamp, and DuckDB reads
    // the IDENTICAL bytes back out of the parquet key-value metadata.
    // The a03 oracle shape: the engine under test is the write path.
    "a07_geo_covering" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val out = s"$scratch/geo_covering"
        val src = t(s, dir, "nation")
          .select(col("n_nationkey"),
            G.st_point(col("n_nationkey").cast("double"),
              col("n_regionkey").cast("double")).as("geometry"))
          .coalesce(1)
        GeoParquet.write(src, out, Seq("geometry"), addBboxColumn = true)
        val meta = GeoParquet.readMetadata(s, out).get
        Seq((meta.toJson, meta.version,
          meta.columns("geometry").covering.getOrElse("")))
          .toDF("geo_json", "version", "covering")
      },
      Some(s"""SELECT DISTINCT decode(value) AS geo_json,
          json_extract_string(decode(value), '$$.version') AS version,
          json_extract_string(decode(value),
            '$$.columns.geometry.covering.bbox.xmin[0]') AS covering
        FROM parquet_kv_metadata('$scratch/geo_covering/*.parquet')
        WHERE decode(key) = 'geo'""")),

    // A7 — CRS CARRY-THROUGH as a driver-ORACLE row (r10, the last
    // geo GOLDEN promotion available): a NON-default CRS declared at
    // write time must survive the footer encode, land byte-identically
    // in the parquet key-value metadata (DuckDB reads the same bytes
    // independently), and decode back out through the engine's own
    // metadata reader. The a03 oracle shape — the engine under test is
    // the write+decode path, the oracle is DuckDB's parquet reader.
    "a08_crs_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val out = s"$scratch/geo_crs"
        val src = t(s, dir, "nation")
          .select(col("n_nationkey"),
            G.st_point(col("n_nationkey").cast("double"),
              col("n_regionkey").cast("double")).as("geometry"))
          .coalesce(1)
        GeoParquet.write(src, out, Seq("geometry"), crs = "EPSG:3857")
        val meta = GeoParquet.readMetadata(s, out).get
        Seq(meta.columns("geometry").crs).toDF("crs")
      },
      Some(s"""SELECT DISTINCT json_extract_string(decode(value),
          '$$.columns.geometry.crs') AS crs
        FROM parquet_kv_metadata('$scratch/geo_crs/*.parquet')
        WHERE decode(key) = 'geo'""")),

    // B16 — EWKB SRID round-trip as a driver-ORACLE row (r10): per-row
    // varying SRIDs set through st_setsrid (the EWKB re-encode with the
    // SRID word) must read back exactly through st_srid, AND the
    // geometry's coordinates must survive the re-encode (st_x/st_y
    // decode the EWKB form through the accessor fallback) — a
    // corrupted flag word or a mis-sized SRID write shifts either the
    // srid or a coordinate and goes red.
    "b24_srid_roundtrip" -> QueryDef(
      (s, dir) => {
        val pt = G.st_point(col("c_acctbal"), col("c_custkey").cast("double"))
        t(s, dir, "customer")
          .filter(col("c_custkey") < 400)
          .withColumn("e", G.st_setsrid(pt,
            (lit(3000) + col("c_custkey") % 5).cast("int")))
          .select(col("c_custkey"),
            G.st_srid(col("e")).as("srid"),
            G.st_x(col("e")).as("x"),
            G.st_y(col("e")).as("y"),
            G.st_geometrytype(col("e")).as("gtype"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, CAST(3000 + c_custkey % 5 AS INT) AS srid,
        c_acctbal AS x, CAST(c_custkey AS DOUBLE) AS y, 'Point' AS gtype
        FROM customer WHERE c_custkey < 400 ORDER BY c_custkey""")),

    // A6+ — GeoJSON text interchange (graft.geo.GeoJson): geometry → RFC
    // 7946 text → geometry must be the IDENTICAL WKB (roundtrip_exact,
    // byte equality — constant-true in the oracle), with coordinates and
    // type recomputable in closed form. GOLDEN string fixtures + parser
    // robustness live in GeoJsonSpec.
    "a04_geojson_roundtrip" -> QueryDef(
      (s, dir) => {
        val pt = G.st_point(col("c_acctbal"), col("c_custkey").cast("double"))
        t(s, dir, "customer")
          .filter(col("c_custkey") < 500)
          .withColumn("pt", pt)
          .withColumn("back", G.st_geomfromgeojson(G.st_asgeojson(col("pt"))))
          .select(col("c_custkey"),
            G.st_x(col("back")).as("x"),
            G.st_y(col("back")).as("y"),
            G.st_geometrytype(col("back")).as("gtype"),
            (col("back") === col("pt")).as("roundtrip_exact"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_acctbal AS x, CAST(c_custkey AS DOUBLE) AS y,
        'Point' AS gtype, TRUE AS roundtrip_exact
        FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""")),

    // A6+ — GeoJSON FeatureCollection ingest: the standard .geojson FILE
    // format (one document: features with properties + geometry) read with
    // STOCK Spark multiline JSON for the framing and the engine codec for
    // the geometry — no custom reader needed, which is the point: GeoJSON
    // files become DataFrames with two lines of plumbing. The oracle reads
    // the very same file through DuckDB's JSON functions.
    "a05_geojson_features" -> QueryDef(
      (s, dir) => {
        val path = s"$scratch/features.geojson"
        // deterministic fixture built through the engine's own canonical
        // writer from customer rows (driver-side loop is fixture-gen only)
        val rows = t(s, dir, "customer").filter(col("c_custkey") < 200)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal").cast("double"))
          .collect().sortBy(_.getLong(0))
        val features = rows.map { r =>
          val gj = graft.geo.GeoJson.write(G.fromWkb(
            G.stPointF(r.getDouble(2), r.getLong(0).toDouble)))
          s"""{"type":"Feature","properties":{"key":${r.getLong(0)},"name":"${r.getString(1)}"},"geometry":$gj}"""
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(path),
          s"""{"type":"FeatureCollection","features":[${features.mkString(",")}]}""")
        s.read.option("multiLine", "true").json(path)
          .select(explode(col("features")).as("f"))
          .select(col("f.properties.key").as("key"),
            col("f.properties.name").as("name"),
            G.st_geomfromgeojson(to_json(col("f.geometry"))).as("g"))
          .select(col("key"), col("name"),
            G.st_x(col("g")).as("x"), G.st_y(col("g")).as("y"),
            G.st_geometrytype(col("g")).as("gtype"))
          .orderBy(col("key"))
      },
      Some(s"""WITH fc AS (SELECT features FROM read_json('$scratch/features.geojson',
          format='unstructured', columns={type: 'VARCHAR', features: 'JSON[]'})),
        f AS (SELECT unnest(features) AS feat FROM fc)
        SELECT CAST(feat->'properties'->>'key' AS BIGINT) AS key,
          feat->'properties'->>'name' AS name,
          CAST(feat->'geometry'->'coordinates'->>0 AS DOUBLE) AS x,
          CAST(feat->'geometry'->'coordinates'->>1 AS DOUBLE) AS y,
          feat->'geometry'->>'type' AS gtype
        FROM f ORDER BY key""")),

    // A6 promoted to ORACLE (VERDICT r8 item 7): WKT of points IS
    // deterministic text — JTS's writer prints integer-valued ordinates
    // bare ('POINT (123 247)') and halves as '123.5', exactly the strings
    // DuckDB's integer/double→VARCHAR casts produce — so the full text
    // round-trips through the oracle, not just a GOLDEN fixture. The
    // read-back (st_geomfromtext) re-derives x/y and byte-identical WKB
    // (rt_exact), pinning both directions of A6 in one paired query.
    "a06_wkt_roundtrip" -> QueryDef(
      (s, dir) => {
        val pt = G.st_point(col("c_custkey").cast("double"),
          (col("c_custkey") * 2 + 1).cast("double"))
        val ptH = G.st_point(col("c_custkey").cast("double") + 0.5,
          (col("c_custkey") * 2 + 1).cast("double") + 0.5)
        t(s, dir, "customer")
          .filter(col("c_custkey") < 1000)
          .withColumn("pt", pt)
          .withColumn("wkt", G.st_astext(col("pt")))
          .withColumn("back", G.st_geomfromtext(col("wkt")))
          .select(col("c_custkey"),
            col("wkt"),
            G.st_astext(ptH).as("wkt_half"),
            G.st_x(col("back")).as("x"),
            G.st_y(col("back")).as("y"),
            (col("back") === col("pt")).as("rt_exact"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
        'POINT (' || CAST(c_custkey AS VARCHAR) || ' '
          || CAST(c_custkey * 2 + 1 AS VARCHAR) || ')' AS wkt,
        'POINT (' || CAST(CAST(c_custkey AS DOUBLE) + 0.5 AS VARCHAR) || ' '
          || CAST(CAST(c_custkey * 2 + 1 AS DOUBLE) + 0.5 AS VARCHAR) || ')' AS wkt_half,
        CAST(c_custkey AS DOUBLE) AS x,
        CAST(c_custkey * 2 + 1 AS DOUBLE) AS y,
        TRUE AS rt_exact
        FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey""")),

    // A2 — polygon dataset round-trip; measures recomputed after re-read
    // (area is bit-exact for axis-aligned boxes — Geometry.scala notes).
    "a02_geoparquet_polygons" -> QueryDef(
      (s, dir) => {
        val out = s"$scratch/geo_boxes"
        val src = t(s, dir, "part")
          .filter(col("p_partkey") < 500)
          .select(col("p_partkey"),
            G.st_makebox(lit(0.0), lit(0.0),
              col("p_size").cast("double"), col("p_retailprice")).as("geometry"))
        GeoParquet.write(src, out, Seq("geometry"))
        GeoParquet.read(s, out)
          .select(col("p_partkey"),
            G.st_area(col("geometry")).as("area"),
            G.st_npoints(col("geometry")).as("npts"),
            G.st_geometrytype(col("geometry")).as("gtype"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, CAST(p_size AS DOUBLE) * p_retailprice AS area,
        5 AS npts, 'Polygon' AS gtype
        FROM part WHERE p_partkey < 500 ORDER BY p_partkey"""))
  )
}
