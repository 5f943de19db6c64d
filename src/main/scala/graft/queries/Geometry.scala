package graft.queries

import graft.{GeoFunctions => G, QueryBlock, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geometry functions over WKB (SURVEY.md §2 block B), oracle-paired per
  * §5.2's coordinate-level strategy: geometries are built FROM table columns
  * (so both engines see identical doubles), Spark computes via JTS-on-WKB,
  * DuckDB computes the same quantity in closed-form coordinate SQL (its
  * spatial extension can't install offline).
  *
  * Exactness notes:
  *  - box area is bit-exact: JTS's shoelace over an axis-aligned ring based
  *    at the first vertex reduces to exactly w*h (one rounding), the same
  *    double the oracle's (xmax-xmin)*(ymax-ymin) produces;
  *  - box perimeter is exact: axis-aligned segment lengths are exact abs
  *    diffs folded in ring order — the oracle repeats that fold;
  *  - point distances round 6dp (JTS may use hypot; last-ulp vs sqrt);
  *  - predicates are exact booleans (pure comparisons on both sides; JTS
  *    boundary semantics spelled out in the oracle: contains = interior).
  */
object Geometry extends QueryBlock {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val queries: Map[String, QueryDef] = Map(
    // B1/B2/B3 — point build + accessors round-trip through WKB. The
    // accessors go through the SQL names, i.e. the NATIVE codegen'd
    // StX/StY expressions (functions.WkbAccessors), not the UDFs.
    "b01_point_xy" -> QueryDef(
      (s, dir) => {
        val pt = G.st_point(col("c_acctbal"), col("c_custkey").cast("double"))
        t(s, dir, "customer")
          .filter(col("c_custkey") < 500)
          .withColumn("pt", pt)
          .selectExpr("c_custkey",
            "st_x(pt) AS x", "st_y(pt) AS y",
            "st_geometrytype(pt) AS gtype",
            "st_npoints(pt) AS npts")
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_acctbal AS x, CAST(c_custkey AS DOUBLE) AS y,
        'Point' AS gtype, 1 AS npts
        FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""")),

    // B4/B5/B7/B8/B15 — box area (bit-exact), perimeter (exact fold),
    // centroid (round 6), envelope (exact min/max), npoints.
    "b04_box_measures" -> QueryDef(
      (s, dir) => {
        val box = G.st_makebox(lit(0.0), lit(0.0),
          col("p_size").cast("double"), col("p_retailprice"))
        val env = G.stEnvelopeStruct(box)
        t(s, dir, "part")
          .select(col("p_partkey"),
            G.st_area(box).as("area"),
            G.st_length(box).as("perimeter"),
            round(G.st_x(G.st_centroid(box)), 6).as("cx"),
            round(G.st_y(G.st_centroid(box)), 6).as("cy"),
            env.getField("xmax").as("xmax"),
            env.getField("ymax").as("ymax"),
            G.st_npoints(box).as("npts"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
        CAST(p_size AS DOUBLE) * p_retailprice AS area,
        ((CAST(p_size AS DOUBLE) + p_retailprice) + CAST(p_size AS DOUBLE)) + p_retailprice AS perimeter,
        round(CAST(p_size AS DOUBLE) / 2, 6) AS cx,
        round(p_retailprice / 2, 6) AS cy,
        CAST(p_size AS DOUBLE) AS xmax,
        p_retailprice AS ymax,
        5 AS npts
        FROM part ORDER BY p_partkey""")),

    // B6/B11 — point-to-point distance + dwithin (round 6: hypot-vs-sqrt
    // last-ulp; the boolean compares unrounded on both sides).
    "b06_distance" -> QueryDef(
      (s, dir) => {
        val pa = G.st_point(col("c_acctbal"), lit(0.0))
        val pb = G.st_point(col("c_custkey").cast("double"), lit(0.0))
        t(s, dir, "customer")
          .filter(col("c_custkey") < 1000)
          .select(col("c_custkey"),
            round(G.st_distance(pa, pb), 6).as("dist"),
            G.st_dwithin(pa, pb, lit(2000.0)).as("near"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
        round(abs(c_acctbal - CAST(c_custkey AS DOUBLE)), 6) AS dist,
        abs(c_acctbal - CAST(c_custkey AS DOUBLE)) <= 2000.0 AS near
        FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey""")),

    // B9/B10 — containment/intersection predicates, JTS boundary semantics
    // (contains = interior only; intersects includes the boundary).
    "b09_predicates" -> QueryDef(
      (s, dir) => {
        val boxCol = G.st_makebox(lit(0.0), lit(10.0), lit(5000.0), lit(80.0))
        val pt = G.st_point(col("c_acctbal"), pmod(col("c_custkey"), lit(100)).cast("double"))
        t(s, dir, "customer")
          .select(col("c_custkey"),
            G.st_contains(boxCol, pt).as("inside"),
            G.st_within(pt, boxCol).as("within_box"),
            G.st_intersects(pt, boxCol).as("touches_or_in"),
            G.st_disjoint(pt, boxCol).as("outside"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
        (c_acctbal > 0.0 AND c_acctbal < 5000.0
          AND CAST(c_custkey % 100 AS DOUBLE) > 10.0 AND CAST(c_custkey % 100 AS DOUBLE) < 80.0) AS inside,
        (c_acctbal > 0.0 AND c_acctbal < 5000.0
          AND CAST(c_custkey % 100 AS DOUBLE) > 10.0 AND CAST(c_custkey % 100 AS DOUBLE) < 80.0) AS within_box,
        (c_acctbal >= 0.0 AND c_acctbal <= 5000.0
          AND CAST(c_custkey % 100 AS DOUBLE) >= 10.0 AND CAST(c_custkey % 100 AS DOUBLE) <= 80.0) AS touches_or_in,
        NOT (c_acctbal >= 0.0 AND c_acctbal <= 5000.0
          AND CAST(c_custkey % 100 AS DOUBLE) >= 10.0 AND CAST(c_custkey % 100 AS DOUBLE) <= 80.0) AS outside
        FROM customer ORDER BY c_custkey""")),

    // B17 — bbox range join: box pairs with intersecting envelopes via pure
    // range predicates (the grid-salted equi-join is the 100 TB path; the
    // declared semantics are these conjunctive inequalities).
    "b17_bbox_join" -> QueryDef(
      (s, dir) => {
        val sup = t(s, dir, "supplier").filter(col("s_suppkey") <= 100)
          .select(col("s_suppkey"),
            col("s_acctbal").as("a_xmin"),
            (col("s_acctbal") + 500.0).as("a_xmax"),
            (col("s_nationkey").cast("double") * 10.0).as("a_ymin"),
            (col("s_nationkey").cast("double") * 10.0 + 100.0).as("a_ymax"))
        val cust = t(s, dir, "customer").filter(col("c_custkey") <= 200)
          .select(col("c_custkey"),
            col("c_acctbal").as("b_xmin"),
            (col("c_acctbal") + 500.0).as("b_xmax"),
            (col("c_nationkey").cast("double") * 10.0).as("b_ymin"),
            (col("c_nationkey").cast("double") * 10.0 + 100.0).as("b_ymax"))
        // Predicate on envelopes; JTS st_intersects on the same boxes agrees
        // (verified by construction: axis-aligned, closed boundaries).
        sup.join(cust,
            col("a_xmin") <= col("b_xmax") && col("b_xmin") <= col("a_xmax") &&
            col("a_ymin") <= col("b_ymax") && col("b_ymin") <= col("a_ymax"))
          .select(col("s_suppkey"), col("c_custkey"))
          .orderBy(col("s_suppkey"), col("c_custkey"))
      },
      Some("""WITH a AS (SELECT s_suppkey, s_acctbal AS a_xmin, s_acctbal + 500.0 AS a_xmax,
          CAST(s_nationkey AS DOUBLE) * 10.0 AS a_ymin, CAST(s_nationkey AS DOUBLE) * 10.0 + 100.0 AS a_ymax
          FROM supplier WHERE s_suppkey <= 100),
        b AS (SELECT c_custkey, c_acctbal AS b_xmin, c_acctbal + 500.0 AS b_xmax,
          CAST(c_nationkey AS DOUBLE) * 10.0 AS b_ymin, CAST(c_nationkey AS DOUBLE) * 10.0 + 100.0 AS b_ymax
          FROM customer WHERE c_custkey <= 200)
        SELECT s_suppkey, c_custkey FROM a JOIN b
          ON a_xmin <= b_xmax AND b_xmin <= a_xmax
         AND a_ymin <= b_ymax AND b_ymin <= a_ymax
        ORDER BY s_suppkey, c_custkey""")),

    // B17b — the SAME bbox join through the grid-cell equi-join rewrite
    // (operators.SpatialJoin — the shuffle-partitioned 100 TB path),
    // sharing b17's oracle: path equivalence proven on oracle data.
    "b17b_grid_join" -> QueryDef(
      (s, dir) => {
        val sup = t(s, dir, "supplier").filter(col("s_suppkey") <= 100)
          .select(col("s_suppkey"),
            col("s_acctbal").as("xmin"),
            (col("s_nationkey").cast("double") * 10.0).as("ymin"),
            (col("s_acctbal") + 500.0).as("xmax"),
            (col("s_nationkey").cast("double") * 10.0 + 100.0).as("ymax"))
        val cust = t(s, dir, "customer").filter(col("c_custkey") <= 200)
          .select(col("c_custkey"),
            col("c_acctbal").as("xmin"),
            (col("c_nationkey").cast("double") * 10.0).as("ymin"),
            (col("c_acctbal") + 500.0).as("xmax"),
            (col("c_nationkey").cast("double") * 10.0 + 100.0).as("ymax"))
        graft.operators.SpatialJoin.bboxIntersectJoin(sup, cust, cell = 500.0)
          .select(col("lid").as("s_suppkey"), col("rid").as("c_custkey"))
          .orderBy(col("s_suppkey"), col("c_custkey"))
      },
      Some("""WITH a AS (SELECT s_suppkey, s_acctbal AS a_xmin, s_acctbal + 500.0 AS a_xmax,
          CAST(s_nationkey AS DOUBLE) * 10.0 AS a_ymin, CAST(s_nationkey AS DOUBLE) * 10.0 + 100.0 AS a_ymax
          FROM supplier WHERE s_suppkey <= 100),
        b AS (SELECT c_custkey, c_acctbal AS b_xmin, c_acctbal + 500.0 AS b_xmax,
          CAST(c_nationkey AS DOUBLE) * 10.0 AS b_ymin, CAST(c_nationkey AS DOUBLE) * 10.0 + 100.0 AS b_ymax
          FROM customer WHERE c_custkey <= 200)
        SELECT s_suppkey, c_custkey FROM a JOIN b
          ON a_xmin <= b_xmax AND b_xmin <= a_xmax
         AND a_ymin <= b_ymax AND b_ymin <= a_ymax
        ORDER BY s_suppkey, c_custkey""")),

    // B17c — the SAME join written the way a user naturally would: a raw
    // `a JOIN b ON st_intersects(ga, gb)` over box GEOMETRIES. Without
    // intervention Spark plans this as a broadcast nested loop;
    // plans.SpatialJoinRule routes it by data shape — here the supplier
    // side is dim-sized, so the BROADCAST-INDEX route wins (STRtree probe,
    // no shuffle); with the threshold disabled it falls back to the
    // grid-cell equi-join (both asserted in PlanSpec). Shares b17's
    // oracle: every path must produce identical pairs.
    "b17c_intersect_join" -> QueryDef(
      (s, dir) => {
        val sup = t(s, dir, "supplier").filter(col("s_suppkey") <= 100)
          .select(col("s_suppkey"),
            G.st_makebox(col("s_acctbal"), col("s_nationkey").cast("double") * 10.0,
              col("s_acctbal") + 500.0, col("s_nationkey").cast("double") * 10.0 + 100.0).as("ga"))
        val cust = t(s, dir, "customer").filter(col("c_custkey") <= 200)
          .select(col("c_custkey"),
            G.st_makebox(col("c_acctbal"), col("c_nationkey").cast("double") * 10.0,
              col("c_acctbal") + 500.0, col("c_nationkey").cast("double") * 10.0 + 100.0).as("gb"))
        sup.join(cust, G.st_intersects(col("ga"), col("gb")))
          .select(col("s_suppkey"), col("c_custkey"))
          .orderBy(col("s_suppkey"), col("c_custkey"))
      },
      Some("""WITH a AS (SELECT s_suppkey, s_acctbal AS a_xmin, s_acctbal + 500.0 AS a_xmax,
          CAST(s_nationkey AS DOUBLE) * 10.0 AS a_ymin, CAST(s_nationkey AS DOUBLE) * 10.0 + 100.0 AS a_ymax
          FROM supplier WHERE s_suppkey <= 100),
        b AS (SELECT c_custkey, c_acctbal AS b_xmin, c_acctbal + 500.0 AS b_xmax,
          CAST(c_nationkey AS DOUBLE) * 10.0 AS b_ymin, CAST(c_nationkey AS DOUBLE) * 10.0 + 100.0 AS b_ymax
          FROM customer WHERE c_custkey <= 200)
        SELECT s_suppkey, c_custkey FROM a JOIN b
          ON a_xmin <= b_xmax AND b_xmin <= a_xmax
         AND a_ymin <= b_ymax AND b_ymin <= a_ymax
        ORDER BY s_suppkey, c_custkey""")),

    // B17f — the SAME bbox join through the BROADCAST-INDEX path
    // (operators.BroadcastSpatialJoin): supplier is the dim-sized side, so
    // an STRtree over its 100 boxes broadcasts and customer streams through
    // with NO shuffle and NO cell replication — the spatial analogue of a
    // broadcast hash join, sharing b17's oracle (fourth path equivalence).
    "b17f_broadcast_join" -> QueryDef(
      (s, dir) => {
        val sup = t(s, dir, "supplier").filter(col("s_suppkey") <= 100)
          .select(col("s_suppkey"),
            G.st_makebox(col("s_acctbal"), col("s_nationkey").cast("double") * 10.0,
              col("s_acctbal") + 500.0, col("s_nationkey").cast("double") * 10.0 + 100.0).as("ga"))
        val cust = t(s, dir, "customer").filter(col("c_custkey") <= 200)
          .select(col("c_custkey"),
            G.st_makebox(col("c_acctbal"), col("c_nationkey").cast("double") * 10.0,
              col("c_acctbal") + 500.0, col("c_nationkey").cast("double") * 10.0 + 100.0).as("gb"))
        graft.operators.BroadcastSpatialJoin(cust, sup, "gb", "ga", "intersects")
          .select(col("s_suppkey"), col("c_custkey"))
          .orderBy(col("s_suppkey"), col("c_custkey"))
      },
      Some("""WITH a AS (SELECT s_suppkey, s_acctbal AS a_xmin, s_acctbal + 500.0 AS a_xmax,
          CAST(s_nationkey AS DOUBLE) * 10.0 AS a_ymin, CAST(s_nationkey AS DOUBLE) * 10.0 + 100.0 AS a_ymax
          FROM supplier WHERE s_suppkey <= 100),
        b AS (SELECT c_custkey, c_acctbal AS b_xmin, c_acctbal + 500.0 AS b_xmax,
          CAST(c_nationkey AS DOUBLE) * 10.0 AS b_ymin, CAST(c_nationkey AS DOUBLE) * 10.0 + 100.0 AS b_ymax
          FROM customer WHERE c_custkey <= 200)
        SELECT s_suppkey, c_custkey FROM a JOIN b
          ON a_xmin <= b_xmax AND b_xmin <= a_xmax
         AND a_ymin <= b_ymax AND b_ymin <= a_ymax
        ORDER BY s_suppkey, c_custkey""")),

    // B17d — radius join written raw: `pts JOIN qs ON st_dwithin(gp, gq, R)`.
    // plans.SpatialJoinRule expands the point envelopes by R and routes the
    // pair generation onto the grid equi-join (PlanSpec asserts no BNL);
    // the exact sqrt-compare st_dwithin re-runs as the post-filter, so the
    // oracle is the plain relational distance predicate (b06's parity:
    // Java and DuckDB sqrt are both IEEE correctly-rounded).
    "b17d_dwithin_join" -> QueryDef(
      (s, dir) => {
        val pts = t(s, dir, "customer")
          .select(col("c_custkey"),
            G.st_point(col("c_acctbal"),
              pmod(col("c_custkey"), lit(1000)).cast("double")).as("gp"))
        val qs = t(s, dir, "nation").filter(col("n_nationkey") < 5)
          .select(col("n_nationkey").as("qid"),
            G.st_point(col("n_nationkey").cast("double") * 1000.0,
              col("n_nationkey").cast("double") * 100.0).as("gq"))
        pts.join(qs, G.st_dwithin(col("gp"), col("gq"), lit(500.0)))
          .select(col("qid"), col("c_custkey"))
          .orderBy(col("qid"), col("c_custkey"))
      },
      Some("""WITH pts AS (SELECT c_custkey, c_acctbal AS px, CAST(c_custkey % 1000 AS DOUBLE) AS py
          FROM customer),
        qs AS (SELECT n_nationkey AS qid, CAST(n_nationkey AS DOUBLE) * 1000.0 AS qx,
            CAST(n_nationkey AS DOUBLE) * 100.0 AS qy
          FROM nation WHERE n_nationkey < 5)
        SELECT qid, c_custkey FROM pts JOIN qs
          ON sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy)) <= 500.0
        ORDER BY qid, c_custkey""")),

    // B17e — containment join written raw: `boxes JOIN pts ON
    // st_contains(ga, gp)`. Containment implies envelope overlap, so the
    // same routing applies (broadcast-index here: the box side is
    // dim-sized); JTS contains = point in the INTERIOR (strict
    // inequalities — b09's boundary semantics).
    "b17e_contains_join" -> QueryDef(
      (s, dir) => {
        val sup = t(s, dir, "supplier").filter(col("s_suppkey") <= 100)
          .select(col("s_suppkey"),
            G.st_makebox(col("s_acctbal"), col("s_nationkey").cast("double") * 10.0,
              col("s_acctbal") + 500.0, col("s_nationkey").cast("double") * 10.0 + 100.0).as("ga"))
        val cust = t(s, dir, "customer").filter(col("c_custkey") <= 500)
          .select(col("c_custkey"),
            G.st_point(col("c_acctbal"),
              pmod(col("c_custkey"), lit(250)).cast("double")).as("gp"))
        sup.join(cust, G.st_contains(col("ga"), col("gp")))
          .select(col("s_suppkey"), col("c_custkey"))
          .orderBy(col("s_suppkey"), col("c_custkey"))
      },
      Some("""WITH a AS (SELECT s_suppkey, s_acctbal AS axmin, s_acctbal + 500.0 AS axmax,
          CAST(s_nationkey AS DOUBLE) * 10.0 AS aymin, CAST(s_nationkey AS DOUBLE) * 10.0 + 100.0 AS aymax
          FROM supplier WHERE s_suppkey <= 100),
        b AS (SELECT c_custkey, c_acctbal AS px, CAST(c_custkey % 250 AS DOUBLE) AS py
          FROM customer WHERE c_custkey <= 500)
        SELECT s_suppkey, c_custkey FROM a JOIN b
          ON axmin < px AND px < axmax AND aymin < py AND py < aymax
        ORDER BY s_suppkey, c_custkey""")),

    // B18 — spatial KNN join: 5 query points -> 3 nearest customer points.
    "b18_knn_join" -> QueryDef(
      (s, dir) => {
        val pts = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal").as("px"),
            pmod(col("c_custkey"), lit(1000)).cast("double").as("py"))
        val qs = t(s, dir, "nation").filter(col("n_nationkey") < 5)
          .select(col("n_nationkey").as("qid"),
            (col("n_nationkey").cast("double") * 1000.0).as("qx"),
            (col("n_nationkey").cast("double") * 100.0).as("qy"))
        val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("c_custkey"))
        pts.crossJoin(broadcast(qs))
          .select(col("qid"), col("c_custkey"),
            G.st_distance(G.st_point(col("px"), col("py")),
              G.st_point(col("qx"), col("qy"))).as("dist"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("qid"), col("rk"), col("c_custkey"), round(col("dist"), 6).as("dist"))
          .orderBy(col("qid"), col("rk"))
      },
      Some("""WITH pts AS (SELECT c_custkey, c_acctbal AS px, CAST(c_custkey % 1000 AS DOUBLE) AS py
          FROM customer),
        qs AS (SELECT n_nationkey AS qid, CAST(n_nationkey AS DOUBLE) * 1000.0 AS qx,
            CAST(n_nationkey AS DOUBLE) * 100.0 AS qy
          FROM nation WHERE n_nationkey < 5),
        scored AS (SELECT qid, c_custkey, sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy)) AS dist
          FROM pts CROSS JOIN qs),
        ranked AS (SELECT qid, c_custkey, dist,
          CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, c_custkey) AS INT) AS rk
          FROM scored)
        SELECT qid, rk, c_custkey, round(dist, 6) AS dist
        FROM ranked WHERE rk <= 3 ORDER BY qid, rk""")),

    // B19 — dataset extent aggregate (the st_extent_agg every geo engine
    // exposes; GeoParquet.write's footer bbox uses the same fold): min/max
    // over the NATIVE envelope expression, grouped here per nation to make
    // it a real aggregate rather than one global row. Geometry built from
    // numeric columns, so the oracle recomputes the extent relationally.
    "b19_extent_agg" -> QueryDef(
      (s, dir) => {
        val pts = t(s, dir, "customer")
          .select(col("c_nationkey"),
            G.st_point(col("c_acctbal"),
              pmod(col("c_custkey"), lit(1000)).cast("double")).as("geometry"))
        val env = G.stEnvelopeStruct(col("geometry"))
        pts.groupBy(col("c_nationkey"))
          .agg(
            min(env.getField("xmin")).as("xmin"),
            min(env.getField("ymin")).as("ymin"),
            max(env.getField("xmax")).as("xmax"),
            max(env.getField("ymax")).as("ymax"),
            count(lit(1)).as("n"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey,
        min(c_acctbal) AS xmin,
        min(CAST(c_custkey % 1000 AS DOUBLE)) AS ymin,
        max(c_acctbal) AS xmax,
        max(CAST(c_custkey % 1000 AS DOUBLE)) AS ymax,
        count(*) AS n
        FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // B20 — st_collect aggregate: per-group point sets collected into one
    // MULTIPOINT geometry (sorted WKB input for engine-independent bytes),
    // verified through accessors the oracle can recompute in closed form:
    // npoints = the group count, centroid = the coordinate means, type tag
    // constant. The collect itself is sort_array(collect_list(...)) — one
    // partial+final aggregate, no extra shuffle beyond the groupBy.
    "b20_collect_agg" -> QueryDef(
      (s, dir) => {
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") < 2000)
          .select(col("c_nationkey"),
            G.st_point(col("c_acctbal"),
              pmod(col("c_custkey"), lit(1000)).cast("double")).as("pt"))
        pts.groupBy(col("c_nationkey"))
          .agg(sort_array(collect_list(col("pt"))).as("pts"))
          .select(col("c_nationkey"), G.st_collect(col("pts")).as("g"))
          .select(col("c_nationkey"),
            G.st_npoints(col("g")).as("npts"),
            G.st_geometrytype(col("g")).as("gtype"),
            round(G.st_x(G.st_centroid(col("g"))), 6).as("cx"),
            round(G.st_y(G.st_centroid(col("g"))), 6).as("cy"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey,
        CAST(count(*) AS INT) AS npts,
        'MultiPoint' AS gtype,
        round(avg(c_acctbal), 6) AS cx,
        round(avg(CAST(c_custkey % 1000 AS DOUBLE)), 6) AS cy
        FROM customer WHERE c_custkey < 2000
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // B21 — st_makeline + ORACLE-grade st_simplify: per-group polylines of
    // EXACTLY collinear vertices (y = 2x+1 is exact in doubles for integer
    // x), so Douglas-Peucker provably collapses every chain to its 2
    // endpoints — the one geometry where DP output is closed-form. The
    // oracle recomputes endpoint coordinates and the single-segment length
    // from group min/max. start/endpoint accessors ride along.
    "b21_simplify_line" -> QueryDef(
      (s, dir) => {
        val pt = G.st_point(col("c_custkey").cast("double"),
          (col("c_custkey") * 2 + 1).cast("double"))
        t(s, dir, "customer")
          .filter(col("c_custkey") < 2000)
          .select(col("c_nationkey"), col("c_custkey"), pt.as("pt"))
          .groupBy(col("c_nationkey"))
          .agg(sort_array(collect_list(struct(col("c_custkey"), col("pt")))).as("sp"))
          .withColumn("line", G.st_makeline(expr("transform(sp, s -> s.pt)")))
          .withColumn("simp", G.st_simplify(col("line"), lit(0.5)))
          .select(col("c_nationkey"),
            G.st_npoints(col("line")).as("n_before"),
            G.st_npoints(col("simp")).as("n_after"),
            G.st_x(G.st_startpoint(col("simp"))).as("x0"),
            G.st_y(G.st_startpoint(col("simp"))).as("y0"),
            G.st_x(G.st_endpoint(col("simp"))).as("x1"),
            G.st_y(G.st_endpoint(col("simp"))).as("y1"),
            round(G.st_length(col("simp")), 6).as("len"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey,
        CAST(count(*) AS INT) AS n_before,
        2 AS n_after,
        CAST(min(c_custkey) AS DOUBLE) AS x0,
        CAST(2 * min(c_custkey) + 1 AS DOUBLE) AS y0,
        CAST(max(c_custkey) AS DOUBLE) AS x1,
        CAST(2 * max(c_custkey) + 1 AS DOUBLE) AS y1,
        round(sqrt(power(CAST(max(c_custkey) - min(c_custkey) AS DOUBLE), 2)
          + power(CAST(2 * (max(c_custkey) - min(c_custkey)) AS DOUBLE), 2)), 6) AS len
        FROM customer WHERE c_custkey < 2000
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // B13 promoted to ORACLE (VERDICT r8 item 7): convex hull of a point
    // set whose extreme points are the four corners of an axis-aligned
    // box IS that box — the one hull with a closed form. Corners come
    // from the nation dim (one box per nation, w = 10+nk, h = 20+nk);
    // interior points come from customer, clamped STRICTLY inside
    // (x in [1,8] < 10 <= w, y in [1,12] < 20 <= h), so the hull is
    // exactly the 4-corner ring (JTS drops interior + collinear points):
    // npts = 5 (closed ring), area = w*h (bit-exact, the b04 shoelace
    // argument), perimeter = 2(w+h), centroid = box center (round 6).
    // Collected input is sort_array'd (b20 precedent) for a
    // deterministic MULTIPOINT regardless of partition order.
    "b22_hull_box" -> QueryDef(
      (s, dir) => {
        val corners = t(s, dir, "nation")
          .select(col("n_nationkey"),
            (col("n_nationkey") + 10).cast("double").as("w"),
            (col("n_nationkey") + 20).cast("double").as("h"))
          .select(col("n_nationkey"), explode(array(
            G.st_point(lit(0.0), lit(0.0)),
            G.st_point(col("w"), lit(0.0)),
            G.st_point(col("w"), col("h")),
            G.st_point(lit(0.0), col("h")))).as("pt"))
        val interior = t(s, dir, "customer")
          .select(col("c_nationkey").as("n_nationkey"),
            G.st_point((pmod(col("c_custkey"), lit(8)) + 1).cast("double"),
              (pmod(col("c_custkey"), lit(12)) + 1).cast("double")).as("pt"))
        corners.unionByName(interior)
          .groupBy(col("n_nationkey"))
          .agg(sort_array(collect_list(col("pt"))).as("pts"))
          .select(col("n_nationkey"),
            G.st_convexhull(G.st_collect(col("pts"))).as("hull"))
          .select(col("n_nationkey"),
            G.st_geometrytype(col("hull")).as("gtype"),
            G.st_npoints(col("hull")).as("npts"),
            G.st_area(col("hull")).as("area"),
            G.st_length(col("hull")).as("perimeter"),
            round(G.st_x(G.st_centroid(col("hull"))), 6).as("cx"),
            round(G.st_y(G.st_centroid(col("hull"))), 6).as("cy"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, 'Polygon' AS gtype, 5 AS npts,
        CAST((n_nationkey + 10) * (n_nationkey + 20) AS DOUBLE) AS area,
        CAST(2 * ((n_nationkey + 10) + (n_nationkey + 20)) AS DOUBLE) AS perimeter,
        round(CAST(n_nationkey + 10 AS DOUBLE) / 2, 6) AS cx,
        round(CAST(n_nationkey + 20 AS DOUBLE) / 2, 6) AS cy
        FROM nation ORDER BY n_nationkey""")),

    // B14 promoted to ORACLE (VERDICT r8 item 7): union/intersection of
    // two PARTIALLY overlapping axis-aligned boxes — the overlay whose
    // areas have closed forms. A = [0,s]x[0,s+10], B = [s-2,s+4]x
    // [s+7,s+15] (s = p_size >= 1): the x-overlap is min(2,s) > 0 and the
    // y-overlap is exactly 3, so the intersection is always a box
    // (area = 3*min(2,s)) and the union is always one simply-connected
    // polygon (area = |A| + |B| - |A∩B| by inclusion-exclusion). All
    // vertex coordinates are integer-valued doubles (axis-parallel
    // segment intersections copy one coordinate from each input), so the
    // JTS shoelace is exact; round(6) only guards traversal-order sums.
    "b23_overlay_area" -> QueryDef(
      (s, dir) => {
        val sz = col("p_size").cast("double")
        val a = G.st_makebox(lit(0.0), lit(0.0), sz, sz + 10)
        val b = G.st_makebox(sz - 2, sz + 7, sz + 4, sz + 15)
        t(s, dir, "part")
          .filter(col("p_partkey") < 500)
          .select(col("p_partkey"),
            round(G.st_area(G.st_intersection(a, b)), 6).as("area_int"),
            round(G.st_area(G.st_union(a, b)), 6).as("area_un"),
            G.st_geometrytype(G.st_intersection(a, b)).as("gtype_int"),
            G.st_geometrytype(G.st_union(a, b)).as("gtype_un"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
        CAST(least(p_size, 2) * 3 AS DOUBLE) AS area_int,
        CAST(p_size * (p_size + 10) + 48 - least(p_size, 2) * 3 AS DOUBLE) AS area_un,
        'Polygon' AS gtype_int, 'Polygon' AS gtype_un
        FROM part WHERE p_partkey < 500 ORDER BY p_partkey""")),

    // B12 promoted as far as an oracle can go (VERDICT r10 item 6): the
    // DEGENERATE buffer cases with closed forms. A point buffered at
    // quadSegments = 1 is the diamond with vertices on the axes — area
    // 2d², perimeter 4d√2, 5 ring points, centroid at the point — and
    // buffering THAT polygon by 0 is the identity on every measure. Full
    // arc discretization (the default 8-segment quadrant) remains
    // GOLDEN+PROP by SURVEY declaration (JTS-impl-defined vertex
    // placement); round(6) absorbs the ~1e-15 cos(π/2) residue in the
    // axis vertices. The non-ORACLE set shrinks to {E14}.
    "b25_buffer_closed_forms" -> QueryDef(
      (s, dir) => {
        val k = col("n_nationkey").cast("double")
        val d = k + 1
        val p = G.st_point(k, k * 2)
        val diamond = G.st_buffer(p, d, lit(1))
        t(s, dir, "nation")
          .select(col("n_nationkey"),
            G.st_geometrytype(diamond).as("gtype"),
            G.st_npoints(diamond).as("npts"),
            round(G.st_area(diamond), 6).as("area"),
            round(G.st_length(diamond), 6).as("perimeter"),
            round(G.st_x(G.st_centroid(diamond)), 6).as("cx"),
            round(G.st_y(G.st_centroid(diamond)), 6).as("cy"),
            round(G.st_area(G.st_buffer(diamond, lit(0.0))), 6).as("area0"),
            round(G.st_length(G.st_buffer(diamond, lit(0.0))), 6).as("perim0"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, 'Polygon' AS gtype, 5 AS npts,
        round(CAST(2 * (n_nationkey + 1) * (n_nationkey + 1) AS DOUBLE), 6) AS area,
        round(4 * (n_nationkey + 1) * sqrt(2), 6) AS perimeter,
        round(CAST(n_nationkey AS DOUBLE), 6) AS cx,
        round(CAST(n_nationkey * 2 AS DOUBLE), 6) AS cy,
        round(CAST(2 * (n_nationkey + 1) * (n_nationkey + 1) AS DOUBLE), 6) AS area0,
        round(4 * (n_nationkey + 1) * sqrt(2), 6) AS perim0
        FROM nation ORDER BY n_nationkey""")),

    // ST_TRANSFORM (NOTES_r11 memo; VERDICT r10 item 7): the bounded
    // lon/lat (4326) ↔ Web-Mercator (3857) reprojection — 3857 is
    // DEFINED on the sphere, so x = R·radians(lon), y = R·ln(tan(π/4 +
    // radians(lat)/2)) is the exact projection law, which DuckDB
    // recomputes independently with its own libm. round(4) on ~1e7
    // metre values leaves > 4 orders of magnitude of margin over
    // cross-libm last-ulp drift; the round trip back to integer degrees
    // is pinned at round(6). The destination SRID must ride the EWKB
    // so st_srid composes; an unsupported pair throws loudly (spec).
    "b26_transform" -> QueryDef(
      (s, dir) => {
        val k = col("n_nationkey").cast("double")
        val lon = k * 6 - 72
        val lat = k * 3 - 36
        val p = G.st_point(lon, lat)
        val m = G.st_transform(p, lit(4326), lit(3857))
        val rt = G.st_transform(m, lit(3857), lit(4326))
        t(s, dir, "nation")
          .select(col("n_nationkey"),
            (round(G.st_x(m), 4) + lit(0.0)).as("mx"),
            (round(G.st_y(m), 4) + lit(0.0)).as("my"),
            G.st_srid(m).as("msrid"),
            (round(G.st_x(rt), 6) + lit(0.0)).as("rx"),
            (round(G.st_y(rt), 6) + lit(0.0)).as("ry"),
            G.st_srid(rt).as("rsrid"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey,
        round(6378137 * radians(n_nationkey * 6 - 72), 4) + 0.0 AS mx,
        round(6378137 * ln(tan(pi()/4 + radians(n_nationkey * 3 - 36)/2)), 4) + 0.0 AS my,
        3857 AS msrid,
        round(CAST(n_nationkey * 6 - 72 AS DOUBLE), 6) + 0.0 AS rx,
        round(CAST(n_nationkey * 3 - 36 AS DOUBLE), 6) + 0.0 AS ry,
        4326 AS rsrid
        FROM nation ORDER BY n_nationkey"""))
  )
}
