package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EXPLAIN-level assertions for the 100 TB design claims (SURVEY.md §4.2,
  * §5.3): what Catalyst must be doing for these plans to scale — pushdown
  * reaching the parquet scan, pruned read schemas, broadcast joins on dims,
  * TakeOrderedAndProject for top-k, partial+final aggregation.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("C5 filter pushes predicates into the parquet scan") {
    val plan = planOf("c05_filter")
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("In(p_type,"))
    assert(plan.contains("GreaterThanOrEqual(p_size,5)"))
  }

  test("C4 projection prunes the read schema to selected columns") {
    val plan = planOf("c04_project")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("p_name")) // orders table: no part cols at all
    assert(readSchema.contains("o_orderkey"))
    assert(!readSchema.contains("o_custkey")) // unprojected column pruned
  }

  test("C8 dim joins choose BroadcastHashJoin, not shuffle") {
    val plan = planOf("c08_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("C25 top-k plans TakeOrderedAndProject (no global sort)") {
    val plan = planOf("c25_topk")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("E22 decontamination probes a BROADCAST eval-shingle set (no corpus shuffle join)") {
    val plan = planOf("e22_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("E21 repetition stats reduce with map-side partial aggregation") {
    val plan = planOf("e21_repetition_quality")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("C14 aggregate is partial+final (map-side combine)") {
    val plan = planOf("c14_pricing_summary")
    assert(plan.contains("HashAggregate"))
    assert(plan.split("HashAggregate").length >= 3) // partial + final
  }

  test("C27 string max hash-aggregates via the packed prefix (no SortAggregate)") {
    val plan = planOf("c27_strings")
    assert(!plan.contains("SortAggregate"), plan)
    assert(plan.contains("HashAggregate"))
  }

  test("C27 packed-prefix precondition: documents.text is ASCII") {
    val n = Tables(spark, dir, "documents")
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(n === 0, "non-ASCII text would break packAsciiPrefix ordering")
  }

  test("C9 semi/anti dense path: one fact scan into a fixed-state aggregate, no join") {
    // at test SF the dim-side domain probe selects the dense-bitmap
    // aggregate (VERDICT r10 item 1b): part ∪ lineitem feed ONE packed
    // typed aggregate — no join operator, no per-key partial rows, and
    // still a single lineitem scan
    val plan = planOf("c09_semi_anti")
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Aggregate"), plan)
    assert("lineitem".r.findAllIn(plan).size <= 2, // one scan (path + schema line)
      s"lineitem must be scanned once:\n$plan")
  }

  test("C9b wide-domain fallback routes to broadcast left-semi (no dense bitmap, no shuffle join)") {
    // keys × 2^22 push the span past DenseKeyFlags.DomainMax, so the
    // routing must take the groupBy + broadcast left-semi fallback (r16,
    // VERDICT item 6: both routes driver-green, both plan-pinned)
    val plan = planOf("c09b_semi_anti_wide")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("DensePackedAgg"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("C21 bounded rank output delivers via TakeOrderedAndProject (no SinglePartition exchange)") {
    // r16 VERDICT item 1: the ≤3·|nation|-row result merges on the
    // driver; the old sortSmall form paid Exchange SinglePartition +
    // Sort — one whole extra stage at sf1
    val plan = planOf("c21_rank_window")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(plan.contains("WindowGroupLimit"), plan) // top-3 still pushed below the shuffle
  }

  test("C7 join-agg: one union shuffle on the order key + customer-only broadcast, no range sort") {
    val plan = planOf("c07_join_agg")
    // lineitem and orders union into a single per-orderkey aggregate (one
    // exchange); only the true dim broadcasts; bounded final sort is
    // TakeOrderedAndProject (no sampling)
    assert(plan.contains("Union"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("B17c raw st_intersects join picks the broadcast-index route (dim-sized side)") {
    val plan = planOf("b17c_intersect_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("MapPartitions"), s"broadcast-index probe missing:\n$plan")
  }

  test("B17c under a disabled broadcast threshold falls back to the grid equi-join") {
    spark.conf.set(graft.plans.SpatialJoinRule.BroadcastThresholdConf, "-1")
    try {
      val plan = planOf("b17c_intersect_join")
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Generate explode"), s"grid explode missing:\n$plan")
    } finally spark.conf.unset(graft.plans.SpatialJoinRule.BroadcastThresholdConf)
  }

  test("B17d raw st_dwithin join routes to the grid equi-join (no BNL)") {
    val plan = planOf("b17d_dwithin_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate explode"), s"grid explode missing:\n$plan")
  }

  test("B17e raw st_contains join picks the broadcast-index route (dim-sized side)") {
    // supplier (<=100 rows) is under the broadcast threshold: the rule must
    // choose the STRtree probe — no BNL, no grid replication, no shuffle of
    // the probe side
    val plan = planOf("b17e_contains_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("MapPartitions"), s"broadcast-index probe missing:\n$plan")
    assert(!plan.contains("Generate explode"), s"grid replication where broadcast suffices:\n$plan")
  }

  test("SpatialJoinRule auto-route keeps scans pruned on a wide table") {
    // a wide stored-geometry table: the auto-route must NOT widen the scan
    // back to full width (the rule splices already-pruned children — the
    // 100 TB claim is that a 2-column answer reads ~2 columns + geometry)
    import spark.implicits._
    val path = Graft.scratchDir + "/planspec_wide_geo"
    (1 to 50).map(i => (i.toLong, s"pad_a$i", s"pad_b$i", s"pad_c$i", s"pad_d$i",
        i * 1.5, i * 2.5, s"pad_e$i", s"pad_f$i", i * 3.0))
      .toDF("id", "w1", "w2", "w3", "w4", "x", "y", "w5", "w6", "extra")
      .select(col("id"), col("w1"), col("w2"), col("w3"), col("w4"),
        GeoFunctions.st_makebox(col("x"), col("y"), col("x") + 10.0, col("y") + 10.0).as("geom"),
        col("w5"), col("w6"), col("extra"))
      .write.mode("overwrite").parquet(path)
    val a = spark.read.parquet(path)
    val b = spark.read.parquet(path).select(col("id").as("rid"), col("geom").as("rgeom"))
    val q = a.join(b, GeoFunctions.st_intersects(col("geom"), col("rgeom")))
      .select(col("id"), col("rid"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty, plan)
    reads.foreach { rs =>
      assert(!rs.contains("w1") && !rs.contains("w5") && !rs.contains("extra"),
        s"auto-routed scan not pruned:\n$rs")
      assert(rs.contains("geom"), rs)
    }
  }

  test("B18 KNN join scores natively: no ScalaUDF anywhere in the plan") {
    val plan = planOf("b18_knn_join")
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("st_distance"))
  }

  test("E3 cosine top-k literal-binds the query vector: one TakeOrdered scan, no join") {
    val plan = planOf("e03_cosine_topk")
    assert(plan.contains("TakeOrderedAndProject"))
    // the 1-row query side is inlined as an array literal — a join (and its
    // BroadcastExchange stage) would be pure overhead at any scale
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(plan.contains("cosine_sim"))
  }

  test("E37 URL curation is one scan + one small-key aggregate, all codegen") {
    val plan = planOf("e37_url_domains")
    // parse_url + the suffix fold are stock codegen'd expressions; the only
    // exchange is the domain aggregate's (plus the orderBy's range exchange).
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial_sum"), plan)
    val exchanges = plan.linesIterator.count(l => l.contains("Exchange") &&
      !l.contains("Reused"))
    assert(exchanges <= 2, s"expected <=2 exchanges (agg + sort), got $exchanges\n$plan")
  }

  test("E40 line dedup aggregates line frequency — never a per-line window") {
    val plan = planOf("e40_line_dedup")
    // df must come from a partial+final hash aggregate keyed on the line;
    // a Window.partitionBy(line) would hold unbounded state on exactly the
    // hottest keys (a footer line spans billions of docs at 100 TB).
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("Generate"), plan) // posexplode streams lines
  }

  test("E47 composed crawl pipeline: broadcast rules join, no cartesian/BNLJ/Window/UDF") {
    // Six stages composed (e44→e46→e34→e40→e38→e33): exchanges may exist
    // ONLY where line-df, reassembly, dedup and the trigram model require
    // a shuffle. The robots rules table is dimension-scale and must
    // broadcast; nothing in the pipeline may fall back to a cartesian,
    // nested-loop join, per-key Window state, or a ScalaUDF.
    val plan = planOf("e47_crawl_pipeline")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("Generate"), plan) // line posexplode + char_trigrams
  }

  test("E61 frontier pipeline: 1-row bloom broadcast, host-keyed window, one shuffle") {
    // The bloom probe is the ONLY nested-loop join allowed (its build
    // side is one bitmap row by construction); the schedule window must
    // partition by host (a global window would serialize the frontier);
    // no ScalaUDF — parse, normalize and the bit tests are all codegen.
    val plan = planOf("e61_frontier_pipeline")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // the 1-row bitmap
    val winLine = plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(winLine.contains("host"), s"window must partition by host:\n$winLine")
  }

  test("E68 sequence pack: broadcast offsets, bucket-partitioned cumsum, one token shuffle") {
    // The global concat's offsets must come from the bucket-parallel
    // cumsum: the per-doc window partitions by bkt (a corpus-wide
    // unpartitioned window over DOCS would serialize the whole corpus
    // onto one task; the only unpartitioned window runs over BUCKET
    // SUBTOTALS, bounded by corpus/256 rows), the offsets table joins
    // back by broadcast, and the sequence assembly is a hash aggregate
    // after the posexplode — never a window over tokens.
    val plan = planOf("e68_sequence_pack")
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan) // offsets join
    assert(plan.contains("HashAggregate"), plan) // seq assembly
    assert(plan.contains("Generate"), plan) // posexplode streams tokens
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    // doc-level cumsum partitions by bkt; no window runs over tokens
    // (every windowspecdefinition sits above the doc-grain plan, and the
    // doc window is bkt-partitioned)
    assert(winLines.exists(_.contains("bkt")),
      s"doc cumsum must partition by bkt:\n${winLines.mkString("\n")}")
  }

  test("E62 cdx lookup: the digest equality reaches PushedFilters on the index scan") {
    // the point-lookup layout only pays off if the predicate reaches the
    // parquet reader — pushed, it rides row-group stats and the digest
    // Bloom bitsets; unpushed, every page decodes
    val plan = planOf("e62_cdx_lookup")
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(digest"),
      s"digest lookup not pushed to the scan:\n$plan")
    // scan-only up to the oracle-canonicalization ORDER BY: the only
    // exchange allowed is that sort's rangepartitioning
    assert(!plan.contains("SortMergeJoin") && !plan.contains("hashpartitioning"),
      s"a point lookup must not shuffle beyond the final sort:\n$plan")
  }

  test("E48 span dedup: shingle-df hash aggregate, doc-bounded window, no cartesian") {
    // The shingle document-frequency must be a partial+final hash
    // aggregate (a Window over the SHINGLE would hold unbounded state on
    // hot boilerplate shingles); the island merge's Window partitions by
    // doc_id — state bounded by document length, which is why it is
    // allowed here and banned in e40's line-df.
    val plan = planOf("e48_span_dedup")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("Generate"), plan) // shingle posexplode
    val winLine = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(winLine.contains("doc_id"), s"window must partition by doc_id:\n$winLine")
  }

  test("whole-stage codegen covers the pricing-summary pipeline") {
    // AQE prints placeholder plans until executed; run it, then inspect the
    // final adaptive plan.
    val df = SparkEntry.queries("c14_pricing_summary")(spark, dir)
    df.collect()
    // codegen'd stages print as "*(n) Operator" in the final adaptive plan
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
