package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bench experiment harness (dev tool, not part of the driver contract).
  *
  * Times candidate rewrites of the headline queries against the shipping
  * definition on the same staged data, and checks result equality (driver
  * canonicalization: sorted formatRow multiset) before trusting a number.
  * Usage: `runMain graft.Lab [namePrefix]`.
  */
object Lab {

  final case class V(name: String, base: String,
      fn: (SparkSession, String) => DataFrame)

  // Dense-bitmap flag aggregate: promoted to
  // operators.DenseKeyFlags (the c09 shipping hybrid's dense path);
  // the Lab rows below keep exercising both encoder forms through it.
  import graft.operators.DenseKeyFlags.{DenseFlagAgg, DensePackedAgg}

  import Graft._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // --- c27: pack the 8-char ASCII prefix into a long so max() gets a
  // mutable agg buffer (HashAggregate instead of SortAggregate). ---------
  private val packedPrefix: Column =
    expr("cast(conv(hex(encode(rpad(upper(substring(text,1,8)),8,chr(0)),'UTF-8')),16,10) as bigint)")

  private def unpackPrefix(c: Column): Column = unpackAsciiPrefix(c, 8)

  def variants: Seq[V] = Seq(
    // ---- probes (base "": timing only, no oracle pair) ----
    V("p_li_count", "", (s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n"))),
    V("p_li_sum1", "", (s, dir) =>
      t(s, dir, "lineitem").agg(sum(col("l_quantity")).as("sq"))),
    V("p_li_sum3cents", "", (s, dir) =>
      t(s, dir, "lineitem").agg(
        sum(cents2(col("l_quantity"))).as("a"),
        sum(cents2(col("l_extendedprice"))).as("b"),
        sum(cents2(col("l_discount"))).as("c"))),
    V("p_docs_count", "", (s, dir) =>
      t(s, dir, "documents").agg(count(lit(1)).as("n"))),
    V("p_orders_count", "", (s, dir) =>
      t(s, dir, "orders").agg(count(lit(1)).as("n"))),
    V("c14_nofilter", "", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          cents2(col("l_quantity")).as("qc"),
          cents2(col("l_extendedprice")).as("ec"),
          cents2(col("l_discount")).as("dc"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("qc")).cast("double") / lit(100.0)).as("sum_qty"),
          (sum(col("ec")).cast("double") / lit(100.0)).as("sum_base_price"),
          (sum(col("ec") * (lit(100L) - col("dc"))).cast("double") / lit(10000.0)).as("sum_disc_price"),
          ((sum(col("qc")).cast("double") / lit(100.0)) / count(col("qc"))).as("avg_qty"),
          ((sum(col("dc")).cast("double") / lit(100.0)) / count(col("dc"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .coalesce(1)
        .sortWithinPartitions(col("l_returnflag"), col("l_linestatus"))
    }),
    V("c14_nosort", "", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2024-09-01").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          cents2(col("l_quantity")).as("qc"),
          cents2(col("l_extendedprice")).as("ec"),
          cents2(col("l_discount")).as("dc"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("qc")).cast("double") / lit(100.0)).as("sum_qty"),
          (sum(col("ec")).cast("double") / lit(100.0)).as("sum_base_price"),
          (sum(col("ec") * (lit(100L) - col("dc"))).cast("double") / lit(10000.0)).as("sum_disc_price"),
          ((sum(col("qc")).cast("double") / lit(100.0)) / count(col("qc"))).as("avg_qty"),
          ((sum(col("dc")).cast("double") / lit(100.0)) / count(col("dc"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    V("c14_intkey", "c14_pricing_summary", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2024-09-01").cast("timestamp"))
        .select((ascii(col("l_returnflag")) * lit(256) + ascii(col("l_linestatus"))).as("k"),
          cents2(col("l_quantity")).as("qc"),
          cents2(col("l_extendedprice")).as("ec"),
          cents2(col("l_discount")).as("dc"))
      li.groupBy(col("k"))
        .agg(
          (sum(col("qc")).cast("double") / lit(100.0)).as("sum_qty"),
          (sum(col("ec")).cast("double") / lit(100.0)).as("sum_base_price"),
          (sum(col("ec") * (lit(100L) - col("dc"))).cast("double") / lit(10000.0)).as("sum_disc_price"),
          ((sum(col("qc")).cast("double") / lit(100.0)) / count(col("qc"))).as("avg_qty"),
          ((sum(col("dc")).cast("double") / lit(100.0)) / count(col("dc"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .coalesce(1)
        .sortWithinPartitions(col("k"))
        .select(expr("char(k div 256)").as("l_returnflag"), expr("char(k % 256)").as("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("avg_qty"), col("avg_disc"), col("count_order"))
    }),
    V("c14_topk", "c14_pricing_summary", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2024-09-01").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          cents2(col("l_quantity")).as("qc"),
          cents2(col("l_extendedprice")).as("ec"),
          cents2(col("l_discount")).as("dc"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("qc")).cast("double") / lit(100.0)).as("sum_qty"),
          (sum(col("ec")).cast("double") / lit(100.0)).as("sum_base_price"),
          (sum(col("ec") * (lit(100L) - col("dc"))).cast("double") / lit(10000.0)).as("sum_disc_price"),
          ((sum(col("qc")).cast("double") / lit(100.0)) / count(col("qc"))).as("avg_qty"),
          ((sum(col("dc")).cast("double") / lit(100.0)) / count(col("dc"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
        .limit(10000)
    }),
    V("c27_topk", "c27_strings", (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), col("source"), length(col("text")).as("len"),
          packAsciiPrefix(upper(substring(col("text"), 1, 8)), 8).as("pk"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("len")).as("len_sum"), count(lit(1)).as("n"),
          max(col("pk")).as("pk"))
        .groupBy(col("lang"))
        .agg(count(col("source")).as("nd_source"),
          (sum(col("len_sum")).cast("double") / sum(col("n"))).as("avg_len"),
          max(col("pk")).as("pkm"))
        .select(col("lang"), col("nd_source"), col("avg_len"),
          unpackPrefix(col("pkm")).as("max_head"))
        .orderBy(col("lang").asc_nulls_last)
        .limit(10000)),
    V("c20_topk", "c20_rollup", (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumD4(col("o_totalprice")).as("sum_price"))
        .orderBy(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
        .limit(10000)
    }),
    V("c07_topk", "c07_join_agg", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val oc = o.join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
      val perOrder = l.groupBy(col("l_orderkey"))
        .agg(sum(cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("cts"))
      perOrder.hint("shuffle_hash")
        .join(oc, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .orderBy(col("c_mktsegment"))
        .limit(10000)
    }),
    V("c21_litmap", "c21_rank_window", (s, dir) => {
      val nmap = typedlit(t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap)
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("n_name", element_at(nmap, col("c_nationkey").cast("int")))
        .filter(col("n_name").isNotNull)
        .select(col("n_name"), col("c_name"), col("c_acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .transform(sortSmall(_, col("n_name"), col("rn")))
    }),
    V("c20_litmap", "c20_rollup", (s, dir) => {
      val nmap = typedlit(t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap)
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
        .withColumn("n_name", element_at(nmap, col("c_nationkey").cast("int")))
        .filter(col("n_name").isNotNull)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumD4(col("o_totalprice")).as("sum_price"))
        .coalesce(1)
        .sortWithinPartitions(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),
    V("c20_fusedpre", "c20_rollup", (s, dir) => {
      // pre-agg to the domain-bounded (nationkey, status) set, then fuse
      // the ENTIRE rollup into the post-exchange single task: SinglePartition
      // satisfies the rollup agg's ClusteredDistribution, so expand+agg+sort
      // add NO second exchange
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("__cnt"), sum(cents4(col("o_totalprice"))).as("__sp"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .coalesce(1)
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(sum(col("__cnt")).as("n"),
          (sum(col("__sp")).cast("double") / lit(10000.0)).as("sum_price"))
        .sortWithinPartitions(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),
    // r13 A/B candidates (VERDICT r12 item 1) for the sf10 c20 residual:
    // (a) pre-aggregate orders by (o_custkey, o_orderstatus) BEFORE the
    // customer join — 15 M → ≤4.5 M rows at sf10 cuts the BHJ probe and
    // partial-agg volume, at the price of one extra exchange on
    // (custkey, status); counts/cents-sums stay additive so correctness
    // is unchanged.
    V("c20_opre", "c20_rollup", (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val opre = o.groupBy(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("__cnt"), sum(cents4(col("o_totalprice"))).as("__sp"))
      val pre = opre.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_orderstatus"))
        .agg(sum(col("__cnt")).as("__cnt"), sum(col("__sp")).as("__sp"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
      pre.rollup(col("n_name"), col("o_orderstatus"))
        .agg(sum(col("__cnt")).as("n"),
          (sum(col("__sp")).cast("double") / lit(10000.0)).as("sum_price"))
        .transform(sortSmallTopK(_, col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first))
    }),
    // (b) shuffled-hash o⋈c instead of the 50 MB broadcast build: both
    // sides exchange on custkey (orders pre-projected to 3 columns), no
    // per-executor hashed-relation build/ship.
    V("c20_shj", "c20_rollup", (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderstatus"), cents4(col("o_totalprice")).as("__tp"))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = broadcast(t(s, dir, "nation"))
      val pre = o.join(c.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("__cnt"), sum(col("__tp")).as("__sp"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
      pre.rollup(col("n_name"), col("o_orderstatus"))
        .agg(sum(col("__cnt")).as("n"),
          (sum(col("__sp")).cast("double") / lit(10000.0)).as("sum_price"))
        .transform(sortSmallTopK(_, col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first))
    }),
    // (c, exploratory) dense dimension lookup: custkeys are dense
    // 1..|customer|, nationkey fits a byte — a plan-literal int array
    // indexed by custkey replaces the hashed relation (array index vs
    // hash probe per order). Driver collect is dimension-bounded (the
    // IvfAnn/BroadcastSpatialJoin precedent); at a scale where the
    // dimension itself stops being broadcastable no BHJ exists either.
    V("c20_dense", "c20_rollup", (s, dir) => {
      val pairs = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")).collect()
      val maxKey = pairs.iterator.map(_.getLong(0)).max.toInt
      val arr = Array.fill[Int](maxKey + 1)(-1) // custkeys are 0-based here
      pairs.foreach(r => arr(r.getLong(0).toInt) = r.getInt(1))
      val nmap = typedlit(arr)
      val o = t(s, dir, "orders")
      val n = broadcast(t(s, dir, "nation"))
      val pre = o
        .withColumn("c_nationkey",
          element_at(nmap, (col("o_custkey") + lit(1L)).cast("int"))) // 1-based element_at
        .filter(col("c_nationkey") >= 0)
        .groupBy(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("__cnt"), sum(cents4(col("o_totalprice"))).as("__sp"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
      pre.rollup(col("n_name"), col("o_orderstatus"))
        .agg(sum(col("__cnt")).as("n"),
          (sum(col("__sp")).cast("double") / lit(10000.0)).as("sum_price"))
        .transform(sortSmallTopK(_, col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first))
    }),
    // (d) the codegen dense-dimension lookup: customer→nation as a
    // broadcast byte array probed from inside whole-stage codegen — no
    // hashed-relation build, no join node on the fact side.
    V("c20_ddim", "c20_rollup", (s, dir) => {
      val look = graft.operators.DenseDimJoin.lookup(
        s, t(s, dir, "customer"), "c_custkey", "c_nationkey")
      val o = t(s, dir, "orders")
      val n = broadcast(t(s, dir, "nation"))
      val pre = o
        .withColumn("c_nationkey", look(col("o_custkey")))
        .filter(col("c_nationkey").isNotNull)
        .groupBy(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("__cnt"), sum(cents4(col("o_totalprice"))).as("__sp"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
      pre.rollup(col("n_name"), col("o_orderstatus"))
        .agg(sum(col("__cnt")).as("n"),
          (sum(col("__sp")).cast("double") / lit(10000.0)).as("sum_price"))
        .transform(sortSmallTopK(_, col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first))
    }),
    // (e) ddim + the whole tail fused after the one exchange: rollup by
    // nationkey (bijective with name), map the 25 names via a literal
    // map AFTER the margins exist, sort the ~101 rows in the same task.
    V("c20_ddim2", "c20_rollup", (s, dir) => {
      val look = graft.operators.DenseDimJoin.lookup(
        s, t(s, dir, "customer"), "c_custkey", "c_nationkey")
      val nmap = typedlit(t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap)
      val o = t(s, dir, "orders")
      o.withColumn("c_nationkey", look(col("o_custkey")))
        .filter(col("c_nationkey").isNotNull)
        .groupBy(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("__cnt"), sum(cents4(col("o_totalprice"))).as("__sp"))
        .coalesce(1)
        .rollup(col("c_nationkey"), col("o_orderstatus"))
        .agg(sum(col("__cnt")).as("n"),
          (sum(col("__sp")).cast("double") / lit(10000.0)).as("sum_price"))
        .withColumn("n_name", element_at(nmap, col("c_nationkey")))
        .select(col("n_name"), col("o_orderstatus"), col("n"), col("sum_price"))
        .sortWithinPartitions(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),
    // floor probe (r6): the shipping c20 shape over a predicate parquet
    // stats reject entirely — measures pure stage-scheduling cost of the
    // pre-agg exchange + rollup exchange + TOAP + 2 broadcasts. base=""
    // (returns the empty rollup's single all-null margin row, not c20's
    // output).
    V("c20_floor", "", (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderkey") < 0)
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val pre = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("__cnt"), sum(cents4(col("o_totalprice"))).as("__sp"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
      pre.rollup(col("n_name"), col("o_orderstatus"))
        .agg(sum(col("__cnt")).as("n"),
          (sum(col("__sp")).cast("double") / lit(10000.0)).as("sum_price"))
        .transform(sortSmallTopK(_, col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first))
    }),
    // floor probe (r14, the c20_floor pattern): the shipping c21 shape
    // over a stats-rejected scan — pure scheduling/codegen cost of the
    // scan → WindowGroupLimit partial/final exchange → sort → window →
    // broadcast join → TOAP chain, zero rows everywhere.
    V("c21_floor", "", (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_custkey") < 0)
      val n = broadcast(t(s, dir, "nation"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_name"), col("c_acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .transform(sortSmall(_, col("n_name"), col("rn")))
    }),
    V("c25_floor", "", (s, dir) =>
      // the shipping TakeOrdered chain over a scan whose pushed
      // predicate prunes every row group: measures the pure
      // schedule+scan+TakeOrdered floor of the 100-row top-k shape
      // (r15 c25 sf10 settlement, the c21_floor pattern)
      t(s, dir, "orders").filter(col("o_orderkey") < 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),
    V("c20_stock", "c20_rollup", (s, dir) => {
      // pre-r4 shape: rollup Expand over every joined row (×3)
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumD4(col("o_totalprice")).as("sum_price"))
        .transform(sortSmallFused(_, col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first))
    }),
    V("p_ev_count", "", (s, dir) =>
      t(s, dir, "events").agg(count(lit(1)).as("n"))),
    V("p_ev_json", "", (s, dir) =>
      t(s, dir, "events").agg(
        sum(expr("try_cast(graft_json_get(props, 'k') AS LONG)")).as("sk"))),
    V("p_ev_sumv", "", (s, dir) =>
      t(s, dir, "events").agg(sum(cents2(col("value"))).as("sv"))),
    V("p_ev_hourgrp", "", (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))),
    V("p_docs_text", "", (s, dir) =>
      t(s, dir, "documents").agg(sum(length(col("text"))).as("sl"))),
    V("p_docs_pack", "", (s, dir) =>
      t(s, dir, "documents").agg(
        max(packAsciiPrefix(upper(substring(col("text"), 1, 8)), 8)).as("mp"))),
    // the pre-r9 shipping form: composed substring+upper+pack (two
    // UTF8String allocations/row) vs the fused pack_upper_ascii8 now in
    // c27_strings — paired to quantify the fusion win
    V("c27_composed", "c27_strings", (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), col("source"), length(col("text")).as("len"),
          packAsciiPrefix(upper(substring(col("text"), 1, 8)), 8).as("pk"))
        .groupBy(col("lang"), col("source"))
        .agg(
          sum(col("len")).as("len_sum"), count(lit(1)).as("n"),
          max(col("pk")).as("pk"),
          max(when(col("pk").isNull && col("len").isNotNull, lit(1))
            .otherwise(lit(0))).as("__na"))
        .groupBy(col("lang"))
        .agg(count(col("source")).as("nd_source"),
          (sum(col("len_sum")).cast("double") / sum(col("n"))).as("avg_len"),
          max(col("pk")).as("pkm"), max(col("__na")).as("__na"))
        .select(col("lang"), col("nd_source"), col("avg_len"),
          when(col("__na") === 1, raise_error(lit("c27_composed: non-ASCII")))
            .otherwise(unpackPrefix(col("pkm"))).as("max_head"))
        .orderBy(col("lang").asc_nulls_last)),
    V("c27_nosort", "", (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), col("source"), length(col("text")).as("len"),
          packAsciiPrefix(upper(substring(col("text"), 1, 8)), 8).as("pk"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("len")).as("len_sum"), count(lit(1)).as("n"),
          max(col("pk")).as("pk"))
        .groupBy(col("lang"))
        .agg(count(col("source")).as("nd_source"),
          (sum(col("len_sum")).cast("double") / sum(col("n"))).as("avg_len"),
          max(col("pk")).as("pkm"))),
    // isolated pair for the r9 fusion measurement: identical plan to
    // c27_nosort except the prefix pack (composed chain there, fused
    // pack_upper_ascii8 here) — the delta is the per-row allocation cost
    V("c27_fused_nosort", "", (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), col("source"), length(col("text")).as("len"),
          packUpperAsciiPrefix8(col("text")).as("pk"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("len")).as("len_sum"), count(lit(1)).as("n"),
          max(col("pk")).as("pk"))
        .groupBy(col("lang"))
        .agg(count(col("source")).as("nd_source"),
          (sum(col("len_sum")).cast("double") / sum(col("n"))).as("avg_len"),
          max(col("pk")).as("pkm"))),
    V("c27_l1_only", "", (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), col("source"), length(col("text")).as("len"),
          packAsciiPrefix(upper(substring(col("text"), 1, 8)), 8).as("pk"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("len")).as("len_sum"), count(lit(1)).as("n"),
          max(col("pk")).as("pk"))),
    // c14 scan-granularity A/B inside ONE session (cross-JVM runs have
    // ±60% noise; within-run interleave is the only trustworthy form).
    // maxPartitionBytes is a runtime conf read when the scan RDD is
    // created (collect time), so each variant SETS it and leaves it set —
    // all three are timing-only rows (base "") compared among themselves;
    // the scan conf each runs under is the one its own thunk just set.
    V("c14_mp128", "", (s, dir) => {
      s.conf.set("spark.sql.files.maxPartitionBytes", "128m")
      s.conf.set("spark.sql.files.openCostInBytes", "4194304")
      SparkEntry.queries("c14_pricing_summary")(s, dir)
    }),
    V("c14_mp16", "", (s, dir) => {
      s.conf.set("spark.sql.files.maxPartitionBytes", "16m")
      s.conf.set("spark.sql.files.openCostInBytes", "1048576")
      SparkEntry.queries("c14_pricing_summary")(s, dir)
    }),
    V("c14_mp4", "", (s, dir) => {
      s.conf.set("spark.sql.files.maxPartitionBytes", "4m")
      s.conf.set("spark.sql.files.openCostInBytes", "262144")
      SparkEntry.queries("c14_pricing_summary")(s, dir)
    }),
    V("c07_perorder_only", "", (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(sum(cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("cts"))
        .agg(count(lit(1)).as("n"), sum(col("cts")).as("t"))),
    V("c07_nobroadcast", "", (s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val perOrder = l.groupBy(col("l_orderkey"))
        .agg(sum(cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("cts"))
      perOrder.hint("shuffle_hash")
        .join(o.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("cts")).as("t"))
    }),
    // c07 as ONE shuffle on the order key: union orders(k, custkey) with
    // lineitem(k, cents), aggregate both in a single pass (long-only
    // buffers -> HashAggregate), then map custkey -> segment via the same
    // bounded customer broadcast the shipping plan uses. Replaces
    // [lineitem exchange + oc exchange + SHJ] with [union exchange + agg].
    V("c07_union", "c07_join_agg", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val li = l.select(col("l_orderkey").as("k"),
        lit(null).cast("long").as("ck"),
        (cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("v"))
      val os = o.select(col("o_orderkey").as("k"),
        col("o_custkey").cast("long").as("ck"), lit(null).cast("long").as("v"))
      li.unionByName(os)
        .groupBy(col("k"))
        .agg(max(col("ck")).as("ck"), sum(col("v")).as("cts"))
        .filter(col("cts").isNotNull)
        .join(broadcast(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))),
          col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .orderBy(col("c_mktsegment")).limit(10000)
    }),
    // c07 with the lc column dropped from the union row: the partial-agg
    // buffer shuffled per key is (max ck, sum v, count) instead of
    // (max ck, sum v, sum lc, count-free) — count(*) distinguishes
    // "has lineitems" because every surviving k carries exactly one
    // orders row, so lc > 0 ⟺ count(*) > 1 (a k with ONLY an orders row
    // counts 1; a k with only lineitem rows has ck null and drops at the
    // customer join exactly as inner-join semantics require).
    V("c07_slim", "c07_join_agg", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val li = l.select(col("l_orderkey").as("k"),
        lit(null).cast("long").as("ck"),
        (cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("v"))
      val os = o.select(col("o_orderkey").as("k"),
        col("o_custkey").cast("long").as("ck"), lit(null).cast("long").as("v"))
      li.unionByName(os)
        .groupBy(col("k"))
        .agg(max(col("ck")).as("ck"), sum(col("v")).as("cts"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
          col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .orderBy(col("c_mktsegment")).limit(10000)
    }),
    // c07 shipping shape but broadcast exchange reuse probe: project the
    // oc side to the minimum width before the shuffle.
    V("c07_narrow_oc", "c07_join_agg", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val oc = o.select(col("o_orderkey"), col("o_custkey"))
        .join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
      val perOrder = l.groupBy(col("l_orderkey"))
        .agg(sum(cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("cts"))
      perOrder.hint("shuffle_hash")
        .join(oc, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .orderBy(col("c_mktsegment")).limit(10000)
    }),
    // c09 as ONE lineitem scan: per-partkey flag aggregate (map-side
    // combined to <= |part| rows), filtered to the semi AND anti condition,
    // broadcast into a single left-semi probe of part. The build side is
    // |part|-bounded booleans instead of two raw 300k-row key projections.
    V("c09_flagagg", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      val keys = l.select(col("l_partkey"),
        (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
        .filter(col("disc") || col("taxed"))
        .groupBy(col("l_partkey"))
        .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
        .filter(col("disc") && !col("taxed"))
        .select(col("l_partkey"))
      p.join(broadcast(keys), col("p_partkey") === keys("l_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    // c09 shipping shape with the anti build deduplicated before broadcast
    // (NOT-IN key set is ~300k raw rows but <= |part| distinct).
    V("c09_distinct_builds", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      val discounted = l.filter(col("l_discount") > 0.05).select(col("l_partkey")).distinct()
      val taxed = l.filter(col("l_tax") > 0.07).select(col("l_partkey")).distinct()
      p.join(discounted, col("p_partkey") === discounted("l_partkey"), "left_semi")
        .join(taxed, col("p_partkey") === taxed("l_partkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
    }),
    // c09 flag aggregate joined SHUFFLE-HASH: the agg output is already
    // hash-partitioned on the key, so only part (the small probe) pays an
    // exchange and nothing ships through the driver as a broadcast build.
    V("c09_flag_shj", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      val keys = l.select(col("l_partkey"),
        (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
        .filter(col("disc") || col("taxed"))
        .groupBy(col("l_partkey"))
        .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
        .filter(col("disc") && !col("taxed"))
        .select(col("l_partkey"))
      p.join(keys.hint("shuffle_hash"), col("p_partkey") === keys("l_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    // c09 as a pure aggregate: part joins never needed — the answer is the
    // count of partkeys that (a) appear in part, (b) have a discounted
    // line, (c) have no taxed line. Flag agg + ONE semi probe of part keys
    // shuffled into the same partitioning.
    // flag agg with the join DIRECTION flipped: count keys that exist in
    // part, so the |part| key projection broadcasts (built concurrently
    // with the flag stage) and the flags side never re-shuffles.
    V("c09_count_bcast", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
      val keys = l.select(col("l_partkey"),
        (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
        .filter(col("disc") || col("taxed"))
        .groupBy(col("l_partkey"))
        .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
        .filter(col("disc") && !col("taxed"))
      keys.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    // flag agg WITHOUT a join hint: static planner picks SMJ off the
    // (overestimated) agg size, AQE's runtime size sees ~|part| rows and
    // converts to a broadcast probe with local shuffle reads.
    V("c09_flag_nohint", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      val keys = l.select(col("l_partkey"),
        (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
        .filter(col("disc") || col("taxed"))
        .groupBy(col("l_partkey"))
        .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
        .filter(col("disc") && !col("taxed"))
        .select(col("l_partkey"))
      p.join(keys, col("p_partkey") === keys("l_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    V("c09_count_only", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
      val keys = l.select(col("l_partkey"),
        (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
        .filter(col("disc") || col("taxed"))
        .groupBy(col("l_partkey"))
        .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
        .filter(col("disc") && !col("taxed"))
      keys.hint("shuffle_hash")
        .join(p, col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    // r8 attribution probe: e01 groups on sha2(text) — a deliberate scale
    // choice (bounded shuffle width at 100 TB) that DuckDB's DISTINCT ON
    // does not pay (it hashes raw text, no cryptographic digest). This
    // twin groups on RAW text, the DuckDB-equivalent shape, to measure
    // what the digest costs at bench volume.
    V("e01_rawtext", "e01_exact_dedup", (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))),
    // and the 64-bit non-cryptographic twin (NOT shippable for exact
    // dedup at corpus scale — 10B docs give ~0.3% birthday collision
    // odds on 64 bits; kept as the lower-bound attribution point)
    V("e01_xxhash", "e01_exact_dedup", (s, dir) =>
      t(s, dir, "documents")
        .groupBy(xxhash64(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))),
    // r8 sf1 probe: shuffle BEFORE the flag aggregate. At sf1 the partial
    // aggregate runs 30 scan tasks × ~200k-key maps and emits ~30×|keys|
    // partial rows into the exchange; repartitioning the filtered skinny
    // rows first (8B key + 2 bools) makes the agg run entirely
    // post-shuffle — each key's map entry exists ONCE, and shuffle volume
    // is the filtered row count instead of tasks×keys partial rows.
    V("c09_repart_first", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
      val keys = l.select(col("l_partkey"),
        (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
        .filter(col("disc") || col("taxed"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"))
        .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
        .filter(col("disc") && !col("taxed"))
      keys.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    // r9 (VERDICT r8 item 6) — the "skip the per-key partial aggregate"
    // experiment. OSS Spark 4.1.2 has NO skipPartialAggregate conf (that
    // is a vendor-fork feature; SQLConf was grepped), so the skip must be
    // structural. Two forms:
    //
    // (a) dense-bitmap aggregate: p_partkey is a DENSE INTEGER domain, so
    // the whole verdict is three bitmaps (in-part, has-disc, has-taxed)
    // and the answer is popcount(part & disc & ~taxed). A typed
    // Aggregator with fixed 3-bitmap state turns the 30-task × 200k-row
    // partial-agg emission into ONE ~75 KB buffer per task — the partial
    // pass "skipped" in the only way that changes the volume equation.
    // Scale envelope (why this is a Lab row, not the shipping form): the
    // buffer scales with the KEY DOMAIN, not the data — at 100 TB /
    // ~20B parts that is a 2.5 GB agg buffer per task, and bucketing the
    // domain brings back per-task emission proportional to buckets
    // touched. Dense bitmaps win exactly when rows/task >> domain bits
    // (true at sf1: 6M rows vs 200k keys; false at corpus scale).
    V("c09_bitmap_agg", "c09_semi_anti", (s, dir) => {
      import s.implicits._
      // bounded dim stat (parquet footer max) — one literal, not a join
      val maxKey = t(s, dir, "part").agg(max(col("p_partkey"))).head.getLong(0)
      val p = t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("k"), lit(4).as("m"))
      val l = t(s, dir, "lineitem")
        .select(col("l_partkey").cast("long").as("k"),
          ((col("l_discount") > 0.05).cast("int")
            + (col("l_tax") > 0.07).cast("int") * 2).as("m"))
        .filter(col("m") =!= 0)
      val agg = new DenseFlagAgg((maxKey >> 6).toInt + 1)
      p.unionByName(l).as[(Long, Int)].select(agg.toColumn.name("n")).toDF()
    }),
    // (a') same bitmap state, input packed to ONE long (key<<3 | mask) so
    // the typed path uses the primitive encoder — isolates how much of
    // (a)'s loss is tuple-encoder row conversion vs the approach itself.
    V("c09_bitmap_packed", "c09_semi_anti", (s, dir) => {
      import s.implicits._
      val maxKey = t(s, dir, "part").agg(max(col("p_partkey"))).head.getLong(0)
      val p = t(s, dir, "part")
        .select((col("p_partkey").cast("long") * 8 + 4).as("km"))
      val l = t(s, dir, "lineitem")
        .select((col("l_partkey").cast("long") * 8
            + (col("l_discount") > 0.05).cast("int")
            + (col("l_tax") > 0.07).cast("int") * 2).as("km"))
        .filter(col("km") % 8 =!= 0)
      val agg = new DensePackedAgg((maxKey >> 6).toInt + 1)
      p.unionByName(l).as[Long].select(agg.toColumn.name("n")).toDF()
    }),
    // (b) single-mask flag agg: halve the per-key aggregation state (one
    // max(int) instead of two max(boolean)) — measures whether partial
    // state WIDTH or key COUNT dominates the 441 ms.
    V("c09_maskagg", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
      val keys = l.select(col("l_partkey"),
          ((col("l_discount") > 0.05).cast("int")
            + (col("l_tax") > 0.07).cast("int") * 2).as("m"))
        .filter(col("m") =!= 0)
        .groupBy(col("l_partkey"))
        .agg(expr("bit_or(m)").as("m"))
        .filter(col("m") === 1)
      keys.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    // c09 FLOOR ATTRIBUTION PROBES (r5 verdict #3) -----------------------
    // (a) fused: coalesce(1) above the flag aggregate elides the final
    // count's SinglePartition exchange — one task computes the final flag
    // agg, the broadcast probe and the count. Measures what that last
    // exchange+stage costs; NOT shippable (the serialized final aggregate
    // state is |distinct partkeys|, which grows with data volume).
    V("c09_fused", "c09_semi_anti", (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
      val keys = l.select(col("l_partkey"),
        (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
        .filter(col("disc") || col("taxed"))
        .groupBy(col("l_partkey"))
        .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
        .coalesce(1)
        .filter(col("disc") && !col("taxed"))
      keys.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    // (b) floor: the IDENTICAL plan shape (scan → flag agg exchange →
    // broadcast semi probe → count exchange) over a predicate no row
    // satisfies — parquet stats skip every row group, so the measured time
    // is pure scheduling: the per-query floor for this 2-exchange +
    // 1-broadcast shape. base="" (no equality check — it returns n=0).
    V("c09_floor", "", (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"))
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") < 0)
      val keys = l.select(col("l_partkey"),
        (col("l_discount") > 0.05).as("disc"), (col("l_tax") > 0.07).as("taxed"))
        .filter(col("disc") || col("taxed"))
        .groupBy(col("l_partkey"))
        .agg(max(col("disc")).as("disc"), max(col("taxed")).as("taxed"))
        .filter(col("disc") && !col("taxed"))
      keys.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),
    // ---- r18 OPTIMIZATION-ROUND variants (guide §2.3/§3.1) -------------
    // c14: the sf1 gate reads Spark 0.43 s vs DuckDB 0.12 — attribution
    // probes + a packed-group-key rewrite. The group keys are two 1-char
    // strings; hashing/compare on two UTF8Strings per row is the suspected
    // non-scan cost, so pack them into ONE int (ascii*256+ascii) and
    // unpack on the 6 output rows.
    V("r18_c14_packkey", "c14_pricing_summary", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2024-09-01").cast("timestamp"))
        .select((ascii(col("l_returnflag")) * 256 + ascii(col("l_linestatus"))).as("k"),
          cents2(col("l_quantity")).as("qc"),
          cents2(col("l_extendedprice")).as("ec"),
          cents2(col("l_discount")).as("dc"))
      li.groupBy(col("k"))
        .agg(
          (sum(col("qc")).cast("double") / lit(100.0)).as("sum_qty"),
          (sum(col("ec")).cast("double") / lit(100.0)).as("sum_base_price"),
          (sum(col("ec") * (lit(100L) - col("dc"))).cast("double") / lit(10000.0)).as("sum_disc_price"),
          ((sum(col("qc")).cast("double") / lit(100.0)) / count(col("qc"))).as("avg_qty"),
          ((sum(col("dc")).cast("double") / lit(100.0)) / count(col("dc"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .select(expr("char(k div 256)").as("l_returnflag"),
          expr("char(k % 256)").as("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("avg_qty"), col("avg_disc"), col("count_order"))
        .transform(sortSmallTopK(_, col("l_returnflag"), col("l_linestatus")))
    }),
    // scan-cost attribution: same filter + the three cents projections,
    // one global sum — no group keys at all. The delta to c14 is the
    // group-key cost; the delta to p_li_count is the decode cost.
    V("r18_c14_scanagg", "", (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2024-09-01").cast("timestamp"))
        .agg(sum(cents2(col("l_quantity"))).as("a"),
          sum(cents2(col("l_extendedprice"))).as("b"),
          sum(cents2(col("l_discount"))).as("c"))),
    // c07: narrow the aggregation buffer 4 longs -> 3 (guide §2.3
    // "narrower types"): custkey and the has-lineitem flag share one long
    // via bit_or — orders rows contribute (ck+1)<<1, lineitem rows 1, so
    // ce = ((ck+1)<<1)|1 for an order with lines, odd ce = has lines,
    // ce>>1-1 = ck (orphan lineitem keys decode to ck -1 and drop at the
    // customer join, exactly the inner-join semantics of the base form).
    V("r18_c07_bitor", "c07_join_agg", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val li = l.select(col("l_orderkey").as("k"), lit(1L).as("ce"),
        (cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("v"))
      val os = o.select(col("o_orderkey").as("k"),
        ((col("o_custkey").cast("long") + 1L) * 2L).as("ce"),
        lit(null).cast("long").as("v"))
      li.unionByName(os)
        .groupBy(col("k"))
        .agg(expr("bit_or(ce)").as("ce"), sum(col("v")).as("cts"))
        .filter(col("ce").bitwiseAND(1) === 1)
        .select((expr("ce div 2") - 1L).as("ck"), col("cts"))
        .join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
          col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .transform(sortSmallTopK(_, col("c_mktsegment")))
    }),
    // c07: replace the customer BroadcastHashJoin (1.5M-entry hashed
    // relation at sf10, driver-built) with the c20 DenseDimJoin byte
    // lookup — c_custkey is dense, the segment is 5 categorical values.
    V("r18_c07_ddim", "c07_join_agg", (s, dir) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val sidxOf = segs.zipWithIndex.foldLeft(lit(null).cast("int")) {
        case (acc, (sname, i)) => when(col("c_mktsegment") === sname, lit(i)).otherwise(acc)
      }
      val c = t(s, dir, "customer").select(col("c_custkey"), sidxOf.as("sidx"))
      val names = typedLit(segs.zipWithIndex.map(_.swap).toMap)
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val li = l.select(col("l_orderkey").as("k"),
        lit(null).cast("long").as("ck"),
        (cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("v"),
        lit(1L).as("lc"))
      val os = o.select(col("o_orderkey").as("k"),
        col("o_custkey").cast("long").as("ck"), lit(null).cast("long").as("v"),
        lit(0L).as("lc"))
      val agged = li.unionByName(os)
        .groupBy(col("k"))
        .agg(max(col("ck")).as("ck"), sum(col("v")).as("cts"), sum(col("lc")).as("lc"))
        .filter(col("lc") > 0)
      graft.operators.DenseDimJoin.withValue(agged, "ck", s, c,
          "c_custkey", "sidx", s"$dir/customer#seg")
        .groupBy(col("sidx"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .select(element_at(names, col("sidx")).as("c_mktsegment"),
          col("n_orders"), col("revenue"))
        .transform(sortSmallTopK(_, col("c_mktsegment")))
    }),
    // c07: both rewrites combined.
    V("r18_c07_both", "c07_join_agg", (s, dir) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val sidxOf = segs.zipWithIndex.foldLeft(lit(null).cast("int")) {
        case (acc, (sname, i)) => when(col("c_mktsegment") === sname, lit(i)).otherwise(acc)
      }
      val c = t(s, dir, "customer").select(col("c_custkey"), sidxOf.as("sidx"))
      val names = typedLit(segs.zipWithIndex.map(_.swap).toMap)
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val li = l.select(col("l_orderkey").as("k"), lit(1L).as("ce"),
        (cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("v"))
      val os = o.select(col("o_orderkey").as("k"),
        ((col("o_custkey").cast("long") + 1L) * 2L).as("ce"),
        lit(null).cast("long").as("v"))
      val agged = li.unionByName(os)
        .groupBy(col("k"))
        .agg(expr("bit_or(ce)").as("ce"), sum(col("v")).as("cts"))
        .filter(col("ce").bitwiseAND(1) === 1)
        .select((expr("ce div 2") - 1L).as("ck"), col("cts"))
      graft.operators.DenseDimJoin.withValue(agged, "ck", s, c,
          "c_custkey", "sidx", s"$dir/customer#seg")
        .groupBy(col("sidx"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .select(element_at(names, col("sidx")).as("c_mktsegment"),
          col("n_orders"), col("revenue"))
        .transform(sortSmallTopK(_, col("c_mktsegment")))
    }),
    // c07: raw-row shuffle instead of a uselessly-partial aggregate — the
    // union keys are ~unique per map task (random orderkeys), so the
    // map-side HashAggregate builds a large hash table for near-zero
    // collapse; repartition(k) moves the same bytes but skips that build.
    V("r18_c07_repart", "c07_join_agg", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val li = l.select(col("l_orderkey").as("k"),
        lit(null).cast("long").as("ck"),
        (cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("v"),
        lit(1L).as("lc"))
      val os = o.select(col("o_orderkey").as("k"),
        col("o_custkey").cast("long").as("ck"), lit(null).cast("long").as("v"),
        lit(0L).as("lc"))
      li.unionByName(os)
        .repartition(col("k"))
        .groupBy(col("k"))
        .agg(max(col("ck")).as("ck"), sum(col("v")).as("cts"), sum(col("lc")).as("lc"))
        .filter(col("lc") > 0)
        .join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
          col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .transform(sortSmallTopK(_, col("c_mktsegment")))
    }),
    // c07: repartition + bit_or combined — raw 3-col rows through the one
    // exchange, no map-side hash build, single reducer-side aggregate.
    V("r18_c07_repart_bitor", "c07_join_agg", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val li = l.select(col("l_orderkey").as("k"), lit(1L).as("ce"),
        (cents2(col("l_extendedprice")) * (lit(100L) - cents2(col("l_discount")))).as("v"))
      val os = o.select(col("o_orderkey").as("k"),
        ((col("o_custkey").cast("long") + 1L) * 2L).as("ce"),
        lit(null).cast("long").as("v"))
      li.unionByName(os)
        .repartition(col("k"))
        .groupBy(col("k"))
        .agg(expr("bit_or(ce)").as("ce"), sum(col("v")).as("cts"))
        .filter(col("ce").bitwiseAND(1) === 1)
        .select((expr("ce div 2") - 1L).as("ck"), col("cts"))
        .join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
          col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cts")).cast("double") / lit(10000.0)).as("revenue"))
        .transform(sortSmallTopK(_, col("c_mktsegment")))
    }),
    // e02: materialize the minhash signature table ONCE (localCheckpoint)
    // instead of recomputing the 128-perm minhash in all three consumer
    // subtrees (bands + the two signature re-attaches) — the form the
    // shipping comment itself names as the 100 TB shape ("materialize the
    // signature table once and all three passes become column reads").
    V("r18_e02_ckpt", "e02_minhash_pairs", (s, dir) =>
      graft.queries.LlmPipeline.fixtureCheck(s, dir, "e02_minhash_pairs", {
        val sigs = t(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.minhash128(col("text")).as("sig"))
          .localCheckpoint()
        val bands = sigs.select(col("doc_id"),
          posexplode(expr("transform(sequence(0, 31), b -> sha2(cast(slice(sig, b * 4 + 1, 4) AS STRING), 256))")))
          .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
        val pairs = bands.alias("a")
          .join(bands.alias("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
        pairs
          .join(sigs.select(col("doc_id").as("d1"), col("sig").as("s1")), "d1")
          .join(sigs.select(col("doc_id").as("d2"), col("sig").as("s2")), "d2")
          .select(col("d1"), col("d2"),
            expr("CAST(size(filter(zip_with(s1, s2, (x, y) -> x = y), v -> v)) AS DOUBLE) / 128").as("est_jaccard"))
          .filter(col("est_jaccard") >= 0.5)
      }, Seq("d1", "d2"))),
    // e78: checkpoint each normalized half-step — the tot crossJoin makes
    // every score subtree appear TWICE in its consumer, so the unrolled
    // 4-level plan re-executes a1 up to 8x (exponential recompute).
    V("r18_e78_ckpt", "e78_hits", (s, dir) => {
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
      val edges = docs.select(col("source").as("src"),
          concat(lit("src"), col("doc_id") % 7).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct().localCheckpoint()
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct().localCheckpoint()
      def normalized(scores: DataFrame, c: String): DataFrame = {
        val tot = scores.agg(sum(col(c)).as("tot"))
        scores.crossJoin(broadcast(tot))
          .select(col("node"), (col(c) / col("tot")).as(c))
          .localCheckpoint()
      }
      val a1 = normalized(nodes.join(
          edges.groupBy(col("dst").as("node"))
            .agg(count(lit(1)).cast("double").as("a")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("a"), lit(0.0)).as("a")), "a")
      val h1 = normalized(nodes.join(
          edges.join(a1.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node")).agg(sum(col("a")).as("h")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0.0)).as("h")), "h")
      val a2 = normalized(nodes.join(
          edges.join(h1.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("a"), lit(0.0)).as("a")), "a")
      val h2 = normalized(nodes.join(
          edges.join(a2.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node")).agg(sum(col("a")).as("h")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0.0)).as("h")), "h")
      a2.join(h2, "node")
        .select(col("node"), round(col("a"), 6).as("authority"),
          round(col("h"), 6).as("hub"))
        .orderBy(col("node"))
    }),
    // e45: checkpoint edges/outdeg/per-iteration ranks — linear (not
    // exponential) recompute in the unrolled PageRank, but the edges
    // subtree still re-executes ~7x across the 3 iterations.
    V("r18_e45_ckpt", "e45_domain_rank", (s, dir) => {
      val d = 0.85
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
      val edges = docs.select(col("source").as("src"),
          concat(lit("src"), col("doc_id") % 7).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct().localCheckpoint()
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct().localCheckpoint()
      val n = nodes.count().toDouble
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .localCheckpoint()
      var ranks = nodes.withColumn("rank", lit(1.0 / n))
      (1 to 3).foreach { _ =>
        val contrib = edges.join(outdeg, "src")
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("rank") / col("outdeg")).as("c"))
        ranks = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(0.15 / n) + lit(d) * coalesce(col("c"), lit(0.0))).as("rank"))
          .localCheckpoint()
      }
      ranks.select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }),
    // LocalParquet driver-read cost in isolation (prints size + ms)
    V("r18_p_lpq", "", (s, dir) => {
      val t0 = System.nanoTime
      val rows = graft.operators.LocalParquet.readAll(
        s"$dir/customer.parquet", Seq("c_custkey", "c_nationkey"))
      println(f"[lpq] ${rows.size} rows ${(System.nanoTime - t0) / 1e6}%.1f ms")
      t(s, dir, "nation").groupBy().count()
    }),
    // minhash kernel cost in isolation (one pass over documents)
    V("r18_p_minhash", "", (s, dir) =>
      t(s, dir, "documents")
        .select(TextFunctions.minhash128(col("text")).as("sig"))
        .select(max(expr("sig[0]")).as("x"))),
    // e28d: the 40-branch union re-derives the IVF assignment + PQ encode
    // of the fixture corpus inside EVERY branch; checkpoint `encoded` once
    // (guide §3.3: very wide unions — materialize an intermediate to
    // truncate the plan).
    V("r18_e28d_ckpt", "e28d_ann_recall", (s, dir) => {
      val corpus = s.read.parquet(graft.ClusteredFixture.path)
      val k = 16
      val nprobe = 2
      val qids = (0 until 10).map(c => c * 5L * 40L)
      val cs: Array[Array[Float]] = corpus
        .select(col("vec_id").cast("string").as("id"), col("embedding"))
        .orderBy(md5(col("id").cast("binary")), col("id"))
        .limit(k).collect().map(_.getSeq[Float](1).toArray)
      val cb = graft.operators.ProductQuantizer
        .codebook(corpus, "vec_id", "embedding", m = 8, k = 16)
      val qvs: Map[Long, Array[Float]] = corpus
        .filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val indexed = graft.operators.IvfAnn.assign(corpus, "embedding", cs)
      val encoded = graft.operators.ProductQuantizer
        .encode(indexed, "embedding", cb).localCheckpoint()
      val rows = qids.flatMap { qid =>
        val q = qvs(qid)
        val probes = graft.operators.IvfAnn.probeOrder(q, cs)
          .take(nprobe).map(_.toLong)
        val rest = encoded.filter(col("vec_id") =!= qid)
        val cand = rest.filter(col("__ivf_bucket").isin(probes: _*))
        val truth = rest
          .select(col("vec_id"),
            call_function("cosine_sim", col("embedding"), typedlit(q.toSeq)).as("sim"))
          .orderBy(col("sim").desc, col("vec_id")).limit(10)
          .select(col("vec_id"))
        val ivf10 = graft.operators.IvfAnn
          .search(rest, "vec_id", "embedding", cs, q, topK = 10, nprobe = nprobe)
          .select(col("vec_id"))
        val pq10 = graft.operators.ProductQuantizer
          .adcSearchRerank(cand, "vec_id", "embedding", q, cb,
            shortlist = 100, topK = 10)
          .select(col("vec_id"))
        val nCand = cand.agg(count(lit(1)).as("n_cand"))
        Seq(("ivf", ivf10), ("ivf_pq_rerank", pq10)).map { case (config, ann) =>
          ann.join(truth, "vec_id").agg(count(lit(1)).as("n_hits"))
            .crossJoin(broadcast(nCand))
            .select(lit(config).as("config"), lit(qid).as("qid"),
              col("n_hits"), col("n_cand"))
        }
      }
      rows.reduce(_ unionAll _)
        .groupBy(col("config"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_hits")).as("total_hits"),
          min(col("n_hits")).as("min_hits"),
          max(col("n_cand")).as("max_cand"))
        .withColumn("recall_ok", col("total_hits") >= lit(90L))
        .withColumn("cand_ok", col("max_cand") * 4 <= lit(1999L))
        .orderBy(col("config"))
    }),
    // ---- e18: the r5 RAW shared-token pair generator, kept as the A/B
    // twin for the prefix-filtered rewrite (equality-checked against the
    // shipping PrefixFilterJoin form on the same staged data). ----------
    V("e18_raw_pairgen", "e18_dedup_clusters", (s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
      val toks = docs
        .select(col("doc_id"), explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
      val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = toks.select(col("doc_id").as("d1"), col("tok"))
        .join(toks.select(col("doc_id").as("d2"), col("tok")), "tok")
        .filter(col("d1") < col("d2"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
      val edges = inter
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
        .filter(col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")) >= 0.95)
        .select(col("d1"), col("d2"))
      graft.operators.ConnectedComponents.run(edges)
        .select(col("id").as("doc_id"), col("component"))
        .orderBy(col("doc_id"))
    })
  )

  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(graft.operators.Canonicalize.formatRow).sorted

  /** Per-query scheduling-floor attribution (`runMain graft.Lab --floors`):
    * every headline query runs TWICE per round — once on the staged sf
    * data, once on an EMPTY twin of the same tables (same schema, one
    * zero-row parquet file each) — so the floor number is the cost of the
    * query's OWN plan shape (its exact stage/exchange/broadcast count)
    * with no data volume behind it, not a generic one-stage proxy. The
    * data-dependent cost is real − floor, and (real − floor)/baseline is
    * the honest comparison against an engine with no per-stage scheduling
    * (SURVEY §6's floor-bound risk, measured per query instead of argued).
    * Query-major warm + min-of-3, the exact Bench protocol.
    * embeddings keeps exactly ONE row (vec_id=0) instead of zero: e03
    * fetches its query vector driver-side and cannot run on truly empty
    * input, and one 64-float row is a ~0 data term — this is what turns
    * the r7 "n/a (driver-side fetch needs data)" row into a measured
    * floor (VERDICT r7 item 3).
    */
  private def runFloors(spark: SparkSession, staged: String): Unit = {
    val emptyDir = "/tmp/graft_floor_empty_v2"
    Tables.names.foreach { n =>
      val dst = new java.io.File(s"$emptyDir/$n.parquet")
      if (!new java.io.File(dst, "_SUCCESS").exists()) {
        val src = Tables(spark, staged, n)
        val twin =
          if (n == "embeddings") src.filter(col("vec_id") === 0) else src.limit(0)
        twin.coalesce(1).write.mode("overwrite").parquet(dst.toString)
      }
    }
    val names = Bench.headline.map(_._1)
    // NonFatal only: an OOM or fatal JVM error must propagate, and a
    // genuinely broken query must print WHY, not silently become an
    // n/a row in the floor report (ADVICE r6)
    def runOne(n: String, dir: String): Option[Double] =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).collect()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[floors] $n failed on $dir: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      }
    // QUERY-MAJOR timing (the Bench protocol: warm, then min of 3
    // consecutive runs), NOT the variant-A/B interleave: 20 distinct
    // plans exceed Spark's ~100-entry codegen class cache, so a
    // round-major sweep re-janino-compiles evicted units inside every
    // timed run (+2-3× measured) — consecutive runs always hit the
    // freshly compiled classes, which is also exactly how Bench measures
    // the real numbers these floors are subtracted from.
    def minOf(n: String, dir: String): Option[Double] = {
      runOne(n, dir)
      (1 to 3).flatMap(_ => runOne(n, dir)) match {
        case ts if ts.size == 3 => Some(ts.min)
        case _ => None
      }
    }
    // GLOBAL warm pass before any timing (the Bench protocol's other
    // half, found missing in r7): without it the first queries in the
    // list are measured on a cold JVM — Spark's scheduler/scan/codegen-
    // compiler paths still interpreting — and c14, first in the list,
    // read 370 ms here vs 228 ms under Bench on the same idle box. The
    // per-query warm inside minOf still re-heats any codegen class this
    // sweep evicts, so the query-major trap note above stays satisfied.
    names.foreach { n => runOne(n, staged); runOne(n, emptyDir) }
    val real = names.map(n => n -> minOf(n, staged).getOrElse(Double.NaN)).toMap
    val flr = names.map(n => n -> minOf(n, emptyDir)).toMap
    println("[floors] query | floor_ms (same shape, 0 rows) | real_ms | data_ms | (real-floor)/baseline")
    names.foreach { n =>
      val b = Bench.baselineSec(n)
      flr(n) match {
        case Some(f) =>
          val d = math.max(0.0, real(n) - f)
          println(f"[floors] $n%-22s ${f * 1000}%8.1f ${real(n) * 1000}%8.1f ${d * 1000}%8.1f ${d / b}%6.2fx")
        case None =>
          println(f"[floors] $n%-22s      n/a ${real(n) * 1000}%8.1f      n/a    n/a (driver-side fetch needs data)")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", shuffle))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "128m"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPENCOST", "4194304"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.prepare(spark)
    val staged = Bench.stage(spark, sfDir)

    if (args.headOption.contains("--floors")) {
      runFloors(spark, staged)
      spark.stop()
      return
    }

    val sel = args.headOption.getOrElse("")
    val chosen = variants.filter(_.name.startsWith(sel))
    val bases = chosen.map(_.base).filter(_.nonEmpty).distinct

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    // Correctness first (also warms every plan's codegen).
    val eq = chosen.map { v =>
      v.name -> (v.base.isEmpty ||
        canon(v.fn(spark, staged)) == canon(SparkEntry.queries(v.base)(spark, staged)))
    }.toMap

    // INTERLEAVED timing rounds: measuring all bases first and variants
    // after hands the variants a hotter JIT — round-robin keeps the JVM
    // state comparable across everything measured in one run.
    //
    // INVARIANT (r5 measurement footnote, do not regress): every timing
    // thunk REBUILDS its DataFrame inside the closure (`v.fn(spark,
    // staged)` per call, never a captured `val df`). A reused
    // QueryExecution re-serves its materialized AQE stages, so repeat
    // "runs" measure nothing — the e02 A/B once showed fake 0.2 s repeats
    // this way. Any new probe added here must keep construction inside
    // the thunk.
    val all: Seq[(String, () => Unit)] =
      bases.map(b => s"base:$b" -> (() => { SparkEntry.queries(b)(spark, staged).collect(); () })) ++
        chosen.map(v => v.name -> (() => { v.fn(spark, staged).collect(); () }))
    all.foreach { case (_, f) => f() } // warm pass
    val times = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    (1 to 4).foreach { _ =>
      all.foreach { case (n, f) =>
        val t = time(f()); if (t < times(n)) times(n) = t
      }
    }
    // Structural cost per plan: job and stage counts (load-immune).
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
    })
    val shape = all.map { case (n, f) =>
      jobs.set(0); stages.set(0)
      f()
      Thread.sleep(50) // listener bus is async
      n -> (jobs.get, stages.get)
    }.toMap

    all.foreach { case (n, _) =>
      val flag = eq.get(n).map(ok => s"  equal=$ok").getOrElse("")
      val (j, st) = shape(n)
      println(f"[lab] $n%-26s ${times(n) * 1000}%8.1f ms  jobs=$j stages=$st$flag")
    }
    spark.stop()
  }
}
