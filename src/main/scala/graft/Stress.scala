package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness (dev tool, not part of the driver contract):
  * materializes a 10× replica of the sf0.1 fact tables and re-runs the
  * headline queries there, asserting that each plan HOLDS ITS SHAPE at the
  * larger volume — dims still broadcast (no silent demotion to a shuffle
  * join), no BroadcastNestedLoopJoin, no SortAggregate, no spill cliffs —
  * and printing per-query times so the sf0.1→sf1 scaling factor is on
  * record (VERDICT r3 item 10: "verify the weak-query plans hold their
  * shape at the largest available volume").
  *
  * Replication scheme (content-preserving, key-consistent):
  *  - fact tables (orders, lineitem, events, documents) are unioned 10×
  *    with primary/foreign keys offset by copy index so join fan-outs and
  *    group cardinalities scale the way real growth would (an order's
  *    lineitems follow it into the same copy; events keep their users);
  *  - ts shifts by `copy` days so the time-bucketed group count (c32's
  *    hourly buckets) grows with volume, the honest-hard case;
  *  - dim tables (region nation customer supplier part, embeddings) stay
  *    at sf0.1 size — dims grow slower than facts in any real warehouse,
  *    and keeping them fixed preserves FK validity.
  */
object Stress {

  val dir = "/tmp/graft_sf1_local"

  def build(s: SparkSession, src: String): Unit = {
    val done = new java.io.File(s"$dir/_DONE")
    if (done.exists()) return
    val copies = (0 until 10).map(lit(_))
    def replicate(df: DataFrame, keyShift: Map[String, Long]): DataFrame =
      copies.map { c =>
        keyShift.foldLeft(df) { case (d, (k, base)) =>
          d.withColumn(k, col(k) + c.cast("long") * lit(base))
        }.withColumn("__copy", c)
      }.reduce(_ unionAll _).drop("__copy")

    // key offsets chosen far above each table's max key at sf0.1
    val M = 100000000L
    val orders = replicate(Tables(s, src, "orders"),
      Map("o_orderkey" -> M))
    val lineitem = replicate(Tables(s, src, "lineitem"),
      Map("l_orderkey" -> M))
    val documents = replicate(Tables(s, src, "documents"),
      Map("doc_id" -> M))
    val events = copies.map { c =>
      Tables(s, src, "events")
        .withColumn("event_id", col("event_id") + c.cast("long") * lit(M))
        .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY") * c)
    }.reduce(_ unionAll _)

    Seq("orders" -> orders, "lineitem" -> lineitem,
      "documents" -> documents, "events" -> events).foreach { case (n, df) =>
      df.repartition(16).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    // dims: pass through unchanged
    Seq("region", "nation", "customer", "supplier", "part", "embeddings")
      .foreach { n =>
        Tables(s, src, n).write.mode("overwrite").parquet(s"$dir/$n.parquet")
      }
    done.createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32") // sized for the 10x volume
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.prepare(spark)

    build(spark, "/root/testdata/sf0.1")

    // Spill accounting: task-level memory/disk spill bytes, accumulated
    // across every query run below. ANY disk spill at 10x local volume
    // means a partition no longer fits its task memory — the early-warning
    // signal for the 100 TB sizing claims.
    val spillBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        ()
      }
    })

    val checks = Seq(
      // the four r3 perf-weak queries + the two heaviest joins
      "c14_pricing_summary", "c20_rollup", "c27_strings", "c32_json_events",
      "c07_join_agg", "e01_exact_dedup", "c09_semi_anti", "c21_rank_window",
      // round-4 additions: the shingle-keyed shuffle profile (the heaviest
      // new op), the bounded-TopK group sample, and scan-local quantization
      "e26_dup_passages", "e23_group_sample", "e24_int8_quantize",
      // round-5 additions (VERDICT r4 item 8): the two remaining
      // shuffle-heavy ops — iterative min-label propagation and the
      // banded minhash join
      "e18_dedup_clusters", "e02_minhash_pairs")

    // minhash128 is a Scala function BY DESIGN (SURVEY §2 E2: owned hash
    // family, golden tier — a 128-permutation signature has no
    // column-algebra form worth codegen'ing); the no-ScalaUDF assertion
    // is for hot paths that HAVE a native form.
    val udfByDesign = Set("e02_minhash_pairs", "e18_dedup_clusters")

    var failed = List.empty[String]
    checks.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def must(ok: Boolean, what: String): Unit =
        if (!ok) failed ::= s"$name: $what"
      must(!plan.contains("BroadcastNestedLoopJoin"), "BNL appeared at 10x")
      must(!plan.contains("CartesianProduct"), "cartesian appeared at 10x")
      must(!plan.contains("SortAggregate"), "HashAggregate demoted to SortAggregate at 10x")
      if (!udfByDesign(name))
        must(!plan.contains("ScalaUDF"), "ScalaUDF appeared in hot path at 10x")
      // queries that rely on a dim broadcast must KEEP it at 10x volume
      if (Set("c20_rollup", "c07_join_agg", "c21_rank_window")(name))
        must(plan.contains("BroadcastHashJoin"), "dim broadcast demoted at 10x")

      def timeOnce(): Double = {
        val t0 = System.nanoTime()
        val d = SparkEntry.queries(name)(spark, dir)
        // unbounded-output queries drain through a foreach sink (collect
        // of a 10x-scaled result would measure driver marshalling)
        if (Set("e01_exact_dedup", "e26_dup_passages", "e24_int8_quantize")(name))
          d.queryExecution.toRdd.foreach(_ => ())
        else d.collect()
        (System.nanoTime() - t0) / 1e9
      }
      val spillBefore = spillBytes.get()
      timeOnce() // warm
      val t = (1 to 3).map(_ => timeOnce()).min
      Thread.sleep(100) // listener bus is async
      val spilled = spillBytes.get() - spillBefore
      val spillNote = if (spilled > 0) f"  SPILLED ${spilled / 1048576}%d MiB" else ""
      println(f"[stress] $name%-22s ${t * 1000}%8.1f ms$spillNote")
    }

    if (spillBytes.get() > 0)
      failed ::= s"spill: ${spillBytes.get()} bytes spilled across the stress runs"
    if (failed.nonEmpty) {
      failed.foreach(f => println(s"[stress] SHAPE FAIL: $f"))
      sys.exit(1)
    }
    println("[stress] all plan shapes hold at 10x")
    spark.stop()
  }
}
