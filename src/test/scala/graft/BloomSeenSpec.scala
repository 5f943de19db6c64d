package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomSeen

/** Bloom-filter semantics for operators.BloomSeen: the one-sided error
  * guarantee (NO false negatives, ever), determinism of the bitmap,
  * the NULL-bitmap (unknown key) path, and a measured false-positive
  * rate against the standard (1-e^{-kn/m})^k estimate on a set large
  * enough for the estimate to mean something.
  */
class BloomSeenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def urls(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, s"https://h$i.example.com/p/$i"))
      .toDF("id", "url")

  test("no false negatives: every seen URL probes maybe_seen, both forms") {
    val seen = urls(0, 800)
    val out = BloomSeen.globalFilter(seen, seen, "url", k = 3, hexChars = 3)
    assert(out.filter(!col("maybe_seen")).count() === 0)

    val keyed = seen.withColumn("host", pmod(col("id"), lit(7)))
    val outK = BloomSeen.perKeyFilter(keyed, keyed, "host", "url",
      k = 3, hexChars = 2)
    assert(outK.filter(!col("maybe_seen")).count() === 0)
  }

  test("deterministic: two independent builds give identical verdicts") {
    val seen = urls(0, 500)
    val cand = urls(0, 2000)
    def run() = BloomSeen.globalFilter(seen, cand, "url", k = 3, hexChars = 3)
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run() === run())
  }

  test("unknown key probes definitely-new through the NULL bitmap") {
    val seen = urls(0, 100).withColumn("host", lit("known"))
    val cand = urls(100, 120).withColumn("host", lit("never-seen"))
    val out = BloomSeen.perKeyFilter(seen, cand, "host", "url",
      k = 3, hexChars = 2)
    assert(out.count() === 20)
    assert(out.filter(col("maybe_seen")).count() === 0)
  }

  test("false-positive rate stays near the (1-e^{-kn/m})^k estimate") {
    val seen = urls(0, 800) // n=800, k=3, m=4096
    val fresh = urls(100000, 110000) // disjoint by construction
    val out = BloomSeen.globalFilter(seen, fresh, "url", k = 3, hexChars = 3)
    val fp = out.filter(col("maybe_seen")).count().toDouble
    val rate = fp / 10000.0
    val est = math.pow(1.0 - math.exp(-3.0 * 800.0 / 4096.0), 3)
    assert(rate < est * 3 + 0.01, s"rate $rate vs estimate $est")
    assert(fp > 0, "fixture too small to exercise the FP path at this fill")
  }

  test("plan: fixed-state aggregate + broadcast probe, no window, no sort-agg") {
    val seen = urls(0, 300)
    val out = BloomSeen.globalFilter(seen, urls(0, 1000), "url", k = 3, hexChars = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"bitmap not broadcast:\n$plan")
    assert(!plan.contains("Window"), "no window belongs in a bloom probe")
  }
}
