package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc settlement runner: the interleaved two-engine gate
  * (`Bench.interleavedGate` — the same hardened protocol as the standing
  * sf1 gate) at an arbitrary generated SF dir. No committed baseline
  * column exists beyond sf1, so only the same-window live pairing
  * reports.
  *
  * CAVEAT (measured this round): a fresh JVM under-reads Spark by ~2×
  * pure JIT — the driver's standing gate runs after ~40 sf0.1 suite
  * executions have compiled every codegen path. This runner therefore
  * warms with `warmPasses` (default 4) FULL passes over the headline set
  * before the timed rounds; for the committed settlement numbers prefer
  * `SPARK_GRAFT_SF3=1 sbt "runMain graft.Bench"`, which runs the sf3
  * gate in-process after the sf0.1 suite, under exactly the standing sf1
  * gate's conditions.
  *
  * Usage: sbt "runMain graft.SettleSf [dir] [rounds] [warmPasses]" —
  * generate the data first via `python3 scripts/gen_sf.py 3 /tmp/graft_sf3`.
  */
object SettleSf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf3")
    val rounds = if (args.length > 1) args(1).toInt else 5
    val warmPasses = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // the gate runs AQE-on itself
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.prepare(spark)
    val staged = Bench.stage(spark, dir)
    Bench.withAqe(spark, on = true) {
      (0 until warmPasses).foreach { _ =>
        Bench.headline.foreach { case (name, _) =>
          val df = SparkEntry.queries(name)(spark, staged)
          if (Bench.unboundedOutput(name)) df.queryExecution.toRdd.foreach(_ => ())
          else df.collect()
        }
      }
    }
    val gate = Bench.interleavedGate(spark, dir, rounds, committed = None)
    println(s"""{"metric":"settle","dir":"$dir","gate":$gate}""")
    spark.stop()
  }
}
