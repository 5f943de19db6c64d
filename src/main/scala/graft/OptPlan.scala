package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round plan capture (dev tool): writes
  * `plans/r18/<query>_<tag>.txt` with the `.explain("formatted")` output of
  * each named query — the before/after evidence files the optimization
  * deliverables ask for. Static planning (AQE off) so Exchange counts and
  * join strategies are visible in the initial plan, like PlanDump.
  * Usage: sbt "runMain graft.OptPlan <tag> <query> [query...]"
  */
object OptPlan {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    System.setProperty("graft.sf.name", new java.io.File(sfDir).getName)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.prepare(spark)
    Files.createDirectories(Paths.get("plans", "r19"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim
        .replaceAll("@[0-9a-f]{6,12}", "@id")
      Files.writeString(Paths.get("plans", "r19", s"${name}_$tag.txt"), txt + "\n")
      println(s"[optplan] wrote plans/r19/${name}_$tag.txt")
    }
    spark.stop()
  }
}
