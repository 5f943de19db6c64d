package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (t1 smoke tier uses
  * sf0.001 — SURVEY.md §5.3).
  */
object TestSpark {
  lazy val spark: SparkSession = Graft.session("local[4]", 4)
  val sfDir = "/root/testdata/sf0.001"
}
