package graft

import org.apache.spark.sql.SparkSession

/** SQL-name registration for the JTS-backed ST_* functions (SURVEY.md §2 B).
  * Filled in by the geo module; idempotent.
  */
object GeoFunctionRegistry {
  def registerAll(spark: SparkSession): Unit = GeoFunctions.register(spark)
}
