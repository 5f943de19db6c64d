package graft

import org.apache.spark.sql.SparkSession

/** SQL-name registration for text-pipeline helper functions (SURVEY.md §2 E).
  * Filled in by the llm module; idempotent.
  */
object TextFunctionRegistry {
  def registerAll(spark: SparkSession): Unit = TextFunctions.register(spark)
}
