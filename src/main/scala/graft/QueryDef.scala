package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark DataFrame program plus (when the
  * operator is SQL-expressible) the equivalent DuckDB oracle SQL run by the
  * driver against the same parquet tables (SURVEY.md §5.2).
  *
  * Contract notes:
  *  - column names of the Spark result and the oracle SQL must match
  *    (driver sorts columns by name before hashing);
  *  - every query orders its output totally (deterministic hash);
  *  - doubles are produced by order-independent arithmetic (decimal sums /
  *    fixed folds) so both engines emit bit-identical values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryBlock {
  def queries: Map[String, QueryDef]
}
