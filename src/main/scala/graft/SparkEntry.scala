package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-block registries (SURVEY.md §2):
  * Relational (C), LLM pipeline (E), geometry (A/B), streaming (D).
  */
object SparkEntry {

  private val blocks: Seq[QueryBlock] = Seq(
    graft.queries.Relational,
    graft.queries.Relational2,
    graft.queries.LlmPipeline,
    graft.queries.Curation,
    graft.queries.CodeCorpus,
    graft.queries.Geometry,
    graft.queries.GeoIO,
    graft.queries.Streaming)

  private lazy val all: Map[String, QueryDef] =
    blocks.flatMap(_.queries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Graft.prepare(spark)
    all("c14_pricing_summary").fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) =>
      name -> ((s: SparkSession, dir: String) => {
        Graft.prepare(s)
        q.fn(s, dir)
      })
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Fixture-oracle SQL carries a scale-factor placeholder; it is
    * substituted HERE, on every access, so the emitted SQL tracks the
    * current `graft.sf.name` property (set by Verify per sfDir) rather
    * than whatever it was when the query maps first initialized.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (name, QueryDef(_, Some(sql))) =>
      name -> sql.replace(graft.queries.LlmPipeline.SfToken,
        graft.queries.LlmPipeline.fixtureSf)
    }

  /** [[oracleSql]] with the fixture scale factor derived from the data
    * directory the queries actually ran against, instead of the
    * `graft.sf.name` property (VERDICT r6 item 5: an external harness
    * that never sets the property would otherwise get sf0.01 fixture
    * paths for every SF). The zero-arg form stays the driver contract;
    * this is the standalone-consumer entry point — pass the same `dir`
    * handed to [[queries]] and the fixture oracle SQL resolves
    * `fixtures/<basename(dir)>/<query>.parquet`. (Named rather than
    * overloaded: a String overload of a parameterless Map-returning def
    * is ambiguous with the Map's own apply at every call site.)
    */
  def oracleSqlFor(dataDir: String): Map[String, String] = {
    val sf = new java.io.File(dataDir).getName
    all.collect { case (name, QueryDef(_, Some(sql))) =>
      name -> sql.replace(graft.queries.LlmPipeline.SfToken, sf)
    }
  }
}
