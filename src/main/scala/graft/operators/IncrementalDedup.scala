package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (batch-vs-index) dedup — the production shape at corpus
  * scale: a 100 TB corpus is never re-deduped whole. Each ingest batch
  * (rows with id >= `threshold`; in production that membership is ingest
  * metadata) is checked against the historical index AND earlier rows of
  * its own batch, and old×old pairs are never generated — the banded
  * join's probe side holds only new-batch band triples, so candidate
  * volume scales with the batch, not the corpus.
  *
  * Two paths, exact precedence first:
  *  - exact: sha256 equi-join against earlier content hashes (at 100 TB
  *    the historical hash set is a bucketed table — the join is
  *    hash-local, no corpus reshuffle),
  *  - near: banded MinHash-LSH (e02's family: 128 perms, 32 bands of 4),
  *    probe side = new docs only; light (band, bkey, id) triples travel
  *    through the join and full signatures re-attach by id afterwards.
  *
  * Verdict per new doc: `exact` (partner = min earlier id with identical
  * text), else `near` (partner = max est_jaccard then min id, est >= 0.5),
  * else `unique`.
  */
object IncrementalDedup {

  /** One row per batch doc: (doc_id, status, partner, est_jaccard). */
  def verdicts(docs: DataFrame, idCol: String, textCol: String,
      threshold: Long): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    def sigs = base.select(col("doc_id"),
      graft.TextFunctions.minhash128(col("text")).as("sig"))
    def bandsOf(df: DataFrame) = df.select(col("doc_id"),
      posexplode(expr("transform(sequence(0, 31), b -> sha2(cast(slice(sig, b * 4 + 1, 4) AS STRING), 256))")))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
    val cand = bandsOf(sigs).alias("a")
      .join(bandsOf(sigs.filter(col("doc_id") >= threshold)).alias("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("p"), col("b.doc_id").as("n"))
      .distinct()
    val near = cand
      .join(sigs.select(col("doc_id").as("p"), col("sig").as("sp")), "p")
      .join(sigs.select(col("doc_id").as("n"), col("sig").as("sn")), "n")
      .select(col("n"), col("p"),
        expr("CAST(size(filter(zip_with(sp, sn, (x, y) -> x = y), v -> v)) AS DOUBLE) / 128").as("est"))
      .filter(col("est") >= 0.5)
      .groupBy("n")
      // best partner = (max est, then min id): struct max compares
      // field-by-field, so negating the id turns min-id into max.
      .agg(max(struct(col("est"), (-col("p")).as("np"))).as("m"))
      .select(col("n"), col("m.est").as("near_est"), (-col("m.np")).as("near_p"))
    val hashes = base.select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val exact = hashes.filter(col("doc_id") >= threshold)
      .select(col("doc_id").as("n"), col("h"))
      .join(hashes.select(col("doc_id").as("p"), col("h").as("h2")),
        col("h") === col("h2") && col("p") < col("n"))
      .groupBy("n").agg(min(col("p")).as("ex_p"))
    base.filter(col("doc_id") >= threshold).select(col("doc_id"))
      .join(exact, col("doc_id") === exact("n"), "left").drop("n")
      .join(near, col("doc_id") === near("n"), "left").drop("n")
      .select(col("doc_id"),
        when(col("ex_p").isNotNull, lit("exact"))
          .when(col("near_p").isNotNull, lit("near"))
          .otherwise(lit("unique")).as("status"),
        coalesce(col("ex_p"), col("near_p")).as("partner"),
        when(col("ex_p").isNotNull, lit(null).cast("double"))
          .otherwise(col("near_est")).as("est_jaccard"))
  }
}
