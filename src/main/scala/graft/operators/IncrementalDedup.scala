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

  private def normalize(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))

  private def sigsOf(base: DataFrame) = base.select(col("doc_id"),
    graft.TextFunctions.minhash128(col("text")).as("sig"))

  // r18 optimization: band key = the raw 4-slot slice (band matching is
  // slice equality; the sha2-of-string form paid 32 SHA-256 hashes per doc
  // for a bigger key — see the e02 note). Candidate set unchanged.
  private def bandsOf(df: DataFrame) = df.select(col("doc_id"),
    posexplode(expr("transform(sequence(0, 31), b -> slice(sig, b * 4 + 1, 4))")))
    .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))

  /** Diagnostic view of the band triples a side contributes to the
    * candidate join — exactly 32 rows per doc. Exposed so the stress
    * harness can assert the scale claim mechanically (probe volume =
    * 32·batch, old×old never generated) instead of by argument.
    */
  def bandTriples(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bandsOf(sigsOf(normalize(docs, idCol, textCol)))

  /** (n, p) candidate pairs → best near-partner per n: (max est, then min
    * id) at est >= 0.5. Struct max compares field-by-field, so negating
    * the id turns min-id into max. Signatures re-attach by id — only the
    * light (n, p) pairs travel through the candidate join.
    */
  private def bestNear(cand: DataFrame, pSigs: DataFrame,
      nSigs: DataFrame): DataFrame = cand
    .join(pSigs.select(col("doc_id").as("p"), col("sig").as("sp")), "p")
    .join(nSigs.select(col("doc_id").as("n"), col("sig").as("sn")), "n")
    .select(col("n"), col("p"),
      expr("CAST(size(filter(zip_with(sp, sn, (x, y) -> x = y), v -> v)) AS DOUBLE) / 128").as("est"))
    .filter(col("est") >= 0.5)
    .groupBy("n")
    .agg(max(struct(col("est"), (-col("p")).as("np"))).as("m"))
    .select(col("n"), col("m.est").as("near_est"), (-col("m.np")).as("near_p"))

  /** Per-doc verdict from the two candidate paths (exact wins). */
  private def assemble(newDocs: DataFrame, exact: DataFrame,
      near: DataFrame): DataFrame = newDocs.select(col("doc_id"))
    .join(exact, col("doc_id") === exact("n"), "left").drop("n")
    .join(near, col("doc_id") === near("n"), "left").drop("n")
    .select(col("doc_id"),
      when(col("ex_p").isNotNull, lit("exact"))
        .when(col("near_p").isNotNull, lit("near"))
        .otherwise(lit("unique")).as("status"),
      coalesce(col("ex_p"), col("near_p")).as("partner"),
      when(col("ex_p").isNotNull, lit(null).cast("double"))
        .otherwise(col("near_est")).as("est_jaccard"))

  /** One row per batch doc: (doc_id, status, partner, est_jaccard).
    * Partner universe = ALL earlier ids (historical + earlier rows of the
    * same batch) — the compaction form that fully resolves a batch.
    */
  def verdicts(docs: DataFrame, idCol: String, textCol: String,
      threshold: Long): DataFrame = {
    val base = normalize(docs, idCol, textCol)
    // r18 optimization: materialize the signature table once — the plan
    // consumed it four times (two band derivations + both bestNear
    // re-attaches), each re-running the 128-perm minhash over the corpus
    // (the e02 fix applied to this operator). At 100 TB this is the
    // "signature table materialized once" shape the header describes.
    // r19: lineage-preserving persist instead of localCheckpoint — the
    // signature table is CORPUS-scale (one row per document), so truncated
    // lineage would make an executor loss fatal at 100 TB (VERDICT r18
    // item 3; see MaterializeOnce).
    val sigs = MaterializeOnce(sigsOf(base))
    val cand = bandsOf(sigs).alias("a")
      .join(bandsOf(sigs.filter(col("doc_id") >= threshold)).alias("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("p"), col("b.doc_id").as("n"))
      .distinct()
    val near = bestNear(cand, sigs, sigs)
    val hashes = base.select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val exact = hashes.filter(col("doc_id") >= threshold)
      .select(col("doc_id").as("n"), col("h"))
      .join(hashes.select(col("doc_id").as("p"), col("h").as("h2")),
        col("h") === col("h2") && col("p") < col("n"))
      .groupBy("n").agg(min(col("p")).as("ex_p"))
    assemble(base.filter(col("doc_id") >= threshold), exact, near)
  }

  /** Batch-vs-STATIC-index verdicts — the streaming micro-batch form:
    * partners come only from `index` (assumed disjoint from `batch`), so
    * each doc's verdict is independent of how arrivals are sliced into
    * micro-batches (what makes a batch oracle legitimate for the
    * streaming twin). Within-batch duplicates are NOT resolved here —
    * that is [[verdicts]]'s compaction job when the batch merges into the
    * index. At scale the index's hash and band tables are precomputed
    * bucketed artifacts; only the arriving batch is hashed per trigger.
    */
  def verdictsVsIndex(batch: DataFrame, index: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val b = normalize(batch, idCol, textCol)
    val ix = normalize(index, idCol, textCol)
    // r18 optimization: both signature tables are consumed twice (band
    // derivation + bestNear re-attach) — materialize each once per call.
    // (At scale the index side is a precomputed bucketed artifact, per the
    // scaladoc; within one micro-batch this materialization is its
    // stand-in.) r19: lineage-preserving persist, not localCheckpoint —
    // corpus-scale rows (VERDICT r18 item 3; see MaterializeOnce).
    val ixSigs = MaterializeOnce(sigsOf(ix))
    val bSigs = MaterializeOnce(sigsOf(b))
    val cand = bandsOf(ixSigs).alias("a")
      .join(bandsOf(bSigs).alias("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
      .select(col("a.doc_id").as("p"), col("b.doc_id").as("n"))
      .distinct()
    val near = bestNear(cand, ixSigs, bSigs)
    val exact = b.select(col("doc_id").as("n"), sha2(col("text"), 256).as("h"))
      .join(ix.select(col("doc_id").as("p"), sha2(col("text"), 256).as("h2")),
        col("h") === col("h2"))
      .groupBy("n").agg(min(col("p")).as("ex_p"))
    assemble(b, exact, near)
  }
}
