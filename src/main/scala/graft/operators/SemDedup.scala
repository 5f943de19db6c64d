package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication",
  * arXiv:2303.09540, public method): coarse-cluster the embeddings, then
  * within each cluster mark every vector that has a smaller-id
  * cluster-mate with cosine >= tau as a semantic duplicate of that mate.
  *
  * Scale shape: assignment is [[IvfAnn.assign]]'s scan-local argmax over
  * broadcast literal centroids (no shuffle); the pair join shuffles on
  * bucket id only and generates pairs WITHIN buckets, never across — the
  * published algorithm's shape. Per-bucket work is quadratic in bucket
  * size, so k must scale with the corpus (k ≈ N / target_cluster_size
  * keeps per-reducer pair volume bounded — SemDeDup uses ~100k clusters
  * at web scale for exactly this reason). A SKEWED bucket is split by
  * sub-clustering (one level, fresh per-bucket centroids — `maxBucket` /
  * `subK` below, VERDICT r7 item 4): pairs then generate within
  * (bucket, sub), which bounds a hot bucket's pair volume by
  * ~(size/subK)²·subK/2 instead of size²/2 and only REFINES the dedup
  * (cross-sub near-dups are forgone — the published recall/cost
  * trade-off). The split is fully distributed: sub-centroid selection is
  * a per-bucket row_number window (state O(1) per key), sub-assignment a
  * subK-fan-out join + argmax aggregate — no driver-side per-bucket
  * loop, no collected hot-bucket state. Degenerate worst case: a bucket
  * of near-identical vectors re-collapses into one sub-bucket (any
  * similarity-preserving split must put duplicates together); the
  * mitigation at 100 TB is raising k, not deeper recursion.
  */
object SemDedup {

  /** (id, v, bucket, sub) per vector: coarse bucket = centroid argmax;
    * sub = 0 everywhere a bucket is within `maxBucket`, else the argmax
    * over `subK` fresh sub-centroids (the bucket's subK members with the
    * smallest xxhash64(id) — a deterministic spread sample, the
    * [[IvfAnn.centroids]] rule applied bucket-locally).
    */
  def assignments(emb: DataFrame, idCol: String, vecCol: String,
      cs: Array[Array[Float]], maxBucket: Long = Long.MaxValue,
      subK: Int = 8): DataFrame = {
    val asg = IvfAnn.assign(emb, vecCol, cs)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        col("__ivf_bucket").as("bucket"))
    if (maxBucket == Long.MaxValue)
      return asg.withColumn("sub", lit(0))
    // bucket sizes: ≤ k rows — broadcast both here and into the member join
    val sizes = asg.groupBy("bucket").agg(count(lit(1)).as("__bsz"))
    val flagged = asg.join(broadcast(sizes), "bucket")
    val cold = flagged.filter(col("__bsz") <= maxBucket)
      .select(col("id"), col("v"), col("bucket"), lit(0).as("sub"))
    val hotMembers = flagged.filter(col("__bsz") > maxBucket)
    val subCents = hotMembers
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(xxhash64(col("id")), col("id"))))
      .filter(col("__rn") <= subK)
      .select(col("bucket").as("cb"), (col("__rn") - 1).cast("int").as("csub"),
        col("v").as("cv"))
    // hot-bucket rows × their own subK sub-centroids → per-member argmax.
    // min(struct(-sim, sub)) = highest sim, smallest sub on ties (the
    // IvfAnn.assign first-max-wins rule); NULL cosine (zero-norm vector)
    // folds to -2 — below any real cosine — so after the *-1 negation all
    // its sub-centroid keys tie at +2 and min(struct) picks the smallest
    // csub: the zero-norm vector lands deterministically in the FIRST
    // (lowest-index) sub-centroid rather than vanishing.
    val hot = hotMembers
      .join(broadcast(subCents), col("bucket") === col("cb"))
      .withColumn("__negs",
        coalesce(call_function("cosine_sim", col("v"), col("cv")), lit(-2.0d)) * -1)
      .groupBy(col("id"))
      .agg(min(struct(col("__negs"), col("csub"))).as("m"),
        first(col("bucket")).as("bucket"), first(col("v")).as("v"))
      .select(col("id"), col("v"), col("bucket"), col("m.csub").as("sub"))
    cold.unionByName(hot)
  }

  /** One row per vector: (id, bucket, status kept|dropped, partner, sim).
    * partner = the SMALLEST-id (bucket, sub)-mate with cosine >= tau (the
    * deterministic canonical representative — a chain a~b~c all collapses
    * toward the earliest id); sim = cosine to that partner.
    */
  def verdicts(emb: DataFrame, idCol: String, vecCol: String,
      cs: Array[Array[Float]], tau: Double,
      maxBucket: Long = Long.MaxValue, subK: Int = 8): DataFrame = {
    val asg = assignments(emb, idCol, vecCol, cs, maxBucket, subK)
    val best = asg.select(col("bucket").as("bp"), col("sub").as("sp"),
        col("id").as("p"), col("v").as("vp"))
      .join(asg.select(col("bucket").as("bn"), col("sub").as("sn"),
          col("id").as("n"), col("v").as("vn")),
        col("bp") === col("bn") && col("sp") === col("sn") && col("p") < col("n"))
      .select(col("n"), col("p"),
        call_function("cosine_sim", col("vp"), col("vn")).as("sim"))
      .filter(col("sim") >= tau)
      .groupBy("n")
      // min(struct) = min p field-first; p is unique per n, so the struct
      // deterministically carries that partner's sim along.
      .agg(min(struct(col("p"), col("sim"))).as("m"))
      .select(col("n"), col("m.p").as("partner"), col("m.sim").as("psim"))
    asg.select(col("id"), col("bucket"))
      .join(best, col("id") === best("n"), "left").drop("n")
      .select(col("id"), col("bucket"),
        when(col("partner").isNotNull, lit("dropped"))
          .otherwise(lit("kept")).as("status"),
        col("partner"), col("psim").as("sim"))
  }
}
