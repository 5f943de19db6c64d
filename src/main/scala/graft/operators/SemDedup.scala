package graft.operators

import org.apache.spark.sql.DataFrame
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
  * at web scale for exactly this reason); a skewed bucket is split by
  * sub-clustering its members, which only refines the dedup.
  */
object SemDedup {

  /** One row per vector: (id, bucket, status kept|dropped, partner, sim).
    * partner = the SMALLEST-id cluster-mate with cosine >= tau (the
    * deterministic canonical representative — a chain a~b~c all collapses
    * toward the earliest id); sim = cosine to that partner.
    */
  def verdicts(emb: DataFrame, idCol: String, vecCol: String,
      cs: Array[Array[Float]], tau: Double): DataFrame = {
    val asg = IvfAnn.assign(emb, vecCol, cs)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        col("__ivf_bucket").as("bucket"))
    val best = asg.select(col("bucket").as("bp"), col("id").as("p"), col("v").as("vp"))
      .join(asg.select(col("bucket").as("bn"), col("id").as("n"), col("v").as("vn")),
        col("bp") === col("bn") && col("p") < col("n"))
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
