package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact threshold-Jaccard set-similarity self-join with PPJoin-style
  * prefix filtering (Chaudhuri et al. SSJoin / Xiao et al. PPJoin — both
  * public algorithms), replacing the raw shared-token candidate generator
  * that r5's verdict flagged as the repo's one quadratic-on-hot-key shape.
  *
  * Why the raw form dies at 100 TB: joining the exploded token table on
  * the bare token makes every document pair sharing ANY token a join row
  * — within one token's bucket that IS all-pairs, so a stopword appearing
  * in n documents emits n(n−1)/2 rows before the Jaccard filter runs, an
  * unbounded shuffle explosion on exactly the keys guaranteed to be hot.
  *
  * The prefix-filter principle (lossless for Jaccard ≥ τ): order every
  * document's tokens by a GLOBAL canonical order — ascending document
  * frequency, ties on the token string — and join only on each document's
  * first |x| − ⌈τ·|x|⌉ + 1 tokens (its "prefix", the rarest ones).
  *   - J(x,y) ≥ τ ⇒ |x∩y| ≥ τ·|x∪y| ≥ τ·max(|x|,|y|), so any τ-pair
  *     overlaps in at least t = ⌈τ·|x|⌉ tokens;
  *   - prefix lemma: if |x∩y| ≥ t then the first |x|−t+1 tokens of x and
  *     the first |y|−t+1 tokens of y (same total order) share at least
  *     one element — so every qualifying pair survives candidate
  *     generation, and the exact verify step makes the join lossless.
  * Hot tokens almost never land in a prefix (a token in n docs has df=n,
  * sorting it to the back of every list), so candidate buckets are built
  * from RARE tokens: the per-key pair count is bounded by df of the rare
  * tail, not the corpus size. StressSpec-style bound: the max prefix
  * bucket is orders of magnitude below the max raw-token bucket.
  *
  * Shuffle shape at scale (all bounded):
  *   1. df:       groupBy(tok) count — map-side combined;
  *   2. profiles: groupBy(id) sorted token array — one shuffle on the
  *      doc id, state bounded by document length;
  *   3. candidates: equi-join on prefix token over LIGHT (id, sz, ptok)
  *      triples (the r5 e02 lesson — never shuffle payloads for pair
  *      generation), then distinct (d1,d2);
  *   4. verify: two id-equi-joins re-attach the token arrays, exact
  *      intersection via codegen'd array_intersect.
  *
  * Candidate pruning also applies the size filter (τ·max(|x|,|y|) ≤
  * min(|x|,|y|) is necessary for J ≥ τ) before the distinct.
  *
  * All prefix lengths use an epsilon guard (τ·sz − 1e-9) so floating
  * multiplication can never round an exact integer product UP — which
  * would shorten the prefix and silently drop qualifying pairs; 1e-9 is
  * far below the spacing of representable τ·sz values at any real size.
  */
object PrefixFilterJoin {

  private val Eps = 1e-9

  /** Per-document profile: (id, arr, sz) where `arr` is the distinct
    * token array in global canonical order (ascending document frequency,
    * ties on token) and `sz` its length.
    */
  private[graft] def profiles(toks: DataFrame, idCol: String,
      tokCol: String): DataFrame = {
    val dfreq = toks.groupBy(col(tokCol)).agg(count(lit(1)).as("__df"))
    toks.join(dfreq, tokCol)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__df"), col(tokCol).as("t"))))
        .as("__st"))
      .select(col(idCol),
        transform(col("__st"), s => s.getField("t")).as("arr"),
        size(col("__st")).as("sz"))
  }

  /** The candidate-generation table: one (id, sz, ptok) row per PREFIX
    * token. Exposed so stress checks can assert the bucket bound directly.
    */
  private[graft] def prefixTokens(toks: DataFrame, idCol: String,
      tokCol: String, tau: Double): DataFrame =
    profiles(toks, idCol, tokCol)
      .withColumn("__plen",
        (col("sz") - ceil(col("sz") * lit(tau) - lit(Eps)) + 1).cast("int"))
      .select(col(idCol), col("sz"),
        explode(slice(col("arr"), lit(1), col("__plen"))).as("ptok"))

  /** Exact threshold-Jaccard self-join over a distinct (id, token) table.
    * Returns every UNORDERED candidate pair that shares a prefix token and
    * passes the size filter, with the EXACT distinct-intersection count:
    * (d1, d2, inter, sz1, sz2), d1 < d2. Callers apply the final
    * `inter / (sz1 + sz2 − inter) ≥ τ` cut — every pair at or above τ is
    * guaranteed present (prefix filtering is lossless), so the output
    * after that cut is identical to the all-pairs form.
    */
  def pairs(toks: DataFrame, idCol: String, tokCol: String,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"threshold must be in (0,1], got $tau")
    val prof = profiles(toks, idCol, tokCol)
    val pre = prefixTokens(toks, idCol, tokCol, tau)
    val cands = pre.select(col(idCol).as("d1"), col("sz").as("sz1"), col("ptok"))
      .join(pre.select(col(idCol).as("d2"), col("sz").as("sz2"), col("ptok")), "ptok")
      .filter(col("d1") < col("d2") &&
        greatest(col("sz1"), col("sz2")).cast("double") * lit(tau) <=
          least(col("sz1"), col("sz2")).cast("double") + lit(Eps))
      .select(col("d1"), col("d2")).distinct()
    cands
      .join(prof.select(col(idCol).as("d1"), col("arr").as("__a1"),
        col("sz").as("sz1")), "d1")
      .join(prof.select(col(idCol).as("d2"), col("arr").as("__a2"),
        col("sz").as("sz2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("__a1"), col("__a2"))).as("inter"),
        col("sz1"), col("sz2"))
  }

  /** The Jaccard column for a [[pairs]] output — division order fixed so
    * both engines fold identically. */
  def jaccard: Column =
    col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter"))
}
