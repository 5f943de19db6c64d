package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level duplicate detection — the dedup modality BETWEEN
  * document-level (e01/e02: whole docs) and line-level (e40: exact
  * lines): exact duplicated TOKEN SPANS shared across documents
  * (boilerplate passages, licence blocks, copy-pasted paragraphs).
  * Public method: span dedup over pretraining corpora is the approach of
  * Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (arXiv:2107.06499); their suffix-array machinery is a
  * single-machine construction, so this is the Spark-first
  * re-expression: fixed-k shingle document frequency + per-document
  * island merge, which finds every maximal duplicated span of length
  * >= k by construction (a span duplicated across docs duplicates all
  * of its k-shingles, and maximality falls out of merging consecutive
  * duplicated positions).
  *
  * Pipeline (all declarative, nothing all-pairs):
  *  1. k-token shingles with positions: scan-local transform+posexplode;
  *  2. shingle df: partial+final hash aggregate keyed on the shingle
  *     (kept as TEXT here for 1:1 DuckDB oracle pairing; at production
  *     scale key on xxhash64(shingle) to bound shuffle width — the e40
  *     precedent);
  *  3. shared positions: equi-join against the df>=2 shingle set — build
  *     side has ONE row per duplicated shingle, hot shingles fan out on
  *     the probe side only;
  *  4. islands: consecutive shared positions merge via pos - row_number
  *     over (doc, pos) — the Window partitions by doc_id, so its state is
  *     bounded by DOCUMENT LENGTH (the e40-reassembly bound), never by a
  *     corpus-wide key;
  *  5. maximal spans [start, start+len) with len >= minSpanTokens, span
  *     text re-attached by slicing the doc's own tokens.
  *
  * Candidate volume scales with the number of DUPLICATED positions, not
  * with pairs of documents — a passage shared by a million docs costs a
  * million probe rows, not 10^12 pairs.
  */
object SpanDedup {

  /** @param docs (idCol, textCol) corpus; whitespace-tokenized
    * @param k shingle width in tokens (spans shorter than k are invisible)
    * @param minSpanTokens minimal reported span length in tokens (>= k)
    * @return (doc_id, span_start, span_len, span_text) — token offsets,
    *         0-based, span maximal; unordered (callers sort)
    */
  def sharedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpanTokens: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= k)
    val sh = toks
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks) - $k), i -> array_join(slice(toks, i + 1, $k), ' '))")))
      .select(col("doc_id"), col("pos"), col("col").as("sh"))
    val dfreq = sh.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("sh"))
    val shared = sh.join(dfreq, Seq("sh")).select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = shared
      .withColumn("g", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k) - min(col("pos"))).as("span_len"))
      .filter(col("span_len") >= minSpanTokens)
      .drop("g")
    spans.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("span_start"), col("span_len"),
        array_join(slice(col("toks"), col("span_start") + 1, col("span_len")), " ")
          .as("span_text"))
  }

  /** Span REMOVAL — what the pipeline runs after [[sharedSpans]] (Lee et
    * al. excise all but one occurrence of each duplicated substring):
    * every maximal shared span is removed from every document EXCEPT the
    * lowest doc_id whose shared text begins with the span's first
    * k-shingle. Keying the keeper on the FIRST SHINGLE (not the whole
    * span text) makes the verdict well-defined when docs share
    * differently-extended overlaps of the same passage (doc A has
    * p0..p7, doc B p0..p5: both spans start with the p0-shingle, so one
    * keeper owns the passage family); the documented limitation is that
    * overlap families with DIFFERENT first shingles (B = p2..p7) resolve
    * per-family, each family keeping its own minimal doc.
    *
    * Scale shape on top of [[sharedSpans]]: the keeper table is one
    * aggregate keyed on the first shingle (dimension of distinct
    * duplicated shingles); excision is a per-doc rebuild whose state —
    * the doc's dropped-position list — is bounded by document length.
    *
    * @return (doc_id, n_toks, n_removed, cleaned) for EVERY input doc
    *         (docs with nothing removed pass through, n_removed = 0)
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSpanTokens: Int): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val spans = sharedSpans(docs, idCol, textCol, k, minSpanTokens)
      .join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("span_start"), col("span_len"),
        array_join(slice(col("toks"), col("span_start") + 1, lit(k)), " ")
          .as("head_shingle"))
    val keepers = spans.groupBy(col("head_shingle"))
      .agg(min(col("doc_id")).as("keep_id"))
    val dropPos = spans.join(keepers, Seq("head_shingle"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), explode(expr(
        "sequence(span_start + 1, span_start + span_len)")).as("p"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("p")).as("drop"))
    toks.join(dropPos, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("toks")).as("n_toks"),
        coalesce(size(col("drop")), lit(0)).as("n_removed"),
        array_join(expr(
          """CASE WHEN drop IS NULL THEN toks
             ELSE transform(
               filter(sequence(1, size(toks)), i -> NOT array_contains(drop, i)),
               i -> element_at(toks, i)) END"""), " ").as("cleaned"))
  }
}
