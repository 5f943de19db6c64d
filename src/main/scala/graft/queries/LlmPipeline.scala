package graft.queries

import graft.{Graft, QueryBlock, QueryDef, Tables, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (SURVEY.md §2 block E): dedup, embedding
  * similarity / KNN, tokenization, n-grams, TF-IDF, sentiment, similarity
  * joins, multimodal ingest, corpus profiling.
  *
  * Scale notes (100 TB design point, SURVEY §7):
  *  - every similarity join here is join-shaped (pair generation via a key:
  *    LSH band, shared token, length bucket) — never a materialized
  *    cartesian; the only cross joins broadcast a bounded query set;
  *  - embedding math runs in codegen'd higher-order functions
  *    (aggregate/zip_with), not UDFs;
  *  - dedup/TF-IDF are partial+final hash aggregates — the stock
  *    HashAggregateExec path.
  */
object LlmPipeline extends QueryBlock {
  import Graft._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)
  private val scratch = graft.Graft.scratchDir

  /** Spark-side cosine similarity: the fused codegen'd Catalyst expression
    * (graft.functions.CosineSimilarity) — one loop instead of the 3-pass
    * aggregate∘zip_with HOF chain, same sequential fold per accumulator, so
    * DuckDB's list_sum over the same casts reproduces it bit-for-bit.
    */
  private def cosineExpr(a: String, b: String): String =
    s"cosine_sim($a, $b)"

  /** DuckDB-side byte extraction from `H = hex(content)` (read_blob): 1.0
    * has no blob slicing, so byte `off` (1-based) is two hex chars; strpos
    * over '123456789ABCDEF' maps a nibble to its value ('0' -> 0 via the
    * deliberate 0-for-not-found).
    */
  private def duckHexByte(off: Int): String =
    s"(strpos('123456789ABCDEF', substr(H, ${2 * off - 1}, 1))*16 + strpos('123456789ABCDEF', substr(H, ${2 * off}, 1)))"
  private def duckLeU16(off: Int): String =
    s"(${duckHexByte(off)} + 256*${duckHexByte(off + 1)})"
  private def duckLeU32(off: Int): String =
    s"(${duckHexByte(off)} + 256*${duckHexByte(off + 1)} + 65536*${duckHexByte(off + 2)} + 16777216*${duckHexByte(off + 3)})"
  private def duckBeU16(off: Int): String =
    s"(256*${duckHexByte(off)} + ${duckHexByte(off + 1)})"
  private def duckBeU32(off: Int): String =
    s"(16777216*${duckHexByte(off)} + 65536*${duckHexByte(off + 1)} + 256*${duckHexByte(off + 2)} + ${duckHexByte(off + 3)})"

  /** DuckDB-side cosine with the same op order. */
  private def duckCosine(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""

  val queries: Map[String, QueryDef] = Map(
    // E1 — exact dedup: canonical keeper (min doc_id) + multiplicity per
    // distinct text. Partial+final hash agg; at 100 TB group on sha2(text)
    // instead of raw text to bound shuffle width (same result).
    // No final ORDER BY: dedup output scales with the corpus, so a global
    // sort is not part of the operator (at 100 TB it would be a second
    // full shuffle + a range-sampling rerun of the agg). The driver gate
    // and selfcheck both canonicalize by sorting rows before hashing.
    "e01_exact_dedup" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(sha2(col("text"), 256).as("h"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY sha256(text)""")),

    // E3 — brute-force cosine top-10 against query vector 0 (BASELINE B9).
    // The single query vector is LITERAL-BOUND: one bounded driver-side
    // lookup (1 row by construction), then the scan scores against an
    // inlined array literal — no BroadcastExchange, no join; the whole
    // query is one TakeOrdered pass over the corpus. This is the 100 TB
    // plan: a 1-row "table" has no business in a distributed join.
    "e03_cosine_topk" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        // collect(), not head(): head's incremental limit probes partitions
        // in waves (several sub-jobs); one stats-pruned scan is one job
        val qv: Array[Float] = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).collect().head.getSeq[Float](0).toArray
        emb.select(col("vec_id"),
            call_function("cosine_sim", col("embedding"), typedlit(qv)).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, ${duckCosine("embedding", "q")} AS sim
        FROM embeddings CROSS JOIN q
        ORDER BY sim DESC, vec_id LIMIT 10""")),

    // E4 — KNN join: 5 query vectors -> 3 nearest corpus vectors each.
    // Broadcast the bounded query side; scores stay distributed. The 100 TB
    // corpus-vs-corpus variant batches the probe side (SURVEY §4.3).
    "e04_knn_join" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("q"))
        val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
        emb.crossJoin(broadcast(q))
          .select(col("qid"), col("vec_id"), expr(cosineExpr("embedding", "q")).as("sim"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("qid"), col("rk"), col("vec_id"), col("sim"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id < 5),
        scored AS (SELECT qid, vec_id, ${duckCosine("embedding", "q")} AS sim
          FROM embeddings CROSS JOIN q),
        ranked AS (SELECT qid, vec_id, sim,
          CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS INT) AS rk
          FROM scored)
        SELECT qid, rk, vec_id, sim FROM ranked WHERE rk <= 3 ORDER BY qid, rk""")),

    // E4b — the SAME KNN join through the bounded-memory TopK aggregator
    // (operators.TopK, the 100 TB path: k-sized buffers map-side instead
    // of a full window sort) — deliberately shares e04's oracle, proving
    // path equivalence on real data.
    "e04b_knn_topk" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("q"))
        val scored = emb.crossJoin(broadcast(q))
          .select(col("qid"), col("vec_id"), expr(cosineExpr("embedding", "q")).as("sim"))
          .filter(col("sim").isNotNull) // zero-norm vectors: NULL sim
          .as[(Long, Long, Double)]
        scored.groupByKey(_._1)
          .mapValues(r => (r._3, r._2))
          .agg(new graft.operators.TopK(3).toColumn.name("top"))
          .flatMap { case (qid, top) =>
            top.zipWithIndex.map { case ((sim, vid), i) => (qid, i + 1, vid, sim) }
          }
          .toDF("qid", "rk", "vec_id", "sim")
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id < 5),
        scored AS (SELECT qid, vec_id, ${duckCosine("embedding", "q")} AS sim
          FROM embeddings CROSS JOIN q),
        ranked AS (SELECT qid, vec_id, sim,
          CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS INT) AS rk
          FROM scored)
        SELECT qid, rk, vec_id, sim FROM ranked WHERE rk <= 3 ORDER BY qid, rk""")),

    // E4c — corpus×corpus KNN BATCHED (the 100 TB path, SURVEY §4.3): when
    // neither side broadcasts, iterate the corpus in disjoint batches, keep
    // a bounded per-query TopK per batch, then merge batch results with the
    // SAME aggregator — TopK merge is associative, so top3(∪ batch-top3s)
    // = global top3. Each batch is one bounded join; running state is k
    // rows per query, never the full score matrix. Cross-validated against
    // e04's oracle on the full corpus (same 15 rows).
    "e04c_knn_batched" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("q"))
        val nBatches = 4
        val batchTopks = (0 until nBatches).map { b =>
          emb.filter(col("vec_id") % nBatches === b)
            .crossJoin(broadcast(q))
            .select(col("qid"), col("vec_id"), expr(cosineExpr("embedding", "q")).as("sim"))
            .filter(col("sim").isNotNull)
            .as[(Long, Long, Double)]
            .groupByKey(_._1)
            .mapValues(r => (r._3, r._2))
            .agg(new graft.operators.TopK(3).toColumn.name("top"))
            .flatMap { case (qid, top) => top.map { case (sim, vid) => (qid, vid, sim) } }
        }
        batchTopks.reduce(_ union _)
          .groupByKey(_._1)
          .mapValues(r => (r._3, r._2))
          .agg(new graft.operators.TopK(3).toColumn.name("top"))
          .flatMap { case (qid, top) =>
            top.zipWithIndex.map { case ((sim, vid), i) => (qid, i + 1, vid, sim) }
          }
          .toDF("qid", "rk", "vec_id", "sim")
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id < 5),
        scored AS (SELECT qid, vec_id, ${duckCosine("embedding", "q")} AS sim
          FROM embeddings CROSS JOIN q),
        ranked AS (SELECT qid, vec_id, sim,
          CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS INT) AS rk
          FROM scored)
        SELECT qid, rk, vec_id, sim FROM ranked WHERE rk <= 3 ORDER BY qid, rk""")),

    // E5 — tokenize/normalize: codegen'd split/lower, no UDF.
    "e05_tokenize" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).as("n_tok"),
            size(array_distinct(split(lower(col("text")), " "))).as("n_distinct_tok"),
            element_at(split(col("text"), " "), 1).as("first_tok"),
            length(col("text")).as("n_char"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        CAST(len(list_distinct(string_split(lower(text), ' '))) AS INT) AS n_distinct_tok,
        string_split(text, ' ')[1] AS first_tok,
        CAST(length(text) AS INT) AS n_char
        FROM documents ORDER BY doc_id""")),

    // E5b — BPE-ish regex tokenization (north star: "token counting —
    // whitespace + a BPE-ish regex"): letter-runs / digit-runs /
    // punctuation-runs, the RE2-safe core of GPT-2's pretokenizer split
    // (lookaheads excluded — DuckDB's RE2 lacks them).
    "e05_bpe_tokens" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            expr("""regexp_extract_all(lower(text), '([a-z]+|[0-9]+|[^a-z0-9\\s]+)', 1)""").as("toks"))
          .select(col("doc_id"),
            size(col("toks")).as("n_bpe_tok"),
            expr("try_element_at(toks, 1)").as("tok1"),
            expr("size(filter(toks, x -> x rlike '^[0-9]+$'))").as("n_num_tok"))
          .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id,
          regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+', 0) AS toks
          FROM documents)
        SELECT doc_id,
          CAST(len(toks) AS INT) AS n_bpe_tok,
          toks[1] AS tok1,
          CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) AS INT) AS n_num_tok
        FROM t ORDER BY doc_id""")),

    // E — document fingerprint (owned rolling hash; GOLDEN via
    // TextGoldenSpec cross-language fixture, rows-only here).
    "e_fingerprint" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp64"))
          .orderBy(col("doc_id")),
      None),

    // E20 — language-ID by n-gram profile scoring with COMMITTED profiles
    // (functions.LangId: 18 frequency-table trigrams per language, fixed
    // tie-break). Scoring is pure scan-local codegen string algebra — no
    // explode, no shuffle beyond the output sort — so the classifier runs
    // at full scan speed at any corpus size. The oracle SQL is GENERATED
    // from the same profile table, so profile edits can never desync the
    // two sides; LangIdSpec asserts real cross-language discrimination on
    // a multilingual fixture (the synthetic corpus here is English-ish
    // under every label, so this gate checks arithmetic parity).
    "e20_langid" -> QueryDef(
      (s, dir) => {
        import graft.functions.LangId
        t(s, dir, "documents")
          .select(Seq(col("doc_id")) ++ LangId.scoreColumns(col("text")): _*)
          .withColumn("pred_lang", LangId.predict)
          .orderBy(col("doc_id"))
      },
      Some {
        import graft.functions.LangId
        val scoreCols = LangId.Profiles.map { case (l, tris) =>
          s"${LangId.oracleScoreSql(tris)} AS s_$l"
        }.mkString(",\n          ")
        val sNames = LangId.Profiles.map(p => s"s_${p._1}").mkString(", ")
        s"""WITH sc AS (SELECT doc_id,
          $scoreCols
          FROM documents)
        SELECT doc_id, $sNames,
          ${LangId.oraclePredictSql} AS pred_lang
        FROM sc ORDER BY doc_id"""
      }),

    // E21 — repetition-based quality scoring (the Gopher/FineWeb-style
    // filters every corpus pipeline runs): per-document fraction of tokens
    // taken by the most frequent token, repeated-token fraction, and the
    // most frequent BIGRAM's share — high values mark boilerplate/spam.
    // Token stats reduce by (doc_id, token) with map-side partial
    // aggregation, so at 100 TB the shuffle carries per-doc-token partials,
    // never raw token streams; bigrams come from a scan-local zip_with of
    // the shifted token array (no second tokenization pass). Docs with <2
    // tokens keep NULL bigram stats through the left join in BOTH engines
    // (empty n-gram set → no rows → join null), not a fabricated zero.
    "e21_repetition_quality" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"),
            expr("filter(split(lower(text), ' '), x -> x != '')").as("toks"))
        val wstats = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("nd_tok"),
            max(col("c")).as("max_tok"))
        val bgstats = docs.select(col("doc_id"),
            explode(when(size(col("toks")) >= 2, expr(
              "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), (a, b) -> concat(a, ' ', b))"))
              .otherwise(typedlit(Seq.empty[String]))).as("bg"))
          .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_bg"), max(col("c")).as("max_bg"))
        wstats.join(bgstats, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"), col("nd_tok"),
            (col("max_tok").cast("double") / col("n_tok")).as("top_word_frac"),
            (lit(1.0) - col("nd_tok").cast("double") / col("n_tok")).as("dup_word_frac"),
            (col("max_bg").cast("double") / col("n_bg")).as("top_bigram_frac"))
          .withColumn("keep",
            col("top_word_frac") <= 0.12 && col("dup_word_frac") <= 0.65)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS s
          FROM documents WHERE text IS NOT NULL),
        toks AS (SELECT doc_id, unnest(s) AS tok FROM d),
        wc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS nd_tok,
            max(c) AS max_tok
          FROM wc GROUP BY 1),
        bg AS (SELECT doc_id, s[i] || ' ' || s[i+1] AS b
          FROM d, UNNEST(generate_series(1, len(s) - 1)) AS u(i)),
        bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        bs AS (SELECT doc_id, sum(c) AS n_bg, max(c) AS max_bg FROM bc GROUP BY 1)
        SELECT ws.doc_id, n_tok, nd_tok,
          CAST(max_tok AS DOUBLE) / n_tok AS top_word_frac,
          1.0 - CAST(nd_tok AS DOUBLE) / n_tok AS dup_word_frac,
          CAST(max_bg AS DOUBLE) / n_bg AS top_bigram_frac,
          (CAST(max_tok AS DOUBLE) / n_tok <= 0.12
            AND 1.0 - CAST(nd_tok AS DOUBLE) / n_tok <= 0.65) AS keep
        FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
        ORDER BY ws.doc_id""")),

    // E22 — eval-set decontamination (the stage every training pipeline
    // runs before a model sees the corpus): flag any training document
    // sharing a 4-token shingle with the held-out eval set (here: the
    // first 10 docs stand in for a benchmark suite). The eval shingle set
    // BROADCASTS — benchmark suites are kilobytes against terabyte corpora,
    // exactly the production shape — so the corpus side stays scan-local:
    // shingle, broadcast-hash semi-probe, per-doc count; no corpus shuffle
    // until the tiny flagged remainder aggregates.
    "e22_decontaminate" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"),
            expr("filter(split(lower(text), ' '), x -> x != '')").as("toks"))
        val grams = docs.select(col("doc_id"),
          explode(when(size(col("toks")) >= 4, expr(
            """transform(sequence(1, size(toks) - 3),
               i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
                              element_at(toks, i + 2), element_at(toks, i + 3)))"""))
            .otherwise(typedlit(Seq.empty[String]))).as("gram"))
        val evalGrams = grams.filter(col("doc_id") < 10)
          .select(col("gram")).distinct()
        grams.filter(col("doc_id") >= 10)
          .join(broadcast(evalGrams), Seq("gram"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("gram")).as("n_shared_grams"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS s
          FROM documents WHERE text IS NOT NULL),
        g AS (SELECT doc_id, array_to_string(s[i:i+3], ' ') AS gram
          FROM d, UNNEST(generate_series(1, len(s) - 3)) AS u(i)),
        ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10)
        SELECT doc_id, count(DISTINCT gram) AS n_shared_grams
        FROM g JOIN ev USING (gram)
        WHERE doc_id >= 10
        GROUP BY doc_id ORDER BY doc_id""")),

    // E23 — fixed-size deterministic per-group sample ("exactly k docs per
    // language"): score each doc by an integer hash permutation both
    // engines compute exactly in BIGINT arithmetic (Knuth multiplicative
    // step mod a prime; id*a stays in Long for id < ~3.4e9 — beyond that
    // domain swap in xxhash64 via Graft.hashSampleFilter, the production
    // fast path, at the cost of the DuckDB pairing), keep the k smallest
    // per group through the bounded
    // TopK aggregator — map-side state is k rows per partition per group
    // (the 100 TB path), never a full per-group sort. The oracle ranks the
    // same permutation with a window function.
    "e23_group_sample" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val k = 10
        t(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            (col("doc_id") * lit(2654435761L)) % lit(4294967311L)).as[(String, Long, Long)]
          .groupByKey(_._1)
          .mapValues(r => (-r._3.toDouble, r._2)) // TopK keeps largest; negate for smallest-h
          .agg(new graft.operators.TopK(k).toColumn.name("top"))
          .flatMap { case (lang, top) =>
            top.zipWithIndex.map { case ((negH, id), i) => (lang, i + 1, id, (-negH).toLong) }
          }
          .toDF("lang", "rk", "doc_id", "h")
          .orderBy(col("lang"), col("rk"))
      },
      Some("""WITH s AS (SELECT lang, doc_id,
          (doc_id * 2654435761) % 4294967311 AS h FROM documents),
        ranked AS (SELECT lang, doc_id, h,
          CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS INT) AS rk
          FROM s)
        SELECT lang, rk, doc_id, h FROM ranked WHERE rk <= 10 ORDER BY lang, rk""")),

    // E24 — symmetric int8 embedding quantization (4x smaller vectors at
    // rest / on the shuffle wire — the compression step before ANN
    // indexing at 100 TB): per-vector max-abs scale,
    // q = floor(x*127/maxabs + 0.5) — the EXPLICIT half-up formula, so
    // engine rounding semantics never enter; zero vectors quantize to
    // NULL. Scan-local arithmetic, no shuffle. Dequantization error
    // bound (<= maxabs/254 per component) is PipelineOpsPropertySpec's.
    // The quantized vector is emitted as a comma-joined scalar (c18
    // precedent): the driver's pandas canonicalization sorts rows across
    // all columns and cannot hash an array cell, so both engines encode
    // the vector as one string. maxabs is coalesced to 0.0 on BOTH sides
    // so a NULL embedding row yields (0.0, NULL) identically.
    "e24_int8_quantize" -> QueryDef(
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            coalesce(
              expr("aggregate(embedding, 0.0D, (s, x) -> greatest(s, abs(CAST(x AS DOUBLE))))"),
              lit(0.0)).as("maxabs"))
          .select(col("vec_id"),
            round(col("maxabs"), 6).as("scale_max"),
            when(col("maxabs") > 0, expr(
              "array_join(transform(embedding, x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS INT) AS STRING)), ',')"))
              .as("q_csv"))
          .orderBy(col("vec_id")),
      Some("""WITH m AS (SELECT vec_id, embedding,
          coalesce(list_aggregate(list_transform(embedding,
            x -> abs(CAST(x AS DOUBLE))), 'max'), 0.0) AS maxabs
          FROM embeddings)
        SELECT vec_id, round(maxabs, 6) AS scale_max,
          CASE WHEN maxabs > 0 THEN list_aggregate(list_transform(embedding,
            x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS INT) AS VARCHAR)),
            'string_agg', ',') END AS q_csv
        FROM m ORDER BY vec_id""")),

    // E27 — weighted sampling (Efraimidis-Spirakis A-Res): k docs chosen
    // with probability proportional to length (the quality/size-weighted
    // mixture step of corpus construction). u = deterministic hash uniform
    // in (0,1] (exact BIGINT arithmetic then one correctly-rounded
    // division; same id-domain note as e23 — swap in xxhash64 beyond
    // id ~3.4e9), priority = ln(u)/w — monotone with u^(1/w), top-k by
    // priority DESC. Rounded to 9dp with an id tie-break so a last-ulp
    // transcendental difference between engines cannot flip the ranking.
    // Global top-k plans as TakeOrderedAndProject: k-row state per
    // partition, no full sort — the same shape at any corpus size.
    "e27_weighted_sample" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .filter(col("n_chars") > 0)
          .withColumn("u",
            (((col("doc_id") * lit(2654435761L)) % lit(4294967311L)) + 1).cast("double")
              / lit(4294967312.0))
          .withColumn("priority", round(log(col("u")) / col("n_chars"), 9))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("priority"))
          .orderBy(col("priority").desc, col("doc_id"))
          .limit(50),
      Some("""SELECT doc_id, lang, n_chars,
          round(ln(((doc_id * 2654435761) % 4294967311 + 1) / 4294967312.0)
            / n_chars, 9) AS priority
        FROM documents WHERE n_chars > 0
        ORDER BY priority DESC, doc_id LIMIT 50""")),

    // E26 — corpus-wide duplicated-passage profile (the Gopher/C4
    // "duplicate n-gram fraction" quality signal): a 5-token shingle is
    // duplicated when it occurs in >= 2 DISTINCT documents; per document,
    // count distinct shingles and the fraction that are corpus-duplicated.
    // Join-shaped (shingle-keyed shuffle + semi join back) — linear in
    // corpus size, no all-pairs comparison. Documents under 5 tokens have
    // no shingles and drop out on both sides.
    "e26_dup_passages" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"),
            expr("filter(split(lower(text), ' '), x -> x != '')").as("toks"))
        val grams = docs.select(col("doc_id"),
          explode(when(size(col("toks")) >= 5, expr(
            """transform(sequence(1, size(toks) - 4),
               i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
                              element_at(toks, i + 2), element_at(toks, i + 3),
                              element_at(toks, i + 4)))"""))
            .otherwise(typedlit(Seq.empty[String]))).as("gram"))
          .distinct()
        val dupGrams = grams.groupBy(col("gram"))
          .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select(col("gram"))
        val perDoc = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
        val dupPerDoc = grams.join(dupGrams, Seq("gram"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
        perDoc.join(dupPerDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_dup"), lit(0L)).as("n_dup"),
            round(coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_shingles"), 6)
              .as("dup_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
          list_filter(string_split(lower(text), ' '), x -> x <> '') AS s
          FROM documents WHERE text IS NOT NULL),
        g AS (SELECT DISTINCT doc_id, array_to_string(s[i:i+4], ' ') AS gram
          FROM d, UNNEST(generate_series(1, len(s) - 4)) AS u(i)),
        dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        per_doc AS (SELECT doc_id, count(*) AS n_shingles FROM g GROUP BY doc_id),
        dup_per_doc AS (SELECT doc_id, count(*) AS n_dup
          FROM g WHERE gram IN (SELECT gram FROM dup) GROUP BY doc_id)
        SELECT p.doc_id, p.n_shingles, coalesce(dp.n_dup, 0) AS n_dup,
          round(CAST(coalesce(dp.n_dup, 0) AS DOUBLE) / p.n_shingles, 6) AS dup_frac
        FROM per_doc p LEFT JOIN dup_per_doc dp USING (doc_id)
        ORDER BY p.doc_id""")),

    // E6 — quality signals: stopword ratio (literal list), word stats,
    // language filter. All codegen'd higher-order fns.
    "e06_text_quality" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"), col("n_chars"))
          .select(col("doc_id"),
            size(col("toks")).as("n_tok"),
            expr("size(filter(toks, x -> x IN ('the','and','of','to','a','in','is','value','data')))").as("n_stop"),
            expr("CAST(size(filter(toks, x -> x IN ('the','and','of','to','a','in','is','value','data'))) AS DOUBLE) / size(toks)").as("stop_ratio"),
            expr("CAST(n_chars AS DOUBLE) / size(toks)").as("chars_per_tok"))
          .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks, n_chars
          FROM documents WHERE lang = 'en')
        SELECT doc_id,
          CAST(len(toks) AS INT) AS n_tok,
          CAST(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','value','data'], x))) AS INT) AS n_stop,
          CAST(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','value','data'], x))) AS DOUBLE) / len(toks) AS stop_ratio,
          CAST(n_chars AS DOUBLE) / len(toks) AS chars_per_tok
        FROM t ORDER BY doc_id""")),

    // E7 — word bigrams via transform(sequence(...)) — guard the
    // single-token case (Spark's sequence(1,0) is DESCENDING, not empty).
    "e07_ngrams" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .filter(col("doc_id") < 20)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"),
            // Scalar \x01-joined encoding: driver's pandas oracle cannot
            // sort/hash array columns (round-1 `err` on this query).
            expr("""array_join(CASE WHEN size(toks) < 2 THEN array()
              ELSE transform(sequence(1, size(toks) - 1),
                i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) END,
              chr(1))""").as("bigrams"))
          .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 20)
        SELECT doc_id,
          array_to_string(list_transform(generate_series(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i + 1]), chr(1)) AS bigrams
        FROM t ORDER BY doc_id""")),

    // E8 — TF-IDF, pure relational (explode -> tf; df join; smooth idf).
    // ln() may differ in the last ulp across libm builds -> round 6dp.
    "e08_tfidf" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
        val toks = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        tf.join(df, "tok").crossJoin(broadcast(nDocs))
          .filter(col("doc_id") < 30)
          .select(col("doc_id"), col("tok"), col("tf"),
            round(col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6).as("tfidf"))
          .orderBy(col("doc_id"), col("tok"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        SELECT doc_id, tf.tok AS tok, tf,
          round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        WHERE doc_id < 30 ORDER BY doc_id, tok""")),

    // E9 — lexicon sentiment: token explode ⋈ broadcast lexicon, exact
    // decimal mean. The lexicon is a committed literal (same in oracle).
    "e09_sentiment" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val lex = Seq(("fast", 1.0), ("slow", -1.0), ("small", -0.5),
          ("agg", 0.5), ("join", 0.75), ("scan", -0.25)).toDF("tok", "polarity")
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        toks.join(broadcast(lex), "tok")
          .groupBy(col("doc_id"))
          .agg(((sum(cents2(col("polarity"))).cast("double") / lit(100.0)) / count(lit(1))).as("sentiment"),
            count(lit(1)).as("n_hits"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH lex AS (SELECT * FROM (VALUES ('fast', 1.0), ('slow', -1.0), ('small', -0.5),
          ('agg', 0.5), ('join', 0.75), ('scan', -0.25)) AS t(tok, polarity)),
        toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        SELECT doc_id,
          (${sqlSumD2("polarity")}) / count(*) AS sentiment,
          count(*) AS n_hits
        FROM toks JOIN lex ON toks.tok = lex.tok
        GROUP BY doc_id ORDER BY doc_id""")),

    // E10 — string-similarity self-join with the scale-path prefilter
    // (length band) before the expensive levenshtein verify.
    "e10_string_sim_join" -> QueryDef(
      (s, dir) => {
        val types = t(s, dir, "part").select(col("p_type")).distinct()
        val a = types.select(col("p_type").as("ta"))
        val b = types.select(col("p_type").as("tb"))
        a.join(b, col("ta") < col("tb") &&
            abs(length(col("ta")) - length(col("tb"))) <= 4 &&
            levenshtein(col("ta"), col("tb")) <= 6)
          .select(col("ta"), col("tb"), levenshtein(col("ta"), col("tb")).as("dist"))
          .orderBy(col("ta"), col("tb"))
      },
      Some("""WITH t AS (SELECT DISTINCT p_type FROM part)
        SELECT a.p_type AS ta, b.p_type AS tb,
          CAST(levenshtein(a.p_type, b.p_type) AS INT) AS dist
        FROM t a JOIN t b ON a.p_type < b.p_type
          AND abs(length(a.p_type) - length(b.p_type)) <= 4
          AND levenshtein(a.p_type, b.p_type) <= 6
        ORDER BY ta, tb""")),

    // E11 — Jaccard token-set join, pair generation BY SHARED TOKEN (the
    // join-shaped scale path — no cartesian), exact integer counts.
    "e11_jaccard_join" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
        val toks = docs
          .select(col("doc_id"), explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
        val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val pairs = toks.select(col("doc_id").as("d1"), col("tok"))
          .join(toks.select(col("doc_id").as("d2"), col("tok")), "tok")
          .filter(col("d1") < col("d2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
        pairs
          .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
          .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
          .select(col("d1"), col("d2"),
            (col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter"))).as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .orderBy(col("d1"), col("d2"))
      },
      Some("""WITH toks AS (SELECT DISTINCT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
          FROM documents WHERE doc_id < 100),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
          FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY d1, d2)
        SELECT d1, d2,
          CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
        FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.8
        ORDER BY d1, d2""")),

    // E12 — multimodal binary ingest: deterministic blob fixtures written
    // from document texts, read back through the binaryFile source.
    "e12_binary_ingest" -> QueryDef(
      (s, dir) => {
        val blobDir = s"$scratch/blobs"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(blobDir))
        // clear stale fixtures from prior runs; null texts write empty blobs
        new java.io.File(blobDir).listFiles().foreach(_.delete())
        t(s, dir, "documents").filter(col("doc_id") < 5)
          .select(col("doc_id"), col("text")).collect()
          .foreach { r =>
            val text = Option(r.getString(1)).getOrElse("")
            java.nio.file.Files.write(
              java.nio.file.Paths.get(f"$blobDir/doc${r.getLong(0)}%03d.bin"),
              text.getBytes("UTF-8"))
          }
        s.read.format("binaryFile").load(blobDir)
          .select(
            regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            length(col("content")).as("n_bytes"),
            sha2(col("content"), 256).as("sha"))
          .orderBy(col("fname"))
      },
      Some(s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
        CAST(size AS INT) AS n_bytes,
        sha256(decode(content)) AS sha
        FROM read_blob('$scratch/blobs/*.bin') ORDER BY fname""")),

    // E12b — REAL image metadata decode: valid BMP fixtures, header fields
    // (width/height/bpp) read from the BYTES by operators.Multimodal's
    // byte-arithmetic decoder on the Spark side and by hex arithmetic over
    // read_blob on the DuckDB side — both engines parse the same bytes
    // independently (no shared generator formula in the oracle).
    "e12b_image_meta" -> QueryDef(
      (s, dir) => {
        val bmpDir = s"$scratch/bmp"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(bmpDir))
        new java.io.File(bmpDir).listFiles().foreach(_.delete())
        (0 until 5).foreach { i =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$bmpDir/img$i%02d.bmp"),
            graft.operators.Multimodal.makeBmp(16 + 8 * i, 9 + 4 * i, seed = 1000 + i))
        }
        val meta = udf((b: Array[Byte]) => graft.operators.Multimodal.decodeBmpHeader(b))
        s.read.format("binaryFile").load(bmpDir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            length(col("content")).as("n_bytes"),
            meta(col("content")).as("m"))
          .select(col("fname"), col("n_bytes"),
            col("m._1").as("width"), col("m._2").as("height"), col("m._3").as("bpp"))
          .orderBy(col("fname"))
      },
      Some(s"""WITH b AS (SELECT filename, size, hex(content) AS H
          FROM read_blob('$scratch/bmp/*.bmp'))
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
          CAST(size AS INT) AS n_bytes,
          CAST(${duckLeU32(19)} AS INT) AS width,
          CAST(${duckLeU32(23)} AS INT) AS height,
          CAST(${duckLeU16(29)} AS INT) AS bpp
        FROM b ORDER BY fname""")),

    // E12c — REAL audio metadata decode: valid PCM WAV fixtures; Spark
    // walks RIFF chunks (operators.Multimodal.decodeWavHeader), DuckDB
    // reads the canonical 44-byte header offsets from the same bytes.
    "e12c_audio_meta" -> QueryDef(
      (s, dir) => {
        val wavDir = s"$scratch/wav"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wavDir))
        new java.io.File(wavDir).listFiles().foreach(_.delete())
        val rates = Array(8000, 16000, 22050, 44100, 48000)
        (0 until 5).foreach { i =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$wavDir/au$i%02d.wav"),
            graft.operators.Multimodal.makeWav(1 + i % 2, rates(i), 100 + 37 * i, seed = 2000 + i))
        }
        val meta = udf((b: Array[Byte]) => graft.operators.Multimodal.decodeWavHeader(b))
        s.read.format("binaryFile").load(wavDir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            meta(col("content")).as("m"))
          .select(col("fname"),
            col("m._1").as("channels"), col("m._2").as("sample_rate"),
            col("m._3").as("bits"), col("m._4").as("n_samples"))
          .orderBy(col("fname"))
      },
      Some(s"""WITH b AS (SELECT filename, hex(content) AS H
          FROM read_blob('$scratch/wav/*.wav'))
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
          CAST(${duckLeU16(23)} AS INT) AS channels,
          CAST(${duckLeU32(25)} AS INT) AS sample_rate,
          CAST(${duckLeU16(35)} AS INT) AS bits,
          CAST(${duckLeU32(41)} / (${duckLeU16(23)} * (${duckLeU16(35)} / 8)) AS BIGINT) AS n_samples
        FROM b ORDER BY fname""")),

    // E12d — REAL PNG header decode: chunk-structure-valid PNG fixtures
    // (CRC-correct IHDR, verified by the Spark decoder); DuckDB reads the
    // same big-endian IHDR fields by hex arithmetic — both engines parse
    // the identical bytes independently, like e12b/e12c.
    "e12d_png_meta" -> QueryDef(
      (s, dir) => {
        val pngDir = s"$scratch/png"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pngDir))
        new java.io.File(pngDir).listFiles().foreach(_.delete())
        val colorTypes = Array(0, 2, 3, 4, 6) // gray, rgb, palette, gray+a, rgba
        (0 until 5).foreach { i =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$pngDir/img$i%02d.png"),
            graft.operators.Multimodal.makePng(
              32 + 17 * i, 20 + 11 * i, bitDepth = 8, colorTypes(i), seed = 3000 + i))
        }
        val meta = udf((b: Array[Byte]) => graft.operators.Multimodal.decodePngHeader(b))
        s.read.format("binaryFile").load(pngDir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            length(col("content")).as("n_bytes"),
            meta(col("content")).as("m"))
          .select(col("fname"), col("n_bytes"),
            col("m._1").as("width"), col("m._2").as("height"),
            col("m._3").as("bit_depth"), col("m._4").as("color_type"))
          .orderBy(col("fname"))
      },
      Some(s"""WITH b AS (SELECT filename, size, hex(content) AS H
          FROM read_blob('$scratch/png/*.png'))
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
          CAST(size AS INT) AS n_bytes,
          CAST(${duckBeU32(17)} AS INT) AS width,
          CAST(${duckBeU32(21)} AS INT) AS height,
          CAST(${duckHexByte(25)} AS INT) AS bit_depth,
          CAST(${duckHexByte(26)} AS INT) AS color_type
        FROM b ORDER BY fname""")),

    // E12e — REAL video-container metadata decode: structurally valid MP4
    // shells (ftyp + moov{mvhd} + mdat). The Spark decoder WALKS the box
    // sequence (operators.Multimodal.decodeMp4Header); the fixture's fixed
    // layout lets DuckDB address the same big-endian fields by offset —
    // completing the image/audio/video metadata triple (e12b/e12c/e12e).
    "e12e_video_meta" -> QueryDef(
      (s, dir) => {
        val mp4Dir = s"$scratch/mp4"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(mp4Dir))
        new java.io.File(mp4Dir).listFiles().foreach(_.delete())
        (0 until 5).foreach { i =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$mp4Dir/v$i%02d.mp4"),
            graft.operators.Multimodal.makeMp4(
              minorVersion = 512 + i, timescale = 1000 * (i + 1),
              duration = 90000L + 7321L * i, mediaBytes = 64 + 13 * i,
              seed = 4000 + i))
        }
        val meta = udf((b: Array[Byte]) => graft.operators.Multimodal.decodeMp4Header(b))
        s.read.format("binaryFile").load(mp4Dir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            meta(col("content")).as("m"))
          .select(col("fname"),
            col("m._1").as("major_brand"), col("m._2").as("minor_version"),
            col("m._3").as("timescale"), col("m._4").as("duration"),
            col("m._5").as("media_bytes"))
          .orderBy(col("fname"))
      },
      Some(s"""WITH b AS (SELECT filename, hex(content) AS H
          FROM read_blob('$scratch/mp4/*.mp4'))
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
          chr(CAST(${duckHexByte(9)} AS INT)) || chr(CAST(${duckHexByte(10)} AS INT)) ||
            chr(CAST(${duckHexByte(11)} AS INT)) || chr(CAST(${duckHexByte(12)} AS INT)) AS major_brand,
          CAST(${duckBeU32(13)} AS BIGINT) AS minor_version,
          CAST(${duckBeU32(49)} AS BIGINT) AS timescale,
          CAST(${duckBeU32(53)} AS BIGINT) AS duration,
          CAST(${duckBeU32(137)} - 8 AS BIGINT) AS media_bytes
        FROM b ORDER BY fname""")),

    // E12f — REAL GIF metadata decode (logical screen descriptor +
    // global-color-table sizing): the little-endian twin of e12d's
    // big-endian PNG walk. The oracle recomputes the GCT entry count from
    // the packed byte's flag + size-exponent bits in SQL.
    "e12f_gif_meta" -> QueryDef(
      (s, dir) => {
        val gifDir = s"$scratch/gif"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(gifDir))
        new java.io.File(gifDir).listFiles().foreach(_.delete())
        (0 until 5).foreach { i =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$gifDir/anim$i%02d.gif"),
            graft.operators.Multimodal.makeGif(
              width = 40 + 23 * i, height = 30 + 13 * i, gctExp = (i * 2) % 8,
              bgIndex = i * 3, seed = 5000 + i,
              version = if (i % 2 == 0) "89a" else "87a"))
        }
        val meta = udf((b: Array[Byte]) => graft.operators.Multimodal.decodeGifHeader(b))
        s.read.format("binaryFile").load(gifDir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            length(col("content")).as("n_bytes"),
            meta(col("content")).as("m"))
          .select(col("fname"), col("n_bytes"),
            col("m._1").as("version"), col("m._2").as("width"),
            col("m._3").as("height"), col("m._4").as("gct_colors"),
            col("m._5").as("bg_index"))
          .orderBy(col("fname"))
      },
      Some(s"""WITH b AS (SELECT filename, size, hex(content) AS H
          FROM read_blob('$scratch/gif/*.gif'))
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
          CAST(size AS INT) AS n_bytes,
          chr(CAST(${duckHexByte(4)} AS INT)) || chr(CAST(${duckHexByte(5)} AS INT)) ||
            chr(CAST(${duckHexByte(6)} AS INT)) AS version,
          CAST(${duckLeU16(7)} AS INT) AS width,
          CAST(${duckLeU16(9)} AS INT) AS height,
          CAST(CASE WHEN ${duckHexByte(11)} >= 128
            THEN power(2, (${duckHexByte(11)} % 8) + 1) ELSE 0 END AS INT) AS gct_colors,
          CAST(${duckHexByte(12)} AS INT) AS bg_index
        FROM b ORDER BY fname""")),

    // E12g — REAL JPEG frame-header decode: the decoder WALKS the
    // marker-segment sequence (skipping APP0/DQT, stepping over standalone
    // markers) to the SOF0 frame header; the fixture's fixed layout
    // (SOF0 at byte 89) lets the oracle address precision/height/width/
    // component-count by offset. Together with BMP/PNG/GIF this covers the
    // common raster formats' metadata without any codec library.
    "e12g_jpeg_meta" -> QueryDef(
      (s, dir) => {
        val jpgDir = s"$scratch/jpg"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(jpgDir))
        new java.io.File(jpgDir).listFiles().foreach(_.delete())
        (0 until 5).foreach { i =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$jpgDir/photo$i%02d.jpg"),
            graft.operators.Multimodal.makeJpeg(
              width = 640 + 31 * i, height = 480 + 17 * i,
              nComp = 1 + (i % 3), seed = 6000 + i))
        }
        val meta = udf((b: Array[Byte]) => graft.operators.Multimodal.decodeJpegHeader(b))
        s.read.format("binaryFile").load(jpgDir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            length(col("content")).as("n_bytes"),
            meta(col("content")).as("m"))
          .select(col("fname"), col("n_bytes"),
            col("m._1").as("width"), col("m._2").as("height"),
            col("m._3").as("precision"), col("m._4").as("n_components"))
          .orderBy(col("fname"))
      },
      Some(s"""WITH b AS (SELECT filename, size, hex(content) AS H
          FROM read_blob('$scratch/jpg/*.jpg'))
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
          CAST(size AS INT) AS n_bytes,
          CAST(${duckBeU16(97)} AS INT) AS width,
          CAST(${duckBeU16(95)} AS INT) AS height,
          CAST(${duckHexByte(94)} AS INT) AS precision,
          CAST(${duckHexByte(99)} AS INT) AS n_components
        FROM b ORDER BY fname""")),

    // E12h — REAL pixel-level decode: per-channel means over the raw
    // 24bpp BMP pixel rows (bottom-up, 4-byte padded — padding bytes are
    // skipped on both sides). The DuckDB oracle walks the SAME pixel
    // bytes with computed hex offsets — feature extraction from pixels
    // with zero codec libraries, exact to the bit.
    "e12h_bmp_pixels" -> QueryDef(
      (s, dir) => {
        val bmpDir = s"$scratch/bmp_px"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(bmpDir))
        new java.io.File(bmpDir).listFiles().foreach(_.delete())
        (0 until 5).foreach { i =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$bmpDir/px$i%02d.bmp"),
            graft.operators.Multimodal.makeBmp(
              width = 5 + 3 * i, height = 3 + 2 * i, seed = 7000 + i))
        }
        val sums = udf((b: Array[Byte]) => graft.operators.Multimodal.bmpChannelSums(b))
        s.read.format("binaryFile").load(bmpDir)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            sums(col("content")).as("m"))
          .select(col("fname"),
            col("m._4").as("n_px"),
            round(col("m._1").cast("double") / col("m._4"), 6).as("mean_b"),
            round(col("m._2").cast("double") / col("m._4"), 6).as("mean_g"),
            round(col("m._3").cast("double") / col("m._4"), 6).as("mean_r"))
          .orderBy(col("fname"))
      },
      Some(s"""WITH b AS (SELECT filename, hex(content) AS H
          FROM read_blob('$scratch/bmp_px/*.bmp')),
        hdr AS (SELECT filename, H,
          ${duckLeU32(11)} AS data_off, ${duckLeU16(19)} AS w, ${duckLeU16(23)} AS ht
          FROM b),
        px AS (SELECT filename, w, ht,
          data_off + (i // w) * (((w * 3 + 3) // 4) * 4) + (i % w) * 3 AS o, H
          FROM hdr, UNNEST(generate_series(0, w * ht - 1)) AS u(i)),
        ch AS (SELECT filename, w, ht,
          strpos('123456789ABCDEF', substr(H, 2*o + 1, 1))*16 + strpos('123456789ABCDEF', substr(H, 2*o + 2, 1)) AS blue,
          strpos('123456789ABCDEF', substr(H, 2*(o+1) + 1, 1))*16 + strpos('123456789ABCDEF', substr(H, 2*(o+1) + 2, 1)) AS green,
          strpos('123456789ABCDEF', substr(H, 2*(o+2) + 1, 1))*16 + strpos('123456789ABCDEF', substr(H, 2*(o+2) + 2, 1)) AS red
          FROM px)
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
          CAST(w * ht AS BIGINT) AS n_px,
          round(CAST(sum(blue) AS DOUBLE) / (w * ht), 6) AS mean_b,
          round(CAST(sum(green) AS DOUBLE) / (w * ht), 6) AS mean_g,
          round(CAST(sum(red) AS DOUBLE) / (w * ht), 6) AS mean_r
        FROM ch GROUP BY filename, w, ht ORDER BY fname""")),

    // E13 — corpus quality profile: one pass per lang.
    "e13_quality_profile" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("text")).as("n_distinct"),
            sum(when(col("text").isNull, 1).otherwise(0)).as("n_null"),
            round(expr("percentile(n_chars, 0.5)"), 6).as("len_p50"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("len_avg"))
          .orderBy(col("lang").asc_nulls_last),
      Some("""SELECT lang, count(*) AS n_docs, count(DISTINCT text) AS n_distinct,
        CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        round(quantile_cont(n_chars, 0.5), 6) AS len_p50,
        CAST(sum(n_chars) AS DOUBLE) / count(*) AS len_avg
        FROM documents GROUP BY lang ORDER BY lang""")),

    // E-block: embedding-cosine near-duplicate pairs, brute force on a
    // bounded slice (the declared ORACLE semantics; the LSH-bucketed scale
    // path is e_ann_lsh below + RandomHyperplaneLSH spec).
    "e_cosine_neardup" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").filter(col("vec_id") < 300)
        val a = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
        val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
        a.join(b, col("va") < col("vb"))
          .select(col("va"), col("vb"), expr(cosineExpr("ea", "eb")).as("sim"))
          .filter(col("sim") >= 0.35)
          .orderBy(col("va"), col("vb"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300)
        SELECT a.vec_id AS va, b.vec_id AS vb,
          ${duckCosine("a.embedding", "b.embedding")} AS sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.35
        ORDER BY va, vb""")),

    // E — IVF ANN (coarse-quantizer scale path, operators.IvfAnn): k
    // deterministic centroids -> codegen'd argmax bucket assignment ->
    // probe-filtered brute force. Declared with nprobe = k, where IVF is
    // EXACTLY brute force — so this row shares e03's hard oracle (same
    // top-10); partial-probe recall + candidate reduction live in
    // IvfAnnSpec.
    "e_ann_ivf" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val k = 8
        val cs = graft.operators.IvfAnn.centroids(emb, "vec_id", "embedding", k)
        val qv: Array[Float] = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).collect().head.getSeq[Float](0).toArray
        val indexed = graft.operators.IvfAnn.assign(emb, "embedding", cs)
        graft.operators.IvfAnn.search(indexed, "vec_id", "embedding", cs, qv,
          topK = 10, nprobe = k)
      },
      Some(s"""WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, ${duckCosine("embedding", "q")} AS sim
        FROM embeddings CROSS JOIN q
        ORDER BY sim DESC, vec_id LIMIT 10""")),

    // E — SimHash near-dup: 64-bit signature buckets by 4x16-bit bands,
    // hamming<=6 verify. Owned hash family -> GOLDEN/PROP, not oracle.
    "e_simhash_neardup" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.simhash(col("text")).as("sig"))
        val bands = docs.select(col("doc_id"), col("sig"),
          posexplode(expr(
            "transform(sequence(0, 3), b -> (sig >> (b * 16)) & 65535)")))
          .select(col("doc_id"), col("sig"), col("pos").as("band"), col("col").as("bkey"))
        bands.alias("a")
          .join(bands.alias("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
            col("a.sig").as("s1"), col("b.sig").as("s2"))
          .distinct()
          .select(col("d1"), col("d2"),
            expr("bit_count(s1 ^ s2)").as("hamming"))
          .filter(col("hamming") <= 6)
          .orderBy(col("d1"), col("d2"))
      },
      None),

    // E16 — deterministic hash sampling (training-data subsetting without
    // RNG state): keep a doc iff the md5 hex of its id sorts below a
    // threshold prefix — reproducible across engines, runs and cluster
    // layouts, and composable (a 10% sample of a 10% sample is stable).
    // Lexicographic hex compare == numeric compare; '1a' keeps 26/256 ≈
    // 10.2% in expectation. At 100 TB this is a scan-local filter: no
    // shuffle, no seed coordination, prunes before any downstream join.
    "e16_hash_sample" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
          .filter(col("h") < "1a")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            min(col("doc_id")).as("first_id"),
            max(col("doc_id")).as("last_id"))
          .orderBy(col("lang").asc_nulls_last),
      Some("""SELECT lang, count(*) AS n_sampled,
        min(doc_id) AS first_id, max(doc_id) AS last_id
        FROM documents WHERE md5(CAST(doc_id AS VARCHAR)) < '1a'
        GROUP BY lang ORDER BY lang""")),

    // E16b — STRATIFIED hash sampling (mixture weighting): per-language
    // keep-rates via per-group hash thresholds — downsample the dominant
    // language, keep more of the rare ones. Same seedless scan-local
    // mechanics as e16; the rate table would be a broadcast dim at scale.
    "e16b_stratified_sample" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
          .filter(col("h") < when(col("lang") === "en", lit("1a")).otherwise(lit("4d")))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"))
          .orderBy(col("lang").asc_nulls_last),
      Some("""SELECT lang, count(*) AS n_sampled
        FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) < (CASE WHEN lang = 'en' THEN '1a' ELSE '4d' END)
        GROUP BY lang ORDER BY lang""")),

    // E17 — sequence packing (batch assembly for training): greedy running-
    // offset packing — docs stream in id order per language, cumulative
    // token count divides into fixed token-budget packs. Pure window
    // algebra (no UDF, no driver loop); partition-by-language keeps the
    // prefix sums parallel at scale (one sequential chain per group, the
    // standard packing parallelization).
    "e17_sequence_packing" -> QueryDef(
      (s, dir) => {
        val budget = 512
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("lang"), col("doc_id"),
            size(split(col("text"), " ")).as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("pack_id", floor((col("cum") - col("n_tok")) / budget))
          .orderBy(col("lang").asc_nulls_last, col("doc_id"))
      },
      Some("""SELECT lang, doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        CAST(sum(CAST(len(string_split(text, ' ')) AS INT))
          OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum,
        CAST(floor((CAST(sum(CAST(len(string_split(text, ' ')) AS INT))
          OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT)
          - CAST(len(string_split(text, ' ')) AS INT)) / 512) AS BIGINT) AS pack_id
        FROM documents WHERE text IS NOT NULL
        ORDER BY lang, doc_id""")),

    // E18 — near-dup CLUSTER formation (operators.ConnectedComponents):
    // pairwise similarity joins emit edges; min-label propagation turns
    // them into dedup groups with one canonical (min-id) doc each — the
    // step between "found near-dup pairs" and "kept one copy per group".
    // Oracle: DuckDB recursive-CTE transitive closure over the SAME pair
    // query (min reachable id == min label at fixpoint).
    "e18_dedup_clusters" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
        val toks = docs
          .select(col("doc_id"), explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
        val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = toks.select(col("doc_id").as("d1"), col("tok"))
          .join(toks.select(col("doc_id").as("d2"), col("tok")), "tok")
          .filter(col("d1") < col("d2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
        val edges = inter
          .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
          .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
          .filter(col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")) >= 0.95)
          .select(col("d1"), col("d2"))
        graft.operators.ConnectedComponents.run(edges)
          .select(col("id").as("doc_id"), col("component"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE toks AS (SELECT DISTINCT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
          FROM documents WHERE doc_id < 500),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
          FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY d1, d2),
        sim AS (SELECT d1, d2
          FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
          WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.95),
        edges AS (SELECT d1 AS a, d2 AS b FROM sim UNION SELECT d2, d1 FROM sim),
        reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM edges)
          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
        ORDER BY doc_id""")),

    // E19 — PII-style scrubbing (privacy stage of a training pipeline):
    // stable pseudonymization of identifiers (salted sha256 — joinable
    // across tables, not reversible) + inline redaction of digit runs,
    // with a redaction-volume audit column. All codegen'd string ops; at
    // 100 TB this is a scan-local transform, no shuffle.
    "e19_redact" -> QueryDef(
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("event_id") < 5000)
          .select(col("event_id"),
            sha2(concat(lit("salt:"), col("user_id").cast("string")), 256).as("user_pseudo"),
            regexp_replace(col("props"), "[0-9]+", "#").as("props_redacted"),
            // translate (plain char loop) counts digits without a second
            // regex pass; same value as length-delta via regexp_replace
            (length(col("props")) - length(translate(col("props"), "0123456789", "")))
              .as("n_digits"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
        sha256('salt:' || CAST(user_id AS VARCHAR)) AS user_pseudo,
        regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
        CAST(length(props) - length(regexp_replace(props, '[0-9]+', '', 'g')) AS INT) AS n_digits
        FROM events WHERE event_id < 5000 ORDER BY event_id""")),

    // E15 — the composite training-data pipeline: quality gate (length +
    // token-count + stopword-ratio thresholds) -> exact dedup keeping the
    // canonical doc -> per-language corpus stats. One declarative program,
    // one oracle; this is the end-to-end shape everything above feeds.
    "e15_clean_corpus" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("toks", split(lower(col("text")), " "))
          .withColumn("stop_ratio",
            expr("CAST(size(filter(toks, x -> x IN ('the','and','of','value','data'))) AS DOUBLE) / size(toks)"))
          .filter(col("n_chars").between(50, 2000) &&
            size(col("toks")) >= 10 && col("stop_ratio") < 0.5)
        val deduped = docs
          .groupBy(col("text")).agg(min(col("doc_id")).as("keep_id"))
          .join(docs.select(col("doc_id"), col("lang"), col("n_chars")),
            col("keep_id") === col("doc_id"))
        deduped.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
          .orderBy(col("lang"))
      },
      Some("""WITH gated AS (
          SELECT doc_id, text, lang, n_chars,
            string_split(lower(text), ' ') AS toks
          FROM documents
          WHERE n_chars BETWEEN 50 AND 2000),
        q AS (SELECT * FROM gated
          WHERE len(toks) >= 10
            AND CAST(len(list_filter(toks, x -> list_contains(['the','and','of','value','data'], x))) AS DOUBLE) / len(toks) < 0.5),
        dedup AS (SELECT min(doc_id) AS keep_id FROM q GROUP BY text)
        SELECT lang, count(*) AS n_kept,
          CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        FROM dedup JOIN q ON keep_id = q.doc_id
        GROUP BY lang ORDER BY lang""")),

    // E2 — MinHash-LSH near-dup candidates (no SQL oracle — owned hash
    // family; GOLDEN/PROP covered in ScalaTest; driver records rows>0).
    // Pipeline: shingle -> 128-perm minhash -> 32 bands of 4 -> band-key
    // equi-join -> estimated-similarity filter. Join-shaped: scales.
    "e02_minhash_pairs" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.minhash128(col("text")).as("sig"))
        val bands = docs.select(col("doc_id"), col("sig"),
          posexplode(expr("transform(sequence(0, 31), b -> sha2(cast(slice(sig, b * 4 + 1, 4) AS STRING), 256))")))
          .select(col("doc_id"), col("sig"), col("pos").as("band"), col("col").as("bkey"))
        val cands = bands.alias("a")
          .join(bands.alias("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
            col("a.sig").as("s1"), col("b.sig").as("s2"))
          .distinct()
        cands
          .select(col("d1"), col("d2"),
            expr("CAST(size(filter(zip_with(s1, s2, (x, y) -> x = y), v -> v)) AS DOUBLE) / 128").as("est_jaccard"))
          .filter(col("est_jaccard") >= 0.5)
          .orderBy(col("d1"), col("d2"))
      },
      None),

    // E3b — ANN scale path as a declared surface: hyperplane-LSH candidate
    // pairs with exact cosine verify (owned deterministic planes; recall
    // properties in AnnLshSpec — rows-only here).
    "e_ann_lsh" -> QueryDef(
      (s, dir) =>
        graft.operators.AnnLsh
          .nearDupCandidates(t(s, dir, "embeddings"), "vec_id", "embedding")
          .filter(col("sim") >= 0.3)
          .orderBy(col("id1"), col("id2")),
      None),

    // E14 — sketches: approx vs exact side by side (PROP-tested bounds; not
    // oracle-able — sketch internals differ across engines by design).
    "e14_approx_distinct" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            countDistinct(col("source")).as("exact_nd"),
            approx_count_distinct(col("source")).as("approx_nd"))
          .orderBy(col("lang")),
      None)
  )
}
