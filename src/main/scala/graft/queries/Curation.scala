package graft.queries

import graft.{Graft, QueryBlock, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond the SURVEY §2 E-block core: the
  * frequency-based cleanup passes a web-crawl training pipeline runs
  * between raw extraction (e34) and document-level dedup (e01/e02).
  *
  * Scale notes (100 TB design point):
  *  - line-frequency stats are partial+final hash aggregates keyed on the
  *    line text — never a window over an unbounded per-line group (a
  *    boilerplate line appears in billions of documents; collect_set
  *    state over such a key would be unbounded);
  *  - reassembly groups by doc_id — bounded by document length;
  *  - everything else is scan-local projection.
  */
object Curation extends QueryBlock {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val queries: Map[String, QueryDef] = Map(
    // E40 — line-frequency boilerplate removal (the RefinedWeb/CCNet line
    // dedup pass): drop every line that occurs in >= tau distinct
    // documents across the corpus (navigation, cookie banners, footers),
    // keep the rest in original order. The fixture builds multi-line
    // content deterministically from the documents table — 8-token
    // content lines plus planted boilerplate (a universal header/footer
    // on every doc, a third line on even doc_ids) — so the operator must
    // remove exactly the high-df lines while the oracle re-derives the
    // same frequencies from the same construction.
    //
    // Shape at 100 TB: one exploded-line pass feeds (a) the df aggregate
    // (partial+final hash agg keyed on line text; at production scale key
    // on xxhash64(line) to bound shuffle width — kept as text here for
    // 1:1 DuckDB pairing) and (b) the keep-join: lines x (line, df) is an
    // equi-join whose build side has ONE row per distinct line, so hot
    // boilerplate lines fan out on the probe side only — no pair
    // explosion. Reassembly is a per-doc_id group (bounded by doc
    // length). The rejected alternative — df via a window over
    // partitionBy(line) — would hold unbounded per-key state on exactly
    // the hottest keys.
    "e40_line_dedup" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .withColumn("lines", expr(
            """concat(
                 array('subscribe to our newsletter'),
                 transform(sequence(0, CAST((size(split(text, ' ')) - 1) / 8 AS INT)),
                   i -> array_join(slice(split(text, ' '), i * 8 + 1, 8), ' ')),
                 array('all rights reserved'),
                 if(doc_id % 2 = 0, array('cookie policy accept'), array()))"""))
        graft.operators.LineDedup.clean(
            docs.select(col("doc_id"), array_join(col("lines"), "\n").as("content")),
            tau = 10)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
            list_concat(list_concat(list_concat(
              ['subscribe to our newsletter'],
              list_transform(generate_series(0, (len(string_split(text, ' ')) - 1) // 8),
                i -> array_to_string(string_split(text, ' ')[i*8 + 1 : i*8 + 8], ' '))),
              ['all rights reserved']),
              CASE WHEN doc_id % 2 = 0 THEN ['cookie policy accept'] ELSE [] END) AS lines
          FROM documents WHERE text IS NOT NULL),
        l AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos, d.lines[i] AS ln
          FROM d, UNNEST(generate_series(1, len(d.lines))) AS u(i)),
        f AS (SELECT ln, count(DISTINCT doc_id) AS df FROM l GROUP BY ln),
        k AS (SELECT l.doc_id, l.pos, l.ln FROM l JOIN f USING (ln) WHERE f.df < 10),
        c AS (SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
            array_to_string(list(ln ORDER BY pos), chr(10)) AS cleaned
          FROM k GROUP BY doc_id)
        SELECT d.doc_id, CAST(len(d.lines) AS INT) AS n_lines,
          coalesce(c.n_kept, 0) AS n_kept, coalesce(c.cleaned, '') AS cleaned
        FROM d LEFT JOIN c USING (doc_id) ORDER BY d.doc_id"""))
  )
}
