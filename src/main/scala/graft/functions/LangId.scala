package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Language identification by character-trigram profile scoring — the
  * classic n-gram heuristic (Cavnar/Trenkle lineage) with COMMITTED
  * per-language profiles, not placeholder weights.
  *
  * Each profile lists the language's highest-frequency character trigrams
  * (space-padded where the gram is word-boundary-bound), drawn from public
  * frequency tables of the respective languages. Scoring is pure
  * scan-local codegen string algebra: occurrences via
  * `length(x) - length(replace(x, tr))` summed over the profile — no
  * explode, no shuffle, so the classifier runs at full scan speed at any
  * corpus size. Ties break by fixed profile order (first wins), making the
  * argmax deterministic and oracle-able.
  *
  * ASCII-only grams by design: accented trigrams would tie the oracle to
  * engine-specific unicode length semantics; the ASCII core of each
  * language's frequency mass is discriminative enough (LangIdSpec asserts
  * cross-language discrimination on a real multilingual fixture).
  */
object LangId {

  /** (language, characteristic trigrams) in tie-break priority order. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " th", "he ", "and", " an", "nd ", "ing", "ng ",
      " of", "of ", " to", "ed ", " in", "is ", "at ", "er ", "ion", " be"),
    "de" -> Seq("der", " de", "ein", " ei", "ich", "ch ", "sch", "und",
      " un", "die", "ie ", "en ", "ung", " ge", "cht", "ten", "ber", " da"),
    "es" -> Seq("que", " qu", "ue ", " la", "la ", "os ", "el ", " el",
      " co", "ado", "do ", "ar ", "cio", "nte", " es", "es ", "ien", "una"),
    "fr" -> Seq("les", " le", "le ", "ent", "nt ", " pa", "our", " qu",
      "ais", "ont", " et", "eur", "eau", "aux", "oui", " un", "res", "ett"))

  /** Total matched characters of `tris` in `text` (3 × occurrence count —
    * one codegen'd replace chain, no allocation beyond the scan).
    */
  def score(text: Column, tris: Seq[String]): Column =
    tris.map(tr => length(text) - length(replace(text, lit(tr), lit("")))).reduce(_ + _)

  /** One score column per language, aliased `s_<lang>`. */
  def scoreColumns(text: Column): Seq[Column] =
    Profiles.map { case (l, tris) => score(text, tris).as(s"s_$l") }

  /** Argmax over already-computed `s_<lang>` columns with first-wins
    * tie-break (the fixed priority that makes the label deterministic).
    * NULL text yields NULL scores; every comparison is then false and the
    * LAST language falls out of the otherwise — identical CASE semantics
    * in ANSI SQL, so the oracle agrees on null rows too.
    */
  def predict: Column = {
    val langs = Profiles.map(_._1)
    langs.init.zipWithIndex.foldRight(lit(langs.last): Column) { case ((l, i), rest) =>
      val later = langs.drop(i + 1)
      when(later.map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _), l).otherwise(rest)
    }
  }

  /** DuckDB-side scoring of one profile (identical integer arithmetic). */
  def oracleScoreSql(tris: Seq[String]): String =
    "CAST(" + tris.map(tr =>
      s"(length(text) - length(replace(text,'$tr','')))").mkString(" + ") + " AS INT)"

  /** DuckDB-side argmax with the same first-wins tie-break. */
  def oraclePredictSql: String = {
    val langs = Profiles.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val conds = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${langs.last}' END"
  }
}
