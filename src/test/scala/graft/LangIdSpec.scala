package graft

import graft.functions.LangId
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E20 discrimination gate: the committed trigram profiles must actually
  * TELL LANGUAGES APART on real multilingual text — not merely compute
  * oracle-parity arithmetic (the synthetic corpus is English-ish under
  * every label, so the ORACLE row can't show this).
  */
class LangIdSpec extends AnyFunSuite {

  // Plain running prose per language (lowercase ASCII, accents stripped —
  // the profiles are ASCII-core by design), several sentences each so the
  // frequency signal dominates any single shared trigram.
  private val fixture = Seq(
    ("en", "the committee said that the new building would be finished in " +
      "the spring and that the workers were doing everything they could " +
      "to keep the project on time for the opening in the summer"),
    ("en", "she was reading an interesting book about the history of " +
      "printing and the making of paper which had been written by one of " +
      "the leading scholars in the field"),
    ("de", "der schnelle braune fuchs springt ueber den faulen hund und " +
      "die kinder schauen ihm dabei zu waehrend die sonne langsam hinter " +
      "den bergen verschwindet und der abend beginnt"),
    ("de", "die regierung hat ein neues gesetz beschlossen das die rechte " +
      "der arbeiter staerken soll und von den gewerkschaften seit vielen " +
      "jahren gefordert wurde"),
    ("es", "los ninos que juegan en el parque de la ciudad tienen una " +
      "buena relacion con los vecinos que los cuidan mientras sus padres " +
      "trabajan en las oficinas del centro"),
    ("es", "el gobierno anuncio que la construccion de la nueva carretera " +
      "comenzara el proximo ano y que los trabajos duraran una decada " +
      "segun los expertos consultados"),
    ("fr", "les enfants jouent dans les rues de la ville pendant que " +
      "leurs parents travaillent et les commercants ouvrent leurs " +
      "boutiques pour accueillir les premiers clients du matin"),
    ("fr", "le gouvernement a annonce que les travaux du nouveau pont " +
      "commenceront au printemps et que les habitants pourront le " +
      "traverser avant la fin de cette annee"))

  test("committed profiles discriminate en/de/es/fr on real prose") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = fixture.toDF("true_lang", "text")
      .select(Seq(col("true_lang")) ++ LangId.scoreColumns(col("text")): _*)
      .withColumn("pred_lang", LangId.predict)
      .select(col("true_lang"), col("pred_lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (truth, pred) =>
      assert(pred === truth, s"misclassified a $truth document as $pred")
    }
  }

  test("profile table is well-formed (ASCII trigrams, unique languages)") {
    val langs = LangId.Profiles.map(_._1)
    assert(langs.distinct === langs)
    LangId.Profiles.foreach { case (l, tris) =>
      assert(tris.nonEmpty, l)
      tris.foreach { tr =>
        assert(tr.length === 3, s"$l gram '$tr' is not a trigram")
        assert(tr.forall(c => c < 0x80), s"$l gram '$tr' is not ASCII")
      }
      // no duplicate grams inside a profile (double counting)
      assert(tris.distinct === tris, s"$l has duplicate grams")
    }
  }

  test("null text takes the deterministic fallback label in both engines' semantics") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(Seq(col("doc_id")) ++ LangId.scoreColumns(col("text")): _*)
      .withColumn("pred_lang", LangId.predict)
      .select(col("pred_lang")).head().getString(0)
    // all comparisons on NULL scores are false -> CASE falls through to the
    // last profile language, same as ANSI SQL's ELSE branch
    assert(got === LangId.Profiles.last._1)
  }
}
