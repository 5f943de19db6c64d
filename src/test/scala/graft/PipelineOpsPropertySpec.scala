package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PROP tier for the round-2 training-pipeline operators: invariants that
  * hold for ANY corpus, asserted on the real testdata (sf0.001).
  */
class PipelineOpsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("sequence packing: token sums per pack stay under budget + first-fit order") {
    val budget = 512
    // (lang, doc_id, n_tok, cum, pack_id)
    val rows = SparkEntry.queries("e17_sequence_packing")(spark, dir)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    // running-offset packing invariant: every doc STARTS inside its pack's
    // token window [pack·budget, (pack+1)·budget) — a doc may straddle the
    // boundary (its tail spills into the next window), so a pack's total is
    // bounded by budget + its largest doc, not by budget alone
    rows.foreach { case (lang, id, nTok, cum, pack) =>
      val start = cum - nTok
      assert(start / budget === pack, s"doc $id ($lang): start $start not in pack $pack")
    }
    rows.groupBy { case (lang, _, _, _, pack) => (lang, pack) }.foreach {
      case ((lang, pack), docs) =>
        val total = docs.map(_._3.toLong).sum
        val maxDoc = docs.map(_._3.toLong).max
        assert(total <= budget + maxDoc,
          s"pack ($lang, $pack): $total > $budget + largest doc $maxDoc")
    }
    // pack ids are non-decreasing in the per-lang doc order
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val byId = docs.sortBy(_._2)
      assert(byId.map(_._5).sliding(2).forall(p => p.head <= p.last),
        "pack ids must be non-decreasing in doc order")
    }
  }

  test("hash sampling: rate lands inside generous binomial bounds, subset stable") {
    val total = Tables(spark, dir, "documents").count()
    val sampled = SparkEntry.queries("e16_hash_sample")(spark, dir)
      .agg(sum("n_sampled")).collect().head.getLong(0)
    // '1a' prefix keeps 26/256 ≈ 10.2%; allow ±4 sigma of binomial noise
    val p = 26.0 / 256.0
    val sigma = math.sqrt(total * p * (1 - p))
    assert(math.abs(sampled - total * p) <= 4 * sigma + 1,
      s"sampled $sampled of $total, expected ~${(total * p).toInt} ± ${(4 * sigma).toInt}")
    // determinism: same rows every run
    val again = SparkEntry.queries("e16_hash_sample")(spark, dir)
      .agg(sum("n_sampled")).collect().head.getLong(0)
    assert(again === sampled)
  }

  test("int8 quantization: dequantized values within maxabs/254 per component, range [-127,127]") {
    // e24 at sf0.001: reconstruct x̂ = q * maxabs / 127 and bound the error.
    // Half-up rounding puts every component within half a quantization step
    // (maxabs/127 / 2 = maxabs/254) of its source value.
    val out = SparkEntry.queries("e24_int8_quantize")(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val joined = out.join(emb, "vec_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val scaleMax = r.getDouble(r.fieldIndex("scale_max"))
      // q ships as a comma-joined scalar (driver canonicalization needs a
      // hashable cell); parse it back for the numeric bound.
      val q = Option(r.getString(r.fieldIndex("q_csv")))
        .map(_.split(',').toSeq.map(_.toInt))
      val x = r.getSeq[Float](r.fieldIndex("embedding"))
      if (scaleMax == 0.0) assert(q.isEmpty, s"zero vector ${r.getLong(0)} must quantize to NULL")
      else {
        val qs = q.getOrElse(fail(s"non-zero vector ${r.getLong(0)} quantized to NULL"))
        assert(qs.length === x.length)
        // scale_max is the 6dp-rounded maxabs; the bound gets the rounding slack
        val tol = scaleMax / 254.0 + 1e-6
        qs.zip(x).foreach { case (qi, xi) =>
          assert(qi >= -127 && qi <= 127, s"q $qi out of int8 symmetric range")
          assert(math.abs(qi * scaleMax / 127.0 - xi) <= tol,
            s"vec ${r.getLong(0)}: dequant ${qi * scaleMax / 127.0} vs $xi exceeds $tol")
        }
      }
    }
  }

  test("weighted sampling: length-weighted selection favors longer documents") {
    // A-Res with weight = n_chars: the 50-doc sample must skew long —
    // its mean length exceeds the corpus mean (weighted-sampling's
    // defining property), deterministically on the fixed corpus.
    val sample = SparkEntry.queries("e27_weighted_sample")(spark, dir)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val corpus = Tables(spark, dir, "documents")
      .filter(col("n_chars") > 0)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sample > corpus,
      s"weighted sample mean $sample not above corpus mean $corpus")
  }

  test("connected components: empty edge list yields empty labels") {
    import spark.implicits._
    val out = ConnectedComponents.run(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.count() === 0)
  }

  test("dedup clusters: every component id is a member of its own cluster") {
    val rows = SparkEntry.queries("e18_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = rows.map(_._1).toSet
    rows.foreach { case (_, comp) =>
      assert(ids.contains(comp), s"component $comp is not itself a clustered doc")
    }
    // canonical = min id of the cluster
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.map(_._1).min === comp,
        s"cluster $comp canonical is not the min member")
    }
  }

  test("domain mix: budgets respected, admission maximal in hash order, deterministic") {
    val budgets = Map("en" -> 50000L, "fr" -> 20000L, "es" -> 15000L,
      "zh" -> 10000L, "de" -> 5000L)
    // (doc_id, lang, n_toks, cum)
    val kept = SparkEntry.queries("e31_domain_mix")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    kept.groupBy(_._2).foreach { case (lang, docs) =>
      assert(docs.map(_._3).sum <= budgets(lang),
        s"$lang kept ${docs.map(_._3).sum} tokens over budget ${budgets(lang)}")
    }
    // maximality: recompute the full ranked list independently and check
    // the kept set is exactly the longest admissible prefix per language
    val all = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n"),
        md5(col("doc_id").cast("string").cast("binary")).as("rk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    all.groupBy(_._2).foreach { case (lang, docs) =>
      val budget = budgets(lang)
      var cum = 0L
      val expect = docs.sortBy(d => (d._4, d._1)).takeWhile { d =>
        cum += d._3; cum <= budget
      }.map(_._1).toSet
      assert(kept.filter(_._2 == lang).map(_._1).toSet === expect, s"lang $lang")
    }
    // determinism: a second run returns the identical set
    val again = SparkEntry.queries("e31_domain_mix")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again === kept.map(r => (r._1, r._4)).toSet)
  }

  test("lm score: probabilities bound the score, trigram counts match lengths") {
    // (doc_id, n_tris, lm_score, keep)
    val rows = SparkEntry.queries("e33_lm_score")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val lens = Tables(spark, dir, "documents").filter(col("text").isNotNull)
      .select(col("doc_id"), length(lower(col("text"))).as("len"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    rows.foreach { case (id, nTris, score, keep) =>
      assert(score <= 0.0, s"doc $id: mean log-probability $score > 0")
      assert(keep === (score > -9.0), s"doc $id: keep flag inconsistent")
      assert(nTris === math.max(lens(id) - 2, 0).toLong,
        s"doc $id: $nTris trigrams for length ${lens(id)}")
    }
    // every doc of length >= 3 is scored — nothing silently dropped
    assert(rows.length === lens.count(_._2 >= 3))
  }
}
