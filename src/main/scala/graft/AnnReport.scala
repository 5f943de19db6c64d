package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN accuracy/cost report (dev tool, VERDICT r4 item 9 + r5 item 6):
  * quantifies recall@10 vs probe width for the IVF index, ADC recall for
  * PQ alone and composed with IVF pruning, and candidate-pair recall vs
  * (tables, bits) for the hyperplane LSH — on TWO corpora at the same
  * report scale:
  *
  *  1. the real sf0.1 embeddings — near-uniform random vectors, the
  *     WORST case for any space-partitioning index (documented honestly
  *     in NOTES_r5: recall@10 as low as 0.004 for LSH there);
  *  2. a deterministic clustered corpus of the same size and dim —
  *     50 well-separated Gaussian clusters × 40 members, the shape real
  *     embedding spaces have (fixed seed: the corpus is a value, not a
  *     distribution). This is where the production-relevant recall/cost
  *     curves come from: partial-probe configs are only trusted at scale
  *     with THESE numbers, not the structureless worst case.
  *
  * Ground truth is driver-side exact cosine (2000×64 floats — trivially
  * driver-sized for a report; the operators under test still run their
  * real cluster-side code paths for bucket assignment).
  *
  * Usage: `runMain graft.AnnReport` (SPARK_GRAFT_SF_DIR to override).
  * Output: markdown table blocks for NOTES_r{N}.md.
  */
object AnnReport {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) Double.MinValue else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The full report block for one corpus. `emb` must expose
    * (vec_id long, embedding array<float>) — the operators under test
    * consume the DataFrame through their real cluster-side paths.
    */
  private def report(spark: SparkSession, label: String, emb: DataFrame): Unit = {
    val vecs: Array[(Long, Array[Float])] = emb
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val byId = vecs.toMap
    println(s"[annreport] $label: ${vecs.length} vectors, dim ${vecs.head._2.length}")

    // ground truth: exact top-10 neighbours for every 40th vector
    val queries = vecs.sortBy(_._1).zipWithIndex.collect {
      case (v, i) if i % 40 == 0 => v
    }
    val truth: Map[Long, Set[Long]] = queries.map { case (qid, q) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    }.toMap

    // ---- IVF: recall@10 vs nprobe (k=16, 2 Lloyd refinements) -----------
    val k = 16
    val cs = operators.IvfAnn.refine(emb, "embedding",
      operators.IvfAnn.centroids(emb, "vec_id", "embedding", k), iters = 2)
    // REAL operator assignment (cluster-side codegen path), collected once
    val buckets: Map[Long, Long] = operators.IvfAnn.assign(emb, "embedding", cs)
      .select(col("vec_id"), col("__ivf_bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketSizes = buckets.values.groupBy(identity).view.mapValues(_.size)
    println(s"[annreport] IVF k=$k bucket sizes: min=${bucketSizes.values.min} " +
      s"max=${bucketSizes.values.max}")
    println(s"| corpus | index | config | recall@10 | candidates scanned |")
    println("| --- | --- | --- | --- | --- |")
    Seq(1, 2, 4, 8, 16).foreach { nprobe =>
      val (recalls, cands) = queries.map { case (qid, q) =>
        val probes = operators.IvfAnn.probeOrder(q, cs).take(nprobe).map(_.toLong).toSet
        val candidates = vecs.collect {
          case (id, _) if probes(buckets(id)) && id != qid => id
        }
        val top = candidates.map(id => (id, cos(q, byId(id))))
          .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
        ((top & truth(qid)).size / 10.0, candidates.length)
      }.unzip
      println(f"| $label | IVF | nprobe=$nprobe/$k | ${recalls.sum / recalls.length}%.3f " +
        f"| ${cands.sum / cands.length}%d avg (of ${vecs.length - 1}) |")
    }

    // ---- PQ: ADC recall@10, alone and composed with IVF pruning ---------
    val cb = operators.ProductQuantizer.codebook(emb, "vec_id", "embedding", m = 8, k = 16)
    val pqCodes: Map[Long, Long] = operators.ProductQuantizer.encode(emb, "embedding", cb)
      .select(col("vec_id"), col("__pq_code")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val subDim = vecs.head._2.length / 8
    def adcTable(q: Array[Float]): Array[Array[Double]] =
      Array.tabulate(8, 16) { (j, c) =>
        var acc = 0.0
        (0 until subDim).foreach { d =>
          val t = q(j * subDim + d).toDouble - cb(j)(c)(d); acc += t * t
        }
        acc
      }
    def adcTop(qid: Long, q: Array[Float], candidates: Iterable[Long]): Set[Long] = {
      val tab = adcTable(q)
      candidates.filter(_ != qid).map { id =>
        val code = pqCodes(id)
        var s = 0.0
        (0 until 8).foreach(j => s += tab(j)(((code >>> (4 * j)) & 15).toInt))
        (id, s)
      }.toSeq.sortBy { case (id, s) => (s, id) }.take(10).map(_._1).toSet
    }
    val pqRecall = queries.map { case (qid, q) =>
      (adcTop(qid, q, vecs.map(_._1)) & truth(qid)).size / 10.0
    }
    println(f"| $label | PQ | m=8 k=16 ADC (full scan) | ${pqRecall.sum / pqRecall.length}%.3f " +
      f"| ${vecs.length - 1}%d (8-byte codes, no vector reads) |")
    Seq(2, 4).foreach { nprobe =>
      val r = queries.map { case (qid, q) =>
        val probes = operators.IvfAnn.probeOrder(q, cs).take(nprobe).map(_.toLong).toSet
        val cand = vecs.collect { case (id, _) if probes(buckets(id)) => id }
        (adcTop(qid, q, cand) & truth(qid)).size / 10.0
      }
      println(f"| $label | IVF+PQ | nprobe=$nprobe/$k + ADC | ${r.sum / r.length}%.3f " +
        f"| ~${vecs.length * nprobe / k}%d codes scanned |")
    }
    // ADC shortlist + exact re-rank (the standard production PQ config —
    // Jégou et al.'s IVFADC with re-ranking): 8-byte codes order a
    // shortlist, exact cosine re-ranks only the shortlist's full vectors.
    // On clustered data raw ADC ties all members of a tight cluster (one
    // code per cluster at m=8 k=16 resolution) — the re-rank breaks the
    // tie with `shortlist` full-vector reads instead of a corpus scan.
    def adcShortlist(qid: Long, q: Array[Float], candidates: Iterable[Long], n: Int): Seq[Long] = {
      val tab = adcTable(q)
      candidates.filter(_ != qid).map { id =>
        val code = pqCodes(id)
        var s = 0.0
        (0 until 8).foreach(j => s += tab(j)(((code >>> (4 * j)) & 15).toInt))
        (id, s)
      }.toSeq.sortBy { case (id, s) => (s, id) }.take(n).map(_._1)
    }
    Seq((2, 100), (4, 100)).foreach { case (nprobe, shortlist) =>
      val r = queries.map { case (qid, q) =>
        val probes = operators.IvfAnn.probeOrder(q, cs).take(nprobe).map(_.toLong).toSet
        val cand = vecs.collect { case (id, _) if probes(buckets(id)) => id }
        val short = adcShortlist(qid, q, cand, shortlist)
        val top = short.map(id => (id, cos(q, byId(id))))
          .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
        (top & truth(qid)).size / 10.0
      }
      println(f"| $label | IVF+PQ+rerank | nprobe=$nprobe/$k, shortlist=$shortlist | ${r.sum / r.length}%.3f " +
        f"| ~${vecs.length * nprobe / k}%d codes + $shortlist vectors |")
    }

    // ---- LSH: recall@10 + pair stats vs (tables, bits) ------------------
    Seq((4, 8), (8, 12), (16, 12), (8, 16)).foreach { case (tables, bits) =>
      val planes = operators.AnnLsh.planeMatrix(vecs.head._2.length, tables, bits)
      val vecBuckets: Map[Long, Array[Long]] =
        vecs.map { case (id, v) => id -> operators.AnnLsh.bucketsOf(v, planes) }.toMap
      val byBucket = vecs.flatMap { case (id, _) =>
        vecBuckets(id).zipWithIndex.map { case (b, t) => (t, b) -> id }
      }.groupBy(_._1).view.mapValues(_.map(_._2))
      val recalls = queries.map { case (qid, q) =>
        val candidates = vecBuckets(qid).zipWithIndex.flatMap { case (b, t) =>
          byBucket.getOrElse((t, b), Array.empty[Long])
        }.distinct.filter(_ != qid)
        val top = candidates.map(id => (id, cos(q, byId(id))))
          .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
        (top & truth(qid)).size / 10.0
      }
      val totalCand = vecs.map { case (id, _) =>
        vecBuckets(id).zipWithIndex.map { case (b, t) =>
          byBucket.getOrElse((t, b), Array.empty[Long]).length - 1
        }.sum
      }.sum / 2
      println(f"| $label | LSH | tables=$tables bits=$bits | ${recalls.sum / recalls.length}%.3f " +
        f"| ~$totalCand%d candidate pairs (all-pairs ${vecs.length.toLong * (vecs.length - 1) / 2}) |")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.prepare(spark)
    import spark.implicits._

    report(spark, "sf0.1-uniform", Tables(spark, sfDir, "embeddings"))

    // clustered twin: same row count (2000) and dim (64) as sf0.1 — the
    // committed fixture corpus the e28d driver gate also runs against
    report(spark, "clustered", ClusteredFixture.df(spark))

    spark.stop()
  }
}
