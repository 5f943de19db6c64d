package graft

import graft.operators.IvfAnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: deterministic index, exactness at full probe, sub-corpus
  * candidate set and non-trivial recall at partial probe (sf0.001
  * embeddings — near-random vectors, so recall bounds are loose by
  * design; see AnnLshSpec for the same caveat).
  */
class IvfAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = 8

  private lazy val emb = Tables(spark, dir, "embeddings")
  private lazy val cs = IvfAnn.centroids(emb, "vec_id", "embedding", K)
  private lazy val qv: Array[Float] = emb.filter(col("vec_id") === 0)
    .select(col("embedding")).collect().head.getSeq[Float](0).toArray
  private lazy val indexed = IvfAnn.assign(emb, "embedding", cs).cache()

  private def exactTop(k: Int): Seq[Long] =
    emb.select(col("vec_id"),
        call_function("cosine_sim", col("embedding"), typedlit(qv)).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k).collect().map(_.getLong(0)).toSeq

  test("centroid selection is deterministic and k-sized") {
    val again = IvfAnn.centroids(emb, "vec_id", "embedding", K)
    assert(cs.length === K)
    assert(cs.map(_.toSeq) === again.map(_.toSeq))
  }

  test("every vector gets a bucket in [0, k)") {
    val range = indexed.agg(min("__ivf_bucket"), max("__ivf_bucket")).collect().head
    assert(range.getLong(0) >= 0 && range.getLong(1) < K)
    assert(indexed.filter(col("__ivf_bucket").isNull).count() === 0)
  }

  test("full probe (nprobe = k) is EXACTLY brute-force top-10") {
    val got = IvfAnn.search(indexed, "vec_id", "embedding", cs, qv, 10, K)
      .collect().map(_.getLong(0)).toSeq
    assert(got === exactTop(10))
  }

  test("partial probe searches a strict subset and still finds neighbours") {
    val probes = IvfAnn.probeOrder(qv, cs).take(2).map(_.toLong)
    val candidates = indexed.filter(col("__ivf_bucket").isin(probes: _*)).count()
    val corpus = emb.count()
    assert(candidates < corpus, s"nprobe=2 candidates $candidates !< corpus $corpus")
    val got = IvfAnn.search(indexed, "vec_id", "embedding", cs, qv, 10, 2)
      .collect().map(_.getLong(0)).toSet
    val recall = (got intersect exactTop(10).toSet).size
    // query vector 0 itself lives in a probed bucket -> recall >= 1 always;
    // near-random vectors keep the bound loose
    assert(recall >= 1, s"recall@nprobe=2 = $recall/10")
  }

  test("clustered fixture: recall >= 0.9 at nprobe = 3 < k = 10") {
    val spark2 = spark
    val df = ClusteredEmbeddings.df(spark2).cache()
    val k = 10
    val cents = IvfAnn.centroids(df, "id", "embedding", k)
    val idx = IvfAnn.assign(df, "embedding", cents).cache()

    // query from a cluster that HAS a sampled centroid (the hash-spread
    // sample need not cover every cluster; a member of an uncovered
    // cluster tests the sampler, not the probe mechanics)
    val byId = ClusteredEmbeddings.vectors.map(v => (v._1, v)).toMap
    val coveredCluster = ClusteredEmbeddings.vectors
      .find(v => cents.exists(_.sameElements(v._2))).map(_._3).get
    val queryRow = ClusteredEmbeddings.vectors
      .find(v => v._3 == coveredCluster && !cents.exists(_.sameElements(v._2))).get
    val q = queryRow._2

    val exact = ClusteredEmbeddings.vectors
      .map(v => (v._1, ClusteredEmbeddings.cosine(q, v._2)))
      .sortBy { case (id, sim) => (-sim, id) }.take(10).map(_._1).toSet
    // sanity: the true top-10 are cluster-mates
    assert(exact.forall(id => byId(id)._3 == coveredCluster))

    val got = IvfAnn.search(idx, "id", "embedding", cents, q, 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered recall@nprobe=3 = $recall")
    df.unpersist(); idx.unpersist()
  }

  test("Lloyd refinement is deterministic and does not worsen quantization") {
    val df = ClusteredEmbeddings.df(spark).cache()
    val k = 10
    val cs0 = IvfAnn.centroids(df, "id", "embedding", k)
    val cs1 = IvfAnn.refine(df, "embedding", cs0, iters = 2)
    val cs1b = IvfAnn.refine(df, "embedding", cs0, iters = 2)
    assert(cs1.map(_.toSeq) === cs1b.map(_.toSeq), "refinement must be deterministic")

    // quantization quality: mean cosine of each vector to its NEAREST
    // centroid (driver-side over the 300-vector fixture)
    def quality(cs: Array[Array[Float]]): Double =
      ClusteredEmbeddings.vectors.map { case (_, v, _) =>
        cs.map(c => ClusteredEmbeddings.cosine(v, c)).max
      }.sum / ClusteredEmbeddings.vectors.size
    val q0 = quality(cs0); val q1 = quality(cs1)
    assert(q1 >= q0 - 1e-9, s"refinement worsened quantization: $q0 -> $q1")
    // full probe stays exact regardless of centroids (the e_ann_ivf
    // oracle's contract): same result from raw and refined quantizers
    val q = ClusteredEmbeddings.vectors.head._2
    val a = IvfAnn.search(IvfAnn.assign(df, "embedding", cs0), "id", "embedding", cs0, q, 10, k)
      .collect().map(_.getLong(0)).toSeq
    val b = IvfAnn.search(IvfAnn.assign(df, "embedding", cs1), "id", "embedding", cs1, q, 10, k)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b, "full probe must be centroid-independent")
    df.unpersist()
  }

  test("e28d recall gates HOLD on the committed clustered corpus (VERDICT r6 item 4)") {
    // The e28d driver row pins engine↔oracle parity; this assert pins
    // the QUALITY bar itself — the oracle re-derives the same algorithm,
    // so a config that degrades recall would stay hash-green with
    // recall_ok=false on both sides. Here the booleans must be TRUE:
    // recall@10 ≥ 0.9 (total_hits ≥ 90/100) and ≤ 25% of the corpus
    // scanned (4·max_cand ≤ 1999) for BOTH production configurations.
    val rows = SparkEntry.queries("e28d_ann_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val config = r.getString(0)
      assert(r.getBoolean(5), s"$config: recall@10 < 0.9 (total_hits=${r.getLong(2)}/100)")
      assert(r.getBoolean(6), s"$config: candidate scan > 25% (max_cand=${r.getLong(4)} of 1999)")
    }
  }
}
