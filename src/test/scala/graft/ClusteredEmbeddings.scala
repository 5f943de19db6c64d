package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic mixture-of-Gaussians embedding fixture (VERDICT r2 item 7):
  * the sf testdata embeddings are near-random vectors — LSH/IVF's worst
  * case, which makes measured recall look far below production reality,
  * where embedding spaces are CLUSTERED. 10 well-separated Gaussian
  * clusters × 30 members in 32 dims: within-cluster cosine ≈ 0.999,
  * cross-cluster ≈ |N(0, 0.18)|, so "the true near neighbours" is an
  * unambiguous set and recall bounds can be tight (≥ 0.9) instead of the
  * loose sanity bounds the random fixtures allow. Fixed seed — the fixture
  * is a value, not a distribution.
  */
object ClusteredEmbeddings {
  val dim = 32
  val clusters = 10
  val members = 30
  val noiseSigma = 0.05

  /** (id, embedding, trueCluster); id = cluster * members + m. */
  lazy val vectors: Seq[(Long, Array[Float], Int)] = {
    val rnd = new scala.util.Random(20260812L)
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian())
    (for (c <- 0 until clusters; m <- 0 until members) yield {
      val v = Array.tabulate(dim)(d => (centers(c)(d) + noiseSigma * rnd.nextGaussian()).toFloat)
      ((c * members + m).toLong, v, c)
    })
  }

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    vectors.toDF("id", "embedding", "cluster")
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
