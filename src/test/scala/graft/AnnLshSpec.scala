package graft

import graft.operators.AnnLsh
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E3 scale path (PROP tier): random-hyperplane LSH candidates must (a) be
  * far fewer than the full n² pairs, (b) recover a decent fraction of the
  * true most-similar pairs, (c) be deterministic across runs.
  */
class AnnLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def emb = Tables(spark, TestSpark.sfDir, "embeddings")

  test("candidate set is sub-quadratic and deterministic") {
    val n = emb.count()
    val cands = AnnLsh.nearDupCandidates(emb, "vec_id", "embedding")
    val c1 = cands.count()
    val c2 = AnnLsh.nearDupCandidates(emb, "vec_id", "embedding").count()
    assert(c1 === c2) // deterministic planes
    assert(c1 < n * (n - 1) / 4, s"candidates $c1 not sub-quadratic for n=$n")
    assert(c1 > 0)
  }

  test("recall: top true pairs are mostly recovered") {
    import spark.implicits._
    val e = emb.limit(120).cache()
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val truth = a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), expr("cosine_sim(e1, e2)").as("sim"))
      .orderBy(col("sim").desc).limit(20)
      .select("id1", "id2").as[(Long, Long)].collect().toSet

    // Near-random embeddings are LSH's worst case (top pairs only ~0.4
    // cosine => 0.63/bit collision); 6-bit tables give ~0.65 expected
    // recall here. Genuine near-dups (cosine 0.95+) collide at 0.97/bit.
    val got = AnnLsh.nearDupCandidates(e, "vec_id", "embedding", tables = 16, bits = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet

    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.5, s"recall $recall too low (got ${got.size} candidates)")
  }

  test("clustered fixture: recall >= 0.9 over ALL true near-dup pairs, sub-quadratic candidates") {
    import spark.implicits._
    // truth = every within-cluster pair (cosine ≈ 0.999 by construction)
    val truth = (for {
      c <- 0 until ClusteredEmbeddings.clusters
      ids = (0 until ClusteredEmbeddings.members)
        .map(m => (c * ClusteredEmbeddings.members + m).toLong)
      i <- ids; j <- ids if i < j
    } yield (i, j)).toSet

    val df = ClusteredEmbeddings.df(spark)
    val got = AnnLsh.nearDupCandidates(df, "id", "embedding",
        dim = ClusteredEmbeddings.dim)
      .select("id1", "id2").as[(Long, Long)].collect().toSet

    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"clustered recall $recall < 0.9 (|got| = ${got.size})")
    val n = ClusteredEmbeddings.clusters * ClusteredEmbeddings.members
    assert(got.size < n * (n - 1) / 4,
      s"candidate set ${got.size} not sub-quadratic (n = $n)")
  }
}
