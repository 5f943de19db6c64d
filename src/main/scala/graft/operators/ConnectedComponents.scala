package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise dedup output (MinHash/SimHash/Jaccard joins) into
  * dedup GROUPS with one canonical document each (driver north star:
  * deduplication as a first-class pipeline stage).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labelled with itself; each round every vertex takes the min of its own
  * label and its neighbours' labels; fixpoint after `diameter` rounds.
  * Each round is one shuffle-join + aggregate — the standard Spark
  * iterative-graph shape. `localCheckpoint` cuts the lineage so the plan
  * does not grow with iterations.
  *
  * Scale note (100 TB): near-dup graphs are forests of SMALL clusters
  * (diameter is tiny — duplicates of a doc are duplicates of each other),
  * so the loop converges in 2-4 rounds; for adversarial long-chain graphs
  * the known upgrade is alternating large-star/small-star (same join
  * algebra, O(log n) rounds), which changes the loop body, not the shape.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (a, b), undirected pairs
    * @return (id, component) — component = min vertex id reachable
    */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.toDF("a", "b")
    // symmetrized edge list; self-loops are harmless and dropped by distinct
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // min label among neighbours, then fold with own label
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint()
      val changed = next.alias("n")
        .join(labels.alias("p"), col("n.id") === col("p.id"))
        .filter(col("n.label") =!= col("p.label"))
        .limit(1).count()
      // next is eagerly materialized above — the previous round's
      // checkpoint snapshot can be released instead of pinning one label
      // copy per round in executor storage until driver GC gets to it
      unpersistCheckpoint(labels)
      labels = next
      converged = changed == 0
      i += 1
    }
    unpersistCheckpoint(sym)
    // Unconverged labels are WRONG labels (far vertices still carry
    // intermediate values): fail loudly, never return them.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter); raise maxIter or use a " +
          "large-star/small-star variant for long-chain graphs")
    labels.select(col("id"), col("label").as("component"))
  }

  /** Release the cached RDD behind a localCheckpoint'ed DataFrame. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
}
