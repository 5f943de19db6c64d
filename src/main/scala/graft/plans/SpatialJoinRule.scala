package graft.plans

import graft.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column, ofRows}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Spatial-join routing (SURVEY.md §4.3; the automatic form of
  * operators.SpatialJoin): an inner join whose condition tests
  * `st_intersects(left_geom, right_geom)` would plan as a broadcast
  * nested loop — O(n·m) exact-predicate evaluations, a non-starter at
  * scale. This rule rewrites it into the grid pattern:
  *
  *   explode each side's envelope into the fixed-grid cells it covers
  *     -> EQUI-join on (cellX, cellY)   [shuffle-partitioned, AQE-skew-safe]
  *     -> original condition as exact post-filter
  *     -> reference-point guard for dedup
  *
  * The reference-point guard (emit a pair only from the cell containing
  * the min corner of the two envelopes' intersection) makes each
  * qualifying pair appear EXACTLY once without a distinct(): duplicate
  * input rows keep their multiplicity and no extra shuffle is added —
  * the standard PBSM trick (SpatialSpark/Sedona lineage).
  *
  * Scope guards:
  *  - inner joins only, st_intersects as a TOP-LEVEL conjunct with one
  *    side's geometry built purely from each input;
  *  - skipped when the user broadcast-hints a side (a tiny build side
  *    makes BNL the better plan — respect the hint);
  *  - cell size from `spark.graft.spatialJoin.cell` (default 500.0;
  *    choose ≈ the median envelope extent — smaller cells multiply
  *    replicas, larger cells multiply candidate pairs).
  *
  * Implementation note: the rewrite rebuilds the subtree with the
  * DataFrame API over the already-analyzed children (GraftColumnBridge
  * .ofRows) and splices back the analyzed plan. The experimental batch
  * runs after column pruning, so the spliced subtree keeps full-width
  * scans — the exactness of results is unaffected, and the O(n·m)→
  * O(candidates) work reduction dominates at any scale worth routing.
  */
object SpatialJoinRule extends Rule[LogicalPlan] {

  val CellConf = "spark.graft.spatialJoin.cell"

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if hint.leftHint.forall(_.strategy.isEmpty) &&
          hint.rightHint.forall(_.strategy.isEmpty) &&
          // structural idempotence: our own rewrite carries __graft_cell cols
          !(l.output ++ r.output).exists(_.name.startsWith("__graft_cell")) =>
      // If the condition already carries a cross-side EQUALITY, Spark plans
      // a hash/sort-merge join on it with st_intersects as a post-filter —
      // no BNL to save, and the grid rewrite would only multiply rows.
      if (hasCrossEquality(cond, l, r)) j
      else harvest(cond, l, r) match {
        case Some((lg, rg)) => rewrite(j, l, r, lg, rg, cond)
        case None => j
      }
  }

  private def hasCrossEquality(cond: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a, b) =>
        (refsOnly(a, l) && refsOnly(b, r)) || (refsOnly(a, r) && refsOnly(b, l))
      case EqualNullSafe(a, b) =>
        (refsOnly(a, l) && refsOnly(b, r)) || (refsOnly(a, r) && refsOnly(b, l))
      case _ => false
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** The (left-side geometry, right-side geometry) of a top-level
    * st_intersects conjunct, if each references exactly one input.
    */
  private def harvest(cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression)] = {
    def sided(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (refsOnly(a, l) && refsOnly(b, r)) Some((a, b))
      else if (refsOnly(a, r) && refsOnly(b, l)) Some((b, a))
      else None
    conjuncts(cond).view.flatMap {
      case graft.functions.StIntersectsExpr(a, b) => sided(a, b)
      case u: ScalaUDF if u.udfName.contains("st_intersects") && u.children.length == 2 =>
        sided(u.children(0), u.children(1))
      case _ => None
    }.headOption
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      lg: Expression, rg: Expression, cond: Expression): LogicalPlan = {
    val spark = SparkSession.active
    val cell = spark.conf.get(CellConf, "500.0").toDouble

    def prep(p: LogicalPlan, g: Expression, side: String): DataFrame = {
      val env = s"__graft_env_$side"
      val cx = s"__graft_cell_x_$side"
      val cy = s"__graft_cell_y_$side"
      ofRows(spark, p)
        .withColumn(env, GeoFunctions.stEnvelopeStruct(column(g)))
        .withColumn(cx, explode(sequence(
          floor(col(env).getField("xmin") / cell).cast("long"),
          floor(col(env).getField("xmax") / cell).cast("long"))))
        .withColumn(cy, explode(sequence(
          floor(col(env).getField("ymin") / cell).cast("long"),
          floor(col(env).getField("ymax") / cell).cast("long"))))
    }

    val lp = prep(l, lg, "l")
    val rp = prep(r, rg, "r")
    val lEnv = col("__graft_env_l"); val rEnv = col("__graft_env_r")
    // reference point: the min corner of the envelope intersection — it
    // lies in exactly one grid cell, so the pair is emitted exactly once
    val refX = floor(greatest(lEnv.getField("xmin"), rEnv.getField("xmin")) / cell).cast("long")
    val refY = floor(greatest(lEnv.getField("ymin"), rEnv.getField("ymin")) / cell).cast("long")
    val joined = lp.join(rp,
      col("__graft_cell_x_l") === col("__graft_cell_x_r") &&
        col("__graft_cell_y_l") === col("__graft_cell_y_r") &&
        column(cond) &&
        col("__graft_cell_x_l") === refX && col("__graft_cell_y_l") === refY)
      // restore the original join's schema (attribute order AND exprIds)
      .select((j.output.map(a => column(a))): _*)
    joined.queryExecution.analyzed
  }

  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(SpatialJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialJoinRule
  }
}
