package graft.plans

import graft.GeoFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Bbox pushdown rewrite (SURVEY.md §4.3): spatial predicates over WKB are
  * black-box UDFs — Catalyst cannot push them into the parquet scan, so a
  * spatial filter alone reads every row group. GeoParquet datasets written
  * with a `__bbox` covering column (GeoParquet 1.1 pattern; GeoParquet.write
  * `addBboxColumn`) carry per-row envelopes whose min/max parquet statistics
  * CAN skip row groups.
  *
  * This rule rewrites
  *   Filter(st_intersects(geom, LITERAL_WKB), scan-with-__bbox)
  * into
  *   Filter(st_intersects(...) AND __bbox-range-conjunction, ...)
  * keeping the exact predicate (the bbox test is necessary, not sufficient)
  * while handing the planner sargable range predicates that reach the scan
  * (`PushedFilters: [GreaterThanOrEqual(__bbox.xmax, ...)]` — asserted in
  * SpatialRuleSpec). Also handles st_within(geom, lit), st_contains(lit,
  * geom) and either argument order for st_intersects.
  *
  * Registered via `spark.experimental.extraOptimizations` (Graft.prepare).
  * That batch runs after predicate pushdown, which is fine: FileSourceStrategy
  * re-collects filters sitting above the relation at physical planning, so
  * conjuncts added here still reach the scan.
  */
object SpatialFilterRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      child.output.find(_.name == "__bbox") match {
        case Some(bbox) if !cond.references.contains(bbox) =>
          // Harvest ONLY top-level conjuncts that are themselves the spatial
          // UDF: a predicate under OR/NOT is not necessarily satisfied by
          // every output row, so ANDing its bbox range would wrongly drop
          // rows matching the other branch.
          val extras = conjuncts(cond).collect {
            case u: ScalaUDF => bboxConjunct(u, bbox)
            case n: graft.functions.WkbPredicate => nativeBboxConjunct(n, bbox)
          }.flatten
          if (extras.isEmpty) f
          else Filter(And(cond, extras.reduce(And)), child)
        case _ => f
      }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** geometry-literal envelope -> range conjunction on the __bbox struct. */
  private def bboxConjunct(u: ScalaUDF, bbox: Attribute): Option[Expression] = {
    val name = u.udfName.getOrElse("")
    val args = u.children
    val geomLit: Option[Array[Byte]] = name match {
      case "st_intersects" => args.collectFirst {
        case Literal(b: Array[Byte], _) => b
      }
      case "st_within" => args(1) match { // geom WITHIN literal region
        case Literal(b: Array[Byte], _) => Some(b)
        case _ => None
      }
      case "st_contains" => args.head match { // literal region CONTAINS geom
        case Literal(b: Array[Byte], _) => Some(b)
        case _ => None
      }
      case _ => None
    }
    geomLit.map(envelopeConjunct(_, bbox))
  }

  /** Same harvest for the NATIVE predicate nodes (functions.WkbPredicates):
    * st_intersects takes the literal on either side (symmetric envelope
    * test); st_within needs the literal REGION on the right, st_contains
    * on the left. st_disjoint gets NO conjunct — its matching rows have
    * non-overlapping envelopes, the opposite of the bbox test.
    */
  private def nativeBboxConjunct(
      p: graft.functions.WkbPredicate, bbox: Attribute): Option[Expression] = {
    import graft.functions.{StContainsExpr, StIntersectsExpr, StWithinExpr}
    val geomLit: Option[Array[Byte]] = p match {
      case StIntersectsExpr(l, r) => Seq(l, r).collectFirst {
        case Literal(b: Array[Byte], _) => b
      }
      case StWithinExpr(_, Literal(b: Array[Byte], _)) => Some(b)
      case StContainsExpr(Literal(b: Array[Byte], _), _) => Some(b)
      case _ => None
    }
    geomLit.map(envelopeConjunct(_, bbox))
  }

  /** envelope overlap: row.xmin <= q.xmax AND row.xmax >= q.xmin AND … */
  private def envelopeConjunct(wkb: Array[Byte], bbox: Attribute): Expression = {
    val env = GeoFunctions.fromWkb(wkb).getEnvelopeInternal
    def fld(i: Int, n: String) = GetStructField(bbox, i, Some(n))
    def d(v: Double) = Literal(v, DoubleType)
    And(
      And(LessThanOrEqual(fld(0, "xmin"), d(env.getMaxX)),
        GreaterThanOrEqual(fld(2, "xmax"), d(env.getMinX))),
      And(LessThanOrEqual(fld(1, "ymin"), d(env.getMaxY)),
        GreaterThanOrEqual(fld(3, "ymax"), d(env.getMinY))))
  }

  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(SpatialFilterRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialFilterRule
  }
}
