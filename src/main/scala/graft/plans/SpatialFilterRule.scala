package graft.plans

import graft.GeoFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Bbox pushdown rewrite (SURVEY.md §4.3): spatial predicates over WKB are
  * black-box functions — Catalyst cannot push them into the parquet scan,
  * so a spatial filter alone reads every row group. GeoParquet datasets
  * written with covering columns (GeoParquet 1.1 pattern; GeoParquet.write
  * `addBboxColumn` emits one `__bbox_<col>` per geometry column) carry
  * per-row envelopes whose min/max parquet statistics CAN skip row groups.
  *
  * This rule rewrites
  *   Filter(st_intersects(geom, LITERAL_WKB), scan-with-__bbox_geom)
  * into
  *   Filter(st_intersects(...) AND __bbox_geom-range-conjunction, ...)
  * keeping the exact predicate (the bbox test is necessary, not sufficient)
  * while handing the planner sargable range predicates that reach the scan
  * (`PushedFilters: [GreaterThanOrEqual(__bbox_geometry.xmax, ...)]` —
  * asserted in SpatialRuleSpec). Also handles st_within(geom, lit),
  * st_contains(lit, geom) and either argument order for st_intersects.
  *
  * The covering column is resolved BY NAME from the geometry attribute the
  * predicate actually references (`g` → `__bbox_g`): on a multi-geometry
  * dataset, a filter over the second geometry column must never be
  * constrained by the first column's envelope — each predicate prunes on
  * its own covering column or not at all.
  *
  * Registered via `spark.experimental.extraOptimizations` (Graft.prepare).
  * That batch runs after predicate pushdown, which is fine: FileSourceStrategy
  * re-collects filters sitting above the relation at physical planning, so
  * conjuncts added here still reach the scan.
  */
object SpatialFilterRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child)
        if child.output.exists(_.name.startsWith("__bbox_")) =>
      // Harvest ONLY top-level conjuncts that are themselves the spatial
      // predicate: a predicate under OR/NOT is not necessarily satisfied by
      // every output row, so ANDing its bbox range would wrongly drop rows
      // matching the other branch.
      val extras = conjuncts(cond).flatMap {
        case u: ScalaUDF => harvestUdf(u)
        case n: graft.functions.WkbPredicate => harvestNative(n)
        case _ => None
      }.flatMap { case (geomAttr, queryWkb) =>
        child.output.find(_.name == s"__bbox_${geomAttr.name}")
          // idempotence: if the condition already references this covering
          // column (user-written or a previous optimizer pass), add nothing
          .filterNot(cond.references.contains)
          .map(bbox => envelopeConjunct(queryWkb, bbox))
      }
      if (extras.isEmpty) f
      else Filter(And(cond, extras.reduce(And)), child)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** (geometry attribute tested, literal query geometry) for the UDF form. */
  private def harvestUdf(u: ScalaUDF): Option[(Attribute, Array[Byte])] = {
    val name = u.udfName.getOrElse("")
    val args = u.children
    // a user-registered UDF may reuse these names with any arity — never
    // index past its actual children (the optimizer must not throw)
    if (args.length != 2) return None
    name match {
      case "st_intersects" => symmetric(args(0), args(1))
      case "st_within" => directed(geom = args(0), region = args(1))
      case "st_contains" => directed(geom = args(1), region = args(0))
      case _ => None
    }
  }

  /** Same harvest for the NATIVE predicate nodes (functions.WkbPredicates):
    * st_intersects takes the literal on either side (symmetric envelope
    * test); st_within needs the literal REGION on the right, st_contains
    * on the left. st_disjoint gets NO conjunct — its matching rows have
    * non-overlapping envelopes, the opposite of the bbox test.
    */
  private def harvestNative(
      p: graft.functions.WkbPredicate): Option[(Attribute, Array[Byte])] = {
    import graft.functions.{StContainsExpr, StIntersectsExpr, StWithinExpr}
    p match {
      case StIntersectsExpr(l, r) => symmetric(l, r)
      case StWithinExpr(g, region) => directed(geom = g, region = region)
      case StContainsExpr(region, g) => directed(geom = g, region = region)
      case _ => None
    }
  }

  private def symmetric(a: Expression, b: Expression): Option[(Attribute, Array[Byte])] =
    (a, b) match {
      case (g: Attribute, Literal(w: Array[Byte], _)) => Some((g, w))
      case (Literal(w: Array[Byte], _), g: Attribute) => Some((g, w))
      case _ => None
    }

  private def directed(geom: Expression, region: Expression): Option[(Attribute, Array[Byte])] =
    (geom, region) match {
      case (g: Attribute, Literal(w: Array[Byte], _)) => Some((g, w))
      case _ => None
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
