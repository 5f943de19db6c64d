package graft.functions

import graft.GeoFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/** Native spatial predicates over WKB (SURVEY.md §4.3, the follow-on to
  * st_x/st_y/st_envelope): st_intersects / st_contains / st_within /
  * st_disjoint as catalyst Expressions.
  *
  * Two wins over the Scala UDF form:
  *  - when one side is a LITERAL geometry (the dominant filter shape —
  *    "rows intersecting this region"), it is parsed ONCE per expression
  *    instance and wrapped in a JTS PreparedGeometry, whose cached edge
  *    index makes repeated point/region tests several times faster than
  *    re-evaluating Geometry.intersects per row;
  *  - evaluation stays inside whole-stage codegen via a reference-object
  *    call — no UDF wrapper, no per-row catalyst<->Scala conversion.
  *
  * plans.SpatialFilterRule matches these nodes as well as the UDF form,
  * so __bbox pushdown fires whichever API built the predicate.
  */
abstract class WkbPredicate extends BinaryExpression {

  /** JTS relation on materialized geometries (slow path). */
  protected def relate(a: Geometry, b: Geometry): Boolean
  /** Same relation via a prepared LEFT... prepared RIGHT operand. */
  protected def relatePrepared(prepRight: PreparedGeometry, left: Geometry): Boolean

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (WKB binary, WKB binary)")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  // One prepared geometry per expression instance when the right operand
  // is a literal; built lazily on the executor after serialization.
  @transient private lazy val preparedRight: PreparedGeometry = right match {
    case Literal(b: Array[Byte], BinaryType) if b != null =>
      PreparedGeometryFactory.prepare(GeoFunctions.fromWkb(b))
    case _ => null
  }

  /** Called from generated code and from nullSafeEval. */
  def evalPredicate(a: Array[Byte], b: Array[Byte]): Boolean = {
    val l = GeoFunctions.fromWkb(a)
    val p = preparedRight
    if (p != null) relatePrepared(p, l)
    else relate(l, GeoFunctions.fromWkb(b))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    evalPredicate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wkbPred", this, classOf[WkbPredicate].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.evalPredicate($a, $b);")
  }
}

case class StIntersectsExpr(left: Expression, right: Expression) extends WkbPredicate {
  override def prettyName: String = "st_intersects"
  override protected def relate(a: Geometry, b: Geometry): Boolean = a.intersects(b)
  override protected def relatePrepared(p: PreparedGeometry, l: Geometry): Boolean =
    p.intersects(l) // symmetric relation: prepared side order is free
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StDisjointExpr(left: Expression, right: Expression) extends WkbPredicate {
  override def prettyName: String = "st_disjoint"
  override protected def relate(a: Geometry, b: Geometry): Boolean = a.disjoint(b)
  override protected def relatePrepared(p: PreparedGeometry, l: Geometry): Boolean =
    p.disjoint(l) // symmetric
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** contains(a, b): a contains b — prepared fast path only when the
  * CONTAINER is the literal (prepared.contains(l) tests p ⊇ l, which is
  * the correct orientation when right = b is the contained side, so the
  * prepared form applies to `within`; for `contains` the literal right is
  * the CONTAINEE and the prepared index does not apply — fall through).
  */
case class StContainsExpr(left: Expression, right: Expression) extends WkbPredicate {
  override def prettyName: String = "st_contains"
  override protected def relate(a: Geometry, b: Geometry): Boolean = a.contains(b)
  override protected def relatePrepared(p: PreparedGeometry, l: Geometry): Boolean =
    p.within(l) // p=right (containee literal): right within left == left contains right
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StWithinExpr(left: Expression, right: Expression) extends WkbPredicate {
  override def prettyName: String = "st_within"
  override protected def relate(a: Geometry, b: Geometry): Boolean = a.within(b)
  override protected def relatePrepared(p: PreparedGeometry, l: Geometry): Boolean =
    p.contains(l) // p=right (region literal): left within right == right contains left
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

object WkbPredicates {
  /** Replace the SQL-path UDF registrations with the native expressions
    * (Column helpers in GeoFunctions route through the same nodes).
    */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("st_intersects", e => StIntersectsExpr(e(0), e(1)), "built-in")
    r.createOrReplaceTempFunction("st_disjoint", e => StDisjointExpr(e(0), e(1)), "built-in")
    r.createOrReplaceTempFunction("st_contains", e => StContainsExpr(e(0), e(1)), "built-in")
    r.createOrReplaceTempFunction("st_within", e => StWithinExpr(e(0), e(1)), "built-in")
  }
}
