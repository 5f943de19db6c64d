package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Broadcast dense-dimension lookup — the degenerate (and extremely
  * common) join where the build side is a dimension keyed by a DENSE
  * integer domain mapping to a small categorical value: customer →
  * nation, user → cohort, shard → tenant. A BroadcastHashJoin spends
  * a driver-side single-threaded hashed-relation build (~35 bytes per
  * entry) plus a hash probe per fact row; this operator collects the
  * dimension once (dimension-bounded, the IvfAnn/BroadcastSpatialJoin
  * precedent), packs it into ONE byte per key slot, broadcasts the
  * array, and probes with a bounds-checked array index from inside
  * whole-stage codegen — no hash, no boxing, no join node at all.
  *
  * Semantics: `lookup(key)` is NULL when the key is outside the dense
  * domain or absent from the dimension (slot -1), so
  * `filter(isNotNull)` after the projection reproduces an INNER
  * equi-join against a unique-keyed dimension exactly.
  *
  * Shape at 100 TB: the precondition — dimension fits the driver and
  * the broadcast — is the SAME one any broadcast join carries, at
  * roughly 1/30 the memory (1 byte/slot vs a hashed-relation row).
  * The fact side stays a single narrow codegen stage feeding the
  * partial aggregate: no shuffle is introduced anywhere.
  */
object DenseDimJoin {

  /** Collect `dim` (keyCol → valueCol, key dense in [0, maxKey],
    * value in [0, 127]) and return a lookup usable as a Column
    * factory. Throws on a domain too sparse to pack (maxKey beyond
    * `maxSlots`) or values outside a byte — reject, don't guess.
    */
  def lookup(s: SparkSession, dim: DataFrame, keyCol: String,
      valueCol: String, maxSlots: Int = 1 << 28): Column => Column = {
    import org.apache.spark.sql.functions.col
    val rows = dim.select(col(keyCol).cast("long"), col(valueCol).cast("int"))
      .collect()
    var maxKey = -1L
    rows.foreach { r =>
      // reject, don't guess: a NULL row or a duplicate key would make
      // lookup semantics silently diverge from the inner join it
      // replaces (duplicates MULTIPLY join output; a lookup cannot)
      require(!r.isNullAt(0) && !r.isNullAt(1), "null dimension row")
      val k = r.getLong(0)
      require(k >= 0 && k < maxSlots, s"key $k outside dense domain")
      if (k > maxKey) maxKey = k
    }
    val arr = new Array[Byte]((maxKey + 1).toInt.max(1))
    java.util.Arrays.fill(arr, (-1).toByte)
    rows.foreach { r =>
      val v = r.getInt(1)
      require(v >= 0 && v <= 127, s"value $v outside byte range")
      val k = r.getLong(0).toInt
      require(arr(k) == -1, s"duplicate dimension key $k")
      arr(k) = v.toByte
    }
    val bc = s.sparkContext.broadcast(arr)
    (key: Column) => GraftColumnBridge.column(
      DenseDimLookup(GraftColumnBridge.expression(key), bc))
  }
}

/** `arr[key]` with bounds and -1-slot checks, NULL outside the
  * dimension. Codegen caches the broadcast's value in a generated-class
  * field, so the per-row cost is one bounds check and one byte load.
  */
case class DenseDimLookup(child: Expression, bc: Broadcast[Array[Byte]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "dense_dim_lookup"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dense_dim_lookup expects an integral key, got ${child.dataType.simpleString}")

  @transient private lazy val arr: Array[Byte] = bc.value

  override def nullSafeEval(input: Any): Any = {
    val k = input match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    if (k < 0 || k >= arr.length || arr(k.toInt) < 0) null
    else arr(k.toInt).toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("denseDimBc", bc,
      classOf[Broadcast[Array[Byte]]].getName)
    val arrName = ctx.addMutableState("byte[]", "denseDimArr",
      v => s"$v = (byte[]) $bcRef.value();", forceInline = true)
    nullSafeCodeGen(ctx, ev, k => {
      val kk = ctx.freshName("k")
      s"""
        long $kk = (long) $k;
        if ($kk < 0 || $kk >= $arrName.length || $arrName[(int) $kk] < 0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = (int) $arrName[(int) $kk];
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
