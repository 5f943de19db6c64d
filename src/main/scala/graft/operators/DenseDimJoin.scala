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

  /** Occupancy bound: the packed array may be at most this many slots
    * per observed dimension row (≥ 25% occupancy), so a sparse key near
    * `maxSlots` rejects as "too sparse to pack" BEFORE any allocation —
    * a 3-row dimension can never trigger a 256 MB byte array.
    */
  val DensityFactor: Long = 4L

  /** Row bound under which [[withValueLocal]]'s driver-local parquet read
    * beats a Spark collect job. Measured: the example-API record walk
    * costs ~10 µs/row warm (15k customer rows = ~160 ms — MORE than the
    * ~40-80 ms collect job it replaces), so the local route is only for
    * genuinely tiny dims (nation/region scale) where the whole read is
    * ~1 ms and the job round-trip dominates.
    */
  val LocalReadMaxRows: Long = 1L << 12

  /** Collect `dim` (keyCol → valueCol, key dense in [0, maxKey],
    * value in [0, 127]) and return a lookup usable as a Column
    * factory. Throws on a domain too sparse to pack (maxKey beyond
    * `maxSlots`, or occupancy under 1/[[DensityFactor]]) or values
    * outside a byte — reject, don't guess. Callers that want
    * degrade-to-join instead of a throw use [[tryLookup]]/[[withValue]].
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
    // the ADVICE r13 bound: allocation is limited by what the observed
    // row count justifies, not by maxSlots alone
    require(maxKey + 1 <= DensityFactor * rows.length.toLong.max(1L),
      s"domain too sparse to pack: span ${maxKey + 1} for ${rows.length} rows")
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

  /** One-aggregate dimension-stats probe (the c09 `keyRange` pattern),
    * memoized per (session, cacheKey, columns): row count, key span,
    * value range, and null presence — everything the routing decision
    * needs, answerable from catalog/footer statistics on a real
    * lakehouse. Duplicate keys are NOT visible here; they are caught at
    * pack time (the dimension has already been collected by then, so
    * the extra cost of the failed pack is bounded by the dim itself).
    */
  final case class DimStats(rows: Long, minKey: Long, maxKey: Long,
      minVal: Long, maxVal: Long, nulls: Long)

  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String, String), DimStats]()

  def dimStats(s: SparkSession, dim: DataFrame, keyCol: String,
      valueCol: String, cacheKey: String): DimStats =
    statsCache.computeIfAbsent(
      (System.identityHashCode(s), cacheKey, keyCol, valueCol), _ => {
        import org.apache.spark.sql.functions._
        val r = dim.agg(
          count(lit(1)),
          min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long"),
          min(col(valueCol)).cast("long"), max(col(valueCol)).cast("long"),
          sum(when(col(keyCol).isNull || col(valueCol).isNull, 1L)
            .otherwise(0L))).head()
        if (r.getLong(0) == 0L) DimStats(0L, 0L, -1L, 0L, -1L, 0L)
        else DimStats(r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) r.getLong(0) else r.getLong(5))
      })

  /** Does the probed domain pack into the dense byte-array form? */
  def packs(st: DimStats, maxSlots: Int): Boolean =
    st.rows > 0 && st.nulls == 0 &&
      st.minKey >= 0 && st.maxKey < maxSlots.toLong &&
      st.maxKey + 1 <= DensityFactor * st.rows &&
      st.minVal >= 0 && st.maxVal <= 127

  /** Adaptive route (VERDICT r13 item 2): probe first, collect-and-pack
    * only when the stats say the domain packs, and return None — never
    * throw — when it doesn't (sparse, oversized, nulls, wide values, or
    * a pack-time duplicate key), so the caller degrades to the plain
    * BroadcastHashJoin the lookup replaces.
    */
  def tryLookup(s: SparkSession, dim: DataFrame, keyCol: String,
      valueCol: String, cacheKey: String,
      maxSlots: Int = 1 << 28): Option[Column => Column] = {
    val st = dimStats(s, dim, keyCol, valueCol, cacheKey)
    if (!packs(st, maxSlots)) None
    else
      try Some(lookup(s, dim, keyCol, valueCol, maxSlots))
      catch { case _: IllegalArgumentException => None } // pack-time dupes
  }

  /** Inner-join `fact ⋈ dim` appending `valueCol`, routed: the dense
    * codegen lookup when the dimension packs, the plain
    * BroadcastHashJoin (same precondition, ~30× the memory) when it
    * doesn't. Both routes produce the same columns (`fact.*`,
    * `valueCol`) and the same rows for a unique-keyed dimension; the
    * join route additionally handles duplicate keys with genuine join
    * semantics, which the lookup form cannot express — that is exactly
    * why it is the fallback.
    */
  def withValue(fact: DataFrame, factKeyCol: String, s: SparkSession,
      dim: DataFrame, keyCol: String, valueCol: String, cacheKey: String,
      maxSlots: Int = 1 << 28): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    tryLookup(s, dim, keyCol, valueCol, cacheKey, maxSlots) match {
      case Some(look) =>
        fact.withColumn(valueCol, look(col(factKeyCol)))
          .filter(col(valueCol).isNotNull)
      case None =>
        fact.join(broadcast(dim.select(col(keyCol), col(valueCol))),
          col(factKeyCol) === col(keyCol)).drop(keyCol)
    }
  }

  /** [[withValue]] for a dimension that IS a flat parquet table on disk:
    * the packed array is built from a DRIVER-LOCAL read of the file
    * (operators.LocalParquet) instead of a Spark collect job — the
    * collect's schedule+fetch round-trip was paid on every query
    * execution (r18 optimization, guide §1.2). Same routing probe
    * (memoized dimStats over the Spark relation), same pack-time reject
    * rules, same degrade-to-broadcast-join fallback; the file is re-read
    * on every call (no caching). `dim` must be the same relation the
    * path holds — it is still what the fallback join and the stats probe
    * read.
    */
  def withValueLocal(fact: DataFrame, factKeyCol: String, s: SparkSession,
      dimPath: String, dim: DataFrame, keyCol: String, valueCol: String,
      cacheKey: String, maxSlots: Int = 1 << 28): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    def joinRoute: DataFrame =
      fact.join(broadcast(dim.select(col(keyCol), col(valueCol))),
        col(factKeyCol) === col(keyCol)).drop(keyCol)
    val st = dimStats(s, dim, keyCol, valueCol, cacheKey)
    if (!packs(st, maxSlots)) joinRoute
    else if (st.rows > LocalReadMaxRows)
      // past the tiny-dim bound the local record walk loses to the
      // parallel collect — see LocalReadMaxRows for the measurement
      withValue(fact, factKeyCol, s, dim, keyCol, valueCol, cacheKey, maxSlots)
    else
      try {
        val rows = LocalParquet.readAll(dimPath, Seq(keyCol, valueCol))
        // r19 (ADVICE): the documented precondition that `dim` holds the
        // same data as `dimPath` is now CHECKED — a drifted/re-staged
        // relation degrades to the join route instead of silently packing
        // stale file contents.
        require(rows.length == st.rows,
          s"dim/dimPath drift: file has ${rows.length} rows, relation ${st.rows}")
        def asLong(v: Any): Long = v match {
          case l: Long => l
          case i: Int => i.toLong
          case null => throw new IllegalArgumentException("null dimension row")
          case other => throw new IllegalArgumentException(
            s"non-integral dimension value: $other")
        }
        var maxKey = -1L
        rows.foreach { r =>
          val k = asLong(r(0))
          require(k >= 0 && k < maxSlots, s"key $k outside dense domain")
          if (k > maxKey) maxKey = k
        }
        require(maxKey + 1 <= DensityFactor * rows.length.toLong.max(1L),
          s"domain too sparse to pack: span ${maxKey + 1} for ${rows.length} rows")
        val arr = new Array[Byte]((maxKey + 1).toInt.max(1))
        java.util.Arrays.fill(arr, (-1).toByte)
        rows.foreach { r =>
          val v = asLong(r(1))
          require(v >= 0 && v <= 127, s"value $v outside byte range")
          val k = asLong(r(0)).toInt
          require(arr(k) == -1, s"duplicate dimension key $k")
          arr(k) = v.toByte
        }
        val bc = s.sparkContext.broadcast(arr)
        fact.withColumn(valueCol, GraftColumnBridge.column(
            DenseDimLookup(GraftColumnBridge.expression(col(factKeyCol)), bc)))
          .filter(col(valueCol).isNotNull)
      } catch { case _: IllegalArgumentException => joinRoute }
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
