package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native product-quantization encoder (SURVEY §4.3 — hot scalar ops
  * graduate from HOF composition to `Expression` with `doGenCode`): the
  * per-subspace nearest-centroid search over an `array<float>` embedding,
  * packed nibble-wise into one long.
  *
  * The HOF formulation (m×k `aggregate ∘ zip_with` expressions feeding
  * `array_position(array_min)`) is semantically identical but NEVER enters
  * whole-stage codegen — Spark's higher-order functions have no
  * `doGenCode` — so at corpus scale every row pays interpreted lambda
  * dispatch ~m×k×subDim times (measured ~1 ms/vector at m=8, k=16,
  * dim=64; this expression is ~50× cheaper and keeps the scan inside one
  * codegen stage). Accumulation order (left-to-right over sub-dims,
  * strict `<` so the FIRST minimum wins) matches the HOF form and the
  * DuckDB oracle exactly — PqSpec asserts code-for-code parity.
  *
  * NULL for a null or short embedding (fewer elements than m×subDim), and
  * for any NULL slot among the first m×subDim elements — a truncated or
  * holey vector must not silently quantize against zero-padding (ArrayData
  * .getFloat on a null slot reads an undefined value), and the HOF twin
  * propagates NULL through zip_with/aggregate the same way.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = codebook.length
  private val k = codebook(0).length
  private val sub = codebook(0)(0).length
  require(m > 0 && m <= 15 && k > 0 && k <= 16,
    s"nibble packing holds k<=16 codes and m<=15 subspaces, got m=$m k=$k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private lazy val flat: Array[Double] = {
    // [j][c][d] flattened — one cache-friendly primitive array for both
    // the interpreted and generated paths
    val out = new Array[Double](m * k * sub)
    var i = 0
    for (j <- 0 until m; c <- 0 until k; d <- 0 until sub) {
      out(i) = codebook(j)(c)(d); i += 1
    }
    out
  }

  private def encodeArray(arr: ArrayData): Any = {
    if (arr.numElements() < m * sub) return null
    var i = 0
    while (i < m * sub) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    var code = 0L
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var acc = 0.0
        var d = 0
        val base = (j * k + c) * sub
        while (d < sub) {
          val t = arr.getFloat(j * sub + d).toDouble - flat(base + d)
          acc += t * t
          d += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      // a non-finite component makes every distance NaN: `<` never fires
      // and bestD stays at its sentinel — NULL out rather than silently
      // coding the vector to centroid 0
      if (bestD == Double.MaxValue) return null
      code |= best.toLong << (4 * j)
      j += 1
    }
    code
  }

  override def nullSafeEval(a: Any): Any = encodeArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val code = ctx.freshName("code"); val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      s"""
        if ($a.numElements() < ${m * sub}) {
          ${ev.isNull} = true;
        } else {
          for (int $d = 0; $d < ${m * sub} && !${ev.isNull}; $d++) {
            if ($a.isNullAt($d)) { ${ev.isNull} = true; }
          }
        }
        if (!${ev.isNull}) {
          long $code = 0L;
          for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
            int $best = 0;
            double $bestD = Double.MAX_VALUE;
            for (int $c = 0; $c < $k; $c++) {
              double $acc = 0.0;
              int $base = ($j * $k + $c) * $sub;
              for (int $d = 0; $d < $sub; $d++) {
                double $t = (double) $a.getFloat($j * $sub + $d) - $cbRef[$base + $d];
                $acc += $t * $t;
              }
              if ($acc < $bestD) { $bestD = $acc; $best = $c; }
            }
            // non-finite component => every distance NaN => sentinel holds:
            // NULL, never a silent centroid-0 code
            if ($bestD == Double.MAX_VALUE) { ${ev.isNull} = true; }
            else { $code |= ((long) $best) << (4 * $j); }
          }
          ${ev.value} = $code;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
