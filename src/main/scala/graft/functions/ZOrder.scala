package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve value for spatial clustering — pure Column
  * algebra (shift/mask bit spreading), fully codegen'd, no UDF.
  *
  * Interleaving the bits of the quantized x/y coordinates makes rows that
  * are CLOSE IN SPACE also close in sort order, so a range-partitioned
  * write produces files/row groups with TIGHT bounding boxes — which is
  * what turns `__bbox_<col>` min/max statistics (plans.SpatialFilterRule) from
  * decorative into selective: a spatial filter then skips most row groups
  * instead of scanning everything. This is the standard lakehouse
  * clustering move (Z-ordering) applied to the geo layer.
  */
object ZOrder {

  private val Bits = 21 // 21+21 interleaved bits fit a positive long

  /** Spread the low 21 bits of `v` so consecutive bits land 2 apart
    * (classic 2D Morton magic-number sequence, 64-bit variant — verified
    * bit-for-bit against the loop interleave in ZOrderSpec).
    */
  private def spread(v: Column): Column = {
    var x = v.bitwiseAND(lit((1L << Bits) - 1))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton code of (x, y) quantized over [xmin,xmax]×[ymin,ymax] into
    * 2^21 cells per axis. Out-of-range values clamp to the edge cells;
    * clamping happens in DOUBLE space before the long cast so far-out or
    * NaN inputs cannot trip Spark 4's default-ANSI cast overflow. A
    * degenerate axis (hi == lo, e.g. all points on one line) maps to
    * cell 0 instead of dividing by zero.
    */
  def zorder(x: Column, y: Column,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Column = {
    val cells = (1L << Bits) - 1
    def quant(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else {
        val scaled = (c - lit(lo)) / lit(hi - lo) * lit(cells.toDouble)
        // nanvl: a NaN coordinate (degenerate geometry) lands in cell 0
        floor(least(greatest(nanvl(scaled, lit(0.0)), lit(0.0)), lit(cells.toDouble)))
          .cast("long")
      }
    spread(quant(x, xmin, xmax))
      .bitwiseOR(shiftleft(spread(quant(y, ymin, ymax)), 1))
  }
}
