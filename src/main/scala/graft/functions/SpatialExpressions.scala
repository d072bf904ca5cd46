package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index as a native codegen expression.
  *
  * [[graft.operators.ZOrder.zValue]] (Morton) interleaves bits — cheap,
  * but a Morton walk JUMPS at power-of-two boundaries, so a range of
  * Morton values can cover a spatially ragged region. The Hilbert curve
  * is the locality-optimal space-filling order: CONSECUTIVE indexes are
  * always grid-adjacent (spec-verified bijective + unit-step on the
  * full 32×32 grid), which tightens per-file min/max bounding boxes
  * when range-clustering a layout by the index — the reason
  * Delta/Iceberg added `ZORDER BY` alternatives on Hilbert.
  *
  * The map is the classic per-level rotate/flip recurrence, flipping
  * within the FULL grid (`n−1−x`, the Wikipedia variant) so x/y stay in
  * `[0, 2^bits)` at every step — no negative intermediates, which keeps
  * the SQL oracle free of cross-engine two's-complement questions (the
  * flip-within-quadrant variant is an equally valid Hilbert curve but
  * walks through negative x mid-recurrence). `bits` fixed iterations of
  * pure long arithmetic per row, one static call inside whole-stage
  * codegen — the data-dependent swap/flip makes it inexpressible as
  * z1's flat bitwise-OR column tree, hence an Expression rather than a
  * Column composition. Inputs must already lie in `[0, 2^bits)`
  * (callers bucket/rank first, as for zValue).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, "bits in 1..31 (d fits a long)")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  protected override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.compute(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertIndex.compute($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** xy → d on the 2^bits × 2^bits grid; inputs outside the grid are
    * masked into it (defensive — callers bucket first). */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    val mask = n - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Column-level entry points for the spatial-index expressions. */
object SpatialExpressions {
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expr(x.cast("long")),
      ColumnBridge.expr(y.cast("long")), bits))
}
