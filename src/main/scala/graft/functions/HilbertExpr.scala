package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of two 16-bit quantized coordinates — the
  * locality-superior sibling of [[graft.operators.ZOrder.zValue]]'s
  * Morton interleave: the Z curve takes a long diagonal jump every time
  * a high bit flips (adjacent z-range buckets can span half the (a, b)
  * domain on one axis), while the Hilbert curve is CONTINUOUS — every
  * step moves one cell — so equal-index ranges have provably tighter
  * bounding boxes (Moon et al. 2001), which is exactly what min/max
  * file-statistics pruning buys from. Same engine-native contract:
  * the index is just a sort key for `repartitionByRange` + write.
  *
  * The xy→d transform is the classic 16-round bit walk (per-round
  * quadrant digit + reflect/transpose rotation) in pure integer
  * arithmetic — a cross-engine oracle replays it round-for-round as an
  * integer fold. Implemented as a codegen Expression (one tight loop
  * inside whole-stage codegen; a HOF formulation would be interpreted
  * AND trip multi-field-fold hazards in replay engines). */
object Hilbert {

  /** d in [0, 2^32) for x, y in [0, 65536). The standard iterative
    * Hilbert xy→d: per scale bit s, the quadrant digit (3·rx)⊕ry
    * weights s², then the lower quadrant reflects/transposes. */
  def hilbertD(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 32768L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertValue(a16: Column, b16: Column): Column =
    GraftShim.column(HilbertD2Expr(
      GraftShim.expression(a16), GraftShim.expression(b16)))
}

/** (long, long) -> Hilbert d (long); inputs must already be quantized
  * to [0, 65536) ([[graft.operators.ZOrder.quantize16]]). */
case class HilbertD2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_d"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hilbert.hilbertD(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.Hilbert.hilbertD($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertD2Expr =
    copy(left = newLeft, right = newRight)
}
