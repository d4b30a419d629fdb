package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd special functions with PINNED formulas.
  *
  * Spark ships no lgamma/erfc, and calling a library one would break
  * the cross-engine replay contract: the DuckDB oracle would evaluate
  * ITS libm's implementation and the two would disagree in ulps that
  * survive aggregation. So these are literal-coefficient rational
  * approximations — Numerical Recipes `gammln` (6-term Lanczos,
  * |rel err| < 2e-10) and `erfcc` (Chebyshev, |err| < 1.2e-7) — whose
  * exact arithmetic SHAPE is inlined identically in the oracle SQL:
  * both engines run the same IEEE-double operation sequence, so
  * results are bit-identical (the [[graft.operators.Eval.sprt]]
  * literal-rational-ln discipline extended to special functions).
  * Both are plain scalar kernels inside whole-stage codegen. */
object FastMath {

  /** NR gammln: ln Γ(x) for x > 0. */
  def lgammaValue(xx: Double): Double = {
    val x = xx
    var tmp = x + 5.5
    tmp -= (x + 0.5) * Math.log(tmp)
    var ser = 1.000000000190015
    ser += 76.18009172947146 / (x + 1.0)
    ser += -86.50532032941677 / (x + 2.0)
    ser += 24.01409824083091 / (x + 3.0)
    ser += -1.231739572450155 / (x + 4.0)
    ser += 0.1208650973866179e-2 / (x + 5.0)
    ser += -0.5395239384953e-5 / (x + 6.0)
    -tmp + Math.log(2.5066282746310005 * ser / x)
  }

  /** NR erfcc: erfc(z), all z. */
  def erfcValue(z: Double): Double = {
    val t = 1.0 / (1.0 + 0.5 * Math.abs(z))
    val ans = t * Math.exp(-z * z - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
        t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
          t * (-0.82215223 + t * 0.17087277)))))))))
    if (z >= 0.0) ans else 2.0 - ans
  }

  def lgamma(x: Column): Column =
    GraftShim.column(LgammaExpr(GraftShim.expression(x)))

  def erfc(x: Column): Column =
    GraftShim.column(ErfcExpr(GraftShim.expression(x)))
}

/** double x -> ln Γ(x) (NR gammln; caller guarantees x > 0). */
case class LgammaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_lgamma"

  override protected def nullSafeEval(input: Any): Any =
    FastMath.lgammaValue(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastMath.lgammaValue($c)")

  override protected def withNewChildInternal(newChild: Expression): LgammaExpr =
    copy(child = newChild)
}

/** double z -> erfc(z) (NR erfcc). */
case class ErfcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_erfc"

  override protected def nullSafeEval(input: Any): Any =
    FastMath.erfcValue(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastMath.erfcValue($c)")

  override protected def withNewChildInternal(newChild: Expression): ErfcExpr =
    copy(child = newChild)
}
