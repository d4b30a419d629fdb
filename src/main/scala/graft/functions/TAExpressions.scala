package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd kernels for the recursive technical indicators.
  *
  * The declarative forms in [[graft.ta.TA]] are higher-order `aggregate`
  * folds — exact but interpreted (Catalyst HOFs are CodegenFallback, the
  * same trap measured for minhash and cosine). These loops compute the
  * IDENTICAL recursions in the IDENTICAL left-to-right accumulation order,
  * so results are bit-identical doubles (cross-check-tested in TASpec).
  *
  * Recursion contracts (pandas parity, enrichment-trigger/main.py:335-348):
  *  - EMA, ewm(span, adjust=False): ema_0 = x_0;
  *    ema_t = alpha*x_t + (1-alpha)*ema_{t-1}
  *  - RSI(n), Wilder: seed avg gain/loss = mean of first n diffs' parts;
  *    then rma_t = (rma_{t-1}*(n-1) + x_t)/n; RSI = 100 - 100/(1+AG/AL);
  *    null when fewer than n diffs, 100 when AL == 0.
  */
object FastTA {

  /** EMA of the last element; NaN on an empty array (the declarative
    * fold's NaN seed), matching [[graft.ta.TA.emaOverList]]. */
  def emaLastValue(arr: ArrayData, alpha: Double): Double = {
    val m = arr.numElements()
    var acc = Double.NaN
    var i = 0
    while (i < m) {
      val x = arr.getDouble(i)
      acc = if (java.lang.Double.isNaN(acc)) x else alpha * x + (1 - alpha) * acc
      i += 1
    }
    acc
  }

  /** Wilder RSI(n) of the last element; null when fewer than n diffs. */
  def rsiLastValue(arr: ArrayData, n: Int): Any = {
    val m = arr.numElements()
    if (m - 1 < n) return null
    var sumG = 0.0
    var sumL = 0.0
    var i = 1
    while (i <= n) {
      val d = arr.getDouble(i) - arr.getDouble(i - 1)
      sumG += (if (d > 0) d else 0.0)
      sumL += (if (d < 0) -d else 0.0)
      i += 1
    }
    var ag = sumG / n
    var al = sumL / n
    while (i < m) {
      val d = arr.getDouble(i) - arr.getDouble(i - 1)
      ag = (ag * (n - 1) + (if (d > 0) d else 0.0)) / n
      al = (al * (n - 1) + (if (d < 0) -d else 0.0)) / n
      i += 1
    }
    if (al == 0) 100.0 else 100.0 - 100.0 / (1.0 + ag / al)
  }

  def emaLast(ordered: Column, n: Int): Column =
    GraftShim.column(EmaLastExpr(GraftShim.expression(ordered), 2.0 / (n + 1)))

  def rsiLast(ordered: Column, n: Int): Column =
    GraftShim.column(RsiLastExpr(GraftShim.expression(ordered), n))
}

/** array<double> ordered closes -> EMA of the final element. */
case class EmaLastExpr(child: Expression, alpha: Double) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ema_last"

  override protected def nullSafeEval(input: Any): Any =
    FastTA.emaLastValue(input.asInstanceOf[ArrayData], alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastTA.emaLastValue($c, $alpha)")

  override protected def withNewChildInternal(newChild: Expression): EmaLastExpr =
    copy(child = newChild)
}

/** array<double> ordered closes -> Wilder RSI(n) of the final element. */
case class RsiLastExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rsi_last"

  override protected def nullSafeEval(input: Any): Any =
    FastTA.rsiLastValue(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object r = graft.functions.FastTA.rsiLastValue($c, $n);
         |${ev.isNull} = r == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : ((Double) r).doubleValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RsiLastExpr =
    copy(child = newChild)
}
