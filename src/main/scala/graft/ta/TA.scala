package graft.ta

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Technical-indicator library (SURVEY.md §2.5, W1-W13).
  *
  * Rolling indicators (SMA / Bollinger / extrema / OBV) are plain Catalyst
  * window functions — they shuffle once on the partition key and stay in
  * whole-stage codegen. Recursive indicators (EMA / RSI / ATR Wilder
  * smoothing) have no closed-form Catalyst window; they are expressed as a
  * higher-order `aggregate` fold over a bounded `collect_list`, which is
  * exact and partition-local (one shuffle on the key, no driver collect).
  * At 100 TB per-key history length is the bound that matters, not row
  * count — per-ticker daily bars are O(10^3) (reference lookback: 420 days,
  * enrichment-trigger/main.py:309-310), far below any memory concern.
  *
  * Reference behaviors: enrichment-trigger/main.py:335-348 (pandas_ta
  * defaults), 364-370 (swing extrema).
  */
object TA {

  /** Standard keyed, time-ordered window. */
  def keyed(key: String, ord: String): WindowSpec =
    Window.partitionBy(key).orderBy(ord)

  /** W1 simple moving average over the trailing n rows (null until n rows,
    * matching pandas `rolling(n).mean()` min_periods=n). */
  def sma(c: Column, n: Int, w: WindowSpec): Column = {
    val frame = w.rowsBetween(-(n - 1), 0)
    when(count(c).over(frame) >= n, avg(c).over(frame))
  }

  /** W6 Bollinger middle/upper/lower (rolling mean +- k * sample stddev). */
  def bollinger(c: Column, n: Int, k: Double, w: WindowSpec): (Column, Column, Column) = {
    val frame = w.rowsBetween(-(n - 1), 0)
    val mid = when(count(c).over(frame) >= n, avg(c).over(frame))
    val sd  = when(count(c).over(frame) >= n, stddev_samp(c).over(frame))
    (mid, mid + lit(k) * sd, mid - lit(k) * sd)
  }

  /** W8 rolling extrema over trailing n rows. */
  def rollingMax(c: Column, n: Int, w: WindowSpec): Column =
    max(c).over(w.rowsBetween(-(n - 1), 0))
  def rollingMin(c: Column, n: Int, w: WindowSpec): Column =
    min(c).over(w.rowsBetween(-(n - 1), 0))

  /** W5 on-balance volume: running sum of sign(close - prev_close) * volume. */
  def obv(close: Column, volume: Column, w: WindowSpec): Column = {
    val prev = lag(close, 1).over(w)
    val signed = when(prev.isNull, lit(0.0))
      .when(close > prev, volume)
      .when(close < prev, -volume)
      .otherwise(lit(0.0))
    sum(signed).over(w.rowsBetween(Window.unboundedPreceding, 0))
  }

  /** Exponential moving average, pandas `ewm(span=n, adjust=false)` seeding:
    * ema_0 = x_0; ema_t = alpha*x_t + (1-alpha)*ema_{t-1}, alpha = 2/(n+1).
    *
    * Implemented as an `aggregate` higher-order fold over the ordered list
    * of values per key — exact recursion, no UDF, codegen-evaluated.
    * Input: a DataFrame-side expression producing `collect_list` ordered by
    * the window; use [[emaOverList]] on a pre-collected ordered array.
    */
  def emaOverList(ordered: Column, n: Int): Column =
    graft.functions.FastTA.emaLast(ordered, n) // codegen'd; HOF fold below is the cross-check

  /** Declarative HOF formulation (interpreted) — value-identical to
    * [[emaOverList]]; retained for fast-vs-declarative cross-checks. */
  private[graft] def emaOverListDeclarative(ordered: Column, n: Int): Column = {
    val alpha = 2.0 / (n + 1)
    aggregate(
      ordered,
      lit(Double.NaN),
      (acc, x) => when(isnan(acc), x).otherwise(lit(alpha) * x + lit(1 - alpha) * acc))
  }

  // NOTE: recursive indicators here return only the LAST value per key —
  // the reference consumes only the latest indicator row (W9,
  // enrichment-trigger/main.py:351). A full EMA *series* has no linear
  // Catalyst formulation (array-concat folds are O(n^2) per key); when a
  // series is needed at minute-bar scale, write a typed
  // flatMapSortedGroups kernel (Bracket.scala pattern) — O(n), one shuffle.

  /** W3 Wilder's RSI(n) over an ordered array of closes; returns the RSI of
    * the final bar. Wilder smoothing: first average = simple mean of the
    * first n gains/losses, then rma_t = (rma_{t-1}*(n-1) + x_t)/n.
    */
  def rsiLast(orderedCloses: Column, n: Int): Column =
    graft.functions.FastTA.rsiLast(orderedCloses, n) // codegen'd; see cross-check below

  /** Declarative HOF formulation (interpreted) — value-identical to
    * [[rsiLast]]; retained for fast-vs-declarative cross-checks. */
  private[graft] def rsiLastDeclarative(orderedCloses: Column, n: Int): Column = {
    val diffs = zip_with(
      slice(orderedCloses, 2, 1000000),
      slice(orderedCloses, lit(1), size(orderedCloses) - 1),
      (cur, prev) => cur - prev)
    val gains  = transform(diffs, d => when(d > 0, d).otherwise(lit(0.0)))
    val losses = transform(diffs, d => when(d < 0, -d).otherwise(lit(0.0)))
    val avgGain = wilderLast(gains, n)
    val avgLoss = wilderLast(losses, n)
    when(size(diffs) < n, lit(null))
      .when(avgLoss === 0, lit(100.0))
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss))
  }

  /** Wilder RMA of the last element: seed = mean of first n values, then
    * rma = (prev*(n-1) + x)/n over the remainder. */
  def wilderLast(ordered: Column, n: Int): Column = {
    val seed = aggregate(slice(ordered, 1, n), lit(0.0), (a, x) => a + x) / n
    val rest = slice(ordered, n + 1, 1000000)
    aggregate(rest, seed, (acc, x) => (acc * (n - 1) + x) / n)
  }

  /** W7 ATR(n): true range Wilder-smoothed; takes ordered arrays of
    * high/low/close and returns the final ATR. TR uses the prior close:
    * max(h-l, |h-pc|, |l-pc|); first bar TR = h-l.
    */
  def atrLast(highs: Column, lows: Column, closes: Column, n: Int): Column = {
    val m = size(closes)
    val prevCloses = slice(closes, lit(1), m - 1)
    val curHighs = slice(highs, 2, 1000000)
    val curLows  = slice(lows, 2, 1000000)
    val trTail = zip_with(
      zip_with(curHighs, curLows, (h, l) => struct(h.as("h"), l.as("l"))),
      prevCloses,
      (hl, pc) => greatest(
        hl.getField("h") - hl.getField("l"),
        abs(hl.getField("h") - pc),
        abs(hl.getField("l") - pc)))
    val firstTr = element_at(highs, 1) - element_at(lows, 1)
    val trs = concat(array(firstTr), trTail)
    when(m >= n + 1, wilderLast(trs, n))
  }

  /** W4 MACD(fast, slow, signal) of the final bar from ordered closes:
    * (macd, signal, histogram).
    *
    * One linear fold with a 3-field (signal, emaFast, emaSlow) accumulator
    * — the signal EMA recurses over macd values as they are produced, so
    * no intermediate EMA series is materialized (the previous formulation
    * built two full series via array concat: O(n^2) per key, wasteful at
    * minute-bar history lengths). Seeding matches pandas ewm(adjust=False):
    * ema_0 = x_0 on both EMAs, hence macd_0 = 0 = signal_0.
    */
  def macdLast(orderedCloses: Column, fast: Int = 12, slow: Int = 26, sig: Int = 9): Column = {
    val af = 2.0 / (fast + 1)
    val as_ = 2.0 / (slow + 1)
    val ag = 2.0 / (sig + 1)
    val x0 = element_at(orderedCloses, 1)
    val folded = aggregate(
      slice(orderedCloses, 2, 1000000),
      struct(lit(0.0).as("sig"), x0.cast("double").as("f"), x0.cast("double").as("s")),
      (acc, x) => {
        val f = lit(af) * x + lit(1 - af) * acc.getField("f")
        val s = lit(as_) * x + lit(1 - as_) * acc.getField("s")
        // dependent fields FIRST is a DuckDB list_reduce constraint only;
        // here each field is built from the same `acc` snapshot
        struct(
          (lit(ag) * (f - s) + lit(1 - ag) * acc.getField("sig")).as("sig"),
          f.as("f"), s.as("s"))
      })
    val macdL = folded.getField("f") - folded.getField("s")
    struct(macdL.as("macd"), folded.getField("sig").as("macd_signal"),
      (macdL - folded.getField("sig")).as("macd_hist"))
  }
}
