package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Holt double exponential smoothing — the level+trend forecaster
  * (Holt 1957): l_t = α·x_t + (1−α)·(l_{t−1}+b_{t−1}),
  * b_t = β·(l_t−l_{t−1}) + (1−β)·b_{t−1}, forecast x̂_{n+h} = l_n+h·b_n.
  * The capacity-planning companion to [[ChangePoint]]: CUSUM says a
  * series SHIFTED; this says where it is heading — the h-periods-out
  * volume estimate a pipeline uses to pre-provision shards or flag a
  * source whose projected volume leaves its quota.
  *
  * Scale shape: input is a (key, period, value) census (row-scale
  * aggregation upstream), so state is one sorted per-key series,
  * bounded by periods. The recurrence folds IN PERIOD ORDER via the
  * aggregate HOF with a two-field (l, b) state. Replay note: unlike
  * the single-overwritten-field CUSUM state, (l, b) are MUTUALLY
  * coupled (b_t reads both the new l_t and the old l_{t−1}), and
  * DuckDB's list_reduce evaluates struct fields against an in-place
  * accumulator — no field order is safe. The cross-engine oracle is
  * therefore a recursive CTE (one row per fold step, previous-row
  * reads are immutable by SQL semantics), which replays the identical
  * double sequence. */
object Forecast {

  /** Per-key Holt summary: (key, n_obs, level, trend, forecast) with
    * `forecast` = level + horizon·trend. Initial state after the first
    * element is (l=x₁, b=0) — reachable as step(zero-state, x₁) with
    * zero = (0, 0) because α·x + (1−α)·0 = α·x only when the zero
    * state is literally (l=0, b=0) and the first step uses α=1; instead
    * the fold seeds l with x₁ DIRECTLY by folding the TAIL: element 1
    * maps to the seed struct, elements 2..n run the recurrence —
    * exactly DuckDB list_reduce's no-initial-accumulator shape. Ord
    * values compare as strings — zero-padded period labels (ISO dates)
    * are the contract. */
  def holtSummary(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, alpha: Double, beta: Double, horizon: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"smoothing parameters out of range: alpha=$alpha beta=$beta")
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(col(ordCol).cast("string").as("o"),
          col(valueCol).cast("double").as("x")))).as("__series"))
    // Spark's aggregate() needs an explicit zero, so the seed trick is:
    // zero = (l=NaN, b=0); the step treats an NaN level as "first
    // element" and emits (x, 0). NaN never arises from real arithmetic
    // here (inputs are finite census values), so the sentinel is safe,
    // and DuckDB replays the identical branch via isnan().
    val lNext = s"IF(isnan(acc.l), e.x, $alpha * e.x + ${1 - alpha} * (acc.l + acc.b))"
    val fold =
      s"""aggregate(__series,
         |  struct(CAST('NaN' AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b),
         |  (acc, e) -> struct(
         |    $lNext AS l,
         |    IF(isnan(acc.l), CAST(0.0 AS DOUBLE),
         |       $beta * (($lNext) - acc.l) + ${1 - beta} * acc.b) AS b))""".stripMargin
    g.withColumn("__f", expr(fold))
      .select(col(keyCol), col("n_obs"),
        col("__f.l").as("level"), col("__f.b").as("trend"),
        (col("__f.l") + lit(horizon.toDouble) * col("__f.b")).as("forecast"))
  }

  /** MASE — mean absolute scaled error (Hyndman & Koehler 2006): the
    * forecast-accuracy number that is comparable ACROSS series of
    * different scales, where MAPE explodes at zeros and raw MAE can't
    * rank. MASE = MAE(forecast) / MAE(naive one-step), so < 1 means
    * "beats carrying yesterday forward" — THE bar any deployed
    * forecast ([[holtSummary]], a seasonal-naive, a model) must clear.
    * Convention (documented): the naive denominator runs over the SAME
    * evaluated window's successive actuals — the comparison both
    * series can always furnish — not a separate training window.
    *
    * Exactness: with integer actuals/forecasts, num = Σ|y−ŷ| (n
    * terms) and den = Σ|y_t − y_{t−1}| (n−1 terms) are exact integer
    * sums, and MASE = (num·(n−1)) / (den·n) is ONE correctly-rounded
    * division of exact decimals. Null when n < 2 or the naive
    * denominator is 0 (a constant series makes every nonzero error
    * infinitely bad — loud, not ∞). Rows where either side is null
    * are excluded and counted.
    *
    * Ordering contract: rows order by `ordCol`'s NATIVE type within
    * each key (the [[graft.operators.Autocorr.acf]] convention — no
    * string-cast ordering hazard). Scale shape: one per-key window
    * pass at row scale, then a key census. Output: (key, n,
    * n_skipped, mae_num, naive_num, mase). */
  def mase(df: DataFrame, keyCol: String, ordCol: String,
      actualCol: String, forecastCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(actualCol).cast("long").as("y"),
      col(forecastCol).cast("long").as("f"))
    val skipped = base
      .groupBy(col("k"))
      .agg(sum(when(col("y").isNull || col("f").isNull, 1L).otherwise(0L))
        .as("n_skipped"))
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val lagged = base.where(col("y").isNotNull && col("f").isNotNull)
      .withColumn("__prev", lag(col("y"), 1).over(w))
    val sums = lagged.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sum(abs(col("y") - col("f")).cast(dec)).cast(dec).as("mae_num"),
      sum(when(col("__prev").isNotNull,
        abs(col("y") - col("__prev")).cast(dec)).otherwise(lit(0).cast(dec)))
        .cast(dec).as("naive_num"))
    sums.join(skipped, "k")
      .select(col("k"), col("n"), col("n_skipped"),
        col("mae_num").cast("long").as("mae_num"),
        col("naive_num").cast("long").as("naive_num"),
        when(col("n") >= 2L && col("naive_num") > lit(0).cast(dec),
          (col("mae_num") * (col("n") - 1L).cast(dec)).cast(dec)
            .cast("double") /
            (col("naive_num") * col("n").cast(dec)).cast(dec)
              .cast("double")).as("mase"))
  }
}
