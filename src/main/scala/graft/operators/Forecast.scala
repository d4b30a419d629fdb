package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Holt–Winters ADDITIVE seasonal smoothing (Winters 1960) —
    * [[holtSummary]] plus a length-`period` seasonal state, the
    * forecaster for the strongly day-of-week-shaped volumes Holt's
    * straight line systematically laps:
    *   l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(x_t − l_t) + (1−γ)s_{t−m}
    * Pinned initialization (two-season classic, the oracle replays
    * it): l₀ = mean of season 1; b₀ = (Σ season 2 − Σ season 1)/m²;
    * s⁰_j = x_j − l₀; the recurrence starts at t = m+1. Keys with
    * n < 2m emit null state (loud, not silently unseasonal).
    * Forecast: x̂_{n+h} = l_n + h·b_n + s_n[(n+h−1) mod m + 1].
    *
    * Replay note: the three states are mutually coupled (the
    * [[holtSummary]] hazard, squared), so the DuckDB oracle is a
    * recursive CTE; Spark's aggregate() lambda reads only the
    * immutable acc, so the struct fold here is safe, with l_t
    * re-derived textually wherever b_t/s_t need it. The seasonal
    * vector updates ONE slot per step via an index-matched transform.
    *
    * Scale shape: one per-key census collect bounded by periods; the
    * fold is O(n·m) per key on period-grain data. Output: (key, n_obs,
    * level, trend, seasonal, forecast). */
  def holtWintersSummary(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, period: Int, alpha: Double, beta: Double,
      gamma: Double, horizon: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1 &&
      gamma >= 0 && gamma <= 1,
      s"smoothing parameters out of range: alpha=$alpha beta=$beta gamma=$gamma")
    val m = period
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(col(ordCol).cast("string").as("o"),
          col(valueCol).cast("double").as("x")))).as("__series"))
      .withColumn("__xs", expr("transform(__series, e -> e.x)"))
    val sum1 = s"aggregate(slice(__xs, 1, $m), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    val sum2 = s"aggregate(slice(__xs, ${m + 1}, $m), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    val withInit = g
      .withColumn("__l0", expr(s"$sum1 / $m.0D"))
      .withColumn("__b0", expr(s"($sum2 - $sum1) / ${m * m}.0D"))
      .withColumn("__s0", expr(s"transform(slice(__xs, 1, $m), v -> v - __l0)"))
    val lNext = s"($alpha * (x - element_at(acc.s, (acc.t % $m) + 1))" +
      s" + ${1 - alpha} * (acc.l + acc.b))"
    val fold =
      s"""aggregate(slice(__xs, ${m + 1}, CAST(n_obs - $m AS INT)),
         |  named_struct('l', __l0, 'b', __b0, 's', __s0,
         |               't', CAST($m AS INT)),
         |  (acc, x) -> named_struct(
         |    'l', $lNext,
         |    'b', $beta * (($lNext) - acc.l) + ${1 - beta} * acc.b,
         |    's', transform(acc.s, (v, j) -> IF(j = (acc.t % $m),
         |      $gamma * (x - ($lNext)) + ${1 - gamma} * v, v)),
         |    't', acc.t + 1))""".stripMargin
    val fPos = s"CAST((n_obs + $horizon - 1) % $m AS INT) + 1"
    withInit
      .withColumn("__f", when(col("n_obs") >= 2L * m, expr(fold)))
      .select(col(keyCol), col("n_obs"),
        col("__f.l").as("level"), col("__f.b").as("trend"),
        expr(s"element_at(__f.s, $fPos)").as("seasonal"),
        (col("__f.l") + lit(horizon.toDouble) * col("__f.b") +
          expr(s"element_at(__f.s, $fPos)")).as("forecast"))
  }

  /** Croston's method (Croston 1972) per key — the forecaster for
    * INTERMITTENT demand, where [[holtSummary]] fed mostly-zero series
    * smears everything toward zero: smooth the nonzero demand sizes
    * z and the inter-demand intervals p SEPARATELY (updates happen
    * only on demand days), and forecast the demand RATE z/p. The
    * per-entity activity/consumption planner for sparse keys (a user
    * active 9 days out of 90, a part ordered twice a quarter).
    *
    * Pinned conventions (oracle-replayed): input is the ACTIVE-day
    * census (key, day, size); intervals are day gaps between
    * consecutive active days; z seeds at the first demand's size, p at
    * the FIRST interval (so both are defined from the second demand),
    * and both then update with the same α. Keys with fewer than 2
    * demands emit null p/rate — loud, not a fabricated rate. The two
    * states never read each other, so the fold is list_reduce-safe
    * field-for-field (unlike the coupled Holt pair).
    *
    * Scale shape: one per-key window pass for the gap, one sorted
    * census collect bounded by active days. Output: (key, n_demands,
    * z, p, rate). */
  def croston(df: DataFrame, keyCol: String, dayCol: String,
      sizeCol: String, alpha: Double = 0.2): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__d"))
    val gapped = df.select(col(keyCol), col(dayCol).cast("date").as("__d"),
      col(sizeCol).cast("double").as("__x"))
      .withColumn("__q",
        datediff(col("__d"), lag(col("__d"), 1).over(w)).cast("double"))
    val g = gapped.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_demands"),
        sort_array(collect_list(struct(col("__d").cast("string").as("o"),
          col("__x").as("x"), col("__q").as("q")))).as("__series"))
    val fold =
      s"""aggregate(__series,
         |  struct(CAST('NaN' AS DOUBLE) AS z, CAST('NaN' AS DOUBLE) AS p),
         |  (acc, e) -> struct(
         |    IF(isnan(acc.z), e.x, $alpha * e.x + ${1 - alpha} * acc.z) AS z,
         |    IF(e.q IS NULL, acc.p,
         |       IF(isnan(acc.p), e.q, $alpha * e.q + ${1 - alpha} * acc.p))
         |      AS p))""".stripMargin
    g.withColumn("__f", expr(fold))
      .select(col(keyCol), col("n_demands"),
        when(!isnan(col("__f.z")), col("__f.z")).as("z"),
        when(!isnan(col("__f.p")), col("__f.p")).as("p"),
        when(!isnan(col("__f.p")) && col("__f.p") =!= 0.0,
          col("__f.z") / col("__f.p")).as("rate"))
  }

  /** Local-level Kalman filter per key (Harvey 1989's structural
    * "level + noise" model — the optimal exponential smoother whose
    * gain ADAPTS instead of being hand-picked like [[holtSummary]]'s
    * alpha): per observation z,
    *   P⁻ = P + Q,  K = P⁻/(P⁻ + R),  x ← x + K(z − x),  P ← (1−K)P⁻,
    * seeded at x = z₁, P = p0. The steady-state K it converges to IS
    * the "right alpha" for the series' signal-to-noise ratio — the
    * principled answer to the smoothing-parameter folklore question.
    * Emits the final state per key: the filtered level, its variance,
    * and the converged gain.
    *
    * Determinism: the recursion is a fixed-shape double fold over the
    * (ord, value)-sorted series (the q237/q40 in-order contract); Q, R
    * and p0 are caller literals. The struct-field order (k, x, p) is
    * chosen so no field reads an accumulator field recomputed earlier
    * in the same step — the DuckDB list_reduce aliasing rule (q40
    * note). Ordering contract: `ordCol` compares AS STRINGS —
    * zero-padded labels (the [[holtSummary]] contract).
    *
    * Scale shape: one key-partitioned collect of the series census
    * (periods per key, never row scale) + an O(n) per-key fold.
    * Output: (key, n_obs, level, p_var, gain); single-observation
    * keys report the seed. */
  /** [[kalmanLevel]] from an existing (key, period, cents) census — the
    * consumer side of [[graft.streaming.Streams.kalmanCensusStream]]:
    * the stream maintains only the bounded integer census, and this
    * turns any prefix of it into the identical filtered state the
    * batch operator produces on the same rows (z = cents/100, one
    * pinned division per period). */
  def kalmanLevelFromCensus(census: DataFrame, keyCol: String,
      ordCol: String, centsCol: String, q: Double, r: Double,
      p0: Double): DataFrame =
    kalmanLevel(
      census.withColumn("__z",
        col(centsCol).cast("double") / 100.0),
      keyCol, ordCol, "__z", q, r, p0)

  def kalmanLevel(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, q: Double, r: Double, p0: Double): DataFrame = {
    require(q >= 0 && r > 0 && p0 >= 0,
      s"variances out of range: q=$q r=$r p0=$p0")
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(col(ordCol).cast("string").as("o"),
          col(valueCol).cast("double").as("x")))).as("__series"))
    val fold =
      s"""aggregate(slice(__series, 2, size(__series) - 1),
         |  struct(CAST(0.0 AS DOUBLE) AS k,
         |    CAST(element_at(__series, 1).x AS DOUBLE) AS x,
         |    CAST($p0 AS DOUBLE) AS p),
         |  (acc, e) -> struct(
         |    (acc.p + $q) / (acc.p + $q + $r) AS k,
         |    acc.x + ((acc.p + $q) / (acc.p + $q + $r)) * (e.x - acc.x)
         |      AS x,
         |    (1.0 - (acc.p + $q) / (acc.p + $q + $r)) * (acc.p + $q)
         |      AS p))""".stripMargin
    g.withColumn("__f", expr(fold))
      .select(col(keyCol), col("n_obs"),
        col("__f.x").as("level"), col("__f.p").as("p_var"),
        col("__f.k").as("gain"))
  }

  /** Diebold–Mariano forecast-comparison test (Diebold & Mariano 1995)
    * per key — the referee between two forecasters [[mase]] cannot be:
    * MASE scores ONE forecast against a baseline; DM asks whether the
    * LOSS DIFFERENTIAL d_t = L1_t − L2_t of two forecasts is centered
    * at zero, with a Newey–West (Bartlett) variance that respects the
    * serial correlation h-step-ahead forecast errors always carry:
    *   DM = d̄ / √(σ̂²/n),   σ̂² = ĉ₀ + 2·Σ_{j=1}^{h−1}(1 − j/h)·ĉ_j.
    *
    * Exactness: losses are integer (cents / absolute-error units), so
    * every autocovariance block rides the [[Autocorr.acf]] exact-integer
    * identity n³·ĉ_j = n²·Σ'd_t·d_{t−j} − n·S·(H_j+T_j) + (n−j)·S²
    * (S = Σd, H/T the head/tail partial sums) — all decimal-exact; the
    * n's cancel algebraically so the statistic is ONE fixed float
    * shape: DM = S·n / √(n·(C₀ + 2Σw_j·C_j)) with C_j the exact
    * decimal blocks and w_j literal Bartlett weights, folded in j
    * order (j ≤ h−1, a compile-time constant).
    *
    * Scale shape: one key-partitioned lag window (all h−1 lags share
    * one frame), one census aggregation, broadcast-size arithmetic.
    * Output per key: (key, n, mean_d, dm); dm null when the variance
    * term is ≤ 0 or n ≤ h. Sign: negative DM favors forecast 1. */
  def dieboldMariano(df: DataFrame, keyCol: String, ordCol: String,
      loss1Col: String, loss2Col: String, h: Int): DataFrame = {
    require(h >= 1 && h <= 8, s"h must be in [1, 8]: $h")
    val dec = "decimal(38,0)"
    def d(c: Column): Column = c.cast(dec)
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val base0 = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
        (col(loss1Col).cast("long") - col(loss2Col).cast("long")).as("d"))
      .where(col("d").isNotNull)
    val lagged = (1 until h).foldLeft(base0) { case (acc, j) =>
      acc.withColumn(s"dl$j", lag(col("d"), j).over(w))
    }
    val aggs = Seq(count(lit(1)).as("n"), sum(d(col("d"))).cast(dec).as("s"),
      sum((d(col("d")) * d(col("d"))).cast(dec)).cast(dec).as("q")) ++
      (1 until h).flatMap { j =>
        Seq(
          sum(when(col(s"dl$j").isNotNull,
            (d(col("d")) * d(col(s"dl$j"))).cast(dec))
            .otherwise(d(lit(0L)))).cast(dec).as(s"x$j"),
          // head: the lagged value over pairs = first n-j d's;
          // tail: the current value over pairs = last n-j d's
          sum(when(col(s"dl$j").isNotNull, d(col(s"dl$j")))
            .otherwise(d(lit(0L)))).cast(dec).as(s"hd$j"),
          sum(when(col(s"dl$j").isNotNull, d(col("d")))
            .otherwise(d(lit(0L)))).cast(dec).as(s"tl$j"))
      }
    val g = lagged.groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    def dd(c: Column): Column = c.cast("double")
    val nD = d(col("n"))
    // C_0 = n·Σd² − S²  (the j=0 block with H=T=S, n−0 pairs: the n's
    // reduce to the familiar variance numerator)
    val c0 = (nD * col("q") - col("s") * col("s")).cast(dec)
    // C_j = n²Σ' − nS(H+T) + (n−j)S², each exact decimal
    def cj(j: Int): Column =
      ((nD * nD * col(s"x$j")).cast(dec) -
        (nD * col("s") * (col(s"hd$j") + col(s"tl$j")).cast(dec)).cast(dec) +
        ((nD - lit(j)) * col("s") * col("s")).cast(dec)).cast(dec)
    // σ̂²·n⁴ = n²·C0 + 2Σ w_j·C_j... the exact algebra: ĉ0 = C0/n²,
    // ĉ_j = C_j/n³ → σ̂² = C0/n² + 2Σw_j C_j/n³; DM = (S/n)/√(σ̂²/n)
    //   = S·n / √(n³·σ̂²) = S·n / √(n·C0 + 2Σ w_j·C_j)
    val varTerm = (1 until h).foldLeft(dd((nD * c0).cast(dec))) {
      case (acc, j) =>
        acc + lit(2.0 * (1.0 - j.toDouble / h)) * dd(cj(j))
    }
    g.select(col("k"), col("n"),
      (dd(col("s")) / dd(col("n"))).as("mean_d"),
      when(col("n") > h && varTerm > 0.0,
        dd(col("s")) * dd(col("n")) / sqrt(varTerm)).as("dm"))
  }
}
