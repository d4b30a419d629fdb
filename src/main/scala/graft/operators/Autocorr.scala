package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serial-structure profiling of per-key period series: the
  * autocorrelation function (is yesterday's volume predictive of
  * today's — does the series carry momentum a seasonal-naive baseline
  * must model?) and the day-of-week seasonality profile (which weekday
  * lifts, and by how much). Both are the calibration inputs for the
  * drift monitors ([[ChangePoint]] assumes exchangeable residuals; a
  * strongly autocorrelated or seasonal series needs its baseline
  * removed first or every Monday alarms).
  *
  * Scale shape: inputs are (key, period, value) censuses — the
  * row-scale aggregation happens upstream — so all work here is
  * bounded by keys × periods. The ACF needs lagged pairs; those come
  * from ONE per-key window pass (`lag(x, k)` for every k shares the
  * same window frame) and an unpivot, never a self-join. All moment
  * sums are integer (the census values are longs), so the estimator
  * r_k = [n²·Σx_t·x_{t−k} − n·S·(H_k+T_k) + (n−k)·S²] / [n²·Σx² − n·S²]
  * is one exact-integer numerator and denominator per (key, lag) with
  * a single terminal division — no float folds to keep in order.
  */
object Autocorr {

  /** Per-key ACF at lags 1..maxLag over the series ordered by `ordCol`
    * (missing periods are skipped, not zero-filled: the series is the
    * OBSERVED census in period order — document the cadence upstream).
    * Values must be longs small enough that n²·Σx·x' fits a long
    * (n = periods per key; daily counts for years of data are fine).
    * Output: (key, lag, n_obs, n_pairs, r) with r the lag-k serial
    * correlation (denominator 0 → null r). */
  def acf(df: DataFrame, keyCol: String, ordCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val x = col(valueCol).cast("long")
    val lagged = (1 to maxLag).foldLeft(df.select(col(keyCol), col(ordCol),
      x.as("__x"))) { case (d, k) => d.withColumn(s"__l$k", lag(col("__x"), k).over(w)) }
    // unpivot the lag columns: one (key, lag, x_t, x_{t-k}) row per pair
    val stackArgs = (1 to maxLag)
      .map(k => s"CAST($k AS INT), __l$k").mkString(", ")
    val pairs = lagged
      .select(col(keyCol), col("__x"),
        expr(s"stack($maxLag, $stackArgs)").as(Seq("lag", "__xl")))
      .where(col("__xl").isNotNull)
    val perLag = pairs.groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x") * col("__xl")).as("__sxy"),
        sum(col("__xl")).as("__sh"),  // head of each pair (earlier period)
        sum(col("__x")).as("__st"))   // tail (later period)
    val totals = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"), sum(x).as("__s"),
        sum(x * x).as("__sxx"))
    val n = col("n_obs")
    val num = n * n * col("__sxy") - n * col("__s") * (col("__sh") + col("__st")) +
      (n - col("lag")) * col("__s") * col("__s")
    val den = n * n * col("__sxx") - n * col("__s") * col("__s")
    perLag.join(totals, keyCol)
      .select(col(keyCol), col("lag"), col("n_obs"), col("n_pairs"),
        when(den =!= 0L, num.cast("double") / den.cast("double")).as("r"))
  }

  /** Cross-correlation function between two aligned period series —
    * the lead/lag detector ("errors rise two days before purchases
    * fall"): r_k correlates x_t with y_{t+k} for k in −maxLag..maxLag,
    * so a peak at positive k says x LEADS y by k periods. [[acf]]'s
    * machinery with two series: one window pass produces every lag of
    * y (negative lags read x against y's past — computed as lags of
    * y against x's future via the same frames), and every moment is
    * an exact integer sum; r_k is one fixed-shape double expression
    * (numerator exact-int, denominator two sqrts).
    *
    * Input: one row per period with BOTH values (align and zero-fill
    * upstream — missing periods are a data decision, not this
    * operator's). Output: (lag, n_obs, n_pairs, r). */
  def ccf(df: DataFrame, ordCol: String, xCol: String, yCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.orderBy(col(ordCol))
    val base = df.select(col(ordCol), col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y"))
    // census-bounded global window: one series, periods rows
    def lcol(k: Int): String = if (k < 0) s"__lm${-k}" else s"__lp$k"
    val lagged = (-maxLag to maxLag).filter(_ != 0).foldLeft(base) {
      case (d, k) => d.withColumn(lcol(k), lag(col("__y"), -k).over(w))
    }
    val stackArgs = ((-maxLag to maxLag).filter(_ != 0)
      .map(k => s"CAST($k AS INT), ${lcol(k)}") :+ s"CAST(0 AS INT), __y")
      .mkString(", ")
    val nLags = 2 * maxLag + 1
    val pairs = lagged
      .select(col("__x"), col("__y"),
        expr(s"stack($nLags, $stackArgs)").as(Seq("lag", "__yl")))
      .where(col("__yl").isNotNull)
    val perLag = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x") * col("__yl")).as("__sxy"),
        sum(col("__x")).as("__sxh"), sum(col("__yl")).as("__syt"))
    val totals = base.agg(count(lit(1)).as("n_obs"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    val n = col("n_obs")
    val num = (n * n * col("__sxy") - n * col("__sy") * col("__sxh") -
      n * col("__sx") * col("__syt") +
      (n - abs(col("lag")).cast("long")) * col("__sx") * col("__sy"))
      .cast("double")
    val dx = (n * n * col("__sxx") - n * col("__sx") * col("__sx")).cast("double")
    val dy = (n * n * col("__syy") - n * col("__sy") * col("__sy")).cast("double")
    perLag.crossJoin(broadcast(totals))
      .select(col("lag"), col("n_obs"), col("n_pairs"),
        when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy))).as("r"))
  }

  /** Seasonally-adjusted anomaly extraction over a daily census: each
    * day's residual against ITS OWN weekday's mean (the
    * [[seasonalityProfile]] baseline applied), ranked per key by
    * |residual| — the "which days were genuinely unusual once Monday
    * is allowed to look like Monday" readout that a raw-threshold
    * monitor (or an unadjusted CUSUM) gets wrong on weekly-patterned
    * volume.
    *
    * Determinism: expected = total_dow/n_dow is ONE double division of
    * exact integers and residual ONE subtraction — bit-identical
    * cross-engine, so ranking on (|residual| desc, day asc) is a total
    * order both engines agree on without rounding tricks. Scale shape:
    * cell means are a dow-keyed aggregate of the census; the rank
    * window partitions by key over census rows. Output: (key, day,
    * value, expected, resid, rnk), rnk = 1..topK. */
  def seasonalAnomalies(df: DataFrame, keyCol: String, dayCol: String,
      dowCol: Column, valueCol: String, topK: Int): DataFrame = {
    val x = col(valueCol).cast("long")
    val base = df.select(col(keyCol), col(dayCol).as("day"),
      dowCol.as("__dw"), x.as("__x"))
    val cell = base.groupBy(col(keyCol), col("__dw"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__t"))
    val joined = base.join(cell, Seq(keyCol, "__dw"))
      .withColumn("expected", col("__t").cast("double") / col("__n").cast("double"))
      .withColumn("resid", col("__x").cast("double") - col("expected"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("resid")).desc, col("day").asc)
    joined.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(col(keyCol), col("day"), col("__x").as("value"),
        col("expected"), col("resid"), col("rnk").cast("long").as("rnk"))
  }

  /** Additive seasonal decomposition (STL-lite) over a daily census:
    * trend = centered 7-day moving mean (partial at the edges),
    * seasonal = per-weekday mean of the DETRENDED series, residual =
    * the rest — the decomposition that turns "volume moved" into
    * "trend moved / the weekly shape moved / a one-off happened",
    * which is what the anomaly operators ([[seasonalAnomalies]],
    * [[ChangePoint]]) should each consume.
    *
    * Determinism: the trend is Σx/count over a ROWS frame (exact
    * integer sum, one division); detrended values are one subtraction
    * each; the per-(key, dow) seasonal mean is a float sum of those
    * doubles, folded IN DAY ORDER (the q237 contract) then divided.
    * Scale shape: everything is keys × periods censuses. Output:
    * (key, ord, value, trend, seasonal, resid).
    *
    * Ordering contract: `ordCol` values compare AS STRINGS — pass
    * zero-padded period labels (ISO dates); a numeric ord mis-orders
    * lexically, so NumericType ord columns are REFUSED at plan build
    * ([[acf]] orders by the native type instead). */
  def seasonalDecompose(df: DataFrame, keyCol: String, ordCol: String,
      dowCol: Column, valueCol: String): DataFrame = {
    require(!df.schema(ordCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"seasonalDecompose: ordCol '$ordCol' is ${df.schema(ordCol).dataType}" +
        " — ord values compare AS STRINGS (\"10\" < \"2\"); zero-pad or " +
        "format to ISO period labels first")
    val w7 = Window.partitionBy(col(keyCol)).orderBy(col("__o"))
      .rowsBetween(-3, 3)
    val x = col(valueCol).cast("long")
    val trended = df
      .select(col(keyCol), col(ordCol).cast("string").as("__o"),
        dowCol.as("__dw"), x.as("__x"))
      .withColumn("trend",
        sum(col("__x")).over(w7).cast("double") /
          count(lit(1)).over(w7).cast("double"))
      .withColumn("__det", col("__x").cast("double") - col("trend"))
    val seasonal = trended
      .groupBy(col(keyCol), col("__dw"))
      .agg(count(lit(1)).as("__c"),
        sort_array(collect_list(struct(col("__o"), col("__det")))).as("__l"))
      .select(col(keyCol), col("__dw"),
        (expr("aggregate(__l, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.__det)") /
          col("__c").cast("double")).as("seasonal"))
    trended.join(seasonal, Seq(keyCol, "__dw"))
      .select(col(keyCol), col("__o").as(ordCol), col("__x").as("value"),
        col("trend"), col("seasonal"),
        (col("__det") - col("seasonal")).as("resid"))
  }

  /** Day-of-week profile per key over a daily census: for each (key,
    * dow) the day count, total volume, mean volume, and the lift of
    * that weekday's mean over the key's all-days mean — computed as
    * the exact rational (total·n_days_all) / (n_days·total_all), one
    * division per cell. `dowCol` is any small categorical period label
    * (1..7 from `dayofweek`; hours work the same way). Output: (key,
    * dow, n_days, total, mean, lift). */
  def seasonalityProfile(df: DataFrame, keyCol: String, dowCol: Column,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val cell = df.groupBy(col(keyCol), dowCol.as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(x).as("total"))
    val tot = cell.groupBy(col(keyCol))
      .agg(sum(col("n_days")).as("__n_all"), sum(col("total")).as("__t_all"))
    cell.join(tot, keyCol)
      .select(col(keyCol), col("dow"), col("n_days"), col("total"),
        (col("total").cast("double") / col("n_days").cast("double")).as("mean"),
        when(col("__t_all") =!= 0L,
          (col("total") * col("__n_all")).cast("double") /
            (col("n_days") * col("__t_all")).cast("double")).as("lift"))
  }

  /** Durbin–Watson statistic per key — the classic first-order serial-
    * correlation alarm on a mean-centered series:
    *   DW = Σ_{t≥2} (e_t − e_{t−1})² / Σ e_t²,  e_t = y_t − ȳ.
    * DW ≈ 2 means no lag-1 structure; → 0 positive, → 4 negative
    * autocorrelation, with ρ̂ ≈ 1 − DW/2 as the companion readout.
    * The cheap scalar twin of [[acf]]'s full profile — one number per
    * key, no lag unpivot — and the standard residual gate after any
    * trend fit.
    *
    * Exactness: successive differences don't see the mean (Δe = Δy),
    * so the numerator Σ(Δy)² is an exact integer sum; the denominator
    * Σe² = (n·Σy² − (Σy)²)/n, so DW = n·Σ(Δy)² / (n·Σy² − (Σy)²) is a
    * ratio of exact decimals with ONE terminal double division —
    * nothing order-sensitive. Ordering contract: `ordCol` must be a
    * unique total order per key (pass a tiebreaker-composite upstream
    * if timestamps can collide).
    *
    * Scale shape: one per-key window pass for the lag, one key-keyed
    * census aggregation; nothing else shuffles. Output: (key, n, dw,
    * rho); null when n < 2 or the series is constant. */
  def durbinWatson(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val y = col(valueCol).cast("long")
    val lagged = df.select(col(keyCol), col(ordCol), y.as("__y"))
      .withColumn("__d", col("__y") - lag(col("__y"), 1).over(w))
    val yD = col("__y").cast(dec)
    val g = lagged.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(yD).cast(dec).as("__s1"),
      sum((yD * yD).cast(dec)).cast(dec).as("__s2"),
      sum((col("__d").cast(dec) * col("__d").cast(dec)).cast(dec))
        .cast(dec).as("__num"))
    val nD = col("n").cast(dec)
    val den = (nD * col("__s2") - col("__s1") * col("__s1")).cast(dec)
    val dw = (nD * col("__num")).cast(dec).cast("double") /
      den.cast("double")
    g.withColumn("__den", den)
      .select(col(keyCol), col("n"),
        when(col("n") > 1L && col("__den") > lit(0).cast(dec), dw).as("dw"),
        when(col("n") > 1L && col("__den") > lit(0).cast(dec),
          lit(1.0) - dw / lit(2.0)).as("rho"))
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978) per key — is there
    * ANY serial correlation in the first K lags, jointly:
    *   Q = n(n+2) Σ_{k=1..K} r_k²/(n−k),  Q ~ χ²(K) under whiteness.
    * The one-number gate over the whole [[acf]] profile (a single r_k
    * readout invites multiplicity errors at K lags), and the standard
    * residual-whiteness check after any [[graft.operators.Forecast]]
    * fit. With K EVEN the p-value is exact via the Poisson-sum χ²
    * survival (the q356 contract) — no incomplete gamma.
    *
    * Exactness: each r_k is one double from exact-integer [[acf]]
    * sums; the Q sum folds in lag order (≤ K terms); the p series
    * folds the t·h/k recurrence with precomputed factors. Keys missing
    * any of the K lags (series shorter than K+1) emit null Q — loud.
    * Output: (key, n_obs, k_lags, q_stat, p_value). */
  def ljungBox(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val r = acf(df, keyCol, ordCol, valueCol, maxLag)
    val folded = r.groupBy(col(keyCol))
      .agg(max(col("n_obs")).as("n_obs"),
        sum(when(col("r").isNotNull, 1L).otherwise(0L)).as("k_lags"),
        sort_array(collect_list(struct(col("lag"), col("r")))).as("__rs"))
      .withColumn("__q", when(col("k_lags") === maxLag.toLong,
        col("n_obs").cast("double") * (col("n_obs") + 2L).cast("double") *
          expr(s"""aggregate(__rs, CAST(0.0 AS DOUBLE),
            |(acc, e) -> acc + e.r * e.r
            |  / CAST(n_obs - e.lag AS DOUBLE))""".stripMargin)))
    val m = maxLag / 2
    val series =
      if (maxLag % 2 != 0 || m < 1) lit(null).cast("double")
      else if (m == 1) lit(1.0)
      else expr(s"""aggregate(
        |transform(sequence(1L, ${m - 1}L), k -> (__q / 2.0) / CAST(k AS DOUBLE)),
        |named_struct('s', CAST(1.0 AS DOUBLE), 't', CAST(1.0 AS DOUBLE)),
        |(acc, hk) -> named_struct('s', acc.s + acc.t * hk, 't', acc.t * hk),
        |acc -> acc.s)""".stripMargin)
    folded.select(col(keyCol), col("n_obs"), col("k_lags"),
      col("__q").as("q_stat"),
      when(col("__q").isNotNull,
        exp(-col("__q") / lit(2.0)) * series).as("p_value"))
  }

  /** Partial autocorrelation function per key via Durbin–Levinson —
    * the Box–Jenkins companion [[acf]] can't replace: pacf(k) is the
    * lag-k correlation with lags 1..k−1 PARTIALLED OUT, the readout
    * that separates "AR(1) echoing through every lag" from genuine
    * higher-order structure (AR order = where the PACF cuts off).
    * The recursion over the ACF values r₁..r_K:
    *   φ₁₁ = r₁;  φ_kk = (r_k − Σⱼ φ_{k−1,j} r_{k−j}) /
    *                     (1 − Σⱼ φ_{k−1,j} r_j);
    *   φ_kj = φ_{k−1,j} − φ_kk φ_{k−1,k−j}.
    *
    * Determinism: each r_k is one double from exact-integer [[acf]]
    * sums; the recursion folds k = 2..K with ascending-j inner sums —
    * every step a pinned shape, replayed by a recursive-CTE oracle
    * (the state is array-valued and coupled, the Holt–Winters
    * contract). Keys missing any of the K lags are absent (loud).
    * Output: (key, lag, pacf), lag = 1..K. */
  def pacf(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val r = acf(df, keyCol, ordCol, valueCol, maxLag)
    val base = r.groupBy(col(keyCol))
      .agg(sum(when(col("r").isNotNull, 1L).otherwise(0L)).as("__k"),
        sort_array(collect_list(struct(col("lag"), col("r")))).as("__rs"))
      .where(col("__k") === maxLag.toLong)
      .withColumn("__r", expr("transform(__rs, e -> e.r)"))
    if (maxLag == 1)
      return base.select(col(keyCol), lit(1).as("lag"),
        expr("element_at(__r, 1)").as("pacf"))
    val num = "(element_at(__r, k) - aggregate(sequence(1, k - 1), " +
      "CAST(0.0 AS DOUBLE), (a, j) -> a + element_at(acc.phi, j) " +
      "* element_at(__r, k - j)))"
    val den = "(CAST(1.0 AS DOUBLE) - aggregate(sequence(1, k - 1), " +
      "CAST(0.0 AS DOUBLE), (a, j) -> a + element_at(acc.phi, j) " +
      "* element_at(__r, j)))"
    val pkk = s"($num / $den)"
    val fold =
      s"""aggregate(sequence(2, $maxLag),
         |  named_struct('phi', array(element_at(__r, 1)),
         |               'out', array(element_at(__r, 1))),
         |  (acc, k) -> named_struct(
         |    'phi', concat(transform(acc.phi,
         |      (v, ix) -> v - $pkk * element_at(acc.phi, k - 1 - ix)),
         |      array($pkk)),
         |    'out', concat(acc.out, array($pkk))),
         |  acc -> acc.out)""".stripMargin
    base.withColumn("__out", expr(fold))
      .select(col(keyCol), posexplode(col("__out")).as(Seq("__p", "pacf")))
      .select(col(keyCol), (col("__p") + 1).as("lag"), col("pacf"))
  }

  /** Wald–Wolfowitz runs test per key — is the series RANDOM about its
    * own mean, the assumption every control chart here quietly makes:
    * too few runs = sticky regimes (positive dependence), too many =
    * oscillation. R = number of maximal same-sign runs of the
    * above-mean indicator (ties-to-below, pinned);
    *   E[R] = 2·n₁n₀/n + 1,
    *   Var  = 2n₁n₀(2n₁n₀ − n) / (n²(n−1)),  z = (R − E)/√Var.
    * The distribution-free cousin of [[durbinWatson]] (no linearity or
    * scale assumptions at all).
    *
    * Exactness: the mean compare is integer-vs-one-division-double
    * (deterministic); R, n₁, n₀ are exact window counts; E and Var are
    * pinned ratios of exact decimals. Output: (key, n, n_above,
    * n_below, runs, expected_runs, z); z null on one-sided series or
    * n < 2. */
  def runsTest(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(valueCol).cast("long").as("x"))
    val means = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast(dec)).cast(dec).as("__s1"))
      .withColumn("__mu", col("__s1").cast("double") / col("n").cast("double"))
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val signed = base.join(means.select(col("k"), col("n"), col("__mu")), Seq("k"))
      .withColumn("__a", (col("x").cast("double") > col("__mu")).cast("int"))
      .withColumn("__chg",
        when(lag(col("__a"), 1).over(w).isNull, 1)
          .when(lag(col("__a"), 1).over(w) =!= col("__a"), 1).otherwise(0))
    val agg = signed.groupBy(col("k"))
      .agg(max(col("n")).as("n"), sum(col("__a").cast("long")).as("n_above"),
        sum(lit(1L) - col("__a")).as("n_below"),
        sum(col("__chg").cast("long")).as("runs"))
    val n1 = col("n_above").cast(dec); val n0 = col("n_below").cast(dec)
    val nD = col("n").cast(dec)
    val e = (lit(2L).cast(dec) * n1 * n0).cast(dec).cast("double") /
      col("n").cast("double") + lit(1.0)
    val varNum = (lit(2L).cast(dec) * n1 * n0 *
      (lit(2L).cast(dec) * n1 * n0 - nD)).cast(dec)
    val varDen = (nD * nD * (nD - 1)).cast(dec)
    val vr = varNum.cast("double") / varDen.cast("double")
    agg.withColumn("__e", e).withColumn("__v",
        when(col("n") > 1L && col("n_above") > 0L && col("n_below") > 0L, vr))
      .select(col("k").as(keyCol), col("n"), col("n_above"), col("n_below"),
        col("runs"), col("__e").as("expected_runs"),
        when(col("__v").isNotNull && col("__v") > 0.0,
          (col("runs").cast("double") - col("__e")) / sqrt(col("__v")))
          .as("z"))
  }

  /** Hurst exponent by rescaled-range analysis (Hurst 1951; Mandelbrot
    * & Wallis 1969) per key — LONG-memory detection: H ≈ 0.5 is a
    * random walk, H > 0.5 persistent (trends feed trends — [[acf]]'s
    * lag-k view integrated across ALL horizons), H < 0.5
    * anti-persistent. For each dyadic window size w, the series splits
    * into ⌊n/w⌋ consecutive blocks; per block R/S = (range of
    * cumulative mean-deviations) / (population std); H is the OLS
    * slope of ln(mean R/S) on ln(w).
    *
    * Exactness: with integer values both R and S are EXACT per block —
    * w·(cumdev at i) = w·Σ_{j≤i}x_j − i·Σx is an integer fold, so
    * R = (max − min)/w is one division, and S² = (wΣx² − (Σx)²)/w² is
    * a ratio of exact longs; the only float folds (block-mean of R/S,
    * the 4-point OLS) run in fixed block/window order. Headroom:
    * w·Σx² must fit a long (w ≤ 64, cents-scale daily censuses are
    * fine to ~10¹⁴ per block).
    *
    * Scale shape: one per-key census collect bounded by periods; all
    * window work is array folds on that census. Output: one row per
    * (key, w) — (key, w, n_blocks, avg_rs) — plus the fitted `hurst`
    * repeated on each row (blocks with S = 0 are skipped; w rows with
    * no surviving block are absent and the fit uses the rest). */
  def hurstRs(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, windows: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 2), s"bad windows: $windows")
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(valueCol).cast("long").as("x"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("o"))))
      .localCheckpoint(true)
    // per window size: block = (rn-1) div w; the cumulative deviation
    // is the exact long  w\u00b7prefix_i \u2212 i\u00b7total  (a relational window
    // cumsum, no float anywhere); only FULL blocks with positive
    // variance survive
    val perW = windows.map { w =>
      val wBlk = Window.partitionBy(col("k"), col("__b"))
      val wIn = wBlk.orderBy(col("__rn"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val blocks = base
        .withColumn("__b", expr(s"(__rn - 1) div $w"))
        .withColumn("__i", ((col("__rn") - 1L) % w) + 1L)
        .withColumn("__ps", sum(col("x")).over(wIn))
        .withColumn("__tot", sum(col("x")).over(wBlk))
        .withColumn("__dev",
          lit(w.toLong) * col("__ps") - col("__i") * col("__tot"))
        .groupBy(col("k"), col("__b"))
        .agg(count(lit(1)).as("__cnt"),
          sum(col("x")).as("__s1"),
          sum(col("x") * col("x")).as("__s2"),
          max(col("__dev")).as("__mx"), min(col("__dev")).as("__mn"))
        .where(col("__cnt") === w.toLong)
        .withColumn("__den", lit(w.toLong) * col("__s2") -
          col("__s1") * col("__s1"))
        .where(col("__den") > 0L)
        .select(col("k"), col("__b"),
          (((col("__mx") - col("__mn")).cast("double") / lit(w.toDouble)) /
            sqrt(col("__den").cast("double") / lit((w.toLong * w).toDouble)))
            .as("__rs"))
      blocks.groupBy(col("k"))
        .agg(count(lit(1)).as("n_blocks"),
          sort_array(collect_list(struct(col("__b"), col("__rs"))))
            .as("__rss"))
        .select(col("k"), lit(w).as("w"), col("n_blocks"),
          (expr("aggregate(__rss, CAST(0.0 AS DOUBLE), (a, e) -> a + e.__rs)") /
            col("n_blocks").cast("double")).as("avg_rs"))
    }.reduce(_ unionAll _)
    // OLS of ln(avg_rs) on ln(w), folded in w order per key
    val pts = perW
      .groupBy(col("k"))
      .agg(collect_list(struct(col("w"), col("n_blocks"), col("avg_rs")))
        .as("__p0"))
      .withColumn("__pts", expr(
        "transform(array_sort(__p0), p -> named_struct(" +
          "'lx', ln(CAST(p.w AS DOUBLE)), 'ly', ln(p.avg_rs)))"))
      .withColumn("__kk", expr("CAST(size(__pts) AS DOUBLE)"))
      .withColumn("__f", expr(
        """aggregate(__pts,
          |  struct(CAST(0.0 AS DOUBLE) AS sx, CAST(0.0 AS DOUBLE) AS sy,
          |         CAST(0.0 AS DOUBLE) AS sxy, CAST(0.0 AS DOUBLE) AS sxx),
          |  (acc, p) -> struct(acc.sx + p.lx AS sx, acc.sy + p.ly AS sy,
          |    acc.sxy + p.lx * p.ly AS sxy, acc.sxx + p.lx * p.lx AS sxx))"""
          .stripMargin))
      .select(col("k"), when(col("__kk") > 1.0,
        (col("__kk") * col("__f.sxy") - col("__f.sx") * col("__f.sy")) /
          (col("__kk") * col("__f.sxx") - col("__f.sx") * col("__f.sx")))
        .as("hurst"))
    perW.join(pts, Seq("k"))
      .select(col("k").as(keyCol), col("w"), col("n_blocks"), col("avg_rs"),
        col("hurst"))
  }

  /** KPSS level-stationarity statistic (Kwiatkowski–Phillips–Schmidt–
    * Shin 1992) per key — the null-reversed complement of the unit-root
    * family: [[ljungBox]] asks "is there ANY serial structure",
    * [[hurstRs]] asks "does it persist", KPSS asks the deployment
    * question directly: is the LEVEL stable enough that a fixed
    * baseline is valid? Large values reject stationarity (1% critical
    * value 0.739 for the level test).
    *
    *   η = n⁻² Σ_t S_t²  over partial sums S_t of demeaned values,
    *   s²(l) = γ̂₀ + 2 Σ_{j≤l} (1 − j/(l+1)) γ̂_j  (Bartlett window),
    *   KPSS = η / s²(l).
    *
    * Exactness: demeaning is kept exact by n-SCALING — d_t = n·x_t −
    * Σx is an exact integer, so S_t = cumsum(d)/n and every γ̂_j
    * numerator Σ d_t d_{t−j} stay exact decimals; the n powers cancel
    * into KPSS = Σcumd² / (n · (g₀ + 2Σw_j g_j)), ONE pinned double
    * expression with the Bartlett weights folded in fixed j order.
    *
    * Scale shape: input is a (key, period, value) census (row-scale
    * aggregation upstream); one keyed window pass makes cumsum + all
    * lags, one census aggregation per key. Output: (key, n_obs,
    * kpss); null when n ≤ lags or the long-run variance is 0. */
  def kpssLevel(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, lags: Int = 4): DataFrame = {
    require(lags >= 1, s"lags must be >= 1, got $lags")
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val tot = Window.partitionBy(col("k"))
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(valueCol).cast("long").as("x"))
      .withColumn("nn", count(lit(1)).over(tot))
      .withColumn("sx", sum(col("x")).over(tot))
      .withColumn("d", (col("nn").cast(dec) * col("x").cast(dec) -
        col("sx").cast(dec)).cast(dec))
      .withColumn("cumd", sum(col("d")).over(
        Window.partitionBy(col("k")).orderBy(col("o"))
          .rowsBetween(Window.unboundedPreceding, 0)).cast(dec))
    val lagged = (1 to lags).foldLeft(base) { case (d0, j) =>
      d0.withColumn(s"dl$j", lag(col("d"), j).over(w))
    }
    val aggs = Seq(
      max(col("nn")).as("n_obs"),
      sum((col("cumd") * col("cumd")).cast(dec)).cast(dec).as("cumd2"),
      sum((col("d") * col("d")).cast(dec)).cast(dec).as("g0")) ++
      (1 to lags).map(j =>
        sum(when(col(s"dl$j").isNotNull, (col("d") * col(s"dl$j")).cast(dec))
          .otherwise(lit(0).cast(dec))).cast(dec).as(s"g$j"))
    val per = lagged.groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    def dd(c: Column): Column = c.cast("double")
    // Bartlett-weighted long-run variance numerator, fixed j order
    val wsum = (1 to lags).map { j =>
      lit(1.0 - j.toDouble / (lags + 1)) * dd(col(s"g$j"))
    }.reduceLeft(_ + _)
    val lrv = dd(col("g0")) + lit(2.0) * wsum
    per.select(col("k").as(keyCol), col("n_obs"),
      when(col("n_obs") > lags && lrv =!= lit(0.0),
        dd(col("cumd2")) / (dd(col("n_obs")) * lrv)).as("kpss"))
  }

  /** Augmented Dickey–Fuller regression (one augmentation lag,
    * constant included) per key — [[kpssLevel]]'s OPPOSITE-NULL
    * companion: KPSS's null is stationarity, ADF's null is a unit
    * root, and quoting both is the standard confirmatory read (both
    * reject → structural break territory; see
    * [[graft.operators.ChangePoint.pettitt]]). Fits
    *   Δy_t = α + β·y_{t−1} + φ·Δy_{t−1} + ε_t
    * and reports the Dickey–Fuller t = β̂/se(β̂) — compare against the
    * DF distribution's critical values (−3.43 at 1%, −2.86 at 5% for
    * the constant-only test), NOT the normal: the statistic is
    * reported, the table lookup is the caller's (the repo-wide
    * no-interpolated-special-functions rule).
    *
    * Exactness: both regressors and the response come from one keyed
    * window pass (integer y, Δy); the nine raw moments are exact
    * decimal sums; the centered Cramer algebra on the 2×2 normal
    * equations is a fixed-shape double expression (the
    * [[grangerLag1]] contract).
    *
    * Scale shape: input is a (key, period) census; one window pass +
    * one aggregation per key. Output: (key, n, beta, phi, t_adf);
    * null when n ≤ 4, the design is singular, or RSS ≤ 0. */
  def adfTest(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(valueCol).cast("long").as("y"))
      .withColumn("yl", lag(col("y"), 1).over(w))
      .withColumn("yl2", lag(col("y"), 2).over(w))
      .withColumn("z", col("y") - col("yl"))       // Δy_t
      .withColumn("a", col("yl"))                  // y_{t-1}
      .withColumn("b", col("yl") - col("yl2"))     // Δy_{t-1}
      .where(col("yl").isNotNull && col("yl2").isNotNull)
    def D(c: Column): Column = c.cast(dec)
    val g = base.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sum(D(col("a"))).cast(dec).as("sa"),
      sum(D(col("b"))).cast(dec).as("sb"),
      sum(D(col("z"))).cast(dec).as("sz"),
      sum((D(col("a")) * D(col("a"))).cast(dec)).cast(dec).as("saa"),
      sum((D(col("b")) * D(col("b"))).cast(dec)).cast(dec).as("sbb"),
      sum((D(col("a")) * D(col("b"))).cast(dec)).cast(dec).as("sab"),
      sum((D(col("a")) * D(col("z"))).cast(dec)).cast(dec).as("saz"),
      sum((D(col("b")) * D(col("z"))).cast(dec)).cast(dec).as("sbz"),
      sum((D(col("z")) * D(col("z"))).cast(dec)).cast(dec).as("szz"))
    def dd(c: Column): Column = c.cast("double")
    val nD = dd(col("n"))
    // m-scaled centered moments, each ONE pinned double shape
    val cAA = nD * dd(col("saa")) - dd(col("sa")) * dd(col("sa"))
    val cBB = nD * dd(col("sbb")) - dd(col("sb")) * dd(col("sb"))
    val cAB = nD * dd(col("sab")) - dd(col("sa")) * dd(col("sb"))
    val cAZ = nD * dd(col("saz")) - dd(col("sa")) * dd(col("sz"))
    val cBZ = nD * dd(col("sbz")) - dd(col("sb")) * dd(col("sz"))
    val cZZ = nD * dd(col("szz")) - dd(col("sz")) * dd(col("sz"))
    val det = cAA * cBB - cAB * cAB
    val beta = (cAZ * cBB - cBZ * cAB) / det
    val phi = (cBZ * cAA - cAZ * cAB) / det
    // RSS = (cZZ - β·cAZ - φ·cBZ)/n in UNSCALED units; σ² = RSS/(n−3);
    // Var(β) = σ²·n·cBB/det — the n powers written out, not cancelled,
    // so both engines evaluate the same shapes
    val rss = (cZZ - beta * cAZ - phi * cBZ) / nD
    val sig2 = rss / (nD - lit(3.0))
    val varB = sig2 * nD * cBB / det
    val ok = col("n") > 4L && det > lit(0.0) && rss > lit(0.0)
    g.select(col("k").as(keyCol), col("n"),
      when(ok, beta).as("beta"), when(ok, phi).as("phi"),
      when(ok, beta / sqrt(varB)).as("t_adf"))
  }

  /** Permutation entropy (Bandt–Pompe 2002), order 3, per key — the
    * model-free complexity readout: how uniformly are the six ordinal
    * patterns of consecutive value triples used? 1.0 = the series'
    * local ups-and-downs are indistinguishable from noise; near 0 =
    * one motif dominates (monotone drift, strict alternation). The
    * complexity companion to [[acf]]: ACF sees linear structure,
    * ordinal patterns see any monotone-invariant structure.
    *
    * Ties break toward the EARLIER index (the standard stable-argsort
    * convention), so the pattern code is deterministic on integer
    * censuses. Pattern code = 100·rank(x_t) + 10·rank(x_{t+1}) +
    * rank(x_{t+2}) — six observable values.
    *
    * Scale shape: one keyed window pass (two leads), one ≤6-cell
    * census per key; the entropy fold runs in pattern-code order.
    * Output: (key, n_windows, n_patterns, h, h_norm). */
  def permutationEntropy(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(valueCol).cast("long").as("a"))
      .withColumn("b", lead(col("a"), 1).over(w))
      .withColumn("c", lead(col("a"), 2).over(w))
      .where(col("c").isNotNull && col("b").isNotNull)
    def i(c: Column): Column = c.cast("long")
    val ra = i(col("b") < col("a")) + i(col("c") < col("a"))
    val rb = i(col("a") <= col("b")) + i(col("c") < col("b"))
    val rc = i(col("a") <= col("c")) + i(col("b") <= col("c"))
    val census = base
      .withColumn("code", ra * 100L + rb * 10L + rc)
      .groupBy(col("k"), col("code")).agg(count(lit(1)).as("cnt"))
    val per = census.groupBy(col("k")).agg(
      sum(col("cnt")).as("n_windows"), count(lit(1)).as("n_patterns"),
      sort_array(collect_list(struct(col("code"),
        col("cnt").cast("double").as("cd")))).as("cells"))
    val nD = col("n_windows").cast("double")
    val h = negate(aggregate(col("cells"), lit(0.0d), (acc, x) =>
      acc + (x.getField("cd") / nD) * log(x.getField("cd") / nD)))
    per.select(col("k").as(keyCol), col("n_windows"), col("n_patterns"),
      h.as("h"), (h / log(lit(6.0))).as("h_norm"))
  }

  /** Turning-points randomness test per key — count the local extrema
    * (strict peaks and troughs) of the ordered series; under pure
    * randomness E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90, so
    * z = (T − E)/√Var reads: z ≪ 0 too FEW turns (trend/momentum),
    * z ≫ 0 too many (over-alternation, negative autocorrelation). The
    * third member of the randomness battery next to the runs test
    * (signs) and [[permutationEntropy]] (ordinal patterns) — this one
    * is the classical closed-form z.
    *
    * Ties: a plateau is NOT a strict turn (the test assumes continuous
    * data; integer censuses make ties real, so the strict convention
    * is pinned and documented — deterministic both engines). Exactness:
    * T is an exact count; E/Var/z are pinned double shapes.
    *
    * Scale shape: one keyed window pass (two lags), one census
    * aggregation. Output: (key, n, t_turns, e_t, var_t, z); null z
    * when n < 3. */
  def turningPoints(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(valueCol).cast("long").as("x"))
      .withColumn("p", lag(col("x"), 1).over(w))
      .withColumn("q", lead(col("x"), 1).over(w))
    val turn = when(col("p").isNotNull && col("q").isNotNull &&
      ((col("p") < col("x") && col("q") < col("x")) ||
        (col("p") > col("x") && col("q") > col("x"))), 1L).otherwise(0L)
    def dd(c: Column): Column = c.cast("double")
    val g = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(turn).as("t_turns"))
    val e = lit(2.0) * dd(col("n") - 2L) / lit(3.0)
    val v = dd(lit(16L) * col("n") - 29L) / lit(90.0)
    g.select(col("k").as(keyCol), col("n"), col("t_turns"),
      when(col("n") >= 3L, e).as("e_t"),
      when(col("n") >= 3L, v).as("var_t"),
      when(col("n") >= 3L && v > lit(0.0),
        (dd(col("t_turns")) - e) / sqrt(v)).as("z"))
  }

  /** Granger causality, lag 1, per key — does x's PAST improve the
    * one-step forecast of y beyond y's own past? F compares the
    * restricted regression y_t ~ (1, y_{t−1}) against the full
    * y_t ~ (1, y_{t−1}, x_{t−1}):
    *   F = (RSS_r − RSS_f) / (RSS_f / (n − 3)),  df = (1, n−3),
    * with β_x (the full model's x coefficient) reported so the SIGN
    * of the predictive contribution is visible. This is predictive
    * precedence, not mechanism — the standard caveat.
    *
    * Exactness: both lag columns come from one keyed window pass;
    * the nine raw moments are exact decimal sums; centered moments
    * (n·Σab − Σa·Σb) stay exact decimal; the closed-form 2-regressor
    * algebra (Cramer on the 2×2 normal equations) is a fixed-shape
    * double expression — no iteration, no float folds.
    *
    * Scale shape: input is a (key, period) census; one window pass +
    * one aggregation per key. Output: (key, n, beta_x, f); null when
    * n ≤ 3, the design is singular, or RSS_f = 0. */
  def grangerLag1(df: DataFrame, keyCol: String, ordCol: String,
      yCol: String, xCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(yCol).cast("long").as("y"), col(xCol).cast("long").as("x"))
      .withColumn("a", lag(col("y"), 1).over(w))
      .withColumn("b", lag(col("x"), 1).over(w))
      .where(col("a").isNotNull && col("b").isNotNull)
    def D(c: Column): Column = c.cast(dec)
    val g = base.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sum(D(col("a"))).cast(dec).as("sa"),
      sum(D(col("b"))).cast(dec).as("sb"),
      sum(D(col("y"))).cast(dec).as("sy"),
      sum((D(col("a")) * D(col("a"))).cast(dec)).cast(dec).as("saa"),
      sum((D(col("b")) * D(col("b"))).cast(dec)).cast(dec).as("sbb"),
      sum((D(col("a")) * D(col("b"))).cast(dec)).cast(dec).as("sab"),
      sum((D(col("a")) * D(col("y"))).cast(dec)).cast(dec).as("say"),
      sum((D(col("b")) * D(col("y"))).cast(dec)).cast(dec).as("sby"),
      sum((D(col("y")) * D(col("y"))).cast(dec)).cast(dec).as("syy"))
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n").cast(dec)
    def ctr(sab: Column, sa: Column, sb: Column): Column =
      dd((nD * sab - sa * sb).cast(dec))
    val caa = ctr(col("saa"), col("sa"), col("sa"))
    val cbb = ctr(col("sbb"), col("sb"), col("sb"))
    val cab = ctr(col("sab"), col("sa"), col("sb"))
    val cay = ctr(col("say"), col("sa"), col("sy"))
    val cby = ctr(col("sby"), col("sb"), col("sy"))
    val cyy = ctr(col("syy"), col("sy"), col("sy"))
    val det = caa * cbb - cab * cab
    val rssR = cyy - cay * cay / caa
    val betaA = (cay * cbb - cby * cab) / det
    val betaB = (cby * caa - cay * cab) / det
    val rssF = cyy - (betaA * cay + betaB * cby)
    val ok = col("n") > 3L && caa =!= lit(0.0) && det =!= lit(0.0) &&
      rssF > lit(0.0)
    g.select(col("k").as(keyCol), col("n"),
      when(ok, betaB).as("beta_x"),
      when(ok, (rssR - rssF) / (rssF / dd(col("n") - 3L))).as("f"))
  }
}
