package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUSUM change-point detection — the sequential drift monitor (Page
  * 1954): the one-sided statistic s_t = max(0, s_{t-1} + (x_t − μ − k))
  * accumulates only SUSTAINED upward departures from the series' own
  * mean; crossing h alarms far earlier than any fixed per-point
  * threshold on noisy counts. The pipeline use: volume/error-rate
  * shift detection per source before a drifted feed poisons a
  * training snapshot ([[Divergence]] sees distribution drift; this
  * sees level shifts in time).
  *
  * Scale shape: the input should already be a (key, period, value)
  * census — the row-scale aggregation happens upstream — so state here
  * is one sorted per-key series (bounded by periods, never events).
  * The recurrence folds IN PERIOD ORDER via the aggregate HOF with a
  * fixed-shape four-field state; every field of each step re-derives
  * s_t from acc.s alone (no sibling reads), which is exactly the shape
  * DuckDB's list_reduce replays field-for-field — bit-identical
  * doubles end-to-end (the q40 MACD fold contract). */
object ChangePoint {

  /** Per-key CUSUM summary: (key, n_obs, mean, n_alarms, first_alarm,
    * max_stat). `slack` is the per-step allowance k (drift below μ+k
    * never accumulates); `threshold` is the alarm level h. The target
    * μ is the key's own series mean — self-calibrated, exact division
    * of exact sums. Ord values compare as strings — zero-padded
    * period labels (ISO dates, yyyy-MM-dd) are the contract. */
  def cusumSummary(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, slack: Double, threshold: Double): DataFrame = {
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(col(valueCol).cast("double")).as("__sx"),
        sort_array(collect_list(struct(col(ordCol).cast("string").as("o"),
          col(valueCol).cast("double").as("x")))).as("__series"))
      .withColumn("mean", col("__sx") / col("n_obs"))
    // field order (na, fa, mx, s) keeps every reader of acc.s ahead of
    // the field that overwrites s — the list_reduce aliasing defense
    val sNext = s"greatest(CAST(0.0 AS DOUBLE), acc.s + e.x - mean - $slack)"
    val fold =
      s"""aggregate(__series,
         |  struct(CAST(0 AS BIGINT) AS na, CAST(NULL AS STRING) AS fa,
         |         CAST(0.0 AS DOUBLE) AS mx, CAST(0.0 AS DOUBLE) AS s),
         |  (acc, e) -> struct(
         |    acc.na + IF($sNext >= $threshold, CAST(1 AS BIGINT), CAST(0 AS BIGINT)) AS na,
         |    coalesce(acc.fa, IF($sNext >= $threshold, e.o, CAST(NULL AS STRING))) AS fa,
         |    greatest(acc.mx, $sNext) AS mx,
         |    $sNext AS s))""".stripMargin
    g.withColumn("__f", expr(fold))
      .select(col(keyCol), col("n_obs"), col("mean"),
        col("__f.na").as("n_alarms"), col("__f.fa").as("first_alarm"),
        col("__f.mx").as("max_stat"))
  }

  /** Single change-point LOCALIZATION by binary segmentation —
    * [[cusumSummary]] says a series shifted; this says WHERE: the
    * split t maximizing the between-segment statistic
    * f(t) = (S₁n₂ − S₂n₁)² / (n·n₁·n₂) (the squared two-sample mean
    * gap, weighted) over all prefix/suffix splits of the per-key
    * ordered series.
    *
    * Determinism: prefix sums are exact integers, f(t) is ONE double
    * expression per candidate in fixed shape (identical cross-engine),
    * and the argmax resolves ties by earliest split — a float total
    * order both engines share (the q248 contract). Scale shape: the
    * series is a period census; candidates enumerate census rows via
    * one per-key window pass, so work is keys × periods. Output:
    * (key, n_obs, split_ord, n_before, mean_before, mean_after,
    * stat) — the split is the LAST period of the left segment; keys
    * with fewer than 2 periods are absent.
    *
    * Ordering contract: `ordCol` values compare AS STRINGS — pass
    * zero-padded period labels (ISO dates). A numeric ord (epoch day,
    * week number) mis-orders lexically ("10" < "2"), so NumericType
    * ord columns are REFUSED at plan build; format them first. */
  def binarySegment(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.schema(ordCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"binarySegment: ordCol '$ordCol' is ${df.schema(ordCol).dataType} — " +
        "ord values compare AS STRINGS (\"10\" < \"2\"); zero-pad or " +
        "format to ISO period labels first")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ordCol).cast("string"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy(col(keyCol))
    val x = col(valueCol).cast("long")
    val pre = df
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__s1", sum(x).over(run))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__s", sum(x).over(all))
      .where(col("__i") < col("__n")) // a split needs a non-empty right side
    val n1 = col("__i")
    val n2 = col("__n") - col("__i")
    val s2 = col("__s") - col("__s1")
    // gap squares in DOUBLE: the long gap is exact (< 2^53 for any
    // sane census) but its square would overflow at period-scale sums
    val gap = (col("__s1") * n2 - s2 * n1).cast("double")
    val stat = (gap * gap) /
      (col("__n") * n1 * n2).cast("double")
    pre
      .withColumn("__stat", stat)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("__stat").desc, col(ordCol).cast("string"))))
      .where(col("__rk") === 1)
      .select(col(keyCol), col("__n").as("n_obs"),
        col(ordCol).cast("string").as("split_ord"), n1.as("n_before"),
        (col("__s1").cast("double") / n1.cast("double")).as("mean_before"),
        (s2.cast("double") / n2.cast("double")).as("mean_after"),
        col("__stat").as("stat"))
  }

  /** Page–Hinkley drift monitor — [[cusumSummary]]'s SELF-TUNING
    * sibling (Page 1954; the streaming-ML standard, e.g. MOA/river):
    * where CUSUM needs a target mean up front, PH tracks departures
    * from the RUNNING mean,
    *   m_t = m_{t−1} + (x_t − x̄_t − δ),  x̄_t = (Σ_{i≤t} x_i)/t,
    *   PH_t = m_t − min_{i≤t} m_i,  alarm when PH_t > h,
    * so a level shift anywhere raises PH even when the pre-shift mean
    * was never known — the right monitor for feeds with no stable
    * calibration window.
    *
    * Determinism: the fold runs in period order with a fixed-shape
    * state; every field re-derives m_t from acc-only reads (the
    * [[cusumSummary]] list_reduce aliasing defense), the per-step
    * running-mean division is one correctly-rounded double op in
    * identical shape cross-engine. Ord values compare as strings —
    * zero-padded period labels (ISO dates) are the contract.
    *
    * Scale shape: input is a (key, period, value) census; one sorted
    * per-key collect bounded by periods. Output: (key, n_obs,
    * n_alarms, first_alarm, max_stat, ph_end). */
  def pageHinkley(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, delta: Double, threshold: Double): DataFrame = {
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(col(ordCol).cast("string").as("o"),
          col(valueCol).cast("double").as("x")))).as("__series"))
    // every occurrence of the new m is this acc-only expression; the
    // alarm fields and the new minimum read it via substitution, never
    // via a sibling struct field
    val mNext =
      s"(acc.m + e.x - (acc.sx + e.x) / CAST(acc.t + 1 AS DOUBLE) - $delta)"
    val stat = s"($mNext - least(acc.mn, $mNext))"
    val fold =
      s"""aggregate(__series,
         |  struct(CAST(0 AS BIGINT) AS na, CAST(NULL AS STRING) AS fa,
         |         CAST(0.0 AS DOUBLE) AS mx, CAST(0.0 AS DOUBLE) AS mn,
         |         CAST(0.0 AS DOUBLE) AS m, CAST(0.0 AS DOUBLE) AS sx,
         |         CAST(0 AS BIGINT) AS t),
         |  (acc, e) -> struct(
         |    acc.na + IF($stat > $threshold, CAST(1 AS BIGINT), CAST(0 AS BIGINT)) AS na,
         |    coalesce(acc.fa, IF($stat > $threshold, e.o, CAST(NULL AS STRING))) AS fa,
         |    greatest(acc.mx, $stat) AS mx,
         |    least(acc.mn, $mNext) AS mn,
         |    $mNext AS m,
         |    acc.sx + e.x AS sx,
         |    acc.t + 1 AS t))""".stripMargin
    g.withColumn("__f", expr(fold))
      .select(col(keyCol), col("n_obs"),
        col("__f.na").as("n_alarms"), col("__f.fa").as("first_alarm"),
        col("__f.mx").as("max_stat"),
        (col("__f.m") - col("__f.mn")).as("ph_end"))
  }

  /** EWMA control chart (Roberts 1959) per key — the small-shift
    * monitor between a raw Shewhart chart (misses drifts) and
    * [[cusumSummary]] (no per-period trace): z_t = λx_t + (1−λ)z_{t−1}
    * seeded at the series' own mean, with time-varying limits
    *   μ ± L·σ·√(λ/(2−λ))·√(1 − (1−λ)^{2t})
    * that widen to steady state — early periods get TIGHTER limits,
    * which is exactly when a feed usually breaks. Emits the full
    * per-period trace (z, limits, breach), the audit artifact the
    * summary-only monitors can't produce.
    *
    * Exactness: μ and σ come from exact decimal (n, Σx, Σx²); z_t and
    * (1−λ)^{2t} are fixed-order prefix folds (the q255 slice-fold
    * shape — O(periods²) on the period census, never row grain), so
    * every per-period double replays bit-identical cross-engine; pow()
    * never appears. Ord values compare as strings — zero-padded period
    * labels are the contract.
    *
    * Scale shape: one per-key census collect bounded by periods.
    * Output: (key, o, x, z, ucl, lcl, breach); limits null when n < 2
    * (no σ). */
  def ewmaChart(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, lambda: Double = 0.2, limit: Double = 3.0): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda in (0,1), got $lambda")
    val dec = "decimal(38,0)"
    val y = col(valueCol).cast("long")
    val g = df
      .select(col(keyCol), col(ordCol).cast("string").as("o"), y.as("y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("y").cast(dec)).cast(dec).as("__s1"),
        sum((col("y").cast(dec) * col("y").cast(dec)).cast(dec))
          .cast(dec).as("__s2"),
        sort_array(collect_list(struct(col("o"), col("y")))).as("__arr"))
    val nD = col("n").cast(dec)
    val mu = col("__s1").cast("double") / col("n").cast("double")
    val sig2 = (nD * col("__s2") - col("__s1") * col("__s1")).cast(dec)
      .cast("double") / (nD * (nD - 1)).cast(dec).cast("double")
    val steady = math.sqrt(lambda / (2.0 - lambda))
    val oneML = 1.0 - lambda
    val withM = g
      .withColumn("__mu", mu)
      .withColumn("__hw", when(col("n") > 1L,
        lit(limit) * sqrt(sig2) * lit(steady)))
    // the (1−λ)² step factor is written as a PRODUCT of the 1−λ
    // literal so the oracle can spell the identical expression instead
    // of a pre-rounded constant
    val foldExpr =
      s"""explode(transform(__arr, (e, i) -> named_struct(
         |  'o', e.o, 'y', e.y,
         |  'z', aggregate(slice(__arr, 1, i + 1), __mu,
         |    (acc, x) -> CAST($lambda AS DOUBLE) * CAST(x.y AS DOUBLE)
         |      + CAST($oneML AS DOUBLE) * acc),
         |  'mu0', __mu,
         |  'hwv', __hw * sqrt(CAST(1.0 AS DOUBLE)
         |    - aggregate(slice(__arr, 1, i + 1), CAST(1.0 AS DOUBLE),
         |        (acc, x) -> acc * (CAST($oneML AS DOUBLE) * CAST($oneML AS DOUBLE)))))))""".stripMargin
    val trace = withM.select(col(keyCol), expr(foldExpr).as("__f"))
      .select(col(keyCol), col("__f.o").as("o"), col("__f.y").as("x"),
        col("__f.z").as("z"),
        (col("__f.mu0") + col("__f.hwv")).as("ucl"),
        (col("__f.mu0") - col("__f.hwv")).as("lcl"))
    trace.withColumn("breach",
      when(col("ucl").isNotNull, col("z") > col("ucl") || col("z") < col("lcl")))
  }

  /** Pettitt (1979) single change-point test per key — the
    * NONPARAMETRIC member of the family: [[binarySegment]] localizes a
    * MEAN shift (and a heavy tail can fake one); Pettitt ranks instead:
    *   U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j),  K = max_t |U_t|,
    *   p ≈ 2·exp(−6K² / (n³ + n²))  (capped at 1),
    * change-point = the t of the max (earliest on ties). The rank
    * test's argmax is where the series most looks like "everything
    * before beats everything after" (or vice versa — the sign of U at
    * the argmax says which way).
    *
    * NOT the naive quadratic: U_t = Σ_{s≤t} V_s with
    * V_s = #{j: x_j < x_s} − #{j: x_j > x_s} (sgn(0) = 0 drops the
    * j = s term for free), so one per-key VALUE census gives every
    * row's V exactly and one ord-ordered running sum gives every U_t —
    * keys × periods work, all integers until the one closed-form p.
    *
    * Ordering contract: ord compares AS STRINGS (zero-padded ISO
    * labels — the [[binarySegment]] refusal applies). Input is a
    * (key, ord, value) period census. Output: (key, n, k_stat,
    * u_at_cp, cp_ord, p_value); single-period keys are ABSENT (no
    * split exists — the [[binarySegment]] convention). */
  def pettitt(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    require(!df.schema(ordCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"pettitt: ordCol '$ordCol' is ${df.schema(ordCol).dataType} — " +
        "ord values compare AS STRINGS; format to ISO period labels first")
    pettittFromCensus(df.select(col(keyCol).as("k"),
        col(ordCol).cast("string").as("o"),
        col(valueCol).cast("long").as("x")))
      .withColumnRenamed("k", keyCol)
  }

  /** The (key, period, value) census [[pettitt]] runs on, built from
    * raw event rows by a PURE aggregation (period total), so the same
    * function is the streaming twin's state ([[graft.streaming.Streams
    * .pettittCensusStream]]): one long per (key, period), state
    * bounded by the period grid, never row count. Output: (k, o, x). */
  def pettittCensus(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    require(!df.schema(ordCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"pettittCensus: ordCol '$ordCol' is ${df.schema(ordCol).dataType} " +
        "— ord values compare AS STRINGS; format to ISO period labels first")
    df.select(col(keyCol).as("k"), col(ordCol).cast("string").as("o"),
        col(valueCol).cast("long").as("x"))
      .where(col("o").isNotNull && col("x").isNotNull)
      .groupBy(col("k"), col("o"))
      .agg(sum(col("x")).as("x"))
  }

  /** [[pettitt]]'s statistic half over a (k, o, x) period census — the
    * FromCensus contract ([[graft.operators.Eval.moodMedianFromCensus]]
    * family): the rank walk derives from the census alone, so a
    * streamed census sink feeds it identically to the batch path. */
  def pettittFromCensus(census: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = census.select(col("k"), col("o"), col("x"))
    // per-key value census -> V(x) = #less - #greater, broadcast back
    // by an equi-join on (k, x): census grain, never row^2
    val vc = base.groupBy(col("k"), col("x")).agg(count(lit(1)).as("c"))
    val wv = Window.partitionBy(col("k")).orderBy(col("x"))
    val wk = Window.partitionBy(col("k"))
    val vTab = vc
      .withColumn("__le", sum(col("c")).over(
        wv.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", sum(col("c")).over(wk))
      // fresh output attributes: vTab derives from `base`, and a
      // memory-sink view feeding both join sides otherwise trips
      // "conflicting references" (the moodMedianFromCensus lesson)
      .select(col("k").as("__vk"), col("x").as("__vx"),
        ((col("__le") - col("c")) - (col("__n") - col("__le"))).as("v"))
    val wo = Window.partitionBy(col("k")).orderBy(col("o"))
    val scored = base.join(vTab,
        base("k") === col("__vk") && base("x") === col("__vx"))
      .drop("__vk", "__vx")
      .withColumn("u", sum(col("v")).over(
        wo.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__i", row_number().over(wo))
      .withColumn("__n", count(lit(1)).over(wk))
      .where(col("__i") < col("__n")) // U_n = 0 by construction: not a split
    // argmax |U| with earliest-ord tie-break via one max(struct)
    val g = scored.groupBy(col("k")).agg(
      max(col("__n").cast("long")).as("n"),
      max(struct(abs(col("u")).as("a"),
        negate(col("__i")).cast("long").as("ni"), col("u").as("u"),
        col("o").as("o"))).as("__best"))
    def dd(c: Column): Column = c.cast("double")
    val nD = dd(col("n"))
    val k = col("__best").getField("a")
    val p = least(lit(1.0),
      lit(2.0) * exp(lit(-6.0) * dd(k) * dd(k) /
        (nD * nD * nD + nD * nD)))
    g.select(col("k"), col("n"),
      when(col("n") >= 2L, k).as("k_stat"),
      when(col("n") >= 2L, col("__best").getField("u")).as("u_at_cp"),
      when(col("n") >= 2L, col("__best").getField("o")).as("cp_ord"),
      when(col("n") >= 2L, p).as("p_value"))
  }

  /** Exact MULTI-change-point segmentation per key under the PELT
    * objective (Killick et al. 2012): minimize over all segmentations
    *   Σ_segments SSE(segment) + β · (#segments),
    * i.e. [[binarySegment]]'s mean-shift cost made GLOBAL — binary
    * segmentation is greedy and can mis-place a boundary once two true
    * shifts interact; the dynamic program
    *   F(t) = min_{0≤s<t} F(s) + C(s, t] + β,   F(0) = −β
    * is exact. This is optimal partitioning, the un-pruned form of
    * PELT: pruning changes WHICH candidates are examined, never the
    * optimum, and skipping it keeps the recurrence replayable
    * fold-for-fold by a cross-engine oracle (ties in the argmin break
    * to the SMALLEST s, pinned by the strictly-less fold). Per-key
    * series length is LOUDLY capped at `maxN` — the fold is Θ(n²) per
    * key by construction (the [[graft.operators.Divergence
    * .fisherExact]] gate discipline): at period grain (daily/hourly
    * censuses, the intended input) n is hundreds, and a caller who
    * raises the cap buys the quadratic knowingly.
    *
    * Exactness: values are exact longs; prefix sums S1/S2 are exact
    * long arrays (S2 overflows past |x| ~ 3·10⁹ on a 1000-point key —
    * far above period-census grain); every C(s, t] is ONE pinned
    * double shape over exact integer differences; F folds in t order
    * with ascending-s inner argmins. Bit-replayable cross-engine.
    *
    * Ordering contract: ord compares AS STRINGS ([[binarySegment]]'s
    * refusal). Output per key: (key, n, n_changepoints, cp_ords —
    * comma-joined ord labels of each new segment's FIRST period —
    * total_cost = F(n)); keys with n < 2 are absent (no split
    * exists). */
  def pelt(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, penalty: Double, maxN: Int = 2000): DataFrame = {
    require(penalty > 0.0, s"penalty must be positive: $penalty")
    require(maxN >= 2, s"maxN must be >= 2: $maxN")
    require(!df.schema(ordCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"pelt: ordCol '$ordCol' is ${df.schema(ordCol).dataType} — " +
        "ord values compare AS STRINGS; format to ISO period labels first")
    val base = df.select(col(keyCol).as("k"),
      col(ordCol).cast("string").as("o"), col(valueCol).cast("long").as("x"))
    val g = base.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sort_array(collect_list(struct(col("o"), col("x")))).as("cells"))
      .where(col("n") >= 2L)
      .withColumn("n", when(col("n") <= lit(maxN.toLong), col("n"))
        .otherwise(raise_error(concat(lit("pelt: series length "),
          col("n").cast("string"),
          lit(s" exceeds maxN=$maxN — the exact DP is quadratic per " +
            "key; aggregate to a coarser period or raise the cap " +
            "knowingly")))))
    // exact prefix sums over the ord-sorted values: s1[i]=Σx, s2[i]=Σx²
    // (index 0 = empty prefix), built in index order — long-exact
    val withPrefix = g
      .withColumn("s1", expr(
        """aggregate(cells, array(0L),
          |  (acc, e) -> concat(acc, array(element_at(acc, -1) + e.x)))"""
          .stripMargin))
      .withColumn("s2", expr(
        """aggregate(cells, array(0L),
          |  (acc, e) -> concat(acc, array(element_at(acc, -1) + e.x * e.x)))"""
          .stripMargin))
    // candidate cost, textually pinned in BOTH the F fold and the
    // back-pointer pass (and in the oracle's replay): F(s) + SSE + β
    // with SSE = (S2Δ as double) − (S1Δ as double)² / (t − s)
    def cand(fsRef: String) =
      s"""$fsRef
         |            + (CAST(element_at(s2, t + 1) - element_at(s2, s + 1)
         |                AS DOUBLE)
         |               - CAST(element_at(s1, t + 1) - element_at(s1, s + 1)
         |                  AS DOUBLE)
         |                 * CAST(element_at(s1, t + 1) - element_at(s1, s + 1)
         |                    AS DOUBLE) / CAST(t - s AS DOUBLE))
         |            + CAST($penalty AS DOUBLE)""".stripMargin
    // pass 1 — the F fold: acc = the growing F array (F[1] = F(0) = -β);
    // inner min over s ascending
    val dp = withPrefix.withColumn("fs", expr(
      s"""aggregate(sequence(1, CAST(n AS INT)),
         |  array(CAST(-$penalty AS DOUBLE)),
         |  (acc, t) -> concat(acc, array(
         |    aggregate(sequence(0, t - 1), CAST('Infinity' AS DOUBLE),
         |      (b, s) -> CASE WHEN
         |          ${cand("element_at(acc, s + 1)")} < b
         |        THEN ${cand("element_at(acc, s + 1)")}
         |        ELSE b END))))""".stripMargin))
    // pass 2 — back-pointers from the FINAL F array (F(s) never changes
    // after it is written, so cp(t) needs no sequencing — the shape a
    // cross-engine list fold replays without multi-field-struct
    // hazards): first s achieving F(t) exactly = the smallest-s argmin
    val cps = dp.withColumn("cps", expr(
      s"""transform(sequence(1, CAST(n AS INT)), t ->
         |  aggregate(sequence(0, t - 1),
         |    named_struct('f', CAST('Infinity' AS DOUBLE), 'sb', -1),
         |    (b, s) -> CASE WHEN
         |        ${cand("element_at(fs, s + 1)")} < b.f
         |      THEN named_struct('f', ${cand("element_at(fs, s + 1)")},
         |        'sb', s)
         |      ELSE b END).sb)""".stripMargin))
    // backtrack: follow the argmin chain from t = n; interior
    // boundaries (s > 0) are the change points, ascending after sort
    val bt = cps.withColumn("cuts", expr(
      """sort_array(aggregate(sequence(1, CAST(n AS INT)),
        |  named_struct('t', CAST(n AS INT), 'cs', CAST(array() AS ARRAY<INT>)),
        |  (acc, i) -> CASE WHEN acc.t > 0 THEN named_struct(
        |      't', element_at(cps, acc.t),
        |      'cs', CASE WHEN element_at(cps, acc.t) > 0
        |        THEN concat(acc.cs, array(element_at(cps, acc.t)))
        |        ELSE acc.cs END)
        |    ELSE acc END,
        |  acc -> acc.cs))""".stripMargin))
    bt.select(col("k").as(keyCol), col("n"),
      size(col("cuts")).cast("long").as("n_changepoints"),
      expr("array_join(transform(cuts, c -> element_at(cells, c + 1).o), ',')")
        .as("cp_ords"),
      expr("element_at(fs, CAST(n AS INT) + 1)").as("total_cost"))
  }
}
