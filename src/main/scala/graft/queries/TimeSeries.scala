package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Joins
import graft.ta.TA

/** Ordered / time-series queries over `events` (SURVEY.md §2.5 windows,
  * §2.3 as-of & range joins). Timestamps are emitted as epoch millis
  * (unix_millis) on both sides — the parquet files carry nanosecond
  * timestamps, which Spark truncates to micros; epoch-ms flooring makes the
  * two engines agree bit-for-bit.
  */
object TimeSeries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  /** q30 — trailing SMA (W1): 20-row rolling mean of value per user. */
  def q30Sma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .select($"event_id", $"user_id",
        round(TA.sma($"value", 20, w), 4).as("sma20"))
  }

  /** q31 — running cumulative sum (W5 OBV machinery). */
  def q31RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    events(spark, dir)
      .select($"event_id", $"user_id", round(sum($"value").over(w), 4).as("running_value"))
  }

  /** q32 — lag/diff (W3 gains-losses prep): value change vs previous event. */
  def q32LagDiff(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .select($"event_id", $"user_id",
        round($"value" - lag($"value", 1).over(w), 4).as("delta"))
  }

  /** q33 — rolling extrema (W8): trailing 10-row high/low per user. */
  def q33RollingExtrema(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .select($"event_id", $"user_id",
        round(TA.rollingMax($"value", 10, w), 4).as("high10"),
        round(TA.rollingMin($"value", 10, w), 4).as("low10"))
  }

  /** q34 — Bollinger bands (W6): 20-row mean +- 2 sample stddev. */
  def q34Bollinger(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val (mid, up, lo) = TA.bollinger($"value", 20, 2.0, w)
    events(spark, dir)
      .select($"event_id", $"user_id",
        round(mid, 4).as("bb_mid"), round(up, 4).as("bb_up"), round(lo, 4).as("bb_lo"))
  }

  /** q35 — backward as-of join (J4): each purchase picks up the most recent
    * prior-or-equal view's value for the same user. */
  def q35AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", round($"value", 4).as("purchase_value"))
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"ts".as("view_ts"), round($"value", 4).as("view_value"))
    Joins.asOfBackward(purchases, views, Seq("user_id"),
        leftTs = "ts", rightTs = "view_ts", valueCols = Seq("view_value"))
      .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"),
        $"purchase_value", $"view_value")
  }

  /** q36 — future-window range join (J6): for each signup, the next 3
    * events of that user, ranked. */
  def q36FutureWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val signups = e.where($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id", $"ts")
    val after = e.select($"user_id", $"ts".as("ts2"), $"event_id".as("next_id"),
      round($"value", 4).as("next_value"))
    Joins.futureWindow(signups, after, Seq("user_id"), "ts", "ts2", 3)
      .select($"signup_id", $"user_id", $"_rank".as("rank"), $"next_id", $"next_value")
  }

  /** q37 — sessionization-flavored gap flag (W15 machinery): events more
    * than 1 hour after the user's previous event start a new session;
    * emits per-user session counts. */
  def q37SessionCount(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        ($"prev_ts".isNull ||
          (unix_millis($"ts") - unix_millis($"prev_ts")) > 3600000L).cast("int"))
      .groupBy($"user_id")
      .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** q38 — EMA final value per user (W2): recursive smoothing as an ordered
    * higher-order fold (no closed-form window). Oracle-checked via DuckDB
    * recursive list fold is not expressible -> unit-tested instead; the
    * driver records a rows-only check.
    */
  def q38EmaLast(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"value"))).as("hist"))
      .select($"user_id",
        round(TA.emaOverList(expr("transform(hist, x -> x.value)"), 21), 4).as("ema21"))

  /** q39 — RSI(14) final value per user (W3, Wilder smoothing). Rows-only
    * driver check; exactness covered by unit tests.
    */
  def q39RsiLast(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"value"))).as("hist"))
      .select($"user_id",
        round(TA.rsiLast(expr("transform(hist, x -> x.value)"), 14), 4).as("rsi14"))

  /** q40 — MACD(12,26,9) final row per user (W4). Rows-only driver check. */
  def q40MacdLast(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"value"))).as("hist"))
      .select($"user_id", TA.macdLast(expr("transform(hist, x -> x.value)")).as("m"))
      .select($"user_id",
        round($"m.macd", 4).as("macd"),
        round($"m.macd_signal", 4).as("macd_signal"),
        round($"m.macd_hist", 4).as("macd_hist"))

  /** q41 — Wilder ATR(14) final row per user (W7): synthetic OHLC bars
    * from events (q60's bar shape), TR with prior close, Wilder smoothing;
    * the oracle replays TR construction + the Wilder fold in DuckDB list
    * form, upgrading W7 from spec-only to cross-engine-checked. */
  def q41AtrLast(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("h", ($"value" + 1000) * 1.01)
      .withColumn("l", ($"value" + 1000) * 0.99)
      .withColumn("c", ($"value" + 1000).cast("double"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"h", $"l", $"c"))).as("hist"))
      .select($"user_id",
        round(TA.atrLast(
          expr("transform(hist, x -> x.h)"),
          expr("transform(hist, x -> x.l)"),
          expr("transform(hist, x -> x.c)"), 14), 4).as("atr14"))

  /** q43 — direction-conditional peak excursion (W11,
    * win-tracker/main.py peak_return shape): signal price = first bar
    * close per user; BULLISH tracks the max high excursion, BEARISH the
    * min low, as a signed percent of the signal price. */
  def q43DirectionalPeak(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("h", ($"value" + 1000) * 1.01)
      .withColumn("l", ($"value" + 1000) * 0.99)
      .withColumn("c", ($"value" + 1000).cast("double"))
      .groupBy($"user_id")
      .agg(
        min_by($"c", struct($"ts", $"event_id")).as("sig_c"),
        max($"h").as("ph"),
        min($"l").as("tl"))
      .select($"user_id",
        when($"sig_c" > 1050, "BULLISH").otherwise("BEARISH").as("direction"),
        round(when($"sig_c" > 1050, ($"ph" / $"sig_c" - 1) * 100)
          .otherwise(($"tl" / $"sig_c" - 1) * 100), 2).as("peak_return"))

  /** q44 — SMA-10 regime trend (W10, Execution.regimeContext shape): last
    * close vs the 10-bar SMA per user; null trend below 10 bars. The SMA
    * sums in list order on BOTH engines (a plain AVG's unordered summation
    * could flip the comparison by an ulp on ties). */
  def q44RegimeTrend(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"value"))).as("hist"))
      .select($"user_id", expr("transform(hist, x -> x.value)").as("vs"))
      .select($"user_id",
        element_at($"vs", -1).as("last_close"),
        (aggregate(slice($"vs", greatest(size($"vs") - 9, lit(1)), lit(10)),
          lit(0.0), (a, x) => a + x) / least(size($"vs"), lit(10))).as("sma10"),
        size($"vs").as("n"))
      .select($"user_id",
        when($"n" >= 10,
          when($"last_close" > $"sma10", "BULLISH").otherwise("BEARISH"))
          .as("spy_trend_state"))

  /** q46 — latest-row snapshot per key (W9, Enrich.technicals "latest
    * indicator row" consumption): max_by over the (ts, event_id) order
    * returns each user's final event row in one aggregation — no window,
    * no second shuffle. */
  def q46LatestRow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy($"user_id")
      .agg(max_by(
        struct($"event_id", $"event_type", $"value", $"ts"),
        struct($"ts", $"event_id")).as("r"))
      .select($"user_id", $"r.event_id".as("last_event_id"),
        $"r.event_type".as("last_type"),
        round($"r.value", 4).as("last_value"),
        unix_millis($"r.ts".cast("timestamp")).as("last_ts_ms"))

  /** q115 — time-RANGE window frame: trailing-7-day per-user value sum
    * and event count (RANGE over epoch millis, not ROWS — frame ends
    * move with wall-clock gaps, and ts-tie peers aggregate together on
    * both engines). Values sum as DECIMAL(12,2): sliding-window
    * aggregation order differs between engines (segment trees vs linear
    * scan), so exact decimal addition — associative, unlike doubles —
    * is what makes the result engine-independent; the final cast back
    * to double is then exact. */
  def q115RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_millis($"ts"))
      .rangeBetween(-604800000L, 0L) // 7 days of milliseconds, inclusive
    events(spark, dir).select($"event_id", $"user_id",
      unix_millis($"ts").as("ts_ms"),
      sum($"value".cast("decimal(12,2)")).over(w).cast("double").as("sum_7d"),
      count(lit(1)).over(w).cast("long").as("n_7d"))
  }

  /** q159 — windowed funnel (view -> click -> purchase, each step within
    * ONE DAY of the previous — the attribution window that makes a
    * funnel a funnel rather than "did the user ever..."): each step's
    * timestamp is the user's FIRST qualifying event strictly inside the
    * previous step's window — three (user)-keyed min-aggregates chained
    * by equi-joins, no window function over the raw stream, so each
    * stage shuffles only (user, ts) pairs. Output: one row per step with
    * reach and conversion from the previous step. */
  def q159Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select($"user_id", $"event_type", $"ts")
    val windowMs = 86400000L
    def firstAfter(etype: String, prev: DataFrame, prevTs: String, outTs: String) =
      ev.where($"event_type" === etype)
        .join(prev, "user_id")
        .where($"ts" > col(prevTs) &&
          unix_millis($"ts") - unix_millis(col(prevTs)) <= windowMs)
        .groupBy($"user_id").agg(min($"ts").as(outTs))
    val v = ev.where($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = firstAfter("click", v, "t_view", "t_click")
    val p = firstAfter("purchase", c.select($"user_id", $"t_click"), "t_click", "t_purchase")
    val counts = v.agg(count(lit(1)).as("u_view"))
      .crossJoin(c.agg(count(lit(1)).as("u_click")))
      .crossJoin(p.agg(count(lit(1)).as("u_purchase")))
    counts.select(expr(
        """stack(3, 1, 'view', u_view, cast(null as bigint),
          |         2, 'click', u_click, u_view,
          |         3, 'purchase', u_purchase, u_click)
          |as (step, event_type, users, prev_users)""".stripMargin))
      .select($"step", $"event_type", $"users",
        round($"users".cast("double") / $"prev_users".cast("double"), 4)
          .as("conversion"))
  }

  /** q161 — population-stability drift monitor (PSI, the standard "did
    * my feature distribution move between snapshots" score): event
    * values bucket into 10 equal-width bins over the GLOBAL range, the
    * month's two halves are compared, and each bin contributes
    * (p - q) * ln(p / q) with +1/+10 Laplace smoothing (no empty-bin
    * infinities). Everything after the one bucket-keyed census is
    * 10-row arithmetic; the bounds cross as a broadcast scalar row.
    * PSI > 0.2 on any feature is the classic retrain/investigate
    * trigger; the fixture's uniform halves sit near 0. */
  def q161PsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select($"ts", $"value")
    val bounds = ev.agg(min($"value").as("mn"), max($"value").as("mx"))
    val bucketed = ev.crossJoin(broadcast(bounds))
      .select(when(dayofmonth($"ts") <= 15, "p1").otherwise("p2").as("period"),
        least(lit(9L), floor(($"value" - $"mn") / ($"mx" - $"mn") * 10)).as("bucket"))
    val counts = bucketed.groupBy($"bucket")
      .agg(sum(when($"period" === "p1", 1L).otherwise(0L)).as("n_p1"),
        sum(when($"period" === "p2", 1L).otherwise(0L)).as("n_p2"))
    val tot = counts.agg(sum($"n_p1").as("t1"), sum($"n_p2").as("t2"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p", ($"n_p1" + 1).cast("double") / ($"t1" + 10).cast("double"))
      .withColumn("q", ($"n_p2" + 1).cast("double") / ($"t2" + 10).cast("double"))
      .select($"bucket", $"n_p1", $"n_p2",
        round($"p", 6).as("p1_share"), round($"q", 6).as("p2_share"),
        round(($"p" - $"q") * log($"p" / $"q"), 6).as("psi_term"))
  }

  /** q167 — gap-timeout sessionization (the clickstream islands every
    * analytics engine ships as a primitive): a user's events split into
    * sessions wherever the gap to the previous event exceeds 30 minutes.
    * Classic gaps-and-islands — lag flags session starts, a running sum
    * numbers them, one census per (user, session). Both windows partition
    * by user_id (never global), so the shuffle is one hash exchange on
    * user and scale is bounded by the hottest user, not the stream; a
    * pathological single-user firehose would salt by day first. Sums of
    * the double `value` column ride decimal(12,2) so the session total is
    * addition-order-independent cross-engine (q115 precedent). Streaming
    * twin: [[graft.streaming.Streams.sessionize]] (event-time state,
    * parity-spec'd against this query). */
  def q167Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val gapMs = 1800000L
    events(spark, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"), $"value")
      .withColumn("new_s",
        when(lag($"ms", 1).over(w).isNull ||
          $"ms" - lag($"ms", 1).over(w) > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"new_s").over(run))
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"),
        min($"ms").as("start_ms"), max($"ms").as("end_ms"),
        (max($"ms") - min($"ms")).as("duration_ms"),
        sum($"value".cast("decimal(12,2)")).cast("double").as("sum_value"))
  }

  /** q160 — retention cohort matrix: users grouped by their first active
    * day; for every (cohort day, day offset) the number of cohort
    * members active that day. Day-distinct activity first (one shuffle),
    * then a (user)-keyed join against the cohort table — the offset
    * census is bounded by days^2 however large the event stream. */
  def q160RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select($"user_id", to_date($"ts").as("d"))
    val cohort = ev.groupBy($"user_id").agg(min($"d").as("cohort_day"))
    val active = ev.distinct()
    active.join(cohort, "user_id")
      .groupBy($"cohort_day", datediff($"d", $"cohort_day").cast("long").as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** q197 — interval-overlap self-join ([[graft.operators.Intervals
    * .overlapPairs]]): events become half-open intervals
    * [ts, ts + value seconds); per user, how many pairs overlap and
    * for how long. Spark runs the scalable bucketed form (equi-join on
    * (user, 10-minute bucket), pair counted only in the later start's
    * bucket); the oracle replays the naive inequality join — identical
    * pair set by construction. Millis + round(value*1000) keep every
    * quantity integral; value's 2-decimal money-style doubles make
    * round(value*1000) exact on both engines. */
  def q197IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val iv = events(spark, dir).select($"user_id", $"event_id",
      unix_millis($"ts").as("s"),
      (unix_millis($"ts") + round($"value" * 1000).cast("long")).as("e"))
    graft.operators.Intervals
      .overlapPairs(iv, "user_id", "event_id", "s", "e", 600000L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"overlap").as("overlap_ms"),
        max($"overlap").as("max_overlap_ms"))
  }

  /** q200 — order-1 Markov transition census ([[graft.operators
    * .Sequences.transitionCensus]]): per-user event streams ordered by
    * (epoch-ms, event_id) yield (prev_type, type) counts and the
    * row-conditional transition probabilities — integer counts plus
    * ONE division, so the matrix replays bit-identically. Epoch-ms
    * ordering (not raw ts) keeps tie order engine-agnostic. */
  def q200EventTransitions(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.transitionCensus(
      events(spark, dir).withColumn("ms", unix_millis($"ts")),
      "user_id", Seq($"ms", $"event_id"), "event_type")

  /** q235 — grouped exact quantiles
    * ([[graft.operators.Quantiles.groupedQuantilesDisc]]): p50/p95 of
    * event value (quantized to cents — the census-boundedness rule)
    * per (event_type, hour-of-day) — the latency-dashboard shape with
    * no per-group sort and no value buffering, every probability in
    * ONE census pass. quantile_disc rank arithmetic replays exactly;
    * all values are integers. */
  def q235GroupedQuantiles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.groupedQuantilesDisc(
        events(spark, dir).select($"event_type", hour($"ts").as("hod"),
          round($"value" * 100).cast("long").as("cents")),
        Seq("event_type", "hod"), "cents", ps = Seq(0.5, 0.95))
      .select($"event_type", $"hod", $"p", $"value".as("cents"))

  /** q238 — CUSUM drift alarms
    * ([[graft.operators.ChangePoint.cusumSummary]]): per event type,
    * the one-sided CUSUM over its daily-count series against its own
    * mean (slack 2, alarm at 50) — sustained volume shifts surface as
    * (n_alarms, first_alarm, max_stat) long before any single day
    * crosses a fixed threshold. The day census is the only row-scale
    * aggregation; the fold replays field-for-field in DuckDB. */
  def q238CusumDrift(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.ChangePoint.cusumSummary(
        daily, "event_type", "day", "x", slack = 2.0, threshold = 50.0)
      .select($"event_type", $"n_obs", round($"mean", 6).as("mean"),
        $"n_alarms", $"first_alarm", round($"max_stat", 6).as("max_stat"))
  }

  /** q231 — cohort retention triangle
    * ([[graft.operators.Cohorts.retentionRates]]): users bucketed by
    * first-seen day, distinct returners per day offset, rates as one
    * exact integer division per cell. Two integer censuses, output
    * bounded by days² — the population-level engagement complement to
    * q159's funnel and q37's sessions. */
  def q231Retention(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Cohorts.retentionRates(
        events(spark, dir), "user_id", to_date($"ts"))
      .select(date_format($"cohort_day", "yyyy-MM-dd").as("cohort_day"),
        $"day_offset", $"n_users", $"cohort_size",
        round($"retention", 6).as("retention"))

  /** q228 — behavioral anomaly scoring
    * ([[graft.operators.Sequences.sequenceSurprise]]): each user's mean
    * −ln p(curr|prev) under the corpus transition MLE (q200's census as
    * a model) — high scores are flows the population rarely takes. The
    * per-user term fold runs in (ms, event_id) order on both engines
    * (q121's in-order-fold precedent), the mean is one division, and
    * the VARCHAR→DECIMAL round bridge mirrors Spark's BigDecimal
    * rounding in the oracle. */
  def q228SequenceSurprise(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.sequenceSurprise(
        events(spark, dir).select($"user_id", unix_millis($"ts").as("ms"),
          $"event_id", $"event_type"),
        "user_id", Seq("ms", "event_id"), "event_type")
      .select($"user_id", $"n_trans",
        round($"mean_surprise", 4).as("mean_surprise"))

  /** q208 — nearest as-of join ([[graft.operators.Joins.asOfNearest]]):
    * every error event picks the closest click (either direction, ties
    * to the prior one) of the same user — merge_asof
    * direction='nearest', the diagnosis join backward-only as-of can't
    * express. Clicks are pre-reduced to one row per (user, ms) so the
    * window fill is deterministic; all ts math is integer epoch-ms.
    * The oracle replays with correlated min/max + the same pick rule. */
  def q208AsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select($"user_id", $"event_id",
      unix_millis($"ts").as("ms"), $"value", $"event_type")
    val l = ev.where($"event_type" === "error")
      .select($"user_id", $"event_id", $"ms".as("err_ms"), $"value".as("err_value"))
    val r = ev.where($"event_type" === "click")
      .groupBy($"user_id", $"ms").agg(max($"value").as("click_value"))
    graft.operators.Joins.asOfNearest(l, r, Seq("user_id"),
      "err_ms", "ms", Seq("click_value"))
  }

  /** q201 — peak concurrency per event type ([[graft.operators
    * .Intervals.sweepPeak]]): the maximum number of simultaneously
    * open [ts, ts + value s) intervals, swept in two phases (per-slice
    * prefix sums + a carry roll-up over slice totals) so no single
    * task ever orders a whole key's history. Pure +1/-1 integer
    * arithmetic; the oracle replays a single global sweep per type —
    * equal by the prefix-sum decomposition. */
  def q201PeakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val iv = events(spark, dir).select($"event_type", $"event_id",
      unix_millis($"ts").as("s"),
      (unix_millis($"ts") + round($"value" * 1000).cast("long")).as("e"))
    graft.operators.Intervals
      .sweepPeak(iv, "event_type", "s", "e", 86400000L)
      .select($"event_type", $"n_intervals", $"peak".cast("long").as("peak_concurrency"))
  }

  /** q239 — two-sample KS drift ([[graft.operators.Divergence
    * .ksTwoSample]]): did the event-value distribution move between
    * the first and second half of the month? Values quantize to cents
    * (the census-boundedness rule), the max-gap scan runs over integer
    * cross-products |A(v)·n_b − B(v)·n_a| — exact argmax, one terminal
    * division — and the cumulative walk is range-bucketed (never a
    * one-partition window). The oracle replays the plain global
    * cumulative, equal by the prefix-sum decomposition. */
  def q239KsDrift(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.ksTwoSample(
        events(spark, dir).select(
          round($"value" * 100).cast("long").as("cents"), $"ts"),
        "cents", $"ts" >= lit("2024-01-16 00:00:00").cast("timestamp"))
      .select($"n_a", $"n_b", $"n_values", $"d_num", round($"d", 6).as("d"))

  /** q240 — autocorrelation function ([[graft.operators.Autocorr
    * .acf]]): per event type, lag-1..7 serial correlation of the daily
    * event-count series — does volume carry momentum the drift
    * monitors must baseline out? Lagged pairs come from ONE per-key
    * window pass (no self-join); every moment is an integer sum and
    * r_k is one exact-integer ratio, so the oracle replay needs no
    * float-fold ordering at all. */
  def q240Acf(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Autocorr.acf(daily, "event_type", "day", "x", maxLag = 7)
      .select($"event_type", $"lag", $"n_obs", $"n_pairs",
        round($"r", 6).as("r"))
  }

  /** q242 — day-of-week seasonality profile ([[graft.operators
    * .Autocorr.seasonalityProfile]]): per (event type, weekday) the
    * day count, volume, mean, and lift over the type's all-days mean —
    * the exact rational (total·n_days_all)/(n_days·total_all), one
    * division per cell. Spark's dayofweek is 1=Sunday..7; the oracle
    * shifts DuckDB's 0-based dayofweek by one. */
  def q242Seasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Autocorr.seasonalityProfile(
        daily, "event_type", dayofweek($"day"), "x")
      .select($"event_type", $"dow", $"n_days", $"total",
        round($"mean", 6).as("mean"), round($"lift", 6).as("lift"))
  }

  /** q255 — Kaplan–Meier retention ([[graft.operators.Survival
    * .kaplanMeier]]): per-user activity span in days (first→last
    * event), an endpoint OBSERVED when the user went quiet ≥ 7 days
    * before the window's end, censored otherwise — the estimator that
    * reads right-truncated windows honestly where q231's triangle
    * calls every late joiner churned. Survival folds in duration
    * order over exact (1 − dᵢ/nᵢ) factors. */
  def q255KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val spans = events(spark, dir)
      .groupBy($"user_id")
      .agg(min(to_date($"ts")).as("first_d"), max(to_date($"ts")).as("last_d"))
    val horizon = spans.agg(max($"last_d").as("wend"))
    val subjects = spans.crossJoin(broadcast(horizon))
      .select(datediff($"last_d", $"first_d").as("dur"),
        when(datediff($"wend", $"last_d") >= 7, 1).otherwise(0).as("ev"))
    graft.operators.Survival.kaplanMeier(subjects, "dur", "ev")
      .select($"dur", $"n_obs", $"n_events", $"n_risk",
        round($"survival", 6).as("survival"))
  }

  /** q351 — Nelson–Aalen hazard ([[graft.operators.Survival
    * .nelsonAalen]]): the q255 retention cohort read as CUMULATIVE
    * RISK — Σ dᵢ/nᵢ in duration order, plus the Fleming–Harrington
    * exp(−H) whose gap to KM flags thin risk sets. */
  def q351NelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    val spans = events(spark, dir)
      .groupBy($"user_id")
      .agg(min(to_date($"ts")).as("first_d"), max(to_date($"ts")).as("last_d"))
    val horizon = spans.agg(max($"last_d").as("wend"))
    val subjects = spans.crossJoin(broadcast(horizon))
      .select(datediff($"last_d", $"first_d").as("dur"),
        when(datediff($"wend", $"last_d") >= 7, 1).otherwise(0).as("ev"))
    graft.operators.Survival.nelsonAalen(subjects, "dur", "ev")
      .select($"dur", $"n_obs", $"n_events", $"n_risk",
        round($"cum_hazard", 6).as("cum_hazard"),
        round($"fh_survival", 6).as("fh_survival"))
  }

  /** q352 — UCB1 allocation ([[graft.operators.Eval.ucbAllocation]]):
    * treating the five event types as arms with hit = value > 50 per
    * day-of-week scope — which arm an optimism-under-uncertainty
    * allocator pulls next; exact counts, pinned √/ln bonus. */
  def q352UcbAllocation(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.ucbAllocation(
      events(spark, dir).select(
        dayofweek(to_date($"ts")).cast("int").as("dow"), $"event_type",
        ($"value" > 50.0).cast("long").as("hit")),
      "dow", "event_type", "hit")
      .select($"sc".as("dow"), $"arm".as("event_type"), $"n",
        round($"mean", 6).as("mean"), round($"bonus", 6).as("bonus"),
        round($"ucb", 6).as("ucb"), $"chosen")

  /** q354 — Jarque–Bera normality census ([[graft.operators.Divergence
    * .jarqueBera]]): per event type on cent values — the gate before
    * any normal-theory readout; exact S₁..S₄ power sums, closed-form
    * χ²(2) p = exp(−JB/2). */
  def q354JarqueBera(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.jarqueBera(
      events(spark, dir).select($"event_type",
        round($"value" * 100).cast("long").as("cents")),
      "event_type", "cents")
      .select($"g".as("event_type"), $"n",
        round($"skewness", 6).as("skewness"),
        round($"kurtosis", 6).as("kurtosis"),
        round($"jb", 6).as("jb"), round($"p_value", 6).as("p_value"))

  /** q355 — Durbin–Watson serial correlation ([[graft.operators
    * .Autocorr.durbinWatson]]): per event type over the (ts, event_id)-
    * ordered cent series — is there lag-1 structure the drift monitors
    * must model? Exact Σ(Δy)² numerator, one terminal division. */
  def q355DurbinWatson(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Autocorr.durbinWatson(
      events(spark, dir).select($"event_type",
        struct($"ts", $"event_id").as("ord"),
        round($"value" * 100).cast("long").as("cents")),
      "event_type", "ord", "cents")
      .select($"event_type", $"n", round($"dw", 6).as("dw"),
        round($"rho", 6).as("rho"))

  /** q356 — chi-square independence with exact even-df p
    * ([[graft.operators.Divergence.chiSquareIndependence]]): is event
    * type independent of day-of-week? df = 4·6 = 24 even, so the
    * Poisson-sum survival function is exact — the significance
    * companion to the q295 Cramér's V effect size. */
  def q356ChiSquare(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.chiSquareIndependence(
      events(spark, dir).select($"event_type",
        dayofweek(to_date($"ts")).cast("int").as("dow")),
      "event_type", "dow")
      .select($"n", $"r", $"c", $"df", round($"chi2", 6).as("chi2"),
        round($"p_value", 6).as("p_value"))

  /** q358 — EWMA control chart ([[graft.operators.ChangePoint
    * .ewmaChart]]): per event type over the daily count census —
    * λ=0.2, L=3 with time-varying early limits; the per-period breach
    * trace the summary monitors (q238/q359) can't produce. */
  def q358EwmaChart(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.ChangePoint.ewmaChart(
        daily, "event_type", "day", "x", lambda = 0.2, limit = 3.0)
      .select($"event_type", $"o".as("day"), $"x",
        round($"z", 6).as("z"), round($"ucl", 6).as("ucl"),
        round($"lcl", 6).as("lcl"), $"breach")
  }

  /** q359 — Page–Hinkley drift monitor ([[graft.operators.ChangePoint
    * .pageHinkley]]): the self-tuning companion to the q238 CUSUM on
    * the same daily census — departures from the RUNNING mean, no
    * calibration target needed. */
  def q359PageHinkley(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.ChangePoint.pageHinkley(
        daily, "event_type", "day", "x", delta = 1.0, threshold = 25.0)
      .select($"event_type", $"n_obs", $"n_alarms", $"first_alarm",
        round($"max_stat", 6).as("max_stat"), round($"ph_end", 6).as("ph_end"))
  }

  /** q362 — Holt–Winters additive forecast ([[graft.operators.Forecast
    * .holtWintersSummary]]): q243's Holt plus a 7-slot day-of-week
    * seasonal state over the daily count census — two-season pinned
    * init, recursive-CTE oracle replay. */
  def q362HoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Forecast.holtWintersSummary(
        daily, "event_type", "day", "x", period = 7,
        alpha = 0.5, beta = 0.25, gamma = 0.25, horizon = 7)
      .select($"event_type", $"n_obs", round($"level", 6).as("level"),
        round($"trend", 6).as("trend"), round($"seasonal", 6).as("seasonal"),
        round($"forecast", 6).as("forecast"))
  }

  /** q366 — Mann–Kendall trend test ([[graft.operators.Regression
    * .mannKendall]]): is the daily volume of each event type
    * monotonically trending — the significance gate before quoting the
    * q265 Theil–Sen slope; exact pair-sign sums, tie-corrected
    * variance. */
  def q366MannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Regression.mannKendall(daily, "event_type", "day", "x")
      .select($"g".as("event_type"), $"n", $"s",
        round($"var_s", 6).as("var_s"), round($"z", 6).as("z"))
  }

  /** q368 — Hurst exponent by R/S ([[graft.operators.Autocorr
    * .hurstRs]]): long-memory profile of the hourly volume series per
    * event type — exact integer ranges and variances per block, dyadic
    * windows 8..64, OLS slope on the log-log curve. */
  def q368Hurst(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Autocorr.hurstRs(hourly, "event_type", "hour", "x")
      .select($"event_type", $"w", $"n_blocks",
        round($"avg_rs", 6).as("avg_rs"), round($"hurst", 6).as("hurst"))
  }

  /** q369 — SAX motif census ([[graft.operators.Sax.motifCensus]]):
    * the hourly volume series symbolized (z-norm → 6-hour PAA →
    * quartile alphabet) and mined for 3-symbol motifs — recurring
    * intra-day shapes as a plain census. */
  def q369SaxMotifs(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Sax.motifCensus(hourly, "event_type", "hour", "x",
        seg = 6, word = 3)
      .select($"event_type", $"word", $"n")
  }

  /** q370 — Croston intermittent-demand forecast ([[graft.operators
    * .Forecast.croston]]): per-user activity rate from the sparse
    * active-day census — sizes and intervals smoothed separately,
    * the right forecaster where Holt smears zeros. */
  def q370Croston(spark: SparkSession, dir: String): DataFrame = {
    val active = events(spark, dir)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("d"))
    graft.operators.Forecast.croston(active, "user_id", "day", "d")
      .select($"user_id", $"n_demands", round($"z", 6).as("z"),
        round($"p", 6).as("p"), round($"rate", 6).as("rate"))
  }

  /** q372 — burstiness coefficient ([[graft.operators.Intervals
    * .burstiness]]): per-user (σ−μ)/(σ+μ) of inter-event gaps — the
    * one-number cadence fingerprint (metronome −1, Poisson 0, bursts
    * +1); exact gap moments. */
  def q372Burstiness(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Intervals.burstiness(
      events(spark, dir).select($"user_id", unix_millis($"ts").as("ms")),
      "user_id", "ms")
      .select($"user_id", $"n_gaps",
        round($"mean_gap_ms", 6).as("mean_gap_ms"), round($"b", 6).as("b"))

  /** q374 — Ljung–Box whiteness test ([[graft.operators.Autocorr
    * .ljungBox]]): joint serial-correlation gate over the first 6 lags
    * of the daily series — the one-number readout of the q240 ACF
    * profile, with the exact even-df χ² p. */
  def q374LjungBox(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Autocorr.ljungBox(daily, "event_type", "day", "x",
        maxLag = 6)
      .select($"event_type", $"n_obs", $"k_lags",
        round($"q_stat", 6).as("q_stat"), round($"p_value", 6).as("p_value"))
  }

  /** q375 — Wald–Wolfowitz runs test ([[graft.operators.Autocorr
    * .runsTest]]): is daily volume random about its own mean — the
    * distribution-free regime detector; exact run counts, pinned
    * moments. */
  def q375RunsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Autocorr.runsTest(daily, "event_type", "day", "x")
      .select($"event_type", $"n", $"n_above", $"n_below", $"runs",
        round($"expected_runs", 6).as("expected_runs"),
        round($"z", 6).as("z"))
  }

  /** q376 — Kaplan–Meier with Greenwood bands ([[graft.operators
    * .Survival.kaplanMeierCI]]): the q255 retention curve with its
    * honest uncertainty — Greenwood variance folded beside the
    * survival product, linear 95% band clamped to [0,1]. */
  def q376KaplanMeierCI(spark: SparkSession, dir: String): DataFrame = {
    val spans = events(spark, dir)
      .groupBy($"user_id")
      .agg(min(to_date($"ts")).as("first_d"), max(to_date($"ts")).as("last_d"))
    val horizon = spans.agg(max($"last_d").as("wend"))
    val subjects = spans.crossJoin(broadcast(horizon))
      .select(datediff($"last_d", $"first_d").as("dur"),
        when(datediff($"wend", $"last_d") >= 7, 1).otherwise(0).as("ev"))
    graft.operators.Survival.kaplanMeierCI(subjects, "dur", "ev")
      .select($"dur", $"n_obs", $"n_events", $"n_risk",
        round($"survival", 6).as("survival"), round($"se", 6).as("se"),
        round($"lo", 6).as("lo"), round($"hi", 6).as("hi"))
  }

  /** q379 — partial autocorrelation ([[graft.operators.Autocorr
    * .pacf]]): Durbin–Levinson over the q240 ACF — does the daily
    * series carry structure beyond lag 1? The AR-order readout. */
  def q379Pacf(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Autocorr.pacf(daily, "event_type", "day", "x", maxLag = 6)
      .select($"event_type", $"lag", round($"pacf", 6).as("pacf"))
  }

  /** q381 — pinball loss of a P90 forecast ([[graft.operators.Eval
    * .pinballLoss]]): train-window exact P90 cents per event type
    * scored against the test window under τ = 9/10 — the proper
    * scoring rule that makes a quantile claim auditable; all-integer
    * census, one terminal division. */
  def q381Pinball(spark: SparkSession, dir: String): DataFrame = {
    val cents = events(spark, dir).select($"event_type",
      round($"value" * 100).cast("long").as("cents"), $"ts")
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    val qhat = graft.operators.Quantiles.groupedQuantilesDisc(
        cents.where($"ts" < split), Seq("event_type"), "cents", Seq(0.9))
      .select($"event_type", $"value".as("qhat"))
    graft.operators.Eval.pinballLoss(
        cents.where($"ts" >= split), qhat, "event_type", "cents", "qhat",
        tauNum = 9L, tauDen = 10L)
      .select($"g".as("event_type"), $"n", $"qhat", $"over_sum",
        $"under_sum", round($"pinball_mean", 6).as("pinball_mean"))
  }

  /** q382 — trimmed mean at census grain ([[graft.operators.Robust
    * .trimmedMean]]): 5%-trimmed cent mean per event type — rank
    * trimming as exact integer interval overlaps on the value census,
    * no row sort. */
  def q382TrimmedMean(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Robust.trimmedMean(
      events(spark, dir).select($"event_type",
        round($"value" * 100).cast("long").as("cents")),
      "event_type", "cents", alphaNum = 5L, alphaDen = 100L)
      .select($"g".as("event_type"), $"n", $"n_trimmed",
        round($"trimmed_mean", 6).as("trimmed_mean"))

  /** q388 — log-rank survival comparison ([[graft.operators.Survival
    * .logRank]]): does the odd-user cohort churn at a different hazard
    * than the even cohort, censoring-aware — the A/B the q255 curves
    * can't answer jointly; exact censuses, pinned erfc p. */
  def q388LogRank(spark: SparkSession, dir: String): DataFrame = {
    val spans = events(spark, dir)
      .groupBy($"user_id")
      .agg(min(to_date($"ts")).as("first_d"), max(to_date($"ts")).as("last_d"))
    val horizon = spans.agg(max($"last_d").as("wend"))
    val subjects = spans.crossJoin(broadcast(horizon))
      .select(datediff($"last_d", $"first_d").as("dur"),
        when(datediff($"wend", $"last_d") >= 7, 1).otherwise(0).as("ev"),
        ($"user_id" % 2 === 1).as("odd"))
    graft.operators.Survival.logRank(subjects, "dur", "ev", $"odd")
      .select($"n_a", $"n_b", $"o_a", round($"e_a", 6).as("e_a"),
        round($"var_lr", 6).as("var_lr"), round($"chi2", 6).as("chi2"),
        round($"p", 6).as("p"))
  }

  /** q256 — activity power-law fit ([[graft.operators.Profile
    * .powerLawAlpha]]): the Clauset MLE exponent of the
    * events-per-user distribution — how heavy is the user-activity
    * tail. One user census feeds the (activity, count) census; the
    * only float work is the in-order Σ c·ln(v/½) fold. */
  def q256PowerLaw(spark: SparkSession, dir: String): DataFrame = {
    val activity = events(spark, dir).groupBy($"user_id")
      .agg(count(lit(1)).as("a"))
      .groupBy($"a").agg(count(lit(1)).as("c"))
    graft.operators.Profile.powerLawAlpha(activity, "a", "c", vmin = 1L)
      .select($"n", $"vmin", round($"alpha", 6).as("alpha"))
  }

  /** q257 — session path mining ([[graft.operators.Sequences
    * .sessionPaths]]): the 20 most common event-type flows over
    * 30-minute gap sessions, each session truncated to its first 8
    * states so the path vocabulary stays bounded. (count desc, path)
    * integer/string ordering; one window pass for session ids. */
  def q257SessionPaths(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.sessionPaths(
      events(spark, dir).select($"user_id", unix_millis($"ts").as("ms"),
        $"event_id", $"event_type"),
      "user_id", "ms", "event_id", "event_type",
      gapMs = 1800000L, maxLen = 8, topK = 20)

  /** q258 — rolling burst audit ([[graft.operators.Intervals
    * .rollingBurst]]): the 100 users with the highest event count in
    * ANY trailing 60 s window — the exact rate-limit answer a
    * fixed-minute census gets wrong on boundary-straddling bursts.
    * One RANGE-frame window pass per key; all-integer ranking. */
  def q258RollingBurst(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Intervals.rollingBurst(
      events(spark, dir).select($"user_id", unix_millis($"ts").as("ms")),
      "user_id", "ms", windowMs = 60000L, topK = 100)

  /** q259 — chain stationary distribution ([[graft.operators.Sequences
    * .stationaryDistribution]]): where the event-type flow settles —
    * 12 fixed-point power-iteration rounds over q200's transition
    * census with per-round L1 renormalization, every mass an exact
    * integer sum (the q245 HITS discipline on a 5-state chain). */
  def q259Stationary(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.stationaryDistribution(
        events(spark, dir).select($"user_id", unix_millis($"ts").as("ms"),
          $"event_id", $"event_type"),
        "user_id", Seq($"ms", $"event_id"), "event_type", iterations = 12)
      .select($"state", round($"pi", 6).as("pi"))

  /** q260 — Spearman rank correlation ([[graft.operators.Regression
    * .spearman]]): per event type, the monotone dependence between
    * event value (cents) and hour-of-day — Pearson on DOUBLED integer
    * mid-ranks (ties never float, the 2× cancels in ρ), moments exact
    * through DECIMAL, two sqrts and one division at the end. */
  def q260Spearman(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Regression.spearman(
        events(spark, dir).select($"event_type",
          round($"value" * 100).cast("long").as("cents"),
          hour($"ts").cast("long").as("hod")),
        Seq("event_type"), "cents", "hod")
      .select($"event_type", $"n", round($"rho", 6).as("rho"))

  /** q261 — Gumbel return levels ([[graft.operators.Extremes
    * .gumbelFit]]): per event type, fit the daily PEAK-minute counts
    * and read the once-per-10 / once-per-100-day burst levels — the
    * provisioning number a mean+3σ rule under-calls. Closed-form
    * method of moments on exact integer maxima sums; the float tail
    * is a fixed shape of correctly-rounded ops. */
  def q261GumbelExtremes(spark: SparkSession, dir: String): DataFrame = {
    val minuteCounts = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
        (unix_millis($"ts") / 60000L).cast("long").as("minute"))
      .agg(count(lit(1)).as("c"))
    val dailyPeak = minuteCounts.groupBy($"event_type", $"day")
      .agg(max($"c").as("peak"))
    graft.operators.Extremes.gumbelFit(dailyPeak, "event_type", "peak",
        returnPeriods = Seq(10, 100))
      .select($"event_type", $"n", round($"mean", 6).as("mean"),
        round($"beta", 6).as("beta"), round($"mu", 6).as("mu"),
        round($"rl_10", 6).as("rl_10"), round($"rl_100", 6).as("rl_100"))
  }

  /** q262 — RFM segmentation ([[graft.operators.Cohorts.rfmScores]]):
    * per user the recency/frequency/monetary features with 1..5
    * equal-frequency scores (census-bucketed, tie-runs atomic — the
    * q249 rule) and the composite segment code. The feature table
    * behind churn models and audience cuts. */
  def q262Rfm(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Cohorts.rfmScores(
      events(spark, dir).select($"user_id", to_date($"ts").as("d"),
        round($"value" * 100).cast("long").as("cents")),
      "user_id", $"d", "cents", buckets = 5)

  /** q263 — change-point localization ([[graft.operators.ChangePoint
    * .binarySegment]]): where each event type's daily volume broke —
    * the split maximizing (S₁n₂ − S₂n₁)²/(n·n₁·n₂) over all
    * prefix/suffix cuts. CUSUM (q238) detects; this locates. Exact
    * integer prefix sums, one fixed-shape double per candidate,
    * earliest-split tiebreak. */
  def q263BinarySegment(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.ChangePoint.binarySegment(daily, "event_type", "day", "x")
      .select($"event_type", $"n_obs", $"split_ord", $"n_before",
        round($"mean_before", 6).as("mean_before"),
        round($"mean_after", 6).as("mean_after"), round($"stat", 6).as("stat"))
  }

  /** q265 — Theil–Sen robust trend ([[graft.operators.Regression
    * .theilSen]]): median pairwise slope of each event type's daily
    * series — a wild day shifts it one rank where OLS would follow it
    * anywhere. Pairs are periods²-bounded; lower medians under total
    * (slope, i, j) order. */
  def q265TheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Regression.theilSen(daily, "event_type", "day", "x")
      .select($"event_type", $"n_obs", $"n_pairs",
        round($"slope", 6).as("slope"), round($"intercept", 6).as("intercept"))
  }

  /** q266 — seasonal decomposition ([[graft.operators.Autocorr
    * .seasonalDecompose]]): each event type's daily volume split into
    * centered-7-day trend, weekly shape, and residual — the
    * trend-vs-season-vs-one-off attribution the drift monitors
    * consume. Exact integer trend sums; seasonal means fold in day
    * order. */
  def q266SeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("x"))
      .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
        dayofweek($"d").as("dw"), $"x")
    graft.operators.Autocorr.seasonalDecompose(
        daily, "event_type", "day", $"dw", "x")
      .select($"event_type", $"day", $"value", round($"trend", 6).as("trend"),
        round($"seasonal", 6).as("seasonal"), round($"resid", 6).as("resid"))
  }

  /** q267 — session basket lift ([[graft.operators.Sequences
    * .basketLift]]): which event types co-occur in 30-minute sessions
    * beyond chance — session-distinct counts, exact integer
    * support/confidence/lift ratios, pair table bounded by sessions ×
    * types². */
  def q267BasketLift(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.basketLift(
        events(spark, dir).select($"user_id", unix_millis($"ts").as("ms"),
          $"event_id", $"event_type"),
        "user_id", "ms", "event_id", "event_type", gapMs = 1800000L)
      .select($"a", $"b", $"n_a", $"n_b", $"n_ab",
        round($"support", 6).as("support"),
        round($"confidence", 6).as("confidence"), round($"lift", 6).as("lift"))

  /** q268 — Pareto coverage ([[graft.operators.WeightedStats
    * .paretoCoverage]]): how many users carry 50/80/95% of all events —
    * the concentration readout a capacity plan acts on. Exact integer
    * prefix cuts over the (weight desc, user) order. */
  def q268ParetoCoverage(spark: SparkSession, dir: String): DataFrame =
    graft.operators.WeightedStats.paretoCoverage(
      events(spark, dir).select($"user_id", lit(1L).as("one")),
      "user_id", "one",
      cuts = Seq(("50", 1L, 2L), ("80", 4L, 5L), ("95", 19L, 20L)))

  /** q269 — cross-correlation lead/lag ([[graft.operators.Autocorr
    * .ccf]]): does error volume lead click volume? r_k over lags
    * −7..7 between the two daily series (union of days, zero-filled) —
    * a peak at positive k says errors lead by k days. Exact integer
    * moments; one fixed-shape double per lag. */
  def q269Ccf(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(sum(when($"event_type" === "error", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("y"))
    graft.operators.Autocorr.ccf(daily, "day", "x", "y", maxLag = 7)
      .select($"lag", $"n_obs", $"n_pairs", round($"r", 6).as("r"))
  }

  /** q270 — chain entropy rate ([[graft.operators.Sequences
    * .entropyRate]]): bits-per-event of genuine novelty in the
    * event-type flow — Σ πᵢ·Hᵢ over q259's stationary fixed point and
    * q200's conditional census; both entropy sums fold in sorted
    * order. */
  def q270EntropyRate(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sequences.entropyRate(
        events(spark, dir).select($"user_id", unix_millis($"ts").as("ms"),
          $"event_id", $"event_type"),
        "user_id", Seq($"ms", $"event_id"), "event_type", iterations = 12)
      .select($"n_states", $"n_transitions",
        round($"entropy_rate", 6).as("entropy_rate"))

  /** q272 — Wilson rate bounds ([[graft.operators.Eval
    * .wilsonBounds]]): per event type, the 95% Wilson interval of the
    * weekend share — the small-n-honest bounds an alert threshold
    * needs (Wald collapses at p ∈ {0,1}). Exact counts; one fixed
    * double shape per bound. */
  def q272WilsonBounds(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.wilsonBounds(
        events(spark, dir).select($"event_type",
          when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend")),
        "event_type", "wkend", z = 1.96)
      .select($"event_type", $"n", $"n_pos", round($"rate", 6).as("rate"),
        round($"lo", 6).as("lo"), round($"hi", 6).as("hi"))

  /** q273 — two-proportion z-test ([[graft.operators.Eval
    * .twoProportionZ]]): did each event type's error-ish share of
    * high-value events move between the month's halves — the A/B
    * rate companion to q180's Welch means test. */
  def q273TwoProportion(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.twoProportionZ(
        events(spark, dir).select($"event_type",
          when($"value" >= 100.0, 1).otherwise(0).as("hi_val"),
          ($"ts" >= lit("2024-01-16 00:00:00").cast("timestamp")).as("half")),
        "event_type", "hi_val", isB = $"half")
      .select($"event_type", $"n_a", $"pos_a", $"n_b", $"pos_b",
        round($"rate_a", 6).as("rate_a"), round($"rate_b", 6).as("rate_b"),
        round($"z", 6).as("z"))

  /** q251 — snapshot profile drift ([[graft.operators.Profile
    * .profileDiff]]): the first vs second half of the event stream as
    * two table versions — per column (event_type, user_id, props) the
    * null-rate delta, distinct-count shift, and mode churn. The
    * schema-shape drift report that runs before any row diff is
    * affordable; mode ties resolve to the lowest value (the profile
    * contract), so every cell is deterministic. */
  def q251ProfileDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    graft.operators.Profile.profileDiff(
        ev.where($"ts" < cut), ev.where($"ts" >= cut),
        Seq("event_type", "user_id", "props"))
      .select($"col_name", $"n_a", $"n_b", $"null_a", $"null_b",
        round($"null_rate_delta", 6).as("null_rate_delta"),
        $"distinct_a", $"distinct_b", $"mode_a", $"mode_b", $"mode_changed")
  }

  /** q252 — time-weighted mean ([[graft.operators.WeightedStats
    * .timeWeightedMean]]): per event type, the TWAP of the
    * cent-quantized value where each observation holds until the next
    * (ms, event_id) tick — sparse regimes weigh by duration, not tick
    * count. Integer weights from one lead window; one terminal
    * division. */
  def q252Twap(spark: SparkSession, dir: String): DataFrame =
    graft.operators.WeightedStats.timeWeightedMean(
        events(spark, dir).select($"event_type", unix_millis($"ts").as("ms"),
          round($"value" * 100).cast("long").as("cents"), $"event_id"),
        "event_type", "ms", "cents", tieCols = Seq("event_id"))
      .select($"event_type", $"n_obs", $"total_ms",
        round($"twap", 6).as("twap"))

  /** q248 — seasonally-adjusted anomalies ([[graft.operators.Autocorr
    * .seasonalAnomalies]]): per event type, the top-3 days by
    * |residual| against that WEEKDAY's own mean — Monday is allowed to
    * look like Monday before a day counts as unusual. Expected/resid
    * are one exact-integer division and one subtraction, so the
    * |residual| rank order is a float total order both engines agree
    * on bit-for-bit. */
  def q248SeasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("x"))
      .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
        dayofweek($"d").as("dw"), $"x")
    graft.operators.Autocorr.seasonalAnomalies(
        daily, "event_type", "day", $"dw", "x", topK = 3)
      .select($"event_type", $"day", $"value",
        round($"expected", 6).as("expected"), round($"resid", 6).as("resid"),
        $"rnk")
  }

  /** q249 — calibration curve ([[graft.operators.Eval
    * .calibrationCurve]]): per event type, 10 equal-frequency score
    * buckets of the cent-quantized value with observed weekend rate
    * next to mean score — the reliability diagram beside q191's AUC.
    * Buckets come from the census cumulative (tie-runs never split);
    * mean/rate are single exact-integer divisions. */
  def q249Calibration(spark: SparkSession, dir: String): DataFrame = {
    val scored = events(spark, dir).select($"event_type",
      round($"value" * 100).cast("long").as("cents"),
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend"))
    graft.operators.Eval.calibrationCurve(
        scored, "event_type", "wkend", "cents", buckets = 10)
      .select($"event_type", $"bucket", $"n", $"n_pos",
        round($"mean_score", 6).as("mean_score"),
        round($"pos_rate", 6).as("pos_rate"))
  }

  /** q243 — Holt level+trend forecast ([[graft.operators.Forecast
    * .holtSummary]]): per event type, double-exponential smoothing of
    * the daily count series (α=0.5, β=0.25 — exact binary doubles) and
    * the 7-days-out volume projection. The recurrence folds in period
    * order with a two-field state replayed field-for-field by
    * list_reduce; the NaN seed sentinel maps element 1 to (l=x₁, b=0)
    * on both engines. */
  def q243HoltForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Forecast.holtSummary(
        daily, "event_type", "day", "x", alpha = 0.5, beta = 0.25, horizon = 7)
      .select($"event_type", $"n_obs", round($"level", 6).as("level"),
        round($"trend", 6).as("trend"), round($"forecast", 6).as("forecast"))
  }

  /** q278 — ordered funnel census ([[graft.operators.Funnel]]): how many
    * users progressed view → click → purchase, each step strictly after
    * the event satisfying the previous one in (ts, type) order. One
    * entity-keyed exchange + an in-order fold per user; 4 output rows. */
  def q278Funnel(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.census(events(spark, dir),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"))

  /** q282 — Cohen's kappa ([[graft.operators.Eval.cohenKappa]]): two
    * deterministic synthetic raters over each event (value-bucket label
    * vs the same label parity-shifted on odd event ids) per event type.
    * One exact double division of integer censuses. */
  def q282CohenKappa(spark: SparkSession, dir: String): DataFrame = {
    val labeled = events(spark, dir).select($"event_type",
      (floor($"value").cast("long") % 3).as("rater_a"),
      ((floor($"value").cast("long") + ($"event_id" % 2)) % 3).as("rater_b"))
    graft.operators.Eval.cohenKappa(labeled, "event_type", "rater_a", "rater_b")
      .select($"g".as("event_type"), $"n_items", $"n_agree",
        round($"kappa", 6).as("kappa"))
  }

  /** q283 — Mann–Whitney U ([[graft.operators.Eval.mannWhitneyU]]):
    * weekend-vs-weekday value shift per event type on exact cent
    * values — the nonparametric companion to q180's Welch t. Doubled
    * mid-ranks keep every moment integral. */
  def q283MannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend"),
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.mannWhitneyU(s, "event_type", "wkend", "cents")
      .select($"g".as("event_type"), $"n_a", $"n_b", $"u2",
        round($"z", 6).as("z"))
  }

  /** q308 — Cliff's delta ([[graft.operators.Eval.cliffsDelta]]): the
    * effect size on q283's weekend-vs-weekday value split — same
    * doubled-U census, δ and its Romano magnitude band derived in
    * exact integer arithmetic (the band compares cross-multiplied
    * decimals, never floats). */
  def q308CliffsDelta(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend"),
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.cliffsDelta(s, "event_type", "wkend", "cents")
      .select($"g".as("event_type"), $"n_a", $"n_b", $"u2",
        round($"delta", 6).as("delta"), $"magnitude")
  }

  /** q309 — Cochran's Q ([[graft.operators.Eval.cochranQ]]): did the
    * five event types "succeed" (any value above 75) at the same rate
    * per user, honoring the user pairing — the k-treatment member of
    * the q300 McNemar family; all-integer moments, one division. */
  def q309CochranQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.cochranQ(
      events(spark, dir).select($"user_id", $"event_type",
        ($"value" > 75.0).cast("long").as("hit")),
      "user_id", "event_type", "hit")
      .select($"k", $"n_blocks", round($"q", 6).as("q"))

  /** q310 — Friedman test ([[graft.operators.Eval.friedman]]): rank
    * the five event types' cent totals within each complete user block
    * — the matched k-sample location test; doubled mid-ranks keep the
    * tie-corrected χ² an exact integer ratio. */
  def q310Friedman(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.friedman(
      events(spark, dir).select($"user_id", $"event_type",
        round($"value" * 100).cast("long").as("cents")),
      "user_id", "event_type", "cents")
      .select($"k", $"n_blocks", round($"chi2", 6).as("chi2"))

  /** q311 — Fleiss' kappa ([[graft.operators.Eval.fleissKappa]]): treat
    * each user's first four events (by ts, event_id) as four
    * categorical "ratings" of the user — do users concentrate in one
    * event type more than chance? Users with under four events are
    * dropped and counted; all moments exact integer rationals. */
  def q311FleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val first4 = events(spark, dir)
      .withColumn("__rn", row_number().over(w))
      .where($"__rn" <= 4)
    graft.operators.Eval.fleissKappa(first4, "user_id", "event_type", n = 4)
      .select($"n_raters", $"n_subjects", $"n_dropped", $"n_categories",
        round($"p_bar", 6).as("p_bar"), round($"p_e", 6).as("p_e"),
        round($"kappa", 6).as("kappa"))
  }

  /** q315 — Brier decomposition + ECE ([[graft.operators.Eval
    * .brierDecomposition]]): treat each event's cents-mod-101 as an
    * integer probability forecast of "weekend event" and audit it —
    * exact-integer brier/ece/uncertainty, bin-ordered folds for
    * reliability/resolution. */
  def q315BrierDecomp(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend"),
      (round($"value" * 100).cast("long") % 101L).as("prob"))
    graft.operators.Eval.brierDecomposition(s, "event_type", "wkend",
        "prob", scale = 100L, buckets = 10)
      .select($"g".as("event_type"), $"n", $"n_pos",
        round($"brier", 6).as("brier"), round($"ece", 6).as("ece"),
        round($"reliability", 6).as("reliability"),
        round($"resolution", 6).as("resolution"),
        round($"uncertainty", 6).as("uncertainty"))
  }

  /** q317 — Cramér–von Mises drift ([[graft.operators.Divergence
    * .cramerVonMises]]): the mean-square ECDF gap on q239's
    * month-half split — the battery member sensitive to "everything
    * moved a little"; all-integer numerator, one division. */
  def q317CramerVonMises(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.cramerVonMises(
        events(spark, dir).select(
          round($"value" * 100).cast("long").as("cents"), $"ts"),
        "cents", $"ts" >= lit("2024-01-16 00:00:00").cast("timestamp"))
      .select($"n_a", $"n_b", $"n_values", round($"t", 6).as("t"))

  /** q367 — Anderson–Darling drift ([[graft.operators.Divergence
    * .andersonDarling]]): the tail-weighted statistic on the same
    * before/after split as q239 KS and q317 CvM — edge drift alarms
    * here first; census-sorted fold, exact integer terms. */
  def q367AndersonDarling(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.andersonDarling(
        events(spark, dir).select(
          round($"value" * 100).cast("long").as("cents"), $"ts"),
        "cents", $"ts" >= lit("2024-01-16 00:00:00").cast("timestamp"))
      .select($"n_a", $"n_b", $"n_values", round($"a2", 6).as("a2"))

  /** q383 — energy distance drift ([[graft.operators.Divergence
    * .energyDistance]]): the metric-valued statistic on the q239
    * before/after split — cents of distributional displacement; exact
    * pair sums from sorted-prefix identities, never an O(n²) join. */
  def q383EnergyDistance(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.energyDistance(
        events(spark, dir).select(
          round($"value" * 100).cast("long").as("cents"), $"ts"),
        "cents", $"ts" >= lit("2024-01-16 00:00:00").cast("timestamp"))
      .select($"n_a", $"n_b", $"n_values", round($"e2", 6).as("e2"),
        round($"e", 6).as("e"))

  /** q384 — Gaussian-moment KL ([[graft.operators.Divergence
    * .gaussianKl]]): per-type two-moment drift vs the pooled corpus —
    * the closed-form dashboard number beside the census family;
    * deliberately location/scale-only. */
  def q384GaussianKl(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.gaussianKl(
      events(spark, dir).select($"event_type",
        round($"value" * 100).cast("long").as("cents")),
      "event_type", "cents")
      .select($"g".as("event_type"), $"n", round($"mean", 6).as("mean"),
        round($"variance", 6).as("variance"), round($"kl", 6).as("kl"))

  /** q318 — Jensen–Shannon drift ([[graft.operators.Divergence
    * .jensenShannon]]): per-source bounded symmetric divergence from
    * the corpus over the 256-bucket hashed token space — the
    * smoothing-free dashboard number next to q305's TV. */
  def q318JensenShannon(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    graft.operators.Divergence.jensenShannon(docs, "source", "text")
      .select($"grp".as("source"), $"n_tok", round($"js", 6).as("js"),
        round($"js_norm", 6).as("js_norm"))
  }

  /** q319 — Youden's J threshold ([[graft.operators.Eval
    * .youdenThreshold]]): the deployable cut on q315's cents-mod-101
    * forecast — argmax decided on cross-multiplied exact integers,
    * smallest-threshold tiebreak. */
  def q319Youden(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend"),
      (round($"value" * 100).cast("long") % 101L).as("prob"))
    graft.operators.Eval.youdenThreshold(s, "event_type", "wkend", "prob")
      .select($"g".as("event_type"), $"n_pos", $"n_neg", $"threshold",
        $"tp", $"fp", round($"j", 6).as("j"))
  }

  /** q321 — Fano dispersion ([[graft.operators.Profile
    * .dispersionIndex]]): per event type, is the daily arrival process
    * Poisson-like (D≈1) or bursty (D≫1)? Zero-days counted via the
    * global day census; all-integer D numerator. */
  def q321Dispersion(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.dispersionIndex(
      events(spark, dir).select($"event_type", to_date($"ts").as("day")),
      "event_type", "day")
      .select($"g".as("event_type"), $"n_periods", $"n_events",
        round($"mean", 6).as("mean"),
        round($"dispersion", 6).as("dispersion"))

  /** q322 — Poisson rate ratio ([[graft.operators.Eval.rateRatio]]):
    * per event type, weekend vs weekday events per ACTIVE day (the
    * operator's census-derived exposure convention) with the Wald
    * log-interval — the exposure-honest volume comparison. */
  def q322RateRatio(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.rateRatio(
      events(spark, dir).select($"event_type", $"ts",
        to_date($"ts").as("day")),
      "event_type", dayofweek(to_date($"ts")).isin(1, 7), "day")
      .select($"s".as("event_type"), $"n1", $"e1", $"n2", $"e2",
        round($"rate_ratio", 6).as("rate_ratio"),
        round($"lo", 6).as("lo"), round($"hi", 6).as("hi"))

  /** q323 — cumulative gains ([[graft.operators.Eval
    * .cumulativeGains]]): score-descending rank deciles of the
    * cents-mod-101 forecast vs the weekend label — capture rate and
    * lift per depth, exact integer walks. */
  def q323CumulativeGains(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend"),
      (round($"value" * 100).cast("long") % 101L).as("prob"))
    graft.operators.Eval.cumulativeGains(s, "event_type", "wkend",
        "prob", buckets = 10)
      .select($"g".as("event_type"), $"bucket", $"n", $"n_pos",
        $"cum_n", $"cum_pos", round($"gain", 6).as("gain"),
        round($"lift", 6).as("lift"))
  }

  /** q324 — Krippendorff's alpha ([[graft.operators.Eval
    * .krippendorffAlpha]]): every user's full event list as a
    * variable-length rating set — the missing-tolerant member of the
    * q282/q311 agreement family; n-class-bounded exact folds. */
  def q324Krippendorff(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.krippendorffAlpha(
      events(spark, dir).select($"user_id", $"event_type"),
      "user_id", "event_type")
      .select($"n_units", $"n_dropped", $"n_categories", $"n_ratings",
        round($"p_a", 6).as("p_a"), round($"p_e", 6).as("p_e"),
        round($"alpha", 6).as("alpha"))

  /** q328 — split conformal ([[graft.operators.Eval.splitConformal]]):
    * per event type, the 90% conformal radius from an 80% md5
    * calibration split of |cents − 5000| residuals, plus the held-out
    * coverage — exact order-statistic q̂, exact coverage fraction. */
  def q328Conformal(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select($"event_type",
      substring(md5($"event_id".cast("string")), 1, 2).as("h"),
      abs(round($"value" * 100).cast("long") - 5000L).as("resid"))
    graft.operators.Eval.splitConformal(e, "event_type", $"h" < "cc",
        "resid", alphaMilli = 100L)
      .select($"g".as("event_type"), $"n_calib", $"n_test", $"k", $"qhat",
        round($"coverage", 6).as("coverage"))
  }

  /** q329 — MASE ([[graft.operators.Forecast.mase]]): score the lag-7
    * seasonal-naive forecast of daily cent totals against the lag-1
    * naive bar, per event type — the scale-free "does the forecast
    * beat yesterday" number; all-integer sums, one division. */
  def q329Mase(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    val withF = daily.withColumn("f", lag($"cents", 7).over(w))
      .where($"f".isNotNull)
    graft.operators.Forecast.mase(withF, "event_type", "day", "cents", "f")
      .select($"k".as("event_type"), $"n", $"n_skipped", $"mae_num",
        $"naive_num", round($"mase", 6).as("mase"))
  }

  /** q331 — Wald SPRT ([[graft.operators.Eval.sprt]]): monitor
    * "value > 50" success rates day by day per event type against
    * H₀ p=0.4 vs H₁ p=0.5 at α=β=0.05 — the anytime-valid stopping
    * walk; exact count walks, pinned-shape LLR, latched verdict. */
  def q331Sprt(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.sprt(
      events(spark, dir).select($"event_type", to_date($"ts").as("day"),
        ($"value" > 50.0).cast("long").as("hit")),
      "event_type", "day", "hit",
      p0Milli = 400L, p1Milli = 500L, alphaMilli = 50L, betaMilli = 50L)
      .select($"sc".as("event_type"), $"p".as("day"), $"n", $"successes",
        $"cum_n", $"cum_s", round($"llr", 6).as("llr"), $"state")

  /** q332 — CUPED adjustment ([[graft.operators.Eval.cuped]]): the
    * weekend-vs-weekday cents comparison re-estimated with the
    * coarse-dollar covariate — same diff, tighter variance; exact
    * pooled moments, fixed-shape combination. */
  def q332Cuped(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.cuped(
      events(spark, dir).select($"event_type",
        dayofweek(to_date($"ts")).isin(1, 7).as("wk"),
        floor($"value").cast("long").as("x"),
        round($"value" * 100).cast("long").as("y")),
      "event_type", $"wk", "x", "y")
      .select($"sc".as("event_type"), $"n_a", $"n_b",
        round($"mean_a", 6).as("mean_a"), round($"mean_b", 6).as("mean_b"),
        round($"theta", 6).as("theta"),
        round($"adj_mean_a", 6).as("adj_mean_a"),
        round($"adj_mean_b", 6).as("adj_mean_b"),
        round($"diff", 6).as("diff"), round($"adj_diff", 6).as("adj_diff"),
        round($"var_reduction", 6).as("var_reduction"))

  /** q333 — difference-in-differences ([[graft.operators.Eval
    * .diffInDiff]]): even-user "rollout" vs odd-user control, first
    * half-month pre vs second half post, on cent values per event
    * type — the level-and-trend-robust causal read; four exact cells,
    * pinned-shape Wald interval. */
  def q333DiffInDiff(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.diffInDiff(
      events(spark, dir).select($"event_type", $"user_id", $"ts",
        round($"value" * 100).cast("long").as("cents")),
      "event_type", $"user_id" % 2 === 0,
      $"ts" >= lit("2024-01-16 00:00:00").cast("timestamp"), "cents")
      .select($"sc".as("event_type"), $"n_tpre", $"n_tpost", $"n_cpre",
        $"n_cpost", round($"did", 6).as("did"), round($"lo", 6).as("lo"),
        round($"hi", 6).as("hi"))

  /** q334 — fixed-effect meta-analysis ([[graft.operators.Eval
    * .metaFixedEffect]]): pool the five event types' weekend-minus-
    * weekday cent effects with inverse-variance weights; Cochran's Q
    * and I² say whether pooling is even honest. Effects/variances from
    * exact per-stratum moments; stratum-ordered bounded folds. */
  def q334MetaAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val s = events(spark, dir).select($"event_type",
      when(dayofweek(to_date($"ts")).isin(1, 7), 1L).otherwise(0L).as("a"),
      round($"value" * 100).cast("long").as("y"))
    val g = s.groupBy($"event_type").agg(
      sum($"a").as("na"), sum(lit(1L) - $"a").as("nb"),
      sum(when($"a" === 1L, $"y").otherwise(0L)).cast(dec).as("sa"),
      sum(when($"a" === 0L, $"y").otherwise(0L)).cast(dec).as("sb"),
      sum(when($"a" === 1L, ($"y".cast(dec) * $"y".cast(dec)).cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as("qa"),
      sum(when($"a" === 0L, ($"y".cast(dec) * $"y".cast(dec)).cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as("qb"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val naD = $"na".cast(dec); val nbD = $"nb".cast(dec)
    val va = (naD * $"qa" - $"sa" * $"sa").cast(dec).cast("double") /
      (naD * (naD - 1)).cast(dec).cast("double")
    val vb = (nbD * $"qb" - $"sb" * $"sb").cast(dec).cast("double") /
      (nbD * (nbD - 1)).cast(dec).cast("double")
    val eff = g.where($"na" > 1L && $"nb" > 1L)
      .select($"event_type",
        (dd($"sa") / dd($"na") - dd($"sb") / dd($"nb")).as("effect"),
        (va / dd($"na") + vb / dd($"nb")).as("variance"))
    graft.operators.Eval.metaFixedEffect(eff, "event_type", "effect",
        "variance")
      .select($"k", round($"pooled", 6).as("pooled"),
        round($"se_pooled", 6).as("se_pooled"), round($"q", 6).as("q"),
        round($"i_squared", 6).as("i_squared"))
  }

  /** q335 — Welch's t ([[graft.operators.Eval.welchT]]): the
    * weekend-vs-weekday cent comparison with the unequal-variance t,
    * Welch–Satterthwaite df, and Cohen's d — the parametric companion
    * to q283's rank U and the per-stratum input q334 pools. Exact
    * per-arm moments; pinned-shape doubles. */
  def q335WelchT(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.welchT(
      events(spark, dir).select($"event_type",
        dayofweek(to_date($"ts")).isin(1, 7).as("wk"),
        round($"value" * 100).cast("long").as("cents")),
      "event_type", $"wk", "cents")
      .select($"sc".as("event_type"), $"n_a", $"n_b",
        round($"mean_a", 6).as("mean_a"), round($"mean_b", 6).as("mean_b"),
        round($"diff", 6).as("diff"), round($"t", 6).as("t"),
        round($"df", 6).as("df"), round($"cohen_d", 6).as("cohen_d"))

  /** q336 — one-way ANOVA F ([[graft.operators.Eval.anovaF]]): per
    * event type, does day-of-week explain cent values at all? k=7
    * calendar groups; exact cell moments, group-ordered float fold,
    * η² says how much of the variance the calendar buys. The moments
    * twin of q290's rank-based Kruskal–Wallis. */
  def q336AnovaF(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.anovaF(
      events(spark, dir).select($"event_type",
        dayofweek(to_date($"ts")).cast("int").as("dow"),
        round($"value" * 100).cast("long").as("cents")),
      "event_type", "dow", "cents")
      .select($"sc".as("event_type"), $"k", $"n",
        round($"ssb", 4).as("ssb"), round($"ssw", 4).as("ssw"),
        round($"f", 6).as("f"), round($"eta_sq", 6).as("eta_sq"))

  /** q337 — sequential rules ([[graft.operators.Association
    * .sequenceRules]]): which event type follows which within an hour,
    * per user — the directed, time-windowed sibling of q316's basket
    * rules; distinct-actor counts, single-division ratios, lift-ranked
    * top-k. Epoch-ms on both sides (unix_millis ↔ epoch_ms). */
  def q337SequenceRules(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Association.sequenceRules(
      events(spark, dir).select($"user_id", $"event_type",
        unix_millis($"ts").as("ms")),
      "user_id", "event_type", "ms",
      window = 3600L * 1000L, minSupport = 2L, k = 20)
      .select($"rank", $"item_a", $"item_b", $"n_actors", $"c_a", $"c_b",
        $"c_ab", round($"support", 6).as("support"),
        round($"conf", 6).as("conf"), round($"lift", 6).as("lift"))

  /** q338 — stratified ATE ([[graft.operators.Eval.stratifiedAte]]):
    * the even-vs-odd-user cent difference per event type,
    * subclassified on day-of-week — the naive difference and the
    * mix-adjusted one side by side, Wald interval from the stratum
    * folds. Completes the q332/q333 causal family. */
  def q338StratifiedAte(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.stratifiedAte(
      events(spark, dir).select($"event_type",
        dayofweek(to_date($"ts")).cast("int").as("dow"), $"user_id",
        round($"value" * 100).cast("long").as("cents")),
      "event_type", "dow", $"user_id" % 2 === 0, "cents")
      .select($"sc".as("event_type"), $"k_used", $"k_dropped", $"n",
        round($"naive_diff", 6).as("naive_diff"),
        round($"ate", 6).as("ate"), round($"lo", 6).as("lo"),
        round($"hi", 6).as("hi"))

  /** q339 — isotonic calibration ([[graft.operators.Calibrate
    * .isotonic]]): recalibrate a synthetic per-bin hit rate per event
    * type via the min-max identity — exact prefix sums, one division
    * per candidate block, order-free min/max. The monotone repair of
    * the curve q315's Brier decomposition prices. */
  def q339Isotonic(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Calibrate.isotonic(
      events(spark, dir).select($"event_type",
        floor($"value" / 5).cast("long").as("bin"),
        (($"user_id" + floor($"value").cast("long")) % 5 < 2)
          .cast("long").as("y")),
      "event_type", "bin", "y")
      .select($"sc".as("event_type"), $"bin", $"n", $"s",
        round($"rate", 6).as("rate"), round($"iso", 6).as("iso"))

  /** q340 — Bayesian A/B ([[graft.operators.Eval.bayesianAB]]): the
    * exact posterior P(weekend hit rate > weekday hit rate) per event
    * type under uniform priors — the log-space Beta-ratio sum on the
    * pinned-coefficient lgamma kernel, i-ordered fold, normal fallback
    * above the term cap (unexercised here: s_B + 1 ≤ 4096 at sf0.1). */
  def q340BayesianAB(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.bayesianAB(
      events(spark, dir).select($"event_type",
        !dayofweek(to_date($"ts")).isin(1, 7) as "wd",
        ($"value" > 50.0).cast("long").as("hit")),
      "event_type", $"wd", "hit")
      .select($"sc".as("event_type"), $"n_a", $"s_a", $"n_b", $"s_b",
        round($"mean_a", 6).as("mean_a"), round($"mean_b", 6).as("mean_b"),
        round($"p_b_gt_a", 6).as("p_b_gt_a"), $"method")

  /** q343 — pooled quantile normalization ([[graft.operators.Normalize
    * .quantileNormalize]]): per day-of-week, map every event type's
    * cent distribution onto the pooled cent scale — merged integer
    * censuses, exact ceil-rank arithmetic, zero floats. */
  def q343QuantileNorm(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Normalize.quantileNormalize(
      events(spark, dir).select(
        dayofweek(to_date($"ts")).cast("int").as("dow"), $"event_type",
        round($"value" * 100).cast("long").as("cents")),
      "dow", "event_type", "cents")
      .select($"sc".as("dow"), $"g".as("event_type"), $"v", $"n",
        $"v_norm")

  /** q344 — leave-one-group-out influence ([[graft.operators.Profile
    * .leaveOneOut]]): per event type, which user cohort (user_id mod
    * 10) drags the cent mean — closed-form moment subtraction, no
    * second pass. */
  def q344LeaveOneOut(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.leaveOneOut(
      events(spark, dir).select($"event_type",
        ($"user_id" % 10).as("cohort"),
        round($"value" * 100).cast("long").as("cents")),
      "event_type", "cohort", "cents")
      .select($"sc".as("event_type"), $"g".as("cohort"), $"n_g",
        round($"mean_g", 6).as("mean_g"),
        round($"mean_all", 6).as("mean_all"),
        round($"loo_mean", 6).as("loo_mean"),
        round($"delta_mean", 6).as("delta_mean"),
        round($"loo_var", 4).as("loo_var"))

  /** q347 — information-gain split ([[graft.operators.Eval
    * .infoGainSplit]]): per event type, the 5-cent bin that best
    * separates weekend from weekday events — exact cumulative counts,
    * pinned plogp entropies, (gain desc, v asc) argmax. */
  def q347InfoGainSplit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.infoGainSplit(
      events(spark, dir).select($"event_type",
        floor($"value" / 5).cast("long").as("bin"),
        dayofweek(to_date($"ts")).isin(1, 7).cast("long").as("wk")),
      "event_type", "bin", "wk")
      .select($"sc".as("event_type"), $"n", $"pos", $"threshold",
        $"n_left", $"pos_left", round($"gain", 6).as("gain"))

  /** q348 — Benjamini–Hochberg FDR ([[graft.operators.Eval
    * .benjaminiHochberg]]): the five event types' weekend-vs-weekday
    * two-proportion tests as a FAMILY — z from exact counts, two-sided
    * p via the pinned erfc kernel, step-up q-values, honest rejections
    * at α = 0.05. */
  def q348FdrBh(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).isin(1, 7).cast("long").as("a"),
      ($"value" > 50.0).cast("long").as("y"))
    val g = s.where($"y".isNotNull).groupBy($"event_type").agg(
      sum($"a").as("na"), sum(lit(1L) - $"a").as("nb"),
      sum(when($"a" === 1L, $"y").otherwise(0L)).as("sa"),
      sum(when($"a" === 0L, $"y").otherwise(0L)).as("sb"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val pa = dd($"sa") / dd($"na"); val pb = dd($"sb") / dd($"nb")
    val pp = dd($"sa" + $"sb") / dd($"na" + $"nb")
    val z = (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / dd($"na") + lit(1.0) / dd($"nb")))
    val tests = g.select($"event_type".as("test"),
      graft.functions.FastMath.erfc(abs(z) / lit(1.4142135623730951))
        .as("p"))
    graft.operators.Eval.benjaminiHochberg(tests, "test", "p", 0.05)
      .select($"test".as("event_type"), round($"p", 6).as("p"),
        $"rank", $"k", round($"q_value", 6).as("q_value"), $"reject")
  }

  /** q399 — Benjamini–Yekutieli FDR ([[graft.operators.Eval
    * .benjaminiYekutieli]]): q348's weekend-vs-weekday test family
    * under arbitrary dependence — the harmonic-inflated step-up walk;
    * every BY rejection is a BH rejection (the spec pins the strict
    * conservativeness). */
  def q399FdrBy(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).isin(1, 7).cast("long").as("a"),
      ($"value" > 50.0).cast("long").as("y"))
    val g = s.where($"y".isNotNull).groupBy($"event_type").agg(
      sum($"a").as("na"), sum(lit(1L) - $"a").as("nb"),
      sum(when($"a" === 1L, $"y").otherwise(0L)).as("sa"),
      sum(when($"a" === 0L, $"y").otherwise(0L)).as("sb"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val pa = dd($"sa") / dd($"na"); val pb = dd($"sb") / dd($"nb")
    val pp = dd($"sa" + $"sb") / dd($"na" + $"nb")
    val z = (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / dd($"na") + lit(1.0) / dd($"nb")))
    val tests = g.select($"event_type".as("test"),
      graft.functions.FastMath.erfc(abs(z) / lit(1.4142135623730951))
        .as("p"))
    graft.operators.Eval.benjaminiYekutieli(tests, "test", "p", 0.05)
      .select($"test".as("event_type"), round($"p", 6).as("p"),
        $"rank", $"k", round($"c_k", 6).as("c_k"),
        round($"q_value", 6).as("q_value"), $"reject")
  }

  /** q400 — Jonckheere–Terpstra ordered-trend test ([[graft.operators
    * .Eval.jonckheereTerpstra]]): do event values INCREASE across the
    * day-of-week order — the ordered-alternative power upgrade over
    * q290's Kruskal–Wallis; exact-integer 2J via the dense
    * double-cumulative census, pinned z. */
  def q400Jonckheere(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select(
      dayofweek(to_date($"ts")).cast("long").as("dow"),
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.jonckheereTerpstra(s, "dow", "cents")
      .select($"n", $"k_groups", $"j2", $"e2",
        round($"var_j", 6).as("var_j"), round($"z", 6).as("z"))
  }

  /** q402 — Cochran–Armitage trend test ([[graft.operators.Eval
    * .cochranArmitage]]): does the high-value-event PROPORTION rise
    * across the day-of-week order — the binary-outcome member of the
    * ordered-trend family next to q400's rank form; exact censuses,
    * one pinned z. */
  def q402CochranArmitage(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select(
      dayofweek(to_date($"ts")).cast("long").as("dow"),
      ($"value" > 50.0).cast("long").as("y"))
    graft.operators.Eval.cochranArmitage(s, "dow", "y")
      .select($"n", $"k_groups", $"n_success", round($"t", 6).as("t"),
        round($"var_t", 6).as("var_t"), round($"z", 6).as("z"))
  }

  /** q403 — Page's L trend test ([[graft.operators.Eval.pageTrend]]):
    * within every event type (block), do mean values rise across the
    * day-of-week order — the repeated-measures member of the
    * q400/q402 trend family (Friedman's ordered-alternative upgrade);
    * complete-block contract with dropped blocks counted loudly. */
  def q403PageTrend(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).cast("long").as("dow"),
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.pageTrend(s, "event_type", "dow", "cents")
      .select($"n_blocks", $"n_blocks_dropped", $"k", $"l",
        round($"e_l", 6).as("e_l"), round($"var_l", 6).as("var_l"),
        round($"z", 6).as("z"))
  }

  /** q404 — Mantel–Haenszel common odds ratio ([[graft.operators.Eval
    * .mantelHaenszel]]): the weekend→high-value odds ratio pooled
    * ACROSS event types — the confounding-immune stratified 2×2
    * summary (Simpson-safe where the collapsed table is not), with
    * the continuity-corrected MH χ² and its pinned-erfc p. */
  def q404MantelHaenszel(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).isin(1, 7).as("wknd"),
      ($"value" > 50.0).as("hi"))
    graft.operators.Eval.mantelHaenszel(s, "event_type", $"wknd", $"hi")
      .select($"n_strata", $"n", round($"or_mh", 6).as("or_mh"),
        round($"chi2", 6).as("chi2"), round($"p", 6).as("p"))
  }

  /** q394 — local-level Kalman filter ([[graft.operators.Forecast
    * .kalmanLevel]]): each event type's daily cents total filtered
    * through the adaptive-gain level model (Q=0.05, R=1, P₀=1) — the
    * converged gain is the data's own answer to "what alpha should the
    * smoother use"; fixed-shape double fold over the day-sorted census,
    * replayed field-for-field in list_reduce. */
  def q394KalmanLevel(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day")
      .agg((sum($"cents").cast("double") / 100.0).as("z"))
    graft.operators.Forecast.kalmanLevel(daily, "event_type", "day", "z",
      q = 0.05, r = 1.0, p0 = 1.0)
      .select($"event_type", $"n_obs", round($"level", 6).as("level"),
        round($"p_var", 6).as("p_var"), round($"gain", 6).as("gain"))
  }

  /** q290 — Kruskal–Wallis H ([[graft.operators.Eval.kruskalWallis]]):
    * per day-of-week, do the five event types share one value
    * distribution? The k-sample companion to q283's two-sample U —
    * exact cent values, doubled mid-ranks, k-bounded ordered fold for
    * the one float sum. Spark's dayofweek is 1=Sunday..7; the oracle
    * shifts DuckDB's 0=Sunday..6 by one. */
  def q290KruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select(
      dayofweek(to_date($"ts")).cast("int").as("dow"), $"event_type",
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.kruskalWallis(s, "dow", "event_type", "cents")
      .select($"s".as("dow"), $"k", $"n",
        round($"h", 6).as("h"), round($"h_adj", 6).as("h_adj"))
  }

  /** q291 — Kendall tau-b ([[graft.operators.Regression.kendallTauB]]):
    * per event type, does a busier day move more money? Concordance of
    * the daily (event count, cent volume) series — 30 calendar-bounded
    * periods per group, so the pair join stays ≤435 rows per group.
    * Integer pair counts; one sqrt + division, rounded to 6. */
  def q291KendallTau(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round($"value" * 100).cast("long")).as("y"))
    graft.operators.Regression
      .kendallTauB(daily, "event_type", "day", "x", "y")
      .select($"g".as("event_type"), $"n", $"n_pairs", $"concordant",
        $"discordant", $"tie_x", $"tie_y", round($"tau_b", 6).as("tau_b"))
  }

  /** q294 — Brown–Forsythe spread test ([[graft.operators.Robust
    * .brownForsythe]]): per day-of-week, do the five event types have
    * the same value SPREAD? Completes the per-scope battery: q180
    * means, q283/q290 distributions, q294 variances — all on exact
    * cents. */
  def q294BrownForsythe(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select(
      dayofweek(to_date($"ts")).cast("int").as("dow"), $"event_type",
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Robust.brownForsythe(s, "dow", "event_type", "cents")
      .select($"s".as("dow"), $"k", $"n", round($"f", 6).as("f"))
  }

  /** q297 — Wasserstein-1 drift ([[graft.operators.Divergence
    * .wasserstein1]]): total ECDF area between weekend and weekday
    * value distributions in cents — the integral companion to the KS
    * point statistic, with an ALL-integer numerator (no float fold
    * anywhere). */
  def q297Wasserstein(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select(
      round($"value" * 100).cast("long").as("cents"),
      dayofweek(to_date($"ts")).isin(1, 7).as("wkend"))
    graft.operators.Divergence.wasserstein1(s, "cents", $"wkend")
      .select($"n_a", $"n_b", $"n_values", round($"w1", 6).as("w1"))
  }

  /** q298 — split-leakage audit ([[graft.operators.Splits
    * .splitLeakage]]): the same 80/10/10 hash split keyed on the ROW id
    * (event_id — leaks users across splits) vs keyed on the GROUP id
    * (user_id — cannot leak), audited side by side. The GroupKFold
    * check a training pipeline runs before trusting a split. */
  def q298SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def audit(keyCol: String, tag: String) =
      graft.operators.Splits.splitLeakage(
          graft.operators.Splits.hashSplit(ev, keyCol, w), "user_id", "split")
        .select(lit(tag).as("variant"), $"n_rows", $"n_groups",
          $"n_straddling", $"n_rows_straddling",
          round($"leak_rate", 6).as("leak_rate"))
    audit("event_id", "row_keyed").unionByName(audit("user_id", "group_keyed"))
  }

  /** q300 — McNemar paired test ([[graft.operators.Eval.mcnemar]]):
    * per event type, each USER is one paired unit — active on weekends
    * vs active on weekdays; only the discordant users drive the
    * statistic. The paired member of the A/B battery (q180 unpaired
    * means, q273 unpaired proportions). */
  def q300McNemar(spark: SparkSession, dir: String): DataFrame = {
    val wkend = dayofweek(to_date($"ts")).isin(1, 7)
    val units = events(spark, dir)
      .groupBy($"event_type", $"user_id")
      .agg(max(when(wkend, 1L).otherwise(0L)).as("a"),
        max(when(!wkend, 1L).otherwise(0L)).as("b"))
    graft.operators.Eval.mcnemar(units, "event_type", "a", "b")
      .select($"s".as("event_type"), $"n", $"n01", $"n10",
        round($"chi2", 6).as("chi2"))
  }

  /** q302 — rank-biased overlap ([[graft.operators.Ranking.rboAtK]]):
    * per event type, do "rank users by money" and "rank users by
    * activity" agree at the top? RBO@10 with p = 0.9 — the top-heavy
    * ranking-drift statistic; exact integer overlaps, literal-embedded
    * geometric weights. */
  def q302Rbo(spark: SparkSession, dir: String): DataFrame = {
    val per = events(spark, dir)
      .groupBy($"event_type", $"user_id")
      .agg(sum(round($"value" * 100).cast("long")).as("cents"),
        count(lit(1)).as("n"))
    graft.operators.Ranking.rboAtK(per, "event_type", "user_id",
        "cents", "n", k = 10)
      .select($"event_type", $"k_eff", round($"rbo", 6).as("rbo"))
  }

  /** q303 — odds/risk ratio with Wald intervals ([[graft.operators.Eval
    * .oddsRiskRatio]]): per event type, does the weekend raise the odds
    * of a high-value event (≥ $50)? The effect-size companion to q273's
    * two-proportion z — exact 2×2 censuses, pinned-shape ratio/log/exp
    * work. */
  def q303OddsRatio(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).isin(1, 7).cast("long").as("wkend"),
      (round($"value" * 100).cast("long") >= 5000L).cast("long").as("high"))
    graft.operators.Eval.oddsRiskRatio(s, "event_type", "wkend", "high")
      .select($"s".as("event_type"), $"a", $"b", $"c", $"d",
        round($"odds_ratio", 6).as("odds_ratio"),
        round($"or_lo", 6).as("or_lo"), round($"or_hi", 6).as("or_hi"),
        round($"risk_ratio", 6).as("risk_ratio"),
        round($"rr_lo", 6).as("rr_lo"), round($"rr_hi", 6).as("rr_hi"))
  }

  /** q285 — weight-of-evidence table ([[graft.operators.Encoding
    * .woeTable]]): event type encoded against the weekend label with
    * Laplace 0.5 smoothing; IV folds per-category terms in category
    * order. */
  def q285Woe(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend"))
    graft.operators.Encoding.woeTable(s, "event_type", "wkend")
      .select($"category", $"n_pos", $"n_neg",
        round($"woe", 6).as("woe"), round($"iv", 6).as("iv"))
  }

  /** q281 — banded DTW distance matrix ([[graft.operators.Dtw]]): the
    * shape similarity of the five event types' daily-count series under
    * a Sakoe–Chiba band of 30 days. All-integer DP — no float surface —
    * replayed cell-for-cell by a recursive-CTE oracle. */
  def q281Dtw(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Dtw.pairwiseDtw(daily, "event_type", "day", "x", band = 30)
  }

  /** q279 — NDCG@10 ranking quality ([[graft.operators.Eval.ndcgAtK]]):
    * per event type, users ranked by their peak value against a
    * deterministic id-derived relevance label. Two partitioned top-10
    * windows + ≤10-element in-order folds; 5 output rows. */
  def q279Ndcg(spark: SparkSession, dir: String): DataFrame = {
    val scored = events(spark, dir)
      .groupBy($"event_type", $"user_id")
      .agg(max($"value").as("score"))
      .withColumn("rel", ($"user_id" % 4).cast("int"))
    graft.operators.Eval.ndcgAtK(scored,
        "event_type", "user_id", "score", "rel", k = 10)
      .select($"q".as("event_type"), $"n_docs",
        round($"dcg", 6).as("dcg"), round($"idcg", 6).as("idcg"),
        round($"ndcg", 6).as("ndcg"))
  }

  /** q276 — Benford first-digit screen ([[graft.operators.Profile
    * .benfordCensus]]): per return flag, the first-digit census of
    * floor(extendedprice) with each digit's Benford probability and the
    * group chi² (absent digits contribute their expected mass). The
    * digit is string-prefix arithmetic on an exact long — no log10 in
    * the row path — and chi² folds the ≤9-digit list in digit order. */
  def q276Benford(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag", floor($"l_extendedprice").cast("long").as("v"))
    graft.operators.Profile.benfordCensus(li, "l_returnflag", "v")
      .select($"g".as("l_returnflag"), $"digit", $"n_obs", $"n_group",
        round($"p_benford", 6).as("p_benford"), round($"chi2", 4).as("chi2"))
  }

  /** q406 — Breslow–Day + Tarone homogeneity ([[graft.operators.Eval
    * .breslowDay]]): is q404's pooled weekend→high-value odds ratio
    * actually COMMON across the event-type strata, or does the MH
    * summary average away a real per-type interaction — the legitimacy
    * check that must ride next to any pooled OR. Same stratum census
    * as q404; per-stratum expected cells are one pinned quadratic of
    * the pooled ψ; sums fold in stratum order. */
  def q406BreslowDay(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.breslowDay(
      events(spark, dir).select($"event_type",
        dayofweek(to_date($"ts")).isin(1, 7).as("wk"),
        ($"value" > 50.0).as("hi")),
      "event_type", $"wk", $"hi")
      .select($"n_strata", $"n_informative", round($"psi", 6).as("psi"),
        round($"chi2_bd", 6).as("chi2_bd"),
        round($"chi2_tarone", 6).as("chi2_tarone"), $"df")

  /** q407 — Kendall's W concordance ([[graft.operators.Eval.kendallW]]):
    * q310's Friedman χ² turned into its effect size — how strongly the
    * user blocks AGREE on the event-type ranking (W ∈ [0,1]) and the
    * equivalent mean pairwise Spearman ρ̄. Two extra pinned divisions
    * on the tie-corrected Friedman statistic. */
  def q407KendallW(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.kendallW(
      events(spark, dir).select($"user_id", $"event_type",
        round($"value" * 100).cast("long").as("cents")),
      "user_id", "event_type", "cents")
      .select($"k", $"n_blocks", round($"chi2", 6).as("chi2"),
        round($"w", 6).as("w"), round($"rho_bar", 6).as("rho_bar"))

  /** q409 — trade performance ratios ([[graft.operators.Portfolio
    * .tradeStats]]): per event type, the research-desk board over a
    * synthetic cents P&L (value·100 − 5000 — mixed-sign by
    * construction): win rate, expectancy, profit factor, payoff,
    * Kelly fraction, population Sharpe and Sortino. All moments exact
    * decimal; every ratio one pinned division, Sharpe/Sortino one
    * pinned sqrt each (the 1/n's cancel algebraically). */
  def q409TradeStats(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Portfolio.tradeStats(
      events(spark, dir).select($"event_type",
        (round($"value" * 100).cast("long") - 5000L).as("pnl")),
      "event_type", "pnl")
      .select($"scope".as("event_type"), $"n", $"n_wins", $"n_losses",
        round($"win_rate", 6).as("win_rate"),
        round($"expectancy_cents", 6).as("expectancy_cents"),
        round($"profit_factor", 6).as("profit_factor"),
        round($"payoff", 6).as("payoff"),
        round($"kelly", 6).as("kelly"),
        round($"sharpe", 6).as("sharpe"),
        round($"sortino", 6).as("sortino"))

  /** q410 — purged walk-forward folds ([[graft.operators.Splits
    * .purgedFolds]]): the events timeline cut into 5 equal-width test
    * blocks with a 1-day embargo — per fold, the train/test/purged
    * census and the block boundaries. The serial-correlation-safe CV
    * plan the q24 chronological holdout generalizes to k folds; all
    * boundaries closed-form integer arithmetic off one broadcast
    * min/max census. */
  def q410PurgedFolds(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Splits.purgedFolds(
      events(spark, dir).select(unix_millis($"ts").as("ms")),
      "ms", k = 5, embargoMs = 86400000L)

  /** q411 — Diebold–Mariano forecast referee ([[graft.operators
    * .Forecast.dieboldMariano]]): per event type over the daily cents
    * census, does the naive lag-1 forecast beat the weekly lag-7 one?
    * Losses are absolute errors in integer cents; the loss
    * differential's Newey–West variance (h=3 Bartlett window) rides
    * the exact ACF integer identity — negative DM favors lag-1. */
  def q411DieboldMariano(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("c"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    val paired = daily
      .withColumn("l1", lag($"c", 1).over(w))
      .withColumn("l7", lag($"c", 7).over(w))
      .where($"l7".isNotNull)
      .select($"event_type", $"day",
        abs($"c" - $"l1").as("loss1"), abs($"c" - $"l7").as("loss2"))
    graft.operators.Forecast.dieboldMariano(paired, "event_type", "day",
      "loss1", "loss2", h = 3)
      .select($"k".as("event_type"), $"n",
        round($"mean_d", 6).as("mean_d"), round($"dm", 6).as("dm"))
  }

  /** q412 — partial correlation ([[graft.operators.Regression
    * .partialCorr]]): per event type, is the cents–hour link real once
    * day-of-month is partialled out of both — the confounder screen
    * the q61/q332 correlation reads need. Nine exact moments, three
    * pinned r's, one fixed compose. */
  def q412PartialCorr(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Regression.partialCorr(
      events(spark, dir).select($"event_type",
        round($"value" * 100).cast("long").as("cents"),
        hour($"ts").cast("long").as("hr"),
        dayofmonth($"ts").cast("long").as("dom")),
      "event_type", "cents", "hr", "dom")
      .select($"scope".as("event_type"), $"n",
        round($"r_xy", 6).as("r_xy"), round($"r_xz", 6).as("r_xz"),
        round($"r_yz", 6).as("r_yz"), round($"pcorr", 6).as("pcorr"))

  /** q416 — multi-touch attribution ([[graft.operators.Attribution
    * .multiTouch]]): per event type, the credit each channel earns for
    * the purchases it precedes — first/last-touch counts (integer),
    * linear and U-shaped (40/20/40) fractional credit, and the orphan
    * census for purchases with no preceding touch. The order key is a
    * zero-padded (ms, event_id) string, a pinned total order both
    * engines sort identically. */
  def q416Attribution(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Attribution.multiTouch(
      events(spark, dir).select($"user_id",
        concat(lpad(unix_millis($"ts").cast("string"), 14, "0"),
          lit("_"), lpad($"event_id".cast("string"), 10, "0")).as("o"),
        $"event_type"),
      "user_id", "o", "event_type", $"event_type" === "purchase")
      .select($"channel", $"n_touches", $"n_journeys", $"n_first",
        $"n_last", round($"credit_linear", 6).as("credit_linear"),
        round($"credit_ushape", 6).as("credit_ushape"), $"n_orphan")

  /** q417 — restricted mean survival time ([[graft.operators.Survival
    * .rmst]]): expected retained days within the first 14, from the
    * q255 retention cohort's KM step function — exact rectangle areas
    * folded in duration order, the one-number retention readout when
    * heavy censoring keeps the median undefined. */
  def q417Rmst(spark: SparkSession, dir: String): DataFrame = {
    val spans = events(spark, dir)
      .groupBy($"user_id")
      .agg(min(to_date($"ts")).as("first_d"), max(to_date($"ts")).as("last_d"))
    val horizon = spans.agg(max($"last_d").as("wend"))
    val subjects = spans.crossJoin(broadcast(horizon))
      .select(datediff($"last_d", $"first_d").as("dur"),
        when(datediff($"wend", $"last_d") >= 7, 1).otherwise(0).as("ev"))
    graft.operators.Survival.rmst(subjects, "dur", "ev", tau = 14L)
      .select($"tau", $"n_durations", round($"rmst", 6).as("rmst"))
  }

  /** q418 — expected calibration error ([[graft.operators.Eval
    * .expectedCalibrationError]]): the q249 calibration curve rolled
    * into its deployment gate — population-weighted |confidence −
    * frequency| over the ten equal-mass buckets, scores mapped to
    * [0,1] by the 10000-cent scale. */
  def q418Ece(spark: SparkSession, dir: String): DataFrame = {
    val scored = events(spark, dir).select($"event_type",
      round($"value" * 100).cast("long").as("cents"),
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0).as("wkend"))
    graft.operators.Eval.expectedCalibrationError(
        scored, "event_type", "wkend", "cents", buckets = 10,
        scoreScale = 10000L)
      .select($"g".as("event_type"), $"n", $"n_buckets",
        round($"ece", 6).as("ece"))
  }

  /** q420 — Brown–Forsythe on the q421 design ([[graft.operators
    * .Robust.brownForsythe]], the q294 operator transposed): per
    * event type, does value-cents SPREAD differ across day-of-week —
    * the robust companion q421's fragile-under-non-normality Bartlett
    * needs ON THE SAME DESIGN to be readable as a pair (q294 runs the
    * dow-scoped transpose). */
  def q420BrownForsythe(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).cast("long").as("dow"),
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Robust.brownForsythe(s, "event_type", "dow", "cents")
      .select($"s".as("event_type"), $"k", $"n", round($"f", 6).as("w"))
  }

  /** q421 — Bartlett's variance test ([[graft.operators.Eval
    * .bartlettVariance]]): the normal-theory companion to q420 on the
    * same (event type × day-of-week) design — T ~ χ²(k−1) from the
    * pooled-vs-per-group log-variance contrast, exact moment censuses
    * under the three group-ordered folds. */
  def q421Bartlett(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).cast("long").as("dow"),
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.bartlettVariance(s, "event_type", "dow", "cents")
      .select($"sc".as("event_type"), $"k", $"k_dropped", $"n",
        round($"sp2", 4).as("sp2"), round($"chi2", 6).as("chi2"), $"df")
  }

  /** q422 — G-test of independence ([[graft.operators.Divergence
    * .gTest]]): event type × day-of-week on the q356 design — the
    * log-likelihood-ratio twin of Pearson's χ² (2·N·MI nats), with the
    * same even-df exact Poisson-sum survival p. */
  def q422GTest(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).cast("int").as("dow"))
    graft.operators.Divergence.gTest(s, "event_type", "dow")
      .select($"n", $"r", $"c", $"df", round($"g", 6).as("g"),
        round($"p_value", 6).as("p_value"))
  }

  /** q423 — nearest-score matching ATT ([[graft.operators.Causal
    * .nearestScoreMatch]]): per event type, weekend rows matched to
    * the nearest weekday value-cents score (caliper 50) — 1-NN
    * propensity matching made deterministic and census-shaped (match
    * SCORES, impute the mean control outcome at the matched score). */
  def q423PropensityMatch(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).isin(1, 7).as("treated"),
      round($"value" * 100).cast("long").as("score"),
      ($"user_id" % 1000).as("y"))
    graft.operators.Causal.nearestScoreMatch(s, "event_type",
        $"treated", "score", "y", caliper = 50L)
      .select($"sc".as("event_type"), $"n_treated", $"n_matched",
        $"n_unmatched", round($"mean_t", 6).as("mean_t"),
        round($"mean_c_matched", 6).as("mean_c_matched"),
        round($"att", 6).as("att"))
  }

  /** q424 — sharp regression discontinuity ([[graft.operators.Causal
    * .regressionDiscontinuity]]): per event type, the outcome jump at
    * the 5000-cent cutoff from local linear fits over a ±2000-cent
    * bandwidth — two all-exact-decimal OLS fits, effect = the
    * intercept gap at the cutoff. */
  def q424Rdd(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      round($"value" * 100).cast("long").as("score"),
      ($"user_id" % 1000).as("y"))
    graft.operators.Causal.regressionDiscontinuity(s, "event_type",
        "score", "y", cutoff = 5000L, bandwidth = 2000L)
      .select($"sc".as("event_type"), $"n_l", $"n_r",
        round($"alpha_l", 6).as("alpha_l"),
        round($"alpha_r", 6).as("alpha_r"),
        round($"slope_l", 8).as("slope_l"),
        round($"slope_r", 8).as("slope_r"),
        round($"effect", 6).as("effect"))
  }

  /** q425 — instrumental-variable Wald estimator ([[graft.operators
    * .Causal.ivWald]]): per event type, the weekend instrument's
    * reduced-form/first-stage covariance ratio on (cents → outcome),
    * next to the naive OLS slope so the confounding gap is visible —
    * every number one exact-decimal division. */
  def q425IvWald(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      when(dayofweek(to_date($"ts")).isin(1, 7), 1L).otherwise(0L)
        .as("z"),
      round($"value" * 100).cast("long").as("x"),
      ($"user_id" % 1000).as("y"))
    graft.operators.Causal.ivWald(s, "event_type", "z", "x", "y")
      .select($"sc".as("event_type"), $"n",
        round($"first_stage", 8).as("first_stage"),
        round($"reduced_form", 8).as("reduced_form"),
        round($"beta_iv", 6).as("beta_iv"),
        round($"beta_ols", 8).as("beta_ols"))
  }

  /** Shared q426–q428 daily census: per (event type, day) the exact
    * cents total and row count — the q394 grain. */
  private def dailyCents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("tot"), count(lit(1)).as("cnt"))

  /** q426 — KPSS level stationarity ([[graft.operators.Autocorr
    * .kpssLevel]]): is each event type's daily cents level stable
    * enough for a fixed baseline — n-scaled exact demeaning, Bartlett
    * long-run variance at 4 lags, one pinned double expression. */
  def q426Kpss(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Autocorr.kpssLevel(dailyCents(spark, dir),
        "event_type", "day", "tot", lags = 4)
      .select($"event_type", $"n_obs", round($"kpss", 6).as("kpss"))

  /** q427 — permutation entropy ([[graft.operators.Autocorr
    * .permutationEntropy]]): how noise-like are each event type's
    * daily-total ups and downs — the order-3 Bandt–Pompe ordinal
    * census with earlier-index tie pinning. */
  def q427PermEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Autocorr.permutationEntropy(dailyCents(spark, dir),
        "event_type", "day", "tot")
      .select($"event_type", $"n_windows", $"n_patterns",
        round($"h", 6).as("h"), round($"h_norm", 6).as("h_norm"))

  /** q428 — Granger causality lag-1 ([[graft.operators.Autocorr
    * .grangerLag1]]): does yesterday's event COUNT improve today's
    * cents-total forecast beyond yesterday's total — closed-form
    * 2-regressor F from exact decimal moments. */
  def q428Granger(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Autocorr.grangerLag1(dailyCents(spark, dir),
        "event_type", "day", "tot", "cnt")
      .select($"event_type", $"n", round($"beta_x", 8).as("beta_x"),
        round($"f", 6).as("f"))

  /** q429 — Cronbach's alpha ([[graft.operators.Eval.cronbachAlpha]]):
    * treating each user's five per-event-type cents totals as a 5-item
    * instrument, is the composite "activity score" internally
    * consistent — complete-block contract with loud drops, item
    * variances folded in item order. */
  def q429Cronbach(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"user_id", $"event_type",
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.cronbachAlpha(s, "user_id", "event_type", "cents")
      .select($"n_blocks", $"n_blocks_dropped", $"k",
        round($"alpha", 6).as("alpha"))
  }

  /** q430 — ICC(1,1) ([[graft.operators.Eval.iccOneWay]]): per event
    * type, what share of cents variance sits BETWEEN the 50 user
    * cohorts — Searle's unbalanced one-way random-effects form with
    * the k0 group-size correction. */
  def q430Icc(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      ($"user_id" % 50).as("cohort"),
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.iccOneWay(s, "event_type", "cohort", "cents")
      .select($"sc".as("event_type"), $"k", $"n",
        round($"msb", 4).as("msb"), round($"msw", 4).as("msw"),
        round($"k0", 6).as("k0"), round($"icc", 6).as("icc"))
  }

  /** q431 — Bland–Altman agreement ([[graft.operators.Eval
    * .blandAltman]]): do daily click and view cents totals agree as
    * measurements of the same daily activity — bias, ±1.96·SD limits,
    * and the proportional-bias slope correlation alone would hide. */
  def q431BlandAltman(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .where($"event_type".isin("click", "view"))
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type",
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"day")
      .agg(sum(when($"event_type" === "click", $"cents")).as("a"),
        sum(when($"event_type" === "view", $"cents")).as("b"))
    graft.operators.Eval.blandAltman(daily, "a", "b")
      .select($"n", round($"bias", 6).as("bias"),
        round($"sd_d", 6).as("sd_d"), round($"loa_lo", 6).as("loa_lo"),
        round($"loa_hi", 6).as("loa_hi"),
        round($"slope_vs_mean", 8).as("slope_vs_mean"))
  }

  /** q432 — Fisher's exact test ([[graft.operators.Divergence
    * .fisherExact]]): on the small user_id < 20 cohort, is the error
    * event type associated with top-decile values — hypergeometric
    * support built factorial-free via the ratio recurrence, loud
    * support cap, R-convention two-sided tie rule. */
  def q432FisherExact(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).where($"user_id" < 20)
    graft.operators.Divergence.fisherExact(s,
        $"event_type" === "error", $"value" > 90.0)
      .select($"n", $"n11", $"n10", $"n01", $"n00",
        round($"p_two", 6).as("p_two"), round($"p_left", 6).as("p_left"),
        round($"p_right", 6).as("p_right"))
  }

  /** q433 — Hosmer–Lemeshow ([[graft.operators.Eval.hosmerLemeshow]]):
    * the q418 calibration design promoted to a significance test —
    * over the same deterministic equal-mass deciles, is the
    * weekend-rate miscalibration of the cents score distinguishable
    * from binomial noise (df = 8, exact Poisson-sum survival p). */
  def q433HosmerLemeshow(spark: SparkSession, dir: String): DataFrame = {
    val scored = events(spark, dir).select($"event_type",
      round($"value" * 100).cast("long").as("cents"),
      when(dayofweek(to_date($"ts")).isin(1, 7), 1).otherwise(0)
        .as("wkend"))
    graft.operators.Eval.hosmerLemeshow(scored, "event_type", "wkend",
        "cents", buckets = 10, scoreScale = 10000L)
      .select($"g".as("event_type"), $"n", $"n_buckets",
        $"n_buckets_dropped", round($"hl", 6).as("hl"), $"df",
        round($"p_value", 6).as("p_value"))
  }

  /** q434 — confusion statistics ([[graft.operators.Eval
    * .confusionStats]]): per event type, "value > 50 predicts
    * weekend" scored with MCC / F1 / accuracy side by side — the
    * class-imbalance disagreement the three readouts exist to
    * expose. */
  def q434Mcc(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.confusionStats(
        events(spark, dir).select($"event_type", $"value", $"ts"),
        "event_type", $"value" > 50.0,
        dayofweek(to_date($"ts")).isin(1, 7))
      .select($"g".as("event_type"), $"n", $"tp", $"fp", $"fn", $"tn",
        round($"acc", 6).as("acc"), round($"f1", 6).as("f1"),
        round($"mcc", 6).as("mcc"))

  /** q435 — Brunner–Munzel ([[graft.operators.Eval.brunnerMunzel]]):
    * weekend vs weekday cents per event type under UNEQUAL-variance
    * rank inference — the studentized relative effect p̂ (== the
    * two-sample AUC) with the Welch-type df q283's Mann–Whitney
    * assumes away. */
  def q435BrunnerMunzel(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type",
      dayofweek(to_date($"ts")).isin(1, 7).as("wkend"),
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Eval.brunnerMunzel(s, "event_type", $"wkend", "cents")
      .select($"sc".as("event_type"), $"n1", $"n2",
        round($"p_hat", 6).as("p_hat"), round($"w", 6).as("w"),
        round($"df_w", 4).as("df_w"))
  }

  /** q436 — distance correlation ([[graft.operators.Divergence
    * .distanceCorrelation]]): ANY dependence between daily click and
    * view cents totals, linear or not — the n⁴-scaled all-integer
    * double-centering keeps the pair fold exact, with loud census and
    * observation caps. */
  def q436DistanceCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .where($"event_type".isin("click", "view"))
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type",
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"day")
      .agg(sum(when($"event_type" === "click", $"cents")).as("a"),
        sum(when($"event_type" === "view", $"cents")).as("b"))
    graft.operators.Divergence.distanceCorrelation(daily, "a", "b")
      .select($"n", $"n_cells", round($"dcov2", 4).as("dcov2"),
        round($"dvar_x", 4).as("dvar_x"), round($"dvar_y", 4).as("dvar_y"),
        round($"dcor", 6).as("dcor"))
  }

  /** q437 — Grubbs outlier statistic ([[graft.operators.Robust
    * .grubbs]]): each event type's single worst value-cents offender,
    * by id — the integer |n·x − Σx| argmax with pinned id tie-break,
    * sigmas-out as the one float readout. */
  def q437Grubbs(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select($"event_type", $"event_id",
      round($"value" * 100).cast("long").as("cents"))
    graft.operators.Robust.grubbs(s, "event_type", "event_id", "cents")
      .select($"g".as("event_type"), $"n", $"outlier_id",
        $"outlier_value", round($"g_stat", 6).as("g_stat"),
        round($"mean", 4).as("mean"), round($"sd", 4).as("sd"))
  }

  /** q446 — seasonal Mann–Kendall ([[graft.operators.Regression
    * .seasonalMannKendall]]): per event type, monotone drift in daily
    * volume with each calendar MONTH compared only against itself —
    * the Hirsch–Slack upgrade of q366 that a weekly/annual cycle
    * cannot fool; per-season exact censuses, season-ordered variance
    * fold. */
  def q446SeasonalMk(spark: SparkSession, dir: String): DataFrame = {
    val d = events(spark, dir)
      .groupBy($"event_type",
        month(to_date($"ts")).cast("long").as("mon"),
        date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Regression.seasonalMannKendall(d, "event_type",
        "mon", "day", "x")
      .select($"g".as("event_type"), $"n", $"n_seasons", $"s",
        round($"var_s", 6).as("var_s"), round($"z", 6).as("z"))
  }

  /** q448 — turning-points randomness test ([[graft.operators.Autocorr
    * .turningPoints]]): does each event type's daily cents series turn
    * as often as noise should — the classical closed-form z over
    * strict local extrema, completing the randomness battery next to
    * q375's runs test and q427's ordinal patterns. */
  def q448TurningPoints(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Autocorr.turningPoints(dailyCents(spark, dir),
        "event_type", "day", "tot")
      .select($"event_type", $"n", $"t_turns", round($"e_t", 6).as("e_t"),
        round($"var_t", 6).as("var_t"), round($"z", 6).as("z"))

  /** q452 — Newey–West robust trend ([[graft.operators.Regression
    * .neweyWestTrend]]): each event type's daily cents slope with the
    * HAC standard error next to the IID one — the autocorrelation
    * haircut that separates real drift from serially-correlated
    * noise; q366's direction test upgraded to a slope with honest
    * error bars. */
  def q452NeweyWest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Regression.neweyWestTrend(dailyCents(spark, dir),
        "event_type", "day", "tot", lags = 4)
      .select($"event_type", $"n", round($"slope", 6).as("slope"),
        round($"t_iid", 6).as("t_iid"), round($"t_nw", 6).as("t_nw"))

  /** q450 — cumulative incidence under competing risks ([[graft
    * .operators.Survival.cumulativeIncidence]]): the q417 retention
    * cohort with churn split into two competing causes (user-id
    * parity as the deterministic cause code, window-tail censoring) —
    * Aalen–Johansen CIFs whose sum with all-cause survival is 1 at
    * every duration, the estimator naive per-cause KM overstates. */
  def q450CumIncidence(spark: SparkSession, dir: String): DataFrame = {
    val spans = events(spark, dir)
      .groupBy($"user_id")
      .agg(min(to_date($"ts")).as("fd"), max(to_date($"ts")).as("ld"))
    val horizon = spans.agg(max($"ld").as("wend"))
    val subjects = spans.crossJoin(broadcast(horizon))
      .select(datediff($"ld", $"fd").as("dur"),
        when(datediff($"wend", $"ld") < 7, 0L)
          .when($"user_id" % 2 === 0, 1L).otherwise(2L).as("cause"))
    graft.operators.Survival.cumulativeIncidence(subjects, "dur", "cause")
      .select($"duration", $"n_risk", $"d_cause1", $"d_cause2",
        round($"cif_1", 6).as("cif_1"), round($"cif_2", 6).as("cif_2"),
        round($"survival", 6).as("survival"))
  }

  /** q449 — Hellinger distance ([[graft.operators.Divergence
    * .hellinger]]): weekend vs weekday value-bucket distributions on
    * the bounded [0,1] metric — the comparable-across-category-sets
    * drift number next to q318's JS and q305's total variation. */
  def q449Hellinger(spark: SparkSession, dir: String): DataFrame = {
    val s = events(spark, dir).select(
      (round($"value" * 100).cast("long") / lit(1000)).cast("long")
        .as("bucket"),
      dayofweek(to_date($"ts")).isin(1, 7).as("wknd"))
    graft.operators.Divergence.hellinger(s, "bucket", $"wknd")
      .select($"n_a", $"n_b", $"n_cells", round($"bc", 6).as("bc"),
        round($"hellinger", 6).as("hellinger"))
  }

  /** q454 — Pettitt change-point test ([[graft.operators.ChangePoint
    * .pettitt]]): where does each event type's daily cents series
    * most look like "before beats after"? The rank-based companion to
    * q238's CUSUM and q296's binary segmentation — immune to the
    * magnitude of any single day. Rank-census linear formulation:
    * exact integer U walk, one closed-form p. */
  def q454Pettitt(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ChangePoint.pettitt(dailyCents(spark, dir),
        "event_type", "day", "tot")
      .select($"event_type", $"n", $"k_stat", $"u_at_cp", $"cp_ord",
        round($"p_value", 6).as("p_value"))

  /** q455 — Augmented Dickey–Fuller ([[graft.operators.Autocorr
    * .adfTest]]): the unit-root t for each event type's daily cents —
    * q426's KPSS with the null reversed; quoting both is the standard
    * stationarity read. Centered-Cramer fixed double shapes over
    * exact decimal moments. */
  def q455Adf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Autocorr.adfTest(dailyCents(spark, dir),
        "event_type", "day", "tot")
      .select($"event_type", $"n", round($"beta", 6).as("beta"),
        round($"phi", 6).as("phi"), round($"t_adf", 6).as("t_adf"))

  /** q464 — PELT-objective multi-change-point ([[graft.operators
    * .ChangePoint.pelt]]): exact global segmentation of each event
    * type's daily series, the multi-shift generalization of q454's
    * single Pettitt point and q296's greedy binary segmentation. The
    * series is the SCALE-FREE per-mille composition of the month
    * (tot·1000 div Σtot — comparable across SFs) with days ≥ 16
    * tripled before normalizing: a planted mid-month level shift the
    * DP must localize exactly (the plant changes both halves' shares,
    * so the boundary is d16 by construction). Exact long prefix sums,
    * pinned double cost shapes, smallest-s tie-break — the oracle
    * replays the F fold, the back-pointer pass and the backtrack
    * list-for-list. */
  def q464Pelt(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planted = dailyCents(spark, dir)
      .withColumn("b", when(substring($"day", 9, 2) >= "16", $"tot" * 3L)
        .otherwise($"tot"))
      .withColumn("pm", expr(
        "b * 1000L div sum(b) OVER (PARTITION BY event_type)"))
    graft.operators.ChangePoint.pelt(planted, "event_type", "day", "pm",
        penalty = 400.0)
      .select($"event_type", $"n", $"n_changepoints", $"cp_ords",
        round($"total_cost", 6).as("total_cost"))
  }

  /** q471 — exact matrix profile ([[graft.operators.MatrixProfile
    * .matrixProfile]]): every 7-day window of each event type's daily
    * cents scored by z-distance to its nearest non-trivial neighbor —
    * minima are the month's repeated shapes (motifs), maxima its
    * discords, the anomaly localization a global σ-test can't give
    * and q437's SAX census blurs. Exact long prefix moments, pinned
    * double z-shapes, ascending-j strict argmin, |i−j| ≥ m exclusion;
    * the oracle replays windows, folds and argmins grid-for-grid. */
  def q471MatrixProfile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.MatrixProfile.matrixProfile(dailyCents(spark, dir),
        "event_type", "day", "tot", m = 7)
      .select($"event_type", $"idx", $"ord",
        round($"mp", 6).as("mp"), $"mp_idx")

  /** q458 — Mood's median test ([[graft.operators.Eval.moodMedian]]):
    * do weekend and weekday event values sit on the same side of the
    * pooled median, per event type? The maximally-robust location
    * gate — one bit per row, outlier magnitudes invisible; the
    * deterministic lower-median pin replays cross-engine. */
  def q458MoodMedian(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.moodMedian(
        events(spark, dir).select($"event_type",
          when(dayofweek(to_date($"ts")).isin(1, 7), "wkend")
            .otherwise("wkday").as("arm"),
          round($"value" * 100).cast("long").as("cents")),
        "event_type", "arm", "cents")
      .select($"event_type", $"n", $"k_groups", $"pooled_med",
        $"n_above", round($"chi2", 6).as("chi2"), $"df")

  /** q474 — deterministic merging t-digest ([[graft.operators.Quantiles
    * .tdigestFromCensus]]): the per-event-type value distribution
    * compressed to δ = 16 tail-tapered centroids — exact integer
    * capacities (triangle scale, ceil division), exact decimal sums,
    * the persistable quantile sketch whose fold a DuckDB list_reduce
    * replays element for element. Complements q215's exact bisection:
    * bisection answers one rank exactly, the digest answers every
    * quantile approximately from δ rows. */
  def q474Tdigest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.tdigest(
        events(spark, dir).select($"event_type",
          round($"value" * 100).cast("long").as("cents")),
        "event_type", "cents", delta = 16)
      .select($"event_type", $"n", $"ci", $"w", $"mean", $"q_mid")
}
