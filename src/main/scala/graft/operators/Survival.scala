package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — the censoring-aware retention
  * curve (Kaplan & Meier 1958): S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over
  * observed event times, where a subject still active at the end of
  * the observation window is CENSORED (it contributes to the at-risk
  * denominators up to its horizon but never to the event counts).
  * The cohort-retention triangle (q231) ignores censoring — every
  * user who joined late looks churned; KM is the estimator that
  * reads right-truncated activity windows honestly.
  *
  * Scale shape: one (duration)-keyed census of the per-subject rows
  * is the only subject-scale aggregation; everything after runs on
  * the duration-sorted census (bounded by DISTINCT durations — days
  * of a window, not subjects). At-risk counts are suffix sums of
  * exact integers (total − prefix-before). The survival product
  * folds IN DURATION ORDER per census row over the prefix of
  * (1 − dᵢ/nᵢ) factors — each factor one double division of exact
  * integers, the product a fixed-order HOF fold (the q237/q243
  * contract), O(k²) on the k-row census, bit-replayable. Output:
  * (duration, n_obs, n_events, n_risk, survival). */
object Survival {

  /** `df`: one row per subject with an integral `durCol` (periods
    * survived) and `eventCol` = 1 when the endpoint was OBSERVED
    * (churn/failure), anything else = censored at that duration. */
  def kaplanMeier(df: DataFrame, durCol: String, eventCol: String): DataFrame = {
    val census = df
      .select(col(durCol).cast("long").as("d"),
        when(col(eventCol) === 1, 1L).otherwise(0L).as("e"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_obs"), sum(col("e")).as("deaths"))
    val wOrd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    // census-bounded global windows (distinct durations, never
    // subjects — a year-long daily window is ≤ 366 rows), and the
    // bound is GATED at runtime, not just argued (Guards.boundedCensus)
    val risked = Guards.boundedCensus(census, "d", "Survival.kaplanMeier")
      .withColumn("n_risk",
        sum(col("n_obs")).over(wAll) - coalesce(sum(col("n_obs")).over(wOrd), lit(0L)))
    val folded = risked
      .agg(sort_array(collect_list(struct(col("d"), col("n_obs"),
        col("deaths"), col("n_risk")))).as("__arr"))
      .select(expr(
        """explode(transform(__arr, (e, i) -> struct(
          |  e.d AS d, e.n_obs AS n_obs, e.deaths AS n_events,
          |  e.n_risk AS n_risk,
          |  aggregate(slice(__arr, 1, i + 1), CAST(1.0 AS DOUBLE),
          |    (acc, x) -> acc * (CAST(1.0 AS DOUBLE)
          |      - CAST(x.deaths AS DOUBLE) / CAST(x.n_risk AS DOUBLE)))
          |    AS survival)))""".stripMargin).as("r"))
    folded.select(col("r.d").as(durCol), col("r.n_obs"), col("r.n_events"),
      col("r.n_risk"), col("r.survival"))
  }

  /** Nelson–Aalen cumulative hazard — [[kaplanMeier]]'s additive twin:
    * H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ. Where KM multiplies survival away,
    * Nelson–Aalen ACCUMULATES instantaneous risk, which is the right
    * axis for "when does churn accelerate" (slope changes) and is
    * better-behaved at small risk sets. Also emits the
    * Fleming–Harrington survival exp(−H) — at large nᵢ it hugs KM,
    * and the gap between them is itself a small-sample warning.
    *
    * Same scale/exactness contract as [[kaplanMeier]]: duration-keyed
    * census, suffix-sum at-risk counts, hazard terms as single double
    * divisions of exact integers, the cumulative sum a fixed-order
    * fold over the duration-sorted census (O(k²) on k distinct
    * durations). Output: (duration, n_obs, n_events, n_risk,
    * cum_hazard, fh_survival). */
  def nelsonAalen(df: DataFrame, durCol: String, eventCol: String): DataFrame = {
    val census = df
      .select(col(durCol).cast("long").as("d"),
        when(col(eventCol) === 1, 1L).otherwise(0L).as("e"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_obs"), sum(col("e")).as("deaths"))
    val wOrd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val risked = Guards.boundedCensus(census, "d", "Survival.nelsonAalen")
      .withColumn("n_risk",
        sum(col("n_obs")).over(wAll) - coalesce(sum(col("n_obs")).over(wOrd), lit(0L)))
    val folded = risked
      .agg(sort_array(collect_list(struct(col("d"), col("n_obs"),
        col("deaths"), col("n_risk")))).as("__arr"))
      .select(expr(
        """explode(transform(__arr, (e, i) -> struct(
          |  e.d AS d, e.n_obs AS n_obs, e.deaths AS n_events,
          |  e.n_risk AS n_risk,
          |  aggregate(slice(__arr, 1, i + 1), CAST(0.0 AS DOUBLE),
          |    (acc, x) -> acc
          |      + CAST(x.deaths AS DOUBLE) / CAST(x.n_risk AS DOUBLE))
          |    AS cum_hazard)))""".stripMargin).as("r"))
    folded.select(col("r.d").as(durCol), col("r.n_obs"), col("r.n_events"),
      col("r.n_risk"), col("r.cum_hazard"),
      exp(-col("r.cum_hazard")).as("fh_survival"))
  }

  /** Log-rank test (Mantel 1966) — the A/B comparison for SURVIVAL
    * curves, the question two [[kaplanMeier]] runs can't answer
    * jointly ("is cohort B churning faster, accounting for
    * censoring"): at each event time, the observed deaths in A vs the
    * hypergeometric expectation under "same hazard",
    *   O_A = Σ d_At,  E_A = Σ d_t·n_At/n_t,
    *   V   = Σ d_t·(n_At/n_t)(n_Bt/n_t)(n_t−d_t)/(n_t−1),
    *   χ²(1) = (O_A − E_A)²/V,  p = erfc(√(χ²/2)).
    *
    * Exactness: all counts are exact integer censuses with suffix-sum
    * at-risk windows (the [[kaplanMeier]] shape per group); each E/V
    * term is ONE pinned double shape and both sums fold in duration
    * order; the p rides the pinned [[graft.functions.FastMath
    * .erfc]] kernel (bit-replayable polynomial, the q348 contract).
    * Durations with n_t ≤ 1 contribute no variance (pinned). Output
    * one row: (n_a, n_b, o_a, e_a, var_lr, chi2, p); chi2/p null when
    * V = 0. */
  def logRank(df: DataFrame, durCol: String, eventCol: String,
      isB: Column): DataFrame = {
    val census = df
      .select(col(durCol).cast("long").as("d"),
        when(col(eventCol) === 1, 1L).otherwise(0L).as("e"),
        when(isB, 1L).otherwise(0L).as("b"))
      .groupBy(col("d"))
      .agg(sum(lit(1L) - col("b")).as("oa"), sum(col("b")).as("ob"),
        sum(when(col("b") === 0L, col("e")).otherwise(0L)).as("da"),
        sum(when(col("b") === 1L, col("e")).otherwise(0L)).as("db"))
    val wOrd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val risked = Guards.boundedCensus(census, "d", "Survival.logRank")
      .withColumn("na",
        sum(col("oa")).over(wAll) - coalesce(sum(col("oa")).over(wOrd), lit(0L)))
      .withColumn("nb",
        sum(col("ob")).over(wAll) - coalesce(sum(col("ob")).over(wOrd), lit(0L)))
    def dd(c: Column): Column = c.cast("double")
    val dTot = col("da") + col("db")
    val nTot = col("na") + col("nb")
    val eTerm = when(dTot > 0L, dd(dTot) * dd(col("na")) / dd(nTot))
      .otherwise(lit(0.0))
    val vTerm = when(dTot > 0L && nTot > 1L,
      (dd(dTot) * dd(col("na")) * dd(col("nb")) * dd(nTot - dTot)) /
        (dd(nTot) * dd(nTot) * dd(nTot - 1L))).otherwise(lit(0.0))
    // the float sums fold in duration order (collect bounded by
    // distinct durations)
    val sums = risked
      .withColumn("__et", eTerm).withColumn("__vt", vTerm)
      .agg(sum(col("oa")).as("n_a"), sum(col("ob")).as("n_b"),
        sum(col("da")).as("o_a"),
        sort_array(collect_list(struct(col("d"), col("__et"), col("__vt"))))
          .as("__ts"))
      .select(col("n_a"), col("n_b"), col("o_a"),
        expr("aggregate(__ts, CAST(0.0 AS DOUBLE), (a, t) -> a + t.__et)")
          .as("e_a"),
        expr("aggregate(__ts, CAST(0.0 AS DOUBLE), (a, t) -> a + t.__vt)")
          .as("var_lr"))
    val chi2 = (col("o_a").cast("double") - col("e_a")) *
      (col("o_a").cast("double") - col("e_a")) / col("var_lr")
    sums.select(col("n_a"), col("n_b"), col("o_a"), col("e_a"),
      col("var_lr"),
      when(col("var_lr") > 0.0, chi2).as("chi2"),
      when(col("var_lr") > 0.0, graft.functions.FastMath.erfc(
        sqrt(chi2) / lit(1.4142135623730951))).as("p"))
  }

  /** Kaplan–Meier with Greenwood confidence bands (Greenwood 1926) —
    * the uncertainty [[kaplanMeier]]'s point curve hides: Var(S(t)) =
    * S(t)² · Σ_{tᵢ ≤ t} dᵢ/(nᵢ(nᵢ−dᵢ)), with the plain linear 95%
    * band S ± 1.96·SE clamped to [0, 1] (pinned convention; the
    * log-log transform would drag non-replayable ln/exp chains through
    * every row for little gain at census grain). A duration where
    * EVERYONE at risk dies (nᵢ = dᵢ) makes the Greenwood sum infinite
    * — from that row on se/lo/hi are null (NaN-poisoned in the fold,
    * nulled at the edge), which is the honest readout.
    *
    * Same shape/exactness contract as [[kaplanMeier]]: census-bounded
    * windows, per-row prefix folds (the survival product and the
    * Greenwood sum are UNCOUPLED accumulations, each its own fold).
    * Output: (duration, n_obs, n_events, n_risk, survival, se, lo,
    * hi). */
  def kaplanMeierCI(df: DataFrame, durCol: String, eventCol: String): DataFrame = {
    val census = df
      .select(col(durCol).cast("long").as("d"),
        when(col(eventCol) === 1, 1L).otherwise(0L).as("e"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_obs"), sum(col("e")).as("deaths"))
    val wOrd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val risked = Guards.boundedCensus(census, "d", "Survival.kaplanMeierCI")
      .withColumn("n_risk",
        sum(col("n_obs")).over(wAll) - coalesce(sum(col("n_obs")).over(wOrd), lit(0L)))
    val folded = risked
      .agg(sort_array(collect_list(struct(col("d"), col("n_obs"),
        col("deaths"), col("n_risk")))).as("__arr"))
      .select(expr(
        """explode(transform(__arr, (e, i) -> struct(
          |  e.d AS d, e.n_obs AS n_obs, e.deaths AS n_events,
          |  e.n_risk AS n_risk,
          |  aggregate(slice(__arr, 1, i + 1), CAST(1.0 AS DOUBLE),
          |    (acc, x) -> acc * (CAST(1.0 AS DOUBLE)
          |      - CAST(x.deaths AS DOUBLE) / CAST(x.n_risk AS DOUBLE)))
          |    AS survival,
          |  aggregate(slice(__arr, 1, i + 1), CAST(0.0 AS DOUBLE),
          |    (acc, x) -> acc + IF(x.n_risk > x.deaths,
          |      CAST(x.deaths AS DOUBLE)
          |        / (CAST(x.n_risk AS DOUBLE)
          |           * CAST(x.n_risk - x.deaths AS DOUBLE)),
          |      CAST('NaN' AS DOUBLE)))
          |    AS gsum)))""".stripMargin).as("r"))
    val se = when(!isnan(col("r.gsum")),
      col("r.survival") * sqrt(col("r.gsum")))
    folded.select(col("r.d").as(durCol), col("r.n_obs"), col("r.n_events"),
      col("r.n_risk"), col("r.survival").as("survival"),
      se.as("se"),
      when(se.isNotNull, greatest(col("r.survival") - lit(1.96) * se, lit(0.0)))
        .as("lo"),
      when(se.isNotNull, least(col("r.survival") + lit(1.96) * se, lit(1.0)))
        .as("hi"))
  }

  /** Restricted mean survival time (Royston & Parmar 2013's estimand,
    * computed from [[kaplanMeier]]'s step function): RMST(τ) = ∫₀^τ
    * S(t)dt — "expected retained days within the first τ" — the ONE
    * number a median can't give when S never crosses 0.5 (heavy
    * censoring) and the standard effect scale when proportional
    * hazards fail. The KM curve is a step function, so the integral is
    * an EXACT sum of rectangle areas: segment [d_{i−1}, d_i) carries
    * S_{i−1} (S before the first event time is 1), clipped at τ, plus
    * the open tail [d_max, τ) at the final S.
    *
    * Exactness: widths are integer min-arithmetic; each area is one
    * pinned product; areas fold IN DURATION ORDER over the
    * census-bounded list (the q237 contract) with the tail added last.
    * The duration census is Guards-gated before its unpartitioned
    * window, the [[kaplanMeier]] discipline. Output one row:
    * (tau, n_durations, rmst); null when the cohort is empty. */
  def rmst(df: DataFrame, durCol: String, eventCol: String,
      tau: Long): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    val km = kaplanMeier(df, durCol, eventCol)
      .select(col(durCol).as("d"), col("survival"))
    val gated = Guards.boundedCensus(km, "d", "Survival.rmst")
    val w = Window.orderBy(col("d"))
    val seg = gated
      .withColumn("pd", coalesce(lag(col("d"), 1).over(w), lit(0L)))
      .withColumn("ps", coalesce(lag(col("survival"), 1).over(w),
        lit(1.0)))
    val area = col("ps") *
      (least(col("d"), lit(tau)) - least(col("pd"), lit(tau)))
        .cast("double")
    val folded = seg.select(col("d"), area.as("t"), col("survival"))
      .agg(sort_array(collect_list(struct(col("d"), col("t")))).as("__t"),
        max(struct(col("d"), col("survival"))).as("__last"),
        count(lit(1)).as("n_durations"))
    val tail = col("__last").getField("survival") *
      (lit(tau) - least(col("__last").getField("d"), lit(tau)))
        .cast("double")
    folded.select(lit(tau).as("tau"), col("n_durations"),
      when(col("n_durations") > 0L,
        expr("aggregate(__t, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t)")
          + tail).as("rmst"))
  }

  /** Aalen–Johansen cumulative incidence for TWO competing risks —
    * the estimator [[kaplanMeier]] gets WRONG under competing events:
    * 1 − KM(cause k alone) treats the other cause's failures as
    * censoring and overstates incidence (the classic competing-risks
    * bias); the CIF distributes each instant's risk by cause against
    * the overall survival:
    *   CIF_k(t) = Σ_{tᵢ ≤ t} S(tᵢ₋) · d_{k,i}/nᵢ,
    * with S the ALL-cause KM. CIF₁ + CIF₂ + S(t) = 1 at every t — the
    * identity the spec asserts.
    *
    * Cause coding: 0 = censored, 1 and 2 = the competing events; any
    * other value raises LOUDLY (silently folding a third cause into
    * censoring is the bias this operator exists to avoid).
    *
    * Same scale/exactness contract as [[kaplanMeier]]: duration-keyed
    * census (Guards-bounded), suffix-sum at-risk counts, and ONE
    * seeded struct fold per duration row (cif fields first, survival
    * last — the q40 field-order discipline) where every per-step term
    * is a single double division of exact integers. Output:
    * (duration, n_risk, d_cause1, d_cause2, cif_1, cif_2,
    * survival). */
  def cumulativeIncidence(df: DataFrame, durCol: String,
      causeCol: String): DataFrame =
    cumulativeIncidenceFromCensus(cifCensus(df, durCol, causeCol))

  /** The duration-keyed cause census [[cumulativeIncidenceFromCensus]]
    * reads — ONE aggregation over the loud cause-code guard, so it
    * runs unchanged as a complete-mode streaming query (the
    * grubbsCensus split pattern). Output: (d, n_obs, d1, d2). */
  def cifCensus(df: DataFrame, durCol: String,
      causeCol: String): DataFrame = {
    val base = df.select(col(durCol).cast("long").as("d"),
      when(col(causeCol).cast("long").isin(0L, 1L, 2L),
        col(causeCol).cast("long"))
        .otherwise(raise_error(concat(
          lit("cumulativeIncidence: cause must be 0 (censored), 1 or 2"),
          lit(" — got "), col(causeCol).cast("string"))).cast("long"))
        .as("c"))
    base.groupBy(col("d")).agg(
      count(lit(1)).as("n_obs"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).as("d1"),
      sum(when(col("c") === 2L, 1L).otherwise(0L)).as("d2"))
  }

  /** Aalen–Johansen CIF board from a [[cifCensus]] table — the
    * at-risk suffix sums and the one seeded struct fold, shared by
    * the batch operator and the streaming twin's downstream read. */
  def cumulativeIncidenceFromCensus(census: DataFrame): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val risked = Guards.boundedCensus(census, "d",
        "Survival.cumulativeIncidence")
      .withColumn("n_risk",
        sum(col("n_obs")).over(wAll) -
          coalesce(sum(col("n_obs")).over(wOrd), lit(0L)))
    val folded = risked
      .agg(sort_array(collect_list(struct(col("d"), col("n_risk"),
        col("d1"), col("d2")))).as("__arr"))
      .select(expr(
        """explode(transform(__arr, (e, i) -> struct(
          |  e.d AS d, e.n_risk AS n_risk, e.d1 AS d1, e.d2 AS d2,
          |  aggregate(slice(__arr, 1, i + 1),
          |    named_struct('c1', CAST(0.0 AS DOUBLE),
          |      'c2', CAST(0.0 AS DOUBLE), 's', CAST(1.0 AS DOUBLE)),
          |    (acc, x) -> named_struct(
          |      'c1', acc.c1 + acc.s
          |        * (CAST(x.d1 AS DOUBLE) / CAST(x.n_risk AS DOUBLE)),
          |      'c2', acc.c2 + acc.s
          |        * (CAST(x.d2 AS DOUBLE) / CAST(x.n_risk AS DOUBLE)),
          |      's', acc.s * (CAST(1.0 AS DOUBLE)
          |        - CAST(x.d1 + x.d2 AS DOUBLE)
          |          / CAST(x.n_risk AS DOUBLE)))) AS st)))""".stripMargin)
        .as("r"))
    folded.select(col("r.d").as("duration"), col("r.n_risk"),
      col("r.d1").as("d_cause1"), col("r.d2").as("d_cause2"),
      col("r.st.c1").as("cif_1"), col("r.st.c2").as("cif_2"),
      col("r.st.s").as("survival"))
  }
}
