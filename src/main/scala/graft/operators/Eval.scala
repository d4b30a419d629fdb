package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation over data-scale predictions — the exact AUC a
  * pipeline computes for its quality/toxicity/language classifiers
  * before trusting them to gate a corpus.
  *
  * AUC == the Mann-Whitney statistic: P(score_pos > score_neg) + 0.5 *
  * P(tie). Computed WITHOUT ranking rows: collapse predictions to a
  * per-(group, score) census of positive/negative counts — the only
  * shuffle, partial-aggregated map-side — then one cumulative window
  * over DISTINCT score values per group:
  * U = sum_v[ np(v) * cum_nn(<v) ] + 0.5 * sum_v[ np(v) * nn(v) ].
  * A billion predictions with 4-decimal scores collapse to <=10^4
  * window rows per group; the window never sees row-scale data (the
  * q105 lesson: global row sorts die, bounded censuses don't — callers
  * should discretize continuous scores for exactly this reason).
  *
  * Determinism: both U terms are integer sums (exact at any
  * parallelism); the only float ops are one 0.5 scaling and one
  * division in a fixed shape — bit-replayable cross-engine. */
object Eval {

  /** Per group: n_pos, n_neg, and exact tie-aware AUC of `scoreCol`
    * against binary `labelCol` (1 = positive, anything else negative).
    * Groups with no positives or no negatives yield null AUC. */
  def auc(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    val census = df.select(col(groupCol).as("g"), col(scoreCol).as("s"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("p"))
      .groupBy("g", "s")
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("nn"))
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    census.withColumn("cum_nn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * col("cum_nn")).as("u_strict"),
        sum(col("np") * col("nn")).as("u_ties"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("u_strict").cast("double") + lit(0.5) * col("u_ties").cast("double")) /
            (col("n_pos").cast("double") * col("n_neg").cast("double"))))
      .select(col("g").as(groupCol), col("n_pos"), col("n_neg"),
        col("u_strict"), col("u_ties"), col("auc"))
  }

  /** Chi-square token-class association — the feature-selection /
    * contamination audit ("which tokens give the class away"): per
    * token, the 2x2 presence contingency (a = class docs containing it,
    * b = other docs containing it, c/d their complements) scored by
    * chi2 = N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)), top k returned.
    *
    * Scale shape: per-doc DISTINCT tokens shuffle once into the
    * contingency census (map-side combined); doc totals cross as one
    * broadcast row; the ranking rides [[TopK.topKStrPerGroup]]'s
    * k-bounded heaps — no global sort of the vocabulary. Numerator and
    * denominator stay in exact BIGINT arithmetic (safe to ~55M docs
    * before N*(ad-bc)^2 can overflow; beyond that, sample or shard),
    * and long->double casts round identically everywhere, so ranking
    * and scores replay bit-for-bit. Tokens present in every doc or in
    * no doc of a class can zero a margin: guarded to null chi2 and
    * dropped from the ranking. */
  def chiSquareTokens(df: DataFrame, textCol: String, classCol: String,
      k: Int): DataFrame = {
    val toks = df.select(when(col(classCol), 1L).otherwise(0L).as("y"),
        explode(array_distinct(filter(
          split(lower(trim(col(textCol))), "\\s+"), w => w =!= ""))).as("token"))
    val tot = broadcast(df.agg(
      sum(when(col(classCol), 1L).otherwise(0L)).as("n1"),
      count(lit(1)).as("n")))
    val cont = toks.groupBy(col("token"))
      .agg(sum(col("y")).as("a"), sum(lit(1L) - col("y")).as("b"))
      .crossJoin(tot)
      .withColumn("c", col("n1") - col("a"))
      .withColumn("d", col("n") - col("n1") - col("b"))
    val denom = (col("a") + col("b")) * (col("c") + col("d")) *
      (col("a") + col("c")) * (col("b") + col("d"))
    val diff = col("a") * col("d") - col("b") * col("c")
    val scored = cont.withColumn("chi2",
      when(denom > 0, (col("n") * diff * diff).cast("double") / denom.cast("double")))
      .where(col("chi2").isNotNull)
    TopK.topKStrPerGroup(scored.withColumn("g", lit("all")), "g", "token", "chi2", k)
      .join(scored.select(col("token"), col("a"), col("b")), Seq("token"))
      .select(col("rank"), col("token"), col("a"), col("b"), col("chi2"))
  }

  /** Wilson score interval per group — the small-n-honest confidence
    * bounds for a proportion: a 2/3 error rate and a 2000/3000 error
    * rate both "equal 0.67", but their Wilson intervals differ by an
    * order of magnitude, which is exactly what an alert threshold
    * needs to know (the naive Wald interval collapses to zero width at
    * p ∈ {0,1} — the failure mode that pages on one bad event).
    *
    * center = (p̂ + z²/2n) / (1 + z²/n),
    * halfwidth = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n).
    * Counts are exact integers; the bound expressions are one fixed
    * double shape with a z literal — replayable term for term.
    * Output: (group, n, n_pos, rate, lo, hi). */
  def wilsonBounds(df: DataFrame, groupCol: String, labelCol: String,
      z: Double = 1.96): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n_pos"))
    val nD = col("n").cast("double")
    val p = col("n_pos").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))) / denom
    counts.select(col(groupCol), col("n"), col("n_pos"),
      p.as("rate"), (center - half).as("lo"), (center + half).as("hi"))
  }

  /** Two-proportion z-test per group — "did the rate MOVE between
    * slice A and slice B, beyond what their sizes explain": the
    * pooled-variance statistic z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)).
    * The A/B companion to q180's Welch t (that compares means; this
    * compares rates). Counts are exact integers; the statistic is one
    * fixed double shape. Output: (group, n_a, pos_a, n_b, pos_b,
    * rate_a, rate_b, z); groups where the pooled variance is 0 yield
    * null z. */
  def twoProportionZ(df: DataFrame, groupCol: String, labelCol: String,
      isB: Column): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(sum(when(isB, 0L).otherwise(1L)).as("n_a"),
        sum(when(!isB && col(labelCol) === 1, 1L).otherwise(0L)).as("pos_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"),
        sum(when(isB && col(labelCol) === 1, 1L).otherwise(0L)).as("pos_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val pa = col("pos_a").cast("double") / na
    val pb = col("pos_b").cast("double") / nb
    val pPool = (col("pos_a") + col("pos_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val varPool = pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb)
    counts.select(col(groupCol), col("n_a"), col("pos_a"), col("n_b"),
      col("pos_b"), pa.as("rate_a"), pb.as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && varPool > 0.0,
        (pa - pb) / sqrt(varPool)).as("z"))
  }

  /** Calibration curve (reliability diagram) per group: equal-frequency
    * score buckets with per-bucket observed positive rate next to the
    * mean score — "when the classifier says 0.8, is it right 80% of
    * the time" — the companion readout to [[auc]] (AUC measures
    * ordering, calibration measures the scores themselves; a corpus
    * gate that thresholds a miscalibrated score filters the wrong
    * mass).
    *
    * Exactness ([[auc]]'s census discipline): scores must be integers
    * (quantize upstream); the (group, score) census is the only
    * row-scale aggregation. Bucketing is EQUAL-FREQUENCY from the
    * census cumulative — a tie-run's bucket is
    * min(B−1, rows_before·B div N) — so every equal score lands in ONE
    * bucket deterministically (no quantile interpolation, no float
    * thresholds, no row sort). Per-bucket mean score and positive rate
    * are single exact-integer divisions. Output: (group, bucket,
    * n, n_pos, mean_score, pos_rate). */
  def calibrationCurve(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val census = df.select(col(groupCol).as("g"), col(scoreCol).cast("long").as("s"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("p"))
      .groupBy("g", "s")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("np"))
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("g"))
    census
      .withColumn("__before", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("bucket",
        least(lit(buckets - 1L), expr(s"(__before * $buckets) div __tot")))
      .groupBy(col("g"), col("bucket"))
      .agg(sum(col("n")).as("n"), sum(col("np")).as("n_pos"),
        sum(col("s") * col("n")).as("__ssum"))
      .select(col("g").as(groupCol), col("bucket"), col("n"), col("n_pos"),
        (col("__ssum").cast("double") / col("n").cast("double")).as("mean_score"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"))
  }

  /** Per-group Cohen's kappa (Cohen 1960) — inter-annotator agreement
    * corrected for chance, THE label-quality gate on human-annotated
    * training data (two raters labeling the same items; kappa ~0 means
    * the expensive labels carry no signal beyond the marginals).
    *
    * Exactness: kappa = (po − pe)/(1 − pe) algebraically rearranged to
    * ONE double division of exact integers — (n·Σdiag − Σ row_k·col_k)
    * / (n² − Σ row_k·col_k) — products carried as DECIMAL(38,0), so
    * the statistic is bit-stable at any parallelism. Null when the
    * chance denominator is 0 (both raters constant on the same label).
    *
    * Scale shape: one (group, a, b) pair census (map-side combined),
    * label margins re-aggregated from the census (not the rows), and a
    * label-keyed margin join bounded by the label vocabulary. Output:
    * (group, n_items, n_agree, kappa). */
  def cohenKappa(df: DataFrame, groupCol: String, raterACol: String,
      raterBCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df
      .where(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(groupCol).as("g"),
        col(raterACol).cast("string").as("a"),
        col(raterBCol).cast("string").as("b"))
      .groupBy(col("g"), col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
    val totals = census.groupBy(col("g")).agg(
      sum(col("c")).as("n_items"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("n_agree"))
    val rowM = census.groupBy(col("g"), col("a").as("lbl"))
      .agg(sum(col("c")).as("ra"))
    val colM = census.groupBy(col("g"), col("b").as("lbl"))
      .agg(sum(col("c")).as("cb"))
    val pe = rowM.join(colM, Seq("g", "lbl"))
      .groupBy(col("g"))
      .agg(sum(col("ra").cast(dec) * col("cb").cast(dec)).cast(dec).as("__pe"))
    val nD = col("n_items").cast(dec)
    totals.join(pe, "g")
      .select(col("g"), col("n_items"), col("n_agree"),
        when(nD * nD - col("__pe") > 0,
          (nD * col("n_agree").cast(dec) - col("__pe")).cast("double") /
            (nD * nD - col("__pe")).cast("double"))
          .as("kappa"))
  }

  /** Per-group Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric
    * two-sample location test ([[twoProportionZ]]'s companion for
    * continuous outcomes; [[Divergence]]'s KS tests shape, this tests
    * shift). Sample membership is `labelCol` = 1 (A) vs otherwise (B).
    *
    * Exactness: the [[Regression.spearman]] doubled-mid-rank
    * discipline — tie mid-ranks enter doubled (always integers), so
    * the doubled rank sum R2a, the doubled statistic 2U = R2a −
    * n_a(n_a+1), and the tie term T = Σ(t³ − t) are all exact
    * integers (DECIMAL(38,0) products); the normal approximation
    *   z = (2U − n_a·n_b) / (2·sqrt(var)),
    *   var = n_a·n_b·(N³ − N − T) / (12·N·(N−1))
    * does float work only in the final sqrt/divisions. Null z when
    * the variance is 0 (all values tied). Continuity correction
    * omitted (documented; large-N pipelines don't want it).
    *
    * Scale shape: one (group, value) rank census with a census-sized
    * cumulative window, rows never re-shuffle — the census carries
    * per-sample counts so U folds from census rows alone. Output:
    * (group, n_a, n_b, u2, z) with u2 = the exact doubled U of
    * sample A. */
  def mannWhitneyU(df: DataFrame, groupCol: String, labelCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("isA"))
      .groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("t"), sum(col("isA")).as("ta"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = census
      .withColumn("__r2",
        lit(2L) * coalesce(sum(col("t")).over(w), lit(0L)) + col("t") + 1L)
    val sums = ranked.groupBy(col("g")).agg(
      sum(col("t")).as("n"),
      sum(col("ta")).as("n_a"),
      sum(col("ta").cast(dec) * col("__r2").cast(dec)).cast(dec).as("__r2a"),
      sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
        col("t").cast(dec)).cast(dec).as("__tie"))
    val nD = col("n").cast(dec)
    val naD = col("n_a").cast(dec)
    val nbD = (col("n") - col("n_a")).cast(dec)
    val u2 = col("__r2a") - naD * (naD + 1)
    val varNum = naD * nbD * (nD * nD * nD - nD - col("__tie"))
    val varDen = lit(12).cast(dec) * nD * (nD - 1)
    sums
      .withColumn("__u2", u2)
      .select(col("g"), col("n_a"), (col("n") - col("n_a")).as("n_b"),
        col("__u2").cast("long").as("u2"),
        when(col("n") > 1 && varNum > 0,
          (col("__u2") - naD * nbD).cast("double") /
            (lit(2.0) * sqrt(varNum.cast("double") / varDen.cast("double"))))
          .as("z"))
  }

  /** NDCG@k per query group (Järvelin & Kekäläinen 2002): exponential
    * gain (2^rel − 1) with the standard 1/log2(rank+1) discount, rel an
    * INTEGER label (gain stays exact under the shift). The position
    * discounts are JVM literals — log2 is not correctly-rounded, so a
    * replaying engine embeds the SAME doubles rather than re-deriving
    * them (the q275/q276 seam discipline). Ranking ties break by doc id;
    * the ideal ordering ties break (rel desc, doc asc) — same gain per
    * position either way, pinned for bit-stable float folds.
    *
    * Scale shape: two partitioned windows over one query-keyed exchange
    * (model ranking, ideal ranking), each cut to its top-k rows, then a
    * ≤k-element in-order fold per query — per-query memory is O(k), no
    * global window, no full-list collects. Output: (query, n_docs,
    * dcg, idcg, ndcg), ndcg null when the group has no positive gain. */
  def ndcgAtK(df: DataFrame, queryCol: String, docCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(df.schema(relCol).dataType ==
      org.apache.spark.sql.types.IntegerType ||
      df.schema(relCol).dataType == org.apache.spark.sql.types.LongType,
      s"relevance must be integral, got ${df.schema(relCol).dataType}")
    val disc = (1 to k)
      .map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val discArr = disc.map(d => s"CAST('$d' AS DOUBLE)")
      .mkString("array(", ", ", ")")
    val base = df.select(col(queryCol).as("q"), col(docCol).as("doc"),
      col(scoreCol).as("s"), col(relCol).cast("long").as("rel"))
    def foldTop(ordered: org.apache.spark.sql.expressions.WindowSpec,
        outCol: String): DataFrame =
      base.withColumn("__rk", row_number().over(ordered))
        .where(col("__rk") <= k)
        .groupBy(col("q"))
        .agg(count(lit(1)).as(s"__n_$outCol"),
          array_sort(collect_list(struct(col("__rk"), col("rel")))).as("__l"))
        .withColumn(outCol, expr(
          s"""aggregate(__l, CAST(0.0 AS DOUBLE), (acc, e) ->
             |  acc + CAST(shiftleft(1L, CAST(e.rel AS INT)) - 1L AS DOUBLE)
             |      * element_at($discArr, e.__rk))
             |""".stripMargin))
        .select(col("q"), col(s"__n_$outCol"), col(outCol))
    val byScore = Window.partitionBy(col("q"))
      .orderBy(col("s").desc, col("doc"))
    val byRel = Window.partitionBy(col("q"))
      .orderBy(col("rel").desc, col("doc"))
    val nDocs = base.groupBy(col("q")).agg(count(lit(1)).as("n_docs"))
    nDocs
      .join(foldTop(byScore, "dcg"), "q")
      .join(foldTop(byRel, "idcg"), "q")
      .select(col("q"), col("n_docs"), col("dcg"), col("idcg"),
        when(col("idcg") > 0.0, col("dcg") / col("idcg")).as("ndcg"))
  }

  /** 2×2 odds ratio and risk ratio with Wald 95% log-intervals per
    * scope — the effect-size pair for a binary exposure × binary
    * outcome ([[twoProportionZ]] says "different", this says "by how
    * much"): with cells a = exposed·outcome, b = exposed·no-outcome,
    * c = unexposed·outcome, d = unexposed·no-outcome,
    *   OR = ad/bc,  se_log = sqrt(1/a + 1/b + 1/c + 1/d),
    *   RR = [a/(a+b)] / [c/(c+d)],
    *   se_log = sqrt(1/a − 1/(a+b) + 1/c − 1/(c+d)).
    * All cells are exact integer censuses; the ratios, logs, and the
    * fixed ±1.96 interval bounds are pinned-shape doubles (1.96 is a
    * literal, exp/ln parity per q237). No smoothing: any empty cell
    * yields null OR fields (b or c zero kills OR; a or c zero kills
    * RR) — loud, not a Haldane-corrected guess. Output: (scope, a, b,
    * c, d, odds_ratio, or_lo, or_hi, risk_ratio, rr_lo, rr_hi).
    * One scope-keyed census; no other shuffle. */
  def oddsRiskRatio(df: DataFrame, scopeCol: String, exposedCol: String,
      outcomeCol: String): DataFrame = {
    val e = when(col(exposedCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val o = when(col(outcomeCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val cells = df
      .where(col(exposedCol).isNotNull && col(outcomeCol).isNotNull)
      .groupBy(col(scopeCol).as("s"))
      .agg(sum(when(e === 1L && o === 1L, 1L).otherwise(0L)).as("a"),
        sum(when(e === 1L && o === 0L, 1L).otherwise(0L)).as("b"),
        sum(when(e === 0L && o === 1L, 1L).otherwise(0L)).as("c"),
        sum(when(e === 0L && o === 0L, 1L).otherwise(0L)).as("d"))
    def dd(c: Column): Column = c.cast("double")
    val orOk = col("a") > 0L && col("b") > 0L && col("c") > 0L && col("d") > 0L
    val orv = dd(col("a")) * dd(col("d")) / (dd(col("b")) * dd(col("c")))
    val orSe = sqrt(lit(1.0) / dd(col("a")) + lit(1.0) / dd(col("b")) +
      lit(1.0) / dd(col("c")) + lit(1.0) / dd(col("d")))
    val rrOk = col("a") > 0L && col("c") > 0L &&
      col("a") + col("b") > 0L && col("c") + col("d") > 0L
    val rrv = (dd(col("a")) / dd(col("a") + col("b"))) /
      (dd(col("c")) / dd(col("c") + col("d")))
    val rrSe = sqrt(lit(1.0) / dd(col("a")) - lit(1.0) / dd(col("a") + col("b")) +
      lit(1.0) / dd(col("c")) - lit(1.0) / dd(col("c") + col("d")))
    cells.select(col("s"), col("a"), col("b"), col("c"), col("d"),
      when(orOk, orv).as("odds_ratio"),
      when(orOk, exp(log(orv) - lit(1.96) * orSe)).as("or_lo"),
      when(orOk, exp(log(orv) + lit(1.96) * orSe)).as("or_hi"),
      when(rrOk, rrv).as("risk_ratio"),
      when(rrOk, exp(log(rrv) - lit(1.96) * rrSe)).as("rr_lo"),
      when(rrOk, exp(log(rrv) + lit(1.96) * rrSe)).as("rr_hi"))
  }

  /** Poisson rate ratio with a Wald log-interval per scope —
    * [[oddsRiskRatio]]'s EXPOSURE-normalized sibling: when the two
    * arms observe different amounts of time/volume (n₁ events over e₁
    * exposure units vs n₂ over e₂), comparing raw counts lies;
    *   RR = (n₁/e₁)/(n₂/e₂) = n₁·e₂/(n₂·e₁),
    *   CI = exp(ln RR ± 1.96·√(1/n₁ + 1/n₂))
    * (counts Poisson, exposures fixed — the incidence-rate-ratio
    * setup). The throughput-regression gate: error rates per
    * machine-hour, events per crawl-day, defects per million tokens.
    *
    * Exactness: counts and exposures are exact integers; RR is ONE
    * correctly-rounded division of exact decimal cross-products; the
    * interval is pinned-shape doubles (1.96 literal, exp/ln parity
    * per q237). Null RR when either count or exposure is 0 — loud,
    * no continuity fudge. Output: (scope, n1, e1, n2, e2,
    * rate_ratio, lo, hi). One scope-keyed census; no other shuffle.
    *
    * Input: `isArm1` splits rows into the two arms; exposure is the
    * count of DISTINCT `exposureCol` values per arm (e.g. distinct
    * days — so exposure derives from the same census, not a side
    * table). */
  def rateRatio(df: DataFrame, scopeCol: String, isArm1: Column,
      exposureCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .select(col(scopeCol).as("s"),
        when(isArm1, 1L).otherwise(0L).as("arm"), col(exposureCol).as("ex"))
      .groupBy(col("s"))
      .agg(sum(col("arm")).as("n1"),
        sum(lit(1L) - col("arm")).as("n2"),
        countDistinct(when(col("arm") === 1L, col("ex"))).as("e1"),
        countDistinct(when(col("arm") === 0L, col("ex"))).as("e2"))
    def dd(c: Column): Column = c.cast("double")
    val ok = col("n1") > 0L && col("n2") > 0L &&
      col("e1") > 0L && col("e2") > 0L
    val rr = (col("n1").cast(dec) * col("e2").cast(dec)).cast(dec)
      .cast("double") /
      (col("n2").cast(dec) * col("e1").cast(dec)).cast(dec).cast("double")
    val se = sqrt(lit(1.0) / dd(col("n1")) + lit(1.0) / dd(col("n2")))
    cells.select(col("s"), col("n1"), col("e1"), col("n2"), col("e2"),
      when(ok, rr).as("rate_ratio"),
      when(ok, exp(log(rr) - lit(1.96) * se)).as("lo"),
      when(ok, exp(log(rr) + lit(1.96) * se)).as("hi"))
  }

  /** Sequential probability ratio test (Wald 1945) per scope — the
    * monitoring view the fixed-horizon battery ([[twoProportionZ]],
    * [[mcnemar]]) cannot give: watch a binary success stream period by
    * period and STOP the moment the evidence crosses a bound, instead
    * of peeking (which inflates α). Simple hypotheses p₀ vs p₁; after
    * s successes / f failures the log-likelihood ratio is
    *   LLR = s·ln(p₁/p₀) + f·ln((1−p₁)/(1−p₀)),
    * accepted H₁ at LLR ≥ ln((1−β)/α), H₀ at LLR ≤ ln(β/(1−α)); the
    * first crossing is the verdict and later data cannot un-ring it.
    *
    * Determinism: per-period success/failure counts are exact
    * integers; the two ln factors are computed ONCE from literal
    * rationals (milli-unit params — ln parity per q121) and LLR is
    * count·factor + count·factor, a pinned-shape double per row; the
    * cumulative walk is an integer window, so the crossing period is
    * decided on bit-stable values. Output one row per period: (scope,
    * period, n, successes, cum_n, cum_s, llr, state) with state ∈
    * {continue, accept_h1, accept_h0} — the FIRST crossing latches: the
    * verdict is the bound crossed at the earliest period (first-crossing
    * min over the cumulative frame), so a later opposite crossing never
    * reverses it.
    *
    * Scale shape: one (scope, period) census at row scale, then
    * period-bounded windows per scope. */
  def sprt(df: DataFrame, scopeCol: String, periodCol: String,
      successCol: String, p0Milli: Long, p1Milli: Long,
      alphaMilli: Long, betaMilli: Long): DataFrame = {
    require(p0Milli > 0 && p0Milli < 1000 && p1Milli > 0 && p1Milli < 1000
      && p0Milli != p1Milli, s"p0/p1 must be distinct in (0,1000) milli")
    require(alphaMilli > 0 && alphaMilli < 1000 &&
      betaMilli > 0 && betaMilli < 1000, "alpha/beta must be in (0,1000)")
    val lS = math.log(p1Milli.toDouble / p0Milli.toDouble)
    val lF = math.log((1000.0 - p1Milli) / (1000.0 - p0Milli))
    val hi = math.log((1000.0 - betaMilli) / alphaMilli)
    val lo = math.log(betaMilli / (1000.0 - alphaMilli))
    val census = df
      .select(col(scopeCol).as("sc"), col(periodCol).as("p"),
        when(col(successCol).cast("long") =!= 0L, 1L).otherwise(0L)
          .as("y"))
      .groupBy(col("sc"), col("p"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    sprtFromCensus(census, "sc", "p", "n", "s",
      p0Milli, p1Milli, alphaMilli, betaMilli)
  }

  /** [[sprt]] derived from an existing (scope, period, n, successes)
    * census — the consumer side of
    * [[graft.streaming.Streams.sprtCensusStream]]: the stream
    * maintains ONLY the bounded period census (scopes × periods, never
    * event-scale state), and this walk turns any census prefix into
    * the identical verdict sequence the batch operator produces on the
    * same rows (parity spec-asserted). Same pinned-shape LLR and
    * latched-crossing semantics as [[sprt]]. */
  def sprtFromCensus(census: DataFrame, scopeCol: String, periodCol: String,
      nCol: String, sCol: String, p0Milli: Long, p1Milli: Long,
      alphaMilli: Long, betaMilli: Long): DataFrame = {
    require(p0Milli > 0 && p0Milli < 1000 && p1Milli > 0 && p1Milli < 1000
      && p0Milli != p1Milli, s"p0/p1 must be distinct in (0,1000) milli")
    require(alphaMilli > 0 && alphaMilli < 1000 &&
      betaMilli > 0 && betaMilli < 1000, "alpha/beta must be in (0,1000)")
    val lS = math.log(p1Milli.toDouble / p0Milli.toDouble)
    val lF = math.log((1000.0 - p1Milli) / (1000.0 - p0Milli))
    val hi = math.log((1000.0 - betaMilli) / alphaMilli)
    val lo = math.log(betaMilli / (1000.0 - alphaMilli))
    val c = census.select(col(scopeCol).as("sc"), col(periodCol).as("p"),
      col(nCol).cast("long").as("n"), col(sCol).cast("long").as("s"))
    val wCum = Window.partitionBy(col("sc")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val walked = c
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_s", sum(col("s")).over(wCum))
      .withColumn("llr",
        col("cum_s").cast("double") * lit(lS) +
          (col("cum_n") - col("cum_s")).cast("double") * lit(lF))
    // latch on crossing ORDER, not on two independent flags: the verdict
    // is the one whose bound was crossed at the EARLIEST period, so a
    // later opposite crossing can never un-ring an already-latched
    // verdict (a two-flag max() latch would flip accept_h0 -> accept_h1
    // whenever the LLR later rose past hi). min(when(...)) over the
    // cumulative frame is the first-crossing period; a same-period tie
    // (possible only when alpha+beta >= 1 makes hi <= lo) keeps the
    // documented accept_h1 preference.
    val firstHi = min(when(col("llr") >= lit(hi), col("p"))).over(wCum)
    val firstLo = min(when(col("llr") <= lit(lo), col("p"))).over(wCum)
    walked
      .withColumn("state",
        when(firstHi.isNotNull && (firstLo.isNull || firstHi <= firstLo),
          "accept_h1")
          .when(firstLo.isNotNull, "accept_h0")
          .otherwise("continue"))
      .select(col("sc"), col("p"), col("n"), col("s").as("successes"),
        col("cum_n"), col("cum_s"), col("llr"), col("state"))
  }

  /** CUPED variance reduction (Deng et al. 2013) per scope — the
    * experimentation workhorse: shrink an A/B metric's variance using
    * a PRE-experiment covariate x (last month's activity), via
    * ŷ = y − θ(x − x̄) with θ = cov(x,y)/var(x) pooled across arms.
    * Same treatment-effect estimate, tighter CI — often 30–50% less
    * variance for free. Reports the adjusted per-arm means and the
    * variance-reduction ratio (1 − ρ²) so the caller sees what the
    * covariate bought.
    *
    * Exactness: all five moments (Σx, Σy, Σxy, Σx², Σy², per arm and
    * pooled) are exact integer sums (decimal(38,0) products of
    * integer-unit inputs); θ, the adjusted means, and the reduction
    * ratio are fixed-shape combinations of single correctly-rounded
    * divisions. Null θ (and pass-through means) when var(x) = 0.
    *
    * Scale shape: one scope×arm census aggregation — map-side
    * combined, nothing else shuffles. Output: (scope, n_a, n_b,
    * mean_a, mean_b, theta, adj_mean_a, adj_mean_b, diff, adj_diff,
    * var_reduction). */
  def cuped(df: DataFrame, scopeCol: String, isArmA: Column,
      covariateCol: String, metricCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(covariateCol).isNotNull &&
        col(metricCol).isNotNull)
      .select(col(scopeCol).as("sc"),
        when(isArmA, 1L).otherwise(0L).as("a"),
        col(covariateCol).cast("long").as("x"),
        col(metricCol).cast("long").as("y"))
    def m(c: Column): Column = sum(c.cast(dec)).cast(dec)
    val agg = base.groupBy(col("sc")).agg(
      sum(col("a")).as("n_a"), sum(lit(1L) - col("a")).as("n_b"),
      m(col("x")).as("sx"), m(col("y")).as("sy"),
      m((col("x").cast(dec) * col("y").cast(dec)).cast(dec)).as("sxy"),
      m((col("x").cast(dec) * col("x").cast(dec)).cast(dec)).as("sxx"),
      m((col("y").cast(dec) * col("y").cast(dec)).cast(dec)).as("syy"),
      sum(when(col("a") === 1L, col("x")).otherwise(0L)).as("sxa"),
      sum(when(col("a") === 1L, col("y")).otherwise(0L)).as("sya"),
      sum(when(col("a") === 0L, col("x")).otherwise(0L)).as("sxb"),
      sum(when(col("a") === 0L, col("y")).otherwise(0L)).as("syb"))
    val n = (col("n_a") + col("n_b")).cast(dec)
    def dd(c: Column): Column = c.cast("double")
    val covNum = (n * col("sxy") - col("sx") * col("sy")).cast(dec)
    val varXNum = (n * col("sxx") - col("sx") * col("sx")).cast(dec)
    val varYNum = (n * col("syy") - col("sy") * col("sy")).cast(dec)
    val theta = dd(covNum) / dd(varXNum)
    val xbar = dd(col("sx")) / dd(n)
    val meanA = dd(col("sya")) / dd(col("n_a"))
    val meanB = dd(col("syb")) / dd(col("n_b"))
    val adjA = meanA - theta * (dd(col("sxa")) / dd(col("n_a")) - xbar)
    val adjB = meanB - theta * (dd(col("sxb")) / dd(col("n_b")) - xbar)
    val rho2 = (dd(covNum) / dd(varXNum)) * (dd(covNum) / dd(varYNum))
    val ok = varXNum =!= lit(0).cast(dec) && varYNum =!= lit(0).cast(dec) &&
      col("n_a") > 0L && col("n_b") > 0L
    agg.select(col("sc"), col("n_a"), col("n_b"),
      when(col("n_a") > 0L, meanA).as("mean_a"),
      when(col("n_b") > 0L, meanB).as("mean_b"),
      when(ok, theta).as("theta"),
      when(ok, adjA).as("adj_mean_a"),
      when(ok, adjB).as("adj_mean_b"),
      when(col("n_a") > 0L && col("n_b") > 0L, meanA - meanB).as("diff"),
      when(ok, adjA - adjB).as("adj_diff"),
      when(ok, lit(1.0) - rho2).as("var_reduction"))
  }

  /** Difference-in-differences per scope — the panel-data causal
    * estimate that survives a level confound [[cuped]] cannot touch:
    * with a treated and a control series observed pre and post,
    *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)
    * cancels both the group level and the common time trend (parallel
    * trends assumed — state it, don't hide it). The "did the rollout
    * cause the shift" number for staged launches. Wald interval from
    * the four cells' pooled variances: SE² = Σ s²_c/n_c, CI ±1.96·SE.
    *
    * Exactness: all four cells' (n, Σy, Σy²) are exact integer sums
    * (decimal(38,0)); means, the per-cell sample variances
    * (n·Σy²−(Σy)²)/(n(n−1)), and the fixed ±1.96 combination are
    * pinned-shape doubles of single correctly-rounded divisions. Null
    * interval when any cell has n < 2 (no within-cell variance);
    * null DiD when any cell is empty — loud, not an extrapolation.
    *
    * Scale shape: ONE scope-keyed census aggregation, map-side
    * combined; nothing else shuffles. Output: (scope, n_tpre, n_tpost,
    * n_cpre, n_cpost, did, lo, hi). */
  def diffInDiff(df: DataFrame, scopeCol: String, isTreated: Column,
      isPost: Column, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"),
        when(isTreated, 1L).otherwise(0L).as("t"),
        when(isPost, 1L).otherwise(0L).as("q"),
        col(valueCol).cast("long").as("y"))
    def cell(t: Long, q: Long, suff: String) = Seq(
      sum(when(col("t") === t && col("q") === q, 1L).otherwise(0L))
        .as(s"n_$suff"),
      sum(when(col("t") === t && col("q") === q, col("y").cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as(s"s_$suff"),
      sum(when(col("t") === t && col("q") === q,
        (col("y").cast(dec) * col("y").cast(dec)).cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as(s"q_$suff"))
    val cellCols = cell(1L, 0L, "tpre") ++ cell(1L, 1L, "tpost") ++
      cell(0L, 0L, "cpre") ++ cell(0L, 1L, "cpost")
    val agg = base.groupBy(col("sc")).agg(cellCols.head, cellCols.tail: _*)
    def dd(c: Column): Column = c.cast("double")
    def mean(s: String) = dd(col(s"s_$s")) / dd(col(s"n_$s"))
    def v(s: String) = {
      val nD = col(s"n_$s").cast(dec)
      (nD * col(s"q_$s") - col(s"s_$s") * col(s"s_$s")).cast(dec)
        .cast("double") / (nD * (nD - 1)).cast(dec).cast("double")
    }
    val cells = Seq("tpre", "tpost", "cpre", "cpost")
    val allPresent = cells.map(s => col(s"n_$s") > 0L).reduce(_ && _)
    val allVar = cells.map(s => col(s"n_$s") > 1L).reduce(_ && _)
    val did = (mean("tpost") - mean("tpre")) -
      (mean("cpost") - mean("cpre"))
    val se = sqrt(cells.map(s => v(s) / dd(col(s"n_$s"))).reduce(_ + _))
    agg.select(col("sc"), col("n_tpre"), col("n_tpost"), col("n_cpre"),
      col("n_cpost"),
      when(allPresent, did).as("did"),
      when(allVar, did - lit(1.96) * se).as("lo"),
      when(allVar, did + lit(1.96) * se).as("hi"))
  }

  /** Fixed-effect inverse-variance meta-analysis with Cochran's Q and
    * I² (Higgins & Thompson 2002) — pool one effect measured across k
    * strata (sites, sources, weeks) into a single estimate AND say
    * whether the strata even agree: pooled = Σwᵢeᵢ/Σwᵢ with
    * wᵢ = 1/var(eᵢ), Q = Σwᵢ(eᵢ − pooled)², I² = max(0, (Q−(k−1))/Q).
    * High I² means the per-stratum effects disagree beyond sampling
    * noise — pooling hides structure and the per-stratum table is the
    * real answer. Input: one row per stratum with the effect and its
    * variance (any upstream estimator: mean diffs, [[rateRatio]] logs,
    * [[diffInDiff]]s).
    *
    * Determinism: weights and per-stratum terms are single divisions;
    * the k-bounded sums fold in stratum order (the q285 discipline —
    * strata are a bounded dimension, never data-scale). Null I² when
    * Q = 0 or k < 2. Output one row: (k, pooled, se_pooled, q,
    * i_squared). */
  def metaFixedEffect(df: DataFrame, stratumCol: String, effectCol: String,
      varianceCol: String): DataFrame = {
    val rows = df.where(col(varianceCol).isNotNull &&
        col(varianceCol) > 0.0 && col(effectCol).isNotNull)
      .select(col(stratumCol).as("st"), col(effectCol).cast("double").as("e"),
        col(varianceCol).cast("double").as("v"))
    val folded = rows
      .agg(sort_array(collect_list(struct(col("st"), col("e"), col("v"))))
        .as("__xs"))
      .select(size(col("__xs")).cast("long").as("k"),
        aggregate(col("__xs"), lit(0.0d),
          (a, x) => a + lit(1.0) / x.getField("v")).as("__sw"),
        aggregate(col("__xs"), lit(0.0d),
          (a, x) => a + x.getField("e") / x.getField("v")).as("__swe"),
        col("__xs"))
    val pooled = col("__swe") / col("__sw")
    folded
      .withColumn("pooled", pooled)
      .withColumn("__q", aggregate(col("__xs"), lit(0.0d),
        (a, x) => a + (x.getField("e") - col("pooled")) *
          (x.getField("e") - col("pooled")) / x.getField("v")))
      .select(col("k"), col("pooled"),
        sqrt(lit(1.0) / col("__sw")).as("se_pooled"),
        col("__q").as("q"),
        when(col("k") >= 2L && col("__q") > 0.0,
          greatest(lit(0.0),
            (col("__q") - (col("k") - 1L).cast("double")) / col("__q")))
          .as("i_squared"))
  }

  /** McNemar's test (McNemar 1947, continuity-corrected) per scope —
    * the PAIRED companion to [[twoProportionZ]]: each row is one unit
    * observed under both conditions (binary `aCol`, `bCol`); only the
    * DISCORDANT counts matter (n01 = a=0,b=1; n10 = a=1,b=0), and
    *   chi² = (|n01 − n10| − 1)² / (n01 + n10).
    * The A/B guard for paired designs (same user before/after, same doc
    * under two classifiers), where the unpaired z-test wastes the
    * pairing and overstates variance.
    *
    * All counts exact integers; chi²'s square stays in decimal (the
    * discordant gap can reach group size) and the single division is
    * the only float op. Output: (scope, n, n01, n10, chi2); chi2 null
    * when there are no discordant pairs (the test is undefined, loudly
    * — not a fake 0). One scope-keyed census aggregation, map-side
    * combined; no other shuffle. */
  def mcnemar(df: DataFrame, scopeCol: String, aCol: String,
      bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val a = when(col(aCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val b = when(col(bCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val counts = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(scopeCol).as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(a === 0L && b === 1L, 1L).otherwise(0L)).as("n01"),
        sum(when(a === 1L && b === 0L, 1L).otherwise(0L)).as("n10"))
    val gap = abs(col("n01") - col("n10")) - 1L
    val num = (gap.cast(dec) * gap.cast(dec)).cast(dec)
    counts.select(col("s"), col("n"), col("n01"), col("n10"),
      when(col("n01") + col("n10") > 0L,
        num.cast("double") / (col("n01") + col("n10")).cast("double"))
        .as("chi2"))
  }

  /** Brier score with the Murphy (1973) decomposition and ECE — the
    * probabilistic-forecast audit behind [[calibrationCurve]]: the
    * curve SHOWS where confidence and accuracy diverge, these numbers
    * GATE it. Scores are integer probabilities in [0, `scale`]
    * (clamped; e.g. cents with scale=100):
    *   brier = (1/N)·Σ (s_i/scale − y_i)²    (unbinned, exact)
    *   ece   = Σ_b (n_b/N)·|conf_b − acc_b|  (equal-width bins)
    *   rel   = (1/N)·Σ_b n_b(conf_b − acc_b)²
    *   res   = (1/N)·Σ_b n_b(acc_b − ȳ)²
    *   unc   = ȳ(1 − ȳ)
    * with brier ≈ rel − res + unc (exact when every score in a bin is
    * equal; the within-bin score variance is the residual — documented,
    * not hidden).
    *
    * Exactness: brier's and ece's numerators and unc are ALL-integer
    * (decimal(38,0)) with one terminal division each. rel/res need a
    * per-bin division (denominators n_b differ), so each bin term is
    * one exact-integer division and the ≤`buckets` terms fold in bin
    * order (the q237 contract) — bit-reproducible cross-engine.
    *
    * Scale shape: one (group, score) census at row scale (score
    * cardinality ≤ scale+1 caps it), a bucket re-aggregation, one
    * group-total join at census grain, and bucket-bounded folds. Output:
    * (g, n, n_pos, brier, ece, reliability, resolution, uncertainty);
    * all null when the group is empty of labeled rows. */
  def brierDecomposition(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, scale: Long, buckets: Int): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val dec = "decimal(38,0)"
    val sc = lit(scale).cast(dec)
    val census = df.where(col(scoreCol).isNotNull)
      .select(col(groupCol).as("g"),
        greatest(lit(0L), least(lit(scale), col(scoreCol).cast("long")))
          .as("s"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("y"))
      .groupBy(col("g"), col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
      .localCheckpoint(true)
    val sD = col("s").cast(dec)
    val tot = census.groupBy(col("g")).agg(
      sum(col("n")).as("nn"), sum(col("np")).as("npos"),
      sum((col("np").cast(dec) *
          ((lit(scale) - col("s")).cast(dec) *
            (lit(scale) - col("s")).cast(dec)).cast(dec)).cast(dec) +
        ((col("n") - col("np")).cast(dec) * (sD * sD).cast(dec)).cast(dec))
        .cast(dec).as("__bnum"))
    val bins = census
      .withColumn("b", expr(s"(s * $buckets) div ${scale + 1}"))
      .groupBy(col("g"), col("b"))
      .agg(sum(col("n")).as("nb"), sum(col("np")).as("npb"),
        sum(sD * col("n").cast(dec)).cast(dec).as("ssb"))
    val d1 = (col("ssb") - col("npb").cast(dec) * sc).cast(dec)
    val d2 = (col("npb").cast(dec) * col("nn").cast(dec) -
      col("npos").cast(dec) * col("nb").cast(dec)).cast(dec)
    val binsT = bins.join(tot.select(col("g"), col("nn"), col("npos")), "g")
      .select(col("g"), col("b"),
        abs(d1).as("__en"),
        ((d1 * d1).cast(dec).cast("double") / col("nb").cast("double"))
          .as("__rt"),
        ((d2 * d2).cast(dec).cast("double") / col("nb").cast("double"))
          .as("__st"))
    val folded = binsT
      .groupBy(col("g"))
      .agg(sum(col("__en")).cast(dec).as("__esum"),
        sort_array(collect_list(struct(col("b"), col("__rt"), col("__st"))))
          .as("__ts"))
      .select(col("g"), col("__esum"),
        aggregate(col("__ts"), lit(0.0d),
          (a, t) => a + t.getField("__rt")).as("__rsum"),
        aggregate(col("__ts"), lit(0.0d),
          (a, t) => a + t.getField("__st")).as("__ssum"))
    val nnD = col("nn").cast(dec)
    val nonEmpty = col("nn") > 0L
    tot.join(folded, "g")
      .select(col("g"), col("nn").as("n"), col("npos").as("n_pos"),
        when(nonEmpty, col("__bnum").cast("double") /
          (nnD * sc * sc).cast(dec).cast("double")).as("brier"),
        when(nonEmpty, col("__esum").cast("double") /
          (nnD * sc).cast(dec).cast("double")).as("ece"),
        when(nonEmpty, col("__rsum") /
          (nnD * sc * sc).cast(dec).cast("double")).as("reliability"),
        when(nonEmpty, col("__ssum") /
          (nnD * nnD * nnD).cast(dec).cast("double")).as("resolution"),
        when(nonEmpty,
          (col("npos").cast(dec) * (col("nn") - col("npos")).cast(dec))
            .cast(dec).cast("double") / (nnD * nnD).cast(dec).cast("double"))
          .as("uncertainty"))
  }

  /** Fleiss' kappa (Fleiss 1971) — [[cohenKappa]]'s many-rater
    * generalization: chance-corrected agreement when each subject
    * (document, example) carries exactly `n` categorical ratings
    * (annotators, model votes, redundant labelers) and raters need not
    * be identified or consistent across subjects. THE inter-annotator
    * number on a crowd-labeled training set. Subjects with a rating
    * count ≠ n are EXCLUDED and counted (`n_dropped`) — padding or
    * truncating would silently change the statistic.
    *
    * Exactness: with per-(subject, category) counts n_ij, column
    * totals C_j, N subjects: P̄ = A/B (A = Σn_ij² − N·n,
    * B = N·n·(n−1)) and P̄e = E/F (E = ΣC_j², F = (N·n)²) are exact
    * integer rationals, and κ = (P̄ − P̄e)/(1 − P̄e) cross-multiplies
    * to (A·F − E·B)/(B·(F − E)) — decimal(38,0) throughout (A·F at
    * 10^7 subjects × n=10 stays under 10^34); each output is one
    * correctly-rounded division. κ null when P̄e = 1 (every rating in
    * one category — no chance correction possible).
    *
    * Scale shape: one (subject, category) census at row scale, a
    * subject-keyed completeness re-aggregation, a category-keyed
    * (k-bounded) re-aggregation, two broadcast scalars. No window, no
    * row-scale join. Output one row: (n_raters, n_subjects, n_dropped,
    * n_categories, p_bar, p_e, kappa). */
  def fleissKappa(df: DataFrame, subjectCol: String, categoryCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"n (ratings per subject) must be >= 2, got $n")
    val dec = "decimal(38,0)"
    val cells = df.where(col(categoryCol).isNotNull)
      .groupBy(col(subjectCol).as("s"), col(categoryCol).as("cat"))
      .agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val bySubj = cells.groupBy(col("s"))
      .agg(sum(col("nij")).as("__tot"),
        sum(col("nij").cast(dec) * col("nij").cast(dec)).cast(dec)
          .as("__sq"))
    val kept = bySubj.where(col("__tot") === n.toLong).localCheckpoint(true)
    val dropped = broadcast(bySubj.where(col("__tot") =!= n.toLong)
      .agg(count(lit(1)).as("n_dropped")))
    val keptSubj = kept.select(col("s"))
    val colTot = cells.join(keptSubj, "s")
      .groupBy(col("cat")).agg(sum(col("nij")).as("cj"))
    val cats = broadcast(colTot.agg(count(lit(1)).as("n_categories"),
      sum(col("cj").cast(dec) * col("cj").cast(dec)).cast(dec).as("__e")))
    val subj = kept.agg(count(lit(1)).as("n_subjects"),
      sum(col("__sq")).cast(dec).as("__ssq"))
    val nD = lit(n.toLong).cast(dec)
    val nsD = col("n_subjects").cast(dec)
    val a = (col("__ssq") - nsD * nD).cast(dec)
    val b = (nsD * nD * (nD - 1)).cast(dec)
    val f = (nsD * nD * nsD * nD).cast(dec)
    val e = col("__e")
    subj.crossJoin(dropped).crossJoin(cats)
      .select(lit(n.toLong).as("n_raters"), col("n_subjects"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        col("n_categories"),
        when(col("n_subjects") > 0L,
          a.cast("double") / b.cast("double")).as("p_bar"),
        when(col("n_subjects") > 0L,
          e.cast("double") / f.cast("double")).as("p_e"),
        when(col("n_subjects") > 0L && f =!= e,
          (a * f - e * b).cast(dec).cast("double") /
            (b * (f - e)).cast(dec).cast("double")).as("kappa"))
  }

  /** Cumulative gains / lift table per group — [[calibrationCurve]]'s
    * TARGETING twin: sort by score DESCENDING, cut into `buckets`
    * rank-deciles, and report what fraction of all positives the top
    * k deciles capture (gain) and how much better than random that is
    * (lift = gain / depth). THE "how deep do I have to dredge"
    * read-out for a quality-score gate: "the top 20% of docs by score
    * hold 55% of the known-good" is this table's second row.
    *
    * Deciles come from the same deterministic rank-census cut as
    * [[calibrationCurve]] (rows_before·B div N on the DESCENDING score
    * census — every equal score lands in one bucket, no quantile
    * interpolation), so bucket membership is exact; cum_n, cum_pos
    * are exact integer walks over the ≤B bucket rows, and gain/lift
    * are one correctly-rounded division each (lift cross-multiplied:
    * cum_pos·N / (cum_n·P)). Null lift when the group has no
    * positives.
    *
    * Scale shape: one (group, score) census, a per-group census-sized
    * cumulative window, a bucket re-aggregation, then a ≤B-row
    * cumulative walk — rows never reshuffle after the census. Output:
    * (g, bucket, n, n_pos, cum_n, cum_pos, gain, lift). */
  def cumulativeGains(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val dec = "decimal(38,0)"
    val census = df.where(col(scoreCol).isNotNull)
      .select(col(groupCol).as("g"), col(scoreCol).cast("long").as("s"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("y"))
      .groupBy(col("g"), col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    val wDesc = Window.partitionBy(col("g")).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("g"))
    val bucketed = census
      .withColumn("__before", coalesce(sum(col("n")).over(wDesc), lit(0L)))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("__pos", sum(col("np")).over(wAll))
      .withColumn("bucket",
        least(lit(buckets - 1L), expr(s"(__before * $buckets) div __tot")))
      .groupBy(col("g"), col("bucket"))
      .agg(sum(col("n")).as("n"), sum(col("np")).as("n_pos"),
        first(col("__tot")).as("__tot"), first(col("__pos")).as("__p"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .select(col("g"), col("bucket"), col("n"), col("n_pos"),
        col("cum_n"), col("cum_pos"),
        when(col("__p") > 0L,
          col("cum_pos").cast("double") / col("__p").cast("double"))
          .as("gain"),
        when(col("__p") > 0L,
          (col("cum_pos").cast(dec) * col("__tot").cast(dec)).cast(dec)
            .cast("double") /
            (col("cum_n").cast(dec) * col("__p").cast(dec)).cast(dec)
              .cast("double")).as("lift"))
  }

  /** Split-conformal interval calibration (Vovk et al. 2005; Lei et
    * al. 2018) per group — the distribution-free coverage guarantee a
    * model-serving gate actually checks: from a CALIBRATION slice's
    * nonconformity scores (|residual|), take the k-th smallest with
    * k = ⌈(n+1)(1−α)⌉; predicting ±q̂ around the model then covers a
    * fresh point with probability ≥ 1−α, NO distributional assumption.
    * The operator reports q̂ and the TEST slice's empirical coverage —
    * the pair that says whether the guarantee survived deployment
    * drift.
    *
    * Exactness: k is exact integer ceiling arithmetic
    * ((n+1)·(1000−αmilli) ceil-div 1000); q̂ is an exact order
    * statistic picked by cumulative-count crossing over the residual
    * census (the q10/q215 discipline — no interpolation); coverage is
    * one exact-integer division. q̂ null (and coverage 1 by
    * convention, reported as the exact test fraction ≤ ∞ → 1.0) when
    * k > n_calib — α too strict for the calibration size; the
    * operator returns a NULL q̂ and NULL coverage loudly instead of
    * inventing an infinite interval.
    *
    * Scale shape: one (group, side, residual) census, a per-group
    * census-ordered cumulative window, a broadcast-size q̂ table
    * joined back at census grain. Output: (g, n_calib, n_test, k,
    * qhat, coverage). */
  def splitConformal(df: DataFrame, groupCol: String, isCalib: Column,
      residCol: String, alphaMilli: Long): DataFrame = {
    require(alphaMilli > 0 && alphaMilli < 1000,
      s"alphaMilli must be in (0, 1000), got $alphaMilli")
    val census = df.where(col(residCol).isNotNull)
      .select(col(groupCol).as("g"), col(residCol).cast("long").as("r"),
        when(isCalib, 1L).otherwise(0L).as("cal"))
      .groupBy(col("g"), col("r"))
      .agg(sum(col("cal")).as("nc"), sum(lit(1L) - col("cal")).as("nt"))
      .localCheckpoint(true)
    val tot = census.groupBy(col("g"))
      .agg(sum(col("nc")).as("n_calib"), sum(col("nt")).as("n_test"))
      .withColumn("k",
        expr(s"((n_calib + 1) * ${1000 - alphaMilli} + 999) div 1000"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val crossed = census
      .withColumn("__cum", sum(col("nc")).over(wCum))
      .join(tot.select(col("g"), col("k")), "g")
      .where(col("__cum") >= col("k"))
      .groupBy(col("g")).agg(min(col("r")).as("qhat"))
    val covered = census
      .join(crossed, Seq("g"), "left")
      .groupBy(col("g"))
      .agg(sum(when(col("r") <= col("qhat"), col("nt")).otherwise(0L))
        .as("__cov"))
    tot.join(crossed, Seq("g"), "left").join(covered, "g")
      .select(col("g"), col("n_calib"), col("n_test"), col("k"),
        col("qhat"),
        when(col("qhat").isNotNull && col("n_test") > 0L,
          col("__cov").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }

  /** Youden's J optimal threshold (Youden 1950) per group — the
    * operating-point picker behind [[auc]]: AUC says whether the score
    * ranks at all, J = max_t (TPR(t) − FPR(t)) says WHERE to cut it
    * when positives and negatives cost the same — the number a quality
    * gate actually deploys. Prediction rule: positive iff score ≥ t,
    * candidates are the observed score values.
    *
    * Exactness: TP/FP come from a descending cumulative walk over the
    * (group, score) census; the argmax compares J numerators
    * cross-multiplied to the common denominator n_pos·n_neg — exact
    * integers, so the winning threshold (ties → SMALLEST t, preferring
    * the more sensitive cut) is bit-deterministic; the output J is one
    * correctly-rounded division.
    *
    * Scale shape: one (group, score) census at row scale, a
    * score-cardinality-bounded cumulative window per group, and an
    * exact integer max_by — no row-scale re-shuffle. Output: (g,
    * n_pos, n_neg, threshold, tp, fp, j); null J when a class is
    * missing (no trade-off to optimize). */
  def youdenThreshold(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df.where(col(scoreCol).isNotNull)
      .select(col(groupCol).as("g"), col(scoreCol).cast("long").as("s"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("y"))
      .groupBy(col("g"), col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    val wDesc = Window.partitionBy(col("g")).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("g"))
    val walked = census
      .withColumn("__tp", sum(col("np")).over(wDesc))
      .withColumn("__fp", sum(col("n") - col("np")).over(wDesc))
      .withColumn("__npos", sum(col("np")).over(wAll))
      .withColumn("__nneg", sum(col("n") - col("np")).over(wAll))
    val jnum = (col("__tp").cast(dec) * col("__nneg").cast(dec) -
      col("__fp").cast(dec) * col("__npos").cast(dec)).cast(dec)
    walked
      .select(col("g"), col("__npos"), col("__nneg"),
        struct(jnum.as("jn"), negate(col("s")).as("negt"),
          col("s"), col("__tp"), col("__fp")).as("__cand"))
      .groupBy(col("g"))
      .agg(first(col("__npos")).as("n_pos"), first(col("__nneg")).as("n_neg"),
        max(col("__cand")).as("__best"))
      .select(col("g"), col("n_pos"), col("n_neg"),
        col("__best.s").as("threshold"),
        col("__best.__tp").as("tp"), col("__best.__fp").as("fp"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("__best.jn").cast("double") /
            (col("n_pos").cast(dec) * col("n_neg").cast(dec)).cast(dec)
              .cast("double")).as("j"))
  }

  /** Krippendorff's alpha, nominal data (Krippendorff 1970) — the
    * agreement coefficient that survives MISSING ratings:
    * [[cohenKappa]] needs exactly two fixed raters, [[fleissKappa]] a
    * constant n per subject; real crowd-label tables have neither.
    * Any number of ratings ≥ 2 per unit participates; single-rating
    * units are excluded and counted (no pairable information — the
    * Fleiss drop discipline).
    *
    * Computation (coincidence-matrix form): with per-(unit, category)
    * counts n_uc, unit totals n_u, S2_u = Σ_c n_uc²,
    *   p_a = [Σ_u (S2_u − n_u)/(n_u − 1)] / N,   N = Σ_u n_u,
    *   p_e = Σ_c n_c(n_c − 1) / (N(N − 1)),
    *   α   = (p_a − p_e)/(1 − p_e).
    * Exactness: the p_a sum GROUPS UNITS BY n_u — all units with the
    * same rating count share a denominator, so each class term
    * A_n/(n−1) is one exact-integer division and the per-class terms
    * fold in n order over the BOUNDED distinct-rating-count list (the
    * q285 IV discipline; distinct n_u values ≤ max raters, never
    * data-scale). p_e is one exact division; α is pinned-shape. Null
    * α when p_e = 1 (single category) or no pairable unit exists.
    *
    * Scale shape: one (unit, category) census at row scale, a
    * unit-keyed and a category-keyed re-aggregation, an
    * n-class-bounded fold, broadcast scalars. Output one row:
    * (n_units, n_dropped, n_categories, n_ratings, p_a, p_e,
    * alpha). */
  def krippendorffAlpha(df: DataFrame, unitCol: String,
      categoryCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.where(col(categoryCol).isNotNull)
      .groupBy(col(unitCol).as("u"), col(categoryCol).as("cat"))
      .agg(count(lit(1)).as("nuc"))
      .localCheckpoint(true)
    val byU = cells.groupBy(col("u"))
      .agg(sum(col("nuc")).as("nu"),
        sum(col("nuc").cast(dec) * col("nuc").cast(dec)).cast(dec)
          .as("__s2"))
    val kept = byU.where(col("nu") >= 2L).localCheckpoint(true)
    val dropped = broadcast(byU.where(col("nu") < 2L)
      .agg(count(lit(1)).as("n_dropped")))
    // per n-class: A_n = Σ (S2_u − n_u), one exact division by (n−1)
    val classes = kept.groupBy(col("nu"))
      .agg(sum((col("__s2") - col("nu").cast(dec)).cast(dec)).cast(dec)
        .as("__an"))
      .select(col("nu"),
        (col("__an").cast("double") / (col("nu") - 1L).cast("double"))
          .as("__term"))
    val paNum = classes
      .agg(sort_array(collect_list(struct(col("nu"), col("__term"))))
        .as("__ts"))
      .select(aggregate(col("__ts"), lit(0.0d),
        (a, t) => a + t.getField("__term")).as("__pa_num"))
    val totals = kept.agg(count(lit(1)).as("n_units"),
      sum(col("nu")).as("n_ratings"))
    val margins = cells.join(kept.select(col("u")), "u")
      .groupBy(col("cat")).agg(sum(col("nuc")).as("nc"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("nc").cast(dec) * (col("nc") - 1L).cast(dec)).cast(dec)
          .as("__pe_num"))
    val nD = col("n_ratings").cast(dec)
    val pa = col("__pa_num") / col("n_ratings").cast("double")
    val pe = col("__pe_num").cast("double") /
      (nD * (nD - 1)).cast(dec).cast("double")
    totals.crossJoin(broadcast(paNum)).crossJoin(broadcast(margins))
      .crossJoin(dropped)
      .select(col("n_units"), coalesce(col("n_dropped"), lit(0L))
          .as("n_dropped"),
        col("n_categories"), coalesce(col("n_ratings"), lit(0L))
          .as("n_ratings"),
        when(col("n_ratings") >= 2L, pa).as("p_a"),
        when(col("n_ratings") >= 2L, pe).as("p_e"),
        when(col("n_ratings") >= 2L && pe < 1.0,
          (pa - pe) / (lit(1.0) - pe)).as("alpha"))
  }

  /** Cliff's delta (Cliff 1993) per group — [[mannWhitneyU]]'s effect
    * size: the probability a random A-value exceeds a random B-value
    * minus the reverse, δ = (#(a>b) − #(a<b)) / (n_a·n_b) ∈ [−1, 1].
    * The number a gating decision reads AFTER the U test says
    * "significant": at corpus scale everything is significant, δ says
    * whether the shift is worth acting on. Banded with the standard
    * Romano et al. (2006) thresholds (|δ| < .147 negligible, < .33
    * small, < .474 medium, else large).
    *
    * Exactness: derives entirely from the SAME doubled-U census as
    * [[mannWhitneyU]] via 2U = 2·#(a>b) + #(a=b), so
    * δ = (u2 − n_a·n_b)/(n_a·n_b) with an all-integer numerator; the
    * band compares |num|·1000 against threshold·den in exact decimal
    * (no float boundary can misband), and the single division is the
    * only float op. Scale shape: identical to [[mannWhitneyU]] (one
    * value census, no row-scale re-shuffle). Output: (g, n_a, n_b, u2,
    * delta, magnitude); delta/magnitude null when a side is empty. */
  def cliffsDelta(df: DataFrame, groupCol: String, labelCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val den = (col("n_a").cast(dec) * col("n_b").cast(dec)).cast(dec)
    val num = (col("u2").cast(dec) - den).cast(dec)
    val absNum1000 = (abs(num) * lit(1000L).cast(dec)).cast(dec)
    def thr(t: Long) = (lit(t).cast(dec) * den).cast(dec)
    val nonEmpty = col("n_a") > 0L && col("n_b") > 0L
    mannWhitneyU(df, groupCol, labelCol, valueCol)
      .select(col("g"), col("n_a"), col("n_b"), col("u2"),
        when(nonEmpty, num.cast("double") / den.cast("double")).as("delta"),
        when(nonEmpty,
          when(absNum1000 < thr(147L), "negligible")
            .when(absNum1000 < thr(330L), "small")
            .when(absNum1000 < thr(474L), "medium")
            .otherwise("large")).as("magnitude"))
  }

  /** Reciprocal rank + average precision at k per query — the
    * retrieval-eval pair [[ndcgAtK]] doesn't cover: NDCG grades GRADED
    * relevance, RR grades "how fast do I hit the first relevant", AP
    * the whole precision–recall trade of a BINARY relevance cut. The
    * ANN-quality harness: run it over a k-NN join's output with
    * "relevant = same label" and it scores the index. Input is any
    * (query, rank, relevant) table with ranks 1..k per query (ranks
    * above `k` are ignored); per query:
    *   rr    = 1/rank of the first relevant hit,
    *   ap    = (Σ_{rel i ≤ k} cum_rel(i)/i) / R_k,  R_k = relevant in
    *           top k (the retrieved-relevant convention, documented —
    *           corpus-wide recall is unknowable from a top-k table).
    * Both null when the top k has no relevant hit.
    *
    * Exactness: rr and each precision term cum_rel(i)/i are single
    * exact-integer divisions; the ≤k ap terms fold in rank order (the
    * q237 contract). No global mean is emitted — averaging per-query
    * doubles would be an unbounded order-sensitive float sum; callers
    * aggregate the exact per-query table however they need.
    *
    * Scale shape: one rank-bounded filter, a per-query window over ≤k
    * rows, a k-bounded ordered fold — the query column partitions
    * everything, no global shuffle beyond the groupBy. Output:
    * (q, n_ranked, n_rel, rr, ap). */
  def rankEval(df: DataFrame, queryCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val wOrd = Window.partitionBy(col("q")).orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val rows = df
      .select(col(queryCol).as("q"), col(rankCol).cast("long").as("r"),
        when(col(relCol).cast("long") =!= 0L, 1L).otherwise(0L).as("rel"))
      .where(col("r") >= 1L && col("r") <= k.toLong)
      .withColumn("__cum", sum(col("rel")).over(wOrd))
    rows
      .groupBy(col("q"))
      .agg(count(lit(1)).as("n_ranked"), sum(col("rel")).as("n_rel"),
        min(when(col("rel") === 1L, col("r"))).as("__first"),
        sort_array(collect_list(when(col("rel") === 1L,
          struct(col("r"), (col("__cum").cast("double") /
            col("r").cast("double")).as("p"))))).as("__terms"))
      .select(col("q"), col("n_ranked"), col("n_rel"),
        when(col("n_rel") > 0L,
          lit(1.0) / col("__first").cast("double")).as("rr"),
        when(col("n_rel") > 0L,
          aggregate(col("__terms"), lit(0.0d),
            (a, t) => a + t.getField("p")) / col("n_rel").cast("double"))
          .as("ap"))
  }

  /** Kruskal–Wallis H (Kruskal & Wallis 1952) per scope: the k-sample
    * extension of [[mannWhitneyU]] — do the `groupCol` samples inside
    * each scope share one value distribution? Same doubled-mid-rank
    * discipline: within a scope, every moment up to the per-group
    * doubled rank sums R2_i and the tie term Σ(t³−t) is an EXACT
    * integer (decimal(38,0)); with R_i = R2_i/2,
    *   H = 3·Σ_i R2_i²/n_i / (N(N+1)) − 3(N+1),
    * and the tie-corrected H' = H / (1 − Σ(t³−t)/(N³−N)).
    *
    * Float determinism: Σ_i R2_i²/n_i is a sum of per-group doubles
    * (R2_i² stays exact in decimal — ≤10^31 for N ≤ 10^7·k — and the
    * cast + one IEEE division are correctly rounded in any engine), so
    * the ONLY order-sensitive op is that k-term sum. It is folded
    * left-to-right in group order over a sorted collect (k = distinct
    * groups per scope, bounded by construction — the q285 IV
    * discipline), so a replaying engine reproduces every double
    * bit-identically. H is a small difference of two ~N-sized terms;
    * the exact-integer moments are what keep the cancellation benign.
    *
    * Scale shape: one (scope, group, value) census (map-side partial),
    * one scope-partitioned cumulative window over the DISTINCT-value
    * census (never row-scale), one co-partitioned join back, then
    * k-bounded per-scope folds. No global window, no row shuffle after
    * the census. Output: (scope, k, n, h, h_adj); h null when n < 2 or
    * k < 2, h_adj additionally null when all values tie (correction 0).
    */
  def kruskalWallis(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cgv = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("s"), col(groupCol).as("g"),
        col(valueCol).as("v"))
      .groupBy(col("s"), col("g"), col("v"))
      .agg(count(lit(1)).as("tgv"))
    val cv = cgv.groupBy(col("s"), col("v")).agg(sum(col("tgv")).as("t"))
    val w = Window.partitionBy(col("s")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cv.withColumn("__r2",
      lit(2L) * coalesce(sum(col("t")).over(w), lit(0L)) + col("t") + 1L)
    val perGroup = cgv
      .join(ranked.select(col("s"), col("v"), col("__r2")), Seq("s", "v"))
      .groupBy(col("s"), col("g"))
      .agg(sum(col("tgv")).as("ni"),
        sum(col("tgv").cast(dec) * col("__r2").cast(dec)).cast(dec)
          .as("r2i"))
    val scope = ranked.groupBy(col("s")).agg(
      sum(col("t")).as("n"),
      sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
        col("t").cast(dec)).cast(dec).as("tie"))
    val folded = perGroup
      .select(col("s"), struct(col("g"),
        (col("r2i") * col("r2i")).cast(dec).as("r2sq"), col("ni")).as("e"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("k"), sort_array(collect_list(col("e"))).as("es"))
      .withColumn("__sterm", expr(
        """aggregate(es, CAST(0.0 AS DOUBLE), (a, x) ->
          |  a + CAST(x.r2sq AS DOUBLE) / CAST(x.ni AS DOUBLE))""".stripMargin))
    val nD = col("n").cast(dec)
    val nn1 = (nD * (nD + 1)).cast("double")
    val h = lit(3.0) * col("__sterm") / nn1 -
      lit(3.0) * (nD + 1).cast("double")
    val n3n = (nD * nD * nD - nD).cast(dec)
    val corr = lit(1.0) - col("tie").cast("double") / n3n.cast("double")
    folded.join(scope, Seq("s"))
      .select(col("s"), col("k"), col("n"),
        when(col("n") > 1 && col("k") > 1, h).as("h"),
        when(col("n") > 1 && col("k") > 1 && col("tie") < n3n, h / corr)
          .as("h_adj"))
  }

  /** Cochran's Q (Cochran 1950) — [[mcnemar]]'s k-treatment extension:
    * did the k binary treatments (pipeline variants, filter versions,
    * prompt templates) succeed at the same rate across blocks
    * (documents, users), honoring the pairing? The A/B/C/… gate on
    * matched binary outcomes. Cells are max-aggregated per (block,
    * treatment) — duplicate observations collapse — and absent cells
    * read as 0 (the census defines a complete design over observed
    * blocks × observed treatments).
    *
    * Exactness: with column totals C_j, row totals R_i, k treatments,
    *   Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²),
    * every moment an exact integer (decimal(38,0) squares); the one
    * terminal division is the only float op. Q is null when the
    * denominator is 0 (every block all-0 or all-1 — no discordance to
    * test, the [[mcnemar]] convention). χ²_{k−1} under H0.
    *
    * Scale shape: one (block, treatment) cell census (map-side max),
    * a block-keyed and a k-bounded treatment-keyed re-aggregation of
    * the census, one broadcast of the k-bounded column-total row — no
    * window, no join at row scale. Output one row: (k, n_blocks, q). */
  def cochranQ(df: DataFrame, blockCol: String, treatmentCol: String,
      successCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .select(col(blockCol).as("b"), col(treatmentCol).as("tr"),
        when(col(successCol).cast("long") =!= 0L, 1L).otherwise(0L)
          .as("x"))
      .groupBy(col("b"), col("tr")).agg(max(col("x")).as("x"))
      .localCheckpoint(true)
    val colTot = cells.groupBy(col("tr")).agg(sum(col("x")).as("cj"))
    val kRow = broadcast(colTot.agg(count(lit(1)).as("k"),
      sum(col("cj").cast(dec)).cast(dec).as("__sc"),
      sum(col("cj").cast(dec) * col("cj").cast(dec)).cast(dec)
        .as("__sc2")))
    val rowTot = cells.groupBy(col("b")).agg(sum(col("x")).as("ri"))
    val rows = rowTot.agg(count(lit(1)).as("n_blocks"),
      sum(col("ri").cast(dec)).cast(dec).as("__sr"),
      sum(col("ri").cast(dec) * col("ri").cast(dec)).cast(dec)
        .as("__sr2"))
    val kD = col("k").cast(dec)
    val num = ((kD - 1) * (kD * col("__sc2") - col("__sc") * col("__sc")))
      .cast(dec)
    val den = (kD * col("__sr") - col("__sr2")).cast(dec)
    rows.crossJoin(kRow)
      .select(col("k"), col("n_blocks"),
        when(den =!= lit(0).cast(dec),
          num.cast("double") / den.cast("double")).as("q"))
  }

  /** Friedman test (Friedman 1937) — [[kruskalWallis]]'s blocked
    * sibling: rank the k treatments WITHIN each block, then ask whether
    * the per-treatment rank sums could be exchangeable. The matched
    * k-sample gate for continuous outcomes (Cochran's Q is its binary
    * special case). Only COMPLETE blocks participate — a block missing
    * a treatment has no k-way ranking; the census filters them out and
    * reports how many survive.
    *
    * Exactness: within-block mid-ranks enter DOUBLED (the
    * [[mannWhitneyU]] discipline — always integers), so with
    * R2_j = Σ_i r2_ij, A2 = Σ_ij r2_ij², C2 = n·k·(k+1)², the
    * tie-corrected statistic
    *   χ² = (k−1)·Σ_j (R2_j − n(k+1))² / (A2 − C2)
    * has an ALL-integer numerator and denominator (the doubling scales
    * both by exactly 4); the single terminal division is the only
    * float op. Null when A2 = C2 (every block fully tied). Reduces to
    * the classic 12·ΣR_j²/(nk(k+1)) − 3n(k+1) when ties are absent.
    *
    * Scale shape: one (block, treatment, value) cell aggregation at
    * row scale, a block-completeness semi-join, per-block rank windows
    * over k-bounded partitions (k = treatments, never data-sized), a
    * k-bounded treatment re-aggregation, one broadcast scalar. Output
    * one row: (k, n_blocks, chi2). */
  def friedman(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cell = df.where(col(valueCol).isNotNull)
      .groupBy(col(blockCol).as("b"), col(treatmentCol).as("tr"))
      .agg(sum(col(valueCol).cast("long")).as("v"))
      .localCheckpoint(true)
    val k = broadcast(cell.select(col("tr")).distinct()
      .agg(count(lit(1)).as("k")))
    val complete = cell.groupBy(col("b")).agg(count(lit(1)).as("__ct"))
      .crossJoin(k).where(col("__ct") === col("k"))
      .select(col("b"))
    val inb = cell.join(complete, "b")
    // doubled mid-rank within the k-bounded block: 2*(#smaller) + t + 1
    val wLt = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tied = inb.groupBy(col("b"), col("v")).agg(count(lit(1)).as("t"))
    val r2 = tied
      .withColumn("__r2",
        lit(2L) * coalesce(sum(col("t")).over(wLt), lit(0L)) + col("t") + 1L)
    val ranked = inb.join(r2.select(col("b"), col("v"), col("__r2"), col("t")),
      Seq("b", "v"))
    val n = broadcast(complete.agg(count(lit(1)).as("n_blocks")))
    val perTr = ranked.groupBy(col("tr"))
      .agg(sum(col("__r2").cast(dec)).cast(dec).as("__r2j"))
    val a2 = ranked.agg(sum(col("__r2").cast(dec) * col("__r2").cast(dec))
      .cast(dec).as("__a2"))
    val kD = col("k").cast(dec)
    val nD = col("n_blocks").cast(dec)
    val dev = (col("__r2j") - nD * (kD + 1)).cast(dec)
    val snum = perTr.crossJoin(k).crossJoin(n)
      .agg(sum((dev * dev).cast(dec)).cast(dec).as("__snum"))
    val c2 = (nD * kD * (kD + 1) * (kD + 1)).cast(dec)
    snum.crossJoin(broadcast(a2)).crossJoin(k).crossJoin(n)
      .select(col("k"), col("n_blocks"),
        when(col("__a2") =!= c2,
          ((kD - 1) * col("__snum")).cast(dec).cast("double") /
            (col("__a2") - c2).cast(dec).cast("double")).as("chi2"))
  }

  /** Welch's unequal-variance t-test per scope — the two-sample
    * comparison that does NOT assume the arms share a variance (the
    * assumption Student's t silently makes and A/B traffic silently
    * violates). Per scope with arms A/B on `valueCol` (integer-scaled
    * by the caller, the cents convention):
    *   t  = (ȳ_A − ȳ_B) / √(s²_A/n_A + s²_B/n_B)
    *   df = (s²_A/n_A + s²_B/n_B)² /
    *        [(s²_A/n_A)²/(n_A−1) + (s²_B/n_B)²/(n_B−1)]
    * (Welch–Satterthwaite), plus Cohen's d = diff/s_p with the pooled
    * s_p² = ((n_A−1)s²_A + (n_B−1)s²_B)/(n_A+n_B−2) — the effect size
    * that survives when n makes any difference "significant".
    *
    * Exactness: per-arm (n, Σy, Σy²) are exact integer sums
    * (decimal(38,0)); each variance is ONE division of exact decimals
    * ((n·Σy²−(Σy)²)/(n·(n−1))), and t/df/d are pinned-shape double
    * combinations — bit-replayable cross-engine. Nulls are loud: means
    * null on empty arms; t/df/d null when either arm has n < 2 or the
    * standard error is zero.
    *
    * Scale shape: ONE scope-keyed census aggregation, map-side
    * combined; nothing else shuffles. Output: (sc, n_a, n_b, mean_a,
    * mean_b, diff, t, df, cohen_d). */
  def welchT(df: DataFrame, scopeCol: String, isArmA: Column,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"),
        when(isArmA, 1L).otherwise(0L).as("a"),
        col(valueCol).cast("long").as("y"))
    val yD = col("y").cast(dec)
    val g = base.groupBy(col("sc")).agg(
      sum(col("a")).as("n_a"), sum(lit(1L) - col("a")).as("n_b"),
      sum(when(col("a") === 1L, yD).otherwise(lit(0).cast(dec)))
        .cast(dec).as("sa"),
      sum(when(col("a") === 0L, yD).otherwise(lit(0).cast(dec)))
        .cast(dec).as("sb"),
      sum(when(col("a") === 1L, (yD * yD).cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as("qa"),
      sum(when(col("a") === 0L, (yD * yD).cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as("qb"))
    welchTFromCensus(g, "sc", "n_a", "n_b", "sa", "sb", "qa", "qb")
  }

  /** [[welchT]] on a pre-aggregated per-scope moment census — the seam
    * a streaming twin plugs into ([[graft.streaming.Streams
    * .experimentCensusStream]] maintains exactly these six exact sums
    * as its only state; the [[sprtFromCensus]] pattern). Moments are
    * exact integers/decimals, so streamed and batch censuses are
    * IDENTICAL after any prefix and the statistics follow. */
  def welchTFromCensus(census: DataFrame, scopeCol: String,
      nACol: String, nBCol: String, sACol: String, sBCol: String,
      qACol: String, qBCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val g = census.select(col(scopeCol).as("sc"),
      col(nACol).cast("long").as("n_a"), col(nBCol).cast("long").as("n_b"),
      col(sACol).cast(dec).as("sa"), col(sBCol).cast(dec).as("sb"),
      col(qACol).cast(dec).as("qa"), col(qBCol).cast(dec).as("qb"))
    def dd(c: Column): Column = c.cast("double")
    val naD = col("n_a").cast(dec); val nbD = col("n_b").cast(dec)
    val ma = dd(col("sa")) / dd(col("n_a"))
    val mb = dd(col("sb")) / dd(col("n_b"))
    val va = (naD * col("qa") - col("sa") * col("sa")).cast(dec)
      .cast("double") / (naD * (naD - 1)).cast(dec).cast("double")
    val vb = (nbD * col("qb") - col("sb") * col("sb")).cast(dec)
      .cast("double") / (nbD * (nbD - 1)).cast(dec).cast("double")
    val vna = va / dd(col("n_a")); val vnb = vb / dd(col("n_b"))
    val se2 = vna + vnb
    val t = (ma - mb) / sqrt(se2)
    val dfw = (se2 * se2) /
      (vna * vna / dd(col("n_a") - 1L) + vnb * vnb / dd(col("n_b") - 1L))
    val sp2 = (dd(col("n_a") - 1L) * va + dd(col("n_b") - 1L) * vb) /
      dd(col("n_a") + col("n_b") - 2L)
    val both = col("n_a") > 0L && col("n_b") > 0L
    val ok = col("n_a") > 1L && col("n_b") > 1L && se2 =!= lit(0.0)
    g.select(col("sc"), col("n_a"), col("n_b"),
      when(col("n_a") > 0L, ma).as("mean_a"),
      when(col("n_b") > 0L, mb).as("mean_b"),
      when(both, ma - mb).as("diff"),
      when(ok, t).as("t"),
      when(ok, dfw).as("df"),
      when(ok && sp2 =!= lit(0.0), (ma - mb) / sqrt(sp2)).as("cohen_d"))
  }

  /** One-way ANOVA F per scope — does ANY of k group means differ?
    * The k-sample generalization Welch/[[mannWhitneyU]] can't ask:
    *   SSB = Σ_g (Σy_g)²/n_g − (Σy)²/N,  SSW = Σy² − Σ_g (Σy_g)²/n_g,
    *   F   = (SSB/(k−1)) / (SSW/(N−k)),  η² = SSB/(SSB+SSW)
    * (η² — the variance share the grouping explains — is the effect
    * size the F number hides). [[kruskalWallis]] is the rank twin for
    * non-normal data; this is the classical moments version.
    *
    * Exactness: per-(scope, group) (n, Σy, Σy²) are exact decimal
    * sums; Σy² and the grand (N, Σy) stay exact through the scope
    * re-aggregation. The one float fold — Σ_g (Σy_g)²/n_g, a sum of
    * per-group doubles — runs in GROUP-KEY ORDER over a bounded
    * sorted array (the [[metaFixedEffect]] stratum-ordered-fold
    * discipline), so results are partition-invariant. Groups per
    * scope must be census-scale (they bound the collected array).
    *
    * Scale shape: two key-census aggregations ((scope, group), then
    * scope), both map-side combined; no row-scale sort or window.
    * Output: (sc, k, n, ssb, ssw, f, eta_sq); f null when k < 2,
    * N ≤ k, or SSW = 0. */
  def anovaF(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"),
        col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("y"))
    val yD = col("y").cast(dec)
    val cell = base.groupBy(col("sc"), col("g")).agg(
      count(lit(1L)).as("ng"), sum(yD).cast(dec).as("sg"),
      sum((yD * yD).cast(dec)).cast(dec).as("qg"))
    val per = cell.groupBy(col("sc")).agg(
      count(lit(1L)).as("k"), sum(col("ng")).as("n"),
      sum(col("sg")).cast(dec).as("s"), sum(col("qg")).cast(dec).as("q"),
      sort_array(collect_list(struct(col("g"),
        col("sg").cast("double").as("sgd"),
        col("ng").cast("double").as("ngd")))).as("cells"))
    def dd(c: Column): Column = c.cast("double")
    // Σ_g (Σy_g)²/n_g folded in group order; 0.0-seed parity with the
    // oracle's list_reduce (0.0 + x == x exactly for finite doubles)
    val between = aggregate(col("cells"), lit(0.0),
      (acc, x) => acc + x.getField("sgd") * x.getField("sgd") /
        x.getField("ngd"))
    val ssb = between - dd(col("s")) * dd(col("s")) / dd(col("n"))
    val ssw = dd(col("q")) - between
    val ok = col("k") > 1L && col("n") > col("k") && ssw =!= lit(0.0)
    per.select(col("sc"), col("k"), col("n"),
      ssb.as("ssb"), ssw.as("ssw"),
      when(ok, (ssb / dd(col("k") - 1L)) / (ssw / dd(col("n") - col("k"))))
        .as("f"),
      when(ssb + ssw =!= lit(0.0), ssb / (ssb + ssw)).as("eta_sq"))
  }

  /** Stratified ATE per scope — post-stratification / subclassification
    * (Cochran 1968): when treatment assignment is confounded with an
    * observable stratum, the naive treated-minus-control difference
    * mixes the treatment effect with the stratum mix; weighting each
    * stratum's within-stratum difference by its population share
    *   ATE = Σ_s (n_s/N) · (ȳ_T,s − ȳ_C,s)
    * removes the confound the stratum captures. Reported NEXT TO the
    * naive difference so the confounding is visible, with
    *   SE² = Σ_s (n_s/N)² · (s²_T,s/n_T,s + s²_C,s/n_C,s)
    * and a ±1.96 Wald interval. Completes the causal family: [[cuped]]
    * (covariate), [[diffInDiff]] (panel), this (subclassification).
    *
    * Strata missing an arm are DROPPED loudly (k_dropped; no
    * within-stratum contrast exists) and leave N too — weights stay
    * internally consistent. SE/interval null unless every kept stratum
    * has n ≥ 2 in both arms.
    *
    * Exactness: per-(scope, stratum, arm) (n, Σy, Σy²) are exact
    * decimal sums; each stratum's difference and variance terms are
    * pinned-shape doubles of single divisions, and the two cross-
    * stratum float folds run in STRATUM-KEY ORDER over a bounded
    * sorted array (the [[metaFixedEffect]] discipline) — partition-
    * invariant, bit-replayable cross-engine.
    *
    * Scale shape: one (scope, stratum) census aggregation, one scope
    * re-aggregation; strata per scope must be census-scale (they bound
    * the collected array). Output: (sc, k_used, k_dropped, n,
    * naive_diff, ate, lo, hi). */
  def stratifiedAte(df: DataFrame, scopeCol: String, strataCol: String,
      isTreated: Column, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(strataCol).cast("string").as("st"),
        when(isTreated, 1L).otherwise(0L).as("a"),
        col(valueCol).cast("long").as("y"))
    val yD = col("y").cast(dec)
    val cell = base.groupBy(col("sc"), col("st")).agg(
      sum(col("a")).as("nt"), sum(lit(1L) - col("a")).as("nc"),
      sum(when(col("a") === 1L, yD).otherwise(lit(0).cast(dec)))
        .cast(dec).as("st_s"),
      sum(when(col("a") === 0L, yD).otherwise(lit(0).cast(dec)))
        .cast(dec).as("sc_s"),
      sum(when(col("a") === 1L, (yD * yD).cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as("qt"),
      sum(when(col("a") === 0L, (yD * yD).cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as("qc"))
    def dd(c: Column): Column = c.cast("double")
    val ntD = col("nt").cast(dec); val ncD = col("nc").cast(dec)
    val vt = (ntD * col("qt") - col("st_s") * col("st_s")).cast(dec)
      .cast("double") / (ntD * (ntD - 1)).cast(dec).cast("double")
    val vc = (ncD * col("qc") - col("sc_s") * col("sc_s")).cast(dec)
      .cast("double") / (ncD * (ncD - 1)).cast(dec).cast("double")
    val kept = col("nt") > 0L && col("nc") > 0L
    val enriched = cell.select(col("sc"), col("st"), col("nt"), col("nc"),
      col("st_s"), col("sc_s"), kept.as("kept"),
      (dd(col("st_s")) / dd(col("nt")) - dd(col("sc_s")) / dd(col("nc")))
        .as("dif"),
      (vt / dd(col("nt")) + vc / dd(col("nc"))).as("vs"),
      (col("nt") + col("nc")).cast("double").as("nn"))
    val zero = lit(0).cast(dec)
    val per = enriched.groupBy(col("sc")).agg(
      sum(when(col("kept"), 1L).otherwise(0L)).as("k_used"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("k_dropped"),
      sum(when(col("kept"), col("nt") + col("nc")).otherwise(0L)).as("n"),
      sum(when(col("kept"), col("nt")).otherwise(0L)).as("nt_all"),
      sum(when(col("kept"), col("nc")).otherwise(0L)).as("nc_all"),
      sum(when(col("kept"), col("st_s")).otherwise(zero)).cast(dec)
        .as("st_all"),
      sum(when(col("kept"), col("sc_s")).otherwise(zero)).cast(dec)
        .as("sc_all"),
      min(when(col("kept"),
        when(col("nt") > 1L && col("nc") > 1L, 1L).otherwise(0L)))
        .as("varok"),
      sort_array(collect_list(when(col("kept"),
        struct(col("st"), col("nn"), col("dif"), col("vs"))))).as("cells"))
    val nD = dd(col("n"))
    val ate = aggregate(col("cells"), lit(0.0),
      (acc, x) => acc + x.getField("nn") / nD * x.getField("dif"))
    val se2 = aggregate(col("cells"), lit(0.0),
      (acc, x) => acc + x.getField("nn") / nD * (x.getField("nn") / nD) *
        x.getField("vs"))
    val naive = dd(col("st_all")) / dd(col("nt_all")) -
      dd(col("sc_all")) / dd(col("nc_all"))
    val okAte = col("k_used") > 0L
    val okSe = okAte && col("varok") === 1L
    per.select(col("sc"), col("k_used"), col("k_dropped"), col("n"),
      when(okAte, naive).as("naive_diff"),
      when(okAte, ate).as("ate"),
      when(okSe, ate - lit(1.96) * sqrt(se2)).as("lo"),
      when(okSe, ate + lit(1.96) * sqrt(se2)).as("hi"))
  }

  /** Bayesian A/B per scope — the EXACT posterior P(p_B > p_A) for
    * binary outcomes under Beta(α₀, β₀) priors, the anytime-readable
    * companion to [[sprt]] (frequentist stopping) and [[twoProportionZ]]
    * (fixed-horizon test): with integer posteriors A ~ Beta(a,b),
    * B ~ Beta(c,d),
    *   P(B > A) = Σ_{i=0}^{c−1} B(a+i, b+d) / [(d+i)·B(1+i, d)·B(a, b)]
    * (Cook 2005) — a finite sum of Beta-function ratios, evaluated in
    * log space via the pinned-formula [[graft.functions.FastMath
    * .lgammaValue]] kernel so both engines run bit-identical doubles.
    *
    * Scale contract: the sum has c = α₀ + successes_B terms — data-
    * scale, not census-scale — so scopes with c > `maxTerms` switch to
    * the normal approximation (posterior means/variances are exact
    * single divisions; Φ via the pinned [[graft.functions.FastMath
    * .erfcValue]]), reported in `method`. At the counts where the
    * switch happens the Beta posteriors are already
    * indistinguishable from Gaussians far below the 6-decimal
    * rounding, so the answer does not jump at the seam (spec-asserted
    * near the boundary). The exact branch's term fold runs in
    * i-order over a maxTerms-bounded array — partition-invariant.
    *
    * Scale shape: ONE scope census; the exact branch explodes ≤
    * maxTerms rows per scope and folds them back; no row-scale joins.
    * Output: (sc, n_a, s_a, n_b, s_b, mean_a, mean_b, p_b_gt_a,
    * method). */
  def bayesianAB(df: DataFrame, scopeCol: String, isArmA: Column,
      labelCol: String, priorAlpha: Long = 1L, priorBeta: Long = 1L,
      maxTerms: Long = 4096L): DataFrame = {
    require(priorAlpha >= 1L && priorBeta >= 1L,
      s"integer priors must be >= 1, got ($priorAlpha, $priorBeta)")
    require(maxTerms >= 1L, s"maxTerms must be >= 1, got $maxTerms")
    val dec = "decimal(38,0)"
    val base = df.where(col(labelCol).isNotNull)
      .select(col(scopeCol).as("sc"),
        when(isArmA, 1L).otherwise(0L).as("a"),
        when(col(labelCol).cast("long") === 1L, 1L).otherwise(0L).as("y"))
    val g = base.groupBy(col("sc")).agg(
        sum(col("a")).as("n_a"), sum(lit(1L) - col("a")).as("n_b"),
        sum(when(col("a") === 1L, col("y")).otherwise(0L)).as("s_a"),
        sum(when(col("a") === 0L, col("y")).otherwise(0L)).as("s_b"))
      .select(col("sc"), col("n_a"), col("n_b"), col("s_a"), col("s_b"),
        (lit(priorAlpha) + col("s_a")).as("aa"),
        (lit(priorBeta) + col("n_a") - col("s_a")).as("ba"),
        (lit(priorAlpha) + col("s_b")).as("ab"),
        (lit(priorBeta) + col("n_b") - col("s_b")).as("bb"))
      .localCheckpoint(true)
    def lg(c: Column): Column =
      graft.functions.FastMath.lgamma(c.cast("double"))
    // exact branch: the c-term log-space sum, folded in i order
    val ex = g.where(col("ab") <= maxTerms)
      .select(col("sc"), col("aa"), col("ba"), col("ab"), col("bb"),
        explode(sequence(lit(0L), col("ab") - 1L)).as("i"))
    val bab = col("ba") + col("bb")
    val lb1 = lg(col("aa") + col("i")) + lg(bab) -
      lg(col("aa") + col("i") + bab)
    val lb2 = lg(lit(1L) + col("i")) + lg(col("bb")) -
      lg(lit(1L) + col("i") + col("bb"))
    val lb3 = lg(col("aa")) + lg(col("ba")) - lg(col("aa") + col("ba"))
    val lt = lb1 - log((col("bb") + col("i")).cast("double")) - lb2 - lb3
    val pex = ex.select(col("sc"), col("i"), exp(lt).as("term"))
      .groupBy(col("sc"))
      .agg(sort_array(collect_list(struct(col("i"), col("term"))))
        .as("ts"))
      .select(col("sc"), aggregate(col("ts"), lit(0.0),
        (acc, x) => acc + x.getField("term")).as("p_exact"))
    // normal branch: exact posterior moments, pinned-formula Phi
    def dd(c: Column): Column = c.cast("double")
    val sA = (col("aa") + col("ba")).cast(dec)
    val sB = (col("ab") + col("bb")).cast(dec)
    val vA = (col("aa").cast(dec) * col("ba").cast(dec)).cast(dec)
      .cast("double") / (sA * sA * (sA + 1)).cast(dec).cast("double")
    val vB = (col("ab").cast(dec) * col("bb").cast(dec)).cast(dec)
      .cast("double") / (sB * sB * (sB + 1)).cast(dec).cast("double")
    val mA = dd(col("aa")) / dd(col("aa") + col("ba"))
    val mB = dd(col("ab")) / dd(col("ab") + col("bb"))
    val z = (mB - mA) / sqrt(vA + vB)
    val pn = lit(0.5) *
      graft.functions.FastMath.erfc(-z / lit(1.4142135623730951))
    g.join(pex, Seq("sc"), "left")
      .select(col("sc"), col("n_a"), col("s_a"), col("n_b"), col("s_b"),
        mA.as("mean_a"), mB.as("mean_b"),
        when(col("ab") <= maxTerms, col("p_exact")).otherwise(pn)
          .as("p_b_gt_a"),
        when(col("ab") <= maxTerms, lit("exact")).otherwise(lit("normal"))
          .as("method"))
  }

  /** Best single-threshold split by information gain per scope — the
    * decision-stump / MDLP discretization primitive: over (value,
    * binary label) rows, the cut v* maximizing
    *   gain(v) = H(parent) − (n_L/N)·H(left ≤ v) − (n_R/N)·H(right)
    * — "does this feature separate the label, and where". The
    * supervised sibling of [[graft.operators.Calibrate.isotonic]]
    * (which repairs a score; this scores a feature), and the per-split
    * unit of any tree learner.
    *
    * Determinism: candidate entropies are pinned-shape doubles over
    * exact cumulative counts (the [[graft.operators.Divergence
    * .mutualInformation]] plogp discipline — identical operation order
    * cross-engine gives bit-identical gains), and the argmax breaks
    * ties (gain desc, v asc). Scopes with a single distinct value
    * have no candidate cut and drop from the output — absence is the
    * loud signal.
    *
    * Scale shape: one (scope, value) census, cumulative windows at
    * census scale (values are the caller's discretization, the
    * [[auc]] contract), one argmax window. Output: (sc, n, pos,
    * threshold, n_left, pos_left, gain). */
  def infoGainSplit(df: DataFrame, scopeCol: String, valueCol: String,
      labelCol: String): DataFrame = {
    val base = df.where(col(valueCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(valueCol).cast("long").as("v"),
        when(col(labelCol).cast("long") === 1L, 1L).otherwise(0L).as("y"))
    val cells = base.groupBy(col("sc"), col("v"))
      .agg(count(lit(1L)).as("cnt"), sum(col("y")).as("pos"))
    val wCum = Window.partitionBy(col("sc")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("sc"))
    val r = cells.select(col("sc"), col("v"),
      sum(col("cnt")).over(wCum).as("cn"),
      sum(col("pos")).over(wCum).as("cp"),
      sum(col("cnt")).over(wAll).as("n"),
      sum(col("pos")).over(wAll).as("p"))
    def dd(c: Column): Column = c.cast("double")
    def ent(pos: Column, tot: Column): Column = {
      def t(c: Column): Column =
        when(c > 0L, -(dd(c) / dd(tot)) * log(dd(c) / dd(tot)))
          .otherwise(lit(0.0))
      t(pos) + t(tot - pos)
    }
    val gain = ent(col("p"), col("n")) -
      dd(col("cn")) / dd(col("n")) * ent(col("cp"), col("cn")) -
      dd(col("n") - col("cn")) / dd(col("n")) *
        ent(col("p") - col("cp"), col("n") - col("cn"))
    val scored = r.where(col("cn") < col("n"))
      .select(col("sc"), col("v"), col("cn"), col("cp"), col("n"),
        col("p"), gain.as("gain"))
    val wPick = Window.partitionBy(col("sc"))
      .orderBy(col("gain").desc, col("v"))
    scored.withColumn("__rk", row_number().over(wPick))
      .where(col("__rk") === 1)
      .select(col("sc"), col("n"), col("p").as("pos"),
        col("v").as("threshold"), col("cn").as("n_left"),
        col("cp").as("pos_left"), col("gain"))
  }

  /** Benjamini–Hochberg FDR adjustment (1995) over a family of tests —
    * what turns "we ran 500 A/B tests and 30 hit p < 0.05" into an
    * honest discovery list: rank p ascending, raw_i = p_(i)·k/i,
    * q_i = min_{j≥i} raw_j (the monotone step-up), reject where
    * q ≤ alpha. The family-wise closer of the [[welchT]]/
    * [[twoProportionZ]]/[[bayesianAB]] suite.
    *
    * Determinism: ranks break p-ties by test id; raw and the suffix
    * min are pinned-shape doubles (min is order-free) — bit-replayable.
    * Scale shape: the input IS the test family (census-scale by
    * construction); two windows over k rows, nothing else. Output:
    * (test, p, rank, k, q_value, reject), p-ascending ranks. */
  def benjaminiHochberg(df: DataFrame, testCol: String, pCol: String,
      alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val base = Guards.boundedCensus(
      df.where(col(pCol).isNotNull)
        .select(col(testCol).as("test"), col(pCol).cast("double").as("p")),
      "p", "Eval.benjaminiHochberg")
    val wRank = Window.orderBy(col("p"), col("test"))
    val wAll = Window.partitionBy()
    val ranked = base.select(col("test"), col("p"),
      row_number().over(wRank).cast("long").as("rank"),
      count(lit(1L)).over(wAll).as("k"))
    def dd(c: Column): Column = c.cast("double")
    val raw = col("p") * dd(col("k")) / dd(col("rank"))
    val wSuf = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.withColumn("__raw", raw)
      .withColumn("q_value", least(min(col("__raw")).over(wSuf), lit(1.0)))
      .select(col("test"), col("p"), col("rank"), col("k"),
        col("q_value"), (col("q_value") <= lit(alpha)).as("reject"))
  }

  /** Benjamini–Yekutieli (2001) — [[benjaminiHochberg]] under ARBITRARY
    * dependence: the same step-up walk with the raw values inflated by
    * the harmonic factor c(k) = Σ_{i≤k} 1/i, the price of not assuming
    * the tests are independent or PRDS (correlated metrics over the
    * same traffic usually aren't). Strictly more conservative than BH:
    * every BY rejection is a BH rejection.
    *
    * Determinism: c(k) folds 1/i in ASCENDING i order (a fixed-shape
    * sequence fold, replayed by list_reduce over range — never a
    * window sum of doubles, whose partial-aggregation order is
    * engine-dependent); everything else inherits the BH contract,
    * including the census-cardinality gate. Output: (test, p, rank, k,
    * c_k, q_value, reject). */
  def benjaminiYekutieli(df: DataFrame, testCol: String, pCol: String,
      alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val base = Guards.boundedCensus(
      df.where(col(pCol).isNotNull)
        .select(col(testCol).as("test"), col(pCol).cast("double").as("p")),
      "p", "Eval.benjaminiYekutieli")
    val wRank = Window.orderBy(col("p"), col("test"))
    val wAll = Window.partitionBy()
    val ranked = base.select(col("test"), col("p"),
      row_number().over(wRank).cast("long").as("rank"),
      count(lit(1L)).over(wAll).as("k"))
      .withColumn("c_k", expr(
        """aggregate(sequence(1L, k), CAST(0.0 AS DOUBLE),
          |  (acc, i) -> acc + 1.0 / CAST(i AS DOUBLE))""".stripMargin))
    def dd(c: Column): Column = c.cast("double")
    val raw = col("p") * dd(col("k")) * col("c_k") / dd(col("rank"))
    val wSuf = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.withColumn("__raw", raw)
      .withColumn("q_value", least(min(col("__raw")).over(wSuf), lit(1.0)))
      .select(col("test"), col("p"), col("rank"), col("k"), col("c_k"),
        col("q_value"), (col("q_value") <= lit(alpha)).as("reject"))
  }

  /** Jonckheere–Terpstra trend test (Jonckheere 1954) — the k-sample
    * rank test AGAINST AN ORDERED ALTERNATIVE: where Kruskal–Wallis
    * asks "do the groups differ at all", JT asks "do they INCREASE
    * with the group order" (dose-response, day-of-week drift, version
    * ladders) and is far more powerful when that is the question.
    * J = Σ_{g<h} [#(x_g < x_h) + ½·#(x_g = x_h)], carried as the exact
    * integer 2J; under H₀, E[2J] = (N² − Σn_g²)/2 (always even ⇒
    * integer) and Var[J] = [N²(2N+3) − Σn_g²(2n_g+3)]/72 (the
    * standard untied form — ties enter J through the ½ convention and
    * the variance stays the documented approximation),
    * z = (2J − E[2J]) / (2·√Var).
    *
    * Exactness: 2J comes from an all-integer double-cumulative over
    * the (group, value) census — C_g(<v) via a group-partitioned value
    * window, then the lower-group prefix via a value-partitioned group
    * window — never a pair join; E and the Var numerator are exact
    * decimal products; z is one pinned √/division shape.
    *
    * Scale shape: one (group, value) census (map-side combined), two
    * windows over census grain — partitions bounded by k groups and by
    * the value domain respectively (integral `valueCol`; bucket
    * upstream for unbounded domains, the energy-distance note).
    * Output one row: (n, k_groups, j2, e2, var_j, z); z null when
    * Var = 0. `groupCol` must be integral — its natural order IS the
    * tested trend. */
  def jonckheereTerpstra(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df
      .select(col(groupCol).cast("long").as("g"),
        col(valueCol).cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("n"))
    val wBelow = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLowerG = Window.partitionBy(col("v")).orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // DENSE (group x value) grid: C_g(<v) must exist at EVERY value for
    // every lower group, including values group g never hit — a sparse
    // census would silently drop those C terms from the prefix. The
    // grid is k x |values| (census-bounded both ways).
    val grid = census.select(col("v")).distinct()
      .crossJoin(census.select(col("g")).distinct())
      .join(census, Seq("g", "v"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val contrib = grid
      .withColumn("cb", coalesce(sum(col("n")).over(wBelow), lit(0L)))
      .withColumn("a", coalesce(sum(col("cb")).over(wLowerG), lit(0L)))
      .withColumn("b", coalesce(sum(col("n")).over(wLowerG), lit(0L)))
      .select((col("n").cast(dec) *
        (lit(2L).cast(dec) * col("a").cast(dec) + col("b").cast(dec)))
        .cast(dec).as("__c"))
      .agg(sum(col("__c")).cast(dec).as("j2"))
    val sizes = census.groupBy(col("g")).agg(sum(col("n")).as("ng"))
      .agg(count(lit(1)).as("k_groups"), sum(col("ng")).as("n"),
        sum((col("ng").cast(dec) * col("ng").cast(dec)).cast(dec))
          .cast(dec).as("sq2"),
        sum((col("ng").cast(dec) * col("ng").cast(dec) *
          (lit(2L).cast(dec) * col("ng").cast(dec) + lit(3L).cast(dec)))
          .cast(dec)).cast(dec).as("sq3"))
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n").cast(dec)
    val e2 = ((nD * nD - col("sq2")).cast(dec) / lit(2).cast(dec)).cast(dec)
    val varJ = (nD * nD * (lit(2L).cast(dec) * nD + lit(3L).cast(dec)) -
      col("sq3")).cast(dec).cast("double") / 72.0
    contrib.crossJoin(broadcast(sizes))
      .withColumn("e2", e2)
      .withColumn("var_j", varJ)
      .select(col("n"), col("k_groups"), col("j2").cast("long").as("j2"),
        col("e2").cast("long").as("e2"), col("var_j"),
        when(col("var_j") > 0.0,
          (col("j2") - col("e2")).cast("double") /
            (lit(2.0) * sqrt(col("var_j")))).as("z"))
  }

  /** Cochran–Armitage trend test (Cochran 1954, Armitage 1955) — the
    * BINARY-outcome member of the ordered-trend family: does a success
    * PROPORTION rise with the ordered group score (dose, version,
    * day index)? [[jonckheereTerpstra]] ranks a continuous outcome;
    * this weighs success counts by the group scores directly:
    *   T = Σ_g s_g·(r_g − n_g·p̄),
    *   Var(T) = p̄(1−p̄)·[Σ n_g s_g² − (Σ n_g s_g)²/N],
    *   z = T/√Var,
    * with s_g the group's own integral value as its score (the
    * standard equally-spaced choice when groups are indices).
    *
    * Exactness: r_g/n_g are exact integer censuses; T's terms are
    * exact decimal products divided once by N (T = Σs_g·r_g −
    * (Σs_g·n_g)·R/N folded as one pinned shape); Var likewise; z one
    * division + √. Output one row: (n, k_groups, n_success, t, var_t,
    * z); z null when Var = 0. */
  def cochranArmitage(df: DataFrame, groupCol: String,
      successCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df
      .select(col(groupCol).cast("long").as("g"),
        when(col(successCol).cast("long") =!= 0L, 1L).otherwise(0L)
          .as("y"))
      .where(col("g").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("y")).as("rg"))
    val agg = census.agg(
      count(lit(1)).as("k_groups"),
      sum(col("ng")).as("n"), sum(col("rg")).as("r"),
      sum((col("g").cast(dec) * col("rg").cast(dec)).cast(dec)).cast(dec)
        .as("sr"),
      sum((col("g").cast(dec) * col("ng").cast(dec)).cast(dec)).cast(dec)
        .as("sn"),
      sum((col("g").cast(dec) * col("g").cast(dec) * col("ng").cast(dec))
        .cast(dec)).cast(dec).as("sn2"))
    def dd(c: Column): Column = c.cast("double")
    val nD = dd(col("n"))
    val pbar = dd(col("r")) / nD
    val t = dd(col("sr")) - dd(col("sn")) * dd(col("r")) / nD
    val varT = pbar * (lit(1.0) - pbar) *
      (dd(col("sn2")) - dd(col("sn")) * dd(col("sn")) / nD)
    agg.select(col("n"), col("k_groups"), col("r").as("n_success"),
      t.as("t"), varT.as("var_t"),
      when(varT > 0.0, t / sqrt(varT)).as("z"))
  }

  /** Page's L trend test (Page 1963) — the ordered-alternative upgrade
    * of the Friedman test, completing the trend family:
    * [[jonckheereTerpstra]] orders INDEPENDENT groups,
    * [[cochranArmitage]] orders proportions, Page orders REPEATED
    * MEASURES: within each block, rank the k ordered treatments'
    * values; L = Σ_j j·R_j with R_j the rank sum of treatment j;
    * under H₀, E[L] = b·k(k+1)²/4 and Var[L] = b·k²(k+1)(k²−1)/144,
    * z = (L − E)/√Var. The "does the metric rise across versions,
    * within every cohort" readout. The closed forms assume
    * coefficients exactly 1..k, so the raw treatment labels are
    * DENSE-RANKED over the distinct treatment set before forming L —
    * 0-based or non-consecutive labels ({0..6}, {2,4,6}) keep only
    * their ORDER, never their magnitude (round-10 ADVICE fix: raw
    * labels silently biased z whenever they weren't exactly 1..k).
    *
    * Design contract: Page's test needs COMPLETE blocks. Blocks
    * missing any treatment are EXCLUDED and counted loudly
    * (`n_blocks_dropped`) — the q313 unassigned-edge discipline. Cell
    * values are per-(block, treatment) means of exact integer sums
    * (one division — identical cross-engine); within-block ranks break
    * value ties by treatment index (a pinned total order; the
    * mid-rank tie convention is not replayed — ties in a mean census
    * are measure-zero and the pinned order keeps the statistic
    * deterministic rather than silently approximate).
    *
    * Scale shape: one (block, treatment) census, a block-partitioned
    * rank window over k rows, integer rollups. Output one row:
    * (n_blocks, n_blocks_dropped, k, l, e_l, var_l, z). */
  def pageTrend(df: DataFrame, blockCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    val census = df
      .select(col(blockCol).as("b"), col(treatCol).cast("long").as("j"),
        col(valueCol).cast("long").as("x"))
      .where(col("b").isNotNull && col("j").isNotNull &&
        col("x").isNotNull)
      .groupBy(col("b"), col("j"))
      .agg((sum(col("x")).cast("double") / count(lit(1)).cast("double"))
        .as("m"))
    val kDf = broadcast(census.select(col("j")).distinct()
      .agg(count(lit(1)).as("k")))
    val blocks = census.groupBy(col("b"))
      .agg(count(lit(1)).as("__nj"))
    val complete = blocks.crossJoin(kDf)
      .select(col("b"), (col("__nj") === col("k")).as("__ok"))
    val dropped = broadcast(complete
      .agg(sum(when(col("__ok"), 0L).otherwise(1L))
        .as("n_blocks_dropped")))
    val wRank = Window.partitionBy(col("b")).orderBy(col("m"), col("j"))
    // coefficient = dense rank of the treatment label over the distinct
    // treatment set (k rows, Guards-gated): E[L]/Var[L] hold for 1..k only
    val jRank = broadcast(Guards.boundedCensus(
        census.select(col("j")).distinct(), "j", "Eval.pageTrend")
      .withColumn("jr",
        row_number().over(Window.orderBy(col("j"))).cast("long")))
    val ranked = census
      .join(complete.where(col("__ok")).select(col("b")), Seq("b"))
      .join(jRank, Seq("j"))
      .withColumn("r", row_number().over(wRank).cast("long"))
    val lAgg = ranked.agg(
      sum(col("jr") * col("r")).as("l"),
      countDistinct(col("b")).as("n_blocks"))
    def dd(c: Column): Column = c.cast("double")
    val bD = dd(col("n_blocks"))
    val kD = dd(col("k"))
    val eL = bD * kD * (kD + 1.0) * (kD + 1.0) / 4.0
    val varL = bD * kD * kD * (kD + 1.0) * (kD * kD - 1.0) / 144.0
    lAgg.crossJoin(kDf).crossJoin(dropped)
      .select(col("n_blocks"), col("n_blocks_dropped"), col("k"),
        col("l"), eL.as("e_l"), varL.as("var_l"),
        when(varL > 0.0, (dd(col("l")) - eL) / sqrt(varL)).as("z"))
  }

  /** Mantel–Haenszel common odds ratio + test (Mantel & Haenszel 1959)
    * — the stratified 2×2 summary that [[cochranArmitage]]'s trend and
    * the q338 stratified ATE don't give: one pooled odds ratio across
    * strata, immune to the confounding a collapsed table bakes in
    * (Simpson's reversal is exactly the failure mode this exists for):
    *   OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ),
    *   χ²_MH = max(|Σaᵢ − ΣEᵢ| − ½, 0)² / ΣVᵢ  (continuity-corrected;
    *   the clamp keeps the correction from INFLATING χ² when
    *   |Σa − ΣE| < ½ — round-10 ADVICE fix),
    *   Eᵢ = (aᵢ+bᵢ)(aᵢ+cᵢ)/nᵢ,
    *   Vᵢ = (aᵢ+bᵢ)(cᵢ+dᵢ)(aᵢ+cᵢ)(bᵢ+dᵢ)/(nᵢ²(nᵢ−1)),
    * p = erfc(√(χ²/2)) — χ²(1), the pinned q348 kernel.
    *
    * Exactness: cell counts are exact integer censuses; each
    * stratum's ratio terms are single divisions of exact decimal
    * products, and the cross-stratum float sums fold IN STRATUM ORDER
    * over the bounded stratum list (the q237 contract). Strata with
    * nᵢ ≤ 1 contribute no variance (pinned). Output one row:
    * (n_strata, n, or_mh, chi2, p); or_mh null when the denominator
    * is 0, chi2/p null when ΣV = 0. */
  def mantelHaenszel(df: DataFrame, stratumCol: String, exposedCol: Column,
      successCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df
      .select(col(stratumCol).cast("string").as("s"),
        when(exposedCol, 1L).otherwise(0L).as("e"),
        when(successCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(when(col("e") === 1L && col("y") === 1L, 1L).otherwise(0L))
        .as("a"),
        sum(when(col("e") === 1L && col("y") === 0L, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("e") === 0L && col("y") === 1L, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("e") === 0L && col("y") === 0L, 1L).otherwise(0L))
          .as("d"))
    val folded = census
      .agg(count(lit(1)).as("n_strata"),
        sum(col("a") + col("b") + col("c") + col("d")).as("n"),
        sum(col("a")).as("sum_a"),
        sort_array(collect_list(struct(col("s"), col("a"), col("b"),
          col("c"), col("d")))).as("__l"))
    def fold(term: String) =
      s"""aggregate(__l, CAST(0.0 AS DOUBLE), (acc, e) -> acc + ($term))"""
    val nI = "CAST(e.a + e.b + e.c + e.d AS DOUBLE)"
    val folds = folded.select(col("n_strata"), col("n"), col("sum_a"),
      expr(fold(s"IF(e.a + e.b + e.c + e.d > 0, " +
        s"CAST(e.a AS DOUBLE) * CAST(e.d AS DOUBLE) / ($nI), 0.0)"))
        .as("__num"),
      expr(fold(s"IF(e.a + e.b + e.c + e.d > 0, " +
        s"CAST(e.b AS DOUBLE) * CAST(e.c AS DOUBLE) / ($nI), 0.0)"))
        .as("__den"),
      expr(fold(s"IF(e.a + e.b + e.c + e.d > 0, " +
        s"CAST(e.a + e.b AS DOUBLE) * CAST(e.a + e.c AS DOUBLE) / ($nI)," +
        s" 0.0)")).as("__e"),
      expr(fold(s"IF(e.a + e.b + e.c + e.d > 1, " +
        s"CAST(e.a + e.b AS DOUBLE) * CAST(e.c + e.d AS DOUBLE) * " +
        s"CAST(e.a + e.c AS DOUBLE) * CAST(e.b + e.d AS DOUBLE) / " +
        s"(($nI) * ($nI) * CAST(e.a + e.b + e.c + e.d - 1 AS DOUBLE)), " +
        s"0.0)")).as("__v"))
    val corr = greatest(
      abs(col("sum_a").cast("double") - col("__e")) - lit(0.5), lit(0.0))
    val chi2 = corr * corr / col("__v")
    folds.select(col("n_strata"), col("n"),
      when(col("__den") > 0.0, col("__num") / col("__den")).as("or_mh"),
      when(col("__v") > 0.0, chi2).as("chi2"),
      when(col("__v") > 0.0,
        graft.functions.FastMath.erfc(
          sqrt(chi2 / lit(2.0)))).as("p"))
  }

  /** Lin's concordance correlation coefficient (Lin 1989) per scope —
    * the CONTINUOUS agreement number next to [[cohenKappa]]'s
    * categorical one: how well two scorers' values agree with the
    * 45° line (not just correlate — a scorer that doubles every value
    * correlates perfectly and concords badly):
    *   CCC = 2·s_xy / (s_x² + s_y² + (x̄ − ȳ)²),
    * population (1/n) moment convention, stated not hidden. The
    * "can the cheap quality model replace the expensive one" readout.
    *
    * Exactness: the five moments are exact decimal sums of integer
    * inputs; CCC is one fixed shape of single divisions (the q332
    * discipline). Output: (scope, n, mean_a, mean_b, ccc); null when
    * both variances and the mean gap are 0. */
  def linCcc(df: DataFrame, scopeCol: String, aCol: String,
      bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df
      .select(col(scopeCol).as("sc"), col(aCol).cast("long").as("x"),
        col(bCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    def m(c: Column): Column = sum(c.cast(dec)).cast(dec)
    val agg = base.groupBy(col("sc")).agg(
      count(lit(1)).as("n"), m(col("x")).as("sx"), m(col("y")).as("sy"),
      m((col("x").cast(dec) * col("y").cast(dec)).cast(dec)).as("sxy"),
      m((col("x").cast(dec) * col("x").cast(dec)).cast(dec)).as("sxx"),
      m((col("y").cast(dec) * col("y").cast(dec)).cast(dec)).as("syy"))
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n").cast(dec)
    val covN = (nD * col("sxy") - col("sx") * col("sy")).cast(dec)
    val vxN = (nD * col("sxx") - col("sx") * col("sx")).cast(dec)
    val vyN = (nD * col("syy") - col("sy") * col("sy")).cast(dec)
    val gapN = ((col("sx") - col("sy")).cast(dec) *
      (col("sx") - col("sy")).cast(dec)).cast(dec)
    // CCC = 2covN / (vxN + vyN + gapN): the n² scaling cancels
    val den = dd(vxN) + dd(vyN) + dd(gapN)
    agg.select(col("sc"), col("n"),
      (dd(col("sx")) / dd(col("n"))).as("mean_a"),
      (dd(col("sy")) / dd(col("n"))).as("mean_b"),
      when(den > 0.0, lit(2.0) * dd(covN) / den).as("ccc"))
  }

  /** Breslow–Day homogeneity test with Tarone's correction (Breslow &
    * Day 1980; Tarone 1985) — the companion [[mantelHaenszel]] is
    * incomplete without: MH pools one common odds ratio ACROSS strata,
    * BD asks whether that pooling was legitimate (is the odds ratio
    * actually the same in every stratum, or does the "common" OR
    * average away a real interaction). Per stratum, the expected a-cell
    * ã under the pooled ψ = OR_MH solves the quadratic
    *   ã²(ψ−1) − ã[ψ(n1+m1) + (n2−m1)] + ψ·n1·m1 = 0
    * (root inside [max(0,m1−n2), min(n1,m1)]; ψ=1 degenerates to the
    * linear ã = n1·m1/n), with Var(ã) = 1/(1/ã + 1/(n1−ã) + 1/(m1−ã)
    * + 1/(n2−m1+ã)); χ²_BD = Σ(aᵢ−ãᵢ)²/Varᵢ on S−1 df, and Tarone's
    * χ²_T = χ²_BD − (Σ(aᵢ−ãᵢ))²/ΣVarᵢ corrects the non-efficient-score
    * inflation. Statistic + df are emitted, not p (χ² tails beyond 1 df
    * have no pinned cross-engine kernel here — callers compare to their
    * critical value).
    *
    * Exactness: cell counts and margins are exact integer censuses; ψ
    * rides [[mantelHaenszel]]'s stratum-ordered ratio folds; ã/Var are
    * one pinned quadratic shape of doubles per stratum (libm sqrt
    * parity, the q121 contract); the three cross-stratum sums fold IN
    * STRATUM ORDER over the bounded stratum list (the q237 contract).
    * Strata with any zero margin carry no information about OR
    * homogeneity and are excluded from the sums (counted in
    * `n_informative`); df = n_informative − 1.
    *
    * Scale shape: one stratum census, elementwise quadratic, one
    * bounded fold — identical to [[mantelHaenszel]]. Output one row:
    * (n_strata, n_informative, psi, chi2_bd, chi2_tarone, df); nulls
    * when ψ is undefined (denominator 0) or n_informative < 2. */
  def breslowDay(df: DataFrame, stratumCol: String, exposedCol: Column,
      successCol: Column): DataFrame = {
    val census = df
      .select(col(stratumCol).cast("string").as("s"),
        when(exposedCol, 1L).otherwise(0L).as("e"),
        when(successCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(when(col("e") === 1L && col("y") === 1L, 1L).otherwise(0L))
        .as("a"),
        sum(when(col("e") === 1L && col("y") === 0L, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("e") === 0L && col("y") === 1L, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("e") === 0L && col("y") === 0L, 1L).otherwise(0L))
          .as("d"))
    // pooled psi: the mantelHaenszel ratio folds, stratum-ordered
    val nI = "CAST(e.a + e.b + e.cc + e.d AS DOUBLE)"
    def fold(term: String) =
      s"""aggregate(__l, CAST(0.0 AS DOUBLE), (acc, e) -> acc + ($term))"""
    val psiDf = census
      .agg(count(lit(1)).as("n_strata"),
        sort_array(collect_list(struct(col("s"), col("a"), col("b"),
          col("c").as("cc"), col("d")))).as("__l"))
      .select(col("n_strata"),
        expr(fold(s"IF(e.a + e.b + e.cc + e.d > 0, " +
          s"CAST(e.a AS DOUBLE) * CAST(e.d AS DOUBLE) / ($nI), 0.0)"))
          .as("__num"),
        expr(fold(s"IF(e.a + e.b + e.cc + e.d > 0, " +
          s"CAST(e.b AS DOUBLE) * CAST(e.cc AS DOUBLE) / ($nI), 0.0)"))
          .as("__den"))
      .select(col("n_strata"),
        when(col("__den") > 0.0, col("__num") / col("__den")).as("psi"))
    def dd(c: Column): Column = c.cast("double")
    // The per-stratum quadratic is FACTORED through named columns in
    // staged projections (r14): inlining aTilde into t_chi/t_dev/t_var
    // duplicated the root tree ~6x (and each copy re-inlined the
    // discriminant tree), and with the whole stage fused into the
    // census aggregate's output function the generated method tripped
    // Janino's 64 KB method cap — Spark fell back to interpreted eval
    // and re-attempted (and re-failed) the compile on every execution.
    // Each alias below is referenced more than once by a non-cheap
    // consumer, so CollapseProject keeps the stages separate and every
    // subtree is generated exactly once. Arithmetic is unchanged
    // op-for-op — same double shapes, bit-identical output.
    val psi = col("psi")
    val margins = census.crossJoin(broadcast(psiDf))
      .select(col("s"), col("n_strata"), col("psi"), col("a"),
        dd(col("a") + col("b")).as("n1"),
        dd(col("c") + col("d")).as("n2"),
        dd(col("a") + col("c")).as("m1"),
        dd(col("b") + col("d")).as("m2"))
    val n1 = col("n1"); val n2 = col("n2")
    val m1 = col("m1"); val m2 = col("m2")
    val quad = margins.select(col("s"), col("n_strata"), col("psi"),
      col("a"), col("n1"), col("n2"), col("m1"),
      (n1 > 0.0 && n2 > 0.0 && m1 > 0.0 && m2 > 0.0).as("informative"),
      // quadratic coefficients for the expected a-cell under pooled psi
      (psi - lit(1.0)).as("qa"),
      (-(psi * (n1 + m1) + (n2 - m1))).as("qb"),
      (psi * n1 * m1).as("qc"))
    val disc = sqrt(greatest(col("qb") * col("qb") -
      lit(4.0) * col("qa") * col("qc"), lit(0.0)))
    val roots = quad.select(col("s"), col("n_strata"), col("psi"),
      col("a"), col("n1"), col("n2"), col("m1"), col("informative"),
      col("qa"), col("qb"), disc.as("disc"))
    val r1 = (-col("qb") + col("disc")) / (lit(2.0) * col("qa"))
    val r2 = (-col("qb") - col("disc")) / (lit(2.0) * col("qa"))
    val lo = greatest(lit(0.0), m1 - n2)
    val hi = least(n1, m1)
    val aTilde = when(abs(psi - 1.0) < 1e-12, n1 * m1 / (n1 + n2))
      .otherwise(when(r2 >= lo - 1e-9 && r2 <= hi + 1e-9, r2).otherwise(r1))
    val withA = roots.select(col("s"), col("n_strata"), col("psi"),
      col("a"), col("n1"), col("n2"), col("m1"), col("informative"),
      aTilde.as("a_tilde"))
    val aT = col("a_tilde")
    val varA = lit(1.0) / (lit(1.0) / aT + lit(1.0) / (n1 - aT) +
      lit(1.0) / (m1 - aT) + lit(1.0) / (n2 - m1 + aT))
    val withVar = withA.select(col("s"), col("n_strata"), col("psi"),
      col("a"), col("informative"), col("a_tilde"), varA.as("var_a"))
    val informative = col("informative")
    val terms = withVar
      .select(col("s"), col("n_strata"), col("psi"),
        when(informative, lit(1L)).otherwise(0L).as("inf"),
        when(informative && psi.isNotNull,
          (dd(col("a")) - aT) * (dd(col("a")) - aT) / col("var_a"))
          .otherwise(lit(0.0)).as("t_chi"),
        when(informative && psi.isNotNull, dd(col("a")) - aT)
          .otherwise(lit(0.0)).as("t_dev"),
        when(informative && psi.isNotNull, col("var_a")).otherwise(lit(0.0))
          .as("t_var"))
    val folded = terms
      .groupBy(col("n_strata"), col("psi"))
      .agg(sum(col("inf")).as("n_informative"),
        sort_array(collect_list(struct(col("s"), col("t_chi"),
          col("t_dev"), col("t_var")))).as("__t"))
      .select(col("n_strata"), col("psi"), col("n_informative"),
        expr("aggregate(__t, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t_chi)")
          .as("__chi"),
        expr("aggregate(__t, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t_dev)")
          .as("__dev"),
        expr("aggregate(__t, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t_var)")
          .as("__var"))
    val ok = col("psi").isNotNull && col("n_informative") >= 2L
    folded.select(col("n_strata"), col("n_informative"), col("psi"),
      when(ok, col("__chi")).as("chi2_bd"),
      when(ok && col("__var") > 0.0,
        col("__chi") - col("__dev") * col("__dev") / col("__var"))
        .as("chi2_tarone"),
      when(ok, (col("n_informative") - 1L).cast("long")).as("df"))
  }

  /** Kendall's coefficient of concordance W (Kendall & Babington Smith
    * 1939) — [[friedman]]'s effect size: friedman answers "do the m
    * raters (blocks) rank the k items differently from chance", W says
    * HOW MUCH they agree on [0, 1] (1 = every rater ranks every item
    * identically), with the mean pairwise Spearman ρ̄ = (mW−1)/(m−1)
    * as the two-rater read. Tie-corrected via the friedman statistic
    * identity W = χ²_F / (m(k−1)) — one extra pinned division each, so
    * the cross-engine story is exactly friedman's.
    *
    * Output one row: (k, n_blocks, chi2, w, rho_bar); w null when χ²
    * is undefined (all values tied), rho_bar null when m = 1. */
  def kendallW(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String): DataFrame = {
    val f = friedman(df, blockCol, treatmentCol, valueCol)
    def dd(c: Column): Column = c.cast("double")
    val mD = dd(col("n_blocks"))
    val kD = dd(col("k"))
    val w = col("chi2") / (mD * (kD - 1.0))
    f.select(col("k"), col("n_blocks"), col("chi2"),
      w.as("w"),
      when(col("n_blocks") > 1L, (mD * w - 1.0) / (mD - 1.0))
        .as("rho_bar"))
  }

  /** Expected calibration error (Naeini 2015's ECE) per group — the
    * ONE-NUMBER rollup of [[calibrationCurve]]: over the curve's
    * equal-population buckets, ECE = Σ_b (n_b/n)·|pos_rate_b −
    * mean_score_b/scale| — how far the scorer's stated confidence sits
    * from observed frequency, weighted by where the mass actually is.
    * `scoreScale` maps the integer score units onto [0, 1] (milli
    * scores → 1000). The deployment gate next to
    * [[brierDecomposition]]'s reliability term (same quantity, bucket
    * view): "can this model's probability be trusted as a probability".
    *
    * Exactness: buckets and counts ride [[calibrationCurve]]'s integer
    * census; each bucket term is a fixed float shape of two one-step
    * divisions; terms fold IN BUCKET ORDER over the ≤`buckets`-element
    * list (the q237 contract). Output per group: (g, n, n_buckets,
    * ece). */
  def expectedCalibrationError(df: DataFrame, groupCol: String,
      labelCol: String, scoreCol: String, buckets: Int,
      scoreScale: Long): DataFrame = {
    require(scoreScale > 0, s"scoreScale must be positive: $scoreScale")
    val curve = calibrationCurve(df, groupCol, labelCol, scoreCol, buckets)
      .select(col(groupCol).as("g"), col("bucket"), col("n"),
        col("mean_score"), col("pos_rate"))
    val term = col("n").cast("double") *
      abs(col("pos_rate") - col("mean_score") / lit(scoreScale.toDouble))
    curve.groupBy(col("g"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_buckets"),
        sort_array(collect_list(struct(col("bucket"), term.as("t"))))
          .as("__t"))
      .select(col("g"), col("n"), col("n_buckets"),
        (expr("aggregate(__t, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t)")
          / col("n").cast("double")).as("ece"))
  }

  /** UCB1 arm selection (Auer 2002) per scope — the deterministic
    * bandit read over logged rewards: arm a scores
    *   ucb(a) = mean(a) + √(2·ln N / n_a)
    * and the argmax is what an optimism-under-uncertainty allocator
    * pulls next. The EXPLORATION companion to [[bayesianAB]]'s
    * posterior read: same logged data, "what should we try next"
    * instead of "which arm won". Deterministic by construction — UCB
    * needs no random draws, which is why it is the bandit this engine
    * ships (Thompson sampling would need per-decision Beta draws).
    *
    * Exactness: per-arm (n, Σr) are exact sums; mean is one division;
    * the bonus is a pinned √/ln shape (cross-engine ln parity, the
    * [[sprt]] contract). Ties break (ucb desc, arm asc). Unpulled
    * arms don't exist in logged data — cold-start is the caller's
    * seeding policy, not a hidden default.
    *
    * Scale shape: ONE (scope, arm) census aggregation plus a
    * scope-bounded argmax window. Output: (sc, arm, n, mean, bonus,
    * ucb, chosen). */
  def ucbAllocation(df: DataFrame, scopeCol: String, armCol: String,
      rewardCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(rewardCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(armCol).as("arm"),
        col(rewardCol).cast("long").as("r"))
    val g = base.groupBy(col("sc"), col("arm"))
      .agg(count(lit(1L)).as("n"), sum(col("r").cast(dec)).cast(dec).as("s"))
    val wAll = Window.partitionBy(col("sc"))
    def dd(c: Column): Column = c.cast("double")
    val withTot = g.withColumn("__nt", sum(col("n")).over(wAll))
    val mean = dd(col("s")) / dd(col("n"))
    val bonus = sqrt(lit(2.0) * log(dd(col("__nt"))) / dd(col("n")))
    val scored = withTot.select(col("sc"), col("arm"), col("n"),
      mean.as("mean"), bonus.as("bonus"), (mean + bonus).as("ucb"))
    val wPick = Window.partitionBy(col("sc"))
      .orderBy(col("ucb").desc, col("arm"))
    scored.withColumn("chosen", row_number().over(wPick) === 1)
  }

  /** Pinball (quantile) loss per group — THE proper scoring rule for a
    * quantile forecast (a τ-quantile claim is only auditable under the
    * asymmetric loss that τ minimizes):
    *   L_τ(y, ŷ) = τ·(y−ŷ)⁺ + (1−τ)·(ŷ−y)⁺.
    * Feed it a P90 capacity forecast and last week's actuals and the
    * number says whether the quantile was HONEST — the evaluation leg
    * the [[graft.operators.Quantiles]] estimators need to close the
    * loop. τ is passed as a RATIONAL (tauNum/tauDen) so the whole
    * census stays integer: tauDen·Σloss = tauNum·Σ(y−ŷ)⁺ +
    * (tauDen−tauNum)·Σ(ŷ−y)⁺ exactly, and the mean is ONE terminal
    * division by (tauDen·n).
    *
    * Scale shape: one broadcast-able forecast join, one group census.
    * Output: (g, n, qhat, over_sum, under_sum, pinball_mean). */
  /** Bartlett's test per scope — the classical (normal-theory)
    * homogeneity-of-variance companion to [[brownForsythe]]: more
    * powerful when the data really are normal, famously fragile when
    * they are not, so the two are reported as a pair. T is
    * asymptotically χ²(k−1):
    *   T = ((N−k)·ln S²_p − Σ_g (n_g−1)·ln S²_g) / C,
    *   C = 1 + (Σ_g 1/(n_g−1) − 1/(N−k)) / (3(k−1)),
    * with S²_p = Σ(n_g−1)S²_g/(N−k) the pooled variance.
    *
    * Contract: groups with n_g < 2 have no variance and are DROPPED
    * loudly (k_dropped) — they leave N too, so the kept-group algebra
    * stays internally consistent. T is null when k < 2 after drops or
    * any kept group's variance is 0 (ln undefined).
    *
    * Exactness: per-(scope, group) (n, Σy, Σy²) are exact decimal
    * sums and each S²_g is one pinned division; the three
    * order-sensitive float folds (Σ(n_g−1)S²_g, Σ(n_g−1)·ln S²_g,
    * Σ1/(n_g−1)) run in GROUP-KEY ORDER over a bounded sorted array
    * (the [[anovaF]] discipline) — partition-invariant, ln-parity
    * replayable cross-engine.
    *
    * Scale shape: one (scope, group) census aggregation, one scope
    * re-aggregation; groups per scope must be census-scale. Output:
    * (sc, k, k_dropped, n, sp2, chi2, df). */
  def bartlettVariance(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("y"))
    val yD = col("y").cast(dec)
    val cell = base.groupBy(col("sc"), col("g")).agg(
      count(lit(1)).as("ng"), sum(yD).cast(dec).as("sg"),
      sum((yD * yD).cast(dec)).cast(dec).as("qg"))
    val dropped = cell.where(col("ng") < 2L)
      .groupBy(col("sc")).agg(count(lit(1)).as("k_dropped"))
    val si2 = (col("ng").cast(dec) * col("qg") - col("sg") * col("sg"))
      .cast(dec).cast("double") /
      (col("ng").cast(dec) * (col("ng") - 1L).cast(dec)).cast(dec)
        .cast("double")
    val per = cell.where(col("ng") >= 2L)
      .select(col("sc"), col("g"), col("ng"), si2.as("s2"))
      .groupBy(col("sc"))
      .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sort_array(collect_list(struct(col("g"),
          col("ng").cast("double").as("ngd"), col("s2")))).as("cells"))
    // three in-order folds over the same bounded cell array (0.0-seed
    // parity with the oracle's list_reduce)
    val sw = aggregate(col("cells"), lit(0.0d), (a, x) =>
      a + (x.getField("ngd") - lit(1.0)) * x.getField("s2"))
    val sl = aggregate(col("cells"), lit(0.0d), (a, x) =>
      a + (x.getField("ngd") - lit(1.0)) * log(x.getField("s2")))
    val sh = aggregate(col("cells"), lit(0.0d), (a, x) =>
      a + lit(1.0) / (x.getField("ngd") - lit(1.0)))
    val minS2 = array_min(transform(col("cells"), x => x.getField("s2")))
    def dd(c: Column): Column = c.cast("double")
    val nk = dd(col("n") - col("k"))
    val sp2 = col("__sw") / nk
    val cc = lit(1.0) + (col("__sh") - lit(1.0) / nk) /
      (lit(3.0) * dd(col("k") - 1L))
    val ok = col("k") >= 2L && col("__min_s2") > 0.0
    per.join(dropped, Seq("sc"), "left")
      .withColumn("__sw", sw).withColumn("__sl", sl)
      .withColumn("__sh", sh).withColumn("__min_s2", minS2)
      .select(col("sc"), col("k"),
        coalesce(col("k_dropped"), lit(0L)).as("k_dropped"), col("n"),
        when(ok, sp2).as("sp2"),
        when(ok, (nk * log(sp2) - col("__sl")) / cc).as("chi2"),
        (col("k") - 1L).as("df"))
  }

  /** Cronbach's alpha — internal-consistency reliability of a k-item
    * instrument: do the k per-block item scores move together enough
    * to justify summing them into one scale?
    *   α = k/(k−1) · (1 − Σ_i s²_i / s²_T),
    * with s²_i the item variances and s²_T the variance of the block
    * total. The "is this composite score coherent" gate for any
    * multi-signal index (quality rubric items, rater checklists).
    *
    * Contract: alpha needs COMPLETE blocks (every item present); the
    * [[pageTrend]] discipline — incomplete blocks are EXCLUDED and
    * counted loudly (n_blocks_dropped). Item cell values are exact
    * integer sums per (block, item).
    *
    * Exactness: item and total moments are exact decimal sums; each
    * variance is one pinned division; the one order-sensitive float
    * fold (Σ_i s²_i) runs in ITEM ORDER over a k-bounded sorted
    * array. Output one row: (n_blocks, n_blocks_dropped, k, alpha);
    * null when k < 2, kept blocks < 2, or s²_T = 0. */
  def cronbachAlpha(df: DataFrame, blockCol: String, itemCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cell = df.where(col(valueCol).isNotNull)
      .select(col(blockCol).as("b"), col(itemCol).cast("string").as("i"),
        col(valueCol).cast("long").as("y"))
      .groupBy(col("b"), col("i"))
      .agg(sum(col("y").cast(dec)).cast(dec).as("v"))
    val k = cell.agg(countDistinct(col("i")).as("k"))
    val perBlock = cell.groupBy(col("b"))
      .agg(count(lit(1)).as("ni"), sum(col("v")).cast(dec).as("t"))
      .crossJoin(broadcast(k))
    val kept = perBlock.where(col("ni") === col("k"))
      .select(col("b"), col("t"))
    val nDropped = perBlock.where(col("ni") =!= col("k"))
      .agg(count(lit(1)).as("n_blocks_dropped"))
    val keptCells = cell.join(kept.select(col("b")), Seq("b"))
    // per-item sample variance from exact moments
    val item = keptCells.groupBy(col("i")).agg(
      count(lit(1)).as("nb"), sum(col("v")).cast(dec).as("si"),
      sum((col("v") * col("v")).cast(dec)).cast(dec).as("qi"))
    val si2 = (col("nb").cast(dec) * col("qi") - col("si") * col("si"))
      .cast(dec).cast("double") /
      (col("nb").cast(dec) * (col("nb") - 1L).cast(dec)).cast(dec)
        .cast("double")
    val items = item.where(col("nb") >= 2L)
      .select(col("i"), si2.as("s2"))
      .agg(sort_array(collect_list(struct(col("i"), col("s2"))))
        .as("cells"))
      .select(aggregate(col("cells"), lit(0.0d),
        (a, x) => a + x.getField("s2")).as("sum_si2"))
    val totals = kept.agg(count(lit(1)).as("n_blocks"),
      sum(col("t")).cast(dec).as("st"),
      sum((col("t") * col("t")).cast(dec)).cast(dec).as("qt"))
    def dd(c: Column): Column = c.cast("double")
    val sT2 = dd((col("n_blocks").cast(dec) * col("qt") -
      col("st") * col("st")).cast(dec)) /
      dd((col("n_blocks").cast(dec) * (col("n_blocks") - 1L).cast(dec))
        .cast(dec))
    val ok = col("k") >= 2L && col("n_blocks") >= 2L && sT2 =!= lit(0.0)
    totals.crossJoin(broadcast(k)).crossJoin(broadcast(items))
      .crossJoin(broadcast(nDropped))
      .select(col("n_blocks"), col("n_blocks_dropped"), col("k"),
        when(ok, (dd(col("k")) / dd(col("k") - 1L)) *
          (lit(1.0) - col("sum_si2") / sT2)).as("alpha"))
  }

  /** ICC(1,1) — one-way random-effects intraclass correlation per
    * scope: what share of total variance is BETWEEN groups? The
    * continuous-outcome agreement coefficient next to the categorical
    * family ([[fleissKappa]] and friends), and the design-effect
    * input for clustered sampling. Unbalanced groups use Searle's
    *   k₀ = (N − Σn_g²/N) / (k − 1),
    *   ICC = (MSB − MSW) / (MSB + (k₀ − 1)·MSW).
    *
    * Exactness: the [[anovaF]] census with one extra exact moment
    * (Σn_g²); the between fold runs in group-key order over the
    * bounded cell array; MSB/MSW/k₀ are pinned double shapes.
    * Output: (sc, k, n, msb, msw, k0, icc); null when k < 2, N ≤ k,
    * or the denominator is 0. */
  def iccOneWay(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("y"))
    val yD = col("y").cast(dec)
    val cell = base.groupBy(col("sc"), col("g")).agg(
      count(lit(1)).as("ng"), sum(yD).cast(dec).as("sg"),
      sum((yD * yD).cast(dec)).cast(dec).as("qg"))
    val per = cell.groupBy(col("sc")).agg(
      count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("sg")).cast(dec).as("s"), sum(col("qg")).cast(dec).as("q"),
      sum((col("ng").cast(dec) * col("ng").cast(dec)).cast(dec)).cast(dec)
        .as("sn2"),
      sort_array(collect_list(struct(col("g"),
        col("sg").cast("double").as("sgd"),
        col("ng").cast("double").as("ngd")))).as("cells"))
    def dd(c: Column): Column = c.cast("double")
    val between = aggregate(col("cells"), lit(0.0d),
      (acc, x) => acc + x.getField("sgd") * x.getField("sgd") /
        x.getField("ngd"))
    val ssb = between - dd(col("s")) * dd(col("s")) / dd(col("n"))
    val ssw = dd(col("q")) - between
    val msb = ssb / dd(col("k") - 1L)
    val msw = ssw / dd(col("n") - col("k"))
    val k0 = (dd(col("n")) - dd(col("sn2")) / dd(col("n"))) /
      dd(col("k") - 1L)
    val den = msb + (k0 - lit(1.0)) * msw
    val ok = col("k") > 1L && col("n") > col("k") && den =!= lit(0.0)
    per.select(col("sc"), col("k"), col("n"),
      when(col("k") > 1L, msb).as("msb"),
      when(col("n") > col("k"), msw).as("msw"),
      when(col("k") > 1L, k0).as("k0"),
      when(ok, (msb - msw) / den).as("icc"))
  }

  /** Brunner–Munzel test per scope (Brunner & Munzel 2000) — the
    * two-sample rank test [[mannWhitneyU]] graduates to when the two
    * groups may have UNEQUAL variances/shapes: Mann–Whitney's variance
    * assumes exchangeability under H₀; Brunner–Munzel studentizes the
    * relative effect p̂ = P(X₁ < X₂) + ½P(X₁ = X₂) with per-group rank
    * variances and a Welch-type df (the lawstat formulation):
    *   W  = n₁n₂·(R̄₂ − R̄₁) / (N·√(n₁S₁² + n₂S₂²)),
    *   S_k² = Var(R_ki − R⁽ᵏ⁾_ki),  df Welch-style from n_kS_k².
    * p̂ itself equals the two-sample AUC — [[auc]] is the spec-level
    * cross-check.
    *
    * Exactness: DOUBLED midranks (the [[mannWhitneyU]] census
    * convention) keep combined and within-group ranks integer; the
    * per-cell D = R − R⁽ᵏ⁾ is integer with multiplicity, so all
    * moments are exact decimals; W/df/p̂ are pinned double shapes.
    *
    * Scale shape: one (scope, value) census, three cumulative windows
    * over the value census per scope (bounded by distinct values —
    * callers discretize, the [[auc]] contract), one scope
    * aggregation. Output: (sc, n1, n2, p_hat, w, df_w); W/df null
    * when either group has n < 2 or all ranks are degenerate. */
  def brunnerMunzel(df: DataFrame, scopeCol: String, isSample2: Column,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(valueCol).cast("long").as("v"),
        when(isSample2, 1L).otherwise(0L).as("is2"))
      .groupBy(col("sc"), col("v"))
      .agg(count(lit(1)).as("t"), sum(col("is2")).as("t2"))
      .withColumn("t1", col("t") - col("t2"))
    val w = Window.partitionBy(col("sc")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = census
      .withColumn("r2",
        lit(2L) * coalesce(sum(col("t")).over(w), lit(0L)) +
          col("t") + 1L)
      .withColumn("r21",
        lit(2L) * coalesce(sum(col("t1")).over(w), lit(0L)) +
          col("t1") + 1L)
      .withColumn("r22",
        lit(2L) * coalesce(sum(col("t2")).over(w), lit(0L)) +
          col("t2") + 1L)
      .withColumn("d1", col("r2") - col("r21"))
      .withColumn("d2", col("r2") - col("r22"))
    def D(c: Column): Column = c.cast(dec)
    val g = ranked.groupBy(col("sc")).agg(
      sum(col("t1")).as("n1"), sum(col("t2")).as("n2"),
      sum((D(col("t1")) * D(col("r2"))).cast(dec)).cast(dec).as("sr1"),
      sum((D(col("t2")) * D(col("r2"))).cast(dec)).cast(dec).as("sr2"),
      sum((D(col("t1")) * D(col("d1"))).cast(dec)).cast(dec).as("sd1"),
      sum((D(col("t1")) * D(col("d1")) * D(col("d1"))).cast(dec))
        .cast(dec).as("sq1"),
      sum((D(col("t2")) * D(col("d2"))).cast(dec)).cast(dec).as("sd2"),
      sum((D(col("t2")) * D(col("d2")) * D(col("d2"))).cast(dec))
        .cast(dec).as("sq2"))
    def dd(c: Column): Column = c.cast("double")
    val n1D = col("n1").cast(dec); val n2D = col("n2").cast(dec)
    // sample variances of D from doubled-rank moments (the /4)
    val s1 = dd((n1D * col("sq1") - col("sd1") * col("sd1")).cast(dec)) /
      dd((lit(4).cast(dec) * n1D * (n1D - 1).cast(dec)).cast(dec))
    val s2 = dd((n2D * col("sq2") - col("sd2") * col("sd2")).cast(dec)) /
      dd((lit(4).cast(dec) * n2D * (n2D - 1).cast(dec)).cast(dec))
    val rbar1 = dd(col("sr1")) / (lit(2.0) * dd(col("n1")))
    val rbar2 = dd(col("sr2")) / (lit(2.0) * dd(col("n2")))
    val v1 = dd(col("n1")) * s1
    val v2 = dd(col("n2")) * s2
    val sumv = v1 + v2
    val phat = (rbar2 - (dd(col("n2")) + lit(1.0)) / lit(2.0)) /
      dd(col("n1"))
    val wStat = dd(col("n1")) * dd(col("n2")) * (rbar2 - rbar1) /
      ((dd(col("n1")) + dd(col("n2"))) * sqrt(sumv))
    val dfW = (sumv * sumv) /
      (v1 * v1 / dd(col("n1") - 1L) + v2 * v2 / dd(col("n2") - 1L))
    val both = col("n1") > 0L && col("n2") > 0L
    val ok = col("n1") > 1L && col("n2") > 1L && sumv > lit(0.0)
    g.select(col("sc"), col("n1"), col("n2"),
      when(both, phat).as("p_hat"),
      when(ok, wStat).as("w"),
      when(ok, dfW).as("df_w"))
  }

  /** Hosmer–Lemeshow goodness-of-fit per group — the significance
    * companion to [[expectedCalibrationError]]: over the same
    * equal-mass score buckets ([[calibrationCurve]]'s deterministic
    * tie-run deciles),
    *   HL = Σ_g (O_g − E_g)² / (E_g·(1 − p̄_g)),  df = G − 2,
    * with E_g = n_g·p̄_g and p̄_g the bucket's mean predicted
    * probability (mean_score/scoreScale). ECE says HOW miscalibrated;
    * HL says whether the miscalibration is distinguishable from
    * binomial noise. Buckets with p̄ at exactly 0 or 1 have no
    * binomial variance and are dropped LOUDLY (n_buckets_dropped).
    *
    * Exactness: the bucket census is exact (O, n integers; p̄ one
    * pinned division); each term is a fixed double shape; the fold
    * runs in bucket order over ≤G cells. The survival p implements
    * ONLY the even-df Poisson-sum fold of
    * [[graft.operators.Divergence.chiSquareIndependence]] (the
    * default G = 10 → df = 8, even); when degenerate-bucket drops
    * leave df ODD (or ≤ 0), p_value is NULL by design — the df
    * column stays populated so the caller sees exactly which parity
    * was hit and can re-bucket (the erfc half-integer series is a
    * different closed form we deliberately don't mix in). Output:
    * (g, n, n_buckets, n_buckets_dropped, hl, df, p_value). */
  def hosmerLemeshow(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, buckets: Int, scoreScale: Long): DataFrame = {
    require(scoreScale > 0, s"scoreScale must be positive: $scoreScale")
    val curve = calibrationCurve(df, groupCol, labelCol, scoreCol, buckets)
      .select(col(groupCol).as("g"), col("bucket"), col("n"),
        col("n_pos"), col("mean_score"))
    val pbar = col("mean_score") / lit(scoreScale.toDouble)
    val e = col("n").cast("double") * pbar
    val o = col("n_pos").cast("double")
    val okB = pbar > 0.0 && pbar < 1.0
    val term = (o - e) * (o - e) / (e * (lit(1.0) - pbar))
    val per = curve
      .withColumn("__ok", okB)
      .withColumn("__term", when(okB, term))
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n"),
        sum(when(col("__ok"), 1L).otherwise(0L)).as("n_buckets"),
        sum(when(col("__ok"), 0L).otherwise(1L)).as("n_buckets_dropped"),
        sort_array(collect_list(when(col("__ok"),
          struct(col("bucket"), col("__term").as("t"))))).as("cells"))
    val hl = aggregate(col("cells"), lit(0.0d),
      (a, x) => a + x.getField("t"))
    val dfree = col("n_buckets") - 2L
    val half = greatest(col("hl"), lit(0.0)) / lit(2.0)
    val series = when(col("__df") % 2L === 0L && col("__df") > 0L,
      when(col("__m") > 1L,
        expr("""aggregate(
          |transform(sequence(1L, __m - 1L), k -> __h / CAST(k AS DOUBLE)),
          |named_struct('s', CAST(1.0 AS DOUBLE), 't', CAST(1.0 AS DOUBLE)),
          |(acc, hk) -> named_struct(
          |  's', acc.s + acc.t * hk,
          |  't', acc.t * hk),
          |acc -> acc.s)""".stripMargin))
        .otherwise(lit(1.0)))
    per.withColumn("hl", when(col("n_buckets") > 2L, hl))
      .withColumn("__df", dfree)
      .withColumn("__h", half)
      .withColumn("__m", expr("__df div 2"))
      .withColumn("__series", series)
      .select(col("g"), col("n"), col("n_buckets"),
        col("n_buckets_dropped"), col("hl"), col("__df").as("df"),
        (exp(-col("__h")) * col("__series")).as("p_value"))
  }

  /** Binary-confusion statistics per group — TP/FP/FN/TN with the
    * three readouts that disagree exactly when class balance makes
    * accuracy lie: Matthews correlation (the chance-corrected number
    * that needs ALL four cells), F1 (which never sees TN), and raw
    * accuracy. MCC is [[cohenKappa]]'s continuous-geometry sibling on
    * a 2×2:
    *   MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN)).
    *
    * Exactness: four exact cells; the MCC numerator and every margin
    * product stay exact decimal; one √ and one division. F1 and
    * accuracy are single divisions. MCC null when any margin is 0
    * (a degenerate predictor or degenerate truth — the cases where
    * accuracy quietly reads 0.99); F1 null when TP+FP+FN = 0. Output:
    * (g, n, tp, fp, fn, tn, acc, f1, mcc). */
  def confusionStats(df: DataFrame, groupCol: String, predCol: Column,
      actualCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(col(groupCol).as("g"),
      when(predCol, 1L).otherwise(0L).as("p"),
      when(actualCol, 1L).otherwise(0L).as("y"))
    val g = base.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(when(col("p") === 1L && col("y") === 1L, 1L).otherwise(0L))
        .as("tp"),
      sum(when(col("p") === 1L && col("y") === 0L, 1L).otherwise(0L))
        .as("fp"),
      sum(when(col("p") === 0L && col("y") === 1L, 1L).otherwise(0L))
        .as("fn"),
      sum(when(col("p") === 0L && col("y") === 0L, 1L).otherwise(0L))
        .as("tn"))
    def D(c: Column): Column = c.cast(dec)
    val num = (D(col("tp")) * D(col("tn")) - D(col("fp")) * D(col("fn")))
      .cast(dec)
    val den = (D(col("tp") + col("fp")) * D(col("tp") + col("fn")) *
      D(col("tn") + col("fp")) * D(col("tn") + col("fn"))).cast(dec)
    def dd(c: Column): Column = c.cast("double")
    val zero = lit(0).cast(dec)
    g.select(col("g"), col("n"), col("tp"), col("fp"), col("fn"),
      col("tn"),
      (dd(col("tp") + col("tn")) / dd(col("n"))).as("acc"),
      when(col("tp") + col("fp") + col("fn") > 0L,
        dd(lit(2L) * col("tp")) /
          dd(lit(2L) * col("tp") + col("fp") + col("fn"))).as("f1"),
      when(den =!= zero, dd(num) / sqrt(dd(den))).as("mcc"))
  }

  /** Bland–Altman agreement between two paired measurement methods —
    * the readout correlation famously gets wrong (two methods can
    * correlate at 0.99 and still disagree by a constant 20%): the
    * mean difference (bias), its ±1.96·SD limits of agreement, and
    * the difference-vs-mean slope that flags PROPORTIONAL bias
    * (disagreement growing with magnitude).
    *
    * Exactness: d = a − b and the doubled mean m = a + b are exact
    * integers; all moments exact decimal; bias/SD are pinned double
    * shapes and the slope is 2·(nΣdm − ΣdΣm)/(nΣmm − (Σm)²) — the
    * doubling maps the m-slope back to the true (a+b)/2 mean. Output
    * one row: (n, bias, sd_d, loa_lo, loa_hi, slope_vs_mean); SD and
    * limits null when n < 2, slope null when var(m) = 0. */
  def blandAltman(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select((col(aCol).cast("long") - col(bCol).cast("long")).as("d"),
        (col(aCol).cast("long") + col(bCol).cast("long")).as("m"))
    val dD = col("d").cast(dec); val mD = col("m").cast(dec)
    val g = base.agg(count(lit(1)).as("n"),
      sum(dD).cast(dec).as("sd1"),
      sum((dD * dD).cast(dec)).cast(dec).as("sdd"),
      sum(mD).cast(dec).as("sm"),
      sum((mD * mD).cast(dec)).cast(dec).as("smm"),
      sum((dD * mD).cast(dec)).cast(dec).as("sdm"))
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n").cast(dec)
    val bias = dd(col("sd1")) / dd(col("n"))
    val varD = dd((nD * col("sdd") - col("sd1") * col("sd1")).cast(dec)) /
      dd((nD * (nD - lit(1).cast(dec)).cast(dec)).cast(dec))
    val sdD = sqrt(varD)
    val varM = (nD * col("smm") - col("sm") * col("sm")).cast(dec)
    val covDM = (nD * col("sdm") - col("sd1") * col("sm")).cast(dec)
    val zero = lit(0).cast(dec)
    g.select(col("n"),
      when(col("n") > 0L, bias).as("bias"),
      when(col("n") > 1L, sdD).as("sd_d"),
      when(col("n") > 1L, bias - lit(1.96) * sdD).as("loa_lo"),
      when(col("n") > 1L, bias + lit(1.96) * sdD).as("loa_hi"),
      when(varM =!= zero, lit(2.0) * dd(covDM) / dd(varM))
        .as("slope_vs_mean"))
  }

  def pinballLoss(actuals: DataFrame, forecasts: DataFrame,
      groupCol: String, valueCol: String, qhatCol: String,
      tauNum: Long, tauDen: Long): DataFrame = {
    require(tauDen > 0 && tauNum > 0 && tauNum < tauDen,
      s"tau must be a proper fraction, got $tauNum/$tauDen")
    val dec = "decimal(38,0)"
    val f = forecasts.select(col(groupCol).as("g"),
      col(qhatCol).cast("long").as("qhat"))
    val a = actuals.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("y"))
    a.join(broadcast(f), Seq("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), max(col("qhat")).as("qhat"),
        sum(greatest(col("y") - col("qhat"), lit(0L)).cast(dec))
          .cast(dec).as("over_sum"),
        sum(greatest(col("qhat") - col("y"), lit(0L)).cast(dec))
          .cast(dec).as("under_sum"))
      .select(col("g"), col("n"), col("qhat"),
        col("over_sum").cast("long").as("over_sum"),
        col("under_sum").cast("long").as("under_sum"),
        ((lit(tauNum).cast(dec) * col("over_sum") +
          lit(tauDen - tauNum).cast(dec) * col("under_sum")).cast(dec)
          .cast("double") /
          (lit(tauDen).cast(dec) * col("n").cast(dec)).cast(dec)
            .cast("double")).as("pinball_mean"))
  }

  /** Mood's median test per scope — the k-sample location gate that
    * survives what breaks the rank family: [[kruskalWallis]] needs
    * comparable SHAPES across groups and its rank sums feel every
    * outlier's magnitude; Mood reduces each observation to one bit
    * (above the POOLED median or not) and runs the χ² on the k×2
    * census — maximally robust, minimally powerful, the right gate
    * when a feed's tails are untrusted. χ² = Σ_cells (O−E)²/E over
    * groups × {above, ≤}, df = k−1.
    *
    * The pooled median is pinned DETERMINISTIC: the value at sorted
    * position ceil(N/2) (lower median — no averaging, no
    * interpolation, identical cross-engine). Exactness: the census is
    * exact integers; E = n_i·A/N one division per cell; each term a
    * fixed double shape folded in group order.
    *
    * Scale shape: one scope-keyed sort for the median row, one k×2
    * census, one bounded fold. Output: (sc, n, k_groups, pooled_med,
    * n_above, chi2, df); chi2 null when any margin is empty (A = 0 or
    * A = N) or k < 2. */
  def moodMedian(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame =
    moodMedianFromCensus(moodCensus(df, scopeCol, groupCol, valueCol))
      .withColumnRenamed("sc", scopeCol)

  /** The (scope, group, value) count census [[moodMedian]] reduces to —
    * a PURE aggregation, so the same function is the streaming twin's
    * state ([[graft.streaming.Streams.moodCensusStream]]): per cell one
    * long count, state bounded by distinct (scope, group, value)
    * triples, never row count. Output: (sc, g, x, c). */
  def moodCensus(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame =
    df.select(col(scopeCol).as("sc"), col(groupCol).as("g"),
        col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull && col("g").isNotNull)
      .groupBy(col("sc"), col("g"), col("x"))
      .agg(count(lit(1)).as("c"))

  /** [[moodMedian]]'s statistic half over a (sc, g, x, c) census —
    * the FromCensus contract ([[sprtFromCensus]] family): everything
    * (pooled lower median via cumulative value counts, the k×2 table,
    * the χ² fold) derives from the census alone, so a streamed census
    * sink feeds it identically to the batch path. The lower median at
    * sorted position ceil(N/2) is the SMALLEST value whose cumulative
    * count reaches ceil(N/2) — the value-grain form of the row-grain
    * row_number rule, bit-identical. */
  def moodMedianFromCensus(census: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = census.select(col("sc"), col("g"), col("x"), col("c"))
    val wS = Window.partitionBy(col("sc"))
    val wOrd = Window.partitionBy(col("sc")).orderBy(col("x"))
    val byVal = base.groupBy(col("sc"), col("x"))
      .agg(sum(col("c")).as("cv"))
    val med = byVal
      .withColumn("__cum", sum(col("cv")).over(wOrd))
      .withColumn("__n", sum(col("cv")).over(wS))
      .where(col("__cum") >= expr("(__n + 1) div 2")) // ceil(N/2)
      .groupBy(col("sc")).agg(min(col("x")).as("med"))
      // fresh output attributes: med derives from `base`, and a
      // memory-sink view feeding both join sides otherwise trips
      // "conflicting references" (both outputs carry sc's exprId)
      .select(col("sc").as("__msc"), col("med"))
    val cells = base
      .join(med, base("sc") === med("__msc")).drop("__msc")
      .groupBy(col("sc"), col("g"))
      .agg(max(col("med")).as("med"), sum(col("c")).as("ni"),
        sum(when(col("x") > col("med"), col("c")).otherwise(0L)).as("ai"))
    def dd(c: Column): Column = c.cast("double")
    val per = cells.groupBy(col("sc")).agg(
      max(col("med")).as("pooled_med"),
      sum(col("ni")).as("n"), count(lit(1)).as("k_groups"),
      sum(col("ai")).as("n_above"),
      sort_array(collect_list(struct(col("g"), col("ni").cast("double")
        .as("nd"), col("ai").cast("double").as("ad")))).as("__cells"))
    val nD = dd(col("n")); val aD = dd(col("n_above"))
    // per-cell term built as ONE sum, then acc + term — the association
    // the oracle's transform-then-reduce replays bit-for-bit
    val chi2 = aggregate(col("__cells"), lit(0.0d), (acc, e) => {
      val ea = e.getField("nd") * aD / nD
      val el = e.getField("nd") * (nD - aD) / nD
      val t1 = (e.getField("ad") - ea) * (e.getField("ad") - ea) / ea
      val t2 = ((e.getField("nd") - e.getField("ad")) - el) *
        ((e.getField("nd") - e.getField("ad")) - el) / el
      acc + (t1 + t2)
    })
    val ok = col("k_groups") > 1L && col("n_above") > 0L &&
      col("n_above") < col("n")
    per.select(col("sc"), col("n"), col("k_groups"),
      col("pooled_med"), col("n_above"),
      when(ok, chi2).as("chi2"),
      when(col("k_groups") > 1L, col("k_groups") - 1L).as("df"))
  }

}
