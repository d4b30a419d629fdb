package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact weighted order statistics. The weighted median ("the price at
  * which half the QUANTITY sits below") is the inventory/risk summary
  * plain medians get wrong when rows carry unequal mass.
  *
  * Implementation: per-group cumulative weight over the (value, tie)
  * order; the weighted median is the first value whose doubled
  * cumulative mass reaches the group total. With integral weights the
  * cumulative sums are exact, so the crossing row — and therefore the
  * result — is deterministic and engine-replayable.
  *
  * Scale: this is the EXACT path (one per-group sort of the narrow
  * (group, value, weight) projection — the q10 exact-percentile
  * family). At 100 TB the GK sketch ([[Sketches.approxQuantiles]])
  * is the approximate stand-in; this operator remains for the
  * medium-cardinality groups where exactness is required. */
object WeightedStats {

  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, tieCols: Seq[String]): DataFrame = {
    val order: Seq[Column] = col(valueCol) +: tieCols.map(col)
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    val wAll = Window.partitionBy(col(groupCol))
    df.select((Seq(groupCol, valueCol, weightCol) ++ tieCols).distinct.map(col): _*)
      .withColumn("cum", sum(col(weightCol)).over(wOrd))
      .withColumn("tot", sum(col(weightCol)).over(wAll))
      .where(col("cum") * 2 >= col("tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("weighted_median"),
        max(col("tot")).as("total_weight"))
  }

  /** Per-key time-weighted mean (TWAP): each observation's value holds
    * until the NEXT observation, so the mean weights each value by its
    * holding duration — the summary a last-value-carried-forward
    * series needs (a plain AVG over-weights busy periods; sparse
    * regimes where a value held for hours count the same as a burst
    * of ticks). The final observation has no successor and carries no
    * weight (the [lo, last) integral — document the horizon upstream
    * if the tail matters).
    *
    * Exactness: timestamps and values must be integers (epoch-ms,
    * cents); every weight is one integer subtraction from a per-key
    * lead window, Σw is an exact long sum, Σv·w accumulates in
    * decimal(38,0) — cent-scale values held across long ms gaps
    * overflow a long's 2^63 headroom, and the decimal sum matches the
    * HUGEINT path a SQL oracle takes — and the TWAP is ONE terminal
    * division. Output: (key, n_obs, total_ms, twap); keys with a
    * single observation yield null twap. */
  def timeWeightedMean(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df.select((Seq(keyCol, tsCol, valueCol) ++ tieCols).distinct.map(col): _*)
      .withColumn("__next", lead(col(tsCol), 1).over(w))
      .withColumn("__w", col("__next") - col(tsCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__w")).as("total_ms"),
        sum(col(valueCol).cast("decimal(38,0)") * col("__w")).as("__vw"))
      .select(col(keyCol), col("n_obs"), col("total_ms"),
        when(col("total_ms") > 0L,
          col("__vw").cast("double") / col("total_ms").cast("double"))
          .as("twap"))
  }

  /** Pareto coverage — "how many units carry p% of the mass": the
    * minimum number of units (sources, customers, shards) whose
    * descending-weight prefix reaches each requested fraction of the
    * total. The operational face of [[gini]]'s abstract coefficient:
    * `n_80 = 3 of 20 sources` is a sentence a capacity plan can act
    * on.
    *
    * Exactness: per-unit totals are integer sums; the prefix walk runs
    * over the (weight desc, unit asc) total order and each cut is the
    * exact integer comparison cum·den ≥ num·total — no float anywhere.
    * Scale note: the ranked walk is a window over the UNIT census —
    * fine for source/label/shard-grain units; for user-grain units at
    * 10⁹ rows, pre-bucket by weight (the [[GlobalOrder]] prefix-sum
    * shape) before this exact path. Output one row: (n_units, total,
    * one `n_<name>` per cut). */
  def paretoCoverage(df: DataFrame, unitCol: String, weightCol: String,
      cuts: Seq[(String, Long, Long)]): DataFrame = {
    require(cuts.nonEmpty && cuts.forall { case (_, n, d) => n >= 0 && n <= d && d > 0 },
      s"cuts must be fractions in [0,1]: $cuts")
    val units0 = df.groupBy(col(unitCol))
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    // the global rank window runs over the UNIT census (sources,
    // suppliers — domain-bounded, never rows); gated at runtime
    val units = Guards.boundedCensus(units0, "__w",
      "WeightedStats.paretoCoverage")
    val wOrd = Window.orderBy(col("__w").desc, col(unitCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val ranked = units
      .withColumn("__cum", sum(col("__w")).over(wOrd))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__w").desc, col(unitCol))).cast("long"))
      .withColumn("__tot", sum(col("__w")).over(wAll))
    val aggs = count(lit(1)).as("n_units") +: max(col("__tot")).as("total") +:
      cuts.map { case (name, num, den) =>
        min(when(col("__cum") * den >= col("__tot") * num, col("__rk")))
          .as(s"n_$name")
      }
    ranked.agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group Gini concentration of a non-negative integer value —
    * the inequality audit (is 90% of the corpus volume coming from 2%
    * of its sources? is one customer most of a nation's revenue?). A
    * Gini near 0 is uniform mass; near 1, concentrated — the number a
    * mixture-rebalancing step ([[Mixture]]) reads before reweighting.
    *
    * Exact sorted-rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * (x ascending, i = 1..n), computed from the (group, value) CENSUS:
    * a tie-run of value v with count c starting at rank r₀ contributes
    * v·(c·r₀ + c·(c−1)/2) to Σ i·xᵢ — independent of within-run order,
    * so the statistic is deterministic without any tiebreak. All sums
    * are integer; ONE terminal division per group. Scale shape: the
    * census is the only row-scale aggregation; the cumulative walk is
    * a per-group window over DISTINCT values (bounded by the value
    * domain, not rows). Output: (group, n, total, gini); n ≤ 1 or
    * total = 0 → null gini. */
  def gini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val census = df.groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val ranked = census
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      // rank of the first row of this tie-run (1-based)
      .withColumn("__r0", col("__cum") - col("__c") + 1L)
      // `div` (integer division) keeps the term LongType — Spark's `/`
      // would cast to double and break the exact-integer contract once a
      // group's rank-weighted sum passes 2^53. c·(c−1) is even, so exact.
      .withColumn("__ix", col("__v") *
        (col("__c") * col("__r0") + expr("__c * (__c - 1L) div 2L")))
    ranked.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"), sum(col("__v") * col("__c")).as("total"),
        sum(col("__ix")).as("__six"))
      .select(col(groupCol), col("n"), col("total"),
        when(col("n") > 1L && col("total") =!= 0L,
          (lit(2L) * col("__six") - (col("n") + 1L) * col("total")).cast("double") /
            (col("n") * col("total")).cast("double")).as("gini"))
  }

  /** Between-group Theil index (Theil 1967) — [[gini]]'s DECOMPOSABLE
    * sibling: how unequally is total `valueCol` mass distributed across
    * `groupCol` slices, relative to their populations?
    *   T_B = Σ_g s_g · ln(s_g / p_g),
    * s_g = value share, p_g = row share. 0 ⟺ every group's mass share
    * equals its population share; ln(k) at maximal concentration. The
    * corpus-budget fairness metric ("is 90% of the token mass in 2 of
    * 30 languages?") where Gini ranks individual rows.
    *
    * Rows with non-positive values are excluded (log domain),
    * documented. All moments (n_g, S_g, N, S) are exact integer sums;
    * each group term is one pinned-shape double expression (ln parity,
    * q237 precedent), and the ONE order-sensitive sum folds
    * left-to-right in group order over the k-bounded sorted collect.
    * Output one row: (k, n, total, theil_between); null when total = 0.
    *
    * Scale shape: one group census (map-side combined), then k-bounded
    * work only. */
  def theilBetween(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df
      .where(col(valueCol).isNotNull && col(valueCol) > 0)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("ng"),
        sum(col(valueCol).cast("long")).cast(dec).as("sg"))
    val totals = census.agg(sum(col("ng")).as("n"),
      sum(col("sg")).cast(dec).as("s"), count(lit(1)).as("k"))
    val term = (col("sg").cast("double") / col("s").cast("double")) *
      log((col("sg").cast("double") * col("n").cast("double")) /
        (col("s").cast("double") * col("ng").cast("double")))
    census.crossJoin(broadcast(totals))
      .select(col("g"), col("n"), col("s"), col("k"), term.as("t"))
      .groupBy(col("k"), col("n"), col("s"))
      .agg(sort_array(collect_list(struct(col("g"), col("t")))).as("ts"))
      .select(col("k"), col("n"), col("s").cast("long").as("total"),
        when(col("s") > 0,
          aggregate(col("ts"), lit(0.0d), (acc, e) => acc + e.getField("t")))
          .as("theil_between"))
  }

  /** Herfindahl–Hirschman concentration index per scope — the
    * market-share concentration number next to [[theilBetween]]'s
    * entropy read and the q241 Gini: HHI = Σ_i s_i² over unit shares
    * of mass, 1/k (perfect spread) to 1 (monopoly), with the
    * k-corrected normalization (HHI − 1/k)/(1 − 1/k) ∈ [0, 1] so
    * scopes with different unit counts compare. In a corpus pipeline
    * this is "how concentrated is the data on a few sources/domains"
    * — the diversity gate's scalar.
    *
    * Units with non-positive total mass are EXCLUDED loudly
    * (k_dropped — a zero-mass unit holds no share; negative mass has
    * no share semantics at all). Exactness: unit masses and Σm_i² are
    * exact decimals; HHI is ONE division (Σm²/T²); the normalization
    * is a pinned double shape. Scale shape: one (scope, unit) census,
    * one scope rollup — no folds at all. Output: (sc, k_units,
    * k_dropped, total, hhi, hhi_norm); norm null when k < 2. */
  def herfindahl(df: DataFrame, scopeCol: String, unitCol: String,
      massCol: String): DataFrame =
    herfindahlFromCensus(herfindahlCensus(df, scopeCol, unitCol, massCol))

  /** The (scope, unit) mass census [[herfindahlFromCensus]] reads —
    * ONE aggregation, so it runs unchanged as a complete-mode
    * streaming query (the grubbsCensus split pattern): per (sc, u)
    * the exact-decimal mass total is the whole state. Output:
    * (sc, u, mi). */
  def herfindahlCensus(df: DataFrame, scopeCol: String, unitCol: String,
      massCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    df.where(col(massCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(unitCol).as("u"),
        col(massCol).cast("long").as("m"))
      .groupBy(col("sc"), col("u"))
      .agg(sum(col("m").cast(dec)).cast(dec).as("mi"))
  }

  /** HHI board from a [[herfindahlCensus]] table — the scope rollup
    * and the pinned-shape readouts, shared by the batch operator and
    * the streaming twin's downstream read. */
  def herfindahlFromCensus(unit: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val per = unit.groupBy(col("sc")).agg(
      sum(when(col("mi") > 0, 1L).otherwise(0L)).as("k_units"),
      sum(when(col("mi") > 0, 0L).otherwise(1L)).as("k_dropped"),
      sum(when(col("mi") > 0, col("mi")).otherwise(lit(0).cast(dec)))
        .cast(dec).as("t"),
      sum(when(col("mi") > 0, (col("mi") * col("mi")).cast(dec))
        .otherwise(lit(0).cast(dec))).cast(dec).as("sm2"))
    def dd(c: Column): Column = c.cast("double")
    val hhi = dd(col("sm2")) / dd((col("t") * col("t")).cast(dec))
    val kD = dd(col("k_units"))
    val norm = (hhi - lit(1.0) / kD) / (lit(1.0) - lit(1.0) / kD)
    per.select(col("sc"), col("k_units"), col("k_dropped"),
      col("t").cast("long").as("total"),
      when(col("k_units") > 0L, hhi).as("hhi"),
      when(col("k_units") > 1L, norm).as("hhi_norm"))
  }
}
