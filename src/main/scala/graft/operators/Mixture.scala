package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-scaled mixture weighting — the multilingual/multi-source
  * rebalancing step of a pre-training data pipeline (the mT5/XLM-R
  * "sample language l with probability proportional to p_l^alpha" rule):
  * raw corpus shares p_l are flattened with an exponent alpha in (0, 1]
  * so low-resource strata are upsampled without letting any stratum
  * dominate. alpha = 1 keeps natural proportions; alpha -> 0 approaches
  * uniform.
  *
  * Scale shape: one map-side-combined aggregation over the corpus
  * produces the per-stratum census (rows = #strata, tiny); everything
  * after is driver-sized arithmetic on that census, broadcast back if a
  * caller wants to gate the corpus with it. Nothing re-shuffles the
  * corpus itself.
  *
  * Determinism: the normalizer sums the stratum weights in stratum-name
  * order via an in-order fold (not an unordered SQL SUM), so the double
  * is reproducible across engines, partitionings, and reruns; with
  * alpha = 0.5 the power is `sqrt`, which IEEE 754 requires to be
  * correctly rounded — bit-identical everywhere (general alpha uses
  * `pow`, whose last-ulp behavior is libm-specific; callers needing
  * cross-engine hashes should stick to 0.5 or 1.0).
  */
object Mixture {

  /** Per-stratum temperature weights over `sizeCol` mass: returns one row
    * per stratum with its natural share `p`, flattened sampling `weight`,
    * the token allocation out of `budget`, and the up/down-sampling
    * `boost` = weight / p. */
  def temperatureWeights(df: DataFrame, stratumCol: String, sizeCol: String,
      alpha: Double = 0.5, budget: Long = 1000000L): DataFrame =
    weighted(df, stratumCol, sizeCol, alpha, lit(budget.toDouble))

  /** [[temperatureWeights]] with the budget expressed as a RATIONAL
    * fraction num/den of the corpus's own total mass (budget =
    * (total * num) div den, exact integer arithmetic) — fully in-plan,
    * so no driver-side pre-aggregation is needed to size the budget. */
  def temperatureWeightsFraction(df: DataFrame, stratumCol: String,
      sizeCol: String, alpha: Double, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0, s"fraction must be positive, got $num/$den")
    weighted(df, stratumCol, sizeCol, alpha,
      expr(s"(tot * $num) div $den").cast("double"))
  }

  private def weighted(df: DataFrame, stratumCol: String, sizeCol: String,
      alpha: Double, budgetCol: Column): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val census = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(sizeCol)).cast("long").as("mass"))
    val tot = census.agg(sum(col("mass")).cast("long").as("tot"))
    def weigh(p: Column): Column =
      if (alpha == 1.0) p
      else if (alpha == 0.5) sqrt(p)
      else pow(p, alpha)
    val shares = census.crossJoin(broadcast(tot))
      .withColumn("p", col("mass").cast("double") / col("tot").cast("double"))
      .withColumn("w_raw", weigh(col("p")))
    // normalizer: in-order fold over strata sorted by name (reproducible
    // double; an unordered SUM would be partitioning-dependent)
    val norm = shares
      .agg(expr(s"""aggregate(
        |  transform(array_sort(collect_list(struct(`$stratumCol`, w_raw))), s -> s.w_raw),
        |  cast(0.0 as double), (a, x) -> a + x)""".stripMargin).as("norm"))
    shares.crossJoin(broadcast(norm))
      .withColumn("weight", col("w_raw") / col("norm"))
      .select(col(stratumCol), col("n_rows"), col("mass"),
        round(col("p"), 4).as("p"),
        round(col("weight"), 4).as("weight"),
        round(budgetCol * col("weight"), 0).cast("long").as("alloc"),
        round(col("weight") / col("p"), 4).as("boost"))
  }

  /** Water-filling budget allocation with per-source caps — "give every
    * source an equal share of the token budget, but never more than it
    * HAS": the max-min fair split (level L with Σ min(avail_h, L) = B)
    * a mixture plan needs when [[temperatureWeights]]' proportional
    * allocations exceed small sources' inventory. Small sources take
    * everything they have; the budget left over levels across the rest.
    *
    * Exact integer closed form, no iteration: over sources sorted by
    * (avail, source) with prefix sums P_i, the BASE is the largest
    * prefix whose members fit below the level (P_i + avail_i·(n−i) ≤
    * B); the level L = (B − P_base) div (n − base) tops up everyone
    * above it, and the remainder distributes +1 seats in (avail,
    * source) order — every +1 lands on a source with avail ≥ L+1, so
    * caps are never violated and Σ alloc = min(B, Σ avail) EXACTLY.
    * All window work is strata-bounded (the [[graft.operators.Splits
    * .neymanAllocation]] contract). Output: (source, avail, alloc,
    * at_capacity). */
  def waterFill(df: DataFrame, sourceCol: String, availCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val a = col(availCol).cast("long")
    val wOrd = Window.orderBy(a, col(sourceCol))
    val wAll = Window.partitionBy()
    val ranked = df.select(col(sourceCol), a.as("avail"))
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("pfx", sum(col("avail")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("avail")).over(wAll))
    // fits(i): everyone at or below i takes full avail, the n−i above
    // level at avail_i or higher — feasible iff pfx_i + avail_i·(n−i) ≤ B
    val fits = col("pfx") + col("avail") * (col("n") - col("i")) <= budget
    val cut = ranked
      .agg(max(when(fits, struct(col("i"), col("pfx")))).as("c"))
      .select(coalesce(col("c.i"), lit(0L)).as("base"),
        coalesce(col("c.pfx"), lit(0L)).as("pbase"))
    // level + remainder over the n−base sources above the base; if the
    // whole corpus fits the budget, everyone is at capacity
    val level = ranked.crossJoin(broadcast(cut))
      .withColumn("m", col("n") - col("base"))
      .withColumn("lvl", when(col("m") > 0,
        expr(s"(CAST($budget AS BIGINT) - pbase) div m")))
      .withColumn("rem", when(col("m") > 0,
        expr(s"(CAST($budget AS BIGINT) - pbase) % m")))
    level.select(col(sourceCol), col("avail"),
        when(col("tot") <= budget, col("avail"))
          .when(col("i") <= col("base"), col("avail"))
          .otherwise(least(col("avail"),
            col("lvl") + when(col("i") - col("base") <= col("rem"), 1L)
              .otherwise(0L)))
          .as("alloc"))
      .withColumn("at_capacity", col("alloc") === col("avail"))
  }

  /** Seeded negative-sampling table — the word2vec/node2vec noise draw
    * (Mikolov 2013): k tokens sampled ∝ a SMOOTHED unigram frequency,
    * so head tokens stop dominating the contrastive loss. Smoothing is
    * √f rather than word2vec's f^0.75: ⌊√f⌋ is an exact integer on
    * every engine (IEEE sqrt is correctly rounded), so the cumulative
    * weights, the total, and every draw are integer arithmetic —
    * bit-replayable — where a pow(f, 0.75) weight would leak
    * engine-ulp differences into draw boundaries. (The exponent is a
    * damping convention, not a law; 0.5 damps slightly harder.)
    *
    * Draw j targets rank r_j = md5(seed:j) % T + 1 over the cumulative
    * weight axis in TOKEN ORDER, and the owning token is found by
    * MERGING draws into the cumulative census and taking the forward
    * min (the [[Normalize.quantileNormalize]] merged-window move — no
    * non-equi join, no per-draw scan).
    *
    * Scale shape: one token census, one vocab-scale cumulative window,
    * k draw rows, one merged vocab+k window. The cumulative window is
    * a single ordered pass over the VOCAB (not the corpus) — the
    * [[graft.operators.Profile.zipfSlope]] census-scale discipline.
    * Output: (draw, tok), k rows. */
  def negativeSampleTable(df: DataFrame, tokenCol: String, k: Int,
      seed: String): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")
    val census = df.where(col(tokenCol).isNotNull)
      .groupBy(col(tokenCol).as("tok")).agg(count(lit(1)).as("f"))
    val w = census.select(col("tok"),
      floor(sqrt(col("f").cast("double"))).cast("long").as("w"))
    val wCum = Window.orderBy(col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wc = w.select(col("tok"), sum(col("w")).over(wCum).as("cum"))
    val tot = w.agg(sum(col("w")).as("t"))
    val spark = df.sparkSession
    val draws = spark.range(k.toLong).select(col("id").as("j"))
      .crossJoin(broadcast(tot))
      .select(col("j"),
        (conv(substring(md5(concat(lit(seed), lit(":"),
          col("j").cast("string"))), 1, 12), 16, 10).cast("long")
          % col("t") + 1L).as("r"))
    val merged = draws.select(col("r").as("key"), lit(0).as("tag"),
        col("j"), lit(null).cast("string").as("tok"))
      .unionByName(wc.select(col("cum").as("key"), lit(1).as("tag"),
        lit(null).cast("long").as("j"), col("tok")))
    // cum rises with tok (the ordering), so the owning token is the min
    // tok among cum >= r — computed as a RUNNING min over the
    // key-DESCENDING traversal (census rows sort before draws on tied
    // keys via tag desc, keeping ties inclusive; a forward-unbounded
    // frame would be O(rows²) in Spark's WindowExec)
    val wm = Window.orderBy(col("key").desc, col("tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged.select(col("j"), col("tag"), min(col("tok")).over(wm).as("tok"))
      .where(col("tag") === 0)
      .select(col("j").as("draw"), col("tok"))
  }
}
