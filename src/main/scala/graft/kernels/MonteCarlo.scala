package graft.kernels

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X4/X5 seeded Monte Carlo simulation (SURVEY.md §2.9).
  *
  * Reference: monte_carlo_v2_regime.py:20-92 (categorical outcomes, tiered
  * bet sizing, ruin/harvest rules) and monte_carlo_sniper.py:40-108
  * (empirical bootstrap, drawdown tracking), both seeded (seed=42).
  *
  * Spark shape: `spark.range(nPaths)` -> per-row deterministic simulation
  * keyed by (seed, path_id) -> one aggregation pass for percentiles/ruin.
  * Each path is an independent O(trades) loop in a typed map — embarrassing
  * parallelism, no shuffle until the final tiny aggregate.
  */
object MonteCarlo {

  case class PathResult(path_id: Long, final_capital: Double, ruined: Boolean,
      max_drawdown: Double)

  /** Deterministic per-path RNG: java.util.Random seeded by
    * (globalSeed, pathId) — reproducible across partitionings. */
  private def rng(seed: Long, path: Long) = new java.util.Random(seed * 1000003L + path)

  /** Categorical-outcome lifetime simulation (X4 shape): `nTrades` i.i.d.
    * draws from (targetPct, stopPct, timeoutPct) with probabilities
    * (pTarget, pStop, 1-pTarget-pStop); fixed fractional bet sizing with
    * tier ladder; ruin when capital < ruinAt.
    */
  def categorical(
      spark: SparkSession, nPaths: Int, nTrades: Int,
      pTarget: Double, pStop: Double,
      targetPct: Double, stopPct: Double, timeoutPct: Double,
      startCapital: Double = 1000.0, ruinAt: Double = 500.0,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(nPaths).as[Long].map { path =>
      val r = rng(seed, path)
      var cap = startCapital
      var peak = cap
      var maxDd = 0.0
      var ruined = false
      var i = 0
      while (i < nTrades && !ruined) {
        // tiered bet sizing ladder (monte_carlo_v2_regime.py:41-49 shape)
        val bet =
          if (cap < 1500) math.min(500.0, cap)
          else if (cap < 2500) 1000.0
          else if (cap < 4000) 1500.0
          else 2000.0
        val u = r.nextDouble()
        val ret =
          if (u < pTarget) targetPct
          else if (u < pTarget + pStop) stopPct
          else timeoutPct
        cap += bet * ret / 100.0
        peak = math.max(peak, cap)
        maxDd = math.max(maxDd, (peak - cap) / peak)
        if (cap < ruinAt) ruined = true
        i += 1
      }
      PathResult(path, cap, ruined, maxDd)
    }.toDF()
  }

  /** Empirical-bootstrap simulation (X5 shape): per path, trade count ~
    * Poisson(lambda) (inverse-CDF draw), returns resampled from the
    * broadcast `returnsPool`; sizing min(betCap, capital).
    */
  def bootstrap(
      spark: SparkSession, nPaths: Int, lambda: Double,
      returnsPool: Array[Double], betCap: Double = 750.0,
      startCapital: Double = 1000.0, ruinAt: Double = 250.0,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val pool = spark.sparkContext.broadcast(returnsPool)
    spark.range(nPaths).as[Long].map { path =>
      val r = rng(seed, path)
      // Knuth Poisson draw
      val limit = math.exp(-lambda)
      var k = 0; var p = 1.0
      while ({ p *= r.nextDouble(); p > limit }) k += 1
      var cap = startCapital
      var peak = cap
      var maxDd = 0.0
      var ruined = false
      var i = 0
      val rp = pool.value
      while (i < k && !ruined) {
        val bet = math.min(betCap, cap)
        cap += bet * rp(r.nextInt(rp.length)) / 100.0
        peak = math.max(peak, cap)
        maxDd = math.max(maxDd, (peak - cap) / peak)
        if (cap <= ruinAt) ruined = true
        i += 1
      }
      PathResult(path, cap, ruined, maxDd)
    }.toDF()
  }

  /** Summary aggregate: ruin %, mean/median final capital, P90, max DD. */
  def summarize(paths: DataFrame): DataFrame =
    paths.agg(
      round(avg(col("ruined").cast("double")) * 100, 2).as("ruin_pct"),
      round(avg(col("final_capital")), 2).as("mean_capital"),
      round(expr("percentile(final_capital, 0.5)"), 2).as("median_capital"),
      round(expr("percentile(final_capital, 0.9)"), 2).as("p90_capital"),
      round(max(col("max_drawdown")) * 100, 2).as("worst_drawdown_pct"))
}
