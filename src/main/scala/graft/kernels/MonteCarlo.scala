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

  // --- Cross-engine replayable RNG (L'Ecuyer 1988 combined LCG) -----------
  // Unlike java.util.Random / numpy MT19937, this stream is plain 31-bit
  // modular arithmetic a SQL engine replays bit-exactly with BIGINT ops
  // (the q64 oracle regenerates the identical uniforms in a DuckDB
  // recursive CTE — no 64-bit wrap-around needed, every product fits a
  // signed 64-bit integer). Two multiplicative generators mod the primes
  // 2147483563 / 2147483399 with multipliers 40014 / 40692, combined by
  // subtraction: period ~2.3e18, the classic "Efficient and Portable
  // Combined Random Number Generators" construction. |s1 - s2| is always
  // below 2147483562 so the canonical `mod` is a no-op; only the <1 wrap
  // remains, and u = z / 2147483563 is a single correctly-rounded IEEE
  // division on both engines.
  private[graft] final val ClcgP1 = 2147483563L
  private[graft] final val ClcgP2 = 2147483399L
  private[graft] final val ClcgA1 = 40014L
  private[graft] final val ClcgA2 = 40692L

  /** Mutable CLCG stream state; per-path seeds are scattered affinely into
    * the two component cycles (any distinct non-zero states give streams at
    * unrelated cycle offsets). `seed` must be a small non-negative constant
    * (the SQL replay uses the same plain `%`, which is sign-truncating). */
  private[graft] final class Clcg(seed: Long, path: Long) {
    private var s1 = 1L + (seed * 1000003L + path * 7919L) % (ClcgP1 - 1L)
    private var s2 = 1L + (seed * 31L + path * 104729L) % (ClcgP2 - 1L)
    def nextDouble(): Double = {
      s1 = (ClcgA1 * s1) % ClcgP1
      s2 = (ClcgA2 * s2) % ClcgP2
      var z = s1 - s2
      if (z < 1L) z += ClcgP1 - 1L
      z.toDouble / ClcgP1.toDouble
    }
  }

  /** Categorical-outcome lifetime simulation (X4,
    * monte_carlo_v2_regime.py:20-92): `months` x `tradesPerMonth` i.i.d.
    * draws from (targetFrac, stopFrac, timeoutFrac) with probabilities
    * (pTarget, pStop, 1-pTarget-pStop). Reference-exact structure:
    *  - the bet-size tier (<1500 -> 500, <2500 -> 1000, <4000 -> 1500,
    *    else 2000) is fixed at the START of each month (":41-49");
    *  - per trade: bet clamps down to remaining capital (and STAYS clamped
    *    for the rest of the month — the reference mutates bet_size), ruin
    *    checked BEFORE the draw (capital < ruinAt -> stop, record 0);
    *  - harvest rule (":68-70"): after month >= harvestFromMonth, capital
    *    > harvestAbove withdraws harvestAmount.
    * Ruined lifetimes report final_capital = 0 (reference
    * `results.append(0)`), so the summary percentiles match.
    */
  def categorical(
      spark: SparkSession, nPaths: Int, months: Int, tradesPerMonth: Int,
      pTarget: Double, pStop: Double,
      targetFrac: Double, stopFrac: Double, timeoutFrac: Double,
      startCapital: Double = 2500.0, ruinAt: Double = 500.0,
      harvestFromMonth: Int = 4, harvestAbove: Double = 5000.0,
      harvestAmount: Double = 2000.0, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(nPaths).as[Long].map { path =>
      val r = new Clcg(seed, path)
      var cap = startCapital
      var peak = cap
      var maxDd = 0.0
      var ruined = false
      var month = 1
      while (month <= months && !ruined) {
        // tier decided once per month from month-start capital (":41-49")
        var bet =
          if (cap < 1500) 500.0
          else if (cap < 2500) 1000.0
          else if (cap < 4000) 1500.0
          else 2000.0
        var i = 0
        while (i < tradesPerMonth && !ruined) {
          if (cap <= bet) bet = cap // can't bet more than we have (":55-56")
          if (cap < ruinAt) ruined = true
          else {
            // one draw per executed trade; pre-ruin that is one per trade
            // slot, which is what the SQL replay's per-step advance assumes
            // (post-ruin the state is never read, so divergence is moot)
            val u = r.nextDouble()
            val ret =
              if (u < pTarget) targetFrac
              else if (u < pTarget + pStop) stopFrac
              else timeoutFrac
            cap += bet * ret
            peak = math.max(peak, cap)
            maxDd = math.max(maxDd, (peak - cap) / peak)
          }
          i += 1
        }
        if (!ruined && month >= harvestFromMonth && cap > harvestAbove)
          cap -= harvestAmount // harvest withdrawal (":68-70")
        month += 1
      }
      PathResult(path, if (ruined) 0.0 else cap, ruined, maxDd)
    }.toDF()
  }

  /** Empirical-bootstrap simulation (X5, monte_carlo_sniper.py:40-108):
    * per path, trade count ~ Poisson(lambda) (Knuth draw), returns
    * resampled from the broadcast `returnsPool` (percent units); sizing
    * min(betCap, capital). Reference-exact stopping: trading continues
    * until capital <= 0 (":61-62"); `ruined` is the POST-HOC "severe
    * depletion" census (ending capital <= ruinAt, ":105-106"), not a
    * stop condition — a path can dip below and recover.
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
      var i = 0
      val rp = pool.value
      while (i < k && cap > 0) {
        val bet = math.min(betCap, cap)
        cap += bet * rp(r.nextInt(rp.length)) / 100.0
        peak = math.max(peak, cap)
        maxDd = math.max(maxDd, (peak - cap) / peak)
        i += 1
      }
      PathResult(path, cap, cap <= ruinAt, maxDd)
    }.toDF()
  }

  /** [[bootstrap]] on the cross-engine-replayable CLCG stream (the q64
    * X4 precedent): identical Poisson-Knuth / resample / min(betCap, cap)
    * sizing / cap>0 stopping / post-hoc ruin semantics, but every draw is
    * 31-bit modular arithmetic a SQL engine replays bit-exactly —
    * `nextInt(n)` becomes `floor(u * n)` (exact for these n << 2^26).
    * One uniform per Poisson step and one per trade step, so the replay
    * is a flat per-step recursive CTE with no draw-count bookkeeping.
    * `limitOverride` exists for the oracle seam: Math.exp is not
    * correctly-rounded, so the replay embeds the JVM-computed
    * exp(-lambda) as a shortest-repr literal instead of calling the
    * other engine's exp. */
  def bootstrapClcg(
      spark: SparkSession, nPaths: Int, lambda: Double,
      returnsPool: Array[Double], betCap: Double = 750.0,
      startCapital: Double = 1000.0, ruinAt: Double = 250.0,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val pool = spark.sparkContext.broadcast(returnsPool)
    val limit = math.exp(-lambda)
    spark.range(nPaths).as[Long].map { path =>
      val r = new Clcg(seed, path)
      var k = 0; var p = 1.0
      while ({ p *= r.nextDouble(); p > limit }) k += 1
      var cap = startCapital
      var peak = cap
      var maxDd = 0.0
      var i = 0
      val rp = pool.value
      while (i < k && cap > 0) {
        val bet = math.min(betCap, cap)
        val idx = (r.nextDouble() * rp.length).toInt
        cap += bet * rp(idx) / 100.0
        peak = math.max(peak, cap)
        maxDd = math.max(maxDd, (peak - cap) / peak)
        i += 1
      }
      PathResult(path, cap, cap <= ruinAt, maxDd)
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
