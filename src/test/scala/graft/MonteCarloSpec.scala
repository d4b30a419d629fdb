package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.MonteCarlo

/** X4/X5 Monte Carlo: seeded determinism (reference precedent seed=42,
  * monte_carlo_sniper.py:52), reference lifetime structure (months x
  * trades/month, monthly bet tier, harvest rule,
  * monte_carlo_v2_regime.py:20-92), and sanity of the summary aggregate. */
class MonteCarloSpec extends AnyFunSuite with SparkFixture {

  test("categorical simulation is deterministic for a fixed seed (X4)") {
    val a = MonteCarlo.categorical(spark, 500, 12, 9, 0.4, 0.3, 0.40, -0.25, -0.05)
      .collect().map(_.getDouble(1)).sorted.toSeq
    val b = MonteCarlo.categorical(spark, 500, 12, 9, 0.4, 0.3, 0.40, -0.25, -0.05)
      .collect().map(_.getDouble(1)).sorted.toSeq
    assert(a == b)
  }

  test("all-stop parameters drive ruin; ruined lifetimes report 0 (X4 sanity)") {
    val paths = MonteCarlo.categorical(spark, 200, 12, 9, 0.0, 1.0, 0.40, -0.50, 0.0)
    assert(paths.where("ruined").count() == 200L)
    assert(paths.where("final_capital = 0.0").count() == 200L)
  }

  test("all-win lifetime reproduces the hand-computed harvest path (X4 structure)") {
    // pTarget=1: fully deterministic. Month tiers/harvests by hand:
    // m1: start 2500 -> tier 1500, 9 x +600 = 7900
    // m2, m3: tier 2000, +7200 each -> 15100, 22300 (no harvest before m4)
    // m4: +7200 = 29500, harvest -2000 -> 27500
    // m5-m12: +7200 - 2000 = +5200 each -> 27500 + 8*5200 = 69100
    val cap = MonteCarlo.categorical(spark, 1, 12, 9, 1.0, 0.0, 0.40, -0.25, 0.0)
      .collect()(0).getDouble(1)
    assert(cap == 69100.0)
  }

  test("harvest rule only fires from month 4 and above the threshold (X4)") {
    // 3 months, always-win: no harvest window ever opens
    val cap3 = MonteCarlo.categorical(spark, 1, 3, 9, 1.0, 0.0, 0.40, -0.25, 0.0)
      .collect()(0).getDouble(1)
    assert(cap3 == 22300.0) // 2500 + 5400 + 7200 + 7200, untouched
  }

  test("bootstrap draws from the empirical pool deterministically (X5)") {
    val pool = Array(40.0, -25.0, -5.0, 12.0)
    val a = MonteCarlo.bootstrap(spark, 300, 9.0, pool).collect()
      .map(_.getDouble(1)).sorted.toSeq
    val b = MonteCarlo.bootstrap(spark, 300, 9.0, pool).collect()
      .map(_.getDouble(1)).sorted.toSeq
    assert(a == b)
  }

  test("bootstrapClcg is deterministic and keeps the X5 semantics") {
    val pool = Array(40.0, -25.0, -5.0, 12.0)
    val a = MonteCarlo.bootstrapClcg(spark, 300, 6.0, pool).collect()
      .map(_.getDouble(1)).sorted.toSeq
    val b = MonteCarlo.bootstrapClcg(spark, 300, 6.0, pool).collect()
      .map(_.getDouble(1)).sorted.toSeq
    assert(a == b)
    // post-hoc ruin census, same as the java.util.Random variant
    val lossy = MonteCarlo.bootstrapClcg(spark, 100, 20.0, Array(-50.0)).collect()
    assert(lossy.forall(_.getBoolean(2)))
    assert(lossy.forall(_.getDouble(1) > 0.0))
  }

  test("q275 oracle step bound: every seeded path fits 160 CTE steps") {
    // the recursive-CTE replay runs a FIXED 160 steps; a path consumes
    // (k+1) poisson uniforms + at most k trade uniforms, so the bound is
    // max(2k+1) over the exact seeded draws — replayed here with the
    // same CLCG streams as bootstrapClcg(seed=42, lambda=6, 10000 paths)
    val limit = math.exp(-6.0)
    var worst = 0
    var path = 0L
    while (path < 10000L) {
      val r = new MonteCarlo.Clcg(42L, path)
      var k = 0; var p = 1.0
      while ({ p *= r.nextDouble(); p > limit }) k += 1
      worst = math.max(worst, 2 * k + 1)
      path += 1
    }
    assert(worst <= 160, s"max steps $worst exceeds the oracle's 160")
  }

  test("bootstrap ruin is a post-hoc census, not a stop condition (X5 :61,:105)") {
    // all-loss pool: capital decays but trading continues below the ruin
    // line (min(bet, cap) keeps cap > 0), so every path ends ruined with a
    // POSITIVE ending capital — the reference's 'severe depletion' rule
    val paths = MonteCarlo.bootstrap(spark, 100, 20.0, Array(-50.0)).collect()
    assert(paths.forall(_.getBoolean(2))) // all <= 250 at the end
    assert(paths.forall(_.getDouble(1) > 0.0)) // but none stopped at 250
  }

  test("summarize emits ruin pct / percentiles / worst drawdown") {
    val s = MonteCarlo.summarize(
      MonteCarlo.categorical(spark, 200, 12, 9, 0.5, 0.3, 0.40, -0.25, -0.05)).collect()(0)
    assert(s.schema.fieldNames.toSeq == Seq(
      "ruin_pct", "mean_capital", "median_capital", "p90_capital", "worst_drawdown_pct"))
    assert(s.getDouble(0) >= 0.0 && s.getDouble(0) <= 100.0)
    assert(s.getDouble(3) >= s.getDouble(2)) // p90 >= median
  }

  test("q64 reference-parameter goldens (10k lifetimes, seed 42)") {
    val s = MonteCarlo.summarize(
      MonteCarlo.categorical(spark, 10000, 12, 9, 0.556, 0.222, 0.40, -0.25, 0.0))
      .collect()(0)
    // Recorded goldens — fully deterministic; any change to the lifetime
    // structure (tier timing, clamp persistence, harvest, ruin-before-draw)
    // shifts these.
    assert(s.getDouble(0) == GOLDEN_RUIN_PCT)
    assert(s.getDouble(2) == GOLDEN_MEDIAN)
  }

  private val GOLDEN_RUIN_PCT = 0.02
  private val GOLDEN_MEDIAN = 19450.0

  test("CLCG stream matches the published L'Ecuyer construction (X4 oracle parity)") {
    // First uniforms of stream (seed=42, path=0): s1_0 = 1 + 42000126 %
    // 2147483562, s2_0 = 1 + 1302 % 2147483398; one step of each MCG and
    // the combine. Hand-computed with exact integer arithmetic — these pin
    // the exact stream the DuckDB recursive-CTE oracle replays; any drift
    // in constants/seeding breaks q64's cross-engine hash.
    var s1 = 1L + 42000126L % 2147483562L
    var s2 = 1L + 1302L % 2147483398L
    assert(s1 == 42000127L && s2 == 1303L)
    s1 = 40014L * s1 % 2147483563L
    s2 = 40692L * s2 % 2147483399L
    var z = s1 - s2
    if (z < 1) z += 2147483562L
    val expected = z.toDouble / 2147483563.0
    // the kernel draws the same first uniform: reproduce via a 1-trade run:
    // cap' = 2500 + 1500*ret, ret in {0.40, -0.25, 0.0} by u's bucket
    val cap = MonteCarlo.categorical(spark, 1, 1, 1, 0.556, 0.222, 0.40, -0.25, 0.0)
      .collect()(0).getDouble(1)
    val ret = if (expected < 0.556) 0.40 else if (expected < 0.778) -0.25 else 0.0
    assert(cap == 2500.0 + 1500.0 * ret)
  }
}
