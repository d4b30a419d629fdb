package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.MonteCarlo

/** X4/X5 Monte Carlo: seeded determinism (reference precedent seed=42,
  * monte_carlo_sniper.py:52) and sanity of the summary aggregate. */
class MonteCarloSpec extends AnyFunSuite with SparkFixture {

  test("categorical simulation is deterministic for a fixed seed (X4)") {
    val a = MonteCarlo.categorical(spark, 500, 50, 0.4, 0.3, 40.0, -25.0, -5.0)
      .collect().map(_.getDouble(1)).sorted.toSeq
    val b = MonteCarlo.categorical(spark, 500, 50, 0.4, 0.3, 40.0, -25.0, -5.0)
      .collect().map(_.getDouble(1)).sorted.toSeq
    assert(a == b)
  }

  test("all-stop parameters drive ruin (X4 sanity)") {
    val paths = MonteCarlo.categorical(spark, 200, 100, 0.0, 1.0, 40.0, -50.0, 0.0)
    val ruined = paths.where("ruined").count()
    assert(ruined == 200L)
  }

  test("bootstrap draws from the empirical pool deterministically (X5)") {
    val pool = Array(40.0, -25.0, -5.0, 12.0)
    val a = MonteCarlo.bootstrap(spark, 300, 9.0, pool).collect()
      .map(_.getDouble(1)).sorted.toSeq
    val b = MonteCarlo.bootstrap(spark, 300, 9.0, pool).collect()
      .map(_.getDouble(1)).sorted.toSeq
    assert(a == b)
  }

  test("summarize emits ruin pct / percentiles / worst drawdown") {
    val s = MonteCarlo.summarize(
      MonteCarlo.categorical(spark, 200, 30, 0.5, 0.3, 40.0, -25.0, -5.0)).collect()(0)
    assert(s.schema.fieldNames.toSeq == Seq(
      "ruin_pct", "mean_capital", "median_capital", "p90_capital", "worst_drawdown_pct"))
    assert(s.getDouble(0) >= 0.0 && s.getDouble(0) <= 100.0)
    assert(s.getDouble(3) >= s.getDouble(2)) // p90 >= median
  }
}
