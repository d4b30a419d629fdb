package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Portfolio

/** Trade-performance ratios (q409), off-fixture: a hand-computed mixed
  * ledger and the degenerate-guard contracts. */
class PortfolioSpec extends AnyFunSuite with SparkFixture {

  private def run(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Portfolio.tradeStats(rows.toDF("s", "p"), "s", "p")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("tradeStats: hand ledger — win rate, expectancy, profit factor, " +
      "payoff, Kelly, Sharpe, Sortino all match closed forms") {
    val r = run(Seq(("a", 100L), ("a", 300L), ("a", -200L), ("a", 0L),
      ("a", -100L)))("a")
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("n_wins") == 2L &&
      r.getAs[Long]("n_losses") == 2L)
    assert(r.getAs[Double]("win_rate") == 0.4)
    assert(r.getAs[Double]("expectancy_cents") == 20.0)
    assert(math.abs(r.getAs[Double]("profit_factor") - 4.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("payoff") - 4.0 / 3.0) < 1e-12)
    // kelly = W - (1-W)/R = 0.4 - 0.6/(4/3) = -0.05: a negative edge
    // the raw 40% win rate hides — exactly what the ratio board is for
    assert(math.abs(r.getAs[Double]("kelly") + 0.05) < 1e-12)
    // sharpe = s/sqrt(n*q - s^2) = 100/sqrt(5*150000 - 10000)
    assert(math.abs(r.getAs[Double]("sharpe") -
      100.0 / math.sqrt(740000.0)) < 1e-15)
    // sortino = s/sqrt(n*dq) = 100/sqrt(5*50000) = 0.2
    assert(r.getAs[Double]("sortino") == 0.2)
  }

  test("tradeStats: loud nulls — no losses nulls the loss-ratios, " +
      "constant pnl nulls sharpe, all computed per scope independently") {
    val out = run(Seq(("w", 10L), ("w", 20L), ("w", 30L),
      ("c", 5L), ("c", 5L), ("c", 5L),
      ("a", 100L), ("a", -50L)))
    val w = out("w") // all wins
    assert(w.getAs[Double]("win_rate") == 1.0)
    assert(w.isNullAt(w.fieldIndex("profit_factor")))
    assert(w.isNullAt(w.fieldIndex("payoff")))
    assert(w.isNullAt(w.fieldIndex("kelly")))
    assert(w.isNullAt(w.fieldIndex("sortino")))
    assert(!w.isNullAt(w.fieldIndex("sharpe"))) // variance > 0
    val c = out("c") // constant: zero variance
    assert(c.isNullAt(c.fieldIndex("sharpe")))
    val a = out("a") // one win one loss: everything defined
    assert(a.getAs[Double]("profit_factor") == 2.0)
    assert(math.abs(a.getAs[Double]("kelly") - 0.25) < 1e-12)
  }
}
