package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trade-performance ratios over an integer-cents P&L ledger — the
  * summary board the reference's research scripts read off every sweep
  * cohort (win rate and expectancy per configuration:
  * `backtesting_and_research/monte_carlo_expectancy.py:29-40` computes
  * exactly the win-rate/expectancy/profit read this generalizes;
  * `win-tracker/main.py` tallies per-day win rates for the ledger).
  * Beyond the reference's raw win rate this adds the standard ratio
  * family a research desk actually ranks cohorts by: profit factor,
  * payoff, Kelly fraction, population Sharpe, and Sortino.
  *
  * Exactness: all moments are exact decimal sums of integer cents. The
  * ratios are pinned single-division shapes; Sharpe and Sortino
  * algebraically cancel the 1/n's so each is ONE division of exact
  * decimals with ONE pinned sqrt:
  *   sharpe  = Σp / √(n·Σp² − (Σp)²)            (population σ),
  *   sortino = Σp / √(n·Σ min(p,0)²).
  * Kelly uses the discrete-outcome closed form f* = W − (1−W)/R with
  * R the payoff ratio (meanWin/meanLoss) — exactly the two-outcome
  * model of the reference's target/stop bracket.
  *
  * Scale shape: one (scope) census aggregation over the ledger; every
  * output is derived from the eight broadcast-size moments. Nulls are
  * loud: profit_factor/payoff/kelly null when there is no losing trade
  * (a division by zero is a report bug, not +inf), sharpe null when
  * variance is 0, sortino null when no trade lost. Output one row per
  * scope: (scope, n, n_wins, n_losses, win_rate, expectancy_cents,
  * profit_factor, payoff, kelly, sharpe, sortino). */
object Portfolio {

  /** The nine exact sufficient moments [[tradeStatsFromCensus]] reads —
    * a pure aggregation, so the SAME function is the batch census stage
    * AND the streaming twin's state (see `Streams.tradeCensusStream`):
    * per scope (n, n_wins, n_losses, Σp, Σp², Σp⁺, Σ|p⁻|, Σ(p⁻)²) —
    * fixed-size per scope however long the ledger runs. */
  def tradeCensus(df: DataFrame, scopeCol: String,
      pnlCentsCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val p = col(pnlCentsCol).cast("long")
    val base = df.where(p.isNotNull)
      .select(col(scopeCol).as("scope"), p.as("p"))
    def d(c: Column): Column = c.cast(dec)
    base.groupBy(col("scope")).agg(
      count(lit(1)).as("n"),
      sum(when(col("p") > 0L, 1L).otherwise(0L)).as("n_wins"),
      sum(when(col("p") < 0L, 1L).otherwise(0L)).as("n_losses"),
      sum(d(col("p"))).cast(dec).as("s"),
      sum((d(col("p")) * d(col("p"))).cast(dec)).cast(dec).as("q"),
      sum(when(col("p") > 0L, d(col("p"))).otherwise(d(lit(0L))))
        .cast(dec).as("gw"),
      sum(when(col("p") < 0L, d(-col("p"))).otherwise(d(lit(0L))))
        .cast(dec).as("gl"),
      sum(when(col("p") < 0L, (d(col("p")) * d(col("p"))).cast(dec))
        .otherwise(d(lit(0L)))).cast(dec).as("dq"))
  }

  def tradeStats(df: DataFrame, scopeCol: String,
      pnlCentsCol: String): DataFrame =
    tradeStatsFromCensus(tradeCensus(df, scopeCol, pnlCentsCol))

  /** The ratio board off a [[tradeCensus]] frame (batch or streamed):
    * because the census is exact integer arithmetic, any streamed
    * prefix yields the identical board the batch operator computes on
    * the same rows (prefix-parity spec-asserted). */
  def tradeStatsFromCensus(agg: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    def d(c: Column): Column = c.cast(dec)
    def dd(c: Column): Column = c.cast("double")
    val winRate = dd(col("n_wins")) / dd(col("n"))
    val payoff = (dd(col("gw")) / dd(col("n_wins"))) /
      (dd(col("gl")) / dd(col("n_losses")))
    val varN = (d(col("n")) * col("q") - col("s") * col("s")).cast(dec)
    val dqN = (d(col("n")) * col("dq")).cast(dec)
    agg.select(col("scope"), col("n"), col("n_wins"), col("n_losses"),
      winRate.as("win_rate"),
      (dd(col("s")) / dd(col("n"))).as("expectancy_cents"),
      when(col("gl") > 0, dd(col("gw")) / dd(col("gl")))
        .as("profit_factor"),
      when(col("n_wins") > 0L && col("n_losses") > 0L && col("gl") > 0,
        payoff).as("payoff"),
      when(col("n_wins") > 0L && col("n_losses") > 0L && col("gl") > 0,
        winRate - (lit(1.0) - winRate) / payoff).as("kelly"),
      when(dd(varN) > 0.0, dd(col("s")) / sqrt(dd(varN))).as("sharpe"),
      when(col("n_losses") > 0L, dd(col("s")) / sqrt(dd(dqN)))
        .as("sortino"))
  }
}
