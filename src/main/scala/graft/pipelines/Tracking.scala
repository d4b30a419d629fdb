package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Win-tracker + backfill pipeline: future-window join over daily bars
  * (J6/J7), direction-conditional peak return (W11), the two coexisting
  * tier ladders (classify_win strong>=5/solid>=3/directional>=1 at
  * win-tracker/main.py:91-111 vs backfill home_run>=5/strong>=3/
  * directional>=1/flat>=0 at backfill_performance.py:93-105 — preserved
  * separately per SURVEY §7.4.6), and the MERGE write-back (J3).
  */
object Tracking {

  val TierDirectional = 1.0
  val TierSolid = 3.0
  val TierStrong = 5.0
  val MaxTradingDays = 3

  /** classify_win ladder (win-tracker/main.py:91-111): favorable peak is
    * sign-flipped for bears BEFORE the ladder. */
  def classifyWin(peakReturnPct: Column, direction: Column): Column = {
    val fav = when(direction === "BULLISH", peakReturnPct).otherwise(-peakReturnPct)
    when(fav >= TierStrong, "strong")
      .when(fav >= TierSolid, "solid")
      .when(fav >= TierDirectional, "directional")
      .when(fav >= 0, "no_decision")
      .otherwise("loss")
  }

  /** Backfill outcome ladder (backfill_performance.py:93-105): peak is
    * already favorable-signed here. */
  def outcomeTier(peak: Column): Column =
    when(peak >= 5.0, "home_run").when(peak >= 3.0, "strong")
      .when(peak >= 1.0, "directional").when(peak >= 0.0, "flat")
      .otherwise("wrong")

  /** J6/J7 + W11: first `n` trading days of bars strictly after scan_date
    * per signal, with per-day pct columns anchored at signal price
    * (win-tracker/main.py:140-164). Signals need (ticker, scan_date,
    * direction, signal_price). */
  def futureReturns(signals: DataFrame, dailyBars: DataFrame, n: Int = MaxTradingDays): DataFrame = {
    val sig = signals.select(col("ticker"), col("scan_date"), col("direction"),
      col("signal_price"))
    val joined = Joins.futureWindow(sig, dailyBars, Seq("ticker"),
      "scan_date", "date", n)
    joined
      .withColumn("pct_change", round((col("close") - col("signal_price")) / col("signal_price") * 100, 2))
      .withColumn("high_pct", round((col("high") - col("signal_price")) / col("signal_price") * 100, 2))
      .withColumn("low_pct", round((col("low") - col("signal_price")) / col("signal_price") * 100, 2))
  }

  /** signal_performance rows (win-tracker/main.py:140-193): peak favorable
    * return over the tracked window + tier + is_win. When a trading
    * calendar is supplied, `trading_days_elapsed` counts SESSIONS between
    * scan_date and check_date (the reference's NYSE-calendar day count,
    * :58-88 / W15) and drives `is_final`; otherwise tracked-day count is
    * used (equivalent once 3 sessions of bars exist). */
  def performance(signals: DataFrame, dailyBars: DataFrame, checkDate: Column,
      calendar: Option[DataFrame] = None): DataFrame = {
    val rets = futureReturns(signals, dailyBars)
    val base = rets.groupBy(col("ticker"), col("scan_date"), col("direction"))
      .agg(
        round(when(first(col("direction")) === "BULLISH", max(col("high_pct")))
          .otherwise(min(col("low_pct"))), 2).as("peak_return"),
        max_by(col("pct_change"), col("_rank")).as("pct_change"),
        max_by(col("close"), col("_rank")).as("current_price"),
        first(col("signal_price")).as("signal_price"),
        count(lit(1)).cast("int").as("trading_days_tracked"))
      .withColumn("check_date", checkDate)
      .withColumn("tier", classifyWin(col("peak_return"), col("direction")))
      .withColumn("is_win", col("tier").isin("strong", "solid", "directional"))
    val withElapsed = calendar match {
      case Some(cal) =>
        val seqs = cal.select(col("date"), col("session_seq"))
        base
          .join(broadcast(seqs.withColumnRenamed("date", "scan_date")
            .withColumnRenamed("session_seq", "_scan_seq")), Seq("scan_date"), "left")
          .join(broadcast(seqs.withColumnRenamed("date", "check_date")
            .withColumnRenamed("session_seq", "_check_seq")), Seq("check_date"), "left")
          .withColumn("trading_days_elapsed",
            (col("_check_seq") - col("_scan_seq")).cast("int"))
          .drop("_scan_seq", "_check_seq")
      case None =>
        base.withColumn("trading_days_elapsed", col("trading_days_tracked"))
    }
    withElapsed.withColumn("is_final", col("trading_days_elapsed") >= MaxTradingDays)
  }

  /** Backfill performance columns (backfill_performance.py:70-120):
    * day-1/2/3 closes + pcts, favorable peak over the 3-day window,
    * outcome tier, is_win = peak >= 1. Requires exactly 3 future days. */
  def backfill(signals: DataFrame, dailyBars: DataFrame): DataFrame = {
    val rets = futureReturns(signals, dailyBars)
    val agg = rets.groupBy(col("ticker"), col("scan_date"))
      .agg(
        first(col("direction")).as("direction"),
        first(col("signal_price")).as("signal_price"),
        count(lit(1)).as("n_days"),
        max_by(col("close"), when(col("_rank") === 1, 1).otherwise(0)).as("_t1c"),
        max_by(col("close"), when(col("_rank") === 2, 1).otherwise(0)).as("_t2c"),
        max_by(col("close"), when(col("_rank") === 3, 1).otherwise(0)).as("_t3c"),
        max(col("high")).as("_maxh"), min(col("low")).as("_minl"))
      .where(col("n_days") >= 3)
    val px = col("signal_price")
    agg
      .withColumn("next_day_close", col("_t1c"))
      .withColumn("next_day_pct", (col("_t1c") - px) / px * 100)
      .withColumn("day2_close", col("_t2c"))
      .withColumn("day2_pct", (col("_t2c") - px) / px * 100)
      .withColumn("day3_close", col("_t3c"))
      .withColumn("day3_pct", (col("_t3c") - px) / px * 100)
      .withColumn("peak_return_3d",
        when(col("direction") === "BULLISH", (col("_maxh") - px) / px * 100)
          .otherwise((px - col("_minl")) / px * 100))
      .withColumn("outcome_tier", outcomeTier(col("peak_return_3d")))
      .withColumn("is_win", col("peak_return_3d") >= 1.0)
      .drop("_t1c", "_t2c", "_t3c", "_maxh", "_minl")
  }

  /** J3 MERGE write-back: update performance columns on the enriched table
    * (win-tracker/main.py:577-634 staging + MERGE WHEN MATCHED UPDATE). */
  def mergePerformance(enriched: DataFrame, updates: DataFrame,
      updateCols: Seq[String]): DataFrame =
    Joins.mergeUpdate(enriched, updates, Seq("ticker", "scan_date"), updateCols)
}
