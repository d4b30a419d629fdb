package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ta.TA

/** §3.2 enrichment pipeline: per-ticker technicals from a daily-bars table
  * (replacing the reference's per-ticker REST + pandas loop,
  * enrichment-trigger/main.py:302-451) joined to signals and the news
  * fixture (J2), then risk (F19), risk/reward (F20) and premium flags
  * (F17). One shuffle on ticker for the technicals, broadcast-friendly
  * joins after (signals per day are thousands of rows; bars are the big
  * side and never leave their partitioning).
  */
object Enrich {

  /** Latest-row technicals per ticker (W1-W9). Tickers with < 20 bars are
    * dropped (enrichment-trigger/main.py:320-322). Indicator definitions:
    * Wilder RSI/ATR, ewm(adjust=false) EMA/MACD, sample-stddev Bollinger —
    * the pandas_ta defaults the reference relies on (:335-342).
    */
  def technicals(dailyBars: DataFrame): DataFrame = {
    val grouped = dailyBars
      .groupBy(col("ticker"))
      .agg(sort_array(collect_list(struct(
        col("date"), col("open"), col("high"), col("low"),
        col("close"), col("volume")))).as("h"))
      .where(size(col("h")) >= 20)
    val cs = expr("transform(h, x -> x.close)")
    val hs = expr("transform(h, x -> x.high)")
    val ls = expr("transform(h, x -> x.low)")
    val vs = expr("transform(h, x -> x.volume)")
    val m = size(col("h"))
    def lastN(arr: Column, n: Int): Column = slice(arr, greatest(m - (n - 1), lit(1)), lit(n))
    def meanOf(arr: Column): Column =
      aggregate(arr, lit(0.0), (a, x) => a + x) / size(arr)
    def smaLast(n: Int): Column = when(m >= n, meanOf(lastN(cs, n)))
    // sample stddev of the last 20 closes (pandas rolling.std ddof=1)
    val bbMean = meanOf(lastN(cs, 20))
    val bbSd = sqrt(aggregate(lastN(cs, 20), lit(0.0),
      (a, x) => a + (x - bbMean) * (x - bbMean)) / (lit(20) - 1))
    // OBV final value: sum of sign(close diff) * volume (W5)
    val obvLast = aggregate(
      zip_with(
        zip_with(slice(cs, lit(2), m - 1), slice(cs, lit(1), m - 1), (cur, prev) => cur - prev),
        slice(vs, lit(2), m - 1),
        (d, v) => when(d > 0, v).when(d < 0, -v).otherwise(lit(0.0))),
      lit(0.0), (a, x) => a + x)
    def sf(c: Column): Column = when(!isnan(c), round(c, 4)) // safe_float (:355-357)
    val base = grouped.select(
      col("ticker"), m.as("n_bars"),
      expr("element_at(h, -1).date").as("date"),
      sf(expr("element_at(h, -1).close")).as("close"),
      sf(expr("element_at(h, -1).volume")).as("volume"),
      sf(TA.rsiLast(cs, 14)).as("rsi_14"),
      TA.macdLast(cs).as("_macd"),
      sf(smaLast(50)).as("sma_50"),
      sf(smaLast(200)).as("sma_200"),
      sf(TA.emaOverList(cs, 21)).as("ema_21"),
      sf(obvLast).as("obv"),
      sf(when(m >= 20, bbMean)).as("bb_mid"),
      sf(when(m >= 20, bbMean + bbSd * 2.0)).as("bb_upper"),
      sf(when(m >= 20, bbMean - bbSd * 2.0)).as("bb_lower"),
      sf(TA.atrLast(hs, ls, cs, 14)).as("atr_14"),
      sf(array_max(hs)).as("high_52w"),
      sf(array_min(ls)).as("low_52w"),
      sf(array_max(lastN(hs, 20))).as("recent_high"),
      sf(array_min(lastN(ls, 20))).as("recent_low"))
    // F20 support/resistance (:372-386): strongest floor below close /
    // ceiling above close among {swing level, SMA, Bollinger band}
    val supportCands = Seq(col("recent_low"), col("sma_200"), col("bb_lower"))
    val resistCands = Seq(col("recent_high"), col("sma_50"), col("bb_upper"))
    base
      .withColumn("macd", sf(col("_macd.macd")))
      .withColumn("macd_signal", sf(col("_macd.macd_signal")))
      .withColumn("macd_hist", sf(col("_macd.macd_hist")))
      .withColumn("support", coalesce(
        supportCands.map(c => when(c < col("close"), c)).reduce(greatest(_, _)),
        col("recent_low")))
      .withColumn("resistance", coalesce(
        resistCands.map(c => when(c > col("close"), c)).reduce(least(_, _)),
        col("recent_high")))
      // trend booleans carried on the enriched row (§1.3 technicals)
      .withColumn("price_above_sma_50",
        when(col("sma_50").isNotNull, col("close") > col("sma_50")))
      .withColumn("price_above_sma_200",
        when(col("sma_200").isNotNull, col("close") > col("sma_200")))
      .withColumn("macd_bullish",
        when(col("_macd.macd").isNotNull, col("_macd.macd") > col("_macd.macd_signal")))
      .drop("_macd")
  }

  /** F19 risk fields (enrichment-trigger/main.py:458-576). */
  def withRiskFields(df: DataFrame): DataFrame = {
    val pct = coalesce(col("price_change_pct"), lit(0.0))
    val rsi = coalesce(col("rsi_14"), lit(50.0))
    val atr = coalesce(col("atr_14"), lit(0.0))
    val price = coalesce(col("underlying_price"), lit(0.0))
    val cat = coalesce(col("catalyst_score"), lit(0.1))
    val rev = coalesce(col("reversal_probability"), lit(0.3))
    val score = coalesce(col("overnight_score"), lit(5))
    val bull = col("direction") === "BULLISH"
    val bear = col("direction") === "BEARISH"
    val atrPct = when(price > 0 && atr > 0, atr / price * 100).otherwise(lit(3.0))
    val atrMove = round(abs(pct) / atrPct, 2)
    val flowAligned = (bear && pct < 0) || (bull && pct > 0)
    val mrRaw =
      when(flowAligned,
        when(abs(pct) > 15, 0.45).when(abs(pct) > 10, 0.30)
          .when(abs(pct) > 5, 0.10).otherwise(0.0)).otherwise(0.0) +
        when(bear && rsi < 30, 0.25).when(bear && rsi < 35, 0.15)
          .when(bull && rsi > 70, 0.25).when(bull && rsi > 65, 0.15).otherwise(0.0) +
        when(atrMove > 2.5, 0.20).when(atrMove > 1.5, 0.10).otherwise(0.0) +
        when(cat > 0.8, -0.10).when(cat > 0.6, -0.05).otherwise(0.0)
    val mr = round(least(greatest(mrRaw * 0.6 + rev * 0.4, lit(0.0)), lit(1.0)), 3)
    val techAlign = when(bull,
      when(rsi > 40 && rsi < 70, 0.7).when(rsi < 40, 0.3).otherwise(0.5))
      .when(bear, when(rsi < 60 && rsi > 30, 0.7).when(rsi > 60, 0.3).otherwise(0.5))
      .otherwise(0.5)
    val quality = round(least(greatest(
      (score / 10.0 * 0.4 + cat * 0.2 + (lit(1.0) - mr) * 0.2 + techAlign * 0.2) * 10,
      lit(0.0)), lit(10.0)), 1)
    // F20 risk/reward (:557-576)
    val sup = coalesce(col("support"), lit(0.0))
    val res = coalesce(col("resistance"), lit(0.0))
    val reward = when(bull, res - price).otherwise(price - sup)
    val risk = when(bull, price - sup).otherwise(res - price)
    val rr = when(price > 0 && sup > 0 && res > 0 && risk > 0, round(reward / risk, 2))
    df.withColumn("atr_normalized_move", atrMove)
      .withColumn("mean_reversion_risk", mr)
      .withColumn("move_overdone", coalesce(col("move_overdone"), lit(false)))
      .withColumn("reversal_probability", round(rev, 3))
      .withColumn("enrichment_quality_score", quality)
      .withColumn("risk_reward_ratio", rr)
  }

  /** F17 premium flags (enrichment-trigger/main.py:589-613; duplicated
    * ladder with different move_overdone default documented in
    * SURVEY §7.4.6 — this is the enrichment-path variant, default false). */
  def withPremiumFields(df: DataFrame): DataFrame = {
    val intent = upper(coalesce(col("flow_intent"), lit("")))
    val rr = coalesce(col("risk_reward_ratio"), lit(0.0))
    val overdone = coalesce(col("move_overdone"), lit(false))
    val callVolOi = coalesce(col("call_vol_oi_ratio"), lit(0.0))
    val putVolOi = coalesce(col("put_vol_oi_ratio"), lit(0.0))
    val atrMove = coalesce(col("atr_normalized_move"), lit(0.0))
    val hedge = intent === "HEDGING"
    val highRr = rr > 2.0 && !overdone
    val bullFlow = callVolOi > 1.5 && col("direction") === "BULLISH" && !overdone
    val highAtr = atrMove > 2.0
    val bearFlow = putVolOi > 2.0 && col("direction") === "BEARISH"
    val score = hedge.cast("int") + highRr.cast("int") + bullFlow.cast("int") +
      highAtr.cast("int") + bearFlow.cast("int")
    df.withColumn("premium_hedge", hedge)
      .withColumn("premium_high_rr", highRr)
      .withColumn("premium_bull_flow", bullFlow)
      .withColumn("premium_high_atr", highAtr)
      .withColumn("premium_bear_flow", bearFlow)
      .withColumn("premium_score", score)
      .withColumn("is_premium_signal", score >= 1)
      .withColumn("is_tradeable", (hedge && highRr) || (hedge && highAtr))
  }

  /** J2 wide enrichment join: signals x technicals x news, then risk +
    * premium columns (enrichment-trigger/main.py:620-737). */
  def run(signals: DataFrame, dailyBars: DataFrame, news: DataFrame): DataFrame = {
    val sig = signals.where(col("overnight_score") >= Scanner.MinScore)
    val tech = technicals(dailyBars)
      .withColumnRenamed("date", "tech_date")
      .withColumnRenamed("close", "tech_close")
      .withColumnRenamed("volume", "tech_volume")
    val joined = sig
      .join(tech, Seq("ticker"), "left")
      .join(news.drop("summary"), Seq("ticker", "scan_date"), "left")
    withPremiumFields(withRiskFields(joined))
  }
}
