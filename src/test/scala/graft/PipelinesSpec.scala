package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.{Arena, Enrich, Execution, Scanner, Tracking}

/** Lifecycle-pipeline specs on reference-shaped fixtures (FIXTURES.md §1-9)
  * with hand-computed golden expectations. */
class PipelinesSpec extends AnyFunSuite with SparkFixture {

  private def d(s: String) = Date.valueOf(s)

  // ---- fixtures -----------------------------------------------------------

  private lazy val snapshots = {
    val schema = StructType(Seq(
      StructField("ticker", StringType),
      StructField("todaysChangePerc", DoubleType),
      StructField("day", StructType(Seq(
        StructField("o", DoubleType), StructField("h", DoubleType),
        StructField("l", DoubleType), StructField("c", DoubleType),
        StructField("v", LongType)))),
      StructField("lastTrade", StructType(Seq(StructField("p", DoubleType)))),
      StructField("prevDay", StructType(Seq(StructField("c", DoubleType))))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("AAPL", 3.0, Row(99.0, 101.0, 98.0, 100.0, 5000000L), Row(100.1), Row(97.0)),
        Row("DIVX", 2.0, Row(49.0, 51.0, 48.0, 50.0, 2000000L), Row(50.1), Row(49.0)),
        // pre-market: day.c missing -> falls back to lastTrade.p (P3)
        Row("PREM", -2.5, Row(null, null, null, null, 0L), Row(20.0), Row(20.5)),
        // below mover threshold -> filtered (P2)
        Row("TINY", 0.5, Row(9.0, 10.5, 9.0, 10.0, 100000L), Row(10.0), Row(9.9)),
        // not in universe -> filtered (P1)
        Row("ALIEN", 5.0, Row(1.0, 1.2, 0.9, 1.0, 900000L), Row(1.0), Row(1.0)))),
      schema)
  }

  private lazy val universe = {
    import spark.implicits._
    Seq(" aapl ", "DIVX", "PREM", "TINY", "").toDF("value")
  }

  private def contract(und: String, sym: String, typ: String, exp: String,
      strike: Double, bid: java.lang.Double, ask: java.lang.Double,
      vol: java.lang.Long, oi: java.lang.Long, last: java.lang.Double = null,
      iv: java.lang.Double = null, delta: java.lang.Double = null,
      gamma: java.lang.Double = null, theta: java.lang.Double = null,
      vega: java.lang.Double = null) =
    Row(und, sym, typ, d(exp), strike, last, bid, ask, vol, oi, iv, delta, gamma, theta, vega)

  private lazy val chain = {
    val schema = StructType(Seq(
      StructField("underlying", StringType), StructField("contract_symbol", StringType),
      StructField("option_type", StringType), StructField("expiration_date", DateType),
      StructField("strike", DoubleType), StructField("last_price", DoubleType),
      StructField("bid", DoubleType), StructField("ask", DoubleType),
      StructField("volume", LongType), StructField("open_interest", LongType),
      StructField("implied_volatility", DoubleType), StructField("delta", DoubleType),
      StructField("gamma", DoubleType), StructField("theta", DoubleType),
      StructField("vega", DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      // AAPL calls: c1 dominant (eligible, best), c2 weak (eligible)
      contract("AAPL", "AAPL_C105", "call", "2026-04-17", 105.0, 4.9, 5.1, 2000L, 500L,
        iv = 0.5, delta = 0.40, gamma = 0.05, theta = -0.05, vega = 0.1),
      contract("AAPL", "AAPL_C110", "call", "2026-04-17", 110.0, 0.9, 1.1, 300L, 1000L,
        iv = 0.6, delta = 0.20, gamma = 0.02, theta = -0.02, vega = 0.05),
      // ineligible: DTE 3 (< 7)
      contract("AAPL", "AAPL_C_NEAR", "call", "2026-03-21", 105.0, 1.0, 1.2, 500L, 100L),
      // ineligible: moneyness 1.40 (> 1.25)
      contract("AAPL", "AAPL_C140", "call", "2026-04-17", 140.0, 0.4, 0.6, 900L, 10L),
      // AAPL put (small flow)
      contract("AAPL", "AAPL_P95", "put", "2026-04-17", 95.0, 1.9, 2.1, 100L, 1000L,
        iv = 0.45, delta = -0.2),
      // DIVX: tiny call flow, heavy put flow -> divergence flip
      contract("DIVX", "DIVX_C55", "call", "2026-04-17", 55.0, 0.9, 1.1, 100L, 100L),
      contract("DIVX", "DIVX_P45", "put", "2026-04-17", 45.0, 4.9, 5.1, 3000L, 100L,
        iv = 0.7, delta = -0.4, gamma = 0.03, theta = -0.04, vega = 0.2))),
      schema)
  }

  private lazy val metadata = {
    import spark.implicits._
    Seq(("AAPL", "Technology", "Consumer Electronics"),
      ("DIVX", "Technology", "Software")).toDF("ticker", "sector", "industry")
  }

  private lazy val signalsOut = Scanner.run(
    snapshots, chain, universe, metadata,
    asOf = lit("2026-03-18").cast("date"), scanDate = lit("2026-03-18").cast("date"))

  // ---- scanner ------------------------------------------------------------

  test("scanner: mover + universe filters (P1/P2/P3)") {
    val tickers = signalsOut.select("ticker").collect().map(_.getString(0)).toSet
    assert(tickers == Set("AAPL", "DIVX", "PREM")) // TINY below 1%, ALIEN not in universe
    val prem = signalsOut.where(col("ticker") === "PREM").head()
    assert(prem.getAs[Double]("underlying_price") == 20.0) // lastTrade fallback
  }

  test("scanner: AAPL six-signal score and flow metrics (F18/A1-A4)") {
    val r = signalsOut.where(col("ticker") === "AAPL").head()
    // call_dv = 2000*5*100 + 300*1*100 + 500*1.1*100 + 900*0.5*100 = 1,130,000
    //   (AAPL_C_NEAR mid 1.1, AAPL_C140 mid 0.5 still count toward FLOW aggs;
    //    eligibility only gates the best-contract pick)
    assert(math.abs(r.getAs[Double]("call_dollar_volume") - 1130000.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("put_dollar_volume") - 20000.0) < 1e-6)
    assert(r.getAs[String]("direction") == "BULLISH")
    // s1: skew 1.13M/20K = 56.5 > 3 -> 2 | s2: call vol/oi 3700/1610=2.298 > 2 -> 2
    // s3: active strikes: c1 (2000>max(250,100)), near (500>max(50,100)),
    //     c140 (900>max(5,100)) = 3 -> 1 | s4: uoa c1 750k + near 44k + c140 89k
    //     = 883,000 in (500k, 2M] -> 1 | s5: |3|>1.5 -> 1 | s6: 0
    assert(r.getAs[Int]("overnight_score") == 7)
    val sigs = r.getAs[scala.collection.Seq[String]]("signals")
    assert(sigs.exists(_.contains("strikes active")))
    assert(sigs.exists(_.startsWith("Call $")))
  }

  test("scanner: best contract argmax honors eligibility (P6/A6)") {
    val r = signalsOut.where(col("ticker") === "AAPL").head()
    assert(r.getAs[String]("recommended_contract") == "AAPL_C105")
    assert(r.getAs[Double]("recommended_strike") == 105.0)
    assert(r.getAs[Int]("recommended_dte") == 30)
    // score: min(4,5)*2 + (1-0.04)*3 + min(4,3)*1.5 + .05*20 + 2 - (.05/5)
    //      = 8 + 2.88 + 4.5 + 1 + 2 - 0.01 = 18.37
    assert(math.abs(r.getAs[Double]("contract_score") - 18.37) < 1e-9)
  }

  test("scanner: divergence flips direction after side metrics chosen (quirk §7.4.6)") {
    val r = signalsOut.where(col("ticker") === "DIVX").head()
    assert(r.getAs[String]("direction") == "BEARISH") // flipped by s6
    // s1: 0 (call side, skew tiny) | s2: call_vol_oi 1.0 > 0.8 -> 1 (call side!)
    // s3: put strikes don't count (call side = 0 active) -> 0
    // s4: call uoa = 0 -> 0 | s5: 1 | s6: 1  => 3
    assert(r.getAs[Int]("overnight_score") == 3)
    // best contract for flipped direction = the PUT
    assert(r.getAs[String]("recommended_contract") == "DIVX_P45")
    assert(r.getAs[scala.collection.Seq[String]]("signals")
      .contains("DIVERGENCE: heavy puts despite rally"))
  }

  test("scanner: cluster boost ladder (A7/F16)") {
    import spark.implicits._
    val scored = Seq(
      ("A1", "BULLISH", 4, "Chips"), ("A2", "BULLISH", 3, "Chips"),
      ("A3", "BULLISH", 7, "Chips"), ("A4", "BULLISH", 5, "Chips"),
      ("A5", "BULLISH", 2, "Chips"), // below ClusterMinScore: not counted, but boosted
      ("B1", "BULLISH", 4, "Oil"))   // cluster of 1: no boost
      .toDF("ticker", "direction", "overnight_score", "ind")
    val meta = Seq(("A1", "T", "Chips"), ("A2", "T", "Chips"), ("A3", "T", "Chips"),
      ("A4", "T", "Chips"), ("A5", "T", "Chips"), ("B1", "E", "Oil"))
      .toDF("ticker", "sector", "industry")
    val out = Scanner.clusterBoost(scored.drop("ind"), meta)
      .select("ticker", "overnight_score", "original_score", "cluster_boost", "cluster_size")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out("A1") == (5, 4, 1, 4))  // cluster size 4 (A1,A2,A3,A4 >= 3) -> +1
    assert(out("A3") == (7, 7, 0, 4))  // >= threshold 6: no boost
    assert(out("A5") == (3, 2, 1, 4))  // sub-min-score ticker still boosted
    assert(out("B1") == (4, 4, 0, 1))  // no cluster
  }

  // ---- enrichment ---------------------------------------------------------

  private lazy val dailyBars = {
    import spark.implicits._
    val closes = Seq(
      44.34, 44.09, 44.15, 43.61, 44.33, 44.83, 45.10, 45.42, 45.84, 46.08,
      45.89, 46.03, 45.61, 46.28, 46.28, 46.00, 46.03, 46.41, 46.22, 45.64,
      46.21, 46.25, 45.71, 46.45, 45.78, 45.35, 44.03, 44.18, 44.22, 44.57)
    val rows = closes.zipWithIndex.map { case (c, i) =>
      ("ACME", d(f"2026-01-${i + 1}%02d"), c - 0.1, c + 0.5, c - 0.5, c, 1000.0 + i)
    } ++ Seq(("SHRT", d("2026-01-05"), 1.0, 1.1, 0.9, 1.0, 10.0)) // < 20 bars
    rows.toDF("ticker", "date", "open", "high", "low", "close", "volume")
  }

  test("enrich: technicals last-row indicators match reference recursions (W1-W9)") {
    val t = Enrich.technicals(dailyBars).collect()
    assert(t.length == 1) // SHRT dropped (< 20 bars)
    val r = t.head
    assert(r.getAs[String]("ticker") == "ACME")
    assert(r.getAs[Double]("ema_21") == 45.2486)   // TASpec value round4
    assert(r.getAs[Double]("rsi_14") == 45.4995)
    assert(r.getAs[Double]("atr_14") == 1.0826)
    assert(r.isNullAt(r.fieldIndex("sma_50")))     // only 30 bars
    assert(r.getAs[Double]("high_52w") == 46.95)   // max close+0.5
    assert(r.getAs[Double]("close") == 44.57)
    // support below close, resistance above (F20)
    assert(r.getAs[Double]("support") < 44.57)
    assert(r.getAs[Double]("resistance") > 44.57)
  }

  test("enrich: risk fields formulas (F19)") {
    import spark.implicits._
    val row = Seq(("T1", "BULLISH", 12.0, 75.0, 2.0, 100.0, 0.9, 0.5, 8, 90.0, 120.0))
      .toDF("ticker", "direction", "price_change_pct", "rsi_14", "atr_14",
        "underlying_price", "catalyst_score", "reversal_probability",
        "overnight_score", "support", "resistance")
      .withColumn("move_overdone", lit(null).cast("boolean"))
    val r = Enrich.withRiskFields(row).head()
    assert(r.getAs[Double]("atr_normalized_move") == 6.0)   // 12 / (2/100*100)
    // mr raw: +0.30 (|12|>10 aligned) +0.25 (rsi>70 bull) +0.20 (atr>2.5) -0.10 (cat>0.8)
    //  = 0.65; blended 0.65*0.6 + 0.5*0.4 = 0.59
    assert(r.getAs[Double]("mean_reversion_risk") == 0.59)
    // quality: (0.8*0.4 + 0.9*0.2 + 0.41*0.2 + 0.5*0.2)*10 = 6.82 -> 6.8
    assert(r.getAs[Double]("enrichment_quality_score") == 6.8)
    assert(r.getAs[Double]("risk_reward_ratio") == 2.0)     // (120-100)/(100-90)
    assert(!r.getAs[Boolean]("move_overdone"))              // default false
  }

  test("enrich: premium flags and tradeable combos (F17)") {
    import spark.implicits._
    val rows = Seq(
      ("HEDGING", 2.5, false, 1.0, 1.0, "BULLISH", 2.5),  // hedge+high_rr+high_atr
      ("DIRECTIONAL", 1.0, false, 2.0, 0.5, "BULLISH", 1.0), // bull_flow only
      ("MIXED", 0.0, false, 0.0, 2.5, "BEARISH", 0.0))    // bear_flow only
      .toDF("flow_intent", "risk_reward_ratio", "move_overdone",
        "call_vol_oi_ratio", "put_vol_oi_ratio", "direction", "atr_normalized_move")
    val out = Enrich.withPremiumFields(rows)
      .select("premium_score", "is_premium_signal", "is_tradeable").collect()
    assert(out(0).getInt(0) == 3 && out(0).getBoolean(1) && out(0).getBoolean(2))
    assert(out(1).getInt(0) == 1 && out(1).getBoolean(1) && !out(1).getBoolean(2))
    assert(out(2).getInt(0) == 1 && out(2).getBoolean(1) && !out(2).getBoolean(2))
  }

  // ---- execution ----------------------------------------------------------

  test("execution: ledger covers every exit branch (X1 fixture paths)") {
    import spark.implicits._
    val scan = d("2026-03-18")
    def sig(t: String, strike: Double, vol: Long) =
      (scan, t, s"${t}_C", "BULLISH", true, 3, strike, d("2026-04-17"), 30, vol, 600L, 0.05)
    val enriched = Seq(
      sig("TGT", 100.0, 500L), sig("STP", 100.0, 500L), sig("TIE", 100.0, 500L),
      sig("TMO", 100.0, 500L), sig("NOV", 100.0, 500L),
      sig("DUP", 100.0, 500L), sig("DUP", 100.0, 400L)) // duplicate, lower volume
      .toDF("scan_date", "ticker", "recommended_contract", "direction",
        "is_premium_signal", "premium_score", "recommended_strike",
        "recommended_expiration", "recommended_dte", "recommended_volume",
        "recommended_oi", "recommended_spread_pct")
    val entryTs = 1000000L
    val dayEnd = entryTs + 3600000L
    val timeoutTs = entryTs + 10000000L
    def occ(t: String) = s"O:${t}260417C00100000"
    def bar(tick: String, off: Long, h: Double, l: Double, c: Double, v: Long = 10L) =
      (occ(tick), entryTs + off, c, h, l, c, v)
    val bars = Seq(
      // TGT: entry exact at entryTs, target (c*1.02*1.40 = 14.28) hit later
      bar("TGT", 0, 10.2, 9.9, 10.0), bar("TGT", 60000, 15.0, 10.0, 14.5),
      // STP: entry, then low breaks stop (10.2*0.75 = 7.65)
      bar("STP", 0, 10.2, 9.9, 10.0), bar("STP", 60000, 10.5, 7.0, 7.2),
      // TIE: both stop and target in one bar -> stop wins
      bar("TIE", 0, 10.2, 9.9, 10.0), bar("TIE", 60000, 20.0, 5.0, 12.0),
      // TMO: nothing hit until a bar past timeout
      bar("TMO", 0, 10.2, 9.9, 10.0), bar("TMO", 60000, 10.4, 10.0, 10.1),
      bar("TMO", 10050000, 10.2, 9.8, 9.9),
      // NOV: entry bar has zero volume -> INVALID_LIQUIDITY
      bar("NOV", 0, 10.2, 9.9, 10.0, v = 0L),
      // DUP winner: data exhausted after entry -> TIMEOUT at last close
      bar("DUP", 0, 10.2, 9.9, 10.0), bar("DUP", 60000, 10.3, 10.0, 10.2))
      .toDF("opt_ticker", "t", "o", "h", "l", "c", "v")
    val macroSeries = Seq(
      ("^VIX", d("2026-03-18"), 17.5), ("^VIX", d("2026-03-16"), 19.0)) ++
      (1 to 12).map(i => ("SPY", d(f"2026-03-${i}%02d"), 500.0 + i))
    val macroDf = macroSeries.toDF("symbol", "date", "close")
    val out = Execution.run(spark, enriched, bars, macroDf,
      targetDate = lit("2026-03-18").cast("date"),
      entryDay = lit("2026-03-19").cast("date"),
      entryTs = entryTs, timeoutTs = timeoutTs, entryDayEnd = dayEnd)
    val byT = out.collect().map(r => (r.getAs[String]("ticker"),
      r.getAs[String]("exit_reason"), r)).toList
    def reason(t: String) = byT.filter(_._1 == t).map(_._2)
    assert(reason("TGT") == List("TARGET"))
    assert(reason("STP") == List("STOP"))
    assert(reason("TIE") == List("STOP")) // intrabar tie rule
    assert(reason("TMO") == List("TIMEOUT"))
    assert(reason("NOV") == List("INVALID_LIQUIDITY"))
    assert(reason("DUP").toSet == Set("TIMEOUT", "SKIPPED")) // dup flagged not dropped
    val tgt = byT.find(_._1 == "TGT").get._3
    assert(math.abs(tgt.getAs[Double]("realized_return_pct") - 0.40) < 1e-12)
    assert(tgt.getAs[Double]("VIX_at_entry") == 17.5) // as-of 03-18 (J4)
    assert(tgt.getAs[String]("SPY_trend_state") == "BULLISH") // rising closes (W10)
    val dup = byT.find(t => t._1 == "DUP" && t._2 == "SKIPPED").get._3
    assert(dup.getAs[String]("skip_reason") == "DEDUP_TICKER_DATE_SKIP")
  }

  // ---- tracking -----------------------------------------------------------

  test("tracking: peak return, tiers, and backfill ladders (W11/F16)") {
    import spark.implicits._
    val sigs = Seq(
      ("BULL", d("2026-03-02"), "BULLISH", 100.0),
      ("BEAR", d("2026-03-02"), "BEARISH", 50.0))
      .toDF("ticker", "scan_date", "direction", "signal_price")
    val bars = Seq(
      // BULL: peak high 106 on day2 -> peak 6% strong; day3 close 101
      ("BULL", d("2026-03-03"), 100.0, 103.0, 99.0, 102.0, 1.0),
      ("BULL", d("2026-03-04"), 102.0, 106.0, 101.0, 104.0, 1.0),
      ("BULL", d("2026-03-05"), 104.0, 104.5, 100.0, 101.0, 1.0),
      // BEAR: low 48 -> peak -4% -> favorable 4% solid
      ("BEAR", d("2026-03-03"), 50.0, 50.5, 49.0, 49.5, 1.0),
      ("BEAR", d("2026-03-04"), 49.5, 50.0, 48.0, 49.0, 1.0),
      ("BEAR", d("2026-03-05"), 49.0, 49.8, 48.5, 49.5, 1.0))
      .toDF("ticker", "date", "open", "high", "low", "close", "volume")
    val perf = Tracking.performance(sigs, bars, lit("2026-03-05").cast("date"))
      .collect().map(r => r.getAs[String]("ticker") -> r).toMap
    assert(perf("BULL").getAs[Double]("peak_return") == 6.0)
    assert(perf("BULL").getAs[String]("tier") == "strong")
    assert(perf("BULL").getAs[Double]("pct_change") == 1.0) // latest close vs 100
    assert(perf("BEAR").getAs[Double]("peak_return") == -4.0)
    assert(perf("BEAR").getAs[String]("tier") == "solid") // favorable +4
    assert(perf("BULL").getAs[Boolean]("is_final"))
    val bf = Tracking.backfill(sigs, bars)
      .collect().map(r => r.getAs[String]("ticker") -> r).toMap
    assert(bf("BULL").getAs[Double]("next_day_close") == 102.0)
    assert(bf("BULL").getAs[String]("outcome_tier") == "home_run") // 6 >= 5
    assert(bf("BEAR").getAs[String]("outcome_tier") == "strong")   // favorable 4 >= 3
    assert(bf("BEAR").getAs[Boolean]("is_win"))
  }

  // ---- arena --------------------------------------------------------------

  test("arena: consensus tiers and winner selection (A19)") {
    import spark.implicits._
    val picks = Seq(
      (d("2026-03-18"), "bull", "NVDA", "BULLISH", 8.0),
      (d("2026-03-18"), "bear", "NVDA", "BULLISH", 9.0),
      (d("2026-03-18"), "quant", "NVDA", "BULLISH", 7.0),
      (d("2026-03-18"), "macro", "NVDA", "BULLISH", 8.0),
      (d("2026-03-18"), "risk", "TSLA", "BEARISH", 9.0))
      .toDF("scan_date", "agent", "ticker", "direction", "conviction")
    val t = Arena.tally(picks).collect()
      .map(r => r.getAs[String]("ticker") -> r.getAs[String]("tier")).toMap
    assert(t("NVDA") == "supermajority") // 4/5 = 0.8
    assert(t("TSLA") == "solo")
    val c = Arena.consensus(picks).head()
    assert(c.getAs[Boolean]("has_consensus"))
    assert(c.getAs[String]("consensus_ticker") == "NVDA")
    assert(c.getAs[Int]("consensus_count") == 4)
    assert(c.getAs[Double]("consensus_conviction") == 8.0)
    assert(c.getAs[Int]("n_solo") == 1)
  }

  test("tracking: trading_days_elapsed via calendar sessions (W15)") {
    import spark.implicits._
    val sigs = Seq(("BULL", d("2026-03-06"), "BULLISH", 100.0)) // Friday
      .toDF("ticker", "scan_date", "direction", "signal_price")
    val bars = Seq(
      ("BULL", d("2026-03-09"), 100.0, 103.0, 99.0, 102.0, 1.0),
      ("BULL", d("2026-03-10"), 102.0, 106.0, 101.0, 104.0, 1.0))
      .toDF("ticker", "date", "open", "high", "low", "close", "volume")
    val cal = graft.calendar.TradingCalendar.build(spark,
      java.time.LocalDate.of(2026, 3, 1), java.time.LocalDate.of(2026, 3, 31),
      holidays = Set.empty)
    // check Tuesday 03-10: Fri->Tue spans Mon+Tue = 2 sessions (weekend skipped)
    val p = Tracking.performance(sigs, bars, lit("2026-03-10").cast("date"), Some(cal)).head()
    assert(p.getAs[Int]("trading_days_elapsed") == 2)
    assert(!p.getAs[Boolean]("is_final")) // < 3 sessions
    val p2 = Tracking.performance(sigs, bars, lit("2026-03-11").cast("date"), Some(cal)).head()
    assert(p2.getAs[Int]("trading_days_elapsed") == 3)
    assert(p2.getAs[Boolean]("is_final"))
  }
}
