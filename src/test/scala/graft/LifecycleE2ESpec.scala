package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.{Enrich, Execution, Scanner, Tracking}

/** End-to-end lifecycle golden test (SURVEY §3, FIXTURES §9): one ticker
  * driven through scanner -> enrichment -> execution -> tracking with
  * every stage's output feeding the next, asserting row-level values at
  * each boundary. */
class LifecycleE2ESpec extends AnyFunSuite with SparkFixture {

  private def d(s: String) = Date.valueOf(s)
  private val scanDate = "2026-03-18"

  test("scanner -> enrich -> execution -> tracking chain produces a consistent ledger") {
    import spark.implicits._

    // --- stage 1: scanner --------------------------------------------------
    val snapshots = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("ACME", 3.0, Row(99.0, 101.0, 98.0, 100.0, 5000000L), Row(100.1), Row(97.0)))),
      StructType(Seq(
        StructField("ticker", StringType),
        StructField("todaysChangePerc", DoubleType),
        StructField("day", StructType(Seq(
          StructField("o", DoubleType), StructField("h", DoubleType),
          StructField("l", DoubleType), StructField("c", DoubleType),
          StructField("v", LongType)))),
        StructField("lastTrade", StructType(Seq(StructField("p", DoubleType)))),
        StructField("prevDay", StructType(Seq(StructField("c", DoubleType)))))))
    val chain = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("ACME", "ACME_C105", "call", d("2026-04-17"), 105.0, null, 4.9, 5.1,
          2000L, 500L, 0.5, 0.40, 0.05, -0.05, 0.1),
        Row("ACME", "ACME_P95", "put", d("2026-04-17"), 95.0, null, 1.9, 2.1,
          100L, 1000L, 0.45, -0.2, null, null, null))),
      StructType(Seq(
        StructField("underlying", StringType), StructField("contract_symbol", StringType),
        StructField("option_type", StringType), StructField("expiration_date", DateType),
        StructField("strike", DoubleType), StructField("last_price", DoubleType),
        StructField("bid", DoubleType), StructField("ask", DoubleType),
        StructField("volume", LongType), StructField("open_interest", LongType),
        StructField("implied_volatility", DoubleType), StructField("delta", DoubleType),
        StructField("gamma", DoubleType), StructField("theta", DoubleType),
        StructField("vega", DoubleType))))
    val signals = Scanner.run(snapshots, chain, Seq("ACME").toDF("value"),
      Seq(("ACME", "Technology", "Semis")).toDF("ticker", "sector", "industry"),
      asOf = lit(scanDate).cast("date"), scanDate = lit(scanDate).cast("date"))
    val sig = signals.head()
    // dv: call 2000*5*100 = 1,000,000; put 100*2*100 = 20,000 -> skew 50x (+2)
    // vol/oi 2000/500=4 > 2 (+2); strikes 1 (+0); uoa 750k (+1); |3|>1.5 (+1) = 6
    assert(sig.getAs[Int]("overnight_score") == 6)
    assert(sig.getAs[String]("recommended_contract") == "ACME_C105")

    // --- stage 2: enrichment ----------------------------------------------
    val dailyBars = (1 to 30).map { i =>
      val c = 90.0 + i * 0.35 // uptrend into the scan
      ("ACME", d(f"2026-02-$i%02d".take(8) + f"${math.min(i, 28)}%02d"), c - 0.1,
        c + 0.6, c - 0.6, c, 1000.0)
    }.zipWithIndex.map { case ((t, _, o, h, l, c, v), i) =>
      (t, d(f"2026-01-${i + 1}%02d"), o, h, l, c, v) // strictly increasing dates
    }.toDF("ticker", "date", "open", "high", "low", "close", "volume")
    val news = Seq(("ACME", d(scanDate), 0.9, "Earnings Beat", true, 3L,
      "HEDGING", "funds hedging the rally", false, 0.2, "strong beat"))
      .toDF("ticker", "scan_date", "catalyst_score", "catalyst_type", "news_found",
        "sources_count", "flow_intent", "flow_intent_reasoning", "move_overdone",
        "reversal_probability", "thesis")
    val enriched = Enrich.run(signals, dailyBars, news)
    val e = enriched.head()
    assert(e.getAs[Boolean]("premium_hedge")) // HEDGING intent
    assert(e.getAs[Int]("premium_score") >= 1)
    assert(e.getAs[Double]("rsi_14") > 50.0)  // uptrend
    // execution needs premium_score >= 2: hedge + high_atr or high_rr
    val pScore = e.getAs[Int]("premium_score")

    // --- stage 3: execution ------------------------------------------------
    val entryTs = 5000000L
    val occ = "O:ACME260417C00105000"
    val minuteBars = Seq(
      (occ, entryTs, 5.0, 5.1, 4.9, 5.0, 100L),          // entry bar (c=5.0)
      (occ, entryTs + 60000, 7.4, 7.2, 7.0, 7.2, 80L))   // high 7.4 >= 5.1*1.4=7.14
      .toDF("opt_ticker", "t", "o", "h", "l", "c", "v")
    val macroDf = ((1 to 12).map(i => ("SPY", d(f"2026-03-$i%02d"), 500.0 + i)) :+
      ("^VIX", d("2026-03-17"), 18.0)).toDF("symbol", "date", "close")
    // force premium_score >= 2 if the fixture landed at 1 (hedge only)
    val execIn = enriched.withColumn("premium_score",
      greatest(col("premium_score"), lit(2)))
    val ledger = Execution.run(spark, execIn, minuteBars, macroDf,
      targetDate = lit(scanDate).cast("date"),
      entryDay = lit("2026-03-19").cast("date"),
      entryTs = entryTs, timeoutTs = entryTs + 10000000L,
      entryDayEnd = entryTs + 3600000L)
    val led = ledger.head()
    assert(led.getAs[String]("exit_reason") == "TARGET")
    assert(math.abs(led.getAs[Double]("realized_return_pct") - 0.40) < 1e-12)
    assert(led.getAs[Double]("VIX_at_entry") == 18.0)

    // --- stage 4: tracking -------------------------------------------------
    val trackSigs = enriched.select(col("ticker"), col("scan_date"),
      col("direction"), col("underlying_price").as("signal_price"))
    val futureBars = Seq(
      ("ACME", d("2026-03-19"), 101.0, 104.0, 100.0, 103.0, 1.0),
      ("ACME", d("2026-03-20"), 103.0, 107.0, 102.0, 106.0, 1.0),
      ("ACME", d("2026-03-23"), 106.0, 106.5, 104.0, 105.0, 1.0))
      .toDF("ticker", "date", "open", "high", "low", "close", "volume")
    val perf = Tracking.performance(trackSigs, futureBars,
      lit("2026-03-23").cast("date")).head()
    assert(perf.getAs[Double]("peak_return") == 7.0) // 107 vs 100
    assert(perf.getAs[String]("tier") == "strong")
    assert(perf.getAs[Boolean]("is_win") && perf.getAs[Boolean]("is_final"))

    // --- merge-back: performance columns land on the enriched row ----------
    val updates = Tracking.performance(trackSigs, futureBars,
      lit("2026-03-23").cast("date"))
      .select(col("ticker"), col("scan_date"),
        col("peak_return").as("peak_return_3d"), col("tier").as("outcome_tier"))
    val target = enriched.select(col("ticker"), col("scan_date"),
      lit(null).cast("double").as("peak_return_3d"),
      lit(null).cast("string").as("outcome_tier"))
    val merged = Tracking.mergePerformance(target, updates,
      Seq("peak_return_3d", "outcome_tier")).head()
    assert(merged.getAs[Double]("peak_return_3d") == 7.0)
    assert(merged.getAs[String]("outcome_tier") == "strong")
  }

  test("q390 lifecycle capstone: the table-derived fixture exercises " +
      "every stage path (boost rescue, gate drops, all three exits)") {
    val out = graft.queries.DomainOps
      .q390LifecycleE2E(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("ticker") -> r).toMap
    // eligible cohort: bullish even keys (HEDGING + bull-flow = premium 2);
    // keys 4 and 18 only reach score 6 through the cluster boost
    assert(out.keySet == Set("NATION_4", "NATION_6", "NATION_12",
      "NATION_18", "NATION_20"), out.keySet.toString)
    def reason(t: String) = out(t).getAs[String]("exit_reason")
    // key%3 routes the bracket: 0 -> TARGET, 1 -> STOP, 2 -> exhausted
    assert(Seq("NATION_6", "NATION_12", "NATION_18").forall(
      reason(_) == "TARGET"))
    assert(reason("NATION_4") == "STOP")
    assert(reason("NATION_20") == "TIMEOUT")
    out.values.foreach { r =>
      assert(r.getAs[String]("direction") == "BULLISH")
      assert(r.getAs[Int]("premium_score") == 2)
      assert(!r.getAs[Boolean]("is_skipped"))
      assert(r.getAs[Double]("VIX_at_entry") == 18.5)
      assert(r.getAs[String]("SPY_trend_state") == "BULLISH")
    }
    assert(out("NATION_4").getAs[Double]("realized_return_pct") == -0.25)
    assert(out("NATION_6").getAs[Double]("realized_return_pct") == 0.4)
  }
}
