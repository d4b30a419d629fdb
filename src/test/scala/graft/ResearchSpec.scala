package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.research.Research

class ResearchSpec extends AnyFunSuite with SparkFixture {

  test("sweep runs the full config x scenario grid in one kernel pass (X2/X3)") {
    import spark.implicits._
    val trades = Seq((1L, 100L, 1000000L), (2L, 100L, 1000000L))
      .toDF("trade_id", "entry_ts", "timeout_ts")
    // trade 1 rockets (+60% high), trade 2 collapses (-40% low)
    val bars = Seq(
      (1L, 100L, 10.0, 10.1, 9.9, 10.0), (1L, 200L, 15.9, 16.0, 10.0, 15.9),
      (2L, 100L, 10.0, 10.1, 9.9, 10.0), (2L, 200L, 6.1, 10.0, 6.0, 6.1))
      .toDF("trade_id", "t", "o", "h", "l", "c")
    val configs = Seq((0, 1.40, 0.75), (1, 1.10, 0.95))
      .toDF("cfg", "target_mult", "stop_mult")
    val out = Research.sweep(spark, trades, bars, configs)
    assert(out.count() == 2 * 2 * 3) // trades x configs x scenarios
    val base = out.where(col("scenario") === "Base")
      .select("orig_trade_id", "cfg", "exit_reason").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(base((1L, 0)) == "target") // high 16 >= 10.2*1.40
    assert(base((1L, 1)) == "target")
    assert(base((2L, 0)) == "stop")
    assert(base((2L, 1)) == "stop")
    // Stress slippage raises entry -> target threshold higher but 16 still hits
    val stress = out.where(col("scenario") === "Stress" && col("orig_trade_id") === 1L)
      .select("entry_price").head().getDouble(0)
    assert(stress == 10.0 * 1.05)
  }

  test("cohortStats computes A8 aggregates + losing streak (W12)") {
    import spark.implicits._
    val fills = Seq(
      ("A", 1L, "target", 40.0), ("A", 2L, "stop", -25.0), ("A", 3L, "stop", -25.0),
      ("A", 4L, "timeout", -5.0), ("A", 5L, "target", 40.0),
      ("B", 6L, "target", 10.0))
      .toDF("cohort", "trade_id", "exit_reason", "return_pct")
    val out = Research.cohortStats(fills, Seq("cohort"), col("trade_id"))
      .collect().map(r => r.getAs[String]("cohort") -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_trades") == 5L)
    assert(a.getAs[Double]("win_rate_pct") == 40.0)
    assert(a.getAs[Double]("stop_rate_pct") == 40.0)
    assert(a.getAs[Double]("timeout_rate_pct") == 20.0)
    assert(a.getAs[Double]("expected_value_pct") == 5.0)
    assert(a.getAs[Long]("max_losing_streak") == 3L) // stop,stop,timeout run
    assert(out("B").getAs[Long]("max_losing_streak") == 0L)
  }

  test("chronoHoldout splits by date and compares halves (W14)") {
    import spark.implicits._
    val fills = (1 to 10).map(i =>
      (i.toLong, f"2026-03-$i%02d", if (i <= 5) 10.0 else -10.0))
      .toDF("trade_id", "d", "return_pct")
    val out = Research.chronoHoldout(fills, "d").collect()
      .map(r => r.getAs[String]("sample") -> r.getAs[Double]("win_rate_pct")).toMap
    assert(out("IN_SAMPLE") == 100.0)
    assert(out("OUT_OF_SAMPLE") == 0.0) // regime fragility shape
  }
}
