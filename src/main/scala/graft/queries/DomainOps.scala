package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.calendar.TradingCalendar
import graft.kernels.Bracket

/** Domain-operator queries: trading-calendar arithmetic (W15) and the
  * bracket-execution kernel (X1) + config sweep (X3), declared over the
  * testdata tables so the DuckDB oracle can replay them. The bracket
  * oracle is a pure-SQL reformulation of the kernel's state machine —
  * cross-engine agreement is the strongest check we have on the typed
  * kernel's semantics.
  */
object DomainOps {

  /** q59 — trading-day arithmetic via calendar dimension join (W15):
    * session flag, session index, and next-session date per order.
    * Weekday-only session rule so the oracle reduces to dayofweek. */
  def q59Calendar(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderdate".cast("date").as("orderdate"))
    val Array(mn, mx) = o.agg(min($"orderdate"), max($"orderdate"))
      .head().toSeq.map(_.asInstanceOf[java.sql.Date].toLocalDate).toArray
    val cal = TradingCalendar.build(spark, mn, mx.plusDays(7), holidays = Set.empty[LocalDate])
    val withSeq = TradingCalendar.withSessionSeq(o, cal, "orderdate")
    TradingCalendar.offsetSession(withSeq, cal, 1)
      .select($"o_orderkey", $"orderdate", $"is_session", $"session_seq",
        $"session_plus_1".as("next_session"))
  }

  private def barsFromEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      $"user_id",
      unix_millis($"ts").as("t"),
      (($"value" + 1000) * 1.01).as("h"),
      (($"value" + 1000) * 0.99).as("l"),
      ($"value" + 1000).cast("double").as("c"))

  /** q60 — bracket-order execution scan (X1): events as synthetic price
    * bars per user; entry at the first bar, 2h timeout, +3%/-3% bracket.
    * Runs the typed flatMapSortedGroups kernel; oracle replays the state
    * machine in SQL (first qualifying bar wins, timeout > stop > target
    * precedence within a bar, exhausted -> timeout_eod at last close). */
  def q60Bracket(spark: SparkSession, dir: String): DataFrame = {
    val bars = barsFromEvents(spark, dir)
    val entry = bars.groupBy($"user_id").agg(min($"t").as("entry_ts"))
      .withColumn("timeout_ts", $"entry_ts" + lit(7200000L))
    val in = bars.join(entry, "user_id").select(
      $"user_id".as("trade_id"), $"t", $"c".as("o"), $"h", $"l", $"c",
      $"entry_ts", $"timeout_ts",
      lit(1.02).as("slippage"), lit(1.03).as("target_mult"), lit(0.97).as("stop_mult"))
    Bracket.execute(spark, in).toDF()
      .select($"trade_id".as("user_id"), $"entry_ts",
        round($"entry_price", 4).as("entry_price"),
        $"exit_ts", round($"exit_price", 4).as("exit_price"),
        $"exit_reason", round($"return_pct", 4).as("return_pct"))
  }

  /** q61 — scenario/config sweep over the kernel (X2/X3): 2x2 bracket
    * configs via crossJoin with a config dimension, one kernel pass keyed
    * by (trade, config), grouped exit-reason stats (A8 shape). */
  def q61Sweep(spark: SparkSession, dir: String): DataFrame = {
    val configs = spark.createDataFrame(
      Seq((0, 1.03, 0.97), (1, 1.03, 0.95), (2, 1.06, 0.97), (3, 1.06, 0.95)))
      .toDF("cfg", "tmult", "smult")
    val bars = barsFromEvents(spark, dir)
    val entry = bars.groupBy($"user_id").agg(min($"t").as("entry_ts"))
      .withColumn("timeout_ts", $"entry_ts" + lit(7200000L))
    val in = bars.join(entry, "user_id").crossJoin(broadcast(configs)).select(
      ($"user_id" * 10 + $"cfg").as("trade_id"), $"t", $"c".as("o"), $"h", $"l", $"c",
      $"entry_ts", $"timeout_ts",
      lit(1.02).as("slippage"), $"tmult".as("target_mult"), $"smult".as("stop_mult"))
    Bracket.execute(spark, in).toDF()
      .withColumn("cfg", ($"trade_id" % 10).cast("int"))
      .groupBy($"cfg", $"exit_reason")
      .agg(count(lit(1)).as("cnt"), round(avg($"return_pct"), 4).as("avg_ret"))
  }
}
