package graft.model

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed catalog (SURVEY §1.3): the pipeline tables as case classes —
  * the reference passes well-known dict shapes between every stage, which
  * is exactly `Dataset[T]`; ad-hoc EDA stays untyped `DataFrame`.
  * Converters are lossy-tolerant (`as[T]` requires the named columns,
  * ignores extras) so wide stage outputs downcast to their contract.
  */
object Model {

  /** overnight_signals core row (overnight_scanner.py:682-721). */
  case class Signal(
      scan_date: Date, ticker: String, direction: String,
      overnight_score: Int, original_score: Int,
      cluster_boost: Int, cluster_size: Int,
      sector: Option[String], industry: Option[String],
      price_change_pct: Double, underlying_price: Option[Double],
      call_dollar_volume: Double, put_dollar_volume: Double,
      signals: Seq[String],
      recommended_contract: Option[String], recommended_strike: Option[Double],
      recommended_expiration: Option[Date], recommended_volume: Option[Long],
      recommended_oi: Option[Long])

  /** Flattened option contract (polygon_client.py:95-119 shape). */
  case class Contract(
      underlying: String, contract_symbol: String, option_type: String,
      expiration_date: Date, strike: Double,
      last_price: Option[Double], bid: Option[Double], ask: Option[Double],
      volume: Option[Long], open_interest: Option[Long],
      implied_volatility: Option[Double], delta: Option[Double],
      gamma: Option[Double], theta: Option[Double], vega: Option[Double])

  /** Daily OHLCV bar (enrichment-trigger/main.py:312-330). */
  case class DailyBar(ticker: String, date: Date, open: Double, high: Double,
      low: Double, close: Double, volume: Double)

  /** Minute bar keyed by OCC contract (forward-paper-trader/main.py:53-71). */
  case class MinuteBar(opt_ticker: String, t: Long, o: Double, h: Double,
      l: Double, c: Double, v: Long)

  /** forward_paper_ledger_v3 row (reset_forward_paper_ledger_v3.sql:12-41). */
  case class LedgerRow(
      scan_date: Date, ticker: String, recommended_contract: Option[String],
      direction: String, is_premium_signal: Boolean, premium_score: Int,
      policy_version: String, policy_gate: String,
      is_skipped: Boolean, skip_reason: Option[String],
      VIX_at_entry: Option[Double], SPY_trend_state: Option[String],
      entry_timestamp: Option[Long], entry_price: Option[Double],
      target_price: Option[Double], stop_price: Option[Double],
      exit_timestamp: Option[Long], exit_reason: Option[String],
      realized_return_pct: Option[Double])

  /** signal_performance row (win-tracker/main.py:177-193). */
  case class PerformanceRow(
      ticker: String, scan_date: Date, check_date: Date, direction: String,
      signal_price: Double, current_price: Double, pct_change: Double,
      peak_return: Double, trading_days_tracked: Int,
      is_win: Boolean, tier: String, is_final: Boolean)

  /** agent_arena_picks row (agent-arena/create_tables.sql:6-27). */
  case class ArenaPick(scan_date: Date, agent: String, ticker: String,
      direction: String, conviction: Double)

  implicit val signalEnc: Encoder[Signal] = Encoders.product[Signal]
  implicit val contractEnc: Encoder[Contract] = Encoders.product[Contract]
  implicit val dailyBarEnc: Encoder[DailyBar] = Encoders.product[DailyBar]
  implicit val minuteBarEnc: Encoder[MinuteBar] = Encoders.product[MinuteBar]
  implicit val ledgerEnc: Encoder[LedgerRow] = Encoders.product[LedgerRow]
  implicit val perfEnc: Encoder[PerformanceRow] = Encoders.product[PerformanceRow]
  implicit val pickEnc: Encoder[ArenaPick] = Encoders.product[ArenaPick]

  /** Downcast a wide stage output to its typed contract (named-column
    * selection then as[T], so extra columns are legal). */
  def asTyped[T: Encoder](df: DataFrame, columns: Seq[String]): Dataset[T] =
    df.selectExpr(columns: _*).as[T]
}
