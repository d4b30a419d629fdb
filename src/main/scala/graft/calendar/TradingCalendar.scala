package graft.calendar

import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** W15 trading-day arithmetic as a calendar dimension + joins — never a
  * driver-side loop (SURVEY.md §7.4.2; reference loops at
  * win-tracker/main.py:58-88, forward-paper-trader/main.py:34-44).
  *
  * The dimension carries `session_seq`, a monotone index over sessions, so
  * next-session / offset-N / count-between all become integer arithmetic
  * after one broadcast join. At 100 TB the calendar stays a few KB — it is
  * always the broadcast side.
  */
object TradingCalendar {

  /** 2026 NYSE-style holiday set hardcoded by the reference
    * (win-tracker/main.py:51-55). */
  val holidays2026: Set[LocalDate] = Set(
    LocalDate.of(2026, 1, 1), LocalDate.of(2026, 1, 19), LocalDate.of(2026, 2, 16),
    LocalDate.of(2026, 4, 3), LocalDate.of(2026, 5, 25), LocalDate.of(2026, 6, 19),
    LocalDate.of(2026, 7, 3), LocalDate.of(2026, 9, 7), LocalDate.of(2026, 11, 26),
    LocalDate.of(2026, 12, 25))

  /** Generate the session dimension for [start, end] (inclusive).
    * A session = weekday not in `holidays`. */
  def build(spark: SparkSession, start: LocalDate, end: LocalDate,
      holidays: Set[LocalDate] = holidays2026): DataFrame = {
    import spark.implicits._
    val days = Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(!_.isAfter(end)).toSeq
    var seq = 0L
    val rows = days.map { d =>
      val session = d.getDayOfWeek != DayOfWeek.SATURDAY &&
        d.getDayOfWeek != DayOfWeek.SUNDAY && !holidays.contains(d)
      if (session) seq += 1
      (java.sql.Date.valueOf(d), session, seq)
    }
    rows.toDF("date", "is_session", "session_seq")
  }

  /** Attach `session_seq` (and `is_session`) of each row's `dateCol` via a
    * broadcast join. For a non-session date, session_seq is the seq of the
    * most recent prior session (so "next session" = seq+1 uniformly). */
  def withSessionSeq(df: DataFrame, cal: DataFrame, dateCol: String): DataFrame =
    df.join(broadcast(cal.select(col("date").as(dateCol),
      col("is_session"), col("session_seq"))), Seq(dateCol), "left")

  /** The date of session (session_seq + n) — join against the session-only
    * slice of the calendar. `n`=1 is "next trading day" (reference
    * get_next_trading_day). */
  def offsetSession(df: DataFrame, cal: DataFrame, n: Int): DataFrame = {
    val sessions = cal.where(col("is_session"))
      .select(col("session_seq").as("_target_seq"), col("date").as(s"session_plus_$n"))
    df.join(broadcast(sessions), col("session_seq") + n === col("_target_seq"), "left")
      .drop("_target_seq")
  }

  /** Trading sessions elapsed between two already-attached seq columns. */
  def sessionsBetween(fromSeq: Column, toSeq: Column): Column = toSeq - fromSeq
}
