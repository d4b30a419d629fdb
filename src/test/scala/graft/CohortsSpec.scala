package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cohorts

/** Cohort retention triangle (q231's operator, off-fixture). */
class CohortsSpec extends AnyFunSuite with SparkFixture {

  private def events = {
    import spark.implicits._
    // u1 first on d1, returns d2 and d4; u2 first on d1, never returns;
    // u3 first on d2, returns d3; duplicate same-day events collapse
    Seq(
      (1L, "2024-01-01"), (1L, "2024-01-01"), (1L, "2024-01-02"),
      (1L, "2024-01-04"),
      (2L, "2024-01-01"),
      (3L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("user_id", "day").select($"user_id", to_date($"day").as("day"))
  }

  test("triangle counts distinct returners per (cohort, offset)") {
    val got = Cohorts.retentionTriangle(events, "user_id", col("day"))
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("2024-01-01", 0) -> 2L, // u1, u2
      ("2024-01-01", 1) -> 1L, // u1
      ("2024-01-01", 3) -> 1L, // u1
      ("2024-01-02", 0) -> 1L, // u3
      ("2024-01-02", 1) -> 1L)) // u3
  }

  test("rates divide by the cohort's own day-0 size") {
    val got = Cohorts.retentionRates(events, "user_id", col("day"))
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getDouble(4))
      .toMap
    assert(got(("2024-01-01", 0)) === 1.0)
    assert(got(("2024-01-01", 1)) === 0.5)
    assert(got(("2024-01-02", 1)) === 1.0)
  }
}
