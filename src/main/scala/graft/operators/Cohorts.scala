package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — the product-analytics triangle every event
  * pipeline ends up drawing: users grouped by their FIRST-seen day,
  * tracked by how many come back k days later. Lives next to
  * [[Sequences]] (flows) and the funnel/sessionization queries as the
  * population-level engagement census.
  *
  * Scale shape: two integer censuses — (user → cohort day) is one
  * user-keyed aggregation (min over the user's days), the triangle is
  * one (cohort, offset)-keyed distinct-user count whose output is
  * bounded by days², never rows or users. `countDistinct` keys the
  * exact-distinct shuffle by (cohort, offset, user) — at 100 TB swap
  * in [[Sketches.hllRegisters]] per cell if exactness can yield.
  * Integer counts and date arithmetic only: bit-replayable. */
object Cohorts {

  /** Retention triangle over an event table: `dayCol` must be a date
    * (or date-truncated timestamp) column expression. Output one row
    * per (cohort_day, day_offset) with the distinct returning users;
    * offset 0 is the cohort's own size. */
  def retentionTriangle(df: DataFrame, userCol: String,
      dayCol: Column): DataFrame = {
    val days = df.select(col(userCol).as("u"), dayCol.as("d")).distinct()
    val cohorts = days.groupBy(col("u")).agg(min(col("d")).as("cohort_day"))
    days.join(cohorts, "u")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** The triangle re-based as retention RATES: each (cohort, offset)
    * cell divided by its cohort size — one exact integer division per
    * cell, bounded output. */
  def retentionRates(df: DataFrame, userCol: String,
      dayCol: Column): DataFrame = {
    val tri = retentionTriangle(df, userCol, dayCol)
    val base = tri.where(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    tri.join(base, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        col("cohort_size"),
        (col("n_users").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }
}
