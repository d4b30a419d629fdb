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

  /** RFM segmentation — the classic recency/frequency/monetary feature
    * table: per key, days since last activity, event count, total
    * value, each scored 1..B by EQUAL-FREQUENCY bucketing over the
    * population (recency inverted: most recent = highest score), and
    * the composite `rfm` = r·100 + f·10 + m. The feature-engineering
    * step behind churn models and audience segments.
    *
    * Exactness: bucketing is the calibration-curve census rule —
    * a metric tie-run's bucket is rows_before·B div N over the
    * metric's (value, count) census, so equal values never split and
    * nothing floats. Scale shape: one per-key aggregation, then three
    * census-sized bucket tables joined back on metric VALUE (each
    * census bounded by the metric's distinct values); the horizon is
    * a broadcast scalar. Output: (key, recency_days, frequency,
    * monetary, r_score, f_score, m_score, rfm). */
  def rfmScores(df: DataFrame, keyCol: String, dayCol: Column,
      valueCol: String, buckets: Int = 5): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val base = df.groupBy(col(keyCol))
      .agg(max(dayCol).as("__last"), count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("long")).as("monetary"))
    val horizon = base.agg(max(col("__last")).as("__wend"))
    val m = base.crossJoin(broadcast(horizon))
      .select(col(keyCol), datediff(col("__wend"), col("__last"))
        .cast("long").as("recency_days"), col("frequency"), col("monetary"))
      .localCheckpoint(true)
    def scored(metric: String, out: String, invert: Boolean): DataFrame = {
      val census = m.groupBy(col(metric)).agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(metric))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      // census-bounded global windows (distinct metric values)
      val b = census
        .withColumn("__before", coalesce(sum(col("__c")).over(w), lit(0L)))
        .withColumn("__tot", sum(col("__c")).over(wAll))
        .withColumn("__b",
          least(lit(buckets - 1L), expr(s"(__before * $buckets) div __tot")))
      b.select(col(metric),
        (if (invert) lit(buckets.toLong) - col("__b")
         else col("__b") + 1L).as(out))
    }
    m.join(scored("recency_days", "r_score", invert = true), "recency_days")
      .join(scored("frequency", "f_score", invert = false), "frequency")
      .join(scored("monetary", "m_score", invert = false), "monetary")
      .select(col(keyCol), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
          .as("rfm"))
  }
}
