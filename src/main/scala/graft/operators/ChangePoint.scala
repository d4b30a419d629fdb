package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUSUM change-point detection — the sequential drift monitor (Page
  * 1954): the one-sided statistic s_t = max(0, s_{t-1} + (x_t − μ − k))
  * accumulates only SUSTAINED upward departures from the series' own
  * mean; crossing h alarms far earlier than any fixed per-point
  * threshold on noisy counts. The pipeline use: volume/error-rate
  * shift detection per source before a drifted feed poisons a
  * training snapshot ([[Divergence]] sees distribution drift; this
  * sees level shifts in time).
  *
  * Scale shape: the input should already be a (key, period, value)
  * census — the row-scale aggregation happens upstream — so state here
  * is one sorted per-key series (bounded by periods, never events).
  * The recurrence folds IN PERIOD ORDER via the aggregate HOF with a
  * fixed-shape four-field state; every field of each step re-derives
  * s_t from acc.s alone (no sibling reads), which is exactly the shape
  * DuckDB's list_reduce replays field-for-field — bit-identical
  * doubles end-to-end (the q40 MACD fold contract). */
object ChangePoint {

  /** Per-key CUSUM summary: (key, n_obs, mean, n_alarms, first_alarm,
    * max_stat). `slack` is the per-step allowance k (drift below μ+k
    * never accumulates); `threshold` is the alarm level h. The target
    * μ is the key's own series mean — self-calibrated, exact division
    * of exact sums. Ord values compare as strings — zero-padded
    * period labels (ISO dates, yyyy-MM-dd) are the contract. */
  def cusumSummary(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, slack: Double, threshold: Double): DataFrame = {
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(col(valueCol).cast("double")).as("__sx"),
        sort_array(collect_list(struct(col(ordCol).cast("string").as("o"),
          col(valueCol).cast("double").as("x")))).as("__series"))
      .withColumn("mean", col("__sx") / col("n_obs"))
    // field order (na, fa, mx, s) keeps every reader of acc.s ahead of
    // the field that overwrites s — the list_reduce aliasing defense
    val sNext = s"greatest(CAST(0.0 AS DOUBLE), acc.s + e.x - mean - $slack)"
    val fold =
      s"""aggregate(__series,
         |  struct(CAST(0 AS BIGINT) AS na, CAST(NULL AS STRING) AS fa,
         |         CAST(0.0 AS DOUBLE) AS mx, CAST(0.0 AS DOUBLE) AS s),
         |  (acc, e) -> struct(
         |    acc.na + IF($sNext >= $threshold, CAST(1 AS BIGINT), CAST(0 AS BIGINT)) AS na,
         |    coalesce(acc.fa, IF($sNext >= $threshold, e.o, CAST(NULL AS STRING))) AS fa,
         |    greatest(acc.mx, $sNext) AS mx,
         |    $sNext AS s))""".stripMargin
    g.withColumn("__f", expr(fold))
      .select(col(keyCol), col("n_obs"), col("mean"),
        col("__f.na").as("n_alarms"), col("__f.fa").as("first_alarm"),
        col("__f.mx").as("max_stat"))
  }
}
