package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-profiling census — the Deequ/TFDV-style data-quality summary
  * a pipeline computes on every ingest: per column, row/null/distinct
  * counts and the modal value with its frequency. Catching a
  * cardinality collapse or a null-rate spike BEFORE training is the
  * cheapest data-bug defense there is.
  *
  * Scale shape: one value-census shuffle per profiled column (map-side
  * combined), then single-row aggregates — nothing driver-side, output
  * bounded by the column count. The mode is min(struct(-cnt, value)):
  * deterministic under ties (smallest value among the most frequent),
  * no window, no sort. Values are profiled through their STRING cast;
  * callers should profile string/integer columns (double repr is
  * engine-sensitive). */
object Profile {

  /** Output: (col_name, n_rows, n_null, n_distinct, mode_value,
    * mode_freq) — one row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val vals = df.select(col(c).cast("string").as("v"))
      val counts = vals.agg(count(lit(1)).as("n_rows"),
        count(col("v")).as("n_nonnull"))
      val census = vals.where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      val dist = census.agg(count(lit(1)).as("n_distinct"),
        min(struct(negate(col("cnt")).as("nc"), col("v").as("v"))).as("m"))
      counts.crossJoin(dist).select(
        lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"),
        col("m.v").as("mode_value"),
        negate(col("m.nc")).as("mode_freq"))
    }.reduce(_ unionByName _)
}
