package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximations — the 100 TB path for statistics whose
  * exact forms (q10 exact percentiles, A15 distinct) require a full
  * shuffle of the data or per-group sorts. Both are mergeable sketches:
  * partial aggregation happens map-side, only fixed-size summaries
  * shuffle, so cost is O(groups), not O(rows). Spec-verified against the
  * exact operators with error tolerances (the sketches are not
  * bit-replayable in another engine — same situation as the xxhash
  * family, and the reason these are not oracle queries).
  */
object Sketches {

  /** Grouped approximate percentiles via the GK sketch
    * (`percentile_approx`). `accuracy` trades memory for error:
    * rank error <= 1/accuracy. */
  def approxQuantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    val aggs: Seq[Column] = probs.map(p =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Grouped approximate distinct counts via HyperLogLog++
    * (`approx_count_distinct`), relative error ~`rsd`. */
  def approxDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(keyCol), rsd).as("approx_distinct"))
}
