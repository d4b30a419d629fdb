package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-transform score normalization — the cross-corpus calibration
  * step before mixing: quality scores from different sources (a length
  * model here, a classifier there) live on incomparable scales, and a
  * mixture weighted on raw scores silently over-samples whichever
  * source scores loudest. Mapping every score to its within-group
  * mid-rank quantile puts all sources on the same [0, 1] axis (the
  * classic quantile-normalization / rank-INT move, minus the Gaussian
  * tail — downstream gates want percentiles, not z-scores).
  *
  * Scale shape (the [[Eval]] AUC lesson): a row-scale `percent_rank`
  * window would single-partition each group at corpus size. Instead
  * the corpus collapses to a per-(group, value) CENSUS — the only
  * row-scale aggregation, map-side combined — the cumulative count
  * runs over DISTINCT values per group (bounded by score cardinality,
  * thousands not billions), and rows join their value's stats back
  * (broadcast when the census fits, hash equi-join otherwise).
  *
  * Determinism: ties share one mid-rank by construction (no
  * row_number arbitrariness), the doubled mid-rank 2·|{<v}| +
  * |{=v}| + 1 is an exact integer at any parallelism, and the
  * normalized score is ONE correctly-rounded division of exact
  * integers — bit-replayable cross-engine.
  */
object Normalize {

  /** Within-group mid-rank quantile of `valueCol`: ties get the mean of
    * the ranks they span; output in (0, 1] strictly above 0 (the
    * minimum maps to (cnt_min+1)/2n, the maximum to 1 - (cnt_max-1)/2n).
    * Appends `outCol` (double) to the input rows; null values pass
    * through with a null rank. */
  def rankNormalize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      outCol: String = "norm_rank"): DataFrame = {
    val g = groupCols.map(col)
    val census = df.where(col(valueCol).isNotNull)
      .groupBy((g :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__nr_eq"))
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(g: _*)
    val ranked = census.select(
      (g :+ col(valueCol) :+
        (lit(2) * coalesce(sum(col("__nr_eq")).over(w), lit(0L)) +
          col("__nr_eq") + lit(1)).as("__nr_mid2") :+
        sum(col("__nr_eq")).over(wn).as("__nr_n")): _*)
    df.join(ranked, groupCols :+ valueCol, "left")
      .withColumn(outCol,
        col("__nr_mid2").cast("double") / (col("__nr_n") * 2).cast("double"))
      .drop("__nr_mid2", "__nr_n")
  }

  /** The census behind [[rankNormalize]], exposed for gates that want
    * band-level decisions without touching row scale: one row per
    * (group, value) with its count and mid-rank quantile. */
  def rankCensus(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    val census = df.where(col(valueCol).isNotNull)
      .groupBy((g :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("n_eq"))
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(g: _*)
    census.select((g :+ col(valueCol) :+ col("n_eq") :+
      ((lit(2) * coalesce(sum(col("n_eq")).over(w), lit(0L)) +
        col("n_eq") + lit(1)).cast("double") /
        (sum(col("n_eq")).over(wn) * 2).cast("double")).as("quantile")): _*)
  }
}
