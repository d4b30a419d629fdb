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

  /** Full quantile normalization onto the POOLED distribution — the
    * cross-source harmonization [[rankNormalize]] stops short of:
    * rank-normalize puts every group on [0, 1]; this maps each group's
    * values onto the pooled value SCALE (microarray-style quantile
    * normalization), so "a 90th-percentile document from source g"
    * becomes the pooled 90th-percentile VALUE, and downstream absolute
    * thresholds mean the same thing for every source.
    *
    * Entirely integer: per-(scope, group, value) and pooled censuses
    * with cumulative counts; a group value at upper rank `cum` of
    * `n_g` maps to the pooled value at rank k = ⌈cum·N/n_g⌉ (exact
    * integer ceil-division), found by MERGING the two censuses and
    * taking min-over-following-pooled-rows in one window — no per-row
    * sort, no non-equi join, no floats anywhere (the
    * [[graft.operators.Divergence.wassersteinFromCensus]] merged-census
    * discipline). Bit-deterministic at any parallelism.
    *
    * Bounds: values are the caller's discretization (cents, bins), so
    * every window partitions at census scale; cum·N must fit a long —
    * per-scope rows ≤ ~3·10⁹, beyond which discretize coarser (the
    * contract is loud in the arithmetic, not silently lossy).
    *
    * Output: one row per (sc, g, v) with its count and the pooled
    * target value `v_norm`. */
  def quantileNormalize(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
    val wg = Window.partitionBy(col("sc"), col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wgn = Window.partitionBy(col("sc"), col("g"))
    val q = base.groupBy(col("sc"), col("g"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("sc"), col("g"), col("v"), col("cnt"),
        sum(col("cnt")).over(wg).as("cum"),
        sum(col("cnt")).over(wgn).as("ng"))
    val wp = Window.partitionBy(col("sc")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wpn = Window.partitionBy(col("sc"))
    val p = base.groupBy(col("sc"), col("v")).agg(count(lit(1)).as("pcnt"))
      .select(col("sc"), col("v").as("pv"),
        sum(col("pcnt")).over(wp).as("pcum"),
        sum(col("pcnt")).over(wpn).as("nn"))
    val qk = q.join(p.select(col("sc"), col("nn")).distinct(), "sc")
      .select(col("sc"), col("g"), col("v"), col("cnt"),
        expr("(cum * nn + ng - 1) div ng").as("key"))
    val merged = qk.select(col("sc"), col("key"), lit(0).as("tag"),
        col("g"), col("v"), col("cnt"), lit(null).cast("long").as("pv"))
      .unionByName(p.select(col("sc"), col("pcum").as("key"),
        lit(1).as("tag"), lit(null).cast(qk.schema("g").dataType).as("g"),
        lit(null).cast("long").as("v"), lit(null).cast("long").as("cnt"),
        col("pv")))
    // pooled values rise with pcum, so the first pooled row at or after
    // the target rank is the min pv among keys >= the target. Computed
    // as a RUNNING min over the key-DESCENDING traversal (tag desc puts
    // the equal-key pooled row before the query row, keeping ties
    // inclusive): an unbounded-FOLLOWING frame would be O(rows²) per
    // scope in Spark's WindowExec — the reversed running frame is O(rows)
    val wm = Window.partitionBy(col("sc"))
      .orderBy(col("key").desc, col("tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged.select(col("sc"), col("g"), col("v"), col("cnt"),
        col("tag"), min(col("pv")).over(wm).as("v_norm"))
      .where(col("tag") === 0)
      .select(col("sc"), col("g"), col("v"), col("cnt").as("n"),
        col("v_norm"))
  }
}
