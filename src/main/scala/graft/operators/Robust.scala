package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection via MAD (median absolute
  * deviation) — the data-quality gate that survives the outliers it
  * hunts (a mean/stddev fence moves toward the junk it should flag;
  * the median fence does not). Two exact lower-median passes: the
  * group median, then the median of |x - median|; a row is an outlier
  * when |x - median| > k * 1.4826 * MAD (1.4826 scales MAD to sigma
  * under normality).
  *
  * Determinism: lower medians (first value whose doubled cumulative
  * count reaches the group total — [[WeightedStats]]'s crossing rule at
  * weight 1) are actual data values picked by integer arithmetic, no
  * interpolation, so there is no (a+b)/2-vs-a+(b-a)/2 IEEE seam between
  * engines; |x - med| is one exact subtraction, and the fence is a
  * fixed literal shape. Everything replays bit-for-bit in SQL.
  *
  * Scale: two per-group sorts of the narrow (group, value) projection —
  * the exact-path cost (q10 family, parallel across groups). At 100 TB
  * the GK sketch ([[Sketches.approxQuantiles]]) stands in for both
  * medians at the same fence formula. */
object Robust {

  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      tieCols: Seq[String], k: Double = 3.0): DataFrame = {
    val narrow = df.select((Seq(groupCol, valueCol) ++ tieCols).distinct.map(col): _*)
    def lowerMedian(in: DataFrame, vCol: String, out: String): DataFrame = {
      val order: Seq[Column] = col(vCol) +: tieCols.map(col)
      val wOrd = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      val wAll = Window.partitionBy(col(groupCol))
      in.withColumn("cum", sum(lit(1L)).over(wOrd))
        .withColumn("tot", sum(lit(1L)).over(wAll))
        .where(col("cum") * 2 >= col("tot"))
        .groupBy(col(groupCol))
        .agg(min(col(vCol)).as(out))
    }
    val med = lowerMedian(narrow, valueCol, "median")
    val withDev = narrow.join(med, groupCol)
      .withColumn("dev", abs(col(valueCol).cast("double") - col("median")))
    val mad = lowerMedian(withDev, "dev", "mad")
    withDev.join(mad, groupCol)
      .withColumn("fence", lit(k) * lit(1.4826) * col("mad"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        min(col("median")).as("median"),
        min(col("mad")).as("mad"),
        sum(when(col("dev") > col("fence"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Winsorized per-group census — the robust-scaling cousin of
    * [[madOutliers]]: clip an integral column to the group's exact
    * [pLo, pHi] discrete-quantile bounds and report the clipped moments.
    * The outlier treatment length-normalization pipelines apply before
    * averaging (a mean doc length is meaningless under a power-law tail;
    * the 5/95-winsorized mean is stable).
    *
    * Everything derives from ONE corpus aggregation — the (group,
    * DISTINCT value) census: quantile ranks come from a window over
    * distinct VALUES (a billion rows with 50k distinct lengths windows
    * 50k rows per group, never the corpus — the q191 discretized-score
    * move), and the clipped sums re-weight census rows (clamp(v)·c), so
    * the corpus is scanned once and never joined back.
    *
    * The rank rule is quantile_disc's ceil(p·n)-th smallest with the
    * threshold computed in INTEGER arithmetic — (n·pNum + pDen−1) div
    * pDen — because `ceil(0.05 · n)` in doubles rounds differently than
    * an engine computing it in decimal exactly when p·n lands on an
    * integer; the rational form has no such seam. Clipped sums stay in
    * BIGINT (v·c fits comfortably for char-scale values); the single
    * division producing the mean is the only double. */
  def winsorizedCensus(df: DataFrame, groupCol: String, valueCol: String,
      pLoNum: Int, pHiNum: Int, pDen: Int = 100): DataFrame = {
    require(0 <= pLoNum && pLoNum <= pHiNum && pHiNum <= pDen,
      s"need 0 <= $pLoNum <= $pHiNum <= $pDen")
    val g = col(groupCol)
    val census = df.groupBy(g, col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(g).orderBy(col("v"))
    val wAll = Window.partitionBy(g)
    val ranked = census
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("tot", sum(col("c")).over(wAll))
    val bounds = ranked.groupBy(g)
      .agg(
        min(when(col("cum") >= expr(s"(tot * $pLoNum + ${pDen - 1}) div $pDen"),
          col("v"))).as("p_lo"),
        min(when(col("cum") >= expr(s"(tot * $pHiNum + ${pDen - 1}) div $pDen"),
          col("v"))).as("p_hi"))
    val cv = least(greatest(col("v"), col("p_lo")), col("p_hi"))
    ranked.join(broadcast(bounds), groupCol)
      .groupBy(g)
      .agg(sum(col("c")).as("n_rows"),
        min(col("p_lo")).as("p_lo"),
        min(col("p_hi")).as("p_hi"),
        sum(when(col("v") < col("p_lo"), col("c")).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("v") > col("p_hi"), col("c")).otherwise(0L)).as("n_clip_hi"),
        sum(cv * col("c")).as("clip_sum"))
      .withColumn("clip_mean",
        col("clip_sum").cast("double") / col("n_rows").cast("double"))
  }
}
