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
}
