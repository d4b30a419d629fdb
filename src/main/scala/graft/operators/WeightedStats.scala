package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact weighted order statistics. The weighted median ("the price at
  * which half the QUANTITY sits below") is the inventory/risk summary
  * plain medians get wrong when rows carry unequal mass.
  *
  * Implementation: per-group cumulative weight over the (value, tie)
  * order; the weighted median is the first value whose doubled
  * cumulative mass reaches the group total. With integral weights the
  * cumulative sums are exact, so the crossing row — and therefore the
  * result — is deterministic and engine-replayable.
  *
  * Scale: this is the EXACT path (one per-group sort of the narrow
  * (group, value, weight) projection — the q10 exact-percentile
  * family). At 100 TB the GK sketch ([[Sketches.approxQuantiles]])
  * is the approximate stand-in; this operator remains for the
  * medium-cardinality groups where exactness is required. */
object WeightedStats {

  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, tieCols: Seq[String]): DataFrame = {
    val order: Seq[Column] = col(valueCol) +: tieCols.map(col)
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    val wAll = Window.partitionBy(col(groupCol))
    df.select((Seq(groupCol, valueCol, weightCol) ++ tieCols).distinct.map(col): _*)
      .withColumn("cum", sum(col(weightCol)).over(wOrd))
      .withColumn("tot", sum(col(weightCol)).over(wAll))
      .where(col("cum") * 2 >= col("tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("weighted_median"),
        max(col("tot")).as("total_weight"))
  }
}
