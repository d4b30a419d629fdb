package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation over data-scale predictions — the exact AUC a
  * pipeline computes for its quality/toxicity/language classifiers
  * before trusting them to gate a corpus.
  *
  * AUC == the Mann-Whitney statistic: P(score_pos > score_neg) + 0.5 *
  * P(tie). Computed WITHOUT ranking rows: collapse predictions to a
  * per-(group, score) census of positive/negative counts — the only
  * shuffle, partial-aggregated map-side — then one cumulative window
  * over DISTINCT score values per group:
  * U = sum_v[ np(v) * cum_nn(<v) ] + 0.5 * sum_v[ np(v) * nn(v) ].
  * A billion predictions with 4-decimal scores collapse to <=10^4
  * window rows per group; the window never sees row-scale data (the
  * q105 lesson: global row sorts die, bounded censuses don't — callers
  * should discretize continuous scores for exactly this reason).
  *
  * Determinism: both U terms are integer sums (exact at any
  * parallelism); the only float ops are one 0.5 scaling and one
  * division in a fixed shape — bit-replayable cross-engine. */
object Eval {

  /** Per group: n_pos, n_neg, and exact tie-aware AUC of `scoreCol`
    * against binary `labelCol` (1 = positive, anything else negative).
    * Groups with no positives or no negatives yield null AUC. */
  def auc(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    val census = df.select(col(groupCol).as("g"), col(scoreCol).as("s"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("p"))
      .groupBy("g", "s")
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("nn"))
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    census.withColumn("cum_nn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * col("cum_nn")).as("u_strict"),
        sum(col("np") * col("nn")).as("u_ties"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("u_strict").cast("double") + lit(0.5) * col("u_ties").cast("double")) /
            (col("n_pos").cast("double") * col("n_neg").cast("double"))))
      .select(col("g").as(groupCol), col("n_pos"), col("n_neg"),
        col("u_strict"), col("u_ties"), col("auc"))
  }
}
