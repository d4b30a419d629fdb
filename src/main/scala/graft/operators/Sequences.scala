package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-1 Markov transition census over per-key event sequences — the
  * behavioral-model building block (next-action prediction features,
  * anomalous-flow detection, session simulators all start from the
  * (prev_state, state) count matrix).
  *
  * Scale shape: one window partitioned by the sequence key computes the
  * lag (keys are users/sessions — bounded partitions, no global sort),
  * then the census groups by (prev, curr) — a state-space-sized result
  * however long the history. The row probability is ONE correctly-
  * rounded division of two exact integer counts, so results replay
  * bit-identically in any engine. */
object Sequences {

  /** Transition counts and row-conditional probabilities. `orderCols`
    * must totally order events within a key (include a unique id as
    * tiebreak). Output: (prev, curr, n_transitions, prob). */
  def transitionCensus(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val c = df
      .withColumn("prev", lag(col(stateCol), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col(stateCol).as("curr"))
      .agg(count(lit(1)).as("n_transitions"))
    // per-prev totals are state-space-sized: broadcast back, no window
    val tot = c.groupBy(col("prev")).agg(sum(col("n_transitions")).as("tot"))
    c.join(broadcast(tot), "prev")
      .select(col("prev"), col("curr"), col("n_transitions"),
        (col("n_transitions").cast("double") / col("tot").cast("double"))
          .as("prob"))
  }
}
