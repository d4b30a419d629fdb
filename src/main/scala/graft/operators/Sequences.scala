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

  /** Per-key mean transition surprise under the global order-1 model —
    * the behavioral anomaly score: a key whose transitions are rare
    * under the corpus-wide (prev → curr) MLE gets a high mean
    * −ln p(curr|prev). The q121 LM-scoring move applied to event
    * streams instead of tokens.
    *
    * Scale shape: the model is the state-space-sized census (broadcast
    * both ways); scoring is a broadcast join on (prev, curr) — the
    * event stream shuffles once, by key, for the fold. Per-key terms
    * fold IN (orderCols) ORDER via sort_array + a left aggregate, so
    * the double sum is bit-replayable (the q121 in-order-fold
    * precedent) — round the mean at the call site as a hash belt.
    * Keys with fewer than two events have no transitions and are
    * absent. Output: (keyCol, n_trans, mean_surprise). */
  def sequenceSurprise(df: DataFrame, keyCol: String, orderCols: Seq[String],
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val trans = df
      .withColumn("prev", lag(col(stateCol), 1).over(w))
      .where(col("prev").isNotNull)
      .select((Seq(col(keyCol), col("prev"), col(stateCol).as("curr")) ++
        orderCols.map(col)): _*)
    val census = trans.groupBy(col("prev"), col("curr"))
      .agg(count(lit(1)).as("cxy"))
    val tot = census.groupBy(col("prev")).agg(sum(col("cxy")).as("cx"))
    val model = census.join(broadcast(tot), "prev")
      .select(col("prev"), col("curr"),
        negate(log(col("cxy").cast("double") / col("cx").cast("double")))
          .as("__s"))
    trans.join(broadcast(model), Seq("prev", "curr"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct((orderCols.map(col) :+ col("__s").as("s")): _*))).as("__terms"))
      .select(col(keyCol),
        size(col("__terms")).cast("long").as("n_trans"),
        (expr("aggregate(transform(__terms, t -> t.s), cast(0.0 as double), " +
          "(acc, x) -> acc + x)") / size(col("__terms"))).as("mean_surprise"))
  }
}
