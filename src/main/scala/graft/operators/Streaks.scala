package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Ordered-run analytics: max losing streak (W12), max drawdown (W13),
  * gaps-and-islands. Two implementations of the streak — a declarative
  * gaps-and-islands plan and a typed Aggregator — cross-checked in tests
  * (SURVEY.md §7.3).
  */
object Streaks {

  /** W12 max run length of rows satisfying `losing`, per `key`, ordered by
    * `ord` — classic gaps-and-islands: the island id is the running count
    * of non-losing rows; group by (key, island) and take the max size.
    * Two window passes + one aggregate: shuffles once on `key`.
    */
  def maxStreak(df: DataFrame, key: Column, ord: Column, losing: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = df
      .withColumn("_key", key)
      .withColumn("_losing", losing)
      .withColumn("_island", sum(when(losing, 0).otherwise(1)).over(w))
    islands
      .where(col("_losing"))
      .groupBy(col("_key"), col("_island"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col("_key"))
      .agg(max(col("_len")).as("max_streak"))
  }

  /** W13 max drawdown over an ordered value series per key:
    * max over t of (peak_{<=t} - v_t) / peak_{<=t}.
    */
  def maxDrawdown(df: DataFrame, key: Column, ord: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("_key", key)
      .withColumn("_peak", max(value).over(w))
      .withColumn("_dd", (col("_peak") - value) / col("_peak"))
      .groupBy(col("_key"))
      .agg(round(max(col("_dd")), 6).as("max_drawdown"))
  }

  /** Typed Aggregator equivalent of [[maxStreak]] over an ordered stream of
    * booleans (true = losing). NOT order-agnostic: apply after
    * a sortWithinPartitions on the group ordering, or over
    * collect_list-ordered input. Used as the cross-check implementation.
    */
  class MaxStreakAgg extends Aggregator[Boolean, (Int, Int), Int] {
    def zero: (Int, Int) = (0, 0) // (current run, best run)
    def reduce(b: (Int, Int), losing: Boolean): (Int, Int) = {
      val cur = if (losing) b._1 + 1 else 0
      (cur, math.max(b._2, cur))
    }
    // merge is only sound for single-partition groups (cross-check path)
    def merge(a: (Int, Int), b: (Int, Int)): (Int, Int) =
      (b._1, math.max(a._2, b._2))
    def finish(r: (Int, Int)): Int = r._2
    def bufferEncoder: Encoder[(Int, Int)] = Encoders.product[(Int, Int)]
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** Max streak over an ordered array column via a higher-order fold —
    * the third (pure-Catalyst, per-row) formulation. */
  def maxStreakOverList(ordered: Column): Column = {
    val folded = aggregate(
      ordered,
      struct(lit(0).as("cur"), lit(0).as("best")),
      (st, losing) => {
        val cur = when(losing, st.getField("cur") + 1).otherwise(lit(0))
        struct(cur.as("cur"), greatest(st.getField("best"), cur).as("best"))
      })
    folded.getField("best")
  }
}
