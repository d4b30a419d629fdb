package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: collapse an ordered stream
  * of per-key attribute observations (daily snapshot loads, CDC events)
  * into validity ranges — the "what did this row look like on date D"
  * table every warehouse keeps. The reference's pipeline truncate-loads
  * daily snapshots (SURVEY §2.1 S14) and keeps only the latest state;
  * type-2 is the standard history-preserving upgrade of that load.
  *
  * Pure gaps-and-islands: two per-key row_numbers difference into an
  * island id per run of consecutive equal attribute values, one census
  * per island, and a per-key `lead` closes each range with the next
  * range's start. Every window and aggregation partitions by the
  * dimension key — the shuffle is one hash exchange on key, nothing
  * global, so the operator scales with the hottest key's history (a few
  * thousand snapshots), not the table.
  */
object Scd {

  /** Type-2 ranges for `attrCol` per `keyCol`, ordered by (`orderCol`,
    * `tieBreakCol`) (the tie-break makes same-instant observations
    * deterministic). Output per range: key, attribute value,
    * `valid_from` (first observation), `last_seen` (last observation in
    * the run), `n_rows`, `valid_to` (next range's valid_from; null on
    * the current range), `is_current`. */
  def type2History(df: DataFrame, keyCol: String, attrCol: String,
      orderCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieBreakCol))
    val wg = Window.partitionBy(col(keyCol), col(attrCol))
      .orderBy(col(orderCol), col(tieBreakCol))
    val ranges = df
      .withColumn("_rn", row_number().over(w))
      .withColumn("_island", col("_rn") - row_number().over(wg))
      .groupBy(col(keyCol), col(attrCol), col("_island"))
      .agg(min(col(orderCol)).as("valid_from"),
        max(col(orderCol)).as("last_seen"),
        count(lit(1)).as("n_rows"),
        min(col("_rn")).as("_ord"))
    val wl = Window.partitionBy(col(keyCol)).orderBy(col("_ord"))
    ranges
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wl))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_island", "_ord")
  }
}
