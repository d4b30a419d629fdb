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

  /** Corpus snapshot diff — dataset versioning at digest grain: full
    * outer join of two snapshots on the id, comparing content digests,
    * rolled into a per-stratum census of added / removed / changed /
    * unchanged. The "what actually moved between crawl v3 and v4"
    * report a 100 TB corpus release ships with: at scale both sides
    * reduce to (id, digest, stratum) rows (~50 B each) BEFORE the
    * join, so the exchange carries keys and hashes, never text.
    *
    * Exactness: md5 digests of the raw text, integer censuses only.
    * Output per stratum: (stratum, n_old, n_new, n_added, n_removed,
    * n_changed, n_unchanged). Strata of rows present only in one
    * snapshot count in that side's totals (the stratum is taken from
    * whichever side has the row; a CHANGED row takes the new side's). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String, strataCol: String): DataFrame = {
    def keyed(df: DataFrame, side: String) = df.select(
      col(idCol).as("__id"), md5(col(textCol)).as(s"__d_$side"),
      col(strataCol).as(s"__s_$side"))
    keyed(oldDf, "old")
      .join(keyed(newDf, "new"), Seq("__id"), "full_outer")
      .select(coalesce(col("__s_new"), col("__s_old")).as("stratum"),
        col("__d_old"), col("__d_new"))
      .groupBy(col("stratum"))
      .agg(
        sum(when(col("__d_old").isNotNull, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("__d_new").isNotNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__d_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__d_new").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__d_old").isNotNull && col("__d_new").isNotNull &&
          col("__d_old") =!= col("__d_new"), 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("__d_old").isNotNull &&
          col("__d_old") === col("__d_new"), 1L).otherwise(0L))
          .as("n_unchanged"))
  }
}
