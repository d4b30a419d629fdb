package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys at cluster scale.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense — it only helps sort-merge joins
  * though, and only when partition stats reveal the skew. Salting handles
  * the remaining shapes: a known-hot equi-join key is split into
  * `saltBuckets` sub-keys on the big side, with the small-but-not-
  * broadcastable side replicated across the salt space. Classic trade:
  * right side grows by `saltBuckets`x in exchange for the hot key's rows
  * spreading over `saltBuckets` tasks.
  */
object Skew {

  /** Salted inner equi-join on `key`: `big` gets a random-but-deterministic
    * salt from its row content (hash-based, reproducible), `small` is
    * exploded across all salt values. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(struct(big.columns.map(col): _*)), lit(saltBuckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final merge on key — caps any single task's share of a hot key
    * at 1/saltBuckets of its rows. Supply the partial and final agg pairs
    * (e.g. partial sum -> final sum, partial count -> final sum). */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame =
    df.withColumn("_salt",
      pmod(hash(struct(df.columns.map(col): _*)), lit(saltBuckets)))
      .groupBy(col(key), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** Top frequency share per key — cheap skew diagnostic to decide whether
    * salting is warranted (hot-key share >> 1/shufflePartitions). */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).count()
    val total = counts.agg(sum("count").as("_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("count") / col("_total"), 6))
      .orderBy(col("count").desc)
      .limit(topN)
      .drop("_total")
  }

  /** One-row skew summary — the numbers that decide a join/agg strategy
    * BEFORE running it: `top1_share` (can one task absorb the hottest
    * key?), `topn_share` (is the heat concentrated or spread?), and
    * `eff_keys` = n²/Σc² (inverse Simpson — the number of equally-loaded
    * keys this distribution behaves like; eff_keys ≪ n_keys means salt
    * or broadcast, eff_keys ≈ shuffle partitions means the plan is
    * already balanced). Entropy is deliberately NOT used: it needs a
    * transcendental per key (an engine-replay seam), while Σc² is an
    * exact integer with the same decision power.
    *
    * Cost: one key census, one O(n_keys) moment pass, one bounded top-N
    * (TakeOrdered, never a full sort). Σc² accumulates in decimal so
    * 10^12-row hot keys cannot overflow; the three shares are the only
    * doubles and divide at the very end. */
  def skewSummary(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
    val totals = counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("top1_cnt"),
      sum(col("c").cast("decimal(38,0)") * col("c")).as("sq"))
    val topCnt = counts.orderBy(col("c").desc).limit(topN)
      .agg(sum(col("c")).as("topn_cnt"))
    totals.crossJoin(broadcast(topCnt))
      .select(col("n_rows"), col("n_keys"), col("top1_cnt"), col("topn_cnt"),
        col("sq").cast("double").as("sq_sum"),
        (col("top1_cnt").cast("double") / col("n_rows").cast("double")).as("top1_share"),
        (col("topn_cnt").cast("double") / col("n_rows").cast("double")).as("topn_share"),
        (col("n_rows").cast("double") * col("n_rows").cast("double") /
          col("sq").cast("double")).as("eff_keys"))
  }
}
