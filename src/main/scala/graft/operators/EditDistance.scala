package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-level near-duplicate detection: blocked candidate
  * generation + exact Levenshtein verification — the edit-distance
  * complement to token-level MinHash ([[Dedup]]): OCR/encoding noise,
  * typo farms and template fills differ by a few CHARACTERS, which
  * 5-token shingles blow apart but a distance-3 edit ball catches.
  *
  * Scale shape: all-pairs Levenshtein is unrunnable (O(n²) pairs ×
  * O(len²) DP each), so candidates come from an equi-join on a text
  * prefix block plus a length band (|len_a - len_b| <= maxDist is a
  * Levenshtein lower bound — free pruning before the DP). Prefix
  * blocking is the documented recall trade-off: an edit inside the
  * first `prefixLen` chars escapes the block (standard
  * sorted-neighborhood assumption; pair with [[Dedup]] for
  * token-level recall). Verification uses Spark's thresholded
  * Levenshtein — the DP lane is capped at maxDist, O(len·maxDist)
  * per pair instead of O(len²). */
object EditDistance {

  /** Pairs with edit distance <= `maxDist` among rows sharing a
    * `prefixLen`-char block. Output: (id_a, id_b, dist), id_a < id_b,
    * exact distances. */
  def blockedPairs(df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int, maxDist: Int): DataFrame = {
    val t = df.select(col(idCol).as("id"), col(textCol).as("t"),
      substring(col(textCol), 1, prefixLen).as("blk"),
      length(col(textCol)).as("len"))
    val a = t.select(col("blk"), col("id").as("id_a"), col("t").as("ta"),
      col("len").as("la"))
    val b = t.select(col("blk"), col("id").as("id_b"), col("t").as("tb"),
      col("len").as("lb"))
    a.join(b, "blk")
      .where(col("id_a") < col("id_b") &&
        abs(col("la") - col("lb")) <= maxDist)
      // threshold variant: abandons the DP past maxDist, returns -1
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
