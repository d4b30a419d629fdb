package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index build — the retrieval-side artifact a corpus pipeline
  * emits next to BM25 scoring ([[Ranking]]): per term, the document
  * frequency and the delta-gap-encoded posting list (the form real
  * indexes compress, small gaps = good locality).
  *
  * Scale shape: the DF census partial-aggregates map-side and the DF
  * band filter [minDf, maxDf] runs BEFORE any per-term sort, so the
  * stopword head — the terms whose posting partitions would be
  * unboundedly hot — never reaches the window; every surviving window
  * partition is <= maxDf rows by construction. The semi-join, the gap
  * window, and the final aggregate all key on `token`, so one exchange
  * layout serves all three.
  *
  * Posting lists leave as a fingerprint (md5 over "first:gap,gap,...")
  * plus summary stats, not as materialized arrays — the operator's
  * output stays O(vocab), engine-replayable, and the fingerprint form
  * is what an index-equality audit compares anyway. */
object InvertedIndex {

  def build(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 2L, maxDf: Long = 100L): DataFrame = {
    val pairs = df.select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .where(col("token") =!= "").distinct()
    val kept = pairs.groupBy("token").agg(count(lit(1)).as("df"))
      .where(col("df").between(minDf, maxDf))
    val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    val withGap = pairs.join(kept, "token")
      .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1).over(w))
    withGap.groupBy(col("token"))
      .agg(max(col("df")).as("df"),
        min(col("doc_id")).as("first_doc"),
        // first posting has null gap; when() feeds collect_list a null
        // there, which collect_list skips — the joined list is exactly
        // the df-1 true gaps in doc order
        md5(concat(min(col("doc_id")).cast("string"), lit(":"),
          array_join(transform(
            array_sort(collect_list(when(col("gap").isNotNull,
              struct(col("doc_id"), col("gap"))))),
            s => s.getField("gap").cast("string")), ","))).as("postings_md5"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap"))
  }
}
