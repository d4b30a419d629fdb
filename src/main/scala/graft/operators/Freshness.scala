package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus freshness: how much genuinely NEW content each ingestion slice
  * contributes — the metric that tells a crawl pipeline when a source
  * has gone stale (re-serving content already held) versus still
  * yielding novel text. An n-gram is attributed to the slice holding its
  * FIRST occurrence (min doc id); a slice's novelty rate is the share of
  * its distinct n-grams that first appeared there.
  *
  * Scale shape: distinct-per-doc shingles come from the codegen'd
  * one-pass kernel ([[graft.functions.FastHash.shinglesValue]]); the
  * first-occurrence table is one (gram)-keyed min aggregate (map-side
  * combined) and slice presence one (slice, gram) distinct — all
  * shuffles key on the gram, which is uniform by construction. No
  * ordered scan: "first occurrence" is an aggregate, not a window, so
  * the computation parallelizes over any executor count.
  */
object Freshness {

  /** Per-slice novelty census: (slice, grams_seen, grams_novel,
    * novelty_rate). Slices are contiguous id ranges of `sliceSize` docs
    * (slice = floor(id / sliceSize)) — ingestion order in this data
    * model.
    *
    * Single gram-keyed shuffle: each gram's first doc and slice set come
    * out of ONE map-side-combined aggregate (the distinct-pairs + join
    * formulation shuffled the gram table twice more; measured 1.5s ->
    * 0.9s at sf0.1). The per-gram slice set is bounded by the slice
    * count — size `sliceSize` so that stays thousands, not millions, and
    * an ever-present boilerplate gram cannot blow up its row. */
  def noveltyBySlice(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, sliceSize: Long = 100L): DataFrame = {
    require(n >= 1 && sliceSize >= 1, s"n=$n sliceSize=$sliceSize")
    val grams = df.select(col(idCol).cast("long").as("doc_id"),
      explode(graft.functions.FastHash.shingles(col(textCol), n)).as("gram"))
    // integer `div`, not floor(double division): ids past 2^53 (synthetic
    // id-shift spaces at full scale) would round in the double path
    val perGram = grams
      .groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"),
        collect_set(expr(s"doc_id div $sliceSize")).as("slices"))
    perGram.select(col("first_doc"), explode(col("slices")).as("slice"))
      .groupBy(col("slice"))
      .agg(count(lit(1)).as("grams_seen"),
        sum(when(expr(s"first_doc div $sliceSize") === col("slice"), 1L)
          .otherwise(0L)).as("grams_novel"))
      .withColumn("novelty_rate",
        round(col("grams_novel").cast("double") /
          col("grams_seen").cast("double"), 4))
  }
}
