package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stylometric source profiling — Burrows' Delta (Burrows 2002), the
  * standard authorship/register distance: how far apart are two text
  * sources in their USE OF THE COMMONEST WORDS? Function-word rates
  * are topic-blind and author/register-stable, which is why Delta
  * separates styles where topical similarity (TF-IDF cosine, q124/q97
  * BM25) cannot. In a training-data pipeline this is the register
  * clustering readout: which sources write alike, which one is the
  * odd machine-generated voice out.
  *
  * Delta(s, s') = mean_w |z_w(s) − z_w(s')| over the corpus's top-K
  * words, with z_w the per-source relative frequency standardized
  * across sources (population σ). Words whose rate is CONSTANT across
  * sources carry no signal and are dropped loudly (n_words_dropped).
  *
  * Exactness: token counts are exact; each relative rate is one
  * division; the cross-source mean/σ folds and the per-pair |Δz|
  * folds run in source order / word order over bounded sorted arrays
  * (K ≤ topK words, sources census-scale). Tokenization is the q271
  * convention (lower, split on whitespace, drop empties); the top-K
  * pick ties (count desc, word asc) — pinned.
  *
  * Scale shape: one token explode (row-scale, map-side combined into
  * the word census), a broadcast top-K join, then everything is
  * (sources × K)-bounded. Output: (src_a, src_b, n_words,
  * n_words_dropped, delta) for every unordered source pair. */
object Stylometry {

  def burrowsDelta(df: DataFrame, sourceCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df
      .where(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(sourceCol).as("s"),
        explode(filter(split(lower(trim(col(textCol))), "\\s+"),
          t => t =!= "")).as("w"))
    val top = toks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w").asc).limit(topK)
      .select(col("w"))
    val totals = toks.groupBy(col("s")).agg(count(lit(1)).as("nt"))
    val cell = toks.join(broadcast(top), Seq("w"))
      .groupBy(col("s"), col("w")).agg(count(lit(1)).as("c"))
    // full source x word grid: a source that never uses a top word has
    // rate exactly 0 (dropping the cell would bias mu/sigma)
    val grid = totals.crossJoin(broadcast(top))
      .join(cell, Seq("s", "w"), "left")
      .select(col("s"), col("w"),
        (coalesce(col("c"), lit(0L)).cast("double") /
          col("nt").cast("double")).as("f"))
    // per word: mean and population sigma across sources, folded in
    // source order over the source-bounded array
    val stats = grid.groupBy(col("w")).agg(
      count(lit(1)).as("ns"),
      sort_array(collect_list(struct(col("s"), col("f")))).as("cells"))
    val sf = aggregate(col("cells"), lit(0.0d),
      (a, x) => a + x.getField("f"))
    val sq = aggregate(col("cells"), lit(0.0d),
      (a, x) => a + x.getField("f") * x.getField("f"))
    val nsD = col("ns").cast("double")
    val mu = col("__sf") / nsD
    val sigma = sqrt(greatest(col("__sq") / nsD - mu * mu, lit(0.0)))
    val wstats = stats.withColumn("__sf", sf).withColumn("__sq", sq)
      .select(col("w"), mu.as("mu"), sigma.as("sigma"))
    val z = grid.join(broadcast(wstats), Seq("w"))
      .select(col("s"), col("w"), col("sigma"),
        when(col("sigma") > 0.0,
          (col("f") - col("mu")) / col("sigma")).as("z"))
    val pairs = z.select(col("s").as("src_a"), col("w"),
        col("sigma"), col("z").as("za"))
      .join(z.select(col("s").as("src_b"), col("w"),
        col("z").as("zb")), Seq("w"))
      .where(col("src_a") < col("src_b"))
    pairs.groupBy(col("src_a"), col("src_b")).agg(
        sum(when(col("sigma") > 0.0, 1L).otherwise(0L)).as("n_words"),
        sum(when(col("sigma") > 0.0, 0L).otherwise(1L))
          .as("n_words_dropped"),
        sort_array(collect_list(when(col("sigma") > 0.0,
          struct(col("w"), abs(col("za") - col("zb")).as("dz")))))
          .as("cells"))
      .select(col("src_a"), col("src_b"), col("n_words"),
        col("n_words_dropped"),
        when(col("n_words") > 0L,
          aggregate(col("cells"), lit(0.0d),
            (a, x) => a + x.getField("dz")) /
            col("n_words").cast("double")).as("delta"))
  }
}
