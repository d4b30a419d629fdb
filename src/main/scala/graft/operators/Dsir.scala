package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw document
  * by how much its HASHED n-gram feature distribution looks like a TARGET
  * subset versus the raw corpus — log p_target(doc) - log p_raw(doc)
  * under bag-of-features unigram models. Pipelines then resample raw data
  * with probability proportional to exp(weight) to tilt a 100 TB crawl
  * toward a quality domain without training a classifier.
  *
  * Scale design (the q121 broadcast-LM shape):
  *  - features are md5-prefix hash buckets (256 of them) — the hashed
  *    feature space is FIXED size regardless of vocabulary, which is the
  *    DSIR trick that makes the model one tiny table.
  *  - both bucket-count censuses aggregate map-side into <= 256 rows
  *    each; the log-ratio table crosses back as ONE broadcast map row.
  *  - per-doc scoring is a pure projection: an in-order fold over the
  *    token stream against the broadcast map — the corpus is never
  *    shuffled, and the fold order makes the double sum bit-reproducible
  *    cross-engine.
  */
object Dsir {

  /** Hash bucket of a token: first 2 hex chars of md5 — 256 buckets,
    * identical strings in any engine with md5. */
  def bucket(tok: Column): Column = substring(md5(tok), 1, 2)

  /** Per-doc importance weight. `isTarget` marks the target subset
    * (e.g. lang = 'en', a quality-gated slice). Laplace (+1) smoothing
    * over the 256-bucket space on both models; weight = mean over tokens
    * of ln p_target(bucket) - ln p_raw(bucket). Output: input id column
    * plus (n_tok, weight). */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), isTarget.as("is_target"),
      split(lower(trim(col(textCol))), "\\s+").as("toks"))
    val exploded = toks.select(col("is_target"), explode(col("toks")).as("tok"))
      .select(col("is_target"), bucket(col("tok")).as("b"))
    val counts = exploded.groupBy(col("b"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("n_tgt"))
    val totals = counts.agg(sum(col("n_raw")).as("tot_raw"),
      sum(col("n_tgt")).as("tot_tgt"))
    // ln((c+1)/(tot+256)) per model; the single broadcast model row also
    // carries the c=0 smoothed fallback for buckets absent from the map
    // (possible when scoring data the model was not built on)
    def lnP(c: Column, tot: Column): Column =
      log((c + lit(1L)).cast("double") / (tot + lit(256L)).cast("double"))
    val model = counts.crossJoin(broadcast(totals))
      .agg(
        map_from_entries(collect_list(struct(col("b"),
          lnP(col("n_tgt"), col("tot_tgt")) - lnP(col("n_raw"), col("tot_raw")))))
          .as("lr"),
        (lnP(first(lit(0L)), first(col("tot_tgt"))) -
          lnP(first(lit(0L)), first(col("tot_raw")))).as("lr0"))
    toks.crossJoin(broadcast(model))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        (aggregate(col("toks"), lit(0.0d), (acc, t) =>
          acc + coalesce(element_at(col("lr"), bucket(t)), col("lr0"))) /
          size(col("toks")).cast("double")).as("weight"))
  }
}
