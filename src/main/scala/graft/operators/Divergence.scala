package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group distribution drift against the corpus: KL divergence of each
  * group's token distribution from the whole-corpus distribution, over
  * the same fixed 256-bucket md5-hashed feature space as [[Dsir]]. The
  * corpus-health monitor a training pipeline runs per source / per crawl
  * snapshot: a source whose divergence jumps is drifting (spam influx,
  * template change, encoding breakage) before any downstream metric
  * shows it.
  *
  * Scale shape: one (group, bucket)-keyed census (map-side combined,
  * <= 256 rows per group out), corpus marginals by a second tiny
  * aggregate of that census — the corpus is scanned once and never
  * shuffled at row grain. Divergence sums run over the SORTED bucket
  * list per group (an in-order fold), so the doubles are bit-reproducible
  * cross-engine despite being a multi-term float sum (up to 256 terms —
  * one per OBSERVED corpus bucket).
  */
object Divergence {

  /** KL(group || corpus) and reverse KL per group, Laplace(+1)-smoothed
    * over the OBSERVED corpus bucket support (smoothing over the fixed
    * 256 would de-normalize both distributions when the vocabulary is
    * small enough to miss buckets — p would sum below 1 and the "KL"
    * could go negative; over the observed support both sum to exactly 1
    * and Gibbs' inequality holds). Output: (group, n_tok, kl, kl_rev). */
  def sourceDivergence(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("grp"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .select(col("grp"), Dsir.bucket(col("tok")).as("b"))
    val cell = toks.groupBy(col("grp"), col("b")).agg(count(lit(1)).as("n"))
    val gTot = cell.groupBy(col("grp")).agg(sum(col("n")).as("g_tot"))
    val cAgg = cell.groupBy(col("b")).agg(sum(col("n")).as("c_n"))
    val cTot = cAgg.agg(sum(col("c_n")).as("c_tot"),
      count(lit(1)).as("n_buckets"))
    // per (group, bucket): smoothed p_g and p_c. A group can miss
    // buckets the corpus has — the join runs corpus-bucket-side so every
    // group sees all corpus buckets (n = 0 smoothed); buckets absent
    // from the whole corpus contribute a constant that cancels nothing
    // but is identical cross-engine only if both enumerate them, so the
    // space is the OBSERVED corpus buckets (the corpus defines the
    // support; at 256 tiny buckets over any real corpus all are hit).
    val grid = gTot.crossJoin(cAgg).crossJoin(broadcast(cTot))
      .join(cell, Seq("grp", "b"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("p_g", (col("n") + lit(1L)).cast("double") /
        (col("g_tot") + col("n_buckets")).cast("double"))
      .withColumn("p_c", (col("c_n") + lit(1L)).cast("double") /
        (col("c_tot") + col("n_buckets")).cast("double"))
      .withColumn("term", struct(col("b"),
        (col("p_g") * log(col("p_g") / col("p_c"))).as("kl"),
        (col("p_c") * log(col("p_c") / col("p_g"))).as("kl_rev")))
    grid.groupBy(col("grp"))
      .agg(first(col("g_tot")).as("n_tok"),
        array_sort(collect_list(col("term"))).as("terms"))
      .select(col("grp"), col("n_tok"),
        foldSum(col("terms"), "kl").as("kl"),
        foldSum(col("terms"), "kl_rev").as("kl_rev"))
  }

  /** In-order fold over the bucket-sorted term list — deterministic
    * double summation (the q121/q133 pattern). */
  private def foldSum(terms: Column, field: String): Column =
    aggregate(terms, lit(0.0d), (acc, t) => acc + t.getField(field))
}
