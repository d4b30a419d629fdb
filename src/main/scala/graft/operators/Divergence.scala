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

  /** Mutual information between two categorical columns, in nats —
    * the dependence profiler: does the metadata column leak the label
    * (I > 0 says how hard), are two quasi-identifiers redundant, which
    * feature splits a mixture. I(A;B) = Σ_ab (c_ab/N)·ln(c_ab·N /
    * (c_a·c_b)), with the marginal entropies alongside so callers can
    * normalize (I <= min(H_A, H_B)).
    *
    * Scale shape: one (a, b)-keyed census — the only row-scale
    * aggregation — then everything runs on the cells (|A|·|B|-bounded):
    * marginals re-aggregate the census, and the MI/entropy sums fold
    * over the (a, b)-SORTED cell list in order, bit-reproducible
    * cross-engine ([[sourceDivergence]]'s contract). Integer counts
    * enter one fixed-shape double expression per term; no smoothing —
    * empty cells contribute 0 by the p·ln p convention, exactly as the
    * sum over observed cells computes. Output one row:
    * (n, n_cells, h_a, h_b, mi). */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cab"))
    val ma = cells.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val mb = cells.groupBy(col("b")).agg(sum(col("cab")).as("cb"))
    val n = cells.agg(sum(col("cab")).as("n"))
    def plogp(c: Column, tot: Column): Column =
      (c.cast("double") / tot.cast("double")) *
        log(c.cast("double") / tot.cast("double"))
    val joined = cells.join(ma, "a").join(mb, "b").crossJoin(broadcast(n))
      .select(col("a"), col("b"),
        ((col("cab").cast("double") / col("n").cast("double")) *
          log((col("cab").cast("double") * col("n").cast("double")) /
            (col("ca").cast("double") * col("cb").cast("double"))))
          .as("term"), col("n"))
    val mi = joined
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        sort_array(collect_list(struct(col("a"), col("b"), col("term"))))
          .as("terms"))
      .select(col("n"), col("n_cells"),
        aggregate(col("terms"), lit(0.0d), (acc, t) => acc + t.getField("term"))
          .as("mi"))
    val ha = ma.crossJoin(broadcast(n))
      .agg(sort_array(collect_list(struct(col("a"),
        negate(plogp(col("ca"), col("n"))).as("t")))).as("ts"))
      .select(aggregate(col("ts"), lit(0.0d), (acc, t) => acc + t.getField("t"))
        .as("h_a"))
    val hb = mb.crossJoin(broadcast(n))
      .agg(sort_array(collect_list(struct(col("b"),
        negate(plogp(col("cb"), col("n"))).as("t")))).as("ts"))
      .select(aggregate(col("ts"), lit(0.0d), (acc, t) => acc + t.getField("t"))
        .as("h_b"))
    mi.crossJoin(ha).crossJoin(hb)
      .select(col("n"), col("n_cells"), col("h_a"), col("h_b"), col("mi"))
  }
}
