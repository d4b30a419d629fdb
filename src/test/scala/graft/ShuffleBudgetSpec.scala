package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.scalatest.funsuite.AnyFunSuite

/** Runtime shuffle-VOLUME gates. PlanSpec pins plan shapes; these pin the
  * bytes actually moved: a "corpus never shuffles" design claim must show
  * up as near-zero shuffle data for the query, measured from the executed
  * plan's exchange metrics — evidence the 100 TB story holds in the
  * runtime, not just in the optimizer. Budgets are generous multiples of
  * the observed values so host variance cannot flake them, while staying
  * orders of magnitude below what a corpus-wide reshuffle would move. */
class ShuffleBudgetSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.1" // 5,000 docs — big enough to see

  /** Executes `df` and sums the shuffle data size over every exchange in
    * the final (adaptive) plan, including reused/staged subtrees once.
    * The action MUST run through `df.queryExecution.toRdd` — a
    * `write.save()` plans a separate QueryExecution for the command, so
    * the instance walked here would stay unexecuted and read 0 bytes
    * everywhere (the positive control below guards exactly this). */
  private def shuffledBytes(df: DataFrame): Long = {
    val qe = df.queryExecution
    qe.toRdd.foreachPartition(_ => ())
    var total = 0L
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(p: SparkPlan): Unit = {
      if (seen.add(System.identityHashCode(p))) {
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case e: ShuffleExchangeExec =>
            total += e.metrics.get("dataSize").map(_.value)
              .orElse(e.metrics.get("shuffleBytesWritten").map(_.value))
              .getOrElse(0L)
            e.children.foreach(walk)
          case _: ReusedExchangeExec => () // counted at its original
          case other => other.children.foreach(walk)
        }
        p.subqueries.foreach(walk)
      }
    }
    walk(qe.executedPlan)
    total
  }

  test("positive control: the global shuffle index really moves the corpus") {
    // q105 hash-range-buckets the whole documents table by design; if the
    // harness reads ~zero here it is broken, not the query
    // 5,000 docs moved as narrow keyed rows (~75 B/row, no text) — the
    // operator shuffles KEYS by design, so ~370 KiB is the whole corpus
    val moved = shuffledBytes(SparkEntry.queries("q105_global_shuffle")(spark, dir))
    assert(moved > (200L << 10), s"expected > 200 KiB shuffled, saw $moved")
  }

  test("q111 incremental dedup shuffles only batch-bounded data") {
    // corpus (5,000 docs, ~4 MiB of text) streams scan->verify with zero
    // hash exchange; only batch bands / pair ids / tiny aggs shuffle
    val moved = shuffledBytes(SparkEntry.queries("q111_incremental_dedup")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (2L << 20), s"corpus leaked into a shuffle: $moved bytes")
  }

  test("q121 LM scoring shuffles only the vocab census, never the corpus") {
    val moved = shuffledBytes(SparkEntry.queries("q121_lm_score")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (4L << 20), s"corpus leaked into a shuffle: $moved bytes")
  }

  test("q128 boilerplate removal shuffles only the line census") {
    val moved = shuffledBytes(SparkEntry.queries("q128_boilerplate")(spark, dir))
    // census moves (line, doc) pairs once; reassembly must move nothing
    assert(moved > 0, "harness read zero — measurement broken")
    val censusCeiling = 24L * 1024 * 1024
    assert(moved < censusCeiling, s"reassembly leaked into a shuffle: $moved bytes")
  }

  test("q133 DSIR scoring shuffles only the 256-bucket censuses, never the corpus") {
    val moved = shuffledBytes(SparkEntry.queries("q133_dsir")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    // the (bucket)-keyed counts are <= 256 rows per side; ~4 MiB of doc
    // text must not appear in any exchange
    assert(moved < (2L << 20), s"corpus leaked into a shuffle: $moved bytes")
  }

  test("q139 bigram scoring shuffles only the model censuses, never the corpus") {
    val moved = shuffledBytes(SparkEntry.queries("q139_bigram_lm")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (2L << 20), s"corpus leaked into a shuffle: $moved bytes")
  }

  test("q154 bootstrap replicates shuffle only the (lang, replicate) census") {
    // weights are a pure projection (no RNG state, no join); the only
    // exchange carries 25 partially-aggregated census rows per partition
    val moved = shuffledBytes(SparkEntry.queries("q154_poisson_bootstrap")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (1L << 20), s"replicate explosion leaked: $moved bytes")
  }

  test("q158 sampling plan shuffles only per-source censuses, never document text") {
    // three (source)-keyed censuses of narrow rows; the 20-row plan
    // broadcasts back and the text column never enters an exchange
    val moved = shuffledBytes(SparkEntry.queries("q158_sampling_plan")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (2L << 20), s"corpus leaked into a shuffle: $moved bytes")
  }

  test("q170 CMS shuffles only the fixed d*w cell census, never the tokens") {
    // ~1.3 M token occurrences reduce map-side to <= 2048 cells per
    // partition; the exchange carries cell partials plus the tiny
    // probe-side aggs — nothing token-shaped
    val moved = shuffledBytes(SparkEntry.queries("q170_cms_counts")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (2L << 20), s"token stream leaked into a shuffle: $moved bytes")
  }

  test("q171/q174 bounded-k sampling shuffles k-row heaps, not the corpus") {
    val s = shuffledBytes(SparkEntry.queries("q171_priority_sample")(spark, dir))
    assert(s > 0, "harness read zero — measurement broken")
    assert(s < (1L << 20), s"priority sample leaked the corpus: $s bytes")
    val c = shuffledBytes(SparkEntry.queries("q174_domain_cap")(spark, dir))
    assert(c > 0, "harness read zero — measurement broken")
    assert(c < (2L << 20), s"domain cap leaked the corpus: $c bytes")
  }

  test("q179 power iteration shuffles one combiner row per partition") {
    // the Gram pass aggregates 2,080 static sums map-side; only final
    // combiner rows move, and the iteration itself is driver state
    val moved = shuffledBytes(SparkEntry.queries("q179_power_iteration")(spark, dir))
    assert(moved < (4L << 20), s"Gram pass leaked vectors: $moved bytes")
  }

  test("q239 KS moves the value census, never the event rows") {
    // 100k events collapse to <= ~49k distinct cents; census rows +
    // the bucket-offset table are all that exchange
    val moved = shuffledBytes(SparkEntry.queries("q239_ks_drift")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (4L << 20), s"event rows leaked into a shuffle: $moved bytes")
  }

  test("q253/q264 centroid censuses shuffle labels x dims, never vectors") {
    val d = shuffledBytes(SparkEntry.queries("q253_centroid_drift")(spark, dir))
    assert(d > 0, "harness read zero — measurement broken")
    assert(d < (1L << 20), s"vectors leaked into a shuffle: $d bytes")
    val s = shuffledBytes(SparkEntry.queries("q264_label_separation")(spark, dir))
    assert(s < (1L << 20), s"vectors leaked into a shuffle: $s bytes")
  }

  test("q247 rendezvous resharding shuffles only the 16-key census") {
    val moved = shuffledBytes(SparkEntry.queries("q247_reshard")(spark, dir))
    assert(moved < (1L << 20), s"assignment leaked the corpus: $moved bytes")
  }

  test("q256/q261 tail fits shuffle censuses, not events") {
    val p = shuffledBytes(SparkEntry.queries("q256_power_law")(spark, dir))
    assert(p < (4L << 20), s"power-law fit leaked events: $p bytes")
    val g = shuffledBytes(SparkEntry.queries("q261_gumbel_extremes")(spark, dir))
    assert(g < (8L << 20), s"gumbel fit leaked events: $g bytes")
  }

  test("q276/q285 profile censuses shuffle digit/category rows, never the scan") {
    val b = shuffledBytes(SparkEntry.queries("q276_benford")(spark, dir))
    assert(b > 0, "harness read zero — measurement broken")
    // 3 flags x 9 digits census + margins: far under the 600k-row scan
    assert(b < (256L << 10), s"benford leaked the lineitem scan: $b bytes")
    val w = shuffledBytes(SparkEntry.queries("q285_woe")(spark, dir))
    assert(w < (256L << 10), s"woe leaked the event rows: $w bytes")
  }

  test("q280 PQ moves scored code rows, never the float vectors") {
    val moved = shuffledBytes(SparkEntry.queries("q280_pq_adc")(spark, dir))
    // top-k window over (probe, corpus, adist) triples; the 64-dim
    // double vectors (~5x the code rows) must stay in place
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (8L << 20), s"vectors leaked into a shuffle: $moved bytes")
  }

  test("q290/q294 rank/spread tests shuffle value censuses, never events") {
    val kw = shuffledBytes(SparkEntry.queries("q290_kruskal_wallis")(spark, dir))
    assert(kw > 0, "harness read zero — measurement broken")
    assert(kw < (8L << 20), s"kruskal-wallis leaked event rows: $kw bytes")
    val bf = shuffledBytes(SparkEntry.queries("q294_brown_forsythe")(spark, dir))
    assert(bf < (8L << 20), s"brown-forsythe leaked event rows: $bf bytes")
  }

  test("q292 silhouette shuffles k*dims centroid partials, never vectors") {
    val moved = shuffledBytes(SparkEntry.queries("q292_silhouette")(spark, dir))
    // 10 labels x 64 dims partial sums + the k-bounded label aggregate;
    // the float vectors cross only the broadcast, never an exchange
    assert(moved < (1L << 20), s"vectors leaked into a shuffle: $moved bytes")
  }

  test("q296 ROUGE-L is a pure projection: zero exchanges") {
    val moved = shuffledBytes(SparkEntry.queries("q296_rouge_l")(spark, dir))
    assert(moved == 0, s"per-row LCS scoring must not shuffle: $moved bytes")
  }

  test("q297/q298/q299 drift/audit censuses stay census-sized") {
    val w1 = shuffledBytes(SparkEntry.queries("q297_wasserstein")(spark, dir))
    assert(w1 > 0, "harness read zero — measurement broken")
    assert(w1 < (4L << 20), s"wasserstein leaked event rows: $w1 bytes")
    val lk = shuffledBytes(SparkEntry.queries("q298_split_leakage")(spark, dir))
    assert(lk < (2L << 20), s"leakage audit leaked event rows: $lk bytes")
    val th = shuffledBytes(SparkEntry.queries("q299_theil_between")(spark, dir))
    assert(th < (256L << 10), s"theil leaked the doc scan: $th bytes")
  }

  test("q305/q318 corpus-drift operators shuffle token censuses, never " +
      "document text") {
    // the (source, token) census and its marginals exchange; the 5,000
    // raw documents (~15 MB of text) must not
    val tv = shuffledBytes(SparkEntry.queries("q305_total_variation")(spark, dir))
    assert(tv > 0, "harness read zero — measurement broken")
    assert(tv < (24L << 20), s"document text leaked into a shuffle: $tv bytes")
    val js = shuffledBytes(SparkEntry.queries("q318_jensen_shannon")(spark, dir))
    // 256-bucket grid: orders of magnitude below even the token census
    assert(js < (2L << 20), s"token rows leaked past the bucket census: $js bytes")
  }

  test("q315/q319/q323 forecast audits shuffle score censuses, never " +
      "events") {
    val br = shuffledBytes(SparkEntry.queries("q315_brier_decomp")(spark, dir))
    assert(br > 0, "harness read zero — measurement broken")
    assert(br < (2L << 20), s"brier leaked event rows: $br bytes")
    val yo = shuffledBytes(SparkEntry.queries("q319_youden")(spark, dir))
    assert(yo < (2L << 20), s"youden leaked event rows: $yo bytes")
    val cg = shuffledBytes(SparkEntry.queries("q323_cum_gains")(spark, dir))
    assert(cg < (2L << 20), s"gains leaked event rows: $cg bytes")
  }

  test("q316 association rules shuffle basket items and pair censuses, " +
      "bounded by basket width") {
    // 150k (order, brand) pairs exchange for the self-join; the
    // lineitem scan itself (600k wide rows) must not
    val moved = shuffledBytes(SparkEntry.queries("q316_assoc_rules")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (24L << 20), s"lineitem rows leaked into a shuffle: $moved bytes")
  }

  test("q324 krippendorff shuffles unit censuses, never events") {
    val moved = shuffledBytes(SparkEntry.queries("q324_krippendorff")(spark, dir))
    assert(moved < (2L << 20), s"event rows leaked into a shuffle: $moved bytes")
  }

  test("q325 HLL set algebra shuffles fixed-size registers, never users") {
    // <= 256 registers x 3 arms (plus the exact-truth flag census,
    // user-bounded); nothing event-scale crosses an exchange
    val moved = shuffledBytes(SparkEntry.queries("q325_hll_intersect")(spark, dir))
    assert(moved < (2L << 20), s"event rows leaked into a shuffle: $moved bytes")
  }

  test("q335/q336/q338 experiment censuses shuffle scope cells, never " +
      "events") {
    for (q <- Seq("q335_welch_t", "q336_anova_f", "q338_stratified_ate")) {
      val moved = shuffledBytes(SparkEntry.queries(q)(spark, dir))
      assert(moved > 0, s"$q: harness read zero — measurement broken")
      assert(moved < (1L << 20), s"$q: events leaked into a shuffle: " +
        s"$moved bytes")
    }
  }

  test("q339 isotonic shuffles bin censuses and the bins-squared grid, " +
      "never rows") {
    val moved = shuffledBytes(SparkEntry.queries("q339_isotonic")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (2L << 20), s"rows leaked into a shuffle: $moved bytes")
  }

  test("q340 bayesian A/B shuffles the maxTerms-bounded term table, " +
      "never events") {
    val moved = shuffledBytes(SparkEntry.queries("q340_bayesian_ab")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (4L << 20), s"events leaked into a shuffle: $moved bytes")
  }

  test("q344/q347 census operators shuffle cells, never rows") {
    for (q <- Seq("q344_leave_one_out", "q347_info_gain_split")) {
      val moved = shuffledBytes(SparkEntry.queries(q)(spark, dir))
      assert(moved > 0, s"$q: harness read zero — measurement broken")
      assert(moved < (4L << 20), s"$q: rows leaked into a shuffle: " +
        s"$moved bytes")
    }
  }

  test("q343 quantile norm shuffles (scope, group, value) cells only") {
    // q343 discretizes at raw cents (~10k distinct), so at sf0.1 the
    // census is ~70% of row count BY THE CALLER'S CHOICE — the gate
    // bounds it at narrow-cell size (~16 MB observed); the scale_bench
    // `qnorm` shape is the real claim: exact-duplicate copies leave the
    // cell set IDENTICAL at 10x rows, so window input doesn't grow
    val moved = shuffledBytes(SparkEntry.queries("q343_quantile_norm")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    assert(moved < (24L << 20), s"cells outgrew the census bound: $moved")
  }

  test("q345 negative sampling shuffles the vocab census and k draws, " +
      "never tokens") {
    val moved = shuffledBytes(SparkEntry.queries("q345_negative_samples")(spark, dir))
    assert(moved > 0, "harness read zero — measurement broken")
    // ~47k-token vocab census + 1000 draws; the exploded token stream
    // itself must never cross an exchange
    assert(moved < (8L << 20), s"tokens leaked into a shuffle: $moved bytes")
  }

  test("round-8 census statistics shuffle cells/censuses, never rows") {
    // JB/DW/chi2: one moment census per key; MK: day census + periods^2
    // pair signs; hurst/sax: period censuses; croston: user-day census
    for (q <- Seq("q354_jarque_bera", "q355_durbin_watson",
        "q356_chi_square", "q365_chao1", "q366_mann_kendall",
        "q368_hurst", "q369_sax_motifs", "q370_croston")) {
      val moved = shuffledBytes(SparkEntry.queries(q)(spark, dir))
      assert(moved > 0, s"$q: harness read zero — measurement broken")
      assert(moved < (8L << 20), s"$q: rows leaked into a shuffle: " +
        s"$moved bytes")
    }
  }
}
