package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: the properties that matter at 100 TB are
  * asserted, not eyeballed — predicate/column pushdown to the parquet
  * scan, broadcast of dimension sides, partition pruning on the layout
  * `io.Writers` produces, and whole-stage codegen on scalar paths. */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()

  test("q02: filters and column set reach the parquet scan") {
    val p = physical("q02_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(500))
    assert(p.contains("GreaterThanOrEqual(l_quantity,45.0)"))
    // pruned read schema: no l_tax/l_shipdate in the scan
    assert(!p.contains("l_shipdate"))
  }

  test("q03: both dimension joins broadcast") {
    val p = physical("q03_broadcast_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q04: semi join stays broadcast with single-column build side") {
    val p = physical("q04_semi_join")
    assert(p.contains("LeftSemi"))
    assert(p.contains("ReadSchema: struct<o_custkey:bigint>"), p.take(800))
  }

  test("scalar-function pipeline runs inside whole-stage codegen") {
    val p = physical("q50_string_funcs")
    assert(p.contains("*(1)"), p.take(500)) // the codegen-stage marker
  }

  test("partitioned layout prunes partitions on the date predicate") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-prune").toFile.getAbsolutePath + "/t"
    (1 to 100).map(i => (f"2026-01-${i % 5 + 1}%02d", i.toLong, i * 1.0))
      .toDF("scan_date", "id", "v")
      .write.partitionBy("scan_date").parquet(path)
    val q = spark.read.parquet(path).where(col("scan_date") === "2026-01-03")
    val p = q.queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters: [isnotnull(scan_date"), p.take(800))
    // only 1 of 5 partitions survives pruning
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .head.asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.partitionCount
    assert(scanned == 1)
  }

  test("bucketed tables join without an exchange (co-located layout)") {
    import spark.implicits._
    for (t <- Seq("graft_bkt_a", "graft_bkt_b")) spark.sql(s"DROP TABLE IF EXISTS $t")
    val a = (1 to 1000).map(i => (i % 50L, i)).toDF("k", "va")
    val b = (1 to 500).map(i => (i % 50L, i * 2)).toDF("k", "vb")
    graft.io.Writers.bucketedTable(a, "graft_bkt_a", "k", 8, sortCols = Seq("k"))
    graft.io.Writers.bucketedTable(b, "graft_bkt_b", "k", 8, sortCols = Seq("k"))
    val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
    // disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = joined.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
      assert(p.contains("SortMergeJoin"), p.take(400))
      assert(joined.count() == 10000) // 20 x 10 per key x 50 keys
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      for (t <- Seq("graft_bkt_a", "graft_bkt_b")) spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("q24: holdout split plans no window and broadcasts the median row") {
    val p = physical("q24_ntile_split")
    assert(!p.contains("Window"), p.take(800)) // the old ntile scale-killer
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800)) // 1-row median side
  }

  test("q85/q76: LSH candidate generation is an equi-join, never all-pairs") {
    for (q <- Seq("q85_lsh_recall", "q76_minhash_lsh")) {
      val p = physical(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(500)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(500)}")
    }
  }

  test("q87: vocabulary count partial-aggregates before the token shuffle") {
    val p = physical("q87_vocab")
    assert(p.contains("partial_count"), p.take(800)) // map-side combine
  }

  test("q89: decontamination semi-joins train shingles against a broadcast test set") {
    val p = physical("q89_decontaminate")
    assert(p.contains("LeftSemi"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q46: latest-row snapshot is one aggregation over one exchange, no window") {
    val p = physical("q46_latest_row")
    assert(!p.contains("Window"), p.take(600))
    assert("Exchange".r.findAllIn(p).size == 1, p.take(600)) // single shuffle on the key
  }

  test("q48: risk-field chain stays in one whole-stage codegen span over the scan") {
    val p = physical("q48_risk_fields")
    assert(p.contains("*(1)"), p.take(400)) // codegen stage marker
    assert(!p.contains("Exchange"), p.take(600)) // pure per-row map, no shuffle
  }

  test("as-of join plans one shuffle (union+window), not a range join") {
    val p = physical("q35_asof_join")
    // no nested-loop / cartesian from the inequality condition
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(800))
    // exactly one exchange keyed by user_id feeds the window
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("q102: bounded top-k plans a two-stage object aggregate, no window sort") {
    val p = physical("q102_topk_agg")
    // partial aggregation before the group-key exchange: only k-row
    // summaries shuffle, never raw order rows
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("q97: BM25 corpus stats attach via a one-row broadcast, corpus never reshuffles") {
    val p = physical("q97_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    // no hash-partitioned exchange of the document rows (only the final
    // top-k TakeOrdered and the 1-row stats aggregation remain)
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(p).hasNext, p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("q110: bloom pre-filter probes map-side, exact verify is a broadcast semi-join") {
    val p = physical("q110_bloom_decontaminate")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    // the probe is the codegen'd expression, not a Scala UDF — the scan +
    // probe filter must be one whole-stage-codegen span on the hot path
    assert(p.contains("graft_bloom_probe"), p.take(1200))
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      p.take(1200))
    // the bloom probe is a plain Filter over the scan — the big train
    // side must not hash-shuffle before it is thinned
    val verifyIdx = p.indexOf("LeftSemi")
    val preVerify = p.substring(verifyIdx)
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(preVerify).hasNext,
      preVerify.take(800))
  }

  test("q111: incremental dedup broadcasts the batch side, corpus never reshuffles") {
    val p = physical("q111_incremental_dedup")
    // band join: corpus bucket stream x broadcast batch buckets
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    // corpus rows stream straight from the scan into the verify join:
    // between the top BroadcastHashJoin on corpus_id and the corpus
    // FileScan there must be no Exchange (thinning semi-join and verify
    // both consume broadcasts; only tiny pair-id sets shuffle, inside
    // BroadcastExchange subtrees)
    val joinIdx = p.indexOf("BroadcastHashJoin [corpus_id")
    assert(joinIdx >= 0, p.take(1200))
    val scanIdx = p.indexOf("FileScan parquet", joinIdx)
    assert(scanIdx > joinIdx, p.take(1200))
    assert(!p.substring(joinIdx, scanIdx).contains("Exchange"),
      p.substring(joinIdx, scanIdx).take(1200))
    // and the band key never becomes a shuffle key
    assert(!"Exchange hashpartitioning\\(band".r.findAllIn(p).hasNext,
      p.take(1200))
  }

  test("q118: span detection joins on keys, never all-pairs, window is per-doc") {
    val p = physical("q118_dup_spans")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // the gaps-and-islands window partitions by doc_id — a global
    // (unpartitioned) window would single-thread the whole corpus
    assert(p.contains("Window"), p.take(800))
    assert("Exchange SinglePartition".r.findAllIn(p).isEmpty, p.take(1200))
  }

  test("q166: image hash pairs join on band buckets, never all-pairs") {
    val p = physical("q166_image_phash")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q167: sessionize windows partition by user — no global window, no single-partition exchange") {
    val p = physical("q167_sessionize")
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("user_id")),
      windowLines.mkString("\n"))
    assert("Exchange SinglePartition".r.findAllIn(p).isEmpty, p.take(1200))
  }

  test("q119: span masking plans hash aggregates, no span-text window") {
    val p = physical("q119_span_mask")
    // keep-first = min(struct) aggregation, NOT a window partitioned by
    // the span text (which would single-thread hot boilerplate spans)
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(l => !l.contains("span_text")), windowLines.mkString("\n"))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("Exchange SinglePartition".r.findAllIn(p).isEmpty, p.take(1200))
  }

  test("q121: LM scoring is a pure projection — vocab broadcasts, corpus never shuffles") {
    val p = physical("q121_lm_score")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(p).hasNext, p.take(1200))
  }

  test("q128: boilerplate reassembly is scan + broadcast hot set, no corpus shuffle") {
    val p = physical("q128_boilerplate")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    // the (doc_id, line) census exchange is the op's one legitimate
    // shuffle; what must NOT appear is a doc-keyed repartition of the
    // corpus itself (single-key doc_id exchange)
    assert(!"Exchange hashpartitioning\\(doc_id#\\d+L?, \\d+\\)".r.findAllIn(p).hasNext,
      p.take(1200))
  }

  test("q109: stop-strip corpus path is scan + broadcast array, no corpus shuffle") {
    val p = physical("q109_stop_strip")
    // the stop list crosses in as a one-row broadcast; the per-doc strip
    // is a pure projection — no exchange keyed by doc_id anywhere
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(p).hasNext, p.take(1200))
  }

  test("q130: SemDeDup assigns via broadcast fold; pairs meet on the cell key only") {
    val p = physical("q130_semdedup")
    // centroid table is ONE broadcast array row — assignment must not be
    // an all-pairs join or a corpus shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the within-cluster self-join meets on the cell id — either as a
    // cell-keyed exchange (big-stats plan) or, since the r13 census
    // fold removed the window's forced exchange, as a cell-keyed
    // broadcast hash join when the fixture-scale stats let Spark
    // broadcast the small side (degrades to the SMJ form at size)
    assert("Exchange hashpartitioning\\(cell".r.findAllIn(p).hasNext ||
      "BroadcastHashJoin \\[cell".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q133: DSIR scoring is a pure projection — model broadcasts, corpus never shuffles") {
    val p = physical("q133_dsir")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    // bucket censuses shuffle <= 256 (b)-keyed rows; the corpus itself is
    // never doc-keyed exchanged
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(p).hasNext, p.take(1200))
  }

  test("q132: paragraph keep-first plans hash aggregates, no digest window") {
    val p = physical("q132_para_dedup")
    // keep-first = min(struct) aggregation, NOT a window partitioned by
    // the paragraph digest (a hot boilerplate paragraph would
    // single-thread its partition) — the q119 pattern
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(l => !l.contains("digest")), windowLines.mkString("\n"))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("Exchange SinglePartition".r.findAllIn(p).isEmpty, p.take(1200))
  }

  test("q135: quantization encodes against a broadcast range row, corpus never shuffles") {
    val p = physical("q135_quantize")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    // the posexplode range census is (d)-keyed and 64 rows out; the
    // vectors themselves are never id-keyed exchanged
    assert(!"Exchange hashpartitioning\\(vec_id".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q142: decontamination masking is a pure projection over a broadcast shingle set") {
    val p = physical("q142_decontam_mask")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(p).hasNext, p.take(1200))
    // membership probes run through the binary-search kernel
    assert(p.contains("graft_sorted_lookup"), p.take(2000))
  }

  test("q139: bigram scoring is a pure projection — models broadcast, corpus never shuffles") {
    val p = physical("q139_bigram_lm")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(p).hasNext, p.take(1200))
    // the model lookup runs through the binary-search kernel, not a map scan
    assert(p.contains("graft_sorted_lookup"), p.take(2000))
  }

  test("q147: CDC census shuffles only digest-keyed aggregates — chunker in the scan projection") {
    val p = physical("q147_cdc_chunks")
    assert(p.contains("graft_cdc_chunks"), p.take(2000)) // one-pass kernel
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p.take(1200))
    // two keyed exchanges: (digest, width) census then width histogram
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p.take(1500))
  }

  test("q151: novelty is ONE gram-keyed exchange plus the slice census — no ordered scan") {
    val p = physical("q151_novelty_curve")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"), p.take(1200))
    assert("Exchange hashpartitioning\\(gram".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("q154: bootstrap weights are a pure projection — replicate census is the only shuffle") {
    val p = physical("q154_poisson_bootstrap")
    assert(!p.contains("Join"), p.take(1200)) // no RNG state, no join, no window
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("q158: the 20-row sampling plan broadcasts; the corpus is filtered in place") {
    val p = physical("q158_sampling_plan")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // the corpus side is never hash-exchanged on doc_id
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q161: PSI bounds cross as a broadcast scalar; one bucket-keyed census") {
    val p = physical("q161_psi_drift")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p.take(1200))
  }

  test("q196: wedge and closing joins are hash equi-joins, never all-pairs") {
    val p = physical("q196_triangles")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("q197: interval overlap runs as a (key, bucket) equi-join, never all-pairs") {
    val p = physical("q197_interval_overlap")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // the range predicates ride on the equi-join, not a nested loop
    assert(p.contains("Join") && p.contains("bkt"), p.take(1200))
  }

  test("q201: sweep is two-phase — both windows partitioned, no single-partition exchange") {
    val p = physical("q201_peak_concurrency")
    // a global (unpartitioned) sweep would surface as Exchange SinglePartition
    assert(!p.contains("Exchange SinglePartition"), p.take(1500))
    assert("Window ".r.findAllIn(p).size == 2, p.take(1500))
  }

  test("q212: z-layout shuffles once (bucket census); the domain row broadcasts") {
    val p = physical("q212_zorder_layout")
    // the data pays exactly ONE hash exchange — the per-bucket census;
    // the 1-row domain aggregate broadcasts back onto the scan
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
    assert(p.contains("BroadcastExchange"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1500))
  }

  test("q222: wedge census and degree joins are hash equi-joins, never all-pairs") {
    val p = physical("q222_link_pred")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // the top-20 cut is a bounded TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("q223: rank windows run on the value census, partitioned by source") {
    val p = physical("q223_rank_normalize")
    // both cumulative windows partition by source — no single-partition
    // row-scale window anywhere
    assert(!p.contains("Exchange SinglePartition"), p.take(1500))
    assert(p.contains("Window"), p.take(1500))
  }

  test("q226: the compaction plan windows by month, never one partition") {
    val p = physical("q226_compaction_plan")
    assert(!p.contains("Exchange SinglePartition"), p.take(1500))
  }

  test("q230: skyline never sorts globally; candidates collapse bounded") {
    val p = physical("q230_skyline")
    // no global Sort before the local scans — phase 1 runs on raw
    // partitions; the only single-partition hop is the skyline-sized
    // candidate repartition(1)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 1, p.take(1500))
  }

  test("q235: grouped quantiles shuffle the census, not the rows, once") {
    val p = physical("q235_grouped_quantiles")
    assert(!p.contains("Exchange SinglePartition"), p.take(1500))
    // one hash exchange for the (group, value) census; the windows and
    // the final min() reuse its partitioning (group ⊂ (group, value))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p.take(1500))
  }

  test("q239: KS cumulative walk is bucket-partitioned; only the bounds row is single-partition") {
    val p = physical("q239_ks_drift")
    // the prefix sums run as __b-partitioned windows over INTEGER
    // buckets (a double-division bucket id would give every distinct
    // value its own bucket and blow up the triangular offsets join)
    assert(p.contains("windowspecdefinition(__b"), p.take(2000))
    assert(!p.contains("knownfloatingpointnormalized"), p.take(2000))
    // single-partition hops exist only as 1-row scalar aggregates over
    // the checkpointed census (bounds rows) — never a Sort or Window
    assert(!p.contains("Sort [__v#") ||
      !"Exchange SinglePartition[\\s\\S]{0,200}Sort \\[__v".r.findFirstIn(p).isDefined,
      p.take(2000))
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 3, p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q240: ACF lags come from ONE window pass — no self-join of the series") {
    val p = physical("q240_acf")
    // a lag-join formulation would plan 7 joins; the window-unpivot
    // shape plans exactly one Window (7 lag frames share it) + stack
    assert("Window \\[".r.findAllIn(p).size == 1, p.take(1500))
    assert(p.contains("stack(7"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q246: zipf top-R is a bounded TakeOrdered cut, never a global sort") {
    val p = physical("q246_zipf")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("Exchange rangepartitioning"), p.take(1500))
  }

  test("q247: rendezvous assignment is a pure projection — no join, no key-grid explode") {
    val p = physical("q247_reshard")
    // the md5-argmax HOF runs inside the scan projection; the only
    // aggregation is the 16-key shard census
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("Generate explode"), p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("q250: the sampling draw broadcasts the seat table; ranks partition by stratum") {
    val p = physical("q250_stratified_sample")
    assert(p.contains("BroadcastExchange"), p.take(1500))
    assert(p.contains("windowspecdefinition(o_orderpriority"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q258: burst audit is one RANGE-frame window pass per user") {
    val p = physical("q258_rolling_burst")
    assert("Window \\[".r.findAllIn(p).size <= 2, p.take(1500)) // count + bounded rank
    assert(p.contains("windowspecdefinition(user_id"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q260: spearman joins rank censuses on value keys — no all-pairs anywhere") {
    val p = physical("q260_spearman")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q265/q267: pair builds are key-equi self-joins, never cross products") {
    val t = physical("q265_theil_sen")
    assert(!t.contains("CartesianProduct"), t.take(1500))
    val b = physical("q267_basket_lift")
    assert(!b.contains("CartesianProduct"), b.take(1500))
    assert(!b.contains("SortMergeJoin") || b.contains("BroadcastHashJoin"), b.take(1500))
  }

  test("q244: rare-term top-k pushes the group limit below the doc shuffle") {
    val p = physical("q244_rare_terms")
    // WindowGroupLimit Partial/Final: only ≤3 candidate rows per doc
    // cross the exchange, not every rare-term hit
    assert("WindowGroupLimit".r.findAllIn(p).size == 2, p.take(2000))
    // the df cap compares against a broadcast 1-row corpus count
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q277: linkage pairs meet by a block-key equi-join, never a cross product") {
    val p = physical("q277_record_linkage")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    // no global window anywhere in the linkage path
    assert(!p.contains("windowspecdefinition()"), p.take(1500))
  }

  test("q280: PQ codebook and probe tables ride as broadcasts; codes scan is flat") {
    val p = physical("q280_pq_adc")
    // encode and ADC each attach one broadcast row (codebook / probe dt)
    assert("BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size >= 2,
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q276/q278: census folds keep one row-scale exchange and no global window") {
    val b = physical("q276_benford")
    assert(!b.contains("windowspecdefinition()"), b.take(1500))
    assert(!b.contains("CartesianProduct"), b.take(1500))
    val f = physical("q278_funnel")
    assert(!f.contains("windowspecdefinition()"), f.take(1500))
    // exactly one row-scale hash exchange: the user-keyed fold; the
    // census explode happens on the single aggregated row
    assert(!f.contains("CartesianProduct"), f.take(1500))
  }

  test("q281: DTW pair grid joins the bounded series census, not the row scale") {
    val p = physical("q281_dtw")
    // the key_a < key_b self-join over the per-key census is the ONLY
    // non-broadcast join surface, and it is nested-loop over census rows
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // series assembly is one hash aggregate over the event scan
    assert(p.contains("windowspecdefinition") == false, p.take(1500))
  }

  test("q286: each BPE round's argmax is a bounded TakeOrdered broadcast") {
    val p = physical("q286_bpe_merges")
    // 8 rounds x 1-row argmax: TakeOrderedAndProject, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("windowspecdefinition()"), p.take(1500))
  }

  test("q288: span corruption windows are doc-partitioned; mask math needs no lag") {
    val p = physical("q288_span_corruption")
    assert(p.contains("windowspecdefinition(doc_id"), p.take(2000))
    assert(!p.contains("windowspecdefinition()"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q385/q386/q361: greedy/audit vector plans never materialize a " +
      "cartesian product (per-round joins are checkpointed broadcasts)") {
    // the per-round broadcast joins live behind localCheckpoint
    // boundaries (their ShuffleBudget evidence is runtime volume);
    // what the FINAL plan must prove is the absence of any
    // candidates x candidates blow-up
    for (q <- Seq("q385_mmr_select", "q386_jl_distortion",
        "q361_kcenter_seeds")) {
      val p = physical(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1200)}")
    }
  }

  test("round-10 census statistics plan no windows and no cartesians " +
      "(q406/q409/q412/q414/q415) — the only single-partition stages " +
      "are census-bounded finals") {
    for (q <- Seq("q406_breslow_day", "q409_trade_stats",
        "q412_partial_corr", "q414_yule_k", "q415_theils_u")) {
      val p = physical(q)
      assert(!p.contains("Window "), s"$q:\n${p.take(1200)}")
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1200)}")
      // single-partition exchanges are allowed ONLY downstream of a
      // partial aggregate (census-bounded rows), never on the raw scan
      val lines = p.linesIterator.toSeq
      val spIdx = lines.zipWithIndex
        .filter(_._1.contains("Exchange SinglePartition")).map(_._2)
      spIdx.foreach { i =>
        assert(lines.drop(i).exists(l => l.contains("HashAggregate") ||
          l.contains("ObjectHashAggregate")),
          s"$q: single-partition exchange not fed by a partial agg:\n" +
            lines.slice(i, i + 4).mkString("\n"))
      }
    }
  }

  test("q410: purged folds plan no window at all — boundaries are " +
      "closed-form off a broadcast min/max census") {
    val p = physical("q410_purged_folds")
    assert(!p.contains("Window "), p.take(1200))
    // the 1-row bounds side attaches via broadcast, not a shuffle
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("q411: Diebold-Mariano lag windows partition by key — never a " +
      "global frame") {
    val p = physical("q411_diebold_mariano")
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    // two window passes: the wrapper lags by event_type, the operator
    // lags by its internal key alias k — both keyed, neither global
    assert(windowLines.nonEmpty && windowLines.forall(l =>
      l.contains("event_type") || l.contains("[k#")),
      windowLines.mkString("\n"))
    assert("Exchange SinglePartition".r.findAllIn(p).isEmpty, p.take(1200))
  }

  test("q395: the z-order audit pair join is a shard equi-join under " +
      "the per-shard cap — no cartesian, cap windows keyed by shard") {
    val p = physical("q395_zorder_locality")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the capBuckets count window partitions by the shard key; the only
    // windows in the plan are those cap counters — never global
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(_.contains("shard")),
      windowLines.mkString("\n"))
  }

  test("q413: the LOGO ratio board reads ONLY the checkpointed group " +
      "census — no second parquet scan of lineitem") {
    val p = physical("q413_logo_influence")
    assert(!p.contains("FileScan"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("round-10 session-2 stats family (q420-q446): no cartesians, " +
      "every window keyed, single-partition exchanges only downstream " +
      "of partial aggregates") {
    val qs = Seq("q420_brown_forsythe", "q421_bartlett", "q422_g_test",
      "q423_propensity_match", "q424_rdd", "q425_iv_wald", "q426_kpss",
      "q427_perm_entropy", "q428_granger", "q429_cronbach", "q430_icc",
      "q431_bland_altman", "q432_fisher_exact", "q433_hosmer_lemeshow",
      "q434_mcc", "q435_brunner_munzel", "q436_distance_corr",
      "q437_grubbs", "q438_burrows_delta", "q439_damerau",
      "q440_token_sort_ratio", "q441_calinski_harabasz",
      "q442_davies_bouldin", "q444_reciprocity", "q445_rich_club",
      "q446_seasonal_mk", "q448_turning_points", "q449_hellinger",
      "q451_herfindahl", "q452_newey_west")
    // q443 katz is excluded by design: its final top-20 rank window is
    // the q419 TakeOrdered-bounded global window, not a keyed one
    for (q <- qs) {
      val p = physical(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1200)}")
      val lines = p.linesIterator.toSeq
      // windows must partition by a key (scope/group/series key) — a
      // global window over row-scale data would melt one executor
      lines.filter(_.contains("Window ")).foreach { l =>
        assert(l.contains("sc#") || l.contains("[k#") ||
          l.contains("g#") || l.contains("event_type"),
          s"$q window not keyed:\n$l")
      }
      val spIdx = lines.zipWithIndex
        .filter(_._1.contains("Exchange SinglePartition")).map(_._2)
      spIdx.foreach { i =>
        assert(lines.drop(i).exists(l => l.contains("HashAggregate") ||
          l.contains("ObjectHashAggregate")),
          s"$q: single-partition exchange not fed by a partial agg:\n" +
            lines.slice(i, i + 4).mkString("\n"))
      }
    }
  }

  test("round-11 family (q453-q458): no cartesians; q454/q455/q458 " +
      "windows keyed; q456 stays edge-grain linear (no window at all)") {
    for (q <- Seq("q453_mp4_probe", "q454_pettitt", "q455_adf",
        "q456_moran_geary", "q458_mood_median")) {
      val p = physical(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1200)}")
      val lines = p.linesIterator.toSeq
      if (q != "q456_moran_geary")
        lines.filter(_.contains("Window ")).foreach { l =>
          assert(l.contains("[k#") || l.contains("sc#") ||
            l.contains("event_type"), s"$q window not keyed:\n$l")
        }
      else // the whole point of the n-scaled design: no window pass
        assert(!lines.exists(_.contains("Window ")), s"$q grew a window")
    }
    // q457 inherits q364's per-hop plan (checkpointed loop) — gate the
    // derived fold only: no cartesian, the one added agg keyed on node
    val p457 = physical("q457_harmonic")
    assert(!p457.contains("CartesianProduct"), p457.take(1200))
  }

  test("q460/q461: exif probe stays scan-grain (no shuffle before the " +
      "walk); the semdedup tree's descent joins are all broadcast") {
    val p460 = physical("q460_exif_probe")
    assert(!p460.contains("CartesianProduct"), p460.take(1200))
    val p461 = physical("q461_semdedup_tree")
    assert(!p461.contains("CartesianProduct"), p461.take(1200))
    // every per-level child-group join broadcasts (bounded model state)
    // and the only sort-merge surface is the cell-keyed pair join
    val smj = "SortMergeJoin".r.findAllIn(p461).size
    assert(smj <= 2, s"q461 grew $smj sort-merge joins:\n${p461.take(1500)}")
  }

  test("q464 pelt: no cartesians; every window keyed on event_type " +
      "(the DP itself is a per-key bounded fold, never a shuffle)") {
    val p = physical("q464_pelt")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    p.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("event_type") || l.contains("[k#"),
        s"q464 window not keyed:\n$l")
    }
  }

  test("q465/q468/q469 stay scan-grain projections: the AC automaton " +
      "and the WARC walk never shuffle; PQ's only join is the one " +
      "broadcast codebook row") {
    for (q <- Seq("q465_aho_corasick", "q469_warc_walk")) {
      val p = physical(q)
      assert(!p.contains("Exchange"), s"$q grew a shuffle:\n${p.take(1200)}")
      assert(!p.contains("CartesianProduct"), p.take(1200))
    }
    val p468 = physical("q468_product_quantize")
    assert(!p468.contains("SortMergeJoin") &&
      !p468.contains("CartesianProduct"), p468.take(1500))
    assert(p468.contains("BroadcastNestedLoopJoin") ||
      p468.contains("BroadcastExchange"), p468.take(1500))
  }

  test("q467/q470/q471: iterative graph passes and the profile grid " +
      "plan no cartesians and no unkeyed windows") {
    for (q <- Seq("q467_betweenness", "q470_shortest_paths",
        "q471_matrix_profile")) {
      val p = physical(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1200)}")
      p.linesIterator.filter(_.contains("Window ")).foreach { l =>
        assert(l.contains("event_type") || l.contains("[k#") ||
          l.contains("[s#"), s"$q window not keyed:\n$l")
      }
    }
  }

  test("q474: t-digest windows are key-partitioned, no collect fold, " +
      "no cartesian") {
    val p = physical("q474_tdigest")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("collect_list"), p.take(1200))
    p.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("[k#"), s"window not keyed:\n$l")
    }
  }

  test("q475: DBSCAN pair stage is cell-keyed, never all-pairs; no " +
      "global window") {
    val p = physical("q475_dbscan")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("Window "), p.take(1200))
  }
}
