package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DomainOps => K, Relational => R, Scalars => S, TimeSeries => T, TrainingData => D}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one declared operator from SURVEY.md §2
  * (or a training-data-pipeline operator), expressed Spark-first over the
  * driver testdata tables; [[oracleSql]] holds the DuckDB-equivalent SQL
  * for the hash-compare correctness gate. Column names and rounding are
  * aligned on both sides (driver sorts columns by name before hashing).
  *
  * Queries whose semantics hinge on Spark-side hash families (xxhash64
  * minhash/simhash/SRP planes) have no DuckDB equivalent and are
  * intentionally absent from [[oracleSql]] — the driver records a
  * rows-only check; their exactness is covered by ScalaTest specs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.q01LineitemAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1-2.7 relational
    "q01_group_agg"        -> (R.q01LineitemAgg(_, _)),
    "q02_filter_pushdown"  -> (R.q02FilterPushdown(_, _)),
    "q03_broadcast_join"   -> (R.q03BroadcastJoin(_, _)),
    "q04_semi_join"        -> (R.q04SemiJoin(_, _)),
    "q05_anti_join"        -> (R.q05AntiJoin(_, _)),
    "q06_enrichment_join"  -> (R.q06EnrichmentJoin(_, _)),
    "q07_argmax"           -> (R.q07Argmax(_, _)),
    "q08_conditional_agg"  -> (R.q08ConditionalAgg(_, _)),
    "q09_window_total_pct" -> (R.q09WindowTotalPct(_, _)),
    "q10_percentiles"      -> (R.q10Percentiles(_, _)),
    "q11_dedup_rank"       -> (R.q11DedupRank(_, _)),
    "q12_topn_per_group"   -> (R.q12TopNPerGroup(_, _)),
    "q13_scalar_subquery"  -> (R.q13ScalarSubquery(_, _)),
    "q14_union_cohorts"    -> (R.q14UnionCohorts(_, _)),
    "q15_topk"             -> (R.q15TopK(_, _)),
    "q16_histogram"        -> (R.q16Histogram(_, _)),
    "q17_value_counts"     -> (R.q17ValueCounts(_, _)),
    "q18_minmax_summary"   -> (R.q18MinMaxSummary(_, _)),
    "q19_vote_tally"       -> (R.q19VoteTally(_, _)),
    "q20_merge_upsert"     -> (R.q20MergeUpsert(_, _)),
    "q21_replace_by_key"   -> (R.q21ReplaceByKey(_, _)),
    "q22_max_streak"       -> (R.q22MaxStreak(_, _)),
    "q23_max_drawdown"     -> (R.q23MaxDrawdown(_, _)),
    "q24_ntile_split"      -> (R.q24NtileSplit(_, _)),
    "q25_top_lists"        -> (R.q25TopLists(_, _)),
    // §2.5 windows / time series
    "q30_sma"              -> (T.q30Sma(_, _)),
    "q31_running_sum"      -> (T.q31RunningSum(_, _)),
    "q32_lag_diff"         -> (T.q32LagDiff(_, _)),
    "q33_rolling_extrema"  -> (T.q33RollingExtrema(_, _)),
    "q34_bollinger"        -> (T.q34Bollinger(_, _)),
    "q35_asof_join"        -> (T.q35AsOfJoin(_, _)),
    "q36_future_window"    -> (T.q36FutureWindow(_, _)),
    "q37_session_count"    -> (T.q37SessionCount(_, _)),
    "q38_ema"              -> (T.q38EmaLast(_, _)),
    "q39_rsi"              -> (T.q39RsiLast(_, _)),
    "q40_macd"             -> (T.q40MacdLast(_, _)),
    "q41_atr"              -> (T.q41AtrLast(_, _)),
    "q42_support_resistance" -> (S.q42SupportResistance(_, _)),
    "q43_directional_peak" -> (T.q43DirectionalPeak(_, _)),
    "q44_regime_trend"     -> (T.q44RegimeTrend(_, _)),
    "q45_entry_fallback"   -> (K.q45EntryFallback(_, _)),
    "q46_latest_row"       -> (T.q46LatestRow(_, _)),
    "q48_risk_fields"      -> (K.q48RiskFields(_, _)),
    "q49_regime_blend"     -> (S.q49RegimeBlend(_, _)),
    "q47_eligibility"      -> (S.q47Eligibility(_, _)),
    // domain operators: calendar (W15), bracket kernel (X1), sweep (X2/X3)
    "q59_calendar"         -> (K.q59Calendar(_, _)),
    "q60_bracket"          -> (K.q60Bracket(_, _)),
    "q61_sweep"            -> (K.q61Sweep(_, _)),
    "q65_stress_sweep"     -> (K.q65StressSweep(_, _)),
    "q62_flow_metrics"     -> (K.q62FlowMetrics(_, _)),
    "q63_score_f18"        -> (K.q63ScoreF18(_, _)),
    "q64_monte_carlo"      -> (K.q64MonteCarlo(_, _)),
    // §2.8 scalar function families
    "q50_string_funcs"     -> (S.q50StringFuncs(_, _)),
    "q51_occ_key"          -> (S.q51OccKey(_, _)),
    "q52_date_funcs"       -> (S.q52DateFuncs(_, _)),
    "q53_math_funcs"       -> (S.q53MathFuncs(_, _)),
    "q54_score_ladder"     -> (S.q54ScoreLadder(_, _)),
    "q55_coalesce_chain"   -> (S.q55CoalesceChain(_, _)),
    "q56_type_coercion"    -> (S.q56TypeCoercion(_, _)),
    "q57_json_extract"     -> (S.q57JsonExtract(_, _)),
    "q58_direction_cond"   -> (S.q58DirectionConditional(_, _)),
    // training-data pipeline
    "q70_exact_dedup"      -> (D.q70ExactDedup(_, _)),
    "q71_dup_clusters"     -> (D.q71DupClusters(_, _)),
    "q72_token_stats"      -> (D.q72TokenStats(_, _)),
    "q73_quality_score"    -> (D.q73QualityScore(_, _)),
    "q74_fingerprint"      -> (D.q74Fingerprint(_, _)),
    "q75_ngram_jaccard"    -> (D.q75NgramJaccard(_, _)),
    "q76_minhash_lsh"      -> (D.q76MinhashLsh(_, _)),
    "q77_simhash"          -> (D.q77Simhash(_, _)),
    "q78_lang_id"          -> (D.q78LangId(_, _)),
    "q79_cosine_topk"      -> (D.q79CosineTopK(_, _)),
    "q80_lsh_ann"          -> (D.q80LshAnn(_, _)),
    "q81_embedding_stats"  -> (D.q81EmbeddingStats(_, _)),
    "q82_ivf_ann"          -> (D.q82IvfAnn(_, _)),
    "q83_embedding_dedup"  -> (D.q83EmbeddingNearDups(_, _)),
    "q84_bpe_tokens"       -> (D.q84BpeTokens(_, _)),
    "q85_lsh_recall"       -> (D.q85LshRecall(_, _)),
    "q86_pii_redact"       -> (D.q86PiiRedact(_, _)),
    "q87_vocab"            -> (D.q87Vocab(_, _)),
    "q88_ngram_contamination" -> (D.q88NgramContamination(_, _)),
    "q89_decontaminate"    -> (D.q89Decontaminate(_, _)),
    "q90_ivf_full_probe"   -> (D.q90IvfFullProbe(_, _)),
    "q91_hash_sample"      -> (D.q91HashSample(_, _)),
    "q92_packing_stats"    -> (D.q92PackingStats(_, _)),
    "q93_simhash_dups"     -> (D.q93SimhashDups(_, _)),
    "q94_srp_full_recall"  -> (D.q94SrpFullRecall(_, _)),
    "q95_pack_assign"      -> (D.q95PackAssign(_, _)),
    "q96_dup_components"   -> (D.q96DupComponents(_, _)),
    "q97_bm25"             -> (D.q97Bm25(_, _)),
    "q98_hash_split"       -> (D.q98HashSplit(_, _)),
    "q99_mixture"          -> (D.q99Mixture(_, _)),
    "q100_repetition"      -> (D.q100Repetition(_, _)),
    "q101_chunking"        -> (D.q101Chunking(_, _)),
    "q102_topk_agg"        -> (R.q102TopKAgg(_, _)),
    "q103_pack_materialize" -> (D.q103PackMaterialize(_, _)),
    "q104_text_clean"      -> (D.q104TextClean(_, _)),
    "q105_global_shuffle"  -> (D.q105GlobalShuffle(_, _)),
    "q106_oov_rate"        -> (D.q106OovRate(_, _)),
    "q107_dedup_apply"     -> (D.q107DedupApply(_, _)),
    "q108_knn_join"        -> (D.q108KnnJoin(_, _)),
    "q109_stop_strip"      -> (D.q109StopStrip(_, _)),
    "q110_bloom_decontaminate" -> (D.q110BloomDecontaminate(_, _)),
    "q111_incremental_dedup"   -> (D.q111IncrementalDedup(_, _)),
    "q112_quality_gate"        -> (D.q112QualityGate(_, _)),
    "q113_cube"            -> (R.q113Cube(_, _)),
    "q114_pivot"           -> (R.q114Pivot(_, _)),
    "q115_range_window"    -> (T.q115RangeWindow(_, _)),
    "q116_ivf_refined"     -> (D.q116IvfRefined(_, _)),
    "q117_image_decode"    -> (D.q117ImageDecode(_, _)),
    "q118_dup_spans"       -> (D.q118DupSpans(_, _)),
    "q119_span_mask"       -> (D.q119SpanMask(_, _)),
    "q120_audio_decode"    -> (D.q120AudioDecode(_, _)),
    "q121_lm_score"        -> (D.q121LmScore(_, _)),
    "q122_calibrated_gate" -> (D.q122CalibratedGate(_, _)),
    "q123_stratified_k"    -> (D.q123StratifiedK(_, _)),
    "q124_tfidf_keywords"  -> (D.q124TfidfKeywords(_, _)),
    "q125_salted_agg"      -> (R.q125SaltedAgg(_, _)),
    "q126_mean_pool"       -> (D.q126MeanPool(_, _)),
    "q127_centroid_eval"   -> (D.q127CentroidEval(_, _)),
    "q128_boilerplate"     -> (D.q128Boilerplate(_, _)),
    "q129_ingest_e2e"      -> (D.q129IngestE2E(_, _)),
    "q130_semdedup"        -> (D.q130SemDedup(_, _)),
    "q131_gopher"          -> (D.q131GopherCensus(_, _)),
    "q132_para_dedup"      -> (D.q132ParaDedup(_, _)),
    "q133_dsir"            -> (D.q133Dsir(_, _)),
    "q134_gk_quantiles"    -> (R.q134GkQuantiles(_, _)),
    "q135_quantize"        -> (D.q135Quantize(_, _)),
    "q136_hard_negatives"  -> (D.q136HardNegatives(_, _)),
    "q137_source_divergence" -> (D.q137SourceDivergence(_, _)),
    "q138_winnow"          -> (D.q138Winnow(_, _)),
    "q139_bigram_lm"       -> (D.q139BigramLm(_, _)),
    "q140_mg_saturation"   -> (D.q140MgSaturation(_, _)),
    "q141_tiered_dedup"    -> (D.q141TieredDedup(_, _)),
    "q142_decontam_mask"   -> (D.q142DecontamMask(_, _)),
    "q143_mojibake"        -> (D.q143MojibakeCensus(_, _)),
    "q144_token_budget"    -> (D.q144TokenBudget(_, _)),
    "q145_video_frames"    -> (D.q145VideoFrames(_, _)),
    "q146_training_e2e"    -> (D.q146TrainingE2E(_, _)),
    "q147_cdc_chunks"      -> (D.q147CdcChunks(_, _)),
    "q148_temperature_mix" -> (D.q148TemperatureMix(_, _)),
    "q149_quantized_gram"  -> (D.q149QuantizedGram(_, _)),
    "q150_templatedness"   -> (D.q150Templatedness(_, _)),
    "q151_novelty_curve"   -> (D.q151NoveltyCurve(_, _)),
    "q152_context_fit"     -> (D.q152ContextFit(_, _)),
    "q153_token_composition" -> (D.q153TokenComposition(_, _)),
    "q154_poisson_bootstrap" -> (D.q154PoissonBootstrap(_, _)),
    "q155_quality_canonical" -> (D.q155QualityCanonical(_, _)),
    "q156_bootstrap_ci"    -> (D.q156BootstrapCi(_, _)),
    "q157_char_entropy"    -> (D.q157CharEntropy(_, _)),
    "q158_sampling_plan"   -> (D.q158SamplingPlan(_, _)),
    "q159_funnel"          -> (T.q159Funnel(_, _)),
    "q160_retention"       -> (T.q160RetentionCohorts(_, _)),
    "q161_psi_drift"       -> (T.q161PsiDrift(_, _)),
    "q162_mask_repeated"   -> (D.q162MaskRepeated(_, _)),
    "q163_bpe_pairs"       -> (D.q163BpePairs(_, _)),
    "q164_ppl_buckets"     -> (D.q164PerplexityBuckets(_, _)),
    "q165_leakfree_split"  -> (D.q165LeakFreeSplit(_, _)),
    "q166_image_phash"     -> (D.q166ImagePhashDedup(_, _)),
    "q167_sessionize"      -> (T.q167Sessionize(_, _)),
    "q168_scd2_history"    -> (R.q168Scd2History(_, _)),
    "q169_pagerank"        -> (R.q169PageRank(_, _)),
    "q170_cms_counts"      -> (D.q170CmsCounts(_, _)),
    "q171_priority_sample" -> (D.q171PrioritySample(_, _)),
    "q172_dim_standardize" -> (D.q172DimStandardize(_, _)),
    "q173_script_census"   -> (D.q173ScriptCensus(_, _)),
    "q174_domain_cap"      -> (D.q174DomainCap(_, _)),
    "q175_code_prose"      -> (D.q175CodeProse(_, _)),
    "q176_split_leakage"   -> (D.q176SplitLeakage(_, _)),
    "q177_label_audit"     -> (D.q177LabelAudit(_, _)),
    "q178_grouped_ols"     -> (R.q178GroupedOls(_, _)),
    "q179_power_iteration" -> (D.q179PowerIteration(_, _)),
    "q180_welch_test"      -> (D.q180WelchTest(_, _)),
    "q181_collocations"    -> (D.q181Collocations(_, _)),
    "q182_weighted_median" -> (R.q182WeightedMedian(_, _)),
    "q183_hll_distinct"    -> (R.q183HllDistinct(_, _)),
    "q184_url_canon"       -> (D.q184UrlCanon(_, _)),
    "q185_dataset_digest"  -> (D.q185DatasetDigest(_, _)),
    "q186_mad_outliers"    -> (R.q186MadOutliers(_, _)),
    "q187_inverted_index"  -> (D.q187InvertedIndex(_, _)),
    "q188_hard_negatives"  -> (D.q188HardNegatives(_, _)),
    "q189_gopher_rules"    -> (D.q189GopherRules(_, _)),
    "q190_nfc_census"      -> (D.q190NfcCensus(_, _)),
    "q191_auc"             -> (D.q191Auc(_, _)),
    "q192_chi_square"      -> (D.q192ChiSquare(_, _)),
    "q193_rolling_hll"     -> (R.q193RollingHll(_, _)),
    "q194_pii_scrub"       -> (D.q194PiiScrub(_, _)),
    "q195_length_powerlaw" -> (D.q195LengthPowerlaw(_, _)),
    "q196_triangles"       -> (R.q196Triangles(_, _)),
    "q197_interval_overlap" -> (T.q197IntervalOverlap(_, _)),
    "q198_edit_distance"    -> (D.q198EditDistance(_, _)),
    "q199_kmv_jaccard"      -> (D.q199KmvJaccard(_, _)),
    "q200_transitions"      -> (T.q200EventTransitions(_, _)),
    "q201_peak_concurrency" -> (T.q201PeakConcurrency(_, _)),
    "q202_benford"          -> (R.q202Benford(_, _)),
    "q203_k_anonymity"      -> (R.q203KAnonymity(_, _)),
    "q204_rrf_fusion"       -> (D.q204RrfFusion(_, _)),
    "q205_profile_census"   -> (R.q205ProfileCensus(_, _)),
    "q206_integrity_audit"  -> (R.q206IntegrityAudit(_, _)),
    "q207_corr_matrix"      -> (R.q207CorrMatrix(_, _)),
    "q208_asof_nearest"     -> (T.q208AsofNearest(_, _)),
    "q209_deletion_impact"  -> (R.q209DeletionImpact(_, _)),
    "q210_novelty_curve"    -> (R.q210NoveltyCurve(_, _)),
    "q211_set_join"         -> (D.q211SetJoin(_, _)),
    "q212_zorder_layout"    -> (R.q212ZorderLayout(_, _)),
    "q213_altstar_cc"       -> (D.q213AltstarCc(_, _)),
    "q214_exact_heavy"      -> (D.q214ExactHeavy(_, _)),
    "q215_quantile_bisect"  -> (R.q215QuantileBisect(_, _)),
    "q216_luhn_pii"         -> (D.q216LuhnPii(_, _)),
    "q217_winsor_census"    -> (D.q217WinsorCensus(_, _)),
    "q218_skew_census"      -> (R.q218SkewCensus(_, _)),
    "q219_dataset_diff"     -> (D.q219DatasetDiff(_, _)),
    "q220_cms_join_size"    -> (R.q220CmsJoinSize(_, _)),
    "q221_containment"      -> (D.q221Containment(_, _)),
    "q222_link_pred"        -> (R.q222LinkPred(_, _)),
    "q223_rank_normalize"   -> (D.q223RankNormalize(_, _)),
    "q224_silence_segments" -> (D.q224SilenceSegments(_, _)),
    "q225_matryoshka"       -> (D.q225Matryoshka(_, _)),
    "q226_compaction_plan"  -> (D.q226CompactionPlan(_, _)),
    "q227_kcore"            -> (R.q227KCore(_, _)),
    "q228_seq_surprise"     -> (T.q228SequenceSurprise(_, _)),
    "q229_l_diversity"      -> (R.q229LDiversity(_, _)),
    "q230_skyline"          -> (R.q230Skyline(_, _)),
    "q231_retention"        -> (T.q231Retention(_, _)),
    "q232_rollup_revenue"   -> (R.q232RollupRevenue(_, _)),
    "q233_fd_discovery"     -> (R.q233FdDiscovery(_, _)),
    "q234_sortedness"       -> (R.q234Sortedness(_, _)),
    "q235_grouped_quantiles" -> (T.q235GroupedQuantiles(_, _)),
    "q236_neyman_alloc"     -> (D.q236NeymanAlloc(_, _)),
    "q237_mutual_info"      -> (R.q237MutualInfo(_, _)),
    "q238_cusum_drift"      -> (T.q238CusumDrift(_, _)),
    "q239_ks_drift"         -> (T.q239KsDrift(_, _)),
    "q240_acf"              -> (T.q240Acf(_, _)),
    "q241_gini"             -> (D.q241Gini(_, _)),
    "q242_seasonality"      -> (T.q242Seasonality(_, _)),
    "q243_holt_forecast"    -> (T.q243HoltForecast(_, _)),
    "q244_rare_terms"       -> (D.q244RareTerms(_, _)),
    "q245_hits"             -> (R.q245Hits(_, _)),
    "q248_seasonal_anomaly" -> (T.q248SeasonalAnomaly(_, _)),
    "q249_calibration"      -> (T.q249Calibration(_, _)),
    "q250_stratified_sample" -> (D.q250StratifiedSample(_, _)),
    "q251_profile_diff"     -> (T.q251ProfileDiff(_, _)),
    "q252_twap"             -> (T.q252Twap(_, _)),
    "q253_centroid_drift"   -> (D.q253CentroidDrift(_, _)),
    "q254_water_fill"       -> (D.q254WaterFill(_, _)),
    "q255_kaplan_meier"     -> (T.q255KaplanMeier(_, _)),
    "q256_power_law"        -> (T.q256PowerLaw(_, _)),
    "q257_session_paths"    -> (T.q257SessionPaths(_, _)),
    "q258_rolling_burst"    -> (T.q258RollingBurst(_, _)),
    "q259_stationary"       -> (T.q259Stationary(_, _)),
    "q260_spearman"         -> (T.q260Spearman(_, _)),
    "q261_gumbel_extremes"  -> (T.q261GumbelExtremes(_, _)),
    "q262_rfm"              -> (T.q262Rfm(_, _)),
    "q263_binary_segment"   -> (T.q263BinarySegment(_, _)),
    "q264_label_separation" -> (D.q264LabelSeparation(_, _)),
    "q265_theil_sen"        -> (T.q265TheilSen(_, _)),
    "q266_seasonal_decompose" -> (T.q266SeasonalDecompose(_, _)),
    "q267_basket_lift"      -> (T.q267BasketLift(_, _)),
    "q268_pareto_coverage"  -> (T.q268ParetoCoverage(_, _)),
    "q269_ccf"              -> (T.q269Ccf(_, _)),
    "q270_entropy_rate"     -> (T.q270EntropyRate(_, _)),
    "q271_heaps"            -> (D.q271Heaps(_, _)),
    "q272_wilson_bounds"    -> (T.q272WilsonBounds(_, _)),
    "q273_two_proportion"   -> (T.q273TwoProportion(_, _)),
    "q246_zipf"             -> (D.q246Zipf(_, _)),
    "q247_reshard"          -> (D.q247Reshard(_, _)),
    "q274_eligibility_census" -> (K.q274EligibilityCensus(_, _)),
    "q275_bootstrap"        -> (K.q275Bootstrap(_, _)),
    "q276_benford"          -> (T.q276Benford(_, _)),
    "q277_record_linkage"   -> (R.q277RecordLinkage(_, _)),
    "q278_funnel"           -> (T.q278Funnel(_, _)),
    "q279_ndcg"             -> (T.q279Ndcg(_, _)),
    "q280_pq_adc"           -> (D.q280PqAdc(_, _)),
    "q281_dtw"              -> (T.q281Dtw(_, _)),
    "q282_cohen_kappa"      -> (T.q282CohenKappa(_, _)),
    "q283_mann_whitney"     -> (T.q283MannWhitney(_, _)),
    "q284_flesch"           -> (D.q284Flesch(_, _)),
    "q285_woe"              -> (T.q285Woe(_, _)),
    "q286_bpe_merges"       -> (D.q286BpeMerges(_, _)),
    "q287_bpe_fertility"    -> (D.q287BpeFertility(_, _)),
    "q288_span_corruption"  -> (D.q288SpanCorruption(_, _)),
    "q289_greedy_coverage"  -> (D.q289GreedyCoverage(_, _)),
    "q290_kruskal_wallis"   -> (T.q290KruskalWallis(_, _)),
    "q291_kendall_tau"      -> (T.q291KendallTau(_, _)),
    "q292_silhouette"       -> (D.q292Silhouette(_, _)),
    "q293_inclusion_deps"   -> (R.q293InclusionDeps(_, _)),
    "q294_brown_forsythe"   -> (T.q294BrownForsythe(_, _)),
    "q295_cramers_v"        -> (R.q295CramersV(_, _)),
    "q296_rouge_l"          -> (D.q296RougeL(_, _)),
    "q297_wasserstein"      -> (T.q297Wasserstein(_, _)),
    "q298_split_leakage"    -> (T.q298SplitLeakage(_, _)),
    "q299_theil_between"    -> (D.q299TheilBetween(_, _)),
    "q300_mcnemar"          -> (T.q300McNemar(_, _)),
    "q301_simpson"          -> (D.q301SimpsonDiversity(_, _)),
    "q302_rbo"              -> (T.q302Rbo(_, _)),
    "q303_odds_ratio"       -> (T.q303OddsRatio(_, _)),
    "q304_mutual_nn"        -> (D.q304MutualNn(_, _)),
    "q305_total_variation"  -> (D.q305TotalVariation(_, _)),
    "q306_good_turing"      -> (D.q306GoodTuring(_, _)),
    "q307_assortativity"    -> (R.q307Assortativity(_, _)),
    "q308_cliffs_delta"     -> (T.q308CliffsDelta(_, _)),
    "q309_cochran_q"        -> (T.q309CochranQ(_, _)),
    "q310_friedman"         -> (T.q310Friedman(_, _)),
    "q311_fleiss_kappa"     -> (T.q311FleissKappa(_, _)),
    "q312_collocations"     -> (D.q312Collocations(_, _)),
    "q313_modularity"       -> (R.q313Modularity(_, _)),
    "q314_transitivity"     -> (R.q314Transitivity(_, _)),
    "q315_brier_decomp"     -> (T.q315BrierDecomp(_, _)),
    "q316_assoc_rules"      -> (R.q316AssociationRules(_, _)),
    "q317_cramer_von_mises" -> (T.q317CramerVonMises(_, _)),
    "q318_jensen_shannon"   -> (T.q318JensenShannon(_, _)),
    "q319_youden"           -> (T.q319Youden(_, _)),
    "q320_retrieval_eval"   -> (D.q320RetrievalEval(_, _)),
    "q321_dispersion"       -> (T.q321Dispersion(_, _)),
    "q322_rate_ratio"       -> (T.q322RateRatio(_, _)),
    "q323_cum_gains"        -> (T.q323CumulativeGains(_, _)),
    "q324_krippendorff"     -> (T.q324Krippendorff(_, _)),
    "q325_hll_intersect"    -> (R.q325HllIntersect(_, _)),
    "q326_t_closeness"      -> (R.q326TCloseness(_, _)),
    "q327_laplace_counts"   -> (R.q327LaplaceCounts(_, _)),
    "q328_conformal"        -> (T.q328Conformal(_, _)),
    "q329_mase"             -> (T.q329Mase(_, _)),
    // q330 compress_bands is retired from the oracle board (deflate has
    // no DuckDB replay, so it could never be more than a rows-only cell):
    // the wrapper stays a library entry point, its banding is spec-pinned
    // (TrainingDataSpec), and the zlib codec pair is hash-oracle-gated
    // end-to-end by q389_deflate_roundtrip.
    "q331_sprt"             -> (T.q331Sprt(_, _)),
    "q332_cuped"            -> (T.q332Cuped(_, _)),
    "q333_diff_in_diff"     -> (T.q333DiffInDiff(_, _)),
    "q334_meta_analysis"    -> (T.q334MetaAnalysis(_, _)),
    "q335_welch_t"          -> (T.q335WelchT(_, _)),
    "q336_anova_f"          -> (T.q336AnovaF(_, _)),
    "q337_sequence_rules"   -> (T.q337SequenceRules(_, _)),
    "q338_stratified_ate"   -> (T.q338StratifiedAte(_, _)),
    "q339_isotonic"         -> (T.q339Isotonic(_, _)),
    "q340_bayesian_ab"      -> (T.q340BayesianAB(_, _)),
    "q341_fuzzy_best_match" -> (R.q341FuzzyBestMatch(_, _)),
    "q342_random_walks"     -> (R.q342RandomWalks(_, _)),
    "q343_quantile_norm"    -> (T.q343QuantileNorm(_, _)),
    "q344_leave_one_out"    -> (T.q344LeaveOneOut(_, _)),
    "q345_negative_samples" -> (D.q345NegativeSamples(_, _)),
    "q346_louvain_pass"     -> (R.q346LouvainPass(_, _)),
    "q347_info_gain_split"  -> (T.q347InfoGainSplit(_, _)),
    "q348_fdr_bh"           -> (T.q348FdrBh(_, _)),
    "q349_rake"             -> (D.q349Rake(_, _)),
    "q350_centroid_drift"   -> (D.q350CentroidDrift(_, _)),
    "q351_nelson_aalen"     -> (T.q351NelsonAalen(_, _)),
    "q352_ucb_allocation"   -> (T.q352UcbAllocation(_, _)),
    "q353_capture_recapture" -> (D.q353CaptureRecapture(_, _)),
    "q354_jarque_bera"      -> (T.q354JarqueBera(_, _)),
    "q355_durbin_watson"    -> (T.q355DurbinWatson(_, _)),
    "q356_chi_square"       -> (T.q356ChiSquare(_, _)),
    "q357_distinct_n"       -> (D.q357DistinctN(_, _)),
    "q358_ewma_chart"       -> (T.q358EwmaChart(_, _)),
    "q359_page_hinkley"     -> (T.q359PageHinkley(_, _)),
    "q360_textrank"         -> (D.q360TextRank(_, _)),
    "q361_kcenter_seeds"    -> (D.q361KCenterSeeds(_, _)),
    "q362_holt_winters"     -> (T.q362HoltWinters(_, _)),
    "q363_kneser_ney"       -> (D.q363KneserNey(_, _)),
    "q364_hyperanf"         -> (R.q364HyperAnf(_, _)),
    "q365_chao1"            -> (D.q365Chao1(_, _)),
    "q366_mann_kendall"     -> (T.q366MannKendall(_, _)),
    "q367_anderson_darling" -> (T.q367AndersonDarling(_, _)),
    "q368_hurst"            -> (T.q368Hurst(_, _)),
    "q369_sax_motifs"       -> (T.q369SaxMotifs(_, _)),
    "q370_croston"          -> (T.q370Croston(_, _)),
    "q371_tail_loops"       -> (D.q371TailLoops(_, _)),
    "q372_burstiness"       -> (T.q372Burstiness(_, _)),
    "q373_dirichlet_ql"     -> (D.q373DirichletQL(_, _)),
    "q374_ljung_box"        -> (T.q374LjungBox(_, _)),
    "q375_runs_test"        -> (T.q375RunsTest(_, _)),
    "q376_km_greenwood"     -> (T.q376KaplanMeierCI(_, _)),
    "q377_german_tank"      -> (D.q377GermanTank(_, _)),
    "q378_lsh_planner"      -> (D.q378LshPlanner(_, _)),
    "q379_pacf"             -> (T.q379Pacf(_, _)),
    "q380_personalized_pr"  -> (R.q380PersonalizedPr(_, _)),
    "q381_pinball"          -> (T.q381Pinball(_, _)),
    "q382_trimmed_mean"     -> (T.q382TrimmedMean(_, _)),
    "q383_energy_distance"  -> (T.q383EnergyDistance(_, _)),
    "q384_gaussian_kl"      -> (T.q384GaussianKl(_, _)),
    "q385_mmr_select"       -> (D.q385MmrSelect(_, _)),
    "q386_jl_distortion"    -> (D.q386JlDistortion(_, _)),
    "q387_source_containment" -> (D.q387SourceContainment(_, _)),
    "q388_log_rank"         -> (T.q388LogRank(_, _)),
    "q389_deflate_roundtrip" -> (D.q389DeflateRoundtrip(_, _)),
    "q390_lifecycle_e2e"    -> (K.q390LifecycleE2E(_, _)),
    "q391_threshold_curve"  -> (D.q391ThresholdCurve(_, _)),
    "q392_weighted_reservoir" -> (D.q392WeightedReservoir(_, _)),
    "q393_bleu"             -> (D.q393Bleu(_, _)),
    "q394_kalman_level"     -> (T.q394KalmanLevel(_, _)),
    "q395_zorder_locality"  -> (D.q395ZorderLocality(_, _)),
    "q396_label_prop"       -> (R.q396LabelProp(_, _)),
    "q397_vocab_coverage"   -> (D.q397VocabCoverage(_, _)),
    "q398_snapshot_diff"    -> (D.q398SnapshotDiff(_, _)),
    "q399_fdr_by"           -> (T.q399FdrBy(_, _)),
    "q400_jonckheere"       -> (T.q400Jonckheere(_, _)),
    "q401_semantic_decontam" -> (D.q401SemanticDecontam(_, _)),
    "q402_cochran_armitage" -> (T.q402CochranArmitage(_, _)),
    "q403_page_trend"       -> (T.q403PageTrend(_, _)),
    "q404_mantel_haenszel"  -> (T.q404MantelHaenszel(_, _)),
    "q405_lin_ccc"          -> (D.q405LinCcc(_, _)),
    "q406_breslow_day"      -> (T.q406BreslowDay(_, _)),
    "q407_kendall_w"        -> (T.q407KendallW(_, _)),
    "q408_ktruss"           -> (R.q408KTruss(_, _)),
    "q409_trade_stats"      -> (T.q409TradeStats(_, _)),
    "q410_purged_folds"     -> (T.q410PurgedFolds(_, _)),
    "q411_diebold_mariano"  -> (T.q411DieboldMariano(_, _)),
    "q412_partial_corr"     -> (T.q412PartialCorr(_, _)),
    "q413_logo_influence"   -> (R.q413LogoInfluence(_, _)),
    "q414_yule_k"           -> (D.q414YuleK(_, _)),
    "q415_theils_u"         -> (R.q415TheilsU(_, _)),
    "q416_attribution"      -> (T.q416Attribution(_, _)),
    "q417_rmst"             -> (T.q417Rmst(_, _)),
    "q418_ece"              -> (T.q418Ece(_, _)),
    "q419_adamic_adar"      -> (R.q419AdamicAdar(_, _)),
    "q420_brown_forsythe"   -> (T.q420BrownForsythe(_, _)),
    "q421_bartlett"         -> (T.q421Bartlett(_, _)),
    "q422_g_test"           -> (T.q422GTest(_, _)),
    "q423_propensity_match" -> (T.q423PropensityMatch(_, _)),
    "q424_rdd"              -> (T.q424Rdd(_, _)),
    "q425_iv_wald"          -> (T.q425IvWald(_, _)),
    "q426_kpss"             -> (T.q426Kpss(_, _)),
    "q427_perm_entropy"     -> (T.q427PermEntropy(_, _)),
    "q428_granger"          -> (T.q428Granger(_, _)),
    "q429_cronbach"         -> (T.q429Cronbach(_, _)),
    "q430_icc"              -> (T.q430Icc(_, _)),
    "q431_bland_altman"     -> (T.q431BlandAltman(_, _)),
    "q432_fisher_exact"     -> (T.q432FisherExact(_, _)),
    "q433_hosmer_lemeshow"  -> (T.q433HosmerLemeshow(_, _)),
    "q434_mcc"              -> (T.q434Mcc(_, _)),
    "q435_brunner_munzel"   -> (T.q435BrunnerMunzel(_, _)),
    "q436_distance_corr"    -> (T.q436DistanceCorr(_, _)),
    "q437_grubbs"           -> (T.q437Grubbs(_, _)),
    "q438_burrows_delta"    -> (D.q438BurrowsDelta(_, _)),
    "q439_damerau"          -> (R.q439Damerau(_, _)),
    "q440_token_sort_ratio" -> (D.q440TokenSortRatio(_, _)),
    "q441_calinski_harabasz" -> (D.q441CalinskiHarabasz(_, _)),
    "q442_davies_bouldin"   -> (D.q442DaviesBouldin(_, _)),
    "q443_katz"             -> (R.q443Katz(_, _)),
    "q444_reciprocity"      -> (R.q444Reciprocity(_, _)),
    "q445_rich_club"        -> (R.q445RichClub(_, _)),
    "q446_seasonal_mk"      -> (T.q446SeasonalMk(_, _)),
    "q447_conductance"      -> (R.q447Conductance(_, _)),
    "q448_turning_points"   -> (T.q448TurningPoints(_, _)),
    "q449_hellinger"        -> (T.q449Hellinger(_, _)),
    "q450_cum_incidence"    -> (T.q450CumIncidence(_, _)),
    "q451_herfindahl"       -> (R.q451Herfindahl(_, _)),
    "q452_newey_west"       -> (T.q452NeweyWest(_, _)),
    "q453_mp4_probe"        -> (D.q453Mp4Probe(_, _)),
    "q454_pettitt"          -> (T.q454Pettitt(_, _)),
    "q459_eff_diameter"     -> (R.q459EffDiameter(_, _)),
    "q460_exif_probe"       -> (D.q460ExifProbe(_, _)),
    "q461_semdedup_tree"    -> (D.q461SemDedupTree(_, _)),
    "q462_smith_waterman"   -> (R.q462SmithWaterman(_, _)),
    "q463_ktruss"           -> (R.q463KTruss(_, _)),
    "q464_pelt"             -> (T.q464Pelt(_, _)),
    "q465_aho_corasick"     -> (D.q465AhoCorasick(_, _)),
    "q466_truss_decomp"     -> (R.q466TrussDecomposition(_, _)),
    "q467_betweenness"      -> (R.q467Betweenness(_, _)),
    "q468_product_quantize" -> (D.q468ProductQuantize(_, _)),
    "q469_warc_walk"        -> (D.q469WarcWalk(_, _)),
    "q470_shortest_paths"   -> (R.q470ShortestPaths(_, _)),
    "q471_matrix_profile"   -> (T.q471MatrixProfile(_, _)),
    "q472_hilbert_layout"   -> (R.q472HilbertLayout(_, _)),
    "q474_tdigest"          -> (T.q474Tdigest(_, _)),
    "q475_dbscan"           -> (D.q475Dbscan(_, _)),
    "q455_adf"              -> (T.q455Adf(_, _)),
    "q456_moran_geary"      -> (R.q456MoranGeary(_, _)),
    "q457_harmonic"         -> (R.q457Harmonic(_, _)),
    "q458_mood_median"      -> (T.q458MoodMedian(_, _)),
  )

  /** Exhaustive exact 3-gram-Jaccard pair set over the q75/q85 planted
    * near-dup fixture (first 40 docs + appended-tail copies). The rounding
    * mirrors Spark's BigDecimal.valueOf(double) repr semantics via the
    * VARCHAR->DECIMAL round-trip (see q53 precedent). */
  private val ngramJaccardOracle: String =
    """WITH aug AS (SELECT doc_id, text FROM documents WHERE doc_id < 40
      |UNION ALL SELECT doc_id + 1000, text || ' graft near dup tail' FROM documents WHERE doc_id < 40),
      |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM aug),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
      |i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS sh FROM t),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS j
      |FROM s a, s b WHERE a.doc_id < b.doc_id)
      |SELECT id_a, id_b, CAST(round(CAST(CAST(j AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS jaccard
      |FROM p WHERE j >= 0.5""".stripMargin

  /** q64 oracle: bit-exact DuckDB replay of the CLCG-seeded Monte Carlo
    * (kernels/MonteCarlo.categorical at q64's parameters). A recursive CTE
    * carries one row per lifetime with the generator state (two 31-bit
    * MCGs — all BIGINT arithmetic) plus the capital state machine; every
    * double op mirrors the Scala loop's order exactly, so each path's
    * final capital / ruin flag / max drawdown is bit-identical and the
    * order-free summary statistics (count ratio, exact quantiles, max)
    * hash-match. Built programmatically: the state-update expressions are
    * shared between columns and DuckDB recursive-CTE columns see only the
    * previous iteration's row (snapshot semantics — unlike list_reduce
    * struct lambdas, whose field-visibility differs between its scalar and
    * vectorized paths; measured on this VM's DuckDB 1.0, see q40 note). */
  private val monteCarloOracle: String = {
    def mr(e: String, n: Int) =
      s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,20)), $n) AS DOUBLE)"
    def d(v: Double) = s"CAST($v AS DOUBLE)"
    // new CLCG state (from previous-iteration s1/s2) and its uniform
    val s1n = "((40014 * s1) % 2147483563)"
    val s2n = "((40692 * s2) % 2147483399)"
    val z   = s"($s1n - $s2n)"
    val u   = s"(CAST(CASE WHEN $z < 1 THEN $z + 2147483562 ELSE $z END AS DOUBLE) / 2147483563.0)"
    // capital state machine, every field from previous-iteration columns
    val tier  = s"CASE WHEN cap < ${d(1500)} THEN ${d(500)} WHEN cap < ${d(2500)} THEN ${d(1000)} " +
      s"WHEN cap < ${d(4000)} THEN ${d(1500)} ELSE ${d(2000)} END"
    val b0    = s"(CASE WHEN (t % 9) = 0 THEN $tier ELSE bet END)"
    val bet1  = s"(CASE WHEN cap <= $b0 THEN cap ELSE $b0 END)"
    val ruinN = s"(ruined OR cap < ${d(500)})"
    val ret   = s"(CASE WHEN $u < ${d(0.556)} THEN ${d(0.40)} WHEN $u < ${d(0.778)} THEN ${d(-0.25)} ELSE ${d(0.0)} END)"
    val capT  = s"(cap + $bet1 * $ret)"
    val peakN = s"greatest(peak, $capT)"
    val month = "((t // 9) + 1)"
    s"""WITH RECURSIVE sim AS (
       |  SELECT range AS path, CAST(0 AS BIGINT) AS t,
       |    CAST(1 + (42 * 1000003 + range * 7919) % 2147483562 AS BIGINT) AS s1,
       |    CAST(1 + (42 * 31 + range * 104729) % 2147483398 AS BIGINT) AS s2,
       |    ${d(2500)} AS cap, ${d(2500)} AS peak, ${d(0)} AS maxdd,
       |    false AS ruined, ${d(0)} AS bet
       |  FROM range(0, 10000)
       |  UNION ALL
       |  SELECT path, t + 1, $s1n AS s1, $s2n AS s2,
       |    CASE WHEN $ruinN THEN cap
       |         WHEN (t % 9) = 8 AND $month >= 4 AND $capT > ${d(5000)} THEN $capT - ${d(2000)}
       |         ELSE $capT END AS cap,
       |    CASE WHEN $ruinN THEN peak ELSE $peakN END AS peak,
       |    CASE WHEN $ruinN THEN maxdd ELSE greatest(maxdd, ($peakN - $capT) / $peakN) END AS maxdd,
       |    $ruinN AS ruined,
       |    CASE WHEN ruined THEN bet ELSE $bet1 END AS bet
       |  FROM sim WHERE t < 108
       |), fin AS (
       |  SELECT CASE WHEN ruined THEN ${d(0)} ELSE cap END AS fc, ruined, maxdd
       |  FROM sim WHERE t = 108
       |)
       |SELECT ${mr("avg(CASE WHEN ruined THEN 1.0 ELSE 0.0 END) * 100", 2)} AS ruin_pct,
       |  ${mr("quantile_cont(fc, 0.5)", 2)} AS median_capital,
       |  ${mr("quantile_cont(fc, 0.9)", 2)} AS p90_capital,
       |  ${mr("max(maxdd) * 100", 2)} AS worst_drawdown_pct
       |FROM fin""".stripMargin
  }

  /** q275 oracle: bit-exact DuckDB replay of the CLCG-seeded empirical
    * bootstrap (kernels/MonteCarlo.bootstrapClcg at q275's parameters).
    * Same construction as [[monteCarloOracle]], with two twists:
    *  - the per-path loop has TWO variable-length phases (Poisson-Knuth
    *    draw, then k resampled trades) — the CTE runs a fixed 160 steps
    *    with a phase column (0 = poisson, 1 = trade, 2 = done) and each
    *    active step consumes exactly one uniform, mirroring the Scala
    *    loop's draw order; frozen rows carry state unchanged. 160 covers
    *    poisson draws + trades for every seeded path (BootstrapSpec
    *    asserts the actual max with margin; P(k > 79) under
    *    Poisson(6) ~ 1e-60).
    *  - exp(-lambda) is NOT computed in SQL: Math.exp isn't correctly
    *    rounded, so the JVM value rides in as a shortest-repr literal
    *    that DuckDB's strtod re-materializes bit-exactly. */
  private val bootstrapOracle: String = {
    def mr(e: String, n: Int) =
      s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,20)), $n) AS DOUBLE)"
    val limit = s"CAST('${math.exp(-6.0)}' AS DOUBLE)"
    val s1n = "((40014 * s1) % 2147483563)"
    val s2n = "((40692 * s2) % 2147483399)"
    val z   = s"($s1n - $s2n)"
    val u   = s"(CAST(CASE WHEN $z < 1 THEN $z + 2147483562 ELSE $z END AS DOUBLE) / 2147483563.0)"
    val pn   = s"(p * $u)"
    val bet  = "least(CAST(750.0 AS DOUBLE), cap)"
    val ret  = s"list_extract(rp, CAST(floor($u * 32.0) AS BIGINT) + 1)"
    val capN = s"(cap + ($bet * $ret) / 100.0)"
    val peakN = s"greatest(peak, $capN)"
    s"""WITH RECURSIVE pool AS (
       |  SELECT list((least(value, 100.0) - 50.0) / 5.0 ORDER BY event_id) AS rp
       |  FROM (SELECT event_id, value FROM events ORDER BY event_id LIMIT 32)
       |), sim AS (
       |  SELECT range AS path, CAST(0 AS BIGINT) AS t,
       |    CAST(1 + (42 * 1000003 + range * 7919) % 2147483562 AS BIGINT) AS s1,
       |    CAST(1 + (42 * 31 + range * 104729) % 2147483398 AS BIGINT) AS s2,
       |    CAST(0 AS INT) AS ph, CAST(1.0 AS DOUBLE) AS p,
       |    CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS tr,
       |    CAST(1000.0 AS DOUBLE) AS cap, CAST(1000.0 AS DOUBLE) AS peak,
       |    CAST(0.0 AS DOUBLE) AS maxdd, (SELECT rp FROM pool) AS rp
       |  FROM range(0, 10000)
       |  UNION ALL
       |  SELECT path, t + 1,
       |    CAST($s1n AS BIGINT) AS s1, CAST($s2n AS BIGINT) AS s2,
       |    CASE WHEN ph = 0 THEN
       |           CASE WHEN $pn > $limit THEN 0
       |                WHEN k = 0 THEN 2 ELSE 1 END
       |         WHEN ph = 1 THEN
       |           CASE WHEN tr + 1 >= k OR $capN <= 0.0 THEN 2 ELSE 1 END
       |         ELSE 2 END AS ph,
       |    CASE WHEN ph = 0 THEN $pn ELSE p END AS p,
       |    CASE WHEN ph = 0 AND $pn > $limit THEN k + 1 ELSE k END AS k,
       |    CASE WHEN ph = 1 THEN tr + 1 ELSE tr END AS tr,
       |    CASE WHEN ph = 1 THEN $capN ELSE cap END AS cap,
       |    CASE WHEN ph = 1 THEN $peakN ELSE peak END AS peak,
       |    CASE WHEN ph = 1 THEN greatest(maxdd, ($peakN - $capN) / $peakN)
       |         ELSE maxdd END AS maxdd,
       |    rp
       |  FROM sim WHERE t < 160
       |), fin AS (
       |  SELECT cap AS fc, cap <= CAST(250.0 AS DOUBLE) AS ruined, maxdd
       |  FROM sim WHERE t = 160
       |)
       |SELECT ${mr("avg(CASE WHEN ruined THEN 1.0 ELSE 0.0 END) * 100", 2)} AS ruin_pct,
       |  ${mr("quantile_cont(fc, 0.5)", 2)} AS median_capital,
       |  ${mr("quantile_cont(fc, 0.9)", 2)} AS p90_capital,
       |  ${mr("max(maxdd) * 100", 2)} AS worst_drawdown_pct
       |FROM fin""".stripMargin
  }

  /** q277 oracle: Fellegi–Sunter linkage replay. The four log2
    * likelihood-ratio weights are computed once on the JVM (same
    * [[graft.operators.Linkage.Comparison]] arithmetic the engine uses)
    * and ride in as shortest-repr literals; the score is the same
    * left-associated 0.0 + w₁ + w₂ + w₃ fold. Spark's thresholded
    * levenshtein(a, b, 2) >= 0 becomes DuckDB's full levenshtein <= 2. */
  private val linkageOracle: String = {
    def mr(e: String, n: Int) =
      s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,20)), $n) AS DOUBLE)"
    def w(c: graft.operators.Linkage.Comparison, agreeCol: String) =
      s"CASE WHEN $agreeCol THEN CAST('${c.agreeWeight}' AS DOUBLE) " +
        s"ELSE CAST('${c.disagreeWeight}' AS DOUBLE) END"
    val name = graft.operators.Linkage.Comparison("name_agr", 0.95, 0.3)
    val bal = graft.operators.Linkage.Comparison("bal_agr", 0.9, 0.001)
    val seg = graft.operators.Linkage.Comparison("seg_agr", 0.7, 0.2)
    s"""WITH c AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
       |  UNION ALL
       |  SELECT c_custkey + 1000000, substr(c_name, 1, 17) || 'Q', c_nationkey,
       |    c_acctbal + CAST(0.01 AS DOUBLE), c_mktsegment
       |  FROM customer WHERE c_custkey % 10 = 0),
       |p AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       |    (levenshtein(a.c_name, b.c_name) <= 2) AS name_agr,
       |    (abs(a.c_acctbal - b.c_acctbal) <= CAST(0.02 AS DOUBLE)) AS bal_agr,
       |    (a.c_mktsegment = b.c_mktsegment) AS seg_agr
       |  FROM c a JOIN c b
       |    ON substr(a.c_name, 1, 17) = substr(b.c_name, 1, 17)
       |    AND a.c_custkey < b.c_custkey),
       |s AS (SELECT id_a, id_b,
       |    CAST(0.0 AS DOUBLE) + ${w(name, "name_agr")}
       |      + ${w(bal, "bal_agr")} + ${w(seg, "seg_agr")} AS score
       |  FROM p)
       |SELECT id_a, id_b, ${mr("score", 4)} AS score,
       |  CASE WHEN score >= CAST(8.0 AS DOUBLE) THEN 'match'
       |       WHEN score <= CAST(0.5 AS DOUBLE) THEN 'nonmatch'
       |       ELSE 'possible' END AS decision
       |FROM s WHERE score > CAST(0.5 AS DOUBLE)""".stripMargin
  }

  /** q281 oracle: banded-DTW recursive CTE. One iteration per series-a
    * index; the DP row rides as a BIGINT list rebuilt left-to-right by
    * list_reduce with a BARE-LIST accumulator (DuckDB 1.0's struct-
    * accumulator lambdas drop accumulated list state — the q40 family —
    * but plain lists fold correctly; the prepended [INF] seed is the
    * dp[i][0] boundary and each element [j] carries its own index). All
    * arithmetic is BIGINT, so cells match the Scala kernel bit-exactly;
    * the INF sentinel marks out-of-band/unreachable cells and a final
    * cell >= INF reports NULL. */
  private val dtwOracle: String = {
    val inf = graft.operators.Dtw.Inf
    s"""WITH RECURSIVE d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
       |s AS (SELECT event_type AS k, list(x ORDER BY day) AS v FROM d GROUP BY 1),
       |pr AS (SELECT a.k AS ka, b.k AS kb, a.v AS va, b.v AS vb
       |  FROM s a JOIN s b ON a.k < b.k),
       |dp AS (
       |  SELECT ka, kb, va, vb, 0 AS i,
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, len(vb) + 1), j -> CAST($inf AS BIGINT))) AS row
       |  FROM pr
       |  UNION ALL
       |  SELECT ka, kb, va, vb, i + 1,
       |    list_reduce(
       |      list_prepend([CAST($inf AS BIGINT)],
       |        list_transform(range(1, len(vb) + 1), j -> [CAST(j AS BIGINT)])),
       |      (acc, x) -> list_append(acc,
       |        CASE WHEN abs((i + 1) - x[1]) <= 30 THEN
       |          least(row[x[1] + 1], row[x[1]], acc[len(acc)])
       |            + abs(va[i + 1] - vb[x[1]])
       |        ELSE CAST($inf AS BIGINT) END)) AS row
       |  FROM dp WHERE i < len(va))
       |SELECT ka AS key_a, kb AS key_b,
       |  CAST(len(va) AS INT) AS n_a, CAST(len(vb) AS INT) AS n_b,
       |  CASE WHEN row[len(vb) + 1] >= $inf THEN NULL
       |       ELSE row[len(vb) + 1] END AS dtw
       |FROM dp WHERE i = len(va)""".stripMargin
  }

  /** q286 oracle: BPE merge learning, the 8 rounds UNROLLED as generated
    * CTE triples (pair census → deterministic argmax → greedy re-merge).
    * The merge fold uses the bare-list accumulator whose last element is
    * the pending carry (the q281 DuckDB discipline: struct accumulators
    * drop list state); initial symbols come from substr, since
    * split-on-empty-string semantics differ across engines. */
  /** Shared q286/q287 learning rounds: w0 (global word-type census as
    * symbol lists) plus 8 unrolled (pair census → argmax → re-merge)
    * CTE triples. */
  private val bpeLearnCtes: String = {
    val rounds = (1 to 8).map { r =>
      s"""p$r AS (SELECT p.l AS l, p.r AS r, CAST(sum(f) AS BIGINT) AS c
         |  FROM (SELECT f, unnest(list_transform(range(1, len(syms)),
         |      i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS p
         |    FROM w${r - 1}) GROUP BY 1, 2),
         |b$r AS (SELECT l, r, c FROM p$r ORDER BY c DESC, l, r LIMIT 1),
         |w$r AS (SELECT f, list_reduce(list_transform(syms, s -> [s]),
         |    (acc, x) -> CASE
         |      WHEN acc[len(acc)] = b.l AND x[1] = b.r THEN
         |        list_append(list_slice(acc, 1, len(acc) - 1), b.l || b.r)
         |      ELSE list_append(acc, x[1]) END) AS syms
         |  FROM w${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS f,
       |    list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)) AS syms
       |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |        FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |$rounds""".stripMargin
  }

  private val bpeOracle: String = {
    val out = (1 to 8).map(r =>
      s"""SELECT CAST($r AS INT) AS merge_rank, l AS "left", r AS "right",
         |  c AS pair_count FROM b$r""".stripMargin).mkString("\nUNION ALL\n")
    s"WITH $bpeLearnCtes\n$out"
  }

  /** q287 oracle: the q286 learning rounds, then the 8 merges re-applied
    * in rank order to the PER-SOURCE word census (same bare-list greedy
    * fold), then the fertility census. */
  private val bpeFertilityOracle: String = {
    def mr(e: String, n: Int) =
      s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,20)), $n) AS DOUBLE)"
    val applies = (1 to 8).map { r =>
      s"""a$r AS (SELECT g, w, f, list_reduce(list_transform(syms, s -> [s]),
         |    (acc, x) -> CASE
         |      WHEN acc[len(acc)] = b.l AND x[1] = b.r THEN
         |        list_append(list_slice(acc, 1, len(acc) - 1), b.l || b.r)
         |      ELSE list_append(acc, x[1]) END) AS syms
         |  FROM a${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeLearnCtes,
       |sc AS (SELECT g, w, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT source AS g,
       |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |    FROM documents)
       |  WHERE length(w) > 0 GROUP BY 1, 2),
       |a0 AS (SELECT g, w, f,
       |    list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)) AS syms
       |  FROM sc),
       |$applies
       |SELECT g AS source, CAST(count(*) AS BIGINT) AS n_types,
       |  CAST(sum(f) AS BIGINT) AS n_words,
       |  CAST(sum(f * length(w)) AS BIGINT) AS n_chars,
       |  CAST(sum(f * len(syms)) AS BIGINT) AS n_tokens,
       |  ${mr("CAST(sum(f * len(syms)) AS DOUBLE) / CAST(sum(f) AS DOUBLE)", 6)}
       |    AS tokens_per_word,
       |  ${mr("CAST(sum(f * length(w)) AS DOUBLE) / CAST(sum(f * len(syms)) AS DOUBLE)", 6)}
       |    AS chars_per_token
       |FROM a8 GROUP BY g""".stripMargin
  }

  /** q280 oracle: full product-quantization replay — smallest-id
    * codebook, per-subspace argmin encode (list_reduce keep-first ==
    * Spark's array_min struct ordering on ties), probe distance tables,
    * and the subspace-ordered ADC sum. Every float fold is in-order on
    * both sides (list_reduce's first-element seed == Spark's 0.0 + t₁). */
  private val pqAdcOracle: String = {
    def mr(e: String, n: Int) =
      s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,20)), $n) AS DOUBLE)"
    def l2sq(a: String, b: String) =
      s"""list_reduce(list_transform(list_zip($a, $b),
         |      p2 -> (p2[1] - p2[2]) * (p2[1] - p2[2])), (a, b) -> a + b)""".stripMargin
    val dTbl = l2sq("list_slice(e.v, s*8 + 1, s*8 + 8)",
      "list_slice(cb.cbl[j + 1].v, s*8 + 1, s*8 + 8)")
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cb AS (SELECT list(struct_pack(code := code, v := v) ORDER BY code) AS cbl
       |  FROM (SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS code
       |        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16))),
       |enc AS (SELECT e.vec_id, list_transform(range(0, 8), s ->
       |    list_reduce(list_transform(range(0, 16), j -> struct_pack(
       |        d := $dTbl,
       |        j := j)),
       |      (a, b) -> CASE WHEN b.d < a.d THEN b ELSE a END).j) AS codes
       |  FROM e, cb),
       |p AS (SELECT e.vec_id AS probe_id, list_transform(range(0, 8), s ->
       |    list_transform(range(0, 16), j -> $dTbl)) AS dt
       |  FROM e, cb WHERE e.vec_id < 5),
       |sc AS (SELECT p.probe_id, enc.vec_id AS corpus_id,
       |    list_reduce(list_transform(range(0, 8),
       |      s -> p.dt[s + 1][enc.codes[s + 1] + 1]), (a, b) -> a + b) AS adist
       |  FROM enc, p WHERE enc.vec_id <> p.probe_id),
       |r AS (SELECT probe_id, corpus_id, adist,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY adist, corpus_id) AS rnk
       |  FROM sc)
       |SELECT probe_id, CAST(rnk AS INT) AS "rank", corpus_id,
       |  ${mr("adist", 6)} AS adist
       |FROM r WHERE rnk <= 5""".stripMargin
  }

  /** q289 oracle: greedy max-coverage, 6 rounds unrolled — each a
    * marginal-gain census (anti-join vs the covered set), a 1-row
    * deterministic argmax, and the grown covered/remaining sets;
    * covered_total is the literal sum of the winners' gains. */
  private val greedyCoverageOracle: String = {
    val k = 6
    val rounds = (1 to k).map { r =>
      val prevCov = if (r == 1) "" else s" ANTI JOIN c${r - 1} USING (tok)"
      val docsSrc = if (r == 1) "docs" else s"r${r - 1}"
      val cPrev = if (r == 1) "" else s"SELECT tok FROM c${r - 1} UNION "
      s"""g$r AS (SELECT d.doc, COALESCE(x.g, CAST(0 AS BIGINT)) AS g
         |  FROM $docsSrc d LEFT JOIN (
         |    SELECT doc, CAST(count(*) AS BIGINT) AS g
         |    FROM dt$prevCov GROUP BY doc) x ON d.doc = x.doc),
         |s$r AS (SELECT doc, g FROM g$r ORDER BY g DESC, doc LIMIT 1),
         |c$r AS (SELECT DISTINCT tok FROM (
         |  ${cPrev}SELECT dt.tok FROM dt, s$r WHERE dt.doc = s$r.doc)),
         |r$r AS (SELECT d.doc FROM $docsSrc d, s$r WHERE d.doc <> s$r.doc)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map { r =>
      val tot = (1 to r).map(i => s"(SELECT g FROM s$i)").mkString(" + ")
      s"""SELECT CAST($r AS INT) AS select_rank, doc AS doc_id, g AS gain,
         |  CAST($tot AS BIGINT) AS covered_total FROM s$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH dt AS (SELECT DISTINCT doc, tok FROM (
       |    SELECT doc_id AS doc,
       |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |    FROM documents) WHERE length(tok) > 0),
       |docs AS (SELECT DISTINCT doc FROM dt
       |  UNION SELECT DISTINCT doc_id FROM documents),
       |$rounds
       |$out""".stripMargin
  }

  /** q279 oracle: NDCG@10 replay. The ten position discounts are the
    * SAME JVM 1/log2(i+1) doubles the engine folds with (shortest-repr
    * literals); both folds run over rank-ordered ≤10-element lists with
    * list_reduce's first-element seed equal to Spark's 0.0 + t₁. */
  private val ndcgOracle: String = {
    def mr(e: String, n: Int) =
      s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,20)), $n) AS DOUBLE)"
    val disc = (1 to 10)
      .map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
      .map(d => s"CAST('$d' AS DOUBLE)").mkString("[", ", ", "]")
    def fold(rankExpr: String, out: String) =
      s"""SELECT q, CAST(count(*) AS BIGINT) AS n_$out,
         |  list_reduce(list_transform(
         |    list(struct_pack(rk := rk, rel := rel) ORDER BY rk),
         |    e -> CAST((CAST(1 AS BIGINT) << CAST(e.rel AS INT)) - 1 AS DOUBLE)
         |         * list_extract($disc, e.rk)), (a, b) -> a + b) AS $out
         |FROM (SELECT q, rel,
         |        row_number() OVER (PARTITION BY q ORDER BY $rankExpr) AS rk
         |      FROM r) t WHERE rk <= 10 GROUP BY q""".stripMargin
    s"""WITH b AS (SELECT event_type AS q, user_id AS doc, max(value) AS s
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT q, doc, s, CAST(doc % 4 AS BIGINT) AS rel FROM b),
       |n AS (SELECT q, CAST(count(*) AS BIGINT) AS n_docs FROM r GROUP BY 1),
       |d AS (${fold("s DESC, doc", "dcg")}),
       |i AS (${fold("rel DESC, doc", "idcg")})
       |SELECT n.q AS event_type, n.n_docs,
       |  ${mr("d.dcg", 6)} AS dcg, ${mr("i.idcg", 6)} AS idcg,
       |  CASE WHEN i.idcg > 0.0 THEN ${mr("d.dcg / i.idcg", 6)} END AS ndcg
       |FROM n JOIN d ON n.q = d.q JOIN i ON n.q = i.q""".stripMargin
  }

  /** q276 oracle: Benford first-digit census. The nine probabilities
    * ride in as the JVM's shortest-repr literals (Math.log10 is not
    * correctly-rounded — the q275 seam discipline); the chi² fold runs
    * in digit order via list_reduce, whose first-element seed equals the
    * Spark fold's 0.0 + t₁. Every aggregate output CAST to BIGINT. */
  private val benfordOracle: String = {
    def mr(e: String, n: Int) =
      s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,20)), $n) AS DOUBLE)"
    val parr = graft.operators.Profile.BenfordP
      .map(p => s"CAST('$p' AS DOUBLE)").mkString("[", ", ", "]")
    val e = s"(list_extract($parr, x.digit) * CAST(n_group AS DOUBLE))"
    val term = s"((CAST(x.n_obs AS DOUBLE) - $e) * (CAST(x.n_obs AS DOUBLE) - $e) / $e - $e)"
    s"""WITH c AS (SELECT l_returnflag AS g,
       |    CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
       |    CAST(count(*) AS BIGINT) AS n_obs
       |  FROM lineitem WHERE floor(l_extendedprice) > 0 GROUP BY 1, 2),
       |gg AS (SELECT g, CAST(sum(n_obs) AS BIGINT) AS n_group,
       |    list(struct_pack(digit := digit, n_obs := n_obs) ORDER BY digit) AS dl
       |  FROM c GROUP BY 1),
       |f AS (SELECT g, n_group,
       |    list_reduce(list_transform(dl, x -> $term), (a, b) -> a + b)
       |      + CAST(n_group AS DOUBLE) AS chi2
       |  FROM gg)
       |SELECT c.g AS l_returnflag, c.digit, c.n_obs, f.n_group,
       |  ${mr(s"list_extract(${parr}, c.digit)", 6)} AS p_benford,
       |  ${mr("f.chi2", 4)} AS chi2
       |FROM c JOIN f ON c.g = f.g""".stripMargin
  }

  /** q89/q110 oracle: exact 8-gram overlap census between the train split
    * (planted contamination included) and the test split. */
  private val decontaminationOracle: String =
    """WITH tok AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
      |testsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, greatest(len(toks)-6, 1)),
      |i -> array_to_string(list_slice(toks, i, i+7), ' ')))) AS sh FROM tok WHERE doc_id < 10),
      |train AS (SELECT doc_id, toks FROM tok WHERE doc_id >= 10
      |UNION ALL SELECT doc_id + 2000, toks FROM tok WHERE doc_id < 5),
      |trainsh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-6, 1)),
      |i -> array_to_string(list_slice(toks, i, i+7), ' ')))) AS sh FROM train)
      |SELECT t.doc_id, COUNT(DISTINCT t.sh) AS n_shared_shingles
      |FROM trainsh t WHERE EXISTS (SELECT 1 FROM testsh WHERE testsh.sh = t.sh)
      |GROUP BY t.doc_id""".stripMargin

  /** DuckDB expression replaying [[graft.functions.TextOps.cleanText]]
    * over `src` — shared by the q104 and q112 oracles. */
  private def duckCleanExpr(src: String): String = {
    var e = src
    e = s"regexp_replace($e, '<[^>]*>', ' ', 'g')"
    for ((ent, rep) <- graft.functions.TextOps.htmlEntities) {
      val r = rep.replace("'", "''")
      e = s"regexp_replace($e, '$ent', '$r', 'g')"
    }
    e = s"regexp_replace($e, '[\\x00-\\x1F\\x7F]', ' ', 'g')"
    s"trim(regexp_replace($e, '\\s+', ' ', 'g'))"
  }

  /** Brute-force cosine top-`k` for probes matching `probePred` — the
    * exact answer every saturated ANN run must reproduce (q79/q94 at
    * probes 0..4; q80/q82 at probes 5..9). */
  private def cosineTopKOracleFor(probePred: String, k: Int): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE $probePred),
      |j AS (SELECT p.probe_id, e.vec_id AS corpus_id,
      |list_aggregate(list_transform(list_zip(e.v, p.pv), x -> x[1]*x[2]), 'sum') /
      |(sqrt(list_aggregate(list_transform(e.v, x -> x*x), 'sum')) *
      | sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum'))) AS cos
      |FROM e, p WHERE e.vec_id <> p.probe_id),
      |r AS (SELECT probe_id, corpus_id, cos,
      |ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, corpus_id) AS rnk FROM j)
      |SELECT probe_id, CAST(rnk AS INT) AS "rank", corpus_id, round(cos, 4) AS cos
      |FROM r WHERE rnk <= $k""".stripMargin

  private val cosineTopKOracle: String = cosineTopKOracleFor("vec_id < 5", 5)

  /** q76 oracle: exhaustive exact 3-gram-Jaccard pair set over the FULL
    * corpus (the q75/q85 check without the fixture restriction). The
    * length prefilter is sound — j >= 0.5 forces |A|/|B| within [1/2, 2]
    * for distinct shingle sets (|A∩B| <= min, |A∪B| >= max) — and spares
    * DuckDB most of the quadratic list_intersect work. */
  private val corpusJaccardOracle: String =
    """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
      |i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS sh FROM t),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS j
      |FROM s a, s b WHERE a.doc_id < b.doc_id
      |AND len(a.sh) <= 2*len(b.sh) AND len(b.sh) <= 2*len(a.sh))
      |SELECT id_a, id_b, CAST(round(CAST(CAST(j AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS jaccard
      |FROM p WHERE j >= 0.5""".stripMargin

  /** DuckDB-equivalent SQL per query (same tables registered by name).
    *
    * Every CTE is force-MATERIALIZED on the way out ([[materializeCtes]]):
    * DuckDB inlines CTEs by default, so an unrolled iterative oracle
    * (HITS/PageRank/HyperANF round chains, where round N references
    * round N−1 from two or three places) re-evaluates the whole prefix
    * per reference — exponential in rounds. q245's 4-round HITS oracle
    * measured 494 s at sf0.01 inlined vs 0.09 s materialized; that one
    * query alone could blow the driver's correctness budget (the r8
    * CORRECTNESS file came back empty). Statements with RECURSIVE CTEs
    * are left untouched (a recursive CTE cannot be materialized; the
    * non-recursive members of those few statements are already cheap). */
  def oracleSql: Map[String, String] =
    oracleSqlRaw.map { case (k, v) => k -> materializeCtes(v) }

  /** Rewrites `name AS (SELECT` to `name AS MATERIALIZED (SELECT` —
    * top-level CTE definitions only: the lookahead for SELECT excludes
    * window definitions (`WINDOW w AS (PARTITION`), and derived-table
    * aliases are postfix (`(...) AS name`) so they can never match. */
  private[graft] def materializeCtes(sql: String): String =
    if (sql.contains("RECURSIVE")) sql
    else sql.replaceAll("(?i)\\b(\\w+)\\s+AS\\s*\\(\\s*(?=SELECT|VALUES)",
      "$1 AS MATERIALIZED (")

  private def oracleSqlRaw: Map[String, String] = Map(
    "q64_monte_carlo" -> monteCarloOracle,
    "q275_bootstrap" -> bootstrapOracle,
    "q276_benford" -> benfordOracle,
    "q277_record_linkage" -> linkageOracle,
    "q279_ndcg" -> ndcgOracle,
    "q280_pq_adc" -> pqAdcOracle,
    "q281_dtw" -> dtwOracle,
    // q284: word/sentence/vowel-group counts are regex-identical on both
    // engines (the q271 tokenization pairing); the score is one fixed-
    // order expression over exact integer sums
    "q284_flesch" ->
      """WITH c AS (SELECT source AS g,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS w,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
        |  FROM documents),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(w) AS BIGINT) AS words,
        |    CAST(sum(s) AS BIGINT) AS sentences,
        |    CAST(sum(y) AS BIGINT) AS syllables
        |  FROM c GROUP BY 1)
        |SELECT g AS source, n_docs, words, sentences, syllables,
        |  CASE WHEN words > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST('206.835' AS DOUBLE)
        |        - CAST('1.015' AS DOUBLE) * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
        |        - CAST('84.6' AS DOUBLE) * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS flesch
        |FROM a""".stripMargin,
    // q285: WOE per category is one ln of exact-integer-derived ratios;
    // IV folds category-ordered terms (list_reduce seed == 0.0 + t1)
    "q286_bpe_merges" -> bpeOracle,
    "q287_bpe_fertility" -> bpeFertilityOracle,
    "q289_greedy_coverage" -> greedyCoverageOracle,
    // q288: md5 block masks are per-row arithmetic (prev token's mask =
    // the hash of its block); string_agg ORDER BY pos skips NULLs just
    // like the filtered array_join; input/target char sums pin the
    // sentinel numbering
    "q288_span_corruption" ->
      """WITH tk AS (SELECT doc_id, source, u.pos AS pos, u.tok AS tok
        |  FROM (SELECT doc_id, source,
        |      unnest(list_transform(range(1, len(ts) + 1),
        |        i -> struct_pack(pos := i - 1, tok := ts[i]))) AS u
        |    FROM (SELECT doc_id, source,
        |        string_split_regex(trim(text), '\s+') AS ts FROM documents))
        |  WHERE length(u.tok) > 0),
        |mk AS (SELECT doc_id, source, pos, tok,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(pos // 3 AS VARCHAR)), 1, 2) < '28' AS m,
        |    (substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |       CAST(pos // 3 AS VARCHAR)), 1, 2) < '28')
        |      AND (pos = 0 OR NOT (substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |       CAST((pos - 1) // 3 AS VARCHAR)), 1, 2) < '28')) AS rise
        |  FROM tk),
        |pc AS (SELECT doc_id, source, pos, tok, m, rise,
        |    SUM(CASE WHEN rise THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
        |      ORDER BY pos ROWS UNBOUNDED PRECEDING) - 1 AS k
        |  FROM mk),
        |pp AS (SELECT doc_id, source, pos, m, rise,
        |    CASE WHEN rise THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
        |         WHEN m THEN NULL ELSE tok END AS piece_in,
        |    CASE WHEN rise THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || tok
        |         WHEN m THEN tok ELSE NULL END AS piece_tgt
        |  FROM pc),
        |d AS (SELECT doc_id, source,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
        |    CAST(sum(CASE WHEN rise THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |    COALESCE(string_agg(piece_in, ' ' ORDER BY pos), '') AS input,
        |    COALESCE(string_agg(piece_tgt, ' ' ORDER BY pos), '') AS target
        |  FROM pp GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_masked) AS BIGINT) AS n_masked,
        |  CAST(sum(n_spans) AS BIGINT) AS n_spans,
        |  CAST(sum(length(input)) AS BIGINT) AS input_chars,
        |  CAST(sum(length(target)) AS BIGINT) AS target_chars,
        |  CAST(round(CAST(CAST(
        |    CAST(sum(n_masked) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mask_rate
        |FROM d GROUP BY source""".stripMargin,
    "q285_woe" ->
      """WITH l AS (SELECT event_type AS category,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS p
        |  FROM events),
        |c AS (SELECT category, CAST(sum(p) AS BIGINT) AS n_pos,
        |    CAST(count(*) - sum(p) AS BIGINT) AS n_neg FROM l GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS pos,
        |    CAST(sum(n_neg) AS BIGINT) AS neg,
        |    CAST(count(*) AS BIGINT) AS k FROM c),
        |w AS (SELECT category, n_pos, n_neg,
        |    ln(((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(pos AS DOUBLE) + 0.5 * k))
        |      / ((CAST(n_neg AS DOUBLE) + 0.5) / (CAST(neg AS DOUBLE) + 0.5 * k))) AS woe,
        |    (CAST(n_pos AS DOUBLE) / CAST(pos AS DOUBLE)
        |      - CAST(n_neg AS DOUBLE) / CAST(neg AS DOUBLE)) AS pq
        |  FROM c, t),
        |iv AS (SELECT list_reduce(list(pq * woe ORDER BY category),
        |    (a, b) -> a + b) AS iv FROM w)
        |SELECT category, n_pos, n_neg,
        |  CAST(round(CAST(CAST(woe AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS woe,
        |  CAST(round(CAST(CAST(iv.iv AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS iv
        |FROM w, iv""".stripMargin,
    // q282: kappa = (n·agree − Σ row_k·col_k) / (n² − Σ row_k·col_k) —
    // exact integer censuses, HUGEINT products, one double division
    "q282_cohen_kappa" ->
      """WITH l AS (SELECT event_type AS g,
        |    CAST(CAST(floor(value) AS BIGINT) % 3 AS VARCHAR) AS a,
        |    CAST((CAST(floor(value) AS BIGINT) + (event_id % 2)) % 3 AS VARCHAR) AS b
        |  FROM events),
        |c AS (SELECT g, a, b, CAST(count(*) AS BIGINT) AS c FROM l GROUP BY 1, 2, 3),
        |t AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_items,
        |    CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree
        |  FROM c GROUP BY 1),
        |rm AS (SELECT g, a AS lbl, CAST(sum(c) AS BIGINT) AS ra FROM c GROUP BY 1, 2),
        |cm AS (SELECT g, b AS lbl, CAST(sum(c) AS BIGINT) AS cb FROM c GROUP BY 1, 2),
        |pe AS (SELECT g, sum(CAST(ra AS HUGEINT) * CAST(cb AS HUGEINT)) AS pe
        |  FROM rm JOIN cm USING (g, lbl) GROUP BY 1)
        |SELECT t.g AS event_type, t.n_items, t.n_agree,
        |  CASE WHEN CAST(n_items AS HUGEINT) * n_items - pe > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(CAST(n_items AS HUGEINT) * n_agree - pe AS DOUBLE) /
        |      CAST(CAST(n_items AS HUGEINT) * n_items - pe AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS kappa
        |FROM t JOIN pe ON t.g = pe.g""".stripMargin,
    // q283: doubled mid-ranks (spearman q260 discipline) keep R2a / 2U /
    // the tie term exact; z's float work is one sqrt + divisions
    "q283_mann_whitney" ->
      """WITH s AS (SELECT event_type AS g,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS isa,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(isa) AS BIGINT) AS ta FROM s GROUP BY 1, 2),
        |r AS (SELECT g, v, t, ta,
        |    2 * COALESCE(SUM(t) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM c),
        |a AS (SELECT g, CAST(sum(t) AS BIGINT) AS n, CAST(sum(ta) AS BIGINT) AS n_a,
        |    sum(CAST(ta AS HUGEINT) * CAST(r2 AS HUGEINT)) AS r2a,
        |    sum(CAST(t AS HUGEINT) * t * t - t) AS tie
        |  FROM r GROUP BY 1)
        |SELECT g AS event_type, n_a, CAST(n - n_a AS BIGINT) AS n_b,
        |  CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2,
        |  CASE WHEN n > 1 AND CAST(n_a AS HUGEINT) * (n - n_a) *
        |      (CAST(n AS HUGEINT) * n * n - n - tie) > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1)
        |           - CAST(n_a AS HUGEINT) * (n - n_a) AS DOUBLE) /
        |      (2.0 * sqrt(
        |        CAST(CAST(n_a AS HUGEINT) * (n - n_a) *
        |          (CAST(n AS HUGEINT) * n * n - n - tie) AS DOUBLE) /
        |        CAST(12 * CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS z
        |FROM a""".stripMargin,
    // q290: k-sample extension of q283 — exact doubled mid-ranks and tie
    // term; the ONE order-sensitive float sum (Σ R2i²/ni) folds
    // left-to-right in group order on both sides (list_reduce's init is
    // the first element; Spark's 0.0+t1 == t1 exactly)
    "q290_kruskal_wallis" ->
      """WITH s AS (SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS s,
        |    event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |cgv AS (SELECT s, g, v, CAST(count(*) AS BIGINT) AS tgv
        |  FROM s GROUP BY 1, 2, 3),
        |cv AS (SELECT s, v, CAST(sum(tgv) AS BIGINT) AS t FROM cgv GROUP BY 1, 2),
        |r AS (SELECT s, v, t,
        |    2 * COALESCE(SUM(t) OVER (PARTITION BY s ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM cv),
        |pg AS (SELECT cgv.s, cgv.g, CAST(sum(tgv) AS BIGINT) AS ni,
        |    sum(CAST(tgv AS HUGEINT) * r.r2) AS r2i
        |  FROM cgv JOIN r ON cgv.s = r.s AND cgv.v = r.v GROUP BY 1, 2),
        |sc AS (SELECT s, CAST(sum(t) AS BIGINT) AS n,
        |    sum(CAST(t AS HUGEINT) * t * t - t) AS tie FROM r GROUP BY 1),
        |f AS (SELECT s, CAST(count(*) AS BIGINT) AS k,
        |    list(CAST(r2i * r2i AS DOUBLE) / CAST(ni AS DOUBLE) ORDER BY g) AS terms
        |  FROM pg GROUP BY 1),
        |f2 AS (SELECT s, k, list_reduce(terms, (a, x) -> a + x) AS sterm FROM f),
        |j AS (SELECT f2.s, k, n,
        |    CASE WHEN n > 1 AND k > 1 THEN
        |      (3.0 * sterm) / CAST(CAST(n AS HUGEINT) * (n + 1) AS DOUBLE)
        |      - 3.0 * CAST(n + 1 AS DOUBLE) END AS h,
        |    CAST(tie AS DOUBLE) AS tied,
        |    CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE) AS n3nd,
        |    (CAST(n AS HUGEINT) * n * n - n) AS n3n, tie
        |  FROM f2 JOIN sc ON f2.s = sc.s)
        |SELECT s AS dow, k, n,
        |  CAST(round(CAST(CAST(h AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS h,
        |  CASE WHEN n > 1 AND k > 1 AND tie < n3n THEN
        |    CAST(round(CAST(CAST(h / (1.0 - tied / n3nd) AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS h_adj
        |FROM j""".stripMargin,
    // q304: integer dot products -> both argmaxes exact, id tiebreaks;
    // no float surface at all
    "q304_mutual_nn" ->
      """WITH qa AS (SELECT vec_id AS id_a, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS va
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |qb AS (SELECT vec_id AS id_b, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vb
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |s AS (SELECT id_a, id_b, list_sum(list_transform(range(1, 65),
        |      i -> CAST(va[i] AS HUGEINT) * vb[i])) AS dot
        |  FROM qa, qb),
        |ba AS (SELECT id_a, id_b, dot, row_number() OVER (PARTITION BY id_a
        |    ORDER BY dot DESC, id_b) AS r FROM s),
        |bb AS (SELECT id_a, id_b, row_number() OVER (PARTITION BY id_b
        |    ORDER BY dot DESC, id_a) AS r FROM s)
        |SELECT ba.id_a, ba.id_b, CAST(ba.dot AS BIGINT) AS dot
        |FROM ba JOIN bb ON ba.id_a = bb.id_a AND ba.id_b = bb.id_b
        |WHERE ba.r = 1 AND bb.r = 1""".stripMargin,
    // q305: all-integer TV numerator (absent-token mass folded in
    // closed form: N*ng - sum(ct*ng) over present tokens); one division
    "q305_total_variation" ->
      """WITH t AS (SELECT source, unnest(string_split_regex(
        |      lower(trim(text)), '\s+')) AS tok FROM documents),
        |cell AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cgt
        |  FROM t WHERE len(tok) > 0 GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(cgt) AS BIGINT) AS ng,
        |    CAST(count(*) AS BIGINT) AS vocab FROM cell GROUP BY 1),
        |ct AS (SELECT tok, CAST(sum(cgt) AS BIGINT) AS ctok
        |  FROM cell GROUP BY 1),
        |n AS (SELECT CAST(sum(ctok) AS HUGEINT) AS n FROM ct),
        |s AS (SELECT c.source,
        |    sum(abs(CAST(c.cgt AS HUGEINT) * n.n
        |          - CAST(ct.ctok AS HUGEINT) * g.ng)
        |      - CAST(ct.ctok AS HUGEINT) * g.ng) AS snum
        |  FROM cell c JOIN ct USING (tok)
        |    JOIN g ON g.source = c.source CROSS JOIN n
        |  GROUP BY 1)
        |SELECT g.source, g.ng AS n_tok, g.vocab,
        |  CAST(round(CAST(CAST(
        |    CAST(s.snum + n.n * g.ng AS DOUBLE) /
        |    CAST(2 * CAST(g.ng AS HUGEINT) * n.n AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS tv
        |FROM g JOIN s ON g.source = s.source CROSS JOIN n""".stripMargin,
    // q306: exact N_r census; r* and p0 are single divisions of exact
    // integers (HUGEINT product for (r+1)*N_{r+1})
    "q306_good_turing" ->
      """WITH t AS (SELECT source, unnest(string_split_regex(
        |      lower(trim(text)), '\s+')) AS tok FROM documents),
        |cell AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM t WHERE len(tok) > 0 GROUP BY 1, 2),
        |fof AS (SELECT source, c AS r, CAST(count(*) AS BIGINT) AS n_r
        |  FROM cell GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
        |    CAST(count(*) AS BIGINT) AS vocab FROM cell GROUP BY 1),
        |n1 AS (SELECT source, n_r AS nn1 FROM fof WHERE r = 1)
        |SELECT f.source, tot.n_tok, tot.vocab, f.r, f.n_r,
        |  CASE WHEN nx.n_r IS NOT NULL THEN
        |    CAST(round(CAST(CAST(
        |      CAST((f.r + 1) * CAST(nx.n_r AS HUGEINT) AS DOUBLE) /
        |      CAST(f.n_r AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS r_star,
        |  CAST(round(CAST(CAST(
        |    CAST(coalesce(n1.nn1, 0) AS DOUBLE) / CAST(tot.n_tok AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS p0
        |FROM fof f
        |LEFT JOIN fof nx ON nx.source = f.source AND nx.r = f.r + 1
        |JOIN tot ON tot.source = f.source
        |LEFT JOIN n1 ON n1.source = f.source
        |WHERE f.r <= 5""".stripMargin,
    // q307: symmetrized Newman estimator — five exact HUGEINT moments,
    // one terminal division
    "q307_assortativity" ->
      """WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
        |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM
        |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |    sum(CAST(du.d AS HUGEINT) + dv.d) AS sx,
        |    sum(2 * CAST(du.d AS HUGEINT) * dv.d) AS sxy,
        |    sum(CAST(du.d AS HUGEINT) * du.d
        |      + CAST(dv.d AS HUGEINT) * dv.d) AS sxx
        |  FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
        |SELECT nn.n_nodes, m.n_edges,
        |  CASE WHEN 2 * CAST(m.n_edges AS HUGEINT) * m.sxx - m.sx * m.sx
        |      <> 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(2 * CAST(m.n_edges AS HUGEINT) * m.sxy - m.sx * m.sx
        |        AS DOUBLE) /
        |      CAST(2 * CAST(m.n_edges AS HUGEINT) * m.sxx - m.sx * m.sx
        |        AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS r_assort
        |FROM m CROSS JOIN nn""".stripMargin,
    // q308: q283's doubled-U census; delta numerator and the Romano
    // band are exact integers (cross-multiplied HUGEINT compares)
    "q308_cliffs_delta" ->
      """WITH s AS (SELECT event_type AS g,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS isa,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(isa) AS BIGINT) AS ta FROM s GROUP BY 1, 2),
        |r AS (SELECT g, v, t, ta,
        |    2 * COALESCE(SUM(t) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM c),
        |a AS (SELECT g, CAST(sum(t) AS BIGINT) AS n, CAST(sum(ta) AS BIGINT) AS n_a,
        |    sum(CAST(ta AS HUGEINT) * CAST(r2 AS HUGEINT)) AS r2a
        |  FROM r GROUP BY 1),
        |d AS (SELECT g, n_a, CAST(n - n_a AS BIGINT) AS n_b,
        |    r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2h,
        |    CAST(n_a AS HUGEINT) * (n - n_a) AS den
        |  FROM a)
        |SELECT g AS event_type, n_a, n_b, CAST(u2h AS BIGINT) AS u2,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(u2h - den AS DOUBLE) / CAST(den AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS delta,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CASE WHEN abs(u2h - den) * 1000 < 147 * den THEN 'negligible'
        |      WHEN abs(u2h - den) * 1000 < 330 * den THEN 'small'
        |      WHEN abs(u2h - den) * 1000 < 474 * den THEN 'medium'
        |      ELSE 'large' END END AS magnitude
        |FROM d""".stripMargin,
    // q309: (block, treatment) max-cell census; Q is one division of
    // exact HUGEINT moments
    "q309_cochran_q" ->
      """WITH cells AS (SELECT user_id AS b, event_type AS tr,
        |    max(CASE WHEN value > 75.0 THEN 1 ELSE 0 END) AS x
        |  FROM events GROUP BY 1, 2),
        |ct AS (SELECT tr, CAST(sum(x) AS BIGINT) AS cj FROM cells GROUP BY 1),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(cj) AS HUGEINT) AS sc,
        |    sum(CAST(cj AS HUGEINT) * cj) AS sc2 FROM ct),
        |rt AS (SELECT b, CAST(sum(x) AS BIGINT) AS ri FROM cells GROUP BY 1),
        |rr AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(ri) AS HUGEINT) AS sr,
        |    sum(CAST(ri AS HUGEINT) * ri) AS sr2 FROM rt)
        |SELECT kk.k, rr.n_blocks,
        |  CASE WHEN kk.k * rr.sr - rr.sr2 <> 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST((kk.k - 1) * (kk.k * kk.sc2 - kk.sc * kk.sc) AS DOUBLE) /
        |      CAST(kk.k * rr.sr - rr.sr2 AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS q
        |FROM rr CROSS JOIN kk""".stripMargin,
    // q310: complete-block filter, doubled within-block mid-ranks, and
    // the tie-corrected chi2 as a ratio of exact HUGEINTs
    "q310_friedman" ->
      """WITH cell AS (SELECT user_id AS b, event_type AS tr,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT tr) AS BIGINT) AS k FROM cell),
        |comp AS (SELECT b FROM cell GROUP BY b
        |  HAVING count(*) = (SELECT k FROM kk)),
        |inb AS (SELECT cell.* FROM cell JOIN comp USING (b)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks FROM comp),
        |tied AS (SELECT b, v, CAST(count(*) AS BIGINT) AS t
        |  FROM inb GROUP BY 1, 2),
        |r AS (SELECT b, v, 2 * COALESCE(SUM(t) OVER (PARTITION BY b
        |      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) + t + 1 AS r2
        |  FROM tied),
        |rk AS (SELECT inb.tr, r.r2 FROM inb JOIN r
        |  ON inb.b = r.b AND inb.v = r.v),
        |pt AS (SELECT tr, CAST(sum(r2) AS HUGEINT) AS r2j
        |  FROM rk GROUP BY 1),
        |a2 AS (SELECT sum(CAST(r2 AS HUGEINT) * r2) AS a2 FROM rk),
        |sn AS (SELECT sum((r2j - nn.n_blocks * (kk.k + 1))
        |    * (r2j - nn.n_blocks * (kk.k + 1))) AS snum
        |  FROM pt CROSS JOIN kk CROSS JOIN nn)
        |SELECT kk.k, nn.n_blocks,
        |  CASE WHEN a2.a2 <> CAST(nn.n_blocks AS HUGEINT) * kk.k
        |      * (kk.k + 1) * (kk.k + 1) THEN
        |    CAST(round(CAST(CAST(
        |      CAST((kk.k - 1) * sn.snum AS DOUBLE) /
        |      CAST(a2.a2 - CAST(nn.n_blocks AS HUGEINT) * kk.k
        |        * (kk.k + 1) * (kk.k + 1) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS chi2
        |FROM kk CROSS JOIN nn CROSS JOIN a2 CROSS JOIN sn""".stripMargin,
    // q311: exact integer rationals throughout; kappa cross-multiplies
    // (A*F - E*B)/(B*(F - E)) in HUGEINT
    "q311_fleiss_kappa" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn FROM events),
        |f AS (SELECT user_id, event_type FROM r WHERE rn <= 4),
        |cells AS (SELECT user_id AS s, event_type AS cat,
        |    CAST(count(*) AS BIGINT) AS nij FROM f GROUP BY 1, 2),
        |bys AS (SELECT s, CAST(sum(nij) AS BIGINT) AS tot,
        |    sum(CAST(nij AS HUGEINT) * nij) AS sq FROM cells GROUP BY 1),
        |kept AS (SELECT s, sq FROM bys WHERE tot = 4),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        |  FROM bys WHERE tot <> 4),
        |ctot AS (SELECT cat, CAST(sum(nij) AS BIGINT) AS cj
        |  FROM cells JOIN kept USING (s) GROUP BY 1),
        |cats AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
        |    sum(CAST(cj AS HUGEINT) * cj) AS e FROM ctot),
        |subj AS (SELECT CAST(count(*) AS BIGINT) AS n_subjects,
        |    CAST(coalesce(sum(sq), 0) AS HUGEINT) AS ssq FROM kept),
        |m AS (SELECT subj.n_subjects, drp.n_dropped, cats.n_categories,
        |    ssq - CAST(n_subjects AS HUGEINT) * 4 AS a,
        |    CAST(n_subjects AS HUGEINT) * 4 * 3 AS b,
        |    cats.e AS e,
        |    CAST(n_subjects AS HUGEINT) * 4
        |      * CAST(n_subjects AS HUGEINT) * 4 AS f
        |  FROM subj CROSS JOIN drp CROSS JOIN cats)
        |SELECT CAST(4 AS BIGINT) AS n_raters, n_subjects, n_dropped,
        |  n_categories,
        |  CASE WHEN n_subjects > 0 THEN
        |    CAST(round(CAST(CAST(CAST(a AS DOUBLE) / CAST(b AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS p_bar,
        |  CASE WHEN n_subjects > 0 THEN
        |    CAST(round(CAST(CAST(CAST(e AS DOUBLE) / CAST(f AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS p_e,
        |  CASE WHEN n_subjects > 0 AND f <> e THEN
        |    CAST(round(CAST(CAST(
        |      CAST(a * f - e * b AS DOUBLE) / CAST(b * (f - e) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS kappa
        |FROM m""".stripMargin,
    // q312: zipped-unnest bigrams; lift orders by the identical
    // correctly-rounded division on both engines, ties break on (x, y)
    "q312_collocations" ->
      """WITH toks AS (SELECT string_split_regex(lower(trim(text)), '\s+')
        |    AS ts FROM documents),
        |big0 AS (SELECT unnest(list_slice(ts, 1, len(ts) - 1)) AS x,
        |    unnest(list_slice(ts, 2, len(ts))) AS y
        |  FROM toks WHERE len(ts) >= 2),
        |big AS (SELECT x, y FROM big0 WHERE len(x) > 0 AND len(y) > 0),
        |census AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy
        |  FROM big GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x
        |  FROM census GROUP BY 1),
        |my AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y
        |  FROM census GROUP BY 1),
        |n AS (SELECT CAST(sum(c_xy) AS HUGEINT) AS n FROM census),
        |top AS (SELECT census.x, census.y, c_xy, c_x, c_y,
        |    CAST(CAST(c_xy AS HUGEINT) * n.n AS DOUBLE) /
        |      CAST(CAST(c_x AS HUGEINT) * c_y AS DOUBLE) AS lift
        |  FROM census JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n
        |  WHERE c_xy >= 5
        |  ORDER BY lift DESC, census.x, census.y LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY lift DESC, x, y)
        |    AS BIGINT) AS rank,
        |  x, y, c_xy, c_x, c_y,
        |  CAST(round(CAST(CAST(lift AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS lift
        |FROM top""".stripMargin,
    // q317: q239's census; every term t*(A*nb - B*na)^2 exact HUGEINT,
    // one terminal division by N^2*na*nb
    "q317_cramer_von_mises" ->
      """WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS r
        |  FROM events),
        |cen AS (SELECT v, CAST(SUM(1 - r) AS BIGINT) AS ca,
        |    CAST(SUM(r) AS BIGINT) AS cb FROM c GROUP BY v),
        |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb,
        |    CAST(COUNT(*) AS BIGINT) AS nv FROM cen),
        |cum AS (SELECT v, ca, cb, SUM(ca) OVER (ORDER BY v) AS a,
        |    SUM(cb) OVER (ORDER BY v) AS b FROM cen),
        |s AS (SELECT tot.na, tot.nb, tot.nv,
        |    sum(CAST(ca + cb AS HUGEINT)
        |      * (CAST(a AS HUGEINT) * tot.nb - CAST(b AS HUGEINT) * tot.na)
        |      * (CAST(a AS HUGEINT) * tot.nb - CAST(b AS HUGEINT) * tot.na))
        |      AS num
        |  FROM cum, tot GROUP BY tot.na, tot.nb, tot.nv)
        |SELECT na AS n_a, nb AS n_b, nv AS n_values,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    CAST(round(CAST(CAST(CAST(num AS DOUBLE) /
        |      CAST(CAST(na + nb AS HUGEINT) * (na + nb) * na * nb AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS t
        |FROM s""".stripMargin,
    // q318: q137's bucket grid unsmoothed; p=0 terms contribute exactly
    // the q-side limit; identical left-assoc float op order both engines
    "q318_jensen_shannon" ->
      """WITH t AS (SELECT source AS grp, unnest(string_split_regex(
        |      lower(trim(text)), '\s+')) AS tok FROM documents),
        |bx AS (SELECT grp, substr(md5(tok), 1, 2) AS b FROM t),
        |cell AS (SELECT grp, b, COUNT(*) AS n FROM bx GROUP BY grp, b),
        |gt AS (SELECT grp, SUM(n) AS g_tot FROM cell GROUP BY grp),
        |ca AS (SELECT b, SUM(n) AS c_n FROM cell GROUP BY b),
        |ct AS (SELECT SUM(c_n) AS c_tot FROM ca),
        |grid AS (SELECT gt.grp, gt.g_tot, ca.b, ca.c_n, ct.c_tot,
        |    COALESCE(cell.n, 0) AS n
        |  FROM gt CROSS JOIN ca CROSS JOIN ct
        |  LEFT JOIN cell ON cell.grp = gt.grp AND cell.b = ca.b),
        |t2 AS (SELECT grp, g_tot, b, n,
        |    CAST(n AS DOUBLE) / CAST(g_tot AS DOUBLE) AS p,
        |    CAST(c_n AS DOUBLE) / CAST(c_tot AS DOUBLE) AS q FROM grid),
        |t3 AS (SELECT grp, g_tot, b,
        |    CASE WHEN n > 0 THEN 0.5 * p * ln(2.0 * p / (p + q))
        |         ELSE CAST(0.0 AS DOUBLE) END
        |      + 0.5 * q * ln(2.0 * q / (p + q)) AS js FROM t2),
        |lists AS (SELECT grp, MAX(g_tot) AS n_tok,
        |    list(js ORDER BY b) AS lj FROM t3 GROUP BY grp)
        |SELECT grp AS source, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(round(CAST(CAST(list_reduce(lj, (a, x) -> a + x)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS js,
        |  CAST(round(CAST(CAST(list_reduce(lj, (a, x) -> a + x) / ln(2.0)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS js_norm
        |FROM lists""".stripMargin,
    // q319: descending cumulative census; argmax on cross-multiplied
    // HUGEINT J numerators, smallest-threshold tiebreak
    "q319_youden" ->
      """WITH s AS (SELECT event_type AS g,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS y,
        |    CAST(round(value * 100) AS BIGINT) % 101 AS sv
        |  FROM events),
        |c AS (SELECT g, sv, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS np FROM s GROUP BY 1, 2),
        |w AS (SELECT g, sv,
        |    CAST(sum(np) OVER (PARTITION BY g ORDER BY sv DESC) AS BIGINT) AS tp,
        |    CAST(sum(n - np) OVER (PARTITION BY g ORDER BY sv DESC) AS BIGINT) AS fp,
        |    CAST(sum(np) OVER (PARTITION BY g) AS BIGINT) AS npos,
        |    CAST(sum(n - np) OVER (PARTITION BY g) AS BIGINT) AS nneg
        |  FROM c),
        |j AS (SELECT g, sv, tp, fp, npos, nneg,
        |    CAST(tp AS HUGEINT) * nneg - CAST(fp AS HUGEINT) * npos AS jn
        |  FROM w),
        |best AS (SELECT *, row_number() OVER (PARTITION BY g
        |    ORDER BY jn DESC, sv ASC) AS rk FROM j)
        |SELECT g AS event_type, npos AS n_pos, nneg AS n_neg,
        |  sv AS threshold, tp, fp,
        |  CASE WHEN npos > 0 AND nneg > 0 THEN
        |    CAST(round(CAST(CAST(CAST(jn AS DOUBLE) /
        |      CAST(CAST(npos AS HUGEINT) * nneg AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS j
        |FROM best WHERE rk = 1""".stripMargin,
    // q320: q304's integer-dot ranking; rr and each precision term are
    // exact divisions; ap folds rank-ordered with a 0.0 seed both sides
    "q320_retrieval_eval" ->
      """WITH qa AS (SELECT vec_id AS qid, label AS ql, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS va
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |qb AS (SELECT vec_id AS did, label AS dl, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vb
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |sc AS (SELECT qid, did, CASE WHEN ql = dl THEN 1 ELSE 0 END AS rel,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(va[i] AS HUGEINT) * vb[i])) AS dot
        |  FROM qa, qb),
        |r AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot DESC, did) AS r FROM sc),
        |t AS (SELECT qid, r, rel,
        |    CAST(sum(rel) OVER (PARTITION BY qid ORDER BY r) AS BIGINT)
        |      AS cum
        |  FROM r WHERE r <= 10),
        |g AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_ranked,
        |    CAST(sum(rel) AS BIGINT) AS n_rel,
        |    min(CASE WHEN rel = 1 THEN r END) AS frst,
        |    list(CAST(cum AS DOUBLE) / CAST(r AS DOUBLE) ORDER BY r)
        |      FILTER (WHERE rel = 1) AS lp
        |  FROM t GROUP BY 1)
        |SELECT qid, n_ranked, n_rel,
        |  CASE WHEN n_rel > 0 THEN
        |    CAST(round(CAST(CAST(1.0 / CAST(frst AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS rr,
        |  CASE WHEN n_rel > 0 THEN
        |    CAST(round(CAST(CAST(
        |      list_reduce(lp, (a, x) -> a + x) / CAST(n_rel AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS ap
        |FROM g""".stripMargin,
    // q321: global day census supplies n (zero-days count); D is one
    // division of exact HUGEINT moments
    "q321_dispersion" ->
      """WITH cell AS (SELECT event_type AS g, CAST(ts AS DATE) AS p,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |nn AS (SELECT CAST(count(DISTINCT p) AS BIGINT) AS n_periods
        |  FROM cell),
        |s AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_events,
        |    sum(CAST(c AS HUGEINT) * c) AS s2 FROM cell GROUP BY 1)
        |SELECT g AS event_type, nn.n_periods, s.n_events,
        |  CAST(round(CAST(CAST(
        |    CAST(s.n_events AS DOUBLE) / CAST(nn.n_periods AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean,
        |  CASE WHEN s.n_events > 0 AND nn.n_periods > 1 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(nn.n_periods * s.s2
        |        - CAST(s.n_events AS HUGEINT) * s.n_events AS DOUBLE) /
        |      CAST((CAST(nn.n_periods AS HUGEINT) - 1) * s.n_events AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS dispersion
        |FROM s CROSS JOIN nn""".stripMargin,
    // q322: census-derived active-day exposures; RR one exact division,
    // Wald interval pinned-shape (1.96 literal, exp/ln parity)
    "q322_rate_ratio" ->
      """WITH s AS (SELECT event_type AS g,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS arm,
        |    CAST(ts AS DATE) AS ex FROM events),
        |c AS (SELECT g, CAST(sum(arm) AS BIGINT) AS n1,
        |    CAST(sum(1 - arm) AS BIGINT) AS n2,
        |    CAST(count(DISTINCT CASE WHEN arm = 1 THEN ex END) AS BIGINT) AS e1,
        |    CAST(count(DISTINCT CASE WHEN arm = 0 THEN ex END) AS BIGINT) AS e2
        |  FROM s GROUP BY 1)
        |SELECT g AS event_type, n1, e1, n2, e2,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND e1 > 0 AND e2 > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(CAST(n1 AS HUGEINT) * e2 AS DOUBLE) /
        |      CAST(CAST(n2 AS HUGEINT) * e1 AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS rate_ratio,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND e1 > 0 AND e2 > 0 THEN
        |    CAST(round(CAST(CAST(
        |      exp(ln(CAST(CAST(n1 AS HUGEINT) * e2 AS DOUBLE) /
        |             CAST(CAST(n2 AS HUGEINT) * e1 AS DOUBLE))
        |        - 1.96 * sqrt(1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS lo,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND e1 > 0 AND e2 > 0 THEN
        |    CAST(round(CAST(CAST(
        |      exp(ln(CAST(CAST(n1 AS HUGEINT) * e2 AS DOUBLE) /
        |             CAST(CAST(n2 AS HUGEINT) * e1 AS DOUBLE))
        |        + 1.96 * sqrt(1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS hi
        |FROM c""".stripMargin,
    // q323: descending rank-census deciles; gains/lift exact integer
    // walks with cross-multiplied lift
    "q323_cum_gains" ->
      """WITH s AS (SELECT event_type AS g,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS y,
        |    CAST(round(value * 100) AS BIGINT) % 101 AS sv
        |  FROM events),
        |c AS (SELECT g, sv, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS np FROM s GROUP BY 1, 2),
        |w AS (SELECT g, sv, n, np,
        |    CAST(coalesce(sum(n) OVER (PARTITION BY g ORDER BY sv DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS bef,
        |    CAST(sum(n) OVER (PARTITION BY g) AS BIGINT) AS tot,
        |    CAST(sum(np) OVER (PARTITION BY g) AS BIGINT) AS pos
        |  FROM c),
        |b AS (SELECT g, least(9, (bef * 10) // tot) AS bucket,
        |    CAST(sum(n) AS BIGINT) AS n, CAST(sum(np) AS BIGINT) AS n_pos,
        |    max(tot) AS tot, max(pos) AS pos
        |  FROM w GROUP BY 1, 2),
        |cum AS (SELECT g, bucket, n, n_pos, tot, pos,
        |    CAST(sum(n) OVER (PARTITION BY g ORDER BY bucket) AS BIGINT)
        |      AS cum_n,
        |    CAST(sum(n_pos) OVER (PARTITION BY g ORDER BY bucket) AS BIGINT)
        |      AS cum_pos
        |  FROM b)
        |SELECT g AS event_type, bucket, n, n_pos, cum_n, cum_pos,
        |  CASE WHEN pos > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(cum_pos AS DOUBLE) / CAST(pos AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS gain,
        |  CASE WHEN pos > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(CAST(cum_pos AS HUGEINT) * tot AS DOUBLE) /
        |      CAST(CAST(cum_n AS HUGEINT) * pos AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS lift
        |FROM cum""".stripMargin,
    // q324: n-class-grouped p_a terms (one exact division per distinct
    // rating count, folded in n order); p_e one exact division
    "q324_krippendorff" ->
      """WITH cells AS (SELECT user_id AS u, event_type AS cat,
        |    CAST(count(*) AS BIGINT) AS nuc FROM events GROUP BY 1, 2),
        |byu AS (SELECT u, CAST(sum(nuc) AS BIGINT) AS nu,
        |    sum(CAST(nuc AS HUGEINT) * nuc) AS s2 FROM cells GROUP BY 1),
        |kept AS (SELECT * FROM byu WHERE nu >= 2),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        |  FROM byu WHERE nu < 2),
        |cls AS (SELECT nu, sum(s2 - nu) AS an FROM kept GROUP BY 1),
        |pa AS (SELECT list_reduce(
        |    list(CAST(an AS DOUBLE) / CAST(nu - 1 AS DOUBLE) ORDER BY nu),
        |    (a, x) -> a + x) AS pa_num FROM cls),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
        |    CAST(coalesce(sum(nu), 0) AS BIGINT) AS n_ratings FROM kept),
        |mar AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
        |    sum(CAST(nc AS HUGEINT) * (nc - 1)) AS pe_num FROM
        |  (SELECT cat, CAST(sum(nuc) AS BIGINT) AS nc
        |   FROM cells JOIN kept USING (u) GROUP BY 1)),
        |f AS (SELECT tot.n_units, drp.n_dropped, mar.n_categories,
        |    tot.n_ratings,
        |    pa.pa_num / CAST(tot.n_ratings AS DOUBLE) AS pav,
        |    CAST(mar.pe_num AS DOUBLE) /
        |      CAST(CAST(tot.n_ratings AS HUGEINT) * (tot.n_ratings - 1)
        |        AS DOUBLE) AS pev
        |  FROM tot CROSS JOIN drp CROSS JOIN mar CROSS JOIN pa)
        |SELECT n_units, n_dropped, n_categories, n_ratings,
        |  CASE WHEN n_ratings >= 2 THEN
        |    CAST(round(CAST(CAST(pav AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS p_a,
        |  CASE WHEN n_ratings >= 2 THEN
        |    CAST(round(CAST(CAST(pev AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS p_e,
        |  CASE WHEN n_ratings >= 2 AND pev < 1.0 THEN
        |    CAST(round(CAST(CAST((pav - pev) / (1.0 - pev)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS alpha
        |FROM f""".stripMargin,
    // q325: q183's md5-replayable registers per arm + register-max
    // union; inclusion-exclusion combination is pinned-shape
    "q325_hll_intersect" ->
      """WITH e AS (SELECT CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |      THEN 'wkend' ELSE 'wkday' END AS arm, user_id FROM events),
        |r AS (SELECT arm,
        |  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':r'), 1, 4)) AS BIGINT) % 256 AS reg,
        |  LEAST(4 * length(regexp_extract(substr(md5(CAST(user_id AS VARCHAR) || ':q'), 1, 12), '^0*')) +
        |    CASE substr(substr(md5(CAST(user_id AS VARCHAR) || ':q'), 1, 12),
        |           length(regexp_extract(substr(md5(CAST(user_id AS VARCHAR) || ':q'), 1, 12), '^0*')) + 1, 1)
        |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
        |      ELSE 0 END + 1, 40) AS rank
        |FROM e),
        |mx AS (SELECT arm, reg, MAX(rank) AS max_rank FROM r GROUP BY 1, 2),
        |u AS (SELECT * FROM mx
        |  UNION ALL SELECT 'union' AS arm, reg, MAX(max_rank) FROM mx GROUP BY 2),
        |est AS (SELECT arm,
        |  (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
        |    * CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE) /
        |    ((CAST(256.0 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)) +
        |     SUM(CAST(1.0 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << CAST(max_rank AS INT)) AS DOUBLE))) AS ev
        |FROM u GROUP BY 1),
        |piv AS (SELECT max(CASE WHEN arm = 'wkend' THEN ev END) AS ea,
        |    max(CASE WHEN arm = 'wkday' THEN ev END) AS eb,
        |    max(CASE WHEN arm = 'union' THEN ev END) AS eu FROM est),
        |fl AS (SELECT user_id,
        |    max(CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END) AS wk,
        |    max(CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 0 ELSE 1 END) AS wd
        |  FROM events GROUP BY 1),
        |tr AS (SELECT CAST(sum(wk) AS BIGINT) AS true_a,
        |    CAST(sum(wd) AS BIGINT) AS true_b,
        |    CAST(sum(CASE WHEN wk = 1 AND wd = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS true_intersect FROM fl)
        |SELECT
        |  CAST(round(CAST(CAST(ea AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS est_a,
        |  CAST(round(CAST(CAST(eb AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS est_b,
        |  CAST(round(CAST(CAST(eu AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS est_union,
        |  CAST(round(CAST(CAST(ea + eb - eu AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS est_intersect,
        |  tr.true_a, tr.true_b, tr.true_intersect
        |FROM piv CROSS JOIN tr""".stripMargin,
    // q326: the q305 TV closed form per quasi-class; the violates flag
    // cross-multiplies num*1e6 > tmax*2*n*N in exact HUGEINT
    "q326_t_closeness" ->
      """WITH k AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS v FROM customer),
        |census AS (SELECT c_mktsegment, c_nationkey, v,
        |    CAST(count(*) AS BIGINT) AS cgt FROM k GROUP BY 1, 2, 3),
        |g AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(sum(cgt) AS BIGINT) AS ng FROM census GROUP BY 1, 2),
        |vt AS (SELECT v, CAST(sum(cgt) AS BIGINT) AS ct
        |  FROM census GROUP BY 1),
        |n AS (SELECT CAST(sum(ct) AS HUGEINT) AS n FROM vt),
        |s AS (SELECT c.c_mktsegment, c.c_nationkey,
        |    sum(abs(CAST(c.cgt AS HUGEINT) * n.n
        |          - CAST(vt.ct AS HUGEINT) * g.ng)
        |      - CAST(vt.ct AS HUGEINT) * g.ng) AS snum
        |  FROM census c JOIN vt USING (v)
        |    JOIN g ON g.c_mktsegment = c.c_mktsegment
        |      AND g.c_nationkey = c.c_nationkey
        |    CROSS JOIN n
        |  GROUP BY 1, 2)
        |SELECT g.c_mktsegment, g.c_nationkey, g.ng AS n,
        |  CAST(round(CAST(CAST(
        |    CAST(s.snum + n.n * g.ng AS DOUBLE) /
        |    CAST(2 * CAST(g.ng AS HUGEINT) * n.n AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS t,
        |  (s.snum + n.n * g.ng) * 1000000
        |    > 200000 * 2 * CAST(g.ng AS HUGEINT) * n.n AS violates
        |FROM g JOIN s ON g.c_mktsegment = s.c_mktsegment
        |  AND g.c_nationkey = s.c_nationkey CROSS JOIN n""".stripMargin,
    // q327: md5-48-bit uniform -> inverse-CDF Laplace; ln parity per
    // q121, pinned-shape combination
    "q327_laplace_counts" ->
      """WITH c AS (SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |u AS (SELECT g, n,
        |    (CAST(CAST(('0x' || substr(md5(g || 'graft8'), 1, 12)) AS BIGINT)
        |      AS DOUBLE) + 0.5) / CAST(281474976710656 AS DOUBLE) AS uu
        |  FROM c)
        |SELECT g AS event_type,
        |  CAST(round(CAST(CAST(
        |    CAST(n AS DOUBLE) + (-2.0) * sign(uu - 0.5)
        |      * ln(1.0 - 2.0 * abs(uu - 0.5))
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS noisy_count,
        |  CAST(2.0 AS DOUBLE) AS scale
        |FROM u""".stripMargin,
    // q328: exact ceil-div k, order-statistic crossing for qhat, one
    // division for coverage — the q10/q215 quantile discipline
    "q328_conformal" ->
      """WITH e AS (SELECT event_type AS g,
        |    CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < 'cc'
        |      THEN 1 ELSE 0 END AS cal,
        |    abs(CAST(round(value * 100) AS BIGINT) - 5000) AS r
        |  FROM events),
        |c AS (SELECT g, r, CAST(sum(cal) AS BIGINT) AS nc,
        |    CAST(sum(1 - cal) AS BIGINT) AS nt FROM e GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(nc) AS BIGINT) AS n_calib,
        |    CAST(sum(nt) AS BIGINT) AS n_test,
        |    CAST(((sum(nc) + 1) * 900 + 999) // 1000 AS BIGINT) AS k
        |  FROM c GROUP BY 1),
        |cum AS (SELECT g, r, nt,
        |    CAST(sum(nc) OVER (PARTITION BY g ORDER BY r) AS BIGINT) AS cm
        |  FROM c),
        |qh AS (SELECT cum.g, min(r) AS qhat
        |  FROM cum JOIN tot ON cum.g = tot.g WHERE cm >= tot.k GROUP BY 1),
        |cov AS (SELECT c.g,
        |    CAST(sum(CASE WHEN c.r <= qh.qhat THEN c.nt ELSE 0 END)
        |      AS BIGINT) AS cv
        |  FROM c LEFT JOIN qh ON c.g = qh.g GROUP BY 1)
        |SELECT tot.g AS event_type, tot.n_calib, tot.n_test, tot.k,
        |  qh.qhat,
        |  CASE WHEN qh.qhat IS NOT NULL AND tot.n_test > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(cov.cv AS DOUBLE) / CAST(tot.n_test AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS coverage
        |FROM tot LEFT JOIN qh ON tot.g = qh.g
        |  JOIN cov ON tot.g = cov.g""".stripMargin,
    // q329: lag-7 forecast rows, lag-1 naive denominator over the same
    // window; MASE = (num*(n-1))/(den*n) one exact division
    "q329_mase" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |wf AS (SELECT k, day, y,
        |    lag(y, 7) OVER (PARTITION BY k ORDER BY day) AS f
        |  FROM daily),
        |ev AS (SELECT k, day, y, f,
        |    lag(y, 1) OVER (PARTITION BY k ORDER BY day) AS prev
        |  FROM (SELECT * FROM wf WHERE f IS NOT NULL)),
        |s AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(abs(y - f)) AS BIGINT) AS mae_num,
        |    CAST(coalesce(sum(CASE WHEN prev IS NOT NULL
        |      THEN abs(y - prev) END), 0) AS BIGINT) AS naive_num
        |  FROM ev GROUP BY 1)
        |SELECT k AS event_type, n, CAST(0 AS BIGINT) AS n_skipped,
        |  mae_num, naive_num,
        |  CASE WHEN n >= 2 AND naive_num > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(CAST(mae_num AS HUGEINT) * (n - 1) AS DOUBLE) /
        |      CAST(CAST(naive_num AS HUGEINT) * n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS mase
        |FROM s""".stripMargin,
    // q331: exact count walks; LLR = cum_s*ln(1.25) + cum_f*ln(500/600)
    // pinned-shape (ln parity per q121); verdict latches on the EARLIEST
    // crossing period (first-crossing min over the cumulative frame)
    "q331_sprt" ->
      """WITH e AS (SELECT event_type AS sc, CAST(ts AS DATE) AS p,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y FROM events),
        |c AS (SELECT sc, p, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s FROM e GROUP BY 1, 2),
        |w AS (SELECT sc, p, n, s,
        |    CAST(sum(n) OVER (PARTITION BY sc ORDER BY p) AS BIGINT) AS cum_n,
        |    CAST(sum(s) OVER (PARTITION BY sc ORDER BY p) AS BIGINT) AS cum_s
        |  FROM c),
        |l AS (SELECT *, CAST(cum_s AS DOUBLE) * ln(500.0 / 400.0)
        |    + CAST(cum_n - cum_s AS DOUBLE) * ln(500.0 / 600.0) AS llr
        |  FROM w),
        |x AS (SELECT *,
        |    min(CASE WHEN llr >= ln(950.0 / 50.0) THEN p END)
        |      OVER (PARTITION BY sc ORDER BY p) AS fhi,
        |    min(CASE WHEN llr <= ln(50.0 / 950.0) THEN p END)
        |      OVER (PARTITION BY sc ORDER BY p) AS flo
        |  FROM l)
        |SELECT sc AS event_type, p AS day, n, s AS successes, cum_n, cum_s,
        |  CAST(round(CAST(CAST(llr AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS llr,
        |  CASE WHEN fhi IS NOT NULL AND (flo IS NULL OR fhi <= flo)
        |         THEN 'accept_h1'
        |       WHEN flo IS NOT NULL THEN 'accept_h0'
        |       ELSE 'continue' END AS state
        |FROM x""".stripMargin,
    // q332: five exact HUGEINT moments; theta/means/reduction are
    // fixed-shape combinations of single divisions
    "q332_cuped" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS a,
        |    CAST(floor(value) AS BIGINT) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y FROM events
        |  WHERE value IS NOT NULL),
        |g AS (SELECT sc, CAST(sum(a) AS BIGINT) AS n_a,
        |    CAST(sum(1 - a) AS BIGINT) AS n_b,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    CAST(sum(CASE WHEN a = 1 THEN x ELSE 0 END) AS HUGEINT) AS sxa,
        |    CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS HUGEINT) AS sya,
        |    CAST(sum(CASE WHEN a = 0 THEN x ELSE 0 END) AS HUGEINT) AS sxb,
        |    CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS HUGEINT) AS syb
        |  FROM e GROUP BY 1),
        |f AS (SELECT sc, n_a, n_b,
        |    CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
        |    CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
        |    CAST((n_a + n_b) * sxy - sx * sy AS DOUBLE) /
        |      CAST((n_a + n_b) * sxx - sx * sx AS DOUBLE) AS theta,
        |    CAST(sx AS DOUBLE) / CAST(CAST(n_a + n_b AS HUGEINT) AS DOUBLE)
        |      AS xbar,
        |    CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE) AS xa,
        |    CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE) AS xb,
        |    (CAST((n_a + n_b) * sxy - sx * sy AS DOUBLE) /
        |     CAST((n_a + n_b) * sxx - sx * sx AS DOUBLE)) *
        |    (CAST((n_a + n_b) * sxy - sx * sy AS DOUBLE) /
        |     CAST((n_a + n_b) * syy - sy * sy AS DOUBLE)) AS rho2,
        |    (n_a + n_b) * sxx - sx * sx AS vxn,
        |    (n_a + n_b) * syy - sy * sy AS vyn
        |  FROM g)
        |SELECT sc AS event_type, n_a, n_b,
        |  CAST(round(CAST(CAST(mean_a AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS mean_a,
        |  CAST(round(CAST(CAST(mean_b AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS mean_b,
        |  CASE WHEN vxn <> 0 AND vyn <> 0 AND n_a > 0 AND n_b > 0 THEN
        |    CAST(round(CAST(CAST(theta AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS theta,
        |  CASE WHEN vxn <> 0 AND vyn <> 0 AND n_a > 0 AND n_b > 0 THEN
        |    CAST(round(CAST(CAST(mean_a - theta * (xa - xbar)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS adj_mean_a,
        |  CASE WHEN vxn <> 0 AND vyn <> 0 AND n_a > 0 AND n_b > 0 THEN
        |    CAST(round(CAST(CAST(mean_b - theta * (xb - xbar)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS adj_mean_b,
        |  CAST(round(CAST(CAST(mean_a - mean_b AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS diff,
        |  CASE WHEN vxn <> 0 AND vyn <> 0 AND n_a > 0 AND n_b > 0 THEN
        |    CAST(round(CAST(CAST(
        |      (mean_a - theta * (xa - xbar)) - (mean_b - theta * (xb - xbar))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS adj_diff,
        |  CASE WHEN vxn <> 0 AND vyn <> 0 AND n_a > 0 AND n_b > 0 THEN
        |    CAST(round(CAST(CAST(1.0 - rho2 AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS var_reduction
        |FROM f""".stripMargin,
    // q333: four exact (n, Σy, Σy²) cells; DiD and the Wald bounds are
    // pinned-shape combinations of single divisions
    "q333_diff_in_diff" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS q,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT sc,
        |    CAST(sum(CASE WHEN t=1 AND q=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tpre,
        |    CAST(sum(CASE WHEN t=1 AND q=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tpost,
        |    CAST(sum(CASE WHEN t=0 AND q=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cpre,
        |    CAST(sum(CASE WHEN t=0 AND q=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cpost,
        |    CAST(sum(CASE WHEN t=1 AND q=0 THEN y ELSE 0 END) AS HUGEINT) AS s_tpre,
        |    CAST(sum(CASE WHEN t=1 AND q=1 THEN y ELSE 0 END) AS HUGEINT) AS s_tpost,
        |    CAST(sum(CASE WHEN t=0 AND q=0 THEN y ELSE 0 END) AS HUGEINT) AS s_cpre,
        |    CAST(sum(CASE WHEN t=0 AND q=1 THEN y ELSE 0 END) AS HUGEINT) AS s_cpost,
        |    sum(CASE WHEN t=1 AND q=0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS q_tpre,
        |    sum(CASE WHEN t=1 AND q=1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS q_tpost,
        |    sum(CASE WHEN t=0 AND q=0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS q_cpre,
        |    sum(CASE WHEN t=0 AND q=1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS q_cpost
        |  FROM e GROUP BY 1),
        |f AS (SELECT sc, n_tpre, n_tpost, n_cpre, n_cpost,
        |    (CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE)
        |     - CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE))
        |    - (CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE)
        |       - CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE)) AS did,
        |    sqrt(
        |      CAST(n_tpre * q_tpre - s_tpre * s_tpre AS DOUBLE)
        |        / CAST(CAST(n_tpre AS HUGEINT) * (n_tpre - 1) AS DOUBLE)
        |        / CAST(n_tpre AS DOUBLE)
        |      + CAST(n_tpost * q_tpost - s_tpost * s_tpost AS DOUBLE)
        |        / CAST(CAST(n_tpost AS HUGEINT) * (n_tpost - 1) AS DOUBLE)
        |        / CAST(n_tpost AS DOUBLE)
        |      + CAST(n_cpre * q_cpre - s_cpre * s_cpre AS DOUBLE)
        |        / CAST(CAST(n_cpre AS HUGEINT) * (n_cpre - 1) AS DOUBLE)
        |        / CAST(n_cpre AS DOUBLE)
        |      + CAST(n_cpost * q_cpost - s_cpost * s_cpost AS DOUBLE)
        |        / CAST(CAST(n_cpost AS HUGEINT) * (n_cpost - 1) AS DOUBLE)
        |        / CAST(n_cpost AS DOUBLE)) AS se
        |  FROM g)
        |SELECT sc AS event_type, n_tpre, n_tpost, n_cpre, n_cpost,
        |  CASE WHEN n_tpre > 0 AND n_tpost > 0 AND n_cpre > 0
        |      AND n_cpost > 0 THEN
        |    CAST(round(CAST(CAST(did AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS did,
        |  CASE WHEN n_tpre > 1 AND n_tpost > 1 AND n_cpre > 1
        |      AND n_cpost > 1 THEN
        |    CAST(round(CAST(CAST(did - 1.96 * se AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE) END AS lo,
        |  CASE WHEN n_tpre > 1 AND n_tpost > 1 AND n_cpre > 1
        |      AND n_cpost > 1 THEN
        |    CAST(round(CAST(CAST(did + 1.96 * se AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE) END AS hi
        |FROM f""".stripMargin,
    // q334: per-stratum effects/variances from exact moments; pooled,
    // Q and I² fold in stratum order via the list_reduce 0.0-seed parity
    "q334_meta_analysis" ->
      """WITH e AS (SELECT event_type AS st,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS a,
        |    CAST(round(value * 100) AS BIGINT) AS y FROM events),
        |g AS (SELECT st, CAST(sum(a) AS BIGINT) AS na,
        |    CAST(sum(1 - a) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS HUGEINT) AS sa,
        |    CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS HUGEINT) AS sb,
        |    sum(CASE WHEN a = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS qa,
        |    sum(CASE WHEN a = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS qb
        |  FROM e GROUP BY 1),
        |eff AS (SELECT st,
        |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS e,
        |    CAST(na * qa - sa * sa AS DOUBLE)
        |      / CAST(CAST(na AS HUGEINT) * (na - 1) AS DOUBLE)
        |      / CAST(na AS DOUBLE)
        |    + CAST(nb * qb - sb * sb AS DOUBLE)
        |      / CAST(CAST(nb AS HUGEINT) * (nb - 1) AS DOUBLE)
        |      / CAST(nb AS DOUBLE) AS v
        |  FROM g WHERE na > 1 AND nb > 1),
        |lists AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    list(struct_pack(e := e, v := v) ORDER BY st) AS xs
        |  FROM eff WHERE v > 0),
        |s AS (SELECT k, xs,
        |    list_reduce(list_transform(xs, x -> 1.0 / x.v),
        |      (a, b) -> a + b) AS sw,
        |    list_reduce(list_transform(xs, x -> x.e / x.v),
        |      (a, b) -> a + b) AS swe
        |  FROM lists),
        |p AS (SELECT k, xs, sw, swe / sw AS pooled FROM s),
        |qq AS (SELECT k, sw, pooled,
        |    list_reduce(list_transform(xs,
        |      x -> (x.e - pooled) * (x.e - pooled) / x.v),
        |      (a, b) -> a + b) AS q
        |  FROM p)
        |SELECT k,
        |  CAST(round(CAST(CAST(pooled AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS pooled,
        |  CAST(round(CAST(CAST(sqrt(1.0 / sw) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS se_pooled,
        |  CAST(round(CAST(CAST(q AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS q,
        |  CASE WHEN k >= 2 AND q > 0 THEN
        |    CAST(round(CAST(CAST(
        |      greatest(0.0, (q - CAST(k - 1 AS DOUBLE)) / q)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS i_squared
        |FROM qq""".stripMargin,
    // q335: exact per-arm (n, Σy, Σy²); t / Welch-Satterthwaite df /
    // Cohen's d are pinned-shape combinations of single divisions
    "q335_welch_t" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS a,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT sc, CAST(sum(a) AS BIGINT) AS na,
        |    CAST(sum(1 - a) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS HUGEINT) AS sa,
        |    CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS HUGEINT) AS sb,
        |    sum(CASE WHEN a = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS qa,
        |    sum(CASE WHEN a = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS qb
        |  FROM e GROUP BY 1),
        |f AS (SELECT sc, na, nb,
        |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |    CAST(na * qa - sa * sa AS DOUBLE)
        |      / CAST(CAST(na AS HUGEINT) * (na - 1) AS DOUBLE) AS va,
        |    CAST(nb * qb - sb * sb AS DOUBLE)
        |      / CAST(CAST(nb AS HUGEINT) * (nb - 1) AS DOUBLE) AS vb
        |  FROM g),
        |h AS (SELECT sc, na, nb, ma, mb, va, vb,
        |    va / CAST(na AS DOUBLE) AS vna,
        |    vb / CAST(nb AS DOUBLE) AS vnb FROM f),
        |w AS (SELECT sc, na, nb, ma, mb, va, vb, vna, vnb,
        |    vna + vnb AS se2,
        |    (CAST(na - 1 AS DOUBLE) * va + CAST(nb - 1 AS DOUBLE) * vb)
        |      / CAST(na + nb - 2 AS DOUBLE) AS sp2 FROM h)
        |SELECT sc AS event_type, na AS n_a, nb AS n_b,
        |  CASE WHEN na > 0 THEN CAST(round(CAST(CAST(ma AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS mean_a,
        |  CASE WHEN nb > 0 THEN CAST(round(CAST(CAST(mb AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS mean_b,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    CAST(round(CAST(CAST(ma - mb AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS diff,
        |  CASE WHEN na > 1 AND nb > 1 AND se2 <> 0 THEN
        |    CAST(round(CAST(CAST((ma - mb) / sqrt(se2) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS t,
        |  CASE WHEN na > 1 AND nb > 1 AND se2 <> 0 THEN
        |    CAST(round(CAST(CAST((se2 * se2) /
        |      (vna * vna / CAST(na - 1 AS DOUBLE)
        |       + vnb * vnb / CAST(nb - 1 AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS df,
        |  CASE WHEN na > 1 AND nb > 1 AND se2 <> 0 AND sp2 <> 0 THEN
        |    CAST(round(CAST(CAST((ma - mb) / sqrt(sp2) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS cohen_d
        |FROM w""".stripMargin,
    // q336: exact (n, Σy, Σy²) cells; the one float fold Σ(Σy_g)²/n_g
    // runs in group-key order via the list_reduce 0.0-seed parity
    "q336_anova_f" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS VARCHAR) AS g,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT sc, g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(y) AS HUGEINT) AS sg,
        |    sum(CAST(y AS HUGEINT) * y) AS qg FROM e GROUP BY 1, 2),
        |p AS (SELECT sc, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS HUGEINT) AS s, CAST(sum(qg) AS HUGEINT) AS q,
        |    list(struct_pack(sgd := CAST(sg AS DOUBLE),
        |      ngd := CAST(ng AS DOUBLE)) ORDER BY g) AS cells
        |  FROM c GROUP BY 1),
        |b AS (SELECT sc, k, n, s, q,
        |    list_reduce(list_transform(cells, x -> x.sgd * x.sgd / x.ngd),
        |      (acc, t) -> acc + t) AS between
        |  FROM p),
        |f AS (SELECT sc, k, n,
        |    between - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ssb,
        |    CAST(q AS DOUBLE) - between AS ssw FROM b)
        |SELECT sc AS event_type, k, n,
        |  CAST(round(CAST(CAST(ssb AS VARCHAR) AS DECIMAL(38,20)), 4)
        |    AS DOUBLE) AS ssb,
        |  CAST(round(CAST(CAST(ssw AS VARCHAR) AS DECIMAL(38,20)), 4)
        |    AS DOUBLE) AS ssw,
        |  CASE WHEN k > 1 AND n > k AND ssw <> 0 THEN
        |    CAST(round(CAST(CAST((ssb / CAST(k - 1 AS DOUBLE))
        |      / (ssw / CAST(n - k AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS f,
        |  CASE WHEN ssb + ssw <> 0 THEN
        |    CAST(round(CAST(CAST(ssb / (ssb + ssw) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS eta_sq
        |FROM f""".stripMargin,
    // q337: actor-capped time self-join; distinct-actor counts; every
    // ratio one exact division; (lift desc, a, b) order identical
    "q337_sequence_rules" ->
      """WITH ev AS (SELECT DISTINCT user_id AS u, event_type AS it,
        |    epoch_ms(ts) AS t FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |ok AS (SELECT u FROM ev GROUP BY u HAVING count(*) <= 1000),
        |kept AS (SELECT ev.* FROM ev JOIN ok USING (u)),
        |nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_actors
        |  FROM kept),
        |items AS (SELECT it, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT DISTINCT u, it FROM kept) GROUP BY 1),
        |fol AS (SELECT ia, ib, CAST(count(*) AS BIGINT) AS c_ab FROM
        |    (SELECT DISTINCT a.u AS u, a.it AS ia, b.it AS ib
        |     FROM kept a JOIN kept b ON a.u = b.u AND a.it <> b.it
        |       AND b.t > a.t AND b.t - a.t <= 3600000)
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |top AS (SELECT ia, ib, nu.n_actors, ca.c AS c_a, cb.c AS c_b,
        |    c_ab,
        |    CAST(c_ab AS DOUBLE) / CAST(nu.n_actors AS DOUBLE) AS support,
        |    CAST(c_ab AS DOUBLE) / CAST(ca.c AS DOUBLE) AS conf,
        |    CAST(CAST(c_ab AS HUGEINT) * nu.n_actors AS DOUBLE) /
        |      CAST(CAST(ca.c AS HUGEINT) * cb.c AS DOUBLE) AS lift
        |  FROM fol JOIN items ca ON ia = ca.it
        |    JOIN items cb ON ib = cb.it CROSS JOIN nu
        |  ORDER BY lift DESC, ia, ib LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY lift DESC, ia, ib)
        |    AS BIGINT) AS rank,
        |  ia AS item_a, ib AS item_b, n_actors, c_a, c_b, c_ab,
        |  CAST(round(CAST(CAST(support AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS support,
        |  CAST(round(CAST(CAST(conf AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS conf,
        |  CAST(round(CAST(CAST(lift AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS lift
        |FROM top""".stripMargin,
    // q338: exact (scope, stratum, arm) moments; the two cross-stratum
    // folds run in stratum order via the list_reduce 0.0-seed parity
    "q338_stratified_ate" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS VARCHAR) AS st,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT sc, st,
        |    CAST(sum(a) AS BIGINT) AS nt, CAST(sum(1 - a) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS HUGEINT) AS st_s,
        |    CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS HUGEINT) AS sc_s,
        |    sum(CASE WHEN a = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS qt,
        |    sum(CASE WHEN a = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS qc
        |  FROM e GROUP BY 1, 2),
        |en AS (SELECT sc, st, nt, nc, st_s, sc_s,
        |    (nt > 0 AND nc > 0) AS kept,
        |    CAST(st_s AS DOUBLE) / CAST(nt AS DOUBLE)
        |      - CAST(sc_s AS DOUBLE) / CAST(nc AS DOUBLE) AS dif,
        |    CAST(nt * qt - st_s * st_s AS DOUBLE)
        |      / CAST(CAST(nt AS HUGEINT) * (nt - 1) AS DOUBLE)
        |      / CAST(nt AS DOUBLE)
        |    + CAST(nc * qc - sc_s * sc_s AS DOUBLE)
        |      / CAST(CAST(nc AS HUGEINT) * (nc - 1) AS DOUBLE)
        |      / CAST(nc AS DOUBLE) AS vs,
        |    CAST(nt + nc AS DOUBLE) AS nn
        |  FROM c),
        |p AS (SELECT sc,
        |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS k_used,
        |    CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
        |      AS k_dropped,
        |    CAST(sum(CASE WHEN kept THEN nt + nc ELSE 0 END) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT) AS nt_all,
        |    CAST(sum(CASE WHEN kept THEN nc ELSE 0 END) AS BIGINT) AS nc_all,
        |    CAST(sum(CASE WHEN kept THEN st_s ELSE 0 END) AS HUGEINT)
        |      AS st_all,
        |    CAST(sum(CASE WHEN kept THEN sc_s ELSE 0 END) AS HUGEINT)
        |      AS sc_all,
        |    min(CASE WHEN kept THEN
        |      CASE WHEN nt > 1 AND nc > 1 THEN 1 ELSE 0 END END) AS varok,
        |    list(struct_pack(nn := nn, dif := dif, vs := vs) ORDER BY st)
        |      FILTER (WHERE kept) AS cells
        |  FROM en GROUP BY 1),
        |f AS (SELECT sc, k_used, k_dropped, n, nt_all, nc_all, st_all,
        |    sc_all, varok,
        |    list_reduce(list_transform(cells,
        |      x -> x.nn / CAST(n AS DOUBLE) * x.dif),
        |      (acc, t) -> acc + t) AS ate,
        |    list_reduce(list_transform(cells,
        |      x -> x.nn / CAST(n AS DOUBLE) * (x.nn / CAST(n AS DOUBLE))
        |        * x.vs),
        |      (acc, t) -> acc + t) AS se2
        |  FROM p)
        |SELECT sc AS event_type, k_used, k_dropped, n,
        |  CASE WHEN k_used > 0 THEN
        |    CAST(round(CAST(CAST(CAST(st_all AS DOUBLE)
        |      / CAST(nt_all AS DOUBLE) - CAST(sc_all AS DOUBLE)
        |      / CAST(nc_all AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS naive_diff,
        |  CASE WHEN k_used > 0 THEN
        |    CAST(round(CAST(CAST(ate AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) END AS ate,
        |  CASE WHEN k_used > 0 AND varok = 1 THEN
        |    CAST(round(CAST(CAST(ate - 1.96 * sqrt(se2) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS lo,
        |  CASE WHEN k_used > 0 AND varok = 1 THEN
        |    CAST(round(CAST(CAST(ate + 1.96 * sqrt(se2) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS hi
        |FROM f""".stripMargin,
    // q339: min-max isotonic identity — exact prefix sums, one division
    // per (k,l) block, order-free min/max; windows partition at bin scale
    "q339_isotonic" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CAST(floor(value / 5) AS BIGINT) AS bin,
        |    CASE WHEN (user_id + CAST(floor(value) AS BIGINT)) % 5 < 2
        |      THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT sc, bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s FROM e GROUP BY 1, 2),
        |r AS (SELECT sc, bin, n, s,
        |    sum(n) OVER (PARTITION BY sc ORDER BY bin) AS cn,
        |    sum(s) OVER (PARTITION BY sc ORDER BY bin) AS cs FROM c),
        |p AS (SELECT a.sc, a.bin AS k, b.bin AS l,
        |    CAST(b.cs - (a.cs - a.s) AS DOUBLE)
        |      / CAST(b.cn - (a.cn - a.n) AS DOUBLE) AS avg
        |  FROM r a JOIN r b ON a.sc = b.sc AND a.bin <= b.bin),
        |sm AS (SELECT sc, k, l AS bin,
        |    min(avg) OVER (PARTITION BY sc, k ORDER BY l DESC) AS sufmin
        |  FROM p),
        |i AS (SELECT sc, bin, max(sufmin) AS iso FROM sm GROUP BY 1, 2)
        |SELECT r.sc AS event_type, r.bin, r.n, r.s,
        |  CAST(round(CAST(CAST(CAST(r.s AS DOUBLE) / CAST(r.n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS rate,
        |  CAST(round(CAST(CAST(iso AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS iso
        |FROM r JOIN i ON r.sc = i.sc AND r.bin = i.bin""".stripMargin,
    // q340: exact Beta-posterior P(B>A) — the NR gammln formula is
    // inlined ONCE (unpivot -> lgamma -> pivot) with the same literal
    // coefficients and operation order as FastMath.lgammaValue, so both
    // engines produce bit-identical doubles; i-ordered term fold; the
    // normal fallback mirrors FastMath.erfcValue (unexercised at these
    // SFs but replayed for shape parity)
    "q340_bayesian_ab" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 0 ELSE 1 END AS a,
        |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT sc, CAST(sum(a) AS BIGINT) AS n_a,
        |    CAST(sum(1 - a) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS BIGINT) AS s_a,
        |    CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS BIGINT) AS s_b
        |  FROM e GROUP BY 1),
        |c AS (SELECT sc, n_a, n_b, s_a, s_b,
        |    1 + s_a AS aa, 1 + n_a - s_a AS ba,
        |    1 + s_b AS ab, 1 + n_b - s_b AS bb FROM g),
        |t AS (SELECT sc, aa, ba, ab, bb, unnest(range(0, ab)) AS i
        |  FROM c WHERE ab <= 4096),
        |ar AS (
        |  SELECT sc, i, 1 AS role, CAST(aa + i AS DOUBLE) AS x FROM t
        |  UNION ALL SELECT sc, i, 2, CAST(ba + bb AS DOUBLE) FROM t
        |  UNION ALL SELECT sc, i, 3, CAST(aa + i + ba + bb AS DOUBLE) FROM t
        |  UNION ALL SELECT sc, i, 4, CAST(1 + i AS DOUBLE) FROM t
        |  UNION ALL SELECT sc, i, 5, CAST(bb AS DOUBLE) FROM t
        |  UNION ALL SELECT sc, i, 6, CAST(1 + i + bb AS DOUBLE) FROM t
        |  UNION ALL SELECT sc, i, 7, CAST(aa AS DOUBLE) FROM t
        |  UNION ALL SELECT sc, i, 8, CAST(ba AS DOUBLE) FROM t
        |  UNION ALL SELECT sc, i, 9, CAST(aa + ba AS DOUBLE) FROM t),
        |lgv AS (SELECT sc, i, role,
        |    -(x + 5.5 - (x + 0.5) * ln(x + 5.5))
        |    + ln(2.5066282746310005 * (1.000000000190015
        |      + 76.18009172947146 / (x + 1.0)
        |      - 86.50532032941677 / (x + 2.0)
        |      + 24.01409824083091 / (x + 3.0)
        |      - 1.231739572450155 / (x + 4.0)
        |      + 0.001208650973866179 / (x + 5.0)
        |      - 0.000005395239384953 / (x + 6.0)) / x) AS v
        |  FROM ar),
        |pv AS (SELECT sc, i,
        |    max(CASE WHEN role = 1 THEN v END) AS v1,
        |    max(CASE WHEN role = 2 THEN v END) AS v2,
        |    max(CASE WHEN role = 3 THEN v END) AS v3,
        |    max(CASE WHEN role = 4 THEN v END) AS v4,
        |    max(CASE WHEN role = 5 THEN v END) AS v5,
        |    max(CASE WHEN role = 6 THEN v END) AS v6,
        |    max(CASE WHEN role = 7 THEN v END) AS v7,
        |    max(CASE WHEN role = 8 THEN v END) AS v8,
        |    max(CASE WHEN role = 9 THEN v END) AS v9
        |  FROM lgv GROUP BY 1, 2),
        |tt AS (SELECT pv.sc, pv.i,
        |    exp((v1 + v2 - v3) - ln(CAST(c.bb + pv.i AS DOUBLE))
        |      - (v4 + v5 - v6) - (v7 + v8 - v9)) AS term
        |  FROM pv JOIN c ON pv.sc = c.sc),
        |sx AS (SELECT sc, list_reduce(list(term ORDER BY i),
        |    (acc, u) -> acc + u) AS p_exact FROM tt GROUP BY 1),
        |nrm AS (SELECT sc,
        |    (CAST(ab AS DOUBLE) / CAST(ab + bb AS DOUBLE)
        |     - CAST(aa AS DOUBLE) / CAST(aa + ba AS DOUBLE))
        |    / sqrt(CAST(CAST(aa AS HUGEINT) * ba AS DOUBLE)
        |        / CAST(CAST(aa + ba AS HUGEINT) * (aa + ba)
        |          * (aa + ba + 1) AS DOUBLE)
        |      + CAST(CAST(ab AS HUGEINT) * bb AS DOUBLE)
        |        / CAST(CAST(ab + bb AS HUGEINT) * (ab + bb)
        |          * (ab + bb + 1) AS DOUBLE)) AS z
        |  FROM c),
        |nr AS (SELECT sc, z, -z / 1.4142135623730951 AS za FROM nrm),
        |np AS (SELECT sc,
        |    0.5 * (CASE WHEN za >= 0 THEN
        |      (1.0 / (1.0 + 0.5 * abs(za))) * exp(-za * za - 1.26551223
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (1.00002368
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (0.37409196
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (0.09678418
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (-0.18628806
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (0.27886807
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (-1.13520398
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (1.48851587
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (-0.82215223
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * 0.17087277)))))))))
        |    ELSE 2.0 -
        |      ((1.0 / (1.0 + 0.5 * abs(za))) * exp(-za * za - 1.26551223
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (1.00002368
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (0.37409196
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (0.09678418
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (-0.18628806
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (0.27886807
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (-1.13520398
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (1.48851587
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * (-0.82215223
        |      + (1.0 / (1.0 + 0.5 * abs(za))) * 0.17087277))))))))))
        |    END) AS pn
        |  FROM nr)
        |SELECT c.sc AS event_type, n_a, s_a, n_b, s_b,
        |  CAST(round(CAST(CAST(CAST(aa AS DOUBLE) / CAST(aa + ba AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_a,
        |  CAST(round(CAST(CAST(CAST(ab AS DOUBLE) / CAST(ab + bb AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_b,
        |  CASE WHEN ab <= 4096 THEN
        |    CAST(round(CAST(CAST(p_exact AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE)
        |  ELSE
        |    CAST(round(CAST(CAST(pn AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS p_b_gt_a,
        |  CASE WHEN ab <= 4096 THEN 'exact' ELSE 'normal' END AS method
        |FROM c LEFT JOIN sx ON c.sc = sx.sc
        |  LEFT JOIN np ON c.sc = np.sc""".stripMargin,
    // q341: DuckDB's jaro_winkler_similarity IS the pinned rapidfuzz
    // formulation FastStringSim mirrors (probe-verified bit parity);
    // blocked pairs, top-1 per left id by (jw desc, id_b)
    "q341_fuzzy_best_match" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |pl AS (SELECT c_custkey + 1000000 AS id,
        |    substring(c_name, 1, 17) || 'Q' AS name
        |  FROM customer WHERE c_custkey % 10 = 0),
        |r AS (SELECT id, name, substring(name, 1, 17) AS blk
        |  FROM (SELECT * FROM c UNION ALL SELECT * FROM pl)),
        |ok AS (SELECT blk FROM r GROUP BY blk HAVING count(*) <= 100000),
        |k AS (SELECT r.* FROM r JOIN ok USING (blk)),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |    a.name AS name_a, b.name AS name_b,
        |    jaro_winkler_similarity(a.name, b.name) AS jw
        |  FROM k a JOIN k b ON a.blk = b.blk AND a.id < b.id),
        |f AS (SELECT id_a, id_b, name_a, name_b, jw,
        |    row_number() OVER (PARTITION BY id_a ORDER BY jw DESC, id_b)
        |      AS rk
        |  FROM p WHERE jw >= 0.95)
        |SELECT id_a, id_b, name_a, name_b,
        |  CAST(round(CAST(CAST(jw AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS jw
        |FROM f WHERE rk = 1""".stripMargin,
    // q342: md5-indexed hops over neighbor-sorted adjacency, unrolled;
    // hop t of walk w picks idx = int(md5('graft8:'||w||':'||t)) % deg
    "q342_random_walks" ->
      """WITH pairs AS (SELECT o_custkey AS u, l_suppkey + 1000000 AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |ed AS (SELECT DISTINCT u, v FROM
        |  (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs)
        |  WHERE u IS NOT NULL AND v IS NOT NULL),
        |adj AS (SELECT u, v,
        |    CAST(row_number() OVER (PARTITION BY u ORDER BY v) - 1
        |      AS BIGINT) AS idx,
        |    CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS deg
        |  FROM ed),
        |f0 AS (SELECT CAST(u AS VARCHAR) || '#0' AS walk, u AS cur
        |  FROM (SELECT DISTINCT u FROM adj)),
        |f1 AS (SELECT f0.walk, adj.v AS cur FROM f0 JOIN adj
        |  ON f0.cur = adj.u AND adj.idx =
        |    CAST(('0x' || substr(md5('graft8:' || f0.walk || ':1'), 1, 12))
        |      AS BIGINT) % adj.deg),
        |f2 AS (SELECT f1.walk, adj.v AS cur FROM f1 JOIN adj
        |  ON f1.cur = adj.u AND adj.idx =
        |    CAST(('0x' || substr(md5('graft8:' || f1.walk || ':2'), 1, 12))
        |      AS BIGINT) % adj.deg),
        |f3 AS (SELECT f2.walk, adj.v AS cur FROM f2 JOIN adj
        |  ON f2.cur = adj.u AND adj.idx =
        |    CAST(('0x' || substr(md5('graft8:' || f2.walk || ':3'), 1, 12))
        |      AS BIGINT) % adj.deg)
        |SELECT walk, CAST(0 AS BIGINT) AS step, cur AS node FROM f0
        |UNION ALL SELECT walk, CAST(1 AS BIGINT), cur FROM f1
        |UNION ALL SELECT walk, CAST(2 AS BIGINT), cur FROM f2
        |UNION ALL SELECT walk, CAST(3 AS BIGINT), cur FROM f3""".stripMargin,
    // q343: merged integer censuses; target rank k = ceil(cum*N/ng) in
    // exact integer arithmetic; first pooled value at rank >= k via
    // min-over-forward-frame (query rows order before pooled on ties)
    "q343_quantile_norm" ->
      """WITH e AS (SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT)
        |    AS sc, event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |q AS (SELECT sc, g, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM e GROUP BY 1, 2, 3),
        |qc AS (SELECT sc, g, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY sc, g ORDER BY v) AS BIGINT)
        |      AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY sc, g) AS BIGINT) AS ng
        |  FROM q),
        |p AS (SELECT sc, v AS pv, CAST(count(*) AS BIGINT) AS pcnt
        |  FROM e GROUP BY 1, 2),
        |pc AS (SELECT sc, pv,
        |    CAST(sum(pcnt) OVER (PARTITION BY sc ORDER BY pv) AS BIGINT)
        |      AS pcum,
        |    CAST(sum(pcnt) OVER (PARTITION BY sc) AS BIGINT) AS nn
        |  FROM p),
        |qk AS (SELECT qc.sc, g, v, cnt, (cum * t.nn + ng - 1) // ng AS key
        |  FROM qc JOIN (SELECT DISTINCT sc, nn FROM pc) t ON qc.sc = t.sc),
        |m AS (SELECT sc, key, 0 AS tag, g, v, cnt,
        |    CAST(NULL AS BIGINT) AS pv FROM qk
        |  UNION ALL SELECT sc, pcum, 1, NULL, NULL, NULL, pv FROM pc),
        |w AS (SELECT sc, g, v, cnt, tag,
        |    min(pv) OVER (PARTITION BY sc ORDER BY key, tag
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_norm
        |  FROM m)
        |SELECT sc AS dow, g AS event_type, v, cnt AS n, v_norm
        |FROM w WHERE tag = 0""".stripMargin,
    // q344: closed-form moment subtraction; every statistic a pinned
    // combination of single divisions over exact sums
    "q344_leave_one_out" ->
      """WITH e AS (SELECT event_type AS sc, user_id % 10 AS g,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT sc, g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(y) AS HUGEINT) AS s_g,
        |    sum(CAST(y AS HUGEINT) * y) AS q_g
        |  FROM e GROUP BY 1, 2),
        |t AS (SELECT sc, CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(s_g) AS HUGEINT) AS s,
        |    CAST(sum(q_g) AS HUGEINT) AS q FROM c GROUP BY 1),
        |j AS (SELECT c.sc, g, n_g, s_g, q_g, n, s, q,
        |    n - n_g AS rn, s - s_g AS rs, q - q_g AS rq
        |  FROM c JOIN t ON c.sc = t.sc)
        |SELECT sc AS event_type, g AS cohort, n_g,
        |  CAST(round(CAST(CAST(CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_g,
        |  CAST(round(CAST(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_all,
        |  CASE WHEN rn > 0 THEN
        |    CAST(round(CAST(CAST(CAST(rs AS DOUBLE) / CAST(rn AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS loo_mean,
        |  CASE WHEN rn > 0 THEN
        |    CAST(round(CAST(CAST(CAST(rs AS DOUBLE) / CAST(rn AS DOUBLE)
        |      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS delta_mean,
        |  CASE WHEN rn > 1 THEN
        |    CAST(round(CAST(CAST(CAST(rn * rq - rs * rs AS DOUBLE)
        |      / CAST(CAST(rn AS HUGEINT) * (rn - 1) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) END AS loo_var
        |FROM j""".stripMargin,
    // q345: integer sqrt-smoothed weights (IEEE sqrt exact), md5 draw
    // targets, merged-window ownership — all integer, zero floats
    "q345_negative_samples" ->
      """WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)),
        |    '\s+')) AS tok FROM documents),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM t
        |  WHERE tok IS NOT NULL AND length(tok) > 0 GROUP BY 1),
        |w AS (SELECT tok, CAST(floor(sqrt(CAST(f AS DOUBLE))) AS BIGINT)
        |    AS w FROM c),
        |wc AS (SELECT tok, CAST(sum(w) OVER (ORDER BY tok
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum FROM w),
        |tt AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM w),
        |d AS (SELECT g.i AS j,
        |    CAST(('0x' || substr(md5('graft8:' || CAST(g.i AS VARCHAR)),
        |      1, 12)) AS BIGINT) % tt.t + 1 AS r
        |  FROM range(0, 1000) AS g(i), tt),
        |m AS (SELECT r AS key, 0 AS tag, j, CAST(NULL AS VARCHAR) AS tok
        |    FROM d
        |  UNION ALL SELECT cum, 1, NULL, tok FROM wc),
        |s AS (SELECT j, tag, min(tok) OVER (ORDER BY key, tag
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tok
        |  FROM m)
        |SELECT j AS draw, tok FROM s WHERE tag = 0""".stripMargin,
    // q346: synchronous Louvain local move — 4m²-scaled integer gains,
    // ties stay put then smaller community id; round-start censuses
    "q346_louvain_pass" ->
      """WITH pairs AS (SELECT o_custkey AS u, l_suppkey + 1000000 AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
        |  FROM pairs WHERE u <> v),
        |a AS (SELECT c_custkey AS nd, c_nationkey AS c FROM customer
        |  UNION ALL
        |  SELECT s_suppkey + 1000000, s_nationkey FROM supplier),
        |kept AS (SELECT e.u, e.v, au.c AS cu, av.c AS cv FROM e
        |  JOIN a au ON e.u = au.nd JOIN a av ON e.v = av.nd),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM kept),
        |b AS (SELECT u AS x, v AS y, cv AS cy FROM kept
        |  UNION ALL SELECT v, u, cu FROM kept),
        |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS kx FROM b GROUP BY 1),
        |tot AS (SELECT a.c, CAST(sum(kx) AS HUGEINT) AS tot
        |  FROM deg JOIN a ON deg.x = a.nd GROUP BY 1),
        |kuc AS (SELECT x, cy AS c, CAST(count(*) AS BIGINT) AS kuc
        |  FROM b GROUP BY 1, 2),
        |cand0 AS (SELECT x, c, kuc FROM kuc
        |  UNION ALL SELECT nd, c, 0 FROM a),
        |cand AS (SELECT x, c, CAST(max(kuc) AS BIGINT) AS kuc
        |  FROM cand0 GROUP BY 1, 2),
        |sc AS (SELECT cand.x, cand.c, ao.c AS own,
        |    2 * m.m * CAST(cand.kuc AS HUGEINT)
        |      - CAST(deg.kx AS HUGEINT) * (tot.tot -
        |        CASE WHEN cand.c = ao.c THEN deg.kx ELSE 0 END) AS s,
        |    CASE WHEN cand.c = ao.c THEN 1 ELSE 0 END AS stay
        |  FROM cand JOIN a ao ON cand.x = ao.nd
        |    JOIN deg ON cand.x = deg.x
        |    JOIN tot ON cand.c = tot.c CROSS JOIN m),
        |w AS (SELECT x, c, own, s,
        |    row_number() OVER (PARTITION BY x
        |      ORDER BY s DESC, stay DESC, c) AS rk,
        |    max(CASE WHEN stay = 1 THEN s END) OVER (PARTITION BY x)
        |      AS sown
        |  FROM sc)
        |SELECT x AS node, own AS old_comm, c AS new_comm,
        |  c <> own AS moved, CAST(s - sown AS BIGINT) AS gain_num
        |FROM w WHERE rk = 1""".stripMargin,
    // q347: exact cumulative counts; pinned plogp entropies (same
    // operation order as the Spark side -> bit-identical gains);
    // argmax (gain desc, v asc)
    "q347_info_gain_split" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CAST(floor(value / 5) AS BIGINT) AS v,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1
        |      ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT sc, v, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(y) AS BIGINT) AS pos FROM e GROUP BY 1, 2),
        |r AS (SELECT sc, v,
        |    CAST(sum(cnt) OVER (PARTITION BY sc ORDER BY v) AS BIGINT)
        |      AS cn,
        |    CAST(sum(pos) OVER (PARTITION BY sc ORDER BY v) AS BIGINT)
        |      AS cp,
        |    CAST(sum(cnt) OVER (PARTITION BY sc) AS BIGINT) AS n,
        |    CAST(sum(pos) OVER (PARTITION BY sc) AS BIGINT) AS p
        |  FROM c),
        |g AS (SELECT sc, v, cn, cp, n, p,
        |    (CASE WHEN p > 0 THEN -(CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
        |       * ln(CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |     + CASE WHEN n - p > 0 THEN
        |       -(CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))
        |       * ln(CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))
        |       ELSE 0.0 END)
        |    - CAST(cn AS DOUBLE) / CAST(n AS DOUBLE) *
        |      (CASE WHEN cp > 0 THEN
        |         -(CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
        |         * ln(CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
        |         ELSE 0.0 END
        |       + CASE WHEN cn - cp > 0 THEN
        |         -(CAST(cn - cp AS DOUBLE) / CAST(cn AS DOUBLE))
        |         * ln(CAST(cn - cp AS DOUBLE) / CAST(cn AS DOUBLE))
        |         ELSE 0.0 END)
        |    - CAST(n - cn AS DOUBLE) / CAST(n AS DOUBLE) *
        |      (CASE WHEN p - cp > 0 THEN
        |         -(CAST(p - cp AS DOUBLE) / CAST(n - cn AS DOUBLE))
        |         * ln(CAST(p - cp AS DOUBLE) / CAST(n - cn AS DOUBLE))
        |         ELSE 0.0 END
        |       + CASE WHEN (n - cn) - (p - cp) > 0 THEN
        |         -(CAST((n - cn) - (p - cp) AS DOUBLE)
        |           / CAST(n - cn AS DOUBLE))
        |         * ln(CAST((n - cn) - (p - cp) AS DOUBLE)
        |           / CAST(n - cn AS DOUBLE))
        |         ELSE 0.0 END) AS gain
        |  FROM r WHERE cn < n),
        |w AS (SELECT sc, v, cn, cp, n, p, gain,
        |    row_number() OVER (PARTITION BY sc ORDER BY gain DESC, v)
        |      AS rk FROM g)
        |SELECT sc AS event_type, n, p AS pos, v AS threshold,
        |  cn AS n_left, cp AS pos_left,
        |  CAST(round(CAST(CAST(gain AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS gain
        |FROM w WHERE rk = 1""".stripMargin,
    // q348: z from exact counts, two-sided p via the same pinned erfc
    // polynomial as FastMath.erfcValue (argument >= 0: THEN branch
    // only), BH step-up with (p, test) rank ties
    "q348_fdr_bh" ->
      """WITH e AS (SELECT event_type,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1
        |      ELSE 0 END AS a,
        |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT event_type AS test, CAST(sum(a) AS BIGINT) AS na,
        |    CAST(sum(1 - a) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS BIGINT) AS sb
        |  FROM e GROUP BY 1),
        |zz AS (SELECT test,
        |    (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
        |     - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
        |    / sqrt(CAST(sa + sb AS DOUBLE) / CAST(na + nb AS DOUBLE)
        |      * (1.0 - CAST(sa + sb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |      * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))
        |      AS z
        |  FROM g),
        |za AS (SELECT test, abs(z) / 1.4142135623730951 AS x FROM zz),
        |pv AS (SELECT test,
        |    (1.0 / (1.0 + 0.5 * abs(x))) * exp(-x * x - 1.26551223
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (1.00002368
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (0.37409196
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (0.09678418
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (-0.18628806
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (0.27886807
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (-1.13520398
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (1.48851587
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (-0.82215223
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * 0.17087277))))))))) AS p
        |  FROM za),
        |rk AS (SELECT test, p,
        |    CAST(row_number() OVER (ORDER BY p, test) AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS k FROM pv),
        |q AS (SELECT test, p, rank, k,
        |    least(min(p * CAST(k AS DOUBLE) / CAST(rank AS DOUBLE))
        |      OVER (ORDER BY rank DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      1.0) AS q_value
        |  FROM rk)
        |SELECT test AS event_type,
        |  CAST(round(CAST(CAST(p AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p,
        |  rank, k,
        |  CAST(round(CAST(CAST(q_value AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS q_value,
        |  q_value <= 0.05 AS reject
        |FROM q""".stripMargin,
    // q349: RAKE — exact word censuses, position-ordered phrase folds,
    // identical [^a-z0-9]+ tokenization in both regex dialects
    "q349_rake" ->
      """WITH t AS (SELECT doc_id AS doc,
        |    string_split_regex(regexp_replace(lower(trim(text)),
        |      '[^a-z0-9\s]+', ' $ ', 'g'), '\s+') AS toks
        |  FROM documents),
        |tok AS (SELECT doc, unnest(list_transform(range(1, len(toks) + 1),
        |    i -> struct_pack(pos := CAST(i - 1 AS BIGINT),
        |      w := toks[CAST(i AS INT)])), recursive := true)
        |  FROM t),
        |mk AS (SELECT doc, pos, w,
        |    (w IN ('the','a','an','and','or','of','to','in','on','for',
        |      'with','is','are','was','were','be','as','at','by','it',
        |      'this','that','from','but','not') OR w = '' OR w = '$')
        |      AS stop
        |  FROM tok),
        |pp AS (SELECT doc, pos, w, stop,
        |    sum(CASE WHEN stop THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
        |  FROM mk),
        |mem AS (SELECT doc, pid, pos, w,
        |    CAST(count(*) OVER (PARTITION BY doc, pid) AS BIGINT) AS len
        |  FROM pp WHERE NOT stop),
        |ws AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(len) AS BIGINT) AS deg FROM mem GROUP BY 1),
        |wsc AS (SELECT w, CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS s
        |  FROM ws),
        |occ AS (SELECT doc, pid,
        |    string_agg(mem.w, ' ' ORDER BY pos) AS phrase,
        |    list_reduce(list(s ORDER BY pos), (a, b) -> a + b) AS score
        |  FROM mem JOIN wsc USING (w) GROUP BY 1, 2),
        |agg AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
        |    max(score) AS score FROM occ GROUP BY 1),
        |top AS (SELECT * FROM agg ORDER BY score DESC, phrase LIMIT 25)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, phrase)
        |    AS BIGINT) AS rank,
        |  phrase, n_occurrences,
        |  CAST(round(CAST(CAST(score AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS score
        |FROM top""".stripMargin,
    // q350: centroid cosine from quantized-integer component sums —
    // floor(x*2^20 + 0.5) avoids the round() HALF_UP seam; scale and
    // 1/n cancel in the cosine
    "q350_centroid_drift" ->
      """WITH c AS (SELECT label AS lab,
        |    unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> struct_pack(dim := CAST(i - 1 AS INT),
        |        qx := CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
        |          * 1048576.0 + 0.5) AS BIGINT))), recursive := true)
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |s AS (SELECT lab, dim, CAST(sum(qx) AS HUGEINT) AS s
        |  FROM c GROUP BY 1, 2),
        |ns AS (SELECT label AS lab, CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1),
        |nr AS (SELECT lab, sum(s * s) AS ss FROM s GROUP BY 1),
        |p AS (SELECT a.lab AS la, b.lab AS lb, sum(a.s * b.s) AS dot
        |  FROM s a JOIN s b ON a.dim = b.dim AND a.lab < b.lab
        |  GROUP BY 1, 2)
        |SELECT la AS label_a, lb AS label_b, na.n AS n_a, nb.n AS n_b,
        |  CASE WHEN ra.ss <> 0 AND rb.ss <> 0 THEN
        |    CAST(round(CAST(CAST(CAST(dot AS DOUBLE)
        |      / (sqrt(CAST(ra.ss AS DOUBLE)) * sqrt(CAST(rb.ss AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS cosine
        |FROM p JOIN nr ra ON la = ra.lab JOIN nr rb ON lb = rb.lab
        |  JOIN ns na ON la = na.lab JOIN ns nb ON lb = nb.lab""".stripMargin,
    // q313: all-integer Q = (4m*Σec - Σdc²)/(4m²); nations cover every
    // node so n_edges_unassigned must be 0
    "q313_modularity" ->
      """WITH pairs AS (SELECT o_custkey AS u, l_suppkey + 1000000 AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
        |  FROM pairs WHERE u <> v),
        |a AS (SELECT c_custkey AS nd, c_nationkey AS c FROM customer
        |  UNION ALL
        |  SELECT s_suppkey + 1000000, s_nationkey FROM supplier),
        |tag AS (SELECT au.c AS cu, av.c AS cv FROM e
        |  JOIN a au ON e.u = au.nd JOIN a av ON e.v = av.nd),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM tag),
        |sec AS (SELECT CAST(coalesce(sum(ec), 0) AS HUGEINT) AS sec FROM
        |  (SELECT CAST(count(*) AS BIGINT) AS ec FROM tag
        |    WHERE cu = cv GROUP BY cu)),
        |dc AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
        |    sum(CAST(dcv AS HUGEINT) * dcv) AS sdc2 FROM
        |  (SELECT c, CAST(count(*) AS BIGINT) AS dcv FROM
        |    (SELECT cu AS c FROM tag UNION ALL SELECT cv FROM tag)
        |   GROUP BY c))
        |SELECT dc.n_communities, m.n_edges,
        |  CAST(0 AS BIGINT) AS n_edges_unassigned,
        |  CASE WHEN m.n_edges > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(4 * CAST(m.n_edges AS HUGEINT) * sec.sec - dc.sdc2
        |        AS DOUBLE) /
        |      CAST(4 * CAST(m.n_edges AS HUGEINT) * m.n_edges AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS modularity
        |FROM dc CROSS JOIN m CROSS JOIN sec""".stripMargin,
    // q314: exact triangle count via the ordered three-way self-join;
    // wedges = Σ d(d-1)/2; C = 3T/W one division
    "q314_transitivity" ->
      """WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
        |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
        |e AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM
        |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |dstat AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM e ab JOIN e bc ON ab.v = bc.u
        |    JOIN e ac ON ac.u = ab.u AND ac.v = bc.v)
        |SELECT dstat.n_nodes, m.n_edges, dstat.n_wedges, tri.n_triangles,
        |  CASE WHEN dstat.n_wedges > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(3 * CAST(tri.n_triangles AS HUGEINT) AS DOUBLE) /
        |      CAST(dstat.n_wedges AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS transitivity
        |FROM dstat CROSS JOIN m CROSS JOIN tri""".stripMargin,
    // q315: brier/ece/unc all-integer numerators; rel/res fold per-bin
    // exact divisions in bin order via the ordered-list reduce
    "q315_brier_decomp" ->
      """WITH s AS (SELECT event_type AS g,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS y,
        |    CAST(round(value * 100) AS BIGINT) % 101 AS sv
        |  FROM events),
        |c AS (SELECT g, sv, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS np FROM s GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(np) AS BIGINT) AS npos,
        |    sum(CAST(np AS HUGEINT) * (100 - sv) * (100 - sv)
        |      + CAST(n - np AS HUGEINT) * sv * sv) AS bnum
        |  FROM c GROUP BY 1),
        |bins AS (SELECT g, (sv * 10) // 101 AS b,
        |    CAST(sum(n) AS BIGINT) AS nb, CAST(sum(np) AS BIGINT) AS npb,
        |    CAST(sum(CAST(sv AS HUGEINT) * n) AS HUGEINT) AS ssb
        |  FROM c GROUP BY 1, 2),
        |bt AS (SELECT bins.g, b, nb,
        |    abs(ssb - CAST(npb AS HUGEINT) * 100) AS en,
        |    CAST((ssb - CAST(npb AS HUGEINT) * 100)
        |       * (ssb - CAST(npb AS HUGEINT) * 100) AS DOUBLE)
        |      / CAST(nb AS DOUBLE) AS rt,
        |    CAST((CAST(npb AS HUGEINT) * nn - CAST(npos AS HUGEINT) * nb)
        |       * (CAST(npb AS HUGEINT) * nn - CAST(npos AS HUGEINT) * nb)
        |      AS DOUBLE) / CAST(nb AS DOUBLE) AS st
        |  FROM bins JOIN tot ON bins.g = tot.g),
        |f AS (SELECT g, sum(en) AS esum,
        |    list_reduce(list_transform(
        |      list(struct_pack(rt := rt, st := st) ORDER BY b), x -> x.rt),
        |      (a, b) -> a + b) AS rsum,
        |    list_reduce(list_transform(
        |      list(struct_pack(rt := rt, st := st) ORDER BY b), x -> x.st),
        |      (a, b) -> a + b) AS ssum
        |  FROM bt GROUP BY 1)
        |SELECT tot.g AS event_type, tot.nn AS n, tot.npos AS n_pos,
        |  CAST(round(CAST(CAST(CAST(tot.bnum AS DOUBLE) /
        |    CAST(CAST(tot.nn AS HUGEINT) * 10000 AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS brier,
        |  CAST(round(CAST(CAST(CAST(f.esum AS DOUBLE) /
        |    CAST(CAST(tot.nn AS HUGEINT) * 100 AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS ece,
        |  CAST(round(CAST(CAST(f.rsum /
        |    CAST(CAST(tot.nn AS HUGEINT) * 10000 AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS reliability,
        |  CAST(round(CAST(CAST(f.ssum /
        |    CAST(CAST(tot.nn AS HUGEINT) * tot.nn * tot.nn AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS resolution,
        |  CAST(round(CAST(CAST(
        |    CAST(CAST(tot.npos AS HUGEINT) * (tot.nn - tot.npos) AS DOUBLE) /
        |    CAST(CAST(tot.nn AS HUGEINT) * tot.nn AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS uncertainty
        |FROM tot JOIN f ON tot.g = f.g""".stripMargin,
    // q316: basket-capped pair census; every ratio one exact division;
    // (lift desc, a, b) order identical on both engines
    "q316_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, p_brand AS it
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ok AS (SELECT bk FROM bi GROUP BY bk HAVING count(*) <= 1000),
        |kept AS (SELECT bi.* FROM bi JOIN ok USING (bk)),
        |nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets
        |  FROM kept),
        |items AS (SELECT it, CAST(count(*) AS BIGINT) AS c
        |  FROM kept GROUP BY 1),
        |pairs AS (SELECT a.it AS ia, b.it AS ib,
        |    CAST(count(*) AS BIGINT) AS c_ab
        |  FROM kept a JOIN kept b ON a.bk = b.bk AND a.it < b.it
        |  GROUP BY 1, 2 HAVING count(*) >= 10),
        |top AS (SELECT ia, ib, nb.n_baskets, ca.c AS c_a, cb.c AS c_b,
        |    c_ab,
        |    CAST(c_ab AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE) AS support,
        |    CAST(c_ab AS DOUBLE) / CAST(ca.c AS DOUBLE) AS conf_ab,
        |    CAST(c_ab AS DOUBLE) / CAST(cb.c AS DOUBLE) AS conf_ba,
        |    CAST(CAST(c_ab AS HUGEINT) * nb.n_baskets AS DOUBLE) /
        |      CAST(CAST(ca.c AS HUGEINT) * cb.c AS DOUBLE) AS lift
        |  FROM pairs JOIN items ca ON ia = ca.it
        |    JOIN items cb ON ib = cb.it CROSS JOIN nb
        |  ORDER BY lift DESC, ia, ib LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY lift DESC, ia, ib)
        |    AS BIGINT) AS rank,
        |  ia AS item_a, ib AS item_b, n_baskets, c_a, c_b, c_ab,
        |  CAST(round(CAST(CAST(support AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS support,
        |  CAST(round(CAST(CAST(conf_ab AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS conf_ab,
        |  CAST(round(CAST(CAST(conf_ba AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS conf_ba,
        |  CAST(round(CAST(CAST(lift AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS lift
        |FROM top""".stripMargin,
    // q303: exact 2x2 cells; OR/RR and the Wald bounds are pinned-shape
    // doubles (1.96 literal; exp/ln parity per the q237 precedent)
    "q303_odds_ratio" ->
      """WITH s AS (SELECT event_type,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS e,
        |    CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000 THEN 1 ELSE 0 END AS o
        |  FROM events),
        |c AS (SELECT event_type,
        |    CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM s GROUP BY 1),
        |f AS (SELECT event_type, a, b, c, d,
        |    CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) AS orv,
        |    sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
        |       + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)) AS orse,
        |    (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
        |      / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE)) AS rrv,
        |    sqrt(1.0 / CAST(a AS DOUBLE) - 1.0 / CAST(a + b AS DOUBLE)
        |       + 1.0 / CAST(c AS DOUBLE) - 1.0 / CAST(c + d AS DOUBLE)) AS rrse,
        |    (a > 0 AND b > 0 AND c > 0 AND d > 0) AS orok,
        |    (a > 0 AND c > 0 AND a + b > 0 AND c + d > 0) AS rrok
        |  FROM c)
        |SELECT event_type, a, b, c, d,
        |  CASE WHEN orok THEN CAST(round(CAST(CAST(orv AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS odds_ratio,
        |  CASE WHEN orok THEN CAST(round(CAST(CAST(
        |    exp(ln(orv) - 1.96 * orse) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS or_lo,
        |  CASE WHEN orok THEN CAST(round(CAST(CAST(
        |    exp(ln(orv) + 1.96 * orse) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS or_hi,
        |  CASE WHEN rrok THEN CAST(round(CAST(CAST(rrv AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS risk_ratio,
        |  CASE WHEN rrok THEN CAST(round(CAST(CAST(
        |    exp(ln(rrv) - 1.96 * rrse) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS rr_lo,
        |  CASE WHEN rrok THEN CAST(round(CAST(CAST(
        |    exp(ln(rrv) + 1.96 * rrse) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS rr_hi
        |FROM f""".stripMargin,
    // q302: the geometric weights are the SAME JVM doubles the operator
    // embeds (q279 discount discipline); overlaps are exact integers and
    // the <=k-term fold runs in depth order
    "q302_rbo" -> {
      val wts = (1 to 10).map(d => (1.0 - 0.9) * math.pow(0.9, d - 1))
      val wtsArr = wts.map(w => s"CAST('$w' AS DOUBLE)")
        .mkString("[", ", ", "]")
      s"""WITH per AS (SELECT event_type AS g, user_id AS u,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |ra AS (SELECT g, u, row_number() OVER (PARTITION BY g
         |    ORDER BY cents DESC, u) AS rk FROM per),
         |la AS (SELECT g, list(u ORDER BY rk) AS l FROM ra WHERE rk <= 10
         |  GROUP BY g),
         |rb AS (SELECT g, u, row_number() OVER (PARTITION BY g
         |    ORDER BY n DESC, u) AS rk FROM per),
         |lb AS (SELECT g, list(u ORDER BY rk) AS l FROM rb WHERE rk <= 10
         |  GROUP BY g),
         |j AS (SELECT la.g, la.l AS a, lb.l AS b,
         |    least(10, least(len(la.l), len(lb.l))) AS keff
         |  FROM la JOIN lb ON la.g = lb.g)
         |SELECT g AS event_type, CAST(keff AS BIGINT) AS k_eff,
         |  CAST(round(CAST(CAST(
         |    list_reduce(list_transform(range(1, keff + 1), d ->
         |      CAST(len(list_intersect(list_slice(a, 1, d),
         |                              list_slice(b, 1, d))) AS DOUBLE)
         |      / CAST(d AS DOUBLE) * ($wtsArr)[d]), (x, y) -> x + y)
         |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS rbo
         |FROM j""".stripMargin
    },
    // q300: discordant-pair census; Edwards-corrected chi2 is one
    // division of exact integers (the square widened to HUGEINT)
    "q300_mcnemar" ->
      """WITH u AS (SELECT event_type, user_id,
        |    max(CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |        THEN 1 ELSE 0 END) AS a,
        |    max(CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |        THEN 0 ELSE 1 END) AS b
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n01,
        |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n10
        |  FROM u GROUP BY 1)
        |SELECT event_type, n, n01, n10,
        |  CASE WHEN n01 + n10 > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(CAST(abs(n01 - n10) - 1 AS HUGEINT)
        |           * (abs(n01 - n10) - 1) AS DOUBLE)
        |      / CAST(n01 + n10 AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS chi2
        |FROM c""".stripMargin,
    // q301: unbiased collision probability — an exact rational of
    // integer counts, no log parity contract at all
    "q301_simpson" ->
      """WITH t AS (SELECT source, unnest(string_split_regex(
        |      lower(trim(text)), '\s+')) AS tok FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM t WHERE len(tok) > 0 GROUP BY 1, 2),
        |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_categories,
        |    sum(CAST(c AS HUGEINT) * c) AS c2,
        |    sum(CAST(c AS HUGEINT) * (c - 1)) AS cc1
        |  FROM c GROUP BY 1)
        |SELECT source, n, n_categories,
        |  CASE WHEN n > 1 THEN
        |    CAST(round(CAST(CAST(CAST(cc1 AS DOUBLE) /
        |      CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS simpson_lambda,
        |  CASE WHEN n > 1 THEN
        |    CAST(round(CAST(CAST(1.0 - CAST(cc1 AS DOUBLE) /
        |      CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS diversity,
        |  CAST(round(CAST(CAST(
        |    CAST(CAST(n AS HUGEINT) * n AS DOUBLE) / CAST(c2 AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS effective
        |FROM s""".stripMargin,
    // q299: exact integer group census; each Theil term is one
    // pinned-shape double (ln parity, q237); fold in lang order
    "q299_theil_between" ->
      """WITH c AS (SELECT lang AS g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(n_chars) AS BIGINT) AS sg
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0 GROUP BY 1),
        |t AS (SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS k FROM c),
        |f AS (SELECT t.k, t.n, t.s,
        |    list((CAST(sg AS DOUBLE) / CAST(t.s AS DOUBLE)) *
        |      ln((CAST(sg AS DOUBLE) * CAST(t.n AS DOUBLE)) /
        |         (CAST(t.s AS DOUBLE) * CAST(ng AS DOUBLE)))
        |      ORDER BY g) AS terms
        |  FROM c, t GROUP BY 1, 2, 3)
        |SELECT k, n, s AS total,
        |  CASE WHEN s > 0 THEN
        |    CAST(round(CAST(CAST(list_reduce(terms, (a, x) -> a + x)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS theil_between
        |FROM f""".stripMargin,
    // q298: q98's md5 thresholds ('cc'/'e6'), then the straddle census —
    // all-integer counts, one terminal division per variant
    "q298_split_leakage" -> {
      def variant(keyCol: String, tag: String) =
        s"""SELECT '$tag' AS variant, CAST(sum(nr) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_straddling,
           |  CAST(sum(CASE WHEN ns > 1 THEN nr ELSE 0 END) AS BIGINT)
           |    AS n_rows_straddling,
           |  CAST(round(CAST(CAST(
           |    CAST(sum(CASE WHEN ns > 1 THEN nr ELSE 0 END) AS DOUBLE)
           |    / CAST(sum(nr) AS DOUBLE)
           |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS leak_rate
           |FROM (SELECT user_id, CAST(sum(c) AS BIGINT) AS nr,
           |    CAST(count(*) AS BIGINT) AS ns
           |  FROM (SELECT user_id, split, CAST(count(*) AS BIGINT) AS c
           |    FROM (SELECT user_id,
           |        CASE WHEN substr(md5(CAST($keyCol AS VARCHAR)), 1, 2) < 'cc'
           |               THEN 'train'
           |             WHEN substr(md5(CAST($keyCol AS VARCHAR)), 1, 2) < 'e6'
           |               THEN 'val'
           |             ELSE 'test' END AS split
           |      FROM events) s GROUP BY 1, 2) cs GROUP BY 1) g""".stripMargin
      variant("event_id", "row_keyed") + "\nUNION ALL\n" +
        variant("user_id", "group_keyed")
    },
    // q297: W1's numerator is an exact integer sum (cross-products x
    // value gaps) — order-insensitive, no fold discipline needed; the
    // terminal division is the only float op
    "q297_wasserstein" ->
      """WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS r
        |  FROM events),
        |c AS (SELECT v, CAST(sum(1 - r) AS BIGINT) AS ca,
        |    CAST(sum(r) AS BIGINT) AS cb FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS nv FROM c),
        |w AS (SELECT v,
        |    SUM(ca) OVER (ORDER BY v) AS cuma,
        |    SUM(cb) OVER (ORDER BY v) AS cumb,
        |    lead(v) OVER (ORDER BY v) AS vn
        |  FROM c),
        |g AS (SELECT COALESCE(sum(
        |      abs(CAST(cuma AS HUGEINT) * t.nb - CAST(cumb AS HUGEINT) * t.na)
        |      * (vn - v)), 0) AS num
        |  FROM w, t WHERE vn IS NOT NULL)
        |SELECT t.na AS n_a, t.nb AS n_b, t.nv AS n_values,
        |  CASE WHEN t.na <> 0 AND t.nb <> 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(g.num AS DOUBLE) / CAST(CAST(t.na AS HUGEINT) * t.nb AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS w1
        |FROM t, g""".stripMargin,
    // q296: token-LCS via the q281 recursive-CTE row-DP discipline (the
    // bare-list accumulator; struct accumulators drop list state). Both
    // token lists cap at 64 — the cap is the operator's semantics.
    "q296_rouge_l" ->
      """WITH RECURSIVE base AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS rt
        |  FROM documents WHERE doc_id < 40),
        |pair AS (SELECT doc_id, list_slice(rt, 1, 64) AS va,
        |    list_slice(list_concat(list_slice(rt, 1, 12),
        |      ['candidate', 'summary', 'tail', 'words']), 1, 64) AS vb
        |  FROM base),
        |dp AS (
        |  SELECT doc_id, va, vb, 0 AS i,
        |    list_transform(range(0, len(vb) + 1), j -> CAST(0 AS BIGINT)) AS row
        |  FROM pair
        |  UNION ALL
        |  SELECT doc_id, va, vb, i + 1,
        |    list_reduce(
        |      list_prepend([CAST(0 AS BIGINT)],
        |        list_transform(range(1, len(vb) + 1), j -> [CAST(j AS BIGINT)])),
        |      (acc, x) -> list_append(acc,
        |        CASE WHEN va[i + 1] = vb[x[1]] THEN row[x[1]] + 1
        |             ELSE greatest(row[x[1] + 1], acc[len(acc)]) END)) AS row
        |  FROM dp WHERE i < len(va))
        |SELECT doc_id, CAST(len(va) AS BIGINT) AS n_ref,
        |  CAST(len(vb) AS BIGINT) AS n_cand,
        |  row[len(vb) + 1] AS lcs,
        |  CAST(round(CAST(CAST(CAST(row[len(vb) + 1] AS DOUBLE)
        |    / CAST(len(vb) AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS rouge_p,
        |  CAST(round(CAST(CAST(CAST(row[len(vb) + 1] AS DOUBLE)
        |    / CAST(len(va) AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS rouge_r,
        |  CASE WHEN row[len(vb) + 1] > 0 THEN
        |    CAST(round(CAST(CAST(
        |      2.0 * (CAST(row[len(vb) + 1] AS DOUBLE) / CAST(len(vb) AS DOUBLE))
        |          * (CAST(row[len(vb) + 1] AS DOUBLE) / CAST(len(va) AS DOUBLE))
        |      / ((CAST(row[len(vb) + 1] AS DOUBLE) / CAST(len(vb) AS DOUBLE))
        |         + (CAST(row[len(vb) + 1] AS DOUBLE) / CAST(len(va) AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  ELSE 0.0 END AS rouge_f1
        |FROM dp WHERE i = len(va)""".stripMargin,
    // q295: o²/e identity — empty cells contribute 0, so the fold runs
    // over observed cells only, in (a,b) order (the q237 MI discipline)
    "q295_cramers_v" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
        |    CAST(count(*) AS BIGINT) AS cab FROM orders GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |t AS (SELECT cells.a, cells.b,
        |    CAST(CAST(cab AS HUGEINT) * cab AS DOUBLE)
        |    / CAST(CAST(ca AS HUGEINT) * cb AS DOUBLE) AS term
        |  FROM cells JOIN ma USING (a) JOIN mb USING (b)),
        |f AS (SELECT list(term ORDER BY a, b) AS terms,
        |    (SELECT CAST(sum(cab) AS BIGINT) FROM cells) AS n,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ma) AS r,
        |    (SELECT CAST(count(*) AS BIGINT) FROM mb) AS c
        |  FROM t),
        |g AS (SELECT n, r, c,
        |    CAST(n AS DOUBLE) * (list_reduce(terms, (x, y) -> x + y) - 1.0) AS chi2
        |  FROM f)
        |SELECT n, r, c,
        |  CAST(round(CAST(CAST(chi2 AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |    AS chi2,
        |  CASE WHEN least(r, c) > 1 THEN
        |    CAST(round(CAST(CAST(sqrt(greatest(chi2, 0.0) /
        |      (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE))) AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS v
        |FROM g""".stripMargin,
    // q294: doubled-order-statistic medians make z = |2x - med2| exact;
    // the one order-sensitive float sum folds in group order (q290
    // discipline); F's remaining float ops are pinned-shape divisions
    "q294_brown_forsythe" ->
      """WITH s AS (SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS s,
        |    event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |c AS (SELECT s, g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM s GROUP BY 1, 2, 3),
        |cum AS (SELECT s, g, v, c,
        |    SUM(c) OVER (PARTITION BY s, g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER (PARTITION BY s, g) AS ni
        |  FROM c),
        |med AS (SELECT s, g,
        |    min(CASE WHEN cum >= (ni + 1) // 2 THEN v END)
        |      + min(CASE WHEN cum >= ni // 2 + 1 THEN v END) AS med2
        |  FROM cum GROUP BY 1, 2),
        |z AS (SELECT c.s, c.g, c.c, abs(2 * c.v - med.med2) AS z
        |  FROM c JOIN med ON c.s = med.s AND c.g = med.g),
        |pg AS (SELECT s, g, CAST(sum(c) AS BIGINT) AS ni,
        |    sum(CAST(c AS HUGEINT) * z) AS si,
        |    sum(CAST(c AS HUGEINT) * z * z) AS qi
        |  FROM z GROUP BY 1, 2),
        |f AS (SELECT s, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ni) AS BIGINT) AS n, sum(si) AS ss, sum(qi) AS qq,
        |    list(CAST(si * si AS DOUBLE) / CAST(ni AS DOUBLE) ORDER BY g) AS terms
        |  FROM pg GROUP BY 1),
        |f2 AS (SELECT s, k, n,
        |    list_reduce(terms, (a, x) -> a + x) AS sterm,
        |    CAST(ss * ss AS DOUBLE) AS ss2, CAST(qq AS DOUBLE) AS qqd
        |  FROM f)
        |SELECT s AS dow, k, n,
        |  CASE WHEN k > 1 AND qqd - sterm > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(n - k AS DOUBLE) * (sterm - ss2 / CAST(n AS DOUBLE))
        |      / (CAST(k - 1 AS DOUBLE) * (qqd - sterm))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS f
        |FROM f2""".stripMargin,
    // q291: concordance counts are exact integer pair censuses; the tie
    // products widen to HUGEINT before the multiply (n^4/4 overflow)
    "q291_kendall_tau" ->
      """WITH d AS (SELECT event_type AS g,
        |    strftime(CAST(ts AS DATE), '%Y-%m-%d') AS o,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.g,
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS cx,
        |    CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS cy
        |  FROM d a JOIN d b ON a.g = b.g AND a.o < b.o),
        |c AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN cx * cy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |    CAST(sum(CASE WHEN cx * cy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |    CAST(sum(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tie_x,
        |    CAST(sum(CASE WHEN cy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tie_y
        |  FROM p GROUP BY 1),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1)
        |SELECT n.g AS event_type, n.n, n_pairs, concordant, discordant,
        |  tie_x, tie_y,
        |  CASE WHEN CAST(n_pairs - tie_x AS HUGEINT) * (n_pairs - tie_y) > 0 THEN
        |    CAST(round(CAST(CAST(CAST(concordant - discordant AS DOUBLE) /
        |      sqrt(CAST(CAST(n_pairs - tie_x AS HUGEINT) * (n_pairs - tie_y) AS DOUBLE))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS tau_b
        |FROM n JOIN c USING (g)""".stripMargin,
    // q292: scaled integer squared distances (BIGINT diff, HUGEINT
    // square) make every per-point s bit-replayable; the label mean sums
    // 12-decimal roundings as exact decimal (order-insensitive)
    "q292_silhouette" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xq
        |  FROM embeddings),
        |cd AS (SELECT label, t.dim, CAST(sum(xq[t.dim]) AS BIGINT) AS s
        |  FROM e, generate_series(1, 64) t(dim) GROUP BY 1, 2),
        |cent AS (SELECT label AS cand, list(s ORDER BY dim) AS cs FROM cd GROUP BY 1),
        |nn AS (SELECT label AS cand, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |cj AS (SELECT p.vec_id, p.label AS lab, c.cand,
        |    CAST(list_sum(list_transform(range(1, 65), i ->
        |      CAST(n.n * p.xq[i] - c.cs[i] AS HUGEINT)
        |      * CAST(n.n * p.xq[i] - c.cs[i] AS HUGEINT))) AS DOUBLE)
        |    / CAST(CAST(n.n AS HUGEINT) * n.n AS DOUBLE) AS dd
        |  FROM e p, cent c, nn n WHERE c.cand = n.cand),
        |ab AS (SELECT vec_id, lab,
        |    min(CASE WHEN cand = lab THEN dd END) AS a,
        |    min(CASE WHEN cand <> lab THEN dd END) AS b
        |  FROM cj GROUP BY 1, 2),
        |sp AS (SELECT lab,
        |    CASE WHEN b IS NOT NULL AND greatest(a, b) > 0
        |           THEN (b - a) / greatest(a, b)
        |         WHEN b IS NOT NULL THEN 0.0 END AS s
        |  FROM ab)
        |SELECT lab AS label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_closer_home,
        |  CAST(round(CAST(CAST(
        |    CAST(sum(round(CAST(CAST(s AS VARCHAR) AS DECIMAL(38,20)), 12)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_silhouette
        |FROM sp GROUP BY 1""".stripMargin,
    // q278: funnel depth fold — the Holt sentinel idiom (list_reduce's
    // acc starts as the FIRST element, so each element is transformed to
    // a state-struct with st = -1 marking "not yet folded"; resolve()
    // maps the marker to step(0, t) when read)
    "q278_funnel" ->
      """WITH l AS (SELECT user_id,
        |    list(struct_pack(st := CAST(-1 AS INT), t := event_type)
        |         ORDER BY ts, event_type) AS evs
        |  FROM events GROUP BY 1),
        |r AS (SELECT user_id, list_reduce(evs, (a, x) -> struct_pack(
        |    st := CASE WHEN (CASE WHEN a.st = -1 THEN
        |             (CASE WHEN a.t = 'view' THEN 1 ELSE 0 END)
        |           ELSE a.st END) < 3
        |           AND x.t = list_extract(['view', 'click', 'purchase'],
        |             (CASE WHEN a.st = -1 THEN
        |               (CASE WHEN a.t = 'view' THEN 1 ELSE 0 END)
        |              ELSE a.st END) + 1)
        |        THEN (CASE WHEN a.st = -1 THEN
        |               (CASE WHEN a.t = 'view' THEN 1 ELSE 0 END)
        |              ELSE a.st END) + 1
        |        ELSE (CASE WHEN a.st = -1 THEN
        |               (CASE WHEN a.t = 'view' THEN 1 ELSE 0 END)
        |              ELSE a.st END) END,
        |    t := x.t)) AS f
        |  FROM l),
        |d AS (SELECT user_id,
        |    CASE WHEN f.st = -1 THEN
        |      (CASE WHEN f.t = 'view' THEN 1 ELSE 0 END)
        |    ELSE f.st END AS st
        |  FROM r)
        |SELECT CAST(0 AS INT) AS stage, 'entered' AS step_name,
        |  CAST(count(*) AS BIGINT) AS n_reached FROM d
        |UNION ALL SELECT CAST(1 AS INT), 'view',
        |  CAST(sum(CASE WHEN st >= 1 THEN 1 ELSE 0 END) AS BIGINT) FROM d
        |UNION ALL SELECT CAST(2 AS INT), 'click',
        |  CAST(sum(CASE WHEN st >= 2 THEN 1 ELSE 0 END) AS BIGINT) FROM d
        |UNION ALL SELECT CAST(3 AS INT), 'purchase',
        |  CAST(sum(CASE WHEN st >= 3 THEN 1 ELSE 0 END) AS BIGINT) FROM d""".stripMargin,
    // q274: P8 eligibility gates over the enriched-scan mapping; every
    // aggregate CAST to BIGINT (DuckDB SUM widens to HUGEINT — the q255
    // type seam)
    "q274_eligibility_census" ->
      """WITH enr AS (SELECT l_returnflag,
        |    CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS scan_date,
        |    CAST(l_linenumber % 5 AS INT) AS premium_score,
        |    CAST(l_quantity * 100 AS BIGINT) AS recommended_volume,
        |    CAST(floor(l_extendedprice / 10) AS BIGINT) AS recommended_oi,
        |    CASE WHEN l_discount >= 0.01 THEN l_discount END AS recommended_strike,
        |    CASE WHEN l_tax <= 0.06 THEN CAST(l_shipdate AS DATE) + 30 END AS recommended_expiration
        |  FROM lineitem),
        |t AS (SELECT max(scan_date) AS tgt FROM enr)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_eligible,
        |  CAST(sum(premium_score) AS BIGINT) AS score_sum,
        |  CAST(sum(recommended_volume) AS BIGINT) AS volume_sum
        |FROM enr, t
        |WHERE scan_date = tgt AND premium_score >= 2
        |  AND (recommended_volume > 250 OR recommended_oi > 500)
        |  AND recommended_strike IS NOT NULL
        |  AND recommended_expiration IS NOT NULL
        |GROUP BY l_returnflag""".stripMargin,
    // q93: the exact-copy fixture forces fingerprint equality, so the
    // expected pair set + Hamming distances are engine-independent facts.
    "q93_simhash_dups" ->
      """SELECT doc_id AS id_a, doc_id + 1000 AS id_b, 0 AS hamming
        |FROM documents WHERE doc_id < 40 AND doc_id NOT IN (8, 12)""".stripMargin,
    "q94_srp_full_recall" -> cosineTopKOracle,
    // q95: per-stream concat-and-chunk packing layout; same BPE-ish token
    // regex as q84, same partitioned running-sum window.
    "q95_pack_assign" ->
      """WITH tok AS (SELECT doc_id, lang,
        |CAST(len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS INTEGER) AS n_tok
        |FROM documents),
        |o AS (SELECT doc_id, lang, n_tok,
        |COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY n_tok DESC, doc_id
        | ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off FROM tok)
        |SELECT doc_id, lang, n_tok, off // 128 AS seq_start,
        |(off + greatest(n_tok, 1) - 1) // 128 AS seq_end FROM o""".stripMargin,
    // q96: transitive closure of the q83 pair graph at cos >= 0.3 via
    // recursive CTE — min reachable id = component label, exactly the
    // fixed point the Spark min-label propagation converges to.
    "q96_dup_components" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE vec_id < 100),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM e a, e b WHERE a.vec_id < b.vec_id
        |AND list_aggregate(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum')) *
        | sqrt(list_aggregate(list_transform(b.v, x -> x*x), 'sum'))) >= 0.3),
        |edges AS (SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT DISTINCT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT edges.d AS id, reach.r FROM reach JOIN edges ON edges.s = reach.id
        |),
        |f AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
        |SELECT CAST(f.id AS BIGINT) AS vec_id, CAST(f.component AS BIGINT) AS component, c.csize
        |FROM f JOIN (SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
        |             FROM f GROUP BY component) c USING (component)""".stripMargin,
    // q97: BM25 replay — same integral tf/dl/df, same fixed-order double
    // expression tree ((idf*(tf*2.2))/denom, left-to-right term sum); the
    // ORDER BY ranks on the UNROUNDED score like the Spark plan.
    "q97_bm25" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
        | CAST(len(list_filter(toks, x -> x = 'vector')) AS BIGINT) AS tf0,
        | CAST(len(list_filter(toks, x -> x = 'hash')) AS BIGINT) AS tf1,
        | CAST(len(list_filter(toks, x -> x = 'merge')) AS BIGINT) AS tf2 FROM t),
        |s AS (SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
        | SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        | SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        | SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM d),
        |x AS (SELECT d.doc_id, d.dl, d.tf0, d.tf1, d.tf2,
        | CAST(s.n AS DOUBLE) AS nd, CAST(s.sum_dl AS DOUBLE)/CAST(s.n AS DOUBLE) AS avgdl,
        | CAST(s.df0 AS DOUBLE) AS dfd0, CAST(s.df1 AS DOUBLE) AS dfd1, CAST(s.df2 AS DOUBLE) AS dfd2 FROM d, s),
        |r AS (SELECT doc_id, dl, tf0, tf1, tf2,
        | ((ln(1.0 + (nd - dfd0 + 0.5)/(dfd0 + 0.5)) * (CAST(tf0 AS DOUBLE)*2.2))
        |   / (CAST(tf0 AS DOUBLE) + 1.2*(0.25 + 0.75*CAST(dl AS DOUBLE)/avgdl)))
        | + ((ln(1.0 + (nd - dfd1 + 0.5)/(dfd1 + 0.5)) * (CAST(tf1 AS DOUBLE)*2.2))
        |   / (CAST(tf1 AS DOUBLE) + 1.2*(0.25 + 0.75*CAST(dl AS DOUBLE)/avgdl)))
        | + ((ln(1.0 + (nd - dfd2 + 0.5)/(dfd2 + 0.5)) * (CAST(tf2 AS DOUBLE)*2.2))
        |   / (CAST(tf2 AS DOUBLE) + 1.2*(0.25 + 0.75*CAST(dl AS DOUBLE)/avgdl))) AS score_raw
        |FROM x)
        |SELECT doc_id, dl, tf0, tf1, tf2,
        | CAST(round(CAST(CAST(score_raw AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS score
        |FROM r ORDER BY score_raw DESC, doc_id LIMIT 25""".stripMargin,
    // q98: md5-prefix split thresholds — cum 0.8 -> 0xcc, 0.9 -> 0xe6
    // (floor(cum*256) as two hex digits), identical string compares.
    "q98_hash_split" ->
      """WITH a AS (SELECT lang,
        | CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |      ELSE 'test' END AS split FROM documents),
        |c AS (SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY lang, split),
        |t AS (SELECT lang, SUM(n) AS tot FROM c GROUP BY lang)
        |SELECT c.lang, c.split, c.n,
        | CAST(round(CAST(CAST(CAST(c.n AS DOUBLE)/CAST(t.tot AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS rate
        |FROM c JOIN t USING (lang)""".stripMargin,
    // q99: per-stratum md5-prefix downsampling — 0.25 -> '40', 0.5 -> '80'
    "q99_mixture" ->
      """WITH k AS (SELECT source, n_chars FROM documents
        | WHERE CASE source
        |   WHEN 'src0' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |   WHEN 'src1' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
        |   ELSE TRUE END)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
        | CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        |FROM k GROUP BY source""".stripMargin,
    // q100: same raw (non-distinct) 3-gram construction, same planted
    // doubling of every 9th doc, same 0.3 flag threshold.
    "q100_repetition" ->
      """WITH p AS (SELECT lang,
        | CASE WHEN doc_id % 9 = 0 THEN text || ' ' || text ELSE text END AS text
        |FROM documents),
        |t AS (SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS toks FROM p),
        |s AS (SELECT lang, list_transform(range(1, greatest(len(toks)-1, 1)),
        | i -> array_to_string(list_slice(toks, i, i+2), ' ')) AS sh FROM t),
        |r AS (SELECT lang, CASE WHEN len(sh) = 0 THEN CAST(0.0 AS DOUBLE)
        | ELSE 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)/CAST(len(sh) AS DOUBLE) END AS rep FROM s)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(round(CAST(CAST(AVG(rep) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS avg_rep,
        | CAST(round(CAST(CAST(MAX(rep) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS max_rep,
        | CAST(SUM(CASE WHEN rep > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM r GROUP BY lang""".stripMargin,
    // q101: same window grid (starts = 0..n-1 step 48, 1-based inclusive
    // slice of up to 64 tokens), md5 over the space-joined chunk.
    "q101_chunking" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |FROM documents WHERE doc_id < 50),
        |u AS (SELECT doc_id, toks,
        | UNNEST(range(0, greatest(len(toks), 1), 48)) AS s FROM t)
        |SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_ix, CAST(s AS BIGINT) AS start,
        | CAST(len(list_slice(toks, s+1, s+64)) AS BIGINT) AS n_tok,
        | md5(array_to_string(list_slice(toks, s+1, s+64), ' ')) AS chunk_md5
        |FROM u""".stripMargin,
    // q102: the bounded-heap top-k replayed as a window — rank by
    // (value DESC, id ASC), k=3; values pass through untouched.
    "q102_topk_agg" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        | row_number() OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |FROM orders)
        |SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank,
        | CAST(o_orderkey AS BIGINT) AS o_orderkey,
        | CAST(o_totalprice AS DOUBLE) AS o_totalprice
        |FROM r WHERE rank <= 3""".stripMargin,
    // q103: identical running offsets (per-lang window over n DESC, id),
    // identical slice bounds, ORDER BY off inside string_agg — window
    // content md5 must match byte-for-byte.
    "q103_pack_materialize" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
        |FROM documents WHERE doc_id < 200),
        |b AS (SELECT doc_id, lang, toks, CAST(len(toks) AS BIGINT) AS n FROM t),
        |o AS (SELECT *, COALESCE(CAST(SUM(n) OVER (PARTITION BY lang ORDER BY n DESC, doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off FROM b),
        |u AS (SELECT lang, off, n, toks,
        |  UNNEST(range(off // 128, (off + greatest(n, 1) - 1) // 128 + 1)) AS seq FROM o),
        |p AS (SELECT lang, seq, off,
        |  greatest(seq * 128, off) AS gs, least((seq + 1) * 128, off + n) AS ge, toks FROM u),
        |s AS (SELECT lang, seq, off, ge - gs AS cnt,
        |  array_to_string(list_slice(toks, gs - off + 1, ge - off), ' ') AS part FROM p)
        |SELECT lang, CAST(seq AS BIGINT) AS seq, CAST(COUNT(*) AS BIGINT) AS n_parts,
        | CAST(SUM(cnt) AS BIGINT) AS win_tokens,
        | md5(string_agg(part, ' ' ORDER BY off)) AS win_md5
        |FROM s GROUP BY lang, seq""".stripMargin,
    // q104: identical regexp_replace chain (tags -> entities in
    // TextOps.htmlEntities order -> control chars -> whitespace collapse);
    // DuckDB needs the 'g' flag for replace-all, Spark's default.
    "q104_text_clean" ->
      s"""WITH p AS (SELECT doc_id,
         |  CASE WHEN doc_id % 7 = 0
         |    THEN '<p class="x"> ' || text || ' </p>' || chr(10) || '<b>tail &amp; more&nbsp;here</b>' || chr(7)
         |    ELSE text END AS raw FROM documents),
         |c AS (SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw, ${duckCleanExpr("raw")} AS clean FROM p)
         |SELECT doc_id, n_raw, CAST(length(clean) AS BIGINT) AS n_clean, md5(clean) AS clean_md5
         |FROM c""".stripMargin,
    // q105: the oracle IS the naive global sort the bucketed plan avoids —
    // row_number over (md5(id), id), 0-based.
    "q105_global_shuffle" ->
      """SELECT doc_id,
        |CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos
        |FROM documents""".stripMargin,
    // q106: same top-50 vocabulary (freq desc, token asc) and per-lang
    // OOV census; rate rounded via the VARCHAR->DECIMAL repr round-trip.
    "q106_oov_rate" ->
      """WITH t AS (SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token FROM documents),
        |v AS (SELECT token FROM (SELECT token, COUNT(*) AS freq FROM t
        |      GROUP BY token ORDER BY freq DESC, token LIMIT 50)),
        |a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        | CAST(SUM(CASE WHEN token IN (SELECT token FROM v) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
        |FROM t GROUP BY lang)
        |SELECT lang, n_tokens, n_oov,
        | CAST(round(CAST(CAST(CAST(n_oov AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS oov_rate
        |FROM a""".stripMargin,
    // q107: q96's recursive closure, left-joined back onto the corpus —
    // kept = (component = own id), singletons label themselves.
    "q107_dedup_apply" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE vec_id < 100),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM e a, e b WHERE a.vec_id < b.vec_id
        |AND list_aggregate(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum')) *
        | sqrt(list_aggregate(list_transform(b.v, x -> x*x), 'sum'))) >= 0.3),
        |edges AS (SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT DISTINCT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT edges.d AS id, reach.r FROM reach JOIN edges ON edges.s = reach.id
        |),
        |f AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
        |SELECT e0.vec_id, CAST(COALESCE(f.component, e0.vec_id) AS BIGINT) AS component,
        | (COALESCE(f.component, e0.vec_id) = e0.vec_id) AS kept
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 100) e0
        |LEFT JOIN f ON f.id = e0.vec_id""".stripMargin,
    // q108: brute-force k-NN self-join — what knnJoin at nProbe = nCells
    // must reproduce exactly (the q90/q94 saturation identity).
    "q108_knn_join" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE vec_id < 60),
        |j AS (SELECT a.vec_id AS probe_id, b.vec_id AS corpus_id,
        |list_aggregate(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum')) *
        | sqrt(list_aggregate(list_transform(b.v, x -> x*x), 'sum'))) AS cos
        |FROM e a, e b WHERE a.vec_id <> b.vec_id),
        |r AS (SELECT probe_id, corpus_id, cos,
        |ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, corpus_id) AS rnk FROM j)
        |SELECT probe_id, CAST(rnk AS INT) AS "rank", corpus_id, round(cos, 4) AS cos
        |FROM r WHERE rnk <= 3""".stripMargin,
    // q109: same df census (>60% of docs), same sorted stop list, same
    // order-preserving list_filter reassembly + md5 content check.
    "q109_stop_strip" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |d AS (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t),
        |df AS (SELECT token, COUNT(*) AS df FROM d GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT COALESCE(list(token ORDER BY token), []) AS stop FROM df, n
        |      WHERE CAST(df AS DOUBLE) > CAST(n_docs AS DOUBLE) * 0.6),
        |f AS (SELECT doc_id, toks, list_filter(toks, x -> NOT list_contains(stop, x)) AS kept
        |FROM t, s)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_before,
        | CAST(len(kept) AS BIGINT) AS n_after,
        | md5(COALESCE(array_to_string(kept, ' '), '')) AS stripped_md5
        |FROM f""".stripMargin,
    // q111: exhaustive exact batch x corpus Jaccard — the LSH pipeline
    // must reproduce it exactly (recall-1 identity, q85 precedent).
    "q111_incremental_dedup" ->
      """WITH corp AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |bat AS (SELECT doc_id + 5000 AS batch_id,
        | string_split_regex(lower(trim(text || ' graft incremental batch tail')), '\s+') AS toks
        |FROM documents WHERE doc_id < 20),
        |cs AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
        | i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS sh FROM corp),
        |bs AS (SELECT batch_id, list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
        | i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS sh FROM bat),
        |p AS (SELECT b.batch_id, c.doc_id AS corpus_id,
        | len(list_intersect(b.sh, c.sh)) / CAST(len(list_distinct(list_concat(b.sh, c.sh))) AS DOUBLE) AS j
        |FROM bs b, cs c)
        |SELECT batch_id, corpus_id,
        | CAST(round(CAST(CAST(j AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS jaccard
        |FROM p WHERE j >= 0.5""".stripMargin,
    // q112: clean chain (duckCleanExpr) -> q73's quality formula over the
    // cleaned text -> gate census per source.
    "q112_quality_gate" ->
      s"""WITH pl AS (SELECT source,
         |  CASE WHEN doc_id % 7 = 0
         |    THEN '<p class="x"> ' || text || ' </p>' || chr(10) || '<b>tail &amp; more&nbsp;here</b>'
         |    ELSE text END AS raw FROM documents),
         |cl AS (SELECT source, ${duckCleanExpr("raw")} AS clean FROM pl),
         |u AS (SELECT source,
         |CASE WHEN len(string_split_regex(lower(trim(clean)), '\\s+'))=0 THEN 0.0 ELSE
         | len(list_filter(string_split_regex(lower(trim(clean)), '\\s+'), x -> list_contains(
         | ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be'], x)))
         | / CAST(len(string_split_regex(lower(trim(clean)), '\\s+')) AS DOUBLE) END AS stop_ratio,
         |CASE WHEN length(trim(clean))=0 THEN 0 ELSE len(string_split_regex(trim(clean), '\\s+')) END AS n_tok,
         |CASE WHEN length(clean)=0 THEN 0.0 ELSE (length(clean) - length(regexp_replace(clean, '[[:punct:]]', '', 'g')))
         | / CAST(length(clean) AS DOUBLE) END AS punct
         |FROM cl),
         |q AS (SELECT source, n_tok, round(
         |0.5*(CASE WHEN n_tok>=10 AND n_tok<=10000 THEN 1.0 WHEN n_tok>=3 THEN 0.5 ELSE 0.0 END) +
         |0.25*(CASE WHEN stop_ratio>=0.05 THEN 1.0 ELSE 0.3 END) +
         |0.25*(CASE WHEN punct<=0.2 THEN 1.0 ELSE 0.4 END), 4) AS q FROM u),
         |a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN q >= 0.75 AND n_tok >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST(round(CAST(CAST(AVG(q) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS avg_quality
         | FROM q GROUP BY source)
         |SELECT source, n_docs, n_kept, avg_quality,
         | CAST(round(CAST(CAST(CAST(n_kept AS DOUBLE)/CAST(n_docs AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS kept_rate
         |FROM a""".stripMargin,
    // q129: q112's clean+gate replay extended with the digest keep-first
    // dedup stage and a staged per-source census.
    "q129_ingest_e2e" ->
      s"""WITH pl AS (SELECT doc_id, source,
         |  CASE WHEN doc_id % 7 = 0
         |    THEN '<p class="x"> ' || text || ' </p>' || chr(10) || '<b>tail &amp; more&nbsp;here</b>'
         |    ELSE text END AS raw FROM documents),
         |cl AS (SELECT doc_id, source, ${duckCleanExpr("raw")} AS clean FROM pl),
         |u AS (SELECT doc_id, source, clean,
         |CASE WHEN len(string_split_regex(lower(trim(clean)), '\\s+'))=0 THEN 0.0 ELSE
         | len(list_filter(string_split_regex(lower(trim(clean)), '\\s+'), x -> list_contains(
         | ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be'], x)))
         | / CAST(len(string_split_regex(lower(trim(clean)), '\\s+')) AS DOUBLE) END AS stop_ratio,
         |CASE WHEN length(trim(clean))=0 THEN 0 ELSE len(string_split_regex(trim(clean), '\\s+')) END AS n_tok,
         |CASE WHEN length(clean)=0 THEN 0.0 ELSE (length(clean) - length(regexp_replace(clean, '[[:punct:]]', '', 'g')))
         | / CAST(length(clean) AS DOUBLE) END AS punct
         |FROM cl),
         |q2 AS (SELECT doc_id, source, clean, n_tok, round(
         |0.5*(CASE WHEN n_tok>=10 AND n_tok<=10000 THEN 1.0 WHEN n_tok>=3 THEN 0.5 ELSE 0.0 END) +
         |0.25*(CASE WHEN stop_ratio>=0.05 THEN 1.0 ELSE 0.3 END) +
         |0.25*(CASE WHEN punct<=0.2 THEN 1.0 ELSE 0.4 END), 4) AS q FROM u),
         |g AS (SELECT doc_id, source, n_tok, md5(lower(trim(clean))) AS digest,
         |(q >= 0.75 AND n_tok >= 20) AS gated FROM q2),
         |k AS (SELECT MIN(doc_id) AS doc_id FROM g WHERE gated GROUP BY digest),
         |f AS (SELECT g2.doc_id FROM g g2 JOIN k USING (doc_id))
         |SELECT g.source, COUNT(*) AS n_in,
         |CAST(SUM(CASE WHEN g.gated THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
         |CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
         |CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN g.n_tok ELSE 0 END) AS BIGINT) AS final_tokens
         |FROM g LEFT JOIN f ON g.doc_id = f.doc_id GROUP BY g.source""".stripMargin,
    "q113_cube" ->
      """SELECT l_returnflag, l_linestatus, round(SUM(l_quantity), 4) AS sum_qty,
        |COUNT(*) AS cnt FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    // q114: the conditional-aggregation expansion pivot desugars to —
    // SUM over a typed CASE is NULL for users without that event type,
    // matching Spark's pivot semantics.
    "q114_pivot" ->
      """SELECT user_id,
        |round(SUM(CASE WHEN event_type = 'view' THEN value END), 4) AS view,
        |round(SUM(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
        |round(SUM(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
        |round(SUM(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
        |round(SUM(CASE WHEN event_type = 'error' THEN value END), 4) AS error
        |FROM events GROUP BY user_id""".stripMargin,
    // q115: same RANGE frame over epoch millis; DECIMAL summation makes
    // the sliding aggregation order irrelevant (see q115 scaladoc).
    "q115_range_window" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_7d,
        |CAST(COUNT(*) OVER w AS BIGINT) AS n_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        | RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q01_group_agg" ->
      """SELECT l_returnflag, l_linestatus, round(SUM(l_quantity),4) AS sum_qty,
        |round(SUM(l_extendedprice),4) AS sum_base_price,
        |round(SUM(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        |round(AVG(l_discount),4) AS avg_disc, COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_partkey, l_quantity, round(l_extendedprice,4) AS price
        |FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R' AND l_discount IS NOT NULL""".stripMargin,
    "q03_broadcast_join" ->
      """SELECT r_name, COUNT(*) AS n_customers, round(AVG(c_acctbal),4) AS avg_acctbal
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey GROUP BY r_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, round(c_acctbal,4) AS acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,
    "q06_enrichment_join" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,4) AS totalprice,
        |COALESCE(c_name,'UNKNOWN') AS cust_name, COALESCE(n_name,'NONE') AS nation_name,
        |COALESCE(round(c_acctbal,4), 0.0) AS acctbal
        |FROM orders LEFT JOIN customer ON o_custkey=c_custkey
        |LEFT JOIN nation ON c_nationkey=n_nationkey""".stripMargin,
    "q07_argmax" ->
      """SELECT n_name, c_custkey AS top_custkey, round(c_acctbal,4) AS top_acctbal FROM (
        |SELECT n_name, c_custkey, c_acctbal,
        |ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        |FROM customer JOIN nation ON c_nationkey=n_nationkey) WHERE rn=1""".stripMargin,
    "q08_conditional_agg" ->
      """SELECT o_orderpriority,
        |round(SUM(CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0.0 END),4) AS finished_value,
        |CAST(SUM(CASE WHEN o_totalprice>100000 THEN 1 ELSE 0 END) AS BIGINT) AS big_orders,
        |COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q09_window_total_pct" ->
      """WITH a AS (SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, cnt, round(cnt*100.0/SUM(cnt) OVER (), 1) AS pct_of_all FROM a""".stripMargin,
    "q10_percentiles" ->
      """SELECT c_mktsegment, round(quantile_cont(c_acctbal, 0.25),4) AS p25,
        |round(quantile_cont(c_acctbal, 0.5),4) AS p50,
        |round(quantile_cont(c_acctbal, 0.75),4) AS p75 FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q11_dedup_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,4) AS totalprice FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) WHERE rn=1""".stripMargin,
    "q12_topn_per_group" ->
      """SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey,
        |round(o_totalprice,4) AS totalprice FROM (
        |SELECT o_orderpriority, o_orderkey, o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) WHERE rn<=3""".stripMargin,
    "q13_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS orderdate
        |FROM orders WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)""".stripMargin,
    "q14_union_cohorts" ->
      """WITH tagged AS (
        |SELECT 'HIGH_QTY' AS cohort, l_extendedprice, l_quantity FROM lineitem WHERE l_quantity>=40
        |UNION ALL SELECT 'HIGH_DISC', l_extendedprice, l_quantity FROM lineitem WHERE l_discount>=0.08
        |UNION ALL SELECT 'RETURNED', l_extendedprice, l_quantity FROM lineitem WHERE l_returnflag='R')
        |SELECT cohort, COUNT(*) AS cnt, round(AVG(l_extendedprice),4) AS avg_price,
        |round(SUM(l_quantity),4) AS sum_qty FROM tagged GROUP BY cohort""".stripMargin,
    "q15_topk" ->
      """SELECT o_orderkey, round(o_totalprice,4) AS totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q16_histogram" ->
      """SELECT CASE WHEN o_totalprice<50000 THEN 'P0_SMALL' WHEN o_totalprice<150000 THEN 'P1_MID'
        |WHEN o_totalprice<300000 THEN 'P2_LARGE' ELSE 'P3_JUMBO' END AS bucket,
        |COUNT(*) AS cnt, round(AVG(o_totalprice),4) AS avg_price FROM orders GROUP BY 1""".stripMargin,
    "q17_value_counts" ->
      "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
    "q18_minmax_summary" ->
      """SELECT CAST(MIN(o_orderdate) AS DATE) AS min_date, CAST(MAX(o_orderdate) AS DATE) AS max_date,
        |COUNT(*) AS cnt, round(MIN(o_totalprice),4) AS min_price,
        |round(MAX(o_totalprice),4) AS max_price FROM orders""".stripMargin,
    "q19_vote_tally" ->
      """WITH a AS (SELECT event_type, COUNT(DISTINCT user_id) AS voters, COUNT(*) AS votes,
        |round(AVG(value),4) AS avg_conviction FROM events GROUP BY event_type),
        |t AS (SELECT CAST(SUM(voters) AS BIGINT) AS t FROM a)
        |SELECT event_type, voters, votes, avg_conviction,
        |CASE WHEN voters/t >= 0.8 THEN 'SUPERMAJORITY' WHEN voters/t >= 0.4 THEN 'MAJORITY'
        |WHEN votes >= 2 THEN 'SPLIT' ELSE 'SOLO' END AS tier FROM a, t""".stripMargin,
    "q20_merge_upsert" ->
      """SELECT c.c_custkey, c.c_name, round(COALESCE(u.bal, round(c.c_acctbal,4)),4) AS acctbal
        |FROM customer c LEFT JOIN (SELECT o_custkey, round(SUM(o_totalprice),4) AS bal
        |FROM orders GROUP BY o_custkey) u ON c.c_custkey = u.o_custkey""".stripMargin,
    "q21_replace_by_key" ->
      """SELECT c_custkey, c_mktsegment, round(c_acctbal,4) AS acctbal FROM customer
        |WHERE c_mktsegment <> 'BUILDING'
        |UNION ALL SELECT c_custkey, c_mktsegment, round(c_acctbal*2,4) FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q22_max_streak" ->
      """WITH t AS (SELECT user_id, value<50 AS losing,
        |SUM(CASE WHEN value<50 THEN 0 ELSE 1 END) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS island FROM events),
        |r AS (SELECT user_id, island, COUNT(*) AS len FROM t WHERE losing GROUP BY user_id, island)
        |SELECT user_id, MAX(len) AS max_streak FROM r GROUP BY user_id""".stripMargin,
    "q23_max_drawdown" ->
      """WITH p AS (SELECT user_id, ts, event_id, 1000.0 + SUM(value-50.0) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS capital FROM events),
        |d AS (SELECT user_id, capital, MAX(capital) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS peak FROM p)
        |SELECT user_id, round(MAX((peak-capital)/peak),6) AS max_drawdown FROM d GROUP BY user_id""".stripMargin,
    "q24_ntile_split" ->
      """WITH m AS (SELECT quantile_cont(epoch_ms(o_orderdate), 0.5) AS med FROM orders)
        |SELECT CAST(CASE WHEN epoch_ms(o_orderdate) <= med THEN 1 ELSE 2 END AS INT) AS half,
        |COUNT(*) AS cnt, round(AVG(o_totalprice),4) AS avg_price
        |FROM orders, m GROUP BY 1""".stripMargin,
    "q25_top_lists" ->
      """SELECT o_orderpriority,
        |array_to_string((list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC))[1:3], '|')
        | AS top_orders,
        |round(list_aggregate((list(o_totalprice ORDER BY o_totalprice DESC, o_orderkey DESC))[1:3],
        | 'sum'), 4) AS top_value
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q30_sma" ->
      """SELECT event_id, user_id,
        |round(CASE WHEN COUNT(value) OVER w >= 20 THEN AVG(value) OVER w END, 4) AS sma20
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q31_running_sum" ->
      """SELECT event_id, user_id, round(SUM(value) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING),4) AS running_value FROM events""".stripMargin,
    "q32_lag_diff" ->
      """SELECT event_id, user_id, round(value - LAG(value, 1) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id), 4) AS delta FROM events""".stripMargin,
    "q33_rolling_extrema" ->
      """SELECT event_id, user_id, round(MAX(value) OVER w, 4) AS high10,
        |round(MIN(value) OVER w, 4) AS low10 FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q34_bollinger" ->
      """SELECT event_id, user_id, round(mid,4) AS bb_mid, round(mid + 2.0*sd,4) AS bb_up,
        |round(mid - 2.0*sd,4) AS bb_lo FROM (
        |SELECT event_id, user_id,
        |CASE WHEN COUNT(value) OVER w >= 20 THEN AVG(value) OVER w END AS mid,
        |CASE WHEN COUNT(value) OVER w >= 20 THEN STDDEV_SAMP(value) OVER w END AS sd
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))""".stripMargin,
    "q35_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms, round(p.value,4) AS purchase_value,
        |round(v.value,4) AS view_value
        |FROM (SELECT * FROM events WHERE event_type='purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='view') v
        |ON p.user_id=v.user_id AND v.ts <= p.ts""".stripMargin,
    "q36_future_window" ->
      """WITH s AS (SELECT event_id AS signup_id, user_id, ts FROM events WHERE event_type='signup'),
        |j AS (SELECT s.signup_id, s.user_id, e.event_id AS next_id, e.value,
        |ROW_NUMBER() OVER (PARTITION BY s.signup_id ORDER BY e.ts) AS rnk
        |FROM s JOIN events e ON e.user_id=s.user_id AND e.ts > s.ts)
        |SELECT signup_id, user_id, CAST(rnk AS INT) AS "rank", next_id,
        |round(value,4) AS next_value FROM j WHERE rnk <= 3""".stripMargin,
    "q37_session_count" ->
      """WITH t AS (SELECT user_id, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |IS NULL OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |> 3600000 THEN 1 ELSE 0 END AS ns FROM events)
        |SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM t GROUP BY user_id""".stripMargin,
    "q38_ema" ->
      """WITH h AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs FROM events GROUP BY user_id)
        |SELECT user_id, round(list_reduce(vs, (acc, x) -> (2.0/22.0)*x + (20.0/22.0)*acc), 4) AS ema21
        |FROM h""".stripMargin,
    "q39_rsi" ->
      """WITH h AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs FROM events GROUP BY user_id),
        |d AS (SELECT user_id, list_transform(list_zip(list_slice(vs, 2, len(vs)),
        |list_slice(vs, 1, len(vs)-1)), x -> x[1]-x[2]) AS diffs FROM h),
        |g AS (SELECT user_id, diffs,
        |list_transform(diffs, x -> CASE WHEN x>0 THEN x ELSE 0.0 END) AS gains,
        |list_transform(diffs, x -> CASE WHEN x<0 THEN -x ELSE 0.0 END) AS losses FROM d),
        |w AS (SELECT user_id, diffs,
        |list_reduce(list_concat([list_aggregate(list_slice(gains,1,14),'sum')/14.0],
        |list_slice(gains,15,len(gains))), (acc,x) -> (acc*13.0+x)/14.0) AS ag,
        |list_reduce(list_concat([list_aggregate(list_slice(losses,1,14),'sum')/14.0],
        |list_slice(losses,15,len(losses))), (acc,x) -> (acc*13.0+x)/14.0) AS al FROM g)
        |SELECT user_id, round(CASE WHEN len(diffs)<14 THEN NULL WHEN al=0 THEN 100.0
        |ELSE 100.0 - 100.0/(1.0+ag/al) END, 4) AS rsi14 FROM w""".stripMargin,
    "q40_macd" ->
      """WITH h AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs FROM events GROUP BY user_id),
        |r AS (SELECT user_id, list_reduce(list_transform(vs, v -> struct_pack(sig:=CAST(0.0 AS DOUBLE), f:=v, s:=v)),
        |(acc, x) -> struct_pack(
        |sig := (2.0/10.0)*(((2.0/13.0)*x.f + (11.0/13.0)*acc.f) - ((2.0/27.0)*x.f + (25.0/27.0)*acc.s))
        | + (8.0/10.0)*acc.sig,
        |f := (2.0/13.0)*x.f + (11.0/13.0)*acc.f,
        |s := (2.0/27.0)*x.f + (25.0/27.0)*acc.s)) AS m FROM h)
        |SELECT user_id, round(m.f - m.s, 4) AS macd, round(m.sig, 4) AS macd_signal,
        |round(m.f - m.s - m.sig, 4) AS macd_hist FROM r""".stripMargin,
    // W7 Wilder ATR: TR list (first bar h-l, then max of range / |h-pc| /
    // |l-pc|), seed = mean of first 14 TRs, then rma = (prev*13 + tr)/14.
    "q41_atr" ->
      """WITH bars AS (SELECT user_id, ts, event_id, (value+1000)*1.01 AS h,
        |(value+1000)*0.99 AS l, CAST(value+1000 AS DOUBLE) AS c FROM events),
        |g AS (SELECT user_id, list(h ORDER BY ts, event_id) AS hs,
        |list(l ORDER BY ts, event_id) AS ls, list(c ORDER BY ts, event_id) AS cs
        |FROM bars GROUP BY user_id),
        |t AS (SELECT user_id, list_concat([hs[1]-ls[1]],
        |list_transform(range(2, len(cs)+1), i -> greatest(hs[i]-ls[i],
        |abs(hs[i]-cs[i-1]), abs(ls[i]-cs[i-1])))) AS trs FROM g),
        |w AS (SELECT user_id, trs,
        |list_reduce(list_concat([list_aggregate(list_slice(trs,1,14),'sum')/14.0],
        |list_slice(trs,15,len(trs))), (acc,x) -> (acc*13.0+x)/14.0) AS atr FROM t)
        |SELECT user_id, round(CASE WHEN len(trs) >= 15 THEN atr END, 4) AS atr14
        |FROM w""".stripMargin,
    // F20: support = greatest candidate strictly below price, resistance =
    // least strictly above; null-skipping greatest/least match the
    // when(cond, c) null pattern on the Spark side.
    "q42_support_resistance" ->
      """SELECT l_orderkey, l_linenumber,
        |round(greatest(
        | CASE WHEN l_quantity*1000 < l_extendedprice THEN l_quantity*1000 END,
        | CASE WHEN l_discount*500000 < l_extendedprice THEN l_discount*500000 END,
        | CASE WHEN 30000.0 < l_extendedprice THEN 30000.0 END), 4) AS support,
        |round(least(
        | CASE WHEN l_quantity*1000 > l_extendedprice THEN l_quantity*1000 END,
        | CASE WHEN l_discount*500000 > l_extendedprice THEN l_discount*500000 END,
        | CASE WHEN 30000.0 > l_extendedprice THEN 30000.0 END), 4) AS resistance
        |FROM lineitem""".stripMargin,
    // W11: direction from the first bar close, BULLISH tracks max-high
    // excursion, BEARISH min-low, percent of signal price.
    "q43_directional_peak" ->
      """WITH bars AS (SELECT user_id, ts, event_id, (value+1000)*1.01 AS h,
        |(value+1000)*0.99 AS l, CAST(value+1000 AS DOUBLE) AS c FROM events),
        |f AS (SELECT user_id, c AS sig_c,
        |ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM bars),
        |s AS (SELECT user_id, sig_c FROM f WHERE rn = 1),
        |a AS (SELECT user_id, MAX(h) AS ph, MIN(l) AS tl FROM bars GROUP BY user_id)
        |SELECT a.user_id,
        |CASE WHEN sig_c > 1050 THEN 'BULLISH' ELSE 'BEARISH' END AS direction,
        |CAST(round(CAST(CAST(CASE WHEN sig_c > 1050 THEN (ph/sig_c - 1)*100
        | ELSE (tl/sig_c - 1)*100 END AS VARCHAR) AS DECIMAL(38,20)), 2) AS DOUBLE) AS peak_return
        |FROM a JOIN s USING (user_id)""".stripMargin,
    // W9: per-key latest row via one max_by aggregation.
    "q46_latest_row" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |round(value, 4) AS last_value, epoch_ms(ts) AS last_ts_ms FROM (
        |SELECT user_id, event_id, event_type, value, ts,
        |ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |FROM events) WHERE rn = 1""".stripMargin,
    // P6: sequential eligibility gates, first failing gate recorded.
    "q47_eligibility" ->
      """WITH g AS (SELECT CASE
        |WHEN NOT (l_quantity >= 7 AND l_quantity <= 45) THEN 'DTE'
        |WHEN NOT (l_extendedprice > 0 AND l_tax >= 0) THEN 'QUOTE'
        |WHEN NOT (l_discount <= 0.08) THEN 'SPREAD'
        |WHEN NOT ((CASE WHEN l_linestatus = 'O' THEN l_extendedprice/30000.0
        | ELSE 30000.0/l_extendedprice END) BETWEEN 0.9 AND 1.25) THEN 'MONEYNESS'
        |ELSE 'ELIGIBLE' END AS gate FROM lineitem)
        |SELECT gate, COUNT(*) AS cnt FROM g GROUP BY gate""".stripMargin,
    // F21: event-weighted blend above hi, quiet-weighted below lo,
    // midpoint between; literals cast DOUBLE (see q48 note).
    "q49_regime_blend" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_discount*10 AS news,
        |l_quantity/50 AS sa, l_tax*10 AS sb FROM lineitem),
        |e AS (SELECT *, sa * CAST(0.6 AS DOUBLE) + sb * CAST(0.4 AS DOUBLE) AS ev,
        |sa * CAST(0.2 AS DOUBLE) + sb * CAST(0.8 AS DOUBLE) AS qu FROM b)
        |SELECT l_orderkey, l_linenumber,
        |CAST(round(CAST(CAST(CASE WHEN news > 0.7 THEN ev WHEN news < 0.3 THEN qu
        | ELSE (ev + qu) / 2 END AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS blended
        |FROM e""".stripMargin,
    // W10: last close vs SMA-10; list-ordered summation on both engines.
    "q44_regime_trend" ->
      """WITH h AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
        |FROM events GROUP BY user_id)
        |SELECT user_id, CASE WHEN len(vs) >= 10 THEN
        | CASE WHEN vs[len(vs)] > list_aggregate(list_slice(vs, greatest(len(vs)-9, 1), len(vs)), 'sum')
        |  / least(len(vs), 10) THEN 'BULLISH' ELSE 'BEARISH' END
        |END AS spy_trend_state FROM h""".stripMargin,
    "q59_calendar" ->
      """WITH bounds AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS mn, CAST(MAX(o_orderdate) AS DATE) AS mx FROM orders),
        |cal AS (SELECT CAST(mn + i * INTERVAL 1 DAY AS DATE) AS date,
        |dayofweek(mn + i * INTERVAL 1 DAY) NOT IN (0, 6) AS is_session
        |FROM bounds, range(0, 5000) t(i) WHERE mn + i * INTERVAL 1 DAY <= mx + INTERVAL 7 DAY),
        |seqd AS (SELECT date, is_session,
        |SUM(CASE WHEN is_session THEN 1 ELSE 0 END) OVER (ORDER BY date ROWS UNBOUNDED PRECEDING) AS session_seq
        |FROM cal)
        |SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate, s.is_session,
        |CAST(s.session_seq AS BIGINT) AS session_seq, n.date AS next_session
        |FROM orders o JOIN seqd s ON CAST(o.o_orderdate AS DATE) = s.date
        |LEFT JOIN (SELECT session_seq, date FROM seqd WHERE is_session) n
        |ON s.session_seq + 1 = n.session_seq""".stripMargin,
    "q60_bracket" ->
      """WITH bars AS (SELECT user_id, epoch_ms(ts) AS t, (value+1000)*1.01 AS h,
        |(value+1000)*0.99 AS l, CAST(value+1000 AS DOUBLE) AS c FROM events),
        |e AS (SELECT user_id, MIN(t) AS entry_t FROM bars GROUP BY user_id),
        |en AS (SELECT b.user_id, b.t AS entry_ts, b.c*1.02 AS entry_price, e.entry_t + 7200000 AS timeout_ts
        |FROM bars b JOIN e ON b.user_id = e.user_id AND b.t = e.entry_t),
        |post AS (SELECT b.user_id, b.t, b.h, b.l, b.c, en.entry_ts, en.entry_price, en.timeout_ts
        |FROM bars b JOIN en ON b.user_id = en.user_id AND b.t >= en.entry_ts),
        |hits AS (SELECT user_id, entry_ts, entry_price, t, c,
        |CASE WHEN t >= timeout_ts THEN 'timeout' WHEN l <= entry_price*0.97 THEN 'stop'
        |WHEN h >= entry_price*1.03 THEN 'target' END AS reason FROM post WHERE t > entry_ts),
        |fh AS (SELECT user_id, entry_ts, entry_price, t AS exit_ts,
        |CASE reason WHEN 'timeout' THEN c WHEN 'stop' THEN entry_price*0.97 ELSE entry_price*1.03 END AS exit_price,
        |reason, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t) AS rn FROM hits WHERE reason IS NOT NULL),
        |lastb AS (SELECT user_id, entry_ts, entry_price, t AS exit_ts, c AS exit_price,
        |'timeout_eod' AS reason, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t DESC) AS rn FROM post),
        |fills AS (SELECT user_id, entry_ts, entry_price, exit_ts, exit_price, reason FROM fh WHERE rn = 1
        |UNION ALL SELECT l.user_id, l.entry_ts, l.entry_price, l.exit_ts, l.exit_price, l.reason
        |FROM lastb l WHERE l.rn = 1 AND NOT EXISTS (SELECT 1 FROM fh WHERE fh.user_id = l.user_id AND fh.rn = 1))
        |SELECT user_id, entry_ts, round(entry_price, 4) AS entry_price, exit_ts,
        |round(exit_price, 4) AS exit_price, reason AS exit_reason,
        |round((exit_price - entry_price)/entry_price*100, 4) AS return_pct FROM fills""".stripMargin,
    // J5 entry fallback: requested entry lands between bars; the entry bar
    // is the FIRST bar at/after it (row_number selection), everything else
    // replays q60's state machine.
    "q45_entry_fallback" ->
      """WITH bars AS (SELECT user_id, epoch_ms(ts) AS t, (value+1000)*1.01 AS h,
        |(value+1000)*0.99 AS l, CAST(value+1000 AS DOUBLE) AS c FROM events),
        |e AS (SELECT user_id, MIN(t)+1 AS req_ts FROM bars GROUP BY user_id),
        |cand AS (SELECT b.user_id, b.t, b.c, e.req_ts + 7200000 AS timeout_ts,
        |ROW_NUMBER() OVER (PARTITION BY b.user_id ORDER BY b.t) AS rn
        |FROM bars b JOIN e ON b.user_id = e.user_id AND b.t >= e.req_ts),
        |en AS (SELECT user_id, t AS entry_bar_t, c*1.02 AS entry_price, timeout_ts
        |FROM cand WHERE rn = 1),
        |post AS (SELECT b.user_id, b.t, b.h, b.l, b.c, en.entry_bar_t, en.entry_price, en.timeout_ts
        |FROM bars b JOIN en ON b.user_id = en.user_id AND b.t >= en.entry_bar_t),
        |hits AS (SELECT user_id, entry_bar_t, entry_price, t, c,
        |CASE WHEN t >= timeout_ts THEN 'timeout' WHEN l <= entry_price*0.97 THEN 'stop'
        |WHEN h >= entry_price*1.03 THEN 'target' END AS reason FROM post WHERE t > entry_bar_t),
        |fh AS (SELECT user_id, entry_bar_t, entry_price, t AS exit_ts,
        |CASE reason WHEN 'timeout' THEN c WHEN 'stop' THEN entry_price*0.97 ELSE entry_price*1.03 END AS exit_price,
        |reason, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t) AS rn FROM hits WHERE reason IS NOT NULL),
        |lastb AS (SELECT user_id, entry_bar_t, entry_price, t AS exit_ts, c AS exit_price,
        |'timeout_eod' AS reason, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t DESC) AS rn FROM post),
        |fills AS (SELECT user_id, entry_bar_t, entry_price, exit_ts, exit_price, reason FROM fh WHERE rn = 1
        |UNION ALL SELECT l.user_id, l.entry_bar_t, l.entry_price, l.exit_ts, l.exit_price, l.reason
        |FROM lastb l WHERE l.rn = 1 AND NOT EXISTS (SELECT 1 FROM fh WHERE fh.user_id = l.user_id AND fh.rn = 1))
        |SELECT user_id, entry_bar_t AS entry_ts, round(entry_price, 4) AS entry_price, exit_ts,
        |round(exit_price, 4) AS exit_price, reason AS exit_reason,
        |round((exit_price - entry_price)/entry_price*100, 4) AS return_pct FROM fills""".stripMargin,
    // F19/F20 risk chain. mirrorRound = Spark's BigDecimal.valueOf round;
    // every literal in arithmetic is CAST DOUBLE (bare decimals make
    // DuckDB CASE arithmetic DECIMAL-typed and drift from Spark doubles).
    "q48_risk_fields" ->
      """WITH base AS (SELECT l_orderkey, l_linenumber,
        |(l_discount - CAST(0.04 AS DOUBLE)) * 200 AS pct,
        |l_quantity * 2 AS rsi, l_tax * 100 AS atr,
        |l_extendedprice / 100 AS price, l_discount * 10 AS cat,
        |l_tax * 10 AS rev, CAST(l_partkey % 11 AS INT) AS score,
        |CASE WHEN l_linestatus = 'O' THEN 'BULLISH' ELSE 'BEARISH' END AS direction,
        |l_extendedprice / 100 * CAST(0.95 AS DOUBLE) AS sup,
        |l_extendedprice / 100 * CAST(1.08 AS DOUBLE) AS res
        |FROM lineitem),
        |d AS (SELECT *, CASE WHEN price > 0 AND atr > 0 THEN atr / price * 100
        | ELSE CAST(3.0 AS DOUBLE) END AS atr_pct FROM base),
        |m AS (SELECT *, CAST(round(CAST(CAST(abs(pct) / atr_pct AS VARCHAR)
        | AS DECIMAL(38,20)), 2) AS DOUBLE) AS atr_move FROM d),
        |r AS (SELECT *,
        |(CASE WHEN (direction = 'BEARISH' AND pct < 0) OR (direction = 'BULLISH' AND pct > 0) THEN
        |  CASE WHEN abs(pct) > 15 THEN CAST(0.45 AS DOUBLE) WHEN abs(pct) > 10 THEN CAST(0.30 AS DOUBLE)
        |  WHEN abs(pct) > 5 THEN CAST(0.10 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        | ELSE CAST(0.0 AS DOUBLE) END
        |+ CASE WHEN direction = 'BEARISH' AND rsi < 30 THEN CAST(0.25 AS DOUBLE)
        |  WHEN direction = 'BEARISH' AND rsi < 35 THEN CAST(0.15 AS DOUBLE)
        |  WHEN direction = 'BULLISH' AND rsi > 70 THEN CAST(0.25 AS DOUBLE)
        |  WHEN direction = 'BULLISH' AND rsi > 65 THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        |+ CASE WHEN atr_move > 2.5 THEN CAST(0.20 AS DOUBLE)
        |  WHEN atr_move > 1.5 THEN CAST(0.10 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        |+ CASE WHEN cat > 0.8 THEN CAST(-0.10 AS DOUBLE)
        |  WHEN cat > 0.6 THEN CAST(-0.05 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS mr_raw FROM m),
        |mr AS (SELECT *, CAST(round(CAST(CAST(
        | least(greatest(mr_raw * CAST(0.6 AS DOUBLE) + rev * CAST(0.4 AS DOUBLE),
        |  CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,20)), 3) AS DOUBLE)
        | AS mrisk FROM r),
        |t AS (SELECT *, CASE WHEN direction = 'BULLISH' THEN
        | (CASE WHEN rsi > 40 AND rsi < 70 THEN CAST(0.7 AS DOUBLE)
        |  WHEN rsi < 40 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END)
        | ELSE (CASE WHEN rsi < 60 AND rsi > 30 THEN CAST(0.7 AS DOUBLE)
        |  WHEN rsi > 60 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) END AS tech FROM mr),
        |q AS (SELECT *, CAST(round(CAST(CAST(least(greatest(
        | (score / CAST(10.0 AS DOUBLE) * CAST(0.4 AS DOUBLE) + cat * CAST(0.2 AS DOUBLE)
        |  + (CAST(1.0 AS DOUBLE) - mrisk) * CAST(0.2 AS DOUBLE) + tech * CAST(0.2 AS DOUBLE)) * 10,
        | CAST(0.0 AS DOUBLE)), CAST(10.0 AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,20)), 1) AS DOUBLE)
        | AS quality FROM t),
        |f AS (SELECT *,
        |CASE WHEN direction = 'BULLISH' THEN res - price ELSE price - sup END AS reward,
        |CASE WHEN direction = 'BULLISH' THEN price - sup ELSE res - price END AS risk FROM q)
        |SELECT l_orderkey, l_linenumber, atr_move AS atr_normalized_move,
        |mrisk AS mean_reversion_risk, quality AS enrichment_quality_score,
        |CASE WHEN price > 0 AND sup > 0 AND res > 0 AND risk > 0 THEN
        | CAST(round(CAST(CAST(reward / risk AS VARCHAR) AS DECIMAL(38,20)), 2) AS DOUBLE)
        |END AS risk_reward_ratio FROM f""".stripMargin,
    "q61_sweep" ->
      """WITH cfgs (cfg, tm, sm) AS (VALUES (0, CAST(1.03 AS DOUBLE), CAST(0.97 AS DOUBLE)),
        |(1, CAST(1.03 AS DOUBLE), CAST(0.95 AS DOUBLE)), (2, CAST(1.06 AS DOUBLE), CAST(0.97 AS DOUBLE)),
        |(3, CAST(1.06 AS DOUBLE), CAST(0.95 AS DOUBLE))),
        |bars AS (SELECT user_id, epoch_ms(ts) AS t, (value+1000)*1.01 AS h,
        |(value+1000)*0.99 AS l, CAST(value+1000 AS DOUBLE) AS c FROM events),
        |e AS (SELECT user_id, MIN(t) AS entry_t FROM bars GROUP BY user_id),
        |en AS (SELECT b.user_id, b.t AS entry_ts, b.c*1.02 AS entry_price, e.entry_t + 7200000 AS timeout_ts
        |FROM bars b JOIN e ON b.user_id = e.user_id AND b.t = e.entry_t),
        |post AS (SELECT c2.cfg, c2.tm, c2.sm, b.user_id, b.t, b.h, b.l, b.c, en.entry_ts, en.entry_price, en.timeout_ts
        |FROM bars b JOIN en ON b.user_id = en.user_id AND b.t >= en.entry_ts CROSS JOIN cfgs c2),
        |hits AS (SELECT cfg, user_id, entry_price, t, c,
        |CASE WHEN t >= timeout_ts THEN 'timeout' WHEN l <= entry_price*sm THEN 'stop'
        |WHEN h >= entry_price*tm THEN 'target' END AS reason,
        |CASE WHEN t >= timeout_ts THEN c WHEN l <= entry_price*sm THEN entry_price*sm
        |WHEN h >= entry_price*tm THEN entry_price*tm END AS exit_price
        |FROM post WHERE t > entry_ts),
        |fh AS (SELECT cfg, user_id, entry_price, exit_price, reason,
        |ROW_NUMBER() OVER (PARTITION BY cfg, user_id ORDER BY t) AS rn FROM hits WHERE reason IS NOT NULL),
        |lastb AS (SELECT cfg, user_id, entry_price, c AS exit_price, 'timeout_eod' AS reason,
        |ROW_NUMBER() OVER (PARTITION BY cfg, user_id ORDER BY t DESC) AS rn FROM post),
        |fills AS (SELECT cfg, user_id, entry_price, exit_price, reason FROM fh WHERE rn = 1
        |UNION ALL SELECT l.cfg, l.user_id, l.entry_price, l.exit_price, l.reason FROM lastb l
        |WHERE l.rn = 1 AND NOT EXISTS (SELECT 1 FROM fh WHERE fh.cfg = l.cfg AND fh.user_id = l.user_id AND fh.rn = 1))
        |SELECT CAST(cfg AS INT) AS cfg, reason AS exit_reason, COUNT(*) AS cnt,
        |round(AVG((exit_price - entry_price)/entry_price*100), 4) AS avg_ret
        |FROM fills GROUP BY cfg, reason""".stripMargin,
    // X2 Stress adverse fills: stop -> least(stop, close) when adv,
    // timeout/timeout_eod -> close * tmm (0.95 under Stress) — the SQL
    // replay of simulate_live_execution.py:205-302's scenario branches.
    "q65_stress_sweep" ->
      """WITH scens (scen, slip, adv, tmm) AS (VALUES
        |('Optimistic', CAST(1.00 AS DOUBLE), false, CAST(1.00 AS DOUBLE)),
        |('Base', CAST(1.02 AS DOUBLE), false, CAST(1.00 AS DOUBLE)),
        |('Stress', CAST(1.05 AS DOUBLE), true, CAST(0.95 AS DOUBLE))),
        |cfgs (cfg, tm, sm) AS (VALUES (0, CAST(1.03 AS DOUBLE), CAST(0.97 AS DOUBLE)),
        |(1, CAST(1.06 AS DOUBLE), CAST(0.95 AS DOUBLE))),
        |bars AS (SELECT user_id, epoch_ms(ts) AS t, (value+1000)*1.01 AS h,
        |(value+1000)*0.99 AS l, CAST(value+1000 AS DOUBLE) AS c FROM events),
        |e AS (SELECT user_id, MIN(t) AS entry_t FROM bars GROUP BY user_id),
        |en AS (SELECT b.user_id, b.t AS entry_ts, b.c AS entry_close, e.entry_t + 7200000 AS timeout_ts
        |FROM bars b JOIN e ON b.user_id = e.user_id AND b.t = e.entry_t),
        |post AS (SELECT s.scen, s.adv, s.tmm, c2.cfg, c2.tm, c2.sm, b.user_id, b.t, b.h, b.l, b.c,
        |en.entry_ts, en.entry_close * s.slip AS entry_price, en.timeout_ts
        |FROM bars b JOIN en ON b.user_id = en.user_id AND b.t >= en.entry_ts
        |CROSS JOIN cfgs c2 CROSS JOIN scens s),
        |hits AS (SELECT scen, cfg, user_id, entry_price, t,
        |CASE WHEN t >= timeout_ts THEN 'timeout' WHEN l <= entry_price*sm THEN 'stop'
        |WHEN h >= entry_price*tm THEN 'target' END AS reason,
        |CASE WHEN t >= timeout_ts THEN c*tmm
        |WHEN l <= entry_price*sm THEN (CASE WHEN adv THEN least(entry_price*sm, c) ELSE entry_price*sm END)
        |WHEN h >= entry_price*tm THEN entry_price*tm END AS exit_price
        |FROM post WHERE t > entry_ts),
        |fh AS (SELECT scen, cfg, user_id, entry_price, exit_price, reason,
        |ROW_NUMBER() OVER (PARTITION BY scen, cfg, user_id ORDER BY t) AS rn FROM hits WHERE reason IS NOT NULL),
        |lastb AS (SELECT scen, cfg, user_id, entry_price, c*tmm AS exit_price, 'timeout_eod' AS reason,
        |ROW_NUMBER() OVER (PARTITION BY scen, cfg, user_id ORDER BY t DESC) AS rn FROM post),
        |fills AS (SELECT scen, cfg, user_id, entry_price, exit_price, reason FROM fh WHERE rn = 1
        |UNION ALL SELECT l.scen, l.cfg, l.user_id, l.entry_price, l.exit_price, l.reason FROM lastb l
        |WHERE l.rn = 1 AND NOT EXISTS (SELECT 1 FROM fh
        |WHERE fh.scen = l.scen AND fh.cfg = l.cfg AND fh.user_id = l.user_id AND fh.rn = 1))
        |SELECT scen AS scenario, CAST(cfg AS INT) AS cfg, reason AS exit_reason, COUNT(*) AS cnt,
        |round(AVG((exit_price - entry_price)/entry_price*100), 4) AS avg_ret
        |FROM fills GROUP BY scen, cfg, reason""".stripMargin,
    "q62_flow_metrics" ->
      """WITH c AS (SELECT l_suppkey, l_linestatus = 'O' AS isCall, l_quantity AS vol,
        |l_discount*1000 AS oi, l_extendedprice/100 AS mid, l_tax, l_extendedprice,
        |l_orderkey, l_linenumber FROM lineitem),
        |agg AS (SELECT l_suppkey,
        |round(SUM(CASE WHEN isCall THEN vol*mid*100 ELSE 0.0 END), 4) AS call_dollar_vol,
        |round(SUM(CASE WHEN NOT isCall THEN vol*mid*100 ELSE 0.0 END), 4) AS put_dollar_vol,
        |round(SUM(CASE WHEN isCall THEN vol ELSE 0.0 END) /
        | greatest(SUM(CASE WHEN isCall THEN oi ELSE 0.0 END), 1.0), 4) AS call_vol_oi,
        |CAST(SUM(CASE WHEN isCall AND vol > greatest(oi*0.5, 10.0) THEN 1 ELSE 0 END) AS BIGINT) AS call_active,
        |round(SUM(CASE WHEN isCall AND vol > oi THEN (vol-oi)*mid*100 ELSE 0.0 END), 4) AS call_uoa
        |FROM c GROUP BY l_suppkey),
        |atm AS (SELECT l_suppkey, round(l_tax, 4) AS atm_tax FROM (
        |SELECT l_suppkey, l_tax, ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |ORDER BY abs(l_extendedprice - 30000), l_orderkey, l_linenumber) AS rn
        |FROM c WHERE isCall) WHERE rn = 1)
        |SELECT agg.*, atm.atm_tax FROM agg LEFT JOIN atm USING (l_suppkey)""".stripMargin,
    "q63_score_f18" ->
      """WITH c AS (SELECT l_suppkey, l_linestatus = 'O' AS isCall, l_quantity AS vol,
        |l_discount*1000 AS oi, l_extendedprice/100 AS mid FROM lineitem),
        |m AS (SELECT l_suppkey,
        |round(SUM(CASE WHEN isCall THEN vol*mid*100 ELSE 0.0 END), 4) AS call_dv,
        |round(SUM(CASE WHEN NOT isCall THEN vol*mid*100 ELSE 0.0 END), 4) AS put_dv,
        |round(SUM(CASE WHEN isCall THEN vol ELSE 0.0 END) /
        | greatest(SUM(CASE WHEN isCall THEN oi ELSE 0.0 END), 1.0), 4) AS voloi,
        |CAST(SUM(CASE WHEN isCall AND vol > greatest(oi*0.5, 10.0) THEN 1 ELSE 0 END) AS BIGINT) AS active,
        |round(SUM(CASE WHEN isCall AND vol > oi THEN (vol-oi)*mid*100 ELSE 0.0 END), 4) AS uoa
        |FROM c GROUP BY l_suppkey),
        |mom AS (SELECT l_suppkey, AVG(l_discount)*100 - 5.0 AS chg FROM lineitem GROUP BY l_suppkey),
        |j AS (SELECT m.*, mom.chg, chg > 0 AS bull,
        |call_dv / greatest(put_dv, 1.0) AS skew_up, put_dv / greatest(call_dv, 1.0) AS skew_dn,
        |(chg > 0 AND put_dv > call_dv*2 AND put_dv > 1000000) AS div_bear,
        |(chg <= 0 AND call_dv > put_dv*2 AND call_dv > 1000000) AS div_bull
        |FROM m JOIN mom ON m.l_suppkey = mom.l_suppkey),
        |s AS (SELECT l_suppkey, bull, div_bear, div_bull, chg,
        |CASE WHEN call_dv + put_dv > 100000 THEN
        | CASE WHEN bull AND call_dv > 0 THEN (CASE WHEN skew_up > 3.0 THEN 2 WHEN skew_up > 1.5 THEN 1 ELSE 0 END)
        | WHEN NOT bull AND put_dv > 0 THEN (CASE WHEN skew_dn > 3.0 THEN 2 WHEN skew_dn > 1.5 THEN 1 ELSE 0 END)
        | ELSE 0 END ELSE 0 END AS s1,
        |CASE WHEN voloi > 2.0 THEN 2 WHEN voloi > 0.8 THEN 1 ELSE 0 END AS s2,
        |CASE WHEN active >= 5 THEN 2 WHEN active >= 3 THEN 1 ELSE 0 END AS s3,
        |CASE WHEN uoa > 2000000 THEN 2 WHEN uoa > 500000 THEN 1 ELSE 0 END AS s4,
        |CASE WHEN abs(chg) > 1.5 THEN 1 ELSE 0 END AS s5,
        |CASE WHEN div_bear OR div_bull THEN 1 ELSE 0 END AS s6 FROM j)
        |SELECT l_suppkey, CAST(s1+s2+s3+s4+s5+s6 AS INT) AS score,
        |CASE WHEN div_bear THEN 'BEARISH' WHEN div_bull THEN 'BULLISH'
        | WHEN bull THEN 'BULLISH' ELSE 'BEARISH' END AS direction,
        |array_to_string(list_filter([
        | CASE WHEN s1 > 0 THEN 'SKEW' END, CASE WHEN s2 > 0 THEN 'VOLOI' END,
        | CASE WHEN s3 > 0 THEN 'STRIKES' END, CASE WHEN s4 > 0 THEN 'UOA' END,
        | CASE WHEN s5 > 0 THEN 'MOMENTUM' END, CASE WHEN s6 > 0 THEN 'DIVERGENCE' END],
        | x -> x IS NOT NULL), '|') AS signals FROM s""".stripMargin,
    "q50_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |substring(p_name, 1, 8) AS prefix8, lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
        |concat_ws('_', p_brand, p_type) AS brand_type, CAST(length(p_name) AS INT) AS name_len
        |FROM part""".stripMargin,
    "q51_occ_key" ->
      """WITH o AS (SELECT o_orderkey, concat('O:', o_orderstatus, strftime(o_orderdate, '%y%m%d'),
        |CASE WHEN o_totalprice>150000 THEN 'C' ELSE 'P' END,
        |lpad(CAST(CAST(round(o_totalprice*1000, 0) AS BIGINT) AS VARCHAR), 12, '0')) AS occ
        |FROM orders)
        |SELECT occ, COUNT(*) AS n, MIN(o_orderkey) AS first_key FROM o GROUP BY occ""".stripMargin,
    "q52_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        |CAST(dayofweek(o_orderdate) AS INT) AS dow,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
        |strftime(o_orderdate, '%Y-%m') AS ym, epoch_ms(o_orderdate) AS epoch_ms FROM orders""".stripMargin,
    "q53_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price_r2,
        |abs(l_extendedprice - 30000) AS abs_dev, CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
        |CAST(least(greatest(l_quantity, 10.0), 40.0) AS DOUBLE) AS qty_clamped,
        |CAST(round(CAST(CAST(l_extendedprice / greatest(l_quantity, 1) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS unit_price,
        |CAST(round(CAST(CAST(l_tax / NULLIF(l_discount, 0) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS tax_over_disc FROM lineitem""".stripMargin,
    "q54_score_ladder" ->
      """WITH s AS (SELECT o_orderkey, least(greatest(CAST((
        |CASE WHEN o_totalprice>300000 THEN 2 ELSE 0 END + CASE WHEN o_totalprice>150000 THEN 1 ELSE 0 END +
        |CASE WHEN o_orderpriority='1-URGENT' THEN 2 ELSE 0 END + CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END
        |) AS DOUBLE), 0.0), 10.0) AS score_d,
        |(CASE WHEN o_totalprice>200000 THEN 1 ELSE 0 END +
        |CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END +
        |CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS premium FROM orders)
        |SELECT o_orderkey, CAST(score_d AS INT) AS score, CAST(premium AS INT) AS premium_score,
        |CASE WHEN score_d>=5 THEN 'home_run' WHEN score_d>=3 THEN 'strong' WHEN score_d>=1 THEN 'solid'
        |ELSE 'none' END AS tier, premium>=2 AS is_premium FROM s""".stripMargin,
    "q55_coalesce_chain" ->
      """SELECT l_orderkey, l_linenumber, round(COALESCE(
        |CASE WHEN l_discount>0.05 THEN l_extendedprice END,
        |CASE WHEN l_tax>0.04 THEN (l_extendedprice + l_quantity*1000)/2 END,
        |l_quantity*1000), 4) AS effective_price FROM lineitem""".stripMargin,
    "q56_type_coercion" ->
      """SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_d, p_retailprice AS extracted_price,
        |TRY_CAST(p_brand AS DOUBLE) AS brand_as_num FROM part""".stripMargin,
    "q57_json_extract" ->
      """WITH t AS (SELECT CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS INT) AS k FROM events)
        |SELECT CAST(k % 10 AS INT) AS k_mod, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM t GROUP BY 1""".stripMargin,
    "q58_direction_cond" ->
      """SELECT l_orderkey, l_linenumber, round(CASE WHEN l_returnflag='R' THEN -l_extendedprice
        |ELSE l_extendedprice END, 4) AS signed_price FROM lineitem""".stripMargin,
    "q70_exact_dedup" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |SELECT doc_id, lang, source, n_chars,
        |ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
        |FROM documents) WHERE rn=1""".stripMargin,
    "q71_dup_clusters" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(lower(trim(text))) AS text_md5, COUNT(*) AS n_copies, MIN(doc_id) AS first_doc
        |FROM aug GROUP BY 1 HAVING COUNT(*)>1""".stripMargin,
    "q72_token_stats" ->
      """WITH t AS (SELECT lang,
        |CASE WHEN length(trim(text))=0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |CAST(ceil(length(text)/4.0) AS BIGINT) AS est_bpe,
        |CASE WHEN length(text)=0 THEN 0.0 ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
        | / CAST(length(text) AS DOUBLE) END AS punct,
        |list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), x -> length(x)), 'sum')
        | / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS mwl
        |FROM documents)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |CAST(SUM(est_bpe) AS BIGINT) AS total_est_bpe, round(AVG(punct), 4) AS avg_punct,
        |round(AVG(mwl), 4) AS avg_word_len FROM t GROUP BY lang""".stripMargin,
    "q73_quality_score" ->
      """WITH u AS (SELECT source,
        |CASE WHEN len(string_split_regex(lower(trim(text)), '\s+'))=0 THEN 0.0 ELSE
        | len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> list_contains(
        | ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be'], x)))
        | / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) END AS stop_ratio,
        |CASE WHEN length(trim(text))=0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
        |CASE WHEN length(text)=0 THEN 0.0 ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
        | / CAST(length(text) AS DOUBLE) END AS punct
        |FROM documents),
        |q AS (SELECT source, stop_ratio, round(
        |0.5*(CASE WHEN n_tok>=10 AND n_tok<=10000 THEN 1.0 WHEN n_tok>=3 THEN 0.5 ELSE 0.0 END) +
        |0.25*(CASE WHEN stop_ratio>=0.05 THEN 1.0 ELSE 0.3 END) +
        |0.25*(CASE WHEN punct<=0.2 THEN 1.0 ELSE 0.4 END), 4) AS q FROM u)
        |SELECT source, COUNT(*) AS n_docs, round(AVG(q),4) AS avg_quality,
        |round(AVG(stop_ratio),4) AS avg_stopword_ratio FROM q GROUP BY source""".stripMargin,
    "q74_fingerprint" ->
      """SELECT COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_unique,
        |COUNT(*) AS n_docs FROM documents""".stripMargin,
    "q75_ngram_jaccard" -> ngramJaccardOracle,
    // Same exhaustive exact-Jaccard oracle as q75: the Spark side is the
    // LSH pipeline, so hash equality = recall 1 on the planted fixture
    // (precision 1 by construction: candidates are exact-verified).
    "q85_lsh_recall" -> ngramJaccardOracle,
    // q76: full-corpus variant of the q85 identity — LSH pipeline output
    // must equal the exhaustive exact-Jaccard pair set (recall 1 on this
    // corpus; every natural pair sits at j >= 0.9, see q76's scaladoc).
    "q76_minhash_lsh" -> corpusJaccardOracle,
    // q77: text-identical pairs are a structural fact — equal normalized
    // text => equal fingerprint => band collision => Hamming 0 — so the
    // digest self-join states the full expected set without xxhash64.
    // Digest self-join states EVERY text-identical pair — planted copies
    // AND the corpus's own naturally identical docs (8 such pairs appear
    // at sf0.1; a %10-only enumeration broke there). Identical text =>
    // identical fingerprint => all-band collision => Hamming 0, so the
    // SimHash path must surface exactly this set.
    "q77_simhash" ->
      """WITH f AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS dg FROM f)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
        |FROM d a JOIN d b ON a.dg = b.dg AND a.doc_id < b.doc_id""".stripMargin,
    // q80/q82: saturated ANN == brute force over the second probe set
    // (q80 empirically at 32x3 tables — seeded, fixed per corpus; q82
    // structurally at nProbe = nCells).
    "q80_lsh_ann" -> cosineTopKOracleFor("vec_id >= 5 AND vec_id < 10", 5),
    "q82_ivf_ann" -> cosineTopKOracleFor("vec_id >= 5 AND vec_id < 10", 5),
    "q78_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |sc AS (SELECT doc_id, lang,
        |len(list_filter(toks, x -> list_contains(['the','and','of','to','is'], x)))/CAST(len(toks) AS DOUBLE) AS s_en,
        |len(list_filter(toks, x -> list_contains(['el','la','de','que','y'], x)))/CAST(len(toks) AS DOUBLE) AS s_es,
        |len(list_filter(toks, x -> list_contains(['der','die','und','das','ist'], x)))/CAST(len(toks) AS DOUBLE) AS s_de,
        |len(list_filter(toks, x -> list_contains(['le','la','les','et','est'], x)))/CAST(len(toks) AS DOUBLE) AS s_fr,
        |len(list_filter(toks, x -> list_contains(['de','shi','le','zai','he'], x)))/CAST(len(toks) AS DOUBLE) AS s_zh
        |FROM t),
        |c AS (SELECT doc_id, lang, 'de' AS cl, s_de AS score FROM sc
        |UNION ALL SELECT doc_id, lang, 'en', s_en FROM sc
        |UNION ALL SELECT doc_id, lang, 'es', s_es FROM sc
        |UNION ALL SELECT doc_id, lang, 'fr', s_fr FROM sc
        |UNION ALL SELECT doc_id, lang, 'zh', s_zh FROM sc),
        |b AS (SELECT doc_id, lang, cl, score,
        |ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cl DESC) AS rn FROM c)
        |SELECT lang, CASE WHEN score>0 THEN cl ELSE 'unknown' END AS pred, COUNT(*) AS cnt
        |FROM b WHERE rn=1 GROUP BY 1, 2""".stripMargin,
    "q79_cosine_topk" -> cosineTopKOracle,
    "q83_embedding_dedup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE vec_id < 100)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |round(list_aggregate(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum')) *
        | sqrt(list_aggregate(list_transform(b.v, x -> x*x), 'sum'))), 4) AS cos
        |FROM e a, e b WHERE a.vec_id < b.vec_id
        |AND list_aggregate(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum')) *
        | sqrt(list_aggregate(list_transform(b.v, x -> x*x), 'sum'))) >= 0.2""".stripMargin,
    "q84_bpe_tokens" ->
      """SELECT source,
        |CAST(SUM(len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))) AS BIGINT) AS total_bpe_tokens,
        |CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
        | ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS total_ws_tokens,
        |CAST(SUM(CAST(ceil(length(text)/4.0) AS BIGINT)) AS BIGINT) AS total_len4_estimate
        |FROM documents GROUP BY source""".stripMargin,
    "q86_pii_redact" ->
      """WITH planted AS (SELECT source, text ||
        |(CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END) ||
        |(CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        | || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END) AS text
        |FROM documents),
        |t AS (SELECT source, text,
        |len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
        |len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS phones,
        |regexp_replace(regexp_replace(text,
        | '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        | '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS clean
        |FROM planted)
        |SELECT source, COUNT(*) AS n_docs,
        |CAST(SUM(CASE WHEN emails + phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
        |CAST(SUM(emails) AS BIGINT) AS emails_found,
        |CAST(SUM(phones) AS BIGINT) AS phones_found,
        |CAST(SUM(length(text) - length(clean)) AS BIGINT) AS chars_redacted
        |FROM t GROUP BY source""".stripMargin,
    "q87_vocab" ->
      """WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |FROM documents)
        |SELECT token, COUNT(*) AS freq FROM t GROUP BY token
        |ORDER BY freq DESC, token LIMIT 20""".stripMargin,
    "q88_ngram_contamination" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-3, 1)),
        |i -> array_to_string(list_slice(toks, i, i+4), ' ')))) AS sh FROM t),
        |d AS (SELECT sh, COUNT(DISTINCT doc_id) AS df FROM s GROUP BY sh)
        |SELECT df, COUNT(*) AS n_shingles FROM d GROUP BY df""".stripMargin,
    "q89_decontaminate" -> decontaminationOracle,
    // q110 computes q89 through the bloom-prefilter scale path; semantics
    // (and therefore the oracle) are identical by construction.
    "q110_bloom_decontaminate" -> decontaminationOracle,
    // q90 = q79's exact top-k oracle: IVF probing every cell must equal
    // brute force (assignment/join/re-rank machinery checked cross-engine).
    "q90_ivf_full_probe" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
        |j AS (SELECT p.probe_id, e.vec_id AS corpus_id,
        |list_aggregate(list_transform(list_zip(e.v, p.pv), x -> x[1]*x[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(e.v, x -> x*x), 'sum')) *
        | sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum'))) AS cos
        |FROM e, p WHERE e.vec_id <> p.probe_id),
        |r AS (SELECT probe_id, corpus_id, cos,
        |ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, corpus_id) AS rnk FROM j)
        |SELECT probe_id, CAST(rnk AS INT) AS "rank", corpus_id, round(cos, 4) AS cos
        |FROM r WHERE rnk <= 5""".stripMargin,
    // q116 = the same saturation identity through Lloyd-refined centroids:
    // at nProbe=nCells the candidate set is the full corpus no matter where
    // the centroids sit, so brute-force top-k is the exact oracle.
    "q116_ivf_refined" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id >= 5 AND vec_id < 10),
        |j AS (SELECT p.probe_id, e.vec_id AS corpus_id,
        |list_aggregate(list_transform(list_zip(e.v, p.pv), x -> x[1]*x[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(e.v, x -> x*x), 'sum')) *
        | sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum'))) AS cos
        |FROM e, p WHERE e.vec_id <> p.probe_id),
        |r AS (SELECT probe_id, corpus_id, cos,
        |ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, corpus_id) AS rnk FROM j)
        |SELECT probe_id, CAST(rnk AS INT) AS "rank", corpus_id, round(cos, 4) AS cos
        |FROM r WHERE rnk <= 5""".stripMargin,
    // q117: the decode path (syntheticPng -> javax.imageio -> channel
    // sums) is lossless, so DuckDB replays it as closed-form arithmetic
    // over the 16x12 pixel grid; corrupt every-13th payloads -> null stats.
    // Means are integer-sum / 192.0 — bit-identical division both sides.
    "q117_image_decode" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
        |px AS (SELECT doc_id, t1.x, t2.y FROM ids, range(16) t1(x), range(12) t2(y)),
        |s AS (SELECT doc_id,
        |CAST(SUM((doc_id*31 + x*7 + y*13) % 256) AS BIGINT) AS sr,
        |CAST(SUM((doc_id*31 + x*7 + y*13 + 101) % 256) AS BIGINT) AS sg,
        |CAST(SUM((doc_id*31 + x*7 + y*13 + 202) % 256) AS BIGINT) AS sb
        |FROM px GROUP BY doc_id)
        |SELECT doc_id,
        |CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(16 AS INT) END AS width,
        |CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(12 AS INT) END AS height,
        |CASE WHEN doc_id % 13 = 0 THEN NULL ELSE sr / CAST(192 AS DOUBLE) END AS mean_r,
        |CASE WHEN doc_id % 13 = 0 THEN NULL ELSE sg / CAST(192 AS DOUBLE) END AS mean_g,
        |CASE WHEN doc_id % 13 = 0 THEN NULL ELSE sb / CAST(192 AS DOUBLE) END AS mean_b
        |FROM s""".stripMargin,
    // q118: the oracle replays the whole span pipeline declaratively —
    // positional 15-grams, >=2-distinct-doc census, gaps-and-islands.
    "q118_dup_spans" ->
      """WITH planted AS (SELECT doc_id,
        |CASE WHEN doc_id % 20 = 5 THEN 'alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee ' || text
        |WHEN doc_id % 10 = 3 THEN text || ' alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee'
        |WHEN doc_id % 10 = 7 THEN text || ' uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece catorce quince dieciseis diecisiete dieciocho'
        |ELSE text END AS text FROM documents),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM planted),
        |p AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 13, 1)),
        |i -> struct_pack(pos := i, gram := array_to_string(list_slice(toks, i, i + 14), ' ')))) AS u
        |FROM t WHERE len(toks) >= 15),
        |pos AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM p),
        |d AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM pos) GROUP BY gram HAVING COUNT(*) >= 2),
        |dup AS (SELECT pos.doc_id, pos.pos FROM pos JOIN d USING (gram)),
        |i AS (SELECT doc_id, pos, pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM dup)
        |SELECT doc_id, MIN(pos) AS span_start, COUNT(*) + 14 AS span_tokens
        |FROM i GROUP BY doc_id, island""".stripMargin,
    // q119: q118's spans -> keep-first policy -> token-precise reassembly;
    // md5 equality pins order, boundaries, and the all-masked empty case.
    "q119_span_mask" ->
      """WITH planted AS (SELECT doc_id,
        |CASE WHEN doc_id % 20 = 5 THEN 'alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee ' || text
        |WHEN doc_id % 10 = 3 THEN text || ' alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee'
        |WHEN doc_id % 10 = 7 THEN text || ' uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece catorce quince dieciseis diecisiete dieciocho'
        |ELSE text END AS text FROM documents),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM planted),
        |p AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 13, 1)),
        |i -> struct_pack(pos := i, gram := array_to_string(list_slice(toks, i, i + 14), ' ')))) AS u
        |FROM t WHERE len(toks) >= 15),
        |pos AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM p),
        |d AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM pos) GROUP BY gram HAVING COUNT(*) >= 2),
        |dup AS (SELECT pos.doc_id, pos.pos FROM pos JOIN d USING (gram)),
        |i AS (SELECT doc_id, pos, pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM dup),
        |spans AS (SELECT doc_id, MIN(pos) AS span_start, COUNT(*) + 14 AS span_tokens FROM i GROUP BY doc_id, island),
        |st AS (SELECT s.doc_id, s.span_start, s.span_tokens,
        |array_to_string(list_slice(t.toks, s.span_start, s.span_start + s.span_tokens - 1), ' ') AS span_text
        |FROM spans s JOIN t USING (doc_id)),
        |occ AS (SELECT doc_id, span_start, span_tokens,
        |ROW_NUMBER() OVER (PARTITION BY span_text ORDER BY doc_id, span_start) AS rn FROM st),
        |cov AS (SELECT doc_id, unnest(range(span_start, span_start + span_tokens)) AS pos FROM occ WHERE rn > 1),
        |tokpos AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1), j -> struct_pack(pos := j, tk := toks[CAST(j AS INT)]))) AS u FROM t),
        |tp AS (SELECT doc_id, u.pos AS pos, u.tk AS tk FROM tokpos),
        |kept AS (SELECT tp.doc_id, tp.pos, tp.tk FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos WHERE cov.doc_id IS NULL),
        |agg AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS txt FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, md5(COALESCE(a.txt, '')) AS kept_md5 FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // q120: lossless PCM — the WAV codec round-trip replayed as
    // closed-form sample arithmetic; corrupt every-11th payloads -> null.
    "q120_audio_decode" ->
      """WITH ids AS (SELECT doc_id, 256 + (doc_id % 7) * 64 AS n FROM documents WHERE doc_id < 40),
        |vals AS (SELECT doc_id, unnest(list_transform(range(n), t -> (doc_id*31 + t*7) % 65536 - 32768)) AS v FROM ids),
        |agg AS (SELECT doc_id, COUNT(*) AS n_samples, SUM(v) AS sum_amp, SUM(abs(v)) AS sum_abs FROM vals GROUP BY doc_id)
        |SELECT i.doc_id,
        |CASE WHEN i.doc_id % 11 = 0 THEN NULL ELSE CAST(1 AS INT) END AS channels,
        |CASE WHEN i.doc_id % 11 = 0 THEN NULL ELSE CAST(8000 AS INT) END AS sample_rate,
        |CASE WHEN i.doc_id % 11 = 0 THEN NULL ELSE CAST(a.n_samples AS BIGINT) END AS n_samples,
        |CASE WHEN i.doc_id % 11 = 0 THEN NULL ELSE CAST(a.sum_amp AS BIGINT) END AS sum_amp,
        |CASE WHEN i.doc_id % 11 = 0 THEN NULL ELSE CAST(a.sum_abs AS BIGINT) END AS sum_abs_amp
        |FROM ids i JOIN agg a USING (doc_id)""".stripMargin,
    // q121: in-order fold on both engines (aggregate / list_reduce) makes
    // the double NLL sums bit-identical; OOV floors at freq 1; Spark
    // round-vs-DuckDB round bridged by the VARCHAR->DECIMAL round-trip.
    "q121_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |c AS (SELECT unnest(toks) AS token FROM t),
        |f AS (SELECT token, COUNT(*) AS freq FROM c GROUP BY token),
        |v AS (SELECT token, freq FROM f ORDER BY freq DESC, token LIMIT 1000),
        |n AS (SELECT CAST(SUM(len(toks)) AS DOUBLE) AS n_total FROM t),
        |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1), j -> struct_pack(pos := j, tk := toks[CAST(j AS INT)]))) AS u FROM t),
        |tp AS (SELECT doc_id, u.pos AS pos, u.tk AS tk FROM tok),
        |lp AS (SELECT tp.doc_id, tp.pos, -ln(COALESCE(v.freq, 1) / n.n_total) AS l FROM tp LEFT JOIN v ON tp.tk = v.token, n),
        |lists AS (SELECT doc_id, list(l ORDER BY pos) AS ls FROM lp GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
        |CAST(round(CAST(CAST(list_reduce(ls, (a, b) -> a + b) / len(t.toks) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS mean_nll
        |FROM t JOIN lists USING (doc_id)""".stripMargin,
    // q122: q73's per-doc quality replay + quantile_cont (q10 precedent);
    // the P25 falls on/between the corpus's ~dozen discrete quality
    // levels, where interpolation is exact on both engines.
    "q122_calibrated_gate" ->
      """WITH u AS (SELECT source,
        |CASE WHEN len(string_split_regex(lower(trim(text)), '\s+'))=0 THEN 0.0 ELSE
        | len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> list_contains(
        | ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be'], x)))
        | / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) END AS stop_ratio,
        |CASE WHEN length(trim(text))=0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
        |CASE WHEN length(text)=0 THEN 0.0 ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
        | / CAST(length(text) AS DOUBLE) END AS punct
        |FROM documents),
        |q AS (SELECT source, round(
        |0.5*(CASE WHEN n_tok>=10 AND n_tok<=10000 THEN 1.0 WHEN n_tok>=3 THEN 0.5 ELSE 0.0 END) +
        |0.25*(CASE WHEN stop_ratio>=0.05 THEN 1.0 ELSE 0.3 END) +
        |0.25*(CASE WHEN punct<=0.2 THEN 1.0 ELSE 0.4 END), 4) AS q FROM u),
        |t AS (SELECT quantile_cont(q, 0.25) AS thr FROM q)
        |SELECT source, COUNT(*) AS n_docs,
        |CAST(SUM(CASE WHEN q >= t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |CAST(round(CAST(CAST(MAX(t.thr) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS p25_threshold,
        |CAST(round(CAST(CAST(SUM(CASE WHEN q >= t.thr THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE)
        | AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS kept_rate
        |FROM q, t GROUP BY source""".stripMargin,
    // q123: k smallest 48-bit md5 prefixes per lang; the window replay is
    // the oracle for the bounded-aggregate scale path (q102 precedent).
    "q123_stratified_k" ->
      """WITH r AS (SELECT lang, doc_id,
        |CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS v FROM documents),
        |w AS (SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY v, doc_id) AS rnk FROM r)
        |SELECT lang, CAST(rnk AS BIGINT) AS "rank", doc_id FROM w WHERE rnk <= 4""".stripMargin,
    // q124: integer counts -> double in fixed expression order; ties by
    // token make the top-3 total-ordered; rounding via the round-trip.
    "q124_tfidf_keywords" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tk GROUP BY doc_id, token),
        |d AS (SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tk) GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.token,
        |CAST(tf.tf AS DOUBLE) * (ln(CAST(n.n_docs + 1 AS DOUBLE) / CAST(d.df + 1 AS DOUBLE)) + 1.0) AS tfidf
        |FROM tf JOIN d USING (token), n),
        |w AS (SELECT doc_id, token, tfidf, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk FROM s)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS "rank", token,
        |CAST(round(CAST(CAST(tfidf AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS tfidf
        |FROM w WHERE rnk <= 3""".stripMargin,
    // q125: salting is semantics-preserving by contract, so the plain
    // GROUP BY IS the oracle; DECIMAL sums are order-independent.
    "q125_salted_agg" ->
      """SELECT l_returnflag,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |COUNT(*) AS n_rows FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // q126: element-wise means; avg-of-doubles rounding bridged by the
    // VARCHAR->DECIMAL round-trip (q112 precedent).
    "q126_mean_pool" ->
      """WITH e AS (SELECT label, unnest(list_transform(range(1, len(embedding) + 1),
        |i -> struct_pack(pos := i, v := CAST(embedding[CAST(i AS INT)] AS DOUBLE)))) AS u FROM embeddings)
        |SELECT label, u.pos - 1 AS pos,
        |CAST(round(CAST(CAST(AVG(u.v) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS mean_v,
        |COUNT(*) AS n FROM e GROUP BY label, u.pos""".stripMargin,
    // q127: full-precision centroids -> cosine argmax per vec (tie ->
    // smallest pred on both engines) -> integer confusion census.
    "q127_centroid_eval" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |px AS (SELECT label AS pred, unnest(list_transform(range(1, len(v) + 1),
        |i -> struct_pack(pos := i, cv := v[CAST(i AS INT)]))) AS u FROM e),
        |pooled AS (SELECT pred, u.pos AS pos, AVG(u.cv) AS mean_v FROM px GROUP BY pred, u.pos),
        |cent AS (SELECT pred, list(mean_v ORDER BY pos) AS cvec FROM pooled GROUP BY pred),
        |scored AS (SELECT e.vec_id, e.label, c.pred,
        |list_aggregate(list_transform(list_zip(e.v, c.cvec), x -> x[1]*x[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(e.v, x -> x*x), 'sum')) *
        | sqrt(list_aggregate(list_transform(c.cvec, x -> x*x), 'sum'))) AS cos
        |FROM e, cent c),
        |pick AS (SELECT vec_id, label, pred,
        |ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, pred) AS rn
        |FROM scored WHERE NOT isnan(cos))
        |SELECT label, pred AS pred_label, COUNT(*) AS n
        |FROM pick WHERE rn = 1 GROUP BY label, pred""".stripMargin,
    // q128: full declarative replay — re-line, plant, census by line
    // document frequency, drop > 25% lines, reassemble in line order.
    "q128_boilerplate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, array_to_string(list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS BIGINT)),
        |i -> array_to_string(list_slice(toks, i * 12 + 1, i * 12 + 12), ' ')), chr(10)) AS body FROM t),
        |p1 AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN body || chr(10) || 'subscribe to our newsletter today' ELSE body END AS body FROM b),
        |p2 AS (SELECT doc_id, CASE WHEN doc_id % 4 = 1 THEN 'cookie notice accept all cookies' || chr(10) || body ELSE body END AS text FROM p1),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM p2),
        |tp AS (SELECT doc_id, u.pos AS pos, u.l AS l FROM (SELECT doc_id, unnest(list_transform(range(1, len(arr) + 1),
        |j -> struct_pack(pos := j, l := arr[CAST(j AS INT)]))) AS u FROM ls)),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |hot AS (SELECT l FROM (SELECT l, COUNT(DISTINCT doc_id) AS ldf FROM tp GROUP BY l), n
        |WHERE CAST(ldf AS DOUBLE) > CAST(n_docs AS DOUBLE) * 0.25),
        |kept AS (SELECT tp.doc_id, tp.pos, tp.l FROM tp LEFT JOIN hot ON tp.l = hot.l WHERE hot.l IS NULL),
        |agg AS (SELECT doc_id, COUNT(*) AS n_kept, string_agg(l, chr(10) ORDER BY pos) AS txt FROM kept GROUP BY doc_id)
        |SELECT ls.doc_id, CAST(len(ls.arr) AS BIGINT) AS n_lines,
        |CAST(len(ls.arr) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
        |md5(COALESCE(a.txt, '')) AS kept_md5
        |FROM ls LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "q91_hash_sample" ->
      """WITH t AS (SELECT lang, md5(CAST(doc_id AS VARCHAR)) < '2' AS sampled FROM documents)
        |SELECT lang, COUNT(*) AS n_total,
        |CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |CAST(round(CAST(CAST(AVG(CASE WHEN sampled THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
        | AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS sample_rate
        |FROM t GROUP BY lang""".stripMargin,
    "q92_packing_stats" ->
      """WITH t AS (SELECT len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS n_tok
        |FROM documents),
        |b AS (SELECT n_tok, CASE WHEN n_tok <= 32 THEN 32 WHEN n_tok <= 64 THEN 64
        |WHEN n_tok <= 96 THEN 96 ELSE 128 END AS ctx_bin FROM t)
        |SELECT CAST(ctx_bin AS INT) AS ctx_bin, COUNT(*) AS n_docs,
        |CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |CAST(round(CAST(CAST(AVG(CAST(1.0 AS DOUBLE) - n_tok / CAST(ctx_bin AS DOUBLE))
        | AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS avg_pad_waste
        |FROM b GROUP BY ctx_bin""".stripMargin,
    "q81_embedding_stats" ->
      """SELECT label, COUNT(*) AS n,
        |round(AVG(sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),
        |'sum'))), 4) AS avg_norm FROM embeddings GROUP BY label""".stripMargin,
    // q130: full SemDeDup replay — same planted corpus, smallest-id seed
    // centroids, argmax-cosine assignment (ties -> smallest cell, NaN
    // filtered), within-cell earlier-id drop rule. Cosine is the q127
    // list_aggregate formulation, fold-order-identical to the Spark HOF.
    "q130_semdedup" ->
      """WITH e0 AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |pl AS (SELECT vec_id + 10000 AS vec_id, list_transform(v, x -> x * CAST(1.01 AS DOUBLE) + CAST(0.001 AS DOUBLE)) AS v FROM e0 WHERE vec_id % 15 = 0),
        |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM pl),
        |cent AS (SELECT vec_id AS cell, v AS centroid FROM e ORDER BY vec_id LIMIT 8),
        |sims AS (SELECT e.vec_id, c.cell,
        |list_aggregate(list_transform(list_zip(e.v, c.centroid), z -> z[1]*z[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(e.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(c.centroid, z -> z*z), 'sum'))) AS cos
        |FROM e, cent c),
        |pick AS (SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn FROM sims WHERE NOT isnan(cos)),
        |a AS (SELECT e.vec_id, p.cell, e.v FROM e LEFT JOIN (SELECT vec_id, cell FROM pick WHERE rn = 1) p USING (vec_id)),
        |pr AS (SELECT y.vec_id AS ib,
        |list_aggregate(list_transform(list_zip(x.v, y.v), z -> z[1]*z[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(x.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(y.v, z -> z*z), 'sum'))) AS cos
        |FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |dr AS (SELECT DISTINCT ib FROM pr WHERE NOT isnan(cos) AND cos >= 0.9)
        |SELECT a.vec_id, a.cell, (dr.ib IS NULL) AS kept
        |FROM a LEFT JOIN dr ON a.vec_id = dr.ib""".stripMargin,
    // q475: cell-blocked DBSCAN replay — q130's assignment + pair-stage
    // idioms, then core flags from the (self-counting) neighbor census
    // and a 7-round min-label unroll over core-core edges (diameter is
    // bounded by the planted 6-point blend chains — organic cosines top
    // out ~0.51, far under simMin 0.95) with a LOUD fixpoint guard:
    // labels must be identical in rounds 6 and 7 or the oracle error()s
    // instead of under-merging. Border rows take the MIN cluster among
    // core neighbors; noise stays null.
    // q474: rank-binned t-digest replay — the same census cumsum, the
    // same δ²-bounded integer capacity-ladder lookup per value run
    // (ceil division spelled as (+W-1)//W), centroid-grain sums, and
    // the two pinned double divisions with Spark round parity (the
    // VARCHAR->DECIMAL cast mirrors Java's BigDecimal.valueOf rounding).
    "q474_tdigest" ->
      """WITH b AS (SELECT event_type AS k, CAST(round(value * 100) AS BIGINT) AS x FROM events WHERE value IS NOT NULL),
        |cen AS (SELECT k, x, COUNT(*) AS c FROM b GROUP BY k, x),
        |r AS (SELECT k, x, c,
        |SUM(c) OVER (PARTITION BY k ORDER BY x) AS cum,
        |SUM(c) OVER (PARTITION BY k) AS n FROM cen),
        |t AS (SELECT k, n, c,
        |CAST(len(list_filter(range(0, 16), j ->
        |  list_aggregate(list_transform(range(0, j + 1),
        |    i -> (n * least(i + 1, 16 - i) + 71) // 72), 'sum') <= cum - c)) AS BIGINT) AS ci,
        |CAST(x AS DECIMAL(38,0)) * c AS xc FROM r),
        |g AS (SELECT k, ci, MAX(n) AS n, SUM(c) AS w, CAST(SUM(xc) AS DECIMAL(38,0)) AS s FROM t GROUP BY k, ci),
        |v AS (SELECT k, n, ci, w, s, SUM(w) OVER (PARTITION BY k ORDER BY ci) AS cum FROM g)
        |SELECT k AS event_type, CAST(n AS BIGINT) AS n, ci, CAST(w AS BIGINT) AS w,
        |CAST(round(CAST(CAST(CAST(s AS DOUBLE) / CAST(w AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean,
        |CAST(round(CAST(CAST(CAST(2*cum - w AS DOUBLE) / CAST(2*n AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS q_mid
        |FROM v""".stripMargin,
    "q475_dbscan" -> {
      val base =
        """WITH e0 AS (SELECT CAST(vec_id AS BIGINT) vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |chain AS (SELECT e0.vec_id + 10000*r.k AS vec_id,
          |list_transform(list_zip(v, list_reverse(v)),
          |  z -> (1.0 - r.k/10.0) * z[1] + (r.k/10.0) * z[2]) AS v
          |FROM e0, range(1,6) r(k) WHERE e0.vec_id % 25 = 0),
          |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM chain),
          |cent AS (SELECT vec_id AS cell, v AS centroid FROM e ORDER BY vec_id LIMIT 8),
          |sims AS (SELECT e.vec_id, c.cell,
          |list_aggregate(list_transform(list_zip(e.v, c.centroid), z -> z[1]*z[2]), 'sum') /
          |(sqrt(list_aggregate(list_transform(e.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(c.centroid, z -> z*z), 'sum'))) AS cos
          |FROM e, cent c),
          |pick AS (SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn FROM sims WHERE NOT isnan(cos)),
          |a AS (SELECT e.vec_id AS id, p.cell, e.v FROM e LEFT JOIN (SELECT vec_id, cell FROM pick WHERE rn = 1) p USING (vec_id)),
          |pr AS (SELECT x.id AS ia, y.id AS ib,
          |list_aggregate(list_transform(list_zip(x.v, y.v), z -> z[1]*z[2]), 'sum') /
          |(sqrt(list_aggregate(list_transform(x.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(y.v, z -> z*z), 'sum'))) AS cos
          |FROM a x JOIN a y ON x.cell = y.cell AND x.id < y.id),
          |pg AS (SELECT ia, ib FROM pr WHERE NOT isnan(cos) AND cos >= 0.95),
          |und AS (SELECT ia AS id, ib AS nb FROM pg UNION ALL SELECT ib, ia FROM pg),
          |fl AS (SELECT a.id, a.cell, COALESCE(n.c, 0) + 1 AS n_nbrs FROM a
          |LEFT JOIN (SELECT id, COUNT(*) AS c FROM und GROUP BY id) n USING (id)),
          |core AS (SELECT id FROM fl WHERE n_nbrs >= 4),
          |ce AS (SELECT pg.ia, pg.ib FROM pg JOIN core ca ON pg.ia = ca.id JOIN core cb ON pg.ib = cb.id),
          |edges AS (SELECT ia AS s, ib AS d FROM ce UNION SELECT ib, ia FROM ce),
          |l0 AS (SELECT DISTINCT s AS id, s AS component FROM edges)""".stripMargin
      val rounds = (1 to 7).map { i =>
        s"""l$i AS (SELECT n.id, LEAST(n.component, COALESCE(m.mn, n.component)) AS component
           |FROM l${i - 1} n LEFT JOIN (SELECT ed.d AS id, MIN(l${i - 1}.component) AS mn
           |FROM edges ed JOIN l${i - 1} ON ed.s = l${i - 1}.id GROUP BY ed.d) m USING (id))""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        """,
          |chk AS (SELECT COUNT(*) AS bad FROM l7 JOIN l6 USING (id)
          |WHERE l7.component <> l6.component),
          |clab AS (SELECT c.id, COALESCE(l7.component, c.id) AS cluster
          |FROM core c LEFT JOIN l7 USING (id)),
          |blab AS (SELECT u.id, MIN(cl.cluster) AS bcluster FROM und u JOIN clab cl ON u.nb = cl.id GROUP BY u.id)
          |SELECT fl.id AS vec_id, fl.cell, CAST(fl.n_nbrs AS BIGINT) AS n_nbrs,
          |(cl.id IS NOT NULL) AS is_core,
          |CASE WHEN (SELECT bad FROM chk) > 0
          |  THEN CAST(error('q475 oracle: min-label not converged in 7 rounds - widen the unroll') AS BIGINT)
          |  WHEN cl.id IS NOT NULL THEN cl.cluster ELSE bl.bcluster END AS cluster
          |FROM fl LEFT JOIN clab cl ON fl.id = cl.id LEFT JOIN blab bl ON fl.id = bl.id""".stripMargin
    },
    // q131: Gopher rule-suite replay over the planted corpus. All output
    // columns are counts; the double ratios exist only inside the rule
    // comparisons, computed in the same fixed expression order.
    "q131_gopher" ->
      """WITH t AS (SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS toks0 FROM documents),
        |tr AS (SELECT doc_id, source, CASE WHEN doc_id % 13 = 0 THEN list_slice(toks0, 1, 10) ELSE toks0 END AS toks FROM t),
        |l0 AS (SELECT doc_id, source, list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS BIGINT)),
        |i -> array_to_string(list_slice(toks, i * 12 + 1, i * 12 + 12), ' ')) AS ls FROM tr),
        |l1 AS (SELECT doc_id, source, CASE WHEN doc_id % 11 = 0 THEN list_transform(ls, l -> '- ' || l)
        |WHEN doc_id % 7 = 0 THEN list_transform(ls, l -> l || ' ...') ELSE ls END AS ls FROM l0),
        |d AS (SELECT doc_id, source, CASE WHEN doc_id % 5 = 0 THEN array_to_string(ls, chr(10)) || ' # # # # # # # #'
        |ELSE array_to_string(ls, chr(10)) END AS text FROM l1),
        |m AS (SELECT doc_id, source, lower(trim(text)) AS t,
        |string_split_regex(lower(trim(text)), '\s+') AS words,
        |string_split(lower(trim(text)), chr(10)) AS lines FROM d),
        |x AS (SELECT source,
        |CAST(len(words) AS BIGINT) AS n_words,
        |CAST(list_aggregate(list_transform(words, w -> len(w)), 'sum') AS DOUBLE) / CAST(len(words) AS DOUBLE) AS mwl,
        |CAST(CAST((length(t) - length(replace(t, '#', ''))) AS BIGINT)
        | + CAST((length(t) - length(replace(t, '...', ''))) / 3 AS BIGINT) AS DOUBLE) / CAST(len(words) AS DOUBLE) AS symbol_ratio,
        |CAST(len(list_filter(lines, l -> starts_with(l, '- ') OR starts_with(l, '* '))) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS bullet_frac,
        |CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
        |CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / CAST(len(words) AS DOUBLE) AS alpha_frac,
        |CAST(len(list_filter(words, w -> list_contains(['the','be','to','of','and','that','have','with'], w))) AS BIGINT) AS n_stop
        |FROM m),
        |f AS (SELECT source,
        |(n_words >= 50 AND n_words <= 100000) AS ok_words,
        |(mwl >= 3.0 AND mwl <= 10.0) AS ok_mwl,
        |(symbol_ratio <= 0.1) AS ok_symbol,
        |(bullet_frac <= 0.9) AS ok_bullet,
        |(ellipsis_frac <= 0.3) AS ok_ellipsis,
        |(alpha_frac >= 0.8) AS ok_alpha,
        |(n_stop >= 2) AS ok_stop FROM x)
        |SELECT source, COUNT(*) AS n_docs,
        |CAST(SUM(CASE WHEN ok_words AND ok_mwl AND ok_symbol AND ok_bullet AND ok_ellipsis AND ok_alpha AND ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |CAST(SUM(CASE WHEN ok_words THEN 0 ELSE 1 END) AS BIGINT) AS fail_words,
        |CAST(SUM(CASE WHEN ok_mwl THEN 0 ELSE 1 END) AS BIGINT) AS fail_mwl,
        |CAST(SUM(CASE WHEN ok_symbol THEN 0 ELSE 1 END) AS BIGINT) AS fail_symbol,
        |CAST(SUM(CASE WHEN ok_bullet THEN 0 ELSE 1 END) AS BIGINT) AS fail_bullet,
        |CAST(SUM(CASE WHEN ok_ellipsis THEN 0 ELSE 1 END) AS BIGINT) AS fail_ellipsis,
        |CAST(SUM(CASE WHEN ok_alpha THEN 0 ELSE 1 END) AS BIGINT) AS fail_alpha,
        |CAST(SUM(CASE WHEN ok_stop THEN 0 ELSE 1 END) AS BIGINT) AS fail_stop
        |FROM f GROUP BY source""".stripMargin,
    // q132: paragraph keep-first replay — ROW_NUMBER over (doc_id, pos)
    // replays the min(struct) first-occurrence; reassembly via ordered
    // string_agg (q128 idiom).
    "q132_para_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |l0 AS (SELECT doc_id, list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS BIGINT)),
        |i -> array_to_string(list_slice(toks, i * 12 + 1, i * 12 + 12), ' ')) AS ls FROM t),
        |l1 AS (SELECT doc_id, CASE WHEN doc_id % 6 = 0 THEN list_concat(ls, list_slice(ls, 1, 1)) ELSE ls END AS ls FROM l0),
        |d AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN array_to_string(ls, chr(10)) || chr(10) || 'all rights reserved contact us for details'
        |ELSE array_to_string(ls, chr(10)) END AS text FROM l1),
        |ps AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM d),
        |tp AS (SELECT doc_id, u.pos AS pos, u.p AS p FROM (SELECT doc_id, unnest(list_transform(range(1, len(arr) + 1),
        |j -> struct_pack(pos := j - 1, p := arr[CAST(j AS INT)]))) AS u FROM ps)),
        |occ AS (SELECT doc_id, pos, md5(p) AS digest FROM tp WHERE len(trim(p)) >= 1),
        |fo AS (SELECT digest, doc_id AS fdoc, pos AS fpos FROM (SELECT digest, doc_id, pos,
        |ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id, pos) AS rn FROM occ) WHERE rn = 1),
        |dr AS (SELECT o.doc_id, o.pos FROM occ o JOIN fo ON o.digest = fo.digest
        |WHERE NOT (o.doc_id = fo.fdoc AND o.pos = fo.fpos)),
        |kept AS (SELECT tp.doc_id, tp.pos, tp.p FROM tp LEFT JOIN dr ON tp.doc_id = dr.doc_id AND tp.pos = dr.pos WHERE dr.pos IS NULL),
        |agg AS (SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) AS txt FROM kept GROUP BY doc_id),
        |nd AS (SELECT doc_id, COUNT(*) AS n_dropped FROM dr GROUP BY doc_id)
        |SELECT ps.doc_id, CAST(len(ps.arr) AS BIGINT) AS n_paras,
        |CAST(COALESCE(nd.n_dropped, 0) AS BIGINT) AS n_dropped,
        |md5(COALESCE(agg.txt, '')) AS kept_md5
        |FROM ps LEFT JOIN agg USING (doc_id) LEFT JOIN nd USING (doc_id)""".stripMargin,
    // q133: DSIR replay — bucket censuses, Laplace-smoothed log-ratio
    // table, per-doc in-order fold (the q121 list_reduce pattern; the
    // leading 0.0 accumulator is IEEE-identical to reducing from the
    // first element).
    "q133_dsir" ->
      """WITH t AS (SELECT doc_id, (lang = 'en') AS is_t, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |ex AS (SELECT is_t, unnest(toks) AS tok FROM t),
        |bx AS (SELECT substr(md5(tok), 1, 2) AS b, is_t FROM ex),
        |c AS (SELECT b, COUNT(*) AS n_raw, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_tgt FROM bx GROUP BY b),
        |tot AS (SELECT SUM(n_raw) AS tr, SUM(n_tgt) AS tt FROM c),
        |r AS (SELECT b, ln(CAST(n_tgt + 1 AS DOUBLE) / CAST(tt + 256 AS DOUBLE))
        | - ln(CAST(n_raw + 1 AS DOUBLE) / CAST(tr + 256 AS DOUBLE)) AS lr FROM c, tot),
        |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1), j -> struct_pack(pos := j, tk := toks[CAST(j AS INT)]))) AS u FROM t),
        |tp AS (SELECT doc_id, u.pos AS pos, u.tk AS tk FROM tok),
        |lp AS (SELECT tp.doc_id, tp.pos, COALESCE(r.lr,
        | (SELECT ln(CAST(1 AS DOUBLE) / CAST(tt + 256 AS DOUBLE)) - ln(CAST(1 AS DOUBLE) / CAST(tr + 256 AS DOUBLE)) FROM tot)) AS l
        |FROM tp LEFT JOIN r ON substr(md5(tp.tk), 1, 2) = r.b),
        |lists AS (SELECT doc_id, list(l ORDER BY pos) AS ls FROM lp GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
        |CAST(round(CAST(CAST(list_reduce(ls, (a, b) -> a + b) / len(t.toks) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS weight
        |FROM t JOIN lists USING (doc_id)""".stripMargin,
    // q134: the saturated GK sketch must equal the exact discrete
    // quantiles (quantile_disc) — verified to hold at every fixture SF.
    "q134_gk_quantiles" ->
      """SELECT l_returnflag,
        |quantile_disc(l_quantity, 0.25) AS p25,
        |quantile_disc(l_quantity, 0.50) AS p50,
        |quantile_disc(l_quantity, 0.75) AS p75,
        |quantile_disc(l_quantity, 0.95) AS p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // q135: int8 quantization replay — same global per-dim ranges,
    // floor-coded bytes (floor keeps the double arithmetic IEEE-exact
    // cross-engine), midpoint dequantization, order-free max error.
    "q135_quantize" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |dx AS (SELECT unnest(list_transform(range(1, len(v) + 1), i -> struct_pack(d := i, x := v[CAST(i AS INT)]))) AS u FROM e),
        |dims AS (SELECT u.d AS d, MIN(u.x) AS lo, MAX(u.x) AS hi FROM dx GROUP BY u.d),
        |rg AS (SELECT list(struct_pack(lo := lo, hi := hi) ORDER BY d) AS rng FROM dims),
        |q AS (SELECT e.vec_id, e.v, list_transform(range(1, len(e.v) + 1), i ->
        |CASE WHEN rng[CAST(i AS INT)].hi = rng[CAST(i AS INT)].lo THEN 0
        |ELSE CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
        | floor((v[CAST(i AS INT)] - rng[CAST(i AS INT)].lo) / (rng[CAST(i AS INT)].hi - rng[CAST(i AS INT)].lo) * CAST(256 AS DOUBLE)))) AS INT) END) AS codes
        |FROM e, rg),
        |r AS (SELECT vec_id, v, codes, list_transform(range(1, len(codes) + 1), i ->
        |CASE WHEN rng[CAST(i AS INT)].hi = rng[CAST(i AS INT)].lo THEN rng[CAST(i AS INT)].lo
        |ELSE rng[CAST(i AS INT)].lo + (CAST(codes[CAST(i AS INT)] AS DOUBLE) + CAST(0.5 AS DOUBLE)) * (rng[CAST(i AS INT)].hi - rng[CAST(i AS INT)].lo) / CAST(256 AS DOUBLE) END) AS recon
        |FROM q, rg)
        |SELECT vec_id, md5(array_to_string(codes, ',')) AS codes_md5,
        |CAST(list_aggregate(codes, 'sum') AS BIGINT) AS sum_code,
        |CAST(round(CAST(CAST(list_aggregate(list_transform(list_zip(v, recon), z -> abs(z[1] - z[2])), 'max') AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS max_abs_err
        |FROM r""".stripMargin,
    // q136: exhaustive k-NN + label mismatch replay — the q108 brute-force
    // graph with the hard-negative selection on top.
    "q136_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id < 300),
        |p AS (SELECT a.vec_id AS pid, a.label AS plabel, b.vec_id AS cid, b.label AS clabel,
        |list_aggregate(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(a.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(b.v, z -> z*z), 'sum'))) AS cos
        |FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |ranked AS (SELECT pid, plabel, cid, clabel, cos,
        |ROW_NUMBER() OVER (PARTITION BY pid ORDER BY cos DESC, cid) AS rnk
        |FROM p WHERE NOT isnan(cos)),
        |top AS (SELECT * FROM ranked WHERE rnk <= 5),
        |mism AS (SELECT pid, cid, cos, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY cos DESC, cid) AS hr
        |FROM top WHERE clabel <> plabel),
        |agg AS (SELECT pid, COUNT(*) AS n_hard FROM mism GROUP BY pid)
        |SELECT e.vec_id, e.label, CAST(COALESCE(a.n_hard, 0) AS BIGINT) AS n_hard,
        |h.cid AS hard_id,
        |CAST(round(CAST(CAST(h.cos AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS hard_cos
        |FROM e LEFT JOIN agg a ON e.vec_id = a.pid
        |LEFT JOIN (SELECT pid, cid, cos FROM mism WHERE hr = 1) h ON e.vec_id = h.pid""".stripMargin,
    // q137: KL drift replay — same planted drift, same smoothed bucket
    // grid, bucket-ORDERED list_reduce folds (q121/q133 pattern).
    "q137_source_divergence" ->
      """WITH pl AS (SELECT source, CASE WHEN source = 'src0' THEN text || ' zzqx zzqx zzqx zzqx' ELSE text END AS text FROM documents),
        |t AS (SELECT source AS grp, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok FROM pl),
        |bx AS (SELECT grp, substr(md5(tok), 1, 2) AS b FROM t),
        |cell AS (SELECT grp, b, COUNT(*) AS n FROM bx GROUP BY grp, b),
        |gt AS (SELECT grp, SUM(n) AS g_tot FROM cell GROUP BY grp),
        |ca AS (SELECT b, SUM(n) AS c_n FROM cell GROUP BY b),
        |ct AS (SELECT SUM(c_n) AS c_tot, COUNT(*) AS n_buckets FROM ca),
        |grid AS (SELECT gt.grp, gt.g_tot, ca.b, ca.c_n, ct.c_tot, ct.n_buckets, COALESCE(cell.n, 0) AS n
        |FROM gt CROSS JOIN ca CROSS JOIN ct LEFT JOIN cell ON cell.grp = gt.grp AND cell.b = ca.b),
        |t2 AS (SELECT grp, g_tot, b,
        |CAST(n + 1 AS DOUBLE) / CAST(g_tot + n_buckets AS DOUBLE) AS p_g,
        |CAST(c_n + 1 AS DOUBLE) / CAST(c_tot + n_buckets AS DOUBLE) AS p_c FROM grid),
        |t3 AS (SELECT grp, g_tot, b, p_g * ln(p_g / p_c) AS kl, p_c * ln(p_c / p_g) AS klr FROM t2),
        |lists AS (SELECT grp, MAX(g_tot) AS n_tok, list(kl ORDER BY b) AS lk, list(klr ORDER BY b) AS lr FROM t3 GROUP BY grp)
        |SELECT grp AS source, CAST(n_tok AS BIGINT) AS n_tok,
        |CAST(round(CAST(CAST(list_reduce(lk, (a, x) -> a + x) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS kl,
        |CAST(round(CAST(CAST(list_reduce(lr, (a, x) -> a + x) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS kl_rev
        |FROM lists""".stripMargin,
    // q138: winnowing replay — md5-string gram hashes, window-min
    // selection, distinct, shared census. list_slice is inclusive-stop,
    // Spark slice is (start, LENGTH) — both take exactly w elements.
    "q138_winnow" ->
      """WITH pl AS (SELECT doc_id, CASE WHEN doc_id % 8 = 0
        |THEN text || ' wnnw shared passage alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho'
        |ELSE text END AS text FROM documents),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM pl),
        |g AS (SELECT doc_id, list_transform(range(1, greatest(len(toks) - 3, 0) + 1),
        |i -> md5(array_to_string(list_slice(toks, i, i + 3), ' '))) AS hs FROM t),
        |f AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
        |CASE WHEN len(hs) = 0 THEN CAST([] AS VARCHAR[]) ELSE list_sort(list_distinct(
        |list_transform(range(0, greatest(len(hs) - 8, 0) + 1),
        |j -> list_aggregate(list_slice(hs, j + 1, j + 8), 'min')))) END AS fps FROM g),
        |occ AS (SELECT doc_id, unnest(fps) AS fp FROM f),
        |sh AS (SELECT fp FROM (SELECT fp, COUNT(DISTINCT doc_id) AS d FROM occ GROUP BY fp) WHERE d >= 2),
        |pd AS (SELECT occ.doc_id, COUNT(*) AS n_shared FROM occ JOIN sh USING (fp) GROUP BY occ.doc_id)
        |SELECT f.doc_id, f.n_grams, CAST(len(f.fps) AS BIGINT) AS n_fp,
        |CAST(COALESCE(pd.n_shared, 0) AS BIGINT) AS n_shared_fp
        |FROM f LEFT JOIN pd USING (doc_id)""".stripMargin,
    // q139: bigram-with-backoff replay — per-position joins against the
    // bigram/unigram censuses, pos-ordered list_reduce fold (q121).
    "q139_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |uc AS (SELECT w, COUNT(*) AS c FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
        |ut AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM uc),
        |bc0 AS (SELECT bg, COUNT(*) AS c FROM (SELECT unnest(list_transform(range(1, len(toks)),
        |i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])) AS bg FROM t WHERE len(toks) > 1) GROUP BY bg),
        |bc AS (SELECT bg, c FROM bc0 ORDER BY c DESC, bg LIMIT 300),
        |tp0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |j -> struct_pack(pos := j, w1 := toks[CAST(j AS INT)], w2 := toks[CAST(j + 1 AS INT)]))) AS u
        |FROM t WHERE len(toks) > 1),
        |tp AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM tp0),
        |lp AS (SELECT tp.doc_id, tp.pos,
        |CASE WHEN bc.c IS NOT NULL THEN -ln(bc.c / CAST(COALESCE(u1.c, 1) AS DOUBLE))
        |ELSE -ln(COALESCE(u2.c, 1) / ut.n_total) + ln(CAST(10 AS DOUBLE)) END AS l
        |FROM tp LEFT JOIN bc ON (tp.w1 || ' ' || tp.w2) = bc.bg
        |LEFT JOIN uc u1 ON tp.w1 = u1.w
        |LEFT JOIN uc u2 ON tp.w2 = u2.w, ut),
        |lists AS (SELECT doc_id, list(l ORDER BY pos) AS ls FROM lp GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
        |CASE WHEN len(t.toks) > 1 THEN
        |CAST(round(CAST(CAST(list_reduce(ls, (a, b) -> a + b) / (len(t.toks) - 1) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE)
        |ELSE NULL END AS mean_nll_bi
        |FROM t LEFT JOIN lists USING (doc_id)""".stripMargin,
    // q141: the tiered dedup replay — the q138 winnow stage flags docs,
    // the q118 span stage runs on the flagged subset, both replayed over
    // the q118 planted fixture.
    "q141_tiered_dedup" ->
      """WITH planted AS (SELECT doc_id,
        |CASE WHEN doc_id % 20 = 5 THEN 'alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee ' || text
        |WHEN doc_id % 10 = 3 THEN text || ' alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee'
        |WHEN doc_id % 10 = 7 THEN text || ' uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece catorce quince dieciseis diecisiete dieciocho'
        |ELSE text END AS text FROM documents),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM planted),
        |g AS (SELECT doc_id, list_transform(range(1, greatest(len(toks) - 3, 0) + 1),
        |i -> md5(array_to_string(list_slice(toks, i, i + 3), ' '))) AS hs FROM t),
        |f AS (SELECT doc_id, CASE WHEN len(hs) = 0 THEN CAST([] AS VARCHAR[]) ELSE list_sort(list_distinct(
        |list_transform(range(0, greatest(len(hs) - 8, 0) + 1),
        |j -> list_aggregate(list_slice(hs, j + 1, j + 8), 'min')))) END AS fps FROM g),
        |occ AS (SELECT doc_id, unnest(fps) AS fp FROM f),
        |sh AS (SELECT fp FROM (SELECT fp, COUNT(DISTINCT doc_id) AS d FROM occ GROUP BY fp) WHERE d >= 2),
        |flagged AS (SELECT DISTINCT occ.doc_id FROM occ JOIN sh USING (fp)),
        |p AS (SELECT t.doc_id, unnest(list_transform(range(1, greatest(len(toks) - 13, 1)),
        |i -> struct_pack(pos := i, gram := array_to_string(list_slice(toks, i, i + 14), ' ')))) AS u
        |FROM t JOIN flagged USING (doc_id) WHERE len(toks) >= 15),
        |pos AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM p),
        |d AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM pos) GROUP BY gram HAVING COUNT(*) >= 2),
        |dup AS (SELECT pos.doc_id, pos.pos FROM pos JOIN d USING (gram)),
        |i AS (SELECT doc_id, pos, pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM dup),
        |sp AS (SELECT doc_id, COUNT(*) AS n_spans, SUM(cnt + 14) AS tot
        |FROM (SELECT doc_id, island, COUNT(*) AS cnt FROM i GROUP BY doc_id, island) GROUP BY doc_id)
        |SELECT flagged.doc_id, CAST(COALESCE(sp.n_spans, 0) AS BIGINT) AS n_spans,
        |CAST(COALESCE(sp.tot, 0) AS BIGINT) AS span_tokens_total
        |FROM flagged LEFT JOIN sp USING (doc_id)""".stripMargin,
    // q142: targeted masking replay — q89's fixture, flagged k-gram
    // start positions via join, k-wide shadows, order-preserving
    // reassembly.
    "q142_decontam_mask" ->
      """WITH test AS (SELECT text FROM documents WHERE doc_id < 10),
        |snip AS (SELECT array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), 1, 12), ' ') AS s
        |FROM documents WHERE doc_id = 0),
        |train AS (SELECT doc_id, CASE WHEN doc_id % 13 = 7 AND doc_id < 2000 THEN text || ' ' || snip.s ELSE text END AS text
        |FROM (SELECT doc_id, text FROM documents WHERE doc_id >= 10
        |UNION ALL SELECT doc_id + 2000, text FROM documents WHERE doc_id < 5), snip),
        |tsh AS (SELECT DISTINCT g FROM (SELECT unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
        |i -> array_to_string(list_slice(toks, i, i + 7), ' '))) AS g
        |FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS toks FROM test))),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM train),
        |p AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
        |i -> struct_pack(pos := i, g := array_to_string(list_slice(toks, i, i + 7), ' ')))) AS u FROM t),
        |px AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM p),
        |fl AS (SELECT px.doc_id, px.pos FROM px JOIN tsh ON px.g = tsh.g),
        |fg AS (SELECT doc_id, list(pos ORDER BY pos) AS fp FROM fl GROUP BY doc_id),
        |kx AS (SELECT t.doc_id, t.toks, COALESCE(fg.fp, CAST([] AS BIGINT[])) AS fp
        |FROM t LEFT JOIN fg USING (doc_id)),
        |m AS (SELECT doc_id, len(toks) AS n_tok,
        |list_filter(list_transform(range(1, len(toks) + 1), j ->
        |CASE WHEN len(list_filter(fp, q -> j >= q AND j <= q + 7)) > 0 THEN NULL
        |ELSE toks[CAST(j AS INT)] END), x -> x IS NOT NULL) AS kept FROM kx)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |CAST(n_tok - len(kept) AS BIGINT) AS n_masked,
        |md5(COALESCE(array_to_string(kept, ' '), '')) AS kept_md5 FROM m""".stripMargin,
    // q143: mojibake census replay — same planted artifacts, same
    // character-level length-delta counts.
    "q143_mojibake" ->
      """WITH pl AS (SELECT doc_id, source, text ||
        |CASE WHEN doc_id % 6 = 2 THEN ' cafÃ© naÃ¯ve' ELSE '' END ||
        |CASE WHEN doc_id % 17 = 3 THEN ' bad�token' ELSE '' END AS text FROM documents),
        |x AS (SELECT source,
        |length(text) - length(replace(text, 'Ã', '')) AS n_moji,
        |length(text) - length(replace(text, '�', '')) AS n_repl FROM pl)
        |SELECT source, COUNT(*) AS n_docs,
        |CAST(SUM(CASE WHEN n_moji > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_mojibake,
        |CAST(SUM(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_replacement,
        |CAST(SUM(n_moji) AS BIGINT) AS mojibake_chars,
        |CAST(SUM(n_repl) AS BIGINT) AS replacement_chars
        |FROM x GROUP BY source""".stripMargin,
    // q146: the C4-recipe capstone replay — q131's Gopher metric CTEs
    // on RAW text (minWords = 10), q129's keep-first + census stages.
    "q146_training_e2e" ->
      """WITH corpus AS (SELECT doc_id, lang, text FROM documents
        |UNION ALL SELECT doc_id + 100000, lang, text FROM documents WHERE doc_id % 10 = 0),
        |m AS (SELECT doc_id, lang, lower(trim(text)) AS t,
        |string_split_regex(lower(trim(text)), '\s+') AS words,
        |string_split(lower(trim(text)), chr(10)) AS lines,
        |md5(lower(trim(text))) AS digest FROM corpus),
        |x AS (SELECT doc_id, lang, digest,
        |CAST(len(words) AS BIGINT) AS n_words,
        |CAST(list_aggregate(list_transform(words, w -> len(w)), 'sum') AS DOUBLE) / CAST(len(words) AS DOUBLE) AS mwl,
        |CAST(CAST((length(t) - length(replace(t, '#', ''))) AS BIGINT)
        | + CAST((length(t) - length(replace(t, '...', ''))) / 3 AS BIGINT) AS DOUBLE) / CAST(len(words) AS DOUBLE) AS symbol_ratio,
        |CAST(len(list_filter(lines, l -> starts_with(l, '- ') OR starts_with(l, '* '))) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS bullet_frac,
        |CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
        |CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / CAST(len(words) AS DOUBLE) AS alpha_frac,
        |CAST(len(list_filter(words, w -> list_contains(['the','be','to','of','and','that','have','with'], w))) AS BIGINT) AS n_stop
        |FROM m),
        |f AS (SELECT doc_id, lang, digest, n_words,
        |(n_words >= 10 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0 AND symbol_ratio <= 0.1
        | AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8 AND n_stop >= 2) AS pass FROM x),
        |k AS (SELECT MIN(doc_id) AS doc_id FROM f WHERE pass GROUP BY digest),
        |fi AS (SELECT f2.doc_id FROM f f2 JOIN k USING (doc_id))
        |SELECT f.lang, COUNT(*) AS n_in,
        |CAST(SUM(CASE WHEN f.pass THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
        |CAST(SUM(CASE WHEN fi.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
        |CAST(SUM(CASE WHEN fi.doc_id IS NOT NULL THEN f.n_words ELSE 0 END) AS BIGINT) AS final_tokens
        |FROM f LEFT JOIN fi ON f.doc_id = fi.doc_id GROUP BY f.lang""".stripMargin,
    // q145: the GIF round trip is lossless on 8-level gray palettes, so
    // the per-frame decode replays as pure arithmetic.
    "q145_video_frames" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 30),
        |par AS (SELECT doc_id, CAST(6 + doc_id % 5 AS INT) AS w, CAST(5 + doc_id % 3 AS INT) AS h,
        |CAST(2 + doc_id % 4 AS INT) AS nf FROM ids WHERE doc_id % 9 <> 0),
        |fr AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM par),
        |sel AS (SELECT doc_id, CAST(f AS INT) AS frame_idx, w AS width, h AS height,
        |CAST(list_aggregate(list_transform(range(0, CAST(w * h AS BIGINT)),
        |i -> ((doc_id * 31 + f * 17 + (i % w) * 7 + (i // w) * 13) % 8) * 32), 'sum') AS BIGINT) AS sum_gray
        |FROM fr),
        |corr AS (SELECT doc_id, CAST(NULL AS INT) AS frame_idx, CAST(NULL AS INT) AS width,
        |CAST(NULL AS INT) AS height, CAST(NULL AS BIGINT) AS sum_gray FROM ids WHERE doc_id % 9 = 0)
        |SELECT * FROM sel UNION ALL SELECT * FROM corr""".stripMargin,
    // q147: CDC boundary rule replayed as substr(md5(tok),1,1) <= '1'
    // plus a windowed prefix-sum for chunk ids; chunk = ' '-joined run.
    "q147_cdc_chunks" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM aug),
        |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
        |i -> struct_pack(pos := i, w := toks[CAST(i AS INT)]))) AS u FROM t),
        |f AS (SELECT doc_id, u.pos AS pos, u.w AS w,
        |CASE WHEN substr(md5(u.w), 1, 1) <= '1' THEN 1 ELSE 0 END AS b FROM tok),
        |c AS (SELECT doc_id, pos, w, COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid FROM f),
        |ch AS (SELECT doc_id, cid, string_agg(w, ' ' ORDER BY pos) AS chunk FROM c GROUP BY doc_id, cid),
        |g AS (SELECT md5(chunk) AS digest, CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_tokens,
        |COUNT(*) AS occ FROM ch GROUP BY 1, 2)
        |SELECT chunk_tokens, COUNT(*) AS n_distinct, CAST(SUM(occ) AS BIGINT) AS n_chunks,
        |CAST(SUM(occ) - COUNT(*) AS BIGINT) AS dup_occurrences
        |FROM g GROUP BY chunk_tokens""".stripMargin,
    // q148: sqrt is IEEE-correctly-rounded and the normalizer is an
    // in-order fold over langs, so every pre-round double is bit-equal.
    "q148_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS mass
        |FROM documents GROUP BY lang),
        |t AS (SELECT CAST(SUM(mass) AS BIGINT) AS tot FROM c),
        |s AS (SELECT lang, n_rows, mass, CAST(mass AS DOUBLE) / CAST(tot AS DOUBLE) AS p,
        |sqrt(CAST(mass AS DOUBLE) / CAST(tot AS DOUBLE)) AS w_raw FROM c, t),
        |nr AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(w_raw ORDER BY lang)),
        |(a, x) -> a + x) AS norm FROM s)
        |SELECT lang, n_rows, mass,
        |CAST(round(CAST(CAST(p AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS p,
        |CAST(round(CAST(CAST(w_raw / norm AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS weight,
        |CAST(round(CAST(CAST(1000000.0 * (w_raw / norm) AS VARCHAR) AS DECIMAL(38,20)), 0) AS BIGINT) AS alloc,
        |CAST(round(CAST(CAST((w_raw / norm) / p AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS boost
        |FROM s, nr""".stripMargin,
    // q149: quantization replay (q135's CTEs) then the 8x8 upper-triangle
    // pair grid — all-integer sums, so no float-order caveats at all.
    "q149_quantized_gram" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |dx AS (SELECT unnest(list_transform(range(1, len(v) + 1), i -> struct_pack(d := i, x := v[CAST(i AS INT)]))) AS u FROM e),
        |dims AS (SELECT u.d AS d, MIN(u.x) AS lo, MAX(u.x) AS hi FROM dx GROUP BY u.d),
        |rg AS (SELECT list(struct_pack(lo := lo, hi := hi) ORDER BY d) AS rng FROM dims),
        |q AS (SELECT e.vec_id, list_transform(range(1, len(e.v) + 1), i ->
        |CASE WHEN rng[CAST(i AS INT)].hi = rng[CAST(i AS INT)].lo THEN 0
        |ELSE CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
        | floor((v[CAST(i AS INT)] - rng[CAST(i AS INT)].lo) / (rng[CAST(i AS INT)].hi - rng[CAST(i AS INT)].lo) * CAST(256 AS DOUBLE)))) AS INT) END) AS codes
        |FROM e, rg)
        |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |CAST(SUM(codes[CAST(i + 1 AS INT)] * codes[CAST(j + 1 AS INT)]) AS BIGINT) AS gram,
        |(SELECT COUNT(*) FROM q) AS n_vecs
        |FROM q, range(0, 8) t1(i), range(0, 8) t2(j) WHERE i <= j GROUP BY i, j""".stripMargin,
    // q150: raw (non-distinct) 3-gram counts per source; top-k replayed
    // as row_number over (count DESC, gram ASC).
    "q150_templatedness" ->
      """WITH pl AS (SELECT source, CASE WHEN source = 'src1'
        |THEN text || ' subscribe to our newsletter today' ELSE text END AS text FROM documents),
        |t AS (SELECT source, string_split_regex(lower(trim(text)), '\s+') AS toks FROM pl),
        |g AS (SELECT source, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS gram FROM t),
        |c AS (SELECT source, gram, COUNT(*) AS c FROM g GROUP BY source, gram),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS gram_occurrences,
        |COUNT(*) AS grams_distinct FROM c GROUP BY source),
        |r AS (SELECT source, gram, c, row_number() OVER (PARTITION BY source
        |ORDER BY c DESC, gram) AS rk FROM c),
        |t1 AS (SELECT source, gram AS top_gram, CAST(c AS BIGINT) AS top_c FROM r WHERE rk = 1),
        |t10 AS (SELECT source, CAST(SUM(c) AS BIGINT) AS top10_c FROM r WHERE rk <= 10 GROUP BY source)
        |SELECT tot.source, tot.grams_distinct, tot.gram_occurrences, t1.top_gram,
        |CAST(round(CAST(CAST(CAST(t1.top_c AS DOUBLE) / CAST(tot.gram_occurrences AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS top1_share,
        |CAST(round(CAST(CAST(CAST(t10.top10_c AS DOUBLE) / CAST(tot.gram_occurrences AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS top10_share
        |FROM tot JOIN t1 USING (source) JOIN t10 USING (source)""".stripMargin,
    // q151: first occurrence = min(doc_id) per gram; slice = id // 100.
    "q151_novelty_curve" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 4 = 1),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM aug),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 6, 1)),
        |i -> array_to_string(list_slice(toks, i, i + 7), ' ')))) AS gram FROM t),
        |fo AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram),
        |pr AS (SELECT DISTINCT doc_id // 100 AS slice, gram FROM g),
        |j AS (SELECT pr.slice AS slice, COUNT(*) AS grams_seen,
        |CAST(SUM(CASE WHEN fo.first_doc // 100 = pr.slice THEN 1 ELSE 0 END) AS BIGINT) AS grams_novel
        |FROM pr JOIN fo USING (gram) GROUP BY pr.slice)
        |SELECT slice, grams_seen, grams_novel,
        |CAST(round(CAST(CAST(CAST(grams_novel AS DOUBLE) / CAST(grams_seen AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS novelty_rate
        |FROM j""".stripMargin,
    // q152: long (lang, limit) format; all counts integer, one division.
    "q152_context_fit" ->
      """WITH t AS (SELECT lang, CASE WHEN length(trim(text)) = 0 THEN 0
        |ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok FROM documents),
        |x AS (SELECT lang, unnest([16, 32, 64]) AS lim, n_tok FROM t),
        |a AS (SELECT lang, CAST(lim AS BIGINT) AS "limit", COUNT(*) AS n_docs,
        |CAST(SUM(CASE WHEN n_tok <= lim THEN 1 ELSE 0 END) AS BIGINT) AS docs_fit,
        |CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
        |CAST(SUM(least(n_tok, lim)) AS BIGINT) AS tokens_kept
        |FROM x GROUP BY lang, lim)
        |SELECT lang, "limit", n_docs, docs_fit, tokens_total, tokens_kept,
        |CAST(round(CAST(CAST(CAST(tokens_kept AS DOUBLE) / CAST(tokens_total AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS keep_rate
        |FROM a""".stripMargin,
    // q153: RAW (case-preserving) tokens; anchored RE2-compatible classes.
    "q153_token_composition" ->
      """WITH pl AS (SELECT source, text ||
        |CASE WHEN doc_id % 5 = 2 THEN ' 1,234 42% 3.14' ELSE '' END ||
        |CASE WHEN doc_id % 7 = 3 THEN ' get_user() parse_args(x)' ELSE '' END ||
        |CASE WHEN doc_id % 11 = 5 THEN ' Berlin Tokyo NASA' ELSE '' END AS text FROM documents),
        |tk AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM pl),
        |a AS (SELECT source, COUNT(*) AS n_tokens,
        |CAST(SUM(CASE WHEN regexp_matches(tok, '^[0-9][0-9.,%]*$') THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
        |CAST(SUM(CASE WHEN regexp_matches(tok, '[_(){}]') THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
        |CAST(SUM(CASE WHEN regexp_matches(tok, '^[A-Z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_capitalized
        |FROM tk GROUP BY source)
        |SELECT source, n_tokens, n_numeric, n_code, n_capitalized,
        |CAST(round(CAST(CAST(CAST(n_numeric AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS numeric_share,
        |CAST(round(CAST(CAST(CAST(n_code AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS code_share,
        |CAST(round(CAST(CAST(CAST(n_capitalized AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS capitalized_share
        |FROM a""".stripMargin,
    // q154: md5-uniform (exact /2^48) against round-trip CDF literals —
    // every weight integer, every comparison engine-portable.
    "q154_poisson_bootstrap" ->
      """WITH r AS (SELECT lang, n_chars, doc_id, unnest([0, 1, 2, 3, 4]) AS replicate FROM documents),
        |u AS (SELECT lang, n_chars, replicate,
        |CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(replicate AS VARCHAR)), 1, 12)) AS BIGINT)
        | / 281474976710656.0 AS uu FROM r),
        |w AS (SELECT lang, replicate, n_chars,
        |CASE WHEN uu < 0.36787944117144233 THEN 0 WHEN uu < 0.7357588823428847 THEN 1
        |WHEN uu < 0.9196986029286058 THEN 2 WHEN uu < 0.9810118431238463 THEN 3 ELSE 4 END AS weight FROM u)
        |SELECT lang, CAST(replicate AS INT) AS replicate,
        |CAST(SUM(weight) AS BIGINT) AS n_eff,
        |CAST(SUM(weight * n_chars) AS BIGINT) AS mass_eff
        |FROM w GROUP BY lang, replicate""".stripMargin,
    // q155: star pairs within a digest group are connected, so the
    // transitive closure replays as per-digest windows.
    "q155_quality_canonical" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
        |UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id % 20 = 0),
        |q AS (SELECT doc_id, md5(lower(trim(text))) AS digest,
        |CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) AS quality FROM corpus),
        |g AS (SELECT doc_id, quality, MIN(doc_id) OVER (PARTITION BY digest) AS component FROM q),
        |w AS (SELECT component, doc_id AS keep_id FROM (SELECT component, doc_id,
        |row_number() OVER (PARTITION BY component ORDER BY quality DESC, doc_id) AS rk FROM g) WHERE rk = 1)
        |SELECT g.doc_id, g.component, g.quality, (g.doc_id = w.keep_id) AS kept
        |FROM g JOIN w USING (component)""".stripMargin,
    // q156: replicate-ordered in-order folds for the moments; greatest(,0)
    // guards float cancellation on an all-equal replicate set.
    "q156_bootstrap_ci" ->
      """WITH r AS (SELECT lang, doc_id, unnest([0, 1, 2, 3, 4]) AS replicate FROM documents),
        |u AS (SELECT lang, replicate,
        |CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(replicate AS VARCHAR)), 1, 12)) AS BIGINT)
        | / 281474976710656.0 AS uu FROM r),
        |w AS (SELECT lang, replicate,
        |CASE WHEN uu < 0.36787944117144233 THEN 0 WHEN uu < 0.7357588823428847 THEN 1
        |WHEN uu < 0.9196986029286058 THEN 2 WHEN uu < 0.9810118431238463 THEN 3 ELSE 4 END AS weight FROM u),
        |a AS (SELECT lang, replicate, CAST(SUM(weight) AS BIGINT) AS n_eff FROM w GROUP BY lang, replicate),
        |m AS (SELECT lang, COUNT(*) AS n_replicates,
        |list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(n_eff AS DOUBLE) ORDER BY replicate)), (x, y) -> x + y) AS s1,
        |list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(n_eff AS DOUBLE) * CAST(n_eff AS DOUBLE) ORDER BY replicate)), (x, y) -> x + y) AS s2
        |FROM a GROUP BY lang),
        |f AS (SELECT lang, n_replicates, s1 / CAST(n_replicates AS DOUBLE) AS mean_,
        |sqrt(greatest((s2 - s1 * s1 / CAST(n_replicates AS DOUBLE)) / CAST(n_replicates - 1 AS DOUBLE), 0.0)) AS sd_ FROM m)
        |SELECT lang, n_replicates,
        |CAST(round(CAST(CAST(mean_ AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS mean_n_eff,
        |CAST(round(CAST(CAST(sd_ AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS sd_n_eff,
        |CAST(round(CAST(CAST(mean_ - 1.96 * sd_ AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS ci95_lo,
        |CAST(round(CAST(CAST(mean_ + 1.96 * sd_ AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS ci95_hi
        |FROM f""".stripMargin,
    // q157: entropy via ln(n) - (sum k ln k)/n, the sum folded in char
    // order; the low flag compares the ROUNDED value on both engines.
    "q157_char_entropy" ->
      """WITH pl AS (SELECT doc_id, text ||
        |CASE WHEN doc_id % 8 = 1 THEN ' ' || repeat('z', 400) ELSE '' END AS text FROM documents),
        |cc AS (SELECT doc_id, c, COUNT(*) AS k FROM
        |(SELECT doc_id, unnest(string_split(text, '')) AS c FROM pl) GROUP BY doc_id, c),
        |a AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n, COUNT(*) AS n_distinct_chars,
        |list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE)) ORDER BY c)), (x, y) -> x + y) AS s
        |FROM cc GROUP BY doc_id),
        |e AS (SELECT doc_id, n, n_distinct_chars,
        |CAST(round(CAST(CAST((ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE)) / ln(2.0) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS entropy_bits
        |FROM a)
        |SELECT doc_id, n, n_distinct_chars, entropy_bits, (entropy_bits < 3.0) AS low_entropy FROM e""".stripMargin,
    // q158: q148's weight CTEs over sources; budget = (tot*3)//10 exact;
    // keep-threshold replay via to_hex (uppercase in DuckDB -> lower()).
    "q158_sampling_plan" ->
      """WITH c AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(mass) AS BIGINT) AS tot FROM c),
        |s AS (SELECT source, mass, tot, sqrt(CAST(mass AS DOUBLE) / CAST(tot AS DOUBLE)) AS w_raw FROM c, t),
        |nr AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(w_raw ORDER BY source)), (a, x) -> a + x) AS norm FROM s),
        |pl AS (SELECT source, mass,
        |CAST(round(CAST(CAST(CAST((tot * 3) // 10 AS DOUBLE) * (w_raw / norm) AS VARCHAR) AS DECIMAL(38,20)), 0) AS BIGINT) AS alloc
        |FROM s, nr),
        |r AS (SELECT source, mass, alloc,
        |least(CAST(1.0 AS DOUBLE), CAST(alloc AS DOUBLE) / CAST(mass AS DOUBLE)) AS rate FROM pl),
        |th AS (SELECT source, rate, CAST(floor(rate * 256) AS INT) AS threshold FROM r),
        |k AS (SELECT d.source AS source, COUNT(*) AS k_docs, CAST(SUM(d.n_chars) AS BIGINT) AS k_chars
        |FROM documents d JOIN th ON d.source = th.source
        |WHERE th.threshold >= 256 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < lower(right('00' || to_hex(th.threshold), 2))
        |GROUP BY d.source),
        |nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
        |SELECT nd.source, nd.n_docs, COALESCE(k.k_docs, 0) AS n_kept, COALESCE(k.k_chars, 0) AS chars_kept,
        |CAST(round(CAST(CAST(th.rate AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS target_rate,
        |CAST(round(CAST(CAST(CAST(COALESCE(k.k_docs, 0) AS DOUBLE) / CAST(nd.n_docs AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS achieved_rate
        |FROM nd JOIN th USING (source) LEFT JOIN k USING (source)""".stripMargin,
    // q159: three chained first-after-previous-step min aggregates.
    "q159_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e JOIN v ON e.user_id = v.user_id
        |WHERE e.event_type = 'click' AND e.ts > v.t_view
        |AND epoch_ms(e.ts) - epoch_ms(v.t_view) <= 86400000 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e JOIN c ON e.user_id = c.user_id
        |WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |AND epoch_ms(e.ts) - epoch_ms(c.t_click) <= 86400000 GROUP BY e.user_id),
        |n AS (SELECT (SELECT COUNT(*) FROM v) AS u_view,
        |(SELECT COUNT(*) FROM c) AS u_click, (SELECT COUNT(*) FROM p) AS u_purchase)
        |SELECT CAST(1 AS INT) AS step, 'view' AS event_type, u_view AS users, CAST(NULL AS DOUBLE) AS conversion FROM n
        |UNION ALL SELECT CAST(2 AS INT), 'click', u_click,
        |CAST(round(CAST(CAST(CAST(u_click AS DOUBLE) / CAST(u_view AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) FROM n
        |UNION ALL SELECT CAST(3 AS INT), 'purchase', u_purchase,
        |CAST(round(CAST(CAST(CAST(u_purchase AS DOUBLE) / CAST(u_click AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) FROM n""".stripMargin,
    // q161: equal-width global bins; month halves; smoothed PSI terms.
    "q161_psi_drift" ->
      """WITH b AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
        |bk AS (SELECT CASE WHEN day(ts) <= 15 THEN 'p1' ELSE 'p2' END AS period,
        |least(9, CAST(floor((value - mn) / (mx - mn) * 10) AS BIGINT)) AS bucket FROM events, b),
        |c AS (SELECT bucket,
        |CAST(SUM(CASE WHEN period = 'p1' THEN 1 ELSE 0 END) AS BIGINT) AS n_p1,
        |CAST(SUM(CASE WHEN period = 'p2' THEN 1 ELSE 0 END) AS BIGINT) AS n_p2
        |FROM bk GROUP BY bucket),
        |t AS (SELECT CAST(SUM(n_p1) AS BIGINT) AS t1, CAST(SUM(n_p2) AS BIGINT) AS t2 FROM c),
        |x AS (SELECT bucket, n_p1, n_p2,
        |CAST(n_p1 + 1 AS DOUBLE) / CAST(t1 + 10 AS DOUBLE) AS p,
        |CAST(n_p2 + 1 AS DOUBLE) / CAST(t2 + 10 AS DOUBLE) AS q FROM c, t)
        |SELECT bucket, n_p1, n_p2,
        |CAST(round(CAST(CAST(p AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS p1_share,
        |CAST(round(CAST(CAST(q AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS p2_share,
        |CAST(round(CAST(CAST((p - q) * ln(p / q) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS psi_term
        |FROM x""".stripMargin,
    // q162: the cover array replays with positional list ops — rep flag
    // per gram (seen earlier in the doc), token kept iff no covering
    // repeated gram occurrence.
    "q162_mask_repeated" ->
      """WITH pl AS (SELECT doc_id, CASE WHEN doc_id % 9 = 0 THEN text || ' ' || text ELSE text END AS text FROM documents),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM pl),
        |g AS (SELECT doc_id, toks, list_transform(range(1, greatest(len(toks) - 1, 1)),
        |i -> array_to_string(list_slice(toks, i, i + 2), ' ')) AS grams FROM t),
        |r AS (SELECT doc_id, toks, grams, list_transform(range(1, len(grams) + 1),
        |i -> CASE WHEN list_contains(list_slice(grams, 1, CAST(i - 1 AS INT)), grams[CAST(i AS INT)]) THEN 1 ELSE 0 END) AS rep FROM g),
        |k AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
        |array_to_string(list_filter(toks, (x, j) ->
        |list_aggregate(list_concat([0], list_slice(rep, greatest(j - 2, 1), least(j, len(rep)))), 'max') = 0), ' ') AS kept_text
        |FROM r)
        |SELECT doc_id, n_tok,
        |n_tok - CAST(len(string_split(kept_text, ' ')) AS BIGINT) AS n_masked,
        |md5(kept_text) AS kept_md5 FROM k""".stripMargin,
    // q164: q139's score CTEs, then NTILE(3) over the rounded scores
    // with doc_id tie-break; min/max are order-insensitive on doubles.
    "q164_ppl_buckets" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |uc AS (SELECT w, COUNT(*) AS c FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
        |ut AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM uc),
        |bc0 AS (SELECT bg, COUNT(*) AS c FROM (SELECT unnest(list_transform(range(1, len(toks)),
        |i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])) AS bg FROM t WHERE len(toks) > 1) GROUP BY bg),
        |bc AS (SELECT bg, c FROM bc0 ORDER BY c DESC, bg LIMIT 300),
        |tp0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |j -> struct_pack(pos := j, w1 := toks[CAST(j AS INT)], w2 := toks[CAST(j + 1 AS INT)]))) AS u
        |FROM t WHERE len(toks) > 1),
        |tp AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM tp0),
        |lp AS (SELECT tp.doc_id, tp.pos,
        |CASE WHEN bc.c IS NOT NULL THEN -ln(bc.c / CAST(COALESCE(u1.c, 1) AS DOUBLE))
        |ELSE -ln(COALESCE(u2.c, 1) / ut.n_total) + ln(CAST(10 AS DOUBLE)) END AS l
        |FROM tp LEFT JOIN bc ON (tp.w1 || ' ' || tp.w2) = bc.bg
        |LEFT JOIN uc u1 ON tp.w1 = u1.w
        |LEFT JOIN uc u2 ON tp.w2 = u2.w, ut),
        |lists AS (SELECT doc_id, list(l ORDER BY pos) AS ls FROM lp GROUP BY doc_id),
        |sc AS (SELECT t.doc_id,
        |CAST(round(CAST(CAST(list_reduce(ls, (a, b) -> a + b) / (len(t.toks) - 1) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS nll
        |FROM t JOIN lists USING (doc_id) WHERE len(t.toks) > 1),
        |bkt AS (SELECT d.lang AS lang, sc.nll, NTILE(3) OVER (ORDER BY sc.nll, sc.doc_id) AS bucket
        |FROM sc JOIN documents d USING (doc_id))
        |SELECT lang, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
        |CAST(round(CAST(CAST(MIN(nll) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS nll_min,
        |CAST(round(CAST(CAST(MAX(nll) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS nll_max
        |FROM bkt GROUP BY lang, bucket""".stripMargin,
    // q165: digest-window closure (q155 precedent) + md5-prefix split
    // thresholds on the COMPONENT id (0.8 -> 'cc', 0.9 -> 'e6').
    // q169: 8 unrolled PageRank rounds in FIXED-POINT (scale 10^15)
    // integer arithmetic — `//` floor-division replays Spark's `div` on
    // the all-positive ranks exactly, and integer SUM is associative, so
    // the replay is bit-for-bit at any parallelism (no tolerance; see
    // Graph.pageRank determinism note).
    "q169_pagerank" -> {
      val base =
        """WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
          |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          |edges AS (SELECT c AS src, 1000000 + s AS dst FROM pairs
          |UNION ALL SELECT 1000000 + s, c FROM pairs),
          |outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
          |nodes AS (SELECT DISTINCT src AS node FROM edges),
          |nn AS (SELECT COUNT(*) AS nn FROM nodes),
          |p0 AS (SELECT node, 1000000000000000 // nn.nn AS prf
          |FROM nodes CROSS JOIN nn)""".stripMargin
      val rounds = (1 to 8).map { i =>
        s"""s$i AS (SELECT e.dst AS node, SUM(p.prf // d.od) AS in_mass
           |FROM edges e JOIN p${i - 1} p ON e.src = p.node
           |JOIN outdeg d ON e.src = d.src GROUP BY e.dst),
           |p$i AS (SELECT n.node,
           |CAST(150000000000000 // nn.nn
           | + (85 * COALESCE(s$i.in_mass, 0)) // 100 AS BIGINT) AS prf
           |FROM nodes n CROSS JOIN nn LEFT JOIN s$i ON n.node = s$i.node)""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        """
          |SELECT node,
          |CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END AS kind,
          |CAST(round(CAST(CAST(prf / 1000000000000000.0 AS VARCHAR) AS DECIMAL(38,20)), 10) AS DOUBLE) AS pagerank
          |FROM p8""".stripMargin
    },
    // q168: double row_number islands + per-key lead close the ranges.
    "q168_scd2_history" ->
      """WITH o AS (SELECT o_custkey, o_orderstatus,
        |CAST(o_orderdate AS DATE) AS obs_date, o_orderkey FROM orders),
        |i AS (SELECT o_custkey, o_orderstatus, obs_date,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY obs_date, o_orderkey) AS rn,
        |row_number() OVER (PARTITION BY o_custkey, o_orderstatus
        | ORDER BY obs_date, o_orderkey) AS rng FROM o),
        |r AS (SELECT o_custkey, o_orderstatus, rn - rng AS island,
        |MIN(obs_date) AS valid_from, MAX(obs_date) AS last_seen,
        |COUNT(*) AS n_rows, MIN(rn) AS ord
        |FROM i GROUP BY o_custkey, o_orderstatus, island)
        |SELECT o_custkey, o_orderstatus, valid_from, last_seen, n_rows,
        |lead(valid_from) OVER w AS valid_to,
        |(lead(valid_from) OVER w IS NULL) AS is_current
        |FROM r WINDOW w AS (PARTITION BY o_custkey ORDER BY ord)""".stripMargin,
    // q167: lag/cumsum gaps-and-islands replay; decimal session sums.
    "q167_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events),
        |f AS (SELECT user_id, event_id, ms, value,
        |CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
        |THEN 1 ELSE 0 END AS ns
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s AS (SELECT user_id, ms, value,
        |SUM(ns) OVER (PARTITION BY user_id ORDER BY ms, event_id
        | ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
        |COUNT(*) AS n_events, MIN(ms) AS start_ms, MAX(ms) AS end_ms,
        |MAX(ms) - MIN(ms) AS duration_ms,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // q166: the oracle replays decode → 8x8 block-mean aHash → bands →
    // EXHAUSTIVE Hamming pairs from the closed-form pixel grid; the
    // fixture's band-0-confined, sum-preserving perturbation makes the
    // banded operator equal the exhaustive set (see q166ImagePhashDedup).
    "q166_image_phash" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120 AND doc_id % 29 <> 3),
        |px AS (SELECT doc_id, x, y,
        |(t*t + t) % 256 AS v FROM (SELECT doc_id, x, y,
        |((doc_id % 40)*7919 + (CASE WHEN doc_id >= 80 AND y < 2 AND x < 4
        |  THEN (CASE WHEN x < 2 THEN x + 2 ELSE x - 2 END) ELSE x END)*104729 + y*130363) % 9973 AS t
        |FROM ids, range(16) t1(x), range(16) t2(y))),
        |blk AS (SELECT doc_id, x // 2 AS bx, y // 2 AS by, SUM(v) // 4 AS g
        |FROM px GROUP BY doc_id, bx, by),
        |tot AS (SELECT doc_id, SUM(g) AS s FROM blk GROUP BY doc_id),
        |bits AS (SELECT blk.doc_id, by*8 + bx AS bit,
        |CASE WHEN g*64 > tot.s THEN 1 ELSE 0 END AS b
        |FROM blk JOIN tot ON blk.doc_id = tot.doc_id),
        |bands AS (SELECT doc_id, bit // 16 AS band,
        |CAST(SUM(b * (1 << (bit % 16))) AS BIGINT) AS h
        |FROM bits GROUP BY doc_id, band),
        |ham AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |CAST(SUM(bit_count(xor(a.h, b.h))) AS INT) AS hamming
        |FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 10""".stripMargin,
    "q165_leakfree_split" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
        |g AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS component FROM corpus),
        |s AS (SELECT doc_id, component,
        |CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |WHEN substr(md5(CAST(component AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |ELSE 'test' END AS split FROM g),
        |lk AS (SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaked
        |FROM (SELECT component, COUNT(DISTINCT split) AS ns FROM s GROUP BY component))
        |SELECT s.split, COUNT(*) AS n_docs,
        |CAST(COUNT(DISTINCT s.component) AS BIGINT) AS n_components, lk.leaked
        |FROM s, lk GROUP BY s.split, lk.leaked""".stripMargin,
    // q163: adjacent within-word char pairs, top-20 by (count DESC, pair).
    "q163_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w FROM documents),
        |p AS (SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, CAST(i AS INT), 2))) AS pair
        |FROM w WHERE length(w) >= 2),
        |c AS (SELECT pair, COUNT(*) AS c FROM p GROUP BY pair),
        |r AS (SELECT pair, c, row_number() OVER (ORDER BY c DESC, pair) AS rk FROM c)
        |SELECT CAST(rk AS BIGINT) AS rank, pair, CAST(c AS BIGINT) AS n_occurrences
        |FROM r WHERE rk <= 20""".stripMargin,
    // q160: day-distinct activity joined to first-day cohorts.
    "q160_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |ch AS (SELECT user_id, MIN(d) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT ch.cohort_day, CAST(date_diff('day', ch.cohort_day, ev.d) AS BIGINT) AS day_offset,
        |COUNT(*) AS active_users
        |FROM ev JOIN ch ON ev.user_id = ch.user_id
        |GROUP BY ch.cohort_day, day_offset""".stripMargin,
    // q144: the naive global ordered cumulative sum IS the oracle for
    // the two-phase bucketed prefix.
    "q144_token_budget" ->
      """WITH t AS (SELECT doc_id,
        |CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
        |FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |SUM(n_tok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, CAST(cum AS BIGINT) AS cum_tokens
        |FROM c WHERE cum <= 15000""".stripMargin,
    // q170: the oracle rebuilds the WHOLE 4x512 Count-Min sketch from
    // exact token counts — md5-derived cells, integer sums, integer min —
    // so the estimates (including genuine collisions) replay bit-for-bit.
    "q170_cms_counts" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok FROM documents),
        |cells AS (SELECT tok, i,
        |CAST(('0x' || substr(md5(tok || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 512 AS cell
        |FROM toks, range(4) r(i)),
        |sketch AS (SELECT i, cell, CAST(COUNT(*) AS BIGINT) AS c FROM cells GROUP BY i, cell),
        |probes AS (SELECT DISTINCT tok FROM toks WHERE doc_id < 3),
        |pc AS (SELECT p.tok, r.i,
        |CAST(('0x' || substr(md5(p.tok || ':' || CAST(r.i AS VARCHAR)), 1, 8)) AS BIGINT) % 512 AS cell
        |FROM probes p, range(4) r(i)),
        |est AS (SELECT pc.tok, MIN(COALESCE(s.c, 0)) AS cms_count
        |FROM pc LEFT JOIN sketch s ON pc.i = s.i AND pc.cell = s.cell GROUP BY pc.tok),
        |ex AS (SELECT t.tok, CAST(COUNT(*) AS BIGINT) AS true_count
        |FROM toks t JOIN probes USING (tok) GROUP BY t.tok)
        |SELECT est.tok, est.cms_count, ex.true_count,
        |est.cms_count - ex.true_count AS overcount
        |FROM est JOIN ex ON est.tok = ex.tok""".stripMargin,
    // q171: priority-sampling order replays as ROW_NUMBER over (u/w,
    // doc_id) — u is a 48-bit md5 prefix (exact in a double), u/w one
    // IEEE division, so both engines sort the identical key.
    "q171_priority_sample" ->
      """WITH r AS (SELECT doc_id, n_chars, source,
        |CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS DOUBLE)
        | / CAST(n_chars AS DOUBLE) AS key
        |FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |w AS (SELECT doc_id, n_chars, source,
        |ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rnk FROM r)
        |SELECT CAST(rnk AS BIGINT) AS "rank", doc_id, n_chars, source
        |FROM w WHERE rnk <= 30""".stripMargin,
    // q172: q135's quantization CTEs feed integer moment sums; mean/sd
    // replay in the same expression shape (correctly-rounded ops only),
    // outlier threshold compares unrounded doubles on both engines.
    "q172_dim_standardize" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |dx AS (SELECT unnest(list_transform(range(1, len(v) + 1), i -> struct_pack(d := i, x := v[CAST(i AS INT)]))) AS u FROM e),
        |dims AS (SELECT u.d AS d, MIN(u.x) AS lo, MAX(u.x) AS hi FROM dx GROUP BY u.d),
        |rg AS (SELECT list(struct_pack(lo := lo, hi := hi) ORDER BY d) AS rng FROM dims),
        |q AS (SELECT e.vec_id, list_transform(range(1, len(e.v) + 1), i ->
        |CASE WHEN rng[CAST(i AS INT)].hi = rng[CAST(i AS INT)].lo THEN 0
        |ELSE CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
        | floor((v[CAST(i AS INT)] - rng[CAST(i AS INT)].lo) / (rng[CAST(i AS INT)].hi - rng[CAST(i AS INT)].lo) * CAST(256 AS DOUBLE)))) AS INT) END) AS codes
        |FROM e, rg),
        |cells AS (SELECT u.d AS d, u.c AS c FROM (SELECT unnest(list_transform(range(1, len(codes) + 1),
        |i -> struct_pack(d := i - 1, c := codes[CAST(i AS INT)]))) AS u FROM q)),
        |st AS (SELECT d, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s,
        |CAST(SUM(CAST(c AS BIGINT) * CAST(c AS BIGINT)) AS BIGINT) AS ss FROM cells GROUP BY d),
        |m AS (SELECT d, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |sqrt(greatest(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
        | - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), CAST(0.0 AS DOUBLE))) AS sd
        |FROM st),
        |o AS (SELECT cells.d AS d, CAST(SUM(CASE WHEN abs(CAST(c AS DOUBLE) - mean) > CAST(3.0 AS DOUBLE) * sd THEN 1 ELSE 0 END) AS BIGINT) AS n_out3
        |FROM cells JOIN m USING (d) GROUP BY cells.d)
        |SELECT CAST(m.d AS BIGINT) AS d, CAST(m.n AS BIGINT) AS n,
        |CAST(round(CAST(CAST(m.mean AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS code_mean,
        |CAST(round(CAST(CAST(m.sd AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS code_sd,
        |o.n_out3
        |FROM m JOIN o USING (d)""".stripMargin,
    // q173: RE2 spells the script classes \p{Latin}/... (Java: IsLatin);
    // counts via strip-and-measure; same planted suffixes, precedence
    // CASE, integer sums.
    "q173_script_census" ->
      """WITH p0 AS (SELECT doc_id, lang, CASE WHEN doc_id % 13 = 0 THEN repeat('机器学习模型训练数据 ', 5) ELSE text END AS text FROM documents),
        |p1 AS (SELECT doc_id, lang, CASE WHEN doc_id % 5 = 0 THEN text || ' 机器学习模型训练数据' ELSE text END AS text FROM p0),
        |p2 AS (SELECT doc_id, lang, CASE WHEN doc_id % 7 = 0 THEN text || ' обучение модель данные' ELSE text END AS text FROM p1),
        |p3 AS (SELECT doc_id, lang, CASE WHEN doc_id % 11 = 0 THEN text || ' تدريب نموذج بيانات' ELSE text END AS text FROM p2),
        |c AS (SELECT lang,
        |CAST(length(regexp_replace(text, '[^\p{Latin}]', '', 'g')) AS BIGINT) AS lat,
        |CAST(length(regexp_replace(text, '[^\p{Cyrillic}]', '', 'g')) AS BIGINT) AS cyr,
        |CAST(length(regexp_replace(text, '[^\p{Han}]', '', 'g')) AS BIGINT) AS han,
        |CAST(length(regexp_replace(text, '[^\p{Arabic}]', '', 'g')) AS BIGINT) AS ara,
        |CAST(length(text) AS BIGINT) AS total FROM p3),
        |d AS (SELECT *, CASE
        |WHEN lat >= cyr AND lat >= han AND lat >= ara THEN 'latin'
        |WHEN cyr >= han AND cyr >= ara THEN 'cyrillic'
        |WHEN han >= ara THEN 'han' ELSE 'arabic' END AS dominant FROM c)
        |SELECT lang, dominant, COUNT(*) AS n_docs,
        |CAST(SUM(lat) AS BIGINT) AS latin_chars, CAST(SUM(cyr) AS BIGINT) AS cyrillic_chars,
        |CAST(SUM(han) AS BIGINT) AS han_chars, CAST(SUM(ara) AS BIGINT) AS arabic_chars,
        |CAST(SUM(total - lat - cyr - han - ara) AS BIGINT) AS other_chars
        |FROM d GROUP BY lang, dominant""".stripMargin,
    // q174: per-source md5-rank row_number replay of the bounded-cap
    // aggregate (q123's window-replays-TopK precedent).
    "q174_domain_cap" ->
      """WITH corpus AS (SELECT doc_id, source, n_chars FROM documents
        |UNION ALL SELECT doc_id + 300000, 'src_farm', n_chars FROM documents WHERE lang = 'en'),
        |r AS (SELECT doc_id, source, n_chars,
        |ROW_NUMBER() OVER (PARTITION BY source
        | ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT), doc_id) AS rnk
        |FROM corpus),
        |k AS (SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        |FROM r WHERE rnk <= 60 GROUP BY source),
        |t AS (SELECT source, COUNT(*) AS n_docs FROM corpus GROUP BY source)
        |SELECT t.source, t.n_docs, k.n_kept, k.chars_kept,
        |(t.n_docs > k.n_kept) AS capped
        |FROM t JOIN k USING (source)""".stripMargin,
    // q175: same regex signals in RE2 spelling; ratio-of-sums density.
    "q175_code_prose" ->
      """WITH p AS (SELECT source,
        |CASE WHEN doc_id % 17 = 0 THEN 'def f(x): { return x + 1; } import os; var y = f(2); ' || text ELSE text END AS text
        |FROM documents),
        |s AS (SELECT source,
        |CAST(length(regexp_replace(text, '[^{};()=<>\[\]]', '', 'g')) AS BIGINT) AS sym,
        |CAST(len(regexp_extract_all(lower(text), '\b(def|class|import|return|function|var|int|void)\b')) AS BIGINT) AS kw,
        |CAST(length(text) AS BIGINT) AS total FROM p),
        |f AS (SELECT *, (CAST(sym AS DOUBLE) / CAST(total AS DOUBLE) > CAST(0.03 AS DOUBLE) OR kw >= 5) AS is_code FROM s)
        |SELECT source, is_code, COUNT(*) AS n_docs,
        |CAST(SUM(sym) AS BIGINT) AS sym_chars, CAST(SUM(kw) AS BIGINT) AS kw_hits,
        |CAST(round(CAST(CAST(CAST(SUM(sym) AS DOUBLE) / CAST(SUM(total) AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS sym_density
        |FROM f GROUP BY source, is_code""".stripMargin,
    // q176: q85's exhaustive exact-Jaccard pair CTEs + q165's md5 split
    // thresholds ('cc'/'e6'), pairs classified by split agreement.
    "q176_split_leakage" ->
      """WITH aug AS (SELECT doc_id, text FROM documents WHERE doc_id < 40
        |UNION ALL SELECT doc_id + 1000, text || ' graft near dup tail' FROM documents WHERE doc_id < 40),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM aug),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
        |i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS sh FROM t),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS j
        |FROM s a, s b WHERE a.doc_id < b.doc_id),
        |pr AS (SELECT id_a, id_b FROM p WHERE j >= 0.5),
        |sp AS (SELECT doc_id,
        |CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |ELSE 'test' END AS split FROM aug),
        |cls AS (SELECT pr.id_a,
        |CASE WHEN a.split = b.split THEN 'within_' || a.split ELSE 'straddling' END AS kind
        |FROM pr JOIN sp a ON pr.id_a = a.doc_id JOIN sp b ON pr.id_b = b.doc_id)
        |SELECT kind, COUNT(*) AS n_pairs, MIN(id_a) AS first_a
        |FROM cls GROUP BY kind""".stripMargin,
    // q177: exhaustive non-self top-5 (q136's CTEs), then majority by
    // (votes DESC, label ASC).
    "q177_label_audit" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id < 300),
        |p AS (SELECT a.vec_id AS pid, b.vec_id AS cid, b.label AS clabel,
        |list_aggregate(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(a.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(b.v, z -> z*z), 'sum'))) AS cos
        |FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |ranked AS (SELECT pid, cid, clabel, cos,
        |ROW_NUMBER() OVER (PARTITION BY pid ORDER BY cos DESC, cid) AS rnk
        |FROM p WHERE NOT isnan(cos)),
        |v AS (SELECT pid, clabel, COUNT(*) AS votes FROM ranked WHERE rnk <= 5 GROUP BY pid, clabel),
        |m AS (SELECT pid, clabel, votes,
        |ROW_NUMBER() OVER (PARTITION BY pid ORDER BY votes DESC, clabel) AS r FROM v)
        |SELECT e.vec_id, e.label, CAST(m.clabel AS INT) AS maj_label,
        |CAST(m.votes AS BIGINT) AS maj_votes, (e.label = m.clabel) AS agree
        |FROM e JOIN m ON e.vec_id = m.pid AND m.r = 1""".stripMargin,
    // q178: decimal-exact sufficient statistics, closed forms replayed
    // in the identical fixed expression shape (correctly-rounded ops).
    "q178_grouped_ols" ->
      """WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
        |SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(34,4))) AS sx,
        |SUM(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(34,4))) AS sy,
        |SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS DECIMAL(34,4))) AS sxx,
        |SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(34,4))) AS sxy,
        |SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(34,4))) AS syy
        |FROM lineitem GROUP BY l_returnflag),
        |d AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
        |CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
        |CAST(syy AS DOUBLE) AS syyd FROM s),
        |f AS (SELECT l_returnflag, n,
        |(nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd) AS slope,
        |(syd - ((nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd)) * sxd) / nd AS intercept,
        |((nd*sxyd - sxd*syd) * (nd*sxyd - sxd*syd))
        | / ((nd*sxxd - sxd*sxd) * (nd*syyd - syd*syd)) AS r2
        |FROM d)
        |SELECT l_returnflag, n,
        |CAST(round(CAST(CAST(slope AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS slope,
        |CAST(round(CAST(CAST(intercept AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS intercept,
        |CAST(round(CAST(CAST(r2 AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS r2
        |FROM f""".stripMargin,
    // q179: q135's quantization -> exhaustive integer Gram -> THREE
    // unrolled power iterations; matvecs are in-order list_reduce folds
    // (matches the driver's left fold), normalizer = max-|x| row via
    // ROW_NUMBER (ties smallest index) — bit-exact doubles end to end.
    "q179_power_iteration" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |dx AS (SELECT unnest(list_transform(range(1, len(v) + 1), i -> struct_pack(d := i, x := v[CAST(i AS INT)]))) AS u FROM e),
        |dims AS (SELECT u.d AS d, MIN(u.x) AS lo, MAX(u.x) AS hi FROM dx GROUP BY u.d),
        |rg AS (SELECT list(struct_pack(lo := lo, hi := hi) ORDER BY d) AS rng FROM dims),
        |q AS (SELECT e.vec_id, list_transform(range(1, len(e.v) + 1), i ->
        |CASE WHEN rng[CAST(i AS INT)].hi = rng[CAST(i AS INT)].lo THEN 0
        |ELSE CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
        | floor((v[CAST(i AS INT)] - rng[CAST(i AS INT)].lo) / (rng[CAST(i AS INT)].hi - rng[CAST(i AS INT)].lo) * CAST(256 AS DOUBLE)))) AS INT) END) AS codes
        |FROM e, rg),
        |cv AS (SELECT vec_id, u.d AS d, u.c AS c FROM (SELECT vec_id, unnest(list_transform(range(1, len(codes) + 1),
        |i -> struct_pack(d := i - 1, c := codes[CAST(i AS INT)]))) AS u FROM q)),
        |g AS (SELECT a.d AS i, b.d AS j, CAST(SUM(CAST(a.c AS BIGINT) * CAST(b.c AS BIGINT)) AS BIGINT) AS g
        |FROM cv a JOIN cv b USING (vec_id) GROUP BY a.d, b.d),
        |gl AS (SELECT i, list(CAST(g AS DOUBLE) ORDER BY j) AS gr FROM g GROUP BY i),
        |v0 AS (SELECT list_transform(range(1, 65), x -> CAST(1.0 AS DOUBLE)) AS vl),
        |m1 AS (SELECT i, list_reduce(list_transform(range(1, 65), k -> gr[CAST(k AS INT)] * vl[CAST(k AS INT)]), (a, b) -> a + b) AS x FROM gl, v0),
        |s1 AS (SELECT x AS sc FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY abs(x) DESC, i) AS rn FROM m1) WHERE rn = 1),
        |v1 AS (SELECT list(x / sc ORDER BY i) AS vl FROM m1, s1),
        |m2 AS (SELECT i, list_reduce(list_transform(range(1, 65), k -> gr[CAST(k AS INT)] * vl[CAST(k AS INT)]), (a, b) -> a + b) AS x FROM gl, v1),
        |s2 AS (SELECT x AS sc FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY abs(x) DESC, i) AS rn FROM m2) WHERE rn = 1),
        |v2 AS (SELECT list(x / sc ORDER BY i) AS vl FROM m2, s2),
        |m3 AS (SELECT i, list_reduce(list_transform(range(1, 65), k -> gr[CAST(k AS INT)] * vl[CAST(k AS INT)]), (a, b) -> a + b) AS x FROM gl, v2),
        |s3 AS (SELECT x AS sc FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY abs(x) DESC, i) AS rn FROM m3) WHERE rn = 1)
        |SELECT CAST(i AS BIGINT) AS d,
        |CAST(round(CAST(CAST(x / sc AS VARCHAR) AS DECIMAL(38,20)), 8) AS DOUBLE) AS loading
        |FROM m3, s3""".stripMargin,
    // q180: integer sufficient statistics per lang; Welch t in the same
    // fixed expression shape; 'en' baseline row as a scalar CTE.
    "q180_welch_test" ->
      """WITH s AS (SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS s,
        |CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss FROM documents GROUP BY lang),
        |d AS (SELECT lang, n, CAST(n AS DOUBLE) AS nd,
        |CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        | / (CAST(n AS DOUBLE) - 1.0) AS v FROM s),
        |b AS (SELECT nd AS nd0, mean AS mean0, v AS v0 FROM d WHERE lang = 'en'),
        |f AS (SELECT lang, n, mean, (mean - mean0) / sqrt(v / nd + v0 / nd0) AS t FROM d, b)
        |SELECT lang, n,
        |CAST(round(CAST(CAST(mean AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS mean_chars,
        |CAST(round(CAST(CAST(t AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS t_vs_en,
        |(abs(t) > 1.96) AS significant FROM f""".stripMargin,
    // q181: lift = cxy*N/(cx*cy) — two correctly-rounded ops over exact
    // counts; ranks replay as ROW_NUMBER over (lift DESC, bigram).
    "q181_collocations" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |u AS (SELECT w, COUNT(*) AS c FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
        |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM u),
        |bp0 AS (SELECT unnest(list_transform(range(1, len(toks)),
        |i -> struct_pack(w1 := toks[CAST(i AS INT)], w2 := toks[CAST(i + 1 AS INT)]))) AS p
        |FROM t WHERE len(toks) > 1),
        |bp AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM bp0),
        |bc AS (SELECT w1, w2, COUNT(*) AS cxy FROM bp GROUP BY w1, w2 HAVING COUNT(*) >= 5),
        |l AS (SELECT bc.w1 || ' ' || bc.w2 AS bigram, bc.cxy,
        |(CAST(bc.cxy AS DOUBLE) * CAST(nt.n_total AS DOUBLE))
        | / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |FROM bc JOIN u u1 ON bc.w1 = u1.w JOIN u u2 ON bc.w2 = u2.w, nt),
        |r AS (SELECT bigram, cxy, lift, ROW_NUMBER() OVER (ORDER BY lift DESC, bigram) AS rk FROM l)
        |SELECT CAST(rk AS BIGINT) AS "rank", bigram, CAST(cxy AS BIGINT) AS cxy,
        |CAST(round(CAST(CAST(lift AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS lift
        |FROM r WHERE rk <= 20""".stripMargin,
    // q182: identical cumulative-mass window; integral weights keep the
    // crossing exact.
    "q182_weighted_median" ->
      """WITH c AS (SELECT l_returnflag, l_extendedprice, l_quantity,
        |SUM(l_quantity) OVER (PARTITION BY l_returnflag
        | ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cum,
        |SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
        |FROM lineitem)
        |SELECT l_returnflag,
        |CAST(round(CAST(CAST(MIN(l_extendedprice) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS weighted_median,
        |CAST(MAX(tot) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot GROUP BY l_returnflag""".stripMargin,
    // q183: the register build, the ALL-merge, and the estimator all
    // replay as string/integer ops plus exact power-of-two double sums;
    // every literal is CAST to DOUBLE so DuckDB does not slip into
    // DECIMAL arithmetic.
    "q183_hll_distinct" ->
      """WITH o AS (SELECT strftime(o_orderdate, '%Y') AS year, o_custkey FROM orders),
        |r AS (SELECT year,
        |  CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ':r'), 1, 4)) AS BIGINT) % 256 AS reg,
        |  LEAST(4 * length(regexp_extract(substr(md5(CAST(o_custkey AS VARCHAR) || ':q'), 1, 12), '^0*')) +
        |    CASE substr(substr(md5(CAST(o_custkey AS VARCHAR) || ':q'), 1, 12),
        |           length(regexp_extract(substr(md5(CAST(o_custkey AS VARCHAR) || ':q'), 1, 12), '^0*')) + 1, 1)
        |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
        |      ELSE 0 END + 1, 40) AS rank
        |FROM o),
        |mx AS (SELECT year, reg, MAX(rank) AS max_rank FROM r GROUP BY 1, 2),
        |u AS (SELECT * FROM mx
        |  UNION ALL SELECT 'ALL' AS year, reg, MAX(max_rank) AS max_rank FROM mx GROUP BY 2),
        |est AS (SELECT year, COUNT(*) AS nonempty,
        |  (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
        |    * CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE) /
        |    ((CAST(256.0 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)) +
        |     SUM(CAST(1.0 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << CAST(max_rank AS INT)) AS DOUBLE))) AS e
        |FROM u GROUP BY 1),
        |tru AS (SELECT year, COUNT(DISTINCT o_custkey) AS true_distinct FROM o GROUP BY 1
        |  UNION ALL SELECT 'ALL', COUNT(DISTINCT o_custkey) FROM o)
        |SELECT est.year AS year, CAST(nonempty AS BIGINT) AS nonempty,
        |  CAST(round(CAST(CAST(e AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS hll_estimate,
        |  CAST(true_distinct AS BIGINT) AS true_distinct
        |FROM est JOIN tru ON est.year = tru.year""".stripMargin,
    // q184: rebuild the same messy URLs from doc_id and replay every
    // canonicalization rule (RE2-safe regexes, binary-sorted params).
    "q184_url_canon" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN 'News.Example.com'
        |        WHEN doc_id % 4 = 1 THEN 'www.news.example.com'
        |        WHEN doc_id % 4 = 2 THEN 'news.example.com:443'
        |        ELSE 'Blog.Other.org' END) ||
        |  '/art/' || CAST(doc_id % 40 AS VARCHAR) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=rss&id=' || CAST(doc_id % 40 AS VARCHAR)
        |        WHEN doc_id % 5 = 1 THEN '?id=' || CAST(doc_id % 40 AS VARCHAR) || '&utm_medium=email'
        |        WHEN doc_id % 5 = 2 THEN '?b=2&a=1'
        |        WHEN doc_id % 5 = 3 THEN '?fbclid=xyz'
        |        ELSE '' END) ||
        |  (CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END) AS url
        | FROM documents),
        |c AS (SELECT url, regexp_replace(url, '#.*$', '') AS nf FROM u),
        |d AS (SELECT url,
        |  lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(regexp_replace(
        |    lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)', 1)),
        |    ':(80|443)$', ''), '^www\.', '') AS host,
        |  regexp_replace(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1),
        |    '/+$', '') AS pathn,
        |  regexp_extract(nf, '\?(.*)$', 1) AS qs
        | FROM c),
        |k AS (SELECT scheme, host, pathn,
        |  list_sort(list_filter(string_split(qs, '&'),
        |    p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)='))) AS kept,
        |  len(list_filter(string_split(qs, '&'),
        |    p -> regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)='))) > 0 AS had_tracking,
        |  regexp_matches(url, '#') AS had_fragment
        | FROM d)
        |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |  CAST(COUNT(DISTINCT scheme || '://' || host || pathn ||
        |    (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END)) AS BIGINT) AS n_canonical,
        |  CAST(SUM(CASE WHEN had_tracking THEN 1 ELSE 0 END) AS BIGINT) AS n_tracked,
        |  CAST(SUM(CASE WHEN had_fragment THEN 1 ELSE 0 END) AS BIGINT) AS n_fragment
        |FROM k GROUP BY host""".stripMargin,
    // q185: list_reduce has no init value, so prepend '' — the first
    // step md5(''||d0) then equals Spark's fold from the '' accumulator.
    "q185_dataset_digest" ->
      """WITH r AS (SELECT md5(CAST(doc_id AS VARCHAR) || chr(1) || text) AS d FROM documents),
        |b AS (SELECT substr(d, 1, 2) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  list_reduce(list_prepend('', list(d ORDER BY d)), (a, x) -> md5(a || x)) AS digest
        | FROM r GROUP BY 1)
        |SELECT bucket, n_rows, digest FROM b
        |UNION ALL
        |SELECT 'ROOT' AS bucket, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        |  list_reduce(list_prepend('', list(digest ORDER BY bucket)), (a, x) -> md5(a || x)) AS digest
        |FROM b""".stripMargin,
    // q186: lower medians via the q182 crossing rule at weight 1; the
    // fence multiplies in the same literal order as the Spark side.
    "q186_mad_outliers" ->
      """WITH n AS (SELECT l_returnflag AS g, l_extendedprice AS v,
        |  l_orderkey, l_linenumber FROM lineitem),
        |c1 AS (SELECT g, v,
        |  SUM(1) OVER (PARTITION BY g ORDER BY v, l_orderkey, l_linenumber) AS cum,
        |  SUM(1) OVER (PARTITION BY g) AS tot FROM n),
        |med AS (SELECT g, MIN(v) AS median FROM c1 WHERE cum * 2 >= tot GROUP BY g),
        |d AS (SELECT n.g, n.v, abs(n.v - med.median) AS dev,
        |  n.l_orderkey, n.l_linenumber, med.median FROM n JOIN med ON n.g = med.g),
        |c2 AS (SELECT g, dev,
        |  SUM(1) OVER (PARTITION BY g ORDER BY dev, l_orderkey, l_linenumber) AS cum,
        |  SUM(1) OVER (PARTITION BY g) AS tot FROM d),
        |mad AS (SELECT g, MIN(dev) AS mad FROM c2 WHERE cum * 2 >= tot GROUP BY g)
        |SELECT d.g AS l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(d.median) AS median, MIN(mad.mad) AS mad,
        |  CAST(SUM(CASE WHEN d.dev > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN mad ON d.g = mad.g GROUP BY d.g""".stripMargin,
    // q187: string_agg(... ORDER BY doc_id) skips the first posting's
    // null lag gap, matching the Spark side's null-skipping collect_list.
    "q187_inverted_index" ->
      """WITH p AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |p2 AS (SELECT DISTINCT doc_id, token FROM p WHERE token <> ''),
        |kept AS (SELECT token, COUNT(*) AS df FROM p2 GROUP BY token
        |  HAVING COUNT(*) BETWEEN 2 AND 400),
        |g AS (SELECT p2.token, p2.doc_id, kept.df,
        |  p2.doc_id - lag(p2.doc_id) OVER (PARTITION BY p2.token ORDER BY p2.doc_id) AS gap
        | FROM p2 JOIN kept ON p2.token = kept.token)
        |SELECT token, CAST(MAX(df) AS BIGINT) AS df,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  md5(CAST(MIN(doc_id) AS VARCHAR) || ':' ||
        |    COALESCE(string_agg(CAST(gap AS VARCHAR), ',' ORDER BY doc_id), '')) AS postings_md5,
        |  CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap
        |FROM g GROUP BY token""".stripMargin,
    // q188: the q79 exhaustive cosine oracle with the wrong-label filter
    // applied before ranking, exactly as the operator does.
    "q188_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, label AS probe_label, v AS pv FROM e WHERE vec_id < 8),
        |j AS (SELECT p.probe_id, p.probe_label, e.vec_id AS corpus_id, e.label AS neg_label,
        |  list_aggregate(list_transform(list_zip(e.v, p.pv), x -> x[1]*x[2]), 'sum') /
        |  (sqrt(list_aggregate(list_transform(e.v, x -> x*x), 'sum')) *
        |   sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum'))) AS cos
        |FROM e, p WHERE e.label <> p.probe_label),
        |r AS (SELECT probe_id, probe_label, corpus_id, neg_label, cos,
        |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, corpus_id) AS rnk FROM j)
        |SELECT probe_id, probe_label, CAST(rnk AS INT) AS "rank", corpus_id, neg_label,
        |  round(cos, 4) AS cos
        |FROM r WHERE rnk <= 3""".stripMargin,
    // q189: every rule is an integer cross-multiplication; chr(10)
    // stands in for the Scala-side '\n' literal.
    "q189_gopher_rules" ->
      """WITH planted AS (SELECT source,
        |  CASE WHEN doc_id % 11 = 1 THEN text || ' # # # # # # # # # # # #'
        |       WHEN doc_id % 11 = 2 THEN repeat('- item point' || chr(10), 8) || 'tail'
        |       WHEN doc_id % 11 = 3 THEN repeat('watch this...' || chr(10), 5) || 'end'
        |       WHEN doc_id % 11 = 4 THEN repeat('123 456 ', 20)
        |       WHEN doc_id % 11 = 5 THEN repeat('lorem ipsum dolor sit amet ', 10)
        |       WHEN doc_id % 11 = 6 THEN 'too short'
        |       WHEN doc_id % 11 = 7 THEN repeat('extraordinarily incomprehensible ', 15)
        |       ELSE text END AS t
        | FROM documents),
        |m AS (SELECT source,
        |  len(list_filter(string_split_regex(lower(t), '\s+'), w -> w <> '')) AS n_w,
        |  COALESCE(list_aggregate(list_transform(
        |    list_filter(string_split_regex(lower(t), '\s+'), w -> w <> ''),
        |    w -> strlen(w)), 'sum'), 0) AS sum_len,
        |  (strlen(t) - strlen(replace(t, '#', ''))) +
        |    (strlen(t) - strlen(replace(t, '…', ''))) AS n_sym,
        |  len(string_split(t, chr(10))) AS n_lines,
        |  len(list_filter(string_split(t, chr(10)),
        |    l -> regexp_matches(l, '^\s*[-*•]'))) AS n_bullet,
        |  len(list_filter(string_split(t, chr(10)),
        |    l -> regexp_matches(l, '\.\.\.\s*$'))) AS n_ell,
        |  len(list_filter(list_filter(string_split_regex(lower(t), '\s+'), w -> w <> ''),
        |    w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
        |  len(list_intersect(list_distinct(list_filter(string_split_regex(lower(t), '\s+'),
        |    w -> w <> '')), ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that'])) AS n_stop
        | FROM planted),
        |f AS (SELECT source,
        |  (n_w < 20 OR n_w > 100000) AS f_wc,
        |  (sum_len < 3 * n_w OR sum_len > 10 * n_w) AS f_ml,
        |  (n_sym * 10 > n_w) AS f_sym,
        |  (n_bullet * 10 > n_lines * 9) AS f_bul,
        |  (n_ell * 10 > n_lines * 3) AS f_ell,
        |  (n_alpha * 5 < n_w * 4) AS f_al,
        |  (n_stop < 2) AS f_st
        | FROM m)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT) AS f_wordcount,
        |  CAST(SUM(CASE WHEN f_ml THEN 1 ELSE 0 END) AS BIGINT) AS f_meanlen,
        |  CAST(SUM(CASE WHEN f_sym THEN 1 ELSE 0 END) AS BIGINT) AS f_symbol,
        |  CAST(SUM(CASE WHEN f_bul THEN 1 ELSE 0 END) AS BIGINT) AS f_bullet,
        |  CAST(SUM(CASE WHEN f_ell THEN 1 ELSE 0 END) AS BIGINT) AS f_ellipsis,
        |  CAST(SUM(CASE WHEN f_al THEN 1 ELSE 0 END) AS BIGINT) AS f_alpha,
        |  CAST(SUM(CASE WHEN f_st THEN 1 ELSE 0 END) AS BIGINT) AS f_stopword,
        |  CAST(SUM(CASE WHEN NOT f_wc AND NOT f_ml AND NOT f_sym AND NOT f_bul
        |    AND NOT f_ell AND NOT f_al AND NOT f_st THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM f GROUP BY source""".stripMargin,
    // q190: chr() codepoints rebuild the same decomposed/precomposed
    // fixtures; both engines' length() counts codepoints.
    "q190_nfc_census" ->
      """WITH planted AS (SELECT source,
        |  CASE WHEN doc_id % 5 = 1 THEN text || ' cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769)
        |       WHEN doc_id % 5 = 2 THEN text || ' caf' || chr(233) || ' d' || chr(233) || 'j' || chr(224)
        |       WHEN doc_id % 5 = 3 THEN text || ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
        |       ELSE text END AS t
        | FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(SUM(length(t)) AS BIGINT) AS sum_before,
        |  CAST(SUM(length(nfc_normalize(t))) AS BIGINT) AS sum_after
        |FROM planted GROUP BY source""".stripMargin,
    // q191: score discretization mirrors Spark's BigDecimal round via
    // the VARCHAR->DECIMAL trick; both U terms are integer sums.
    "q191_auc" ->
      """WITH p AS (SELECT
        |  CASE WHEN vec_id % 2 = 0 THEN 'even_ids' ELSE 'odd_ids' END AS grp,
        |  (label % 2) AS y,
        |  CAST(round(CAST(CAST(CAST(embedding[1] AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 2) AS DOUBLE) AS s
        | FROM embeddings),
        |c AS (SELECT grp, s,
        |  SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
        |  SUM(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS nn
        | FROM p GROUP BY grp, s),
        |w AS (SELECT grp, s, np, nn,
        |  COALESCE(SUM(nn) OVER (PARTITION BY grp ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
        | FROM c),
        |a AS (SELECT grp, SUM(np) AS n_pos, SUM(nn) AS n_neg,
        |  SUM(np * cum_nn) AS u_strict, SUM(np * nn) AS u_ties
        | FROM w GROUP BY grp)
        |SELECT grp, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  CAST(u_strict AS BIGINT) AS u_strict, CAST(u_ties AS BIGINT) AS u_ties,
        |  CAST(round(CAST(CAST(
        |    (CAST(u_strict AS DOUBLE) + CAST(0.5 AS DOUBLE) * CAST(u_ties AS DOUBLE)) /
        |    (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS auc
        |FROM a""".stripMargin,
    // q192: contingency stays BIGINT to the final division; the row_
    // number replay of the k-bounded heap uses the same (chi2 DESC,
    // token) order.
    "q192_chi_square" ->
      """WITH d0 AS (SELECT (source = 'src1') AS cls,
        |  CASE WHEN source = 'src1' THEN text || ' galleon' ELSE text END AS t
        | FROM documents),
        |tk0 AS (SELECT cls, unnest(list_distinct(list_filter(
        |  string_split_regex(lower(trim(t)), '\s+'), w -> w <> ''))) AS token FROM d0),
        |tot AS (SELECT SUM(CASE WHEN cls THEN 1 ELSE 0 END) AS n1, COUNT(*) AS n FROM d0),
        |cont AS (SELECT token,
        |  SUM(CASE WHEN cls THEN 1 ELSE 0 END) AS a,
        |  SUM(CASE WHEN cls THEN 0 ELSE 1 END) AS b
        | FROM tk0 GROUP BY token),
        |s AS (SELECT token, a, b, tot.n1 - a AS c, tot.n - tot.n1 - b AS d, tot.n AS n
        | FROM cont, tot),
        |x AS (SELECT token, a, b,
        |  CAST(n * (a*d - b*c) * (a*d - b*c) AS DOUBLE) /
        |  CAST((a+b) * (c+d) * (a+c) * (b+d) AS DOUBLE) AS chi2
        | FROM s WHERE (a+b) * (c+d) * (a+c) * (b+d) > 0),
        |r AS (SELECT token, a, b, chi2,
        |  ROW_NUMBER() OVER (ORDER BY chi2 DESC, token) AS rk FROM x)
        |SELECT CAST(rk AS BIGINT) AS "rank", token, CAST(a AS BIGINT) AS a,
        |  CAST(b AS BIGINT) AS b,
        |  CAST(round(CAST(CAST(chi2 AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS chi2
        |FROM r WHERE rk <= 15""".stripMargin,
    // q193: q183's register build + a per-register 3-month range-window
    // max over a densified (month, reg) grid — sketch-union semantics.
    "q193_rolling_hll" ->
      """WITH o AS (SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mnum,
        |  o_custkey FROM orders WHERE year(o_orderdate) BETWEEN 1995 AND 1996),
        |r AS (SELECT mnum,
        |  CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ':r'), 1, 4)) AS BIGINT) % 256 AS reg,
        |  LEAST(4 * length(regexp_extract(substr(md5(CAST(o_custkey AS VARCHAR) || ':q'), 1, 12), '^0*')) +
        |    CASE substr(substr(md5(CAST(o_custkey AS VARCHAR) || ':q'), 1, 12),
        |           length(regexp_extract(substr(md5(CAST(o_custkey AS VARCHAR) || ':q'), 1, 12), '^0*')) + 1, 1)
        |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
        |      ELSE 0 END + 1, 40) AS rank
        |FROM o),
        |mx AS (SELECT mnum, reg, MAX(rank) AS max_rank FROM r GROUP BY 1, 2),
        |months AS (SELECT DISTINCT mnum FROM mx),
        |regsd AS (SELECT DISTINCT reg FROM mx),
        |dense AS (SELECT m.mnum, g.reg, mx.max_rank
        |  FROM months m CROSS JOIN regsd g
        |  LEFT JOIN mx ON mx.mnum = m.mnum AND mx.reg = g.reg),
        |roll AS (SELECT mnum, reg, MAX(max_rank) OVER (PARTITION BY reg ORDER BY mnum
        |  RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS mr FROM dense),
        |u AS (SELECT mnum, reg, mr AS max_rank FROM roll WHERE mr IS NOT NULL),
        |est AS (SELECT mnum, COUNT(*) AS nonempty,
        |  (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
        |    * CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE) /
        |    ((CAST(256.0 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)) +
        |     SUM(CAST(1.0 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << CAST(max_rank AS INT)) AS DOUBLE))) AS e
        |FROM u GROUP BY 1),
        |tru AS (SELECT m.mnum, COUNT(DISTINCT o.o_custkey) AS true_distinct
        |  FROM months m JOIN o ON o.mnum BETWEEN m.mnum - 2 AND m.mnum GROUP BY 1)
        |SELECT CAST(est.mnum AS INTEGER) AS mnum, CAST(nonempty AS BIGINT) AS nonempty,
        |  CAST(round(CAST(CAST(e AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS hll_estimate,
        |  CAST(true_distinct AS BIGINT) AS true_distinct
        |FROM est JOIN tru ON est.mnum = tru.mnum""".stripMargin,
    // q194: DuckDB regexp_replace needs the 'g' flag to match Spark's
    // replace-all default; counts via regexp_extract_all length.
    "q194_pii_scrub" ->
      """WITH planted AS (SELECT source,
        |  CASE WHEN doc_id % 6 = 1 THEN text || ' contact bob.smith+x@ex-ample.org today'
        |       WHEN doc_id % 6 = 2 THEN text || ' call 415-555-1234 now'
        |       WHEN doc_id % 6 = 3 THEN text || ' node at 192.168.0.17 port'
        |       WHEN doc_id % 6 = 4 THEN text || ' mail a@b.io or 10.0.0.1'
        |       ELSE text END AS t
        | FROM documents),
        |m AS (SELECT source, t,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
        |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS scrubbed
        | FROM planted)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_emails) AS BIGINT) AS n_emails,
        |  CAST(SUM(n_phones) AS BIGINT) AS n_phones,
        |  CAST(SUM(n_ips) AS BIGINT) AS n_ips,
        |  CAST(SUM(length(t) - length(scrubbed)) AS BIGINT) AS chars_delta
        |FROM m GROUP BY source""".stripMargin,
    // q195: floor(log2) as a binary-string length — exact on both
    // engines, no transcendental.
    "q195_length_powerlaw" ->
      """SELECT source, CAST(length(bin(n_chars)) - 1 AS BIGINT) AS log2_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars, CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM documents WHERE n_chars >= 1
        |GROUP BY source, length(bin(n_chars)) - 1""".stripMargin,
    // q196: pure integer joins; orientation and the wedge close replay
    // with the same (degree, id) tuple comparisons as the operator.
    "q196_triangles" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
        |e0 AS (SELECT DISTINCT a.s AS u, b.s AS v
        |  FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s),
        |deg AS (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) GROUP BY node),
        |ed AS (SELECT e0.u, e0.v, du.deg AS du, dv.deg AS dv
        |  FROM e0 JOIN deg du ON e0.u = du.node JOIN deg dv ON e0.v = dv.node),
        |o AS (SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS src,
        |  CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS dst,
        |  CASE WHEN (du, u) < (dv, v) THEN dv ELSE du END AS ddeg FROM ed),
        |w AS (SELECT a.src, a.dst AS b, c.dst AS c
        |  FROM o a JOIN o c ON a.src = c.src
        |  WHERE (a.ddeg, a.dst) < (c.ddeg, c.dst)),
        |tri AS (SELECT w.src AS x, w.b AS y, w.c AS z
        |  FROM w JOIN o ON o.src = w.b AND o.dst = w.c),
        |pc AS (SELECT node, COUNT(*) AS t FROM
        |  (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        |   UNION ALL SELECT z FROM tri) GROUP BY node)
        |SELECT deg.node AS s_suppkey, CAST(COALESCE(pc.t, 0) AS BIGINT) AS triangles
        |FROM deg LEFT JOIN pc ON deg.node = pc.node""".stripMargin,
    // q197: the oracle runs the NAIVE inequality self-join; Spark's
    // bucketed equi-join form yields the identical pair set. epoch_ms
    // floors the micro timestamps the same way unix_millis does.
    "q197_interval_overlap" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_ms(ts) AS s,
        |  epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e FROM events),
        |p AS (SELECT a.user_id,
        |  least(a.e, b.e) - greatest(a.s, b.s) AS ov
        |  FROM iv a JOIN iv b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id AND a.s < b.e AND b.s < a.e)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(ov) AS BIGINT) AS overlap_ms,
        |  CAST(MAX(ov) AS BIGINT) AS max_overlap_ms
        |FROM p GROUP BY user_id""".stripMargin,
    // q201: the oracle sweeps each type in ONE global window; the
    // two-phase slice decomposition is equal by prefix-sum associativity.
    // Ends sort before starts at equal t (d=-1 < d=1) = half-open.
    "q201_peak_concurrency" ->
      """WITH iv AS (SELECT event_type, epoch_ms(ts) AS s,
        |  epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e FROM events),
        |b AS (SELECT event_type, s AS t, 1 AS d FROM iv
        |  UNION ALL SELECT event_type, e AS t, -1 AS d FROM iv),
        |r AS (SELECT event_type, SUM(d) OVER (PARTITION BY event_type
        |  ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS run FROM b)
        |SELECT iv.event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(pk.peak AS BIGINT) AS peak_concurrency
        |FROM iv JOIN (SELECT event_type, MAX(run) AS peak FROM r
        |  GROUP BY event_type) pk USING (event_type)
        |GROUP BY iv.event_type, pk.peak""".stripMargin,
    // q198: identical 1-based substring mutations rebuild the variants;
    // unit-cost levenshtein agrees across engines; the oracle runs the
    // unthresholded DP and filters, equal to the thresholded verify.
    "q198_edit_distance" ->
      """WITH base AS (SELECT doc_id, lower(trim(text)) AS t FROM documents
        |  WHERE doc_id < 80 AND length(trim(text)) >= 40),
        |var AS (SELECT doc_id + 100000 AS doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN substr(t, 1, 11) || '~' || substr(t, 13)
        |       WHEN doc_id % 3 = 1 THEN substr(t, 1, 14) || substr(t, 17)
        |       ELSE substr(t, 1, 19) || 'zz' || substr(t, 20) END AS t FROM base),
        |c AS (SELECT * FROM base UNION ALL SELECT * FROM var),
        |t2 AS (SELECT doc_id AS id, t, substr(t, 1, 10) AS blk,
        |  length(t) AS len FROM c),
        |p AS (SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.t, b.t) AS dist
        |  FROM t2 a JOIN t2 b ON a.blk = b.blk AND a.id < b.id
        |  AND abs(a.len - b.len) <= 3)
        |SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist FROM p
        |WHERE dist <= 3""".stripMargin,
    // q199: 48-bit md5-prefix hashes via the '0x'||substr cast; both
    // jaccard divisions are single correctly-rounded ops over integers.
    "q199_kmv_jaccard" ->
      """WITH toks AS (SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |tk AS (SELECT DISTINCT source, tok FROM toks WHERE length(tok) > 0),
        |h AS (SELECT DISTINCT source,
        |  CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS h FROM tk),
        |sk AS (SELECT source, h FROM
        |  (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r
        |   FROM h) WHERE r <= 64),
        |srcs AS (SELECT DISTINCT source FROM sk),
        |pairs AS (SELECT a.source AS src_a, b.source AS src_b
        |  FROM srcs a JOIN srcs b ON a.source < b.source),
        |m AS (SELECT src_a, src_b, h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
        |  SELECT p.src_a, p.src_b, s.h, 1 AS ia, 0 AS ib
        |    FROM pairs p JOIN sk s ON s.source = p.src_a
        |  UNION ALL
        |  SELECT p.src_a, p.src_b, s.h, 0 AS ia, 1 AS ib
        |    FROM pairs p JOIN sk s ON s.source = p.src_b)
        |  GROUP BY src_a, src_b, h),
        |est AS (SELECT src_a, src_b, COUNT(*) AS k_used,
        |  SUM(ia * ib) AS n_common FROM (
        |  SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r
        |  FROM m) WHERE r <= 64 GROUP BY src_a, src_b),
        |nv AS (SELECT source, COUNT(*) AS nv FROM tk GROUP BY source),
        |inter AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS ni
        |  FROM tk a JOIN tk b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT e.src_a, e.src_b, CAST(e.k_used AS BIGINT) AS k_used,
        |  CAST(e.n_common AS BIGINT) AS n_common,
        |  CAST(e.n_common AS DOUBLE) / CAST(e.k_used AS DOUBLE) AS jaccard_est,
        |  CAST(COALESCE(i.ni, 0) AS DOUBLE) /
        |    CAST(na.nv + nb.nv - COALESCE(i.ni, 0) AS DOUBLE) AS true_jaccard
        |FROM est e
        |LEFT JOIN inter i ON e.src_a = i.src_a AND e.src_b = i.src_b
        |JOIN nv na ON na.source = e.src_a
        |JOIN nv nb ON nb.source = e.src_b""".stripMargin,
    // q200: lag over (epoch-ms, event_id) order; counts integer, prob is
    // one division.
    "q200_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type
        |  FROM events),
        |s AS (SELECT event_type AS curr, lag(event_type) OVER
        |  (PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e),
        |c AS (SELECT prev, curr, COUNT(*) AS n FROM s
        |  WHERE prev IS NOT NULL GROUP BY prev, curr),
        |t AS (SELECT prev, SUM(n) AS tot FROM c GROUP BY prev)
        |SELECT c.prev, c.curr, CAST(c.n AS BIGINT) AS n_transitions,
        |  CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS prob
        |FROM c JOIN t USING (prev)""".stripMargin,
    // q202: digit from the cents integer's string; expected counts from
    // the same full-precision literals the operator hard-codes.
    "q202_benford" ->
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_extendedprice > 0),
        |o AS (SELECT digit, COUNT(*) AS n_obs FROM
        |  (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit FROM c)
        |  WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
        |t AS (SELECT SUM(n_obs) AS n_total FROM o),
        |pr(digit, p) AS (VALUES (1, 0.3010299956639812), (2, 0.17609125905568124),
        |  (3, 0.12493873660829992), (4, 0.09691001300805642),
        |  (5, 0.07918124604762482), (6, 0.06694678963061322),
        |  (7, 0.05799194697768673), (8, 0.05115252244738129),
        |  (9, 0.04575749056067514)),
        |x AS (SELECT o.digit, o.n_obs,
        |  CAST(t.n_total AS DOUBLE) * pr.p AS expected
        |  FROM o JOIN pr ON o.digit = pr.digit CROSS JOIN t)
        |SELECT CAST(digit AS BIGINT) AS digit, CAST(n_obs AS BIGINT) AS n_obs,
        |  expected,
        |  (CAST(n_obs AS DOUBLE) - expected) * (CAST(n_obs AS DOUBLE) - expected)
        |    / expected AS chi2_term
        |FROM x""".stripMargin,
    // q203: cents shift keeps the band dividend positive, so truncating
    // div == floor // on both engines.
    "q203_k_anonymity" ->
      """WITH q AS (SELECT c_nationkey, c_mktsegment,
        |  (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS bal_band
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment, bal_band,
        |  CAST(COUNT(*) AS BIGINT) AS class_size
        |FROM q GROUP BY c_nationkey, c_mktsegment, bal_band
        |HAVING COUNT(*) < 5""".stripMargin,
    // q204: both rankers replay with the q79/q83 list arithmetic; the
    // fused score is two divisions + one add in fixed order.
    "q204_rrf_fusion" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
        |cos AS (SELECT p.probe_id, e.vec_id AS corpus_id,
        |  list_aggregate(list_transform(list_zip(e.v, p.pv), x -> x[1]*x[2]), 'sum') /
        |  (sqrt(list_aggregate(list_transform(e.v, x -> x*x), 'sum')) *
        |   sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum'))) AS cs
        |  FROM e JOIN p ON e.vec_id <> p.probe_id),
        |r1 AS (SELECT probe_id, corpus_id, row_number() OVER
        |  (PARTITION BY probe_id ORDER BY cs DESC, corpus_id) AS ra
        |  FROM cos WHERE NOT isnan(cs)),
        |r1k AS (SELECT * FROM r1 WHERE ra <= 20),
        |d AS (SELECT p.probe_id, e.vec_id AS corpus_id,
        |  list_aggregate(list_transform(list_zip(e.v, p.pv),
        |    x -> (x[1]-x[2])*(x[1]-x[2])), 'sum') AS d2
        |  FROM e JOIN p ON e.vec_id <> p.probe_id),
        |r2 AS (SELECT probe_id, corpus_id, row_number() OVER
        |  (PARTITION BY probe_id ORDER BY d2, corpus_id) AS rb FROM d),
        |r2k AS (SELECT * FROM r2 WHERE rb <= 20),
        |f AS (SELECT COALESCE(a.probe_id, b.probe_id) AS probe_id,
        |  COALESCE(a.corpus_id, b.corpus_id) AS corpus_id,
        |  COALESCE(1.0 / (60.0 + CAST(a.ra AS DOUBLE)), 0.0) +
        |  COALESCE(1.0 / (60.0 + CAST(b.rb AS DOUBLE)), 0.0) AS rrf
        |  FROM r1k a FULL OUTER JOIN r2k b
        |  ON a.probe_id = b.probe_id AND a.corpus_id = b.corpus_id)
        |SELECT probe_id, corpus_id, rrf, CAST(fr AS BIGINT) AS fused_rank
        |FROM (SELECT *, row_number() OVER
        |  (PARTITION BY probe_id ORDER BY rrf DESC, corpus_id) AS fr FROM f)
        |WHERE fr <= 10""".stripMargin,
    // q205: per-column census replay; mode = ORDER BY cnt DESC, v LIMIT 1
    // == min(struct(-cnt, v)).
    "q205_profile_census" ->
      """WITH
        |g1 AS (SELECT CAST(l_returnflag AS VARCHAR) AS v, COUNT(*) AS cnt
        |  FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1),
        |m1 AS (SELECT v, cnt FROM g1 ORDER BY cnt DESC, v LIMIT 1),
        |g2 AS (SELECT CAST(l_linestatus AS VARCHAR) AS v, COUNT(*) AS cnt
        |  FROM lineitem WHERE l_linestatus IS NOT NULL GROUP BY 1),
        |m2 AS (SELECT v, cnt FROM g2 ORDER BY cnt DESC, v LIMIT 1),
        |g3 AS (SELECT CAST(l_suppkey AS VARCHAR) AS v, COUNT(*) AS cnt
        |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
        |m3 AS (SELECT v, cnt FROM g3 ORDER BY cnt DESC, v LIMIT 1),
        |g4 AS (SELECT CAST(o_orderstatus AS VARCHAR) AS v, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1),
        |m4 AS (SELECT v, cnt FROM g4 ORDER BY cnt DESC, v LIMIT 1),
        |g5 AS (SELECT CAST(o_orderpriority AS VARCHAR) AS v, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
        |m5 AS (SELECT v, cnt FROM g5 ORDER BY cnt DESC, v LIMIT 1)
        |SELECT 'l_returnflag' AS col_name,
        |  (SELECT COUNT(*) FROM lineitem) AS n_rows,
        |  (SELECT COUNT(*) - COUNT(l_returnflag) FROM lineitem) AS n_null,
        |  (SELECT COUNT(*) FROM g1) AS n_distinct,
        |  (SELECT v FROM m1) AS mode_value, (SELECT cnt FROM m1) AS mode_freq
        |UNION ALL SELECT 'l_linestatus',
        |  (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) - COUNT(l_linestatus) FROM lineitem),
        |  (SELECT COUNT(*) FROM g2), (SELECT v FROM m2), (SELECT cnt FROM m2)
        |UNION ALL SELECT 'l_suppkey',
        |  (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) - COUNT(l_suppkey) FROM lineitem),
        |  (SELECT COUNT(*) FROM g3), (SELECT v FROM m3), (SELECT cnt FROM m3)
        |UNION ALL SELECT 'o_orderstatus',
        |  (SELECT COUNT(*) FROM orders),
        |  (SELECT COUNT(*) - COUNT(o_orderstatus) FROM orders),
        |  (SELECT COUNT(*) FROM g4), (SELECT v FROM m4), (SELECT cnt FROM m4)
        |UNION ALL SELECT 'o_orderpriority',
        |  (SELECT COUNT(*) FROM orders),
        |  (SELECT COUNT(*) - COUNT(o_orderpriority) FROM orders),
        |  (SELECT COUNT(*) FROM g5), (SELECT v FROM m5), (SELECT cnt FROM m5)""".stripMargin,
    // q206: NOT-IN blocks mirror the anti-join pair; the IS NULL arm on
    // the parent side mirrors anti-join null semantics.
    "q206_integrity_audit" ->
      """SELECT 'lineitem->orders' AS relation,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL) AS n_child,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND
        |    l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)) AS n_orphans,
        |  (SELECT COUNT(*) FROM orders) AS n_parents,
        |  (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL OR
        |    o_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL)) AS n_unused_parents
        |UNION ALL SELECT 'lineitem->part',
        |  (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NOT NULL),
        |  (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NOT NULL AND
        |    l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL)),
        |  (SELECT COUNT(*) FROM part),
        |  (SELECT COUNT(*) FROM part WHERE p_partkey IS NULL OR
        |    p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey IS NOT NULL))
        |UNION ALL SELECT 'lineitem->supplier',
        |  (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NOT NULL),
        |  (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NOT NULL AND
        |    l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL)),
        |  (SELECT COUNT(*) FROM supplier),
        |  (SELECT COUNT(*) FROM supplier WHERE s_suppkey IS NULL OR
        |    s_suppkey NOT IN (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_suppkey IS NOT NULL))
        |UNION ALL SELECT 'orders->customer',
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL),
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL AND
        |    o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)),
        |  (SELECT COUNT(*) FROM customer),
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey IS NULL OR
        |    c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL))
        |UNION ALL SELECT 'customer->nation',
        |  (SELECT COUNT(*) FROM customer WHERE c_nationkey IS NOT NULL),
        |  (SELECT COUNT(*) FROM customer WHERE c_nationkey IS NOT NULL AND
        |    c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL)),
        |  (SELECT COUNT(*) FROM nation),
        |  (SELECT COUNT(*) FROM nation WHERE n_nationkey IS NULL OR
        |    n_nationkey NOT IN (SELECT DISTINCT c_nationkey FROM customer WHERE c_nationkey IS NOT NULL))""".stripMargin,
    // q207: decimal(34,4) sufficient stats, the q178 exactness contract;
    // each corr is (n*sp - sa*sb) / (sqrt(n*ssa - sa*sa)*sqrt(n*ssb - sb*sb)).
    "q207_corr_matrix" ->
      """WITH s AS (SELECT COUNT(*) AS n,
        |  SUM(CAST(l_quantity AS DECIMAL(34,4))) AS s_q,
        |  SUM(CAST(l_extendedprice AS DECIMAL(34,4))) AS s_p,
        |  SUM(CAST(l_discount AS DECIMAL(34,4))) AS s_d,
        |  SUM(CAST(l_tax AS DECIMAL(34,4))) AS s_t,
        |  SUM(CAST(l_quantity * l_quantity AS DECIMAL(34,4))) AS ss_q,
        |  SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(34,4))) AS ss_p,
        |  SUM(CAST(l_discount * l_discount AS DECIMAL(34,4))) AS ss_d,
        |  SUM(CAST(l_tax * l_tax AS DECIMAL(34,4))) AS ss_t,
        |  SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(34,4))) AS sp_qp,
        |  SUM(CAST(l_quantity * l_discount AS DECIMAL(34,4))) AS sp_qd,
        |  SUM(CAST(l_quantity * l_tax AS DECIMAL(34,4))) AS sp_qt,
        |  SUM(CAST(l_extendedprice * l_discount AS DECIMAL(34,4))) AS sp_pd,
        |  SUM(CAST(l_extendedprice * l_tax AS DECIMAL(34,4))) AS sp_pt,
        |  SUM(CAST(l_discount * l_tax AS DECIMAL(34,4))) AS sp_dt
        |  FROM lineitem),
        |x AS (SELECT CAST(n AS DOUBLE) AS nd, CAST(n AS BIGINT) AS n,
        |  CAST(s_q AS DOUBLE) AS sq, CAST(s_p AS DOUBLE) AS sp2,
        |  CAST(s_d AS DOUBLE) AS sd, CAST(s_t AS DOUBLE) AS st,
        |  CAST(ss_q AS DOUBLE) AS ssq, CAST(ss_p AS DOUBLE) AS ssp,
        |  CAST(ss_d AS DOUBLE) AS ssd, CAST(ss_t AS DOUBLE) AS sst,
        |  CAST(sp_qp AS DOUBLE) AS xqp, CAST(sp_qd AS DOUBLE) AS xqd,
        |  CAST(sp_qt AS DOUBLE) AS xqt, CAST(sp_pd AS DOUBLE) AS xpd,
        |  CAST(sp_pt AS DOUBLE) AS xpt, CAST(sp_dt AS DOUBLE) AS xdt
        |  FROM s)
        |SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
        |  (nd * xqp - sq * sp2) / (sqrt(nd * ssq - sq * sq) * sqrt(nd * ssp - sp2 * sp2)) AS corr FROM x
        |UNION ALL SELECT 'l_quantity', 'l_discount', n,
        |  (nd * xqd - sq * sd) / (sqrt(nd * ssq - sq * sq) * sqrt(nd * ssd - sd * sd)) FROM x
        |UNION ALL SELECT 'l_quantity', 'l_tax', n,
        |  (nd * xqt - sq * st) / (sqrt(nd * ssq - sq * sq) * sqrt(nd * sst - st * st)) FROM x
        |UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
        |  (nd * xpd - sp2 * sd) / (sqrt(nd * ssp - sp2 * sp2) * sqrt(nd * ssd - sd * sd)) FROM x
        |UNION ALL SELECT 'l_extendedprice', 'l_tax', n,
        |  (nd * xpt - sp2 * st) / (sqrt(nd * ssp - sp2 * sp2) * sqrt(nd * sst - st * st)) FROM x
        |UNION ALL SELECT 'l_discount', 'l_tax', n,
        |  (nd * xdt - sd * st) / (sqrt(nd * ssd - sd * sd) * sqrt(nd * sst - st * st)) FROM x""".stripMargin,
    // q208: correlated min/max find the bracketing clicks; the pick rule
    // (forward null OR backward within distance, ties backward) mirrors
    // the operator's when() exactly, including the both-null arm.
    "q208_asof_nearest" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
        |  event_type FROM events),
        |l AS (SELECT user_id, event_id, ms AS err_ms, value AS err_value
        |  FROM ev WHERE event_type = 'error'),
        |r AS (SELECT user_id, ms, MAX(value) AS click_value FROM ev
        |  WHERE event_type = 'click' GROUP BY user_id, ms),
        |b AS (SELECT l.*,
        |  (SELECT MAX(ms) FROM r WHERE r.user_id = l.user_id AND r.ms <= l.err_ms) AS bts,
        |  (SELECT MIN(ms) FROM r WHERE r.user_id = l.user_id AND r.ms >= l.err_ms) AS fts
        |  FROM l),
        |p AS (SELECT *, (fts IS NULL OR (bts IS NOT NULL AND
        |  err_ms - bts <= fts - err_ms)) AS pick_b FROM b)
        |SELECT p.user_id, p.event_id, p.err_ms, p.err_value,
        |  rr.click_value,
        |  CASE WHEN pick_b THEN bts ELSE fts END AS asof_ts,
        |  CASE WHEN pick_b THEN 'backward' ELSE 'forward' END AS asof_dir
        |FROM p LEFT JOIN r rr ON rr.user_id = p.user_id
        |  AND rr.ms = (CASE WHEN pick_b THEN bts ELSE fts END)""".stripMargin,
    // q209: the cascade replays as IN-subquery chains; fraction is one
    // division over exact counts.
    "q209_deletion_impact" ->
      """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 20 = 0),
        |dord AS (SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM del)),
        |dli AS (SELECT 1 AS x FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM dord))
        |SELECT 'customer' AS table_name,
        |  (SELECT COUNT(*) FROM customer) AS n_total,
        |  (SELECT COUNT(*) FROM del) AS n_deleted,
        |  CAST((SELECT COUNT(*) FROM del) AS DOUBLE) /
        |    CAST((SELECT COUNT(*) FROM customer) AS DOUBLE) AS deleted_frac
        |UNION ALL SELECT 'orders',
        |  (SELECT COUNT(*) FROM orders), (SELECT COUNT(*) FROM dord),
        |  CAST((SELECT COUNT(*) FROM dord) AS DOUBLE) /
        |    CAST((SELECT COUNT(*) FROM orders) AS DOUBLE)
        |UNION ALL SELECT 'lineitem',
        |  (SELECT COUNT(*) FROM lineitem), (SELECT COUNT(*) FROM dli),
        |  CAST((SELECT COUNT(*) FROM dli) AS DOUBLE) /
        |    CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE)""".stripMargin,
    // q210: strftime day grain matches date_format; integer windows.
    "q210_novelty_curve" ->
      """WITH ev AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |  event_type FROM events),
        |f AS (SELECT user_id, event_type, MIN(day) AS first_day FROM ev
        |  GROUP BY user_id, event_type),
        |d AS (SELECT ev.user_id, ev.day, COUNT(*) AS n_types_active,
        |  SUM(CASE WHEN f.first_day = ev.day THEN 1 ELSE 0 END) AS n_new_types
        |  FROM ev JOIN f ON ev.user_id = f.user_id AND ev.event_type = f.event_type
        |  GROUP BY ev.user_id, ev.day)
        |SELECT user_id, day, CAST(n_types_active AS BIGINT) AS n_types_active,
        |  CAST(n_new_types AS BIGINT) AS n_new_types,
        |  CAST(SUM(n_new_types) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_types
        |FROM d""".stripMargin,
    // q211: the oracle is EXHAUSTIVE exact Jaccard with the integer
    // cross-multiplied threshold — hash equality proves the prefix
    // filter's recall is 1 on this corpus.
    "q211_set_join" ->
      """WITH aug AS (SELECT doc_id, text FROM documents WHERE doc_id < 40
        |UNION ALL SELECT doc_id + 1000, text || ' graft near dup tail'
        |  FROM documents WHERE doc_id < 40),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM aug),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
        |  i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS sh FROM t),
        |d AS (SELECT doc_id AS id, unnest(sh) AS tok FROM s),
        |n AS (SELECT id, COUNT(*) AS n FROM d GROUP BY id),
        |p AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
        |  FROM d a JOIN d b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, CAST(inter AS BIGINT) AS inter,
        |  CAST(na.n + nb.n - inter AS BIGINT) AS union_size,
        |  CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) AS jaccard
        |FROM p JOIN n na ON na.id = p.id_a JOIN n nb ON nb.id = p.id_b
        |WHERE 2 * inter >= na.n + nb.n - inter""".stripMargin,
    // q140: at saturating k the Misra-Gries summary must equal the exact
    // token census.
    "q140_mg_saturation" ->
      """SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS mg_count
        |FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w FROM documents)
        |GROUP BY w""".stripMargin,
    // q212: the oracle replays quantization (integer scale + floor div —
    // all values non-negative, so // == Spark's div) and the 4-step
    // shift-and-mask Morton spread, then the same z >> 26 bucketing.
    "q212_zorder_layout" ->
      """WITH dom AS (SELECT min(l_orderkey) AS a_lo, max(l_orderkey) AS a_hi,
        |  min(l_suppkey) AS b_lo, max(l_suppkey) AS b_hi FROM lineitem),
        |q AS (SELECT l_orderkey AS a, l_suppkey AS b,
        |  CASE WHEN a_hi = a_lo THEN 0
        |    ELSE ((l_orderkey - a_lo) * 65535) // (a_hi - a_lo) END AS qa,
        |  CASE WHEN b_hi = b_lo THEN 0
        |    ELSE ((l_suppkey - b_lo) * 65535) // (b_hi - b_lo) END AS qb
        |  FROM lineitem CROSS JOIN dom),
        |s1 AS (SELECT a, b, ((qa | (qa << 8)) & 16711935) AS xa,
        |  ((qb | (qb << 8)) & 16711935) AS xb FROM q),
        |s2 AS (SELECT a, b, ((xa | (xa << 4)) & 252645135) AS xa,
        |  ((xb | (xb << 4)) & 252645135) AS xb FROM s1),
        |s3 AS (SELECT a, b, ((xa | (xa << 2)) & 858993459) AS xa,
        |  ((xb | (xb << 2)) & 858993459) AS xb FROM s2),
        |s4 AS (SELECT a, b, ((xa | (xa << 1)) & 1431655765) AS xa,
        |  ((xb | (xb << 1)) & 1431655765) AS xb FROM s3),
        |z AS (SELECT a, b, (xa | (xb << 1)) >> 26 AS bucket FROM s4)
        |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |  min(a) AS a_min, max(a) AS a_max, min(b) AS b_min, max(b) AS b_max
        |FROM z GROUP BY bucket""".stripMargin,
    // q472: q212's quantization CTEs, then the Hilbert xy→d walk as a
    // 16-round integer list fold with a BIGINT[3] accumulator
    // [x, y, d] (array acc, not a multi-field struct — the documented
    // DuckDB struct-fold hazard): per scale s the quadrant digit
    // (3·rx)⊕ry weights s², the ry=0 branch reflects (rx=1) and
    // transposes — the Spark kernel's loop round-for-round
    "q472_hilbert_layout" -> {
      val sList = (15 to 0 by -1).map(i => s"CAST(${1L << i} AS BIGINT)")
        .mkString("[", ", ", "]")
      """WITH dom AS (SELECT min(l_orderkey) AS a_lo, max(l_orderkey) AS a_hi,
        |  min(l_suppkey) AS b_lo, max(l_suppkey) AS b_hi FROM lineitem),
        |q AS (SELECT l_orderkey AS a, l_suppkey AS b,
        |  CASE WHEN a_hi = a_lo THEN 0
        |    ELSE ((l_orderkey - a_lo) * 65535) // (a_hi - a_lo) END AS qa,
        |  CASE WHEN b_hi = b_lo THEN 0
        |    ELSE ((l_suppkey - b_lo) * 65535) // (b_hi - b_lo) END AS qb
        |  FROM lineitem CROSS JOIN dom),
        |h AS (SELECT a, b, list_reduce(
        |    list_prepend([CAST(qa AS BIGINT), CAST(qb AS BIGINT),
        |        CAST(0 AS BIGINT)],
        |      list_transform(""".stripMargin + sList +
        """, s -> [s])),
        |    (acc, sv) -> [
        |      CASE WHEN (acc[2] & sv[1]) > 0 THEN acc[1]
        |        WHEN (acc[1] & sv[1]) > 0 THEN sv[1] - 1 - acc[2]
        |        ELSE acc[2] END,
        |      CASE WHEN (acc[2] & sv[1]) > 0 THEN acc[2]
        |        WHEN (acc[1] & sv[1]) > 0 THEN sv[1] - 1 - acc[1]
        |        ELSE acc[1] END,
        |      acc[3] + sv[1] * sv[1] * xor(
        |        3 * (CASE WHEN (acc[1] & sv[1]) > 0 THEN 1 ELSE 0 END),
        |        CASE WHEN (acc[2] & sv[1]) > 0 THEN 1 ELSE 0 END)])
        |  AS hd FROM q),
        |z AS (SELECT a, b, hd[3] >> 26 AS bucket FROM h)
        |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |  min(a) AS a_min, max(a) AS a_max, min(b) AS b_min, max(b) AS b_max
        |FROM z GROUP BY bucket""".stripMargin
    },
    // q213: the chain+weld fixture's transitive closure is closed-form —
    // runs of 50 welded in even/odd pairs, so component = 100*floor(id/100)
    // and every component has exactly 100 members. No recursive CTE needed;
    // a single mis-hooked node breaks its row AND the csize column.
    "q213_altstar_cc" ->
      """SELECT doc_id, (doc_id // 100) * 100 AS component,
        |CAST(100 AS BIGINT) AS csize FROM documents""".stripMargin,
    // q214: the oracle is the FULL unbounded token census's top-4 — the
    // two-phase MG screen + exact recount must land on exactly it (that
    // is the certificate's claim).
    "q214_exact_heavy" ->
      """WITH aug AS (SELECT text || CASE WHEN doc_id % 3 = 0
        |  THEN repeat(' hot' || CAST(doc_id % 4 AS VARCHAR), 100) ELSE '' END AS text
        |FROM documents),
        |t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w FROM aug)
        |SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS freq FROM t
        |GROUP BY w ORDER BY freq DESC, token LIMIT 4""".stripMargin,
    // q215: quantile_disc IS the spec — the bisection must return the
    // identical element (ceil(p*n)-th smallest), bit-for-bit.
    "q215_quantile_bisect" ->
      """WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
        |n AS (SELECT COUNT(*) AS cnt FROM s)
        |SELECT CAST(0.25 AS DOUBLE) AS p, CAST(ceil(0.25 * cnt) AS BIGINT) AS k,
        |  (SELECT quantile_disc(v, 0.25) FROM s) AS value FROM n
        |UNION ALL SELECT 0.5, CAST(ceil(0.5 * cnt) AS BIGINT),
        |  (SELECT quantile_disc(v, 0.5) FROM s) FROM n
        |UNION ALL SELECT 0.9, CAST(ceil(0.9 * cnt) AS BIGINT),
        |  (SELECT quantile_disc(v, 0.9) FROM s) FROM n
        |UNION ALL SELECT 0.99, CAST(ceil(0.99 * cnt) AS BIGINT),
        |  (SELECT quantile_disc(v, 0.99) FROM s) FROM n""".stripMargin,
    // q216: the Luhn fold replays as nested list lambdas over the digit
    // string (RE2 and Java agree on both candidate alternations); sums
    // cast to BIGINT to match Spark's long aggregates.
    "q216_luhn_pii" ->
      """WITH aug AS (
        |  SELECT doc_id, source, text ||
        |    CASE WHEN doc_id % 6 = 0 THEN ' pay card ' ||
        |      (['4111111111111111','5500005555555559','6011000000000004','4111-1111-1111-1111'])[CAST((doc_id // 6) % 4 AS INT) + 1] ELSE '' END ||
        |    CASE WHEN doc_id % 10 = 0 THEN ' ref ' ||
        |      (['4111111111111112','5500005555555551','1234567812345678'])[CAST((doc_id // 10) % 3 AS INT) + 1] ELSE '' END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, text,
        |    regexp_extract_all(text, '\b(?:\d{4}[ -]){3}\d{4}\b|\b\d{13,19}\b', 0) AS cands
        |  FROM aug),
        |v AS (
        |  SELECT doc_id, source, text, cands,
        |    list_filter(cands, s ->
        |      list_aggregate(list_transform(range(len(regexp_replace(s, '[^0-9]', '', 'g'))), i ->
        |        CASE WHEN (len(regexp_replace(s, '[^0-9]', '', 'g')) - 1 - i) % 2 = 1
        |          THEN CASE WHEN CAST(regexp_replace(s, '[^0-9]', '', 'g')[i + 1] AS INT) * 2 > 9
        |                    THEN CAST(regexp_replace(s, '[^0-9]', '', 'g')[i + 1] AS INT) * 2 - 9
        |                    ELSE CAST(regexp_replace(s, '[^0-9]', '', 'g')[i + 1] AS INT) * 2 END
        |          ELSE CAST(regexp_replace(s, '[^0-9]', '', 'g')[i + 1] AS INT) END
        |      ), 'sum') % 10 = 0) AS valid
        |  FROM c),
        |m AS (
        |  SELECT source, cands, valid, text,
        |    list_reduce(list_prepend(text, valid), (acc, x) -> replace(acc, x, '<CC>')) AS masked
        |  FROM v)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN len(cands) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_cand,
        |  CAST(SUM(len(cands)) AS BIGINT) AS n_cands,
        |  CAST(SUM(len(valid)) AS BIGINT) AS n_valid,
        |  CAST(SUM(len(cands) - len(valid)) AS BIGINT) AS n_invalid,
        |  CAST(SUM(len(text) - len(masked)) AS BIGINT) AS chars_redacted
        |FROM m GROUP BY source""".stripMargin,
    // q217: the same distinct-value census walk with the same INTEGER
    // ceil(p*n) thresholds — bounds, clip counts, and the BIGINT clipped
    // sum replay exactly; the mean is one double division on both sides.
    "q217_winsor_census" ->
      """WITH cen AS (SELECT lang, CAST(n_chars AS BIGINT) AS v, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, v, c,
        |  SUM(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
        |  SUM(c) OVER (PARTITION BY lang) AS tot FROM cen),
        |b AS (SELECT lang,
        |  MIN(CASE WHEN cum >= (tot * 5 + 99) // 100 THEN v END) AS p_lo,
        |  MIN(CASE WHEN cum >= (tot * 95 + 99) // 100 THEN v END) AS p_hi
        |  FROM r GROUP BY lang)
        |SELECT r.lang, CAST(SUM(c) AS BIGINT) AS n_rows, p_lo, p_hi,
        |  CAST(SUM(CASE WHEN v < p_lo THEN c ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(SUM(CASE WHEN v > p_hi THEN c ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  CAST(SUM(least(greatest(v, p_lo), p_hi) * c) AS BIGINT) AS clip_sum,
        |  CAST(CAST(SUM(least(greatest(v, p_lo), p_hi) * c) AS BIGINT) AS DOUBLE) /
        |    CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) AS clip_mean
        |FROM r JOIN b USING (lang) GROUP BY r.lang, p_lo, p_hi""".stripMargin,
    // q218: same planted-hot-key census; Σc² exact to the final DOUBLE
    // cast, top-10 sum is count-ordered so ties cannot change it.
    "q218_skew_census" ->
      """WITH skewed AS (SELECT l_suppkey FROM lineitem
        |  UNION ALL SELECT l_suppkey FROM lineitem WHERE l_suppkey < 3
        |  UNION ALL SELECT l_suppkey FROM lineitem WHERE l_suppkey < 3
        |  UNION ALL SELECT l_suppkey FROM lineitem WHERE l_suppkey < 3
        |  UNION ALL SELECT l_suppkey FROM lineitem WHERE l_suppkey < 3),
        |cen AS (SELECT l_suppkey, COUNT(*) AS c FROM skewed GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(MAX(c) AS BIGINT) AS top1_cnt,
        |  CAST(SUM(c * c) AS DOUBLE) AS sq_sum FROM cen),
        |tn AS (SELECT CAST(SUM(c) AS BIGINT) AS topn_cnt FROM
        |  (SELECT c FROM cen ORDER BY c DESC LIMIT 10))
        |SELECT n_rows, n_keys, top1_cnt, topn_cnt, sq_sum,
        |  CAST(top1_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top1_share,
        |  CAST(topn_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS topn_share,
        |  CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE) / sq_sum AS eff_keys
        |FROM t, tn""".stripMargin,
    // q219: naive full diff + the bucket census via the identity
    // "bucket digests equal <=> the bucket holds no differing row", so
    // the oracle never needs the md5 chain itself.
    "q219_dataset_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |h AS (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hh, text
        |  FROM documents),
        |v2 AS (
        |  SELECT doc_id, CASE WHEN hh >= '0d' AND hh < '1a'
        |    THEN text || ' v2 edit' ELSE text END AS text
        |  FROM h WHERE NOT (hh < '0d')
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' brand new' FROM h
        |  WHERE hh >= '1a' AND hh < '27'),
        |d1 AS (SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b FROM v1),
        |d2 AS (SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b FROM v2),
        |j AS (SELECT COALESCE(d1.b, d2.b) AS b,
        |  CASE WHEN d1.text IS NULL THEN 'added'
        |       WHEN d2.text IS NULL THEN 'removed'
        |       WHEN d1.text <> d2.text THEN 'changed' ELSE 'same' END AS status
        |  FROM d1 FULL OUTER JOIN d2 ON d1.doc_id = d2.doc_id),
        |bk AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_buckets
        |  FROM (SELECT b FROM d1 UNION ALL SELECT b FROM d2)),
        |dirty AS (SELECT DISTINCT b FROM j WHERE status <> 'same'),
        |db AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dirty_buckets FROM dirty),
        |rc AS (SELECT
        |  CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |  CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(SUM(CASE WHEN status = 'same' THEN 1 ELSE 0 END) AS BIGINT) AS n_same_in_dirty
        |  FROM j WHERE b IN (SELECT b FROM dirty))
        |SELECT n_buckets, n_dirty_buckets, n_added, n_removed, n_changed,
        |  n_same_in_dirty FROM bk, db, rc""".stripMargin,
    // q220: the oracle rebuilds the 4x512 sketch (q170's md5 cell map),
    // takes the min row-wise self inner product, and compares to the
    // exact census Σc² — collisions and all, integer to the last step.
    "q220_cms_join_size" ->
      """WITH cells AS (SELECT l_suppkey AS key, i,
        |  CAST(('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 512 AS cell
        |  FROM lineitem, range(4) r(i)),
        |sketch AS (SELECT i, cell, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM cells GROUP BY i, cell),
        |dots AS (SELECT i, SUM(c * c) AS dot FROM sketch GROUP BY i),
        |est AS (SELECT CAST(MIN(dot) AS BIGINT) AS join_size_est FROM dots),
        |tr AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS true_size FROM
        |  (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey))
        |SELECT join_size_est, true_size,
        |  join_size_est - true_size AS overcount FROM est, tr""".stripMargin,
    // q221: same planting, same md5 shingle sets, same df cap and
    // rational threshold — the directional pair census replays exactly;
    // containment is one double division of two exact BIGINTs.
    "q221_containment" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |qd AS (SELECT doc_id + 2000 AS doc_id,
        |  'quoted intro segment ' ||
        |  array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1, 40), ' ') ||
        |  ' closing remarks follow' AS text
        |  FROM base WHERE doc_id % 9 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM qd),
        |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM corpus),
        |sh0 AS (SELECT doc_id AS id,
        |  unnest(list_transform(range(len(toks) - 4),
        |    i -> md5(array_to_string(list_slice(toks, i + 1, i + 5), ' ')))) AS s
        |  FROM t WHERE len(toks) >= 5),
        |sh AS (SELECT DISTINCT id, s FROM sh0),
        |sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY id),
        |rare AS (SELECT sh.id, sh.s FROM sh
        |  JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 50) d USING (s)),
        |inter AS (SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM rare a JOIN rare b USING (s) WHERE a.id <> b.id GROUP BY a.id, b.id)
        |SELECT id_a, id_b, inter, sizes.n AS n_a,
        |  CAST(inter AS DOUBLE) / CAST(sizes.n AS DOUBLE) AS containment
        |FROM inter JOIN sizes ON sizes.id = inter.id_a
        |WHERE inter * 5 >= 4 * sizes.n""".stripMargin,
    // q222: the wedge census, non-adjacency anti-join and the integer
    // ranking replay verbatim; jaccard is one exact-int division on
    // both engines, rounded as a hash belt.
    "q222_link_pred" ->
      """WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
        |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
        |ed AS (SELECT u AS p, v AS x FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT p AS n, COUNT(*) AS d FROM ed GROUP BY p),
        |w AS (SELECT a.x AS u, b.x AS v, CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM ed a JOIN ed b ON a.p = b.p AND a.x < b.x GROUP BY a.x, b.x),
        |cand AS (SELECT w.* FROM w LEFT JOIN e ON w.u = e.u AND w.v = e.v
        |  WHERE e.u IS NULL),
        |sc AS (SELECT c.u, c.v, c.cn, du.d + dv.d AS degsum,
        |    CAST(c.cn AS DOUBLE) / CAST(du.d + dv.d - c.cn AS DOUBLE) AS jacc
        |  FROM cand c JOIN deg du ON c.u = du.n JOIN deg dv ON c.v = dv.n),
        |top AS (SELECT *, row_number() OVER
        |    (ORDER BY cn DESC, degsum ASC, u, v) AS rk
        |  FROM sc ORDER BY cn DESC, degsum ASC, u, v LIMIT 20)
        |SELECT CAST(rk AS BIGINT) AS rank, u AS part_u, v AS part_v, cn,
        |  round(jacc, 6) AS jaccard FROM top""".stripMargin,
    // q223: census + cumulative-over-distinct-values replay; the doubled
    // mid-rank is integer-exact so the one division matches bit-for-bit.
    "q223_rank_normalize" ->
      """WITH c AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n_eq
        |  FROM documents GROUP BY source, n_chars),
        |r AS (SELECT source, v, n_eq,
        |    2 * COALESCE(SUM(n_eq) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + n_eq + 1 AS mid2,
        |    SUM(n_eq) OVER (PARTITION BY source) AS n
        |  FROM c)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  round(CAST(r.mid2 AS DOUBLE) / CAST(2 * r.n AS DOUBLE), 6) AS norm_rank
        |FROM documents d JOIN r ON d.source = r.source AND d.n_chars = r.v""".stripMargin,
    // q224: lossless PCM round-trip -> the planted silence rule
    // (frame + doc_id) % 5 < 2 replays as arithmetic; islands via the
    // same frame - row_number move.
    "q224_silence_segments" ->
      """WITH ids AS (SELECT doc_id, 256 + (doc_id % 7) * 64 AS n
        |  FROM documents WHERE doc_id < 40),
        |f AS (SELECT doc_id, unnest(range(n // 64)) AS fr FROM ids),
        |s AS (SELECT doc_id, fr FROM f WHERE (fr + doc_id) % 5 < 2),
        |g AS (SELECT doc_id, fr, fr - row_number() OVER
        |    (PARTITION BY doc_id ORDER BY fr) AS grp FROM s)
        |SELECT doc_id, CAST(MIN(fr) AS BIGINT) AS seg_start,
        |  CAST(COUNT(*) AS BIGINT) AS seg_frames
        |FROM g GROUP BY doc_id, grp""".stripMargin,
    // q225: in-order list_reduce folds mirror Spark's aggregate HOF per
    // row; min is bit-identical, the mean's cross-row sum rounds 4dp.
    "q225_matryoshka" ->
      """WITH ks AS (SELECT unnest([8, 16, 32, 64]) AS k),
        |r AS (SELECT e.label, ks.k,
        |    sqrt(list_reduce(list_transform(list_slice(e.embedding, 1, ks.k),
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)
        |      / list_reduce(list_transform(e.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS ret
        |  FROM embeddings e, ks)
        |SELECT CAST(k AS INT) AS k, label, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(avg(ret), 4) AS avg_retained,
        |  round(min(ret), 6) AS min_retained
        |FROM r GROUP BY k, label""".stripMargin,
    // q226: integer masses, ROWS-window cumulative, `//` == Spark `div`;
    // the whole plan replays bit-for-bit.
    "q226_compaction_plan" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(SUM(COALESCE(length(props), 0) + 32) AS BIGINT) AS day_bytes
        |  FROM events GROUP BY 1),
        |m AS (SELECT day, day_bytes, substr(day, 1, 7) AS month FROM d),
        |p AS (SELECT month, day, day_bytes,
        |    COALESCE(SUM(day_bytes) OVER (PARTITION BY month ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // 100000 AS bin
        |  FROM m)
        |SELECT month, CAST(bin AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(day_bytes) AS BIGINT) AS total_bytes,
        |  MIN(day) AS first_day, MAX(day) AS last_day
        |FROM p GROUP BY month, bin""".stripMargin,
    // q227: peeling unrolled 10 rounds (fixpoint after 5 at sf0.01 —
    // extra rounds are identity); each round = degree census + survivor
    // filter, integer-only.
    "q227_kcore" -> {
      // every CTE MATERIALIZED: each round references its predecessor
      // three times (FROM + two NOT INs) — inlined expansion would be
      // 3^10 base scans and exhausts file handles
      val base =
        """WITH pts AS MATERIALIZED (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
          |op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
          |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
          |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
          |r0 AS MATERIALIZED (SELECT u AS p, v AS x FROM e0 UNION ALL SELECT v, u FROM e0)""".stripMargin
      val rounds = (1 to 10).map { i =>
        s""",
           |d$i AS MATERIALIZED (SELECT p, COUNT(*) AS d FROM r${i - 1} GROUP BY p),
           |low$i AS MATERIALIZED (SELECT p FROM d$i WHERE d < 3),
           |r$i AS MATERIALIZED (SELECT r.p, r.x FROM r${i - 1} r
           |  WHERE r.p NOT IN (SELECT p FROM low$i)
           |    AND r.x NOT IN (SELECT p FROM low$i))""".stripMargin
      }.mkString
      base + rounds +
        "\nSELECT p AS part_key, CAST(COUNT(*) AS BIGINT) AS core_deg FROM r10 GROUP BY p"
    },
    // q228: identical lag windows build transitions, the model join is
    // exact-integer division under ln (libm parity, q121/q139
    // precedent), terms fold in (ms, event_id) order on both engines,
    // and the VARCHAR->DECIMAL bridge mirrors Spark's round.
    "q228_seq_surprise" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
        |tr AS (SELECT user_id, ms, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev,
        |    event_type AS curr FROM ev),
        |t2 AS (SELECT * FROM tr WHERE prev IS NOT NULL),
        |c AS (SELECT prev, curr, CAST(COUNT(*) AS BIGINT) AS cxy FROM t2 GROUP BY prev, curr),
        |tot AS (SELECT prev, SUM(cxy) AS cx FROM c GROUP BY prev),
        |p AS (SELECT c.prev, c.curr,
        |    -ln(CAST(cxy AS DOUBLE) / CAST(cx AS DOUBLE)) AS s
        |  FROM c JOIN tot USING (prev)),
        |terms AS (SELECT t2.user_id, t2.ms, t2.event_id, p.s
        |  FROM t2 JOIN p ON t2.prev = p.prev AND t2.curr = p.curr),
        |lists AS (SELECT user_id, list(s ORDER BY ms, event_id) AS ls
        |  FROM terms GROUP BY user_id)
        |SELECT user_id, CAST(len(ls) AS BIGINT) AS n_trans,
        |  CAST(round(CAST(CAST(list_reduce(ls, (a, b) -> a + b) / len(ls)
        |    AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS mean_surprise
        |FROM lists""".stripMargin,
    // q229: q203's integer band replay + exact distinct census.
    "q229_l_diversity" ->
      """WITH q AS (SELECT c_nationkey,
        |  (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS bal_band,
        |  c_mktsegment FROM customer)
        |SELECT c_nationkey, bal_band,
        |  CAST(COUNT(*) AS BIGINT) AS class_size,
        |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
        |FROM q GROUP BY c_nationkey, bal_band
        |HAVING COUNT(DISTINCT c_mktsegment) < 5""".stripMargin,
    // q230: the O(n log n) 2D-skyline census replay — per-quantity min
    // price + prefix-min over strictly higher quantities; raw double
    // equality against parquet values, no arithmetic.
    "q230_skyline" ->
      """WITH t AS (SELECT l_orderkey * 8 + l_linenumber AS item_id,
        |    CAST(l_quantity AS DOUBLE) AS q,
        |    CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem),
        |g AS (SELECT q, MIN(p) AS minp FROM t GROUP BY q),
        |w AS (SELECT q, minp, MIN(minp) OVER (ORDER BY q DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
        |  FROM g)
        |SELECT t.item_id, t.q AS l_quantity, t.p AS l_extendedprice
        |FROM t JOIN w ON t.q = w.q AND t.p = w.minp
        |WHERE w.best_prev IS NULL OR w.best_prev > t.p""".stripMargin,
    // q231: day truncation, min-cohort, datediff and distinct counts
    // replay as integers; the rate is one exact division.
    "q231_retention" ->
      """WITH days AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
        |coh AS (SELECT u, MIN(d) AS cohort_day FROM days GROUP BY u),
        |tri AS (SELECT cohort_day, d - cohort_day AS day_offset,
        |    CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users
        |  FROM days JOIN coh USING (u) GROUP BY cohort_day, d - cohort_day),
        |base AS (SELECT cohort_day, n_users AS cohort_size FROM tri
        |  WHERE day_offset = 0)
        |SELECT strftime(t.cohort_day, '%Y-%m-%d') AS cohort_day,
        |  CAST(t.day_offset AS INT) AS day_offset, t.n_users, b.cohort_size,
        |  round(CAST(t.n_users AS DOUBLE) / CAST(b.cohort_size AS DOUBLE), 6)
        |    AS retention
        |FROM tri t JOIN base b USING (cohort_day)""".stripMargin,
    // q232: ROLLUP replays natively; GROUPING() bits concatenate in the
    // same (returnflag, linestatus) order as Spark's grouping_id; sums
    // are decimal-exact at scale 2.
    "q232_rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    // q233: per-pair census replay; string casts align numeric reprs,
    // null counts as its own dependent value via a separate indicator
    // (no sentinel string — mirrors the engine).
    "q233_fd_discovery" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")
      (for { a <- cols; b <- cols if a != b } yield
        s"""SELECT '$a' AS determinant, '$b' AS dependent,
           |  CAST(COUNT(*) AS BIGINT) AS n_det,
           |  CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           |  SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT CAST($a AS VARCHAR) AS a,
           |    COUNT(DISTINCT CAST($b AS VARCHAR))
           |      + MAX(CASE WHEN $b IS NULL THEN 1 ELSE 0 END) AS nb
           |  FROM orders GROUP BY 1) t""".stripMargin)
        .mkString("\nUNION ALL\n")
    },
    // q293: per candidate, distinct-census left join; violation count =
    // dependent values with no referenced match (exact, null-excluded)
    "q293_inclusion_deps" -> {
      val cands = Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
        ("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ("part", "p_partkey", "lineitem", "l_partkey"),
        ("events", "user_id", "customer", "c_custkey"))
      cands.map { case (dt, dc, rt, rc) =>
        s"""SELECT '$dt.$dc' AS dependent, '$rt.$rc' AS referenced,
           |  CAST(COUNT(*) AS BIGINT) AS n_dep_distinct,
           |  CAST(SUM(CASE WHEN r.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  SUM(CASE WHEN r.v IS NULL THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT DISTINCT CAST($dc AS VARCHAR) AS v FROM $dt
           |      WHERE $dc IS NOT NULL) d
           |LEFT JOIN (SELECT DISTINCT CAST($rc AS VARCHAR) AS v FROM $rt
           |      WHERE $rc IS NOT NULL) r ON d.v = r.v""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    // q234: identical lag window in ingestion order; integer census.
    "q234_sortedness" ->
      """WITH ev AS (SELECT event_type, event_id, epoch_ms(ts) AS ms FROM events),
        |l AS (SELECT event_type, ms,
        |    lag(ms) OVER (PARTITION BY event_type ORDER BY event_id) AS prev
        |  FROM ev)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN prev > ms THEN 1 ELSE 0 END) AS BIGINT)
        |    AS inversions
        |FROM l GROUP BY event_type""".stripMargin,
    // q235: quantile_disc IS the ceil(p·n)-th-smallest rule the operator
    // implements; integer cents, exact match.
    "q235_grouped_quantiles" ->
      """WITH ev AS (SELECT event_type, hour(ts) AS hod,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, CAST(hod AS INTEGER) AS hod,
        |  CAST(unnest([0.5, 0.95]) AS DOUBLE) AS p,
        |  unnest(quantile_disc(cents, [0.5, 0.95])) AS cents
        |FROM ev GROUP BY event_type, hod""".stripMargin,
    // q236: HUGEINT sufficient statistics == Spark's decimal(38,0) sums;
    // sigma and the allocation fractions are fixed-shape double ops over
    // exact integers; largest-remainder ranks replay on (rem DESC, stratum).
    "q236_neyman_alloc" ->
      """WITH s AS (SELECT o_orderpriority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |st AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(c AS HUGEINT)) AS s1,
        |    SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
        |  FROM s GROUP BY o_orderpriority),
        |sd AS (SELECT o_orderpriority, n,
        |    sqrt(greatest(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / CAST(n * n AS DOUBLE), 0.0)) AS sdev
        |  FROM st),
        |w AS (SELECT *, n * sdev AS wt FROM sd),
        |t AS (SELECT CASE WHEN SUM(wt) > 0 THEN SUM(wt) ELSE 1.0 END AS tw FROM w),
        |f AS (SELECT w.*, 1000 * wt / t.tw AS exact,
        |    CAST(floor(1000 * wt / t.tw) AS BIGINT) AS base FROM w, t),
        |r AS (SELECT *, exact - base AS rem,
        |    row_number() OVER (ORDER BY exact - base DESC, o_orderpriority) AS rk,
        |    1000 - SUM(base) OVER () AS leftover FROM f)
        |SELECT o_orderpriority, n, round(sdev, 6) AS sd,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM r""".stripMargin,
    // q237: cell census + in-order folds over (a, b)-sorted terms; the
    // VARCHAR->DECIMAL bridge mirrors Spark's round on each output.
    "q237_mutual_info" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
        |    CAST(COUNT(*) AS BIGINT) AS cab FROM orders GROUP BY a, b),
        |ma AS (SELECT a, SUM(cab) AS ca FROM cells GROUP BY a),
        |mb AS (SELECT b, SUM(cab) AS cb FROM cells GROUP BY b),
        |nn AS (SELECT SUM(cab) AS n FROM cells),
        |terms AS (SELECT c.a, c.b,
        |    (CAST(cab AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln((CAST(cab AS DOUBLE) * CAST(n AS DOUBLE)) /
        |       (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) AS term
        |  FROM cells c JOIN ma USING (a) JOIN mb USING (b), nn),
        |mil AS (SELECT list(term ORDER BY a, b) AS ls,
        |    CAST(COUNT(*) AS BIGINT) AS n_cells FROM terms),
        |hal AS (SELECT list(-(CAST(ca AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(ca AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY a) AS ls
        |  FROM ma, nn),
        |hbl AS (SELECT list(-(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY b) AS ls
        |  FROM mb, nn)
        |SELECT CAST(nn.n AS BIGINT) AS n, mil.n_cells,
        |  CAST(round(CAST(CAST(list_reduce(hal.ls, (x, y) -> x + y) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS h_a,
        |  CAST(round(CAST(CAST(list_reduce(hbl.ls, (x, y) -> x + y) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS h_b,
        |  CAST(round(CAST(CAST(list_reduce(mil.ls, (x, y) -> x + y) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS mi
        |FROM mil, hal, hbl, nn""".stripMargin,
    // q415: the q237 replay with a raw (unrounded) stage, then the two
    // uncertainty divisions — rounding only at the output edge
    "q415_theils_u" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
        |    CAST(COUNT(*) AS BIGINT) AS cab FROM orders GROUP BY a, b),
        |ma AS (SELECT a, SUM(cab) AS ca FROM cells GROUP BY a),
        |mb AS (SELECT b, SUM(cab) AS cb FROM cells GROUP BY b),
        |nn AS (SELECT SUM(cab) AS n FROM cells),
        |terms AS (SELECT c.a, c.b,
        |    (CAST(cab AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln((CAST(cab AS DOUBLE) * CAST(n AS DOUBLE)) /
        |       (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) AS term
        |  FROM cells c JOIN ma USING (a) JOIN mb USING (b), nn),
        |mil AS (SELECT list(term ORDER BY a, b) AS ls,
        |    CAST(COUNT(*) AS BIGINT) AS n_cells FROM terms),
        |hal AS (SELECT list(-(CAST(ca AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(ca AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY a) AS ls
        |  FROM ma, nn),
        |hbl AS (SELECT list(-(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY b) AS ls
        |  FROM mb, nn),
        |raw AS (SELECT CAST(nn.n AS BIGINT) AS n, mil.n_cells,
        |    list_reduce(hal.ls, (x, y) -> x + y) AS ha,
        |    list_reduce(hbl.ls, (x, y) -> x + y) AS hb,
        |    list_reduce(mil.ls, (x, y) -> x + y) AS mi
        |  FROM mil, hal, hbl, nn)
        |SELECT n, n_cells,
        |  CAST(round(CAST(CAST(ha AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS h_a,
        |  CAST(round(CAST(CAST(hb AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS h_b,
        |  CAST(round(CAST(CAST(mi AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS mi,
        |  CASE WHEN hb > 0.0 THEN
        |    CAST(round(CAST(CAST(mi / hb AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS u_b_given_a,
        |  CASE WHEN ha > 0.0 THEN
        |    CAST(round(CAST(CAST(mi / ha AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS u_a_given_b
        |FROM raw""".stripMargin,
    // q419: the q222 wedge census carrying pivot degrees; AA/RA terms
    // fold in pivot order via seedless list_reduce; ranks compare the
    // bit-identical pinned AA doubles, tie-broken (u, v)
    "q419_adamic_adar" ->
      """WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
        |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
        |ed AS (SELECT u AS p, v AS x FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT p AS n, CAST(COUNT(*) AS BIGINT) AS d
        |  FROM ed GROUP BY p),
        |pv AS (SELECT ed.p, ed.x, deg.d FROM ed JOIN deg ON ed.p = deg.n),
        |w AS (SELECT a.x AS u, b.x AS v, CAST(COUNT(*) AS BIGINT) AS cn,
        |    list(struct_pack(p := a.p, deg := a.d) ORDER BY a.p) AS pl
        |  FROM pv a JOIN pv b ON a.p = b.p AND a.x < b.x
        |  GROUP BY a.x, b.x),
        |cand AS (SELECT w.* FROM w LEFT JOIN e ON w.u = e.u AND w.v = e.v
        |  WHERE e.u IS NULL),
        |sc AS (SELECT u, v, cn,
        |    list_reduce(list_transform(pl,
        |      e -> 1.0 / ln(CAST(e.deg AS DOUBLE))), (x, y) -> x + y)
        |      AS aa,
        |    list_reduce(list_transform(pl,
        |      e -> 1.0 / CAST(e.deg AS DOUBLE)), (x, y) -> x + y) AS ra
        |  FROM cand),
        |top AS (SELECT *, row_number() OVER (ORDER BY aa DESC, u, v)
        |    AS rk
        |  FROM sc ORDER BY aa DESC, u, v LIMIT 20)
        |SELECT CAST(rk AS BIGINT) AS rank, u AS part_u, v AS part_v, cn,
        |  CAST(round(CAST(CAST(aa AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS adamic_adar,
        |  CAST(round(CAST(CAST(ra AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS resource_alloc
        |FROM top""".stripMargin,
    // q420: replays Robust.brownForsythe's exact shapes — doubled
    // order-stat medians keep z integer; sterm folds
    // double(si²)/double(ni) in group order (si² squared in HUGEINT
    // BEFORE the double cast); F = (n−k)·between / ((k−1)·within)
    "q420_brown_forsythe" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS g,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT sc, g, y,
        |    row_number() OVER (PARTITION BY sc, g ORDER BY y) AS rn,
        |    count(*) OVER (PARTITION BY sc, g) AS ng FROM e),
        |m AS (SELECT sc, g,
        |    CASE WHEN count(*) = 1 THEN 2 * min(y) ELSE sum(y) END AS m2
        |  FROM r WHERE rn = (ng + 1) // 2 OR rn = (ng + 2) // 2
        |  GROUP BY 1, 2),
        |z AS (SELECT e.sc, e.g, abs(2 * e.y - m.m2) AS z
        |  FROM e JOIN m ON e.sc = m.sc AND e.g = m.g),
        |c AS (SELECT sc, g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(z) AS HUGEINT) AS sg,
        |    sum(CAST(z AS HUGEINT) * z) AS qg FROM z GROUP BY 1, 2),
        |p AS (SELECT sc, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS HUGEINT) AS ss, CAST(sum(qg) AS HUGEINT) AS qq,
        |    list(struct_pack(s2 := sg * sg, ni := ng) ORDER BY g) AS cells
        |  FROM c GROUP BY 1),
        |b AS (SELECT sc, k, n, ss, qq,
        |    list_reduce(list_transform(cells,
        |      x -> CAST(x.s2 AS DOUBLE) / CAST(x.ni AS DOUBLE)),
        |      (acc, t) -> acc + t) AS sterm FROM p),
        |f AS (SELECT sc, k, n,
        |    sterm - CAST(ss * ss AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS between,
        |    CAST(qq AS DOUBLE) - sterm AS within FROM b)
        |SELECT sc AS event_type, k, n,
        |  CASE WHEN k > 1 AND within > 0 THEN
        |    CAST(round(CAST(CAST(CAST(n - k AS DOUBLE) * between
        |      / (CAST(k - 1 AS DOUBLE) * within) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS w
        |FROM f""".stripMargin,
    // q421: exact (ng, Σy, Σy²) cells; per-cell variance one pinned
    // division; the three group-ordered folds replay via seedless
    // list_reduce (0.0 + x == x); ln parity per the MI precedent
    "q421_bartlett" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS VARCHAR) AS g,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT sc, g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(y) AS HUGEINT) AS sg,
        |    sum(CAST(y AS HUGEINT) * y) AS qg FROM e GROUP BY 1, 2),
        |kd AS (SELECT sc, CAST(count(*) AS BIGINT) AS k_dropped
        |  FROM c WHERE ng < 2 GROUP BY 1),
        |k2 AS (SELECT sc, g, ng,
        |    CAST(ng * qg - sg * sg AS DOUBLE)
        |      / CAST(ng * (ng - 1) AS DOUBLE) AS s2
        |  FROM c WHERE ng >= 2),
        |p AS (SELECT sc, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    list(struct_pack(ngd := CAST(ng AS DOUBLE), s2 := s2)
        |      ORDER BY g) AS cells
        |  FROM k2 GROUP BY 1),
        |f AS (SELECT sc, k, n,
        |    list_reduce(list_transform(cells, x -> (x.ngd - 1.0) * x.s2),
        |      (a, t) -> a + t) AS sw,
        |    list_reduce(list_transform(cells, x -> (x.ngd - 1.0) * ln(x.s2)),
        |      (a, t) -> a + t) AS sl,
        |    list_reduce(list_transform(cells, x -> 1.0 / (x.ngd - 1.0)),
        |      (a, t) -> a + t) AS sh,
        |    list_min(list_transform(cells, x -> x.s2)) AS mins2
        |  FROM p),
        |t AS (SELECT sc, k, n, mins2,
        |    sw / CAST(n - k AS DOUBLE) AS sp2, sl, sh,
        |    CAST(n - k AS DOUBLE) AS nk,
        |    1.0 + (sh - 1.0 / CAST(n - k AS DOUBLE))
        |      / (3.0 * CAST(k - 1 AS DOUBLE)) AS cc
        |  FROM f)
        |SELECT t.sc AS event_type, k,
        |  coalesce(kd.k_dropped, 0) AS k_dropped, n,
        |  CASE WHEN k >= 2 AND mins2 > 0 THEN
        |    CAST(round(CAST(CAST(sp2 AS VARCHAR) AS DECIMAL(38,20)), 4)
        |    AS DOUBLE) END AS sp2,
        |  CASE WHEN k >= 2 AND mins2 > 0 THEN
        |    CAST(round(CAST(CAST((nk * ln(sp2) - sl) / cc AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS chi2,
        |  k - 1 AS df
        |FROM t LEFT JOIN kd ON t.sc = kd.sc""".stripMargin,
    // q422: observed-cell-only o·ln(o·N/e) fold in (a, b) order; the
    // even-df survival p replays q356's prepended-seed Poisson series
    "q422_g_test" ->
      """WITH cells AS (SELECT event_type AS a,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS b,
        |    CAST(count(*) AS BIGINT) AS cab FROM events GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |t AS (SELECT cells.a, cells.b,
        |    CAST(cab AS DOUBLE) * ln(CAST(cab AS DOUBLE)
        |      * CAST((SELECT sum(cab) FROM cells) AS DOUBLE)
        |      / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) AS term
        |  FROM cells JOIN ma USING (a) JOIN mb USING (b)),
        |f AS (SELECT list(term ORDER BY a, b) AS terms,
        |    (SELECT CAST(sum(cab) AS BIGINT) FROM cells) AS n,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ma) AS r,
        |    (SELECT CAST(count(*) AS BIGINT) FROM mb) AS c
        |  FROM t),
        |g AS (SELECT n, r, c, CAST((r - 1) * (c - 1) AS BIGINT) AS df,
        |    2.0 * list_reduce(terms, (x, y) -> x + y) AS g
        |  FROM f),
        |h AS (SELECT n, r, c, df, g,
        |    greatest(g, 0.0) / 2.0 AS hh, df // 2 AS m FROM g),
        |p AS (SELECT n, r, c, df, g,
        |    CASE WHEN df % 2 = 0 AND df > 0 THEN
        |      exp(-hh) * list_reduce(list_prepend(
        |        struct_pack(s := CAST(1.0 AS DOUBLE), t := CAST(1.0 AS DOUBLE)),
        |        list_transform(range(1, m), k -> struct_pack(
        |          s := hh / CAST(k AS DOUBLE), t := hh / CAST(k AS DOUBLE)))),
        |        (acc, x) -> struct_pack(
        |          s := acc.s + acc.t * x.t, t := acc.t * x.t)).s
        |    END AS pv
        |  FROM h)
        |SELECT n, r, c, df,
        |  CAST(round(CAST(CAST(g AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS g,
        |  CAST(round(CAST(CAST(pv AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p_value
        |FROM p""".stripMargin,
    // q423: per-(scope, score) exact census; nearest control score via
    // IGNORE-NULLS frame windows (ties pinned toward the LOWER score);
    // the one float fold runs in score order; mean control outcome at
    // the matched score is one pinned division per cell
    "q423_propensity_match" ->
      """WITH b AS (SELECT event_type AS sc,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) + 1 IN (1, 7)
        |      THEN 1 ELSE 0 END AS t,
        |    CAST(round(value * 100) AS BIGINT) AS s,
        |    user_id % 1000 AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT sc, s, CAST(sum(t) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS HUGEINT) AS syt,
        |    CAST(count(*) - sum(t) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS HUGEINT) AS syc
        |  FROM b GROUP BY 1, 2),
        |w AS (SELECT sc, s, nt, syt,
        |    last_value(CASE WHEN nc > 0 THEN
        |        struct_pack(cs := s, cn := nc, cy := syc) END IGNORE NULLS)
        |      OVER (PARTITION BY sc ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS below,
        |    first_value(CASE WHEN nc > 0 THEN
        |        struct_pack(cs := s, cn := nc, cy := syc) END IGNORE NULLS)
        |      OVER (PARTITION BY sc ORDER BY s
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS above
        |  FROM c),
        |m AS (SELECT sc, s, nt, syt,
        |    CASE WHEN below IS NULL THEN above
        |         WHEN above IS NULL THEN below
        |         WHEN s - below.cs <= above.cs - s THEN below
        |         ELSE above END AS ch
        |  FROM w WHERE nt > 0),
        |k AS (SELECT sc, s, nt, syt, ch,
        |    (ch IS NOT NULL AND abs(s - ch.cs) <= 50) AS ok FROM m),
        |p AS (SELECT sc, CAST(sum(nt) AS BIGINT) AS n_treated,
        |    CAST(sum(CASE WHEN ok THEN nt ELSE 0 END) AS BIGINT)
        |      AS n_matched,
        |    CAST(sum(CASE WHEN ok THEN syt ELSE 0 END) AS HUGEINT)
        |      AS syt_m,
        |    list(struct_pack(ntd := CAST(nt AS DOUBLE),
        |        ycbar := CAST(ch.cy AS DOUBLE) / CAST(ch.cn AS DOUBLE))
        |      ORDER BY s) FILTER (WHERE ok) AS cells
        |  FROM k GROUP BY 1),
        |f AS (SELECT sc, n_treated, n_matched, syt_m,
        |    list_reduce(list_transform(cells, x -> x.ntd * x.ycbar),
        |      (a, v) -> a + v) AS sumc
        |  FROM p)
        |SELECT sc AS event_type, n_treated, n_matched,
        |  n_treated - n_matched AS n_unmatched,
        |  CASE WHEN n_matched > 0 THEN
        |    CAST(round(CAST(CAST(CAST(syt_m AS DOUBLE)
        |      / CAST(n_matched AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS mean_t,
        |  CASE WHEN n_matched > 0 THEN
        |    CAST(round(CAST(CAST(sumc / CAST(n_matched AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END
        |    AS mean_c_matched,
        |  CASE WHEN n_matched > 0 THEN
        |    CAST(round(CAST(CAST((CAST(syt_m AS DOUBLE) - sumc)
        |      / CAST(n_matched AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS att
        |FROM f""".stripMargin,
    // q424: five exact HUGEINT moments per side; alpha/beta are ONE
    // division each of exact integers — no float folds anywhere
    "q424_rdd" ->
      """WITH b AS (SELECT event_type AS sc,
        |    CAST(round(value * 100) AS BIGINT) - 5000 AS u,
        |    user_id % 1000 AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |f AS (SELECT sc, CASE WHEN u >= 0 THEN 1 ELSE 0 END AS r,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(u) AS HUGEINT) AS su,
        |    sum(CAST(u AS HUGEINT) * u) AS suu,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(u AS HUGEINT) * y) AS suy
        |  FROM b WHERE u BETWEEN -2000 AND 2000 GROUP BY 1, 2),
        |s AS (SELECT sc, r, n, n * suu - su * su AS det,
        |    sy * suu - su * suy AS anum, n * suy - su * sy AS bnum
        |  FROM f),
        |fit AS (SELECT sc, r, n,
        |    CASE WHEN n >= 2 AND det <> 0 THEN
        |      CAST(anum AS DOUBLE) / CAST(det AS DOUBLE) END AS alpha,
        |    CASE WHEN n >= 2 AND det <> 0 THEN
        |      CAST(bnum AS DOUBLE) / CAST(det AS DOUBLE) END AS beta
        |  FROM s),
        |l AS (SELECT sc, n AS n_l, alpha AS alpha_l, beta AS slope_l
        |  FROM fit WHERE r = 0),
        |rr AS (SELECT sc, n AS n_r, alpha AS alpha_r, beta AS slope_r
        |  FROM fit WHERE r = 1)
        |SELECT coalesce(l.sc, rr.sc) AS event_type,
        |  coalesce(n_l, 0) AS n_l, coalesce(n_r, 0) AS n_r,
        |  CAST(round(CAST(CAST(alpha_l AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS alpha_l,
        |  CAST(round(CAST(CAST(alpha_r AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS alpha_r,
        |  CAST(round(CAST(CAST(slope_l AS VARCHAR) AS DECIMAL(38,20)), 8)
        |    AS DOUBLE) AS slope_l,
        |  CAST(round(CAST(CAST(slope_r AS VARCHAR) AS DECIMAL(38,20)), 8)
        |    AS DOUBLE) AS slope_r,
        |  CAST(round(CAST(CAST(alpha_r - alpha_l AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS effect
        |FROM l FULL JOIN rr ON l.sc = rr.sc""".stripMargin,
    // q425: nine exact HUGEINT moments; every reported slope/ratio is
    // one division of exact n·Σab − Σa·Σb forms
    "q425_iv_wald" ->
      """WITH b AS (SELECT event_type AS sc,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) + 1 IN (1, 7)
        |      THEN 1 ELSE 0 END AS z,
        |    CAST(round(value * 100) AS BIGINT) AS x,
        |    user_id % 1000 AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |g AS (SELECT sc, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(z) AS HUGEINT) AS sz, CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(z AS HUGEINT) * z) AS szz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(z AS HUGEINT) * x) AS szx,
        |    sum(CAST(z AS HUGEINT) * y) AS szy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM b GROUP BY 1),
        |v AS (SELECT sc, n,
        |    n * szx - sz * sx AS czx, n * szy - sz * sy AS czy,
        |    n * sxy - sx * sy AS cxy, n * szz - sz * sz AS vz,
        |    n * sxx - sx * sx AS vx FROM g)
        |SELECT sc AS event_type, n,
        |  CASE WHEN vz <> 0 THEN
        |    CAST(round(CAST(CAST(CAST(czx AS DOUBLE) / CAST(vz AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 8) AS DOUBLE) END
        |    AS first_stage,
        |  CASE WHEN vz <> 0 THEN
        |    CAST(round(CAST(CAST(CAST(czy AS DOUBLE) / CAST(vz AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 8) AS DOUBLE) END
        |    AS reduced_form,
        |  CASE WHEN czx <> 0 THEN
        |    CAST(round(CAST(CAST(CAST(czy AS DOUBLE) / CAST(czx AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END
        |    AS beta_iv,
        |  CASE WHEN vx <> 0 THEN
        |    CAST(round(CAST(CAST(CAST(cxy AS DOUBLE) / CAST(vx AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 8) AS DOUBLE) END
        |    AS beta_ols
        |FROM v""".stripMargin,
    // q426: n-scaled demeaning keeps every moment an exact HUGEINT;
    // Bartlett weights written as (1 - j/5.0) so both engines compute
    // the SAME doubles (1.0 - 0.8 != literal 0.2 in IEEE); one pinned
    // final division
    "q426_kpss" ->
      """WITH dly AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT k, o, x,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS nn,
        |    CAST(sum(x) OVER (PARTITION BY k) AS HUGEINT) AS sx FROM dly),
        |d AS (SELECT k, o, nn, CAST(nn AS HUGEINT) * x - sx AS d FROM b),
        |c AS (SELECT k, nn, d,
        |    CAST(sum(d) OVER (PARTITION BY k ORDER BY o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
        |      AS cumd,
        |    lag(d, 1) OVER (PARTITION BY k ORDER BY o) AS dl1,
        |    lag(d, 2) OVER (PARTITION BY k ORDER BY o) AS dl2,
        |    lag(d, 3) OVER (PARTITION BY k ORDER BY o) AS dl3,
        |    lag(d, 4) OVER (PARTITION BY k ORDER BY o) AS dl4
        |  FROM d),
        |p AS (SELECT k, CAST(max(nn) AS BIGINT) AS n_obs,
        |    sum(cumd * cumd) AS cumd2, sum(d * d) AS g0,
        |    sum(CASE WHEN dl1 IS NOT NULL THEN d * dl1 ELSE 0 END) AS g1,
        |    sum(CASE WHEN dl2 IS NOT NULL THEN d * dl2 ELSE 0 END) AS g2,
        |    sum(CASE WHEN dl3 IS NOT NULL THEN d * dl3 ELSE 0 END) AS g3,
        |    sum(CASE WHEN dl4 IS NOT NULL THEN d * dl4 ELSE 0 END) AS g4
        |  FROM c GROUP BY 1),
        |f AS (SELECT k, n_obs, CAST(cumd2 AS DOUBLE) AS cumd2,
        |    CAST(g0 AS DOUBLE)
        |      + 2.0 * ((1.0 - 1.0/5.0) * CAST(g1 AS DOUBLE)
        |             + (1.0 - 2.0/5.0) * CAST(g2 AS DOUBLE)
        |             + (1.0 - 3.0/5.0) * CAST(g3 AS DOUBLE)
        |             + (1.0 - 4.0/5.0) * CAST(g4 AS DOUBLE)) AS lrv
        |  FROM p)
        |SELECT k AS event_type, n_obs,
        |  CASE WHEN n_obs > 4 AND lrv <> 0 THEN
        |    CAST(round(CAST(CAST(cumd2 / (CAST(n_obs AS DOUBLE) * lrv)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS kpss
        |FROM f""".stripMargin,
    // q427: ordinal codes are exact integers (earlier-index tie pin);
    // the entropy fold runs in code order over <= 6 cells
    "q427_perm_entropy" ->
      """WITH dly AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS a
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT k, a,
        |    lead(a, 1) OVER (PARTITION BY k ORDER BY o) AS b,
        |    lead(a, 2) OVER (PARTITION BY k ORDER BY o) AS c FROM dly),
        |t AS (SELECT k,
        |    (CASE WHEN b < a THEN 1 ELSE 0 END
        |      + CASE WHEN c < a THEN 1 ELSE 0 END) * 100 +
        |    (CASE WHEN a <= b THEN 1 ELSE 0 END
        |      + CASE WHEN c < b THEN 1 ELSE 0 END) * 10 +
        |    (CASE WHEN a <= c THEN 1 ELSE 0 END
        |      + CASE WHEN b <= c THEN 1 ELSE 0 END) AS code
        |  FROM w WHERE b IS NOT NULL AND c IS NOT NULL),
        |cn AS (SELECT k, code, CAST(count(*) AS BIGINT) AS cnt
        |  FROM t GROUP BY 1, 2),
        |p AS (SELECT k, CAST(sum(cnt) AS BIGINT) AS n_windows,
        |    CAST(count(*) AS BIGINT) AS n_patterns,
        |    list(CAST(cnt AS DOUBLE) ORDER BY code) AS cells
        |  FROM cn GROUP BY 1),
        |h AS (SELECT k, n_windows, n_patterns,
        |    -list_reduce(list_transform(cells,
        |      x -> (x / CAST(n_windows AS DOUBLE))
        |        * ln(x / CAST(n_windows AS DOUBLE))),
        |      (u, v) -> u + v) AS h
        |  FROM p)
        |SELECT k AS event_type, n_windows, n_patterns,
        |  CAST(round(CAST(CAST(h AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS h,
        |  CAST(round(CAST(CAST(h / ln(6.0) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS h_norm
        |FROM h""".stripMargin,
    // q428: nine exact HUGEINT moments from one lag pass; centered
    // moments exact; the Cramer 2-regressor algebra is one fixed
    // double shape both engines replay
    "q428_granger" ->
      """WITH dly AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS y,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT k, y,
        |    lag(y, 1) OVER (PARTITION BY k ORDER BY o) AS a,
        |    lag(x, 1) OVER (PARTITION BY k ORDER BY o) AS b FROM dly),
        |f AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a) AS HUGEINT) AS sa, CAST(sum(b) AS HUGEINT) AS sb,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(a AS HUGEINT) * a) AS saa,
        |    sum(CAST(b AS HUGEINT) * b) AS sbb,
        |    sum(CAST(a AS HUGEINT) * b) AS sab,
        |    sum(CAST(a AS HUGEINT) * y) AS say,
        |    sum(CAST(b AS HUGEINT) * y) AS sby,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM l WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY 1),
        |c AS (SELECT k, n,
        |    CAST(n * saa - sa * sa AS DOUBLE) AS caa,
        |    CAST(n * sbb - sb * sb AS DOUBLE) AS cbb,
        |    CAST(n * sab - sa * sb AS DOUBLE) AS cab,
        |    CAST(n * say - sa * sy AS DOUBLE) AS cay,
        |    CAST(n * sby - sb * sy AS DOUBLE) AS cby,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS cyy
        |  FROM f),
        |g AS (SELECT k, n, caa, cbb, cab, cay, cby, cyy,
        |    caa * cbb - cab * cab AS det FROM c),
        |r AS (SELECT k, n, det, caa, cay, cby, cyy,
        |    cyy - cay * cay / caa AS rssr,
        |    (cay * cbb - cby * cab) / det AS beta_a,
        |    (cby * caa - cay * cab) / det AS beta_b FROM g),
        |e AS (SELECT k, n, det, caa, rssr, beta_b,
        |    cyy - (beta_a * cay + beta_b * cby) AS rssf FROM r)
        |SELECT k AS event_type, n,
        |  CASE WHEN n > 3 AND caa <> 0 AND det <> 0 AND rssf > 0 THEN
        |    CAST(round(CAST(CAST(beta_b AS VARCHAR) AS DECIMAL(38,20)), 8)
        |    AS DOUBLE) END AS beta_x,
        |  CASE WHEN n > 3 AND caa <> 0 AND det <> 0 AND rssf > 0 THEN
        |    CAST(round(CAST(CAST((rssr - rssf)
        |      / (rssf / CAST(n - 3 AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS f
        |FROM e""".stripMargin,
    // q429: complete-block contract (ni = k) with loud drops; exact
    // item/total moments; the one float fold runs in item order
    "q429_cronbach" ->
      """WITH cell AS (SELECT user_id AS b, event_type AS i,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS k FROM cell),
        |pb AS (SELECT b, CAST(count(*) AS BIGINT) AS ni,
        |    CAST(sum(v) AS HUGEINT) AS t FROM cell GROUP BY 1),
        |kept AS (SELECT b, t FROM pb CROSS JOIN kk WHERE ni = kk.k),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks_dropped
        |  FROM pb CROSS JOIN kk WHERE ni <> kk.k),
        |kc AS (SELECT cell.i, cell.v FROM cell JOIN kept USING (b)),
        |item AS (SELECT i, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(v) AS HUGEINT) AS si, CAST(sum(v * v) AS HUGEINT)
        |      AS qi FROM kc GROUP BY 1),
        |it2 AS (SELECT i, CAST(nb * qi - si * si AS DOUBLE)
        |    / CAST(nb * (nb - 1) AS DOUBLE) AS s2
        |  FROM item WHERE nb >= 2),
        |fold AS (SELECT coalesce(list_reduce(list_transform(
        |    list(struct_pack(i := i, s2 := s2) ORDER BY i), x -> x.s2),
        |    (a, v) -> a + v), 0.0) AS sum_si2 FROM it2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(t) AS HUGEINT) AS st,
        |    CAST(sum(t * t) AS HUGEINT) AS qt FROM kept),
        |st2 AS (SELECT n_blocks, st, qt,
        |    CAST(n_blocks * qt - st * st AS DOUBLE)
        |      / CAST(n_blocks * (n_blocks - 1) AS DOUBLE) AS s_t2
        |  FROM tot)
        |SELECT n_blocks, n_blocks_dropped, kk.k AS k,
        |  CASE WHEN kk.k >= 2 AND n_blocks >= 2 AND s_t2 <> 0 THEN
        |    CAST(round(CAST(CAST((CAST(kk.k AS DOUBLE)
        |      / CAST(kk.k - 1 AS DOUBLE)) * (1.0 - sum_si2 / s_t2)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS alpha
        |FROM st2 CROSS JOIN kk CROSS JOIN fold CROSS JOIN drp""".stripMargin,
    // q430: the q336 census plus one exact moment (sum ng^2); Searle's
    // k0 and the ICC ratio are pinned double shapes
    "q430_icc" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CAST(user_id % 50 AS VARCHAR) AS g,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT sc, g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(y) AS HUGEINT) AS sg,
        |    sum(CAST(y AS HUGEINT) * y) AS qg FROM e GROUP BY 1, 2),
        |p AS (SELECT sc, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS HUGEINT) AS s, CAST(sum(qg) AS HUGEINT) AS q,
        |    sum(CAST(ng AS HUGEINT) * ng) AS sn2,
        |    list(struct_pack(sgd := CAST(sg AS DOUBLE),
        |      ngd := CAST(ng AS DOUBLE)) ORDER BY g) AS cells
        |  FROM c GROUP BY 1),
        |b AS (SELECT sc, k, n, s, q, sn2,
        |    list_reduce(list_transform(cells, x -> x.sgd * x.sgd / x.ngd),
        |      (acc, t) -> acc + t) AS between FROM p),
        |f AS (SELECT sc, k, n,
        |    (between - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE) AS msb,
        |    (CAST(q AS DOUBLE) - between) / CAST(n - k AS DOUBLE) AS msw,
        |    (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      / CAST(k - 1 AS DOUBLE) AS k0
        |  FROM b)
        |SELECT sc AS event_type, k, n,
        |  CASE WHEN k > 1 THEN CAST(round(CAST(CAST(msb AS VARCHAR)
        |    AS DECIMAL(38,20)), 4) AS DOUBLE) END AS msb,
        |  CASE WHEN n > k THEN CAST(round(CAST(CAST(msw AS VARCHAR)
        |    AS DECIMAL(38,20)), 4) AS DOUBLE) END AS msw,
        |  CASE WHEN k > 1 THEN CAST(round(CAST(CAST(k0 AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS k0,
        |  CASE WHEN k > 1 AND n > k
        |      AND msb + (k0 - 1.0) * msw <> 0 THEN
        |    CAST(round(CAST(CAST((msb - msw) / (msb + (k0 - 1.0) * msw)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS icc
        |FROM f""".stripMargin,
    // q431: d and the doubled mean stay exact integers; bias/SD/slope
    // are pinned double shapes (sqrt is correctly rounded both sides)
    "q431_bland_altman" ->
      """WITH dly AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS a,
        |    sum(CASE WHEN event_type = 'view'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS b
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |m AS (SELECT a - b AS d, a + b AS m FROM dly
        |  WHERE a IS NOT NULL AND b IS NOT NULL),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(d) AS HUGEINT) AS sd1,
        |    sum(CAST(d AS HUGEINT) * d) AS sdd,
        |    CAST(sum(m) AS HUGEINT) AS sm,
        |    sum(CAST(m AS HUGEINT) * m) AS smm,
        |    sum(CAST(d AS HUGEINT) * m) AS sdm FROM m),
        |v AS (SELECT n,
        |    CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
        |    sqrt(CAST(n * sdd - sd1 * sd1 AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE)) AS sd_d,
        |    n * smm - sm * sm AS varm,
        |    n * sdm - sd1 * sm AS covdm FROM g)
        |SELECT n,
        |  CASE WHEN n > 0 THEN CAST(round(CAST(CAST(bias AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS bias,
        |  CASE WHEN n > 1 THEN CAST(round(CAST(CAST(sd_d AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS sd_d,
        |  CASE WHEN n > 1 THEN CAST(round(CAST(CAST(bias - 1.96 * sd_d
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS loa_lo,
        |  CASE WHEN n > 1 THEN CAST(round(CAST(CAST(bias + 1.96 * sd_d
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS loa_hi,
        |  CASE WHEN varm <> 0 THEN
        |    CAST(round(CAST(CAST(2.0 * CAST(covdm AS DOUBLE)
        |      / CAST(varm AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(38,20)), 8) AS DOUBLE) END AS slope_vs_mean
        |FROM v""".stripMargin,
    // q432: factorial-free hypergeometric via the MODE-anchored ratio
    // recurrence (r12: anchor moved amin -> mode so unimodality bounds
    // every mass ≤ 1 — an amin-anchored product overflows past support
    // ~10³); each u(av) is a 1.0-seeded prefix product in ascending j
    // order on the matching side of the mode; support sums fold in av
    // order with ELSE-0.0 masking
    "q432_fisher_exact" ->
      """WITH b AS (SELECT
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS a,
        |    CASE WHEN value > 90.0 THEN 1 ELSE 0 END AS bb
        |  FROM events WHERE user_id < 20),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a = 1 AND bb = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n11,
        |    CAST(sum(CASE WHEN a = 1 AND bb = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN a = 0 AND bb = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN a = 0 AND bb = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00 FROM b),
        |m AS (SELECT *, n11 + n10 AS r1, n01 + n00 AS r2,
        |    n11 + n01 AS c1 FROM c),
        |s AS (SELECT *, greatest(0, c1 - r2) AS amin,
        |    least(r1, c1) AS amax FROM m),
        |s2 AS (SELECT *, least(greatest(
        |    (r1 + 1) * (c1 + 1) // (n + 2), amin), amax) AS am FROM s),
        |rws AS (SELECT s2.*, unnest(range(amin, amax + 1)) AS av FROM s2),
        |u AS (SELECT n, n11, n10, n01, n00, av,
        |    CASE WHEN av = am THEN 1.0
        |    WHEN av > am THEN list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |      list_transform(range(am, av), j ->
        |        CAST((r1 - j) * (c1 - j) AS DOUBLE)
        |          / CAST((j + 1) * (r2 - c1 + j + 1) AS DOUBLE))),
        |      (acc, x) -> acc * x)
        |    ELSE list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |      list_transform(range(av, am), j ->
        |        CAST((j + 1) * (r2 - c1 + j + 1) AS DOUBLE)
        |          / CAST((r1 - j) * (c1 - j) AS DOUBLE))),
        |      (acc, x) -> acc * x) END AS u
        |  FROM rws),
        |p AS (SELECT n, n11, n10, n01, n00,
        |    list(struct_pack(av := av, u := u) ORDER BY av) AS cells
        |  FROM u GROUP BY 1, 2, 3, 4, 5),
        |f AS (SELECT n, n11, n10, n01, n00, cells,
        |    list_reduce(list_transform(cells, x -> x.u),
        |      (acc, v) -> acc + v) AS tot,
        |    list_filter(cells, x -> x.av = n11)[1].u AS uobs FROM p)
        |SELECT n, n11, n10, n01, n00,
        |  CAST(round(CAST(CAST(list_reduce(list_transform(cells,
        |    x -> CASE WHEN x.u <= uobs * (1.0 + 1e-7) THEN x.u
        |      ELSE 0.0 END), (acc, v) -> acc + v) / tot AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS p_two,
        |  CAST(round(CAST(CAST(list_reduce(list_transform(cells,
        |    x -> CASE WHEN x.av <= n11 THEN x.u ELSE 0.0 END),
        |    (acc, v) -> acc + v) / tot AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS p_left,
        |  CAST(round(CAST(CAST(list_reduce(list_transform(cells,
        |    x -> CASE WHEN x.av >= n11 THEN x.u ELSE 0.0 END),
        |    (acc, v) -> acc + v) / tot AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS p_right
        |FROM f""".stripMargin,
    // q433: the q249 deterministic tie-run deciles; per-bucket terms
    // are pinned double shapes, folded in bucket order with loud
    // degenerate-bucket drops; q356's prepended-seed survival series
    "q433_hosmer_lemeshow" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS s,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |      THEN 1 ELSE 0 END AS p
        |  FROM events),
        |c AS (SELECT g, s, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS np FROM s GROUP BY 1, 2),
        |w AS (SELECT g, s, n, np,
        |    COALESCE(SUM(n) OVER (PARTITION BY g ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
        |    SUM(n) OVER (PARTITION BY g) AS tot FROM c),
        |a AS (SELECT g, LEAST(9, (bef * 10) // tot) AS bucket,
        |    CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(s * n) AS BIGINT) AS ss FROM w GROUP BY 1, 2),
        |t AS (SELECT g, bucket, n, n_pos,
        |    (CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0 AS pbar
        |  FROM a),
        |t2 AS (SELECT g, bucket, n, n_pos, pbar,
        |    (pbar > 0 AND pbar < 1) AS ok,
        |    (CAST(n_pos AS DOUBLE) - CAST(n AS DOUBLE) * pbar)
        |      * (CAST(n_pos AS DOUBLE) - CAST(n AS DOUBLE) * pbar)
        |      / (CAST(n AS DOUBLE) * pbar * (1.0 - pbar)) AS term
        |  FROM t),
        |per AS (SELECT g, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_buckets,
        |    CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_buckets_dropped,
        |    coalesce(list_reduce(list_transform(
        |      list(struct_pack(bucket := bucket, t := term)
        |        ORDER BY bucket) FILTER (WHERE ok), x -> x.t),
        |      (acc, v) -> acc + v), 0.0) AS hl_raw
        |  FROM t2 GROUP BY 1),
        |h AS (SELECT g, n, n_buckets, n_buckets_dropped,
        |    CASE WHEN n_buckets > 2 THEN hl_raw END AS hl,
        |    n_buckets - 2 AS df,
        |    greatest(hl_raw, 0.0) / 2.0 AS hh,
        |    (n_buckets - 2) // 2 AS m FROM per),
        |pp AS (SELECT g, n, n_buckets, n_buckets_dropped, hl, df,
        |    CASE WHEN df % 2 = 0 AND df > 0 THEN
        |      exp(-hh) * CASE WHEN m > 1 THEN
        |        list_reduce(list_prepend(
        |          struct_pack(s := CAST(1.0 AS DOUBLE),
        |            t := CAST(1.0 AS DOUBLE)),
        |          list_transform(range(1, m), k -> struct_pack(
        |            s := hh / CAST(k AS DOUBLE),
        |            t := hh / CAST(k AS DOUBLE)))),
        |          (acc, x) -> struct_pack(
        |            s := acc.s + acc.t * x.t, t := acc.t * x.t)).s
        |      ELSE 1.0 END
        |    END AS pv
        |  FROM h)
        |SELECT g AS event_type, n, n_buckets, n_buckets_dropped,
        |  CAST(round(CAST(CAST(hl AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS hl,
        |  df,
        |  CAST(round(CAST(CAST(pv AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p_value
        |FROM pp""".stripMargin,
    // q434: four exact cells; MCC numerator/margins exact HUGEINT,
    // one sqrt + one division; F1/accuracy single divisions
    "q434_mcc" ->
      """WITH b AS (SELECT event_type AS g,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS p,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |      THEN 1 ELSE 0 END AS y
        |  FROM events),
        |c AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn
        |  FROM b GROUP BY 1)
        |SELECT g AS event_type, n, tp, fp, fn, tn,
        |  CAST(round(CAST(CAST(CAST(tp + tn AS DOUBLE)
        |    / CAST(n AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS acc,
        |  CASE WHEN 2 * tp + fp + fn > 0 THEN
        |    CAST(round(CAST(CAST(CAST(2 * tp AS DOUBLE)
        |      / CAST(2 * tp + fp + fn AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS f1,
        |  CASE WHEN CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp)
        |      * (tn + fn) <> 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
        |        AS DOUBLE)
        |      / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn)
        |        * (tn + fp) * (tn + fn) AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS mcc
        |FROM c""".stripMargin,
    // q435: doubled midranks keep combined AND within-group ranks
    // integer (the q283 census convention); all moments HUGEINT; the
    // W/df/p-hat shapes replay literally
    "q435_brunner_munzel" ->
      """WITH e AS (SELECT event_type AS sc,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) + 1 IN (1, 7)
        |      THEN 1 ELSE 0 END AS is2,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT sc, v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(is2) AS BIGINT) AS t2 FROM e GROUP BY 1, 2),
        |c2 AS (SELECT sc, v, t, t2, t - t2 AS t1 FROM c),
        |r AS (SELECT sc, v, t, t1, t2,
        |    2 * coalesce(sum(t) OVER w, 0) + t + 1 AS r2,
        |    2 * coalesce(sum(t1) OVER w, 0) + t1 + 1 AS r21,
        |    2 * coalesce(sum(t2) OVER w, 0) + t2 + 1 AS r22
        |  FROM c2 WINDOW w AS (PARTITION BY sc ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |d AS (SELECT sc, t1, t2, r2, r2 - r21 AS d1, r2 - r22 AS d2
        |  FROM r),
        |g AS (SELECT sc, CAST(sum(t1) AS BIGINT) AS n1,
        |    CAST(sum(t2) AS BIGINT) AS n2,
        |    sum(CAST(t1 AS HUGEINT) * r2) AS sr1,
        |    sum(CAST(t2 AS HUGEINT) * r2) AS sr2,
        |    sum(CAST(t1 AS HUGEINT) * d1) AS sd1,
        |    sum(CAST(t1 AS HUGEINT) * d1 * d1) AS sq1,
        |    sum(CAST(t2 AS HUGEINT) * d2) AS sd2,
        |    sum(CAST(t2 AS HUGEINT) * d2 * d2) AS sq2
        |  FROM d GROUP BY 1),
        |s AS (SELECT sc, n1, n2,
        |    CAST(n1 * sq1 - sd1 * sd1 AS DOUBLE)
        |      / CAST(4 * CAST(n1 AS HUGEINT) * (n1 - 1) AS DOUBLE) AS s1,
        |    CAST(n2 * sq2 - sd2 * sd2 AS DOUBLE)
        |      / CAST(4 * CAST(n2 AS HUGEINT) * (n2 - 1) AS DOUBLE) AS s2,
        |    CAST(sr1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE)) AS rbar1,
        |    CAST(sr2 AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE)) AS rbar2
        |  FROM g),
        |vv AS (SELECT sc, n1, n2, rbar1, rbar2,
        |    CAST(n1 AS DOUBLE) * s1 AS v1, CAST(n2 AS DOUBLE) * s2 AS v2
        |  FROM s)
        |SELECT sc AS event_type, n1, n2,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    CAST(round(CAST(CAST((rbar2 - (CAST(n2 AS DOUBLE) + 1.0)
        |      / 2.0) / CAST(n1 AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS p_hat,
        |  CASE WHEN n1 > 1 AND n2 > 1 AND v1 + v2 > 0 THEN
        |    CAST(round(CAST(CAST(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (rbar2 - rbar1) / ((CAST(n1 AS DOUBLE)
        |      + CAST(n2 AS DOUBLE)) * sqrt(v1 + v2)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS w,
        |  CASE WHEN n1 > 1 AND n2 > 1 AND v1 + v2 > 0 THEN
        |    CAST(round(CAST(CAST((v1 + v2) * (v1 + v2)
        |      / (v1 * v1 / CAST(n1 - 1 AS DOUBLE)
        |        + v2 * v2 / CAST(n2 - 1 AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 4) AS DOUBLE) END AS df_w
        |FROM vv""".stripMargin,
    // q436: n4-scaled all-integer double-centering — every centered
    // factor and the three pair sums are exact HUGEINTs; only the
    // final divisions and sqrts are float, in one pinned shape
    "q436_distance_corr" ->
      """WITH dly AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS a,
        |    sum(CASE WHEN event_type = 'view'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS b
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |pts AS (SELECT a AS x, b AS y FROM dly
        |  WHERE a IS NOT NULL AND b IS NOT NULL),
        |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
        |  FROM pts GROUP BY 1, 2),
        |rs AS (SELECT p.x, p.y, p.c,
        |    CAST(sum(q.c * CAST(abs(p.x - q.x) AS HUGEINT)) AS HUGEINT)
        |      AS rx,
        |    CAST(sum(q.c * CAST(abs(p.y - q.y) AS HUGEINT)) AS HUGEINT)
        |      AS ry
        |  FROM cells p CROSS JOIN cells q GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(sum(c * rx) AS HUGEINT) AS tx,
        |    CAST(sum(c * ry) AS HUGEINT) AS ty FROM rs),
        |pr AS (SELECT p.c AS cp, q.c AS cq,
        |    CAST(n AS HUGEINT) * n * abs(p.x - q.x)
        |      - CAST(n AS HUGEINT) * p.rx - CAST(n AS HUGEINT) * q.rx
        |      + tx AS ax,
        |    CAST(n AS HUGEINT) * n * abs(p.y - q.y)
        |      - CAST(n AS HUGEINT) * p.ry - CAST(n AS HUGEINT) * q.ry
        |      + ty AS by
        |  FROM rs p CROSS JOIN rs q CROSS JOIN tot),
        |sums AS (SELECT
        |    sum(CAST(cp AS HUGEINT) * cq * ax * by) AS sab,
        |    sum(CAST(cp AS HUGEINT) * cq * ax * ax) AS saa,
        |    sum(CAST(cp AS HUGEINT) * cq * by * by) AS sbb FROM pr),
        |f AS (SELECT n, n_cells,
        |    CAST(sab AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE)) AS dcov2,
        |    CAST(saa AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE)) AS dvx,
        |    CAST(sbb AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE)) AS dvy
        |  FROM sums CROSS JOIN tot)
        |SELECT n, n_cells,
        |  CAST(round(CAST(CAST(dcov2 AS VARCHAR) AS DECIMAL(38,20)), 4)
        |    AS DOUBLE) AS dcov2,
        |  CAST(round(CAST(CAST(dvx AS VARCHAR) AS DECIMAL(38,20)), 4)
        |    AS DOUBLE) AS dvar_x,
        |  CAST(round(CAST(CAST(dvy AS VARCHAR) AS DECIMAL(38,20)), 4)
        |    AS DOUBLE) AS dvar_y,
        |  CASE WHEN dvx > 0 AND dvy > 0 THEN
        |    CAST(round(CAST(CAST(sqrt(dcov2 / sqrt(dvx * dvy))
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS dcor
        |FROM f""".stripMargin,
    // q437: the argmax key |n*x - sum| is an exact integer with the
    // (dev desc, id asc) pinned order; g/mean/sd pinned double shapes
    "q437_grubbs" ->
      """WITH e AS (SELECT event_type AS g, event_id AS id,
        |    CAST(round(value * 100) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |t AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS s,
        |    sum(CAST(x AS HUGEINT) * x) AS q FROM e GROUP BY 1),
        |j AS (SELECT e.g, e.id, e.x,
        |    abs(CAST(t.n AS HUGEINT) * e.x - t.s) AS dev,
        |    t.n, t.s, t.q,
        |    row_number() OVER (PARTITION BY e.g
        |      ORDER BY abs(CAST(t.n AS HUGEINT) * e.x - t.s) DESC, e.id)
        |      AS rn
        |  FROM e JOIN t ON e.g = t.g),
        |top AS (SELECT g, n, s, q, id, x, dev FROM j WHERE rn = 1),
        |v AS (SELECT g, n, s, id, x, dev,
        |    CAST(n * q - s * s AS DOUBLE)
        |      / CAST(n * (CAST(n AS HUGEINT) - 1) AS DOUBLE) AS vr
        |  FROM top)
        |SELECT g AS event_type, n, id AS outlier_id, x AS outlier_value,
        |  CASE WHEN n > 1 AND vr > 0 THEN
        |    CAST(round(CAST(CAST(CAST(dev AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * sqrt(vr)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS g_stat,
        |  CAST(round(CAST(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS mean,
        |  CASE WHEN n > 1 THEN
        |    CAST(round(CAST(CAST(sqrt(vr) AS VARCHAR)
        |    AS DECIMAL(38,20)), 4) AS DOUBLE) END AS sd
        |FROM v""".stripMargin,
    // q438: q271 tokenization; top-30 pinned (count desc, word asc);
    // full source x word grid so zero cells weigh into mu/sigma; every
    // fold ordered (source order for mu/sigma, word order for delta)
    "q438_burrows_delta" ->
      """WITH t AS (SELECT lang AS s, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0)) AS w
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |top AS (SELECT w FROM (SELECT w, count(*) AS cw FROM t GROUP BY 1
        |  ORDER BY cw DESC, w LIMIT 30)),
        |tot AS (SELECT s, CAST(count(*) AS BIGINT) AS nt FROM t
        |  GROUP BY 1),
        |cell AS (SELECT t.s, t.w, CAST(count(*) AS BIGINT) AS c
        |  FROM t JOIN top USING (w) GROUP BY 1, 2),
        |grid AS (SELECT tot.s, top.w,
        |    CAST(coalesce(cell.c, 0) AS DOUBLE) / CAST(tot.nt AS DOUBLE)
        |      AS f
        |  FROM tot CROSS JOIN top
        |  LEFT JOIN cell ON cell.s = tot.s AND cell.w = top.w),
        |st AS (SELECT w, CAST(count(*) AS BIGINT) AS ns,
        |    list(struct_pack(s := s, f := f) ORDER BY s, f) AS cells
        |  FROM grid GROUP BY 1),
        |ms AS (SELECT w, ns,
        |    coalesce(list_reduce(list_transform(cells, x -> x.f),
        |      (a, v) -> a + v), 0.0) AS sf,
        |    coalesce(list_reduce(list_transform(cells, x -> x.f * x.f),
        |      (a, v) -> a + v), 0.0) AS sq
        |  FROM st),
        |ws AS (SELECT w,
        |    sf / CAST(ns AS DOUBLE) AS mu,
        |    sqrt(greatest(sq / CAST(ns AS DOUBLE)
        |      - (sf / CAST(ns AS DOUBLE)) * (sf / CAST(ns AS DOUBLE)),
        |      0.0)) AS sigma
        |  FROM ms),
        |z AS (SELECT grid.s, grid.w, ws.sigma,
        |    CASE WHEN ws.sigma > 0 THEN (grid.f - ws.mu) / ws.sigma END
        |      AS z
        |  FROM grid JOIN ws USING (w)),
        |p AS (SELECT a.s AS src_a, b.s AS src_b, a.w, a.sigma,
        |    abs(a.z - b.z) AS dz
        |  FROM z a JOIN z b ON a.w = b.w AND a.s < b.s),
        |agg AS (SELECT src_a, src_b,
        |    CAST(sum(CASE WHEN sigma > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_words,
        |    CAST(sum(CASE WHEN sigma > 0 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_words_dropped,
        |    coalesce(list_reduce(list_transform(
        |      list(struct_pack(w := w, dz := dz) ORDER BY w, dz)
        |        FILTER (WHERE sigma > 0), x -> x.dz),
        |      (a, v) -> a + v), 0.0) AS sdz
        |  FROM p GROUP BY 1, 2)
        |SELECT src_a, src_b, n_words, n_words_dropped,
        |  CASE WHEN n_words > 0 THEN
        |    CAST(round(CAST(CAST(sdz / CAST(n_words AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS delta
        |FROM agg""".stripMargin,
    // q439: DuckDB's damerau_levenshtein IS the byte-level
    // Lowrance-Wagner kernel the codegen expression pins to
    // (probe-verified: dl('CA','ABC')=2, bytes not codepoints)
    "q439_damerau" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |p AS (SELECT id, substring(name, 1, 16) || substring(name, 18, 1)
        |    || substring(name, 17, 1) AS typo
        |  FROM c WHERE id % 7 = 0)
        |SELECT c.id, CAST(damerau_levenshtein(c.name, p.typo) AS BIGINT)
        |    AS dl,
        |  CAST(levenshtein(c.name, p.typo) AS BIGINT) AS lev
        |FROM c JOIN p ON c.id = p.id""".stripMargin,
    // q440: rapidfuzz's token_sort trick declaratively; ASCII English
    // docs keep Spark codepoint and DuckDB byte levenshtein identical
    "q440_token_sort_ratio" ->
      """WITH b AS (SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS toks
        |  FROM documents WHERE lang = 'en' AND doc_id < 120),
        |k AS (SELECT doc_id, toks FROM b WHERE len(toks) >= 2),
        |p AS (SELECT doc_id,
        |    array_to_string(toks, ' ') AS a,
        |    array_to_string(list_concat(['zzz'],
        |      list_slice(list_reverse(toks), 2, 1000000)), ' ') AS bb,
        |    array_to_string(list_sort(toks), ' ') AS sa,
        |    array_to_string(list_sort(list_concat(['zzz'],
        |      list_slice(list_reverse(toks), 2, 1000000))), ' ') AS sb
        |  FROM k)
        |SELECT doc_id,
        |  CAST(levenshtein(a, bb) AS BIGINT) AS lev_raw,
        |  CAST(levenshtein(sa, sb) AS BIGINT) AS lev_sorted,
        |  CAST(round(CAST(CAST(1.0 - CAST(levenshtein(a, bb) AS DOUBLE)
        |    / CAST(greatest(length(a), length(bb)) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS ratio_raw,
        |  CAST(round(CAST(CAST(1.0 - CAST(levenshtein(sa, sb) AS DOUBLE)
        |    / CAST(greatest(length(sa), length(sb)) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS ratio_sorted
        |FROM p""".stripMargin,
    // q441: the q292 quantization; per-label W/B numerators exact
    // HUGEINT; SSW/SSB fold per-label pinned ratios in label order;
    // CH computed on the QUANTIZED sums (scale^2 cancels)
    "q441_calinski_harabasz" ->
      """WITH e AS (SELECT label AS lab, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xq
        |  FROM embeddings),
        |cd AS (SELECT lab, t.dim, CAST(count(*) AS BIGINT) AS nc,
        |    CAST(sum(xq[t.dim]) AS HUGEINT) AS s,
        |    sum(CAST(xq[t.dim] AS HUGEINT) * xq[t.dim]) AS q
        |  FROM e, generate_series(1, 64) t(dim) GROUP BY 1, 2),
        |g AS (SELECT dim, CAST(sum(s) AS HUGEINT) AS gd,
        |    CAST(sum(nc) AS BIGINT) AS n FROM cd GROUP BY 1),
        |j AS (SELECT cd.lab, cd.nc, g.n, nc * q - s * s AS wterm,
        |    CAST(g.n AS HUGEINT) * s - CAST(nc AS HUGEINT) * gd AS bb
        |  FROM cd JOIN g USING (dim)),
        |pl AS (SELECT lab, max(nc) AS nc, max(n) AS n,
        |    CAST(sum(wterm) AS HUGEINT) AS wc,
        |    CAST(sum(bb * bb) AS HUGEINT) AS bc FROM j GROUP BY 1),
        |f AS (SELECT n, CAST(count(*) AS BIGINT) AS k,
        |    list(struct_pack(lab := lab,
        |      wt := CAST(wc AS DOUBLE) / CAST(nc AS DOUBLE),
        |      bt := CAST(bc AS DOUBLE)
        |        / CAST(CAST(nc AS HUGEINT) * n * n AS DOUBLE))
        |      ORDER BY lab) AS cells
        |  FROM pl GROUP BY 1),
        |s2 AS (SELECT n, k,
        |    list_reduce(list_transform(cells, x -> x.wt),
        |      (a, v) -> a + v) AS ssw,
        |    list_reduce(list_transform(cells, x -> x.bt),
        |      (a, v) -> a + v) AS ssb
        |  FROM f)
        |SELECT n, k, CAST(64 AS BIGINT) AS dims,
        |  CAST(round(CAST(CAST(ssb / 1000000000000.0 AS VARCHAR)
        |    AS DECIMAL(38,20)), 4) AS DOUBLE) AS ssb,
        |  CAST(round(CAST(CAST(ssw / 1000000000000.0 AS VARCHAR)
        |    AS DECIMAL(38,20)), 4) AS DOUBLE) AS ssw,
        |  CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
        |    CAST(round(CAST(CAST((ssb / CAST(k - 1 AS DOUBLE))
        |      / (ssw / CAST(n - k AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS ch
        |FROM s2""".stripMargin,
    // q442: q292's exact own-centroid numerators + round-12 decimal
    // distance means; centroid-pair numerators exact; max-rival and
    // the final fold in label order
    "q442_davies_bouldin" ->
      """WITH e AS (SELECT label AS lab, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xq
        |  FROM embeddings),
        |cd AS (SELECT lab, t.dim, CAST(sum(xq[t.dim]) AS BIGINT) AS s
        |  FROM e, generate_series(1, 64) t(dim) GROUP BY 1, 2),
        |cent AS (SELECT lab, list(s ORDER BY dim) AS cs FROM cd
        |  GROUP BY 1),
        |nn AS (SELECT lab, CAST(count(*) AS BIGINT) AS n FROM e
        |  GROUP BY 1),
        |c2 AS (SELECT cent.lab, cs, n FROM cent JOIN nn USING (lab)),
        |dpt AS (SELECT e.lab,
        |    sqrt(CAST(list_sum(list_transform(range(1, 65), i ->
        |      CAST(c.n * e.xq[i] - c.cs[i] AS HUGEINT)
        |      * CAST(c.n * e.xq[i] - c.cs[i] AS HUGEINT))) AS DOUBLE))
        |    / CAST(c.n AS DOUBLE) AS d
        |  FROM e JOIN c2 c ON e.lab = c.lab),
        |sp AS (SELECT lab, CAST(count(*) AS BIGINT) AS nc,
        |    CAST(sum(round(CAST(CAST(d AS VARCHAR) AS DECIMAL(38,20)),
        |      12)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS sc
        |  FROM dpt GROUP BY 1),
        |pr AS (SELECT a.lab AS la, b.lab AS lb,
        |    sqrt(CAST(list_sum(list_transform(range(1, 65), i ->
        |      CAST(b.n * a.cs[i] - a.n * b.cs[i] AS HUGEINT)
        |      * CAST(b.n * a.cs[i] - a.n * b.cs[i] AS HUGEINT)))
        |      AS DOUBLE))
        |    / CAST(CAST(a.n AS HUGEINT) * b.n AS DOUBLE) AS dc
        |  FROM c2 a JOIN c2 b ON a.lab <> b.lab),
        |rr AS (SELECT pr.la,
        |    max((spa.sc + spb.sc) / pr.dc) AS rmax
        |  FROM pr JOIN sp spa ON spa.lab = pr.la
        |  JOIN sp spb ON spb.lab = pr.lb GROUP BY 1),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    list(struct_pack(la := la, rmax := rmax) ORDER BY la)
        |      AS cells FROM rr),
        |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
        |SELECT n, k,
        |  CASE WHEN k > 1 THEN
        |    CAST(round(CAST(CAST(list_reduce(list_transform(cells,
        |      x -> x.rmax), (a, v) -> a + v) / CAST(k AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS db
        |FROM f CROSS JOIN n2""".stripMargin,
    // q443: 4 unrolled Katz rounds; every walk mass an exact floored
    // integral (the q169/q245 discipline); accumulation exact HUGEINT
    "q443_katz" -> {
      val base =
        """WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
          |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
          |e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
          |ed AS (SELECT u AS src, v AS dst FROM e0
          |  UNION ALL SELECT v, u FROM e0),
          |nodes AS (SELECT DISTINCT src AS node FROM ed
          |  UNION SELECT dst FROM ed),
          |s0 AS (SELECT node, CAST(1000000000 AS HUGEINT) AS m,
          |  CAST(0 AS HUGEINT) AS kz FROM nodes)""".stripMargin
      val rounds = (1 to 4).map { i =>
        s"""mi$i AS (SELECT ed.dst AS node,
           |    CAST(sum(s${i - 1}.m // 5) AS HUGEINT) AS mi
           |  FROM ed JOIN s${i - 1} ON ed.src = s${i - 1}.node
           |  GROUP BY 1),
           |s$i AS (SELECT p.node,
           |    CAST(coalesce(mi$i.mi, 0) AS HUGEINT) AS m,
           |    CAST(p.kz + coalesce(mi$i.mi, 0) AS HUGEINT) AS kz
           |  FROM s${i - 1} p LEFT JOIN mi$i ON p.node = mi$i.node)"""
          .stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        """,
          |fin AS (SELECT node,
          |    CAST(kz AS DOUBLE) / 1000000000.0 AS katz FROM s4),
          |top AS (SELECT node, katz,
          |    row_number() OVER (ORDER BY katz DESC, node) AS rank
          |  FROM fin ORDER BY katz DESC, node LIMIT 20)
          |SELECT CAST(rank AS BIGINT) AS rank, node AS part,
          |  CAST(round(CAST(CAST(katz AS VARCHAR) AS DECIMAL(38,20)), 6)
          |    AS DOUBLE) AS katz
          |FROM top""".stripMargin
    },
    // q444: reversed-key equi self-join on the distinct directed pair
    // set (semi == inner on a distinct set); one pinned ratio
    "q444_reciprocity" ->
      """WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
        |li AS (SELECT l_orderkey AS ok, l_partkey AS pk,
        |    l_linenumber AS ln
        |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
        |e AS (SELECT DISTINCT a.pk AS a, b.pk AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.ln < b.ln
        |    AND a.pk <> b.pk),
        |r AS (SELECT CAST(count(*) AS BIGINT) AS n_reciprocal
        |  FROM e JOIN e e2 ON e.a = e2.b AND e.b = e2.a),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
        |SELECT n_edges, n_reciprocal,
        |  CAST(round(CAST(CAST(CAST(n_reciprocal AS DOUBLE)
        |    / CAST(n_edges AS DOUBLE) AS VARCHAR)
        |  AS DECIMAL(38,20)), 6) AS DOUBLE) AS reciprocity
        |FROM n CROSS JOIN r""".stripMargin,
    // q445: degrees broadcast, thresholds exploded; phi one pinned
    // double shape per threshold
    "q445_rich_club" ->
      """WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
        |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1),
        |ks AS (SELECT CAST(unnest([2, 4, 8, 16, 32]) AS BIGINT) AS k),
        |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM ks JOIN deg ON d > k GROUP BY 1),
        |ex AS (SELECT e.u, e.v, du.d AS du, dv.d AS dv
        |  FROM e JOIN deg du ON e.u = du.node
        |  JOIN deg dv ON e.v = dv.node),
        |ek AS (SELECT k, CAST(count(*) AS BIGINT) AS n_edges_rich
        |  FROM ks JOIN ex ON ex.du > k AND ex.dv > k GROUP BY 1)
        |SELECT nk.k, n_nodes,
        |  coalesce(n_edges_rich, 0) AS n_edges_rich,
        |  CASE WHEN n_nodes > 1 THEN
        |    CAST(round(CAST(CAST(2.0 * CAST(coalesce(n_edges_rich, 0)
        |      AS DOUBLE) / (CAST(n_nodes AS DOUBLE)
        |      * CAST(n_nodes - 1 AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS phi
        |FROM nk LEFT JOIN ek ON nk.k = ek.k""".stripMargin,
    // q446: per-(key, season) exact q366 censuses; S sums exactly and
    // the per-season /18 variances fold in season order; same +/-1
    // continuity z
    "q446_seasonal_mk" ->
      """WITH d AS (SELECT event_type AS g,
        |    CAST(month(CAST(ts AS DATE)) AS BIGINT) AS m,
        |    strftime(ts, '%Y-%m-%d') AS o, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2, 3),
        |p AS (SELECT a.g, a.m,
        |    CAST(sum(CASE WHEN b.y > a.y THEN 1
        |      WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS sm
        |  FROM d a JOIN d b ON a.g = b.g AND a.m = b.m AND a.o < b.o
        |  GROUP BY 1, 2),
        |ties AS (SELECT g, m,
        |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
        |      AS HUGEINT) AS tie
        |  FROM (SELECT g, m, y, CAST(count(*) AS BIGINT) AS t FROM d
        |    GROUP BY 1, 2, 3) GROUP BY 1, 2),
        |ns AS (SELECT g, m, CAST(count(*) AS BIGINT) AS nm FROM d
        |  GROUP BY 1, 2),
        |per AS (SELECT ns.g, ns.m, nm, coalesce(sm, 0) AS sm,
        |    CAST(CAST(nm AS HUGEINT) * (nm - 1)
        |      * (2 * CAST(nm AS HUGEINT) + 5) - coalesce(tie, 0)
        |      AS DOUBLE) / 18.0 AS vm
        |  FROM ns LEFT JOIN p USING (g, m)
        |  LEFT JOIN ties USING (g, m)),
        |gg AS (SELECT g, CAST(sum(nm) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_seasons,
        |    CAST(sum(sm) AS BIGINT) AS s,
        |    list_reduce(list_transform(
        |      list(struct_pack(m := m, vm := vm) ORDER BY m),
        |      x -> x.vm), (a, v) -> a + v) AS var_s
        |  FROM per GROUP BY 1)
        |SELECT g AS event_type, n, n_seasons, s,
        |  CAST(round(CAST(CAST(var_s AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS var_s,
        |  CASE WHEN n < 2 OR var_s <= 0.0 THEN NULL
        |    WHEN s > 0 THEN CAST(round(CAST(CAST(
        |      CAST(s - 1 AS DOUBLE) / sqrt(var_s)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |    WHEN s < 0 THEN CAST(round(CAST(CAST(
        |      CAST(s + 1 AS DOUBLE) / sqrt(var_s)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |    ELSE 0.0 END AS z
        |FROM gg""".stripMargin,
    // q447: the q313 discipline — unassigned edges censused loudly;
    // vol/internal exact counts; phi one division per community
    "q447_conductance" ->
      """WITH raw AS (SELECT o_custkey AS u, l_suppkey + 1000000 AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e0 AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
        |  FROM raw WHERE u <> v AND u IS NOT NULL AND v IS NOT NULL),
        |a2 AS (SELECT DISTINCT nd, c FROM (
        |  SELECT c_custkey AS nd, c_nationkey AS c FROM customer
        |  UNION ALL SELECT s_suppkey + 1000000, s_nationkey
        |  FROM supplier)),
        |t AS (SELECT e0.u, e0.v, au.c AS cu, av.c AS cv
        |  FROM e0 LEFT JOIN a2 au ON e0.u = au.nd
        |  LEFT JOIN a2 av ON e0.v = av.nd),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS n_edges_unassigned
        |  FROM t WHERE cu IS NULL OR cv IS NULL),
        |k AS (SELECT * FROM t WHERE cu IS NOT NULL AND cv IS NOT NULL),
        |m2 AS (SELECT CAST(count(*) * 2 AS BIGINT) AS vol_total FROM k),
        |vol AS (SELECT c, CAST(count(*) AS BIGINT) AS vol
        |  FROM (SELECT unnest([cu, cv]) AS c FROM k) GROUP BY 1),
        |itl AS (SELECT cu AS c, CAST(count(*) AS BIGINT) AS n_internal
        |  FROM k WHERE cu = cv GROUP BY 1)
        |SELECT vol.c AS community, vol,
        |  coalesce(n_internal, 0) AS n_internal,
        |  vol - 2 * coalesce(n_internal, 0) AS cut,
        |  CASE WHEN least(vol, vol_total - vol) > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(vol - 2 * coalesce(n_internal, 0) AS DOUBLE)
        |      / CAST(least(vol, vol_total - vol) AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS conductance,
        |  n_edges_unassigned
        |FROM vol LEFT JOIN itl ON vol.c = itl.c
        |CROSS JOIN m2 CROSS JOIN drp""".stripMargin,
    // q448: strict-extrema count (plateau pinned as non-turn); E/Var/z
    // pinned closed-form double shapes
    "q448_turning_points" ->
      """WITH dly AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT k, x,
        |    lag(x) OVER (PARTITION BY k ORDER BY o) AS p,
        |    lead(x) OVER (PARTITION BY k ORDER BY o) AS q FROM dly),
        |g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN p IS NOT NULL AND q IS NOT NULL
        |      AND ((p < x AND q < x) OR (p > x AND q > x))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS t_turns
        |  FROM w GROUP BY 1)
        |SELECT k AS event_type, n, t_turns,
        |  CASE WHEN n >= 3 THEN
        |    CAST(round(CAST(CAST(2.0 * CAST(n - 2 AS DOUBLE) / 3.0
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS e_t,
        |  CASE WHEN n >= 3 THEN
        |    CAST(round(CAST(CAST(CAST(16 * n - 29 AS DOUBLE) / 90.0
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS var_t,
        |  CASE WHEN n >= 3 AND CAST(16 * n - 29 AS DOUBLE) / 90.0 > 0
        |    THEN CAST(round(CAST(CAST(
        |      (CAST(t_turns AS DOUBLE) - 2.0 * CAST(n - 2 AS DOUBLE)
        |        / 3.0) / sqrt(CAST(16 * n - 29 AS DOUBLE) / 90.0)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS z
        |FROM g""".stripMargin,
    // q449: union-of-observed-cells fold in bucket order; each term
    // one sqrt of two pinned divisions; 1 - BC clamped before the sqrt
    "q449_hellinger" ->
      """WITH s AS (SELECT
        |    CAST(round(value * 100) AS BIGINT) // 1000 AS cc,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) + 1 IN (1, 7)
        |      THEN 1 ELSE 0 END AS b
        |  FROM events),
        |c AS (SELECT cc, CAST(sum(1 - b) AS BIGINT) AS ca,
        |    CAST(sum(b) AS BIGINT) AS cb FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b,
        |    CAST(count(*) AS BIGINT) AS n_cells FROM c),
        |f AS (SELECT n_a, n_b, n_cells,
        |    list(struct_pack(cc := cc,
        |      t := sqrt((CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        * (CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE))))
        |      ORDER BY cc) AS cells
        |  FROM c CROSS JOIN t GROUP BY 1, 2, 3),
        |g AS (SELECT n_a, n_b, n_cells,
        |    list_reduce(list_transform(cells, x -> x.t),
        |      (a, v) -> a + v) AS bc FROM f)
        |SELECT n_a, n_b, n_cells,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(round(CAST(CAST(bc AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) END AS bc,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(round(CAST(CAST(sqrt(greatest(1.0 - bc, 0.0))
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END
        |    AS hellinger
        |FROM g""".stripMargin,
    // q450: the q351 census + prepended-seed struct fold (cif fields
    // FIRST, survival last — the q40 field-order discipline); every
    // per-step term one double division of exact integers
    "q450_cum_incidence" ->
      """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
        |    MAX(CAST(ts AS DATE)) AS ld FROM events GROUP BY 1),
        |h AS (SELECT MAX(ld) AS wend FROM u),
        |s AS (SELECT date_diff('day', fd, ld) AS d,
        |    CASE WHEN date_diff('day', ld, wend) < 7 THEN 0
        |      WHEN user_id % 2 = 0 THEN 1 ELSE 2 END AS c
        |  FROM u, h),
        |cns AS (SELECT d, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
        |  FROM s GROUP BY 1),
        |r AS (SELECT d, n_obs, d1, d2,
        |    CAST(SUM(n_obs) OVER () - COALESCE(SUM(n_obs) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM cns),
        |l AS (SELECT list(struct_pack(d := d, n_risk := n_risk,
        |    d1 := d1, d2 := d2) ORDER BY d) AS arr FROM r),
        |x AS (SELECT unnest(range(1, len(arr) + 1)) AS i, arr FROM l),
        |f AS (SELECT arr[i].d AS d, arr[i].n_risk AS n_risk,
        |    arr[i].d1 AS d1, arr[i].d2 AS d2,
        |    list_reduce(list_prepend(
        |      struct_pack(c1 := CAST(0.0 AS DOUBLE),
        |        c2 := CAST(0.0 AS DOUBLE), s := CAST(1.0 AS DOUBLE)),
        |      list_transform(list_slice(arr, 1, i), e -> struct_pack(
        |        c1 := CAST(e.d1 AS DOUBLE) / CAST(e.n_risk AS DOUBLE),
        |        c2 := CAST(e.d2 AS DOUBLE) / CAST(e.n_risk AS DOUBLE),
        |        s := 1.0 - CAST(e.d1 + e.d2 AS DOUBLE)
        |          / CAST(e.n_risk AS DOUBLE)))),
        |      (acc, x2) -> struct_pack(
        |        c1 := acc.c1 + acc.s * x2.c1,
        |        c2 := acc.c2 + acc.s * x2.c2,
        |        s := acc.s * x2.s)) AS st
        |  FROM x)
        |SELECT CAST(d AS BIGINT) AS duration, n_risk,
        |  d1 AS d_cause1, d2 AS d_cause2,
        |  CAST(round(CAST(CAST(st.c1 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS cif_1,
        |  CAST(round(CAST(CAST(st.c2 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS cif_2,
        |  CAST(round(CAST(CAST(st.s AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS survival
        |FROM f""".stripMargin,
    // q451: exact unit masses; HHI = one division of exact HUGEINTs;
    // non-positive units dropped loudly
    "q451_herfindahl" ->
      """WITH rev AS (SELECT s_nationkey AS sc, l_suppkey AS u,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS m
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE l_extendedprice IS NOT NULL),
        |un AS (SELECT sc, u, CAST(sum(m) AS HUGEINT) AS mi
        |  FROM rev GROUP BY 1, 2),
        |per AS (SELECT sc,
        |    CAST(sum(CASE WHEN mi > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS k_units,
        |    CAST(sum(CASE WHEN mi > 0 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS k_dropped,
        |    CAST(sum(CASE WHEN mi > 0 THEN mi ELSE 0 END) AS HUGEINT)
        |      AS t,
        |    CAST(sum(CASE WHEN mi > 0 THEN mi * mi ELSE 0 END)
        |      AS HUGEINT) AS sm2
        |  FROM un GROUP BY 1)
        |SELECT sc AS nation, k_units, k_dropped,
        |  CAST(t AS BIGINT) AS total,
        |  CASE WHEN k_units > 0 THEN
        |    CAST(round(CAST(CAST(CAST(sm2 AS DOUBLE)
        |      / CAST(t * t AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS hhi,
        |  CASE WHEN k_units > 1 THEN
        |    CAST(round(CAST(CAST(
        |      (CAST(sm2 AS DOUBLE) / CAST(t * t AS DOUBLE)
        |        - 1.0 / CAST(k_units AS DOUBLE))
        |      / (1.0 - 1.0 / CAST(k_units AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS hhi_norm
        |FROM per""".stripMargin,
    // q452: rank-clock OLS from exact moments; e_t one pinned shape
    // per row; squared residuals summed as round-6 decimals
    // (round(e, 6) both engines, order-free); the gamma folds run in
    // ord order with 1 - l/5.0
    // Bartlett weights (the q426 IEEE discipline)
    "q452_newey_west" ->
      """WITH dly AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS y
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT k, o, y,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY o) - 1
        |      AS BIGINT) AS x FROM dly),
        |mm AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy FROM rk GROUP BY 1),
        |bb AS (SELECT k, n, sx, sy, n * sxx - sx * sx AS ss,
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS b
        |  FROM mm),
        |aa AS (SELECT k, n, sx, ss, b,
        |    (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS a FROM bb),
        |sc AS (SELECT rk.k, rk.o, aa.n, aa.ss, aa.b,
        |    CAST(rk.y AS DOUBLE) - aa.a - aa.b * CAST(rk.x AS DOUBLE)
        |      AS e,
        |    CAST(aa.n * rk.x - aa.sx AS DOUBLE)
        |      * (CAST(rk.y AS DOUBLE) - aa.a
        |        - aa.b * CAST(rk.x AS DOUBLE)) AS v
        |  FROM rk JOIN aa ON rk.k = aa.k),
        |per AS (SELECT k, max(n) AS n, max(b) AS slope,
        |    max(CAST(ss AS DOUBLE)) AS ssd,
        |    sum(round(CAST(CAST(e AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      * round(CAST(CAST(e AS VARCHAR) AS DECIMAL(38,20)), 6))
        |      AS see,
        |    list(v ORDER BY o) AS vs FROM sc GROUP BY 1),
        |gg AS (SELECT k, n, slope, ssd, see,
        |    CASE WHEN n >= 1 THEN coalesce(list_reduce(list_transform(
        |      range(1, n + 1), i -> vs[CAST(i AS INT)]
        |        * vs[CAST(i AS INT)]), (acc, t) -> acc + t), 0.0)
        |      ELSE 0.0 END AS g0,
        |    CASE WHEN n >= 2 THEN coalesce(list_reduce(list_transform(
        |      range(2, n + 1), i -> vs[CAST(i AS INT)]
        |        * vs[CAST(i - 1 AS INT)]), (acc, t) -> acc + t), 0.0)
        |      ELSE 0.0 END AS g1,
        |    CASE WHEN n >= 3 THEN coalesce(list_reduce(list_transform(
        |      range(3, n + 1), i -> vs[CAST(i AS INT)]
        |        * vs[CAST(i - 2 AS INT)]), (acc, t) -> acc + t), 0.0)
        |      ELSE 0.0 END AS g2,
        |    CASE WHEN n >= 4 THEN coalesce(list_reduce(list_transform(
        |      range(4, n + 1), i -> vs[CAST(i AS INT)]
        |        * vs[CAST(i - 3 AS INT)]), (acc, t) -> acc + t), 0.0)
        |      ELSE 0.0 END AS g3,
        |    CASE WHEN n >= 5 THEN coalesce(list_reduce(list_transform(
        |      range(5, n + 1), i -> vs[CAST(i AS INT)]
        |        * vs[CAST(i - 4 AS INT)]), (acc, t) -> acc + t), 0.0)
        |      ELSE 0.0 END AS g4
        |  FROM per),
        |vv AS (SELECT k, n, slope, ssd, see,
        |    g0 + 2.0 * ((1.0 - 1.0/5.0) * g1 + (1.0 - 2.0/5.0) * g2
        |      + (1.0 - 3.0/5.0) * g3 + (1.0 - 4.0/5.0) * g4) AS stilde
        |  FROM gg),
        |ff AS (SELECT k, n, slope,
        |    stilde / (ssd * ssd) AS var_nw,
        |    CAST(n AS DOUBLE) * CAST(see AS DOUBLE)
        |      / CAST(n - 2 AS DOUBLE) / ssd AS var_iid
        |  FROM vv)
        |SELECT k AS event_type, n,
        |  CAST(round(CAST(CAST(slope AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS slope,
        |  CASE WHEN n > 6 AND var_iid > 0 THEN
        |    CAST(round(CAST(CAST(slope / sqrt(var_iid) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS t_iid,
        |  CASE WHEN n > 6 AND var_nw > 0 THEN
        |    CAST(round(CAST(CAST(slope / sqrt(var_nw) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) END AS t_nw
        |FROM ff""".stripMargin,
    // q453: the q117 closed-form-replay contract lifted to containers —
    // every mp4Probe field is arithmetic in doc_id (syntheticMp4's
    // derivations); two corruption modes (wrong magic %9, truncated box
    // %7==3) both null out. duration_ms is integer division both sides.
    "q453_mp4_probe" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
        |f AS (SELECT doc_id,
        |    (doc_id % 9 = 0 OR doc_id % 7 = 3) AS bad,
        |    doc_id % 3 AS m3,
        |    CAST(600 * (1 + doc_id % 3) AS INT) AS ts,
        |    CAST(1000 + (doc_id * 37) % 100000 AS BIGINT) AS du,
        |    CASE WHEN (doc_id + 1) % 2 = 0 THEN 'mp4a' ELSE 'opus' END
        |      AS a1,
        |    CASE WHEN doc_id % 2 = 0 THEN 'mp4a' ELSE 'opus' END AS a2
        |  FROM ids)
        |SELECT doc_id,
        |  CASE WHEN bad THEN NULL
        |    WHEN m3 = 0 THEN 'isom' WHEN m3 = 1 THEN 'mp42'
        |    ELSE 'dash' END AS major_brand,
        |  CASE WHEN bad THEN NULL ELSE ts END AS timescale,
        |  CASE WHEN bad THEN NULL ELSE du END AS duration_units,
        |  CASE WHEN bad THEN NULL
        |    ELSE CAST((du * 1000) // ts AS BIGINT) END AS duration_ms,
        |  CASE WHEN bad THEN NULL
        |    ELSE CAST(1 + m3 AS INT) END AS n_tracks,
        |  CASE WHEN bad THEN NULL
        |    WHEN m3 = 0 THEN 'avc1'
        |    WHEN m3 = 1 THEN 'hev1' || ',' || a1
        |    ELSE 'vp09' || ',' || a1 || ',' || a2 END AS codecs
        |FROM f""".stripMargin,
    // q454: Pettitt via the rank-census identity — V from one value
    // census, U as an ord-ordered running sum (all exact integers),
    // argmax by (|U| desc, t asc) as a window; the one closed-form p
    // is a pinned double shape rounded via the VARCHAR round-trip
    "q454_pettitt" ->
      """WITH d AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |vc AS (SELECT k, x, CAST(count(*) AS BIGINT) AS c FROM d
        |  GROUP BY 1, 2),
        |vt AS (SELECT k, x, (le - c) - (n - le) AS v FROM (
        |  SELECT k, x, c,
        |      SUM(c) OVER (PARTITION BY k ORDER BY x) AS le,
        |      SUM(c) OVER (PARTITION BY k) AS n FROM vc)),
        |s AS (SELECT d.k, d.o,
        |    row_number() OVER (PARTITION BY d.k ORDER BY d.o) AS i,
        |    COUNT(*) OVER (PARTITION BY d.k) AS nn,
        |    SUM(v) OVER (PARTITION BY d.k ORDER BY d.o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u
        |  FROM d JOIN vt ON d.k = vt.k AND d.x = vt.x),
        |f AS (SELECT k, o, i, nn, u, abs(u) AS a FROM s WHERE i < nn),
        |r AS (SELECT k, o, nn, u, a, row_number() OVER (PARTITION BY k
        |    ORDER BY a DESC, i ASC) AS rn FROM f)
        |SELECT k AS event_type, CAST(nn AS BIGINT) AS n,
        |  CAST(a AS BIGINT) AS k_stat, CAST(u AS BIGINT) AS u_at_cp,
        |  o AS cp_ord,
        |  CAST(round(CAST(CAST(
        |    least(CAST(1.0 AS DOUBLE), 2.0 * exp(
        |      ((-6.0 * CAST(a AS DOUBLE)) * CAST(a AS DOUBLE)) /
        |      ((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
        |         * CAST(nn AS DOUBLE)
        |       + CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS p_value
        |FROM r WHERE rn = 1""".stripMargin,
    // q455: ADF moments as exact HUGEINT sums; the centered-Cramer
    // algebra replayed as the identical left-associated double shapes
    "q455_adf" ->
      """WITH d AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT k, y,
        |    lag(y) OVER (PARTITION BY k ORDER BY o) AS yl,
        |    lag(y, 2) OVER (PARTITION BY k ORDER BY o) AS yl2 FROM d),
        |b AS (SELECT k, y - yl AS z, yl AS a, yl - yl2 AS b2 FROM l
        |  WHERE yl IS NOT NULL AND yl2 IS NOT NULL),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(a AS HUGEINT)) AS sa, sum(CAST(b2 AS HUGEINT)) AS sb,
        |    sum(CAST(z AS HUGEINT)) AS sz,
        |    sum(CAST(a AS HUGEINT) * a) AS saa,
        |    sum(CAST(b2 AS HUGEINT) * b2) AS sbb,
        |    sum(CAST(a AS HUGEINT) * b2) AS sab,
        |    sum(CAST(a AS HUGEINT) * z) AS saz,
        |    sum(CAST(b2 AS HUGEINT) * z) AS sbz,
        |    sum(CAST(z AS HUGEINT) * z) AS szz
        |  FROM b GROUP BY 1),
        |c AS (SELECT k, n,
        |    CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS caa,
        |    CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS cbb,
        |    CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS cab,
        |    CAST(n AS DOUBLE) * CAST(saz AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sz AS DOUBLE) AS caz,
        |    CAST(n AS DOUBLE) * CAST(sbz AS DOUBLE)
        |      - CAST(sb AS DOUBLE) * CAST(sz AS DOUBLE) AS cbz,
        |    CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |      - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS czz
        |  FROM m),
        |g AS (SELECT k, n, caa, cbb, cab, caz, cbz, czz,
        |    caa * cbb - cab * cab AS det FROM c),
        |h AS (SELECT k, n, det, czz, caz, cbz,
        |    (caz * cbb - cbz * cab) / det AS beta,
        |    (cbz * caa - caz * cab) / det AS phi,
        |    caa, cbb FROM g),
        |f AS (SELECT k, n, det, beta, phi,
        |    (czz - beta * caz - phi * cbz) / CAST(n AS DOUBLE) AS rss,
        |    cbb FROM h),
        |ff AS (SELECT k, n, det, beta, phi, rss,
        |    rss / (CAST(n AS DOUBLE) - 3.0) * CAST(n AS DOUBLE) * cbb
        |      / det AS varb FROM f)
        |SELECT k AS event_type, n,
        |  CASE WHEN n > 4 AND det > 0.0 AND rss > 0.0 THEN
        |    CAST(round(CAST(CAST(beta AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS beta,
        |  CASE WHEN n > 4 AND det > 0.0 AND rss > 0.0 THEN
        |    CAST(round(CAST(CAST(phi AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS phi,
        |  CASE WHEN n > 4 AND det > 0.0 AND rss > 0.0 THEN
        |    CAST(round(CAST(CAST(beta / sqrt(varb) AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE) END AS t_adf
        |FROM ff""".stripMargin,
    // q456: n-scaled exact integer deviations at edge grain; both
    // statistics are single pinned double shapes over HUGEINT sums
    "q456_moran_geary" ->
      """WITH raw AS (SELECT o_custkey AS u, l_suppkey + 1000000 AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e0 AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
        |  FROM raw WHERE u <> v AND u IS NOT NULL AND v IS NOT NULL),
        |nodes AS (SELECT DISTINCT nd FROM (
        |  SELECT u AS nd FROM e0 UNION ALL SELECT v FROM e0)),
        |a2 AS (SELECT DISTINCT nd, x FROM (
        |  SELECT c_custkey AS nd, CAST(c_nationkey AS BIGINT) AS x
        |    FROM customer
        |  UNION ALL SELECT s_suppkey + 1000000,
        |    CAST(s_nationkey AS BIGINT) FROM supplier)),
        |units AS (SELECT nodes.nd, x FROM nodes JOIN a2 USING (nd)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx FROM units),
        |dt AS (SELECT nd, CAST(n AS HUGEINT) * x - sx AS dd, n
        |  FROM units CROSS JOIN tot),
        |den AS (SELECT max(n) AS n, sum(dd * dd) AS den FROM dt),
        |tg AS (SELECT e0.u, e0.v, du.dd AS du, dv.dd AS dv
        |  FROM e0 LEFT JOIN dt du ON e0.u = du.nd
        |  LEFT JOIN dt dv ON e0.v = dv.nd),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS m_total,
        |    CAST(sum(CASE WHEN du IS NOT NULL AND dv IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS m,
        |    sum(CASE WHEN du IS NOT NULL AND dv IS NOT NULL
        |      THEN du * dv ELSE 0 END) AS num_i,
        |    sum(CASE WHEN du IS NOT NULL AND dv IS NOT NULL
        |      THEN (du - dv) * (du - dv) ELSE 0 END) AS num_c
        |  FROM tg)
        |SELECT n AS n_nodes, m AS n_edges, 2 * m AS w,
        |  m_total - m AS n_edges_dropped,
        |  CASE WHEN m > 0 AND den > 0 THEN
        |    CAST(round(CAST(CAST(
        |      (CAST(n AS DOUBLE) * (2.0 * CAST(num_i AS DOUBLE)))
        |        / ((2.0 * CAST(m AS DOUBLE)) * CAST(den AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END
        |    AS moran_i,
        |  CASE WHEN m > 0 AND den > 0 THEN
        |    CAST(round(CAST(CAST(
        |      ((CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(num_c AS DOUBLE)))
        |        / (2.0 * (2.0 * CAST(m AS DOUBLE)) * CAST(den AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END
        |    AS geary_c,
        |  CASE WHEN n > 1 THEN
        |    CAST(round(CAST(CAST(-1.0 / (CAST(n AS DOUBLE) - 1.0)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS e_i
        |FROM sums CROSS JOIN den""".stripMargin,
    // q457: q364's register/estimator CTEs verbatim, then the harmonic
    // fold written OUT as the explicit left-associated 4-hop sum —
    // identical association to the Spark hop-order fold, so the
    // estimate-exact doubles carry through to the rounded readout
    "q457_harmonic" -> {
      val est = (src: String, hop: Int) =>
        s"""e$hop AS (SELECT node,
           |  (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
           |     + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE)))
           |   * CAST(64.0 AS DOUBLE) * CAST(64.0 AS DOUBLE) /
           |   ((CAST(64.0 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)) +
           |    SUM(CAST(1.0 AS DOUBLE)
           |      / CAST((CAST(1 AS BIGINT) << CAST(mr AS INT)) AS DOUBLE)))
           |   AS est
           |FROM $src GROUP BY 1)""".stripMargin
      val base =
        """WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
          |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          |edges AS (SELECT c AS src, 1000000 + s AS dst FROM pairs
          |UNION ALL SELECT 1000000 + s, c FROM pairs),
          |nodes AS (SELECT DISTINCT src AS node FROM edges),
          |h0 AS (SELECT node,
          |  CAST(('0x' || substr(md5(CAST(node AS VARCHAR) || ':r'), 1, 4))
          |    AS BIGINT) % 64 AS reg,
          |  LEAST(4 * length(regexp_extract(
          |      substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12), '^0*')) +
          |    CASE substr(substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12),
          |        length(regexp_extract(
          |          substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12), '^0*'))
          |          + 1, 1)
          |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
          |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
          |      ELSE 0 END + 1, 40) AS mr
          |FROM nodes)""".stripMargin
      val hops = (1 to 4).map { h =>
        s"""h$h AS (SELECT node, reg, MAX(mr) AS mr FROM (
           |  SELECT e.src AS node, r.reg, r.mr
           |    FROM edges e JOIN h${h - 1} r ON e.dst = r.node
           |  UNION ALL SELECT node, reg, mr FROM h${h - 1}) GROUP BY 1, 2),
           |""".stripMargin + est(s"h$h", h)
      }.mkString(",\n", ",\n", "")
      base + hops +
        """
          |SELECT e1.node,
          |  CAST(round(CAST(CAST(
          |    (e1.est - CAST(1.0 AS DOUBLE)) / CAST(1.0 AS DOUBLE)
          |    + (e2.est - e1.est) / CAST(2.0 AS DOUBLE)
          |    + (e3.est - e2.est) / CAST(3.0 AS DOUBLE)
          |    + (e4.est - e3.est) / CAST(4.0 AS DOUBLE)
          |    AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS harmonic
          |FROM e1 JOIN e2 USING (node) JOIN e3 USING (node)
          |JOIN e4 USING (node)""".stripMargin
    },
    // q463: two truss peels unrolled CTE-for-CTE — per round the
    // id-oriented wedge join enumerates each a<b<c triangle once,
    // the 3-way edge explode censuses support, and the inner join
    // drops support-short edges (absent-from-census = support 0);
    // final support recomputed on the survivors, coalesce 0
    "q463_ktruss" -> {
      def round(src: String, dst: String): String =
        s"""t$dst AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM $src e1 JOIN $src e2 ON e1.v = e2.u
           |  JOIN $src e3 ON e3.u = e1.u AND e3.v = e2.v),
           |s$dst AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT a AS u, b AS v FROM t$dst
           |    UNION ALL SELECT b, c FROM t$dst
           |    UNION ALL SELECT a, c FROM t$dst) GROUP BY 1, 2),
           |$dst AS (SELECT e.u, e.v FROM $src e
           |  JOIN s$dst s ON e.u = s.u AND e.v = s.v
           |  WHERE s.cnt >= 1)""".stripMargin
      """WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
        |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
        |e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
        |""".stripMargin +
        round("e0", "e1") + ",\n" + round("e1", "e2") + ",\n" +
        """tf AS (SELECT e1.u AS a, e1.v AS b, e2x.v AS c
          |  FROM e2 e1 JOIN e2 e2x ON e1.v = e2x.u
          |  JOIN e2 e3 ON e3.u = e1.u AND e3.v = e2x.v),
          |sf AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cnt
          |  FROM (SELECT a AS u, b AS v FROM tf
          |    UNION ALL SELECT b, c FROM tf
          |    UNION ALL SELECT a, c FROM tf) GROUP BY 1, 2)
          |SELECT e.u, e.v, coalesce(sf.cnt, 0) AS sup
          |FROM e2 e LEFT JOIN sf ON e.u = sf.u AND e.v = sf.v"""
          .stripMargin
    },
    // q467: quantized Brandes replayed hop-for-hop — forward BFS as 4
    // unrolled frontier CTEs (HUGEINT sigma sums, anti-join vs the
    // visited prefix), backward dependency walk as 4 levels whose
    // per-edge contribution mirrors the Spark shape exactly:
    // round(sigma_v/sigma_w * (1 + delta_w), 12) via the VARCHAR-
    // decimal HALF_UP trick, summed as DECIMAL(38,12)
    "q467_betweenness" -> {
      def fwd(d: Int): String = {
        val prev = s"b${d - 1}"
        val vis = if (d == 1) "b0" else s"vis${d - 1}"
        s"""f$d AS (SELECT b.s, e.dst AS node,
           |    CAST(SUM(b.sigma) AS HUGEINT) AS sigma
           |  FROM $prev b JOIN e ON b.node = e.src GROUP BY 1, 2),
           |b$d AS (SELECT f.s, f.node, $d AS dist, f.sigma FROM f$d f
           |  ANTI JOIN $vis v ON v.s = f.s AND v.node = f.node),
           |vis$d AS (SELECT s, node, dist, sigma FROM $vis
           |  UNION ALL SELECT s, node, dist, sigma FROM b$d)"""
          .stripMargin
      }
      def bwd(d: Int): String = {
        val wsrc =
          s"""w${d + 1} AS (SELECT b.s, b.node, b.sigma, d.delta
             |  FROM b${d + 1} b JOIN d${d + 1} d
             |  ON d.s = b.s AND d.node = b.node)""".stripMargin
        s"""$wsrc,
           |c$d AS (SELECT v.s, v.node,
           |    SUM(CAST(round(CAST(CAST(
           |      CAST(v.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE)
           |        * (CAST(1.0 AS DOUBLE) + CAST(w.delta AS DOUBLE))
           |      AS VARCHAR) AS DECIMAL(38,20)), 12)
           |      AS DECIMAL(38,12))) AS delta
           |  FROM b$d v JOIN e ON e.src = v.node
           |  JOIN w${d + 1} w ON w.s = v.s AND w.node = e.dst
           |  GROUP BY 1, 2),
           |d$d AS (SELECT v.s, v.node,
           |    COALESCE(c.delta, CAST(0 AS DECIMAL(38,12))) AS delta
           |  FROM b$d v LEFT JOIN c$d c
           |  ON c.s = v.s AND c.node = v.node)""".stripMargin
      }
      s"""WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS su
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT c AS src, 1000000 + su AS dst FROM pairs
         |  UNION ALL SELECT 1000000 + su, c FROM pairs),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |srcs AS (SELECT node AS s FROM nodes ORDER BY node LIMIT 4),
         |b0 AS (SELECT s, s AS node, 0 AS dist,
         |    CAST(1 AS HUGEINT) AS sigma FROM srcs),
         |${fwd(1)},
         |${fwd(2)},
         |${fwd(3)},
         |d3 AS (SELECT s, node, CAST(0 AS DECIMAL(38,12)) AS delta
         |  FROM b3),
         |${bwd(2)},
         |${bwd(1)},
         |${bwd(0)},
         |alld AS (SELECT s, node, delta FROM d0
         |  UNION ALL SELECT s, node, delta FROM d1
         |  UNION ALL SELECT s, node, delta FROM d2
         |  UNION ALL SELECT s, node, delta FROM d3),
         |bt AS (SELECT node, CAST(SUM(delta) AS DOUBLE) AS b
         |  FROM alld WHERE s <> node GROUP BY 1)
         |SELECT node,
         |  CASE WHEN node >= 1000000 THEN 'supplier'
         |    ELSE 'customer' END AS kind,
         |  CAST(round(CAST(CAST(b AS VARCHAR) AS DECIMAL(38,20)), 4)
         |    AS DOUBLE) AS betweenness,
         |  CAST(4 AS BIGINT) AS n_sources
         |FROM bt WHERE b > 0.0""".stripMargin
    },
    // q464: the PELT-objective DP replayed list-for-list — exact long
    // prefix sums via windows, the F fold as a list_reduce whose acc
    // is the growing DOUBLE[] (elements lifted to singleton lists so
    // the reduce types unify), back-pointers recomputed from the FINAL
    // F array (no multi-field-struct fold — the documented DuckDB
    // lambda hazard), backtrack as an INT[]-acc chain walk. Candidate
    // cost shape textually pinned to the Spark fold's.
    "q464_pelt" -> {
      val cand =
        """acc[s + 1]
          |          + (CAST(s2[CAST(xx[1] AS INT) + 1] - s2[s + 1] AS DOUBLE)
          |             - CAST(s1[CAST(xx[1] AS INT) + 1] - s1[s + 1] AS DOUBLE)
          |               * CAST(s1[CAST(xx[1] AS INT) + 1] - s1[s + 1] AS DOUBLE)
          |               / CAST(CAST(xx[1] AS INT) - s AS DOUBLE))
          |          + CAST(400.0 AS DOUBLE)""".stripMargin
      val candF =
        """fs[s + 1]
          |          + (CAST(s2[CAST(t AS INT) + 1] - s2[s + 1] AS DOUBLE)
          |             - CAST(s1[CAST(t AS INT) + 1] - s1[s + 1] AS DOUBLE)
          |               * CAST(s1[CAST(t AS INT) + 1] - s1[s + 1] AS DOUBLE)
          |               / CAST(CAST(t AS INT) - s AS DOUBLE))
          |          + CAST(400.0 AS DOUBLE)""".stripMargin
      s"""WITH d AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
         |  FROM events GROUP BY 1, 2),
         |pl AS (SELECT k, o, CASE WHEN substring(o, 9, 2) >= '16'
         |    THEN tot * 3 ELSE tot END AS b FROM d),
         |q AS (SELECT k, o,
         |    b * 1000 // SUM(b) OVER (PARTITION BY k) AS pm FROM pl),
         |w AS (SELECT k, o, pm,
         |    SUM(pm) OVER (PARTITION BY k ORDER BY o
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         |    SUM(pm * pm) OVER (PARTITION BY k ORDER BY o
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
         |  FROM q),
         |g AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         |    list_prepend(CAST(0 AS BIGINT), list(c1 ORDER BY o)) AS s1,
         |    list_prepend(CAST(0 AS BIGINT), list(c2 ORDER BY o)) AS s2,
         |    list(o ORDER BY o) AS os
         |  FROM w GROUP BY k HAVING COUNT(*) >= 2),
         |fdp AS (SELECT *, list_reduce(
         |    list_prepend([CAST(-400.0 AS DOUBLE)],
         |      list_transform(range(1, CAST(n AS INT) + 1),
         |        t -> [CAST(t AS DOUBLE)])),
         |    (acc, xx) -> list_append(acc,
         |      list_min(list_transform(range(0, CAST(xx[1] AS INT)), s ->
         |        $cand)))) AS fs
         |  FROM g),
         |cp AS (SELECT *, list_transform(range(1, CAST(n AS INT) + 1),
         |    t -> CAST(list_min(list_transform(range(0, CAST(t AS INT)),
         |      s -> CASE WHEN $candF = fs[CAST(t AS INT) + 1]
         |        THEN CAST(s AS INT) ELSE 2147483647 END)) AS INT)) AS cps
         |  FROM fdp),
         |bt AS (SELECT *, list_sort(list_reduce(
         |    list_prepend([CAST(n AS INT)],
         |      list_transform(range(1, CAST(n AS INT) + 1),
         |        i -> [CAST(0 AS INT)])),
         |    (acc, xx) -> CASE WHEN acc[1] > 0 THEN
         |        list_concat([cps[acc[1]]],
         |          CASE WHEN cps[acc[1]] > 0
         |            THEN list_append(acc[2:], cps[acc[1]])
         |            ELSE acc[2:] END)
         |      ELSE acc END)[2:]) AS cuts
         |  FROM cp)
         |SELECT k AS event_type, n,
         |  CAST(len(cuts) AS BIGINT) AS n_changepoints,
         |  array_to_string(list_transform(cuts, c -> os[c + 1]), ',')
         |    AS cp_ords,
         |  CAST(round(CAST(CAST(fs[CAST(n AS INT) + 1] AS VARCHAR)
         |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS total_cost
         |FROM bt""".stripMargin
    },
    // q471: the matrix profile replayed grid-for-grid — per-window
    // moments from exact BIGINT prefix windows in the Spark shapes
    // (S1Δ/m, S2Δ/m − μ²), pair z-distances as ordered m-folds over
    // the var-guarded |i−j| ≥ m grid, argmin via (d2, j) row_number,
    // null-windows restored by a left join
    "q471_matrix_profile" ->
      """WITH d AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS o,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT k, o, x,
        |    SUM(x) OVER (PARTITION BY k ORDER BY o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
        |    SUM(x * x) OVER (PARTITION BY k ORDER BY o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
        |  FROM d),
        |g AS (SELECT k,
        |    CASE WHEN COUNT(*) - 7 + 1 > 120
        |      THEN CAST(error('q471 oracle: window count '
        |        || (COUNT(*) - 7 + 1)
        |        || ' exceeds the unrolled 120 grid - widen range(1, N)')
        |        AS INT)
        |      ELSE CAST(COUNT(*) AS INT) END AS n,
        |    list(o ORDER BY o) AS os, list(x ORDER BY o) AS xs,
        |    list_prepend(CAST(0 AS BIGINT), list(c1 ORDER BY o)) AS s1,
        |    list_prepend(CAST(0 AS BIGINT), list(c2 ORDER BY o)) AS s2
        |  FROM w GROUP BY k HAVING COUNT(*) >= 8),
        |win AS (SELECT k, os, xs, n - 7 + 1 AS kw, CAST(ti.i AS INT) AS i,
        |    CAST(s1[CAST(ti.i AS INT) + 7] - s1[CAST(ti.i AS INT)]
        |      AS DOUBLE) / CAST(7 AS DOUBLE) AS mu,
        |    CAST(s2[CAST(ti.i AS INT) + 7] - s2[CAST(ti.i AS INT)]
        |      AS DOUBLE) / CAST(7 AS DOUBLE)
        |      - (CAST(s1[CAST(ti.i AS INT) + 7] - s1[CAST(ti.i AS INT)]
        |          AS DOUBLE) / CAST(7 AS DOUBLE))
        |        * (CAST(s1[CAST(ti.i AS INT) + 7] - s1[CAST(ti.i AS INT)]
        |          AS DOUBLE) / CAST(7 AS DOUBLE)) AS var
        |  FROM g, range(1, 121) ti(i) WHERE ti.i <= n - 7 + 1),
        |pairs AS (SELECT a.k, a.i, b.i AS j,
        |    list_sum(list_transform(range(0, 7), t ->
        |      ((CAST(a.xs[a.i + CAST(t AS INT)] AS DOUBLE) - a.mu)
        |         / sqrt(a.var)
        |       - (CAST(b.xs[b.i + CAST(t AS INT)] AS DOUBLE) - b.mu)
        |         / sqrt(b.var))
        |      * ((CAST(a.xs[a.i + CAST(t AS INT)] AS DOUBLE) - a.mu)
        |         / sqrt(a.var)
        |       - (CAST(b.xs[b.i + CAST(t AS INT)] AS DOUBLE) - b.mu)
        |         / sqrt(b.var)))) AS d2
        |  FROM win a JOIN win b ON a.k = b.k AND abs(b.i - a.i) >= 7
        |  WHERE a.var > CAST(0.0 AS DOUBLE)
        |    AND b.var > CAST(0.0 AS DOUBLE)),
        |best AS (SELECT k, i, j, d2 FROM (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY k, i ORDER BY d2, j) AS rn
        |  FROM pairs) WHERE rn = 1)
        |SELECT w.k AS event_type, w.i AS idx, w.os[w.i] AS ord,
        |  CAST(round(CAST(CAST(sqrt(b.d2) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS mp,
        |  b.j AS mp_idx
        |FROM win w LEFT JOIN best b ON b.k = w.k AND b.i = w.i"""
        .stripMargin,
    // q470: Bellman–Ford unrolled — 12 relax-round CTEs (spare rounds
    // are no-ops at the fixpoint), each one edge join + a (seed, node)
    // integer MIN; seeds = the 4 smallest customers
    "q470_shortest_paths" -> {
      def relax(src: String, dst: String): String =
        s"""$dst AS (SELECT s, node, CAST(MIN(dist) AS BIGINT) AS dist
           |  FROM (SELECT d.s, e.dst AS node, d.dist + e.w AS dist
           |      FROM $src d JOIN e ON d.node = e.src
           |    UNION ALL SELECT s, node, dist FROM $src)
           |  GROUP BY 1, 2)""".stripMargin
      val rounds = (1 to 12).map(i =>
        relax(s"d${i - 1}", s"d$i")).mkString(",\n")
      s"""WITH cnts AS (SELECT o.o_custkey AS c, l.l_suppkey AS su,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY 1, 2),
         |p AS (SELECT c, su, 1 + cnt % 7 AS w FROM cnts),
         |e AS (SELECT c AS src, 1000000 + su AS dst, w FROM p
         |  UNION ALL SELECT 1000000 + su, c, w FROM p),
         |seeds AS (SELECT c_custkey AS s FROM customer
         |  ORDER BY c_custkey LIMIT 4),
         |d0 AS (SELECT s, s AS node, CAST(0 AS BIGINT) AS dist
         |  FROM seeds),
         |$rounds
         |SELECT s AS seed, node,
         |  CASE WHEN node >= 1000000 THEN 'supplier'
         |    ELSE 'customer' END AS kind,
         |  dist
         |FROM d12""".stripMargin
    },
    // q469: the WARC walk replayed as closed-form arithmetic in
    // doc_id (the q453 container contract): record grid exploded via
    // a bounded range join, block_sum as an ordered range fold over
    // the synthetic byte formula; corrupt ids emit one all-null row
    "q469_warc_walk" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
        |f AS (SELECT doc_id,
        |    (doc_id % 11 = 6 OR doc_id % 9 = 4) AS bad,
        |    CAST(1 + doc_id % 4 AS INT) AS n FROM ids),
        |good AS (SELECT doc_id, CAST(t.i AS INT) AS rec_idx,
        |    CASE CAST((doc_id + t.i) % 3 AS INT)
        |      WHEN 0 THEN 'response' WHEN 1 THEN 'request'
        |      ELSE 'metadata' END AS warc_type,
        |    'http://ex.test/' || CAST(doc_id AS VARCHAR) || '/'
        |      || CAST(t.i AS VARCHAR) AS target_uri,
        |    CAST(10 + (doc_id * 7 + t.i * 13) % 50 AS BIGINT)
        |      AS content_length,
        |    CAST(list_sum(list_transform(
        |      range(0, 10 + (doc_id * 7 + t.i * 13) % 50),
        |      p -> (doc_id * 31 + t.i * 17 + p * 7) % 256)) AS BIGINT)
        |      AS block_sum
        |  FROM f, range(0, 4) t(i) WHERE t.i < n AND NOT bad)
        |SELECT doc_id, rec_idx, warc_type, target_uri, content_length,
        |  block_sum FROM good
        |UNION ALL
        |SELECT doc_id, CAST(NULL AS INT), CAST(NULL AS VARCHAR),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
        |  CAST(NULL AS BIGINT) FROM f WHERE bad""".stripMargin,
    // q468: PQ replayed on an exploded (row, subspace, code) grid —
    // per-cell distance as an ordered list fold over the subspace
    // dims (the pinned left-assoc shape the Spark fold uses), argmin
    // via (dist, code) row_number so ties break small, and the per-row
    // error as list_sum over the m-ORDERED min distances (an unordered
    // SUM() would float-drift vs Spark's ascending-m fold)
    "q468_product_quantize" ->
      """WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cbr AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16),
        |cb AS (SELECT list_transform(
        |    list(struct_pack(i := vec_id, v := v) ORDER BY vec_id),
        |    s -> s.v) AS cb FROM cbr),
        |g AS (SELECT e.vec_id, e.v, cb.cb,
        |    CAST(len(e.v) // 8 AS INT) AS d FROM e, cb),
        |grid AS (SELECT vec_id, v, cb, d, tm.m, tj.j
        |  FROM g, range(0, 8) tm(m), range(0, 16) tj(j)),
        |dist AS (SELECT vec_id, CAST(m AS INT) AS m, CAST(j AS INT) AS j,
        |    list_sum(list_transform(range(0, d), i ->
        |      (v[CAST(m * d + i + 1 AS INT)]
        |        - cb[CAST(j + 1 AS INT)][CAST(m * d + i + 1 AS INT)])
        |      * (v[CAST(m * d + i + 1 AS INT)]
        |        - cb[CAST(j + 1 AS INT)][CAST(m * d + i + 1 AS INT)])))
        |      AS dd
        |  FROM grid),
        |best AS (SELECT vec_id, m, j, dd FROM (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dd, j)
        |      AS rn FROM dist) WHERE rn = 1)
        |SELECT vec_id,
        |  array_to_string(list(j ORDER BY m), ',') AS codes,
        |  CAST(round(CAST(CAST(
        |    list_sum(list(dd ORDER BY m)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS err
        |FROM best GROUP BY vec_id""".stripMargin,
    // q465: each AC count replayed as a brute positional scan — the
    // positions i where substring(text, i, len(p)) = p, which is the
    // all-occurrences (overlapping) definition the automaton computes
    "q465_aho_corasick" -> {
      val pats = Seq("table", "tab", "an", "scan", "spark", "park", "row")
      val cnts = pats.map { p =>
        val L = p.length
        s"""COALESCE(CAST(list_sum(list_transform(
           |      range(1, greatest(len(text) - $L + 2, 1)),
           |      i -> CASE WHEN substring(text, CAST(i AS INT), $L) = '$p'
           |        THEN 1 ELSE 0 END)) AS BIGINT), 0) AS n_$p"""
          .stripMargin
      }.mkString(",\n    ")
      s"""WITH c AS (SELECT doc_id,
         |    $cnts
         |  FROM documents),
         |t AS (SELECT *,
         |    ${pats.map("n_" + _).mkString(" + ")} AS n_total,
         |    ${pats.map(p => s"CASE WHEN n_$p > 0 THEN 1 ELSE 0 END")
               .mkString(" + ")} AS nph
         |  FROM c)
         |SELECT doc_id, ${pats.map("n_" + _).mkString(", ")}, n_total,
         |  CAST(nph AS BIGINT) AS n_patterns_hit
         |FROM t WHERE n_total > 0""".stripMargin
    },
    // q466: the q463 peel-round CTE generator swept over three k
    // levels (3, 4, 5) with 8 unrolled rounds each — spare rounds are
    // no-ops at the fixpoint; trussness(k−1) = level-(k−1) survivors
    // anti-joined with level-k survivors. The graph's score tops out
    // at 4 at every test SF, so level 5's fixpoint is empty and the
    // sweep is total. GUARD: the engine sweeps to maxK=12 while this
    // unroll hard-stops at k=5, so the final branch fails loudly
    // (error()) if any level-5 survivor still carries >=4-support
    // triangles — the precondition for a 6-truss; a future SF growing
    // one would otherwise silently under-report trussness as 5.
    "q466_truss_decomp" -> {
      def round(src: String, dst: String, minSup: Int): String =
        s"""t$dst AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM $src e1 JOIN $src e2 ON e1.v = e2.u
           |  JOIN $src e3 ON e3.u = e1.u AND e3.v = e2.v),
           |s$dst AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT a AS u, b AS v FROM t$dst
           |    UNION ALL SELECT b, c FROM t$dst
           |    UNION ALL SELECT a, c FROM t$dst) GROUP BY 1, 2),
           |$dst AS (SELECT e.u, e.v FROM $src e
           |  JOIN s$dst s ON e.u = s.u AND e.v = s.v
           |  WHERE s.cnt >= $minSup)""".stripMargin
      val rounds = 8
      def level(src: String, k: Int): (String, String) = {
        var cur = src
        val sqls = (1 to rounds).map { r =>
          val nxt = s"k${k}r$r"
          val s = round(cur, nxt, k - 2)
          cur = nxt
          s
        }
        (sqls.mkString(",\n"), cur)
      }
      val (l3, e3) = level("e0", 3)
      val (l4, e4) = level(e3, 4)
      val (l5, e5) = level(e4, 5)
      s"""WITH pts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
         |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
         |e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
         |$l3,
         |$l4,
         |$l5,
         |tg6 AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM $e5 e1 JOIN $e5 e2 ON e1.v = e2.u
         |  JOIN $e5 e3 ON e3.u = e1.u AND e3.v = e2.v),
         |sg6 AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT a AS u, b AS v FROM tg6
         |    UNION ALL SELECT b, c FROM tg6
         |    UNION ALL SELECT a, c FROM tg6) GROUP BY 1, 2),
         |g6 AS (SELECT count(*) AS n FROM sg6 WHERE cnt >= 4)
         |SELECT e.u, e.v, CAST(2 AS BIGINT) AS trussness FROM e0 e
         |  ANTI JOIN $e3 s ON e.u = s.u AND e.v = s.v
         |UNION ALL
         |SELECT e.u, e.v, CAST(3 AS BIGINT) FROM $e3 e
         |  ANTI JOIN $e4 s ON e.u = s.u AND e.v = s.v
         |UNION ALL
         |SELECT e.u, e.v, CAST(4 AS BIGINT) FROM $e4 e
         |  ANTI JOIN $e5 s ON e.u = s.u AND e.v = s.v
         |UNION ALL
         |SELECT e.u, e.v,
         |  CASE WHEN (SELECT n FROM g6) > 0
         |    THEN CAST(error('q466 oracle: level-5 survivors carry '
         |      || '>=4-support triangles - a 6-truss may exist; '
         |      || 'widen the unrolled k sweep') AS BIGINT)
         |    ELSE CAST(5 AS BIGINT) END
         |FROM $e5 e""".stripMargin
    },
    // q462: Smith-Waterman replayed by ANTI-DIAGONALS as a recursive
    // CTE — diagonal d depends only on d-1/d-2 elementwise, so each
    // recursion step advances one diagonal with a per-id lag window
    // for the i-1 cells. (A nested list-fold formulation is cell-
    // equivalent but DuckDB 1.0 mis-evaluates correlated nested
    // lambdas past ~dozens of rows — probed; the recursive form is
    // row-count-stable.) Scores pinned (+2/-1/-1); integer cells.
    "q462_smith_waterman" ->
      """WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name AS name
        |  FROM customer),
        |p AS (SELECT id, 'xx#' || substring(name, 1, 16)
        |    || substring(name, 18, 1) || substring(name, 17, 1)
        |    || '#zz' AS hay
        |  FROM c WHERE id % 7 = 0),
        |j AS (SELECT c.id, c.name AS a, p.hay AS b
        |  FROM c JOIN p ON c.id = p.id),
        |dp AS (
        |  SELECT id, a, b, i, 0 AS cur, 0 AS prev, 1 AS d
        |  FROM j CROSS JOIN range(0, 64) t(i) WHERE i <= length(a)
        |  UNION ALL
        |  SELECT id, a, b, i,
        |    CASE WHEN i >= 1 AND d + 1 - i >= 1
        |        AND d + 1 - i <= length(b) THEN
        |      greatest(0,
        |        coalesce(lag(prev) OVER (PARTITION BY id ORDER BY i), 0)
        |          + CASE WHEN substr(a, CAST(i AS INT), 1)
        |            = substr(b, CAST(d + 1 - i AS INT), 1)
        |            THEN 2 ELSE -1 END,
        |        coalesce(lag(cur) OVER (PARTITION BY id ORDER BY i), 0)
        |          - 1,
        |        cur - 1)
        |    ELSE 0 END AS cur,
        |    cur AS prev,
        |    d + 1 AS d
        |  FROM dp WHERE d < length(a) + length(b)
        |)
        |SELECT id, CAST(max(cur) AS BIGINT) AS sw,
        |  CAST(max(lv) AS BIGINT) AS lev
        |FROM (SELECT id, cur, 0 AS lv FROM dp
        |  UNION ALL SELECT id, 0, levenshtein(a, b) FROM j)
        |GROUP BY id""".stripMargin,
    // q461: the q130 replay with the tree ladder unrolled — leaf
    // centroids route to seeds, rows route to seeds then to the
    // chosen seed's children; every pick is the q130 (cos DESC, cell)
    // row_number, cosines the q127 list_aggregate formulation
    "q461_semdedup_tree" ->
      """WITH e0 AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |pl AS (SELECT vec_id + 10000 AS vec_id, list_transform(v, x -> x * CAST(1.01 AS DOUBLE) + CAST(0.001 AS DOUBLE)) AS v FROM e0 WHERE vec_id % 15 = 0),
        |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM pl),
        |cent AS (SELECT vec_id AS cell, v AS centroid FROM e ORDER BY vec_id LIMIT 40),
        |seeds AS (SELECT cell AS p, centroid AS pv FROM cent ORDER BY cell LIMIT 5),
        |rsims AS (SELECT c.cell, s.p,
        |list_aggregate(list_transform(list_zip(c.centroid, s.pv), z -> z[1]*z[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(c.centroid, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(s.pv, z -> z*z), 'sum'))) AS cos
        |FROM cent c, seeds s),
        |rpick AS (SELECT cell, p FROM (SELECT cell, p, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY cos DESC, p) AS rn FROM rsims WHERE NOT isnan(cos)) WHERE rn = 1),
        |tsims AS (SELECT e.vec_id, s.p,
        |list_aggregate(list_transform(list_zip(e.v, s.pv), z -> z[1]*z[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(e.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(s.pv, z -> z*z), 'sum'))) AS cos
        |FROM e, seeds s),
        |tpick AS (SELECT vec_id, p FROM (SELECT vec_id, p, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, p) AS rn FROM tsims WHERE NOT isnan(cos)) WHERE rn = 1),
        |csims AS (SELECT e.vec_id, c.cell,
        |list_aggregate(list_transform(list_zip(e.v, c.centroid), z -> z[1]*z[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(e.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(c.centroid, z -> z*z), 'sum'))) AS cos
        |FROM e JOIN tpick t USING (vec_id)
        |JOIN rpick r ON r.p = t.p JOIN cent c ON c.cell = r.cell),
        |cpick AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn FROM csims WHERE NOT isnan(cos)) WHERE rn = 1),
        |a AS (SELECT e.vec_id, cp.cell, e.v FROM e LEFT JOIN cpick cp USING (vec_id)),
        |pr AS (SELECT y.vec_id AS ib,
        |list_aggregate(list_transform(list_zip(x.v, y.v), z -> z[1]*z[2]), 'sum') /
        |(sqrt(list_aggregate(list_transform(x.v, z -> z*z), 'sum')) * sqrt(list_aggregate(list_transform(y.v, z -> z*z), 'sum'))) AS cos
        |FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |dr AS (SELECT DISTINCT ib FROM pr WHERE NOT isnan(cos) AND cos >= 0.9)
        |SELECT a.vec_id, a.cell, (dr.ib IS NULL) AS kept
        |FROM a LEFT JOIN dr ON a.vec_id = dr.ib""".stripMargin,
    // q460: the q453 closed-form container replay for JPEG/EXIF —
    // every probed field is arithmetic in doc_id; byte order (II/MM)
    // never reaches the values, only the byte_order column
    "q460_exif_probe" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
        |f AS (SELECT doc_id,
        |    (doc_id % 8 = 1 OR doc_id % 11 = 5) AS bad,
        |    CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS bo
        |  FROM ids)
        |SELECT doc_id,
        |  CASE WHEN bad THEN NULL ELSE bo END AS byte_order,
        |  CASE WHEN bad THEN NULL
        |    ELSE 'CAM' || CAST(doc_id % 7 AS VARCHAR) END AS make,
        |  CASE WHEN bad THEN NULL
        |    ELSE CAST(1 + doc_id % 8 AS INT) END AS orientation,
        |  CASE WHEN bad THEN NULL
        |    ELSE CAST(640 + (doc_id * 13) % 1024 AS BIGINT) END
        |    AS exif_width,
        |  CASE WHEN bad THEN NULL
        |    ELSE CAST(480 + (doc_id * 17) % 768 AS BIGINT) END
        |    AS exif_height
        |FROM f""".stripMargin,
    // q459: q364's CTEs again; per-hop P sums quantize est to 1e-4
    // decimals (exact, order-free), the crossing CASE mirrors the
    // Spark fold's CAST(h-1)+ratio shapes hop for hop
    "q459_eff_diameter" -> {
      val est = (src: String, hop: Int) =>
        s"""e$hop AS (SELECT node,
           |  (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
           |     + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE)))
           |   * CAST(64.0 AS DOUBLE) * CAST(64.0 AS DOUBLE) /
           |   ((CAST(64.0 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)) +
           |    SUM(CAST(1.0 AS DOUBLE)
           |      / CAST((CAST(1 AS BIGINT) << CAST(mr AS INT)) AS DOUBLE)))
           |   AS est
           |FROM $src GROUP BY 1)""".stripMargin
      val base =
        """WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
          |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          |edges AS (SELECT c AS src, 1000000 + s AS dst FROM pairs
          |UNION ALL SELECT 1000000 + s, c FROM pairs),
          |nodes AS (SELECT DISTINCT src AS node FROM edges),
          |h0 AS (SELECT node,
          |  CAST(('0x' || substr(md5(CAST(node AS VARCHAR) || ':r'), 1, 4))
          |    AS BIGINT) % 64 AS reg,
          |  LEAST(4 * length(regexp_extract(
          |      substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12), '^0*')) +
          |    CASE substr(substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12),
          |        length(regexp_extract(
          |          substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12), '^0*'))
          |          + 1, 1)
          |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
          |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
          |      ELSE 0 END + 1, 40) AS mr
          |FROM nodes)""".stripMargin
      val hops = (1 to 4).map { h =>
        s"""h$h AS (SELECT node, reg, MAX(mr) AS mr FROM (
           |  SELECT e.src AS node, r.reg, r.mr
           |    FROM edges e JOIN h${h - 1} r ON e.dst = r.node
           |  UNION ALL SELECT node, reg, mr FROM h${h - 1}) GROUP BY 1, 2),
           |""".stripMargin + est(s"h$h", h)
      }.mkString(",\n", ",\n", "")
      val pHop = (1 to 4).map { h =>
        s"""p$h AS (SELECT sum(round(CAST(CAST(est AS VARCHAR)
           |  AS DECIMAL(38,20)), 4)) AS p FROM e$h)""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + hops + pHop +
        """,
          |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
          |f AS (SELECT n_nodes,
          |    CAST(n_nodes AS DOUBLE) AS p0d,
          |    CAST(p1.p AS DOUBLE) AS p1d, CAST(p2.p AS DOUBLE) AS p2d,
          |    CAST(p3.p AS DOUBLE) AS p3d, CAST(p4.p AS DOUBLE) AS p4d
          |  FROM nn CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN p3
          |  CROSS JOIN p4),
          |g AS (SELECT n_nodes, p4d, p0d, p1d, p2d, p3d,
          |    CAST(0.9 AS DOUBLE) * p4d AS t FROM f)
          |SELECT n_nodes,
          |  CAST(round(CAST(CAST(p4d AS VARCHAR) AS DECIMAL(38,20)), 4)
          |    AS DOUBLE) AS p_final,
          |  CAST(round(CAST(CAST(
          |    CASE WHEN p0d >= t THEN CAST(0.0 AS DOUBLE)
          |      WHEN p1d >= t THEN CAST(1 - 1 AS DOUBLE)
          |        + (t - p0d) / (p1d - p0d)
          |      WHEN p2d >= t THEN CAST(2 - 1 AS DOUBLE)
          |        + (t - p1d) / (p2d - p1d)
          |      WHEN p3d >= t THEN CAST(3 - 1 AS DOUBLE)
          |        + (t - p2d) / (p3d - p2d)
          |      ELSE CAST(4 - 1 AS DOUBLE) + (t - p3d) / (p4d - p3d)
          |    END AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
          |    AS eff_diameter
          |FROM g""".stripMargin
    },
    // q458: the pooled lower median is a pinned row_number pick; the
    // k x 2 census chi2 folds per-cell terms in group order via the
    // transform-then-reduce replay of the Spark acc + (t1 + t2) shape
    "q458_mood_median" ->
      """WITH b AS (SELECT event_type AS sc,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |      THEN 'wkend' ELSE 'wkday' END AS g,
        |    CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |med AS (SELECT sc, x AS med FROM (
        |  SELECT sc, x, row_number() OVER (PARTITION BY sc ORDER BY x)
        |      AS i, COUNT(*) OVER (PARTITION BY sc) AS n FROM b)
        |  WHERE i = (n + 1) // 2),
        |cells AS (SELECT sc, g, CAST(count(*) AS BIGINT) AS ni,
        |    CAST(sum(CASE WHEN x > med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ai, max(med) AS med
        |  FROM b JOIN med USING (sc) GROUP BY 1, 2),
        |per AS (SELECT sc, max(med) AS pooled_med,
        |    CAST(sum(ni) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k_groups,
        |    CAST(sum(ai) AS BIGINT) AS n_above,
        |    list(struct_pack(g := g, nd := CAST(ni AS DOUBLE),
        |      ad := CAST(ai AS DOUBLE)) ORDER BY g) AS cl
        |  FROM cells GROUP BY 1)
        |SELECT sc AS event_type, n, k_groups, pooled_med, n_above,
        |  CASE WHEN k_groups > 1 AND n_above > 0 AND n_above < n THEN
        |    CAST(round(CAST(CAST(
        |      list_reduce(list_transform(cl, e ->
        |        (e.ad - e.nd * CAST(n_above AS DOUBLE)
        |           / CAST(n AS DOUBLE))
        |        * (e.ad - e.nd * CAST(n_above AS DOUBLE)
        |           / CAST(n AS DOUBLE))
        |        / (e.nd * CAST(n_above AS DOUBLE) / CAST(n AS DOUBLE))
        |        + ((e.nd - e.ad) - e.nd * (CAST(n AS DOUBLE)
        |             - CAST(n_above AS DOUBLE)) / CAST(n AS DOUBLE))
        |          * ((e.nd - e.ad) - e.nd * (CAST(n AS DOUBLE)
        |             - CAST(n_above AS DOUBLE)) / CAST(n AS DOUBLE))
        |          / (e.nd * (CAST(n AS DOUBLE)
        |             - CAST(n_above AS DOUBLE)) / CAST(n AS DOUBLE))),
        |        (a, v) -> a + v)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS chi2,
        |  CASE WHEN k_groups > 1 THEN k_groups - 1 END AS df
        |FROM per""".stripMargin,
    // q416: journey stamping is one exclusive-prefix window; credits
    // are fixed double shapes of small integers; channel folds run in
    // (u, j) order via seedless list_reduce; min_by/max_by scalar keys
    // are legal (only STRUCT ordering keys are the DuckDB 1.0 gap) and
    // the o key is unique per user, matching Spark's min/max(struct)
    "q416_attribution" ->
      """WITH e AS (SELECT user_id AS u,
        |    lpad(CAST(epoch_ms(ts) AS VARCHAR), 14, '0') || '_' ||
        |      lpad(CAST(event_id AS VARCHAR), 10, '0') AS o,
        |    event_type AS ch,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cv
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |st AS (SELECT *, CAST(coalesce(sum(cv) OVER (PARTITION BY u
        |    ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS j FROM e),
        |tch AS (SELECT * FROM st WHERE cv = 0),
        |cvs AS (SELECT u, j, ch AS conv_ch FROM st WHERE cv = 1),
        |ja AS (SELECT u, j, CAST(count(*) AS BIGINT) AS n,
        |    min_by(ch, o) AS fch, max_by(ch, o) AS lch
        |  FROM tch GROUP BY 1, 2),
        |closed AS (SELECT ja.* FROM ja JOIN cvs USING (u, j)),
        |orph AS (SELECT conv_ch AS channel,
        |    CAST(count(*) AS BIGINT) AS n_orphan
        |  FROM cvs LEFT JOIN ja USING (u, j) WHERE ja.n IS NULL
        |  GROUP BY 1),
        |pjc AS (SELECT t.u, t.j, t.ch, CAST(count(*) AS BIGINT) AS t,
        |    max(c.n) AS n,
        |    CAST(max(CASE WHEN c.fch = t.ch THEN 1 ELSE 0 END) AS BIGINT)
        |      AS isf,
        |    CAST(max(CASE WHEN c.lch = t.ch THEN 1 ELSE 0 END) AS BIGINT)
        |      AS isl
        |  FROM tch t JOIN closed c ON t.u = c.u AND t.j = c.j
        |  GROUP BY 1, 2, 3),
        |sc AS (SELECT u, j, ch, t, isf, isl,
        |    CAST(t AS DOUBLE) / CAST(n AS DOUBLE) AS lin,
        |    CASE WHEN n = 1 THEN 1.0
        |      WHEN n = 2 THEN CAST(t AS DOUBLE) * 0.5
        |      ELSE CAST(isf AS DOUBLE) * 0.4 + CAST(isl AS DOUBLE) * 0.4
        |        + CAST(t - isf - isl AS DOUBLE)
        |          * (0.2 / (CAST(n AS DOUBLE) - 2.0)) END AS ush
        |  FROM pjc),
        |rl AS (SELECT ch AS channel, CAST(sum(t) AS BIGINT) AS n_touches,
        |    CAST(count(*) AS BIGINT) AS n_journeys,
        |    CAST(sum(isf) AS BIGINT) AS n_first,
        |    CAST(sum(isl) AS BIGINT) AS n_last,
        |    list(struct_pack(lin := lin, ush := ush) ORDER BY u, j) AS cl
        |  FROM sc GROUP BY 1),
        |rr AS (SELECT channel, n_touches, n_journeys, n_first, n_last,
        |    list_reduce(list_transform(cl, e -> e.lin), (x, y) -> x + y)
        |      AS credit_linear,
        |    list_reduce(list_transform(cl, e -> e.ush), (x, y) -> x + y)
        |      AS credit_ushape
        |  FROM rl)
        |SELECT channel,
        |  coalesce(n_touches, 0) AS n_touches,
        |  coalesce(n_journeys, 0) AS n_journeys,
        |  coalesce(n_first, 0) AS n_first,
        |  coalesce(n_last, 0) AS n_last,
        |  CAST(round(CAST(CAST(coalesce(credit_linear, 0.0) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS credit_linear,
        |  CAST(round(CAST(CAST(coalesce(credit_ushape, 0.0) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS credit_ushape,
        |  coalesce(n_orphan, 0) AS n_orphan
        |FROM rr FULL OUTER JOIN orph USING (channel)""".stripMargin,
    // q417: the q255 KM replay + rectangle areas lag-chained in
    // duration order, tail segment added LAST (one + on both engines)
    "q417_rmst" ->
      """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
        |    MAX(CAST(ts AS DATE)) AS ld FROM events GROUP BY 1),
        |h AS (SELECT MAX(ld) AS wend FROM u),
        |s AS (SELECT date_diff('day', fd, ld) AS dur,
        |    CASE WHEN date_diff('day', ld, wend) >= 7 THEN 1 ELSE 0 END AS ev
        |  FROM u, h),
        |c AS (SELECT dur AS d, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(ev) AS BIGINT) AS deaths FROM s GROUP BY 1),
        |r AS (SELECT d, n_obs, deaths,
        |    CAST(SUM(n_obs) OVER () - COALESCE(SUM(n_obs) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM c),
        |l AS (SELECT list(struct_pack(d := d, deaths := deaths,
        |    n_risk := n_risk) ORDER BY d) AS arr FROM r),
        |x AS (SELECT unnest(range(1, len(arr) + 1)) AS i, arr FROM l),
        |f AS (SELECT arr[i].d AS d,
        |    list_reduce(list_transform(list_slice(arr, 1, i),
        |      e -> 1.0 - CAST(e.deaths AS DOUBLE) / CAST(e.n_risk AS DOUBLE)),
        |      (a, b) -> a * b) AS surv
        |  FROM x),
        |seg AS (SELECT d, surv,
        |    COALESCE(lag(d) OVER (ORDER BY d), 0) AS pd,
        |    COALESCE(lag(surv) OVER (ORDER BY d), 1.0) AS ps
        |  FROM f),
        |terms AS (SELECT CAST(count(*) AS BIGINT) AS n_durations,
        |    list(ps * CAST(least(d, 14) - least(pd, 14) AS DOUBLE)
        |      ORDER BY d) AS ts,
        |    max_by(surv, d) AS ls, CAST(max(d) AS BIGINT) AS ld
        |  FROM seg)
        |SELECT CAST(14 AS BIGINT) AS tau, n_durations,
        |  CASE WHEN n_durations > 0 THEN
        |    CAST(round(CAST(CAST(
        |      list_reduce(ts, (x, y) -> x + y)
        |        + ls * CAST(14 - least(ld, 14) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS rmst
        |FROM terms""".stripMargin,
    // q418: the q249 bucket census rolled into one ECE; terms fold in
    // bucket order over the <=10-element list
    "q418_ece" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS s,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1
        |      ELSE 0 END AS p
        |  FROM events),
        |c AS (SELECT g, s, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS np FROM s GROUP BY 1, 2),
        |w AS (SELECT g, s, n, np,
        |    COALESCE(SUM(n) OVER (PARTITION BY g ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
        |    SUM(n) OVER (PARTITION BY g) AS tot FROM c),
        |a AS (SELECT g, LEAST(9, (bef * 10) // tot) AS bucket,
        |    CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(s * n) AS BIGINT) AS ss FROM w GROUP BY 1, 2),
        |t AS (SELECT g, bucket, n,
        |    CAST(n AS DOUBLE) * abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0) AS t
        |  FROM a),
        |r AS (SELECT g, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_buckets,
        |    list(t ORDER BY bucket) AS ts
        |  FROM t GROUP BY 1)
        |SELECT g AS event_type, n, n_buckets,
        |  CAST(round(CAST(CAST(
        |    list_reduce(ts, (x, y) -> x + y) / CAST(n AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS ece
        |FROM r""".stripMargin,
    // q238: element-1 mapped to op(zero, e1) (0.0 + x == x in IEEE), then
    // the same four-field step; fields ordered so every acc.s reader
    // precedes the s overwrite (the q40 list_reduce aliasing defense);
    // VARCHAR->DECIMAL bridges mirror Spark's round.
    "q238_cusum_drift" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS DOUBLE) AS x FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    SUM(x) AS sx, list(struct_pack(o := day, x := x) ORDER BY day) AS series
        |  FROM d GROUP BY event_type),
        |m AS (SELECT *, sx / n_obs AS mean FROM g),
        |r AS (SELECT event_type, n_obs, mean,
        |  list_reduce(list_transform(series, e -> struct_pack(
        |    na := CAST(CASE WHEN greatest(0.0, e.x - mean - 2.0) >= 50.0 THEN 1 ELSE 0 END AS BIGINT),
        |    fa := CASE WHEN greatest(0.0, e.x - mean - 2.0) >= 50.0 THEN e.o END,
        |    mx := greatest(0.0, e.x - mean - 2.0),
        |    s := greatest(0.0, e.x - mean - 2.0),
        |    o := e.o, xv := e.x)),
        |  (acc, x) -> struct_pack(
        |    na := acc.na + CASE WHEN greatest(0.0, acc.s + x.xv - mean - 2.0) >= 50.0 THEN 1 ELSE 0 END,
        |    fa := coalesce(acc.fa, CASE WHEN greatest(0.0, acc.s + x.xv - mean - 2.0) >= 50.0 THEN x.o END),
        |    mx := greatest(acc.mx, greatest(0.0, acc.s + x.xv - mean - 2.0)),
        |    s := greatest(0.0, acc.s + x.xv - mean - 2.0),
        |    o := x.o, xv := x.xv)) AS f
        |  FROM m)
        |SELECT event_type, n_obs,
        |  CAST(round(CAST(CAST(mean AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean,
        |  CAST(f.na AS BIGINT) AS n_alarms, f.fa AS first_alarm,
        |  CAST(round(CAST(CAST(f.mx AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS max_stat
        |FROM r""".stripMargin,
    // q239: the bucketed prefix-sum decomposition equals one global
    // cumulative over distinct values; the max runs on exact integers
    "q239_ks_drift" ->
      """WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS r
        |  FROM events),
        |cen AS (SELECT v, CAST(SUM(1 - r) AS BIGINT) AS ca,
        |    CAST(SUM(r) AS BIGINT) AS cb FROM c GROUP BY v),
        |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
        |    CAST(COUNT(*) AS BIGINT) AS nv FROM cen),
        |cum AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS a,
        |    SUM(cb) OVER (ORDER BY v) AS b FROM cen)
        |SELECT tot.na AS n_a, tot.nb AS n_b, tot.nv AS n_values,
        |  CAST(MAX(ABS(a * tot.nb - b * tot.na)) AS BIGINT) AS d_num,
        |  CAST(round(CAST(CAST(CAST(MAX(ABS(a * tot.nb - b * tot.na)) AS DOUBLE) /
        |    CAST(tot.na * tot.nb AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS d
        |FROM cum, tot GROUP BY tot.na, tot.nb, tot.nv""".stripMargin,
    // q240: r_k = [n²·Σx·x' − n·S·(H+T) + (n−k)·S²] / [n²·Σx² − n·S²] —
    // exact integer numerator/denominator, one terminal division
    "q240_acf" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM d),
        |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM d GROUP BY 1),
        |g AS (SELECT CAST(unnest(range(1, 8)) AS INT) AS lag),
        |p AS (SELECT a.event_type, g.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(a.x * b.x) AS BIGINT) AS sxy, CAST(SUM(a.x) AS BIGINT) AS sh,
        |    CAST(SUM(b.x) AS BIGINT) AS st
        |  FROM r a JOIN g ON true
        |  JOIN r b ON b.event_type = a.event_type AND b.rn = a.rn + g.lag
        |  GROUP BY 1, 2)
        |SELECT p.event_type, p.lag, t.n AS n_obs, p.n_pairs,
        |  CASE WHEN t.n * t.n * t.sxx - t.n * t.s * t.s <> 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(t.n * t.n * p.sxy - t.n * t.s * (p.sh + p.st)
        |        + (t.n - p.lag) * t.s * t.s AS DOUBLE) /
        |      CAST(t.n * t.n * t.sxx - t.n * t.s * t.s AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS r
        |FROM p JOIN t USING (event_type)""".stripMargin,
    // q241: tie-run rank contribution v·(c·r0 + c·(c−1)/2) — exact ints
    "q241_gini" ->
      """WITH cen AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, v, c,
        |    SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum FROM cen),
        |x AS (SELECT source, v, c, cum - c + 1 AS r0 FROM r),
        |g AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(v * c) AS BIGINT) AS total,
        |    CAST(SUM(v * (c * r0 + c * (c - 1) // 2)) AS BIGINT) AS six
        |  FROM x GROUP BY 1)
        |SELECT source, n, total,
        |  CASE WHEN n > 1 AND total <> 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(2 * six - (n + 1) * total AS DOUBLE) /
        |      CAST(n * total AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS gini
        |FROM g""".stripMargin,
    // q242: Spark dayofweek is 1=Sunday..7; DuckDB's is 0-based
    "q242_seasonality" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |cell AS (SELECT event_type, CAST(dayofweek(day) + 1 AS INT) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(x) AS BIGINT) AS total
        |  FROM d GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(SUM(n_days) AS BIGINT) AS n_all,
        |    CAST(SUM(total) AS BIGINT) AS t_all FROM cell GROUP BY 1)
        |SELECT cell.event_type, cell.dow, cell.n_days, cell.total,
        |  CAST(round(CAST(CAST(CAST(cell.total AS DOUBLE) / CAST(cell.n_days AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean,
        |  CASE WHEN t.t_all <> 0 THEN
        |    CAST(round(CAST(CAST(CAST(cell.total * t.n_all AS DOUBLE) /
        |      CAST(cell.n_days * t.t_all AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS lift
        |FROM cell JOIN t USING (event_type)""".stripMargin,
    // q243: the Holt state couples BOTH fields (b reads the step's new l
    // AND the old l), so no struct field order survives list_reduce's
    // in-place field aliasing (observed: acc.l inside the b expression
    // reads the just-overwritten value — the q40/q238 defense only
    // covers single-overwritten-field states). The replay is a
    // recursive CTE instead: each iteration reads the PREVIOUS row's
    // (l, b) — immutable by SQL semantics on any engine.
    "q243_holt_forecast" ->
      """WITH RECURSIVE d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS DOUBLE) AS x FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    list(x ORDER BY day) AS xs FROM d GROUP BY 1),
        |it AS (
        |  SELECT event_type, n_obs, xs, 1 AS i, xs[1] AS l,
        |    CAST(0.0 AS DOUBLE) AS b FROM g
        |  UNION ALL
        |  SELECT event_type, n_obs, xs, i + 1,
        |    0.5 * xs[i + 1] + 0.5 * (l + b),
        |    0.25 * ((0.5 * xs[i + 1] + 0.5 * (l + b)) - l) + 0.75 * b
        |  FROM it WHERE i < n_obs)
        |SELECT event_type, n_obs,
        |  CAST(round(CAST(CAST(l AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS level,
        |  CAST(round(CAST(CAST(b AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS trend,
        |  CAST(round(CAST(CAST(l + 7.0 * b AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS forecast
        |FROM it WHERE i = n_obs""".stripMargin,
    // q244: all-integer ranking (tf desc, df asc, term asc) — no float score
    "q244_rare_terms" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT doc_id, term FROM t WHERE length(term) > 0),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM t2 GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        |dfv AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf, n
        |  GROUP BY term, n.nd HAVING COUNT(*) * 4 <= n.nd * 3),
        |j AS (SELECT tf.doc_id, tf.term, tf.tf, dfv.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, dfv.df ASC, tf.term ASC) AS rnk
        |  FROM tf JOIN dfv USING (term))
        |SELECT doc_id, term, tf, df, CAST(rnk AS BIGINT) AS rnk
        |FROM j WHERE rnk <= 3""".stripMargin,
    // q272: z² enters as the expression 1.96*1.96 (same double both
    // engines); bound expressions mirror Spark's shape term for term
    "q272_wilson_bounds" ->
      """WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |  FROM events GROUP BY 1),
        |x AS (SELECT event_type, n, n_pos,
        |    CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |    CAST(n AS DOUBLE) AS nd FROM c)
        |SELECT event_type, n, n_pos,
        |  CAST(round(CAST(CAST(p AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS rate,
        |  CAST(round(CAST(CAST(
        |    (p + (1.96 * 1.96) / (2.0 * nd)) / (1.0 + (1.96 * 1.96) / nd)
        |      - (1.96 * sqrt(p * (1.0 - p) / nd + (1.96 * 1.96) / (4.0 * nd * nd)))
        |        / (1.0 + (1.96 * 1.96) / nd)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS lo,
        |  CAST(round(CAST(CAST(
        |    (p + (1.96 * 1.96) / (2.0 * nd)) / (1.0 + (1.96 * 1.96) / nd)
        |      + (1.96 * sqrt(p * (1.0 - p) / nd + (1.96 * 1.96) / (4.0 * nd * nd)))
        |        / (1.0 + (1.96 * 1.96) / nd)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS hi
        |FROM x""".stripMargin,
    // q273: pooled-variance z over exact slice counts
    "q273_two_proportion" ->
      """WITH c AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' AND value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos_a,
        |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' AND value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos_b
        |  FROM events GROUP BY 1),
        |x AS (SELECT *, CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        |    CAST(pos_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |    CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        |    CAST(pos_a + pos_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
        |  FROM c)
        |SELECT event_type, n_a, pos_a, n_b, pos_b,
        |  CAST(round(CAST(CAST(pa AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS rate_a,
        |  CAST(round(CAST(CAST(pb AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS rate_b,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    AND pp * (1.0 - pp) * (1.0 / na + 1.0 / nb) > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      (pa - pb) / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS z
        |FROM x""".stripMargin,
    // q271: per-source (tokens, distinct) points; OLS folds in source
    // order (q246's pure-additive shape)
    "q271_heaps" ->
      """WITH t AS (SELECT source AS g,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |p AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |    CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
        |  FROM t WHERE length(tok) > 0 GROUP BY 1),
        |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    list(struct_pack(x := ln(CAST(n_tok AS DOUBLE)),
        |      y := ln(CAST(v AS DOUBLE))) ORDER BY g, n_tok, v) AS ls
        |  FROM p WHERE n_tok > 0 AND v > 0),
        |f AS (SELECT n, list_reduce(list_transform(ls, e -> struct_pack(
        |    sx := e.x, sy := e.y, sxy := e.x * e.y, sxx := e.x * e.x)),
        |  (acc, e) -> struct_pack(
        |    sx := acc.sx + e.sx, sy := acc.sy + e.sy,
        |    sxy := acc.sxy + e.sxy, sxx := acc.sxx + e.sxx)) AS f
        |  FROM l)
        |SELECT n AS n_groups,
        |  CASE WHEN n * f.sxx - f.sx * f.sx <> 0 THEN
        |    CAST(round(CAST(CAST(
        |      (n * f.sxy - f.sx * f.sy) / (n * f.sxx - f.sx * f.sx)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS beta,
        |  CAST(round(CAST(CAST(
        |    (f.sy - ((n * f.sxy - f.sx * f.sy) / (n * f.sxx - f.sx * f.sx)) * f.sx)
        |      / CAST(n AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS ln_k
        |FROM f""".stripMargin,
    // q269: ACF's integer expansion with two series; full-series
    // variances in the denominator (the standard CCF estimator)
    "q269_ccf" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |r AS (SELECT x, y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
        |  FROM d),
        |g AS (SELECT CAST(unnest(range(-7, 8)) AS BIGINT) AS k),
        |p AS (SELECT g.k, CAST(COUNT(*) AS BIGINT) AS np,
        |    CAST(SUM(a.x * b.y) AS BIGINT) AS sxy,
        |    CAST(SUM(a.x) AS BIGINT) AS sxh, CAST(SUM(b.y) AS BIGINT) AS syt
        |  FROM r a JOIN g ON true JOIN r b ON b.rn = a.rn + g.k GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy FROM d)
        |SELECT CAST(p.k AS INT) AS lag, t.n AS n_obs, p.np AS n_pairs,
        |  CASE WHEN CAST(t.n * t.n * t.sxx - t.n * t.sx * t.sx AS DOUBLE) > 0
        |    AND CAST(t.n * t.n * t.syy - t.n * t.sy * t.sy AS DOUBLE) > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(t.n * t.n * p.sxy - t.n * t.sy * p.sxh - t.n * t.sx * p.syt
        |        + (t.n - abs(p.k)) * t.sx * t.sy AS DOUBLE) /
        |      (sqrt(CAST(t.n * t.n * t.sxx - t.n * t.sx * t.sx AS DOUBLE)) *
        |       sqrt(CAST(t.n * t.n * t.syy - t.n * t.sy * t.sy AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS r
        |FROM p, t""".stripMargin,
    // q270: q259's MATERIALIZED chain + per-prev and π-weighted entropy
    // folds, both in sorted order
    "q270_entropy_rate" -> {
      val base =
        """WITH ev AS MATERIALIZED (SELECT user_id, epoch_ms(ts) AS ms,
          |    event_id, event_type FROM events),
          |lg AS MATERIALIZED (SELECT event_type AS curr, lag(event_type) OVER (
          |    PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM ev),
          |tr AS MATERIALIZED (SELECT prev, curr, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM lg WHERE prev IS NOT NULL GROUP BY 1, 2),
          |rr AS MATERIALIZED (SELECT prev, CAST(SUM(c) AS BIGINT) AS r FROM tr
          |  GROUP BY 1),
          |st AS MATERIALIZED (SELECT prev AS state FROM tr
          |  UNION SELECT curr FROM tr),
          |ns AS MATERIALIZED (SELECT COUNT(*) AS ns FROM st),
          |p0 AS MATERIALIZED (SELECT state, 1000000000 // ns.ns AS pf
          |  FROM st CROSS JOIN ns)""".stripMargin
      val rounds = (1 to 12).map { i =>
        s"""fl$i AS MATERIALIZED (SELECT t.curr, SUM((p.pf * t.c) // rr.r) AS mass
           |FROM tr t JOIN p${i - 1} p ON t.prev = p.state
           |JOIN rr ON t.prev = rr.prev GROUP BY t.curr),
           |tt$i AS MATERIALIZED (SELECT SUM(mass) AS t FROM fl$i),
           |p$i AS MATERIALIZED (SELECT s.state,
           |CAST((COALESCE(f.mass, 0) * 1000000000) // tt$i.t AS BIGINT) AS pf
           |FROM st s CROSS JOIN tt$i LEFT JOIN fl$i f ON s.state = f.curr)""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        """,
          |hp AS MATERIALIZED (SELECT t.prev AS state,
          |  list_reduce(list_transform(list(struct_pack(c := t.curr,
          |    t := -((CAST(t.c AS DOUBLE) / CAST(rr.r AS DOUBLE))
          |      * ln(CAST(t.c AS DOUBLE) / CAST(rr.r AS DOUBLE)))) ORDER BY t.curr),
          |    e -> e.t), (a, b) -> a + b) AS h
          |  FROM tr t JOIN rr ON t.prev = rr.prev GROUP BY t.prev),
          |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_transitions FROM tr),
          |wgt AS (SELECT s.state,
          |    (CAST(p12.pf AS DOUBLE) / 1000000000.0) * COALESCE(hp.h, 0.0) AS t
          |  FROM st s JOIN p12 ON s.state = p12.state
          |  LEFT JOIN hp ON s.state = hp.state),
          |fin AS (SELECT list(struct_pack(s := state, t := t) ORDER BY state) AS l
          |  FROM wgt)
          |SELECT CAST(ns.ns AS BIGINT) AS n_states, nt.n_transitions,
          |  CAST(round(CAST(CAST(
          |    list_reduce(list_transform(fin.l, e -> e.t), (a, b) -> a + b)
          |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS entropy_rate
          |FROM fin, ns, nt""".stripMargin
    },
    // q267: session-DISTINCT items (the basket convention); ratios are
    // exact integer divisions
    "q267_basket_lift" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
        |  FROM events),
        |f AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
        |      OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s AS (SELECT user_id, event_type,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |it AS (SELECT DISTINCT user_id, sid, event_type AS st FROM s),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
        |  (SELECT DISTINCT user_id, sid FROM it)),
        |sg AS (SELECT st, CAST(COUNT(*) AS BIGINT) AS n FROM it GROUP BY 1),
        |pr AS (SELECT a.st AS a, b.st AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM it a JOIN it b ON a.user_id = b.user_id AND a.sid = b.sid
        |  WHERE a.st <> b.st GROUP BY 1, 2)
        |SELECT pr.a, pr.b, sa.n AS n_a, sb.n AS n_b, pr.n_ab,
        |  CAST(round(CAST(CAST(CAST(pr.n_ab AS DOUBLE) / CAST(ns.n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS support,
        |  CAST(round(CAST(CAST(CAST(pr.n_ab AS DOUBLE) / CAST(sa.n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS confidence,
        |  CAST(round(CAST(CAST(CAST(pr.n_ab * ns.n AS DOUBLE) /
        |    CAST(sa.n * sb.n AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS lift
        |FROM pr JOIN sg sa ON pr.a = sa.st JOIN sg sb ON pr.b = sb.st
        |CROSS JOIN ns""".stripMargin,
    // q268: exact integer prefix cuts cum·den >= num·total over the
    // (weight desc, unit) order
    "q268_pareto_coverage" ->
      """WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS w FROM events
        |  GROUP BY 1),
        |r AS (SELECT user_id, w,
        |    SUM(w) OVER (ORDER BY w DESC, user_id ROWS UNBOUNDED PRECEDING) AS cum,
        |    CAST(row_number() OVER (ORDER BY w DESC, user_id) AS BIGINT) AS rk,
        |    SUM(w) OVER () AS tot
        |  FROM u)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
        |  CAST(MAX(tot) AS BIGINT) AS total,
        |  CAST(MIN(CASE WHEN cum * 2 >= tot * 1 THEN rk END) AS BIGINT) AS n_50,
        |  CAST(MIN(CASE WHEN cum * 5 >= tot * 4 THEN rk END) AS BIGINT) AS n_80,
        |  CAST(MIN(CASE WHEN cum * 20 >= tot * 19 THEN rk END) AS BIGINT) AS n_95
        |FROM r""".stripMargin,
    // q265: pairwise slopes are one exact-int division each; both
    // medians are LOWER medians under total (slope, i, j) / (value, i)
    "q265_theil_sen" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |ix AS (SELECT event_type, x,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i
        |  FROM d),
        |pr AS (SELECT a.event_type, a.i AS i, b.i AS j,
        |    CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS m
        |  FROM ix a JOIN ix b ON a.event_type = b.event_type AND a.i < b.i),
        |sl AS (SELECT event_type, m AS slope, np AS n_pairs FROM (
        |  SELECT event_type, m,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY m, i, j) AS BIGINT) AS r,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
        |  FROM pr) WHERE r = (np + 1) // 2),
        |rs AS (SELECT ix.event_type, sl.n_pairs, sl.slope, ix.i,
        |    CAST(ix.x AS DOUBLE) - sl.slope * CAST(ix.i AS DOUBLE) AS b
        |  FROM ix JOIN sl ON ix.event_type = sl.event_type),
        |ic AS (SELECT event_type, n_pairs, slope, b, n FROM (
        |  SELECT event_type, n_pairs, slope, b,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY b, i) AS BIGINT) AS r,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM rs) WHERE r = (n + 1) // 2)
        |SELECT event_type, n AS n_obs, n_pairs,
        |  CAST(round(CAST(CAST(slope AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS slope,
        |  CAST(round(CAST(CAST(b AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS intercept
        |FROM ic""".stripMargin,
    // q266: exact-int trend sums over a ROWS frame; seasonal means fold
    // detrended doubles in day order (the q237 contract)
    "q266_seasonal_decompose" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dd,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, strftime(dd, '%Y-%m-%d') AS day,
        |    dayofweek(dd) + 1 AS dw, x FROM d),
        |t AS (SELECT event_type, day, dw, x,
        |    CAST(SUM(x) OVER w7 AS DOUBLE) / CAST(COUNT(*) OVER w7 AS DOUBLE) AS trend
        |  FROM b WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT *, CAST(x AS DOUBLE) - trend AS det FROM t),
        |se AS (SELECT event_type, dw,
        |    list_reduce(list(det ORDER BY day), (a, b) -> a + b)
        |      / CAST(COUNT(*) AS DOUBLE) AS seasonal
        |  FROM dt GROUP BY 1, 2)
        |SELECT dt.event_type, dt.day, dt.x AS value,
        |  CAST(round(CAST(CAST(dt.trend AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS trend,
        |  CAST(round(CAST(CAST(se.seasonal AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS seasonal,
        |  CAST(round(CAST(CAST(dt.det - se.seasonal AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS resid
        |FROM dt JOIN se ON dt.event_type = se.event_type AND dt.dw = se.dw""".stripMargin,
    // q263: exact integer prefix sums; gap squares in DOUBLE (fixed
    // shape both engines); earliest-split tiebreak on the float stat
    "q263_binary_segment" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, day, x,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
        |    SUM(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS s1,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    SUM(x) OVER (PARTITION BY event_type) AS s
        |  FROM d),
        |c AS (SELECT *, CAST(s1 * (n - i) - (s - s1) * i AS DOUBLE) AS gap
        |  FROM p WHERE i < n),
        |st AS (SELECT *, (gap * gap) / CAST(n * i * (n - i) AS DOUBLE) AS stat
        |  FROM c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY stat DESC, day) AS rk FROM st)
        |SELECT event_type, n AS n_obs, day AS split_ord, i AS n_before,
        |  CAST(round(CAST(CAST(CAST(s1 AS DOUBLE) / CAST(i AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_before,
        |  CAST(round(CAST(CAST(CAST(s - s1 AS DOUBLE) / CAST(n - i AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_after,
        |  CAST(round(CAST(CAST(stat AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS stat
        |FROM r WHERE rk = 1""".stripMargin,
    // q264: q253's quantized dim sums; labels² pair join; HUGEINT Gram
    "q264_label_separation" ->
      """WITH e AS (SELECT label AS lbl,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |c AS (SELECT lbl, dim, CAST(SUM(q) AS BIGINT) AS s FROM e GROUP BY 1, 2),
        |nr AS (SELECT lbl, SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS nn
        |  FROM c GROUP BY 1),
        |pr AS (SELECT a.lbl AS label_a, b.lbl AS label_b,
        |    SUM(CAST(a.s AS HUGEINT) * CAST(b.s AS HUGEINT)) AS ab
        |  FROM c a JOIN c b ON a.dim = b.dim AND a.lbl < b.lbl
        |  GROUP BY 1, 2)
        |SELECT pr.label_a, pr.label_b,
        |  CASE WHEN na.nn > 0 AND nb.nn > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(pr.ab AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS cosine
        |FROM pr JOIN nr na ON pr.label_a = na.lbl
        |JOIN nr nb ON pr.label_b = nb.lbl""".stripMargin,
    // q261: method-of-moments Gumbel on exact integer maxima sums; the
    // float tail mirrors Spark's evaluation shape term for term
    "q261_gumbel_extremes" ->
      """WITH mc AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    epoch_ms(ts) // 60000 AS minute, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |dp AS (SELECT event_type, day, CAST(MAX(c) AS BIGINT) AS x FROM mc
        |  GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS ss
        |  FROM dp GROUP BY 1),
        |f AS (SELECT event_type, n,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    sqrt(CAST(n * ss - sx * sx AS DOUBLE) / CAST(n * n AS DOUBLE))
        |      * sqrt(6.0) / pi() AS beta
        |  FROM s),
        |g AS (SELECT *, mean - 0.5772156649015329 * beta AS mu FROM f)
        |SELECT event_type, n,
        |  CAST(round(CAST(CAST(mean AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean,
        |  CAST(round(CAST(CAST(beta AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS beta,
        |  CAST(round(CAST(CAST(mu AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mu,
        |  CAST(round(CAST(CAST(mu - beta * ln(-ln(1.0 - 1.0 / 10.0))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS rl_10,
        |  CAST(round(CAST(CAST(mu - beta * ln(-ln(1.0 - 1.0 / 100.0))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS rl_100
        |FROM g""".stripMargin,
    // q262: three census-bucketed scores (the q249 tie-run rule),
    // recency inverted; joins on metric VALUE
    "q262_rfm" ->
      """WITH b AS (SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary
        |  FROM events GROUP BY 1),
        |h AS (SELECT MAX(last_d) AS wend FROM b),
        |m AS (SELECT user_id, date_diff('day', last_d, wend) AS recency_days,
        |    frequency, monetary FROM b, h),
        |cr AS (SELECT recency_days AS v, CAST(COUNT(*) AS BIGINT) AS c FROM m GROUP BY 1),
        |br AS (SELECT v, LEAST(4, (COALESCE(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |    // (SELECT SUM(c) FROM cr)) AS bk FROM cr),
        |cf AS (SELECT frequency AS v, CAST(COUNT(*) AS BIGINT) AS c FROM m GROUP BY 1),
        |bf AS (SELECT v, LEAST(4, (COALESCE(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |    // (SELECT SUM(c) FROM cf)) AS bk FROM cf),
        |cm AS (SELECT monetary AS v, CAST(COUNT(*) AS BIGINT) AS c FROM m GROUP BY 1),
        |bm AS (SELECT v, LEAST(4, (COALESCE(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |    // (SELECT SUM(c) FROM cm)) AS bk FROM cm)
        |SELECT m.user_id, CAST(m.recency_days AS BIGINT) AS recency_days,
        |  m.frequency, m.monetary,
        |  CAST(5 - br.bk AS BIGINT) AS r_score,
        |  CAST(bf.bk + 1 AS BIGINT) AS f_score,
        |  CAST(bm.bk + 1 AS BIGINT) AS m_score,
        |  CAST((5 - br.bk) * 100 + (bf.bk + 1) * 10 + (bm.bk + 1) AS BIGINT) AS rfm
        |FROM m JOIN br ON m.recency_days = br.v
        |JOIN bf ON m.frequency = bf.v
        |JOIN bm ON m.monetary = bm.v""".stripMargin,
    // q260: doubled mid-ranks are integers (2·mid = span endpoints'
    // sum); HUGEINT moments mirror Spark's DECIMAL; the 2× cancels
    "q260_spearman" ->
      """WITH e AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x,
        |    CAST(hour(ts) AS BIGINT) AS y FROM events),
        |cx AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
        |rx AS (SELECT g, x, 2 * COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2
        |  FROM cx),
        |cy AS (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
        |ry AS (SELECT g, y, 2 * COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2
        |  FROM cy),
        |j AS (SELECT e.g, rx.r2 AS a, ry.r2 AS b FROM e
        |  JOIN rx ON e.g = rx.g AND e.x = rx.x
        |  JOIN ry ON e.g = ry.g AND e.y = ry.y),
        |s AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(a AS HUGEINT)) AS sx, SUM(CAST(b AS HUGEINT)) AS sy,
        |    SUM(CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) AS sxy,
        |    SUM(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)) AS sxx,
        |    SUM(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS syy
        |  FROM j GROUP BY 1)
        |SELECT g AS event_type, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS rho
        |FROM s""".stripMargin,
    // q256: Σ c·ln(v/0.5) folds in (v, c) order; reduce's first-element
    // seed equals Spark's 0.0 + t₁
    "q256_power_law" ->
      """WITH a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS v FROM events
        |  GROUP BY 1),
        |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM a GROUP BY 1),
        |t AS (SELECT v, c FROM c WHERE v >= 1),
        |l AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    list(struct_pack(v := v, c := c) ORDER BY v, c) AS ls FROM t),
        |f AS (SELECT n, list_reduce(list_transform(ls,
        |    e -> CAST(e.c AS DOUBLE) * ln(CAST(e.v AS DOUBLE) / 0.5)),
        |    (a, b) -> a + b) AS s FROM l)
        |SELECT n, CAST(1 AS BIGINT) AS vmin,
        |  CASE WHEN s > 0 THEN
        |    CAST(round(CAST(CAST(1.0 + CAST(n AS DOUBLE) / s AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS alpha
        |FROM f""".stripMargin,
    // q257: q167's gaps-and-islands session ids; in-session order is
    // (ms, event_id) on both engines
    "q257_session_paths" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
        |  FROM events),
        |f AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
        |      OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s AS (SELECT user_id, ms, event_id, event_type,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |p AS (SELECT array_to_string(list_slice(
        |    list(event_type ORDER BY ms, event_id), 1, 8), '>') AS path
        |  FROM s GROUP BY user_id, sid),
        |c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p
        |  GROUP BY 1),
        |r AS (SELECT path, n_sessions,
        |    row_number() OVER (ORDER BY n_sessions DESC, path) AS rank FROM c)
        |SELECT CAST(rank AS BIGINT) AS rank, path, n_sessions FROM r
        |WHERE rank <= 20""".stripMargin,
    // q258: RANGE frame on integer event time — same-ms ties all see
    // the same trailing count on both engines
    "q258_rolling_burst" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |w AS (SELECT user_id, COUNT(*) OVER (PARTITION BY user_id ORDER BY ms
        |    RANGE BETWEEN 59999 PRECEDING AND CURRENT ROW) AS r FROM e),
        |p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(MAX(r) AS BIGINT) AS peak_rate FROM w GROUP BY 1),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY peak_rate DESC, user_id)
        |    AS rank FROM p)
        |SELECT CAST(rank AS BIGINT) AS rank, user_id, n_events, peak_rate
        |FROM r2 WHERE rank <= 100""".stripMargin,
    // q259: 12 unrolled power-iteration rounds, `//` floors identical to
    // Spark's div; per-round L1 renormalization absorbs dangling
    // leakage. Every CTE is MATERIALIZED — DuckDB otherwise INLINES
    // each reference, and the p₁₂→p₁₁→… chain with 3 refs per round
    // expands to ~3¹² copies of the events scan (observed as a
    // too-many-open-files failure, not just slowness)
    "q259_stationary" -> {
      val base =
        """WITH ev AS MATERIALIZED (SELECT user_id, epoch_ms(ts) AS ms,
          |    event_id, event_type FROM events),
          |lg AS MATERIALIZED (SELECT event_type AS curr, lag(event_type) OVER (
          |    PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM ev),
          |tr AS MATERIALIZED (SELECT prev, curr, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM lg WHERE prev IS NOT NULL GROUP BY 1, 2),
          |rr AS MATERIALIZED (SELECT prev, CAST(SUM(c) AS BIGINT) AS r FROM tr
          |  GROUP BY 1),
          |st AS MATERIALIZED (SELECT prev AS state FROM tr
          |  UNION SELECT curr FROM tr),
          |ns AS MATERIALIZED (SELECT COUNT(*) AS ns FROM st),
          |p0 AS MATERIALIZED (SELECT state, 1000000000 // ns.ns AS pf
          |  FROM st CROSS JOIN ns)""".stripMargin
      val rounds = (1 to 12).map { i =>
        s"""fl$i AS MATERIALIZED (SELECT t.curr, SUM((p.pf * t.c) // rr.r) AS mass
           |FROM tr t JOIN p${i - 1} p ON t.prev = p.state
           |JOIN rr ON t.prev = rr.prev GROUP BY t.curr),
           |tt$i AS MATERIALIZED (SELECT SUM(mass) AS t FROM fl$i),
           |p$i AS MATERIALIZED (SELECT s.state,
           |CAST((COALESCE(f.mass, 0) * 1000000000) // tt$i.t AS BIGINT) AS pf
           |FROM st s CROSS JOIN tt$i LEFT JOIN fl$i f ON s.state = f.curr)""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        """
          |SELECT state,
          |CAST(round(CAST(CAST(pf / 1000000000.0 AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS pi
          |FROM p12""".stripMargin
    },
    // q255: survival folds per census row over the prefix of
    // (1 − d/n) factors — list_reduce's seed-is-first-element equals
    // Spark's 1.0·t₁ bit-for-bit; factors are exact-int divisions
    "q255_kaplan_meier" ->
      """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
        |    MAX(CAST(ts AS DATE)) AS ld FROM events GROUP BY 1),
        |h AS (SELECT MAX(ld) AS wend FROM u),
        |s AS (SELECT date_diff('day', fd, ld) AS dur,
        |    CASE WHEN date_diff('day', ld, wend) >= 7 THEN 1 ELSE 0 END AS ev
        |  FROM u, h),
        |c AS (SELECT dur AS d, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(ev) AS BIGINT) AS deaths FROM s GROUP BY 1),
        |r AS (SELECT d, n_obs, deaths,
        |    CAST(SUM(n_obs) OVER () - COALESCE(SUM(n_obs) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM c),
        |l AS (SELECT list(struct_pack(d := d, n_obs := n_obs,
        |    deaths := deaths, n_risk := n_risk) ORDER BY d) AS arr FROM r),
        |x AS (SELECT unnest(range(1, len(arr) + 1)) AS i, arr FROM l),
        |f AS (SELECT arr[i].d AS d, arr[i].n_obs AS n_obs,
        |    arr[i].deaths AS n_events, arr[i].n_risk AS n_risk,
        |    list_reduce(list_transform(list_slice(arr, 1, i),
        |      e -> 1.0 - CAST(e.deaths AS DOUBLE) / CAST(e.n_risk AS DOUBLE)),
        |      (a, b) -> a * b) AS surv
        |  FROM x)
        |SELECT CAST(d AS BIGINT) AS dur, n_obs, n_events, n_risk,
        |  CAST(round(CAST(CAST(surv AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |    AS survival
        |FROM f""".stripMargin,
    // q351: the additive twin of q255 — cumulative Σ d/n in duration
    // order via the same list_reduce 0.0-seed parity; exp parity per
    // the q237 precedent
    "q351_nelson_aalen" ->
      """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
        |    MAX(CAST(ts AS DATE)) AS ld FROM events GROUP BY 1),
        |h AS (SELECT MAX(ld) AS wend FROM u),
        |s AS (SELECT date_diff('day', fd, ld) AS dur,
        |    CASE WHEN date_diff('day', ld, wend) >= 7 THEN 1 ELSE 0 END AS ev
        |  FROM u, h),
        |c AS (SELECT dur AS d, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(ev) AS BIGINT) AS deaths FROM s GROUP BY 1),
        |r AS (SELECT d, n_obs, deaths,
        |    CAST(SUM(n_obs) OVER () - COALESCE(SUM(n_obs) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM c),
        |l AS (SELECT list(struct_pack(d := d, n_obs := n_obs,
        |    deaths := deaths, n_risk := n_risk) ORDER BY d) AS arr FROM r),
        |x AS (SELECT unnest(range(1, len(arr) + 1)) AS i, arr FROM l),
        |f AS (SELECT arr[i].d AS d, arr[i].n_obs AS n_obs,
        |    arr[i].deaths AS n_events, arr[i].n_risk AS n_risk,
        |    list_reduce(list_transform(list_slice(arr, 1, i),
        |      e -> CAST(e.deaths AS DOUBLE) / CAST(e.n_risk AS DOUBLE)),
        |      (a, b) -> a + b) AS ch
        |  FROM x)
        |SELECT CAST(d AS BIGINT) AS dur, n_obs, n_events, n_risk,
        |  CAST(round(CAST(CAST(ch AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS cum_hazard,
        |  CAST(round(CAST(CAST(exp(-ch) AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS fh_survival
        |FROM f""".stripMargin,
    // q352: exact (n, Σr) census; the UCB bonus is a pinned √/ln shape;
    // argmax ties (ucb desc, arm asc)
    "q352_ucb_allocation" ->
      """WITH e AS (SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT)
        |    AS sc, event_type AS arm,
        |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS r
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT sc, arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r) AS HUGEINT) AS s FROM e GROUP BY 1, 2),
        |t AS (SELECT sc, arm, n, s,
        |    CAST(sum(n) OVER (PARTITION BY sc) AS BIGINT) AS nt FROM g),
        |u AS (SELECT sc, arm, n,
        |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    sqrt(2.0 * ln(CAST(nt AS DOUBLE)) / CAST(n AS DOUBLE)) AS bonus
        |  FROM t),
        |w AS (SELECT sc, arm, n, mean, bonus, mean + bonus AS ucb,
        |    row_number() OVER (PARTITION BY sc
        |      ORDER BY mean + bonus DESC, arm) AS rk FROM u)
        |SELECT sc AS dow, arm AS event_type, n,
        |  CAST(round(CAST(CAST(mean AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS mean,
        |  CAST(round(CAST(CAST(bonus AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS bonus,
        |  CAST(round(CAST(CAST(ucb AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS ucb,
        |  rk = 1 AS chosen
        |FROM w""".stripMargin,
    // q353: exact distinct catch counts; Chapman N-hat and SE are
    // pinned-shape doubles of exact integer products
    "q353_capture_recapture" ->
      """WITH keys AS (SELECT 'p' || CAST(doc_id AS VARCHAR) AS k
        |  FROM documents WHERE doc_id < 200),
        |a AS (SELECT DISTINCT k FROM keys
        |  WHERE CAST(('0x' || substr(md5(k || ':a'), 1, 2)) AS BIGINT)
        |    % 10 < 7),
        |b AS (SELECT DISTINCT k FROM keys
        |  WHERE CAST(('0x' || substr(md5(k || ':b'), 1, 2)) AS BIGINT)
        |    % 10 < 5),
        |c AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
        |    (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
        |    (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b USING (k))
        |      AS n_both)
        |SELECT n_a, n_b, n_both,
        |  CAST(round(CAST(CAST(
        |    CAST(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) AS DOUBLE)
        |      / CAST(n_both + 1 AS DOUBLE) - 1.0
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS n_hat,
        |  CAST(round(CAST(CAST(
        |    sqrt(CAST(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) * (n_a - n_both)
        |        * (n_b - n_both) AS DOUBLE)
        |      / CAST(CAST(n_both + 1 AS HUGEINT) * (n_both + 1)
        |        * (n_both + 2) AS DOUBLE))
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS se
        |FROM c""".stripMargin,
    // q354: exact HUGEINT power sums; the A_k scalings make the shape
    // stats pure ratios (A3/(A2*sqrt(A2)), A4/A2^2 — never pow); the
    // chi2(2) survival is closed-form exp(-JB/2)
    "q354_jarque_bera" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS s1,
        |    sum(CAST(y AS HUGEINT) * y) AS s2,
        |    sum(CAST(y AS HUGEINT) * y * y) AS s3,
        |    sum(CAST(y AS HUGEINT) * y * y * y) AS s4
        |  FROM e GROUP BY 1),
        |a AS (SELECT event_type, n, n * s2 - s1 * s1 AS a2,
        |    n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS a3,
        |    n * n * n * s4 - 4 * n * n * s1 * s3
        |      + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS a4
        |  FROM g),
        |s AS (SELECT event_type, CAST(n AS BIGINT) AS n,
        |    CASE WHEN n > 1 AND a2 > 0 THEN CAST(a3 AS DOUBLE)
        |      / (CAST(a2 AS DOUBLE) * sqrt(CAST(a2 AS DOUBLE))) END AS sk,
        |    CASE WHEN n > 1 AND a2 > 0 THEN CAST(a4 AS DOUBLE)
        |      / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) END AS ku
        |  FROM a),
        |j AS (SELECT event_type, n, sk, ku,
        |    CAST(n AS DOUBLE) / 6.0
        |      * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0) AS jb
        |  FROM s)
        |SELECT event_type, n,
        |  CAST(round(CAST(CAST(sk AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS skewness,
        |  CAST(round(CAST(CAST(ku AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS kurtosis,
        |  CAST(round(CAST(CAST(jb AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS jb,
        |  CAST(round(CAST(CAST(exp(-jb / 2.0) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS p_value
        |FROM j""".stripMargin,
    // q355: differences cancel the mean, so the numerator is an exact
    // integer sum; DW = n*num/(n*s2 - s1^2) is one double division
    "q355_durbin_watson" ->
      """WITH e AS (SELECT event_type, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS y FROM events),
        |d AS (SELECT event_type, y, y - lag(y) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id) AS dy FROM e),
        |g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS s1,
        |    sum(CAST(y AS HUGEINT) * y) AS s2,
        |    sum(CAST(dy AS HUGEINT) * dy) AS num
        |  FROM d GROUP BY 1),
        |f AS (SELECT event_type, CAST(n AS BIGINT) AS n,
        |    n * s2 - s1 * s1 AS den, n * num AS nnum FROM g)
        |SELECT event_type, n,
        |  CASE WHEN n > 1 AND den > 0 THEN
        |    CAST(round(CAST(CAST(CAST(nnum AS DOUBLE) / CAST(den AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS dw,
        |  CASE WHEN n > 1 AND den > 0 THEN
        |    CAST(round(CAST(CAST(1.0 - (CAST(nnum AS DOUBLE)
        |      / CAST(den AS DOUBLE)) / 2.0
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS rho
        |FROM f""".stripMargin,
    // q356: the q295 census/fold plus the even-df Poisson-sum survival
    // — the seed rides as a prepended element (list_reduce has no
    // seed), per-step factors h/k live in the element list, and the
    // recurrence fields are ordered sum-first (the q40 contract)
    "q356_chi_square" ->
      """WITH cells AS (SELECT event_type AS a,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS b,
        |    CAST(count(*) AS BIGINT) AS cab FROM events GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |t AS (SELECT cells.a, cells.b,
        |    CAST(CAST(cab AS HUGEINT) * cab AS DOUBLE)
        |    / CAST(CAST(ca AS HUGEINT) * cb AS DOUBLE) AS term
        |  FROM cells JOIN ma USING (a) JOIN mb USING (b)),
        |f AS (SELECT list(term ORDER BY a, b) AS terms,
        |    (SELECT CAST(sum(cab) AS BIGINT) FROM cells) AS n,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ma) AS r,
        |    (SELECT CAST(count(*) AS BIGINT) FROM mb) AS c
        |  FROM t),
        |g AS (SELECT n, r, c, CAST((r - 1) * (c - 1) AS BIGINT) AS df,
        |    CAST(n AS DOUBLE) * (list_reduce(terms, (x, y) -> x + y) - 1.0)
        |      AS chi2
        |  FROM f),
        |h AS (SELECT n, r, c, df, chi2,
        |    greatest(chi2, 0.0) / 2.0 AS hh, df // 2 AS m FROM g),
        |p AS (SELECT n, r, c, df, chi2,
        |    CASE WHEN df % 2 = 0 AND df > 0 THEN
        |      exp(-hh) * list_reduce(list_prepend(
        |        struct_pack(s := CAST(1.0 AS DOUBLE), t := CAST(1.0 AS DOUBLE)),
        |        list_transform(range(1, m), k -> struct_pack(
        |          s := hh / CAST(k AS DOUBLE), t := hh / CAST(k AS DOUBLE)))),
        |        (acc, x) -> struct_pack(
        |          s := acc.s + acc.t * x.t, t := acc.t * x.t)).s
        |    END AS pv
        |  FROM h)
        |SELECT n, r, c, df,
        |  CAST(round(CAST(CAST(chi2 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS chi2,
        |  CAST(round(CAST(CAST(pv AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p_value
        |FROM p""".stripMargin,
    // q357: UNION ALL per n (no nested-lambda capture); range() is
    // empty-on-inverted so short docs need no guards; the q271/q345
    // split-regex tokenization parity
    "q357_distinct_n" ->
      """WITH t AS (SELECT lang, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS toks FROM documents),
        |b AS (SELECT lang, toks FROM t WHERE len(toks) > 0),
        |g1 AS (SELECT lang, 1 AS n, unnest(toks) AS gram FROM b),
        |g2 AS (SELECT lang, 2 AS n, unnest(list_transform(
        |    range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))
        |    AS gram FROM b),
        |g3 AS (SELECT lang, 3 AS n, unnest(list_transform(
        |    range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |    AS gram FROM b),
        |u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2
        |  UNION ALL SELECT * FROM g3),
        |c AS (SELECT lang, n, gram, CAST(count(*) AS BIGINT) AS c
        |  FROM u GROUP BY 1, 2, 3)
        |SELECT lang, CAST(n AS INT) AS n,
        |  CAST(sum(c) AS BIGINT) AS n_grams,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(round(CAST(CAST(CAST(count(*) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS distinct_ratio
        |FROM c GROUP BY 1, 2""".stripMargin,
    // q358: z and (1-l)^(2t) are prefix folds replayed per row (the
    // q255 slice shape, seed riding as a prepended element); hw uses
    // sqrt-only shapes, never pow
    "q358_ewma_chart" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
        |    sum(CAST(x AS HUGEINT) * x) AS s2,
        |    list(struct_pack(o := day, y := x) ORDER BY day) AS arr
        |  FROM d GROUP BY 1),
        |m AS (SELECT event_type, n, arr,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CASE WHEN n > 1 THEN (3.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE))) * sqrt(0.2 / 1.8) END AS hw
        |  FROM g),
        |x AS (SELECT event_type, mu, hw,
        |    unnest(range(1, len(arr) + 1)) AS i, arr FROM m),
        |f AS (SELECT event_type, arr[i].o AS day, arr[i].y AS x, mu,
        |    list_reduce(list_prepend(mu, list_transform(
        |      list_slice(arr, 1, i), e -> CAST(e.y AS DOUBLE))),
        |      (a, b) -> 0.2 * b + 0.8 * a) AS z,
        |    hw * sqrt(1.0 - list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |      list_transform(list_slice(arr, 1, i), e -> CAST(0.0 AS DOUBLE))),
        |      (a, b) -> a * (0.8 * 0.8))) AS hwv
        |  FROM x)
        |SELECT event_type, day, x,
        |  CAST(round(CAST(CAST(z AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS z,
        |  CAST(round(CAST(CAST(mu + hwv AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS ucl,
        |  CAST(round(CAST(CAST(mu - hwv AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS lcl,
        |  CASE WHEN hwv IS NOT NULL THEN z > mu + hwv OR z < mu - hwv END
        |    AS breach
        |FROM f""".stripMargin,
    // q359: the q238 fold contract with a running-mean target; every
    // field re-derives m_t from acc-only reads, first-step values come
    // from the element transform
    "q359_page_hinkley" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS DOUBLE) AS x FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    list(struct_pack(o := day, x := x) ORDER BY day) AS series
        |  FROM d GROUP BY event_type),
        |r AS (SELECT event_type, n_obs,
        |  list_reduce(list_transform(series, e -> struct_pack(
        |    na := CAST(CASE WHEN (0.0 + e.x - (0.0 + e.x) / CAST(1 AS DOUBLE) - 1.0)
        |      - least(0.0, 0.0 + e.x - (0.0 + e.x) / CAST(1 AS DOUBLE) - 1.0) > 25.0
        |      THEN 1 ELSE 0 END AS BIGINT),
        |    fa := CASE WHEN (0.0 + e.x - (0.0 + e.x) / CAST(1 AS DOUBLE) - 1.0)
        |      - least(0.0, 0.0 + e.x - (0.0 + e.x) / CAST(1 AS DOUBLE) - 1.0) > 25.0
        |      THEN e.o END,
        |    mx := greatest(0.0, (0.0 + e.x - (0.0 + e.x) / CAST(1 AS DOUBLE) - 1.0)
        |      - least(0.0, 0.0 + e.x - (0.0 + e.x) / CAST(1 AS DOUBLE) - 1.0)),
        |    mn := least(0.0, 0.0 + e.x - (0.0 + e.x) / CAST(1 AS DOUBLE) - 1.0),
        |    m := 0.0 + e.x - (0.0 + e.x) / CAST(1 AS DOUBLE) - 1.0,
        |    sx := 0.0 + e.x, t := CAST(1 AS BIGINT), o := e.o, xv := e.x)),
        |  (acc, x) -> struct_pack(
        |    na := acc.na + CASE WHEN (acc.m + x.xv - (acc.sx + x.xv)
        |        / CAST(acc.t + 1 AS DOUBLE) - 1.0)
        |      - least(acc.mn, acc.m + x.xv - (acc.sx + x.xv)
        |        / CAST(acc.t + 1 AS DOUBLE) - 1.0) > 25.0 THEN 1 ELSE 0 END,
        |    fa := coalesce(acc.fa, CASE WHEN (acc.m + x.xv - (acc.sx + x.xv)
        |        / CAST(acc.t + 1 AS DOUBLE) - 1.0)
        |      - least(acc.mn, acc.m + x.xv - (acc.sx + x.xv)
        |        / CAST(acc.t + 1 AS DOUBLE) - 1.0) > 25.0 THEN x.o END),
        |    mx := greatest(acc.mx, (acc.m + x.xv - (acc.sx + x.xv)
        |        / CAST(acc.t + 1 AS DOUBLE) - 1.0)
        |      - least(acc.mn, acc.m + x.xv - (acc.sx + x.xv)
        |        / CAST(acc.t + 1 AS DOUBLE) - 1.0)),
        |    mn := least(acc.mn, acc.m + x.xv - (acc.sx + x.xv)
        |        / CAST(acc.t + 1 AS DOUBLE) - 1.0),
        |    m := acc.m + x.xv - (acc.sx + x.xv) / CAST(acc.t + 1 AS DOUBLE) - 1.0,
        |    sx := acc.sx + x.xv, t := acc.t + 1, o := x.o, xv := x.xv)) AS f
        |  FROM g)
        |SELECT event_type, n_obs, CAST(f.na AS BIGINT) AS n_alarms,
        |  f.fa AS first_alarm,
        |  CAST(round(CAST(CAST(f.mx AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS max_stat,
        |  CAST(round(CAST(CAST(f.m - f.mn AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS ph_end
        |FROM r""".stripMargin,
    // q360: the q169 unrolled-round contract over the co-occurrence
    // graph — HUGEINT carries the prf*w product exactly as the Spark
    // side's decimal(38,0); floors replay bit-for-bit
    "q360_textrank" -> {
      val base =
        """WITH t AS (SELECT list_filter(
          |    string_split_regex(lower(trim(text)), '\s+'),
          |    x -> length(x) > 0) AS toks FROM documents),
          |b AS (SELECT toks FROM t WHERE len(toks) > 1),
          |ix AS (SELECT unnest(range(1, len(toks))) AS i, toks FROM b),
          |q AS (SELECT least(toks[i], toks[i + 1]) AS a,
          |    greatest(toks[i], toks[i + 1]) AS b
          |  FROM ix WHERE toks[i] <> toks[i + 1]),
          |sym AS (SELECT a, b, CAST(count(*) AS BIGINT) AS w
          |  FROM q GROUP BY 1, 2 HAVING count(*) >= 2),
          |edges AS (SELECT a AS src, b AS dst, w FROM sym
          |  UNION ALL SELECT b, a, w FROM sym),
          |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wdeg
          |  FROM edges GROUP BY 1),
          |nodes AS (SELECT DISTINCT src AS node FROM edges),
          |nn AS (SELECT COUNT(*) AS nn FROM nodes),
          |p0 AS (SELECT node, 1000000000000000 // nn.nn AS prf
          |  FROM nodes CROSS JOIN nn)""".stripMargin
      val rounds = (1 to 6).map { i =>
        s"""s$i AS (SELECT e.dst AS node,
           |  SUM((CAST(p.prf AS HUGEINT) * e.w) // d.wdeg) AS in_mass
           |FROM edges e JOIN p${i - 1} p ON e.src = p.node
           |JOIN outw d ON e.src = d.src GROUP BY e.dst),
           |p$i AS (SELECT n.node,
           |CAST(150000000000000 // nn.nn
           | + (85 * COALESCE(s$i.in_mass, 0)) // 100 AS BIGINT) AS prf
           |FROM nodes n CROSS JOIN nn LEFT JOIN s$i ON n.node = s$i.node)"""
          .stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        """
          |SELECT node AS word,
          |CAST(round(CAST(CAST(prf / 1000000000000000.0 AS VARCHAR)
          |  AS DECIMAL(38,20)), 10) AS DOUBLE) AS pr
          |FROM p6 ORDER BY prf DESC, node LIMIT 25""".stripMargin
    },
    // q361: k unrolled farthest-point rounds; exact integer squared
    // distances on the floor(x*2^20+0.5) grid, (dist DESC, id) argmax
    "q361_kcenter_seeds" -> {
      val dist = (p: String, c: String) =>
        s"""list_reduce(list_transform(range(1, len($p.qv) + 1),
           |i -> ($p.qv[i] - $c.qv[i]) * ($p.qv[i] - $c.qv[i])),
           |(a, b) -> a + b)""".stripMargin
      val base =
        """WITH pts AS (SELECT vec_id AS id, list_transform(embedding,
          |  x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
          |  AS qv FROM embeddings WHERE embedding IS NOT NULL),
          |c1 AS (SELECT id, qv FROM pts ORDER BY id LIMIT 1),
          |m1 AS (SELECT p.id, p.qv, """.stripMargin +
          dist("p", "c") + " AS mind FROM pts p, c1 c)"
      val rounds = (2 to 5).map { j =>
        s"""c$j AS (SELECT id, qv, mind FROM m${j - 1}
           |  ORDER BY mind DESC, id LIMIT 1),
           |m$j AS (SELECT p.id, p.qv, least(p.mind, ${dist("p", "c")})
           |  AS mind FROM m${j - 1} p, c$j c)""".stripMargin
      }.mkString(",\n", ",\n", "")
      val sel = (2 to 5).map { j =>
        s"UNION ALL SELECT $j AS seed_rank, id AS vec_id, mind AS dist2 FROM c$j"
      }.mkString("\n")
      base + rounds +
        "\nSELECT 1 AS seed_rank, id AS vec_id, CAST(NULL AS BIGINT) AS dist2 FROM c1\n" +
        sel
    },
    // q362: the q243 recursive-CTE contract with a 7-slot seasonal
    // list; l_t is re-derived textually in b_t/s_t (no lateral alias),
    // the slot update is a slice-concat splice
    "q362_holt_winters" ->
      """WITH RECURSIVE d AS (SELECT event_type,
        |    strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS DOUBLE) AS x FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    list(x ORDER BY day) AS xs FROM d GROUP BY 1),
        |i0 AS (SELECT event_type, n_obs, xs,
        |    list_reduce(list_slice(xs, 1, 7), (a, v) -> a + v) / 7.0 AS l0,
        |    (list_reduce(list_slice(xs, 8, 14), (a, v) -> a + v)
        |      - list_reduce(list_slice(xs, 1, 7), (a, v) -> a + v)) / 49.0
        |      AS b0
        |  FROM g WHERE n_obs >= 14),
        |it AS (
        |  SELECT event_type, n_obs, xs, 7 AS t, l0 AS l, b0 AS b,
        |    list_transform(list_slice(xs, 1, 7), v -> v - l0) AS s
        |  FROM i0
        |  UNION ALL
        |  SELECT event_type, n_obs, xs, t + 1,
        |    0.5 * (xs[t + 1] - s[(t % 7) + 1]) + 0.5 * (l + b),
        |    0.25 * ((0.5 * (xs[t + 1] - s[(t % 7) + 1]) + 0.5 * (l + b)) - l)
        |      + 0.75 * b,
        |    list_slice(s, 1, t % 7)
        |      || [0.25 * (xs[t + 1] - (0.5 * (xs[t + 1] - s[(t % 7) + 1])
        |            + 0.5 * (l + b))) + 0.75 * s[(t % 7) + 1]]
        |      || list_slice(s, (t % 7) + 2, 7)
        |  FROM it WHERE t < n_obs)
        |SELECT g.event_type, g.n_obs,
        |  CAST(round(CAST(CAST(f.l AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS level,
        |  CAST(round(CAST(CAST(f.b AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS trend,
        |  CAST(round(CAST(CAST(f.s[CAST((g.n_obs + 6) % 7 AS INT) + 1]
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS seasonal,
        |  CAST(round(CAST(CAST(f.l + 7.0 * f.b
        |      + f.s[CAST((g.n_obs + 6) % 7 AS INT) + 1]
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS forecast
        |FROM g LEFT JOIN (SELECT * FROM it WHERE t = n_obs) f
        |  ON g.event_type = f.event_type""".stripMargin,
    // q363: all KN quantities are integer censuses; per-bigram NLL is
    // assembled at TYPE grain and the per-doc sum is a count-weighted
    // fold in (a, b) order (0-seed parity)
    "q363_kneser_ney" ->
      """WITH t AS (SELECT doc_id AS id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS toks FROM documents),
        |ix AS (SELECT id, toks, unnest(range(1, len(toks))) AS i
        |  FROM t WHERE len(toks) > 1),
        |p AS (SELECT id, toks[i] AS a, toks[i + 1] AS b FROM ix),
        |dp AS (SELECT id, a, b, CAST(count(*) AS BIGINT) AS c
        |  FROM p GROUP BY 1, 2, 3),
        |bi AS (SELECT a, b, CAST(sum(c) AS BIGINT) AS c12
        |  FROM dp GROUP BY 1, 2),
        |uni AS (SELECT a AS w, CAST(sum(c12) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS nf FROM bi GROUP BY 1),
        |np AS (SELECT b, CAST(count(*) AS BIGINT) AS np FROM bi GROUP BY 1),
        |sc AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM bi) AS ntypes,
        |    (SELECT CAST(count(DISTINCT w) AS BIGINT)
        |      FROM (SELECT unnest(toks) AS w FROM t)) AS vtot),
        |bgm AS (SELECT bi.a, bi.b, -ln(
        |    (greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
        |      + 0.75 * CAST(nf AS DOUBLE)
        |        * (CAST(np + 1 AS DOUBLE) / CAST(ntypes + vtot + 1 AS DOUBLE)))
        |    / CAST(c1 AS DOUBLE)) AS nll
        |  FROM bi JOIN uni ON bi.a = uni.w JOIN np USING (b), sc),
        |d AS (SELECT id, CAST(sum(c) AS BIGINT) AS n_pairs,
        |    list(CAST(c AS DOUBLE) * nll ORDER BY a, b) AS ls
        |  FROM dp JOIN bgm USING (a, b) GROUP BY 1),
        |m AS (SELECT id, n_pairs,
        |    list_reduce(ls, (x, y) -> x + y) / CAST(n_pairs AS DOUBLE)
        |      AS mean_nll FROM d)
        |SELECT t.id AS doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
        |  COALESCE(m.n_pairs, 0) AS n_pairs,
        |  CAST(round(CAST(CAST(m.mean_nll AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS mean_nll
        |FROM t LEFT JOIN m ON t.id = m.id""".stripMargin,
    // q364: the q183 register/estimator replay lifted to per-node
    // sketches; each hop is a join + group-max union, registers are
    // bit-identical so the IEEE-exact estimator matches to the digit
    "q364_hyperanf" -> {
      val est = (src: String, hop: Int) =>
        s"""e$hop AS (SELECT node, CAST($hop AS INT) AS hop,
           |  CAST(COUNT(*) AS BIGINT) AS nonempty,
           |  (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
           |     + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE)))
           |   * CAST(64.0 AS DOUBLE) * CAST(64.0 AS DOUBLE) /
           |   ((CAST(64.0 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)) +
           |    SUM(CAST(1.0 AS DOUBLE)
           |      / CAST((CAST(1 AS BIGINT) << CAST(mr AS INT)) AS DOUBLE)))
           |   AS est
           |FROM $src GROUP BY 1)""".stripMargin
      val base =
        """WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
          |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          |edges AS (SELECT c AS src, 1000000 + s AS dst FROM pairs
          |UNION ALL SELECT 1000000 + s, c FROM pairs),
          |nodes AS (SELECT DISTINCT src AS node FROM edges),
          |h0 AS (SELECT node,
          |  CAST(('0x' || substr(md5(CAST(node AS VARCHAR) || ':r'), 1, 4))
          |    AS BIGINT) % 64 AS reg,
          |  LEAST(4 * length(regexp_extract(
          |      substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12), '^0*')) +
          |    CASE substr(substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12),
          |        length(regexp_extract(
          |          substr(md5(CAST(node AS VARCHAR) || ':q'), 1, 12), '^0*'))
          |          + 1, 1)
          |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
          |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
          |      ELSE 0 END + 1, 40) AS mr
          |FROM nodes)""".stripMargin
      val hops = (1 to 4).map { h =>
        s"""h$h AS (SELECT node, reg, MAX(mr) AS mr FROM (
           |  SELECT e.src AS node, r.reg, r.mr
           |    FROM edges e JOIN h${h - 1} r ON e.dst = r.node
           |  UNION ALL SELECT node, reg, mr FROM h${h - 1}) GROUP BY 1, 2),
           |""".stripMargin + est(s"h$h", h)
      }.mkString(",\n", ",\n", "")
      base + hops +
        """
          |SELECT node, hop, nonempty,
          |  CAST(round(CAST(CAST(est AS VARCHAR) AS DECIMAL(38,20)), 4)
          |    AS DOUBLE) AS est
          |FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2
          |  UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)""".stripMargin
    },
    // q365: exact F1/F2 censuses; the bias-corrected correction term is
    // one pinned ratio of exact integer products
    "q365_chao1" ->
      """WITH t AS (SELECT source,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM t
        |  WHERE length(tok) > 0 GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_obs,
        |    CAST(count(*) AS BIGINT) AS d_obs,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM c GROUP BY 1)
        |SELECT source, n_obs, d_obs, f1, f2,
        |  CAST(round(CAST(CAST(
        |    CAST(d_obs AS DOUBLE)
        |      + CAST(CAST(f1 AS HUGEINT) * (f1 - 1) AS DOUBLE)
        |        / CAST(CAST(2 AS HUGEINT) * (f2 + 1) AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS chao1
        |FROM g""".stripMargin,
    // q366: exact pair-sign S over the day census (periods^2 pairs per
    // key), tie-corrected variance, continuity-corrected z
    "q366_mann_kendall" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CAST(sum(CASE WHEN b.x > a.x THEN 1
        |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM d a JOIN d b ON a.event_type = b.event_type
        |    AND a.day < b.day GROUP BY 1),
        |ties AS (SELECT event_type,
        |    CAST(sum(CAST(m AS HUGEINT) * (m - 1) * (2 * m + 5)) AS HUGEINT)
        |      AS tie
        |  FROM (SELECT event_type, x, CAST(count(*) AS BIGINT) AS m
        |    FROM d GROUP BY 1, 2) GROUP BY 1),
        |ns AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1),
        |v AS (SELECT ns.event_type, n, s,
        |    CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * CAST(n AS HUGEINT) + 5)
        |      - tie AS DOUBLE) / 18.0 AS var_s
        |  FROM ns JOIN p USING (event_type) JOIN ties USING (event_type))
        |SELECT event_type, n, s,
        |  CAST(round(CAST(CAST(var_s AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS var_s,
        |  CASE WHEN n < 2 OR var_s <= 0.0 THEN NULL
        |    WHEN s > 0 THEN CAST(round(CAST(CAST(
        |      CAST(s - 1 AS DOUBLE) / sqrt(var_s)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |    WHEN s < 0 THEN CAST(round(CAST(CAST(
        |      CAST(s + 1 AS DOUBLE) / sqrt(var_s)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |    ELSE 0.0 END AS z
        |FROM v""".stripMargin,
    // q367: value-sorted census fold; first-step values ride the
    // element transform (q359 contract), per-term division of exact
    // HUGEINT numerator/denominator, B=N terms excluded
    "q367_anderson_darling" ->
      """WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END AS r
        |  FROM events),
        |c AS (SELECT v, CAST(sum(1 - r) AS BIGINT) AS ca,
        |    CAST(sum(r) AS BIGINT) AS cb FROM e GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS n_values,
        |    CAST(sum(ca) + sum(cb) AS BIGINT) AS nn,
        |    list(struct_pack(v := v, ca := ca, cb := cb) ORDER BY v) AS ls
        |  FROM c),
        |f AS (SELECT na, nb, n_values,
        |  list_reduce(list_transform(ls, e -> struct_pack(
        |    s := CASE WHEN e.ca + e.cb < nn THEN
        |      CAST(CAST(e.ca + e.cb AS HUGEINT)
        |        * (CAST(nn AS HUGEINT) * e.ca - CAST(na AS HUGEINT) * (e.ca + e.cb))
        |        * (CAST(nn AS HUGEINT) * e.ca - CAST(na AS HUGEINT) * (e.ca + e.cb))
        |        AS DOUBLE)
        |      / CAST(CAST(e.ca + e.cb AS HUGEINT)
        |        * (CAST(nn AS HUGEINT) - CAST(e.ca + e.cb AS HUGEINT)) AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END,
        |    m := e.ca, b := e.ca + e.cb, ca := e.ca, cb := e.cb)),
        |  (acc, x) -> struct_pack(
        |    s := acc.s + CASE WHEN acc.b + x.ca + x.cb < nn THEN
        |      CAST(CAST(x.ca + x.cb AS HUGEINT)
        |        * (CAST(nn AS HUGEINT) * (acc.m + x.ca)
        |           - CAST(na AS HUGEINT) * (acc.b + x.ca + x.cb))
        |        * (CAST(nn AS HUGEINT) * (acc.m + x.ca)
        |           - CAST(na AS HUGEINT) * (acc.b + x.ca + x.cb))
        |        AS DOUBLE)
        |      / CAST(CAST(acc.b + x.ca + x.cb AS HUGEINT)
        |        * (CAST(nn AS HUGEINT) - CAST(acc.b + x.ca + x.cb AS HUGEINT))
        |        AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END,
        |    m := acc.m + x.ca, b := acc.b + x.ca + x.cb,
        |    ca := x.ca, cb := x.cb)) AS f
        |  FROM t)
        |SELECT na AS n_a, nb AS n_b, n_values,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    CAST(round(CAST(CAST(f.s / CAST(CAST(na AS HUGEINT) * nb AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS a2
        |FROM f""".stripMargin,
    // q368: relational block cumsums keep R and S exact integers; the
    // only float folds are the block-ordered R/S mean and the q271
    // OLS shape
    "q368_hurst" ->
      """WITH d AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d %H') AS o,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |r AS (SELECT k, o, x,
        |    row_number() OVER (PARTITION BY k ORDER BY o) AS rn FROM d),
        |wd AS (SELECT 8 AS w UNION ALL SELECT 16
        |  UNION ALL SELECT 32 UNION ALL SELECT 64),
        |e AS (SELECT k, w, (rn - 1) // w AS b, ((rn - 1) % w) + 1 AS i,
        |    x, rn FROM r, wd),
        |c AS (SELECT k, w, b, i, x,
        |    sum(x) OVER (PARTITION BY k, w, b ORDER BY rn
        |      ROWS UNBOUNDED PRECEDING) AS ps,
        |    sum(x) OVER (PARTITION BY k, w, b) AS tot FROM e),
        |g AS (SELECT k, w, b, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(x) AS BIGINT) AS s1,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
        |    CAST(max(w * ps - i * tot) AS BIGINT) AS mx,
        |    CAST(min(w * ps - i * tot) AS BIGINT) AS mn
        |  FROM c GROUP BY 1, 2, 3),
        |blk AS (SELECT k, w, b,
        |    (CAST(mx - mn AS DOUBLE) / CAST(w AS DOUBLE))
        |    / sqrt(CAST(w * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |        / CAST(w * w AS DOUBLE)) AS rs
        |  FROM g WHERE cnt = w AND w * s2 - CAST(s1 AS HUGEINT) * s1 > 0),
        |aw AS (SELECT k, w, CAST(count(*) AS BIGINT) AS n_blocks,
        |    list_reduce(list(rs ORDER BY b), (a, v) -> a + v)
        |      / CAST(count(*) AS DOUBLE) AS avg_rs FROM blk GROUP BY 1, 2),
        |pt AS (SELECT k, CAST(count(*) AS BIGINT) AS kk,
        |    list(struct_pack(lx := ln(CAST(w AS DOUBLE)), ly := ln(avg_rs))
        |      ORDER BY w) AS ls FROM aw GROUP BY 1),
        |f AS (SELECT k, kk, list_reduce(list_transform(ls,
        |    p -> struct_pack(sx := p.lx, sy := p.ly, sxy := p.lx * p.ly,
        |      sxx := p.lx * p.lx)),
        |  (acc, p) -> struct_pack(sx := acc.sx + p.sx, sy := acc.sy + p.sy,
        |    sxy := acc.sxy + p.sxy, sxx := acc.sxx + p.sxx)) AS s FROM pt),
        |ols AS (SELECT k, CASE WHEN kk > 1 THEN
        |    (CAST(kk AS DOUBLE) * s.sxy - s.sx * s.sy)
        |    / (CAST(kk AS DOUBLE) * s.sxx - s.sx * s.sx) END AS hurst
        |  FROM f)
        |SELECT aw.k AS event_type, CAST(aw.w AS INT) AS w, n_blocks,
        |  CAST(round(CAST(CAST(avg_rs AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS avg_rs,
        |  CAST(round(CAST(CAST(hurst AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS hurst
        |FROM aw JOIN ols USING (k)""".stripMargin,
    // q369: exact integer mean/std and PAA ratios; symbols from pinned
    // breakpoint literals; trailing partial segments dropped
    "q369_sax_motifs" ->
      """WITH d AS (SELECT event_type AS k, strftime(ts, '%Y-%m-%d %H') AS o,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |r AS (SELECT k, o, x,
        |    row_number() OVER (PARTITION BY k ORDER BY o) AS rn FROM d),
        |st AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
        |    sum(CAST(x AS HUGEINT) * x) AS s2 FROM d GROUP BY 1),
        |mu AS (SELECT k, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n AS DOUBLE)) AS sd
        |  FROM st),
        |paa AS (SELECT k, (rn - 1) // 6 AS b, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(x) AS BIGINT) AS bs FROM r GROUP BY 1, 2),
        |sym AS (SELECT paa.k, b,
        |    CASE WHEN (CAST(bs AS DOUBLE) / 6.0 - mu) / sd < -0.6745 THEN 'a'
        |      WHEN (CAST(bs AS DOUBLE) / 6.0 - mu) / sd < 0.0 THEN 'b'
        |      WHEN (CAST(bs AS DOUBLE) / 6.0 - mu) / sd < 0.6745 THEN 'c'
        |      ELSE 'd' END AS s
        |  FROM paa JOIN mu ON paa.k = mu.k
        |  WHERE cnt = 6 AND sd > 0.0),
        |wrd AS (SELECT k, s || lead(s, 1) OVER w || lead(s, 2) OVER w AS word
        |  FROM sym WINDOW w AS (PARTITION BY k ORDER BY b))
        |SELECT k AS event_type, word, CAST(count(*) AS BIGINT) AS n
        |FROM wrd WHERE word IS NOT NULL GROUP BY 1, 2""".stripMargin,
    // q370: uncoupled (z, p) states, so list_reduce replays the fold
    // field-for-field; first-step values ride the element transform
    "q370_croston" ->
      """WITH a AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY 1, 2),
        |g AS (SELECT user_id, day, x,
        |    CAST(date_diff('day', lag(day) OVER (PARTITION BY user_id
        |      ORDER BY day), day) AS DOUBLE) AS q FROM a),
        |f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_demands,
        |  list_reduce(list_transform(list(struct_pack(x := x, q := q)
        |      ORDER BY day),
        |    e -> struct_pack(z := e.x, p := CAST('NaN' AS DOUBLE),
        |      x := e.x, q := e.q)),
        |  (acc, e) -> struct_pack(
        |    z := CASE WHEN isnan(acc.z) THEN e.x
        |      ELSE 0.2 * e.x + 0.8 * acc.z END,
        |    p := CASE WHEN e.q IS NULL THEN acc.p
        |      WHEN isnan(acc.p) THEN e.q
        |      ELSE 0.2 * e.q + 0.8 * acc.p END,
        |    x := e.x, q := e.q)) AS f
        |  FROM g GROUP BY 1)
        |SELECT user_id, n_demands,
        |  CASE WHEN NOT isnan(f.z) THEN
        |    CAST(round(CAST(CAST(f.z AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS z,
        |  CASE WHEN NOT isnan(f.p) THEN
        |    CAST(round(CAST(CAST(f.p AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS p,
        |  CASE WHEN NOT isnan(f.p) AND f.p <> 0.0 THEN
        |    CAST(round(CAST(CAST(f.z / f.p AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS rate
        |FROM f""".stripMargin,
    // q371: pure token-slice equality, max-matching k via an integer
    // fold; the census survives a zero artifact rate
    "q371_tail_loops" ->
      """WITH t AS (SELECT source, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS tk FROM documents),
        |s AS (SELECT source, list_reduce(
        |    list_prepend(0, range(1, 17)),
        |    (acc, k) -> CASE WHEN 2 * k <= len(tk)
        |      AND list_slice(tk, len(tk) - 2 * k + 1, len(tk) - k)
        |        = list_slice(tk, len(tk) - k + 1, len(tk))
        |      THEN k ELSE acc END) AS loop_k
        |  FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN loop_k > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_looping,
        |  CAST(round(CAST(CAST(
        |    CAST(sum(CASE WHEN loop_k > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS looping_share,
        |  CAST(max(loop_k) AS INT) AS max_loop_k
        |FROM s GROUP BY 1""".stripMargin,
    // q372: exact integer gap moments; B is one pinned expression
    "q372_burstiness" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |g AS (SELECT user_id, ms - lag(ms) OVER (PARTITION BY user_id
        |    ORDER BY ms) AS gp FROM e),
        |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(CAST(gp AS HUGEINT)) AS HUGEINT) AS s1,
        |    sum(CAST(gp AS HUGEINT) * gp) AS s2
        |  FROM g WHERE gp IS NOT NULL GROUP BY 1),
        |f AS (SELECT user_id, n_gaps,
        |    CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu,
        |    CASE WHEN n_gaps > 1 THEN
        |      sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)
        |        / CAST(CAST(n_gaps AS HUGEINT) * (n_gaps - 1) AS DOUBLE))
        |    END AS sd
        |  FROM m)
        |SELECT user_id, n_gaps,
        |  CAST(round(CAST(CAST(mu AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS mean_gap_ms,
        |  CASE WHEN sd IS NOT NULL AND sd + mu <> 0.0 THEN
        |    CAST(round(CAST(CAST((sd - mu) / (sd + mu) AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE) END AS b
        |FROM f""".stripMargin,
    // q373: exact tf/len/corpus censuses; per-doc sum folds in query-
    // term order (0-seed parity); zero-smoothing terms drop loudly
    "q373_dirichlet_ql" ->
      """WITH t AS (SELECT doc_id AS id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |tk AS (SELECT id, w FROM t WHERE length(w) > 0),
        |q AS (SELECT unnest(['spark', 'join', 'filter']) AS w),
        |lens AS (SELECT id, CAST(count(*) AS BIGINT) AS len
        |  FROM tk GROUP BY 1),
        |corpus AS (SELECT tk.w, CAST(count(*) AS BIGINT) AS cf,
        |    (SELECT CAST(count(*) AS BIGINT) FROM tk) AS ctot
        |  FROM tk JOIN q ON tk.w = q.w GROUP BY 1),
        |tf AS (SELECT id, tk.w, CAST(count(*) AS BIGINT) AS tf
        |  FROM tk JOIN q ON tk.w = q.w GROUP BY 1, 2),
        |grid AS (SELECT lens.id, corpus.w, lens.len,
        |    CAST(COALESCE(tf.tf, 0) AS DOUBLE)
        |      + 2000.0 * (CAST(cf AS DOUBLE) / CAST(ctot AS DOUBLE)) AS num
        |  FROM lens CROSS JOIN corpus
        |  LEFT JOIN tf ON tf.id = lens.id AND tf.w = corpus.w),
        |terms AS (SELECT id, w,
        |    ln(num / (CAST(len AS DOUBLE) + 2000.0)) AS term
        |  FROM grid WHERE num > 0.0),
        |d AS (SELECT id, CAST(count(*) AS BIGINT) AS n_terms,
        |    list_reduce(list(term ORDER BY w, term), (a, b) -> a + b)
        |      AS score
        |  FROM terms GROUP BY 1)
        |SELECT id AS doc_id, n_terms,
        |  CAST(round(CAST(CAST(score AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS score
        |FROM d ORDER BY score DESC, id LIMIT 20""".stripMargin,
    // q374: the q240 exact-r replay, Q folded in lag order, p via the
    // q356 Poisson-sum survival (K = 6 even -> m = 3 terms)
    "q374_ljung_box" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM d),
        |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM d GROUP BY 1),
        |g AS (SELECT CAST(unnest(range(1, 7)) AS INT) AS lag),
        |p AS (SELECT a.event_type, g.lag,
        |    CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
        |    CAST(SUM(a.x) AS BIGINT) AS sh, CAST(SUM(b.x) AS BIGINT) AS st
        |  FROM r a JOIN g ON true
        |  JOIN r b ON b.event_type = a.event_type AND b.rn = a.rn + g.lag
        |  GROUP BY 1, 2),
        |rr AS (SELECT p.event_type, p.lag, t.n,
        |    CASE WHEN t.n * t.n * t.sxx - t.n * t.s * t.s <> 0 THEN
        |      CAST(t.n * t.n * p.sxy - t.n * t.s * (p.sh + p.st)
        |        + (t.n - p.lag) * t.s * t.s AS DOUBLE) /
        |      CAST(t.n * t.n * t.sxx - t.n * t.s * t.s AS DOUBLE) END AS rv
        |  FROM p JOIN t USING (event_type)),
        |f AS (SELECT event_type, max(n) AS n_obs,
        |    CAST(sum(CASE WHEN rv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS k_lags,
        |    list(struct_pack(lag := lag, rv := rv) ORDER BY lag) AS ls
        |  FROM rr GROUP BY 1),
        |q AS (SELECT event_type, n_obs, k_lags,
        |    CASE WHEN k_lags = 6 THEN
        |      CAST(n_obs AS DOUBLE) * CAST(n_obs + 2 AS DOUBLE)
        |      * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(ls, e -> e.rv * e.rv
        |            / CAST(n_obs - e.lag AS DOUBLE))),
        |          (a, b) -> a + b)
        |    END AS qs
        |  FROM f)
        |SELECT event_type, n_obs, k_lags,
        |  CAST(round(CAST(CAST(qs AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS q_stat,
        |  CASE WHEN qs IS NOT NULL THEN
        |    CAST(round(CAST(CAST(exp(-qs / 2.0) * list_reduce(list_prepend(
        |      struct_pack(s := CAST(1.0 AS DOUBLE), t := CAST(1.0 AS DOUBLE)),
        |      list_transform(range(1, 3), k -> struct_pack(
        |        s := (qs / 2.0) / CAST(k AS DOUBLE),
        |        t := (qs / 2.0) / CAST(k AS DOUBLE)))),
        |      (acc, x) -> struct_pack(s := acc.s + acc.t * x.t,
        |        t := acc.t * x.t)).s
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS p_value
        |FROM q""".stripMargin,
    // q375: integer run/side counts; E and Var are pinned ratios of
    // exact HUGEINT products
    "q375_runs_test" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
        |  FROM d GROUP BY 1),
        |s AS (SELECT d.event_type, day,
        |    CASE WHEN CAST(x AS DOUBLE) > mu THEN 1 ELSE 0 END AS a, n
        |  FROM d JOIN m USING (event_type)),
        |c AS (SELECT event_type, n, a,
        |    CASE WHEN lag(a) OVER w IS NULL THEN 1
        |      WHEN lag(a) OVER w <> a THEN 1 ELSE 0 END AS chg
        |  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |g AS (SELECT event_type, max(n) AS n,
        |    CAST(sum(a) AS BIGINT) AS n_above,
        |    CAST(sum(1 - a) AS BIGINT) AS n_below,
        |    CAST(sum(chg) AS BIGINT) AS runs FROM c GROUP BY 1),
        |f AS (SELECT event_type, n, n_above, n_below, runs,
        |    CAST(CAST(2 AS HUGEINT) * n_above * n_below AS DOUBLE)
        |      / CAST(n AS DOUBLE) + 1.0 AS e,
        |    CASE WHEN n > 1 AND n_above > 0 AND n_below > 0 THEN
        |      CAST(CAST(2 AS HUGEINT) * n_above * n_below
        |        * (CAST(2 AS HUGEINT) * n_above * n_below - n) AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n * (n - 1) AS DOUBLE) END AS v
        |  FROM g)
        |SELECT event_type, n, n_above, n_below, runs,
        |  CAST(round(CAST(CAST(e AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS expected_runs,
        |  CASE WHEN v IS NOT NULL AND v > 0.0 THEN
        |    CAST(round(CAST(CAST((CAST(runs AS DOUBLE) - e) / sqrt(v)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS z
        |FROM f""".stripMargin,
    // q376: the q255 fold plus an UNCOUPLED Greenwood fold (0.0-seed
    // parity); n=d rows NaN-poison the sum and null from there
    "q376_km_greenwood" ->
      """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
        |    MAX(CAST(ts AS DATE)) AS ld FROM events GROUP BY 1),
        |h AS (SELECT MAX(ld) AS wend FROM u),
        |s AS (SELECT date_diff('day', fd, ld) AS dur,
        |    CASE WHEN date_diff('day', ld, wend) >= 7 THEN 1 ELSE 0 END AS ev
        |  FROM u, h),
        |c AS (SELECT dur AS d, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(ev) AS BIGINT) AS deaths FROM s GROUP BY 1),
        |r AS (SELECT d, n_obs, deaths,
        |    CAST(SUM(n_obs) OVER () - COALESCE(SUM(n_obs) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM c),
        |l AS (SELECT list(struct_pack(d := d, n_obs := n_obs,
        |    deaths := deaths, n_risk := n_risk) ORDER BY d) AS arr FROM r),
        |x AS (SELECT unnest(range(1, len(arr) + 1)) AS i, arr FROM l),
        |f AS (SELECT arr[i].d AS d, arr[i].n_obs AS n_obs,
        |    arr[i].deaths AS n_events, arr[i].n_risk AS n_risk,
        |    list_reduce(list_transform(list_slice(arr, 1, i),
        |      e -> 1.0 - CAST(e.deaths AS DOUBLE) / CAST(e.n_risk AS DOUBLE)),
        |      (a, b) -> a * b) AS surv,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_slice(arr, 1, i),
        |      e -> CASE WHEN e.n_risk > e.deaths THEN
        |          CAST(e.deaths AS DOUBLE) / (CAST(e.n_risk AS DOUBLE)
        |            * CAST(e.n_risk - e.deaths AS DOUBLE))
        |        ELSE CAST('NaN' AS DOUBLE) END)),
        |      (a, b) -> a + b) AS gsum
        |  FROM x),
        |g AS (SELECT d, n_obs, n_events, n_risk, surv,
        |    CASE WHEN NOT isnan(gsum) THEN surv * sqrt(gsum) END AS se
        |  FROM f)
        |SELECT CAST(d AS BIGINT) AS dur, n_obs, n_events, n_risk,
        |  CAST(round(CAST(CAST(surv AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS survival,
        |  CAST(round(CAST(CAST(se AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS se,
        |  CASE WHEN se IS NOT NULL THEN
        |    CAST(round(CAST(CAST(greatest(surv - 1.96 * se, 0.0) AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE) END AS lo,
        |  CASE WHEN se IS NOT NULL THEN
        |    CAST(round(CAST(CAST(least(surv + 1.96 * se, 1.0) AS VARCHAR)
        |      AS DECIMAL(38,20)), 6) AS DOUBLE) END AS hi
        |FROM g""".stripMargin,
    // q377: exact (k, m) order statistics over the md5 sample; the
    // estimator is one pinned shape
    "q377_german_tank" ->
      """WITH ids AS (SELECT DISTINCT user_id FROM events),
        |smp AS (SELECT user_id + 1 AS serial FROM ids
        |  WHERE CAST(('0x' || substr(md5('gt:' || CAST(user_id AS VARCHAR)),
        |    1, 2)) AS BIGINT) % 10 < 3),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(max(serial) AS BIGINT) AS m FROM smp),
        |f AS (SELECT k, m,
        |    CAST(m AS DOUBLE) + CAST(m AS DOUBLE) / CAST(k AS DOUBLE) - 1.0
        |      AS n_hat FROM g)
        |SELECT k, m,
        |  CAST(round(CAST(CAST(n_hat AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS n_hat,
        |  CAST(round(CAST(CAST(sqrt((n_hat - CAST(m AS DOUBLE))
        |      * (n_hat + 1.0) / CAST(k AS DOUBLE)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS se,
        |  CAST(round(CAST(CAST(CAST(k AS DOUBLE) / n_hat AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS coverage
        |FROM f""".stripMargin,
    // q378: a generated table; both powers are repeated-multiply folds
    // with 1.0 seeds riding as prepended elements
    "q378_lsh_planner" ->
      """WITH bs AS (SELECT unnest([8, 16, 32, 64]) AS b),
        |ss AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS s),
        |g AS (SELECT CAST(b AS INT) AS b, CAST(128 / b AS INT) AS r,
        |    CAST(s AS DOUBLE) AS s FROM bs, ss),
        |p AS (SELECT b, r, s,
        |    1.0 - list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |      list_transform(range(1, b + 1), i ->
        |        1.0 - list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |          list_transform(range(1, r + 1), j -> s)),
        |          (a2, y) -> a2 * y))),
        |      (a, x) -> a * x) AS pc
        |  FROM g)
        |SELECT b, r, s,
        |  CAST(round(CAST(CAST(pc AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p_collide
        |FROM p""".stripMargin,
    // q379: the q240 exact-r replay feeding a recursive-CTE
    // Durbin-Levinson (array state, coupled fields — the q243/q362
    // contract); pkk computed once per level in a subquery
    "q379_pacf" ->
      """WITH RECURSIVE d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |rw AS (SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM d),
        |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM d GROUP BY 1),
        |g AS (SELECT CAST(unnest(range(1, 7)) AS INT) AS lag),
        |p AS (SELECT a.event_type, g.lag,
        |    CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
        |    CAST(SUM(a.x) AS BIGINT) AS sh, CAST(SUM(b.x) AS BIGINT) AS st
        |  FROM rw a JOIN g ON true
        |  JOIN rw b ON b.event_type = a.event_type AND b.rn = a.rn + g.lag
        |  GROUP BY 1, 2),
        |rr AS (SELECT p.event_type, p.lag,
        |    CASE WHEN t.n * t.n * t.sxx - t.n * t.s * t.s <> 0 THEN
        |      CAST(t.n * t.n * p.sxy - t.n * t.s * (p.sh + p.st)
        |        + (t.n - p.lag) * t.s * t.s AS DOUBLE) /
        |      CAST(t.n * t.n * t.sxx - t.n * t.s * t.s AS DOUBLE) END AS rv
        |  FROM p JOIN t USING (event_type)),
        |base AS (SELECT event_type, list(rv ORDER BY lag) AS r
        |  FROM rr GROUP BY 1
        |  HAVING sum(CASE WHEN rv IS NOT NULL THEN 1 ELSE 0 END) = 6),
        |it AS (
        |  SELECT event_type, 1 AS kk, [r[1]] AS phi, [r[1]] AS outv, r
        |  FROM base
        |  UNION ALL
        |  SELECT event_type, kk + 1,
        |    list_transform(range(1, kk + 1),
        |      j -> phi[j] - pkk * phi[kk + 1 - j]) || [pkk],
        |    outv || [pkk], r
        |  FROM (SELECT event_type, kk, phi, outv, r,
        |      (r[kk + 1] - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, kk + 1), j -> phi[j] * r[kk + 1 - j])),
        |        (a, b) -> a + b))
        |      / (1.0 - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, kk + 1), j -> phi[j] * r[j])),
        |        (a, b) -> a + b)) AS pkk
        |    FROM it WHERE kk < 6)),
        |fin AS (SELECT event_type, outv FROM it WHERE kk = 6),
        |ex AS (SELECT event_type, unnest(range(1, len(outv) + 1)) AS i,
        |    outv FROM fin)
        |SELECT event_type, CAST(i AS INT) AS lag,
        |  CAST(round(CAST(CAST(outv[i] AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS pacf
        |FROM ex""".stripMargin,
    // q380: the q169 unrolled contract with seed-only teleport; seeds
    // are unioned into the node set
    "q380_personalized_pr" -> {
      val base =
        """WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
          |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          |edges AS (SELECT c AS src, 1000000 + s AS dst FROM pairs
          |UNION ALL SELECT 1000000 + s, c FROM pairs),
          |outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
          |seeds AS (SELECT DISTINCT c_custkey AS node FROM customer
          |  WHERE c_custkey % 100 = 0),
          |ns AS (SELECT COUNT(*) AS ns FROM seeds),
          |nodes AS (SELECT DISTINCT node FROM (
          |  SELECT src AS node FROM edges
          |  UNION ALL SELECT dst FROM edges
          |  UNION ALL SELECT node FROM seeds)),
          |p0 AS (SELECT n.node,
          |  CASE WHEN s.node IS NOT NULL
          |    THEN (1000000000000000 // ns.ns) ELSE CAST(0 AS BIGINT) END AS prf
          |FROM nodes n CROSS JOIN ns LEFT JOIN seeds s ON n.node = s.node)"""
          .stripMargin
      val rounds = (1 to 8).map { i =>
        s"""s$i AS (SELECT e.dst AS node, SUM(p.prf // d.od) AS in_mass
           |FROM edges e JOIN p${i - 1} p ON e.src = p.node
           |JOIN outdeg d ON e.src = d.src GROUP BY e.dst),
           |p$i AS (SELECT n.node,
           |CAST(CASE WHEN sd.node IS NOT NULL
           |  THEN (150000000000000 // ns.ns) ELSE CAST(0 AS BIGINT) END
           | + (85 * COALESCE(s$i.in_mass, 0)) // 100 AS BIGINT) AS prf
           |FROM nodes n CROSS JOIN ns LEFT JOIN s$i ON n.node = s$i.node
           |LEFT JOIN seeds sd ON n.node = sd.node)""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        """
          |SELECT node,
          |CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END AS kind,
          |CAST(round(CAST(CAST(prf / 1000000000000000.0 AS VARCHAR)
          |  AS DECIMAL(38,20)), 10) AS DOUBLE) AS ppr
          |FROM p8""".stripMargin
    },
    // q381: quantile_disc replayed explicitly (ceil(p*n) rank on the
    // train census), then all-integer pinball sums
    "q381_pinball" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents, ts FROM events),
        |tr AS (SELECT event_type, cents FROM e
        |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |cen AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tr GROUP BY 1, 2),
        |cum AS (SELECT event_type, cents,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM cen),
        |q AS (SELECT event_type, min(cents) AS qhat
        |  FROM (SELECT event_type, cents, cum,
        |      greatest(least(CAST(ceil(0.9 * n) AS BIGINT), n), 1) AS k
        |    FROM cum) WHERE cum >= k GROUP BY 1),
        |te AS (SELECT e.event_type, cents, qhat FROM e
        |  JOIN q ON e.event_type = q.event_type
        |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(max(qhat) AS BIGINT) AS qhat,
        |    CAST(sum(greatest(cents - qhat, 0)) AS BIGINT) AS over_sum,
        |    CAST(sum(greatest(qhat - cents, 0)) AS BIGINT) AS under_sum
        |  FROM te GROUP BY 1)
        |SELECT event_type, n, qhat, over_sum, under_sum,
        |  CAST(round(CAST(CAST(
        |    CAST(CAST(9 AS HUGEINT) * over_sum + 1 * under_sum AS DOUBLE)
        |      / CAST(CAST(10 AS HUGEINT) * n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS pinball_mean
        |FROM g""".stripMargin,
    // q382: rank trimming as exact interval overlaps on the value
    // census; kept sum in HUGEINT, one terminal division
    "q382_trimmed_mean" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |cen AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM e GROUP BY 1, 2),
        |r AS (SELECT event_type, v, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM cen),
        |k AS (SELECT event_type, v, cnt, cum, n, (n * 5) // 100 AS t FROM r),
        |ov AS (SELECT event_type, n, t,
        |    greatest(least(cum, n - t)
        |      - greatest(cum - cnt + 1, t + 1) + 1, 0) AS keep, v
        |  FROM k)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  CAST(2 * max(t) AS BIGINT) AS n_trimmed,
        |  CASE WHEN sum(keep) > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(sum(CAST(v AS HUGEINT) * keep) AS DOUBLE)
        |        / CAST(sum(keep) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS trimmed_mean
        |FROM ov GROUP BY 1""".stripMargin,
    // q383: pair sums via the sorted-prefix identity — exact HUGEINT
    // from two cumulative windows; three pinned terminal divisions
    "q383_energy_distance" ->
      """WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END AS r
        |  FROM events),
        |c AS (SELECT v, CAST(sum(1 - r) AS BIGINT) AS ca,
        |    CAST(sum(r) AS BIGINT) AS cb FROM e GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(CAST(v AS HUGEINT) * ca) AS HUGEINT) AS ta,
        |    CAST(sum(CAST(v AS HUGEINT) * cb) AS HUGEINT) AS tb,
        |    CAST(count(*) AS BIGINT) AS n_values FROM c),
        |w AS (SELECT v, ca, cb,
        |    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
        |    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb,
        |    sum(CAST(v AS HUGEINT) * ca) OVER (ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS sa,
        |    sum(CAST(v AS HUGEINT) * cb) OVER (ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS sb
        |  FROM c),
        |s AS (SELECT na, nb, n_values,
        |    sum(CAST(cb AS HUGEINT) * (CAST(v AS HUGEINT)
        |      * (2 * CAST(fa AS HUGEINT) - na)
        |      - (2 * CAST(sa AS HUGEINT) - ta))) AS sxy,
        |    sum(CAST(ca AS HUGEINT) * (CAST(v AS HUGEINT)
        |      * (2 * CAST(fa AS HUGEINT) - na)
        |      - (2 * CAST(sa AS HUGEINT) - ta))) AS sxx,
        |    sum(CAST(cb AS HUGEINT) * (CAST(v AS HUGEINT)
        |      * (2 * CAST(fb AS HUGEINT) - nb)
        |      - (2 * CAST(sb AS HUGEINT) - tb))) AS syy
        |  FROM w, t GROUP BY 1, 2, 3),
        |f AS (SELECT na, nb, n_values,
        |    2.0 * CAST(sxy AS DOUBLE) / CAST(CAST(na AS HUGEINT) * nb AS DOUBLE)
        |    - CAST(sxx AS DOUBLE) / CAST(CAST(na AS HUGEINT) * na AS DOUBLE)
        |    - CAST(syy AS DOUBLE) / CAST(CAST(nb AS HUGEINT) * nb AS DOUBLE)
        |      AS e2
        |  FROM s)
        |SELECT na AS n_a, nb AS n_b, n_values,
        |  CAST(round(CAST(CAST(e2 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS e2,
        |  CAST(round(CAST(CAST(sqrt(greatest(e2, 0.0)) AS VARCHAR)
        |    AS DECIMAL(38,20)), 6) AS DOUBLE) AS e
        |FROM f""".stripMargin,
    // q384: exact moment censuses, population variances as single
    // divisions, one ln on a pinned ratio
    "q384_gaussian_kl" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS y FROM events
        |  WHERE value IS NOT NULL),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS s1,
        |    sum(CAST(y AS HUGEINT) * y) AS s2 FROM e GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nc,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS c1,
        |    sum(CAST(y AS HUGEINT) * y) AS c2 FROM e),
        |f AS (SELECT event_type, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mug,
        |    CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS vg,
        |    CAST(c1 AS DOUBLE) / CAST(nc AS DOUBLE) AS muc,
        |    CAST(nc * c2 - c1 * c1 AS DOUBLE)
        |      / CAST(CAST(nc AS HUGEINT) * nc AS DOUBLE) AS vc
        |  FROM g, t)
        |SELECT event_type, n,
        |  CAST(round(CAST(CAST(mug AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS mean,
        |  CAST(round(CAST(CAST(vg AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS variance,
        |  CASE WHEN vg > 0.0 AND vc > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      0.5 * ln(vc / vg) + (vg + (mug - muc) * (mug - muc))
        |        / (2.0 * vc) - 0.5
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS kl
        |FROM f""".stripMargin,
    // q385: 10 unrolled greedy rounds on the integer grid; cosines are
    // pinned doubles of exact long dots; picks excluded by id per round
    "q385_mmr_select" -> {
      val dot = (a: String, b: String) =>
        s"""list_reduce(list_transform(range(1, len($a) + 1),
           |i -> $a[i] * $b[i]), (x, y) -> x + y)""".stripMargin
      val base =
        s"""WITH pts AS (SELECT vec_id AS id, list_transform(embedding,
           |  x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
           |  AS v FROM embeddings WHERE embedding IS NOT NULL),
           |pn AS (SELECT id, v, ${dot("v", "v")} AS ssv FROM pts),
           |q0 AS (SELECT list_transform(embedding,
           |  x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
           |  AS qv FROM embeddings WHERE label = 0),
           |qd AS (SELECT i, CAST(sum(qv[i]) AS BIGINT) AS s
           |  FROM (SELECT unnest(range(1, len(qv) + 1)) AS i, qv FROM q0)
           |  GROUP BY 1),
           |qv AS (SELECT list(s ORDER BY i) AS qv FROM qd),
           |qn AS (SELECT qv, ${dot("qv", "qv")} AS ssq FROM qv),
           |m0 AS (SELECT id, v, ssv,
           |  CAST(${dot("v", "qv")} AS DOUBLE)
           |    / (sqrt(CAST(ssv AS DOUBLE)) * sqrt(CAST(ssq AS DOUBLE)))
           |    AS rel, CAST(0.0 AS DOUBLE) AS ms
           |  FROM pn, qn WHERE ssv > 0 AND ssq > 0)""".stripMargin
      val rounds = (1 to 10).map { j =>
        s"""c$j AS (SELECT id, v, ssv, rel, ms,
           |  0.7 * rel - ${1.0 - 0.7} * ms AS score
           |  FROM m${j - 1} ORDER BY score DESC, id LIMIT 1),
           |m$j AS (SELECT a.id, a.v, a.ssv, a.rel,
           |  greatest(a.ms, CAST(${dot("a.v", "c.v")} AS DOUBLE)
           |    / (sqrt(CAST(a.ssv AS DOUBLE)) * sqrt(CAST(c.ssv AS DOUBLE))))
           |    AS ms
           |  FROM m${j - 1} a, c$j c WHERE a.id <> c.id)""".stripMargin
      }.mkString(",\n", ",\n", "")
      val sel = (1 to 10).map { j =>
        s"SELECT $j AS rank, id AS vec_id, " +
          "CAST(round(CAST(CAST(rel AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS rel, " +
          "CAST(round(CAST(CAST(score AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS score " +
          s"FROM c$j"
      }.mkString("\nUNION ALL ")
      base + rounds + "\n" + sel
    },
    // q386: md5 sign matrix and projections replayed on the integer
    // grid; ratio bins and the quantile_disc rank rule as in q381
    "q386_jl_distortion" ->
      """WITH q AS (SELECT vec_id AS id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
        |    AS v FROM embeddings WHERE embedding IS NOT NULL),
        |dn AS (SELECT len(v) AS din FROM q LIMIT 1),
        |sm AS (SELECT list(s ORDER BY ix) AS sm FROM (
        |  SELECT j * din + i AS ix,
        |    CASE WHEN CAST(('0x' || substr(md5('jl:' || CAST(j AS VARCHAR)
        |      || ':' || CAST(i AS VARCHAR)), 1, 2)) AS BIGINT) % 2 = 0
        |    THEN 1 ELSE -1 END AS s
        |  FROM dn, range(0, 16) t1(j), range(0, 64) t2(i)
        |  WHERE i < din)),
        |p AS (SELECT id, v, list_transform(range(0, 16), j ->
        |    list_reduce(list_transform(range(1, din + 1),
        |      i -> sm[j * din + i] * v[i]), (a, b) -> a + b)) AS pv
        |  FROM q, sm, dn),
        |pr AS (SELECT a.id,
        |    list_reduce(list_transform(range(1, din + 1),
        |      i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])),
        |      (x, y) -> x + y) AS dv,
        |    list_reduce(list_transform(range(1, 17),
        |      i -> (a.pv[i] - b.pv[i]) * (a.pv[i] - b.pv[i])),
        |      (x, y) -> x + y) AS dp
        |  FROM p a JOIN p b ON a.id + 100 = b.id, dn),
        |ct AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
        |    CAST(sum(CASE WHEN dv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_deg
        |  FROM pr),
        |rb AS (SELECT CAST(floor((CAST(dp AS DOUBLE) / 16.0)
        |    / CAST(dv AS DOUBLE) * 1000.0) AS BIGINT) AS bin
        |  FROM pr WHERE dv > 0),
        |cen AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt
        |  FROM rb GROUP BY 1),
        |cum AS (SELECT bin,
        |    sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER () AS n FROM cen),
        |qq AS (SELECT pp.p, min(bin) AS ratio_bin
        |  FROM cum, (SELECT CAST(unnest([0.1, 0.5, 0.9]) AS DOUBLE) AS p) pp
        |  WHERE cum >= greatest(least(CAST(ceil(pp.p * n) AS BIGINT), n), 1)
        |  GROUP BY 1)
        |SELECT qq.p, ct.n_all - ct.n_deg AS n_pairs,
        |  ct.n_deg AS n_degenerate, ratio_bin
        |FROM qq, ct""".stripMargin,
    // q387: distinct (source, gram) census self-join keyed on the
    // gram; cells are exact distinct-type counts
    "q387_source_containment" ->
      """WITH tk AS (SELECT source AS s,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |g AS (SELECT DISTINCT s, unnest(list_transform(
        |    range(1, len(toks) - 1),
        |    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g
        |  FROM tk WHERE len(toks) >= 3),
        |sz AS (SELECT s, CAST(count(*) AS BIGINT) AS n_types
        |  FROM g GROUP BY 1),
        |pr AS (SELECT a.s AS src_a, b.s AS src_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM g a JOIN g b ON a.g = b.g AND a.s <> b.s GROUP BY 1, 2)
        |SELECT src_a, src_b, sz.n_types AS n_a, n_shared,
        |  CAST(round(CAST(CAST(
        |    CAST(n_shared AS DOUBLE) / CAST(sz.n_types AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS containment
        |FROM pr JOIN sz ON pr.src_a = sz.s""".stripMargin,
    // q388: exact per-duration censuses with per-group suffix at-risk;
    // E/V terms fold in duration order; p via the q348 erfc polynomial
    "q388_log_rank" ->
      """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
        |    MAX(CAST(ts AS DATE)) AS ld FROM events GROUP BY 1),
        |h AS (SELECT MAX(ld) AS wend FROM u),
        |s AS (SELECT date_diff('day', fd, ld) AS dur,
        |    CASE WHEN date_diff('day', ld, wend) >= 7 THEN 1 ELSE 0 END AS ev,
        |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS b
        |  FROM u, h),
        |c AS (SELECT dur AS d, CAST(SUM(1 - b) AS BIGINT) AS oa,
        |    CAST(SUM(b) AS BIGINT) AS ob,
        |    CAST(SUM(CASE WHEN b = 0 THEN ev ELSE 0 END) AS BIGINT) AS da,
        |    CAST(SUM(CASE WHEN b = 1 THEN ev ELSE 0 END) AS BIGINT) AS db
        |  FROM s GROUP BY 1),
        |r AS (SELECT d, oa, ob, da, db,
        |    CAST(SUM(oa) OVER () - COALESCE(SUM(oa) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS na,
        |    CAST(SUM(ob) OVER () - COALESCE(SUM(ob) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS nb
        |  FROM c),
        |t AS (SELECT d,
        |    CASE WHEN da + db > 0 THEN
        |      CAST(da + db AS DOUBLE) * CAST(na AS DOUBLE)
        |        / CAST(na + nb AS DOUBLE) ELSE 0.0 END AS et,
        |    CASE WHEN da + db > 0 AND na + nb > 1 THEN
        |      (CAST(da + db AS DOUBLE) * CAST(na AS DOUBLE)
        |        * CAST(nb AS DOUBLE) * CAST(na + nb - da - db AS DOUBLE))
        |      / (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
        |        * CAST(na + nb - 1 AS DOUBLE)) ELSE 0.0 END AS vt
        |  FROM r),
        |f AS (SELECT
        |    (SELECT CAST(SUM(oa) AS BIGINT) FROM c) AS n_a,
        |    (SELECT CAST(SUM(ob) AS BIGINT) FROM c) AS n_b,
        |    (SELECT CAST(SUM(da) AS BIGINT) FROM c) AS o_a,
        |    (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(et ORDER BY d)), (a, v) -> a + v) FROM t) AS e_a,
        |    (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(vt ORDER BY d)), (a, v) -> a + v) FROM t) AS var_lr),
        |g AS (SELECT n_a, n_b, o_a, e_a, var_lr,
        |    CASE WHEN var_lr > 0.0 THEN
        |      (CAST(o_a AS DOUBLE) - e_a) * (CAST(o_a AS DOUBLE) - e_a)
        |        / var_lr END AS chi2 FROM f),
        |z AS (SELECT *, sqrt(chi2) / 1.4142135623730951 AS x FROM g)
        |SELECT n_a, n_b, o_a,
        |  CAST(round(CAST(CAST(e_a AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS e_a,
        |  CAST(round(CAST(CAST(var_lr AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS var_lr,
        |  CAST(round(CAST(CAST(chi2 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS chi2,
        |  CASE WHEN chi2 IS NOT NULL THEN
        |    CAST(round(CAST(CAST(
        |      (1.0 / (1.0 + 0.5 * abs(x))) * exp(-x * x - 1.26551223
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * (1.00002368
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * (0.37409196
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * (0.09678418
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * (-0.18628806
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * (0.27886807
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * (-1.13520398
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * (1.48851587
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * (-0.82215223
        |      + (1.0 / (1.0 + 0.5 * abs(x))) * 0.17087277)))))))))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS p
        |FROM z""".stripMargin,
    // q389: DuckDB can't replay zlib, but it can predict what a CORRECT
    // codec must produce — every doc roundtrips (n_ok = n_docs) and the
    // roundtripped byte sum equals the plain strlen sum; a corrupt
    // deflate OR inflate shows up as a value mismatch in either column
    "q389_deflate_roundtrip" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_ok,
        |  CAST(sum(strlen(text)) AS BIGINT) AS sum_len
        |FROM documents GROUP BY source""".stripMargin,
    // q390: the §3.1+§3.2+§3.3 lifecycle replayed stage-for-stage. Only
    // ledger-visible paths are re-derived: scanner metrics/score/boost/
    // best-call argmax, the bollinger+ATR folds feeding rr/atr_move and
    // the premium flags, the P8 gate, the minute-bar bracket walk, and
    // the VIX/SPY regime. Double parity: every conditional sum is
    // 2-term (commutative-exact), list folds replay Spark's aggregate()
    // seed-0 left fold via seedless list_reduce (0+x1 = x1), rounds via
    // the VARCHAR->DECIMAL path; sf() rounding points mirrored exactly
    // (candidates rounded BEFORE support/resistance comparison).
    "q390_lifecycle_e2e" -> {
      def r(x: String, n: Int) =
        s"CAST(round(CAST(CAST($x AS VARCHAR) AS DECIMAL(38,20)), $n) AS DOUBLE)"
      s"""WITH t AS (SELECT trim(n_name) AS ticker,
         |    CAST(n_nationkey AS BIGINT) AS key FROM nation),
         |m AS (SELECT ticker, key, CAST(key % 7 - 3 AS DOUBLE) * 1.1 AS pct,
         |    CAST(key AS DOUBLE) + 100.0 AS upx
         |  FROM t WHERE abs(CAST(key % 7 - 3 AS DOUBLE) * 1.1) >= 1.0
         |    AND key <> 24),
         |ch AS (SELECT ticker, key, upx, pct, j, j < 2 AS is_call,
         |    upx + CASE j WHEN 0 THEN 0.0 WHEN 1 THEN 20.0
         |      WHEN 2 THEN -5.0 ELSE 10.0 END AS strike,
         |    CASE j WHEN 0 THEN 4.8 WHEN 1 THEN 2.4 WHEN 2 THEN 1.9
         |      ELSE 0.9 END AS bid,
         |    CASE j WHEN 0 THEN 5.2 WHEN 1 THEN 2.6 WHEN 2 THEN 2.1
         |      ELSE 1.1 END AS ask,
         |    CAST(CASE WHEN j < 2 THEN (key % 7) * 400 + 200
         |      ELSE 40 + j * 10 END AS BIGINT) AS vol,
         |    CAST(100 + j * 50 AS BIGINT) AS oi,
         |    CASE j WHEN 0 THEN 0.4 WHEN 1 THEN 0.3 WHEN 2 THEN -0.35
         |      ELSE -0.3 END AS delta,
         |    CASE WHEN j < 2 THEN 0.05 ELSE 0.04 END AS gamma
         |  FROM m CROSS JOIN (SELECT unnest(range(0, 4)) AS j)),
         |fl AS (SELECT ticker, any_value(key) AS key, any_value(pct) AS pct,
         |    any_value(upx) AS upx,
         |    sum(CASE WHEN is_call THEN CAST(vol AS DOUBLE) * ((bid+ask)/2) * 100
         |      ELSE 0.0 END) AS call_dv,
         |    sum(CASE WHEN NOT is_call THEN CAST(vol AS DOUBLE) * ((bid+ask)/2) * 100
         |      ELSE 0.0 END) AS put_dv,
         |    sum(CASE WHEN is_call THEN CAST(vol AS DOUBLE) ELSE 0.0 END)
         |      / greatest(sum(CASE WHEN is_call THEN CAST(oi AS DOUBLE)
         |        ELSE 0.0 END), 1.0) AS call_voloi,
         |    sum(CASE WHEN NOT is_call THEN CAST(vol AS DOUBLE) ELSE 0.0 END)
         |      / greatest(sum(CASE WHEN NOT is_call THEN CAST(oi AS DOUBLE)
         |        ELSE 0.0 END), 1.0) AS put_voloi,
         |    sum(CASE WHEN is_call AND CAST(vol AS DOUBLE) >
         |      greatest(CAST(oi AS DOUBLE) * 0.5, 100.0) THEN 1 ELSE 0 END)
         |      AS call_strikes,
         |    sum(CASE WHEN NOT is_call AND CAST(vol AS DOUBLE) >
         |      greatest(CAST(oi AS DOUBLE) * 0.5, 100.0) THEN 1 ELSE 0 END)
         |      AS put_strikes,
         |    sum(CASE WHEN is_call AND vol > oi THEN
         |      (CAST(vol AS DOUBLE) - oi) * ((bid+ask)/2) * 100 ELSE 0.0 END)
         |      AS call_uoa,
         |    sum(CASE WHEN NOT is_call AND vol > oi THEN
         |      (CAST(vol AS DOUBLE) - oi) * ((bid+ask)/2) * 100 ELSE 0.0 END)
         |      AS put_uoa
         |  FROM ch GROUP BY ticker),
         |sc AS (SELECT *,
         |    (CASE WHEN call_dv + put_dv > 500000 THEN
         |      CASE WHEN pct > 0 AND call_dv > 0 THEN
         |        CASE WHEN call_dv / greatest(put_dv, 1.0) > 3.0 THEN 2
         |          WHEN call_dv / greatest(put_dv, 1.0) > 1.5 THEN 1 ELSE 0 END
         |      WHEN pct <= 0 AND put_dv > 0 THEN
         |        CASE WHEN put_dv / greatest(call_dv, 1.0) > 3.0 THEN 2
         |          WHEN put_dv / greatest(call_dv, 1.0) > 1.5 THEN 1 ELSE 0 END
         |      ELSE 0 END ELSE 0 END)
         |    + (CASE WHEN (CASE WHEN pct > 0 THEN call_voloi ELSE put_voloi END)
         |        > 2.0 THEN 2
         |      WHEN (CASE WHEN pct > 0 THEN call_voloi ELSE put_voloi END)
         |        > 0.8 THEN 1 ELSE 0 END)
         |    + (CASE WHEN (CASE WHEN pct > 0 THEN call_strikes
         |        ELSE put_strikes END) >= 5 THEN 2
         |      WHEN (CASE WHEN pct > 0 THEN call_strikes ELSE put_strikes END)
         |        >= 3 THEN 1 ELSE 0 END)
         |    + (CASE WHEN (CASE WHEN pct > 0 THEN call_uoa ELSE put_uoa END)
         |        > 2000000 THEN 2
         |      WHEN (CASE WHEN pct > 0 THEN call_uoa ELSE put_uoa END)
         |        > 500000 THEN 1 ELSE 0 END)
         |    + (CASE WHEN abs(pct) > 1.5 THEN 1 ELSE 0 END)
         |    + (CASE WHEN (pct > 0 AND put_dv > call_dv * 2 AND put_dv > 1000000)
         |        OR (pct <= 0 AND call_dv > put_dv * 2 AND call_dv > 1000000)
         |      THEN 1 ELSE 0 END) AS score0,
         |    CASE WHEN pct > 0 AND put_dv > call_dv * 2 AND put_dv > 1000000
         |        THEN 'BEARISH'
         |      WHEN pct <= 0 AND call_dv > put_dv * 2 AND call_dv > 1000000
         |        THEN 'BULLISH'
         |      WHEN pct > 0 THEN 'BULLISH' ELSE 'BEARISH' END AS direction,
         |    'IND' || CAST(key % 2 AS VARCHAR) AS industry
         |  FROM fl),
         |cl AS (SELECT industry, direction, CAST(count(*) AS INT) AS csize
         |  FROM sc WHERE score0 >= 3 GROUP BY industry, direction),
         |bo AS (SELECT sc.*,
         |    least(score0 + CASE WHEN score0 < 6 AND coalesce(csize, 0) >= 4
         |      THEN CASE WHEN coalesce(csize, 0) >= 8 THEN 3
         |        WHEN coalesce(csize, 0) >= 5 THEN 2 ELSE 1 END
         |      ELSE 0 END, 10) AS score
         |  FROM sc LEFT JOIN cl USING (industry, direction)),
         |en AS (SELECT * FROM bo WHERE score >= 6),
         |bars AS (SELECT ticker, key, i,
         |    CAST(key AS DOUBLE) + 100.0 + i * 0.5 - (i % 4) * 0.6 AS c
         |  FROM en CROSS JOIN (SELECT unnest(range(1, 31)) AS i)),
         |hl AS (SELECT ticker, list(c ORDER BY i) AS cs,
         |    list(c + 1.0 ORDER BY i) AS hs, list(c - 1.0 ORDER BY i) AS ls
         |  FROM bars GROUP BY ticker),
         |bb0 AS (SELECT ticker, cs, hs, ls,
         |    list_reduce(list_slice(cs, 11, 30), (a, x) -> a + x) / 20 AS bbm
         |  FROM hl),
         |tq AS (SELECT ticker,
         |    ${r("cs[30]", 4)} AS close_r,
         |    ${r("list_aggregate(list_slice(hs, 11, 30), 'max')", 4)} AS rh,
         |    ${r("list_aggregate(list_slice(ls, 11, 30), 'min')", 4)} AS rl,
         |    ${r("bbm + sqrt(list_reduce(list_transform(list_slice(cs, 11, 30), " +
              "x -> (x - bbm) * (x - bbm)), (a, x) -> a + x) / 19) * 2.0", 4)} AS bbu,
         |    ${r("bbm - sqrt(list_reduce(list_transform(list_slice(cs, 11, 30), " +
              "x -> (x - bbm) * (x - bbm)), (a, x) -> a + x) / 19) * 2.0", 4)} AS bbl,
         |    ${r("list_reduce(list_concat([list_aggregate(list_slice(" +
              "list_concat([hs[1] - ls[1]], list_transform(range(2, 31), " +
              "i -> greatest(hs[i] - ls[i], abs(hs[i] - cs[i-1]), " +
              "abs(ls[i] - cs[i-1])))), 1, 14), 'sum') / 14.0], " +
              "list_slice(list_concat([hs[1] - ls[1]], " +
              "list_transform(range(2, 31), i -> greatest(hs[i] - ls[i], " +
              "abs(hs[i] - cs[i-1]), abs(ls[i] - cs[i-1])))), 15, 30)), " +
              "(acc, x) -> (acc * 13.0 + x) / 14.0)", 4)} AS atr
         |  FROM bb0),
         |rsk AS (SELECT en.ticker, en.key, en.direction, en.pct, en.upx,
         |    en.call_voloi, en.put_voloi,
         |    coalesce(greatest(CASE WHEN rl < close_r THEN rl END,
         |      CASE WHEN bbl < close_r THEN bbl END), rl) AS support,
         |    coalesce(least(CASE WHEN rh > close_r THEN rh END,
         |      CASE WHEN bbu > close_r THEN bbu END), rh) AS resistance,
         |    atr FROM en JOIN tq USING (ticker)),
         |pr AS (SELECT *,
         |    CASE WHEN upx > 0 AND support > 0 AND resistance > 0 AND
         |      (CASE WHEN direction = 'BULLISH' THEN upx - support
         |        ELSE resistance - upx END) > 0 THEN
         |      ${r("(CASE WHEN direction = 'BULLISH' THEN resistance - upx " +
              "ELSE upx - support END) / (CASE WHEN direction = 'BULLISH' " +
              "THEN upx - support ELSE resistance - upx END)", 2)} END AS rr,
         |    ${r("abs(pct) / (CASE WHEN upx > 0 AND atr > 0 " +
              "THEN atr / upx * 100 ELSE 3.0 END)", 2)} AS atr_move
         |  FROM rsk),
         |pm AS (SELECT *,
         |    CAST(key % 2 = 0 AS INT)
         |    + CAST(coalesce(rr, 0.0) > 2.0 AS INT)
         |    + CAST(call_voloi > 1.5 AND direction = 'BULLISH' AS INT)
         |    + CAST(coalesce(atr_move, 0.0) > 2.0 AS INT)
         |    + CAST(put_voloi > 2.0 AND direction = 'BEARISH' AS INT)
         |      AS premium_score
         |  FROM pr),
         |bc AS (SELECT ticker, ticker || '_' || CAST(j AS VARCHAR) AS best_sym,
         |    vol AS best_vol, oi AS best_oi
         |  FROM (SELECT ch.*,
         |      least(CAST(vol AS DOUBLE) / 500.0, 5.0) * 2.0
         |      + (1.0 - least((ask - bid) / ((bid+ask)/2), 1.0)) * 3.0
         |      + least(CAST(vol AS DOUBLE) / greatest(CAST(oi AS DOUBLE), 1.0),
         |        3.0) * 1.5
         |      + gamma * 20.0
         |      + CASE WHEN abs(delta) BETWEEN 0.25 AND 0.50 THEN 2.0
         |        ELSE 0.0 END
         |      - abs(-0.05) / greatest((bid+ask)/2, 0.01) * 1.0 AS cscore
         |    FROM ch WHERE is_call)
         |  QUALIFY row_number() OVER (PARTITION BY ticker
         |    ORDER BY cscore DESC,
         |      ticker || '_' || CAST(j AS VARCHAR) DESC) = 1),
         |el AS (SELECT pm.*, bc.best_sym FROM pm JOIN bc USING (ticker)
         |  WHERE premium_score >= 2 AND (best_vol > 250 OR best_oi > 500)),
         |mb AS (SELECT el.ticker, el.key, m2.m,
         |    1000000000 + m2.m * 60000 AS tms,
         |    5.0 + m2.m * 0.01 AS c,
         |    (5.0 + m2.m * 0.01) + CASE WHEN el.key % 3 = 0 AND m2.m = 10
         |      THEN 3.0 ELSE 0.2 END AS h,
         |    (5.0 + m2.m * 0.01) - CASE WHEN el.key % 3 = 1 AND m2.m = 12
         |      THEN 2.5 ELSE 0.2 END AS l
         |  FROM el CROSS JOIN (SELECT unnest(range(0, 40)) AS m) m2),
         |walk AS (SELECT ticker,
         |    5.0 * 1.02 AS entry,
         |    min(CASE WHEN m >= 1 AND (tms >= 1000000000 + 7200000
         |      OR l <= (5.0 * 1.02) * 0.75 OR h >= (5.0 * 1.02) * 1.40)
         |      THEN m END) AS exit_m
         |  FROM mb GROUP BY ticker),
         |fill AS (SELECT walk.ticker, entry,
         |    CASE WHEN exit_m IS NULL THEN 'TIMEOUT'
         |      WHEN mb.tms >= 1000000000 + 7200000 THEN 'TIMEOUT'
         |      WHEN mb.l <= entry * 0.75 THEN 'STOP'
         |      ELSE 'TARGET' END AS exit_reason,
         |    CASE WHEN exit_m IS NULL THEN 5.0 + 39 * 0.01
         |      WHEN mb.tms >= 1000000000 + 7200000 THEN mb.c
         |      WHEN mb.l <= entry * 0.75 THEN entry * 0.75
         |      ELSE entry * 1.40 END AS exit_price
         |  FROM walk LEFT JOIN mb ON mb.ticker = walk.ticker
         |    AND mb.m = walk.exit_m),
         |spy AS (SELECT avg(close) AS sma10,
         |    max_by(close, d) AS last_close, count(*) AS n FROM (
         |    SELECT 500.0 + CAST(key AS DOUBLE) + 1.0 AS close,
         |      CAST('2026-03-01' AS DATE) + CAST(key + 1 AS INT) AS d
         |    FROM t WHERE key < 12 ORDER BY d DESC LIMIT 10))
         |SELECT el.ticker, el.direction,
         |  CAST(el.premium_score AS INT) AS premium_score,
         |  false AS is_skipped, CAST(NULL AS VARCHAR) AS skip_reason,
         |  el.best_sym AS recommended_contract, fill.exit_reason,
         |  ${r("fill.entry", 6)} AS entry_price,
         |  ${r("(fill.exit_price - fill.entry) / fill.entry", 6)}
         |    AS realized_return_pct,
         |  CAST(18.5 AS DOUBLE) AS VIX_at_entry,
         |  (SELECT CASE WHEN n >= 10 THEN CASE WHEN last_close > sma10
         |    THEN 'BULLISH' ELSE 'BEARISH' END END FROM spy)
         |    AS SPY_trend_state
         |FROM el JOIN fill USING (ticker)""".stripMargin
    },
    // q391: same shingle SQL as q75, NO band prefilter (the curve needs
    // every pair down to tau=0.3); comparison j*1000 >= tau_milli is one
    // pinned double product vs integer; zero-pair thresholds kept by the
    // left join so the curve has no silent holes
    "q391_threshold_curve" ->
      """WITH aug AS (SELECT doc_id, text FROM documents WHERE doc_id < 40
        |UNION ALL SELECT doc_id + 1000, text || ' graft near dup tail'
        |  FROM documents WHERE doc_id < 40),
        |t AS (SELECT doc_id,
        |  string_split_regex(lower(trim(text)), '\s+') AS toks FROM aug),
        |s AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
        |    i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS sh
        |  FROM t),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.sh, b.sh))
        |    / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS j
        |  FROM s a, s b WHERE a.doc_id < b.doc_id),
        |th AS (SELECT CAST(unnest([300, 400, 500, 600, 700, 800, 900])
        |    AS BIGINT) AS tau_milli),
        |c AS (SELECT tau_milli, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(count(DISTINCT id_b) AS BIGINT) AS n_dropped
        |  FROM th JOIN p ON p.j * 1000 >= th.tau_milli GROUP BY 1)
        |SELECT th.tau_milli, coalesce(c.n_pairs, 0) AS n_pairs,
        |  coalesce(c.n_dropped, 0) AS n_dropped,
        |  80 - coalesce(c.n_dropped, 0) AS n_kept
        |FROM th LEFT JOIN c USING (tau_milli)""".stripMargin,
    // q392: A-ES key ln(u)/w replayed term-for-term — u from the same
    // 48-bit md5 slice (q327 hash-to-uniform shape), ln parity per the
    // q121 libm contract, stratum top-k via QUALIFY row_number
    "q392_weighted_reservoir" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tok FROM documents),
        |k AS (SELECT source, doc_id, n_tok,
        |    ln((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || 'graft9'), 1, 12)) AS BIGINT) AS DOUBLE) + 0.5)
        |      / CAST(281474976710656 AS DOUBLE))
        |      / CAST(n_tok AS DOUBLE) AS key
        |  FROM d WHERE n_tok IS NOT NULL AND n_tok > 0)
        |SELECT source, doc_id, n_tok,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY key DESC, doc_id) AS BIGINT) AS rank
        |FROM k
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY key DESC, doc_id) <= 5""".stripMargin,
    // q393: clipped counts are exact integer censuses; p_n one division;
    // BLEU = bp * exp((ln p1 + ln p2 + ln p3 + ln p4)/4) replayed in the
    // identical association order; unsmoothed zeros stay loud zeros
    "q393_bleu" ->
      """WITH base AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS rt
        |  FROM documents WHERE doc_id < 40),
        |pair AS (SELECT doc_id, rt, list_concat(list_slice(rt, 1, 12),
        |    ['candidate', 'summary', 'tail', 'words']) AS ct FROM base),
        |cc AS (SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS c_cand
        |  FROM (SELECT doc_id, nn.n,
        |      unnest(list_transform(range(1, len(ct) - nn.n + 2),
        |        i -> array_to_string(list_slice(ct, i, i + nn.n - 1), ' ')))
        |        AS gram
        |    FROM pair, (SELECT unnest([1, 2, 3, 4]) AS n) nn)
        |  GROUP BY 1, 2, 3),
        |cr AS (SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS c_ref
        |  FROM (SELECT doc_id, nn.n,
        |      unnest(list_transform(range(1, len(rt) - nn.n + 2),
        |        i -> array_to_string(list_slice(rt, i, i + nn.n - 1), ' ')))
        |        AS gram
        |    FROM pair, (SELECT unnest([1, 2, 3, 4]) AS n) nn)
        |  GROUP BY 1, 2, 3),
        |j AS (SELECT cc.doc_id, cc.n, sum(cc.c_cand) AS tot,
        |    sum(least(cc.c_cand, coalesce(cr.c_ref, 0))) AS clip
        |  FROM cc LEFT JOIN cr USING (doc_id, n, gram) GROUP BY 1, 2),
        |p AS (SELECT doc_id,
        |    max(CASE WHEN n = 1 THEN CAST(clip AS DOUBLE) / tot END) AS p1,
        |    max(CASE WHEN n = 2 THEN CAST(clip AS DOUBLE) / tot END) AS p2,
        |    max(CASE WHEN n = 3 THEN CAST(clip AS DOUBLE) / tot END) AS p3,
        |    max(CASE WHEN n = 4 THEN CAST(clip AS DOUBLE) / tot END) AS p4,
        |    count(*) AS orders
        |  FROM j GROUP BY 1),
        |l AS (SELECT doc_id, CAST(len(rt) AS BIGINT) AS r_len,
        |    CAST(len(ct) AS BIGINT) AS c_len FROM pair)
        |SELECT l.doc_id, l.r_len, l.c_len,
        |  CAST(round(CAST(CAST(p1 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p1,
        |  CAST(round(CAST(CAST(p2 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p2,
        |  CAST(round(CAST(CAST(p3 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p3,
        |  CAST(round(CAST(CAST(p4 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p4,
        |  CASE WHEN orders = 4 AND p1 > 0 AND p2 > 0 AND p3 > 0 AND p4 > 0
        |    THEN CAST(round(CAST(CAST(
        |      (CASE WHEN c_len >= r_len THEN 1.0
        |        ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))
        |        END)
        |      * exp((ln(p1) + ln(p2) + ln(p3) + ln(p4)) / 4.0)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |    WHEN orders = 4 THEN 0.0 END AS bleu
        |FROM l LEFT JOIN p USING (doc_id)""".stripMargin,
    // q394: coupled (k, x, p) state replayed via list_reduce with the
    // q40 field-order discipline (no field reads an acc.* field
    // recomputed EARLIER in the same struct); seed = first element via
    // the transform-to-struct trick, so the fold starts at (x=z1, p=p0)
    "q394_kalman_level" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |      AS z
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs,
        |    list(z ORDER BY day) AS zs FROM d GROUP BY 1),
        |f AS (SELECT event_type, n_obs,
        |    list_reduce(list_transform(zs, v -> struct_pack(
        |      k := CAST(0.0 AS DOUBLE), x := v, p := CAST(1.0 AS DOUBLE))),
        |    (acc, e) -> struct_pack(
        |      k := (acc.p + 0.05) / (acc.p + 0.05 + 1.0),
        |      x := acc.x + ((acc.p + 0.05) / (acc.p + 0.05 + 1.0))
        |        * (e.x - acc.x),
        |      p := (1.0 - (acc.p + 0.05) / (acc.p + 0.05 + 1.0))
        |        * (acc.p + 0.05))) AS s
        |  FROM h)
        |SELECT event_type, n_obs,
        |  CAST(round(CAST(CAST(s.x AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS level,
        |  CAST(round(CAST(CAST(s.p AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p_var,
        |  CAST(round(CAST(CAST(s.k AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS gain
        |FROM f""".stripMargin,
    // q395: quantized cells replay as one pinned floor shape off the
    // same broadcast min/max; Morton interleave is pure integer bit
    // algebra; cosine via the q127 list_zip replay; NaN>=tau agrees
    // cross-engine (both order NaN above any threshold); the 1024-row
    // per-shard cap replays as a count window + HAVING skip census
    "q395_zorder_locality" -> {
      def cellSql(d: Int) =
        s"CASE WHEN mx$d = mn$d THEN 0 ELSE CAST(least(greatest(" +
          s"floor((v[$d] - mn$d) / (mx$d - mn$d) * 15), 0.0), 15.0) " +
          s"AS BIGINT) END"
      val morton = (1 to 2).flatMap { d =>
        (0 until 4).map(b => s"((((${cellSql(d)}) >> $b) & 1) << " +
          s"${b * 2 + (d - 1)})")
      }.mkString(" | ")
      s"""WITH e AS (SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |b AS (SELECT min(v[1]) AS mn1, max(v[1]) AS mx1,
         |    min(v[2]) AS mn2, max(v[2]) AS mx2 FROM e),
         |tg AS (SELECT id, v,
         |    ($morton) >> 3 AS zorder,
         |    CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 12))
         |      AS BIGINT) % 32 AS hash
         |  FROM e, b),
         |kz AS (SELECT * FROM (SELECT id, v, zorder,
         |    count(*) OVER (PARTITION BY zorder) AS bn FROM tg)
         |  WHERE bn <= 1024),
         |kh AS (SELECT * FROM (SELECT id, v, hash,
         |    count(*) OVER (PARTITION BY hash) AS bn FROM tg)
         |  WHERE bn <= 1024),
         |sz AS (SELECT CAST(count(*) AS BIGINT) AS n_shards_skipped FROM
         |  (SELECT zorder FROM tg GROUP BY 1 HAVING count(*) > 1024)),
         |sh AS (SELECT CAST(count(*) AS BIGINT) AS n_shards_skipped FROM
         |  (SELECT hash FROM tg GROUP BY 1 HAVING count(*) > 1024)),
         |pz AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(coalesce(sum(CASE WHEN
         |      list_aggregate(list_transform(list_zip(a.v, b2.v),
         |        x -> x[1] * x[2]), 'sum') /
         |      (sqrt(list_aggregate(list_transform(a.v, x -> x * x), 'sum'))
         |        * sqrt(list_aggregate(list_transform(b2.v, x -> x * x),
         |          'sum'))) * 1000 >= 700 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS n_close_pairs
         |  FROM kz a JOIN kz b2 ON a.zorder = b2.zorder AND a.id < b2.id),
         |ph AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(coalesce(sum(CASE WHEN
         |      list_aggregate(list_transform(list_zip(a.v, b2.v),
         |        x -> x[1] * x[2]), 'sum') /
         |      (sqrt(list_aggregate(list_transform(a.v, x -> x * x), 'sum'))
         |        * sqrt(list_aggregate(list_transform(b2.v, x -> x * x),
         |          'sum'))) * 1000 >= 700 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS n_close_pairs
         |  FROM kh a JOIN kh b2 ON a.hash = b2.hash AND a.id < b2.id),
         |nz AS (SELECT CAST(count(DISTINCT zorder) AS BIGINT) AS n_shards
         |  FROM tg),
         |nh AS (SELECT CAST(count(DISTINCT hash) AS BIGINT) AS n_shards
         |  FROM tg)
         |SELECT 'zorder' AS layout, nz.n_shards, sz.n_shards_skipped,
         |  pz.n_pairs, pz.n_close_pairs FROM pz, nz, sz
         |UNION ALL
         |SELECT 'hash', nh.n_shards, sh.n_shards_skipped, ph.n_pairs,
         |  ph.n_close_pairs FROM ph, nh, sh""".stripMargin
    },
    // q396: two synchronized LPA rounds unrolled; per-round argmax via
    // QUALIFY with the pinned (cnt desc, label asc) total order —
    // all-integer, so the census hash has no float surface
    "q396_label_prop" ->
      """WITH e0 AS (SELECT DISTINCT o.o_custkey AS u,
        |    1000000 + l.l_suppkey AS v
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |und AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v
        |  FROM e0),
        |l0 AS (SELECT DISTINCT u AS node FROM und),
        |r1 AS (SELECT node, label FROM (
        |    SELECT und.u AS node, l0.node AS label,
        |      CAST(count(*) AS BIGINT) AS cnt
        |    FROM und JOIN l0 ON und.v = l0.node GROUP BY 1, 2)
        |  QUALIFY row_number() OVER (PARTITION BY node
        |    ORDER BY cnt DESC, label) = 1),
        |r2 AS (SELECT node, label FROM (
        |    SELECT und.u AS node, r1.label,
        |      CAST(count(*) AS BIGINT) AS cnt
        |    FROM und JOIN r1 ON und.v = r1.node GROUP BY 1, 2)
        |  QUALIFY row_number() OVER (PARTITION BY node
        |    ORDER BY cnt DESC, label) = 1)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_members
        |FROM r2 GROUP BY label""".stripMargin,
    // q397: distributed top-k (QUALIFY) then per-K sums; coverage is
    // one division of exact integers — no rounding seam at all
    "q397_vocab_coverage" ->
      """WITH t AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS tok FROM documents),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM t
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM c),
        |top AS (SELECT tok, freq, CAST(row_number() OVER (
        |    ORDER BY freq DESC, tok) AS BIGINT) AS rk FROM c
        |  QUALIFY row_number() OVER (ORDER BY freq DESC, tok) <= 10000),
        |ks AS (SELECT CAST(unnest([100, 300, 1000, 3000, 10000])
        |    AS BIGINT) AS k),
        |agg AS (SELECT ks.k, CAST(count(top.rk) AS BIGINT) AS n_types,
        |    CAST(coalesce(sum(top.freq), 0) AS BIGINT) AS covered
        |  FROM ks LEFT JOIN top ON top.rk <= ks.k GROUP BY ks.k)
        |SELECT k, n_types, covered, tot.total,
        |  CAST(covered AS DOUBLE) / CAST(tot.total AS DOUBLE) AS coverage
        |FROM agg, tot""".stripMargin,
    // q398: digest equality reduces to text equality (md5 injective in
    // practice on both engines); full-outer census per stratum
    "q398_snapshot_diff" ->
      """WITH oldd AS (SELECT doc_id, source, text FROM documents),
        |newd AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL SELECT doc_id + 100000, source, text
        |  FROM documents WHERE doc_id % 13 = 0),
        |j AS (SELECT coalesce(n.source, o.source) AS stratum,
        |    o.text AS t_old, n.text AS t_new
        |  FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id)
        |SELECT stratum,
        |  CAST(sum(CASE WHEN t_old IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_old,
        |  CAST(sum(CASE WHEN t_new IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN t_old IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_added,
        |  CAST(sum(CASE WHEN t_new IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_removed,
        |  CAST(sum(CASE WHEN t_old IS NOT NULL AND t_new IS NOT NULL
        |    AND t_old <> t_new THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(sum(CASE WHEN t_old IS NOT NULL AND t_old = t_new
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM j GROUP BY stratum""".stripMargin,
    // q399: q348's walk with the harmonic factor; c(k) folds 1/i in
    // ascending i order via list_reduce over range (never a window sum
    // of doubles); the 0+x1=x1 seedless-fold identity applies
    "q399_fdr_by" ->
      """WITH e AS (SELECT event_type,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1
        |      ELSE 0 END AS a,
        |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT event_type AS test, CAST(sum(a) AS BIGINT) AS na,
        |    CAST(sum(1 - a) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS BIGINT) AS sb
        |  FROM e GROUP BY 1),
        |zz AS (SELECT test,
        |    (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
        |     - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
        |    / sqrt(CAST(sa + sb AS DOUBLE) / CAST(na + nb AS DOUBLE)
        |      * (1.0 - CAST(sa + sb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |      * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))
        |      AS z
        |  FROM g),
        |za AS (SELECT test, abs(z) / 1.4142135623730951 AS x FROM zz),
        |pv AS (SELECT test,
        |    (1.0 / (1.0 + 0.5 * abs(x))) * exp(-x * x - 1.26551223
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (1.00002368
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (0.37409196
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (0.09678418
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (-0.18628806
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (0.27886807
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (-1.13520398
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (1.48851587
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * (-0.82215223
        |    + (1.0 / (1.0 + 0.5 * abs(x))) * 0.17087277))))))))) AS p
        |  FROM za),
        |rk AS (SELECT test, p,
        |    CAST(row_number() OVER (ORDER BY p, test) AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS k FROM pv),
        |ck AS (SELECT *, list_reduce(list_transform(range(1, k + 1),
        |    i -> 1.0 / CAST(i AS DOUBLE)), (acc, x) -> acc + x) AS c_k
        |  FROM rk),
        |q AS (SELECT test, p, rank, k, c_k,
        |    least(min(p * CAST(k AS DOUBLE) * c_k / CAST(rank AS DOUBLE))
        |      OVER (ORDER BY rank DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      1.0) AS q_value
        |  FROM ck)
        |SELECT test AS event_type,
        |  CAST(round(CAST(CAST(p AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS p,
        |  rank, k,
        |  CAST(round(CAST(CAST(c_k AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS c_k,
        |  CAST(round(CAST(CAST(q_value AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS q_value,
        |  q_value <= 0.05 AS reject
        |FROM q""".stripMargin,
    // q400: 2J via the DENSE (group x value) double-cumulative (a
    // sparse census would drop C_g(<v) terms at values g never hit);
    // dow parity per q290 (DuckDB dayofweek+1 = Spark dayofweek)
    "q400_jonckheere" ->
      """WITH s AS (SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT)
        |    AS g, CAST(round(value * 100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL),
        |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n FROM s
        |  GROUP BY 1, 2),
        |grid AS (SELECT gg.g, vv.v, coalesce(c.n, 0) AS n
        |  FROM (SELECT DISTINCT g FROM c) gg
        |  CROSS JOIN (SELECT DISTINCT v FROM c) vv
        |  LEFT JOIN c USING (g, v)),
        |w AS (SELECT g, v, n,
        |    coalesce(sum(n) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM grid),
        |x AS (SELECT g, v, n,
        |    coalesce(sum(cb) OVER (PARTITION BY v ORDER BY g
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a,
        |    coalesce(sum(n) OVER (PARTITION BY v ORDER BY g
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
        |  FROM w),
        |j AS (SELECT sum(CAST(n AS HUGEINT) *
        |    (2 * CAST(a AS HUGEINT) + b)) AS j2 FROM x),
        |sz AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    sum(CAST(ng AS HUGEINT) * ng) AS sq2,
        |    sum(CAST(ng AS HUGEINT) * ng * (2 * CAST(ng AS HUGEINT) + 3))
        |      AS sq3
        |  FROM (SELECT g, CAST(sum(n) AS BIGINT) AS ng FROM c GROUP BY g))
        |SELECT sz.n, sz.k_groups, CAST(j.j2 AS BIGINT) AS j2,
        |  CAST((CAST(sz.n AS HUGEINT) * sz.n - sz.sq2) / 2 AS BIGINT)
        |    AS e2,
        |  CAST(round(CAST(CAST(
        |    CAST(CAST(sz.n AS HUGEINT) * sz.n * (2 * CAST(sz.n AS HUGEINT)
        |      + 3) - sz.sq3 AS DOUBLE) / 72.0
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS var_j,
        |  CASE WHEN CAST(CAST(sz.n AS HUGEINT) * sz.n *
        |      (2 * CAST(sz.n AS HUGEINT) + 3) - sz.sq3 AS DOUBLE) / 72.0
        |      > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(j.j2 - (CAST(sz.n AS HUGEINT) * sz.n - sz.sq2) / 2
        |        AS DOUBLE)
        |      / (2.0 * sqrt(CAST(CAST(sz.n AS HUGEINT) * sz.n *
        |        (2 * CAST(sz.n AS HUGEINT) + 3) - sz.sq3 AS DOUBLE)
        |        / 72.0))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS z
        |FROM j, sz""".stripMargin,
    // q401: saturation identity (nProbe = nCells) makes the IVF path
    // exactly the brute-force argmax this oracle computes; the q127
    // cosine replay, ties to the smaller corpus id
    "q401_semantic_decontam" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |j AS (SELECT a.vec_id AS eval_id, b.vec_id AS corpus_id,
        |    list_aggregate(list_transform(list_zip(a.v, b.v),
        |      x -> x[1] * x[2]), 'sum') /
        |    (sqrt(list_aggregate(list_transform(a.v, x -> x * x), 'sum'))
        |     * sqrt(list_aggregate(list_transform(b.v, x -> x * x),
        |       'sum'))) AS cos
        |  FROM e a, e b WHERE a.vec_id < 20 AND b.vec_id >= 20),
        |r AS (SELECT eval_id, corpus_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY eval_id
        |      ORDER BY cos DESC, corpus_id) AS rnk FROM j)
        |SELECT eval_id, corpus_id AS nearest_train_id,
        |  CAST(round(CAST(CAST(cos AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS max_cos,
        |  cos >= 0.8 AS contaminated
        |FROM r WHERE rnk = 1""".stripMargin,
    // q402: T and Var from exact HUGEINT moments, each a fixed shape of
    // single divisions (the q332 discipline); dow parity per q290
    "q402_cochran_armitage" ->
      """WITH s AS (SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT)
        |    AS g, CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |c AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(y) AS BIGINT) AS rg FROM s GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
        |    CAST(sum(ng) AS BIGINT) AS n, CAST(sum(rg) AS BIGINT) AS r,
        |    sum(CAST(g AS HUGEINT) * rg) AS sr,
        |    sum(CAST(g AS HUGEINT) * ng) AS sn,
        |    sum(CAST(g AS HUGEINT) * g * ng) AS sn2
        |  FROM c)
        |SELECT n, k_groups, r AS n_success,
        |  CAST(round(CAST(CAST(
        |    CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(r AS DOUBLE)
        |      / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS t,
        |  CAST(round(CAST(CAST(
        |    (CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(sn2 AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS var_t,
        |  CASE WHEN (CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sn2 AS DOUBLE) - CAST(sn AS DOUBLE)
        |        * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)) > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      (CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(r AS DOUBLE)
        |        / CAST(n AS DOUBLE))
        |      / sqrt((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(sn2 AS DOUBLE) - CAST(sn AS DOUBLE)
        |          * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS z
        |FROM a""".stripMargin,
    // q403: within-block ranks over the mean census with the pinned
    // (mean, treatment) tie order; coefficients are the DENSE RANK of
    // the treatment label (the E/Var closed forms hold for 1..k only);
    // E/Var closed forms in one shape
    "q403_page_trend" ->
      """WITH s AS (SELECT event_type AS b,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS j,
        |    CAST(round(value * 100) AS BIGINT) AS x FROM events
        |  WHERE value IS NOT NULL),
        |c AS (SELECT b, j,
        |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
        |  FROM s GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT j) AS BIGINT) AS k FROM c),
        |bl AS (SELECT b, CAST(count(*) AS BIGINT) AS nj FROM c GROUP BY 1),
        |comp AS (SELECT b, nj = kk.k AS ok FROM bl, kk),
        |dr AS (SELECT CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_blocks_dropped FROM comp),
        |jr AS (SELECT j, CAST(row_number() OVER (ORDER BY j) AS BIGINT)
        |    AS jrk FROM (SELECT DISTINCT j FROM c)),
        |r AS (SELECT c.b, c.j,
        |    CAST(row_number() OVER (PARTITION BY c.b ORDER BY c.m, c.j)
        |      AS BIGINT) AS r
        |  FROM c JOIN comp ON c.b = comp.b AND comp.ok),
        |la AS (SELECT CAST(sum(jr.jrk * r.r) AS BIGINT) AS l,
        |    CAST(count(DISTINCT r.b) AS BIGINT) AS n_blocks
        |  FROM r JOIN jr ON r.j = jr.j)
        |SELECT la.n_blocks, dr.n_blocks_dropped, kk.k, la.l,
        |  CAST(round(CAST(CAST(
        |    CAST(la.n_blocks AS DOUBLE) * kk.k * (kk.k + 1.0) * (kk.k + 1.0)
        |      / 4.0 AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS e_l,
        |  CAST(round(CAST(CAST(
        |    CAST(la.n_blocks AS DOUBLE) * kk.k * kk.k * (kk.k + 1.0)
        |      * (kk.k * kk.k - 1.0) / 144.0
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS var_l,
        |  CASE WHEN CAST(la.n_blocks AS DOUBLE) * kk.k * kk.k * (kk.k + 1.0)
        |      * (kk.k * kk.k - 1.0) / 144.0 > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      (CAST(la.l AS DOUBLE) - CAST(la.n_blocks AS DOUBLE) * kk.k
        |        * (kk.k + 1.0) * (kk.k + 1.0) / 4.0)
        |      / sqrt(CAST(la.n_blocks AS DOUBLE) * kk.k * kk.k
        |        * (kk.k + 1.0) * (kk.k * kk.k - 1.0) / 144.0)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS z
        |FROM la, dr, kk""".stripMargin,
    // q404: per-stratum ratio terms fold in stratum order (q237
    // contract) via seedless list_reduce (0+t1 = t1); the chi2 p rides
    // the q348 erfc polynomial with x = sqrt(chi2/2)
    "q404_mantel_haenszel" -> {
      def erfcSql(x: String) = {
        val t = s"(1.0 / (1.0 + 0.5 * abs($x)))"
        s"$t * exp(-($x) * ($x) - 1.26551223 + $t * (1.00002368 + " +
          s"$t * (0.37409196 + $t * (0.09678418 + $t * (-0.18628806 + " +
          s"$t * (0.27886807 + $t * (-1.13520398 + $t * (1.48851587 + " +
          s"$t * (-0.82215223 + $t * 0.17087277)))))))))"
      }
      val nI = "CAST(e.a + e.b + e.cc + e.d AS DOUBLE)"
      def fold(term: String) =
        s"list_reduce(list_transform(l, e -> $term), (x, y) -> x + y)"
      val numT = s"CASE WHEN e.a + e.b + e.cc + e.d > 0 THEN " +
        s"CAST(e.a AS DOUBLE) * CAST(e.d AS DOUBLE) / ($nI) ELSE 0.0 END"
      val denT = s"CASE WHEN e.a + e.b + e.cc + e.d > 0 THEN " +
        s"CAST(e.b AS DOUBLE) * CAST(e.cc AS DOUBLE) / ($nI) ELSE 0.0 END"
      val eT = s"CASE WHEN e.a + e.b + e.cc + e.d > 0 THEN " +
        s"CAST(e.a + e.b AS DOUBLE) * CAST(e.a + e.cc AS DOUBLE) / ($nI)" +
        s" ELSE 0.0 END"
      val vT = s"CASE WHEN e.a + e.b + e.cc + e.d > 1 THEN " +
        s"CAST(e.a + e.b AS DOUBLE) * CAST(e.cc + e.d AS DOUBLE) * " +
        s"CAST(e.a + e.cc AS DOUBLE) * CAST(e.b + e.d AS DOUBLE) / " +
        s"(($nI) * ($nI) * CAST(e.a + e.b + e.cc + e.d - 1 AS DOUBLE)) " +
        s"ELSE 0.0 END"
      val chi2 = "greatest(abs(CAST(sum_a AS DOUBLE) - ev) - 0.5, 0.0) * " +
        "greatest(abs(CAST(sum_a AS DOUBLE) - ev) - 0.5, 0.0) / vv"
      s"""WITH s AS (SELECT event_type AS st,
         |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1
         |      ELSE 0 END AS e,
         |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y FROM events),
         |c AS (SELECT st,
         |    CAST(sum(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cc,
         |    CAST(sum(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM s GROUP BY 1),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
         |    CAST(sum(a + b + cc + d) AS BIGINT) AS n,
         |    CAST(sum(a) AS BIGINT) AS sum_a,
         |    list(struct_pack(a := a, b := b, cc := cc, d := d)
         |      ORDER BY st) AS l
         |  FROM c),
         |g AS (SELECT n_strata, n, sum_a,
         |    ${fold(numT)} AS num, ${fold(denT)} AS den,
         |    ${fold(eT)} AS ev, ${fold(vT)} AS vv
         |  FROM f)
         |SELECT n_strata, n,
         |  CASE WHEN den > 0.0 THEN CAST(round(CAST(CAST(num / den
         |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS or_mh,
         |  CASE WHEN vv > 0.0 THEN CAST(round(CAST(CAST($chi2
         |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS chi2,
         |  CASE WHEN vv > 0.0 THEN CAST(round(CAST(CAST(
         |    ${erfcSql(s"sqrt(($chi2) / 2.0)")}
         |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS p
         |FROM g""".stripMargin
    },
    // q405: five exact HUGEINT moments, CCC one fixed shape (the n²
    // scaling of cov/var/gap cancels); token count per the q84 pairing
    "q405_lin_ccc" ->
      """WITH d AS (SELECT source,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END
        |      AS BIGINT) AS x,
        |    CAST(floor(strlen(text) / 5) AS BIGINT) AS y
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM d GROUP BY 1)
        |SELECT source, n,
        |  CAST(round(CAST(CAST(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_a,
        |  CAST(round(CAST(CAST(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_b,
        |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
        |      + CAST(n * syy - sy * sy AS DOUBLE)
        |      + CAST((sx - sy) * (sx - sy) AS DOUBLE) > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      2.0 * CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (CAST(n * sxx - sx * sx AS DOUBLE)
        |        + CAST(n * syy - sy * sy AS DOUBLE)
        |        + CAST((sx - sy) * (sx - sy) AS DOUBLE))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS ccc
        |FROM g""".stripMargin,
    // q406: q404's census + stratum-ordered psi folds; per-stratum
    // expected cell is one pinned quadratic (libm sqrt parity); the
    // three cross-stratum sums fold in stratum order via seedless
    // list_reduce (0 + t1 = t1)
    "q406_breslow_day" -> {
      val nI = "CAST(e.a + e.b + e.cc + e.d AS DOUBLE)"
      def fold(term: String) =
        s"list_reduce(list_transform(l, e -> $term), (x, y) -> x + y)"
      val numT = s"CASE WHEN e.a + e.b + e.cc + e.d > 0 THEN " +
        s"CAST(e.a AS DOUBLE) * CAST(e.d AS DOUBLE) / ($nI) ELSE 0.0 END"
      val denT = s"CASE WHEN e.a + e.b + e.cc + e.d > 0 THEN " +
        s"CAST(e.b AS DOUBLE) * CAST(e.cc AS DOUBLE) / ($nI) ELSE 0.0 END"
      def tfold(term: String) =
        s"list_reduce(list_transform(tl, e -> e.$term), (x, y) -> x + y)"
      s"""WITH s AS (SELECT event_type AS st,
         |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1
         |      ELSE 0 END AS e,
         |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y FROM events),
         |c AS (SELECT st,
         |    CAST(sum(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cc,
         |    CAST(sum(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM s GROUP BY 1),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
         |    list(struct_pack(a := a, b := b, cc := cc, d := d)
         |      ORDER BY st) AS l
         |  FROM c),
         |p AS (SELECT n_strata,
         |    CASE WHEN ${fold(denT)} > 0.0
         |      THEN ${fold(numT)} / ${fold(denT)} END AS psi FROM f),
         |t0 AS (SELECT c.st, p.n_strata, p.psi,
         |    CAST(c.a + c.b AS DOUBLE) AS n1, CAST(c.cc + c.d AS DOUBLE) AS n2,
         |    CAST(c.a + c.cc AS DOUBLE) AS m1, CAST(c.b + c.d AS DOUBLE) AS m2,
         |    CAST(c.a AS DOUBLE) AS ad
         |  FROM c, p),
         |t1 AS (SELECT *, psi - 1.0 AS qa,
         |    -(psi * (n1 + m1) + (n2 - m1)) AS qb,
         |    psi * n1 * m1 AS qc,
         |    greatest(0.0, m1 - n2) AS lo, least(n1, m1) AS hi,
         |    (n1 > 0.0 AND n2 > 0.0 AND m1 > 0.0 AND m2 > 0.0) AS inf
         |  FROM t0),
         |t2 AS (SELECT *,
         |    sqrt(greatest(qb * qb - 4.0 * qa * qc, 0.0)) AS disc
         |  FROM t1),
         |t3 AS (SELECT *, (-qb + disc) / (2.0 * qa) AS r1,
         |    (-qb - disc) / (2.0 * qa) AS r2 FROM t2),
         |t4 AS (SELECT *, CASE WHEN abs(psi - 1.0) < 1e-12
         |      THEN n1 * m1 / (n1 + n2)
         |      ELSE CASE WHEN r2 >= lo - 1e-9 AND r2 <= hi + 1e-9
         |        THEN r2 ELSE r1 END END AS att
         |  FROM t3),
         |t5 AS (SELECT *, 1.0 / (1.0 / att + 1.0 / (n1 - att)
         |    + 1.0 / (m1 - att) + 1.0 / (n2 - m1 + att)) AS vaa FROM t4),
         |terms AS (SELECT st, n_strata, psi,
         |    CASE WHEN inf THEN 1 ELSE 0 END AS infn,
         |    CASE WHEN inf AND psi IS NOT NULL
         |      THEN (ad - att) * (ad - att) / vaa ELSE 0.0 END AS t_chi,
         |    CASE WHEN inf AND psi IS NOT NULL
         |      THEN ad - att ELSE 0.0 END AS t_dev,
         |    CASE WHEN inf AND psi IS NOT NULL
         |      THEN vaa ELSE 0.0 END AS t_var
         |  FROM t5),
         |fin AS (SELECT n_strata, psi,
         |    CAST(sum(infn) AS BIGINT) AS n_informative,
         |    list(struct_pack(t_chi := t_chi, t_dev := t_dev,
         |      t_var := t_var) ORDER BY st) AS tl
         |  FROM terms GROUP BY 1, 2),
         |g AS (SELECT n_strata, psi, n_informative,
         |    ${tfold("t_chi")} AS chi, ${tfold("t_dev")} AS dev,
         |    ${tfold("t_var")} AS vv FROM fin)
         |SELECT n_strata, n_informative,
         |  CAST(round(CAST(CAST(psi AS VARCHAR) AS DECIMAL(38,20)), 6)
         |    AS DOUBLE) AS psi,
         |  CASE WHEN psi IS NOT NULL AND n_informative >= 2 THEN
         |    CAST(round(CAST(CAST(chi AS VARCHAR) AS DECIMAL(38,20)), 6)
         |      AS DOUBLE) END AS chi2_bd,
         |  CASE WHEN psi IS NOT NULL AND n_informative >= 2
         |      AND vv > 0.0 THEN
         |    CAST(round(CAST(CAST(chi - dev * dev / vv AS VARCHAR)
         |      AS DECIMAL(38,20)), 6) AS DOUBLE) END AS chi2_tarone,
         |  CASE WHEN psi IS NOT NULL AND n_informative >= 2
         |    THEN CAST(n_informative - 1 AS BIGINT) END AS df
         |FROM g""".stripMargin
    },
    // q407: the q310 Friedman replay + two pinned divisions (W, rho_bar)
    // off the RAW chi2 (rounding only at the output edge)
    "q407_kendall_w" ->
      """WITH cell AS (SELECT user_id AS b, event_type AS tr,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT tr) AS BIGINT) AS k FROM cell),
        |comp AS (SELECT b FROM cell GROUP BY b
        |  HAVING count(*) = (SELECT k FROM kk)),
        |inb AS (SELECT cell.* FROM cell JOIN comp USING (b)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks FROM comp),
        |tied AS (SELECT b, v, CAST(count(*) AS BIGINT) AS t
        |  FROM inb GROUP BY 1, 2),
        |r AS (SELECT b, v, 2 * COALESCE(SUM(t) OVER (PARTITION BY b
        |      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) + t + 1 AS r2
        |  FROM tied),
        |rk AS (SELECT inb.tr, r.r2 FROM inb JOIN r
        |  ON inb.b = r.b AND inb.v = r.v),
        |pt AS (SELECT tr, CAST(sum(r2) AS HUGEINT) AS r2j
        |  FROM rk GROUP BY 1),
        |a2 AS (SELECT sum(CAST(r2 AS HUGEINT) * r2) AS a2 FROM rk),
        |sn AS (SELECT sum((r2j - nn.n_blocks * (kk.k + 1))
        |    * (r2j - nn.n_blocks * (kk.k + 1))) AS snum
        |  FROM pt CROSS JOIN kk CROSS JOIN nn),
        |x AS (SELECT kk.k, nn.n_blocks,
        |    CASE WHEN a2.a2 <> CAST(nn.n_blocks AS HUGEINT) * kk.k
        |        * (kk.k + 1) * (kk.k + 1) THEN
        |      CAST((kk.k - 1) * sn.snum AS DOUBLE) /
        |      CAST(a2.a2 - CAST(nn.n_blocks AS HUGEINT) * kk.k
        |        * (kk.k + 1) * (kk.k + 1) AS DOUBLE) END AS chi2
        |  FROM kk CROSS JOIN nn CROSS JOIN a2 CROSS JOIN sn),
        |y AS (SELECT k, n_blocks, chi2,
        |    chi2 / (CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))
        |      AS w FROM x)
        |SELECT k, n_blocks,
        |  CAST(round(CAST(CAST(chi2 AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS chi2,
        |  CAST(round(CAST(CAST(w AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS w,
        |  CASE WHEN n_blocks > 1 THEN
        |    CAST(round(CAST(CAST(
        |      (CAST(n_blocks AS DOUBLE) * w - 1.0)
        |        / (CAST(n_blocks AS DOUBLE) - 1.0)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS rho_bar
        |FROM y""".stripMargin,
    // q408: the q227 base graph; each round's per-edge support is the
    // undirected wedge join (common-neighbor count — values equal the
    // Spark orientation-intersection by construction); 12 unrolled
    // rounds, extra rounds no-ops at the fixpoint; all-integer output
    "q408_ktruss" -> {
      val base =
        """WITH pts AS MATERIALIZED (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
          |op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem JOIN pts ON l_partkey = p_partkey),
          |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
          |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
          |r0 AS MATERIALIZED (SELECT u AS p, v AS x FROM e0 UNION ALL SELECT v, u FROM e0)""".stripMargin
      val rounds = (1 to 12).map { i =>
        s""",
           |s$i AS MATERIALIZED (SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS sup
           |  FROM e${i - 1} e JOIN r${i - 1} a1 ON a1.p = e.u
           |    JOIN r${i - 1} a2 ON a2.p = e.v AND a2.x = a1.x
           |  GROUP BY e.u, e.v),
           |e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
           |  LEFT JOIN s$i s ON s.u = e.u AND s.v = e.v
           |  WHERE COALESCE(s.sup, 0) >= 1),
           |r$i AS MATERIALIZED (SELECT u AS p, v AS x FROM e$i
           |  UNION ALL SELECT v, u FROM e$i)""".stripMargin
      }.mkString
      base + rounds +
        """
          |,sf AS MATERIALIZED (SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS sup
          |  FROM e12 e JOIN r12 a1 ON a1.p = e.u
          |    JOIN r12 a2 ON a2.p = e.v AND a2.x = a1.x
          |  GROUP BY e.u, e.v)
          |SELECT e.u, e.v, CAST(COALESCE(s.sup, 0) AS BIGINT) AS sup
          |FROM e12 e LEFT JOIN sf s ON s.u = e.u AND s.v = e.v""".stripMargin
    },
    // q409: HUGEINT moments; each ratio one pinned division; Sharpe/
    // Sortino cancel the 1/n's so each is one division + one sqrt of
    // exact integers cast to double
    "q409_trade_stats" ->
      """WITH t AS (SELECT event_type AS scope,
        |    CAST(round(value * 100) AS BIGINT) - 5000 AS p FROM events
        |  WHERE value IS NOT NULL),
        |g AS (SELECT scope, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_wins,
        |    CAST(sum(CASE WHEN p < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_losses,
        |    CAST(sum(p) AS HUGEINT) AS s,
        |    sum(CAST(p AS HUGEINT) * p) AS q,
        |    CAST(sum(CASE WHEN p > 0 THEN p ELSE 0 END) AS HUGEINT) AS gw,
        |    CAST(sum(CASE WHEN p < 0 THEN -p ELSE 0 END) AS HUGEINT) AS gl,
        |    sum(CASE WHEN p < 0 THEN CAST(p AS HUGEINT) * p
        |      ELSE CAST(0 AS HUGEINT) END) AS dq
        |  FROM t GROUP BY 1),
        |x AS (SELECT *,
        |    CAST(n_wins AS DOUBLE) / CAST(n AS DOUBLE) AS wr,
        |    (CAST(gw AS DOUBLE) / CAST(n_wins AS DOUBLE))
        |      / (CAST(gl AS DOUBLE) / CAST(n_losses AS DOUBLE)) AS po
        |  FROM g)
        |SELECT scope AS event_type, n, n_wins, n_losses,
        |  CAST(round(CAST(CAST(wr AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS win_rate,
        |  CAST(round(CAST(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |    AS expectancy_cents,
        |  CASE WHEN gl > 0 THEN CAST(round(CAST(CAST(
        |    CAST(gw AS DOUBLE) / CAST(gl AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END
        |    AS profit_factor,
        |  CASE WHEN n_wins > 0 AND n_losses > 0 AND gl > 0 THEN
        |    CAST(round(CAST(CAST(po AS VARCHAR) AS DECIMAL(38,20)), 6)
        |      AS DOUBLE) END AS payoff,
        |  CASE WHEN n_wins > 0 AND n_losses > 0 AND gl > 0 THEN
        |    CAST(round(CAST(CAST(wr - (1.0 - wr) / po
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS kelly,
        |  CASE WHEN CAST(n * q - s * s AS DOUBLE) > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(s AS DOUBLE) / sqrt(CAST(n * q - s * s AS DOUBLE))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS sharpe,
        |  CASE WHEN n_losses > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(s AS DOUBLE) / sqrt(CAST(n * dq AS DOUBLE))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS sortino
        |FROM x""".stripMargin,
    // q410: closed-form integer block boundaries off one min/max
    // census; each row classifies against all k folds (k constant);
    // all-integer output, no float surface
    "q410_purged_folds" ->
      """WITH e AS (SELECT epoch_ms(ts) AS ms FROM events
        |  WHERE ts IS NOT NULL),
        |b AS (SELECT min(ms) AS lo, max(ms) AS hi FROM e),
        |f AS (SELECT CAST(range AS BIGINT) AS fold FROM range(5)),
        |t AS (SELECT e.ms, b.lo,
        |    CAST((b.hi - b.lo) // 5 + 1 AS BIGINT) AS w, f.fold
        |  FROM e, b, f),
        |r AS (SELECT fold,
        |    CAST(lo + fold * w AS BIGINT) AS test_lo_ms,
        |    CAST(lo + fold * w + w AS BIGINT) AS test_hi_ms,
        |    CASE WHEN ms >= lo + fold * w AND ms < lo + fold * w + w
        |        THEN 'test'
        |      WHEN ms >= lo + fold * w - 86400000
        |        AND ms < lo + fold * w + w + 86400000 THEN 'purged'
        |      ELSE 'train' END AS role
        |  FROM t)
        |SELECT fold, test_lo_ms, test_hi_ms,
        |  CAST(sum(CASE WHEN role = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_test,
        |  CAST(sum(CASE WHEN role = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_train,
        |  CAST(sum(CASE WHEN role = 'purged' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purged
        |FROM r GROUP BY 1, 2, 3""".stripMargin,
    // q411: the exact ACF integer identity per autocovariance block;
    // Bartlett weights are the same IEEE scalar arithmetic on both
    // engines; DM = S·n/sqrt(n·C0 + 2w1·C1 + 2w2·C2) one fixed shape
    "q411_diebold_mariano" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |lg AS (SELECT event_type, day, c,
        |    lag(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
        |    lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7
        |  FROM daily),
        |p AS (SELECT event_type, day,
        |    abs(c - l1) - abs(c - l7) AS d FROM lg
        |  WHERE l7 IS NOT NULL
        |    AND abs(c - l1) - abs(c - l7) IS NOT NULL),
        |lgd AS (SELECT event_type, d,
        |    lag(d, 1) OVER (PARTITION BY event_type ORDER BY day) AS dl1,
        |    lag(d, 2) OVER (PARTITION BY event_type ORDER BY day) AS dl2
        |  FROM p),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(d) AS HUGEINT) AS s,
        |    sum(CAST(d AS HUGEINT) * d) AS q,
        |    sum(CASE WHEN dl1 IS NOT NULL THEN CAST(d AS HUGEINT) * dl1
        |      ELSE CAST(0 AS HUGEINT) END) AS x1,
        |    sum(CASE WHEN dl1 IS NOT NULL THEN CAST(dl1 AS HUGEINT)
        |      ELSE CAST(0 AS HUGEINT) END) AS hd1,
        |    sum(CASE WHEN dl1 IS NOT NULL THEN CAST(d AS HUGEINT)
        |      ELSE CAST(0 AS HUGEINT) END) AS tl1,
        |    sum(CASE WHEN dl2 IS NOT NULL THEN CAST(d AS HUGEINT) * dl2
        |      ELSE CAST(0 AS HUGEINT) END) AS x2,
        |    sum(CASE WHEN dl2 IS NOT NULL THEN CAST(dl2 AS HUGEINT)
        |      ELSE CAST(0 AS HUGEINT) END) AS hd2,
        |    sum(CASE WHEN dl2 IS NOT NULL THEN CAST(d AS HUGEINT)
        |      ELSE CAST(0 AS HUGEINT) END) AS tl2
        |  FROM lgd GROUP BY 1),
        |v AS (SELECT event_type, n, s,
        |    CAST(n * (n * q - s * s) AS DOUBLE)
        |    + 2.0 * (1.0 - 1.0 / 3.0) * CAST(n * n * x1
        |      - n * s * (hd1 + tl1) + (n - 1) * s * s AS DOUBLE)
        |    + 2.0 * (1.0 - 2.0 / 3.0) * CAST(n * n * x2
        |      - n * s * (hd2 + tl2) + (n - 2) * s * s AS DOUBLE)
        |      AS vt
        |  FROM g)
        |SELECT event_type, n,
        |  CAST(round(CAST(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_d,
        |  CASE WHEN n > 3 AND vt > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(s AS DOUBLE) * CAST(n AS DOUBLE) / sqrt(vt)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS dm
        |FROM v""".stripMargin,
    // q412: nine HUGEINT moments; each r one pinned division under a
    // sqrt of a product; the partial compose is a fixed float shape
    "q412_partial_corr" ->
      """WITH t AS (SELECT event_type AS scope,
        |    CAST(round(value * 100) AS BIGINT) AS x,
        |    CAST(date_part('hour', ts) AS BIGINT) AS y,
        |    CAST(date_part('day', ts) AS BIGINT) AS z
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT scope, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(z) AS HUGEINT) AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(z AS HUGEINT) * z) AS szz,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM t GROUP BY 1),
        |r AS (SELECT scope, n,
        |    CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
        |      AND CAST(n * syy - sy * sy AS DOUBLE) > 0.0 THEN
        |      CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |        * CAST(n * syy - sy * sy AS DOUBLE)) END AS rxy,
        |    CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
        |      AND CAST(n * szz - sz * sz AS DOUBLE) > 0.0 THEN
        |      CAST(n * sxz - sx * sz AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |        * CAST(n * szz - sz * sz AS DOUBLE)) END AS rxz,
        |    CASE WHEN CAST(n * syy - sy * sy AS DOUBLE) > 0.0
        |      AND CAST(n * szz - sz * sz AS DOUBLE) > 0.0 THEN
        |      CAST(n * syz - sy * sz AS DOUBLE)
        |      / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
        |        * CAST(n * szz - sz * sz AS DOUBLE)) END AS ryz
        |  FROM g)
        |SELECT scope AS event_type, n,
        |  CAST(round(CAST(CAST(rxy AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS r_xy,
        |  CAST(round(CAST(CAST(rxz AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS r_xz,
        |  CAST(round(CAST(CAST(ryz AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS r_yz,
        |  CASE WHEN (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0.0 THEN
        |    CAST(round(CAST(CAST(
        |      (rxy - rxz * ryz)
        |      / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS pcorr
        |FROM r""".stripMargin,
    // q413: global moments = decimal sums OF the group census; the
    // without-g slope is the groupedOls covN/varXN shape on subtracted
    // moments — zero per-group rescans on either engine
    "q413_logo_influence" ->
      """WITH b AS (SELECT CAST(date_part('month', l_shipdate) AS BIGINT)
        |      AS g,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |c AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS HUGEINT) AS tn,
        |    CAST(sum(sx) AS HUGEINT) AS tsx,
        |    CAST(sum(sy) AS HUGEINT) AS tsy,
        |    CAST(sum(sxx) AS HUGEINT) AS tsxx,
        |    CAST(sum(sxy) AS HUGEINT) AS tsxy FROM c),
        |s AS (SELECT c.g, c.n,
        |    CASE WHEN CAST(t.tn * t.tsxx - t.tsx * t.tsx AS DOUBLE) > 0.0
        |      THEN CAST(t.tn * t.tsxy - t.tsx * t.tsy AS DOUBLE)
        |        / CAST(t.tn * t.tsxx - t.tsx * t.tsx AS DOUBLE) END
        |      AS sf,
        |    CASE WHEN CAST((t.tn - c.n) * (t.tsxx - c.sxx)
        |        - (t.tsx - c.sx) * (t.tsx - c.sx) AS DOUBLE) > 0.0
        |      THEN CAST((t.tn - c.n) * (t.tsxy - c.sxy)
        |          - (t.tsx - c.sx) * (t.tsy - c.sy) AS DOUBLE)
        |        / CAST((t.tn - c.n) * (t.tsxx - c.sxx)
        |          - (t.tsx - c.sx) * (t.tsx - c.sx) AS DOUBLE) END
        |      AS sw
        |  FROM c, t)
        |SELECT g AS ship_month, n AS n_group,
        |  CAST(round(CAST(CAST(sf AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS slope_full,
        |  CAST(round(CAST(CAST(sw AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS slope_without,
        |  CAST(round(CAST(CAST(sw - sf AS VARCHAR) AS DECIMAL(38,20)), 6)
        |    AS DOUBLE) AS delta
        |FROM s""".stripMargin,
    // q414: token census squares exactly like q397's tokens; K is one
    // division of exact integers — no float fold at all
    "q414_yule_k" ->
      """WITH t AS (SELECT source, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS tok FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    sum(CAST(c AS HUGEINT) * c) AS m2
        |  FROM c GROUP BY 1)
        |SELECT source, n_tokens, n_types,
        |  CASE WHEN n_tokens > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(10000 * (m2 - n_tokens) AS DOUBLE)
        |      / CAST(CAST(n_tokens AS HUGEINT) * n_tokens AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) END AS yule_k
        |FROM g""".stripMargin,
    // q254: pfx is non-decreasing in i, so MAX(i)/MAX(pfx) FILTER(fits)
    // pick the same cut row; every +1 seat provably lands on a source
    // with avail >= level+1 (else the base would have included it)
    "q254_water_fill" ->
      """WITH av AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS avail
        |  FROM documents GROUP BY 1),
        |r AS (SELECT source, avail,
        |    CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT) AS i,
        |    SUM(avail) OVER (ORDER BY avail, source ROWS UNBOUNDED PRECEDING) AS pfx,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n, SUM(avail) OVER () AS tot
        |  FROM av),
        |c AS (SELECT COALESCE(MAX(i) FILTER (WHERE pfx + avail * (n - i) <= 100000), 0) AS base,
        |    COALESCE(MAX(pfx) FILTER (WHERE pfx + avail * (n - i) <= 100000), 0) AS pbase
        |  FROM r),
        |s AS (SELECT r.*, c.base, c.pbase, r.n - c.base AS m FROM r, c)
        |SELECT source, avail,
        |  CAST(CASE WHEN tot <= 100000 THEN avail
        |    WHEN i <= base THEN avail
        |    ELSE LEAST(avail, (100000 - pbase) // m
        |      + CASE WHEN i - base <= (100000 - pbase) % m THEN 1 ELSE 0 END)
        |  END AS BIGINT) AS alloc,
        |  CAST(CASE WHEN tot <= 100000 THEN avail
        |    WHEN i <= base THEN avail
        |    ELSE LEAST(avail, (100000 - pbase) // m
        |      + CASE WHEN i - base <= (100000 - pbase) % m THEN 1 ELSE 0 END)
        |  END AS BIGINT) = avail AS at_capacity
        |FROM s""".stripMargin,
    // q253: quantized integer dim sums; HUGEINT Gram products mirror
    // Spark's exact DECIMAL; one double conversion per term at the end
    "q253_centroid_drift" ->
      """WITH e AS (SELECT label AS lbl,
        |    CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END AS b,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |c AS (SELECT lbl, dim,
        |    CAST(SUM(CASE WHEN b = 0 THEN q ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(SUM(CASE WHEN b = 1 THEN q ELSE 0 END) AS BIGINT) AS sb
        |  FROM e GROUP BY 1, 2),
        |g AS (SELECT lbl,
        |    SUM(CAST(sa AS HUGEINT) * CAST(sb AS HUGEINT)) AS ab,
        |    SUM(CAST(sa AS HUGEINT) * CAST(sa AS HUGEINT)) AS aa,
        |    SUM(CAST(sb AS HUGEINT) * CAST(sb AS HUGEINT)) AS bb
        |  FROM c GROUP BY 1),
        |n AS (SELECT label AS lbl,
        |    CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM embeddings GROUP BY 1)
        |SELECT n.lbl AS label, n.n_a, n.n_b,
        |  CASE WHEN g.aa > 0 AND g.bb > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(g.ab AS DOUBLE) / (sqrt(CAST(g.aa AS DOUBLE)) * sqrt(CAST(g.bb AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS cosine
        |FROM n JOIN g ON n.lbl = g.lbl""".stripMargin,
    // q250: q236's allocation chain + the deterministic (md5, key) draw
    "q250_stratified_sample" ->
      """WITH s AS (SELECT o_orderpriority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |st AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(c AS HUGEINT)) AS s1,
        |    SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
        |  FROM s GROUP BY o_orderpriority),
        |sd AS (SELECT o_orderpriority, n,
        |    sqrt(greatest(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / CAST(n * n AS DOUBLE), 0.0)) AS sdev
        |  FROM st),
        |w AS (SELECT *, n * sdev AS wt FROM sd),
        |t AS (SELECT CASE WHEN SUM(wt) > 0 THEN SUM(wt) ELSE 1.0 END AS tw FROM w),
        |f AS (SELECT w.*, 1000 * wt / t.tw AS exact,
        |    CAST(floor(1000 * wt / t.tw) AS BIGINT) AS base FROM w, t),
        |r AS (SELECT *, exact - base AS rem,
        |    row_number() OVER (ORDER BY exact - base DESC, o_orderpriority) AS rk,
        |    1000 - SUM(base) OVER () AS leftover FROM f),
        |al AS (SELECT o_orderpriority,
        |    base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc FROM r),
        |smp AS (SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS drk
        |  FROM orders)
        |SELECT smp.o_orderpriority, smp.o_orderkey
        |FROM smp JOIN al ON smp.o_orderpriority = al.o_orderpriority
        |WHERE smp.drk <= al.alloc""".stripMargin,
    // q251: per-side per-column profile via scalar subqueries; mode tie
    // resolves to lowest value on both engines
    "q251_profile_diff" -> {
      def side(name: String, pred: String): String = {
        val cols = Seq("event_type", "user_id", "props")
        cols.map { c =>
          s"""SELECT '$c' AS col_name,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE $pred) AS n,
             |  (SELECT CAST(COUNT(*) - COUNT($c) AS BIGINT) FROM events WHERE $pred) AS nnull,
             |  (SELECT CAST(COUNT(DISTINCT CAST($c AS VARCHAR)) AS BIGINT)
             |     FROM events WHERE $pred) AS nd,
             |  (SELECT CAST($c AS VARCHAR) FROM events WHERE $pred AND $c IS NOT NULL
             |     GROUP BY 1 ORDER BY COUNT(*) DESC, 1 LIMIT 1) AS mode""".stripMargin
        }.mkString(s"$name AS (", " UNION ALL ", ")")
      }
      s"""WITH ${side("pa", "ts < TIMESTAMP '2024-01-16 00:00:00'")},
         |${side("pb", "ts >= TIMESTAMP '2024-01-16 00:00:00'")}
         |SELECT pa.col_name, pa.n AS n_a, pb.n AS n_b,
         |  pa.nnull AS null_a, pb.nnull AS null_b,
         |  CAST(round(CAST(CAST(
         |    CAST(pb.nnull AS DOUBLE) / CAST(pb.n AS DOUBLE)
         |      - CAST(pa.nnull AS DOUBLE) / CAST(pa.n AS DOUBLE)
         |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS null_rate_delta,
         |  pa.nd AS distinct_a, pb.nd AS distinct_b,
         |  pa.mode AS mode_a, pb.mode AS mode_b,
         |  pa.mode <> pb.mode AS mode_changed
         |FROM pa JOIN pb ON pa.col_name = pb.col_name""".stripMargin
    },
    // q252: lead-window integer durations; one terminal division
    "q252_twap" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) AS ms, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT event_type, cents,
        |    lead(ms) OVER (PARTITION BY event_type ORDER BY ms, event_id) - ms AS w
        |  FROM e),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(w) AS BIGINT) AS total_ms,
        |    CAST(SUM(cents * w) AS BIGINT) AS vw
        |  FROM d GROUP BY 1)
        |SELECT event_type, n_obs, total_ms,
        |  CASE WHEN total_ms > 0 THEN
        |    CAST(round(CAST(CAST(CAST(vw AS DOUBLE) / CAST(total_ms AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
        |  END AS twap
        |FROM g""".stripMargin,
    // q248: expected is ONE exact-int division, resid ONE subtraction —
    // the |resid| rank order is a float total order both engines share
    "q248_seasonal_anomaly" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dd,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, strftime(dd, '%Y-%m-%d') AS day,
        |    dayofweek(dd) + 1 AS dw, x FROM d),
        |c AS (SELECT event_type, dw, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS t FROM b GROUP BY 1, 2),
        |j AS (SELECT b.event_type, b.day, b.x,
        |    CAST(c.t AS DOUBLE) / CAST(c.n AS DOUBLE) AS expected
        |  FROM b JOIN c ON b.event_type = c.event_type AND b.dw = c.dw),
        |r AS (SELECT event_type, day, x, expected,
        |    CAST(x AS DOUBLE) - expected AS resid,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(CAST(x AS DOUBLE) - expected) DESC, day) AS rnk
        |  FROM j)
        |SELECT event_type, day, x AS value,
        |  CAST(round(CAST(CAST(expected AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS expected,
        |  CAST(round(CAST(CAST(resid AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS resid,
        |  CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3""".stripMargin,
    // q249: equal-frequency buckets from the census cumulative —
    // a tie-run's bucket is rows_before·B div N, never a split
    "q249_calibration" ->
      """WITH s AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS s,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1 ELSE 0 END AS p
        |  FROM events),
        |c AS (SELECT g, s, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS np FROM s GROUP BY 1, 2),
        |w AS (SELECT g, s, n, np,
        |    COALESCE(SUM(n) OVER (PARTITION BY g ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
        |    SUM(n) OVER (PARTITION BY g) AS tot FROM c),
        |a AS (SELECT g, LEAST(9, (bef * 10) // tot) AS bucket,
        |    CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(s * n) AS BIGINT) AS ss FROM w GROUP BY 1, 2)
        |SELECT g AS event_type, CAST(bucket AS BIGINT) AS bucket, n, n_pos,
        |  CAST(round(CAST(CAST(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_score,
        |  CAST(round(CAST(CAST(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS pos_rate
        |FROM a""".stripMargin,
    // q245: 4 unrolled HITS rounds; every mass is an exact integer sum
    // and every normalization the identical `//` floor (q169 pattern)
    "q245_hits" -> {
      val base =
        """WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
          |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          |edges AS (SELECT c AS src, 1000000 + s AS dst FROM pairs),
          |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
          |nn AS (SELECT COUNT(*) AS nn FROM nodes),
          |h0 AS (SELECT node, 1000000000 // nn.nn AS hf
          |FROM nodes CROSS JOIN nn)""".stripMargin
      val rounds = (1 to 4).map { i =>
        s"""ar$i AS (SELECT e.dst AS node, SUM(h.hf) AS ar
           |FROM edges e JOIN h${i - 1} h ON e.src = h.node GROUP BY e.dst),
           |at$i AS (SELECT SUM(ar) AS t FROM ar$i),
           |a$i AS (SELECT n.node,
           |CAST((COALESCE(r.ar, 0) * 1000000000) // at$i.t AS BIGINT) AS af
           |FROM nodes n CROSS JOIN at$i LEFT JOIN ar$i r ON n.node = r.node),
           |hr$i AS (SELECT e.src AS node, SUM(a.af) AS hr
           |FROM edges e JOIN a$i a ON e.dst = a.node GROUP BY e.src),
           |ht$i AS (SELECT SUM(hr) AS t FROM hr$i),
           |h$i AS (SELECT n.node,
           |CAST((COALESCE(r.hr, 0) * 1000000000) // ht$i.t AS BIGINT) AS hf
           |FROM nodes n CROSS JOIN ht$i LEFT JOIN hr$i r ON n.node = r.node)""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        """
          |SELECT h4.node,
          |CASE WHEN h4.node >= 1000000 THEN 'supplier' ELSE 'customer' END AS kind,
          |CAST(round(CAST(CAST(h4.hf / 1000000000.0 AS VARCHAR) AS DECIMAL(38,20)), 9) AS DOUBLE) AS hub,
          |CAST(round(CAST(CAST(a4.af / 1000000000.0 AS VARCHAR) AS DECIMAL(38,20)), 9) AS DOUBLE) AS auth
          |FROM h4 JOIN a4 ON h4.node = a4.node""".stripMargin
    },
    // q246: rank via bounded top-R window; pure-additive list_reduce
    // (each field reads only itself — safe under in-place aliasing);
    // the slope re-derives textually inside the intercept
    "q246_zipf" ->
      """WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM t
        |  WHERE length(tok) > 0 GROUP BY tok),
        |top AS (SELECT tok, freq FROM c ORDER BY freq DESC, tok LIMIT 30),
        |rk AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rnk
        |  FROM top),
        |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    list(struct_pack(x := ln(CAST(rnk AS DOUBLE)),
        |      y := ln(CAST(freq AS DOUBLE))) ORDER BY rnk) AS ls FROM rk),
        |f AS (SELECT n, list_reduce(list_transform(ls, e -> struct_pack(
        |    sx := e.x, sy := e.y, sxy := e.x * e.y, sxx := e.x * e.x)),
        |  (acc, e) -> struct_pack(
        |    sx := acc.sx + e.sx, sy := acc.sy + e.sy,
        |    sxy := acc.sxy + e.sxy, sxx := acc.sxx + e.sxx)) AS f
        |  FROM l)
        |SELECT n AS n_terms,
        |  CAST(round(CAST(CAST(
        |    (n * f.sxy - f.sx * f.sy) / (n * f.sxx - f.sx * f.sx)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS slope,
        |  CAST(round(CAST(CAST(
        |    (f.sy - ((n * f.sxy - f.sx * f.sy) / (n * f.sxx - f.sx * f.sx)) * f.sx)
        |      / CAST(n AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS intercept
        |FROM f""".stripMargin,
    // q247: the oracle can afford the (key × shard) unnest grid the
    // Spark HOF avoids; argmax = (digest DESC, shard ASC) row 1
    "q247_reshard" ->
      """WITH k AS (SELECT CAST(doc_id AS VARCHAR) AS ks FROM documents),
        |s16 AS (SELECT unnest(range(0, 16)) AS s), s17 AS (SELECT unnest(range(0, 17)) AS s),
        |b16 AS (SELECT ks, s FROM (SELECT k.ks, s16.s,
        |    row_number() OVER (PARTITION BY k.ks
        |      ORDER BY md5(k.ks || ':' || CAST(s16.s AS VARCHAR)) DESC, s16.s) AS rn
        |  FROM k, s16) WHERE rn = 1),
        |b17 AS (SELECT ks, s FROM (SELECT k.ks, s17.s,
        |    row_number() OVER (PARTITION BY k.ks
        |      ORDER BY md5(k.ks || ':' || CAST(s17.s AS VARCHAR)) DESC, s17.s) AS rn
        |  FROM k, s17) WHERE rn = 1),
        |m AS (SELECT ks, CAST(('0x' || substring(md5(ks), 1, 15)) AS BIGINT) AS mk
        |  FROM k)
        |SELECT CAST(b16.s AS INT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN b16.s <> b17.s THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
        |  CAST(SUM(CASE WHEN m.mk % 16 <> m.mk % 17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_mod
        |FROM b16 JOIN b17 ON b16.ks = b17.ks JOIN m ON b16.ks = m.ks
        |GROUP BY b16.s""".stripMargin,
  )
}
