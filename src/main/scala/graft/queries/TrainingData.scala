package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps
import graft.operators.{Dedup, Similarity}

/** Training-data pipeline queries over `documents` and `embeddings`:
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  * search, text analysis. Oracle-checked where DuckDB can express the
  * semantics (md5-keyed exact dedup, token stats, brute-force cosine);
  * hash-family operators (xxhash64-based) are rows-only + unit-tested.
  */
object TrainingData {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** q70 — exact dedup (hash-groupBy): keep lowest doc_id per distinct
    * normalized text; md5 digest is the shuffle key on both engines. */
  def q70ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(md5(lower(trim($"text")))).orderBy($"doc_id")
    docs(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  /** q71 — duplicate-cluster census: texts with >1 occurrence. The corpus
    * carries no natural exact dups (500/500 distinct digests at sf0.01), so
    * the fixture plants deterministic ones — every 10th doc re-appears
    * under a shifted id — making the check discriminating (a broken
    * operator can no longer pass with an empty result). */
  def q71DupClusters(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val planted = d.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 100000).as("doc_id"), $"text")
    d.unionByName(planted)
      .groupBy(md5(lower(trim($"text"))).as("text_md5"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("first_doc"))
      .where($"n_copies" > 1)
  }

  /** q72 — token statistics (text analysis): whitespace tokens, token
    * estimate, punct ratio, mean word length, aggregated per lang. One
    * tokenization pass per doc via the codegen'd [[TextStats]] kernel
    * (value-identical to the declarative TextOps, cross-check-tested). */
  def q72TokenStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($"lang", graft.functions.TextStats.textStats($"text").as("s"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"s.n_tokens").as("total_tokens"),
        sum($"s.est_bpe").as("total_est_bpe"),
        round(avg($"s.punct"), 4).as("avg_punct"),
        round(avg($"s.mwl"), 4).as("avg_word_len"))

  /** q73 — quality scoring per source (C4/Gopher-style rule blend). */
  def q73QualityScore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($"source", graft.functions.TextStats.textStats($"text").as("s"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg($"s.quality"), 4).as("avg_quality"),
        round(avg($"s.stop_ratio"), 4).as("avg_stopword_ratio"))

  /** q74 — document fingerprinting: md5 over whitespace-normalized text
    * (oracle-parity variant of TextOps.fingerprint), distinct census. */
  def q74Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("fp"))
      .agg(countDistinct($"fp").as("n_unique"), count(lit(1)).as("n_docs"))

  /** Near-dup fixture shared by q75/q85: the first 40 docs plus a mutated
    * copy of each (four tokens appended, id shifted by 1000). The corpus
    * has no natural near-dups (max pairwise 3-gram Jaccard 0.02 at
    * sf0.01), so appended-tail copies provide 40 true pairs with
    * doc-length-dependent Jaccard ~n/(n+5) — a discriminating, non-empty,
    * cross-engine-expressible result set. */
  private def nearDupFixture(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir).where($"doc_id" < 40).select($"doc_id", $"text")
    val mutated = base.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" graft near dup tail")).as("text"))
    base.unionByName(mutated)
  }

  /** q75 — n-gram Jaccard near-dup pairs (bounded): exact 3-gram Jaccard
    * >= 0.5 over the planted near-dup fixture (the verification kernel;
    * LSH variants generate candidates at scale). */
  def q75NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(nearDupFixture(spark, dir), "doc_id", "text", 3)
      .where($"jaccard" >= 0.5)
      .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))

  /** q85 — MinHash-LSH cross-engine recall check: the LSH pipeline (banded
    * xxhash64 minhash candidates + exact-Jaccard verification) over the
    * same planted fixture as q75, checked against DuckDB's exhaustive
    * exact-Jaccard pair set. Precision 1 holds by construction (candidates
    * are exact-verified); hash equality with the oracle proves recall 1 on
    * this fixture — the containment check VERDICT r1 asked for. 16 bands x
    * 2 rows: P(candidate | j=0.7) = 1-(1-0.49)^16 ~ 0.99998. */
  def q85LshRecall(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(nearDupFixture(spark, dir), "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.5)
      .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))

  /** q76 — MinHash-LSH near-dups over the FULL corpus at scale-path
    * parameters (banded xxhash64 minhash candidates, exact-Jaccard
    * verified). Oracle: DuckDB's exhaustive exact-Jaccard pair set over
    * the same corpus. Precision 1 holds by construction (candidates are
    * exact-verified); hash equality proves recall 1 on this corpus —
    * every natural near-dup pair sits at j >= 0.9, where
    * P(miss | 8 bands x 4 rows) = (1-0.9^4)^8 ~ 2e-4 per pair, and the
    * seeded hash family makes the outcome deterministic, verified at
    * sf0.001/0.01/0.1 (q85 runs the same check on a planted fixture). */
  def q76MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(docs(spark, dir), "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, threshold = 0.5)
      .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))

  /** q77 — exact-copy recall through the production SimHash path at
    * corpus scale: planted copies (every 10th doc re-appears under a
    * shifted id, the q71 grid) must ALL be surfaced by the banding join
    * — identical normalized text forces an identical fingerprint, a
    * collision in every band, and Hamming 0, structurally — and the
    * result is restricted to text-identical pairs (digest equality on
    * both engines), so natural hash-dependent near-dup pairs (q93's
    * excluded ids) never enter the comparison. DuckDB states the full
    * expected set from the digest self-join alone; a broken tokenizer,
    * fingerprint, banding join, pair orientation, or Hamming verify
    * empties or perturbs the Spark side. Hamming <= 3 near-identical
    * semantics stay covered by q93's fixture. */
  def q77Simhash(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val fixture = d.unionByName(
      d.where($"doc_id" % 10 === 0).select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val digests = fixture.select($"doc_id",
      md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("dg"))
    Dedup.simhashNearDups(fixture, "doc_id", "text", maxHamming = 3)
      .join(digests.select($"doc_id".as("id_a"), $"dg".as("dg_a")), Seq("id_a"))
      .join(digests.select($"doc_id".as("id_b"), $"dg".as("dg_b")), Seq("id_b"))
      .where($"dg_a" === $"dg_b")
      .select($"id_a", $"id_b", $"hamming")
  }

  /** q78 — language-ID heuristic + agreement with the labeled lang. */
  def q78LangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($"lang", graft.functions.TextStats.textStats($"text").getField("lang_pred").as("pred"))
      .groupBy($"lang", $"pred")
      .agg(count(lit(1)).as("cnt"))

  /** q79 — brute-force cosine top-k (similarity baseline): 5 nearest
    * corpus vectors for each of the first 5 probe vectors. */
  def q79CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probes = emb.where($"vec_id" < 5)
    Similarity.bruteForceTopK(emb, probes, "vec_id", "v", 5)
      .select($"probe_id", $"rank", $"corpus_id", round($"cos", 4).as("cos"))
  }

  /** q80 — LSH-bucketed ANN at saturated recall over a SECOND probe set
    * (vec_id 5..9; q94 covers 0..4): at 32 tables x 3 planes the union
    * of bucket probes deterministically covers every true top-5 neighbor
    * of these probes (verified at sf0.001/0.01/0.1 — seeded hyperplanes
    * make it a fixed fact of the corpus), so the ANN output must equal
    * DuckDB's brute-force top-k. Production-selectivity parameters
    * (fewer tables, more planes) stay recall-unit-tested in
    * SimilaritySpec. */
  def q80LshAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probes = emb.where($"vec_id" >= 5 && $"vec_id" < 10)
    Similarity.lshTopK(emb, probes, "vec_id", "v", k = 5, tables = 32, planes = 3)
      .select($"probe_id", $"rank", $"corpus_id", round($"cos", 4).as("cos"))
  }

  /** q82 — IVF-bucketed ANN at full probe over a SECOND cell/probe
    * configuration (nCells=16, probes 5..9; q90 runs nCells=8, probes
    * 0..4): with nProbe = nCells every cell is searched, the candidate
    * set is the whole corpus, and the result equals brute-force top-k
    * STRUCTURALLY — the oracle identity holds for any centroid layout,
    * so this checks the 16-cell assignment/join/re-rank machinery
    * cross-engine. Pruned-recall behavior (nProbe < nCells) stays
    * unit-tested in SimilaritySpec. */
  def q82IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probes = emb.where($"vec_id" >= 5 && $"vec_id" < 10)
    Similarity.ivfTopK(emb, probes, "vec_id", "v", k = 5, nCells = 16, nProbe = 16)
      .select($"probe_id", $"rank", $"corpus_id", round($"cos", 4).as("cos"))
  }

  /** q280 — product-quantization ADC top-k ([[Similarity.pqEncode]] /
    * [[Similarity.pqAdcTopK]]): 64-dim embeddings compressed to 8 codes
    * against the smallest-id 16-entry codebook, probes 0..4 ranked by
    * asymmetric distance. The EXACT PQ pipeline replays cross-engine
    * (codebook, argmin encode, table-lookup sums are all deterministic);
    * recall-vs-exact stays unit-tested in SimilaritySpec. */
  def q280PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val cb = Similarity.pqCodebookRow(emb, "vec_id", "v", ksub = 16)
    val enc = Similarity.pqEncode(emb, "vec_id", "v", cb, m = 8, ksub = 16)
    val probes = emb.where($"vec_id" < 5)
    Similarity.pqAdcTopK(enc, probes, "vec_id", "v", cb, m = 8, ksub = 16, k = 5)
      .select($"probe_id", $"rank", $"corpus_id",
        round($"adist", 6).as("adist"))
  }

  /** q284 — Flesch reading-ease summary ([[graft.operators
    * .Readability]]): corpus-level readability per source from exact
    * word/sentence/vowel-group counts — one projection pass + one
    * census, score computed once per group (no per-doc float average). */
  def q284Flesch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Readability.fleschSummary(docs(spark, dir), "source", "text")
      .select($"g".as("source"), $"n_docs", $"words", $"sentences",
        $"syllables", round($"flesch", 6).as("flesch"))

  /** q286 — BPE merge learning ([[graft.operators.Bpe.learnMerges]]):
    * the top-8 byte-pair merges of the document corpus, learned over the
    * word-type census with the deterministic (count, pair) tie-break —
    * tokenizer training as a first-class corpus operator (q84 counts
    * tokens with a FIXED tokenizer; this LEARNS one from the data). */
  def q286BpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.learnMerges(docs(spark, dir), "text", nMerges = 8)

  /** q287 — tokenizer fertility under the learned merges
    * ([[graft.operators.Bpe.fertility]]): the q286 vocabulary applied
    * back to the per-source word census — tokens/word and chars/token
    * are what the learned vocab is FOR. The 8-row merge table collects
    * driver-side (it is the model, bounded by construction); encoding
    * is one shuffle-free projection chain. */
  def q287BpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val merges = graft.operators.Bpe
      .learnMerges(docs(spark, dir), "text", nMerges = 8)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.operators.Bpe.fertility(docs(spark, dir), "source", "text", merges)
      .select($"g".as("source"), $"n_types", $"n_words", $"n_chars",
        $"n_tokens", round($"tokens_per_word", 6).as("tokens_per_word"),
        round($"chars_per_token", 6).as("chars_per_token"))
  }

  /** q288 — T5 span-corruption census ([[graft.operators
    * .SpanCorruption]]): denoising pairs built with md5-seeded 3-token
    * block masks; the per-source census sums token/mask/span counts AND
    * the built input/target string lengths — the latter pin the
    * sentinel numbering itself cross-engine. */
  def q288SpanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.SpanCorruption.corrupt(
      docs(spark, dir), "doc_id", "text")
    pairs.join(docs(spark, dir).select($"doc_id", $"source"), "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        sum($"n_masked").as("n_masked"),
        sum($"n_spans").as("n_spans"),
        sum(length($"input")).as("input_chars"),
        sum(length($"target")).as("target_chars"),
        round(sum($"n_masked").cast("double") /
          sum($"n_tokens").cast("double"), 6).as("mask_rate"))
  }

  /** q289 — greedy maximum-coverage selection ([[graft.operators
    * .Selection.greedyCoverage]]): the 6 documents that together cover
    * the most vocabulary, with per-pick marginal gains and the running
    * covered total — the coreset/diversity primitive of fine-tuning-set
    * curation. */
  def q289GreedyCoverage(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Selection.greedyCoverage(docs(spark, dir), "doc_id", "text", k = 6)

  /** q292 — simplified silhouette per embedding label ([[graft.operators
    * .Similarity.silhouetteByLabel]]): the clustering-quality census over
    * the labeled vectors — per label, how many points sit closer to their
    * own centroid than to any rival, and the mean (b−a)/max(a,b) score.
    * Exact integer scaled distances; the one mean sums 12-decimal
    * rounded terms as decimal, so it is partition-order insensitive. */
  def q292Silhouette(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.silhouetteByLabel(
      Tables.embeddings(spark, dir), "vec_id", "embedding", "label")
      .select($"label", $"n", $"n_closer_home",
        round($"mean_silhouette", 6).as("mean_silhouette"))

  /** q296 — ROUGE-L summary fidelity ([[graft.operators.Rouge.rougeL]]):
    * each of the first 40 documents scored against a deterministic
    * "summary" (its first 12 tokens plus a planted novel tail) — recall
    * measures how much of the reference the summary preserves, precision
    * how much of the summary is grounded; the planted tail keeps
    * precision < 1 so the score discriminates. Codegen'd token-LCS DP,
    * capped at 64 tokens per side (the cap is the semantics, replayed
    * by the oracle). */
  def q296RougeL(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(trim($"text")), "\\s+")
    val cand = concat_ws(" ",
      concat(slice(toks, 1, 12),
        array(lit("candidate"), lit("summary"), lit("tail"), lit("words"))))
    val paired = docs(spark, dir).where($"doc_id" < 40)
      .select($"doc_id", $"text", cand.as("cand"))
    graft.operators.Rouge.rougeL(paired, "doc_id", "text", "cand", cap = 64)
      .select($"doc_id", $"n_ref", $"n_cand", $"lcs",
        round($"rouge_p", 6).as("rouge_p"),
        round($"rouge_r", 6).as("rouge_r"),
        round($"rouge_f1", 6).as("rouge_f1"))
  }

  /** q299 — between-group Theil index ([[graft.operators.WeightedStats
    * .theilBetween]]): how unequally is character mass distributed
    * across languages relative to document counts — the decomposable
    * corpus-budget fairness number a mixture pipeline tracks release to
    * release (0 = proportional, ln(k) = all mass in one language). */
  def q299TheilBetween(spark: SparkSession, dir: String): DataFrame =
    graft.operators.WeightedStats.theilBetween(
        docs(spark, dir), "lang", "n_chars")
      .select($"k", $"n", $"total",
        round($"theil_between", 6).as("theil_between"))

  /** q301 — Simpson token diversity ([[graft.operators.Profile
    * .simpsonDiversity]]): per source, the collision probability of its
    * token stream and the effective vocabulary size — the no-logs
    * concentration gate (a templated source "behaves like" far fewer
    * distinct tokens than it has). Exact rational of integer counts. */
  def q301SimpsonDiversity(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"source",
        explode(split(lower(trim($"text")), "\\s+")).as("tok"))
      .where(length($"tok") > 0)
    graft.operators.Profile.simpsonDiversity(toks, "source", "tok")
      .select($"g".as("source"), $"n", $"n_categories",
        round($"simpson_lambda", 6).as("simpson_lambda"),
        round($"diversity", 6).as("diversity"),
        round($"effective", 6).as("effective"))
  }

  /** q304 — mutual nearest neighbors ([[graft.operators.Similarity
    * .mutualNearestNeighbors]]): even-id vs odd-id embedding halves
    * paired by mutual integer-dot-product top-1 — the hub-suppressed
    * alignment primitive; no float anywhere, both argmaxes exact. */
  def q304MutualNn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.operators.Similarity.mutualNearestNeighbors(
      emb.where($"vec_id" % 2 === 0), emb.where($"vec_id" % 2 === 1),
      "vec_id", "embedding")
  }

  /** q305 — total variation drift ([[graft.operators.Divergence
    * .totalVariation]]): each source's token distribution vs the whole
    * corpus, ½·L1 over the union support — the smoothing-free member
    * of the q238/q239/q297 drift battery; all-integer numerator, one
    * terminal division. */
  def q305TotalVariation(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"source",
        explode(split(lower(trim($"text")), "\\s+")).as("tok"))
      .where(length($"tok") > 0)
    graft.operators.Divergence.totalVariation(toks, "source", "tok")
      .select($"g".as("source"), $"n_tok", $"vocab",
        round($"tv", 6).as("tv"))
  }

  /** q306 — Good–Turing re-estimation ([[graft.operators.Profile
    * .goodTuring]]): per-source frequency-of-frequencies with adjusted
    * counts r* and unseen-mass p0 — the vocabulary-saturation census;
    * exact integer N_r, two correctly-rounded divisions per row. */
  def q306GoodTuring(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"source",
        explode(split(lower(trim($"text")), "\\s+")).as("tok"))
      .where(length($"tok") > 0)
    graft.operators.Profile.goodTuring(toks, "source", "tok", maxR = 5)
      .select($"g".as("source"), $"n_tok", $"vocab", $"r", $"n_r",
        round($"r_star", 6).as("r_star"), round($"p0", 6).as("p0"))
  }

  /** q312 — collocation mining ([[graft.operators.Ranking
    * .collocationLift]]): top-20 adjacent token pairs by lift (monotone
    * PMI) with a count-5 floor — the multiword-unit detector; exact
    * counts, one division, deterministic (lift, x, y) order. */
  def q312Collocations(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.collocationLift(
      docs(spark, dir).select($"text"), "text", minCount = 5L, k = 20)
      .select($"rank", $"x", $"y", $"c_xy", $"c_x", $"c_y",
        round($"lift", 6).as("lift"))

  /** q320 — retrieval eval ([[graft.operators.Eval.rankEval]]): MRR
    * and AP@10 per query over the even-vs-odd embedding split (q304's
    * integer-dot ranking), relevant = same label — the ANN-index
    * quality harness; exact per-query rationals, rank-ordered folds. */
  def q320RetrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    def q(df: org.apache.spark.sql.DataFrame, id: String, vec: String,
        lab: String) =
      df.select($"vec_id".as(id),
        expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
          .as(vec), $"label".as(lab))
    val qs = q(emb.where($"vec_id" % 2 === 0), "qid", "qv", "ql")
    val ds = q(emb.where($"vec_id" % 2 === 1), "did", "dv", "dl")
    // codegen'd exact long dot (the MNN capacity contract: unit floats
    // at scale 1000 keep a 64-dim dot below 10^8 — vast long headroom)
    val dot = graft.functions.FastHash.intDot($"qv", $"dv")
    val ranked = qs.crossJoin(broadcast(ds))
      .withColumn("__dot", dot)
      .withColumn("r", row_number().over(
        Window.partitionBy($"qid").orderBy($"__dot".desc, $"did")))
      .where($"r" <= 10)
      .select($"qid", $"r", ($"ql" === $"dl").cast("long").as("rel"))
    graft.operators.Eval.rankEval(ranked, "qid", "r", "rel", k = 10)
      .select($"q".as("qid"), $"n_ranked", $"n_rel",
        round($"rr", 6).as("rr"), round($"ap", 6).as("ap"))
  }

  /** q330 — compressibility bands ([[graft.functions.FastHash
    * .compressRatio]]): per source, how many documents fall in each
    * deflate-ratio decile band — the CCNet/Gopher compressibility
    * quality signal as a deterministic integer census (banding, not a
    * float mean, keeps it partition-invariant). No DuckDB zlib → no
    * oracle SQL is possible, so this wrapper is RETIRED from the
    * driver's oracle board (a perpetual rows-only cell reads as red):
    * it remains a library entry point, its banding is spec-pinned
    * (TrainingDataSpec), and the zlib codec pair is hash-oracle-gated
    * end-to-end by [[q389DeflateRoundtrip]]. */
  def q330CompressBands(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($"source",
        least(lit(9L), floor(
          graft.functions.FastHash.compressRatio($"text") * 10)
          .cast("long")).as("band"))
      .groupBy($"source", $"band").agg(count(lit(1)).as("n_docs"))

  /** q391 — dedup threshold operating curve ([[graft.operators.Dedup
    * .thresholdCurve]]): the exact 3-gram-Jaccard pair table of the
    * planted near-dup fixture swept across τ ∈ 300..900 milli in ONE
    * pass — per operating point, surviving pairs, greedy higher-id
    * drops, and kept docs; the "pick the dedup threshold from data,
    * not folklore" report a 100 TB run wants BEFORE it commits. */
  def q391ThresholdCurve(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      nearDupFixture(spark, dir), "doc_id", "text", 3)
    graft.operators.Dedup.thresholdCurve(pairs, "jaccard", "id_b",
      nDocs = 80L, thresholdsMilli = Seq(300L, 400L, 500L, 600L, 700L,
        800L, 900L))
  }

  /** q392 — weighted reservoir sample ([[graft.operators.Selection
    * .weightedReservoir]]): 5 documents per source drawn ∝ whitespace
    * token count with the seeded A-ES key — the deterministic
    * "sample big docs more often, reproducibly, per stratum" draw a
    * mixture build wants; exact md5-uniform + pinned ln/ratio key,
    * stratum-partitioned top-k window. */
  def q392WeightedReservoir(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Selection.weightedReservoir(
      docs(spark, dir).select($"source", $"doc_id",
        TextOps.tokenCount($"text").as("n_tok")),
      "source", "doc_id", "n_tok", k = 5, seed = "graft9")
      .select($"stratum".as("source"), $"id".as("doc_id"),
        $"weight".as("n_tok"), $"rank")

  /** q393 — sentence-BLEU ([[graft.operators.Rouge.bleu]]): the q296
    * pairing (each of the first 40 docs vs its first-12-tokens-plus-
    * planted-tail candidate) scored with clipped 1..4-gram precision,
    * geometric mean, and brevity penalty — the hallucination-sensitive
    * complement to q296's ROUGE-L recall; the planted tail keeps every
    * p_n < 1 so the score discriminates. */
  def q393Bleu(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(trim($"text")), "\\s+")
    val cand = concat_ws(" ",
      concat(slice(toks, 1, 12),
        array(lit("candidate"), lit("summary"), lit("tail"), lit("words"))))
    val paired = docs(spark, dir).where($"doc_id" < 40)
      .select($"doc_id", $"text", cand.as("cand"))
    graft.operators.Rouge.bleu(paired, "doc_id", "text", "cand")
      .select($"id".as("doc_id"), $"r_len", $"c_len",
        round($"p1", 6).as("p1"), round($"p2", 6).as("p2"),
        round($"p3", 6).as("p3"), round($"p4", 6).as("p4"),
        round($"bleu", 6).as("bleu"))
  }

  /** q395 — Z-order shard locality audit ([[graft.operators.Similarity
    * .zOrderLocalityAudit]]): Morton-interleave the first two quantized
    * embedding coordinates into 32 shards and count co-sharded
    * cosine≥0.7 pairs against an md5 hash layout of the same rows —
    * the measurable "space-filling layout keeps neighbors together"
    * claim an ANN shard plan rests on. The 1024-row per-shard cap
    * bounds the pair join at any corpus size (shards over the cap are
    * excluded and counted in `n_shards_skipped` — the capBuckets
    * discipline); at sf0.1 (2000 vectors / 32 shards) nothing skips,
    * so the audit is exhaustive AND scale-safe. */
  def q395ZorderLocality(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.zOrderLocalityAudit(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      dims = 2, bitsPerDim = 4, shardBits = 5, tauMilli = 700L,
      capPerShard = 1024)

  /** q397 — vocabulary coverage curve ([[graft.operators.Profile
    * .vocabCoverageCurve]]): instance coverage of the top-K token types
    * for K ∈ {100..10000} from one census — the tokenizer-sizing
    * report next to q163's merge census and the q259 Heaps growth fit;
    * distributed top-k, never a global vocab window. */
  def q397VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.vocabCoverageCurve(docs(spark, dir), "text",
      ks = Seq(100, 300, 1000, 3000, 10000))

  /** q398 — corpus snapshot diff ([[graft.operators.Scd.snapshotDiff]]):
    * the release-versioning census between the corpus and a planted v2
    * (every 11th doc removed, every 7th edited, every 13th re-keyed as
    * new) — added/removed/changed/unchanged per source at digest grain,
    * keys-and-hashes exchange only. */
  def q398SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val old = docs(spark, dir).select($"doc_id", $"source", $"text")
    val newer = docs(spark, dir).where($"doc_id" % 11 =!= 0)
      .select($"doc_id", $"source",
        when($"doc_id" % 7 === 0, concat($"text", lit(" v2")))
          .otherwise($"text").as("text"))
      .unionByName(docs(spark, dir).where($"doc_id" % 13 === 0)
        .select(($"doc_id" + 100000L).as("doc_id"), $"source", $"text"))
    graft.operators.Scd.snapshotDiff(old, newer, "doc_id", "text", "source")
  }

  /** q401 — semantic decontamination ([[graft.operators.Similarity
    * .ivfTopK]] at saturation): each held-out eval vector's nearest
    * TRAINING vector by cosine, flagged at ≥ 0.8 — the embedding-space
    * leakage check n-gram decontamination (q89/q110/q142) cannot see
    * (a paraphrased eval item shares no shingles but sits next to its
    * source in embedding space). nProbe = nCells makes the IVF path
    * EXACT (the q90 saturation identity), so the oracle is the
    * brute-force argmax; at scale the same call with nProbe < nCells
    * is the documented approximate path. */
  def q401SemanticDecontam(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    graft.operators.Similarity.ivfTopK(
        emb.where($"vec_id" >= 20), emb.where($"vec_id" < 20),
        "vec_id", "v", k = 1, nCells = 16, nProbe = 16)
      .select($"probe_id".as("eval_id"),
        $"corpus_id".as("nearest_train_id"),
        round($"cos", 6).as("max_cos"),
        ($"cos" >= 0.8).as("contaminated"))
  }

  /** q405 — Lin's concordance correlation ([[graft.operators.Eval
    * .linCcc]]): per source, how well the chars/5 token ESTIMATE
    * agrees with the true whitespace token count on the 45° line —
    * the continuous agreement number (correlation alone would forgive
    * a calibration bias; CCC doesn't), deciding whether the cheap
    * estimator can stand in for tokenization. */
  def q405LinCcc(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.linCcc(
      docs(spark, dir).select($"source",
        TextOps.tokenCount($"text").as("x"),
        floor(octet_length($"text") / 5).cast("long").as("y")),
      "source", "x", "y")
      .select($"sc".as("source"), $"n",
        round($"mean_a", 6).as("mean_a"), round($"mean_b", 6).as("mean_b"),
        round($"ccc", 6).as("ccc"))

  /** q389 — deflate→inflate roundtrip audit ([[graft.functions.FastHash
    * .deflateRoundtripLen]]): per source, document count, how many
    * documents survive compress-then-decompress bit-exactly, and the
    * total roundtripped byte length. DuckDB cannot replay zlib, but it
    * CAN predict what a CORRECT codec must produce — n_ok = n_docs and
    * sum_len = Σ strlen(text) — so this is a full hash-parity oracle
    * over the codec pair (q330's banding signal stays spec-pinned;
    * this is its oracle-bearing twin). Pure per-row projection + one
    * census aggregation — no shuffle beyond the group-by. */
  def q389DeflateRoundtrip(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($"source",
        graft.functions.FastHash.deflateRoundtrip($"text").as("rt"),
        octet_length($"text").cast("long").as("blen"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(($"rt" === $"blen").cast("long")).as("n_ok"),
        sum($"rt").as("sum_len"))

  /** q84 — BPE-ish regex token counts (pre-tokenizer granularity) per
    * source, next to the whitespace count and the chars/4 estimate. */
  def q84BpeTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($"source",
        TextOps.bpeTokenCount($"text").as("bpe"),
        TextOps.tokenCount($"text").as("ws"),
        TextOps.tokenEstimate($"text").as("est"))
      .groupBy($"source")
      .agg(
        sum($"bpe").as("total_bpe_tokens"),
        sum($"ws").as("total_ws_tokens"),
        sum($"est").as("total_len4_estimate"))

  /** q83 — embedding-cosine near-dup pairs, exact kernel over a bounded
    * range (oracle-checked); [[Dedup.embeddingNearDupsLsh]] is the scale
    * path (recall unit-tested against this). */
  def q83EmbeddingNearDups(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .where($"vec_id" < 100)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    Dedup.embeddingNearDupsExact(emb, "vec_id", "v", threshold = 0.2)
      .select($"id_a", $"id_b", round($"cos", 4).as("cos"))
  }

  /** q86 — PII detection + redaction (training-data scrubbing): count and
    * strip emails / phone numbers per source, reporting how many chars the
    * redaction removed. The corpus carries no natural PII (0 '@', 0
    * digits), so deterministic PII is planted on a doc_id grid — every 5th
    * doc gets an email, every 7th a phone number (planted-fixture pattern
    * of q71/q75). Patterns are conservative so Java regex (Spark) and RE2
    * (DuckDB) agree. */
  def q86PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val planted = docs(spark, dir).select($"doc_id", $"source",
      concat($"text",
        when($"doc_id" % 5 === 0,
          concat(lit(" contact user"), $"doc_id", lit("@example.com"))).otherwise(lit("")),
        when($"doc_id" % 7 === 0,
          concat(lit(" call 555-"), lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
            lit("-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
        .as("text"))
    planted
      .withColumn("emails", regexp_count($"text", lit(emailRe)))
      .withColumn("phones", regexp_count($"text", lit(phoneRe)))
      .withColumn("clean",
        regexp_replace(regexp_replace($"text", emailRe, "[EMAIL]"), phoneRe, "[PHONE]"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(($"emails" + $"phones" > 0).cast("long")).as("docs_with_pii"),
        sum($"emails").as("emails_found"),
        sum($"phones").as("phones_found"),
        sum(length($"text") - length($"clean")).as("chars_redacted"))
  }

  /** q87 — corpus vocabulary head (the wordcount of training pipelines):
    * explode the token stream, count, top-20 with deterministic
    * (freq desc, token asc) tie-break. One explode + one shuffle on the
    * token — the canonical map-side-combined aggregation at any scale. */
  def q87Vocab(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(split(lower(trim($"text")), "\\s+")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token")
      .limit(20)

  /** q88 — duplicate n-gram contamination census: document frequency of
    * every distinct 5-gram (how many docs share it), reduced to a
    * (df -> n_shingles) histogram. The cross-doc-repeated-n-gram rate is
    * the standard contamination / near-dup diagnostic run before training;
    * shuffles only (shingle, doc_id) pairs, never text. */
  def q88NgramContamination(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($"doc_id",
        explode(graft.functions.FastHash.shingles($"text", 5)).as("sh"))
      // shuffle 8-byte hashes, not shingle strings (xxhash64 collision on
      // ~10^6 distinct shingles: p ~ 3e-8 — the histogram is insensitive
      // at any realistic corpus size); per-doc shingles are already
      // distinct, so plain count(*) IS the document frequency — no
      // count-distinct expansion pass
      .groupBy(xxhash64($"sh").as("shh"))
      .agg(count(lit(1)).as("df"))
      .groupBy($"df")
      .agg(count(lit(1)).as("n_shingles"))

  /** q89 — train/test decontamination (GPT-3/C4-style 8-gram overlap):
    * flag train docs sharing any 8-gram shingle with the test split.
    * Test split = first 10 docs; planted contamination = copies of the
    * first 5 under shifted ids (the natural corpus shares no 8-grams, so
    * the planted rows make the check discriminating). Plan shape: explode
    * both sides to (shingle, id), left-semi join train on the broadcast
    * test shingle set, distinct ids — no text ever joins. */
  def q89Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val test = d.where($"doc_id" < 10)
    val train = d.where($"doc_id" >= 10)
      .unionByName(d.where($"doc_id" < 5)
        .select(($"doc_id" + 2000).as("doc_id"), $"text"))
    val testSh = test
      .select(explode(graft.functions.FastHash.shingles($"text", 8)).as("sh"))
      .distinct()
    train
      .select($"doc_id", explode(graft.functions.FastHash.shingles($"text", 8)).as("sh"))
      .join(broadcast(testSh), Seq("sh"), "left_semi")
      .groupBy($"doc_id")
      .agg(countDistinct($"sh").as("n_shared_shingles"))
  }

  /** q90 — IVF exhaustive-probe equivalence: [[Similarity.ivfTopK]] with
    * nProbe = nCells must reproduce brute-force top-k EXACTLY (every cell
    * searched => candidate set = full corpus => identical re-rank). This
    * gives the IVF machinery — centroid assignment, cell join, re-rank —
    * a real DuckDB oracle (q79's SQL), complementing q82's recall-only
    * check at nProbe < nCells. */
  def q90IvfFullProbe(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probes = emb.where($"vec_id" < 5)
    Similarity.ivfTopK(emb, probes, "vec_id", "v", k = 5, nCells = 8, nProbe = 8)
      .select($"probe_id", $"rank", $"corpus_id", round($"cos", 4).as("cos"))
  }

  /** q91 — deterministic hash-threshold sampling (reproducible
    * subsampling, the primitive every training-data pipeline needs): a doc
    * is sampled iff the md5 hex of its id sorts below a threshold string
    * — uniform, seedable (prefix the id), engine-portable (lexicographic
    * compare on the hex digest), and stable under reruns/repartitioning
    * unlike rand()-based sampling. '2' keeps the first-hex-char in {0,1}
    * => a 1/8 sample. Reported per lang to show stratification. */
  def q91HashSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("sampled", md5($"doc_id".cast("string")) < "2")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum($"sampled".cast("long")).as("n_sampled"),
        round(avg($"sampled".cast("double")), 4).as("sample_rate"))

  /** q92 — context-length packing stats (sequence-packing planning): BPE
    * token counts bucketed into context bins sized to split this corpus (4 non-degenerate rows) with the padding
    * waste a naive one-doc-per-sequence batcher would pay at each bin —
    * the sizing metric used to choose packing strategy before training. */
  def q92PackingStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(TextOps.bpeTokenCount($"text").as("n_tok"))
      .withColumn("ctx_bin",
        when($"n_tok" <= 32, 32)
          .when($"n_tok" <= 64, 64)
          .when($"n_tok" <= 96, 96)
          .otherwise(128))
      .groupBy($"ctx_bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("total_tokens"),
        round(avg(lit(1.0) - $"n_tok" / $"ctx_bin".cast("double")), 4)
          .as("avg_pad_waste"))

  /** q93 — SimHash cross-engine pipeline check (q85's pattern for the
    * SimHash family): exact-copy fixture, so every planted pair has a
    * bit-identical fingerprint — the banding join MUST surface it and its
    * Hamming distance MUST be 0, both forced deterministically, letting
    * DuckDB state the full expected output without computing xxhash64.
    * Docs 8/12 are excluded on BOTH engines: they are natural near-dups at
    * Hamming 2 in one test corpus, and their cross-copy pairs would make
    * the expected set hash-dependent. Any regression in tokenization,
    * banding, candidate dedup, pair orientation (id_a < id_b), Hamming
    * verify, or thresholding changes this result set. */
  def q93SimhashDups(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .where($"doc_id" < 40 && !$"doc_id".isin(8, 12))
      .select($"doc_id", $"text")
    val fixture = base.unionByName(
      base.select(($"doc_id" + 1000).as("doc_id"), $"text"))
    Dedup.simhashNearDups(fixture, "doc_id", "text", maxHamming = 3)
  }

  /** q94 — SRP-LSH saturated-recall equivalence (q90's pattern for the
    * hyperplane family): at 32 tables x 3 planes the union of bucket
    * probes deterministically covers every true top-5 neighbor on this
    * corpus (verified at two scale factors), so the ANN output must equal
    * brute-force top-k — which DuckDB computes exactly (q79's oracle).
    * Exercises the real pipeline at real parameters: seeded hyperplane
    * signs, per-table bucketing, candidate union + dedup, exact re-rank.
    * Complements q80's production-parameter run (rows-only). */
  def q94SrpFullRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probes = emb.where($"vec_id" < 5)
    Similarity.lshTopK(emb, probes, "vec_id", "v", k = 5, tables = 32, planes = 3)
      .select($"probe_id", $"rank", $"corpus_id", round($"cos", 4).as("cos"))
  }

  /** q95 — sequence-packing assignment ([[Packing.concatChunkAssign]]):
    * the packed concat-and-chunk layout q92's stats plan for, stratified
    * per lang (per-stream window — no global sort). Every row's window
    * range is a pure function of the per-stream token order, so DuckDB
    * replays the assignment with the same partitioned window. */
  def q95PackAssign(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir).select($"doc_id", $"lang",
      TextOps.bpeTokenCount($"text").as("n_tok"))
    graft.operators.Packing.concatChunkAssign(tok, "doc_id", "lang", "n_tok", 128)
      .select($"doc_id", $"lang", $"n_tok", $"seq_start", $"seq_end")
  }

  /** q96 — near-dup cluster assignment ([[Components.connectedComponents]]):
    * transitive closure of the q83 exact embedding pair graph at cos >=
    * 0.3 (15 components, sizes up to 5, 29 member pairs that are NOT
    * direct edges — so a broken closure cannot pass). DuckDB replays the
    * closure with a recursive CTE over the identical pair set. */
  def q96DupComponents(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .where($"vec_id" < 100)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pairs = Dedup.embeddingNearDupsExact(emb, "vec_id", "v", threshold = 0.3)
    graft.operators.Components.componentsWithSizes(pairs, "id_a", "id_b")
      .select($"id".as("vec_id"), $"component", $"csize")
  }

  /** q213 — star-contraction components on a DIAMETER-stress graph
    * ([[Components.connectedComponentsAltStar]]): doc_ids chained in runs
    * of 50 (edges i→i+1 within a run) with one shortcut edge welding each
    * even/odd run pair — components of exactly 100 nodes with graph
    * diameter ~90, where one-hop-per-round label propagation would need
    * ~90 rounds but alternating large-star/small-star lands in O(log n)
    * (~6 observed). The closure is closed-form — component = the run
    * pair's first id, 100·⌊id/100⌋ — so the oracle needs no recursive
    * CTE, and a single mis-hooked node breaks both its own row and the
    * csize census. */
  def q213AltstarCc(spark: SparkSession, dir: String): DataFrame = {
    val ids = docs(spark, dir).select($"doc_id")
    val chain = ids.where($"doc_id" % 50 =!= 49)
      .select($"doc_id".as("a"), ($"doc_id" + 1).as("b"))
    val weld = ids.where($"doc_id" % 100 === 7)
      .select($"doc_id".as("a"), ($"doc_id" + 56).as("b"))
    val pairs = chain.unionByName(weld)
    val comp = graft.operators.Components
      .connectedComponentsAltStar(pairs, "a", "b")
    val sizes = comp.groupBy($"component").agg(count(lit(1)).as("csize"))
    comp.join(sizes, "component")
      .select($"id".as("doc_id"), $"component", $"csize")
  }

  /** q214 — two-phase exact heavy hitters ([[Heavy.exactTopK]]): the
    * corpus's 31-token vocabulary is near-uniform (~N/31 each), so 4 hot
    * tokens are planted — every 3rd doc appends 100 copies of
    * `hot{doc_id%4}` — making them ~4x any base token. Phase 1's
    * Misra–Gries screen (k=16 counters) certifies a superset of the
    * (N/16)-heavy tokens in one bounded-state pass; phase 2 recounts just
    * those candidates exactly, and the runtime certificate (4th count >
    * N/16) proves the output IS the exact global top-4, which the oracle
    * confirms against the full unbounded census. */
  def q214ExactHeavy(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select(
      concat($"text",
        when($"doc_id" % 3 === 0,
          repeat(concat(lit(" hot"), ($"doc_id" % 4).cast("string")), 100))
          .otherwise(lit(""))).as("text"))
    graft.operators.Heavy.exactTopK(planted, "text", mgK = 16, topN = 4)
  }

  /** q216 — checksum-validated card scrubbing ([[Pii.luhnScrub]] — the
    * precision layer over q86's pattern-only pass): valid card numbers
    * (4 Luhn-passing literals, one dashed) are planted on the %6 grid and
    * Luhn-FAILING 16-digit decoys on the %10 grid; the census proves the
    * mod-10 filter separates them — decoys are counted as candidates but
    * never masked. Validation is a codegen'd transform-with-index +
    * aggregate fold (integral arithmetic, engine-replayable); masking
    * folds plain replaces over the valid list only. */
  def q216LuhnPii(spark: SparkSession, dir: String): DataFrame = {
    val validCards = array(lit("4111111111111111"), lit("5500005555555559"),
      lit("6011000000000004"), lit("4111-1111-1111-1111"))
    val invalidCards = array(lit("4111111111111112"), lit("5500005555555551"),
      lit("1234567812345678"))
    val planted = docs(spark, dir).select($"doc_id", $"source",
      concat($"text",
        when($"doc_id" % 6 === 0, concat(lit(" pay card "),
          element_at(validCards,
            ((($"doc_id" / 6).cast("long") % 4) + 1).cast("int")))).otherwise(lit("")),
        when($"doc_id" % 10 === 0, concat(lit(" ref "),
          element_at(invalidCards,
            ((($"doc_id" / 10).cast("long") % 3) + 1).cast("int")))).otherwise(lit("")))
        .as("text"))
    graft.operators.Pii.luhnScrub(planted, "text")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(($"n_cc_cands" > 0).cast("long")).as("docs_with_cand"),
        sum($"n_cc_cands".cast("long")).as("n_cands"),
        sum($"n_cc_valid".cast("long")).as("n_valid"),
        sum($"n_cc_invalid".cast("long")).as("n_invalid"),
        sum((length($"text") - length($"cc_scrubbed")).cast("long")).as("chars_redacted"))
  }

  /** q217 — winsorized length census per language
    * ([[graft.operators.Robust.winsorizedCensus]]): n_chars clipped to
    * the exact per-lang [P05, P95] discrete quantiles, with clip counts
    * and the winsorized mean. One corpus aggregation; quantile ranks walk
    * the distinct-VALUE census under an integer ceil(p·n) threshold, so
    * the oracle replays every bound and sum exactly (the mean's single
    * division is the only double). */
  def q217WinsorCensus(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Robust.winsorizedCensus(
      docs(spark, dir), "lang", "n_chars", pLoNum = 5, pHiNum = 95)

  /** q219 — Merkle-narrowed snapshot diff
    * ([[graft.operators.Fingerprint.diffSummary]]): v2 is derived from
    * documents by md5-grid rules — ~5% deleted, ~5% edited, ~5% new
    * rows — and the diff compares 256 key-hash bucket digests first,
    * then row-joins ONLY the dirty buckets. The oracle replays the
    * mutation rules and the naive full diff, plus the bucket census via
    * the digest-equality ⟺ no-differing-row identity, so a wrong
    * narrowing decision (a dirty bucket skipped, a clean one joined)
    * shifts `n_dirty_buckets` or `n_same_in_dirty` and fails the hash. */
  def q219DatasetDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = docs(spark, dir).select($"doc_id", $"text")
    def h = substring(md5($"doc_id".cast("string")), 1, 2)
    val v2 = v1.where(!(h < "0d"))
      .select($"doc_id",
        when(h >= "0d" && h < "1a", concat($"text", lit(" v2 edit")))
          .otherwise($"text").as("text"))
      .unionByName(v1.where(h >= "1a" && h < "27")
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat($"text", lit(" brand new")).as("text")))
    graft.operators.Fingerprint.diffSummary(
      v1, v2, "doc_id", Seq("doc_id", "text"), bucketHexChars = 2)
  }

  /** q221 — asymmetric containment detection
    * ([[graft.operators.Containment.containmentPairs]]): every 9th doc
    * gets a planted QUOTING twin — 3 filler tokens, its first 40 tokens,
    * 3 more filler — whose Jaccard to the original is far below any LSH
    * threshold but whose shingle containment is ≥ 0.8. The pair census
    * (directional: contained → container) must reproduce exactly,
    * including short-doc cases where the original is fully contained in
    * its own quote and both directions fire. */
  def q221Containment(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir).select($"doc_id", $"text")
    val snippet = concat_ws(" ", slice(split(trim($"text"), "\\s+"), 1, 40))
    val quotes = base.where($"doc_id" % 9 === 0)
      .select(($"doc_id" + 2000).as("doc_id"),
        concat(lit("quoted intro segment "), snippet,
          lit(" closing remarks follow")).as("text"))
    graft.operators.Containment.containmentPairs(
      base.unionByName(quotes), "doc_id", "text",
      k = 5, tauNum = 4, tauDen = 5, dfCap = 50)
  }

  /** q97 — BM25 relevance head ([[Ranking.bm25TopK]]): top-25 docs for a
    * 3-term topic query. tf/dl/df stay integral until the score, and the
    * per-term contributions add in fixed column order, so DuckDB replays
    * the exact double arithmetic. */
  def q97Bm25(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.bm25TopK(docs(spark, dir), "doc_id", "text",
      Seq("vector", "hash", "merge"), topK = 25)

  /** q98 — deterministic train/val/test census ([[Splits.hashSplit]]):
    * 80/10/10 by md5 prefix, reported per lang (the stratification
    * check: rates must hold inside every stratum). Pure projection —
    * the split itself shuffles nothing. */
  def q98HashSplit(spark: SparkSession, dir: String): DataFrame = {
    val assigned = graft.operators.Splits.hashSplit(
      docs(spark, dir), "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val c = assigned.groupBy($"lang", $"split").agg(count(lit(1)).as("n"))
    val t = c.groupBy($"lang").agg(sum($"n").as("tot"))
    c.join(broadcast(t), "lang")
      .select($"lang", $"split", $"n",
        round($"n".cast("double") / $"tot".cast("double"), 4).as("rate"))
  }

  /** q99 — mixture re-weighting census ([[Splits.stratifiedSample]]):
    * downsample src0 to 25% and src1 to 50%, keep everything else, and
    * report the per-source census of the kept corpus. Pure filter —
    * DuckDB replays the md5-prefix comparisons. */
  def q99Mixture(spark: SparkSession, dir: String): DataFrame = {
    val kept = graft.operators.Splits.stratifiedSample(
      docs(spark, dir), "doc_id", "source",
      Map("src0" -> 0.25, "src1" -> 0.5, "src2" -> 1.0))
    kept.groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("chars_kept"))
  }

  /** q100 — internal-repetition quality rule (the Gopher/MassiveText
    * duplicate-n-gram signal): per-doc fraction of repeated 3-grams, per
    * lang census with a 0.3 flag threshold. The corpus is naturally
    * near-repetition-free (max 0.07), so every 9th doc is planted doubled
    * (rep ~0.5) to keep the flag column discriminating. */
  def q100Repetition(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).withColumn("text",
      when($"doc_id" % 9 === 0, concat($"text", lit(" "), $"text"))
        .otherwise($"text"))
    // codegen'd one-pass kernel; value-identical to the declarative
    // rawShingles + array_distinct ratio (cross-checked in DedupSpec)
    val rep = graft.functions.FastHash.repetitionRatio($"text", 3)
    planted.select($"lang", rep.as("rep"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"rep"), 4).as("avg_rep"),
        round(max($"rep"), 4).as("max_rep"),
        sum(when($"rep" > 0.3, 1L).otherwise(0L)).as("n_flagged"))
  }

  /** q101 — sliding-window chunking ([[Packing.chunkTokens]]): 64-token
    * chunks every 48 tokens over the first 50 docs; the md5 of each
    * chunk's joined tokens makes the oracle compare content, not just
    * counts. */
  def q101Chunking(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.chunkTokens(
      docs(spark, dir).where($"doc_id" < 50), "doc_id", "text",
      size = 64, stride = 48)
      .select($"doc_id", $"chunk_ix".cast("long").as("chunk_ix"),
        $"start".cast("long").as("start"), $"n_tok".cast("long").as("n_tok"),
        md5($"chunk").as("chunk_md5"))

  /** q103 — packed-sequence materialization
    * ([[Packing.concatChunkMaterialize]]): the q95 layout assembled into
    * actual 128-token windows per lang stream; the oracle hashes each
    * window's text, so token order across document boundaries is
    * content-checked cross-engine. */
  def q103PackMaterialize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.concatChunkMaterialize(
      docs(spark, dir).where($"doc_id" < 200), "doc_id", "lang", "text", ctx = 128)
      .select($"stream".as("lang"), $"seq".cast("long").as("seq"),
        $"n_parts", $"win_tokens", md5($"win_text").as("win_md5"))

  /** q104 — web-text cleaning ([[TextOps.cleanText]]): the corpus carries
    * no markup, so the fixture plants HTML tags, entities, and a control
    * char on every 7th doc; the md5 of the cleaned text checks the whole
    * strip/unescape/collapse chain cross-engine. */
  def q104TextClean(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).withColumn("raw",
      when($"doc_id" % 7 === 0,
        concat(lit("<p class=\"x\"> "), $"text",
          lit(" </p>\n<b>tail &amp; more&nbsp;here</b>\u0007")))
        .otherwise($"text"))
    planted.select($"doc_id", length($"raw").cast("long").as("n_raw"),
      TextOps.cleanText($"raw").as("clean"))
      .select($"doc_id", $"n_raw", length($"clean").cast("long").as("n_clean"),
        md5($"clean").as("clean_md5"))
  }

  /** q105 — deterministic global shuffle index
    * ([[graft.operators.GlobalOrder.shuffleIndex]]): every doc's position
    * in the (md5(id), id) permutation, computed with 256 hash-range
    * buckets + offset join — no single-partition global sort. The oracle
    * IS that global sort (fine at oracle scale), so the bucketed plan is
    * checked against the naive semantics row for row. */
  def q105GlobalShuffle(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GlobalOrder.shuffleIndex(
      docs(spark, dir).select($"doc_id"), "doc_id")
      .select($"doc_id", $"pos")

  /** q106 — OOV-rate census: tokenize, build the top-50 corpus vocabulary
    * (freq desc, token asc — deterministic), and report per-lang token
    * counts and out-of-vocabulary rates. The vocab side is tiny by
    * construction and broadcast; only (lang, token) pairs shuffle. */
  def q106OovRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"lang", explode(split(lower(trim($"text")), "\\s+")).as("token"))
    val vocab = toks.groupBy($"token").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token").limit(50)
      .select($"token", lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round($"n_oov".cast("double") / $"n_tokens".cast("double"), 4))
  }

  /** q107 — dedup apply ([[graft.operators.Components.canonicalize]]):
    * the q96 component labeling joined back onto the corpus — `kept` is
    * true exactly for each component's min-id doc and for singletons.
    * `filter(kept)` is the deduplicated corpus; the oracle replays the
    * closure plus the left join. */
  def q107DedupApply(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .where($"vec_id" < 100)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pairs = Dedup.embeddingNearDupsExact(emb, "vec_id", "v", threshold = 0.3)
    graft.operators.Components.canonicalize(
      emb.select($"vec_id"), "vec_id", pairs, "id_a", "id_b")
      .select($"vec_id", $"component", $"kept")
  }

  /** q108 — k-NN self-join ([[Similarity.knnJoin]]): top-3 neighbors for
    * EVERY vector (vec_id < 60) through the IVF cell machinery at
    * saturation (nProbe = nCells), which must equal the brute-force k-NN
    * graph — the q90 identity, here for the self-join shape. */
  def q108KnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .where($"vec_id" < 60)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    Similarity.knnJoin(emb, "vec_id", "v", k = 3, nCells = 8, nProbe = 8)
      .select($"probe_id", $"rank", $"corpus_id", round($"cos", 4).as("cos"))
  }

  /** q109 — document-frequency stopword strip: census each token's doc
    * frequency, collect the tokens present in >60% of docs (small by
    * construction — broadcast as one array), and strip them from every
    * doc IN PLACE via a higher-order filter over the token array — token
    * order survives, no explode/regroup shuffle of the corpus. The md5
    * of the stripped text checks order-preserving reassembly. */
  def q109StopStrip(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"doc_id", split(lower(trim($"text")), "\\s+").as("toks"))
    val dfreq = toks
      .select($"doc_id", explode(array_distinct($"toks")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("df"))
    val nDocs = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    val stopArr = dfreq.crossJoin(nDocs)
      .where($"df".cast("double") > $"n_docs".cast("double") * lit(0.6d))
      .agg(sort_array(collect_list($"token")).as("stop"))
    toks.crossJoin(broadcast(stopArr))
      .withColumn("kept_toks", filter($"toks", t => !array_contains($"stop", t)))
      .select($"doc_id",
        size($"toks").cast("long").as("n_before"),
        size($"kept_toks").cast("long").as("n_after"),
        md5(concat_ws(" ", $"kept_toks")).as("stripped_md5"))
  }

  /** q110 — bloom-prefiltered decontamination
    * ([[graft.operators.Bloom.semiJoinBloom]]): q89's 8-gram overlap
    * flagging computed through the compact-filter scale path — bloom
    * probe on the shingle hash map-side, exact string semi-join verify.
    * Must equal q89 exactly (no false negatives + exact verify), so it
    * shares q89's oracle. */
  def q110BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val test = d.where($"doc_id" < 10)
    val train = d.where($"doc_id" >= 10)
      .unionByName(d.where($"doc_id" < 5)
        .select(($"doc_id" + 2000).as("doc_id"), $"text"))
    val testSh = test
      .select(explode(graft.functions.FastHash.shingles($"text", 8)).as("sh"))
      .distinct()
    val trainSh = train
      .select($"doc_id", explode(graft.functions.FastHash.shingles($"text", 8)).as("sh"))
      .withColumn("k", xxhash64($"sh"))
    graft.operators.Bloom
      .semiJoinBloom(trainSh, testSh.select(xxhash64($"sh").as("k")), "k",
        expectedKeys = 100000L, fpp = 0.01)
      // bloom admits hash-level false positives; exact string verify
      // restores plain-semi-join semantics
      .join(testSh, Seq("sh"), "left_semi")
      .groupBy($"doc_id")
      .agg(countDistinct($"sh").as("n_shared_shingles"))
  }

  /** q111 — incremental-batch dedup ([[Dedup.minhashNearDupsAgainst]]):
    * 20 mutated re-submissions (5-token tail, shifted ids) arrive as a
    * batch against the full corpus; LSH with 32 single-row bands
    * (P(candidate | J=0.5) = 1 - 2^-32) finds their sources, exact
    * Jaccard verifies. The oracle is the exhaustive exact batch x corpus
    * pair set — hash equality proves recall 1 on the fixture. */
  def q111IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val batch = d.where($"doc_id" < 20)
      .select(($"doc_id" + 5000).as("doc_id"),
        concat($"text", lit(" graft incremental batch tail")).as("text"))
    Dedup.minhashNearDupsAgainst(d, batch, "doc_id", "text",
      shingleN = 3, k = 32, bands = 32, threshold = 0.5)
      .select($"batch_id", $"corpus_id", round($"jaccard", 4).as("jaccard"))
  }

  /** q112 — end-to-end quality gate (the C4-style ingest pipeline in one
    * plan): plant markup (q104 fixture) -> [[TextOps.cleanText]] ->
    * quality score + token count on the CLEANED text -> keep docs with
    * q >= 0.75 and >= 20 tokens -> per-source census. One scan, no
    * shuffle before the final groupBy. */
  def q112QualityGate(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).withColumn("raw",
      when($"doc_id" % 7 === 0,
        concat(lit("<p class=\"x\"> "), $"text",
          lit(" </p>\n<b>tail &amp; more&nbsp;here</b>")))
        .otherwise($"text"))
    val cleaned = planted.select($"source",
      TextOps.cleanText($"raw").as("clean"))
    cleaned
      .select($"source", TextOps.qualityScore($"clean").as("q"),
        TextOps.tokenCount($"clean").as("n_tok"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"q" >= 0.75 && $"n_tok" >= 20, 1L).otherwise(0L)).as("n_kept"),
        round(avg($"q"), 4).as("avg_quality"))
      .withColumn("kept_rate",
        round($"n_kept".cast("double") / $"n_docs".cast("double"), 4))
  }

  /** q116 — Lloyd-refined IVF end-to-end ([[Similarity.kmeansRefine]] +
    * [[Similarity.ivfTopKWith]]): seed centroids, 2 Lloyd rounds (one
    * map-side pass each — only fixed-size per-cell summaries shuffle),
    * then search the refined index at saturation (nProbe = nCells), which
    * must equal brute-force top-k for ANY centroid placement — the q90
    * identity, here exercising the refinement path. Probe set (vec_id in
    * [5, 10)) is disjoint from q90's so the two queries cover different
    * re-rank groups. */
  def q116IvfRefined(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val nCells = 8
    // centroid state is nCells x dim — driver-held model state, not data
    val init = Similarity.seedCentroids(emb, "vec_id", "v", nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val refined = Similarity.kmeansRefine(emb, "v", init, iters = 2)
    val centroids = spark.createDataFrame(
      spark.sparkContext.parallelize(refined.toSeq.map {
        case (cell, vec) => org.apache.spark.sql.Row(cell, vec.toSeq) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val probes = emb.where($"vec_id" >= 5 && $"vec_id" < 10)
    Similarity.ivfTopKWith(emb, probes, "vec_id", "v", centroids,
      k = 5, nProbe = nCells)
      .select($"probe_id", $"rank", $"corpus_id", round($"cos", 4).as("cos"))
  }

  /** q117 — REAL image decode ([[Multimodal.imageStats]], javax.imageio):
    * deterministic 16x12 PNGs (pixel formula keyed on doc_id — see
    * [[Multimodal.syntheticPng]]) decode back to exact per-channel sums
    * because PNG is lossless, so DuckDB replays the whole decode path as
    * closed-form arithmetic over a pixel grid — a REAL codec round-trip
    * checked cross-engine. Every 13th payload is corrupt (raw text bytes)
    * to pin the null-safety contract: stats null, row kept. Means are
    * integer-sum / pixel-count — bit-identical double division on both
    * engines, no rounding needed. */
  def q117ImageDecode(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = docs(spark, dir).where($"doc_id" < 40).select($"doc_id", $"text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val withImg = base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 13 == 0) r.getString(1).getBytes("UTF-8") // corrupt blob
          else graft.multimodal.Multimodal.syntheticPng(id, 16, 12)
        Row(id, payload)
      }
    }(enc)
    val px = lit(16 * 12).cast("double")
    graft.multimodal.Multimodal.imageStats(withImg, "payload")
      .select($"doc_id", $"width", $"height",
        ($"sum_r" / px).as("mean_r"),
        ($"sum_g" / px).as("mean_g"),
        ($"sum_b" / px).as("mean_b"))
  }

  /** q453 — MP4/ISO-BMFF container metadata probe ([[Multimodal
    * .mp4Probe]]): the box walk (ftyp brand → moov → mvhd
    * timescale/duration, v0 and v1 layouts → trak count → per-trak
    * stsd codec fourccs) over deterministic [[Multimodal.syntheticMp4]]
    * fixtures — every probed field is closed-form in doc_id, so DuckDB
    * replays the whole walk as arithmetic (the q117 codec-round-trip
    * contract lifted to containers). TWO corruption modes pin the
    * null-safety contract: every 9th payload is raw text bytes (wrong
    * magic) and every 7th≡3 is the fixture TRUNCATED at half length (a
    * box size running past the buffer — the bounds check, not the
    * magic check) — stats null, row kept, both modes. */
  def q453Mp4Probe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = docs(spark, dir).where($"doc_id" < 40).select($"doc_id", $"text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val withMp4 = base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 9 == 0) r.getString(1).getBytes("UTF-8") // wrong magic
          else {
            val full = graft.multimodal.Multimodal.syntheticMp4(id)
            if (id % 7 == 3) full.take(full.length / 2) // truncated box
            else full
          }
        Row(id, payload)
      }
    }(enc)
    graft.multimodal.Multimodal.mp4Probe(withMp4, "payload")
      .select($"doc_id", $"major_brand", $"timescale", $"duration_units",
        $"duration_ms", $"n_tracks", $"codecs")
  }

  /** q469 — WARC record walk ([[Multimodal.warcProbe]]): the q453
    * container contract for the CRAWL container itself — web-scale
    * corpora arrive as concatenated WARC records, and splitting them
    * (boundaries, types, target URIs, Content-Length payloads, a
    * byte-sum integrity census) is the first stage over 100 TB of
    * crawl. Fixtures are [[Multimodal.syntheticWarc]] — every record
    * count/type/URI/length/block_sum a closed form of doc_id — with
    * two planted corruption modes: every 9th≡4 payload loses its final
    * separator bytes (Content-Length chain runs past the buffer — a
    * guaranteed violation, unlike a half-cut that could land on a
    * record boundary) and every 11th≡6 raw text (wrong magic); both
    * yield one all-null record row KEPT, and a violation ANYWHERE
    * refuses the whole payload (lengths chain — a suffix after a bad
    * record is untrustworthy). */
  def q469WarcWalk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = docs(spark, dir).where($"doc_id" < 40).select($"doc_id", $"text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val withWarc = base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 11 == 6) r.getString(1).getBytes("UTF-8") // wrong magic
          else {
            val full = graft.multimodal.Multimodal.syntheticWarc(id)
            if (id % 9 == 4) full.take(full.length - 3) // separator cut
            else full
          }
        Row(id, payload)
      }
    }(enc)
    graft.multimodal.Multimodal.warcProbe(withWarc, "payload")
      .select($"doc_id", $"rec_idx", $"warc_type", $"target_uri",
        $"content_length", $"block_sum")
  }

  /** q460 — JPEG/EXIF metadata probe ([[Multimodal.exifProbe]]): the
    * q453 container-walk contract for still images — marker stream to
    * APP1, TIFF IFD0 in BOTH byte orders (even doc_id → II, odd → MM),
    * make/orientation/width/height all closed-form in doc_id so the
    * oracle replays the walk as arithmetic. Corrupt modes: every 8th≡1
    * raw text (wrong SOI), every 11th≡5 truncated at half (marker
    * length past the buffer); stats null, row kept. */
  def q460ExifProbe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = docs(spark, dir).where($"doc_id" < 40).select($"doc_id", $"text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val withJpg = base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 8 == 1) r.getString(1).getBytes("UTF-8")
          else {
            val full = graft.multimodal.Multimodal.syntheticJpegExif(id)
            if (id % 11 == 5) full.take(full.length / 2) else full
          }
        Row(id, payload)
      }
    }(enc)
    graft.multimodal.Multimodal.exifProbe(withJpg, "payload")
      .select($"doc_id", $"byte_order", $"make", $"orientation",
        $"exif_width", $"exif_height")
  }

  /** Planted cross-doc span fixture shared by q118/q119: a 25-token span
    * appended to every %10==3 doc and PREPENDED to every %20==5 doc (span
    * at token 1 exercises the island left edge), an 18-token span appended
    * to every %10==7 doc. The corpus's own planted exact-dup clusters
    * (q70's fixture) surface as full-document spans, and appended docs
    * sharing a final text token extend spans by one position — all
    * replayed identically by the oracle, so the result is discriminating
    * far beyond the plants. */
  private def spanFixture(spark: SparkSession, dir: String): DataFrame = {
    val spanA = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee"
    val spanB = "uno dos tres cuatro cinco seis siete ocho nueve diez once " +
      "doce trece catorce quince dieciseis diecisiete dieciocho"
    docs(spark, dir).select($"doc_id",
      when($"doc_id" % 20 === 5, concat(lit(spanA + " "), $"text"))
        .when($"doc_id" % 10 === 3, concat($"text", lit(" " + spanA)))
        .when($"doc_id" % 10 === 7, concat($"text", lit(" " + spanB)))
        .otherwise($"text").as("text"))
  }

  /** q118 — substring-level exact dedup ([[graft.operators.Spans
    * .duplicatedSpans]]): maximal >= 15-token spans appearing in >= 2
    * docs — the dedup granularity between whole-doc exact (q70) and
    * whole-doc near (q76). One row per maximal span. */
  def q118DupSpans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Spans.duplicatedSpans(
      spanFixture(spark, dir), "doc_id", "text", k = 15)

  /** q119 — substring dedup APPLY ([[graft.operators.Spans
    * .maskDuplicatedSpans]]): q118's spans removed from every occurrence
    * except the corpus-wide first; md5 of the re-assembled text checks
    * token order, boundary precision, and the keep-first policy — the
    * exact-dup cluster docs mask to empty, pinning the degenerate case. */
  def q119SpanMask(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Spans.maskDuplicatedSpans(
      spanFixture(spark, dir), "doc_id", "text", k = 15)
      .select($"doc_id", md5($"kept_text").as("kept_md5"))

  /** q120 — REAL audio decode ([[Multimodal.audioStats]],
    * javax.sound.sampled): deterministic 16-bit mono PCM WAVs (sample
    * formula keyed on doc_id, per-doc varying length) decode back to
    * exact integer amplitude sums because PCM is lossless — DuckDB
    * replays the codec round-trip as closed-form arithmetic. Every 11th
    * payload is corrupt raw text: stats null, row kept. */
  def q120AudioDecode(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = docs(spark, dir).where($"doc_id" < 40).select($"doc_id", $"text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val withWav = base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 11 == 0) r.getString(1).getBytes("UTF-8") // corrupt blob
          else graft.multimodal.Multimodal.syntheticWav(
            id, (256 + (id % 7) * 64).toInt)
        Row(id, payload)
      }
    }(enc)
    graft.multimodal.Multimodal.audioStats(withWav, "payload")
      .select($"doc_id", $"channels", $"sample_rate", $"n_samples",
        $"sum_amp", $"sum_abs_amp")
  }

  /** q121 — unigram LM quality score (the CCNet-style perplexity filter):
    * corpus unigram counts -> top-1000 vocab as ONE broadcast map row ->
    * per-doc mean negative log-likelihood via an in-order fold (OOV
    * floors at freq 1). The corpus never shuffles for scoring — the
    * vocab census is the only aggregation; scoring is a pure projection
    * over the scan, the layout a 100 TB quality pass needs. Fold order
    * is the token order on BOTH engines (Spark `aggregate` / DuckDB
    * `list_reduce`), so the double sums are bit-identical. */
  def q121LmScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"doc_id", split(lower(trim($"text")), "\\s+").as("toks"))
    val counts = toks.select(explode($"toks").as("token"))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
    val total = toks.agg(sum(size($"toks")).cast("double").as("n_total"))
    val vmap = counts.orderBy($"freq".desc, $"token").limit(1000)
      .agg(map_from_entries(collect_list(struct($"token", $"freq"))).as("vm"))
    toks.crossJoin(broadcast(vmap)).crossJoin(broadcast(total))
      .withColumn("nll", expr(
        "aggregate(toks, cast(0.0 as double), (s, t) -> " +
          "s - ln(coalesce(element_at(vm, t), 1L) / n_total))"))
      .select($"doc_id", size($"toks").cast("long").as("n_tok"),
        round($"nll" / size($"toks"), 4).as("mean_nll"))
  }

  /** q122 — percentile-CALIBRATED quality gate: where q112 gates on a
    * fixed 0.75, this drops the corpus-worst quartile — the threshold is
    * the P25 of the quality distribution, computed as ONE scalar
    * aggregation and broadcast back over the scan (q24's
    * no-global-window pattern: a window-ntile formulation would
    * single-partition the corpus). Ties at the quartile boundary resolve
    * identically cross-engine because interpolation between equal order
    * statistics is exact. */
  def q122CalibratedGate(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir)
      .select($"source", graft.functions.TextStats.textStats($"text").as("s"))
      .select($"source", $"s.quality".as("q"))
    val thr = scored.agg(expr("percentile(q, 0.25)").as("thr"))
    scored.crossJoin(broadcast(thr))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"q" >= $"thr", 1L).otherwise(0L)).as("n_kept"),
        round(first($"thr"), 4).as("p25_threshold"))
      .withColumn("kept_rate",
        round($"n_kept".cast("double") / $"n_docs".cast("double"), 4))
  }

  /** q123 — deterministic exact-k-per-group sampling: the "exactly k
    * eval docs per language" carve a mixture/eval builder needs. Rank
    * key = first 48 bits of md5(doc_id) (exact in a double; negated so
    * the max-k aggregate yields the k SMALLEST digests). Rides the
    * bounded [[graft.operators.TopK]] aggregate — only k-row summaries
    * shuffle, never raw rows (the O6 scale path) — and is rerun- and
    * partition-stable like q91's threshold sampler. */
  def q123StratifiedK(spark: SparkSession, dir: String): DataFrame = {
    val ranked = docs(spark, dir).select($"lang", $"doc_id",
      negate(conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
        .cast("double")).as("nv"))
    graft.operators.TopK.topKPerGroup(ranked, "lang", "doc_id", "nv", k = 4)
      .select($"lang", $"rank", $"doc_id")
  }

  /** q124 — TF-IDF keyword extraction: top-3 tokens per doc by
    * tf * (ln((N+1)/(df+1)) + 1) (smooth idf), ties broken by token —
    * the per-doc tagging pass a retrieval/labeling pipeline runs. The
    * (token)-keyed df join and the per-doc window are both linear; all
    * arithmetic is integer counts cast to double in a fixed expression
    * order, so DuckDB reproduces the doubles bit-for-bit (q97's BM25
    * precedent). */
  def q124TfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"doc_id", explode(split(lower(trim($"text")), "\\s+")).as("token"))
    val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dfr = toks.distinct().groupBy($"token").agg(count(lit(1)).as("df"))
    val nDocs = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfr, "token").crossJoin(broadcast(nDocs))
      .withColumn("tfidf", $"tf".cast("double") *
        (log(($"n_docs" + 1).cast("double") / ($"df" + 1).cast("double")) + lit(1.0d)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tfidf".desc, $"token")
    scored.withColumn("rank", row_number().over(w)).where($"rank" <= 3)
      .select($"doc_id", $"rank".cast("long").as("rank"), $"token",
        round($"tfidf", 4).as("tfidf"))
  }

  /** q126 — embedding mean-pool (class centroids): per-(label, dim)
    * means via posexplode + groupBy — the element-wise aggregation is a
    * plain keyed agg (map-side combined), no per-array UDAF state, and
    * the (label, dim) key space is tiny however large the corpus. The
    * building block for q127's centroid classifier and any
    * chunk-to-document pooling. */
  def q126MeanPool(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select($"label",
        posexplode(expr("transform(embedding, x -> cast(x as double))"))
          .as(Seq("pos", "v")))
      .select($"label", $"pos".cast("long").as("pos"), $"v")
      .groupBy($"label", $"pos")
      .agg(round(avg($"v"), 4).as("mean_v"), count(lit(1)).as("n"))

  /** q127 — nearest-centroid classification eval: assign every embedding
    * to its highest-cosine label centroid (q126's pooling at full
    * precision) and report the confusion census — the label-quality /
    * embedding-quality health check a training-data pipeline runs after
    * relabeling. Centroid table is 10 rows broadcast; the corpus is one
    * scan + per-vec argmax, no corpus shuffle before the final tiny
    * groupBy. Ties break to the smallest predicted label on both
    * engines. */
  def q127CentroidEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pooled = emb
      .select($"label".as("pred"), posexplode($"v").as(Seq("pos", "cv")))
      .groupBy($"pred", $"pos").agg(avg($"cv").as("mean_v"))
    val cent = pooled.groupBy($"pred")
      .agg(expr("transform(array_sort(collect_list(struct(pos, mean_v))), s -> s.mean_v)")
        .as("cvec"))
    emb.crossJoin(broadcast(cent))
      .withColumn("cos", graft.operators.Similarity.cosine($"v", $"cvec"))
      .where(!isnan($"cos"))
      .groupBy($"vec_id", $"label")
      .agg(max(struct($"cos", (-$"pred").as("np"))).as("m"))
      .select($"label", (-$"m.np").as("pred_label"))
      .groupBy($"label", $"pred_label")
      .agg(count(lit(1)).as("n"))
  }

  /** q128 — boilerplate line removal ([[graft.operators.Boilerplate
    * .removeFrequentLines]]): docs re-lined into 12-token rows, a
    * "newsletter" line appended to every %3==0 doc and a "cookie" line
    * prepended to every %4==1 doc — both cross the 25% document-
    * frequency threshold and must vanish; natural lines (including the
    * exact-dup clusters' shared lines, df << threshold) must survive.
    * md5 of the reassembled text pins order and boundary precision. */
  def q128Boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val lined = docs(spark, dir).select($"doc_id",
      split(lower(trim($"text")), "\\s+").as("toks"))
      .select($"doc_id", expr(
        """concat_ws('\n', transform(sequence(0, int(ceil(size(toks) / 12.0)) - 1),
          |i -> concat_ws(' ', slice(toks, i * 12 + 1, 12))))""".stripMargin).as("body"))
      .select($"doc_id",
        when($"doc_id" % 3 === 0,
          concat($"body", lit("\nsubscribe to our newsletter today")))
          .otherwise($"body").as("body"))
      .select($"doc_id",
        when($"doc_id" % 4 === 1,
          concat(lit("cookie notice accept all cookies\n"), $"body"))
          .otherwise($"body").as("text"))
    graft.operators.Boilerplate.removeFrequentLines(lined, "doc_id", "text",
      minDocFrac = 0.25)
      .select($"doc_id", $"n_lines", $"n_dropped",
        md5($"kept_text").as("kept_md5"))
  }

  /** q129 — full ingest pipeline in ONE plan (the capstone composition:
    * q104 clean -> q112 gate -> q70 exact-dedup keep-first -> census):
    * planted markup is stripped, quality + token gates applied to the
    * CLEANED text, surviving docs exact-deduped by cleaned-text digest
    * (keep-first = min doc_id — the corpus's planted dup clusters lose
    * all but one member here), and the per-source census reports every
    * stage's count plus the surviving token mass. The clean/score work
    * is a pure projection (two scan passes — the keep-first branch
    * re-reads the scan rather than caching a 100 TB intermediate); the
    * only shuffles are the digest keep-first and the final tiny
    * groupBy. */
  def q129IngestE2E(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).withColumn("raw",
      when($"doc_id" % 7 === 0,
        concat(lit("<p class=\"x\"> "), $"text",
          lit(" </p>\n<b>tail &amp; more&nbsp;here</b>")))
        .otherwise($"text"))
    val scored = planted
      .select($"doc_id", $"source", TextOps.cleanText($"raw").as("clean"))
      .select($"doc_id", $"source", $"clean",
        TextOps.qualityScore($"clean").as("q"),
        TextOps.tokenCount($"clean").as("n_tok"))
      .withColumn("gated", $"q" >= 0.75 && $"n_tok" >= 20)
      .withColumn("digest", md5(lower(trim($"clean"))))
    val keepIds = scored.where($"gated")
      .groupBy($"digest").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", lit(true).as("is_final"))
    scored.join(keepIds, Seq("doc_id"), "left")
      .withColumn("fin", coalesce($"is_final", lit(false)))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_in"),
        sum(when($"gated", 1L).otherwise(0L)).as("n_gated"),
        sum(when($"fin", 1L).otherwise(0L)).as("n_final"),
        sum(when($"fin", $"n_tok").otherwise(0L)).as("final_tokens"))
  }

  /** q130 — SemDeDup semantic deduplication ([[graft.operators.SemDedup]]):
    * embeddings clustered to 8 smallest-id seed centroids, within-cluster
    * cosine >= 0.9 against an earlier id drops the later vector. The
    * corpus has no natural semantic dups at 0.9 (random 64-dim vectors sit
    * near orthogonal), so every 15th vector re-appears id-shifted with a
    * small deterministic perturbation (x*1.01 + 0.001 — cosine ~0.9999,
    * same argmax cell) and must be the set that drops. Assignment is a
    * broadcast-fold pure projection; only the cell-keyed self-join
    * shuffles (plan-gated). */
  def q130SemDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select($"vec_id".cast("long").as("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val planted = base.where($"vec_id" % 15 === 0)
      .select(($"vec_id" + 10000L).as("vec_id"),
        expr("transform(v, x -> x * cast(1.01 as double) + cast(0.001 as double))").as("v"))
    graft.operators.SemDedup.semDedup(base.unionByName(planted), "vec_id", "v",
      nCells = 8, threshold = 0.9)
      .select($"id".as("vec_id"), $"cell", $"kept")
  }

  /** q461 — SemDeDup on the LOG-DEPTH centroid tree ([[graft.operators
    * .SemDedup.assignCellsTree]]): q130's planted corpus assigned down
    * a 40 → 5 seed ladder (fanout 8, one descent level) instead of one
    * flat fold — the Θ(n·f·log_f k) assignment the million-cell regime
    * needs; every routing is the same argmax-cosine/smallest-tie fold,
    * so the oracle replays the ladder stage for stage and the planted
    * near-dups must still drop. */
  def q461SemDedupTree(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select($"vec_id".cast("long").as("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val planted = base.where($"vec_id" % 15 === 0)
      .select(($"vec_id" + 10000L).as("vec_id"),
        expr("transform(v, x -> x * cast(1.01 as double) + cast(0.001 as double))").as("v"))
    val corpus = base.unionByName(planted)
    val cents = graft.operators.SemDedup.smallestIdCentroids(
      corpus, "vec_id", "v", 40)
    graft.operators.SemDedup.semDedupTree(corpus, "vec_id", "v", cents,
        fanout = 8, threshold = 0.9)
      .select($"id".as("vec_id"), $"cell", $"kept")
  }

  /** q475 — cell-blocked DBSCAN ([[graft.operators.Similarity
    * .dbscanCells]]): density labels (core / border / noise + min-id
    * cluster) over the embedding corpus. Random 64-dim vectors never
    * cross simMin = 0.95 (measured organic max ~0.51), so every 25th
    * vector grows a planted BLEND CHAIN toward its own reversal —
    * v_k = (1 − k/10)·v + (k/10)·reverse(v), k = 1..5 — along which
    * cosine degrades gradually: chain interiors clear minPts = 4 and
    * go core, the far ends neighbor only one core (border) or none
    * (noise). Assignment is the 8-smallest-id-centroid broadcast fold;
    * the oracle replays assignment, the cell-keyed pair stage, and a
    * 7-round min-label unroll with a loud fixpoint guard. */
  def q475Dbscan(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select($"vec_id".cast("long").as("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val chain = base.where($"vec_id" % 25 === 0)
      .crossJoin(spark.range(1, 6).select($"id".as("k")))
      .select(($"vec_id" + $"k" * 10000L).as("vec_id"),
        expr("zip_with(v, reverse(v), " +
          "(x, y) -> (1.0d - k/10.0d) * x + (k/10.0d) * y)").as("v"))
    val corpus = base.unionByName(chain)
    val cents = graft.operators.SemDedup.smallestIdCentroids(
      corpus, "vec_id", "v", 8)
    graft.operators.Similarity.dbscanCells(corpus, "vec_id", "v", cents,
        simMin = 0.95, minPts = 4)
      .select($"id".as("vec_id"), $"cell", $"n_nbrs", $"is_core", $"cluster")
  }

  /** q131 — full Gopher rule census ([[graft.operators.Gopher]]): docs
    * re-lined into 12-token rows, then deterministic rule-breakers
    * planted on disjoint-enough id grids — %13 truncated to 10 words
    * (word-count fail), %11 all-bullet lines (bullet fail), %7 every line
    * ellipsis-terminated (ellipsis fail), %5 eight '#' tokens appended
    * (symbol fail) — and the per-source failure census must pin each
    * planted population. Counts only (longs), so the cross-engine hash
    * has no float surface. */
  def q131GopherCensus(spark: SparkSession, dir: String): DataFrame = {
    val lined = docs(spark, dir)
      .select($"doc_id", $"source", split(lower(trim($"text")), "\\s+").as("toks"))
      .select($"doc_id", $"source",
        when($"doc_id" % 13 === 0, expr("slice(toks, 1, 10)")).otherwise($"toks").as("toks"))
      .select($"doc_id", $"source", expr(
        """transform(sequence(0, int(ceil(size(toks) / 12.0)) - 1),
          |i -> concat_ws(' ', slice(toks, i * 12 + 1, 12)))""".stripMargin).as("ls"))
      .select($"doc_id", $"source",
        when($"doc_id" % 11 === 0, expr("transform(ls, l -> concat('- ', l))"))
          .when($"doc_id" % 7 === 0, expr("transform(ls, l -> concat(l, ' ...'))"))
          .otherwise($"ls").as("ls"))
      .select($"doc_id", $"source",
        when($"doc_id" % 5 === 0,
          concat(concat_ws("\n", $"ls"), lit(" # # # # # # # #")))
          .otherwise(concat_ws("\n", $"ls")).as("text"))
    graft.operators.Gopher.census(lined, "text", "source")
  }

  /** q132 — paragraph-level corpus-wide exact dedup ([[graft.operators
    * .Paragraphs.dedupParagraphs]]): docs re-lined into 12-token
    * paragraphs; a shared boilerplate paragraph planted on every %4==0
    * doc keeps exactly its first occurrence, and %6==0 docs repeat their
    * OWN first paragraph at the end (the within-doc case). md5 of the
    * reassembled text pins order and boundary precision. */
  def q132ParaDedup(spark: SparkSession, dir: String): DataFrame = {
    val lined = docs(spark, dir)
      .select($"doc_id", split(lower(trim($"text")), "\\s+").as("toks"))
      .select($"doc_id", expr(
        """transform(sequence(0, int(ceil(size(toks) / 12.0)) - 1),
          |i -> concat_ws(' ', slice(toks, i * 12 + 1, 12)))""".stripMargin).as("ls"))
      .select($"doc_id",
        when($"doc_id" % 6 === 0, concat($"ls", slice($"ls", 1, 1)))
          .otherwise($"ls").as("ls"))
      .select($"doc_id",
        when($"doc_id" % 4 === 0,
          concat(concat_ws("\n", $"ls"),
            lit("\nall rights reserved contact us for details")))
          .otherwise(concat_ws("\n", $"ls")).as("text"))
    graft.operators.Paragraphs.dedupParagraphs(lined, "doc_id", "text")
      .select($"doc_id", $"n_paras", $"n_dropped", md5($"kept_text").as("kept_md5"))
  }

  /** q133 — DSIR importance weights ([[graft.operators.Dsir]]): target =
    * English docs, features = 256 md5-prefix hash buckets, weight = mean
    * per-token ln p_target - ln p_raw. In-order fold (q121 pattern) keeps
    * the double sum bit-reproducible; the model is one broadcast map row,
    * the corpus never shuffles (plan-gated). The langs share most of the
    * synthetic vocabulary, so the SPREAD is small and smoothing biases
    * all means slightly negative — but English ranks strictly highest
    * (-0.0097 vs -0.0124..-0.0144 at sf0.01), which is the resampling
    * property DSIR uses. */
  def q133Dsir(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.importanceWeights(
      docs(spark, dir), "doc_id", "text", $"lang" === "en")
      .select($"doc_id", $"n_tok", round($"weight", 4).as("weight"))

  /** q135 — int8 scalar quantization of the embedding column
    * ([[graft.operators.Similarity.quantizeInt8]]): global per-dim
    * ranges, floor-coded bytes, midpoint dequantization, per-vector max
    * reconstruction error. codes_md5 pins every code of every vector;
    * the error column is exact double arithmetic in fixed order (floor,
    * not round, so no rounding-mode surface). */
  def q135Quantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    graft.operators.Similarity.quantizeInt8(emb, "vec_id", "v")
      .select($"vec_id",
        md5(concat_ws(",", expr("transform(codes, c -> cast(c as string))"))).as("codes_md5"),
        expr("aggregate(codes, 0L, (s, c) -> s + cast(c as bigint))").as("sum_code"),
        round($"max_abs_err", 6).as("max_abs_err"))
  }

  /** q136 — hard-negative mining for contrastive training: each vector's
    * top-5 cosine neighbors (via [[graft.operators.Similarity.knnJoin]]
    * at saturation — nProbe = nCells, so the ANN machinery must produce
    * the exact k-NN graph, q108's identity) crossed with labels; a HARD
    * NEGATIVE is a same-neighborhood vector with a different label — the
    * pairs a contrastive loss learns most from. Per vector: mismatch
    * count in the top-5 plus the highest-cosine mismatch (tie -> smallest
    * id). Exhaustive self-join replay in DuckDB — quadratic by nature,
    * so the check runs on a bounded id range (q108 precedent; the
    * operator itself takes nCells/nProbe for the tiered scale path). */
  def q136HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .where($"vec_id" < 300)
      .select($"vec_id", $"label",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val lab = emb.select($"vec_id", $"label")
    val knn = graft.operators.Similarity.knnJoin(
        emb, "vec_id", "v", k = 5, nCells = 16, nProbe = 16)
      .join(lab.select($"vec_id".as("probe_id"), $"label".as("p_label")), Seq("probe_id"))
      .join(lab.select($"vec_id".as("corpus_id"), $"label".as("c_label")), Seq("corpus_id"))
    val hard = knn.groupBy($"probe_id")
      .agg(
        sum(when($"c_label" =!= $"p_label", 1L).otherwise(0L)).as("n_hard"),
        max(when($"c_label" =!= $"p_label",
          struct($"cos", (-$"corpus_id").as("nid")))).as("best"))
    emb.select($"vec_id", $"label")
      .join(hard.select($"probe_id".as("vec_id"), $"n_hard", $"best"), Seq("vec_id"), "left")
      .select($"vec_id", $"label",
        coalesce($"n_hard", lit(0L)).as("n_hard"),
        (-$"best.nid").as("hard_id"),
        round($"best.cos", 4).as("hard_cos"))
  }

  /** q137 — per-source distribution drift ([[graft.operators.Divergence
    * .sourceDivergence]]): KL / reverse-KL of each source's token
    * distribution vs the corpus over the 256-bucket md5 feature space.
    * A deterministic drift is planted — src0 docs get four junk tokens
    * appended — and must surface as the max-KL source. Bucket-sorted
    * in-order folds keep the 256-term double sums bit-reproducible. */
  def q137SourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"source",
      when($"source" === "src0", concat($"text", lit(" zzqx zzqx zzqx zzqx")))
        .otherwise($"text").as("text"))
    graft.operators.Divergence.sourceDivergence(planted, "source", "text")
      .select($"grp".as("source"), $"n_tok",
        round($"kl", 6).as("kl"), round($"kl_rev", 6).as("kl_rev"))
  }

  /** q138 — winnowing fingerprints ([[graft.operators.Winnow]], the MOSS
    * screen): k=4 gram md5s, window w=8 minima, cross-doc shared-
    * fingerprint census. A 20-token passage planted on every %8==0 doc
    * is a >= w+k-1 shared run, so every planted doc MUST report shared
    * fingerprints (the winnowing guarantee); md5-string hashing keeps
    * the whole selection DuckDB-replayable. */
  def q138Winnow(spark: SparkSession, dir: String): DataFrame = {
    val passage = "wnnw shared passage alpha beta gamma delta epsilon zeta eta " +
      "theta iota kappa lambda mu nu xi omicron pi rho"
    val planted = docs(spark, dir).select($"doc_id",
      when($"doc_id" % 8 === 0, concat($"text", lit(" " + passage)))
        .otherwise($"text").as("text"))
    graft.operators.Winnow.sharedFingerprintCensus(planted, "doc_id", "text",
      k = 4, w = 8)
  }

  /** q139 — bigram LM quality scoring with unigram backoff (the step
    * from q121's unigram toward CCNet's KenLM: P(w2|w1) where the bigram
    * is known, unigram probability + a ln(10) backoff penalty where
    * not). Both count maps ride as single broadcast rows (the corpus
    * vocabulary bounds them; a web-scale run caps to top-K exactly like
    * q121's 1000-word vocab); scoring is an in-order fold over the
    * bigram stream — a pure projection, the corpus never shuffles.
    * Single-token docs have no bigrams -> null score, row kept. */
  def q139BigramLm(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"doc_id", split(lower(trim($"text")), "\\s+").as("toks"))
    val uni = toks.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val uniTotal = uni.agg(sum($"c").cast("double").as("n_total"))
    // both maps carry PRECOMPUTED per-entry NLL: broadcast-map lookup is
    // a linear scan of ArrayBasedMapData, so the fold wants ONE short
    // lookup per pair, not count arithmetic over two maps (13.6s -> ~1s
    // at sf0.1). Bigram model capped to the top 300 (the CCNet-style
    // top-K cap a web-scale model needs anyway); the rest back off.
    val bi = toks
      .select(explode(graft.operators.Dedup.rawShingles($"toks", 2)).as("bg"))
      .groupBy($"bg").agg(count(lit(1)).as("c"))
    val biTop = bi.orderBy($"c".desc, $"bg").limit(300)
      .select($"bg", split($"bg", " ").getItem(0).as("w1"), $"c")
      .join(uni.select($"w".as("w1"), $"c".as("cu")), Seq("w1"))
      .select($"bg", (-log($"c".cast("double") / $"cu".cast("double"))).as("l"))
    // sorted key/value arrays + the codegen'd binary-search kernel:
    // element_at on a broadcast map linear-scans ArrayBasedMapData
    // (~90M string compares across the corpus fold at sf0.1)
    val biModel = biTop.agg(
      expr("transform(array_sort(collect_list(struct(bg, l))), s -> s.bg)").as("bks"),
      expr("transform(array_sort(collect_list(struct(bg, l))), s -> s.l)").as("bvs"))
    val uniModel = uni.crossJoin(broadcast(uniTotal))
      .select($"w", (-log($"c".cast("double") / $"n_total") + log(lit(10.0d))).as("l"))
      .agg(
        expr("transform(array_sort(collect_list(struct(w, l))), s -> s.w)").as("uks"),
        expr("transform(array_sort(collect_list(struct(w, l))), s -> s.l)").as("uvs"))
    val oov = uniTotal.select((-log(lit(1.0d) / $"n_total") + log(lit(10.0d))).as("oov_l"))
    toks.crossJoin(broadcast(uniModel)).crossJoin(broadcast(biModel))
      .crossJoin(broadcast(oov))
      .withColumn("pairs", expr(
        """zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),
          |  (a, b) -> named_struct('bg', concat(a, ' ', b), 'w2', b))""".stripMargin))
      .withColumn("nll", aggregate($"pairs", lit(0.0d), (s, p) =>
        s + coalesce(
          graft.functions.FastHash.sortedLookup($"bks", $"bvs", p.getField("bg")),
          graft.functions.FastHash.sortedLookup($"uks", $"uvs", p.getField("w2")),
          $"oov_l")))
      .select($"doc_id", size($"toks").cast("long").as("n_tok"),
        when(size($"toks") > 1,
          round($"nll" / (size($"toks") - 1), 4)).as("mean_nll_bi"))
  }

  /** q140 — Misra–Gries at SATURATING k ([[graft.operators.Heavy]]):
    * with k-1 counters exceeding the distinct-token count (31 in this
    * corpus), no decrement ever fires and the mergeable summary must
    * equal the exact census — the q134 saturation identity applied to
    * the heavy-hitter sketch, giving the O(k)-state scale path (only
    * k-sized maps shuffle, unbounded-vocab-safe) a cross-engine oracle
    * on top of its undercount-bound specs. */
  def q140MgSaturation(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Heavy.heavyHitters(docs(spark, dir), "text", k = 64)

  /** q141 — TIERED substring dedup (the production composition): the
    * winnowing screen (q138's operator, k=4 w=8) flags candidate docs,
    * and the exact span detector (q118's operator, k=15) runs ONLY on
    * the flagged subset. The winnowing guarantee makes the tiering
    * LOSSLESS for spans of >= w+k-1 = 11 tokens: both members of any
    * shared 15-token run must share a fingerprint, so restricting the
    * span detector to flagged docs loses nothing — spec-asserted equal
    * to q118 on the full fixture, oracle-replayed as the same two-stage
    * composition. Output: every flagged doc with its span census
    * (flagged-but-clean rows = the screen's false positives, 0 spans). */
  def q141TieredDedup(spark: SparkSession, dir: String): DataFrame = {
    val fixture = spanFixture(spark, dir)
    val flagged = graft.operators.Winnow
      .sharedFingerprintCensus(fixture, "doc_id", "text", k = 4, w = 8)
      .where($"n_shared_fp" > 0).select($"doc_id")
    val sub = fixture.join(flagged, Seq("doc_id"), "left_semi")
    val census = graft.operators.Spans.duplicatedSpans(sub, "doc_id", "text", k = 15)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"), sum($"span_tokens").as("span_tokens_total"))
    flagged.join(census, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"span_tokens_total", lit(0L)).as("span_tokens_total"))
  }

  /** q142 — targeted decontamination MASKING ([[graft.operators
    * .Decontam.maskContaminated]]), the repair step after q89/q110's
    * detection: q89's exact fixture (test = docs < 10, train = docs >=
    * 10 plus id-shifted copies of docs < 5), but instead of flagging
    * whole docs, only the overlapping 8-gram windows are nulled. The
    * planted full copies must mask to (almost) nothing; every %13==7
    * train doc carries a 12-token test-set snippet APPENDED — exactly
    * those 12 tokens must vanish and the rest survive (the partial-mask
    * case that is the operator's whole point); clean docs pass through
    * byte-identical. Pure projection over a broadcast sorted shingle
    * array — no corpus shuffle (plan-gated). */
  def q142DecontamMask(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val test = d.where($"doc_id" < 10)
    // 12 leading tokens of test doc 0 — a leaked benchmark sentence
    val snippet = d.where($"doc_id" === 0)
      .select(concat_ws(" ",
        slice(split(lower(trim($"text")), "\\s+"), 1, 12)).as("snip"))
    val train = d.where($"doc_id" >= 10)
      .unionByName(d.where($"doc_id" < 5)
        .select(($"doc_id" + 2000).as("doc_id"), $"text"))
      .crossJoin(broadcast(snippet))
      .select($"doc_id",
        when($"doc_id" % 13 === 7 && $"doc_id" < 2000,
          concat($"text", lit(" "), $"snip")).otherwise($"text").as("text"))
    graft.operators.Decontam.maskContaminated(
      train, "doc_id", "text", test, "text", k = 8)
      .select($"doc_id", $"n_tok", $"n_masked", md5($"kept_text").as("kept_md5"))
  }

  /** q143 — encoding-corruption census (the mojibake / replacement-char
    * QA pass a multilingual crawl needs before any text op): per source,
    * docs and occurrence counts of UTF-8 double-encoding artifacts
    * ('Ã'-prefixed sequences — 'café' read as latin-1 then re-encoded)
    * and U+FFFD replacement characters (decoder gave up). The corpus is
    * clean ASCII, so both pathologies are planted on disjoint id grids.
    * Counts only; char-exact occurrence arithmetic via the length-delta
    * idiom (both engines count CHARACTERS, not bytes). */
  def q143MojibakeCensus(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"doc_id", $"source",
      concat($"text",
        when($"doc_id" % 6 === 2, lit(" cafÃ© naÃ¯ve")).otherwise(lit("")),
        when($"doc_id" % 17 === 3, lit(" bad�token")).otherwise(lit("")))
        .as("text"))
    def occ(needle: String): org.apache.spark.sql.Column =
      length($"text") - length(replace($"text", lit(needle), lit("")))
    planted
      .select($"source",
        occ("Ã").as("n_moji"),
        occ("�").as("n_repl"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(($"n_moji" > 0).cast("long")).as("docs_mojibake"),
        sum(($"n_repl" > 0).cast("long")).as("docs_replacement"),
        sum($"n_moji").cast("long").as("mojibake_chars"),
        sum($"n_repl").cast("long").as("replacement_chars"))
  }

  /** q144 — token-budget prefix subsample ([[graft.operators.GlobalOrder
    * .budgetedPrefix]]): the first 15,000 tokens of the deterministic
    * (md5(id), id) permutation — the "give me N tokens, reproducibly"
    * selection. The two-phase bucketed running sum keeps the plan free
    * of any global window (plan-gated); the oracle IS the naive global
    * ordered cumulative sum. */
  def q144TokenBudget(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GlobalOrder.budgetedPrefix(
      docs(spark, dir).select($"doc_id",
        TextOps.tokenCount($"text").cast("long").as("n_tok")),
      "doc_id", "n_tok", budget = 15000L)
      .select($"doc_id", $"n_tok", $"cum_w".as("cum_tokens"))

  /** q145 — REAL multi-frame decode ([[graft.multimodal.Multimodal
    * .videoFrameStats]], javax.imageio animated GIF): per-doc synthetic
    * GIFs with id-varying dims and frame counts decode to one row per
    * frame with exact gray sums (8-level gray palettes round-trip
    * losslessly, so the oracle replays the codec as closed-form
    * arithmetic — the q117/q120 trick at multi-frame granularity).
    * Every 9th payload is corrupt text: null stats, row kept. */
  def q145VideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = docs(spark, dir).where($"doc_id" < 30).select($"doc_id", $"text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val withGif = base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 9 == 0) r.getString(1).getBytes("UTF-8") // corrupt blob
          else graft.multimodal.Multimodal.syntheticGif(
            id, (6 + id % 5).toInt, (5 + id % 3).toInt, (2 + id % 4).toInt)
        Row(id, payload)
      }
    }(enc)
    graft.multimodal.Multimodal.videoFrameStats(withGif, "payload")
      .select($"doc_id", $"frame_idx", $"width", $"height", $"sum_gray")
  }

  /** q146 — training-data pipeline capstone (the C4-recipe sibling of
    * q129's relational ingest): full Gopher rule gate (minWords = 10 for
    * this corpus's short docs) -> exact dedup keep-first on the gated
    * survivors -> per-lang census with surviving token mass. All three
    * stages are proven operators composed in ONE plan; shuffles only at
    * the digest keep-first and the tiny final groupBy (q129 shape).
    * Every 10th doc re-appears id-shifted (q71's planted dup clusters),
    * so the dedup stage measurably fires: n_final < n_gated. */
  def q146TrainingE2E(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"lang", $"text")
    val corpus = d.unionByName(d.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 100000L).as("doc_id"), $"lang", $"text"))
    val m = graft.operators.Gopher.metrics(corpus, "text", minWords = 10)
      .withColumn("digest", md5(lower(trim($"text"))))
    val keep = m.where($"gopher_pass")
      .groupBy($"digest").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", lit(true).as("is_final"))
    m.join(keep, Seq("doc_id"), "left")
      .withColumn("fin", coalesce($"is_final", lit(false)))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_in"),
        sum(when($"gopher_pass", 1L).otherwise(0L)).as("n_gated"),
        sum(when($"fin", 1L).otherwise(0L)).as("n_final"),
        sum(when($"fin", $"n_words").otherwise(0L)).as("final_tokens"))
  }

  /** q147 — content-defined chunk dedup census ([[graft.operators
    * .Chunker]]): the corpus (with every 10th doc re-ingested id-shifted,
    * the q146 fixture) splits into CDC chunks — boundary after any token
    * whose md5 opens with '0'/'1', so boundaries survive edits and the
    * re-ingested copies chunk IDENTICALLY to their originals — and the
    * census reports, per chunk width, how many instances dedup storage
    * recognizes as already held (`dup_occurrences`). The chunker is a
    * one-pass codegen'd kernel in the scan projection; the only shuffles
    * key on the (uniform) chunk digest. DuckDB replays the boundary rule
    * with substr(md5(tok),1,1) and a windowed prefix-sum. */
  def q147CdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val corpus = d.unionByName(d.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text"))
    graft.operators.Chunker.chunkDedupCensus(corpus, "doc_id", "text")
  }

  /** q148 — temperature-scaled language mixture ([[graft.operators
    * .Mixture]], the mT5 p^alpha rebalancing at alpha = 0.5): per-lang
    * character mass flattens to sampling weights, a 1M-token budget
    * allocates by weight, and `boost` exposes the up/down-sampling each
    * lang receives. One corpus aggregation; the normalizer folds the
    * five weights in lang order so every double replays bit-identically
    * (sqrt is IEEE-correctly-rounded — the reason alpha = 0.5). */
  def q148TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Mixture.temperatureWeights(
      docs(spark, dir), "lang", "n_chars", alpha = 0.5, budget = 1000000L)

  /** q149 — exact integer Gram matrix over int8-quantized embeddings
    * ([[Similarity.integerGram]] composed over [[Similarity
    * .quantizeInt8]], first 8 dims): the covariance/whitening-prep
    * primitive as one aggregation pass — 36 upper-triangle BIGINT sums
    * combined map-side, never a vector shuffle, and integer codes make
    * the reduction order-insensitive (the property a double Gram loses
    * on a 1000-executor reduce tree). DuckDB replays quantization (q135
    * oracle) then the pair grid. */
  def q149QuantizedGram(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val codes = Similarity.quantizeInt8(emb, "vec_id", "v")
      .select($"vec_id", $"codes")
    Similarity.integerGram(codes, "codes", dims = 8)
  }

  /** q150 — source templatedness census (the boilerplate-source detector
    * a crawl-mixing pipeline runs before weighting sources): per source,
    * raw 3-gram occurrence mass vs distinct grams, and the concentration
    * captured by the modal gram and the top-10 grams. A templated/spammy
    * source concentrates its mass in few grams; src1 is planted with a
    * fixed "subscribe ..." footer so the signal discriminates. The
    * per-source top-k rides [[graft.operators.TopK.topKStrPerGroup]] —
    * k-bounded aggregate state, so the (source, gram) count table never
    * needs a per-source global sort (the window-function path dies on a
    * billion-gram source; the bounded aggregate doesn't). */
  def q150Templatedness(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"source",
      when($"source" === "src1",
        concat($"text", lit(" subscribe to our newsletter today")))
        .otherwise($"text").as("text"))
    val grams = planted.select($"source",
      explode(Dedup.rawShingles(split(lower(trim($"text")), "\\s+"), 3)).as("gram"))
    val counts = grams.groupBy($"source", $"gram").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy($"source")
      .agg(sum($"c").as("gram_occurrences"), count(lit(1)).as("grams_distinct"))
    val top = graft.operators.TopK.topKStrPerGroup(counts, "source", "gram", "c", k = 10)
    val t1 = top.where($"rank" === 1)
      .select($"source", $"gram".as("top_gram"), $"c".cast("long").as("top_c"))
    val t10 = top.groupBy($"source").agg(sum($"c").cast("long").as("top10_c"))
    totals.join(t1, Seq("source")).join(t10, Seq("source"))
      .select($"source", $"grams_distinct", $"gram_occurrences", $"top_gram",
        round($"top_c".cast("double") / $"gram_occurrences".cast("double"), 4).as("top1_share"),
        round($"top10_c".cast("double") / $"gram_occurrences".cast("double"), 4).as("top10_share"))
  }

  /** q151 — ingestion-freshness curve ([[graft.operators.Freshness]]):
    * per 100-doc ingestion slice, the share of its distinct 8-grams
    * first seen in that slice. Docs with id % 4 == 1 are re-ingested
    * id-shifted to the tail, so the trailing slices' novelty measurably
    * collapses (a stale source re-serving held content) while untouched
    * slices stay ~1.0. First occurrence is a gram-keyed min AGGREGATE —
    * no global ordered scan — so the curve costs two uniform shuffles
    * at any corpus size. */
  def q151NoveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val corpus = d.unionByName(d.where($"doc_id" % 4 === 1)
      .select(($"doc_id" + 10000L).as("doc_id"), $"text"))
    graft.operators.Freshness.noveltyBySlice(corpus, "doc_id", "text",
      n = 8, sliceSize = 100L)
  }

  /** q152 — context-window fit census: for each candidate sequence
    * length, how many docs fit whole and what token share survives
    * truncation — the planning pass that sizes a training context
    * window against a corpus. Long format (lang, limit) so one scan
    * covers every candidate; all counts integer, one final division. */
  def q152ContextFit(spark: SparkSession, dir: String): DataFrame = {
    val t = docs(spark, dir).select($"lang",
      when(length(trim($"text")) === 0, 0L)
        .otherwise(size(split(trim($"text"), "\\s+")).cast("long")).as("n_tok"))
    t.withColumn("limit", explode(array(lit(16L), lit(32L), lit(64L))))
      .groupBy($"lang", $"limit")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_tok" <= $"limit", 1L).otherwise(0L)).as("docs_fit"),
        sum($"n_tok").as("tokens_total"),
        sum(least($"n_tok", $"limit")).as("tokens_kept"))
      .withColumn("keep_rate",
        round($"tokens_kept".cast("double") / $"tokens_total".cast("double"), 4))
  }

  /** q153 — token composition census (corpus profiling before tokenizer
    * training: how much of each source is numbers, code identifiers,
    * capitalized words): per source, integer token-class counts over
    * RAW (case-preserving) tokens and their shares. The fixture corpus
    * is all lowercase prose, so numeric/code/capitalized tokens are
    * planted on disjoint id grids. Shares divide two exact BIGINTs —
    * no order-sensitive double aggregation anywhere. */
  def q153TokenComposition(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"source",
      concat($"text",
        when($"doc_id" % 5 === 2, lit(" 1,234 42% 3.14")).otherwise(lit("")),
        when($"doc_id" % 7 === 3, lit(" get_user() parse_args(x)")).otherwise(lit("")),
        when($"doc_id" % 11 === 5, lit(" Berlin Tokyo NASA")).otherwise(lit("")))
        .as("text"))
    val toks = planted.select($"source",
      explode(split(trim($"text"), "\\s+")).as("tok"))
    toks.groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"tok".rlike("^[0-9][0-9.,%]*$"), 1L).otherwise(0L)).as("n_numeric"),
        sum(when($"tok".rlike("[_(){}]"), 1L).otherwise(0L)).as("n_code"),
        sum(when($"tok".rlike("^[A-Z]"), 1L).otherwise(0L)).as("n_capitalized"))
      .select($"source", $"n_tokens", $"n_numeric", $"n_code", $"n_capitalized",
        round($"n_numeric".cast("double") / $"n_tokens".cast("double"), 4).as("numeric_share"),
        round($"n_code".cast("double") / $"n_tokens".cast("double"), 4).as("code_share"),
        round($"n_capitalized".cast("double") / $"n_tokens".cast("double"), 4).as("capitalized_share"))
  }

  /** q154 — Poisson-bootstrap replicate census ([[graft.operators
    * .Bootstrap]]): 5 deterministic hash-weighted replicates of the
    * per-lang doc count and char mass. The spread across replicates IS
    * the sampling noise of those corpus metrics — computed in one pass,
    * no resampling, exact integer sums per replicate. */
  def q154PoissonBootstrap(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bootstrap
      .poissonReplicates(docs(spark, dir), "doc_id", replicates = 5)
      .groupBy($"lang", $"replicate")
      .agg(sum($"weight").as("n_eff"),
        sum($"weight" * $"n_chars").as("mass_eff"))

  /** q155 — quality-aware dedup canonicalization ([[graft.operators
    * .Components.canonicalizeBy]]): exact-dup clusters (planted 2- and
    * 3-member copies) keep the member with the HIGHEST quality score
    * (md5-derived stand-in for an upstream model score), ties by
    * smallest id — the keep-best policy production dedup actually runs,
    * vs the keep-first of q107/q129. Winner election is one
    * max(struct) aggregate per component; the oracle replays the
    * transitive closure as per-digest windows (star pairs within a
    * digest group are connected, so component = min id of the group). */
  def q155QualityCanonical(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val corpus = d
      .unionByName(d.where($"doc_id" % 10 === 0)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text"))
      .unionByName(d.where($"doc_id" % 20 === 0)
        .select(($"doc_id" + 200000L).as("doc_id"), $"text"))
    val withQ = corpus.select($"doc_id",
      md5(lower(trim($"text"))).as("digest"),
      conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
        .cast("long").as("quality"))
    val dupGroups = withQ.groupBy($"digest")
      .agg(min($"doc_id").as("id_a"), collect_list($"doc_id").as("ids"))
      .where(size($"ids") > 1)
    val pairs = dupGroups.select($"id_a", explode($"ids").as("id_b"))
      .where($"id_a" =!= $"id_b")
    graft.operators.Components.canonicalizeBy(
        withQ, "doc_id", "quality", pairs, "id_a", "id_b")
      .select($"doc_id", $"component", $"quality", $"kept")
  }

  /** q156 — bootstrap confidence intervals (the read-out of q154): per
    * lang, mean and spread of the replicate doc counts, CI95 = mean +-
    * 1.96 * sd (across-replicate sd IS the Poisson bootstrap's standard
    * error). The moments fold replicate-ordered integer sums in a fixed
    * order, so the doubles replay bit-identically cross-engine. */
  def q156BootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val reps = graft.operators.Bootstrap
      .poissonReplicates(docs(spark, dir), "doc_id", replicates = 5)
      .groupBy($"lang", $"replicate")
      .agg(sum($"weight").as("n_eff"))
    val m = reps.groupBy($"lang")
      .agg(count(lit(1)).as("n_replicates"),
        expr("""aggregate(transform(array_sort(collect_list(struct(replicate, n_eff))),
          |  s -> cast(s.n_eff as double)), cast(0.0 as double), (a, x) -> a + x)""".stripMargin)
          .as("s1"),
        expr("""aggregate(transform(array_sort(collect_list(struct(replicate, n_eff))),
          |  s -> cast(s.n_eff as double) * cast(s.n_eff as double)),
          |  cast(0.0 as double), (a, x) -> a + x)""".stripMargin).as("s2"))
      .withColumn("mean_n_eff", $"s1" / $"n_replicates".cast("double"))
      .withColumn("sd_n_eff",
        // greatest(,0): float cancellation can leave an all-equal
        // replicate set at -epsilon, and sqrt must not see it
        sqrt(greatest(($"s2" - $"s1" * $"s1" / $"n_replicates".cast("double")) /
          ($"n_replicates" - 1).cast("double"), lit(0.0d))))
    m.select($"lang", $"n_replicates",
      round($"mean_n_eff", 4).as("mean_n_eff"),
      round($"sd_n_eff", 4).as("sd_n_eff"),
      round($"mean_n_eff" - lit(1.96d) * $"sd_n_eff", 4).as("ci95_lo"),
      round($"mean_n_eff" + lit(1.96d) * $"sd_n_eff", 4).as("ci95_hi"))
  }

  /** q157 — character-entropy quality signal (the compression-proxy
    * filter: near-zero entropy = repetitive junk, ~max entropy = random
    * noise; prose sits in between): per doc, Shannon entropy in bits of
    * the character distribution. Every %8==1 doc gets a low-entropy run
    * appended so the flag discriminates. The (doc, char)-keyed census is
    * two uniform map-side-combined shuffles; the entropy itself uses the
    * algebraic form ln(n) - (sum k*ln k)/n with the sum folded in char
    * order — deterministic doubles, no per-row giant arrays. */
  def q157CharEntropy(spark: SparkSession, dir: String): DataFrame = {
    val pl = docs(spark, dir).select($"doc_id",
      when($"doc_id" % 8 === 1,
        concat($"text", lit(" "), expr("repeat('z', 400)")))
        .otherwise($"text").as("text"))
    val cc = pl.select($"doc_id", explode(split($"text", "")).as("c"))
      .groupBy($"doc_id", $"c").agg(count(lit(1)).as("k"))
    cc.groupBy($"doc_id")
      .agg(sum($"k").as("n"), count(lit(1)).as("n_distinct_chars"),
        expr("""aggregate(transform(array_sort(collect_list(struct(c, k))),
          |  s -> cast(s.k as double) * ln(cast(s.k as double))),
          |  cast(0.0 as double), (a, x) -> a + x)""".stripMargin).as("s"))
      .select($"doc_id", $"n", $"n_distinct_chars",
        round((log($"n".cast("double")) - $"s" / $"n".cast("double")) /
          log(lit(2.0d)), 4).as("entropy_bits"))
      .withColumn("low_entropy", $"entropy_bits" < 3.0)
  }

  /** q158 — sampling-plan capstone: [[graft.operators.Mixture]] weights
    * (alpha = 0.5) over SOURCES size a 30%-of-corpus budget (rational
    * in-plan arithmetic — no driver pre-aggregation), each source's
    * allocation becomes an md5-threshold keep-rate ([[graft.operators
    * .Splits]] mechanics, capped at 1: upsampling is the boost factor's
    * job, a filter cannot oversample), and the census reports target vs
    * achieved rate per source. The plan table is 20 rows crossing back
    * as a broadcast; the corpus is scanned once and never shuffled
    * before the final census. */
  def q158SamplingPlan(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val w = graft.operators.Mixture.temperatureWeightsFraction(
      d.select($"source", $"n_chars"), "source", "n_chars",
      alpha = 0.5, num = 3, den = 10)
    val plan = w.select($"source", $"mass", $"alloc",
        least(lit(1.0d), $"alloc".cast("double") / $"mass".cast("double")).as("rate"))
      .withColumn("threshold", floor($"rate" * 256).cast("int"))
    val kept = d.join(broadcast(plan), "source")
      .where($"threshold" >= 256 ||
        substring(md5($"doc_id".cast("string")), 1, 2) <
          lower(lpad(hex($"threshold"), 2, "0")))
      .groupBy($"source")
      .agg(count(lit(1)).as("k_docs"), sum($"n_chars").as("k_chars"))
    d.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .join(plan.select($"source", $"rate"), "source")
      .join(kept, Seq("source"), "left")
      .select($"source", $"n_docs",
        coalesce($"k_docs", lit(0L)).as("n_kept"),
        coalesce($"k_chars", lit(0L)).as("chars_kept"),
        round($"rate", 4).as("target_rate"),
        round(coalesce($"k_docs", lit(0L)).cast("double") /
          $"n_docs".cast("double"), 4).as("achieved_rate"))
  }

  /** q162 — within-doc repetition masking ([[graft.functions.FastHash
    * .maskRepeatedValue]]), the REPAIR step for docs the q100 Gopher
    * repetition rule flags: later occurrences of any repeated 3-gram
    * drop (their covered tokens vanish), first occurrences survive —
    * completing the mask family (within-doc here, cross-doc q119,
    * test-set leaks q142). Every 9th doc is planted doubled, so the
    * operator measurably fires; clean docs pass through normalized but
    * token-identical. Pure projection — zero shuffles before the
    * output. DuckDB replays the cover array with positional list ops. */
  def q162MaskRepeated(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"doc_id",
      when($"doc_id" % 9 === 0, concat($"text", lit(" "), $"text"))
        .otherwise($"text").as("text"))
    planted.select($"doc_id",
        size(split(lower(trim($"text")), "\\s+")).cast("long").as("n_tok"),
        graft.functions.FastHash.maskRepeated($"text", 3).as("kept_text"))
      // token 1 can never be covered (position-1 grams have no earlier
      // twin), so kept_text is empty only for empty input — the plain
      // split-count difference is exact everywhere
      .select($"doc_id", $"n_tok",
        ($"n_tok" - size(split($"kept_text", " ")).cast("long")).as("n_masked"),
        md5($"kept_text").as("kept_md5"))
  }

  /** q163 — BPE merge-pair census (the inner loop of tokenizer
    * training, distributed): the top-20 adjacent within-word character
    * pairs by corpus frequency — exactly the statistic a BPE trainer
    * computes to pick its next merge. Pairs ride the q150 bounded
    * [[graft.operators.TopK.topKStrPerGroup]] path (single group), so
    * only k-row summaries survive the pair census shuffle; ranks replay
    * as row_number over (count DESC, pair ASC). */
  def q163BpePairs(spark: SparkSession, dir: String): DataFrame = {
    val words = docs(spark, dir)
      .select(explode(split(lower(trim($"text")), "\\s+")).as("w"))
    // single-char words first: sequence(1, 0) counts DOWN (the Spans
    // guard), so they must never reach the transform
    val pairs = words.where(length($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("c"))
    graft.operators.TopK
      .topKStrPerGroup(pairs.withColumn("g", lit("all")), "g", "pair", "c", k = 20)
      .select($"rank", $"pair", $"c".cast("long").as("n_occurrences"))
  }

  /** q164 — perplexity-bucketed corpus partition (the CCNet
    * head/middle/tail move): q139's bigram-LM scores split the corpus
    * into terciles by NTILE over the total (score, doc_id) order, and
    * the census reports per (lang, bucket) doc counts with the exact
    * score range (min/max are order-insensitive on doubles — no
    * averaged-double hash risk). The global ntile sorts only the
    * narrow score table (q24's precedent); at full scale the q105
    * two-phase bucketed pattern replaces the single window. */
  def q164PerplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scored = q139BigramLm(spark, dir).select($"doc_id", $"mean_nll_bi")
    val lang = docs(spark, dir).select($"doc_id", $"lang")
    val w = Window.orderBy($"mean_nll_bi", $"doc_id")
    scored.where($"mean_nll_bi".isNotNull) // engines order NULLs differently
      .join(lang, "doc_id")
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(min($"mean_nll_bi"), 4).as("nll_min"),
        round(max($"mean_nll_bi"), 4).as("nll_max"))
  }

  /** q165 — leakage-free train/val/test split (the near-dup-aware carve
    * an eval pipeline MUST run: splitting doc-wise puts one copy of a
    * duplicate in train and its twin in test — memorization leaks):
    * dup components (q155's fixture and closure) are assigned WHOLE to
    * splits by hashing the COMPONENT id through [[graft.operators
    * .Splits.hashSplit]], so a cluster can never straddle; the census
    * counts docs and components per split and replays the md5-prefix
    * thresholds cross-engine. `leaked` (components seen in >1 split)
    * is structurally 0 — the column is the audit a reviewer greps. */
  def q165LeakFreeSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"text")
    val corpus = d.unionByName(d.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text"))
    val withDigest = corpus.select($"doc_id", md5(lower(trim($"text"))).as("digest"))
    val dupGroups = withDigest.groupBy($"digest")
      .agg(min($"doc_id").as("id_a"), collect_list($"doc_id").as("ids"))
      .where(size($"ids") > 1)
    val pairs = dupGroups.select($"id_a", explode($"ids").as("id_b"))
      .where($"id_a" =!= $"id_b")
    val labeled = graft.operators.Components.canonicalize(
        withDigest.select($"doc_id"), "doc_id", pairs, "id_a", "id_b")
      .select($"doc_id", $"component")
    val split = graft.operators.Splits.hashSplit(
      labeled, "component", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val leaks = split.groupBy($"component")
      .agg(countDistinct($"split").as("n_splits"))
      .agg(sum(when($"n_splits" > 1, 1L).otherwise(0L)).as("leaked"))
    split.groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"component").as("n_components"))
      .crossJoin(broadcast(leaks))
  }

  /** q166 — perceptual-hash image near-dup ([[graft.multimodal.ImageDedup]]):
    * REAL PNG decode → 8×8 block-mean aHash → 4×16-bit bands → bucket
    * self-join → exact Hamming verify. Fixture: 120 deterministic 16×16
    * gray PNGs in 40 groups of 3 (original / exact copy / sum-preserving
    * corner-swap near-dup — see [[graft.multimodal.Multimodal
    * .syntheticGrayPng]]); every doc_id % 29 == 3 payload is corrupt raw
    * text, pinning null-band drop inside the dedup path. The perturbation
    * is confined to band 0 and preserves the hash mean, so every
    * within-threshold pair collides on bands 1–3 and the banded pipeline
    * EQUALS the exhaustive Hamming-pair set the oracle computes from the
    * closed-form pixel grid (q117's lossless-PNG trick, extended from
    * decode stats to the whole dedup pipeline). */
  def q166ImagePhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = docs(spark, dir).where($"doc_id" < 120).select($"doc_id", $"text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val withImg = base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 29 == 3) r.getString(1).getBytes("UTF-8") // corrupt blob
          else graft.multimodal.Multimodal.syntheticGrayPng(
            id % 40, 16, 16, swapCorner = id >= 80)
        Row(id, payload)
      }
    }(enc)
    graft.multimodal.ImageDedup.nearDupPairs(
      withImg, "doc_id", "payload", maxHamming = 10)
  }

  /** q170 — Count-Min sketch frequency estimation ([[graft.operators
    * .Sketches.cmsBuild]]/`cmsEstimate`): token counts through a 4x512
    * sketch, probed for every distinct token of the first three docs,
    * with the exact count joined alongside (over-estimation is the
    * sketch's one-sided contract: cms_count >= true count, and at
    * width 512 on a ~4k-token vocabulary real collisions occur, so the
    * `over` column is genuinely non-zero — the oracle replays the full
    * sketch, not just the happy path). Scale shape: ONE corpus-scale
    * pass — the per-token exact census (map-side combined, then
    * materialized once) — feeds BOTH the sketch cells
    * ([[graft.operators.Sketches.cmsBuildWeighted]] explodes the
    * vocabulary, not the corpus) and the probe-side exact counts; the
    * probe scan itself prunes to doc_id < 3 at the parquet level. The
    * exact count here is the evaluation harness, not part of the
    * operator. */
  def q170CmsCounts(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"doc_id", explode(split(lower(trim($"text")), "\\s+")).as("tok"))
    val tokCounts = toks.groupBy($"tok").agg(count(lit(1)).as("true_count"))
      .localCheckpoint(true) // vocabulary-sized; reused by sketch + exact
    val sketch = graft.operators.Sketches.cmsBuildWeighted(
      tokCounts, "tok", "true_count", depth = 4, width = 512)
    val probes = toks.where($"doc_id" < 3).select($"tok").distinct()
    graft.operators.Sketches.cmsEstimate(sketch, probes, "tok", depth = 4, width = 512)
      .join(tokCounts, Seq("tok"))
      .select($"tok", $"cms_count", $"true_count",
        ($"cms_count" - $"true_count").as("overcount"))
  }

  /** q171 — weight-proportional sampling without replacement
    * ([[graft.operators.Splits.prioritySample]], Duffield–Lund–Thorup
    * priority sampling): 30 docs drawn with probability ~ character
    * mass, deterministically (u = 48-bit md5 prefix, priority =
    * n_chars/u, top-k by priority) — the "sample a few hundred docs by
    * token mass for eval" carve. Joined back to source for a visible
    * skew check: heavy sources should dominate the sample. Bounded
    * TopK shuffle + broadcast re-attach; the oracle replays the
    * ordering as ROW_NUMBER over (u/w, doc_id) — exact because u/w is
    * a single IEEE division on both engines. */
  def q171PrioritySample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"n_chars", $"source")
    val sample = graft.operators.Splits.prioritySample(d, "doc_id", "n_chars", k = 30)
    d.select($"doc_id", $"source")
      .join(broadcast(sample), Seq("doc_id")) // 30 winners broadcast, corpus scans
      .select($"rank", $"doc_id", $"n_chars", $"source")
  }

  /** q172 — per-dimension feature standardization census (the whitening
    * prep / feature-drift readout an embedding pipeline runs before
    * indexing): [[graft.operators.Similarity.quantizeInt8]] codes make
    * every per-dim sum an exact BIGINT (the q149 integer-Gram insight:
    * associativity removes float order-sensitivity at any cluster
    * size), then mean/sd come from the integer moments in one fixed
    * expression shape, and each dim reports its 3-sigma outlier count
    * (|code - mean| > 3sd on correctly-rounded doubles — comparison
    * inputs are identical cross-engine, no transcendentals). Scale:
    * posexploded (dim, code) pairs map-side-combine into 64-row
    * partials twice; the stats table broadcasts. */
  def q172DimStandardize(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val codes = graft.operators.Similarity.quantizeInt8(emb, "vec_id", "v")
      .select($"vec_id", $"codes")
    val cells = codes.select(posexplode($"codes").as(Seq("d", "c")))
    val stats = cells.groupBy($"d")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"),
        sum($"c".cast("long") * $"c".cast("long")).as("ss"))
      .select($"d", $"n",
        ($"s".cast("double") / $"n").as("mean"),
        sqrt(greatest($"ss".cast("double") / $"n" -
          ($"s".cast("double") / $"n") * ($"s".cast("double") / $"n"), lit(0.0))).as("sd"))
    val outs = cells.join(broadcast(stats), Seq("d"))
      .groupBy($"d")
      .agg(sum(when(abs($"c".cast("double") - $"mean") > lit(3.0) * $"sd", 1L)
        .otherwise(0L)).as("n_out3"))
    stats.join(outs, Seq("d"))
      .select($"d".cast("long").as("d"), $"n",
        round($"mean", 4).as("code_mean"), round($"sd", 4).as("code_sd"),
        $"n_out3")
  }

  /** q173 — Unicode script census (the writing-system readout behind
    * language-ID QA and tokenizer-coverage planning): per-doc counts of
    * Latin / Cyrillic / Han / Arabic letters via script character
    * classes, a fixed-precedence dominant script, and a census per
    * (lang, dominant). The corpus is Latin-only, so the fixture plants
    * deterministic Han/Cyrillic/Arabic suffixes on doc_id % 5/7/11
    * (overlaps exercise the precedence tie-break). Counting is one
    * regex pass per class over the scan — no shuffle before the
    * census; all outputs are exact integers. Java spells the classes
    * `\p{IsHan}`, RE2 `\p{Han}` — same char sets (the oracle's one
    * dialect seam). */
  def q173ScriptCensus(spark: SparkSession, dir: String): DataFrame = {
    def plant(df: DataFrame, mod: Int, suffix: String): DataFrame =
      df.select($"doc_id", $"lang",
        when($"doc_id" % mod === 0, concat($"text", lit(suffix)))
          .otherwise($"text").as("text"))
    // doc_id % 13: text fully replaced by a Han passage, so the census
    // carries non-latin-dominant rows (suffixes alone can't flip a doc)
    val base = docs(spark, dir).select($"doc_id", $"lang",
      when($"doc_id" % 13 === 0, repeat(lit("机器学习模型训练数据 "), 5))
        .otherwise($"text").as("text"))
    val planted = plant(plant(plant(base,
      5, " 机器学习模型训练数据"), 7, " обучение модель данные"),
      11, " تدريب نموذج بيانات")
    val counted = planted.select($"lang",
      regexp_count($"text", lit("\\p{IsLatin}")).cast("long").as("lat"),
      regexp_count($"text", lit("\\p{IsCyrillic}")).cast("long").as("cyr"),
      regexp_count($"text", lit("\\p{IsHan}")).cast("long").as("han"),
      regexp_count($"text", lit("\\p{IsArabic}")).cast("long").as("ara"),
      length($"text").cast("long").as("total"))
    counted
      .withColumn("dominant",
        when($"lat" >= $"cyr" && $"lat" >= $"han" && $"lat" >= $"ara", lit("latin"))
          .when($"cyr" >= $"han" && $"cyr" >= $"ara", lit("cyrillic"))
          .when($"han" >= $"ara", lit("han"))
          .otherwise(lit("arabic")))
      .groupBy($"lang", $"dominant")
      .agg(count(lit(1)).as("n_docs"),
        sum($"lat").as("latin_chars"), sum($"cyr").as("cyrillic_chars"),
        sum($"han").as("han_chars"), sum($"ara").as("arabic_chars"),
        sum($"total" - $"lat" - $"cyr" - $"han" - $"ara").as("other_chars"))
  }

  /** q174 — per-domain cap ([[graft.operators.Splits.capPerKey]]): at
    * most 60 docs survive per source, chosen by the deterministic md5
    * rank (rerun/partition/engine-stable) — the de-biasing carve that
    * stops one domain from dominating a web corpus. The fixture plants
    * an oversized source (every en doc re-appears under source
    * 'src_farm') so the cap genuinely binds asymmetrically. Census per
    * source: total, kept, chars kept, whether the cap bound. */
  def q174DomainCap(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select($"doc_id", $"source", $"n_chars")
    val corpus = d.unionByName(
      docs(spark, dir).where($"lang" === "en")
        .select(($"doc_id" + 300000L).as("doc_id"), lit("src_farm").as("source"),
          $"n_chars"))
    val kept = graft.operators.Splits.capPerKey(corpus, "doc_id", "source", cap = 60)
    val keptC = kept.groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("chars_kept"))
    corpus.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .join(keptC, Seq("source"))
      .select($"source", $"n_docs", $"n_kept", $"chars_kept",
        ($"n_docs" > $"n_kept").as("capped"))
  }

  /** q175 — code-vs-prose heuristic census (the source-typing gate a
    * code/natural-language mixture needs before setting sampling
    * rates): per doc, code-symbol count ({};()=<>[] chars), code-keyword
    * hits (def/class/import/return/function/var/int/void as whole
    * words), then is_code = symbol density > 3% or >= 5 keyword hits.
    * Planted code docs (doc_id % 17: a code preamble prepended)
    * make both trigger paths live. Census per (source, is_code) with
    * ratio-of-integer-sums densities — single IEEE division, no
    * order-sensitive double sums. */
  def q175CodeProse(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"source",
      when($"doc_id" % 17 === 0, concat(
        lit("def f(x): { return x + 1; } import os; var y = f(2); "), $"text"))
        .otherwise($"text").as("text"))
    val sig = planted.select($"source",
      regexp_count($"text", lit("[{};()=<>\\[\\]]")).cast("long").as("sym"),
      regexp_count(lower($"text"),
        lit("\\b(def|class|import|return|function|var|int|void)\\b"))
        .cast("long").as("kw"),
      length($"text").cast("long").as("total"))
    sig.withColumn("is_code",
        $"sym".cast("double") / $"total".cast("double") > lit(0.03) || $"kw" >= 5)
      .groupBy($"source", $"is_code")
      .agg(count(lit(1)).as("n_docs"), sum($"sym").as("sym_chars"),
        sum($"kw").as("kw_hits"),
        round(sum($"sym").cast("double") / sum($"total").cast("double"), 6)
          .as("sym_density"))
  }

  /** q176 — naive-split near-dup leakage AUDIT (the measurement q165's
    * component-wise split prevents): split the q85 near-dup fixture
    * doc-wise (the naive way), then classify every verified near-dup
    * pair as within-split or straddling — straddling pairs are
    * train/test leaks a memorization eval would hit. Pairs come from
    * the production MinHash-LSH path (banded candidates, exact-Jaccard
    * verified); the oracle recomputes the pair set exhaustively and
    * replays the md5 split thresholds, so a missed pair or a split
    * drift both break the hash. */
  def q176SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val fixture = nearDupFixture(spark, dir)
    val pairs = Dedup.minhashNearDups(fixture, "doc_id", "text",
        shingleN = 3, k = 32, bands = 16, threshold = 0.5)
      .select($"id_a", $"id_b")
    val split = graft.operators.Splits.hashSplit(fixture.select($"doc_id"),
      "doc_id", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    pairs
      .join(split.select($"doc_id".as("id_a"), $"split".as("split_a")), Seq("id_a"))
      .join(split.select($"doc_id".as("id_b"), $"split".as("split_b")), Seq("id_b"))
      .withColumn("kind",
        when($"split_a" === $"split_b", concat(lit("within_"), $"split_a"))
          .otherwise(lit("straddling")))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_pairs"), min($"id_a").as("first_a"))
  }

  /** q177 — k-NN label-noise audit (pseudo-labeling / mislabeled-sample
    * detection for labeled training data): each vector's 5 nearest
    * non-self neighbors (via [[graft.operators.Similarity.knnJoin]] at
    * saturation, so the ANN machinery must produce the exact graph —
    * q108/q136's identity) vote with their labels; majority by (votes
    * DESC, label ASC), and `agree` flags vectors whose own label
    * matches the neighborhood — the disagreeing ones are the review
    * queue. Exhaustive replay in DuckDB on the bounded id range. */
  def q177LabelAudit(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .where($"vec_id" < 300)
      .select($"vec_id", $"label",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val lab = emb.select($"vec_id", $"label")
    val votes = graft.operators.Similarity.knnJoin(
        emb, "vec_id", "v", k = 5, nCells = 16, nProbe = 16)
      .join(lab.select($"vec_id".as("corpus_id"), $"label".as("c_label")),
        Seq("corpus_id"))
      .groupBy($"probe_id", $"c_label")
      .agg(count(lit(1)).as("votes"))
    val maj = votes.groupBy($"probe_id")
      .agg(max(struct($"votes", negate($"c_label".cast("long")).as("nl"))).as("m"))
      .select($"probe_id".as("vec_id"), $"m.votes".as("maj_votes"),
        (-$"m.nl").cast("int").as("maj_label"))
    lab.join(maj, Seq("vec_id"))
      .select($"vec_id", $"label", $"maj_label", $"maj_votes",
        ($"label" === $"maj_label").as("agree"))
  }

  /** q179 — dominant principal direction via distributed Gram + power
    * iteration ([[graft.operators.Similarity.powerIterationTop]]): the
    * PCA/whitening-prep primitive run before embedding indexing. The
    * corpus is touched ONCE (the q149 integer-Gram pass — exact BIGINT
    * second moments at any parallelism); three power-iteration rounds
    * run on the driver over the 64×64 state with left-fold matvecs and
    * max-|element| normalization, so every double replays bit-for-bit
    * in the oracle's unrolled SQL (no eigensolver tolerance games). */
  def q179PowerIteration(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val codes = graft.operators.Similarity.quantizeInt8(emb, "vec_id", "v")
      .select($"codes")
    graft.operators.Similarity.powerIterationTop(codes, "codes", dims = 64, iters = 3)
      .select($"d", round($"loading", 8).as("loading"))
  }

  /** q180 — Welch two-sample t-test per language against the 'en'
    * baseline (the A/B read-out for corpus composition shifts: "is this
    * language's doc-length distribution different?"). Sufficient
    * statistics only — n / Σx / Σx² per lang are exact integer sums
    * (n_chars is integral), the baseline row broadcasts, and the t
    * statistic evaluates in one fixed expression shape over exact
    * inputs — deterministic cross-engine, q178's contract. */
  def q180WelchTest(spark: SparkSession, dir: String): DataFrame = {
    val stats = docs(spark, dir).groupBy($"lang")
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("s"),
        sum($"n_chars" * $"n_chars").as("ss"))
      .select($"lang", $"n", $"n".cast("double").as("nd"),
        ($"s".cast("double") / $"n").as("mean"),
        (($"ss".cast("double") - $"s".cast("double") * $"s".cast("double") / $"n")
          / ($"n".cast("double") - lit(1.0))).as("v"))
    val base = stats.where($"lang" === "en")
      .select($"nd".as("nd0"), $"mean".as("mean0"), $"v".as("v0"))
    stats.crossJoin(broadcast(base))
      .withColumn("t", ($"mean" - $"mean0") /
        sqrt($"v" / $"nd" + $"v0" / $"nd0"))
      .select($"lang", $"n", round($"mean", 4).as("mean_chars"),
        round($"t", 4).as("t_vs_en"), (abs($"t") > lit(1.96)).as("significant"))
  }

  /** q181 — collocation mining by lift (the PMI top-k without the
    * transcendental: lift = c_xy·N / (c_x·c_y) orders identically to
    * PMI = ln(lift), and every factor is an exact integer count cast
    * once — two correctly-rounded IEEE ops per pair, engine-identical).
    * Adjacent-bigram collocations with support >= 5 ranked through the
    * bounded string-keyed top-k (only k-row summaries shuffle, q163's
    * path). The "multiword expression" extractor a tokenizer/phrase
    * vocabulary builder runs. */
  def q181Collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select($"doc_id", split(lower(trim($"text")), "\\s+").as("toks"))
    val uni = toks.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val nTotal = uni.agg(sum($"c").as("n_total"))
    val bi = toks.where(size($"toks") > 1)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] as w1, toks[i] as w2))")).as("p"))
      .select($"p.w1", $"p.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("cxy"))
      .where($"cxy" >= 5)
    val lifted = bi
      .join(uni.select($"w".as("w1"), $"c".as("cx")), Seq("w1"))
      .join(uni.select($"w".as("w2"), $"c".as("cy")), Seq("w2"))
      .crossJoin(broadcast(nTotal))
      .select(concat($"w1", lit(" "), $"w2").as("bigram"), $"cxy",
        (($"cxy".cast("double") * $"n_total".cast("double")) /
          ($"cx".cast("double") * $"cy".cast("double"))).as("lift"))
    graft.operators.TopK
      .topKStrPerGroup(lifted.withColumn("g", lit("all")), "g", "bigram", "lift", k = 20)
      .join(lifted.select($"bigram", $"cxy"), Seq("bigram"))
      .select($"rank", $"bigram", $"cxy", round($"lift", 6).as("lift"))
  }

  /** q184 — URL canonicalization census ([[graft.operators.Urls
    * .canonicalize]]): the pre-dedup normalizer over a deterministic
    * messy-URL fixture derived from doc_id — case-varied schemes and
    * hosts, `www.` prefixes, a `:443` default port, trailing slashes,
    * tracking parameters (utm_* and fbclid), permuted real params, and
    * fragments all planted so every rule fires. Per canonical host: raw
    * URLs, distinct canonical URLs (the dedup win), tracked/fragment
    * counts. Pure regex/array projection — no shuffle before the
    * host-keyed census; the oracle rebuilds the same strings and
    * replays every rule with RE2-safe patterns. */
  def q184UrlCanon(spark: SparkSession, dir: String): DataFrame = {
    val id = $"doc_id"
    val url = concat(
      when(id % 2 === 0, "https").otherwise("HTTPS"), lit("://"),
      when(id % 4 === 0, "News.Example.com")
        .when(id % 4 === 1, "www.news.example.com")
        .when(id % 4 === 2, "news.example.com:443")
        .otherwise("Blog.Other.org"),
      lit("/art/"), (id % 40).cast("string"),
      when(id % 3 === 0, "/").otherwise(""),
      when(id % 5 === 0, concat(lit("?utm_source=rss&id="), (id % 40).cast("string")))
        .when(id % 5 === 1, concat(lit("?id="), (id % 40).cast("string"), lit("&utm_medium=email")))
        .when(id % 5 === 2, "?b=2&a=1")
        .when(id % 5 === 3, "?fbclid=xyz")
        .otherwise(""),
      when(id % 7 === 0, "#top").otherwise(""))
    val canon = graft.operators.Urls.canonicalize(
      docs(spark, dir).select(id, url.as("url")), "url")
    canon.groupBy($"host")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct($"canonical_url").as("n_canonical"),
        sum(when($"had_tracking", 1L).otherwise(0L)).as("n_tracked"),
        sum(when($"had_fragment", 1L).otherwise(0L)).as("n_fragment"))
  }

  /** q185 — dataset Merkle fingerprint ([[graft.operators.Fingerprint
    * .datasetDigest]]): content-addressed bucket digests + root over the
    * documents table — the audit two replicas of a 100 TB dataset
    * exchange instead of rows. Bucket assignment comes from each row
    * digest's own hex prefix, so the result is independent of layout,
    * partitioning, and row order (spec-pinned); the per-bucket chain is
    * an ordered md5 fold the oracle replays with list_reduce. */
  def q185DatasetDigest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Fingerprint.datasetDigest(
      docs(spark, dir), Seq("doc_id", "text"), bucketHexChars = 2)

  /** q187 — inverted-index build ([[graft.operators.InvertedIndex]]):
    * per term in the DF band [2, 400], document frequency, first
    * posting, max delta gap, and the md5 fingerprint of the full
    * delta-encoded posting list. The DF filter runs before the per-term
    * sort, so stopword-hot partitions never exist; the oracle rebuilds
    * the same fingerprints via string_agg over lag gaps. */
  def q187InvertedIndex(spark: SparkSession, dir: String): DataFrame =
    graft.operators.InvertedIndex.build(docs(spark, dir), "doc_id", "text",
      minDf = 2L, maxDf = 400L)

  /** q188 — hard-negative mining ([[Similarity.hardNegatives]]): for
    * each of 8 probe vectors, the 3 nearest corpus vectors with a
    * DIFFERENT label — the contrastive-training negatives that define
    * the decision boundary. Label filter before rank keeps k exact;
    * DuckDB replays the exhaustive scored join. */
  def q188HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probes = emb.where($"vec_id" < 8)
    Similarity.hardNegatives(emb, probes, "vec_id", "v", "label", k = 3)
      .select($"probe_id", $"probe_label", $"rank", $"corpus_id",
        $"neg_label", round($"cos", 4).as("cos"))
  }

  /** q189 — Gopher rule-bundle audit (Rae et al. 2021 §A1.1, the
    * per-rule attrition table a pipeline tunes before blending scores —
    * q73/q112 gate on a scalar blend; this names WHICH rule kills which
    * doc). Seven rules, each planted via doc_id % 11 so every rule
    * fires: word-count band, mean word length, symbol ratio, bullet
    * lines, ellipsis line endings, alphabetic-word share, required
    * stopwords. Every test is an integer cross-multiplication
    * (10*n_sym > n_words, not a double ratio), so the census has no
    * float seam at all and replays exactly. */
  def q189GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"source",
      when($"doc_id" % 11 === 1, concat($"text", lit(" # # # # # # # # # # # #")))
        .when($"doc_id" % 11 === 2, concat(repeat(lit("- item point\n"), 8), lit("tail")))
        .when($"doc_id" % 11 === 3, concat(repeat(lit("watch this...\n"), 5), lit("end")))
        .when($"doc_id" % 11 === 4, repeat(lit("123 456 "), 20))
        .when($"doc_id" % 11 === 5, repeat(lit("lorem ipsum dolor sit amet "), 10))
        .when($"doc_id" % 11 === 6, lit("too short"))
        .when($"doc_id" % 11 === 7, repeat(lit("extraordinarily incomprehensible "), 15))
        .otherwise($"text").as("t"))
    val words = filter(split(lower($"t"), "\\s+"), w => w =!= "")
    val lines = split($"t", "\n")
    val stopSet = array(Seq("the", "a", "of", "and", "to", "in", "is", "that").map(lit): _*)
    val m = planted.select($"source",
      size(words).as("n_w"),
      aggregate(words, lit(0L), (a, x) => a + length(x)).as("sum_len"),
      (length($"t") - length(regexp_replace($"t", "#", "")) +
        length($"t") - length(regexp_replace($"t", "…", ""))).as("n_sym"),
      size(lines).as("n_lines"),
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).as("n_bullet"),
      size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).as("n_ell"),
      size(filter(words, w => w.rlike("[a-z]"))).as("n_alpha"),
      size(array_intersect(array_distinct(words), stopSet)).as("n_stop"))
    val fWc = $"n_w" < 20 || $"n_w" > 100000
    val fMl = $"sum_len" < $"n_w" * 3 || $"sum_len" > $"n_w" * 10
    val fSym = $"n_sym" * 10 > $"n_w"
    val fBul = $"n_bullet" * 10 > $"n_lines" * 9
    val fEll = $"n_ell" * 10 > $"n_lines" * 3
    val fAl = $"n_alpha" * 5 < $"n_w" * 4
    val fSt = $"n_stop" < 2
    def cnt(c: org.apache.spark.sql.Column, name: String) =
      sum(when(c, 1L).otherwise(0L)).as(name)
    m.groupBy($"source").agg(
      count(lit(1)).as("n_docs"),
      cnt(fWc, "f_wordcount"), cnt(fMl, "f_meanlen"), cnt(fSym, "f_symbol"),
      cnt(fBul, "f_bullet"), cnt(fEll, "f_ellipsis"), cnt(fAl, "f_alpha"),
      cnt(fSt, "f_stopword"),
      cnt(!fWc && !fMl && !fSym && !fBul && !fEll && !fAl && !fSt, "n_pass"))
  }

  /** q190 — NFC normalization census ([[graft.functions.UnicodeOps
    * .nfcNormalize]], a codegen'd Catalyst expression over the JDK
    * normalizer): combining-sequence fixtures (e+U+0301, A+U+030A,
    * o+U+0308) planted next to their precomposed twins; per source, how
    * many docs change under NFC and the codepoint mass before/after —
    * the dedup-prerequisite audit (un-normalized text makes visually
    * identical docs hash differently). DuckDB replays with its
    * Unicode-conformant nfc_normalize; lengths are codepoint counts on
    * both engines. */
  def q190NfcCensus(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"source",
      // %5==1 and %5==3: DECOMPOSED combining sequences (NFC changes
      // them); %5==2: precomposed twins (NFC must leave them alone)
      when($"doc_id" % 5 === 1, concat($"text", lit(" cafe\u0301 re\u0301sume\u0301")))
        .when($"doc_id" % 5 === 2, concat($"text", lit(" caf\u00e9 d\u00e9j\u00e0")))
        .when($"doc_id" % 5 === 3, concat($"text", lit(" A\u030angstro\u0308m")))
        .otherwise($"text").as("t"))
    val n = graft.functions.UnicodeOps.nfcNormalize($"t")
    planted.select($"source", $"t", n.as("nfc"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"nfc" =!= $"t", 1L).otherwise(0L)).as("n_changed"),
        sum(length($"t")).as("sum_before"),
        sum(length($"nfc")).as("sum_after"))
  }

  /** q191 — exact tie-aware AUC ([[graft.operators.Eval.auc]]): does
    * the first embedding dimension separate even from odd labels? The
    * Mann-Whitney census form — per-(group, score) integer counts, one
    * window over DISTINCT 2-decimal scores, never a row-scale sort.
    * Scores discretize via the engine's round (BigDecimal.valueOf
    * semantics, mirrored in the oracle by the VARCHAR->DECIMAL trick);
    * two groups split by vec_id parity keep the window partitioned. */
  def q191Auc(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.auc(
      Tables.embeddings(spark, dir).select(
        when($"vec_id" % 2 === 0, "even_ids").otherwise("odd_ids").as("grp"),
        ($"label" % 2).as("y"),
        round(element_at($"embedding", 1).cast("double"), 2).as("score")),
      "grp", "y", "score")
      .select($"grp", $"n_pos", $"n_neg", $"u_strict", $"u_ties",
        round($"auc", 6).as("auc"))

  /** q192 — chi-square giveaway-token audit ([[graft.operators.Eval
    * .chiSquareTokens]]): which tokens are statistically tied to the
    * src1 class? A marker token planted on src1 docs must surface at
    * rank 1 with the maximal statistic; all arithmetic is exact BIGINT
    * up to the final division, so the ranking replays bit-for-bit. */
  def q192ChiSquare(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.chiSquareTokens(
      docs(spark, dir).select(($"source" === "src1").as("cls"),
        when($"source" === "src1", concat($"text", lit(" galleon")))
          .otherwise($"text").as("t")),
      "t", "cls", k = 15)
      .select($"rank", $"token", $"a", $"b", round($"chi2", 6).as("chi2"))

  /** q194 — PII scrubbing census ([[graft.operators.Pii.scrub]]):
    * emails, NANP phones, and IPv4s planted via doc_id % 6 (including a
    * doc carrying both an email and an IP), masked in contract order
    * (email, phone, ip), censused per source with the exact character
    * delta the masking produced. Every regex is RE2-safe and the
    * oracle replays count + replace (with DuckDB's 'g' flag matching
    * Spark's replace-all default). */
  def q194PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select($"source",
      when($"doc_id" % 6 === 1, concat($"text", lit(" contact bob.smith+x@ex-ample.org today")))
        .when($"doc_id" % 6 === 2, concat($"text", lit(" call 415-555-1234 now")))
        .when($"doc_id" % 6 === 3, concat($"text", lit(" node at 192.168.0.17 port")))
        .when($"doc_id" % 6 === 4, concat($"text", lit(" mail a@b.io or 10.0.0.1")))
        .otherwise($"text").as("t"))
    graft.operators.Pii.scrub(planted, "t")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_emails".cast("long")).as("n_emails"),
        sum($"n_phones".cast("long")).as("n_phones"),
        sum($"n_ips".cast("long")).as("n_ips"),
        sum((length($"t") - length($"scrubbed")).cast("long")).as("chars_delta"))
  }

  /** q195 — document-length power-law census: docs bucketed by
    * floor(log2(n_chars)) — the tail audit that decides chunking and
    * packing budgets (a power-law corpus has the mass where the naive
    * mean says it doesn't). The log is computed EXACTLY as
    * length(bin(n)) - 1 — a string op on the binary representation, no
    * transcendental, no cross-engine ulp seam. One aggregation pass. */
  def q195LengthPowerlaw(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .where($"n_chars" >= 1)
      .withColumn("log2_bucket", (length(bin($"n_chars")) - 1).cast("long"))
      .groupBy($"source", $"log2_bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))

  /** q198 — character-level near-dup pairs ([[graft.operators
    * .EditDistance.blockedPairs]]): planted single-edit variants
    * (substitution / 2-char deletion / 2-char insertion past the
    * blocking prefix, cycled by doc_id) of the first 80 long-enough
    * docs join back to their originals through a prefix-10 block +
    * length band, verified by exact thresholded Levenshtein. Both
    * engines build identical variants with 1-based substring ops and
    * agree on unit-cost Levenshtein, so the pair set and distances
    * hash-match with no tolerance. */
  def q198EditDistance(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .where($"doc_id" < 80 && length(trim($"text")) >= 40)
      .select($"doc_id", lower(trim($"text")).as("t"))
    val variants = base.select(($"doc_id" + 100000L).as("doc_id"),
      when($"doc_id" % 3 === 0,
          concat(expr("substring(t, 1, 11)"), lit("~"), expr("substring(t, 13)")))
        .when($"doc_id" % 3 === 1,
          concat(expr("substring(t, 1, 14)"), expr("substring(t, 17)")))
        .otherwise(
          concat(expr("substring(t, 1, 19)"), lit("zz"), expr("substring(t, 20)")))
        .as("t"))
    graft.operators.EditDistance.blockedPairs(
      base.unionByName(variants), "doc_id", "t", prefixLen = 10, maxDist = 3)
  }

  /** q199 — KMV distinct sketches and cross-source vocabulary overlap
    * ([[graft.operators.Sketches.kmvSketch]]): per source the k=64
    * minimum token hashes; per source PAIR the Jaccard estimate from
    * the merged sketch (overlap within the k smallest of the union) —
    * the set-operation capability HLL lacks, and the cheap way to ask
    * "how much do two 100 TB datasets share" without a full join.
    * `true_jaccard` rides along from the exact vocab sets to show the
    * error. Hashes are md5-derived integers; each estimate is one
    * correctly-rounded division — bit-replayable. */
  def q199KmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val toks = docs(spark, dir)
      .select($"source", explode(split(lower(trim($"text")), "\\s+")).as("tok"))
      .where(length($"tok") > 0)
    val sk = graft.operators.Sketches.kmvSketch(toks, "source", "tok", k)
    val srcs = sk.select($"source").distinct()
    val pairs = srcs.select($"source".as("src_a"))
      .crossJoin(srcs.select($"source".as("src_b")))
      .where($"src_a" < $"src_b")
    val ua = pairs.join(sk.select($"source".as("src_a"), $"h"), "src_a")
      .select($"src_a", $"src_b", $"h", lit(1).as("ia"), lit(0).as("ib"))
    val ub = pairs.join(sk.select($"source".as("src_b"), $"h"), "src_b")
      .select($"src_a", $"src_b", $"h", lit(0).as("ia"), lit(1).as("ib"))
    val merged = ua.unionByName(ub)
      .groupBy($"src_a", $"src_b", $"h")
      .agg(max($"ia").as("ia"), max($"ib").as("ib"))
    val wU = org.apache.spark.sql.expressions.Window
      .partitionBy($"src_a", $"src_b").orderBy($"h")
    val est = merged
      .withColumn("r", row_number().over(wU)).where($"r" <= k)
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("k_used"),
        sum(($"ia" * $"ib").cast("long")).as("n_common"))
    val vocab = toks.distinct()
    val nv = vocab.groupBy($"source").agg(count(lit(1)).as("nv"))
    val inter = vocab.select($"source".as("src_a"), $"tok")
      .join(vocab.select($"source".as("src_b"), $"tok"), "tok")
      .where($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("ni"))
    est.join(inter, Seq("src_a", "src_b"), "left")
      .join(nv.select($"source".as("src_a"), $"nv".as("na")), "src_a")
      .join(nv.select($"source".as("src_b"), $"nv".as("nb")), "src_b")
      .select($"src_a", $"src_b", $"k_used", $"n_common",
        ($"n_common".cast("double") / $"k_used".cast("double")).as("jaccard_est"),
        (coalesce($"ni", lit(0L)).cast("double") /
          ($"na" + $"nb" - coalesce($"ni", lit(0L))).cast("double")).as("true_jaccard"))
  }

  /** q204 — reciprocal-rank fusion ([[graft.operators.Ranking
    * .rrfFuse]]) of two dense retrievers over the embedding corpus:
    * cosine top-20 and squared-L2 top-20 per probe, fused at c=60 —
    * the calibration-free way to combine heterogeneous rankers. Ranks
    * are integers; each rrf score is two correctly-rounded divisions
    * and one add in fixed order — bit-replayable, no rounding. */
  def q204RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probes = emb.where($"vec_id" < 5)
    val r1 = Similarity.bruteForceTopK(emb, probes, "vec_id", "v", 20)
      .select($"probe_id", $"corpus_id", $"rank")
    val c = emb.select($"vec_id".as("corpus_id"), $"v".as("cvec"))
    val p = probes.select($"vec_id".as("probe_id"), $"v".as("pvec"))
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"d2", $"corpus_id")
    val r2 = c.crossJoin(broadcast(p))
      .where($"corpus_id" =!= $"probe_id")
      .withColumn("d2",
        expr("aggregate(zip_with(cvec, pvec, (x, y) -> (x - y) * (x - y)), 0.0d, (s, t) -> s + t)"))
      .withColumn("rank", row_number().over(wD)).where($"rank" <= 20)
      .select($"probe_id", $"corpus_id", $"rank")
    graft.operators.Ranking.rrfFuse(
      r1, r2, "probe_id", "corpus_id", "rank", c = 60, topK = 10)
  }

  /** q211 — EXACT set-similarity join ([[graft.operators.SetJoin
    * .prefixFilterJoin]]) at Jaccard >= 1/2 over the q75 planted
    * fixture's 3-gram sets: prefix filtering (rare-first order, length
    * filter, integer cross-multiplied threshold) generates candidates,
    * exact verification trims — recall 1 by theorem, not by hash-family
    * luck. The oracle computes the EXHAUSTIVE pair set; hash equality
    * proves the filter lost nothing. */
  def q211SetJoin(spark: SparkSession, dir: String): DataFrame = {
    val withSets = nearDupFixture(spark, dir).select($"doc_id",
      graft.functions.FastHash.shingles($"text", 3).as("sh"))
    graft.operators.SetJoin.prefixFilterJoin(withSets, "doc_id", "sh",
      num = 1, den = 2)
  }

  /** q223 — rank-transform score normalization
    * ([[graft.operators.Normalize.rankNormalize]]): per-source mid-rank
    * quantile of document length, the cross-corpus calibration that
    * makes "top 30% by quality" mean the same thing in every source
    * before mixture sampling. Census-windowed — the cumulative runs
    * over distinct (source, n_chars) values, never rows — and the
    * normalized score is one exact-integer division, so the oracle
    * replays it bit-for-bit. */
  def q223RankNormalize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Normalize.rankNormalize(
        Tables.documents(spark, dir).select($"doc_id", $"source", $"n_chars"),
        Seq("source"), "n_chars")
      .select($"doc_id", $"source", $"n_chars",
        round($"norm_rank", 6).as("norm_rank"))

  /** q224 — audio silence segmentation
    * ([[graft.multimodal.Multimodal.silenceSegments]]): REAL WAV decode
    * (q120's codec path) framed at 64 samples, exact integer frame
    * energies, and gaps-and-islands merging of consecutive silent
    * frames — the cut-at-silence step before audio feature extraction.
    * Payloads are [[graft.multimodal.Multimodal.syntheticWavGaps]]
    * fixtures (block-aligned planted silences), so the lossless PCM
    * round-trip makes every segment a closed form of doc_id that the
    * oracle replays without touching a codec. */
  def q224SilenceSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = docs(spark, dir).where($"doc_id" < 40).select($"doc_id")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val withWav = base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, graft.multimodal.Multimodal.syntheticWavGaps(
          id, (256 + (id % 7) * 64).toInt, frameLen = 64))
      }
    }(enc)
    graft.multimodal.Multimodal.silenceSegments(
      withWav, "doc_id", "payload", frameLen = 64)
  }

  /** q225 — matryoshka truncation audit
    * ([[graft.operators.Similarity.truncationAudit]]): retained cosine
    * sqrt(prefix²/full²) per (k, label) for k in 8/16/32/64 — the
    * store-short-rerank-long decision table for nested embeddings. The
    * per-row folds run in index order on both engines (Spark
    * `aggregate` HOF ≡ DuckDB `list_reduce`), so min is bit-identical
    * (6dp belt); the mean's cross-row sum rounds at 4dp (q81
    * precedent). k=64 is the full vector — retained 1.0 — kept as an
    * in-band sanity row. */
  def q225Matryoshka(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.truncationAudit(
        Tables.embeddings(spark, dir), "embedding", "label",
        ks = Seq(8, 16, 32, 64))
      .select($"k", $"label", $"n",
        round($"avg_retained", 4).as("avg_retained"),
        round($"min_retained", 6).as("min_retained"))

  /** q226 — small-files compaction plan
    * ([[graft.operators.Compaction]]): per-day byte census of the
    * events stream (payload length + fixed row overhead — the stats a
    * catalog would serve), sequential-fill binning toward ~100 KB
    * rewrites partitioned by month (each month plans independently —
    * the distributed-OPTIMIZE sharding), and the per-bin rewrite
    * manifest. All masses, cumulative sums and the `div` bin id are
    * exact integers — the oracle replays the window verbatim. */
  def q226CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"),
        (coalesce(length($"props"), lit(0)) + lit(32)).cast("long").as("b"))
      .groupBy($"day").agg(sum($"b").as("day_bytes"))
      .withColumn("month", substring($"day", 1, 7))
    val planned = graft.operators.Compaction.planBins(
      days, Seq("month"), "day_bytes", Seq($"day"), targetMass = 100000L)
    graft.operators.Compaction.binSummary(planned, Seq("month"), "day_bytes", "day")
      .select($"month", $"bin", $"n_units".as("n_days"),
        $"total_mass".as("total_bytes"),
        $"first_unit".as("first_day"), $"last_unit".as("last_day"))
  }

  /** q236 — Neyman sampling allocation
    * ([[graft.operators.Splits.neymanAllocation]]): split a 1000-row
    * review budget across order priorities proportionally to N_h·σ_h
    * of the total price — the variance-minimizing sampling plan, with
    * LARGEST-REMAINDER integerization so allocations sum to the budget
    * exactly. Prices enter as integer cents (scale 0), making the
    * sufficient statistics exact integers; σ is one sqrt of an exact
    * rational, replayed identically by the oracle's HUGEINT sums. */
  def q236NeymanAlloc(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Splits.neymanAllocation(
      Tables.orders(spark, dir)
        .select($"o_orderpriority",
          round($"o_totalprice" * 100).cast("long").as("cents")),
      "o_orderpriority", "cents", budget = 1000L, scale = 0)

  /** q241 — Gini concentration of document length per source
    * ([[graft.operators.WeightedStats.gini]]): is a source's volume
    * spread evenly across its documents or carried by a few giants —
    * the inequality number a mixture-rebalancing step reads before
    * reweighting. Exact sorted-rank formula from the (source, length)
    * census; tie-runs contribute v·(c·r₀ + c·(c−1)/2) so no tiebreak
    * order exists; one terminal division per source. */
  def q241Gini(spark: SparkSession, dir: String): DataFrame =
    graft.operators.WeightedStats.gini(docs(spark, dir), "source", "n_chars")
      .select($"source", $"n", $"total", round($"gini", 6).as("gini"))

  /** q244 — distinctive-term extraction ([[graft.operators.Ranking
    * .distinctiveTerms]]): each document's top-3 rare terms (corpus
    * df ≤ ¾·N — exact integer compare, scale-factor-stable), ranked
    * (tf desc, df asc, term asc) — ALL-INTEGER ordering, so no float
    * score whose cross-engine tie behavior is a coin flip. The df cap
    * plays the idf role and filters before the per-doc top-k
    * window. */
  def q244RareTerms(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.distinctiveTerms(
      docs(spark, dir), "doc_id", "text", dfNum = 3L, dfDen = 4L, topK = 3)

  /** q246 — Zipf-law fit ([[graft.operators.Profile.zipfSlope]]): OLS
    * slope/intercept of ln(freq) on ln(rank) over the top-30 terms —
    * the corpus-health number (natural language slopes near −1;
    * template spam bends it). Bounded TakeOrdered cut, all four float
    * sums fold in rank order (the q237 contract), pure-additive
    * accumulator fields so the replay is safe under either
    * list_reduce field semantics. */
  def q246Zipf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.zipfSlope(docs(spark, dir), "text", topR = 30)
      .select($"n_terms", round($"slope", 6).as("slope"),
        round($"intercept", 6).as("intercept"))

  /** q247 — rendezvous resharding census ([[graft.operators.Sharding
    * .reshardCensus]]): per current shard (16), how many documents it
    * holds and how many move growing to 17 — next to the same count
    * under naive mod-hash placement (~1/17 vs ~16/17 of the corpus).
    * Assignment is an md5-argmax HOF projection, no joins, no
    * (key × shard) grid; the census aggregates on the 16-value shard
    * key. */
  def q247Reshard(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sharding.reshardCensus(
        docs(spark, dir), "doc_id", nFrom = 16, nTo = 17)
      .select($"shard", $"n_keys", $"n_moved", $"n_moved_mod")

  /** q250 — stratified sample execution ([[graft.operators.Splits
    * .executeAllocation]]): q236's Neyman seat counts turned into an
    * actual 1000-row sample — per stratum, EXACTLY alloc_h orders
    * chosen by the deterministic (md5(key), key) order, so the drawn
    * sample is a pure function of the data (rerun/engine/reorder
    * stable). The oracle replays allocation AND draw end-to-end. */
  def q250StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).select($"o_orderpriority",
      $"o_orderkey", round($"o_totalprice" * 100).cast("long").as("cents"))
    val alloc = graft.operators.Splits.neymanAllocation(
      base.select($"o_orderpriority", $"cents"),
      "o_orderpriority", "cents", budget = 1000L, scale = 0)
    graft.operators.Splits.executeAllocation(
      base, "o_orderpriority", "o_orderkey", alloc)
  }

  /** q253 — embedding-centroid drift ([[graft.operators.Similarity
    * .centroidDrift]]): per label, the cosine between the even-id and
    * odd-id slices' mean vectors — the did-the-representation-move
    * check before trusting cached vectors across snapshots.
    * Components quantize to round(x·10⁶) longs (q149/q172), dim sums
    * are exact integer aggregates, Gram terms exact DECIMAL products;
    * one double conversion per term feeds sqrt/divide. */
  def q253CentroidDrift(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.centroidDrift(
        Tables.embeddings(spark, dir), "label", "embedding",
        isB = $"vec_id" % 2 === 1, scale = 6)
      .select($"label", $"n_a", $"n_b", round($"cosine", 6).as("cosine"))

  /** q254 — water-filling token budget ([[graft.operators.Mixture
    * .waterFill]]): split a 100k-char budget across sources max-min
    * fairly — small sources take all they have, the leftover levels
    * across the rest via the exact integer closed form (base prefix +
    * div level + remainder seats in (avail, source) order). Caps are
    * never violated and Σ alloc = min(budget, Σ avail) exactly. */
  def q254WaterFill(spark: SparkSession, dir: String): DataFrame = {
    val avail = docs(spark, dir).groupBy($"source")
      .agg(sum($"n_chars").as("avail"))
    graft.operators.Mixture.waterFill(avail, "source", "avail",
        budget = 100000L)
      .select($"source", $"avail", $"alloc", $"at_capacity")
  }

  /** q264 — label separation matrix ([[graft.operators.Similarity
    * .centroidSeparation]]): pairwise label-centroid cosines from the
    * q253 quantized integer dim-sum census — which classes are
    * semantically confusable. labels²-bounded pair join; exact
    * DECIMAL Gram, HUGEINT oracle mirror. */
  def q264LabelSeparation(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.centroidSeparation(
        Tables.embeddings(spark, dir), "label", "embedding", scale = 6)
      .select($"label_a", $"label_b", round($"cosine", 6).as("cosine"))

  /** q357 — distinct-n lexical diversity ([[graft.operators.Profile
    * .distinctN]]): unique/total word n-gram ratios (n = 1..3) per
    * language — the mode-collapse canary for generated or over-deduped
    * corpora; pure integer censuses, one terminal division. */
  def q357DistinctN(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.distinctN(docs(spark, dir), "lang", "text")
      .select($"g".as("lang"), $"n", $"n_grams", $"n_types",
        round($"distinct_ratio", 6).as("distinct_ratio"))

  /** q360 — TextRank keywords ([[graft.operators.Ranking.textRank]]):
    * graph-centrality keywords over the corpus co-occurrence graph —
    * q349 RAKE's complement; integer fixed-point weighted PageRank,
    * top 25 by (rank, word). */
  def q360TextRank(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.textRank(docs(spark, dir), "text", k = 25)
      .select($"word", round($"pr", 10).as("pr"))

  /** q361 — Gonzalez k-center seeds ([[graft.operators.Similarity
    * .kCenterSeeds]]): 5 deterministic farthest-point prototypes over
    * the embedding table — exact integer squared distances on the
    * quantized grid; each selection distance is a covering-radius
    * certificate. */
  def q361KCenterSeeds(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.kCenterSeeds(
        Tables.embeddings(spark, dir), "vec_id", "embedding", k = 5)
      .select($"seed_rank", $"id".as("vec_id"), $"dist2")

  /** q363 — Kneser–Ney bigram NLL ([[graft.operators.KneserNey
    * .bigramNll]]): per-document surprise under the corpus-trained
    * interpolated-KN bigram LM — q139's backoff score with principled
    * smoothing; census joins at pair grain, no broadcast model. */
  def q363KneserNey(spark: SparkSession, dir: String): DataFrame =
    graft.operators.KneserNey.bigramNll(docs(spark, dir), "doc_id", "text")
      .select($"id".as("doc_id"), $"n_tok", $"n_pairs",
        round($"mean_nll", 6).as("mean_nll"))

  /** q365 — Chao1 unseen-vocabulary estimate ([[graft.operators
    * .Profile.chao1]]): per-source richness lower bound from the
    * singleton/doubleton census — q306 Good–Turing prices the unseen
    * mass, this counts the unseen types. */
  def q365Chao1(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.chao1(
      docs(spark, dir).select($"source",
        explode(split(lower(trim($"text")), "\\s+")).as("tok"))
        .where(length($"tok") > 0),
      "source", "tok")
      .select($"g".as("source"), $"n_obs", $"d_obs", $"f1", $"f2",
        round($"chao1", 6).as("chao1"))

  /** q371 — decoding-loop tail census ([[graft.operators.Gopher
    * .tailLoopCensus]]): per-source rate of documents ending in a
    * verbatim period-k repeat — the degenerate-generation artifact
    * whole-doc repetition ratios dilute away. */
  def q371TailLoops(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Gopher.tailLoopCensus(docs(spark, dir), "source", "text")
      .select($"g".as("source"), $"n_docs", $"n_looping",
        round($"looping_share", 6).as("looping_share"), $"max_loop_k")

  /** q373 — Dirichlet query likelihood ([[graft.operators.Ranking
    * .dirichletQL]]): the language-modeling retrieval scorer beside
    * q97 BM25 — exact censuses, broadcast 3-term query model,
    * term-ordered fold. */
  def q373DirichletQL(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.dirichletQL(docs(spark, dir), "doc_id", "text",
        query = Seq("spark", "join", "filter"), mu = 2000.0, k = 20)
      .select($"id".as("doc_id"), $"n_terms", round($"score", 6).as("score"))

  /** q377 — German-tank id-space estimate ([[graft.operators.Profile
    * .germanTank]]): recover the user-population ceiling from an
    * md5-deterministic ~30% sample of serial ids (shifted 1-based) —
    * the order-statistics complement to q365's frequency-based
    * unseen-type count. */
  def q377GermanTank(spark: SparkSession, dir: String): DataFrame = {
    val sample = Tables.events(spark, dir).select($"user_id").distinct()
      .where(conv(substring(md5(concat(lit("gt:"),
        $"user_id".cast("string"))), 1, 2), 16, 10).cast("long") % 10 < 3)
      .select(($"user_id" + 1L).as("serial"))
    graft.operators.Profile.germanTank(sample, "serial")
      .select($"k", $"m", round($"n_hat", 6).as("n_hat"),
        round($"se", 6).as("se"), round($"coverage", 6).as("coverage"))
  }

  /** q378 — MinHash-LSH S-curve planner ([[graft.operators.Dedup
    * .lshPlanner]]): the (bands, rows) tuning table for a 128-long
    * signature — collision probability at each candidate Jaccard,
    * every power a repeated-multiply fold. */
  def q378LshPlanner(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.lshPlanner(spark, sigLen = 128,
        bandsChoices = Seq(8, 16, 32, 64),
        simGrid = Seq(0.5, 0.6, 0.7, 0.8, 0.9))
      .select($"b", $"r", $"s", round($"p_collide", 6).as("p_collide"))

  /** q385 — MMR diverse selection ([[graft.operators.Similarity
    * .mmrSelect]]): 10 relevance-and-diversity picks against the
    * label-0 centroid query (integer sum vector — the 1/n cancels in
    * the cosine) — the dedup-aware retrieval a plain top-k can't do. */
  def q385MmrSelect(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val qv = emb.where($"label" === 0)
      .select(posexplode(expr(
        """transform(embedding, x ->
          |CAST(floor(CAST(x AS DOUBLE) * 1048576.0D + 0.5D) AS BIGINT))"""
          .stripMargin)).as(Seq("dim", "qx")))
      .groupBy($"dim").agg(sum($"qx").as("s"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, s))), e -> e.s)")
        .as("qv"))
    graft.operators.Similarity.mmrSelect(emb, "vec_id", "embedding",
        qv, "qv", k = 10, lambda = 0.7)
      .select($"rank", $"id".as("vec_id"), round($"rel", 6).as("rel"),
        round($"score", 6).as("score"))
  }

  /** q386 — JL projection distortion audit ([[graft.operators
    * .Similarity.jlDistortion]]): 64-d → 16-d ±1 md5 projection with
    * the distance-preservation deciles over the id+100 pinned pairs — the
    * ANN index-shrinking leg shipped with its evidence. */
  def q386JlDistortion(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.jlDistortion(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        outDims = 16, pairOffset = 100L)
      .select($"p", $"n_pairs", $"n_degenerate", $"ratio_bin")

  /** q387 — cross-source containment matrix ([[graft.operators
    * .Decontam.sourceContainmentMatrix]]): per ordered source pair,
    * the share of a's distinct trigram types present in b — the
    * between-feed duplication structure doc-level dedup stats hide. */
  def q387SourceContainment(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Decontam.sourceContainmentMatrix(
        docs(spark, dir), "source", "text", n = 3)
      .select($"src_a", $"src_b", $"n_a", $"n_shared",
        round($"containment", 6).as("containment"))

  /** q271 — Heaps'-law vocabulary growth ([[graft.operators.Profile
    * .heapsFit]]): V ≈ K·nᵝ across sources — how much new vocabulary
    * the next shard brings, q246's Zipf companion. Exact per-source
    * censuses; OLS sums fold in source order. */
  def q271Heaps(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.heapsFit(docs(spark, dir), "source", "text")
      .select($"n_groups", round($"beta", 6).as("beta"),
        round($"ln_k", 6).as("ln_k"))

  /** q345 — negative-sampling table ([[graft.operators.Mixture
    * .negativeSampleTable]]): 1,000 seeded noise draws from the
    * √f-smoothed unigram distribution of the document corpus — all
    * integer arithmetic, md5 targets, merged-window selection; the
    * same table on any cluster or engine. */
  def q345NegativeSamples(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Mixture.negativeSampleTable(
      docs(spark, dir).select(
        explode(split(lower(trim($"text")), "\\s+")).as("tok"))
        .where(length($"tok") > 0),
      "tok", k = 1000, seed = "graft8")
      .select($"draw", $"tok")

  /** q349 — RAKE keyphrases ([[graft.operators.Ranking.rake]]): the
    * corpus's top-25 stopword-free phrases by deg/freq word scores —
    * exact censuses, position-ordered folds, [^a-z0-9]+ tokenization
    * identical in Java regex and RE2. */
  def q349Rake(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.rake(docs(spark, dir), "doc_id", "text",
      Seq("the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
        "with", "is", "are", "was", "were", "be", "as", "at", "by", "it",
        "this", "that", "from", "but", "not"), k = 25)
      .select($"rank", $"phrase", $"n_occurrences",
        round($"score", 6).as("score"))

  /** q350 — embedding centroid drift ([[graft.operators.Similarity
    * .centroidCosines]]): pairwise cosine between the label centroids
    * of the embeddings table — quantized-integer component sums, one
    * division per pair; labels² numbers for a corpus-level drift
    * read. */
  def q350CentroidDrift(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.centroidCosines(
      Tables.embeddings(spark, dir), "label", "embedding")
      .select($"label_a", $"label_b", $"n_a", $"n_b",
        round($"cosine", 6).as("cosine"))

  /** q353 — capture–recapture recall audit ([[graft.operators.Dedup
    * .captureRecapture]]): two md5-deterministic detector passes over a
    * planted 200-pair duplicate population (≈70% and ≈50% recall, the
    * q64 seeded-kernel precedent) — Chapman's N̂ recovers the
    * population size no single pass sees; exact distinct counts,
    * pinned-shape estimate and SE. */
  def q353CaptureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val keys = docs(spark, dir).where($"doc_id" < 200)
      .select(concat(lit("p"), $"doc_id".cast("string")).as("k"))
    def caught(tag: String, thresh: Int) = keys.where(
      conv(substring(md5(concat($"k", lit(":" + tag))), 1, 2), 16, 10)
        .cast("long") % 10 < thresh)
    graft.operators.Dedup.captureRecapture(
        caught("a", 7), caught("b", 5), "k")
      .select($"n_a", $"n_b", $"n_both", round($"n_hat", 6).as("n_hat"),
        round($"se", 6).as("se"))
  }

  /** q81 — embedding norm / stats per label (vector column plumbing). */
  def q81EmbeddingStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select($"label",
        expr("aggregate(embedding, cast(0.0 as double), (s, x) -> s + cast(x as double) * cast(x as double))")
          .as("sq_norm"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        round(avg(sqrt($"sq_norm")), 4).as("avg_norm"))

  /** q414 — Yule's characteristic K ([[graft.operators.Profile
    * .yuleK]]): per source, the length-robust lexical-repetitiveness
    * statistic over the token frequency spectrum — the
    * boilerplate/template detector that, unlike type-token ratio,
    * compares sources at ANY document length. Exact integers, one
    * final division. */
  def q414YuleK(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.yuleK(docs(spark, dir), "source", "text")
      .select($"g".as("source"), $"n_tokens", $"n_types",
        round($"yule_k", 6).as("yule_k"))

  /** q438 — Burrows' Delta ([[graft.operators.Stylometry
    * .burrowsDelta]]): pairwise register distance between the five
    * language cohorts over the corpus's 30 commonest words — the
    * topic-blind stylometric clustering readout (z-scored
    * common-word rates, constant words dropped loudly). */
  def q438BurrowsDelta(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Stylometry.burrowsDelta(
        docs(spark, dir).select($"lang", $"text"), "lang", "text",
        topK = 30)
      .select($"src_a", $"src_b", $"n_words", $"n_words_dropped",
        round($"delta", 6).as("delta"))

  /** q440 — token-sort similarity ([[graft.functions.FastStringSim]]
    * family, rapidfuzz's token_sort trick declaratively): English docs
    * vs their token-reversed + first-token-mutated copies — raw
    * Levenshtein collapses under reordering while the sorted-token
    * distance isolates the one real edit. */
  def q440TokenSortRatio(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .where($"lang" === "en" && $"doc_id" < 120)
      .select($"doc_id",
        filter(split(lower(trim($"text")), "\\s+"), t => t =!= "")
          .as("toks"))
      .where(size($"toks") >= 2)
    val pairs = base.select($"doc_id",
      concat_ws(" ", $"toks").as("a"),
      concat_ws(" ",
        concat(array(lit("zzz")), slice(reverse($"toks"), 2, 1000000)))
        .as("b"),
      concat_ws(" ", array_sort($"toks")).as("sa"),
      concat_ws(" ", array_sort(
        concat(array(lit("zzz")), slice(reverse($"toks"), 2, 1000000))))
        .as("sb"))
    pairs.select($"doc_id",
      levenshtein($"a", $"b").cast("long").as("lev_raw"),
      levenshtein($"sa", $"sb").cast("long").as("lev_sorted"),
      round(lit(1.0) - levenshtein($"a", $"b").cast("double") /
        greatest(length($"a"), length($"b")).cast("double"), 6)
        .as("ratio_raw"),
      round(lit(1.0) - levenshtein($"sa", $"sb").cast("double") /
        greatest(length($"sa"), length($"sb")).cast("double"), 6)
        .as("ratio_sorted"))
  }

  /** q441 — Calinski–Harabasz index ([[graft.operators.Similarity
    * .calinskiHarabasz]]): the variance-ratio quality of the embedding
    * table's label partition — exact quantized censuses, per-label
    * pinned ratios folded in label order; the k-selection criterion
    * next to q292's silhouette. */
  def q441CalinskiHarabasz(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.calinskiHarabasz(
        Tables.embeddings(spark, dir), "label", "embedding")
      .select($"n", $"k", $"dims", round($"ssb", 4).as("ssb"),
        round($"ssw", 4).as("ssw"), round($"ch", 6).as("ch"))

  /** q442 — Davies–Bouldin index ([[graft.operators.Similarity
    * .daviesBouldin]]): each label cluster scored against its MOST
    * confusable rival — round-12 decimal point-distance means, exact
    * centroid-pair numerators, k²-bounded grid. */
  def q442DaviesBouldin(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.daviesBouldin(
        Tables.embeddings(spark, dir), "label", "embedding")
      .select($"n", $"k", round($"db", 6).as("db"))

  /** q468 — product quantization ([[graft.operators.Similarity
    * .productQuantize]]): the embedding table PQ-encoded into 8
    * subspaces × 16 codewords — 64 floats per row become 8 nibbles,
    * the 32× compression that keeps a web-scale candidate scan in
    * memory (q292's int8 is the per-dimension sibling; PQ exploits
    * cross-dimension structure). Deterministic smallest-id codebooks,
    * strictly-less argmin folds (ties to the smaller code), and a
    * per-row total reconstruction error whose subspace distances fold
    * in pinned order — the oracle replays codebook, grid argmin and
    * ordered error sum exactly. */
  def q468ProductQuantize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.productQuantize(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        nSub = 8, nCodes = 16)
      .select($"id".as("vec_id"),
        array_join($"codes", ",").as("codes"),
        round($"err", 6).as("err"))

  /** q465 — Aho–Corasick multi-pattern scan ([[graft.functions
    * .AhoCorasick.counts]], codegen Expression): every document
    * checked against a FIXED marker set in one automaton pass —
    * the k-needle generalization of q462's single fuzzy needle and
    * the exact-scan companion to q89's n-gram decontamination. The
    * pattern set is deliberately NESTED/overlapping ("tab" inside
    * "table", "an" inside "scan") to pin the all-occurrences AC
    * semantics an engine cannot fake with k non-overlapping substring
    * counts. Per doc: the per-pattern counts, their total, and how
    * many distinct patterns hit — the contamination board a blocklist
    * gate ranks on. */
  def q465AhoCorasick(spark: SparkSession, dir: String): DataFrame = {
    val pats = Seq("table", "tab", "an", "scan", "spark", "park", "row")
    val d = docs(spark, dir).select($"doc_id", $"text")
      .withColumn("c", graft.functions.AhoCorasick.counts($"text", pats))
    d.select(($"doc_id" :: pats.zipWithIndex.map { case (p, i) =>
        element_at($"c", i + 1).as(s"n_$p") }.toList ::: List(
        expr("aggregate(c, 0L, (a, x) -> a + x)").as("n_total"),
        expr("aggregate(c, 0L, (a, x) -> a + IF(x > 0, 1L, 0L))")
          .as("n_patterns_hit"))): _*)
      .where($"n_total" > 0)
  }
}
