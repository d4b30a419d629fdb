package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{FastHash, TextOps}
import graft.operators.{Dedup, Similarity}

/** Degenerate-input hardening: null text, empty frames, single-token and
  * empty-string documents, zero vectors. At 100 TB these inputs ALWAYS
  * occur somewhere in the corpus; an operator that throws on one bad row
  * kills a 1000-executor stage. */
class EdgeCasesSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private val messyDocs = Seq(
    (1L, "normal document with several words here"),
    (2L, ""),                       // empty
    (3L, "   "),                    // whitespace only
    (4L, "single"),                 // below shingle width
    (5L, null.asInstanceOf[String]) // null payload
  ).toDF("doc_id", "text")

  test("shingle/minhash/simhash kernels survive null, empty, short text") {
    val out = messyDocs.select(
      $"doc_id",
      FastHash.shingles($"text", 3).as("sh"),
      FastHash.minhashSignature($"text", 3, 8).as("sig"),
      FastHash.simhash($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1).getSeq[String](1).nonEmpty)
    assert(out(2).getSeq[String](1).isEmpty)          // no shingles
    assert(out(4).getSeq[String](1).isEmpty)          // 1 token < n
    assert(out(2).isNullAt(2) && out(4).isNullAt(2))  // sig null when < n tokens
    assert(out(5).isNullAt(1) && out(5).isNullAt(2) && out(5).isNullAt(3))
  }

  test("round-7 series operators survive empty and single-row inputs") {
    import graft.operators.{Autocorr, ChangePoint, Forecast, Regression,
      Sequences, Survival, WeightedStats}
    val empty = Seq.empty[(String, String, Long)].toDF("k", "o", "x")
    val one = Seq(("k", "d1", 5L)).toDF("k", "o", "x")
    // ACF: no pairs on a single row; empty in, empty out
    assert(Autocorr.acf(empty, "k", "o", "x", 3).count() === 0)
    assert(Autocorr.acf(one, "k", "o", "x", 3).count() === 0)
    // Holt: single element is its own level, zero trend
    val h = Forecast.holtSummary(one, "k", "o", "x", 0.5, 0.25, 7).head()
    assert(h.getDouble(2) === 5.0 && h.getDouble(3) === 0.0)
    assert(Forecast.holtSummary(empty, "k", "o", "x", 0.5, 0.25, 7).count() === 0)
    // CUSUM / binary segment / Theil-Sen degrade, never throw
    assert(ChangePoint.cusumSummary(empty, "k", "o", "x", 1.0, 5.0).count() === 0)
    assert(ChangePoint.binarySegment(one, "k", "o", "x").count() === 0)
    assert(Regression.theilSen(one, "k", "o", "x").count() === 0)
    // Kaplan-Meier: all-censored cohort keeps survival at 1
    val cens = Seq((3L, 0), (5L, 0)).toDF("dur", "ev")
    val km = Survival.kaplanMeier(cens, "dur", "ev").collect()
    assert(km.forall(_.getDouble(4) === 1.0))
    assert(Survival.kaplanMeier(Seq.empty[(Long, Int)].toDF("dur", "ev"),
      "dur", "ev").count() === 0)
    // gini: single row yields null; empty yields nothing
    assert(WeightedStats.gini(one.select($"k".as("g"), $"x".as("v")), "g", "v")
      .head().isNullAt(3))
    // basket lift: single-type sessions produce no pairs
    val solo = Seq((1L, 0L, 1L, "a"), (2L, 0L, 2L, "a")).toDF("u", "ms", "eid", "tp")
    assert(Sequences.basketLift(solo, "u", "ms", "eid", "tp", 1000L).count() === 0)
  }

  test("round-7 distribution operators survive one-sided and constant inputs") {
    import graft.operators.{Divergence, Eval, Extremes, Mixture, Profile}
    // KS with an empty right side: d_num 0-gap impossible -> null d guard
    val oneSided = Seq((1L, false), (2L, false)).toDF("v", "r")
    val ks = Divergence.ksTwoSample(oneSided, "v", col("r")).head()
    assert(ks.getLong(1) === 0L && ks.isNullAt(4))
    // calibration on constant scores: one bucket, exact rate
    val const = Seq(("g", 5L, 1), ("g", 5L, 0)).toDF("g", "s", "p")
    val cal = Eval.calibrationCurve(const, "g", "p", "s", 10).collect()
    assert(cal.length === 1 && cal(0).getDouble(5) === 0.5)
    // gumbel on a constant series: beta 0, return level = the constant
    val flat = Seq(("k", 7L), ("k", 7L), ("k", 7L)).toDF("k", "x")
    val g = Extremes.gumbelFit(flat, "k", "x", Seq(10)).head()
    assert(g.getDouble(3) === 0.0 && g.getDouble(5) === 7.0)
    // water-fill with zero budget: all zeros, nothing at capacity
    val wf = Mixture.waterFill(Seq(("a", 5L), ("b", 3L)).toDF("s", "avail"),
      "s", "avail", 0L).collect()
    assert(wf.forall(_.getLong(2) === 0L))
    // power law over an empty tail: null alpha, zero n
    val pl = Profile.powerLawAlpha(
      Seq((1L, 10L)).toDF("v", "c").where(col("v") > 100), "v", "c", 1L).head()
    assert(pl.isNullAt(0) && pl.isNullAt(2)) // empty tail: null n, null alpha
  }

  test("near-dup pipelines emit no pairs (not errors) on a degenerate corpus") {
    assert(Dedup.minhashNearDups(messyDocs, "doc_id", "text", 3, 16, 8, 0.5).count() == 0)
    assert(Dedup.simhashNearDups(messyDocs.where($"text".isNotNull),
      "doc_id", "text").columns.contains("hamming"))
    val jp = Dedup.ngramJaccardPairs(
      messyDocs.where($"text".isNotNull), "doc_id", "text", 3)
    // pairs against empty shingle sets are NaN/0-union — filtered by any
    // threshold predicate, never a crash
    assert(jp.where($"jaccard" >= 0.5).count() == 0)
  }

  test("text stats kernels handle null/empty without throwing") {
    val out = messyDocs.select(
      $"doc_id",
      TextOps.tokenCount($"text").as("ws"),
      TextOps.bpeTokenCount($"text").as("bpe"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2).isNullAt(1) || out(2).getAs[Number]("ws").longValue() == 0L)
    assert(out(5).isNullAt(1) || out(5).getAs[Number]("ws").longValue() == 0L)
  }

  test("zero-norm vectors (NaN cosine) are guarded out of every similarity path") {
    // NaN compares GREATER than any number in both Spark and DuckDB, so an
    // unguarded threshold/top-k would surface junk rows FIRST — the
    // operators carry explicit !isnan guards.
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.1, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0))) // zero-norm junk row
    val corpus = vecs.toDF("vec_id", "v")
    val probes = corpus.where($"vec_id" === 0L)
    val top = Similarity.bruteForceTopK(corpus, probes, "vec_id", "v", 5)
      .collect().map(_.getAs[Long]("corpus_id")).toSeq
    assert(top == Seq(1L)) // junk row absent, not ranked first
    val pairs = Dedup.embeddingNearDupsExact(corpus, "vec_id", "v", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L))) // zero vector pairs with nothing
  }

  test("bracket kernels yield nothing on empty bars; grid kernel matches") {
    assert(graft.kernels.Bracket.scanGroup(1L, Iterator.empty).isEmpty)
    assert(graft.kernels.Bracket.scanGroupGrid(1L, Iterator.empty,
      Array(graft.kernels.Bracket.GridCfg(0, 1.0, 1.4, 0.75, false, 1.0))).isEmpty)
  }

  test("empty orders frame flows through the holdout split (q24 shape)") {
    val empty = Seq.empty[(Long, Double)].toDF("ts_ms", "o_totalprice")
    val med = empty.agg(expr("percentile(ts_ms, 0.5)").as("med"))
    val out = empty.crossJoin(broadcast(med))
      .withColumn("half", when($"ts_ms" <= $"med", 1).otherwise(2))
      .groupBy($"half").count()
    assert(out.count() == 0) // empty result, no exception
  }

  test("connected components of an empty pair set is empty, not a hang") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.operators.Components.connectedComponents(empty, "a", "b")
      .count() == 0)
  }

  test("chunking and packing survive messy documents") {
    val chunks = graft.operators.Packing.chunkTokens(
      messyDocs.na.drop(Seq("text")), "doc_id", "text", size = 4, stride = 4)
    // every non-null doc yields at least one chunk (possibly of "" / 1 token)
    assert(chunks.select("doc_id").distinct().count() == 4)
    val packed = graft.operators.Packing.concatChunkAssign(
      messyDocs.na.drop(Seq("text"))
        .select($"doc_id", lit("s").as("stream"),
          TextOps.tokenCount($"text").as("n_tok")),
      "doc_id", "stream", "n_tok", 8)
    // zero-token docs occupy no span but still get a window assignment
    assert(packed.count() == 4)
    assert(packed.where($"seq_end" < $"seq_start").count() == 0)
  }

  test("bm25 over a corpus missing every query term scores all zero") {
    val docs = Seq((1L, "aa bb cc"), (2L, "dd ee")).toDF("doc_id", "text")
    val out = graft.operators.Ranking.bm25TopK(docs, "doc_id", "text",
      Seq("zz"), topK = 5).collect()
    assert(out.length == 2 && out.forall(_.getAs[Double]("score") == 0.0))
  }

  test("round-6 text operators survive the degenerate corpus without throwing") {
    val clean = messyDocs.where($"text".isNotNull)
    // Gopher metrics: nulls propagate, empties get 1-word "" token
    val g = graft.operators.Gopher.metrics(clean, "text").collect()
    assert(g.length == 4)
    // paragraph dedup: empty/whitespace docs pass through
    val p = graft.operators.Paragraphs.dedupParagraphs(clean, "doc_id", "text")
    assert(p.count() == 4)
    // DSIR: weights defined for every doc (empty docs have the "" token)
    val d = graft.operators.Dsir.importanceWeights(clean, "doc_id", "text",
      $"doc_id" === 1L).collect()
    assert(d.length == 4 && d.forall(r => !r.getAs[Double]("weight").isNaN))
    // winnowing census: short/empty docs report zero fingerprints
    val wn = graft.operators.Winnow.sharedFingerprintCensus(clean, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_fp")).toMap
    assert(wn(2L) == 0L && wn(4L) == 0L)
    // divergence: a single-group corpus diverges ~0 from itself
    val dv = graft.operators.Divergence.sourceDivergence(
      clean.withColumn("src", lit("only")), "src", "text").collect()
    assert(dv.length == 1 && dv(0).getAs[Double]("kl") >= 0)
  }

  test("null text flows through the round-6 text operators without throwing") {
    // the degenerate row a 100 TB crawl always contains somewhere
    val withNull = messyDocs // includes doc 5 with null text
    val g = graft.operators.Gopher.metrics(withNull, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // null text must never PASS the gate (null comparisons are falsy)
    assert(!g(5L).getAs[Boolean]("gopher_pass") ||
      g(5L).isNullAt(g(5L).fieldIndex("gopher_pass")))
    val p = graft.operators.Paragraphs.dedupParagraphs(withNull, "doc_id", "text")
    assert(p.count() == 5) // all rows kept, none threw
    val w = graft.operators.Winnow.sharedFingerprintCensus(withNull, "doc_id", "text")
    assert(w.count() == 5)
    val dm = graft.operators.Decontam.maskContaminated(
      withNull, "doc_id", "text",
      Seq(Tuple1("alpha beta gamma delta epsilon zeta eta theta")).toDF("text"),
      "text", 8)
    assert(dm.count() == 5)
    val dv = graft.operators.Dsir.importanceWeights(withNull, "doc_id", "text",
      $"doc_id" === 1L)
    assert(dv.count() == 5)
  }

  test("SemDeDup on an empty and a single-vector corpus returns sane frames") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    assert(graft.operators.SemDedup.semDedup(empty, "vec_id", "v", 4, 0.9).count() == 0)
    val single = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    val r = graft.operators.SemDedup.semDedup(single, "vec_id", "v", 4, 0.9).collect()
    assert(r.length == 1 && r(0).getBoolean(2))
    // quantization of a single vector: every dim degenerate, zero error
    val q = graft.operators.Similarity.quantizeInt8(single, "vec_id", "v").collect()
    assert(q(0).getAs[Double]("max_abs_err") == 0.0)
  }
}
