package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TrainingData

/** Targeted semantics for the corpus-hygiene operators (q86-q89) beyond
  * the DuckDB oracle: the planted fixtures must actually trip each
  * detector (a broken operator must not be able to pass with an empty or
  * degenerate result — the q71/q75 lesson from round 1). */
class TrainingDataOpsSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("q121: LM score is positive, OOV-floored, and frequency-monotone") {
    val rows = TrainingData.q121LmScore(spark, dir).collect()
    assert(rows.length == 500)
    val scores = rows.map(r => r.getLong(0) -> r.getAs[Double]("mean_nll")).toMap
    // NLL of a unigram model is strictly positive and bounded by the
    // OOV floor -ln(1/N): N tokens at sf0.001 is well under e^20
    assert(scores.values.forall(s => s > 0 && s < 20))
    // monotonicity probe: a doc of purely top-vocab tokens must score
    // below the corpus-worst (rare/OOV-heavy) doc by construction
    assert(scores.values.min < scores.values.max)
  }

  test("q139: bigram NLL is positive, finite, null only for single-token docs") {
    val rows = TrainingData.q139BigramLm(spark, dir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tok")
      if (n > 1) {
        val s = r.getAs[Double]("mean_nll_bi")
        // positive (a probability < 1 per step) and under the OOV+backoff
        // ceiling -ln(1/N) + ln(10) ~ 13 for this corpus
        assert(s > 0 && s < 15, s"doc ${r.getLong(0)}: $s")
      } else assert(r.isNullAt(r.fieldIndex("mean_nll_bi")))
    }
  }

  test("q86: planted PII is found and redaction shrinks the text") {
    val rows = TrainingData.q86PiiRedact(spark, dir).collect()
    val emails = rows.map(_.getAs[Long]("emails_found")).sum
    val phones = rows.map(_.getAs[Long]("phones_found")).sum
    val redacted = rows.map(_.getAs[Long]("chars_redacted")).sum
    assert(emails > 0 && phones > 0)
    // every redaction replaces a match longer than its [EMAIL]/[PHONE] tag
    assert(redacted > 0)
    assert(rows.forall(r =>
      r.getAs[Long]("docs_with_pii") <= r.getAs[Long]("n_docs")))
  }

  test("q87: vocabulary head is 20 rows of positive descending frequency") {
    val rows = TrainingData.q87Vocab(spark, dir).collect()
    assert(rows.length == 20)
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.forall(_ > 0))
    assert(freqs.sameElements(freqs.sorted.reverse))
  }

  test("q88: contamination histogram accounts for every distinct 5-gram once") {
    val rows = TrainingData.q88NgramContamination(spark, dir).collect()
    assert(rows.nonEmpty)
    // df >= 1 always; shared shingles (df >= 2) exist in this corpus
    assert(rows.forall(_.getAs[Long]("df") >= 1))
    assert(rows.exists(_.getAs[Long]("df") >= 2))
  }

  test("packing: concat-and-chunk assignment fills per-stream windows exactly") {
    import spark.implicits._
    // stream A sorted by (tok desc, id): 100, 60, 50, 20 -> offsets
    // 0, 100, 160, 210 over ctx=64: windows [0,1], [1,2], [2,3], [3,3]
    val df = Seq(
      ("a1", "A", 100), ("a2", "A", 60), ("a3", "A", 50), ("a4", "A", 20),
      ("b1", "B", 64), ("b2", "B", 1)).toDF("id", "stream", "tok")
    val out = graft.operators.Packing.concatChunkAssign(df, "id", "stream", "tok", 64)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[Long]("seq_start"), r.getAs[Long]("seq_end"))).toMap
    assert(out("a1") == (0L, 1L)) // 100 tokens straddle the first boundary
    assert(out("a2") == (1L, 2L))
    assert(out("a3") == (2L, 3L))
    assert(out("a4") == (3L, 3L)) // fits the remainder of window 3
    // stream B packs independently from offset 0 (no cross-stream leakage)
    assert(out("b1") == (0L, 0L)) // exactly one full window
    assert(out("b2") == (1L, 1L)) // next window starts clean
  }

  test("chunking: stride windows tile the doc; the tail chunk is short") {
    import spark.implicits._
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = graft.operators.Packing.chunkTokens(df, "doc_id", "text", size = 4, stride = 3)
      .collect().map(r => (r.getAs[Int]("chunk_ix"), r.getAs[Int]("start"),
        r.getAs[Int]("n_tok"), r.getAs[String]("chunk"))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (0, 0, 4, "t1 t2 t3 t4"),
      (1, 3, 4, "t4 t5 t6 t7"),   // 1-token overlap (size - stride)
      (2, 6, 4, "t7 t8 t9 t10"),
      (3, 9, 1, "t10")))          // ragged tail, never dropped
  }

  test("q100: planted doubled docs are the flagged ones") {
    val rows = TrainingData.q100Repetition(spark, dir).collect()
    val flagged = rows.map(_.getAs[Long]("n_flagged")).sum
    val planted = graft.Tables.documents(spark, dir)
      .where(org.apache.spark.sql.functions.col("doc_id") % 9 === 0).count()
    assert(flagged == planted, rows.mkString(", "))
    assert(rows.map(_.getAs[Double]("max_rep")).max > 0.4)
  }

  test("packing: materialized windows reassemble token order across doc boundaries") {
    import spark.implicits._
    // stream order (n desc, id): a1(5 toks) off 0, a2(2) off 5, a3(1) off 6
    // ctx=4 -> window 0 = a1[1..4], window 1 = a1[5] ++ a2 ++ a3
    val df = Seq(
      ("a1", "A", "w1 w2 w3 w4 w5"), ("a2", "A", "x1 x2"), ("a3", "A", "y1"),
      ("b1", "B", "z1 z2")).toDF("id", "stream", "text")
    val out = graft.operators.Packing
      .concatChunkMaterialize(df, "id", "stream", "text", ctx = 4)
      .collect().map(r => (r.getAs[String]("stream"), r.getAs[Long]("seq")) ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("win_tokens"),
          r.getAs[String]("win_text"))).toMap
    assert(out(("A", 0L)) == (1L, 4L, "w1 w2 w3 w4"))
    assert(out(("A", 1L)) == (3L, 4L, "w5 x1 x2 y1"))
    assert(out(("B", 0L)) == (1L, 2L, "z1 z2"))
    assert(out.size == 3)
  }

  test("q89: all five planted contaminated train docs are flagged") {
    val flagged = TrainingData.q89Decontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_shingles"))
      .toMap
    // planted ids 2000-2004 are verbatim copies of test docs 0-4: every
    // 8-gram is shared, so each must be flagged with a positive count
    (2000L to 2004L).foreach { id =>
      assert(flagged.contains(id), s"planted doc $id not flagged")
      assert(flagged(id) > 0)
    }
  }

  test("kneser-ney bigram NLL: hand-computed probabilities on a tiny " +
      "corpus; template docs score less surprising than novel ones") {
    import spark.implicits._
    // corpus: "a b a c" + "a b" + "x". contexts: c(a)=3, c(b)=1;
    // bigrams (a,b):2 (b,a):1 (a,c):1 -> ntypes=3; vocab {a,b,c,x} ->
    // vtot=4; Pc(w) = (np+1)/(3+4+1) = 2/8 for a, b, c
    val df = Seq((1L, "a b a c"), (2L, "a b"), (3L, "x")).toDF("id", "t")
    val out = graft.operators.KneserNey.bigramNll(df, "id", "t")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val pc = 2.0 / 8.0
    val pBgA = (math.max(2.0 - 0.75, 0.0) + 0.75 * 2.0 * pc) / 3.0
    val pAgB = (math.max(1.0 - 0.75, 0.0) + 0.75 * 1.0 * pc) / 1.0
    val pCgA = (math.max(1.0 - 0.75, 0.0) + 0.75 * 2.0 * pc) / 3.0
    val d1 = (-math.log(pBgA) + -math.log(pAgB) + -math.log(pCgA)) / 3.0
    assert(out(1L).getAs[Long]("n_pairs") == 3L)
    assert(math.abs(out(1L).getAs[Double]("mean_nll") - d1) < 1e-12,
      s"${out(1L)} vs $d1")
    assert(math.abs(out(2L).getAs[Double]("mean_nll") + math.log(pBgA)) < 1e-12)
    // single-token doc: no pairs, loud null
    assert(out(3L).getAs[Long]("n_pairs") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("mean_nll")))
    // a corpus of one repeated template + one novel doc: the template
    // copies are the less surprising ones
    val spam = (1 to 20).map(i => (i.toLong, "the quick brown fox")) :+
      (99L, "zebra quantum lattice the")
    val s = graft.operators.KneserNey.bigramNll(spam.toDF("id", "t"), "id", "t")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("mean_nll"))
      .toMap
    assert(s(1L) < s(99L), s.toString)
  }

  test("q330 compress bands (retired from the oracle board — deflate has " +
      "no DuckDB replay): banding census is total, bounded, and typed") {
    // the wrapper stays a library entry point; this pin replaces the
    // driver's former rows-only cell (the codec pair itself is
    // hash-oracle-gated end-to-end by q389_deflate_roundtrip)
    val dir = "/root/testdata/sf0.001"
    val out = TrainingData.q330CompressBands(spark, dir)
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("source", "string"), ("band", "bigint"), ("n_docs", "bigint")))
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("band"); b >= 0L && b <= 9L })
    // census is total: every document lands in exactly one band
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
  }
}
