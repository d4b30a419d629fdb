package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ROUGE-L (Lin 2004): longest-common-subsequence overlap between a
  * reference text and a candidate — the summarization/paraphrase
  * fidelity score a distillation or synthetic-data pipeline computes
  * between source documents and model rewrites before keeping them.
  * Order-sensitive where n-gram Jaccard ([[Dedup]]) is not: a shuffled
  * bag of the same words scores high Jaccard but low LCS.
  *
  * Exactness: the LCS length is an exact integer from the codegen'd
  * two-row DP ([[graft.functions.FastHash.lcsLenValue]] — one tight JVM
  * loop inside whole-stage codegen, no per-cell Catalyst evaluation);
  * precision/recall/F1 are pinned-shape divisions of exact integers per
  * row, never summed — bit-replayable cross-engine.
  *
  * Scale shape: pure per-row projection — no shuffle at all; the DP is
  * O(cap²) per pair, and the token CAP IS THE SEMANTICS (both sides
  * truncate to `cap` tokens before the DP; the oracle replays the same
  * cap), not a silent truncation. Pairing candidates with references is
  * the caller's join; this operator scores already-paired rows. */
object Rouge {

  /** Per row: token counts (capped), LCS length, and ROUGE-L
    * precision (lcs/n_cand), recall (lcs/n_ref), F1. F1 is 0 when the
    * pair shares nothing, null only when a side has zero tokens. */
  def rougeL(df: DataFrame, idCol: String, refCol: String,
      candCol: String, cap: Int = 64): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    // split("\s+") on an empty/whitespace string yields [""] — ONE empty
    // token — so zero-length tokens are filtered before counting: an
    // empty side must report n_tok = 0 and take the null branch (two
    // empty texts are "no evidence", not a perfect F1 = 1.0 match)
    def nTok(c: String) =
      least(size(filter(split(lower(trim(col(c))), "\\s+"),
        t => length(t) > 0)), lit(cap)).cast("long")
    val base = df.select(col(idCol),
      nTok(refCol).as("n_ref"), nTok(candCol).as("n_cand"),
      graft.functions.FastHash.tokenLcs(col(refCol), col(candCol), cap)
        .as("lcs"))
    val p = col("lcs").cast("double") / col("n_cand").cast("double")
    val r = col("lcs").cast("double") / col("n_ref").cast("double")
    base
      .withColumn("rouge_p", when(col("n_cand") > 0, p))
      .withColumn("rouge_r", when(col("n_ref") > 0, r))
      .withColumn("rouge_f1",
        when(col("n_cand") > 0 && col("n_ref") > 0 && col("lcs") > 0,
          lit(2.0) * col("rouge_p") * col("rouge_r") /
            (col("rouge_p") + col("rouge_r")))
          .when(col("n_cand") > 0 && col("n_ref") > 0, lit(0.0)))
  }

  /** Sentence-BLEU (Papineni et al. 2002), single reference, n = 1..4:
    * clipped modified n-gram precision p_n = Σ_g min(c_cand(g),
    * c_ref(g)) / Σ_g c_cand(g), geometric mean over the four orders,
    * brevity penalty exp(1 − r/c) when the candidate is shorter — the
    * standard generation-fidelity score next to [[rougeL]]'s LCS
    * recall (BLEU punishes n-gram hallucination; ROUGE punishes
    * omission). BLEU is 0 when any order's clipped count is 0 (the
    * unsmoothed definition — ln 0 is not a number, and a doc-grain
    * pipeline wants the loud zero, not a smoothing constant); null
    * when the candidate lacks 4-grams entirely.
    *
    * Exactness: all counts are exact integer censuses via the
    * positional-n-gram kernel ([[graft.functions.FastHash
    * .ngramsValue]]); p_n are single divisions, BLEU one pinned
    * exp/ln shape (q121 libm contract). Scale shape: one explode to
    * (id, n, gram) per side, one census join keyed (id, n, gram) —
    * candidate-side grams only (clipping never needs ref-only grams),
    * then an id-grain rollup. No corpus-wide state. */
  def bleu(df: DataFrame, idCol: String, refCol: String,
      candCol: String): DataFrame = {
    val maxN = 4
    def grams(c: String, side: String) = {
      val perN = (1 to maxN).map { n =>
        df.select(col(idCol).as("id"), lit(n).as("n"),
          explode(graft.functions.FastHash.ngrams(col(c), n)).as("gram"))
      }.reduce(_ unionAll _)
      perN.groupBy(col("id"), col("n"), col("gram"))
        .agg(count(lit(1)).as(s"c_$side"))
    }
    val joined = grams(candCol, "cand")
      .join(grams(refCol, "ref"), Seq("id", "n", "gram"), "left")
      .groupBy(col("id"), col("n"))
      .agg(sum(col("c_cand")).as("tot"),
        sum(least(col("c_cand"), coalesce(col("c_ref"), lit(0L))))
          .as("clip"))
    def pn(i: Int) = max(when(col("n") === i,
      col("clip").cast("double") / col("tot").cast("double")))
    val lens = df.select(col(idCol).as("id"),
      size(graft.functions.FastHash.ngrams(col(refCol), 1)).cast("long")
        .as("r_len"),
      size(graft.functions.FastHash.ngrams(col(candCol), 1)).cast("long")
        .as("c_len"))
    val byId = joined.groupBy(col("id"))
      .agg(pn(1).as("p1"), pn(2).as("p2"), pn(3).as("p3"), pn(4).as("p4"),
        count(lit(1)).as("__orders"))
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("r_len").cast("double") / col("c_len").cast("double")))
    val geo = exp((log(col("p1")) + log(col("p2")) + log(col("p3")) +
      log(col("p4"))) / 4.0)
    lens.join(byId, Seq("id"), "left")
      .select(col("id"), col("r_len"), col("c_len"),
        col("p1"), col("p2"), col("p3"), col("p4"),
        when(col("__orders") === maxN &&
            col("p1") > 0 && col("p2") > 0 && col("p3") > 0 &&
            col("p4") > 0, bp * geo)
          .when(col("__orders") === maxN, lit(0.0)).as("bleu"))
  }
}
