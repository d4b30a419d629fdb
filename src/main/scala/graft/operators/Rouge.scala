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
}
