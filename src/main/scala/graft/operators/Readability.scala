package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flesch reading-ease summary (Flesch 1948) — the classic readability
  * screen, a standard quality-mix signal next to the Gopher rules and
  * stopword/punctuation ratios ([[Gopher]], `TextStatsExpr`): training
  * mixes track the READABILITY distribution, not just token counts,
  * because a corpus drifting toward legalese or toward fragments shifts
  * this score long before perplexity moves.
  *
  * Counting rules (deterministic, regex-replayable on any engine):
  * words = whitespace-delimited tokens; sentences = runs of `.!?`
  * (min 1 per non-empty doc); syllables = vowel-group runs
  * `[aeiouy]+` of the lowercased text — the standard cheap estimator
  * (hyphenation-dictionary accuracy is a model concern, not an
  * engine concern). The score is computed ONCE per group from exact
  * integer sums — corpus-level Flesch
  *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
  * — not an average of per-doc floats, so no float-summation order
  * exists anywhere.
  *
  * Scale shape: the three counts are one codegen'd projection pass +
  * a single map-side-combined group aggregate; output is bounded by
  * the group vocabulary. */
object Readability {

  /** Output: (group, n_docs, words, sentences, syllables, flesch);
    * flesch null for a group with zero words. */
  def fleschSummary(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t = trim(col(textCol))
    val counted = df.select(col(groupCol).as("g"),
      when(length(t) === 0, 0L)
        .otherwise(size(split(t, "\\s+")).cast("long")).as("__w"),
      greatest(lit(1L),
        size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")).cast("long"))
        .as("__s"),
      size(expr(s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)"))
        .cast("long").as("__y"))
    counted.groupBy(col("g")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("__w")).as("words"),
        sum(col("__s")).as("sentences"),
        sum(col("__y")).as("syllables"))
      .withColumn("flesch",
        when(col("words") > 0,
          lit(206.835) -
            lit(1.015) * (col("words").cast("double") / col("sentences").cast("double")) -
            lit(84.6) * (col("syllables").cast("double") / col("words").cast("double"))))
  }
}
