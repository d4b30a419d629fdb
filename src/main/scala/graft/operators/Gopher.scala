package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full Gopher document-quality rule suite (Rae et al. 2021, Appendix
  * A1.1 "Quality filtering"): hard per-document heuristics that web-scale
  * pipelines apply BEFORE model-based scoring. [[graft.functions.TextOps
  * .qualityScore]] is the blended 0-1 score; this operator exposes each
  * rule as its own metric + boolean so a pipeline can census WHY
  * documents fail (the per-rule breakdown Gopher reports).
  *
  * Every metric is a pure projection over the scan — token/line work is
  * per-row higher-order-function arithmetic, no shuffle; the census
  * aggregation map-side combines. Rules (Gopher thresholds):
  *  - word count in [minWords, maxWords]           (50, 100 000)
  *  - mean word length in [3, 10]
  *  - symbol-to-word ratio <= 0.1  ('#' and '...')
  *  - lines starting with a bullet <= 90%
  *  - lines ending in an ellipsis <= 30%
  *  - words with >= 1 alphabetic char >= 80%
  *  - >= 2 occurrences of common stop words
  */
object Gopher {

  /** The stop set Gopher names: "the, be, to, of, and, that, have, with". */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Non-overlapping occurrence count of a literal — the length-delta
    * trick, identical in Spark `replace` and DuckDB `replace`. */
  private def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) /
      needle.length).cast("long")

  /** Per-doc metrics + per-rule booleans + overall `gopher_pass`. Input
    * columns are preserved; lines split on '\n', words on whitespace (the
    * corpus-wide tokenization contract both engines share). Integer
    * numerators accumulate as longs; ratios divide once at the end, so
    * the doubles are a fixed expression order cross-engine. */
  def metrics(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = lower(trim(col(textCol)))
    val words = split(t, "\\s+")
    val lines = split(t, "\n")
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("long")
    val stopArr = array(gopherStops.map(lit): _*)
    df
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len",
        aggregate(words, lit(0L), (s, w) => s + length(w).cast("long"))
          .cast("double") / nWords.cast("double"))
      .withColumn("symbol_ratio",
        (occurrences(t, "#") + occurrences(t, "...")).cast("double") /
          nWords.cast("double"))
      .withColumn("bullet_frac",
        size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ")))
          .cast("double") / nLines.cast("double"))
      .withColumn("ellipsis_frac",
        size(filter(lines, l => l.endsWith("...")))
          .cast("double") / nLines.cast("double"))
      .withColumn("alpha_frac",
        size(filter(words, w => w.rlike("[a-z]"))).cast("double") /
          nWords.cast("double"))
      .withColumn("n_stop",
        size(filter(words, w => array_contains(stopArr, w))).cast("long"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_mwl",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("ok_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("ok_bullet", col("bullet_frac") <= 0.9)
      .withColumn("ok_ellipsis", col("ellipsis_frac") <= 0.3)
      .withColumn("ok_alpha", col("alpha_frac") >= 0.8)
      .withColumn("ok_stop", col("n_stop") >= 2)
      .withColumn("gopher_pass",
        col("ok_words") && col("ok_mwl") && col("ok_symbol") &&
          col("ok_bullet") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stop"))
  }

  /** Per-group census: docs, passes, and per-rule failure counts — the
    * "why does my corpus shrink" report. Map-side-combined sums. */
  def census(df: DataFrame, textCol: String, groupCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    def fails(flag: String): Column =
      sum(when(col(flag), 0L).otherwise(1L)).as(s"fail_${flag.stripPrefix("ok_")}")
    metrics(df, textCol, minWords, maxWords)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("n_pass"),
        fails("ok_words"), fails("ok_mwl"), fails("ok_symbol"),
        fails("ok_bullet"), fails("ok_ellipsis"), fails("ok_alpha"),
        fails("ok_stop"))
  }

  /** Decoding-loop tail detector — the DEGENERATE-GENERATION artifact
    * census: a model stuck in a loop ends its output with a period-k
    * block repeated verbatim ("...the cat sat. the cat sat."), which
    * the whole-document repetition ratios in [[metrics]] dilute away
    * on long docs. Per doc, loop_k = the largest k ≤ maxK whose final
    * k tokens EQUAL the preceding k tokens (tail period doubling);
    * rolled up per group so the readout survives an artifact rate of
    * zero (the healthy-corpus case prints loudly as n_looping = 0,
    * not an empty result).
    *
    * Exactness: pure token-slice equality — integer/boolean all the
    * way. Scale shape: per-doc array ops (maxK slice compares), one
    * group census; nothing but the census shuffles. Output: (g,
    * n_docs, n_looping, looping_share, max_loop_k). */
  def tailLoopCensus(docs: DataFrame, groupCol: String, textCol: String,
      maxK: Int = 16): DataFrame = {
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    val toks = docs.select(col(groupCol).as("g"),
      split(lower(trim(col(textCol))), "\\s+").as("__t"))
      .select(col("g"), filter(col("__t"), t => length(t) > 0).as("__t"))
    val scored = toks.withColumn("__loop_k", expr(
      s"""aggregate(sequence(1, $maxK), 0, (acc, k) ->
         |  IF(2 * k <= size(__t) AND
         |     slice(__t, size(__t) - 2 * k + 1, k) =
         |     slice(__t, size(__t) - k + 1, k), k, acc))""".stripMargin))
    scored.groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__loop_k") > 0, 1L).otherwise(0L)).as("n_looping"),
        max(col("__loop_k")).as("max_loop_k"))
      .select(col("g"), col("n_docs"), col("n_looping"),
        (col("n_looping").cast("double") / col("n_docs").cast("double"))
          .as("looping_share"), col("max_loop_k"))
  }
}
