package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators over document corpora (training-data pipeline
  * surface): token counting, quality scoring, language-ID heuristic,
  * fingerprinting. All pure column expressions (codegen'd, no UDF).
  */
object TextOps {

  /** Whitespace token count. Null text -> null (this session's size()
    * returns -1 on null input, which would silently corrupt token SUMs;
    * null propagates through sums on both engines instead). */
  def tokenCount(text: Column): Column =
    when(text.isNull, lit(null).cast("int"))
      .when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token estimate: word-boundary pieces plus residual
    * length/4 for long words (a public heuristic for budgeting, not a real
    * tokenizer: ~4 chars/token average).
    */
  def tokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / lit(4.0d)).cast("long")

  /** BPE-ish regex pre-tokenizer count (GPT-2-style pattern minus the
    * lookahead pieces RE2 cannot run — letters / digits / punctuation
    * runs with optional leading space, plus whitespace runs). A real
    * subword vocab refines these pieces; this is the public
    * pre-tokenization granularity. */
  val bpePattern = " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def bpeTokenCount(text: Column): Column =
    when(text.isNull, lit(null).cast("int")) // size(null) = -1, see tokenCount
      .otherwise(size(regexp_extract_all(text, lit(bpePattern), lit(0))))

  /** Punctuation ratio: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0d)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text).cast("double"))

  /** Fraction of tokens that are stopwords (small English core list). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be")

  def stopwordRatio(text: Column): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    when(size(tokens) === 0, lit(0.0d)).otherwise(
      size(filter(tokens, t => t.isin(stopwords.map(lit(_)): _*)))
        .cast("double") / size(tokens).cast("double"))
  }

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val tokens = split(trim(text), "\\s+")
    when(size(tokens) === 0, lit(0.0d)).otherwise(
      aggregate(tokens, lit(0L), (a, t) => a + length(t)).cast("double")
        / size(tokens).cast("double"))
  }

  /** Document quality score in [0,1]: blend of length band, stopword
    * presence, and low punctuation noise (C4/Gopher-style heuristics,
    * public rule shapes).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok >= 10 && nTok <= 10000, lit(1.0d))
      .when(nTok >= 3, lit(0.5d)).otherwise(lit(0.0d))
    val stopOk  = when(stopwordRatio(text) >= 0.05, lit(1.0d)).otherwise(lit(0.3d))
    val punctOk = when(punctRatio(text) <= 0.2, lit(1.0d)).otherwise(lit(0.4d))
    round(lit(0.5d) * lengthOk + lit(0.25d) * stopOk + lit(0.25d) * punctOk, 4)
  }

  /** Language-ID heuristic: score = fraction of tokens in a per-language
    * marker set; pick the arg-max language, 'unknown' when all zero.
    * (n-gram/dictionary heuristic — a stand-in for a real classifier.)
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  def langScore(text: Column, lang: String): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    when(size(tokens) === 0, lit(0.0d)).otherwise(
      size(filter(tokens, t => t.isin(langMarkers(lang).map(lit(_)): _*)))
        .cast("double") / size(tokens).cast("double"))
  }

  def langId(text: Column): Column = {
    val scored = langMarkers.keys.toSeq.sorted.map(l =>
      struct(langScore(text, l).as("score"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unknown"))
  }

  /** Rolling-hash document fingerprint: xxhash64 over the normalized text
    * (whitespace collapsed, lower-cased) — stable under reflow. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** HTML entities unescaped by [[cleanText]], applied in this order:
    * named entities first, `&amp;` last, so a literal "&amp;lt;" decodes
    * to "&lt;" (single-pass unescape, the standard behavior). */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Web-text cleaning (the C4-style markup strip that runs before any
    * quality/dedup stage): drop HTML/XML tags, unescape the common
    * entities, strip control characters, collapse whitespace runs to a
    * single space, trim. Pure regexp_replace chain — codegen'd, no UDF,
    * and replayable verbatim by any engine with POSIX regex replace. */
  def cleanText(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val unescaped = htmlEntities.foldLeft(noTags) { case (c, (ent, rep)) =>
      // entity strings are regex-safe literals except '&' which is literal
      // in both Spark and DuckDB regex syntax
      regexp_replace(c, ent, rep)
    }
    // explicit hex range, not \p{Cntrl}: Java regex and RE2 agree on
    // [\x00-\x1F\x7F] but diverge on the named class's Unicode scope
    val noCtl = regexp_replace(unescaped, "[\\x00-\\x1F\\x7F]", " ")
    trim(regexp_replace(noCtl, "\\s+", " "))
  }
}
