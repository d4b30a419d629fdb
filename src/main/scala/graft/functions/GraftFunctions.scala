package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library (SURVEY.md §2.8).
  *
  * Everything here is a pure `Column` expression — whole-stage-codegen
  * friendly, no UDFs — so at 100 TB these stay inside
  * WholeStageCodegen spans and push down where Catalyst allows.
  *
  * Reference semantics cited per function (reference paths relative to
  * /root/reference).
  */
object GraftFunctions {

  /** F13 safe division: x / max(y, 1)  (overnight_scanner.py:507-508). */
  def safeDiv(x: Column, y: Column): Column = x / greatest(y, lit(1))

  /** F13 SQL-style NULLIF-guarded ratio (premium_eda.py:16). */
  def ratioOrNull(num: Column, den: Column): Column = num / nullif(den, lit(0))

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)

  /** F14 clamp to [lo, hi]  (enrichment-trigger/main.py:518,545). */
  def clamp(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** P16 safe-float: NaN/Inf -> null, round 4 (enrichment-trigger/main.py:353-357). */
  def safeFloat(c: Column): Column = {
    val d = c.cast("double")
    when(isnan(d) || d === Double.PositiveInfinity || d === Double.NegativeInfinity, lit(null))
      .otherwise(round(d, 4))
  }

  /** P17 extract_float: last whitespace-separated token parsed as double
    * (tune_vix_thresholds.py:8-16). Spark cast already yields null on failure.
    */
  def extractFloat(c: Column): Column =
    regexp_extract(c, "(\\S+)\\s*$", 1).cast("double")

  /** F2 OCC option-ticker construction (forward-paper-trader/main.py:46-51):
    * `O:{SYM}{yyMMdd}{C|P}{strike*1000:08d}`.
    */
  def occTicker(symbol: Column, expiration: Column, isCall: Column, strike: Column): Column =
    concat(
      lit("O:"),
      trim(symbol),
      date_format(expiration, "yyMMdd"),
      when(isCall, lit("C")).otherwise(lit("P")),
      lpad(round(strike * 1000).cast("long").cast("string"), 8, "0"))

  /** F3 document-id concat `{date}_{ticker}` (enrichment-trigger/main.py:803). */
  def docId(date: Column, key: Column): Column =
    concat_ws("_", date_format(date, "yyyy-MM-dd"), key)

  /** F16 tiered bucketing: generic CASE ladder over (threshold -> label),
    * thresholds tested in order with `>=`, first match wins
    * (win-tracker/main.py:91-111 classify_win ladder shape).
    */
  def tierLadder(c: Column, ladder: Seq[(Double, String)], default: String): Column =
    ladder.foldLeft(Option.empty[Column]) { case (acc, (thr, label)) =>
      val cond = when(c >= thr, lit(label))
      Some(acc.fold(cond)(a => a.when(c >= thr, lit(label))))
    }.fold(lit(default))(_.otherwise(lit(default)))

  /** F17 boolean scoring: sum of flags (enrichment-trigger/main.py:596-613). */
  def flagScore(flags: Column*): Column =
    flags.map(_.cast("int")).reduce(_ + _)

  /** F18-style additive rule score: each (condition, points) contributes when
    * true; result clamped to [0, maxScore] (overnight_scanner.py:569-672).
    */
  def ruleScore(rules: Seq[(Column, Int)], maxScore: Int): Column =
    clamp(rules.map { case (c, p) => when(c, lit(p)).otherwise(lit(0)) }.reduce(_ + _),
      0, maxScore.toDouble)

  /** F18 signals[] accumulation: array of labels for the rules that fired,
    * nulls compacted away (overnight_scanner.py:585-631).
    */
  def firedSignals(rules: Seq[(Column, String)]): Column =
    filter(
      array(rules.map { case (c, label) => when(c, lit(label)) }: _*),
      x => x.isNotNull)

  /** F20 support/resistance selection: support = greatest candidate strictly
    * below `price`, resistance = least candidate strictly above
    * (enrichment-trigger/main.py:372-386).
    */
  def supportLevel(price: Column, candidates: Seq[Column]): Column =
    candidates.map(c => when(c < price, c))
      .reduce((a, b) => greatest(a, b))

  def resistanceLevel(price: Column, candidates: Seq[Column]): Column =
    candidates.map(c => when(c > price, c))
      .reduce((a, b) => least(a, b))

  /** F11 epoch-ms from timestamp (win-tracker/main.py:286). */
  def epochMs(ts: Column): Column = unix_millis(ts)

  /** F5 regex repair: strip markdown code fences around an LLM JSON blob
    * (enrichment-trigger/main.py:171-184). */
  def stripJsonFences(c: Column): Column =
    regexp_replace(regexp_replace(c, "(?s)^\\s*```(?:json)?\\s*", ""), "(?s)\\s*```\\s*$", "")

  /** F6 substring JSON extraction: the text between the first '{' and the
    * last '}' inclusive (null when no braces). */
  def extractJsonObject(c: Column): Column = {
    val start = instr(c, "{")
    val end = length(c) - instr(reverse(c), "}") + 1
    when(start > 0 && end >= start, substring(c, start, end - start + 1))
  }

  /** F5+F6+F7 composed: repair fences, carve the object, parse with an
    * explicit schema (news_analysis contract shape). */
  def parseRepairedJson(c: Column, schemaDdl: String): Column =
    from_json(extractJsonObject(stripJsonFences(c)), schemaDdl,
      java.util.Collections.emptyMap[String, String]())

  /** F21 regime-weighted score blend (src/enrichment/core/config.py:39-58):
    * a weight map per regime, regime chosen by news-score thresholds
    * (EVENT when newsScore > hi, QUIET when < lo, else baseline). The
    * blend is a dot product of the regime's weights over score columns.
    */
  def regimeWeightedScore(newsScore: Column,
      scores: Seq[(Column, Double, Double)], // (col, eventWeight, quietWeight)
      lo: Double = 0.30, hi: Double = 0.70): Column = {
    val eventBlend = scores.map { case (c, w, _) => c * lit(w) }.reduce(_ + _)
    val quietBlend = scores.map { case (c, _, w) => c * lit(w) }.reduce(_ + _)
    when(newsScore > hi, eventBlend)
      .when(newsScore < lo, quietBlend)
      .otherwise((eventBlend + quietBlend) / 2)
  }
}
