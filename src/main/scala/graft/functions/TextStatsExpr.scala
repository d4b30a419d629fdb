package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics kernel. The declarative [[TextOps]] family
  * re-tokenizes the document for every metric (split/filter/aggregate are
  * CodegenFallback higher-order functions — interpreted, and common-
  * subexpression elimination does not cover them), which made the
  * text-analysis queries re-split each document ~7x. This expression
  * computes the whole stat vector in one tokenization, value-identical to
  * the declarative formulations (cross-checked row-for-row in tests):
  *
  *   struct(n_tokens int, est_bpe long, punct double, mwl double,
  *          stop_ratio double, quality double, lang_pred string)
  */
object TextStats {

  private val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextOps.stopwords.foreach(s.add)
    s
  }

  /** Language markers in sorted-lang order; ties resolve to the LAST lang
    * (mirrors array_max over (score, lang) structs in TextOps.langId). */
  private val langs: Array[(String, java.util.HashSet[String])] =
    TextOps.langMarkers.toArray.sortBy(_._1).map { case (l, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (l, s)
    }

  private def isAsciiPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  /** Spark's Round(double) semantics: BigDecimal.valueOf (shortest-repr
    * string) then HALF_UP. */
  private def round4(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP).doubleValue()

  def compute(text: UTF8String): InternalRow = {
    val raw = text.toString
    val rawLen = raw.length
    val lowered = text.trim().toLowerCase().toString
    val tokens = lowered.split("\\s+") // [""] for empty, like SQL split
    val nTokens = if (text.trim().numChars() == 0) 0 else tokens.length
    val estBpe = math.ceil(rawLen / 4.0).toLong
    var punctCount = 0
    var i = 0
    while (i < rawLen) { if (isAsciiPunct(raw.charAt(i))) punctCount += 1; i += 1 }
    val punct = if (rawLen == 0) 0.0 else punctCount.toDouble / rawLen.toDouble
    var charSum = 0L
    var stopHits = 0
    val langHits = new Array[Int](langs.length)
    i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      charSum += t.length
      if (stopwords.contains(t)) stopHits += 1
      var j = 0
      while (j < langs.length) {
        if (langs(j)._2.contains(t)) langHits(j) += 1
        j += 1
      }
      i += 1
    }
    val mwl = charSum.toDouble / tokens.length.toDouble // size(split) never 0
    val stopRatio = stopHits.toDouble / tokens.length.toDouble
    // qualityScore (TextOps): 0.5*lengthOk + 0.25*stopOk + 0.25*punctOk
    val lengthOk = if (nTokens >= 10 && nTokens <= 10000) 1.0
      else if (nTokens >= 3) 0.5 else 0.0
    val stopOk = if (stopRatio >= 0.05) 1.0 else 0.3
    val punctOk = if (punct <= 0.2) 1.0 else 0.4
    val quality = round4(0.5 * lengthOk + 0.25 * stopOk + 0.25 * punctOk)
    // langId argmax: max score, tie -> lexicographically larger lang
    var bestScore = -1.0
    var bestLang: String = null
    var j = 0
    while (j < langs.length) {
      val score = langHits(j).toDouble / tokens.length.toDouble
      if (score >= bestScore) { bestScore = score; bestLang = langs(j)._1 }
      j += 1
    }
    val pred = if (bestScore > 0) bestLang else "unknown"
    InternalRow(nTokens, estBpe, punct, mwl, stopRatio, quality,
      UTF8String.fromString(pred))
  }

  def textStats(text: Column): Column =
    GraftShim.column(TextStatsExpr(GraftShim.expression(text)))
}

case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("est_bpe", LongType, nullable = false),
    StructField("punct", DoubleType, nullable = false),
    StructField("mwl", DoubleType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("lang_pred", StringType, nullable = false)))

  override def prettyName: String = "graft_text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}
