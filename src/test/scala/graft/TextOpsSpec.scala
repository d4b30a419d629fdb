package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextOps

class TextOpsSpec extends AnyFunSuite with SparkFixture {

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("tokenCount counts whitespace tokens; empty -> 0") {
    assert(one(TextOps.tokenCount(lit("a  b\tc"))) == 3)
    assert(one(TextOps.tokenCount(lit("   "))) == 0)
    assert(one(TextOps.tokenCount(lit(""))) == 0)
  }

  test("tokenEstimate = ceil(chars/4)") {
    assert(one(TextOps.tokenEstimate(lit("abcdefgh"))) == 2L)
    assert(one(TextOps.tokenEstimate(lit("abcdefghi"))) == 3L)
  }

  test("punctRatio = punct chars / total") {
    assert(one(TextOps.punctRatio(lit("a.b,c!"))) == 0.5)
    assert(one(TextOps.punctRatio(lit("abc"))) == 0.0)
  }

  test("stopwordRatio over the core list") {
    assert(one(TextOps.stopwordRatio(lit("the cat and dog"))) == 0.5)
  }

  test("meanWordLen averages token lengths") {
    assert(one(TextOps.meanWordLen(lit("ab abcd"))) == 3.0)
  }

  test("qualityScore rewards length band, stopwords, low punct") {
    // 12 tokens incl. stopwords, no punct -> full marks
    val good = "the quick brown fox jumps over the lazy dog in a field"
    assert(one(TextOps.qualityScore(lit(good))) == 1.0)
    // 1 token, no stopwords, no punct -> 0.5*0 + 0.25*0.3 + 0.25*1 = 0.325
    assert(one(TextOps.qualityScore(lit("word"))) == 0.325)
  }

  test("langId picks marker-set argmax, unknown when all zero") {
    assert(one(TextOps.langId(lit("the best of the rest is yet to come"))) == "en")
    assert(one(TextOps.langId(lit("der hund und die katze ist da"))) == "de")
    assert(one(TextOps.langId(lit("xyzzy plugh"))) == "unknown")
  }

  test("fingerprint is whitespace-reflow stable") {
    val a = one(TextOps.fingerprint(lit("Hello   world\n foo")))
    val b = one(TextOps.fingerprint(lit("hello world foo")))
    assert(a == b)
  }

  test("cleanText strips tags, unescapes entities, collapses whitespace") {
    val got = one(TextOps.cleanText(lit(
      "<p class=\"x\">Tom &amp; Jerry</p>\n\n  say &quot;hi&quot; &amp;lt;ok&amp;gt;")))
    assert(got == "Tom & Jerry say \"hi\" &lt;ok&gt;") // single-pass unescape
  }

  test("cleanText leaves plain text alone and handles empty") {
    assert(one(TextOps.cleanText(lit("plain words here"))) == "plain words here")
    assert(one(TextOps.cleanText(lit("   "))) == "")
  }
}
