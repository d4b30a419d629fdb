package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Encoding, Readability}

/** Flesch readability summary (q284) and WOE/IV encoding (q285),
  * off-fixture. */
class ReadabilityEncodingSpec extends AnyFunSuite with SparkFixture {

  test("fleschSummary: hand-counted words/sentences/syllables and score") {
    import spark.implicits._
    // "the cat sat. it sat!" -> 5 words, 2 sentences,
    // vowel groups: e,a,a,i,a -> 5 syllables
    val df = Seq(("a", "the cat sat. it sat!"), ("a", ""), ("b", "zzz"))
      .toDF("src", "text")
    val got = Readability.fleschSummary(df, "src", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
    // empty doc: 0 words but still the min-1 sentence
    assert(got("a")._1 == 2L)
    assert(got("a")._2 == 5L && got("a")._3 == 3L && got("a")._4 == 5L)
    val exp = 206.835 - 1.015 * (5.0 / 3.0) - 84.6 * (5.0 / 5.0)
    assert(math.abs(got("a")._5 - exp) < 1e-9)
    // no vowels -> 0 syllables; score still defined (1 word)
    assert(got("b")._4 == 0L && !got("b")._5.isNaN)
  }

  test("woeTable: hand-computed smoothed WOE and category-ordered IV") {
    import spark.implicits._
    // cat x: 3 pos / 1 neg; cat y: 1 pos / 3 neg -> POS=4, NEG=4, K=2
    val df = Seq(("x", 1), ("x", 1), ("x", 1), ("x", 0),
      ("y", 1), ("y", 0), ("y", 0), ("y", 0)).toDF("c", "lab")
    val rows = Encoding.woeTable(df, "c", "lab").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    def woe(p: Long, n: Long) =
      math.log(((p + 0.5) / (4 + 0.5 * 2)) / ((n + 0.5) / (4 + 0.5 * 2)))
    assert(rows("x")._1 == 3L && rows("x")._2 == 1L)
    assert(math.abs(rows("x")._3 - woe(3, 1)) < 1e-12)
    assert(math.abs(rows("y")._3 - woe(1, 3)) < 1e-12)
    // symmetric table: woe(y) = -woe(x)
    assert(math.abs(rows("x")._3 + rows("y")._3) < 1e-12)
    val iv = (3.0 / 4 - 1.0 / 4) * woe(3, 1) + (1.0 / 4 - 3.0 / 4) * woe(1, 3)
    assert(math.abs(rows("x")._4 - iv) < 1e-12)
    assert(rows("x")._4 == rows("y")._4, "iv repeats identically per row")
    assert(rows("x")._4 > 0, "separating feature has positive IV")
  }

  test("woeTable: smoothing keeps empty cells finite") {
    import spark.implicits._
    val df = Seq(("only_pos", 1), ("only_pos", 1), ("mixed", 1), ("mixed", 0))
      .toDF("c", "lab")
    val rows = Encoding.woeTable(df, "c", "lab").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(!rows("only_pos").isNaN && !rows("only_pos").isInfinite)
    assert(rows("only_pos") > 0)
  }
}
