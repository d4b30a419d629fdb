package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE merge learning: hand-traced merges, frequency weighting, greedy
  * non-overlap, deterministic tie-breaks, exhaustion. */
class BpeSpec extends AnyFunSuite with SparkFixture {

  test("merges follow the classic hand example with frequency weighting") {
    import spark.implicits._
    // census: "abab" x3, "ab" x2 -> round 1: (a,b) count 3*2+2*1 = 8
    // after merge: [ab,ab] x3, [ab] x2 -> round 2: (ab,ab) count 3
    val df = Seq("abab abab abab ab ab").toDF("text")
    val got = Bpe.learnMerges(df, "text", nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
  }

  test("greedy left-to-right non-overlap: 'aaa' yields one merge occurrence") {
    import spark.implicits._
    // "aaa": pairs (a,a) x2 -> count 2; after merging, [aa, a] (not [a, aa])
    val df = Seq("aaa").toDF("text")
    val r1 = Bpe.learnMerges(df, "text", nMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(r1(0) === ((1, "a", "a", 2L)))
    // round 2 on [aa, a]: pair (aa, a) count 1
    assert(r1(1) === ((2, "aa", "a", 1L)))
  }

  test("tie-break picks the lexicographically smallest pair") {
    import spark.implicits._
    // "ba" and "ab" each once: (b,a) and (a,b) both count 1 -> (a,b) wins
    val df = Seq("ba ab").toDF("text")
    val got = Bpe.learnMerges(df, "text", nMerges = 1).collect().head
    assert((got.getString(1), got.getString(2)) === (("a", "b")))
  }

  test("fertility: merges shrink tokens, counts hand-check") {
    import spark.implicits._
    // source s1: "abab" x2 -> chars 8; merges ((a,b),(ab,ab)) tokenize
    // "abab" to ONE token; s2: "cd" stays 2 tokens (no merge applies)
    val df = Seq(("s1", "abab abab"), ("s2", "cd")).toDF("src", "text")
    val got = Bpe.fertility(df, "src", "text",
        Seq(("a", "b"), ("ab", "ab")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got("s1") === ((1L, 2L, 8L, 2L, 1.0, 4.0)))
    assert(got("s2")._4 == 2L && got("s2")._5 == 2.0 && got("s2")._6 == 1.0)
  }

  test("exhaustion: once no pairs remain, later ranks emit no rows") {
    import spark.implicits._
    val df = Seq("ab ab").toDF("text")
    val got = Bpe.learnMerges(df, "text", nMerges = 5).collect()
    // round 1 merges (a,b); every word is then a single symbol — done
    assert(got.length == 1)
    assert(got.head.getInt(0) == 1)
  }
}
