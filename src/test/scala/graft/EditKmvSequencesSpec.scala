package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EditDistance, Sequences, Sketches}

/** Edit-distance dedup (q198), KMV sketches (q199) and transition
  * census (q200), off-fixture. */
class EditKmvSequencesSpec extends AnyFunSuite with SparkFixture {

  test("blockedPairs: exact distances within threshold, -1 rows filtered") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumped"),   // dist 2 vs id 1 (s->ed)
      (3L, "the quick brown cat jumps"),    // dist 3 vs id 1, within band
      (4L, "the quick brXwn fox jumps"),    // dist 1 vs id 1
      (5L, "a totally different sentence")
    ).toDF("id", "t")
    val got = EditDistance.blockedPairs(docs, "id", "t", prefixLen = 10, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 2L && got((1L, 4L)) == 1L && got((1L, 3L)) == 3L)
    assert(!got.contains((1L, 5L)) && got.contains((2L, 4L)))
  }

  test("blockedPairs: an edit inside the blocking prefix escapes (documented trade-off)") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij rest of text"), (2L, "Xbcdefghij rest of text"))
      .toDF("id", "t")
    val got = EditDistance.blockedPairs(docs, "id", "t", prefixLen = 10, maxDist = 3)
    assert(got.count() == 0)
  }

  test("kmv: unsaturated sketch estimates exactly; ranks ascend by hash") {
    import spark.implicits._
    val df = (1 to 40).map(i => ("g", s"tok$i")).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, "g", "v", k = 64)
    val rows = sk.orderBy("rank").collect()
    assert(rows.length == 40) // 40 distinct < k: whole set retained
    val hs = rows.map(_.getLong(2))
    assert(hs.sameElements(hs.sorted))
    val est = Sketches.kmvEstimate(sk, "g", k = 64).collect().head.getDouble(1)
    assert(est == 40.0) // saturation rule: exact below k
  }

  test("kmv: saturated estimate lands within 3x of truth on 5k distinct keys") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g", s"key$i")).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, "g", "v", k = 64)
    assert(sk.count() == 64)
    val est = Sketches.kmvEstimate(sk, "g", k = 64).collect().head.getDouble(1)
    assert(est > 5000 / 3.0 && est < 5000 * 3.0, s"est=$est")
  }

  test("transitionCensus: known chain, probs sum to 1 per prev state") {
    import spark.implicits._
    // user 1: a b a b a ; user 2: a b b
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (1L, 5L, "a"), (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "b"))
      .toDF("u", "seq", "st")
    val got = Sequences.transitionCensus(ev, "u", Seq(col("seq")), "st")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", "b")) == ((3L, 1.0)))       // a always goes to b
    assert(got(("b", "a")) == ((2L, 2.0 / 3.0))) // b->a 2 of 3
    assert(got(("b", "b")) == ((1L, 1.0 / 3.0)))
    assert(!got.keySet.exists(_._1 == null))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
