package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Selection

/** Greedy max-coverage selection: hand-traced picks, beats-uniform
  * witness, zero-gain fill, determinism. */
class SelectionSpec extends AnyFunSuite with SparkFixture {

  test("greedy picks by marginal gain with id tie-break; totals accumulate") {
    import spark.implicits._
    // doc 1 covers {a,b,c}; doc 2 {a,b}; doc 3 {d,e}; doc 4 {c}
    val df = Seq((1L, "a b c"), (2L, "a b"), (3L, "d e"), (4L, "c"))
      .toDF("doc_id", "text")
    val got = Selection.greedyCoverage(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // pick 1: doc 1 (gain 3); pick 2: doc 3 (gain 2, beats doc 2's 0
    // new); pick 3: docs 2 and 4 both gain 0 -> smallest id 2
    assert(got.toSeq === Seq((1, 1L, 3L, 3L), (2, 3L, 2L, 5L), (3, 2L, 0L, 5L)))
  }

  test("greedy strictly beats every same-size uniform draw on a planted case") {
    import spark.implicits._
    // 4 redundant popular docs sharing one big set; 2 rare docs with
    // disjoint vocab. k=2 greedy covers big + one rare = 6 tokens;
    // most 2-subsets cover less
    val df = Seq(
      (1L, "p q r s t"), (2L, "p q r s t"), (3L, "p q r s t"), (4L, "p q r s t"),
      (5L, "u"), (6L, "v"))
      .toDF("doc_id", "text")
    val got = Selection.greedyCoverage(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.last._2 == 6L, s"greedy covered ${got.last._2}")
    // uniform baseline: expected coverage over all C(6,2)=15 pairs is
    // well under 6 (e.g. two popular docs -> 5; two rares -> 2)
    val docSets = Map(1L -> Set("p","q","r","s","t"), 2L -> Set("p","q","r","s","t"),
      3L -> Set("p","q","r","s","t"), 4L -> Set("p","q","r","s","t"),
      5L -> Set("u"), 6L -> Set("v"))
    val pairs = docSets.keys.toSeq.combinations(2).toSeq
    val avg = pairs.map(p => p.flatMap(docSets).toSet.size).sum.toDouble / pairs.size
    assert(avg < 6.0)
  }

  test("deterministic across partitionings; k capped by doc count") {
    import spark.implicits._
    val df = Seq((10L, "x y"), (11L, "y z"), (12L, "")).toDF("doc_id", "text")
    val a = Selection.greedyCoverage(df, "doc_id", "text", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Selection.greedyCoverage(df.repartition(5), "doc_id", "text", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    // 3 docs (one tokenless) -> exactly 3 rows, tokenless fills at 0
    assert(a.length == 3)
    assert(a.map(_._2).toSet == Set(10L, 11L, 12L))
    assert(a.last._3 == 0L)
  }

  test("weightedReservoir: deterministic across runs and partitionings, " +
      "k per stratum, weight<=0 excluded, heavier rows sampled more") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1L to 200L).map { i =>
      (if (i <= 100) "a" else "b", i,
        if (i % 50 == 0) 0L else if (i % 2 == 0) 100L else 1L)
    }.toDF("s", "id", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      Selection.weightedReservoir(df, "s", "id", "w", k = 10, seed = "sd")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
        .sortBy(x => (x._1, x._3)).toSeq
    val got = run(rows)
    assert(got == run(rows.repartition(32, col("id"))),
      "partitioning must not change the sample")
    assert(got.count(_._1 == "a") == 10 && got.count(_._2 > 100) == 10)
    // zero-weight ids never sampled
    assert(!got.exists(x => x._2 % 50 == 0))
    // weight-100 rows are 100x likelier: with 98 heavy vs 98 light per
    // stratum, a 10-draw A-ES sample being mostly heavy is overwhelming
    assert(got.count(x => x._2 % 2 == 0) >= 16,
      s"heavy rows should dominate: $got")
    // ranks are 1..10 per stratum
    assert(got.filter(_._1 == "a").map(_._3).sorted == (1L to 10L))
  }

  test("weightedReservoir: seed is a value, not SQL text — quotes and " +
      "backslashes in the seed neither break parsing nor leak syntax") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => ("a", i, 1L)).toDF("s", "id", "w")
    // would throw a ParseException under the old string-interpolated expr
    val q = Selection.weightedReservoir(rows, "s", "id", "w", k = 5,
      seed = "it's a 'seed' \\ with syntax")
      .collect()
    assert(q.length == 5 && q.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to 5L))
    // distinct seeds give distinct draws (the seed value is actually used)
    def ids(seed: String) = Selection
      .weightedReservoir(rows, "s", "id", "w", k = 5, seed = seed)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(ids("s1") != ids("s2"))
  }
}
