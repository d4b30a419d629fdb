package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Anonymity, Benford, Ranking}

/** Benford audit (q202), k-anonymity (q203), RRF fusion (q204),
  * off-fixture. */
class AuditFusionSpec extends AnyFunSuite with SparkFixture {

  test("benford: a perfect Benford sample has near-zero chi2 terms") {
    import spark.implicits._
    // counts proportional to the Benford probabilities themselves
    val rows = Benford.probs.flatMap { case (d, p) =>
      Seq.fill((p * 10000).round.toInt)(d.toLong * 1000L)
    }
    val out = Benford.audit(rows.toDF("v"), col("v")).collect()
    assert(out.length == 9)
    out.foreach { r =>
      assert(r.getAs[Double]("chi2_term") < 0.5,
        s"digit ${r.getLong(0)}: ${r.getAs[Double]("chi2_term")}")
    }
  }

  test("benford: expected counts use the total of VALID digits only") {
    import spark.implicits._
    val df = Seq(1L, 1L, 2L, 9L, 0L, -5L).toDF("v") // 0 and -5 are invalid digits
    val out = Benford.audit(df, col("v")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Double]("expected"))).toMap
    assert(out.keySet == Set(1L, 2L, 9L))
    assert(out(1L)._1 == 2L)
    // total = 4 valid rows, not 6
    assert(math.abs(out(1L)._2 - 4 * 0.3010299956639812) < 1e-12)
  }

  test("k-anonymity: class census and summary agree") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 1), ("b", 2))
      .toDF("seg", "band")
    val risk = Anonymity.atRiskClasses(df, Seq("seg", "band"), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(risk == Map(("b", 1) -> 1L, ("b", 2) -> 1L)) // (a,1) has 3 >= k
    val s = Anonymity.summary(df, Seq("seg", "band"), k = 3).collect().head
    assert(s.getLong(0) == 3L && s.getLong(1) == 2L &&
      s.getLong(2) == 2L && s.getLong(3) == 1L)
  }

  test("rrfFuse: agreement ranks first; single-ranker items still score") {
    import spark.implicits._
    val r1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)).toDF("q", "item", "rank")
    val r2 = Seq((1L, 10L, 2L), (1L, 13L, 1L)).toDF("q", "item", "rank")
    val out = Ranking.rrfFuse(r1, r2, "q", "item", "rank", c = 60, topK = 10)
      .collect().map(r => r.getLong(1) -> (r.getAs[Double]("rrf"), r.getLong(3)))
      .toMap
    // item 10: both rankers -> highest fused score, rank 1
    assert(out(10L)._2 == 1L)
    assert(math.abs(out(10L)._1 - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    // item 13 appears only in r2 but still present with one term
    assert(math.abs(out(13L)._1 - 1.0 / 61) < 1e-15)
    assert(out.size == 4)
  }

  test("tCloseness: table-identical classes t=0, point-mass class hits " +
      "the disjoint bound, exact threshold flag") {
    import spark.implicits._
    def run(rows: Seq[(String, Long)], tMaxMicros: Long) =
      Anonymity.tCloseness(rows.toDF("q", "v"), Seq("q"), "v", tMaxMicros)
        .collect().map(r => r.getAs[String]("q") ->
          ((r.getAs[Double]("t"), r.getAs[Boolean]("violates")))).toMap
    // both classes mirror the table's 50/50 split -> t = 0, no flags
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
    assert(run(same, 200000L) == Map("a" -> ((0.0, false)),
      "b" -> ((0.0, false))))
    // class a holds only value 1, b only value 2 (equal sizes):
    // t = 1/2 for both; flagged at tmax 0.2, not at 0.5
    val disj = Seq.fill(4)(("a", 1L)) ++ Seq.fill(4)(("b", 2L))
    assert(run(disj, 200000L) == Map("a" -> ((0.5, true)),
      "b" -> ((0.5, true))))
    // boundary is EXACT: t = 1/2 does NOT violate tmax = 1/2 (strict >)
    assert(run(disj, 500000L) == Map("a" -> ((0.5, false)),
      "b" -> ((0.5, false))))
    // concat-collision regression (r8 ADVICE): qid tuples ("ab","c") and
    // ("a","bc") are DISTINCT classes; a bare string concat fuses them.
    // Class (ab,c) holds only value 1, (a,bc) only value 2 — each is a
    // point mass vs the table's 50/50, so both must report t = 1/2
    // (a fused class would mirror the table exactly and report t = 0).
    import org.apache.spark.sql.functions.col
    val coll = (Seq.fill(4)(("ab", "c", 1L)) ++ Seq.fill(4)(("a", "bc", 2L)))
      .toDF("q1", "q2", "v")
    val c2 = Anonymity.tCloseness(coll, Seq("q1", "q2"), "v", 200000L)
      .collect().map(r => (r.getAs[String]("q1"), r.getAs[String]("q2")) ->
        r.getAs[Double]("t")).toMap
    assert(c2 == Map(("ab", "c") -> 0.5, ("a", "bc") -> 0.5))
    // null-vs-skip regression: (null,"x") and ("x",null) are distinct
    // classes too (concat_ws silently drops nulls)
    val nul = (Seq.fill(2)((null: String, "x", 1L)) ++
      Seq.fill(2)(("x", null: String, 2L))).toDF("q1", "q2", "v")
    val n2 = Anonymity.tCloseness(nul, Seq("q1", "q2"), "v", 200000L)
      .collect().map(r => (Option(r.getAs[String]("q1")),
        Option(r.getAs[String]("q2"))) -> r.getAs[Double]("t")).toMap
    assert(n2 == Map((None, Some("x")) -> 0.5, (Some("x"), None) -> 0.5))
  }

  test("laplaceCounts: md5-deterministic, epsilon scales the noise, " +
      "count absent from the release") {
    import spark.implicits._
    val rows = (Seq.fill(100)("x") ++ Seq.fill(50)("y")).toDF("g")
    def run(epsMilli: Long) =
      Anonymity.laplaceCounts(rows, "g", epsMilli, "seedA")
        .collect().map(r => r.getAs[String]("g") ->
          ((r.getAs[Double]("noisy_count"), r.getAs[Double]("scale")))).toMap
    val a = run(1000L)
    // deterministic: identical on re-run
    assert(a == run(1000L))
    assert(a("x")._2 == 1.0 && a.keySet == Set("x", "y"))
    // noise is bounded plausibly for eps=1 (|noise| < 40 with prob ~1;
    // deterministic draw so this is a fixed fact, not a flake)
    assert(math.abs(a("x")._1 - 100.0) < 40.0)
    // smaller epsilon -> strictly larger deviation for the same draw
    val tight = run(1000L)("y")._1 - 50.0
    val loose = run(100L)("y")._1 - 50.0
    assert(math.abs(loose) > math.abs(tight))
    assert(run(100L)("y")._2 == 10.0)
    // different seed -> different draw (u differs)
    val b = Anonymity.laplaceCounts(rows, "g", 1000L, "seedB")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(b("x") != a("x")._1)
  }
}
