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
}
