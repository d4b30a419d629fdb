package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Causal

/** Identification-strategy semantics: matching picks the pinned
  * nearest control score, RDD recovers exact linear jumps, and IV
  * recovers the structural slope OLS gets wrong under confounding. */
class CausalSpec extends AnyFunSuite with SparkFixture {

  test("nearestScoreMatch: hand fixture — self-score match, lower-tie " +
    "pin, caliper drop, mean-control imputation") {
    import spark.implicits._
    // treated (t=1) at scores 10, 20, 100; controls at 10, 12, 18, 95
    val rows = Seq(
      ("s", 1, 10L, 50L),  // control also AT 10 -> distance-0 match
      ("s", 0, 10L, 40L),
      ("s", 0, 10L, 44L),  // two controls at 10: imputed ybar = 42
      ("s", 1, 20L, 60L),  // controls at 18 (d=2) and 22 (d=2): tie -> 18
      ("s", 0, 18L, 30L),
      ("s", 0, 22L, 99L),
      ("s", 1, 100L, 70L), // nearest control 95 (d=5), caliper 4 -> drop
      ("s", 0, 95L, 10L))
    val df = rows.toDF("sc", "t", "score", "y")
    val r = Causal.nearestScoreMatch(df, "sc", col("t") === 1,
      "score", "y", caliper = 4L).head()
    assert(r.getAs[Long]("n_treated") == 3 &&
      r.getAs[Long]("n_matched") == 2 && r.getAs[Long]("n_unmatched") == 1)
    // matched treated ys: 50, 60 -> mean_t = 55
    assert(r.getAs[Double]("mean_t") == 55.0)
    // imputed controls: 42 (at 10), 30 (at 18) -> mean_c = 36
    assert(r.getAs[Double]("mean_c_matched") == 36.0)
    assert(r.getAs[Double]("att") == 19.0)
  }

  test("nearestScoreMatch: no controls at all -> everything unmatched, " +
    "null att") {
    import spark.implicits._
    val df = Seq(("s", 1, 5L, 1L), ("s", 1, 6L, 2L)).toDF("sc", "t", "score", "y")
    val r = Causal.nearestScoreMatch(df, "sc", col("t") === 1,
      "score", "y", caliper = 100L).head()
    assert(r.getAs[Long]("n_matched") == 0 &&
      r.isNullAt(r.fieldIndex("att")))
  }

  test("regressionDiscontinuity: exact linear sides recover intercepts, " +
    "slopes, and the jump exactly") {
    import spark.implicits._
    // left: y = 2x + 5 for x in [30, 49]; right: y = 2x + 50 for [50, 70]
    val rows = (30L to 49L).map(x => ("s", x, 2 * x + 5)) ++
      (50L to 70L).map(x => ("s", x, 2 * x + 50))
    val r = Causal.regressionDiscontinuity(rows.toDF("sc", "x", "y"),
      "sc", "x", "y", cutoff = 50L, bandwidth = 20L).head()
    assert(r.getAs[Long]("n_l") == 20 && r.getAs[Long]("n_r") == 21)
    // at the cutoff: left intercept = 2*50 + 5 = 105, right = 150
    assert(r.getAs[Double]("alpha_l") == 105.0)
    assert(r.getAs[Double]("alpha_r") == 150.0)
    assert(r.getAs[Double]("slope_l") == 2.0 &&
      r.getAs[Double]("slope_r") == 2.0)
    assert(r.getAs[Double]("effect") == 45.0)
    // a missing side nulls the fit but keeps counts loud
    val only = (50L to 70L).map(x => ("s", x, x))
    val ro = Causal.regressionDiscontinuity(only.toDF("sc", "x", "y"),
      "sc", "x", "y", cutoff = 50L, bandwidth = 20L).head()
    assert(ro.getAs[Long]("n_l") == 0 &&
      ro.isNullAt(ro.fieldIndex("effect")))
  }

  test("ivWald: recovers the structural slope under confounding where " +
    "OLS is biased; constant instrument nulls out") {
    import spark.implicits._
    // structural model: y = 5x + 10u, x = 2z + u, with confounder u
    // independent of z. beta_iv = cov(zy)/cov(zx) = 5 exactly; OLS is
    // biased upward because u moves x and y in the same direction.
    val rows = for (z <- 0L to 1L; u <- -2L to 2L) yield {
      val x = 2 * z + u; ("s", z, x, 5 * x + 10 * u)
    }
    val r = Causal.ivWald(rows.toDF("sc", "z", "x", "y"),
      "sc", "z", "x", "y").head()
    assert(r.getAs[Double]("beta_iv") == 5.0)
    assert(r.getAs[Double]("first_stage") == 2.0)
    assert(r.getAs[Double]("reduced_form") == 10.0)
    assert(r.getAs[Double]("beta_ols") > 5.0) // confounding bias visible
    val const = Seq(("s", 1L, 1L, 1L), ("s", 1L, 2L, 3L))
    val rc = Causal.ivWald(const.toDF("sc", "z", "x", "y"),
      "sc", "z", "x", "y").head()
    assert(rc.isNullAt(rc.fieldIndex("beta_iv")) &&
      rc.isNullAt(rc.fieldIndex("first_stage")))
  }
}
