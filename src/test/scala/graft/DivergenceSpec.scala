package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Divergence

/** KL drift-monitor semantics: non-negativity (Gibbs), near-zero for
  * corpus-like groups, and drift ranking. */
class DivergenceSpec extends AnyFunSuite with SparkFixture {

  test("KL is non-negative everywhere and spikes on the drifted group") {
    import spark.implicits._
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val rows =
      (1 to 30).map(i => (s"steady_a", common)) ++
      (1 to 30).map(i => (s"steady_b", common)) ++
      (1 to 30).map(i => (s"drifted", "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"))
    val out = Divergence.sourceDivergence(rows.toDF("src", "text"), "src", "text")
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Double]("kl"), r.getAs[Double]("kl_rev")))).toMap
    out.values.foreach { case (kl, klr) =>
      assert(kl >= 0 && klr >= 0, out.toString)
    }
    // the steady groups also diverge from the corpus (the corpus is
    // 2/3 common + 1/3 junk mass), so assert ranking, not near-zero
    assert(out("drifted")._1 > out("steady_a")._1 * 2, out.toString)
    assert(out("drifted")._1 > out("steady_b")._1 * 2)
    // two identically-distributed groups diverge (almost) identically
    assert(math.abs(out("steady_a")._1 - out("steady_b")._1) < 1e-9)
  }

  test("n_tok is the group token total") {
    import spark.implicits._
    val out = Divergence.sourceDivergence(
      Seq(("a", "one two three"), ("a", "four five"), ("b", "six")).toDF("src", "text"),
      "src", "text")
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_tok")).toMap
    assert(out == Map("a" -> 5L, "b" -> 1L))
  }
}
