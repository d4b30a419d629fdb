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

  test("cramersV: bijection scores 1, independence 0, single-column null") {
    import spark.implicits._
    def v(rows: Seq[(String, String)]): org.apache.spark.sql.Row =
      Divergence.cramersV(rows.toDF("a", "b"), "a", "b").collect().head
    // a determines b bijectively -> V = 1 exactly
    val bij = Seq.fill(10)(("x", "1")) ++ Seq.fill(10)(("y", "2"))
    val rb = v(bij)
    assert(rb.getAs[Double]("chi2") == 20.0 && rb.getAs[Double]("v") == 1.0)
    // uniform 2x2 grid -> chi2 = 0, V = 0 (clamped, not NaN)
    val ind = for { a <- Seq("x", "y"); b <- Seq("1", "2"); _ <- 1 to 5 }
      yield (a, b)
    val ri = v(ind)
    assert(math.abs(ri.getAs[Double]("chi2")) < 1e-9)
    assert(ri.getAs[Double]("v") == 0.0 || ri.getAs[Double]("v") < 1e-9)
    // one-category side -> null V, loudly
    assert(v(Seq(("x", "1"), ("x", "2"), ("x", "2"))).isNullAt(4))
  }

  test("cramersV: partitioning-invariant (ordered cell fold)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 5000).map(_ =>
      ("p" + rnd.nextInt(5), "s" + rnd.nextInt(3)))
    val df = rows.toDF("a", "b")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val r = Divergence.cramersV(d, "a", "b").collect().head
      (r.getAs[Double]("chi2"), r.getAs[Double]("v"))
    }
    assert(run(df.repartition(1)) ==
      run(df.repartition(32, org.apache.spark.sql.functions.col("a"))))
  }
}
