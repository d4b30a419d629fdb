package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Eval

class EvalSpec extends AnyFunSuite with SparkFixture {

  private def aucOf(rows: Seq[(Int, Double)]): Double = {
    import spark.implicits._
    val df = rows.map { case (y, s) => ("g", y, s) }.toDF("g", "y", "s")
    Eval.auc(df, "g", "y", "s").collect().head.getAs[Double]("auc")
  }

  test("AUC: separators, anti-separators, ties, hand-checked mixture") {
    // perfect separation
    assert(aucOf(Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))) == 1.0)
    // perfectly wrong
    assert(aucOf(Seq((0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1))) == 0.0)
    // constant score: all ties -> 0.5 exactly
    assert(aucOf(Seq((1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5))) == 0.5)
    // hand case: pos {0.8, 0.5}, neg {0.5, 0.2}
    // pairs: (.8>.5)=1 (.8>.2)=1 (.5=.5)=0.5 (.5>.2)=1 -> U=3.5, AUC=0.875
    assert(aucOf(Seq((1, 0.8), (1, 0.5), (0, 0.5), (0, 0.2))) == 0.875)
  }

  test("AUC: degenerate single-class group is null; partitioning-invariant") {
    import spark.implicits._
    val onlyPos = Seq(("g", 1, 0.3), ("g", 1, 0.7)).toDF("g", "y", "s")
    assert(Eval.auc(onlyPos, "g", "y", "s").collect().head.isNullAt(5))

    val rnd = new scala.util.Random(11)
    val big = (1 to 5000).map(i => ("g", rnd.nextInt(2),
      math.rint(rnd.nextDouble() * 100) / 100))
    val df = big.toDF("g", "y", "s")
    val a = Eval.auc(df.repartition(1), "g", "y", "s").collect().head
    val b = Eval.auc(df.repartition(32, org.apache.spark.sql.functions.col("s")),
      "g", "y", "s").collect().head
    // integer U terms make the whole statistic bit-stable
    assert(a.getAs[Double]("auc") == b.getAs[Double]("auc"))
    assert(a.getAs[Long]("u_strict") == b.getAs[Long]("u_strict"))
  }

  test("chiSquareTokens: perfect marker maxes at N; uniform token drops out") {
    import spark.implicits._
    val docs = Seq(
      (true, "zebra common filler"),
      (true, "zebra common other"),
      (false, "common filler stuff"),
      (false, "common other stuff")).toDF("cls", "t")
    val top = Eval.chiSquareTokens(docs, "t", "cls", k = 10).collect()
    val byTok = top.map(r => r.getAs[String]("token") -> r).toMap
    // perfect association: chi2 = N exactly (integer arithmetic
    // end-to-end); 'stuff' scores 4.0 too and wins the alphabetical
    // tie-break, so zebra sits at rank 2
    assert(byTok("zebra").getAs[Long]("rank") == 2L)
    assert(byTok("zebra").getAs[Double]("chi2") == 4.0)
    // 'common' appears in every doc -> a margin is zero -> dropped
    assert(!byTok.contains("common"))
    // hand-check an asymmetric cell: 'stuff' a=0 b=2 c=2 d=0 -> chi2 = 4
    assert(byTok("stuff").getAs[Double]("chi2") == 4.0)
  }
}
