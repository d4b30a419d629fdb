package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Normalize

/** Rank-transform normalization (q223's operator, off-fixture). */
class NormalizeSpec extends AnyFunSuite with SparkFixture {

  test("mid-rank handles ties: mean of spanned ranks, max maps below 1") {
    import spark.implicits._
    val df = Seq(("a", 10), ("a", 20), ("a", 20), ("a", 30))
      .toDF("g", "v")
    val got = Normalize.rankNormalize(df, Seq("g"), "v")
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // ranks: 10 -> 1, 20 -> mean(2,3)=2.5, 30 -> 4; quantile = rank/4
    assert(got(10) === 0.25 && got(20) === 0.625 && got(30) === 1.0)
  }

  test("groups normalize independently; null values pass through null") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("a", Some(2)), ("b", Some(100)),
      ("b", Some(200)), ("b", Some(300)), ("b", None)).toDF("g", "v")
    val rows = Normalize.rankNormalize(df, Seq("g"), "v").collect()
    val byKey = rows.map(r => (r.getString(0),
      if (r.isNullAt(1)) None else Some(r.getInt(1))) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byKey(("a", Some(1))) === Some(0.5)) // (2*0+1+1)/(2*2)
    assert(byKey(("a", Some(2))) === Some(1.0))
    assert(byKey(("b", Some(100))) === Some(1.0 / 3)) // rank 1 of 3
    assert(byKey(("b", Some(200))) === Some(2.0 / 3))
    assert(byKey(("b", Some(300))) === Some(1.0))
    assert(byKey(("b", None)) === None)
  }

  test("rankCensus quantiles agree with rankNormalize on every value") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => ("g", i % 7)).toDF("g", "v")
    val viaRows = Normalize.rankNormalize(df, Seq("g"), "v")
      .select("v", "norm_rank").distinct()
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val viaCensus = Normalize.rankCensus(df, Seq("g"), "v")
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(viaRows === viaCensus)
    // census is value-scale: 7 rows, counts sum to 100
    assert(Normalize.rankCensus(df, Seq("g"), "v").count() === 7L)
  }

  test("normalized ranks are monotone in the raw value within a group") {
    import spark.implicits._
    val df = Seq.tabulate(50)(i => ("g", (i * 37) % 23)).toDF("g", "v")
    val got = Normalize.rankNormalize(df, Seq("g"), "v")
      .select("v", "norm_rank").distinct()
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    got.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a < b)
      case _ => () }
  }
}
