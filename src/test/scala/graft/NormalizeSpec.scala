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

  test("quantileNormalize: shifted groups land on the same pooled " +
      "ladder; ties map to the pooled rank; partition-invariant") {
    import spark.implicits._
    def run(rows: Seq[(String, String, Long)]) =
      Normalize.quantileNormalize(rows.toDF("sc", "g", "v"),
        "sc", "g", "v").collect()
        .map(r => (r.getAs[String]("g"), r.getAs[Long]("v")) ->
          r.getAs[Long]("v_norm")).toMap
    // g1 = [1,2,3,4], g2 = [11,12,13,14]: pooled ladder at ranks
    // 2,4,6,8 is [2,4,12,14] — BOTH groups map onto it identically
    val rows = Seq(1L, 2L, 3L, 4L).map(("s", "g1", _)) ++
      Seq(11L, 12L, 13L, 14L).map(("s", "g2", _))
    val f = run(rows)
    assert(Seq(1L, 2L, 3L, 4L).map(v => f(("g1", v))) ==
      Seq(2L, 4L, 12L, 14L))
    assert(Seq(11L, 12L, 13L, 14L).map(v => f(("g2", v))) ==
      Seq(2L, 4L, 12L, 14L))
    // ties: g1 = [5,5] (cum 2 of 2 -> pooled rank 3), g2 = [7]
    val t = run(Seq(("s", "g1", 5L), ("s", "g1", 5L), ("s", "g2", 7L)))
    assert(t(("g1", 5L)) == 7L && t(("g2", 7L)) == 7L)
    // determinism under different partitioning
    import org.apache.spark.sql.functions.col
    val big = Seq.tabulate(200)(i => ("s", "g" + (i % 3), (i * 17 % 41).toLong))
    val a = Normalize.quantileNormalize(big.toDF("sc", "g", "v"),
      "sc", "g", "v").orderBy(col("g"), col("v")).collect().toSeq
    val b = Normalize.quantileNormalize(
      big.toDF("sc", "g", "v").repartition(13), "sc", "g", "v")
      .orderBy(col("g"), col("v")).collect().toSeq
    assert(a == b)
  }
}
