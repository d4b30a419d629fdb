package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quantiles

/** Histogram-bisection exact order statistics: agreement with a plain
  * sort on awkward distributions, the duplicate-collapse fast path, the
  * rank rule, and the loud non-convergence guard. */
class QuantilesSpec extends AnyFunSuite with SparkFixture {

  private def kthBySort(xs: Seq[Double], k: Long): Double = xs.sorted.apply(k.toInt - 1)

  test("exactKth agrees with a sort across ranks on a skewed distribution") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // lognormal-ish: heavy right tail, clusters near zero
    val xs = Seq.fill(5000)(math.exp(rnd.nextGaussian() * 2))
    val df = xs.toDF("v").repartition(8)
    // tiny threshold forces several bisection passes
    Seq(1L, 7L, 2500L, 4999L, 5000L).foreach { k =>
      val got = Quantiles.exactKth(df, "v", k, bins = 32, exactThreshold = 64)
      assert(got == kthBySort(xs, k), s"k=$k")
    }
  }

  test("heavy duplicates collapse the bracket instead of looping") {
    import spark.implicits._
    // 90% of mass is one repeated value: bisection lands in a bin whose
    // min == max and must return without further passes
    val xs = Seq.fill(9000)(42.0) ++ Seq.fill(1000)(7.0)
    val df = xs.toDF("v").repartition(4)
    assert(Quantiles.exactKth(df, "v", 5000L, bins = 16, exactThreshold = 32) == 42.0)
    assert(Quantiles.exactKth(df, "v", 500L, bins = 16, exactThreshold = 32) == 7.0)
  }

  test("quantilesDisc implements the ceil(p*n) rank rule") {
    import spark.implicits._
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val out = Quantiles.quantilesDisc(df, "v", Seq(0.25, 0.5, 0.9, 0.99),
        bins = 8, exactThreshold = 4)
      .collect().map(r => (r.getAs[Double]("p"), r.getAs[Long]("k"),
        r.getAs[Double]("value"))).toSet
    // matches DuckDB quantile_disc on 1..10: 3, 5, 9, 10
    assert(out == Set((0.25, 3L, 3.0), (0.5, 5L, 5.0), (0.9, 9L, 9.0),
      (0.99, 10L, 10.0)))
  }

  test("rank beyond the population fails loudly") {
    import spark.implicits._
    val df = Seq(1.0, 2.0).toDF("v")
    assertThrows[IllegalArgumentException] {
      Quantiles.exactKth(df, "v", 3L)
    }
  }

  test("groupedQuantilesDisc matches a per-group sorted pick, ties included") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = for {
      g <- Seq("a", "b", "c"); _ <- 1 to 40
    } yield (g, rnd.nextInt(12).toLong) // heavy ties
    val df = rows.toDF("g", "v")
    val ps = Seq(0.1, 0.5, 0.9, 1.0)
    val got = Quantiles.groupedQuantilesDisc(df, Seq("g"), "v", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    for (g <- Seq("a", "b", "c"); p <- ps) {
      val sorted = rows.filter(_._1 == g).map(_._2).sorted
      val k = math.ceil(p * sorted.length).toLong.max(1L).min(sorted.length)
      assert(got((g, p)) === sorted((k - 1).toInt),
        s"group $g p=$p expected rank $k")
    }
  }

  test("groupedQuantilesDisc: null values are excluded, groups independent") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", Some(10L))).toDF("g", "v")
    val got = Quantiles.groupedQuantilesDisc(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 1L, "b" -> 10L)) // ceil(0.5*2)=1 -> 1st
  }
}
