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

  test("tdigest: triangle taper on uniform data, exact means, weights " +
      "sum to n, q_mid monotone, oversized run stays one centroid") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1 to 100).map(i => ("a", i.toLong)) ++
      Seq.fill(50)(("b", 7L)) ++ Seq(("c", -3L), ("c", 5L))
    val out = Quantiles.tdigest(rows.toDF("k", "v"), "k", "v", delta = 8)
      .orderBy(col("k"), col("ci")).collect()
    val a = out.filter(_.getString(0) == "a")
    // caps = ceil(100 * min(i+1, 8-i) / 20): 5,10,15,20,20,15,10,5 and
    // uniform distinct values fill each exactly
    assert(a.map(_.getLong(3)).toSeq == Seq(5L, 10L, 15L, 20L, 20L, 15L, 10L, 5L))
    assert(a.map(_.getLong(3)).sum == 100L)
    // exact mean of 1..5 = 3.0; of 6..15 = 10.5; ends tapered
    assert(a(0).getDouble(4) == 3.0 && a(1).getDouble(4) == 10.5)
    assert(a.map(_.getDouble(5)).toSeq == a.map(_.getDouble(5)).toSeq.sorted)
    // one giant equal-value run: a single oversized centroid at q_mid 0.5
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && b(0).getLong(3) == 50L &&
      b(0).getDouble(4) == 7.0 && b(0).getDouble(5) == 0.5)
    // two values, tiny n: caps of 1 split them; negatives sort first
    val c = out.filter(_.getString(0) == "c")
    assert(c.length == 2 && c(0).getDouble(4) == -3.0 &&
      c(1).getDouble(4) == 5.0)
    // FromCensus over a pre-aggregated census equals the row path
    val census = Quantiles.tdigestCensus(rows.toDF("k", "v"), "k", "v")
    val viaCensus = Quantiles.tdigestFromCensus(census, 8)
      .orderBy(col("k"), col("ci")).collect().map(_.toString).toSeq
    assert(viaCensus == out.map(_.toString).toSeq)
  }
}
