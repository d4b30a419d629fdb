package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Streaks

class StreaksSpec extends AnyFunSuite with SparkFixture {

  // returns: - - + - - - + +  => max losing streak 3
  private val series = Seq(-1.0, -2.0, 3.0, -1.0, -1.0, -4.0, 5.0, 6.0)

  test("maxStreak (gaps-and-islands) finds longest losing run (W12)") {
    import spark.implicits._
    val df = series.zipWithIndex.map { case (v, i) => ("u1", i, v) }.toDF("u", "i", "ret")
    val out = Streaks.maxStreak(df, col("u"), col("i"), col("ret") < 0).collect()
    assert(out.length == 1 && out(0).getAs[Long]("max_streak") == 3L)
  }

  test("maxStreak omits groups with no losing rows (W12 edge)") {
    import spark.implicits._
    val df = Seq(("w", 1, 5.0), ("w", 2, 6.0)).toDF("u", "i", "ret")
    assert(Streaks.maxStreak(df, col("u"), col("i"), col("ret") < 0).count() == 0)
  }

  test("maxStreakOverList (higher-order fold) agrees with window impl") {
    import spark.implicits._
    val df = Seq(series.map(_ < 0)).toDF("ordered")
    val v = df.select(Streaks.maxStreakOverList(col("ordered"))).head().getInt(0)
    assert(v == 3)
  }

  test("MaxStreakAgg typed aggregator agrees on ordered input") {
    val agg = new Streaks.MaxStreakAgg
    val r = series.map(_ < 0).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(r) == 3)
  }

  test("maxDrawdown computes (peak-v)/peak max (W13)") {
    import spark.implicits._
    // path 100 -> 120 -> 90 -> 110: worst dd = (120-90)/120 = 0.25
    val df = Seq(("u", 1, 100.0), ("u", 2, 120.0), ("u", 3, 90.0), ("u", 4, 110.0))
      .toDF("u", "i", "cap")
    val out = Streaks.maxDrawdown(df, col("u"), col("i"), col("cap")).collect()
    assert(out(0).getAs[Double]("max_drawdown") == 0.25)
  }
}
