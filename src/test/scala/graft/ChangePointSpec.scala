package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangePoint

/** CUSUM drift detection (q238's operator, off-fixture). */
class ChangePointSpec extends AnyFunSuite with SparkFixture {

  private def run(vals: Seq[(String, Long)], slack: Double, h: Double) = {
    import spark.implicits._
    val df = vals.map { case (d, v) => ("k", d, v) }.toDF("k", "day", "x")
    ChangePoint.cusumSummary(df, "k", "day", "x", slack, h).head()
  }

  test("a level shift accumulates to an alarm no single day would trip") {
    // mean = 130/7; the 30s sit ~11.4 above — below h=20 individually,
    // but the second shifted day crosses via accumulation
    val days = Seq("d1", "d2", "d3", "d4", "d5", "d6", "d7")
    val vals = days.zip(Seq(10L, 10L, 10L, 10L, 30L, 30L, 30L))
    val r = run(vals, slack = 0.0, h = 20.0)
    assert(r.getLong(1) === 7L)
    assert(r.getLong(3) === 2L)            // d6 and d7 alarm
    assert(r.getString(4) === "d6")        // first alarm
    assert(math.abs(r.getDouble(5) - 240.0 / 7.0) < 1e-9) // final s is max
  }

  test("stationary noise under the slack never alarms") {
    val vals = (1 to 10).map(i => (f"d$i%02d", if (i % 2 == 0) 12L else 8L))
    val r = run(vals, slack = 3.0, h = 5.0)
    assert(r.getLong(3) === 0L)
    assert(r.isNullAt(4))
    // mean 10, |dev| 2 <= slack 3: the statistic never leaves 0
    assert(r.getDouble(5) === 0.0)
  }

  test("the statistic resets after the shift reverts (one-sidedness)") {
    // spike then return: s climbs on the spike days, drains after
    val days = (1 to 9).map(i => f"d$i")
    val vals = days.zip(Seq(10L, 10L, 40L, 40L, 10L, 10L, 10L, 10L, 10L))
    val r = run(vals, slack = 0.0, h = 1000.0) // never alarms; watch max
    // mean = 150/9 = 16.67; two spike days add ~23.3 each -> max ~46.7
    assert(r.getLong(3) === 0L)
    assert(math.abs(r.getDouble(5) - (2 * (40 - 150.0 / 9))) < 1e-9)
  }

  test("pageHinkley: hand fold on a 3-point series, a level shift " +
      "alarms with no calibration target, flat series stays at zero") {
    import spark.implicits._
    def ph(vals: Seq[Long], delta: Double, h: Double) =
      ChangePoint.pageHinkley(
        vals.zipWithIndex.map { case (v, i) => ("k", f"d${i + 1}%02d", v) }
          .toDF("k", "d", "x"), "k", "d", "x", delta, h).head()
    // x = {10, 13, 10}, delta=0: m1=0, m2=3-11.5=1.5, m3=1.5-1=0.5
    // mins: 0 -> stats 0, 1.5, 0.5; max_stat 1.5, end 0.5
    val r = ph(Seq(10L, 13L, 10L), 0.0, 100.0)
    assert(math.abs(r.getAs[Double]("max_stat") - 1.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("ph_end") - 0.5) < 1e-12)
    assert(r.getAs[Long]("n_alarms") == 0L)
    // a sustained shift: 10x20 then 30x20 with delta=1 alarms, and the
    // first alarm lands inside the shifted regime
    val shift = Seq.fill(20)(10L) ++ Seq.fill(20)(30L)
    val rs = ph(shift, 1.0, 25.0)
    assert(rs.getAs[Long]("n_alarms") > 0L, rs.toString)
    assert(rs.getAs[String]("first_alarm") > "d20", rs.toString)
    // flat series: m_t = -t*delta, min tracks m exactly -> stat 0
    val rf = ph(Seq.fill(10)(7L), 1.0, 0.5)
    assert(rf.getAs[Long]("n_alarms") == 0L)
    assert(rf.getAs[Double]("max_stat") == 0.0)
  }

  test("ewmaChart: z recurrence matches a direct fold, limits widen " +
      "to steady state, planted outlier breaches") {
    import spark.implicits._
    // 30 quiet alternating points, then a sustained +2.5sigma-ish shift:
    // EWMA converges into the shift and crosses the steady-state UCL
    // (a single spike would NOT breach here — the self-calibrated sigma
    // absorbs it, which is the correct chart behavior)
    val vals = (1 to 30).map(i => if (i % 2 == 0) 11L else 10L) ++
      Seq.fill(10)(13L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", f"d${i + 1}%02d", v) }
      .toDF("k", "d", "x")
    val rows = ChangePoint.ewmaChart(df, "k", "d", "x", 0.2, 3.0)
      .orderBy("o").collect()
    assert(rows.length == 40)
    // direct recurrence from the series mean
    val mu = vals.sum.toDouble / vals.length
    var z = mu
    val zs = vals.map { v => z = 0.2 * v + 0.8 * z; z }
    rows.map(_.getAs[Double]("z")).zip(zs).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"$got vs $want") }
    // limits strictly widen toward steady state
    val widths = rows.map(r => r.getAs[Double]("ucl") - r.getAs[Double]("lcl"))
    widths.sliding(2).foreach { w => assert(w(1) > w(0) - 1e-12) }
    // the shifted tail breaches; the quiet head does not
    assert(rows.last.getAs[Boolean]("breach"), rows.mkString("\n"))
    assert(rows.take(30).forall(!_.getAs[Boolean]("breach")),
      rows.mkString("\n"))
    // single-point key: no sigma -> null limits, null breach
    val one = ChangePoint.ewmaChart(
      Seq(("s", "d1", 5L)).toDF("k", "d", "x"), "k", "d", "x").head()
    assert(one.isNullAt(one.fieldIndex("ucl")))
    assert(one.isNullAt(one.fieldIndex("breach")))
  }

  test("pettitt: rank-census U equals the naive quadratic definition, " +
      "locates a clean shift, ties break earliest, p closed-form") {
    import spark.implicits._
    // clean level shift after t=4 plus a noisy key with ties
    val shift = Seq(1L, 2L, 1L, 2L, 1L, 2L, 9L, 10L, 9L, 10L, 9L, 10L)
    val noisy = Seq(5L, 3L, 5L, 7L, 3L, 5L, 7L, 5L, 3L)
    def rows(k: String, xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (k, f"d${i + 1}%02d", x) }
    val df = (rows("a", shift) ++ rows("b", noisy)).toDF("k", "o", "x")
    val out = ChangePoint.pettitt(df, "k", "o", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    // independent naive O(n^2): U_t = sum_{i<=t} sum_{j>t} sgn(x_i-x_j)
    def naive(xs: Seq[Long]): (Long, Long, Int) = {
      val n = xs.length
      val us = (1 until n).map { t =>
        (for (i <- 0 until t; j <- t until n)
          yield java.lang.Long.signum(xs(i) - xs(j)).toLong).sum
      }
      val k = us.map(math.abs).max
      val at = us.indexWhere(u => math.abs(u) == k) // earliest
      (k, us(at), at + 1)
    }
    for ((key, xs) <- Seq("a" -> shift, "b" -> noisy)) {
      val (k, u, t) = naive(xs)
      val r = out(key)
      assert(r.getAs[Long]("k_stat") == k, s"$key k")
      assert(r.getAs[Long]("u_at_cp") == u, s"$key u")
      assert(r.getAs[String]("cp_ord") == f"d$t%02d", s"$key cp")
      val n = xs.length.toDouble
      val exp = math.min(1.0, 2.0 * math.exp(-6.0 * k * k / (n * n * n + n * n)))
      assert(r.getAs[Double]("p_value") == exp, s"$key p")
    }
    // the clean shift localizes at the boundary with a tiny p
    assert(out("a").getAs[String]("cp_ord") == "d06")
    assert(out("a").getAs[Double]("p_value") < 0.05)
  }

  test("pelt: exact DP matches a naive segmentation search, finds TWO " +
      "shifts binary-greedy geometry can misplace, huge penalty means " +
      "zero cuts, tiny keys absent, loud maxN gate") {
    import spark.implicits._
    // two clean level shifts: 0s, then 100s, then 0s
    val two = Seq.fill(5)(0L) ++ Seq.fill(5)(100L) ++ Seq.fill(5)(0L)
    val flat = Seq.fill(8)(7L)
    def rows(k: String, xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (k, f"d${i + 1}%02d", x) }
    val df = (rows("two", two) ++ rows("flat", flat) ++
      Seq(("tiny", "d01", 5L))).toDF("k", "o", "x")
    val out = ChangePoint.pelt(df, "k", "o", "x", penalty = 50.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("tiny")) // n < 2: no split exists
    assert(out("flat").getAs[Long]("n_changepoints") == 0L)
    assert(out("two").getAs[Long]("n_changepoints") == 2L)
    assert(out("two").getAs[String]("cp_ords") == "d06,d11")
    // independent exhaustive check: min over ALL segmentations of
    // sse + beta*(k+1), F(n) convention (F(0) = -beta)
    def sse(xs: Seq[Long]): Double = {
      val n = xs.length
      val s1 = xs.sum.toDouble
      xs.map(x => x.toDouble * x).sum - s1 * s1 / n
    }
    def best(xs: Seq[Long], beta: Double): Double =
      (0 until (1 << (xs.length - 1))).map { mask =>
        var cost = 0.0; var start = 0
        for (b <- 0 until xs.length - 1)
          if ((mask & (1 << b)) != 0) {
            cost += sse(xs.slice(start, b + 1)) + beta; start = b + 1
          }
        cost + sse(xs.slice(start, xs.length)) + beta - beta
      }.min
    val exp = best(two, 50.0)
    assert(math.abs(out("two").getAs[Double]("total_cost") - exp) < 1e-9,
      s"${out("two").getAs[Double]("total_cost")} vs $exp")
    // huge penalty: never worth cutting
    val big = ChangePoint.pelt(rows("two", two).toDF("k", "o", "x"),
      "k", "o", "x", penalty = 1e9).head()
    assert(big.getAs[Long]("n_changepoints") == 0L)
    // loud quadratic gate
    val err = intercept[Exception] {
      ChangePoint.pelt(rows("z", (1L to 30L)).toDF("k", "o", "x"),
        "k", "o", "x", penalty = 1.0, maxN = 10).collect()
    }
    assert(err.getMessage != null && err.getMessage.contains("pelt"),
      err.getMessage)
  }
}
