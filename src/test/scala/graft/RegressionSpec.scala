package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Regression

class RegressionSpec extends AnyFunSuite with SparkFixture {

  test("groupedOls recovers an exact line and is partition-stable") {
    import spark.implicits._
    // y = 2x + 1 exactly for group a; y = -x + 10 for group b
    val df = ((1 to 50).map(i => ("a", i.toDouble, 2.0 * i + 1)) ++
      (1 to 40).map(i => ("b", i.toDouble, 10.0 - i))).toDF("g", "x", "y")
    val fit = Regression.groupedOls(df, Seq("g"), "x", "y", scale = 2)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (sa, ia, ra) = fit("a")
    assert(math.abs(sa - 2.0) < 1e-9 && math.abs(ia - 1.0) < 1e-9)
    assert(math.abs(ra - 1.0) < 1e-9, s"exact fit must give r2=1, got $ra")
    val (sb, ib, _) = fit("b")
    assert(math.abs(sb + 1.0) < 1e-9 && math.abs(ib - 10.0) < 1e-9)

    // decimal sums make the result identical under any partitioning
    val again = Regression.groupedOls(df.repartition(13), Seq("g"), "x", "y", scale = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(again("a") == ((sa, ia)) && again("b") == ((sb, ib)))
  }

  test("groupedOls on a noisy cloud: slope between the axis-wise bounds") {
    import spark.implicits._
    // deterministic pseudo-noise; slope ~3 with r2 < 1
    val df = (1 to 200).map { i =>
      val noise = ((i * 2654435761L) % 97).toDouble - 48
      ("g", i.toDouble, 3.0 * i + noise)
    }.toDF("g", "x", "y")
    val r = Regression.groupedOls(df, Seq("g"), "x", "y", scale = 2).collect().head
    val (slope, r2) = (r.getDouble(2), r.getDouble(4))
    assert(slope > 2.5 && slope < 3.5, s"slope $slope")
    assert(r2 > 0.9 && r2 < 1.0, s"r2 $r2")
  }

  test("kendallTauB: perfect, inverted, hand-tied, and degenerate cases") {
    import spark.implicits._
    def tau(rows: Seq[(Long, Long)]): org.apache.spark.sql.Row = {
      val df = rows.zipWithIndex
        .map { case ((x, y), i) => ("g", f"$i%03d", x, y) }
        .toDF("g", "o", "x", "y")
      Regression.kendallTauB(df, "g", "o", "x", "y").collect().head
    }
    assert(tau(Seq((1L, 1L), (2L, 2L), (3L, 3L))).getAs[Double]("tau_b") == 1.0)
    assert(tau(Seq((1L, 3L), (2L, 2L), (3L, 1L))).getAs[Double]("tau_b") == -1.0)
    // x=(1,2,2,3) y=(1,2,3,3): C=4 D=0 tie_x=1 tie_y=1 over 6 pairs
    // tau_b = 4 / sqrt(5*5) = 0.8
    val t = tau(Seq((1L, 1L), (2L, 2L), (2L, 3L), (3L, 3L)))
    assert(t.getAs[Long]("concordant") == 4 && t.getAs[Long]("discordant") == 0)
    assert(t.getAs[Long]("tie_x") == 1 && t.getAs[Long]("tie_y") == 1)
    assert(t.getAs[Double]("tau_b") == 0.8)
    // constant x: every pair x-tied -> null tau
    assert(tau(Seq((5L, 1L), (5L, 2L), (5L, 3L))).isNullAt(7))
    // single-row groups are absent
    val single = Seq(("g", "000", 1L, 1L)).toDF("g", "o", "x", "y")
    assert(Regression.kendallTauB(single, "g", "o", "x", "y").count() == 0)
  }

  test("kendallTauB: partitioning-invariant integer censuses") {
    import spark.implicits._
    val rows = (1 to 120).map { i =>
      ("g" + (i % 3), f"$i%04d", ((i * 2654435761L) % 50),
        ((i * 40503L) % 60))
    }
    val df = rows.toDF("g", "o", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Regression.kendallTauB(d, "g", "o", "x", "y")
        .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4),
          r.getDouble(7))).sortBy(_._1).toSeq
    assert(run(df.repartition(1)) == run(df.repartition(32, col("o"))))
  }

  test("mannKendall: hand S and tie-corrected variance; monotone ramp " +
      "maxes S; flat series z = 0") {
    import spark.implicits._
    // y = {3, 1, 3, 2}: pairs (3,1)- (3,3)0 (3,2)- (1,3)+ (1,2)+ (3,2)-
    // S = -1; ties: value 3 has m=2 -> tie term 2*1*9 = 18
    // Var = [4*3*13 - 18]/18 = 138/18
    val df = Seq(("g", "d1", 3L), ("g", "d2", 1L), ("g", "d3", 3L),
      ("g", "d4", 2L)).toDF("g", "d", "y")
    val r = graft.operators.Regression.mannKendall(df, "g", "d", "y").head()
    assert(r.getAs[Long]("s") == -1L)
    assert(math.abs(r.getAs[Double]("var_s") - 138.0 / 18) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") -
      (-1.0 + 1.0) / math.sqrt(138.0 / 18)) < 1e-12) // continuity: (S+1)
    // strict ramp: S = n(n-1)/2, strongly positive z
    val ramp = (1 to 20).map(i => ("r", f"d$i%02d", i.toLong))
    val rr = graft.operators.Regression.mannKendall(
      ramp.toDF("g", "d", "y"), "g", "d", "y").head()
    assert(rr.getAs[Long]("s") == 190L)
    assert(rr.getAs[Double]("z") > 4.0)
    // constant series: S = 0 and variance collapses to 0 -> null z
    val flat = (1 to 6).map(i => ("f", f"d$i", 5L))
    val rf = graft.operators.Regression.mannKendall(
      flat.toDF("g", "d", "y"), "g", "d", "y").head()
    assert(rf.getAs[Long]("s") == 0L)
    assert(rf.isNullAt(rf.fieldIndex("z")))
    // duplicate ordCol must fail LOUDLY at execution (the oa < ob pair
    // filter drops equal-ord pairs in both orientations, so a silent
    // run would bias S) — the in-plan raise_error guard
    val dup = Seq(("g", "d1", 1L), ("g", "d1", 2L), ("g", "d2", 3L))
    val ex = intercept[Exception] {
      graft.operators.Regression.mannKendall(
        dup.toDF("g", "d", "y"), "g", "d", "y").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +:
        msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("duplicate ordCol")), msgs(ex))
  }

  test("partialCorr: perfect relation survives partialling, an exact " +
      "z-mediated link vanishes to 0, z==y nulls the denominator") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long, Long)]) =
      graft.operators.Regression.partialCorr(
        rows.toDF("s", "x", "y", "z"), "s", "x", "y", "z")
        .collect().map(r => r.getString(0) -> r).toMap
    // x == y: r_xy = 1 and partialling an imperfect z keeps pcorr = 1
    val ident = Seq(("i", 1L, 1L, 1L), ("i", 2L, 2L, 3L), ("i", 3L, 3L, 2L))
    val ri = run(ident)("i")
    assert(ri.getAs[Double]("r_xy") == 1.0)
    assert(math.abs(ri.getAs[Double]("pcorr") - 1.0) < 1e-12)
    // x and y relate ONLY through z (residuals orthogonal by
    // construction): r_xy = 0.5 but pcorr = 0 exactly
    val med = Seq(("m", 2L, 2L, 1L), ("m", 0L, -2L, -1L),
      ("m", 0L, 0L, 1L), ("m", -2L, 0L, -1L))
    val rm = run(med)("m")
    assert(math.abs(rm.getAs[Double]("r_xy") - 0.5) < 1e-12)
    assert(math.abs(rm.getAs[Double]("pcorr")) < 1e-12, rm.toString)
    // y == z: 1 - r_yz^2 = 0 -> pcorr null (r's still reported)
    val dup = Seq(("d", 1L, 1L, 1L), ("d", 2L, 3L, 3L), ("d", 3L, 2L, 2L))
    val rd = run(dup)("d")
    assert(rd.getAs[Double]("r_yz") == 1.0)
    assert(rd.isNullAt(rd.fieldIndex("pcorr")))
  }

  test("logoInfluence: hand two-group ledger; removing a cohort moves " +
      "the slope by the closed-form delta; degenerate remainder nulls") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)]) =
      graft.operators.Regression.logoInfluence(
        rows.toDF("g", "x", "y"), "g", "x", "y")
        .collect().map(r => r.getString(0) -> r).toMap
    // g1 slope 1, g2 slope 4; pooled slope 2.5 (hand moments)
    val out = run(Seq(("g1", 1L, 1L), ("g1", 2L, 2L),
      ("g2", 1L, 3L), ("g2", 2L, 7L)))
    assert(out("g1").getAs[Double]("slope_full") == 2.5)
    assert(out("g1").getAs[Double]("slope_without") == 4.0)
    assert(out("g1").getAs[Double]("delta") == 1.5)
    assert(out("g2").getAs[Double]("slope_without") == 1.0)
    assert(out("g2").getAs[Double]("delta") == -1.5)
    // removing g leaves a constant-x remainder -> slope_without null
    val deg = run(Seq(("a", 1L, 1L), ("a", 2L, 2L),
      ("b", 5L, 5L), ("b", 5L, 6L)))
    assert(deg("a").isNullAt(deg("a").fieldIndex("slope_without")))
    assert(!deg("b").isNullAt(deg("b").fieldIndex("slope_without")))
  }

  test("seasonalMannKendall: season-split S/Var sum the per-season " +
    "censuses; a pure annual cycle reads as NO trend where plain MK " +
    "sees one; duplicate ord raises per season") {
    import spark.implicits._
    import graft.operators.Regression
    // two seasons, both rising monotonically: per-season S = 3 each
    // (n=3: 3 pairs all concordant), Var_m = 3*2*11/18 each
    val rising = Seq(
      ("g", 1L, "d1", 1L), ("g", 1L, "d2", 2L), ("g", 1L, "d3", 3L),
      ("g", 2L, "d1", 5L), ("g", 2L, "d2", 6L), ("g", 2L, "d3", 7L))
    val r = Regression.seasonalMannKendall(
      rising.toDF("g", "m", "o", "y"), "g", "m", "o", "y").head()
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("n_seasons") == 2)
    assert(r.getAs[Long]("s") == 6)
    val vm = 3.0 * 2.0 * 11.0 / 18.0
    assert(math.abs(r.getAs[Double]("var_s") - 2 * vm) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 5.0 / math.sqrt(2 * vm))
      < 1e-12)
    // a sawtooth that repeats identically within each season: every
    // within-season series is constant -> S = 0, no trend
    val cycle = (0 until 3).flatMap(rep => Seq(
      ("g", 1L, s"d$rep", 10L), ("g", 2L, s"d$rep", 99L)))
    val rc = Regression.seasonalMannKendall(
      cycle.toDF("g", "m", "o", "y"), "g", "m", "o", "y").head()
    assert(rc.getAs[Long]("s") == 0 && rc.getAs[Double]("z") == 0.0)
    // duplicate ord inside one season raises loudly
    val dup = Seq(("g", 1L, "d1", 1L), ("g", 1L, "d1", 2L),
      ("g", 1L, "d2", 3L))
    val err = intercept[Exception] {
      Regression.seasonalMannKendall(
        dup.toDF("g", "m", "o", "y"), "g", "m", "o", "y").collect()
    }
    assert(err.getMessage.contains("seasonalMannKendall"),
      err.getMessage)
  }

  test("neweyWestTrend: matches the local HAC reference; positive " +
    "autocorrelation haircuts t_nw below t_iid; short series nulls") {
    import spark.implicits._
    import graft.operators.Regression
    def run(ys: Seq[Long]) = {
      val rows = ys.zipWithIndex.map { case (y, i) => ("k", f"$i%03d", y) }
      Regression.neweyWestTrend(rows.toDF("k", "o", "y"),
        "k", "o", "y", lags = 4).head()
    }
    // trend + slow sine = positively autocorrelated residuals
    val ys = (0 until 40).map(t =>
      (10 * t + 50 * math.sin(t / 4.0)).round)
    val r = run(ys)
    val tIid = r.getAs[Double]("t_iid"); val tNw = r.getAs[Double]("t_nw")
    assert(tIid > 0 && tNw > 0 && tNw < tIid, s"iid=$tIid nw=$tNw")
    // local reference (unrounded residuals; 1e-5 relative tolerance
    // absorbs the operator's 1e-6 residual quantization)
    val n = ys.length
    val xs = (0 until n).map(_.toDouble)
    val sx = xs.sum; val sy = ys.map(_.toDouble).sum
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val ss = n * sxx - sx * sx
    val b = (n * sxy - sx * sy) / ss
    val a = (sy - b * sx) / n
    val e = xs.zip(ys).map { case (x, y) => y - a - b * x }
    val v = xs.zip(e).map { case (x, ei) => (n * x - sx) * ei }
    def g(l: Int): Double =
      (l until n).map(i => v(i) * v(i - l)).sum
    val st = g(0) + 2.0 * (1 to 4).map(l => (1.0 - l / 5.0) * g(l)).sum
    val refNw = b / math.sqrt(st / (ss * ss))
    val refIid = b / math.sqrt(
      n * e.map(x => x * x).sum / (n - 2.0) / ss)
    assert(math.abs(tNw - refNw) < 1e-5 * math.abs(refNw),
      s"nw=$tNw ref=$refNw")
    assert(math.abs(tIid - refIid) < 1e-5 * math.abs(refIid))
    assert(math.abs(r.getAs[Double]("slope") - b) < 1e-9)
    // n <= lags + 2 -> nulls
    val tiny = run(Seq(1L, 2, 3, 4, 5, 6))
    assert(tiny.isNullAt(tiny.fieldIndex("t_nw")))
  }
}
