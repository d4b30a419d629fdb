package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Autocorr, Divergence, Forecast, Ranking, WeightedStats}

/** Round-7 series/statistics operators: ACF, seasonality profile, Holt
  * forecast, Gini concentration, KS two-sample, distinctive terms
  * (q239–q244's operators, off-fixture). */
class SeriesStatsSpec extends AnyFunSuite with SparkFixture {

  import org.apache.spark.sql.functions._

  test("acf of a perfectly alternating series is -1 at lag 1, +1 at lag 2") {
    import spark.implicits._
    val xs = Seq.tabulate(10)(i => (f"d$i%02d", if (i % 2 == 0) 10L else 20L))
    val df = xs.map { case (d, v) => ("k", d, v) }.toDF("k", "day", "x")
    val r = Autocorr.acf(df, "k", "day", "x", maxLag = 2)
      .orderBy("lag").collect()
    assert(r.length === 2)
    // alternating +-5 around the mean: lag-1 products are all -25, and
    // the estimator divides by the FULL n-term variance (n=10, pairs=9)
    assert(math.abs(r(0).getDouble(4) - (-9.0 / 10.0)) < 1e-12)
    assert(math.abs(r(1).getDouble(4) - (8.0 / 10.0)) < 1e-12)
    assert(r(0).getLong(2) === 10L && r(0).getLong(3) === 9L)
  }

  test("acf matches the direct definition on an irregular series") {
    import spark.implicits._
    val vals = Seq(3L, 7L, 1L, 9L, 4L, 6L, 2L, 8L)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("k", f"d$i%02d", v) }.toDF("k", "day", "x")
    val n = vals.length
    val m = vals.sum.toDouble / n
    def direct(k: Int): Double = {
      val num = (0 until n - k).map(i => (vals(i) - m) * (vals(i + k) - m)).sum
      val den = vals.map(v => (v - m) * (v - m)).sum
      num / den
    }
    val r = Autocorr.acf(df, "k", "day", "x", maxLag = 3)
      .orderBy("lag").collect()
    (1 to 3).foreach { k =>
      assert(math.abs(r(k - 1).getDouble(4) - direct(k)) < 1e-12, s"lag $k")
    }
  }

  test("seasonality lift is the exact rational cell-mean over overall-mean") {
    import spark.implicits._
    // dow 1 days average 30, dow 2 days average 10; overall mean 20
    val df = Seq(("k", 1, 30L), ("k", 1, 30L), ("k", 2, 10L), ("k", 2, 10L))
      .toDF("k", "dw", "x")
    val r = Autocorr.seasonalityProfile(df, "k", col("dw"), "x")
      .orderBy("dow").collect()
    assert(r(0).getDouble(4) === 30.0 && math.abs(r(0).getDouble(5) - 1.5) < 1e-15)
    assert(r(1).getDouble(4) === 10.0 && math.abs(r(1).getDouble(5) - 0.5) < 1e-15)
  }

  test("holt summary replays the hand recurrence and projects linearly") {
    import spark.implicits._
    val vals = Seq(10.0, 20.0, 14.0, 18.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("k", f"d$i%02d", v) }.toDF("k", "day", "x")
    var l = vals.head; var b = 0.0
    vals.tail.foreach { x =>
      val ln = 0.5 * x + 0.5 * (l + b)
      b = 0.25 * (ln - l) + 0.75 * b
      l = ln
    }
    val r = Forecast.holtSummary(df, "k", "day", "x",
      alpha = 0.5, beta = 0.25, horizon = 3).head()
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === l)                  // bit-identical fold
    assert(r.getDouble(3) === b)
    assert(r.getDouble(4) === l + 3.0 * b)
  }

  test("holt-winters replays the hand recurrence bit-for-bit and " +
      "out-forecasts plain Holt on a pure weekly shape") {
    import spark.implicits._
    // period 3 for the hand check: 10 seasons of a trending + seasonal
    // series x_t = 10 + t + {0, 5, -5}[(t-1) % 3]
    val m = 3
    val vals = (1 to 30).map(t => 10.0 + t + Seq(0.0, 5.0, -5.0)((t - 1) % m))
    val df = vals.zipWithIndex
      .map { case (v, i) => ("k", f"d$i%02d", v) }.toDF("k", "day", "x")
    var l = vals.take(m).sum / m
    var b = (vals.slice(m, 2 * m).sum - vals.take(m).sum) / (m * m)
    val s = vals.take(m).map(_ - l).toArray
    (m until vals.length).foreach { i =>
      val pos = i % m
      val ln = 0.5 * (vals(i) - s(pos)) + 0.5 * (l + b)
      val bn = 0.25 * (ln - l) + 0.75 * b
      s(pos) = 0.25 * (vals(i) - ln) + 0.75 * s(pos)
      l = ln; b = bn
    }
    val r = Forecast.holtWintersSummary(df, "k", "day", "x", period = m,
      alpha = 0.5, beta = 0.25, gamma = 0.25, horizon = m).head()
    assert(r.getAs[Double]("level") === l)
    assert(r.getAs[Double]("trend") === b)
    val fpos = (vals.length + m - 1) % m
    assert(r.getAs[Double]("seasonal") === s(fpos))
    assert(r.getAs[Double]("forecast") === l + m * b + s(fpos))
    // the true x_33 = 10 + 33 - 5 = 38; HW must land far closer than
    // Holt, which cannot carry the -5 seasonal trough
    val hw = r.getAs[Double]("forecast")
    val holt = Forecast.holtSummary(df, "k", "day", "x",
      alpha = 0.5, beta = 0.25, horizon = m).head().getAs[Double]("forecast")
    assert(math.abs(hw - 38.0) < math.abs(holt - 38.0), s"hw=$hw holt=$holt")
    // too-short series: loud nulls
    val short = Forecast.holtWintersSummary(
      df.limit(5), "k", "day", "x", m, 0.5, 0.25, 0.25, m).head()
    assert(short.isNullAt(short.fieldIndex("level")))
  }

  test("hurstRs: hand R/S on a tiny block, ramp is persistent, " +
      "alternation is anti-persistent") {
    import spark.implicits._
    def mk(vals: Seq[Long], key: String = "k") =
      vals.zipWithIndex.map { case (v, i) => (key, f"t${i + 1}%04d", v) }
        .toDF("k", "t", "x")
    // block (1,2,3,4): devs 4p-10i = {-6,-8,-6,0} -> R = 8/4 = 2
    // var = (4*30-100)/16 = 1.25; shifted block (5..8) is identical
    val r = graft.operators.Autocorr.hurstRs(
      mk((1L to 8L)), "k", "t", "x", windows = Seq(4)).head()
    assert(r.getAs[Long]("n_blocks") == 2L)
    assert(math.abs(r.getAs[Double]("avg_rs") - 2.0 / math.sqrt(1.25)) < 1e-12)
    assert(r.isNullAt(r.fieldIndex("hurst"))) // one point fits no slope
    // a noisy ramp is persistent (H near 1); +-1 alternation is
    // anti-persistent (H near 0)
    val lcg = Iterator.iterate(7L)(s => (s * 1103515245L + 12345L) % 1048576L)
    val noise = lcg.take(256).map(_ % 5).toSeq
    val ramp = (1 to 256).map(i => 10L * i + noise(i - 1))
    val alt = (1 to 256).map(i => if (i % 2 == 0) 10L else 0L)
    val h = graft.operators.Autocorr.hurstRs(
      mk(ramp, "ramp").unionAll(mk(alt, "alt")), "k", "t", "x")
      .collect().map(x => (x.getAs[String]("k"), x.getAs[Int]("w")) ->
        x.getAs[Double]("hurst")).toMap
    assert(h(("ramp", 8)) > 0.85, h.toString)
    assert(h(("alt", 8)) < 0.15, h.toString)
  }

  test("sax motifs: a pure square wave collapses to two alternating " +
      "motifs; constant series emit nothing; partial segments drop") {
    import spark.implicits._
    // 8 segments of 4: values alternate low,low,high,high per segment
    // pair -> symbols alternate (a-ish, d-ish); words over 3 segments
    val vals = (0 until 32).map { i =>
      if ((i / 4) % 2 == 0) 0L else 100L
    } ++ Seq(50L) // trailing partial segment must drop
    val df = vals.zipWithIndex.map { case (v, i) => ("k", f"t${i}%03d", v) }
      .toDF("k", "t", "x")
    val rows = graft.operators.Sax.motifCensus(df, "k", "t", "x",
      seg = 4, word = 3).collect()
    val words = rows.map(r => r.getAs[String]("word") -> r.getAs[Long]("n"))
      .toMap
    // 8 symbols alternating a d a d a d a d -> words "ada" x3, "dad" x3
    assert(words == Map("ada" -> 3L, "dad" -> 3L), words.toString)
    // constant series: zero variance -> no output rows
    val flat = (0 until 16).map(i => ("f", f"t$i%03d", 7L)).toDF("k", "t", "x")
    assert(graft.operators.Sax.motifCensus(flat, "k", "t", "x", 4, 2)
      .count() == 0L)
  }

  test("croston: hand fold over a sparse demand series; single-demand " +
      "keys stay loudly null") {
    import spark.implicits._
    // demands on days 1, 4, 6 (gaps 3, 2) with sizes 10, 20, 30
    val df = Seq(("u", "2024-01-01", 10L), ("u", "2024-01-04", 20L),
      ("u", "2024-01-06", 30L), ("solo", "2024-01-02", 5L))
      .toDF("k", "day", "d")
    val out = graft.operators.Forecast.croston(df, "k", "day", "d")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val z = 0.2 * 30 + 0.8 * (0.2 * 20 + 0.8 * 10.0)
    val p = 0.2 * 2 + 0.8 * 3.0
    val u = out("u")
    assert(u.getAs[Long]("n_demands") == 3L)
    assert(math.abs(u.getAs[Double]("z") - z) < 1e-12)
    assert(math.abs(u.getAs[Double]("p") - p) < 1e-12)
    assert(math.abs(u.getAs[Double]("rate") - z / p) < 1e-12)
    val s = out("solo")
    assert(s.getAs[Long]("n_demands") == 1L)
    assert(!s.isNullAt(s.fieldIndex("z")))      // size seeds immediately
    assert(s.isNullAt(s.fieldIndex("p")))       // no interval yet
    assert(s.isNullAt(s.fieldIndex("rate")))
  }

  test("ljungBox: Q recombines the acf exactly, p matches the direct " +
      "chi2(6) survival, trending series reject whiteness") {
    import spark.implicits._
    val lcg = Iterator.iterate(11L)(s => (s * 1103515245L + 12345L) % 1048576L)
    val noise = lcg.take(60).map(_ % 100).toSeq
    val df = (noise.zipWithIndex.map { case (v, i) => ("w", f"d$i%02d", v) } ++
      (1 to 60).map(i => ("trend", f"d$i%02d", 10L * i)))
      .toDF("k", "d", "x")
    val out = graft.operators.Autocorr.ljungBox(df, "k", "d", "x", maxLag = 6)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    // recombine from the acf rows directly
    val rs = graft.operators.Autocorr.acf(df, "k", "d", "x", 6)
      .where($"k" === "w").orderBy("lag")
      .collect().map(r => (r.getAs[Int]("lag"), r.getAs[Double]("r")))
    val n = 60.0
    val q = n * (n + 2) * rs.map { case (lag, r) => r * r / (n - lag) }.sum
    assert(math.abs(out("w").getAs[Double]("q_stat") - q) < 1e-9)
    val h = q / 2
    val direct = math.exp(-h) * (1 + h + h * h / 2)
    assert(math.abs(out("w").getAs[Double]("p_value") - direct) < 1e-9)
    // a deterministic trend has r_k ~ 1 at all lags: overwhelming Q
    assert(out("trend").getAs[Double]("p_value") < 1e-9)
    assert(out("trend").getAs[Double]("q_stat") >
      out("w").getAs[Double]("q_stat") * 3)
  }

  test("runsTest: hand moments on an alternating series, sticky " +
      "regimes z < 0, one-sided series loudly null") {
    import spark.implicits._
    // (1,5,1,5): mean 3 -> signs 0101 -> runs 4, n1 = n0 = 2
    // E = 3, Var = 8*(8-4)/(16*3) = 2/3
    val alt = Seq(1L, 5L, 1L, 5L).zipWithIndex
      .map { case (v, i) => ("alt", f"d$i", v) }
    val sticky = (Seq.fill(10)(1L) ++ Seq.fill(10)(5L)).zipWithIndex
      .map { case (v, i) => ("sticky", f"d$i%02d", v) }
    val flat = (1 to 5).map(i => ("flat", f"d$i", 7L))
    val out = graft.operators.Autocorr.runsTest(
      (alt ++ sticky ++ flat).toDF("k", "d", "x"), "k", "d", "x")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val a = out("alt")
    assert(a.getAs[Long]("runs") == 4L && a.getAs[Long]("n_above") == 2L)
    assert(a.getAs[Double]("expected_runs") == 3.0)
    assert(math.abs(a.getAs[Double]("z") - 1.0 / math.sqrt(2.0 / 3)) < 1e-12)
    // two long regimes: 2 runs vs E = 11 -> strongly negative z
    assert(out("sticky").getAs[Long]("runs") == 2L)
    assert(out("sticky").getAs[Double]("z") < -3.0)
    // constant series: everything "below" the mean -> null z
    assert(out("flat").getAs[Long]("n_above") == 0L)
    assert(out("flat").isNullAt(out("flat").fieldIndex("z")))
  }

  test("kaplanMeierCI: greenwood bands verify by hand, exhausted risk " +
      "sets null the band from there on") {
    import spark.implicits._
    // durations (2,ev) (3,cens) (5,ev) (5,ev) (7,cens):
    // t=2: S=4/5, g=1/(5*4); t=5: S=(4/5)(1/3), g+=2/(3*1)
    val subjects = Seq((2L, 1), (3L, 0), (5L, 1), (5L, 1), (7L, 0))
      .toDF("dur", "ev")
    val r = graft.operators.Survival.kaplanMeierCI(subjects, "dur", "ev")
      .orderBy("dur").collect()
    val s2 = 4.0 / 5; val g2 = 1.0 / 20
    assert(math.abs(r(0).getAs[Double]("se") - s2 * math.sqrt(g2)) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("lo") -
      math.max(s2 - 1.96 * s2 * math.sqrt(g2), 0.0)) < 1e-12)
    val s5 = 4.0 / 5 * (1.0 / 3); val g5 = g2 + 2.0 / 3
    assert(math.abs(r(2).getAs[Double]("se") - s5 * math.sqrt(g5)) < 1e-12)
    // every at-risk subject dies at the last duration: greenwood
    // explodes -> null band, survival itself stays
    val total = Seq((1L, 1), (2L, 1), (2L, 1)).toDF("dur", "ev")
    val rt = graft.operators.Survival.kaplanMeierCI(total, "dur", "ev")
      .orderBy("dur").collect()
    assert(rt(1).getAs[Double]("survival") == 0.0)
    assert(rt(1).isNullAt(rt(1).fieldIndex("se")))
    assert(!rt(0).isNullAt(rt(0).fieldIndex("se")))
  }

  test("pacf: Durbin-Levinson replays a direct Scala recursion over " +
      "the acf; lag-1 equals r1 exactly") {
    import spark.implicits._
    val lcg = Iterator.iterate(3L)(s => (s * 1103515245L + 12345L) % 1048576L)
    val noise = lcg.take(80).map(_ % 50).toSeq
    // mild AR flavor: x_t = noise_t + noise_{t-1}
    val vals = noise.zip(0L +: noise).map { case (a, b) => a + b / 2 }
    val df = vals.zipWithIndex.map { case (v, i) => ("k", f"d$i%02d", v) }
      .toDF("k", "d", "x")
    val K = 6
    val rs = graft.operators.Autocorr.acf(df, "k", "d", "x", K)
      .orderBy("lag").collect().map(_.getAs[Double]("r"))
    // direct recursion
    var phi = Array(rs(0)); val out = scala.collection.mutable.Buffer(rs(0))
    (2 to K).foreach { k =>
      val num = rs(k - 1) -
        (1 until k).map(j => phi(j - 1) * rs(k - j - 1)).sum
      val den = 1.0 - (1 until k).map(j => phi(j - 1) * rs(j - 1)).sum
      val pkk = num / den
      phi = (1 until k).map(j => phi(j - 1) - pkk * phi(k - j - 1)).toArray :+ pkk
      out += pkk
    }
    val got = graft.operators.Autocorr.pacf(df, "k", "d", "x", K)
      .orderBy("lag").collect().map(_.getAs[Double]("pacf"))
    assert(got.length == K)
    got.zip(out).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-12, s"lag ${i + 1}: $g vs $w") }
    assert(got(0) == rs(0))
  }

  test("logRank: symmetric cohorts score exactly zero; a cohort that " +
      "always churns against one that never does rejects") {
    import spark.implicits._
    // mirrored design: chi2 must be an exact 0, p = erfc(0) = 1
    val sym = Seq((1L, 1, false), (2L, 0, false), (1L, 0, true),
      (2L, 1, true)).toDF("dur", "ev", "b")
    val rs = graft.operators.Survival.logRank(sym, "dur", "ev", $"b").head()
    assert(rs.getAs[Double]("e_a") == 1.0 && rs.getAs[Long]("o_a") == 1L)
    assert(rs.getAs[Double]("chi2") == 0.0)
    // the pinned erfc polynomial evaluates erfc(0) to ~1 + 3e-8 — the
    // kernel's documented approximation error, identical cross-engine
    assert(math.abs(rs.getAs[Double]("p") - 1.0) < 1e-6)
    // B churns on days 1..3, A survives censored: hand E/V sums
    // E = 1/2 + 3/5 + 3/4 = 1.85; V = 1/4 + 6/25 + 3/16
    val split = Seq((5L, 0, false), (5L, 0, false), (5L, 0, false),
      (1L, 1, true), (2L, 1, true), (3L, 1, true)).toDF("dur", "ev", "b")
    val r = graft.operators.Survival.logRank(split, "dur", "ev", $"b").head()
    assert(r.getAs[Long]("o_a") == 0L)
    assert(math.abs(r.getAs[Double]("e_a") - 1.85) < 1e-12)
    val v = 0.25 + 6.0 / 25 + 3.0 / 16
    assert(math.abs(r.getAs[Double]("var_lr") - v) < 1e-12)
    assert(math.abs(r.getAs[Double]("chi2") - 1.85 * 1.85 / v) < 1e-9)
    assert(r.getAs[Double]("p") < 0.05, r.toString)
  }

  test("gini: uniform mass is 0, fully concentrated approaches (n-1)/n") {
    import spark.implicits._
    val df = Seq(("u", 5L), ("u", 5L), ("u", 5L), ("u", 5L),
      ("c", 0L), ("c", 0L), ("c", 0L), ("c", 4L)).toDF("g", "v")
    val r = WeightedStats.gini(df, "g", "v").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("u").getDouble(3) === 0.0)
    // one holder of all mass among 4: G = (2*16 - 5*4)/(4*4) = 0.75
    assert(r("c").getDouble(3) === 0.75)
  }

  test("gini is tie-order independent (census contribution formula)") {
    import spark.implicits._
    // values with heavy ties; compare against the sorted-rank formula
    val vals = Seq(1L, 1L, 2L, 2L, 2L, 7L)
    val df = vals.map(("k", _)).toDF("g", "v")
    val sorted = vals.sorted
    val n = vals.length
    val six = sorted.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum
    val tot = vals.sum
    val expect = (2.0 * six - (n + 1).toLong * tot) / (n.toLong * tot).toDouble
    val r = WeightedStats.gini(df, "g", "v").head()
    assert(r.getDouble(3) === expect)
  }

  test("ks two-sample: identical samples give 0, disjoint give 1") {
    import spark.implicits._
    val same = (1 to 20).flatMap(i => Seq((i.toLong, false), (i.toLong, true)))
      .toDF("v", "r")
    val s = Divergence.ksTwoSample(same, "v", col("r")).head()
    assert(s.getLong(3) === 0L && s.getDouble(4) === 0.0)
    val disj = ((1 to 10).map(i => (i.toLong, false)) ++
      (11 to 20).map(i => (i.toLong, true))).toDF("v", "r")
    val d = Divergence.ksTwoSample(disj, "v", col("r")).head()
    assert(d.getDouble(4) === 1.0)
  }

  test("ks statistic equals the brute-force ECDF max gap") {
    import spark.implicits._
    val a = Seq(1L, 3L, 3L, 7L, 9L, 12L)
    val b = Seq(2L, 3L, 8L, 8L, 10L)
    val df = (a.map((_, false)) ++ b.map((_, true))).toDF("v", "r")
    val vs = (a ++ b).distinct.sorted
    val brute = vs.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
    }.max
    val r = Divergence.ksTwoSample(df, "v", col("r")).head()
    assert(r.getLong(0) === a.size.toLong && r.getLong(1) === b.size.toLong)
    assert(math.abs(r.getDouble(4) - brute) < 1e-12)
  }

  test("seasonal anomalies rank residuals against the weekday's own mean") {
    import spark.implicits._
    // dow 1 runs at 100 except one 130 day; dow 2 runs at 10 except 25.
    // raw |dev| says the 130 day (30 > 15); its weekday mean absorbs
    // part of it: expected(dw1) = 107.5, expected(dw2) = 13.75
    val rows = Seq(
      ("k", "d01", 1, 100L), ("k", "d02", 2, 10L),
      ("k", "d03", 1, 100L), ("k", "d04", 2, 10L),
      ("k", "d05", 1, 130L), ("k", "d06", 2, 25L),
      ("k", "d07", 1, 100L), ("k", "d08", 2, 10L))
      .toDF("k", "day", "dw", "x")
    val r = graft.operators.Autocorr.seasonalAnomalies(
      rows, "k", "day", col("dw"), "x", topK = 2).orderBy("rnk").collect()
    assert(r(0).getString(1) === "d05" && r(0).getDouble(4) === 130.0 - 107.5)
    assert(r(1).getString(1) === "d06" && r(1).getDouble(4) === 25.0 - 13.75)
  }

  test("calibration curve: equal-frequency buckets, tie-runs never split") {
    import spark.implicits._
    // 100 rows, scores 1..100, label = score > 50: perfectly separable
    val df = (1 to 100).map(s => ("g", s.toLong, if (s > 50) 1 else 0))
      .toDF("g", "s", "p")
    val r = graft.operators.Eval.calibrationCurve(df, "g", "p", "s", buckets = 10)
      .orderBy("bucket").collect()
    assert(r.length === 10)
    assert(r.map(_.getLong(2)).forall(_ == 10L))            // 10 per decile
    assert(r.take(5).map(_.getDouble(5)).forall(_ == 0.0))  // low deciles: 0
    assert(r.drop(5).map(_.getDouble(5)).forall(_ == 1.0))  // high deciles: 1
    assert(r(0).getDouble(4) === 5.5)                       // mean of 1..10
    // tie-run: all 100 rows share one score -> ONE bucket holds them all
    val ties = (1 to 100).map(i => ("g", 7L, i % 2)).toDF("g", "s", "p")
    val t = graft.operators.Eval.calibrationCurve(ties, "g", "p", "s", buckets = 10)
      .collect()
    assert(t.length === 1 && t(0).getLong(1) === 0L && t(0).getLong(2) === 100L)
    assert(t(0).getDouble(5) === 0.5)
  }

  test("executeAllocation draws exactly alloc_h per stratum, stable under unrelated rows") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (if (i <= 20) "a" else "b", i)).toDF("st", "id")
    val alloc = Seq(("a", 3L), ("b", 5L)).toDF("st", "alloc")
    val got = graft.operators.Splits.executeAllocation(rows, "st", "id", alloc)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.count(_._1 == "a") === 3 && got.count(_._1 == "b") === 5)
    // the draw is a pure function of the ids: doubling stratum b's
    // population must not change stratum a's picks
    val more = rows.union((100L to 140L).map(("b", _)).toDF("st", "id"))
    val got2 = graft.operators.Splits.executeAllocation(more, "st", "id", alloc)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.filter(_._1 == "a").toSet === got2.filter(_._1 == "a").toSet)
  }

  test("profileDiff reports null-rate delta and mode churn per column") {
    import spark.implicits._
    val a = Seq(("x", Option("m")), ("x", Option("m")), ("y", None),
      ("x", Option("k"))).toDF("c1", "c2")
    val b = Seq(("y", Option("k")), ("y", None), ("y", None),
      ("x", Option("k"))).toDF("c1", "c2")
    val r = graft.operators.Profile.profileDiff(a, b, Seq("c1", "c2"))
      .collect().map(x => x.getString(0) -> x).toMap
    // c1: modes x -> y, no nulls either side
    assert(r("c1").getBoolean(10) === true)
    assert(r("c1").getDouble(5) === 0.0)
    // c2: nulls 1/4 -> 2/4, mode m -> k
    assert(r("c2").getLong(3) === 1L && r("c2").getLong(4) === 2L)
    assert(math.abs(r("c2").getDouble(5) - 0.25) < 1e-15)
    assert(r("c2").getString(8) === "m" && r("c2").getString(9) === "k")
  }

  test("timeWeightedMean weighs values by holding duration") {
    import spark.implicits._
    // value 10 held 0..100ms, 40 held 100..120ms: twap = (10*100+40*20)/120
    val df = Seq(("k", 0L, 10L), ("k", 100L, 40L), ("k", 120L, 99L),
      ("solo", 5L, 7L)).toDF("g", "ms", "v")
    val r = graft.operators.WeightedStats.timeWeightedMean(df, "g", "ms", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("k").getLong(1) === 3L && r("k").getLong(2) === 120L)
    assert(r("k").getDouble(3) === (10.0 * 100 + 40.0 * 20) / 120.0)
    assert(r("solo").isNullAt(3) && r("solo").isNullAt(2))
  }

  test("centroid drift: parallel centroids cos 1, opposed -1, orthogonal 0") {
    import spark.implicits._
    val rows = Seq(
      ("same", 0L, Seq(1.0f, 0.0f)), ("same", 1L, Seq(2.0f, 0.0f)),
      ("same", 2L, Seq(3.0f, 0.0f)),
      ("flip", 0L, Seq(1.0f, 0.0f)), ("flip", 1L, Seq(-1.0f, 0.0f)),
      ("orth", 0L, Seq(1.0f, 0.0f)), ("orth", 1L, Seq(0.0f, 2.0f)),
      ("aonly", 0L, Seq(1.0f, 1.0f))).toDF("lbl", "id", "vec")
    val r = graft.operators.Similarity.centroidDrift(
        rows, "lbl", "vec", isB = col("id") % 2 === 1)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("same").getDouble(3) === 1.0)   // (2,0) vs (2,0) direction
    assert(r("flip").getDouble(3) === -1.0)
    assert(r("orth").getDouble(3) === 0.0)
    assert(r("aonly").isNullAt(3))           // empty B slice: no cosine
    assert(r("same").getLong(1) === 2L && r("same").getLong(2) === 1L)
  }

  test("waterFill: caps respected, budget spent exactly, max-min fair") {
    import spark.implicits._
    def run(av: Seq[(String, Long)], b: Long) =
      graft.operators.Mixture.waterFill(av.toDF("s", "avail"), "s", "avail", b)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toMap
    // mixed: tiny source takes all 5; remaining 95 levels 47/48 over two
    val m = run(Seq(("tiny", 5L), ("mid", 60L), ("big", 500L)), 100L)
    assert(m("tiny") === ((5L, 5L, true)))
    assert(m.values.map(_._2).sum === 100L)
    assert(m("mid")._2 === 48L && m("big")._2 === 47L) // +1 seat: (avail,src) order
    assert(m.values.forall { case (av, al, _) => al <= av })
    // budget >= total: everyone at capacity
    val c = run(Seq(("a", 10L), ("b", 20L)), 100L)
    assert(c.values.forall(_._3) && c.values.map(_._2).sum === 30L)
    // budget below min: pure equal split with remainder seats
    val e = run(Seq(("a", 50L), ("b", 50L), ("c", 50L)), 10L)
    assert(e.values.map(_._2).sum === 10L)
    assert(e.values.map(_._2).toSeq.sorted === Seq(3L, 3L, 4L))
  }

  test("kaplan-meier: censored subjects hold the at-risk set but never the product") {
    import spark.implicits._
    val subjects = Seq((2L, 1), (3L, 0), (5L, 1), (5L, 1), (7L, 0))
      .toDF("dur", "ev")
    val r = graft.operators.Survival.kaplanMeier(subjects, "dur", "ev")
      .orderBy("dur").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(2L, 3L, 5L, 7L))
    assert(r.map(_.getLong(3)).toSeq === Seq(5L, 4L, 3L, 1L))   // at-risk
    assert(r(0).getDouble(4) === 1.0 - 1.0 / 5.0)               // S(2) = 0.8
    assert(r(1).getDouble(4) === r(0).getDouble(4))             // censoring: flat
    assert(r(2).getDouble(4) === (1.0 - 1.0 / 5.0) * (1.0 - 2.0 / 3.0))
    assert(r(3).getDouble(4) === r(2).getDouble(4))
    assert(r(2).getLong(2) === 2L)                              // two deaths at 5
  }

  test("nelson-aalen: cumulative d/n sums match hand computation and " +
      "exp(-H) tracks KM from above") {
    import spark.implicits._
    val subjects = Seq((2L, 1), (3L, 0), (5L, 1), (5L, 1), (7L, 0))
      .toDF("dur", "ev")
    val r = graft.operators.Survival.nelsonAalen(subjects, "dur", "ev")
      .orderBy("dur").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(2L, 3L, 5L, 7L))
    assert(r(0).getDouble(4) === 1.0 / 5.0)               // H(2) = 1/5
    assert(r(1).getDouble(4) === r(0).getDouble(4))       // censoring: flat
    assert(r(2).getDouble(4) === 1.0 / 5.0 + 2.0 / 3.0)   // +2/3 at t=5
    assert(r(3).getDouble(4) === r(2).getDouble(4))
    // Fleming–Harrington dominates KM pointwise (exp(-x) >= 1 - x)
    val km = graft.operators.Survival.kaplanMeier(subjects, "dur", "ev")
      .orderBy("dur").collect().map(_.getDouble(4))
    r.map(_.getDouble(5)).zip(km).foreach { case (fh, s) =>
      assert(fh >= s - 1e-12, s"FH $fh below KM $s") }
  }

  test("ucbAllocation: under-explored arm wins despite a lower mean; " +
      "ties break by arm id") {
    import spark.implicits._
    // arm a: 50 pulls, mean 0.6; arm b: 2 pulls, mean 0.5 -> b's bonus
    // sqrt(2 ln 52 / 2) ~ 1.99 dwarfs a's ~0.40: UCB pulls b
    val rows = (1 to 50).map(i => ("s", "a", if (i <= 30) 1L else 0L)) ++
      Seq(("s", "b", 1L), ("s", "b", 0L))
    val got = graft.operators.Eval.ucbAllocation(rows.toDF("sc", "arm", "r"),
        "sc", "arm", "r")
      .collect().map(r => r.getAs[String]("arm") ->
        ((r.getAs[Double]("mean"), r.getAs[Double]("ucb"),
          r.getAs[Boolean]("chosen")))).toMap
    assert(got("a")._1 == 0.6 && got("b")._1 == 0.5)
    assert(got("b")._3 && !got("a")._3, s"UCB must explore: $got")
    val n = 52.0
    assert(math.abs(got("b")._2 -
      (0.5 + math.sqrt(2 * math.log(n) / 2))) < 1e-12)
    // exact tie (same counts, same rewards): smaller arm id chosen
    val tie = Seq(("t", "x", 1L), ("t", "y", 1L))
    val t = graft.operators.Eval.ucbAllocation(tie.toDF("sc", "arm", "r"),
        "sc", "arm", "r")
      .collect().map(r => r.getAs[String]("arm") -> r.getAs[Boolean]("chosen"))
      .toMap
    assert(t("x") && !t("y"))
  }

  test("captureRecapture: Chapman estimate on hand-counted catches; " +
      "full overlap collapses to the union") {
    import spark.implicits._
    // A = {1..70}, B = {51..100}: m = 20 -> N-hat = 71*51/21 - 1
    val a = (1 to 70).map(i => s"k$i").toDF("k")
    val b = (51 to 100).map(i => s"k$i").toDF("k")
    val r = graft.operators.Dedup.captureRecapture(a, b, "k").head()
    assert(r.getAs[Long]("n_a") == 70L && r.getAs[Long]("n_b") == 50L &&
      r.getAs[Long]("n_both") == 20L)
    assert(math.abs(r.getAs[Double]("n_hat") -
      (71.0 * 51.0 / 21.0 - 1.0)) < 1e-9)
    assert(r.getAs[Double]("se") > 0.0)
    // identical catches: estimate = the catch itself, SE = 0
    val same = graft.operators.Dedup.captureRecapture(a, a, "k").head()
    assert(math.abs(same.getAs[Double]("n_hat") - 70.0) < 1e-9)
    assert(same.getAs[Double]("se") == 0.0)
    // duplicates in a capture collapse (distinct keys)
    val dup = graft.operators.Dedup.captureRecapture(
      a.union(a), b, "k").head()
    assert(dup.getAs[Long]("n_a") == 70L)
  }

  test("durbinWatson: hand computation, alternating series -> 4-ish, " +
      "trending series -> small, constant -> null") {
    import spark.implicits._
    // y = {1, 2, 4}: diffs {1, 2}, num = 5; e = {-4/3, -1/3, 5/3},
    // den*n = n*S2 - S1^2 = 3*21 - 49 = 14; DW = 3*5/14
    val base = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 4L))
      .toDF("k", "t", "y")
    val r = graft.operators.Autocorr.durbinWatson(base, "k", "t", "y").head()
    assert(math.abs(r.getAs[Double]("dw") - 15.0 / 14.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rho") - (1.0 - 15.0 / 28.0)) < 1e-12)
    // alternating +-1 pushes DW toward 4; a monotone ramp stays low
    val alt = (1 to 40).map(i => ("alt", i.toLong, if (i % 2 == 0) 1L else -1L))
    val ramp = (1 to 40).map(i => ("ramp", i.toLong, i.toLong))
    val both = graft.operators.Autocorr
      .durbinWatson((alt ++ ramp).toDF("k", "t", "y"), "k", "t", "y")
      .collect().map(x => x.getAs[String]("k") -> x.getAs[Double]("dw")).toMap
    assert(both("alt") > 3.5, both.toString)
    assert(both("ramp") < 0.5, both.toString)
    // constant series: zero variance -> null
    val flat = Seq(("f", 1L, 7L), ("f", 2L, 7L)).toDF("k", "t", "y")
    val rf = graft.operators.Autocorr.durbinWatson(flat, "k", "t", "y").head()
    assert(rf.isNullAt(rf.fieldIndex("dw")))
  }

  test("power-law alpha matches the direct Clauset MLE") {
    import spark.implicits._
    val census = Seq((1L, 100L), (2L, 25L), (4L, 6L), (8L, 1L)).toDF("v", "c")
    val n = 132L
    val s = Seq((1L, 100L), (2L, 25L), (4L, 6L), (8L, 1L))
      .map { case (v, c) => c * math.log(v / 0.5) }.sum
    val r = graft.operators.Profile.powerLawAlpha(census, "v", "c", vmin = 1L)
      .head()
    assert(r.getLong(0) === n)
    assert(math.abs(r.getDouble(2) - (1.0 + n / s)) < 1e-12)
  }

  test("session paths: gap splits sessions, truncation caps the vocabulary") {
    import spark.implicits._
    // user 1: a>b then (after gap) c ; user 2: a>b
    val rows = Seq((1L, 0L, 1L, "a"), (1L, 1000L, 2L, "b"),
      (1L, 10000000L, 3L, "c"), (2L, 0L, 4L, "a"), (2L, 500L, 5L, "b"))
      .toDF("u", "ms", "eid", "tp")
    val r = graft.operators.Sequences.sessionPaths(rows, "u", "ms", "eid", "tp",
      gapMs = 1800000L, maxLen = 8, topK = 10)
      .collect().map(x => x.getString(1) -> (x.getLong(0), x.getLong(2))).toMap
    assert(r("a>b") === ((1L, 2L)))   // rank 1, two sessions
    assert(r("c") === ((2L, 1L)))
    // truncation: 10 events, maxLen 3 -> path has 3 states
    val long = (1 to 10).map(i => (9L, i * 10L, i.toLong, s"e$i"))
      .toDF("u", "ms", "eid", "tp")
    val t = graft.operators.Sequences.sessionPaths(long, "u", "ms", "eid", "tp",
      gapMs = 1800000L, maxLen = 3, topK = 1).head()
    assert(t.getString(1) === "e1>e2>e3")
  }

  test("rolling burst finds the boundary-straddling peak a fixed bucket misses") {
    import spark.implicits._
    // 3 events in 50ms straddling the 60s boundary at ms=60000
    val rows = Seq((7L, 59980L), (7L, 59990L), (7L, 60020L),
      (7L, 200000L), (8L, 0L)).toDF("u", "ms")
    val r = graft.operators.Intervals.rollingBurst(rows, "u", "ms",
      windowMs = 60000L, topK = 10)
      .collect().map(x => x.getLong(1) -> x.getLong(3)).toMap
    assert(r(7L) === 3L)  // a per-minute bucket census would report 2
    assert(r(8L) === 1L)
  }

  test("stationary distribution converges to the chain's fixed point") {
    import spark.implicits._
    // deterministic 2-cycle a->b->a: stationary = (0.5, 0.5)
    val rows = (0 until 20).map(i =>
      (1L, i.toLong, i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("u", "ms", "eid", "tp")
    val r = graft.operators.Sequences.stationaryDistribution(
        rows, "u", Seq(col("ms"), col("eid")), "tp", iterations = 8)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.5) < 1e-6 && math.abs(r("b") - 0.5) < 1e-6)
    // biased chain: a stays a 3/4, b always jumps to a -> pi(a)=0.8
    val seq2 = "aaabaaabaaabaaabaaabaaabaaab".zipWithIndex.map {
      case (ch, i) => (2L, i.toLong, i.toLong, ch.toString) }
    val r2 = graft.operators.Sequences.stationaryDistribution(
        seq2.toDF("u", "ms", "eid", "tp"), "u", Seq(col("ms"), col("eid")),
        "tp", iterations = 20)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r2("a") - 0.75) < 0.02) // empirical MLE of this string
  }

  test("spearman: monotone nonlinear is 1, reversal -1, ties handled by mid-ranks") {
    import spark.implicits._
    // y = x^3 (monotone, nonlinear): Pearson < 1 but Spearman = 1
    val mono = (1L to 10L).map(x => ("m", x, x * x * x)).toDF("g", "x", "y")
    val r1 = graft.operators.Regression.spearman(mono, Seq("g"), "x", "y").head()
    assert(r1.getDouble(2) === 1.0)
    // strict reversal: -1
    val rev = (1L to 10L).map(x => ("r", x, 100L - x)).toDF("g", "x", "y")
    val r2 = graft.operators.Regression.spearman(rev, Seq("g"), "x", "y").head()
    assert(r2.getDouble(2) === -1.0)
    // textbook tie case cross-checked against the direct mid-rank Pearson
    val xs = Seq(1L, 2L, 2L, 3L)
    val ys = Seq(5L, 5L, 7L, 9L)
    def midRanks(v: Seq[Long]): Seq[Double] =
      v.map(x => (v.count(_ < x) + 1 + v.count(_ <= x)).toDouble / 2)
    val (rx, ry) = (midRanks(xs), midRanks(ys))
    val n = xs.size
    def s(a: Seq[Double]) = a.sum
    val num = n * rx.zip(ry).map { case (a, b) => a * b }.sum - s(rx) * s(ry)
    val den = math.sqrt(n * rx.map(a => a * a).sum - s(rx) * s(rx)) *
      math.sqrt(n * ry.map(b => b * b).sum - s(ry) * s(ry))
    val tied = xs.zip(ys).map { case (x, y) => ("t", x, y) }.toDF("g", "x", "y")
    val r3 = graft.operators.Regression.spearman(tied, Seq("g"), "x", "y").head()
    assert(math.abs(r3.getDouble(2) - num / den) < 1e-12)
    // constant side: null rho
    val const = (1L to 5L).map(x => ("c", x, 7L)).toDF("g", "x", "y")
    assert(graft.operators.Regression.spearman(const, Seq("g"), "x", "y")
      .head().isNullAt(2))
  }

  test("gumbel fit matches the direct method-of-moments computation") {
    import spark.implicits._
    val maxima = Seq(10L, 14L, 12L, 20L, 11L, 13L)
    val df = maxima.map(("k", _)).toDF("k", "x")
    val n = maxima.size
    val mean = maxima.sum.toDouble / n
    val varPop = (n.toLong * maxima.map(x => x * x).sum -
      maxima.sum * maxima.sum).toDouble / (n.toLong * n)
    val beta = math.sqrt(varPop) * math.sqrt(6.0) / math.Pi
    val mu = mean - graft.operators.Extremes.EulerGamma * beta
    val r = graft.operators.Extremes.gumbelFit(df, "k", "x", Seq(10)).head()
    assert(r.getDouble(2) === mean && r.getDouble(3) === beta)
    assert(r.getDouble(4) === mu)
    assert(r.getDouble(5) === mu - beta * math.log(-math.log(1.0 - 0.1)))
    // return level exceeds the mean: rare bursts sit above typical peaks
    assert(r.getDouble(5) > mean)
  }

  test("rfm: equal-frequency scores, recency inverted, ties atomic") {
    import spark.implicits._
    import java.sql.Date
    // 10 users, one event each on distinct days with distinct values:
    // most recent user gets r=5; highest spender gets m=5
    val rows = (1 to 10).map(i =>
      (i.toLong, Date.valueOf(f"2024-01-$i%02d"), i * 100L))
      .toDF("u", "d", "cents")
    val r = graft.operators.Cohorts.rfmScores(rows, "u", col("d"), "cents")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(10L).getLong(4) === 5L && r(1L).getLong(4) === 1L)  // recency
    assert(r(10L).getLong(6) === 5L && r(1L).getLong(6) === 1L)  // monetary
    // all frequencies tie at 1: the whole tie-run lands in ONE bucket
    assert(r.values.map(_.getLong(5)).toSet === Set(1L))
    assert(r(10L).getLong(7) === 515L)
  }

  test("binary segmentation locates a planted level shift exactly") {
    import spark.implicits._
    // 10 @ level 100, then 5 @ level 200: split after index 10
    val vals = Seq.fill(10)(100L) ++ Seq.fill(5)(200L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", f"d${i + 1}%02d", v) }
      .toDF("k", "day", "x")
    val r = graft.operators.ChangePoint.binarySegment(df, "k", "day", "x").head()
    assert(r.getString(2) === "d10" && r.getLong(3) === 10L)
    assert(r.getDouble(4) === 100.0 && r.getDouble(5) === 200.0)
    // a constant series has stat 0 everywhere: earliest split wins
    val flat = (1 to 6).map(i => ("f", f"d$i%02d", 50L)).toDF("k", "day", "x")
    val rf = graft.operators.ChangePoint.binarySegment(flat, "k", "day", "x").head()
    assert(rf.getString(2) === "d01" && rf.getDouble(6) === 0.0)
  }

  test("centroid separation: parallel labels cos 1, orthogonal 0, a < b pairs only") {
    import spark.implicits._
    val rows = Seq(
      (1, Seq(1.0f, 0.0f)), (1, Seq(3.0f, 0.0f)),
      (2, Seq(2.0f, 0.0f)),
      (3, Seq(0.0f, 5.0f))).toDF("label", "vec")
    val r = graft.operators.Similarity.centroidSeparation(rows, "label", "vec")
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(r.keySet === Set((1, 2), (1, 3), (2, 3)))
    assert(r((1, 2)) === 1.0 && r((1, 3)) === 0.0 && r((2, 3)) === 0.0)
  }

  test("theil-sen shrugs off the outlier that owns the OLS slope") {
    import spark.implicits._
    // clean slope 2 with one wild day
    val vals = Seq(2L, 4L, 6L, 8L, 500L, 12L, 14L, 16L, 18L, 20L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", f"d${i + 1}%02d", v) }
      .toDF("k", "day", "x")
    val r = graft.operators.Regression.theilSen(df, "k", "day", "x").head()
    assert(r.getDouble(3) === 2.0, s"slope ${r.getDouble(3)}")
    assert(r.getLong(2) === 45L)   // 10 choose 2 pairs
    assert(r.getDouble(4) === 0.0) // x_i = 2*i exactly off the outlier
  }

  test("seasonal decomposition: components reassemble and attribute the weekly shape") {
    import spark.implicits._
    // period-2 pattern over a constant trend: value alternates 10, 20
    val rows = (1 to 14).map(i =>
      ("k", f"d$i%02d", 1 + (i % 2), if (i % 2 == 0) 20L else 10L))
      .toDF("k", "day", "dw", "x")
    val r = graft.operators.Autocorr.seasonalDecompose(rows, "k", "day",
      col("dw"), "x").collect()
    // exact reassembly: trend + seasonal + resid == value
    r.foreach { x =>
      assert(math.abs(x.getDouble(3) + x.getDouble(4) + x.getDouble(5) -
        x.getLong(2).toDouble) < 1e-9, x.toString)
    }
    // the seasonal component carries the alternation with opposite
    // signs per phase
    val s1 = r.filter(x => x.getLong(2) == 10L).map(_.getDouble(4))
    val s2 = r.filter(x => x.getLong(2) == 20L).map(_.getDouble(4))
    assert(s1.forall(_ < 0) && s2.forall(_ > 0))
  }

  test("kalmanLevel: hand-stepped recursion, gain converges to the " +
      "steady state, constant series keeps its level, seed on n=1") {
    import spark.implicits._
    def run(rows: Seq[(String, String, Double)], q: Double, r: Double) =
      graft.operators.Forecast.kalmanLevel(
        rows.toDF("k", "d", "z"), "k", "d", "z", q, r, p0 = 1.0)
        .collect().map(x => x.getString(0) ->
          ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))))
        .toMap
    // hand-step q=0.05 r=1 p0=1, z = 10, 12:
    // P-=1.05, K=1.05/2.05, x = 10 + K*2, P = (1-K)*1.05
    val k1 = 1.05 / 2.05
    val h = run(Seq(("h", "d1", 10.0), ("h", "d2", 12.0)), 0.05, 1.0)("h")
    assert(h._1 == 2L && h._2 == 10.0 + k1 * 2.0 &&
      h._3 == (1.0 - k1) * 1.05 && h._4 == k1, h.toString)
    // 60 constant observations: level pinned at the constant, gain at
    // the steady state K* solving K = (P+q)/(P+q+r) with P = (1-K)(P+q)
    val const = (1 to 60).map(i => ("c", f"d$i%02d", 7.0))
    val c = run(const, 0.05, 1.0)("c")
    assert(math.abs(c._2 - 7.0) < 1e-12)
    val kStar = { // fixed point by iteration
      var p = 1.0
      (1 to 500).foreach(_ => p = (1.0 - (p + 0.05) / (p + 0.05 + 1.0)) *
        (p + 0.05))
      (p + 0.05) / (p + 0.05 + 1.0)
    }
    assert(math.abs(c._4 - kStar) < 1e-9, s"gain ${c._4} vs $kStar")
    // single observation: the seed state, gain 0
    val s = run(Seq(("s", "d1", 3.0)), 0.05, 1.0)("s")
    assert(s == ((1L, 3.0, 1.0, 0.0)))
    // higher measurement noise -> smaller gain (trusts the level more)
    assert(run(const, 0.05, 10.0)("c")._4 < c._4)
  }

  test("string-ordCol contract is executable: a numeric ordCol is " +
      "refused loudly by theilSen / binarySegment / seasonalDecompose") {
    import spark.implicits._
    // 11 periods: lexical order would put "10" before "2" and silently
    // bend every slope/split — the guard must fire at plan build
    val numeric = (1 to 11).map(i => ("k", i.toLong, i.toLong * 2))
      .toDF("k", "day", "x")
    def refused(f: => Any, who: String): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("compare AS STRINGS"),
        s"$who: ${e.getMessage}")
    }
    refused(graft.operators.Regression.theilSen(numeric, "k", "day", "x"),
      "theilSen")
    refused(graft.operators.ChangePoint.binarySegment(
      numeric, "k", "day", "x"), "binarySegment")
    refused(graft.operators.Autocorr.seasonalDecompose(
      numeric, "k", "day", col("x"), "x"), "seasonalDecompose")
    // the same data zero-padded is accepted (the documented fix)
    val padded = (1 to 11).map(i => ("k", f"d$i%02d", i.toLong * 2))
      .toDF("k", "day", "x")
    assert(graft.operators.Regression.theilSen(padded, "k", "day", "x")
      .count() == 1L)
  }

  test("basket lift: session-distinct counts, independence lands at lift 1") {
    import spark.implicits._
    // 4 sessions: {a,b}, {a,b}, {a}, {b} -> n_a=3, n_b=3, n_ab=2, N=4
    // lift = 2*4/(3*3) = 8/9; 'a' twice in one session counts once
    val rows = Seq(
      (1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 20L, 3L, "a"),
      (2L, 0L, 4L, "a"), (2L, 10L, 5L, "b"),
      (3L, 0L, 6L, "a"), (4L, 0L, 7L, "b")).toDF("u", "ms", "eid", "tp")
    val r = graft.operators.Sequences.basketLift(rows, "u", "ms", "eid", "tp",
      gapMs = 1800000L).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val ab = r(("a", "b"))
    assert(ab.getLong(2) === 3L && ab.getLong(3) === 3L && ab.getLong(4) === 2L)
    assert(ab.getDouble(5) === 0.5)             // support 2/4
    assert(math.abs(ab.getDouble(7) - 8.0 / 9.0) < 1e-15)
    assert(r(("b", "a")).getLong(4) === 2L)     // symmetric pair present
  }

  test("pareto coverage picks the exact minimal prefix per cut") {
    import spark.implicits._
    // weights 50, 30, 15, 5: 50% needs 1, 80% needs 2, 95% needs 3
    val rows = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L))
      .flatMap { case (u, w) => Seq.fill(w.toInt)((u, 1L)) }
      .toDF("u", "one")
    val r = graft.operators.WeightedStats.paretoCoverage(rows, "u", "one",
      Seq(("50", 1L, 2L), ("80", 4L, 5L), ("95", 19L, 20L))).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 100L)
    assert(r.getLong(2) === 1L && r.getLong(3) === 2L && r.getLong(4) === 3L)
  }

  test("ccf peaks at the planted lead and matches the direct definition") {
    import spark.implicits._
    // y follows x shifted by +2: r peaks at lag +2
    val xs = Seq(5L, 9L, 2L, 8L, 1L, 7L, 3L, 9L, 4L, 6L)
    val ys = Seq(0L, 0L) ++ xs.dropRight(2) // y_t = x_{t-2}
    val df = xs.zip(ys).zipWithIndex
      .map { case ((x, y), i) => (f"d$i%02d", x, y) }.toDF("o", "x", "y")
    val r = graft.operators.Autocorr.ccf(df, "o", "x", "y", maxLag = 3)
      .collect().map(x => x.getInt(0) -> x.getDouble(3)).toMap
    assert(r(2) === r.values.max)
    // direct check at lag 1
    val n = xs.size
    val (mx, my) = (xs.sum.toDouble / n, ys.sum.toDouble / n)
    val num = (0 until n - 1).map(i => (xs(i) - mx) * (ys(i + 1) - my)).sum
    val den = math.sqrt(xs.map(v => (v - mx) * (v - mx)).sum) *
      math.sqrt(ys.map(v => (v - my) * (v - my)).sum)
    assert(math.abs(r(1) - num / den) < 1e-12)
  }

  test("entropy rate: deterministic chain 0, uniform chain ln(k)") {
    import spark.implicits._
    // a->b->a->... deterministic: every conditional is certain
    val det = (0 until 20).map(i =>
      (1L, i.toLong, i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("u", "ms", "eid", "tp")
    val r0 = graft.operators.Sequences.entropyRate(det, "u",
      Seq(col("ms"), col("eid")), "tp", 8).head()
    assert(r0.getDouble(2) === 0.0)
    // two users, each alternating between both orders: transitions
    // a->a, a->b, b->a, b->b all equally likely -> H = ln 2
    val uni = Seq("aabb".*(5), "bbaa".*(5)).zipWithIndex.flatMap {
      case (s, u) => s.zipWithIndex.map { case (c, i) =>
        ((u + 1).toLong, i.toLong, i.toLong, c.toString) } }
      .toDF("u", "ms", "eid", "tp")
    val r1 = graft.operators.Sequences.entropyRate(uni, "u",
      Seq(col("ms"), col("eid")), "tp", 20).head()
    assert(math.abs(r1.getDouble(2) - math.log(2.0)) < 0.05)
  }

  test("heaps fit recovers a planted V = K*n^beta relationship") {
    import spark.implicits._
    // construct groups whose (n_tok, distinct) follow V = n^0.5 exactly:
    // (4,2), (16,4), (64,8) -> beta = 0.5, lnK = 0
    def doc(n: Int, v: Int): String =
      (0 until n).map(i => s"w${i % v}").mkString(" ")
    val df = Seq(("a", doc(4, 2)), ("b", doc(16, 4)), ("c", doc(64, 8)))
      .toDF("g", "text")
    val r = graft.operators.Profile.heapsFit(df, "g", "text").head()
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(2)) < 1e-12)
  }

  test("wilson bounds stay honest at p=0 where Wald collapses") {
    import spark.implicits._
    val df = ((1 to 20).map(_ => ("zero", 0)) ++
      (1 to 20).map(i => ("half", i % 2))).toDF("g", "y")
    val r = graft.operators.Eval.wilsonBounds(df, "g", "y")
      .collect().map(x => x.getString(0) -> x).toMap
    // p = 0: the Wilson lower bound is exactly 0, the upper is NOT
    // (center == halfwidth algebraically) — Wald would report [0, 0]
    assert(math.abs(r("zero").getDouble(4)) < 1e-15)
    assert(r("zero").getDouble(5) > 0.1)
    // p = 0.5, n = 20: interval brackets the rate symmetrically
    val h = r("half")
    assert(h.getDouble(4) < 0.5 && h.getDouble(5) > 0.5)
    assert(math.abs((0.5 - h.getDouble(4)) - (h.getDouble(5) - 0.5)) < 1e-12)
  }

  test("two-proportion z: zero for equal rates, matches the pooled formula") {
    import spark.implicits._
    val df = ((1 to 40).map(i => ("same", i % 2, i <= 20)) ++
      (1 to 30).map(i => ("diff", if (i <= 10) (if (i <= 5) 1 else 0) else 1, i <= 10)))
      .toDF("g", "y", "b")
    val r = graft.operators.Eval.twoProportionZ(df, "g", "y", col("b"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("same").getDouble(7) === 0.0)
    // diff: A side (b=false) 20 rows all y=1; B side 10 rows 5 pos
    val (na, pa, nb, pb) = (20.0, 1.0, 10.0, 0.5)
    val pp = (20.0 + 5.0) / 30.0
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    assert(math.abs(r("diff").getDouble(7) - z) < 1e-12)
  }

  test("distinctive terms: common terms never surface, rank order is integer") {
    import spark.implicits._
    // 'the' appears in all 4 docs (df cap 1/2 excludes it);
    // doc 1's top term is its tf-2 rare word
    val df = Seq(
      (1L, "the zebra zebra quark"),
      (2L, "the apple"),
      (3L, "the apple"),
      (4L, "the moon")).toDF("doc_id", "text")
    val r = Ranking.distinctiveTerms(df, "doc_id", "text",
      dfNum = 1L, dfDen = 2L, topK = 2).orderBy("doc_id", "rnk").collect()
    assert(!r.exists(_.getString(1) == "the"))
    val d1 = r.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getString(1)).toSeq === Seq("zebra", "quark"))
    assert(d1.head.getLong(2) === 2L) // tf of zebra
    // apple has df 2 = cap boundary (2*2 <= 4*1): included exactly
    assert(r.filter(_.getLong(0) == 2L).map(_.getString(1)).toSeq === Seq("apple"))
  }

  test("mase: perfect forecast 0, naive-equivalent 1, constant series " +
      "null, null rows counted") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, java.lang.Long, java.lang.Long)]) =
      Forecast.mase(rows.toDF("k", "o", "y", "f"), "k", "o", "y", "f")
        .collect().map(r => r.getAs[String]("k") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("n_skipped"),
            Option(r.getAs[java.lang.Double]("mase")).map(_.toDouble)))).toMap
    def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    // forecast == actual everywhere -> MASE = 0 exactly
    val perf = Seq(("p", 1L, L(10), L(10)), ("p", 2L, L(14), L(14)),
      ("p", 3L, L(11), L(11)))
    assert(run(perf)("p") == ((3L, 0L, Some(0.0))))
    // forecast = previous actual (the naive itself): |e| sums equal the
    // naive diffs except the first row has no error contribution issue:
    // y = (10, 14, 11), f = (10, 10, 14): num = 0+4+3 = 7,
    // den = 4+3 = 7 -> mase = 7*2/(7*3) = 2/3
    val naive = Seq(("n", 1L, L(10), L(10)), ("n", 2L, L(14), L(10)),
      ("n", 3L, L(11), L(14)))
    assert(run(naive)("n") == ((3L, 0L, Some(2.0 / 3))))
    // constant actuals -> naive denominator 0 -> null, loudly
    val const = Seq(("c", 1L, L(5), L(6)), ("c", 2L, L(5), L(6)))
    assert(run(const)("c") == ((2L, 0L, None)))
    // null forecast rows are excluded and counted
    val holey = perf ++ Seq(("p", 4L, L(9), null))
    assert(run(holey)("p") == ((3L, 1L, Some(0.0))))
  }

  test("dieboldMariano: hand statistic at h=1 and h=2 (Newey-West " +
      "lag term verified against the direct autocovariance compute)") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long, Long)], h: Int) =
      graft.operators.Forecast.dieboldMariano(
        rows.toDF("k", "o", "l1", "l2"), "k", "o", "l1", "l2", h)
        .collect().map(r => r.getString(0) -> r).toMap
    // d = l1-l2 = [1,1,1,-1]: S=2, C0 = 4*4 - 4 = 12,
    // DM = S*n/sqrt(n*C0) = 8/sqrt(48)
    val a = (1 to 4).map(t =>
      ("a", t.toLong, if (t < 4) 10L else 8L, 9L))
    val ra = run(a, 1)("a")
    assert(ra.getAs[Double]("mean_d") == 0.5)
    assert(math.abs(ra.getAs[Double]("dm") - 8.0 / math.sqrt(48.0)) < 1e-15)
    // equal losses: zero-variance differential -> dm null
    val z = (1 to 4).map(t => ("z", t.toLong, 5L, 5L))
    assert(run(z, 1)("z").isNullAt(run(z, 1)("z").fieldIndex("dm")))
    // h=2 with d=[1,2,3,4]: c0-hat = 1.25, c1-hat = 0.3125 (direct),
    // sigma2 = 1.25 + 2*0.5*0.3125 = 1.5625; DM = 2.5/sqrt(1.5625/4) = 4
    val b = (1 to 4).map(t => ("b", t.toLong, t.toLong, 0L))
    val rb = run(b, 2)("b")
    assert(rb.getAs[Double]("mean_d") == 2.5)
    assert(math.abs(rb.getAs[Double]("dm") - 4.0) < 1e-12, rb.toString)
    // n <= h: not enough pairs for the lag window -> null
    val tiny = (1 to 2).map(t => ("t", t.toLong, t.toLong, 0L))
    assert(run(tiny, 2)("t").isNullAt(run(tiny, 2)("t").fieldIndex("dm")))
  }

  test("rmst: hand rectangle areas with censoring — tau clips segments, " +
      "the tail carries the final survival, instant-death cohort = 1") {
    import spark.implicits._
    def run(rows: Seq[(Long, Int)], tau: Long) =
      graft.operators.Survival.rmst(rows.toDF("dur", "ev"), "dur", "ev",
        tau).head()
    // durations: 2 (event), 5 (censored): S(2)=0.5, S(5)=0.5
    val cohort = Seq((2L, 1), (5L, 0))
    // tau=4: 1*2 + 0.5*2 + 0.5*0 = 3
    val r4 = run(cohort, 4L)
    assert(r4.getAs[Long]("tau") == 4L &&
      r4.getAs[Long]("n_durations") == 2L)
    assert(r4.getAs[Double]("rmst") == 3.0)
    // tau=10: 1*2 + 0.5*3 + 0.5*5 = 6
    assert(run(cohort, 10L).getAs[Double]("rmst") == 6.0)
    // everyone dies at d=1: area 1*1, tail 0 -> RMST = 1 at any tau > 1
    val insta = Seq((1L, 1), (1L, 1), (1L, 1))
    assert(run(insta, 5L).getAs[Double]("rmst") == 1.0)
  }

  // local reference in the operator's exact n-scaled framing
  private def kpssRef(xs: Seq[Long], lags: Int = 4): Double = {
    val n = xs.length
    val s = xs.sum
    val d = xs.map(x => n.toLong * x - s)
    val cum = d.scanLeft(0L)(_ + _).tail
    val cumd2 = cum.map(c => c.toDouble * c).sum
    val g = (0 to lags).map(j =>
      d.drop(j).zip(d.dropRight(j)).map { case (a, b) => a.toDouble * b }.sum)
    val lrv = g(0) + 2.0 *
      (1 to lags).map(j => (1.0 - j.toDouble / (lags + 1)) * g(j)).sum
    cumd2 / (n * lrv)
  }

  test("kpssLevel: matches the local reference; a drifting random walk " +
      "scores far above an oscillating level") {
    import spark.implicits._
    def run(xs: Seq[Long]) = {
      val rows = xs.zipWithIndex.map { case (x, i) => ("k", f"$i%03d", x) }
      graft.operators.Autocorr.kpssLevel(rows.toDF("k", "o", "x"),
        "k", "o", "x").head()
    }
    val osc = Seq(10L, 12, 9, 11, 10, 13, 9, 12, 10, 11, 12, 9,
      10, 13, 11, 9, 12, 10, 11, 10)
    val rOsc = run(osc)
    assert(rOsc.getAs[Long]("n_obs") == 20)
    val ref = kpssRef(osc)
    val got = rOsc.getAs[Double]("kpss")
    assert(math.abs(got - ref) < 1e-9 * math.max(1.0, ref),
      s"kpss=$got ref=$ref")
    // random walk: cumulative sums of the same increments drift
    val walk = osc.scanLeft(100L)(_ + _ - 10).tail
    val rWalk = run(walk).getAs[Double]("kpss")
    assert(rWalk > 3 * got, s"walk=$rWalk osc=$got")
    // series shorter than lags+1 -> null
    val tiny = run(Seq(1L, 2L, 3L))
    assert(tiny.isNullAt(tiny.fieldIndex("kpss")))
  }

  test("permutationEntropy: monotone = one pattern (h 0), alternation " +
      "= two equal patterns (h ln 2), tie codes pinned to earlier index") {
    import spark.implicits._
    def run(xs: Seq[Long]) = {
      val rows = xs.zipWithIndex.map { case (x, i) => ("k", f"$i%03d", x) }
      graft.operators.Autocorr.permutationEntropy(
        rows.toDF("k", "o", "x"), "k", "o", "x").head()
    }
    val mono = run(Seq(1L, 2, 3, 4, 5, 6))
    assert(mono.getAs[Long]("n_windows") == 4 &&
      mono.getAs[Long]("n_patterns") == 1)
    assert(math.abs(mono.getAs[Double]("h")) == 0.0)
    val alt = run(Seq(1L, 2, 1, 2, 1, 2, 1, 2, 1, 2))
    assert(alt.getAs[Long]("n_patterns") == 2)
    assert(math.abs(alt.getAs[Double]("h") - math.log(2)) < 1e-12)
    assert(math.abs(alt.getAs[Double]("h_norm") -
      math.log(2) / math.log(6)) < 1e-12)
    // all-constant: ties rank by index -> the single 012 pattern
    val const = run(Seq(5L, 5, 5, 5, 5))
    assert(const.getAs[Long]("n_patterns") == 1)
  }

  test("grangerLag1: x's lag driving y yields a large F with the right " +
      "beta; a constant x-series nulls out (singular design)") {
    import spark.implicits._
    def run(rows: Seq[(String, String, Long, Long)]) =
      graft.operators.Autocorr.grangerLag1(
        rows.toDF("k", "o", "y", "x"), "k", "o", "y", "x").head()
    // y_t = 2·x_{t−1} + small residual the restricted model can't see
    val xs = Seq(5L, 9, 3, 8, 2, 7, 4, 9, 1, 6, 8, 3, 7, 5, 9, 2)
    val noise = Seq(1L, 0, -1, 1, 0, -1, 1, 0, -1, 1, 0, -1, 1, 0, -1, 1)
    val ys = xs.indices.map(t =>
      if (t == 0) 10L else 2 * xs(t - 1) + noise(t))
    val rows = xs.indices.map(t => ("k", f"$t%03d", ys(t), xs(t)))
    val r = run(rows)
    assert(r.getAs[Long]("n") == 15)
    val f = r.getAs[Double]("f")
    assert(f > 20.0, s"f=$f")
    assert(math.abs(r.getAs[Double]("beta_x") - 2.0) < 0.2)
    // constant x: cbb = 0 -> singular full design -> nulls
    val const = xs.indices.map(t => ("k", f"$t%03d", ys(t), 7L))
    val rc = run(const)
    assert(rc.isNullAt(rc.fieldIndex("f")))
  }

  test("turningPoints: alternation turns at every interior point, " +
      "monotone never, plateaus pinned as non-turns") {
    import spark.implicits._
    def run(xs: Seq[Long]) = {
      val rows = xs.zipWithIndex.map { case (x, i) => ("k", f"$i%03d", x) }
      graft.operators.Autocorr.turningPoints(rows.toDF("k", "o", "x"),
        "k", "o", "x").head()
    }
    val alt = run(Seq(1L, 5, 1, 5, 1, 5, 1, 5, 1, 5))
    assert(alt.getAs[Long]("t_turns") == 8) // every interior point
    assert(alt.getAs[Double]("e_t") == 2.0 * 8 / 3.0)
    assert(alt.getAs[Double]("z") > 2.0) // (8 - 16/3)/1.2066 = 2.21
    val mono = run(Seq(1L, 2, 3, 4, 5, 6, 7, 8, 9, 10))
    assert(mono.getAs[Long]("t_turns") == 0 &&
      mono.getAs[Double]("z") < -3.0)
    // plateau: 1,5,5,1 — no STRICT extremum anywhere
    val plat = run(Seq(1L, 5, 5, 1))
    assert(plat.getAs[Long]("t_turns") == 0)
    // n = 2: no interior point, null z
    val tiny = run(Seq(1L, 2))
    assert(tiny.isNullAt(tiny.fieldIndex("z")))
  }

  test("cumulativeIncidence: hand Aalen-Johansen walk; CIF1 + CIF2 + S " +
      "= 1 at every duration; a third cause raises loudly") {
    import spark.implicits._
    // durations: t=1 cause1, t=2 cause2, t=3 censored, t=4 cause1
    val rows = Seq((1L, 1L), (2L, 2L), (3L, 0L), (4L, 1L))
    val out = graft.operators.Survival.cumulativeIncidence(
        rows.toDF("dur", "cause"), "dur", "cause")
      .collect().map(r => r.getAs[Long]("duration") -> r).toMap
    // t=1: n=4, d1=1: cif1 = 1/4, S = 3/4
    assert(out(1L).getAs[Double]("cif_1") == 0.25 &&
      out(1L).getAs[Double]("survival") == 0.75)
    // t=2: n=3, d2=1: cif2 = (3/4)(1/3) = 1/4, S = 3/4 * 2/3 = 1/2
    assert(out(2L).getAs[Double]("cif_2") == 0.25 &&
      out(2L).getAs[Double]("survival") == 0.5)
    // t=3: censored only — CIFs unchanged, S unchanged (d_any = 0)
    assert(out(3L).getAs[Double]("cif_1") == 0.25 &&
      out(3L).getAs[Double]("survival") == 0.5)
    // t=4: n=1, d1=1: cif1 = 1/4 + 1/2 = 3/4, S = 0
    assert(out(4L).getAs[Double]("cif_1") == 0.75 &&
      out(4L).getAs[Double]("survival") == 0.0)
    // identity at every row
    out.values.foreach { r =>
      val s = r.getAs[Double]("cif_1") + r.getAs[Double]("cif_2") +
        r.getAs[Double]("survival")
      assert(math.abs(s - 1.0) < 1e-12, r.toString)
    }
    // a cause code outside {0,1,2} is loud, never silent censoring
    val bad = Seq((1L, 3L)).toDF("dur", "cause")
    val err = intercept[Exception] {
      graft.operators.Survival.cumulativeIncidence(bad, "dur", "cause")
        .collect()
    }
    assert(err.getMessage.contains("cumulativeIncidence"),
      err.getMessage)
  }

  test("herfindahl: monopoly = 1, even split = 1/k with norm 0, " +
      "zero-mass units drop loudly") {
    import spark.implicits._
    def run(rows: Seq[(String, String, Long)]) =
      graft.operators.WeightedStats.herfindahl(
        rows.toDF("sc", "u", "m"), "sc", "u", "m")
        .collect().map(r => r.getAs[String]("sc") -> r).toMap
    val out = run(Seq(
      ("mono", "a", 10L), ("mono", "a", 5L),             // one unit
      ("even", "a", 5L), ("even", "b", 5L),
      ("even", "c", 5L), ("even", "d", 5L),              // 4 equal
      ("skew", "a", 9L), ("skew", "b", 1L),
      ("skew", "z", 0L)))                                // zero unit
    assert(out("mono").getAs[Double]("hhi") == 1.0 &&
      out("mono").isNullAt(out("mono").fieldIndex("hhi_norm")))
    assert(out("even").getAs[Double]("hhi") == 0.25 &&
      out("even").getAs[Double]("hhi_norm") == 0.0)
    // skew: (81 + 1)/100 = 0.82; norm = (0.82 - 0.5)/0.5 = 0.64
    val sk = out("skew")
    assert(sk.getAs[Long]("k_units") == 2 &&
      sk.getAs[Long]("k_dropped") == 1)
    assert(sk.getAs[Double]("hhi") == 0.82)
    assert(math.abs(sk.getAs[Double]("hhi_norm") - 0.64) < 1e-12)
  }

  /** Independent dense-OLS reference for the ADF regression: solves the
    * 3x3 normal equations on RAW (1, a, b) regressors by Gaussian
    * elimination — a different algebra path than the operator's
    * centered-Cramer shapes, so agreement is a real check. */
  private def adfRef(ys: Seq[Long]): (Double, Double, Double) = {
    val rows = (2 until ys.length).map { t =>
      (1.0, ys(t - 1).toDouble, (ys(t - 1) - ys(t - 2)).toDouble,
        (ys(t) - ys(t - 1)).toDouble)
    }
    val m = rows.length
    // X'X (3x3) and X'z
    val xtx = Array.ofDim[Double](3, 4)
    def x(r: (Double, Double, Double, Double), i: Int) =
      i match { case 0 => r._1; case 1 => r._2; case _ => r._3 }
    for (i <- 0 until 3; j <- 0 until 3)
      xtx(i)(j) = rows.map(r => x(r, i) * x(r, j)).sum
    for (i <- 0 until 3) xtx(i)(3) = rows.map(r => x(r, i) * r._4).sum
    // Gaussian elimination with the inverse's (1,1) entry via adjugate
    val a = xtx.map(_.clone())
    for (p <- 0 until 3; r <- p + 1 until 3) {
      val f = a(r)(p) / a(p)(p)
      for (c <- p until 4) a(r)(c) -= f * a(p)(c)
    }
    val coef = new Array[Double](3)
    for (r <- 2 to 0 by -1)
      coef(r) = (a(r)(3) - (r + 1 until 3).map(c => a(r)(c) * coef(c)).sum) / a(r)(r)
    val rss = rows.map { r =>
      val e = r._4 - coef(0) - coef(1) * r._2 - coef(2) * r._3; e * e }.sum
    val sig2 = rss / (m - 3)
    // [X'X^-1]_bb via cofactor: inv(1,1) = (A00*A22 - A02*A20)/det
    def det3(mm: Array[Array[Double]]): Double =
      mm(0)(0) * (mm(1)(1) * mm(2)(2) - mm(1)(2) * mm(2)(1)) -
        mm(0)(1) * (mm(1)(0) * mm(2)(2) - mm(1)(2) * mm(2)(0)) +
        mm(0)(2) * (mm(1)(0) * mm(2)(1) - mm(1)(1) * mm(2)(0))
    val full = Array.tabulate(3, 3)((i, j) => xtx(i)(j))
    val det = det3(full)
    val cof11 = full(0)(0) * full(2)(2) - full(0)(2) * full(2)(0)
    val varB = sig2 * cof11 / det
    (coef(1), coef(2), coef(1) / math.sqrt(varB))
  }

  test("adfTest: centered-Cramer shapes agree with an independent " +
      "dense-OLS solve; mean-reversion rejects harder than a walk") {
    import spark.implicits._
    // mean-reverting: strong pull to 50; "walk": deterministic cumsum
    // of a pseudo-random +-step (md5-free: i*i mod 7 - 3)
    val revert = (0 until 40).map(i => 50L + (if (i % 2 == 0) 7L else -7L) +
      (i % 3) - 1L)
    val walk = (0 until 40).scanLeft(100L)((acc, i) =>
      acc + ((i * i) % 7) - 3L).drop(1)
    def run(xs: Seq[Long], k: String) =
      graft.operators.Autocorr.adfTest(
        xs.zipWithIndex.map { case (x, i) => (k, f"d${i + 1}%02d", x) }
          .toDF("k", "o", "x"), "k", "o", "x").collect()
        .map(r => r.getString(0) -> r).head._2
    for ((k, xs) <- Seq("r" -> revert, "w" -> walk)) {
      val r = run(xs, k)
      val (b, p, t) = adfRef(xs)
      assert(math.abs(r.getAs[Double]("beta") - b) < 1e-9 * math.abs(b),
        s"$k beta ${r.getAs[Double]("beta")} vs $b")
      assert(math.abs(r.getAs[Double]("phi") - p) < 1e-8 + 1e-9 * math.abs(p))
      assert(math.abs(r.getAs[Double]("t_adf") - t) < 1e-9 * math.abs(t))
    }
    assert(run(revert, "r").getAs[Double]("t_adf") < -4.0) // strong reject
    assert(run(walk, "w").getAs[Double]("t_adf") >
      run(revert, "r").getAs[Double]("t_adf"))
    // degenerate: too short -> null
    val short = run(Seq(1L, 2L, 3L, 4L, 5L, 6L), "s")
    assert(short.getAs[Long]("n") == 4L)
    assert(short.isNullAt(short.fieldIndex("t_adf")))
  }
}
