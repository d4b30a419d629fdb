package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WeightedStats

class WeightedStatsSpec extends AnyFunSuite with SparkFixture {

  test("weightedMedian crosses at half the mass, not half the rows") {
    import spark.implicits._
    // values 1..4 with weights 1,1,1,7: half of 10 is reached at value 4
    // (plain median of the rows would be 2.5)
    val df = Seq(("g", 1.0, 1L, 1L), ("g", 2.0, 1L, 2L),
      ("g", 3.0, 1L, 3L), ("g", 4.0, 7L, 4L)).toDF("k", "v", "w", "id")
    val r = WeightedStats.weightedMedian(df, "k", "v", "w", Seq("id")).collect().head
    assert(r.getDouble(1) == 4.0 && r.getLong(2) == 10L)

    // equal weights degenerate to the lower median of the values
    val eq = Seq(("g", 1.0, 1L, 1L), ("g", 2.0, 1L, 2L), ("g", 3.0, 1L, 3L),
      ("g", 9.0, 1L, 4L)).toDF("k", "v", "w", "id")
    val m = WeightedStats.weightedMedian(eq, "k", "v", "w", Seq("id")).collect().head
    assert(m.getDouble(1) == 2.0)

    // partition-stability: integral weights keep the crossing exact
    val big = (1L to 1000L).map(i => ("g", (i % 37).toDouble, 1L + i % 5, i))
      .toDF("k", "v", "w", "id")
    val a = WeightedStats.weightedMedian(big, "k", "v", "w", Seq("id")).collect().head
    val b = WeightedStats.weightedMedian(big.repartition(11), "k", "v", "w", Seq("id"))
      .collect().head
    assert(a.getDouble(1) == b.getDouble(1) && a.getLong(2) == b.getLong(2))
  }

  test("madOutliers: fence flags the planted spike, resists contamination") {
    import spark.implicits._
    // 9 values near 10 plus one spike: mean/stddev fencing would let the
    // spike drag the threshold; MAD must not
    val rows = (1 to 9).map(i => ("g", 10.0 + (i % 3) * 0.5, i.toLong)) :+
      (("g", 500.0, 10L))
    val df = rows.toDF("k", "v", "id")
    val r = graft.operators.Robust.madOutliers(df, "k", "v", Seq("id")).collect().head
    // sorted values: 10,10,10,10.5,10.5,10.5,11,11,11,500 -> lower median 10.5
    assert(r.getAs[Double]("median") == 10.5)
    // devs: 0.5,0.5,0.5,0,0,0,0.5,0.5,0.5,489.5 -> lower median 0.5
    assert(r.getAs[Double]("mad") == 0.5)
    assert(r.getAs[Long]("n_outliers") == 1L, "only the spike crosses the fence")

    // zero-MAD group (over half the rows identical): every deviating row
    // is an outlier — the convention a constant-column group needs
    val const = (Seq.fill(5)(("c", 7.0)) ++ Seq(("c", 7.1), ("c", 6.9)))
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "id")
    val c = graft.operators.Robust.madOutliers(const, "k", "v", Seq("id")).collect().head
    assert(c.getAs[Double]("mad") == 0.0 && c.getAs[Long]("n_outliers") == 2L)
  }

  test("madOutliers census form == row-grain reference (r13 rewrite)") {
    import spark.implicits._
    // duplicate-heavy, multi-group fixture: value runs exercise the
    // census multiplicity collapse, and values symmetric around the
    // median make distinct values COLLIDE after abs() — the re-aggregate
    // seam of the census rewrite
    val rows = Seq.tabulate(200) { i =>
      (s"g${i % 3}", ((i * 7) % 13 - 6).toDouble, i.toLong)
    }
    val df = rows.toDF("k", "v", "id")
    val got = graft.operators.Robust.madOutliers(df, "k", "v", Seq("id"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    // row-grain reference: per group, sort, lower median by crossing,
    // dev census, lower median of devs, fence count
    def lowerMedian(vs: Seq[Double]): Double = {
      val s = vs.sorted; s((s.size + 1) / 2 - 1)
    }
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val vs = rs.map(_._2)
      val med = lowerMedian(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = lowerMedian(devs)
      val fence = 3.0 * 1.4826 * mad
      val nOut = devs.count(_ > fence).toLong
      val (n, m, md, no) = got(g)
      assert(n == vs.size.toLong && m == med && md == mad && no == nOut,
        s"group $g: got ${got(g)}, want (${vs.size}, $med, $mad, $nOut)")
    }
  }

  test("winsorizedCensus: exact discrete bounds, clip counts, clipped mean") {
    import spark.implicits._
    // group a: 1..20 -> P10 = ceil(0.10*20)=2nd = 2, P90 = 18th = 18
    // group b: constant -> bounds equal the value, nothing clips
    val rows = (1 to 20).map(v => ("a", v.toLong)) ++ Seq.fill(5)(("b", 9L))
    val out = graft.operators.Robust
      .winsorizedCensus(rows.toDF("k", "v"), "k", "v", pLoNum = 10, pHiNum = 90)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("p_lo") == 2L && a.getAs[Long]("p_hi") == 18L)
    assert(a.getAs[Long]("n_clip_lo") == 1L && a.getAs[Long]("n_clip_hi") == 2L)
    // clipped sum: 2 + (2..18 as-is) + 18 + 18 = 2 + 170 + 36 = 208
    assert(a.getAs[Long]("clip_sum") == (2 + (2 to 18).sum + 18 + 18))
    assert(a.getAs[Double]("clip_mean") == a.getAs[Long]("clip_sum").toDouble / 20)
    val b = out("b")
    assert(b.getAs[Long]("p_lo") == 9L && b.getAs[Long]("p_hi") == 9L)
    assert(b.getAs[Long]("n_clip_lo") == 0L && b.getAs[Long]("n_clip_hi") == 0L)
    assert(b.getAs[Long]("clip_sum") == 45L)
  }

  test("winsorizedCensus: duplicate-heavy ranks follow ceil(p*n) over the census") {
    import spark.implicits._
    // 10x value 1, 80x value 5, 10x value 9: P05 rank = ceil(5) = 5 -> 1;
    // P95 rank = 95 -> 9 (cum: 1->10, 5->90, 9->100)
    val rows = Seq.fill(10)(1L) ++ Seq.fill(80)(5L) ++ Seq.fill(10)(9L)
    val out = graft.operators.Robust
      .winsorizedCensus(rows.map(("g", _)).toDF("k", "v"), "k", "v", 5, 95)
      .collect().head
    assert(out.getAs[Long]("p_lo") == 1L && out.getAs[Long]("p_hi") == 9L)
    assert(out.getAs[Long]("n_clip_lo") == 0L && out.getAs[Long]("n_clip_hi") == 0L)
  }

  test("theilBetween: proportional is 0, concentration is ln share ratio") {
    import spark.implicits._
    // two groups, mass share == population share -> T = 0 exactly
    val prop = Seq(("a", 10L), ("a", 10L), ("b", 10L), ("b", 10L))
      .toDF("g", "v")
    val rp = WeightedStats.theilBetween(prop, "g", "v").collect().head
    assert(rp.getAs[Double]("theil_between") == 0.0)
    assert(rp.getAs[Long]("total") == 40L && rp.getAs[Long]("k") == 2)

    // all mass in one of two equal-population groups: s={1,0} is out of
    // the log domain for the empty side, so give b one epsilon-free row:
    // a has 99 of 100 mass across half the rows ->
    // T = 0.99*ln(1.98) + 0.01*ln(0.02)
    val conc = Seq(("a", 99L), ("b", 1L)).toDF("g", "v")
    val rc = WeightedStats.theilBetween(conc, "g", "v").collect().head
    val exp = 0.0 + (99.0 / 100.0) * math.log((99.0 * 2.0) / 100.0) +
      (1.0 / 100.0) * math.log((1.0 * 2.0) / 100.0)
    assert(rc.getAs[Double]("theil_between") == exp, "pinned fold replays")

    // non-positive rows are excluded from the census, loudly documented
    val withZero = Seq(("a", 5L), ("a", 0L), ("b", 5L), ("b", -3L))
      .toDF("g", "v")
    val rz = WeightedStats.theilBetween(withZero, "g", "v").collect().head
    assert(rz.getAs[Long]("n") == 2 && rz.getAs[Double]("theil_between") == 0.0)
  }

  test("brownForsythe: hand-computed F, equal spread 0, degenerate nulls") {
    import spark.implicits._
    import graft.operators.Robust
    // a={1,2,9}: med 2, z=|2x-4|={2,0,14}, S=16 Q=200
    // b={4,5,6}: med 5, z={2,0,2}, S=4 Q=8
    val df = Seq(("s", "a", 1L), ("s", "a", 2L), ("s", "a", 9L),
      ("s", "b", 4L), ("s", "b", 5L), ("s", "b", 6L)).toDF("sc", "g", "v")
    val r = Robust.brownForsythe(df, "sc", "g", "v").collect().head
    val sterm = 0.0 + 256.0 / 3.0 + 16.0 / 3.0
    val expF = (4.0 * (sterm - 400.0 / 6.0)) / (1.0 * (208.0 - sterm))
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Double]("f") == expF, "bit-identical pinned-shape F")

    // identical spreads, shifted locations -> between = 0 -> F = 0
    val eq = Seq(("s", "a", 1L), ("s", "a", 2L), ("s", "a", 3L),
      ("s", "b", 11L), ("s", "b", 12L), ("s", "b", 13L)).toDF("sc", "g", "v")
    assert(Robust.brownForsythe(eq, "sc", "g", "v").collect().head
      .getAs[Double]("f") == 0.0)

    // single group -> null; all-constant groups -> within 0 -> null
    val one = Seq(("s", "a", 1L), ("s", "a", 5L)).toDF("sc", "g", "v")
    assert(Robust.brownForsythe(one, "sc", "g", "v").collect().head.isNullAt(3))
    val const = Seq(("s", "a", 3L), ("s", "a", 3L),
      ("s", "b", 7L), ("s", "b", 7L)).toDF("sc", "g", "v")
    assert(Robust.brownForsythe(const, "sc", "g", "v").collect().head.isNullAt(3))
  }

  test("brownForsythe: even-n doubled median, partition-invariant") {
    import spark.implicits._
    import graft.operators.Robust
    // even n: a={1,2,3,10} -> med2 = 2+3 = 5, z={3,1,1,15}: exact, no
    // float midpoint (two-point groups would have within = 0 trivially)
    val even = Seq(("s", "a", 1L), ("s", "a", 2L), ("s", "a", 3L),
      ("s", "a", 10L), ("s", "b", 1L), ("s", "b", 2L), ("s", "b", 3L),
      ("s", "b", 4L)).toDF("sc", "g", "v")
    val r = Robust.brownForsythe(even, "sc", "g", "v").collect().head
    assert(!r.isNullAt(3), "even-sized groups still produce F")

    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map(i =>
      ("s" + (i % 2), "g" + rnd.nextInt(4), rnd.nextInt(500).toLong))
    val df = rows.toDF("sc", "g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Robust.brownForsythe(d, "sc", "g", "v")
        .collect().map(r => (r.getString(0), r.getDouble(3)))
        .sortBy(_._1).toSeq
    assert(run(df.repartition(1)) ==
      run(df.repartition(32, org.apache.spark.sql.functions.col("v"))))
  }

  test("trimmedMean: rank-interval overlaps trim exactly; outliers " +
      "vanish at 10%; over-trim goes loudly null") {
    import spark.implicits._
    import graft.operators.Robust
    // 1..10 with 10% trim: t=1 -> drop {1} and {10}, mean of 2..9 = 5.5
    val base = (1L to 10L).map(("g", _)).toDF("g", "v")
    val r = Robust.trimmedMean(base, "g", "v", 10L, 100L).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_trimmed") == 2L)
    assert(r.getAs[Double]("trimmed_mean") === 5.5)
    // a massive outlier does not move the trimmed mean (it IS the trim)
    val dirty = ((1L to 9L).map(("d", _)) :+ (("d", 1000000L))).toDF("g", "v")
    val rd = Robust.trimmedMean(dirty, "g", "v", 10L, 100L).head()
    assert(rd.getAs[Double]("trimmed_mean") === 5.5)
    // ties spanning the trim boundary split by multiplicity overlap:
    // {1,1,1,9}: t=1 drops one 1 and the 9 -> mean of {1,1} = 1
    val ties = Seq(1L, 1L, 1L, 9L).map(("t", _)).toDF("g", "v")
    assert(Robust.trimmedMean(ties, "g", "v", 25L, 100L).head()
      .getAs[Double]("trimmed_mean") === 1.0)
    // alpha < 1/2 guarantees t < n/2, so something ALWAYS survives:
    // a singleton at the maximum trim is its own trimmed mean
    val rz = Robust.trimmedMean(
      Seq(("z", 5L)).toDF("g", "v"), "g", "v", 49L, 100L).head()
    assert(rz.getAs[Double]("trimmed_mean") === 5.0) // t=0 at n=1
  }

  test("grubbs: hand statistic on a planted outlier, smallest-id tie " +
      "pin, degenerate nulls") {
    import spark.implicits._
    val rows = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 100L))
      .map { case (id, v) => ("g", id, v) }
    val r = graft.operators.Robust.grubbs(rows.toDF("g", "id", "v"), "g", "id", "v")
      .head()
    assert(r.getAs[Long]("outlier_id") == 5 &&
      r.getAs[Long]("outlier_value") == 100)
    // mean 22, var = 7610/4 = 1902.5, G = 78/sqrt(1902.5)
    assert(r.getAs[Double]("mean") == 22.0)
    val refG = 78.0 / math.sqrt(1902.5)
    assert(math.abs(r.getAs[Double]("g_stat") - refG) < 1e-12,
      s"g=${r.getAs[Double]("g_stat")} ref=$refG")
    // symmetric extremes tie on |dev|: the smaller id wins
    val sym = Seq((7L, -10L), (3L, 10L), (9L, 0L))
      .map { case (id, v) => ("g", id, v) }
    val rs = graft.operators.Robust.grubbs(sym.toDF("g", "id", "v"), "g", "id", "v")
      .head()
    assert(rs.getAs[Long]("outlier_id") == 3)
    // constant group: sd = 0 -> null statistic, outlier row still named
    val const = Seq(("g", 1L, 5L), ("g", 2L, 5L)).toDF("g", "id", "v")
    val rc = graft.operators.Robust.grubbs(const, "g", "id", "v").head()
    assert(rc.isNullAt(rc.fieldIndex("g_stat")) &&
      rc.getAs[Double]("sd") == 0.0)
  }
}
