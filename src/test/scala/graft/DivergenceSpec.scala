package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Divergence

/** KL drift-monitor semantics: non-negativity (Gibbs), near-zero for
  * corpus-like groups, and drift ranking. */
class DivergenceSpec extends AnyFunSuite with SparkFixture {

  test("KL is non-negative everywhere and spikes on the drifted group") {
    import spark.implicits._
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val rows =
      (1 to 30).map(i => (s"steady_a", common)) ++
      (1 to 30).map(i => (s"steady_b", common)) ++
      (1 to 30).map(i => (s"drifted", "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"))
    val out = Divergence.sourceDivergence(rows.toDF("src", "text"), "src", "text")
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Double]("kl"), r.getAs[Double]("kl_rev")))).toMap
    out.values.foreach { case (kl, klr) =>
      assert(kl >= 0 && klr >= 0, out.toString)
    }
    // the steady groups also diverge from the corpus (the corpus is
    // 2/3 common + 1/3 junk mass), so assert ranking, not near-zero
    assert(out("drifted")._1 > out("steady_a")._1 * 2, out.toString)
    assert(out("drifted")._1 > out("steady_b")._1 * 2)
    // two identically-distributed groups diverge (almost) identically
    assert(math.abs(out("steady_a")._1 - out("steady_b")._1) < 1e-9)
  }

  test("n_tok is the group token total") {
    import spark.implicits._
    val out = Divergence.sourceDivergence(
      Seq(("a", "one two three"), ("a", "four five"), ("b", "six")).toDF("src", "text"),
      "src", "text")
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_tok")).toMap
    assert(out == Map("a" -> 5L, "b" -> 1L))
  }

  test("cramersV: bijection scores 1, independence 0, single-column null") {
    import spark.implicits._
    def v(rows: Seq[(String, String)]): org.apache.spark.sql.Row =
      Divergence.cramersV(rows.toDF("a", "b"), "a", "b").collect().head
    // a determines b bijectively -> V = 1 exactly
    val bij = Seq.fill(10)(("x", "1")) ++ Seq.fill(10)(("y", "2"))
    val rb = v(bij)
    assert(rb.getAs[Double]("chi2") == 20.0 && rb.getAs[Double]("v") == 1.0)
    // uniform 2x2 grid -> chi2 = 0, V = 0 (clamped, not NaN)
    val ind = for { a <- Seq("x", "y"); b <- Seq("1", "2"); _ <- 1 to 5 }
      yield (a, b)
    val ri = v(ind)
    assert(math.abs(ri.getAs[Double]("chi2")) < 1e-9)
    assert(ri.getAs[Double]("v") == 0.0 || ri.getAs[Double]("v") < 1e-9)
    // one-category side -> null V, loudly
    assert(v(Seq(("x", "1"), ("x", "2"), ("x", "2"))).isNullAt(4))
  }

  test("wasserstein1: pure shift distance, zero on identical, null on empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // B = A + 5 exactly -> W1 = 5
    val shift = Seq((0L, false), (10L, false), (5L, true), (15L, true))
      .toDF("v", "r")
    val rs = Divergence.wasserstein1(shift, "v", col("r")).collect().head
    assert(rs.getAs[Double]("w1") == 5.0)
    // identical samples -> 0
    val same = Seq((1L, false), (9L, false), (1L, true), (9L, true)).toDF("v", "r")
    assert(Divergence.wasserstein1(same, "v", col("r")).collect().head
      .getAs[Double]("w1") == 0.0)
    // one side empty -> null, loudly
    val empty = Seq((1L, false), (2L, false)).toDF("v", "r")
    assert(Divergence.wasserstein1(empty, "v", col("r")).collect().head
      .isNullAt(3))
  }

  test("wasserstein1 agrees with a single-pass reference across buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(17)
    // value range >> 256 so the bucket decomposition and the cross-bucket
    // next-value patch genuinely engage
    val rows = (1 to 4000).map(_ =>
      (rnd.nextInt(100000).toLong + (if (rnd.nextBoolean()) 40000 else 0),
        rnd.nextBoolean()))
    def ref(xs: Seq[(Long, Boolean)]): Double = {
      val census = xs.groupBy(_._1).map { case (v, g) =>
        (v, g.count(!_._2).toLong, g.count(_._2).toLong)
      }.toSeq.sortBy(_._1)
      val na = census.map(_._2).sum; val nb = census.map(_._3).sum
      var (ca, cb, num) = (0L, 0L, BigInt(0))
      census.zip(census.drop(1)).foreach { case ((v, a, b), (vn, _, _)) =>
        ca += a; cb += b
        num += (BigInt(ca) * nb - BigInt(cb) * na).abs * (vn - v)
      }
      num.toDouble / (BigInt(na) * nb).toDouble
    }
    val got = Divergence.wasserstein1(
      rows.toDF("v", "r").repartition(32, col("v")), "v", col("r"))
      .collect().head.getAs[Double]("w1")
    assert(got == ref(rows), "bucketed plan == single-pass reference")
  }

  test("totalVariation: 0 for corpus-identical groups, exact 1/2 on a " +
      "half-disjoint split, partitioning-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, String)], parts: Int = 1) = {
      val df = rows.toDF("g", "t")
      val d = if (parts == 1) df.repartition(1) else df.repartition(parts, col("t"))
      Divergence.totalVariation(d, "g", "t")
        .collect().map(r => r.getAs[String]("g") ->
          ((r.getAs[Long]("n_tok"), r.getAs[Long]("vocab"),
            r.getAs[Double]("tv")))).toMap
    }
    // two identically-distributed groups: each == corpus -> tv exactly 0
    val same = Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))
    run(same).values.foreach { case (n, v, tv) =>
      assert(n == 10L && v == 2L && tv == 0.0)
    }
    // disjoint equal halves: corpus is 1/2 x + 1/2 y, each group is a
    // point mass -> TV = 1/2 exactly (absent-mass closed form exercised)
    val disj = Seq.fill(8)(("a", "x")) ++ Seq.fill(8)(("b", "y"))
    val d1 = run(disj)
    assert(d1("a") == ((8L, 1L, 0.5)) && d1("b") == ((8L, 1L, 0.5)))
    // all-integer numerator: invariant under partitioning
    assert(run(disj) == run(disj, 32))
  }

  test("tvFromCensus: pure per-bucket L1, no order dependence, null on " +
      "an empty side") {
    import spark.implicits._
    // census: bucket a-counts (4,0,4) vs b-counts (0,8,0)
    // TV = 1/2 * (|4*8-0| + |0-8*8| + |4*8-0|) / 64 = 1/2 * 128/64 = 1.0
    val c = Seq((0L, 4L, 0L), (1L, 0L, 8L), (2L, 4L, 0L))
      .toDF("b", "ca", "cb")
    val r = Divergence.tvFromCensus(c, "b", "ca", "cb").collect().head
    assert(r.getAs[Long]("n_a") == 8L && r.getAs[Long]("n_b") == 8L)
    assert(r.getAs[Double]("tv") == 1.0)
    // shuffled bucket order: identical (sum is order-free)
    val shuf = Seq((2L, 4L, 0L), (0L, 4L, 0L), (1L, 0L, 8L))
      .toDF("b", "ca", "cb")
    assert(Divergence.tvFromCensus(shuf, "b", "ca", "cb")
      .collect().head.getAs[Double]("tv") == 1.0)
    // empty b side -> null tv, loudly
    val onesided = Seq((0L, 4L, 0L)).toDF("b", "ca", "cb")
    assert(Divergence.tvFromCensus(onesided, "b", "ca", "cb")
      .collect().head.isNullAt(3))
  }

  test("cramerVonMises: identical samples 0, separated samples near the " +
      "asymptotic max, bucketed plan == single-pass reference") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(Long, Boolean)]) =
      Divergence.cramerVonMises(
        rows.toDF("v", "r").repartition(32, col("v")), "v", col("r"))
        .collect().head
    // identical distributions -> every gap 0 -> T = 0 exactly
    val same = (1L to 50L).flatMap(v => Seq((v, false), (v, true)))
    assert(run(same).getAs[Double]("t") == 0.0)
    // fully separated: T approaches (but stays near) its max ~ N/(3...):
    // hand-check the 2+2 case: values a={1,2} b={3,4}
    // cum at v=1: (1,0) gap=|1*2-0|=2 t=1; v=2: (2,0) gap 4 t=1;
    // v=3: (2,1) gap |4-2|=2 t=1; v=4: (2,2) gap 0
    // num = 4 + 16 + 4 + 0 = 24; T = 24/(16*2*2) = 0.375
    val sep = Seq((1L, false), (2L, false), (3L, true), (4L, true))
    assert(run(sep).getAs[Double]("t") == 0.375)
    // empty side -> null, loudly
    val one = Seq((1L, false), (2L, false))
    assert(run(one).isNullAt(3))
    // reference cross-check on a random-ish mixture: single-partition
    // run equals the 32-partition bucketed plan (exact integers)
    val rnd = new scala.util.Random(11)
    val mix = (1 to 3000).map(_ =>
      (rnd.nextInt(300).toLong, rnd.nextBoolean()))
    val a = Divergence.cramerVonMises(mix.toDF("v", "r").repartition(1),
      "v", col("r")).collect().head
    val b = run(mix)
    assert(a.getAs[Double]("t") == b.getAs[Double]("t"))
  }

  test("jensenShannon: bounded by ln 2, zero for corpus-identical groups," +
      " symmetric-ish ranking on drift") {
    import spark.implicits._
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val rows =
      (1 to 30).map(_ => ("steady_a", common)) ++
      (1 to 30).map(_ => ("steady_b", common)) ++
      (1 to 30).map(_ => ("drifted", "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"))
    val out = Divergence.jensenShannon(rows.toDF("src", "text"), "src", "text")
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Double]("js"), r.getAs[Double]("js_norm")))).toMap
    out.values.foreach { case (js, jsn) =>
      assert(js >= 0 && js <= math.log(2.0) + 1e-12, out.toString)
      assert(jsn >= 0 && jsn <= 1.0 + 1e-12)
    }
    assert(out("drifted")._1 > out("steady_a")._1 * 2, out.toString)
    assert(math.abs(out("steady_a")._1 - out("steady_b")._1) < 1e-12)
    // a group that IS the whole corpus diverges 0 from it exactly
    val solo = Divergence.jensenShannon(
      Seq(("only", "x y z")).toDF("s", "t"), "s", "t").collect().head
    assert(solo.getAs[Double]("js") == 0.0)
  }

  test("cramersV: partitioning-invariant (ordered cell fold)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 5000).map(_ =>
      ("p" + rnd.nextInt(5), "s" + rnd.nextInt(3)))
    val df = rows.toDF("a", "b")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val r = Divergence.cramersV(d, "a", "b").collect().head
      (r.getAs[Double]("chi2"), r.getAs[Double]("v"))
    }
    assert(run(df.repartition(1)) ==
      run(df.repartition(32, org.apache.spark.sql.functions.col("a"))))
  }

  test("andersonDarling: hand-computed terms, exact zero on mirrored " +
      "samples, separation dominates a bulk-only shift") {
    import spark.implicits._
    def ad(a: Seq[Long], b: Seq[Long]): Double = {
      val df = (a.map((_, false)) ++ b.map((_, true))).toDF("v", "r")
      Divergence.andersonDarling(df, "v", org.apache.spark.sql.functions
        .col("r")).head().getAs[Double]("a2")
    }
    // A={1,2}, B={3}: terms 0.5 (v=1) + 2.0 (v=2), B=N excluded
    // A2 = 2.5/(2*1) = 1.25
    assert(math.abs(ad(Seq(1L, 2L), Seq(3L)) - 1.25) < 1e-12)
    // identical samples: every gap N*M - na*B is exactly 0
    assert(ad(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 0.0)
    // disjoint ranges score far above an interleaved pair
    val sep = ad((1L to 5L), (11L to 15L))
    val mix = ad(Seq(1L, 3L, 5L, 7L, 9L), Seq(2L, 4L, 6L, 8L, 10L))
    assert(sep > 10 * mix, s"sep=$sep mix=$mix")
  }

  test("energyDistance: hand pair sums, exact zero on identical " +
      "samples, metric scales with the planted shift") {
    import spark.implicits._
    def ed(a: Seq[Long], b: Seq[Long]) = {
      val df = (a.map((_, false)) ++ b.map((_, true))).toDF("v", "r")
      Divergence.energyDistance(df, "v",
        org.apache.spark.sql.functions.col("r")).head()
    }
    // X={0,2}, Y={1}: E|X-Y|=1, E|X-X'|=1, E|Y-Y'|=0 -> e2 = 1
    val r = ed(Seq(0L, 2L), Seq(1L))
    assert(r.getAs[Double]("e2") === 1.0 && r.getAs[Double]("e") === 1.0)
    // identical samples: terms cancel to an exact float zero
    assert(ed(Seq(1L, 5L, 9L), Seq(1L, 5L, 9L)).getAs[Double]("e2") == 0.0)
    // a location shift of d moves e2 like ~d (metric units): 10x shift
    // must dominate 1x shift
    val base = (1L to 100L)
    val e1 = ed(base, base.map(_ + 10L)).getAs[Double]("e")
    val e10 = ed(base, base.map(_ + 100L)).getAs[Double]("e")
    assert(e10 > 5 * e1, s"$e1 vs $e10")
  }

  test("gaussianKl: a group that IS the corpus lands exactly 0; " +
      "shifted and rescaled groups both register; zero variance null") {
    import spark.implicits._
    // one group == corpus: mu_g = mu_c, v_g = v_c -> kl = 0 exactly
    val solo = Seq(("g", 1L), ("g", 5L), ("g", 9L)).toDF("k", "v")
    assert(Divergence.gaussianKl(solo, "k", "v").head()
      .getAs[Double]("kl") == 0.0)
    // two groups, one shifted: both nonzero, shifted one carries the
    // location term
    val two = (Seq.fill(50)(("a", 10L)) ++ Seq.fill(50)(("a", 12L)) ++
      Seq.fill(50)(("b", 30L)) ++ Seq.fill(50)(("b", 32L))).toDF("k", "v")
    val m = Divergence.gaussianKl(two, "k", "v").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("kl")).toMap
    // symmetric construction: both groups diverge equally from pooled
    assert(m("a") == m("b") && m("a") > 1.0, m.toString)
    // constant group: zero variance -> null kl, loud
    val flat = (Seq.fill(5)(("f", 7L)) ++ Seq(("o", 1L), ("o", 9L)))
      .toDF("k", "v")
    val rf = Divergence.gaussianKl(flat, "k", "v").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(rf("f").isNullAt(rf("f").fieldIndex("kl")))
    assert(!rf("o").isNullAt(rf("o").fieldIndex("kl")))
  }

  test("jarqueBera: hand moments on a tiny group, symmetric data has " +
      "zero skew, constant groups go null") {
    import spark.implicits._
    // y = {1, 2, 3, 6}: n=4, S1=12, S2=50, S3=252, S4=1394
    // A2 = 4*50-144 = 56 (= 4*Σ(y-3)² = 4*14)
    // A3 = 16*252-3*4*12*50+2*1728 = 288 (= 16*Σ(y-3)³ = 16*18)
    // A4 = 64*1394-4*16*12*252+6*4*144*50-3*20736 = 6272 (= 64*98)
    val df = (Seq((1L, "g")) ++ Seq((2L, "g")) ++ Seq((3L, "g")) ++
      Seq((6L, "g")) ++ Seq((5L, "flat")) ++ Seq((5L, "flat")) ++
      (-3 to 3).map(i => (i.toLong, "sym"))).toDF("y", "g")
    val out = Divergence.jarqueBera(df, "g", "y").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    val g = out("g")
    val skew = 288.0 / (56.0 * math.sqrt(56.0))
    val kurt = 6272.0 / (56.0 * 56.0)
    assert(math.abs(g.getAs[Double]("skewness") - skew) < 1e-12)
    assert(math.abs(g.getAs[Double]("kurtosis") - kurt) < 1e-12)
    val jb = 4.0 / 6.0 * (skew * skew + (kurt - 3) * (kurt - 3) / 4.0)
    assert(math.abs(g.getAs[Double]("jb") - jb) < 1e-12)
    assert(math.abs(g.getAs[Double]("p_value") - math.exp(-jb / 2)) < 1e-12)
    assert(out("sym").getAs[Double]("skewness") == 0.0)
    assert(out("flat").isNullAt(out("flat").fieldIndex("jb")))
  }

  test("chiSquareIndependence: even-df Poisson-sum p matches the " +
      "direct series; independent table lands p ~ 1") {
    import spark.implicits._
    // 3x5 design (df=8, even), deliberately associated
    val rnd = new scala.util.Random(7)
    val rows = (1 to 4000).map { _ =>
      val a = rnd.nextInt(3)
      val b = if (rnd.nextDouble() < 0.3) a else rnd.nextInt(5)
      ("a" + a, "b" + b)
    }
    val r = Divergence.chiSquareIndependence(rows.toDF("x", "y"), "x", "y")
      .collect().head
    assert(r.getAs[Long]("df") == 8L)
    val x = r.getAs[Double]("chi2")
    // direct survival: exp(-h) * sum_{k<4} h^k/k!
    val h = x / 2
    val direct = math.exp(-h) * (1 + h + h * h / 2 + h * h * h / 6)
    assert(math.abs(r.getAs[Double]("p_value") - direct) < 1e-9,
      s"p=${r.getAs[Double]("p_value")} direct=$direct")
    assert(r.getAs[Double]("p_value") < 1e-6) // strong association
    // independent-by-construction: a and b from separate draws
    val ind = (1 to 4000).map(_ => ("a" + rnd.nextInt(3), "b" + rnd.nextInt(5)))
    val ri = Divergence.chiSquareIndependence(ind.toDF("x", "y"), "x", "y")
      .collect().head
    assert(ri.getAs[Double]("p_value") > 0.001)
    // odd df (2x2 -> df 1): null p, loud df
    val odd = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
    val ro = Divergence.chiSquareIndependence(odd.toDF("x", "y"), "x", "y")
      .collect().head
    assert(ro.getAs[Long]("df") == 1L)
    assert(ro.isNullAt(ro.fieldIndex("p_value")))
  }

  test("theilsU: identical columns give U = 1 both ways; independence " +
      "gives 0; a constant column nulls its own U and zeroes the other") {
    import spark.implicits._
    def run(rows: Seq[(String, String)]) =
      Divergence.theilsU(rows.toDF("a", "b"), "a", "b").collect().head
    // b == a: MI = H(a) = H(b) -> both coefficients exactly 1
    val same = run(Seq(("x", "x"), ("y", "y"), ("x", "x"), ("z", "z")))
    assert(math.abs(same.getAs[Double]("u_b_given_a") - 1.0) < 1e-12)
    assert(math.abs(same.getAs[Double]("u_a_given_b") - 1.0) < 1e-12)
    // balanced independent 2x2: MI = 0 -> both U = 0
    val ind = run(Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")))
    assert(math.abs(ind.getAs[Double]("u_b_given_a")) < 1e-12)
    assert(math.abs(ind.getAs[Double]("u_a_given_b")) < 1e-12)
    // constant a: H(a) = 0 -> u_a_given_b null (nothing to predict),
    // u_b_given_a = 0 (a predicts nothing)
    val const = run(Seq(("k", "x"), ("k", "y"), ("k", "x")))
    assert(const.isNullAt(const.fieldIndex("u_a_given_b")))
    assert(math.abs(const.getAs[Double]("u_b_given_a")) < 1e-12)
  }

  test("gTest: matches the local o·ln(o/e) closed form and the " +
      "2·N·MI identity; exact independence gives G = 0, p = 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 4000).map { _ =>
      val a = rnd.nextInt(3)
      val b = if (rnd.nextDouble() < 0.3) a else rnd.nextInt(5)
      ("a" + a, "b" + b)
    }
    val r = Divergence.gTest(rows.toDF("x", "y"), "x", "y").head()
    assert(r.getAs[Long]("df") == 8L)
    // local reference over the observed table
    val cells = rows.groupBy(identity).view.mapValues(_.size).toMap
    val ca = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val cb = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val n = rows.size.toDouble
    val gRef = 2.0 * cells.map { case ((a, b), o) =>
      o * math.log(o * n / (ca(a).toDouble * cb(b)))
    }.sum
    val g = r.getAs[Double]("g")
    assert(math.abs(g - gRef) < 1e-9 * gRef, s"g=$g ref=$gRef")
    // G = 2·N·MI (nats) against the MI operator
    val mi = Divergence.mutualInformation(rows.toDF("x", "y"), "x", "y")
      .head().getAs[Double]("mi")
    assert(math.abs(g - 2.0 * n * mi) < 1e-6 * g)
    // survival p from the direct series (df=8 -> m=4)
    val h = g / 2
    val direct = math.exp(-h) * (1 + h + h * h / 2 + h * h * h / 6)
    assert(math.abs(r.getAs[Double]("p_value") - direct) < 1e-9)
    // perfectly independent 2x4 product table: every o == e exactly
    val ind = for (a <- 0 until 2; b <- 0 until 4; _ <- 0 until (a + 1))
      yield ("a" + a, "b" + b)
    val ri = Divergence.gTest(ind.toDF("x", "y"), "x", "y").head()
    assert(ri.getAs[Double]("g") == 0.0)
    assert(ri.getAs[Long]("df") == 3L) // odd df -> null p, loud df
    assert(ri.isNullAt(ri.fieldIndex("p_value")))
  }

  test("fisherExact: Fisher's tea-tasting table hits the exact " +
      "rational p-values; the support cap raises loudly") {
    import spark.implicits._
    // [[3,1],[1,3]]: support p = {1,16,36,16,1}/70, observed a = 3
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("r", "c")
    val f = Divergence.fisherExact(df, col("r"), col("c")).head()
    assert(f.getAs[Long]("n11") == 3 && f.getAs[Long]("n00") == 3)
    assert(math.abs(f.getAs[Double]("p_two") - 34.0 / 70.0) < 1e-12)
    assert(math.abs(f.getAs[Double]("p_right") - 17.0 / 70.0) < 1e-12)
    assert(math.abs(f.getAs[Double]("p_left") - 69.0 / 70.0) < 1e-12)
    // independence-ish big effect: strong association -> tiny p
    val strong = Seq.fill(20)((true, true)) ++
      Seq.fill(20)((false, false)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(2)((false, true))
    val fs = Divergence.fisherExact(strong.toDF("r", "c"),
      col("r"), col("c")).head()
    assert(fs.getAs[Double]("p_two") < 1e-6)
    // loud cap: support 21 > 4
    val err = intercept[Exception] {
      Divergence.fisherExact(strong.toDF("r", "c"), col("r"), col("c"),
        maxSupport = 4).collect()
    }
    assert(err.getMessage != null &&
      err.getMessage.contains("fisherExact"), err.getMessage)
    // default-cap stability (r11 advisor): support in (1000, 100000]
    // must COMPUTE under the default arg — the brief 1000 default was a
    // breaking change to a public signature. 1100+1100 of 2200 gives
    // support 1101; p_two = 1 by symmetry of the balanced null table.
    val mid = Seq.fill(550)((true, true)) ++ Seq.fill(550)((true, false)) ++
      Seq.fill(550)((false, true)) ++ Seq.fill(550)((false, false))
    val fm = Divergence.fisherExact(mid.toDF("r", "c"),
      col("r"), col("c")).head()
    assert(math.abs(fm.getAs[Double]("p_two") - 1.0) < 1e-9)
  }

  test("distanceCorrelation: exactly 1 on a line, sees the U-shape " +
      "Pearson misses, nulls on a constant marginal, loud n cap") {
    import spark.implicits._
    // perfect linear dependence: b = 2a -> dCor = 1
    val line = Seq(1L, 3L, 4L, 7L, 9L, 12L).map(x => (x, 2 * x + 3))
    val rl = Divergence.distanceCorrelation(line.toDF("x", "y"),
      "x", "y").head()
    assert(math.abs(rl.getAs[Double]("dcor") - 1.0) < 1e-9,
      rl.toString)
    // U-shape: y = (x-3)^2 — zero linear correlation by symmetry,
    // strong distance correlation
    val u = (0L to 6L).map(x => (x, (x - 3) * (x - 3)))
    val ru = Divergence.distanceCorrelation(u.toDF("x", "y"),
      "x", "y").head()
    assert(ru.getAs[Double]("dcor") > 0.3, ru.toString)
    // local double reference on the same 7 points
    val xs = u.map(_._1.toDouble); val ys = u.map(_._2.toDouble)
    val n = xs.size
    def centered(v: Seq[Double]): IndexedSeq[IndexedSeq[Double]] = {
      val a = IndexedSeq.tabulate(n, n)((j, k) => math.abs(v(j) - v(k)))
      val rm = a.map(_.sum / n)
      val t = rm.sum / n
      IndexedSeq.tabulate(n, n)((j, k) => a(j)(k) - rm(j) - rm(k) + t)
    }
    val ac = centered(xs); val bc = centered(ys)
    def m(p: IndexedSeq[IndexedSeq[Double]],
        q: IndexedSeq[IndexedSeq[Double]]): Double =
      (for (j <- 0 until n; k <- 0 until n) yield p(j)(k) * q(j)(k))
        .sum / (n * n)
    val ref = math.sqrt(m(ac, bc) / math.sqrt(m(ac, ac) * m(bc, bc)))
    assert(math.abs(ru.getAs[Double]("dcor") - ref) < 1e-9,
      s"dcor=${ru.getAs[Double]("dcor")} ref=$ref")
    // constant y: dvar_y = 0 -> null dcor
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L))
    val rc = Divergence.distanceCorrelation(const.toDF("x", "y"),
      "x", "y").head()
    assert(rc.isNullAt(rc.fieldIndex("dcor")))
    // observation cap raises loudly
    val err = intercept[Exception] {
      Divergence.distanceCorrelation(line.toDF("x", "y"), "x", "y",
        maxN = 3L).collect()
    }
    assert(err.getMessage.contains("distanceCorrelation"),
      err.getMessage)
  }

  test("hellinger: identical distributions give H = 0 (BC = 1), " +
      "disjoint support gives H = 1 (BC = 0), hand 2-cell value") {
    import spark.implicits._
    def run(rows: Seq[(Long, Boolean)]) =
      Divergence.hellinger(rows.toDF("c", "b"), "c", col("b")).head()
    // identical: each side 2x cat1, 1x cat2
    val same = Seq((1L, false), (1L, false), (2L, false),
      (1L, true), (1L, true), (2L, true))
    val rs = run(same)
    // sqrt(p*p) can land an ulp under p, so BC ~ 1 within rounding
    // and H = sqrt(1 - BC) amplifies that ulp to ~1e-8
    assert(math.abs(rs.getAs[Double]("bc") - 1.0) < 1e-12)
    assert(rs.getAs[Double]("hellinger") < 1e-6)
    // disjoint: A only cat1, B only cat2
    val disj = Seq((1L, false), (1L, false), (2L, true))
    val rd = run(disj)
    assert(rd.getAs[Double]("bc") == 0.0 &&
      rd.getAs[Double]("hellinger") == 1.0)
    // hand: p = (3/4, 1/4), q = (1/4, 3/4):
    // BC = 2*sqrt(3)/4, H = sqrt(1 - BC)
    val hand = Seq.fill(3)((1L, false)) ++ Seq((2L, false)) ++
      Seq((1L, true)) ++ Seq.fill(3)((2L, true))
    val rh = run(hand)
    val bcRef = 2.0 * math.sqrt(3.0) / 4.0
    assert(math.abs(rh.getAs[Double]("bc") - bcRef) < 1e-12)
    assert(math.abs(rh.getAs[Double]("hellinger") -
      math.sqrt(1.0 - bcRef)) < 1e-12)
  }
}
