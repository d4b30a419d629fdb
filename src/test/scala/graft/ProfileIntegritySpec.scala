package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Integrity, Profile, Regression}

/** Profiling census (q205), referential audit (q206), correlation
  * matrix (q207), off-fixture. */
class ProfileIntegritySpec extends AnyFunSuite with SparkFixture {

  test("profile: null/distinct counts and deterministic tie-broken mode") {
    import spark.implicits._
    val df = Seq(Some("b"), Some("b"), Some("a"), Some("a"), Some("c"), None)
      .toDF("x")
    val r = Profile.profile(df, Seq("x")).collect().head
    assert(r.getString(0) == "x" && r.getLong(1) == 6L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 3L)
    // 'a' and 'b' tie at 2: smallest value wins
    assert(r.getString(4) == "a" && r.getLong(5) == 2L)
  }

  test("orphanAudit: orphans and unused parents counted; null FKs excluded") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Integrity.orphanAudit(Seq(
      Integrity.Relation("c->p", child, "fk", parent, "pk"))).collect().head
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 4L) // null FK not audited
    assert(r.getLong(2) == 1L) // 99 is an orphan
    assert(r.getLong(3) == 3L)
    assert(r.getLong(4) == 1L) // 3 is never referenced
  }

  test("corrMatrix: perfectly linear columns give corr == 1, anti-linear -1") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 3.0, -1.0 * i))
      .toDF("a", "b", "c")
    val m = Regression.corrMatrix(df, Seq("a", "b", "c"), scale = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(m(("a", "b")) - 1.0) < 1e-12)
    assert(math.abs(m(("a", "c")) + 1.0) < 1e-12)
    assert(math.abs(m(("b", "c")) + 1.0) < 1e-12)
    assert(m.size == 3)
  }

  test("corrMatrix: independent-ish alternating column has |corr| << 1") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("a", "b")
    val c = Regression.corrMatrix(df, Seq("a", "b"), scale = 4)
      .collect().head.getDouble(3)
    assert(math.abs(c) < 0.1, s"corr=$c")
  }

  test("functionalDependencies: keys determine all, violations counted") {
    import spark.implicits._
    val df = Seq(
      (1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "b", "z"))
      .toDF("id", "g", "s")
    val got = graft.operators.Profile
      .functionalDependencies(df, Seq("id", "g", "s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(("id", "g")) === ((4L, 0L, true)))  // id is a key
    assert(got(("id", "s")) === ((4L, 0L, true)))
    assert(got(("g", "s")) === ((2L, 1L, false)))  // b -> {y, z}
    assert(got(("s", "g")) === ((3L, 0L, true)))   // each s has one g
    assert(got(("g", "id")) === ((2L, 2L, false))) // both groups multi-id
  }

  test("functionalDependencies: nulls are values, not wildcards") {
    import spark.implicits._
    val df = Seq((1, Some("x")), (1, None), (2, None), (3, Some("y")))
      .toDF("k", "v")
    val got = graft.operators.Profile.functionalDependencies(df, Seq("k", "v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    // k=1 maps to {x, NULL}: a violation — null is a distinct value
    assert(got(("k", "v")) === ((1L, false)))
  }

  test("mutualInformation: independent columns score 0, copies score H") {
    import spark.implicits._
    // independent: every (a, b) combination equally likely
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val mi0 = graft.operators.Divergence.mutualInformation(indep, "a", "b")
      .head()
    assert(math.abs(mi0.getDouble(4)) < 1e-12)
    assert(math.abs(mi0.getDouble(2) - math.log(2)) < 1e-12) // H_a = ln 2
    // b is a copy of a: I(A;B) = H(A) = H(B)
    val dep = (Seq.fill(6)(("x", "x")) ++ Seq.fill(2)(("y", "y")))
      .toDF("a", "b")
    val r = graft.operators.Divergence.mutualInformation(dep, "a", "b").head()
    val h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(r.getDouble(2) - h) < 1e-12)
    assert(math.abs(r.getDouble(4) - h) < 1e-12)
    assert(r.getLong(0) === 8L && r.getLong(1) === 2L)
  }

  test("sortednessCensus: inversions count adjacent backward steps only") {
    import spark.implicits._
    // slice p: seq order 1..5 with values 10,20,15,30,25 -> 2 inversions
    // slice q: sorted -> 0
    val df = Seq(
      ("p", 1L, 10L), ("p", 2L, 20L), ("p", 3L, 15L), ("p", 4L, 30L),
      ("p", 5L, 25L),
      ("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
      .toDF("part", "seq", "v")
    val got = graft.operators.Profile
      .sortednessCensus(df, "part", Seq("seq"), "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map("p" -> ((5L, 2L)), "q" -> ((3L, 0L))))
  }

  test("benfordCensus: digit census, positives only, hand-checked chi2") {
    import spark.implicits._
    // group a: values 1, 19, 100, 2 -> digits 1,1,1,2; zero/negative dropped
    val df = Seq(("a", 1L), ("a", 19L), ("a", 100L), ("a", 2L),
      ("a", 0L), ("a", -5L), ("b", 9L))
      .toDF("g", "v")
    val rows = Profile.benfordCensus(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(rows.keySet === Set(("a", 1), ("a", 2), ("b", 9)))
    val (n1, ng, chi2a) = rows(("a", 1))
    assert(n1 == 3L && ng == 4L)
    // hand chi2 for group a: obs = (d1:3, d2:1, rest 0), N = 4
    val p = Profile.BenfordP
    val expChi = (1 to 9).map { d =>
      val e = p(d - 1) * 4.0
      val o = if (d == 1) 3.0 else if (d == 2) 1.0 else 0.0
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chi2a - expChi) < 1e-9, s"$chi2a vs $expChi")
    // group b: single digit-9 value; its chi2 is the full miss mass
    val (_, ngB, chi2b) = rows(("b", 9))
    assert(ngB == 1L)
    val expB = (1 to 9).map { d =>
      val e = p(d - 1)
      val o = if (d == 9) 1.0 else 0.0
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chi2b - expB) < 1e-9)
  }

  test("simpsonDiversity: exact rational lambda, effective categories") {
    import spark.implicits._
    // counts {2,2}: lambda = (2+2)/(4*3) = 1/3, effective = 16/8 = 2
    val even = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "b"))
      .toDF("g", "cat")
    val r = Profile.simpsonDiversity(even, "g", "cat").collect().head
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("n_categories") == 2)
    assert(r.getAs[Double]("simpson_lambda") == 1.0 / 3.0)
    assert(r.getAs[Double]("diversity") == 1.0 - 1.0 / 3.0)
    assert(r.getAs[Double]("effective") == 2.0)
    // one category: lambda = 1 (certain collision), effective = 1
    val mono = Seq(("g", "a"), ("g", "a"), ("g", "a")).toDF("g", "cat")
    val m = Profile.simpsonDiversity(mono, "g", "cat").collect().head
    assert(m.getAs[Double]("simpson_lambda") == 1.0 &&
      m.getAs[Double]("effective") == 1.0)
    // n = 1: lambda undefined (null), effective still 1
    val one = Seq(("g", "a")).toDF("g", "cat")
    val o = Profile.simpsonDiversity(one, "g", "cat").collect().head
    assert(o.isNullAt(3) && o.getAs[Double]("effective") == 1.0)
  }

  test("inclusionDependencies: FK holds, dirty FK counts distinct orphans") {
    import spark.implicits._
    val ref = Seq(1L, 2L, 3L).toDF("k")
    // values 1,2 resolve; 9 and 8 are orphans (9 twice -> ONE distinct)
    val dep = Seq(1L, 2L, 2L, 9L, 9L, 8L).toDF("fk")
    val depNull = Seq(Some(1L), None, Some(3L)).toDF("fk")
    val out = Profile.inclusionDependencies(Seq(
        ("dep", dep, "fk", "ref", ref, "k"),
        ("depnull", depNull, "fk", "ref", ref, "k"),
        ("ref", ref, "k", "dep", dep, "fk")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out("dep.fk") == ((4L, 2L, false)), "distinct orphans, not rows")
    assert(out("depnull.fk") == ((2L, 0L, true)), "nulls excluded, FK holds")
    assert(out("ref.k") == ((3L, 1L, false)), "reverse direction: 3 missing")
  }

  test("dispersionIndex: constant series ~0, bursty spikes above 1, " +
      "zero-days count via the global window") {
    import spark.implicits._
    def run(rows: Seq[(String, Int)]) =
      Profile.dispersionIndex(rows.toDF("g", "p"), "g", "p")
        .collect().map(r => r.getAs[String]("g") ->
          ((r.getAs[Long]("n_periods"), r.getAs[Long]("n_events"),
            Option(r.getAs[java.lang.Double]("dispersion"))
              .map(_.toDouble)))).toMap
    // constant 5/period over 4 periods: var 0 -> D = 0 exactly
    val flat = for { p <- 1 to 4; _ <- 1 to 5 } yield ("flat", p)
    assert(run(flat)("flat") == ((4L, 20L, Some(0.0))))
    // all 20 events in one of 4 periods: S2 = 400, D = (4*400-400)/(3*20)
    // = 1200/60 = 20 — maximal burst
    val burst = Seq.fill(20)(("burst", 1)) ++
      Seq(("pad", 2), ("pad", 3), ("pad", 4))
    val b = run(burst)
    assert(b("burst") == ((4L, 20L, Some(20.0))))
    // the pad group: 1 event in each of 3 of the 4 GLOBAL periods ->
    // S1 = 3, S2 = 3, D = (4*3-9)/(3*3) = 1/3 (zero-period counted)
    assert(b("pad") == ((4L, 3L, Some(1.0 / 3))))
    // Poisson-ish sanity: D near 1 for iid uniform arrivals
    val rnd = new scala.util.Random(5)
    val pois = (1 to 4000).map(_ => ("p", rnd.nextInt(100)))
    val d = run(pois)("p")._3.get
    assert(d > 0.5 && d < 1.7, s"D=$d should hover near 1")
  }

  test("goodTuring: textbook N_r census, exact r*, N_{r+1} gap is null") {
    import spark.implicits._
    // counts: a=3, b=1, c=1, d=2 -> N=7 V=4; N_1=2 N_2=1 N_3=1
    val toks = Seq.fill(3)("a") ++ Seq("b", "c") ++ Seq.fill(2)("d")
    val df = toks.map(("g", _)).toDF("g", "t")
    val out = Profile.goodTuring(df, "g", "t", maxR = 5)
      .collect().map(r => r.getAs[Long]("r") ->
        ((r.getAs[Long]("n_r"),
          Option(r.getAs[java.lang.Double]("r_star")).map(_.toDouble),
          r.getAs[Double]("p0"), r.getAs[Long]("n_tok"),
          r.getAs[Long]("vocab")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // r* = (r+1)*N_{r+1}/N_r: 2*1/2 = 1.0, 3*1/3 = 3.0; N_4 = 0 -> null
    assert(out(1L) == ((2L, Some(1.0), 2.0 / 7, 7L, 4L)))
    assert(out(2L) == ((1L, Some(3.0), 2.0 / 7, 7L, 4L)))
    assert(out(3L) == ((1L, None, 2.0 / 7, 7L, 4L)))
    // maxR caps the emitted rows; a no-hapax group has p0 = 0
    val dense = Seq.fill(4)("x") ++ Seq.fill(9)("y")
    val d = Profile.goodTuring(dense.map(("h", _)).toDF("g", "t"), "g", "t",
      maxR = 3).collect()
    assert(d.isEmpty, "all counts above maxR -> no rows, never a fake 0")
    val p0s = Profile.goodTuring(
      (Seq.fill(2)("x") ++ Seq.fill(3)("y")).map(("h", _)).toDF("g", "t"),
      "g", "t").collect().map(_.getAs[Double]("p0")).distinct
    assert(p0s.sameElements(Array(0.0)), "no hapax -> unseen mass 0")
  }

  test("leaveOneOut: moment subtraction matches hand recomputation; " +
      "removing the whole scope nulls loudly") {
    import spark.implicits._
    val rows = Seq(("s", "a", 0L), ("s", "a", 0L), ("s", "b", 10L),
      ("s", "b", 10L), ("s", "c", 2L))
    val got = graft.operators.Profile.leaveOneOut(
        rows.toDF("sc", "g", "y"), "sc", "g", "y")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got("a").getAs[Double]("mean_all") == 4.4)
    // without a: [10,10,2] -> mean 22/3, sample var 128/6
    assert(math.abs(got("a").getAs[Double]("loo_mean") - 22.0 / 3) < 1e-9)
    assert(math.abs(got("a").getAs[Double]("delta_mean") -
      (22.0 / 3 - 4.4)) < 1e-9)
    assert(math.abs(got("a").getAs[Double]("loo_var") - 128.0 / 6) < 1e-9)
    // removing b LOWERS the mean: delta negative
    assert(got("b").getAs[Double]("delta_mean") < 0)
    // a group that IS the scope: nothing remains, nulls
    val solo = graft.operators.Profile.leaveOneOut(
        Seq(("t", "only", 5L)).toDF("sc", "g", "y"), "sc", "g", "y")
      .collect().head
    assert(solo.isNullAt(5) && solo.isNullAt(6) && solo.isNullAt(7))
  }

  test("distinctN: hand counts on a tiny corpus; a fully repeated " +
      "corpus craters distinct-2 while distinct-1 stays blind") {
    import spark.implicits._
    // "a b a b" + "a b": unigrams 6 tokens/2 types; bigrams
    // {a b, b a, a b} + {a b} = 4 tokens, 2 types; trigrams 2+0 -> 2/2
    val df = Seq(("g", "a b a b"), ("g", "a b")).toDF("s", "t")
    val got = graft.operators.Profile.distinctN(df, "s", "t")
      .collect().map(r => r.getAs[Int]("n") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_types")))).toMap
    assert(got(1) == ((6L, 2L)), got.toString)
    assert(got(2) == ((4L, 2L)), got.toString)
    assert(got(3) == ((2L, 2L)), got.toString)
    // template spam: same sentence 50x. distinct-1 of the one-doc
    // corpus equals distinct-1 of the spam corpus, but distinct-2
    // ratio collapses by ~50x
    val spam = (1 to 50).map(_ => ("spam", "the quick brown fox jumps"))
    val rs = graft.operators.Profile.distinctN(spam.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getAs[Int]("n") -> r.getAs[Double]("distinct_ratio"))
      .toMap
    assert(math.abs(rs(2) - 4.0 / 200.0) < 1e-12, rs.toString)
    // docs shorter than n contribute nothing at that n (no nulls leak)
    val short = Seq(("x", "solo")).toDF("s", "t")
    val sh = graft.operators.Profile.distinctN(short, "s", "t")
      .collect().map(r => r.getAs[Int]("n")).toSet
    assert(sh == Set(1))
  }

  test("chao1: textbook singleton/doubleton estimate; a fully-saturated " +
      "sample adds nothing; all-singletons explodes the bound") {
    import spark.implicits._
    // counts: a:1 b:1 c:1 d:2 e:2 f:5 -> D=6, F1=3, F2=2
    // chao1 = 6 + 3*2/(2*3) = 7
    val vals = Seq("a", "b", "c", "d", "d", "e", "e") ++ Seq.fill(5)("f")
    val r = graft.operators.Profile.chao1(
      vals.map(("g", _)).toDF("g", "v"), "g", "v").head()
    assert(r.getAs[Long]("d_obs") == 6L && r.getAs[Long]("f1") == 3L &&
      r.getAs[Long]("f2") == 2L)
    assert(r.getAs[Double]("chao1") === 7.0)
    // every type seen >= 3 times: F1 = F2 = 0 -> chao1 == D exactly
    val sat = Seq.fill(3)("x") ++ Seq.fill(4)("y")
    val rs = graft.operators.Profile.chao1(
      sat.map(("g", _)).toDF("g", "v"), "g", "v").head()
    assert(rs.getAs[Double]("chao1") === 2.0)
    // all singletons: chao1 = D + D(D-1)/2 (huge unseen mass, loud)
    val sing = (1 to 6).map(i => ("g", s"u$i"))
    val ri = graft.operators.Profile.chao1(sing.toDF("g", "v"), "g", "v")
      .head()
    assert(ri.getAs[Double]("chao1") === 6.0 + 30.0 / 2.0)
  }

  test("germanTank: textbook estimate, exact recovery when the sample " +
      "IS the population max-heavy case") {
    import spark.implicits._
    // sample {19, 40, 42, 60}: k=4, m=60 -> N-hat = 60 + 15 - 1 = 74
    val s = Seq(19L, 40L, 42L, 60L).toDF("id")
    val r = graft.operators.Profile.germanTank(s, "id").head()
    assert(r.getAs[Long]("k") == 4L && r.getAs[Long]("m") == 60L)
    assert(r.getAs[Double]("n_hat") === 74.0)
    assert(math.abs(r.getAs[Double]("se") -
      math.sqrt(14.0 * 75.0 / 4.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("coverage") - 4.0 / 74.0) < 1e-12)
    // the full population 1..N: N-hat = N + 1 - 1 = N exactly
    val full = (1L to 50L).toDF("id")
    assert(graft.operators.Profile.germanTank(full, "id").head()
      .getAs[Double]("n_hat") === 50.0)
  }

  test("lshPlanner: probabilities match direct powers, more bands " +
      "catch lower similarity, thresholds order correctly") {
    val p = graft.operators.Dedup.lshPlanner(spark, 128,
      Seq(8, 16, 32, 64), Seq(0.5, 0.8)).collect()
      .map(r => (r.getAs[Int]("b"), r.getAs[Double]("s")) ->
        r.getAs[Double]("p_collide")).toMap
    def direct(b: Int, r: Int, s: Double) =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    // repeated-multiply folds agree with pow to double precision here
    assert(math.abs(p((16, 0.8)) - direct(16, 8, 0.8)) < 1e-12)
    // at s = 0.5, 64 narrow bands fire far more than 8 wide ones
    assert(p((64, 0.5)) > 100 * p((8, 0.5)), p.toString)
    // at high similarity everything fires
    assert(p((16, 0.8)) > 0.5 && p((64, 0.8)) > 0.99)
  }

  test("vocabCoverageCurve: hand counts, K beyond vocab saturates at " +
      "1.0, ties broken by token") {
    import spark.implicits._
    // freqs: a:4, b:3, c:2, d:1 -> total 10
    val df = Seq("a a b c", "a b d", "a b c").toDF("text")
    val got = graft.operators.Profile
      .vocabCoverageCurve(df, "text", ks = Seq(1, 2, 3, 9))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == ((1L, 4L, 10L, 0.4)))
    assert(got(2L) == ((2L, 7L, 10L, 0.7)))
    assert(got(3L) == ((3L, 9L, 10L, 0.9)))
    // K past the vocabulary: all 4 types, full coverage
    assert(got(9L) == ((4L, 10L, 10L, 1.0)))
  }

  test("yuleK: closed-form K on hand spectra; template text scores an " +
      "order of magnitude above diverse text") {
    import spark.implicits._
    def run(rows: Seq[(String, String)]) =
      graft.operators.Profile.yuleK(rows.toDF("g", "t"), "g", "t")
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
            r.getAs[Double]("yule_k")))).toMap
    // "a a a b b c": N=6, sum m^2 = 9+4+1 = 14, K = 1e4*(14-6)/36
    val out = run(Seq(("h", "a a A b B c"),
      ("tmpl", "x x x x"), ("prose", "p q r s")))
    val (n, v, k) = out("h")
    assert(n == 6L && v == 3L)
    assert(math.abs(k - 10000.0 * 8.0 / 36.0) < 1e-9)
    // pure template: K = 1e4*(16-4)/16 = 7500; all-distinct: K = 0
    assert(out("tmpl")._3 == 7500.0)
    assert(out("prose")._3 == 0.0)
    assert(out("tmpl")._3 > 10 * math.max(out("prose")._3, 1.0))
  }
}
