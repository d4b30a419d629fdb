package graft

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Eval

class EvalSpec extends AnyFunSuite with SparkFixture {

  private def aucOf(rows: Seq[(Int, Double)]): Double = {
    import spark.implicits._
    val df = rows.map { case (y, s) => ("g", y, s) }.toDF("g", "y", "s")
    Eval.auc(df, "g", "y", "s").collect().head.getAs[Double]("auc")
  }

  test("AUC: separators, anti-separators, ties, hand-checked mixture") {
    // perfect separation
    assert(aucOf(Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))) == 1.0)
    // perfectly wrong
    assert(aucOf(Seq((0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1))) == 0.0)
    // constant score: all ties -> 0.5 exactly
    assert(aucOf(Seq((1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5))) == 0.5)
    // hand case: pos {0.8, 0.5}, neg {0.5, 0.2}
    // pairs: (.8>.5)=1 (.8>.2)=1 (.5=.5)=0.5 (.5>.2)=1 -> U=3.5, AUC=0.875
    assert(aucOf(Seq((1, 0.8), (1, 0.5), (0, 0.5), (0, 0.2))) == 0.875)
  }

  test("AUC: degenerate single-class group is null; partitioning-invariant") {
    import spark.implicits._
    val onlyPos = Seq(("g", 1, 0.3), ("g", 1, 0.7)).toDF("g", "y", "s")
    assert(Eval.auc(onlyPos, "g", "y", "s").collect().head.isNullAt(5))

    val rnd = new scala.util.Random(11)
    val big = (1 to 5000).map(i => ("g", rnd.nextInt(2),
      math.rint(rnd.nextDouble() * 100) / 100))
    val df = big.toDF("g", "y", "s")
    val a = Eval.auc(df.repartition(1), "g", "y", "s").collect().head
    val b = Eval.auc(df.repartition(32, org.apache.spark.sql.functions.col("s")),
      "g", "y", "s").collect().head
    // integer U terms make the whole statistic bit-stable
    assert(a.getAs[Double]("auc") == b.getAs[Double]("auc"))
    assert(a.getAs[Long]("u_strict") == b.getAs[Long]("u_strict"))
  }

  test("chiSquareTokens: perfect marker maxes at N; uniform token drops out") {
    import spark.implicits._
    val docs = Seq(
      (true, "zebra common filler"),
      (true, "zebra common other"),
      (false, "common filler stuff"),
      (false, "common other stuff")).toDF("cls", "t")
    val top = Eval.chiSquareTokens(docs, "t", "cls", k = 10).collect()
    val byTok = top.map(r => r.getAs[String]("token") -> r).toMap
    // perfect association: chi2 = N exactly (integer arithmetic
    // end-to-end); 'stuff' scores 4.0 too and wins the alphabetical
    // tie-break, so zebra sits at rank 2
    assert(byTok("zebra").getAs[Long]("rank") == 2L)
    assert(byTok("zebra").getAs[Double]("chi2") == 4.0)
    // 'common' appears in every doc -> a margin is zero -> dropped
    assert(!byTok.contains("common"))
    // hand-check an asymmetric cell: 'stuff' a=0 b=2 c=2 d=0 -> chi2 = 4
    assert(byTok("stuff").getAs[Double]("chi2") == 4.0)
  }

  test("cohenKappa: perfect, chance-level, and constant-rater cases") {
    import spark.implicits._
    val df = Seq(
      // g1: perfect agreement over 2 labels -> kappa 1
      ("g1", "x", "x"), ("g1", "y", "y"), ("g1", "x", "x"), ("g1", "y", "y"),
      // g2: hand case — 2x2 table a=(A,A):2 (A,B):1 (B,A):1 (B,B):0
      // po = 2/4, pe = (3*3 + 1*1)/16 = 10/16 -> kappa = (8-10)/(16-10)
      ("g2", "A", "A"), ("g2", "A", "A"), ("g2", "A", "B"), ("g2", "B", "A"),
      // g3: both raters constant on one label -> pe = 1 -> null
      ("g3", "k", "k"), ("g3", "k", "k"))
      .toDF("g", "a", "b")
    val got = Eval.cohenKappa(df, "g", "a", "b")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got("g1") === ((4L, 4L, 1.0)))
    assert(got("g2")._1 == 4L && got("g2")._2 == 2L)
    assert(math.abs(got("g2")._3 - (-2.0 / 6.0)) < 1e-12)
    assert(got("g3")._3.isNaN, "constant raters have no chance-corrected signal")
  }

  test("mannWhitneyU: hand-computed U with ties, all-tied null z, symmetry") {
    import spark.implicits._
    // g1: A = {1, 2}, B = {2, 3}: ranks 1, 2.5, 2.5, 4 (doubled: 2,5,5,8)
    // R_a = 1 + 2.5 = 3.5 -> R2a = 7; 2U = 7 - 2*3 = 1 (U = 0.5)
    val df = Seq(
      ("g1", 1, 1L), ("g1", 1, 2L), ("g1", 0, 2L), ("g1", 0, 3L),
      // g2: every value identical -> variance 0 -> z null
      ("g2", 1, 5L), ("g2", 0, 5L), ("g2", 1, 5L))
      .toDF("g", "lab", "v")
    val got = Eval.mannWhitneyU(df, "g", "lab", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(got("g1")._1 == 2L && got("g1")._2 == 2L)
    assert(got("g1")._3 == 1L, s"doubled U: ${got("g1")}")
    // z for g1: 2U - na*nb = 1 - 4 = -3; tie term T = 2^3-2 = 6
    // var = 4 * (64 - 4 - 6) / (12*4*3) = 4*54/144 = 1.5
    val expZ = -3.0 / (2.0 * math.sqrt(1.5))
    assert(math.abs(got("g1")._4 - expZ) < 1e-12)
    assert(got("g2")._4.isNaN, "all-tied group has zero variance")
    // label swap negates z (within float noise)
    val sw = Eval.mannWhitneyU(
        df.withColumn("lab", lit(1) - col("lab")), "g", "lab", "v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(math.abs(sw("g1") + got("g1")._4) < 1e-12)
  }

  test("ndcgAtK: perfect ranking scores 1, inverted ranking less, zero-rel null") {
    import spark.implicits._
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // query p: scores rank docs exactly by relevance -> ndcg = 1
    // query q: scores INVERT relevance -> dcg < idcg
    // query z: all rel 0 -> idcg 0 -> ndcg null
    val df = Seq(
      ("p", 1L, 30.0, 3), ("p", 2L, 20.0, 2), ("p", 3L, 10.0, 0),
      ("q", 1L, 10.0, 3), ("q", 2L, 20.0, 2), ("q", 3L, 30.0, 0),
      ("z", 1L, 5.0, 0), ("z", 2L, 4.0, 0))
      .toDF("q", "doc", "s", "rel")
    val got = Eval.ndcgAtK(df, "q", "doc", "s", "rel", k = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    val idealTop2 = 7.0 / log2(2.0) + 3.0 / log2(3.0)
    assert(got("p")._1 == 3L)
    assert(math.abs(got("p")._2 - idealTop2) < 1e-12)
    assert(got("p")._4 == 1.0)
    // q's model order is (doc 3 rel 0, doc 2 rel 2): dcg = 3/log2(3)
    assert(math.abs(got("q")._2 - 3.0 / log2(3.0)) < 1e-12)
    assert(got("q")._4 < 1.0)
    assert(got("z")._4.isNaN, "all-zero relevance yields null ndcg")
  }

  test("oddsRiskRatio: hand 2x2, null-OR intervals, empty-cell nulls") {
    import spark.implicits._
    // a=20 b=10 c=5 d=15: OR = 300/50 = 6, RR = (2/3)/(1/4) = 8/3
    val rows = Seq.fill(20)(("s", 1L, 1L)) ++ Seq.fill(10)(("s", 1L, 0L)) ++
      Seq.fill(5)(("s", 0L, 1L)) ++ Seq.fill(15)(("s", 0L, 0L))
    val r = Eval.oddsRiskRatio(rows.toDF("sc", "e", "o"), "sc", "e", "o")
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((20L, 10L, 5L, 15L)))
    assert(r.getAs[Double]("odds_ratio") == 6.0)
    assert(r.getAs[Double]("risk_ratio") == (20.0 / 30.0) / (5.0 / 20.0))
    // interval brackets the point estimate
    assert(r.getAs[Double]("or_lo") < 6.0 && r.getAs[Double]("or_hi") > 6.0)
    assert(r.getAs[Double]("rr_lo") < r.getAs[Double]("risk_ratio"))
    // an empty cell nulls OR (log domain) instead of smoothing it
    val zero = Seq.fill(3)(("s", 1L, 1L)) ++ Seq.fill(2)(("s", 0L, 1L)) ++
      Seq.fill(4)(("s", 0L, 0L)) // b = 0
    val rz = Eval.oddsRiskRatio(zero.toDF("sc", "e", "o"), "sc", "e", "o")
      .collect().head
    assert(rz.isNullAt(5) && rz.isNullAt(6) && rz.isNullAt(7))
    assert(!rz.isNullAt(8), "RR survives b = 0 (only needs a,c > 0)")
  }

  test("mcnemar: discordant pairs only, corrected chi2, degenerate null") {
    import spark.implicits._
    // 5 units flip 0->1, 1 flips 1->0, concordants don't matter:
    // chi2 = (|5-1|-1)^2 / 6 = 1.5
    val rows = Seq.fill(5)(("s", 0L, 1L)) ++ Seq(("s", 1L, 0L)) ++
      Seq.fill(10)(("s", 1L, 1L)) ++ Seq.fill(7)(("s", 0L, 0L))
    val r = Eval.mcnemar(rows.toDF("sc", "a", "b"), "sc", "a", "b")
      .collect().head
    assert(r.getAs[Long]("n") == 23)
    assert(r.getAs[Long]("n01") == 5 && r.getAs[Long]("n10") == 1)
    assert(r.getAs[Double]("chi2") == 1.5)
    // no discordant pairs -> null, loudly
    val conc = Seq(("s", 1L, 1L), ("s", 0L, 0L)).toDF("sc", "a", "b")
    assert(Eval.mcnemar(conc, "sc", "a", "b").collect().head.isNullAt(4))
    // balanced discordance keeps the Edwards correction: (0-1)^2/2 = 0.5
    val bal = Seq(("s", 0L, 1L), ("s", 1L, 0L)).toDF("sc", "a", "b")
    assert(Eval.mcnemar(bal, "sc", "a", "b").collect().head
      .getAs[Double]("chi2") == 0.5)
  }

  test("kruskalWallis: hand-computed H, tie correction, degenerate nulls") {
    import spark.implicits._
    // textbook no-tie case: A={1,2,3} B={4,5,6} C={7,8,9}
    // rank sums 6/15/24 -> H = 12/90*(12+75+192) - 30 = 7.2; no ties
    val clean = Seq(("s", "a", 1L), ("s", "a", 2L), ("s", "a", 3L),
      ("s", "b", 4L), ("s", "b", 5L), ("s", "b", 6L),
      ("s", "c", 7L), ("s", "c", 8L), ("s", "c", 9L))
      .toDF("sc", "g", "v")
    val r = Eval.kruskalWallis(clean, "sc", "g", "v").collect().head
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n") == 9)
    assert(math.abs(r.getAs[Double]("h") - 7.2) < 1e-12)
    assert(r.getAs[Double]("h_adj") == r.getAs[Double]("h"),
      "no ties -> correction is exactly 1")

    // tied case: A={1,1} B={1,2}: mid-rank(1)=2, rank(2)=4
    // H = 12/20*(16/2+36/2) - 15 = 0.6; C = 1 - 24/60 = 0.6; H' = 1.0
    val tied = Seq(("s", "a", 1L), ("s", "a", 1L),
      ("s", "b", 1L), ("s", "b", 2L)).toDF("sc", "g", "v")
    val t = Eval.kruskalWallis(tied, "sc", "g", "v").collect().head
    assert(math.abs(t.getAs[Double]("h") - 0.6) < 1e-12)
    assert(math.abs(t.getAs[Double]("h_adj") - 1.0) < 1e-12)

    // k = 1 -> h null; all-tied two groups -> h = 0, h_adj null
    val one = Seq(("s", "a", 1L), ("s", "a", 2L)).toDF("sc", "g", "v")
    assert(Eval.kruskalWallis(one, "sc", "g", "v").collect().head
      .isNullAt(3))
    val allTied = Seq(("s", "a", 5L), ("s", "b", 5L), ("s", "b", 5L))
      .toDF("sc", "g", "v")
    val at = Eval.kruskalWallis(allTied, "sc", "g", "v").collect().head
    assert(at.getAs[Double]("h") == 0.0 && at.isNullAt(4))
  }

  test("kruskalWallis: partitioning-invariant (exact integer moments)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 4000).map(i =>
      ("s" + (i % 3), "g" + rnd.nextInt(5), rnd.nextInt(200).toLong))
    val df = rows.toDF("sc", "g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Eval.kruskalWallis(d, "sc", "g", "v")
        .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1).toSeq
    assert(run(df.repartition(1)) == run(df.repartition(32, col("v"))),
      "doubled-rank censuses + ordered fold make H bit-stable")
  }

  test("cliffsDelta: dominance extremes, tie midpoint, Romano bands") {
    import spark.implicits._
    def run(rows: Seq[(String, Int, Long)]) =
      Eval.cliffsDelta(rows.toDF("g", "lab", "v"), "g", "lab", "v")
        .collect().map(r => r.getAs[String]("g") ->
          ((Option(r.getAs[java.lang.Double]("delta")).map(_.toDouble),
            r.getAs[String]("magnitude")))).toMap
    // complete dominance: every a > every b -> delta 1, "large"
    val dom = Seq(("d", 1, 10L), ("d", 1, 11L), ("d", 0, 1L), ("d", 0, 2L))
    assert(run(dom)("d") == ((Some(1.0), "large")))
    // identical singletons -> all pairs tied -> delta 0, "negligible"
    val tie = Seq(("t", 1, 5L), ("t", 0, 5L))
    assert(run(tie)("t") == ((Some(0.0), "negligible")))
    // one side empty -> null delta and band, loudly
    val empt = Seq(("e", 1, 3L), ("e", 1, 4L))
    assert(run(empt)("e") == ((None, null)))
    // band boundary is an EXACT integer compare: 3 of 4 pairs win, 1
    // loses -> delta = 1/2 ("large" needs |d| >= .474; 0.5 qualifies)
    val half = Seq(("h", 1, 10L), ("h", 1, 2L), ("h", 0, 1L), ("h", 0, 3L))
    assert(run(half)("h") == ((Some(0.5), "large")))
  }

  test("cochranQ: textbook 2-treatment case equals McNemar without " +
      "correction; degenerate blocks null") {
    import spark.implicits._
    // blocks 1..4: t1 = (1,1,0,0), t2 = (1,0,0,1); discordant 2, both
    // ways 1/1 -> Q = (2-1)(2*(4+4)-16)/(2*4-8+...) compute directly:
    // C = (2,2) -> sc=4 sc2=8; R = (2,1,0,1) -> sr=4 sr2=6
    // Q = 1*(2*8-16)/(2*4-6) = 0/2 = 0 (symmetric discordance)
    val rows = Seq((1, "t1", 1L), (2, "t1", 1L), (3, "t1", 0L), (4, "t1", 0L),
      (1, "t2", 1L), (2, "t2", 0L), (3, "t2", 0L), (4, "t2", 1L))
    val r = Eval.cochranQ(rows.toDF("b", "tr", "x"), "b", "tr", "x")
      .collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Double]("q") == 0.0)
    // one-sided discordance: t1 always 1, t2 always 0 over 3 blocks
    // C=(3,0) sc=3 sc2=9; R=(1,1,1) sr=3 sr2=3; Q = (2*9-9)/(6-3) = 3
    val oneway = Seq((1, "t1", 1L), (2, "t1", 1L), (3, "t1", 1L),
      (1, "t2", 0L), (2, "t2", 0L), (3, "t2", 0L))
    assert(Eval.cochranQ(oneway.toDF("b", "tr", "x"), "b", "tr", "x")
      .collect().head.getAs[Double]("q") == 3.0)
    // all blocks all-1 -> denominator 0 -> null
    val flat = Seq((1, "t1", 1L), (1, "t2", 1L), (2, "t1", 1L), (2, "t2", 1L))
    assert(Eval.cochranQ(flat.toDF("b", "tr", "x"), "b", "tr", "x")
      .collect().head.isNullAt(2))
    // duplicate observations max-collapse; absent cell reads 0
    val dup = Seq((1, "t1", 1L), (1, "t1", 0L), (1, "t2", 0L),
      (2, "t1", 1L), (2, "t2", 0L), (3, "t2", 0L), (3, "t1", 1L))
    assert(Eval.cochranQ(dup.toDF("b", "tr", "x"), "b", "tr", "x")
      .collect().head.getAs[Double]("q") == 3.0)
  }

  test("diffInDiff: cancels level and common trend exactly; empty cell " +
      "nulls loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, Boolean, Boolean, Long)]) =
      Eval.diffInDiff(rows.toDF("sc", "t", "q", "y"), "sc",
        col("t"), col("q"), "y").collect().head
    // control: 10 pre -> 20 post (+10 trend). treated: 50 pre -> 75
    // post (+25): DiD = 25 - 10 = 15 regardless of the level gap
    val rows = Seq(
      ("s", true, false, 49L), ("s", true, false, 51L),
      ("s", true, true, 74L), ("s", true, true, 76L),
      ("s", false, false, 9L), ("s", false, false, 11L),
      ("s", false, true, 19L), ("s", false, true, 21L))
    val r = run(rows)
    assert(r.getAs[Double]("did") == 15.0)
    assert(r.getAs[Double]("lo") < 15.0 && r.getAs[Double]("hi") > 15.0)
    // interval is symmetric around the point estimate
    assert(math.abs((r.getAs[Double]("hi") + r.getAs[Double]("lo")) / 2
      - 15.0) < 1e-9)
    // missing control-post cell -> null DiD, loudly
    val holey = rows.filterNot(x => !x._2 && x._3)
    assert(run(holey).isNullAt(5))
    // single-row cells: DiD computes, interval nulls (no variance)
    val singles = Seq(("x", true, false, 5L), ("x", true, true, 9L),
      ("x", false, false, 1L), ("x", false, true, 2L))
    val s = run(singles)
    assert(s.getAs[Double]("did") == 3.0 && s.isNullAt(6) && s.isNullAt(7))
  }

  test("metaFixedEffect: agreeing strata pool with I2 = 0 shape; " +
      "disagreeing strata flag heterogeneity; weights favor precision") {
    import spark.implicits._
    def run(rows: Seq[(String, Double, Double)]) =
      Eval.metaFixedEffect(rows.toDF("st", "e", "v"), "st", "e", "v")
        .collect().head
    // identical effects: pooled = effect, Q = 0, I2 null (0/0 guarded)
    val same = Seq(("a", 2.0, 1.0), ("b", 2.0, 0.5), ("c", 2.0, 2.0))
    val r = run(same)
    assert(r.getAs[Long]("k") == 3L && r.getAs[Double]("pooled") == 2.0)
    assert(r.getAs[Double]("q") == 0.0 && r.isNullAt(4))
    // precision-weighted: var 0.1 stratum dominates the var 10 one
    val skew = Seq(("a", 1.0, 0.1), ("b", 9.0, 10.0))
    val p = run(skew).getAs[Double]("pooled")
    assert(p > 1.0 && p < 1.2, s"pooled $p should hug the precise stratum")
    // gross disagreement at tight variances -> I2 near 1
    val het = Seq(("a", 0.0, 0.01), ("b", 10.0, 0.01), ("c", -10.0, 0.01))
    assert(run(het).getAs[Double]("i_squared") > 0.99)
    // non-positive variance rows are excluded, not poison
    val dirty = same ++ Seq(("z", 99.0, 0.0))
    assert(run(dirty).getAs[Long]("k") == 3L)
  }

  test("welchT: textbook moments; singleton arm nulls t but keeps the " +
      "mean; zero variance nulls loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, Boolean, Long)]) =
      Eval.welchT(rows.toDF("sc", "a", "y"), "sc", col("a"), "y")
        .collect().head
    // A = [1,2,3] (mean 2, var 1), B = [5,6,7,8] (mean 6.5, var 5/3):
    // se2 = 1/3 + 5/12 = 0.75, t = -4.5/sqrt(0.75), sp2 = 1.4
    val rows = Seq(("s", true, 1L), ("s", true, 2L), ("s", true, 3L),
      ("s", false, 5L), ("s", false, 6L), ("s", false, 7L),
      ("s", false, 8L))
    val r = run(rows)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("diff") == -4.5)
    assert(math.abs(r.getAs[Double]("t") - (-4.5 / math.sqrt(0.75))) < 1e-9)
    val vna = 1.0 / 3; val vnb = (5.0 / 3) / 4
    val dfw = 0.75 * 0.75 / (vna * vna / 2 + vnb * vnb / 3)
    assert(math.abs(r.getAs[Double]("df") - dfw) < 1e-6)
    assert(math.abs(r.getAs[Double]("cohen_d") -
      (-4.5 / math.sqrt(1.4))) < 1e-9)
    // singleton arm: means and diff survive, t/df/d null
    val one = run(Seq(("x", true, 7L), ("x", false, 1L), ("x", false, 3L)))
    assert(one.getAs[Double]("mean_a") == 7.0 &&
      one.getAs[Double]("diff") == 5.0 && one.isNullAt(6) && one.isNullAt(7))
    // both arms constant: se = 0 -> t null, not Inf
    val flat = run(Seq(("z", true, 4L), ("z", true, 4L),
      ("z", false, 4L), ("z", false, 4L)))
    assert(flat.isNullAt(6) && flat.isNullAt(8))
  }

  test("anovaF: equal means give F = 0; separated groups explain all " +
      "variance; degenerate shapes null") {
    import spark.implicits._
    def run(rows: Seq[(String, String, Long)]) =
      Eval.anovaF(rows.toDF("sc", "g", "y"), "sc", "g", "y")
        .collect().head
    // [1,2,3] vs [4,5,6]: SSB 13.5, SSW 4, F 13.5, eta2 = 13.5/17.5
    val r = run(Seq(("s", "a", 1L), ("s", "a", 2L), ("s", "a", 3L),
      ("s", "b", 4L), ("s", "b", 5L), ("s", "b", 6L)))
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("ssb") == 13.5 && r.getAs[Double]("ssw") == 4.0)
    assert(r.getAs[Double]("f") == 13.5)
    assert(math.abs(r.getAs[Double]("eta_sq") - 13.5 / 17.5) < 1e-9)
    // identical group means: no between variance at all
    val eq = run(Seq(("s", "a", 1L), ("s", "a", 3L),
      ("s", "b", 2L), ("s", "b", 2L)))
    assert(eq.getAs[Double]("ssb") == 0.0 && eq.getAs[Double]("f") == 0.0)
    // perfectly separated constants: SSW = 0 -> F null, eta2 = 1
    val sep = run(Seq(("s", "a", 0L), ("s", "a", 0L),
      ("s", "b", 10L), ("s", "b", 10L)))
    assert(sep.isNullAt(5) && sep.getAs[Double]("eta_sq") == 1.0)
    // one group: k < 2 -> F null
    assert(run(Seq(("s", "a", 1L), ("s", "a", 2L))).isNullAt(5))
  }

  test("stratifiedAte: recovers the true effect under stratum " +
      "confounding the naive diff misses; one-armed strata drop loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, String, Boolean, Long)]) =
      Eval.stratifiedAte(rows.toDF("sc", "st", "tr", "y"), "sc", "st",
        col("tr"), "y").collect().head
    // stratum A base 0, stratum B base 100; treatment adds exactly 10.
    // Treated rows live mostly in B, control mostly in A -> naive diff
    // is inflated by the mix, stratified ATE is exactly 10.
    val rows = Seq(
      ("s", "A", true, 10L), ("s", "A", true, 12L),
      ("s", "A", false, 0L), ("s", "A", false, 2L),
      ("s", "A", false, 1L), ("s", "A", false, 1L),
      ("s", "B", true, 110L), ("s", "B", true, 112L),
      ("s", "B", true, 111L), ("s", "B", true, 111L),
      ("s", "B", false, 100L), ("s", "B", false, 102L))
    val r = run(rows)
    // within-stratum diffs are both exactly 10
    assert(r.getAs[Double]("ate") == 10.0)
    assert(r.getAs[Double]("naive_diff") > 40.0,
      s"naive ${r.getAs[Double]("naive_diff")} should be mix-inflated")
    assert(r.getAs[Long]("k_used") == 2L && r.getAs[Long]("n") == 12L)
    assert(r.getAs[Double]("lo") < 10.0 && r.getAs[Double]("hi") > 10.0)
    // a stratum with no control arm drops (and leaves N)
    val holey = rows ++ Seq(("s", "C", true, 999L), ("s", "C", true, 998L))
    val h = run(holey)
    assert(h.getAs[Long]("k_dropped") == 1L && h.getAs[Long]("n") == 12L &&
      h.getAs[Double]("ate") == 10.0)
    // a kept stratum with a singleton arm keeps the ATE, nulls the CI
    val thin = rows ++ Seq(("s", "D", true, 50L), ("s", "D", false, 40L))
    val t = run(thin)
    assert(!t.isNullAt(5) && t.isNullAt(6) && t.isNullAt(7))
  }

  test("bayesianAB: exact Beta-ratio sum matches the hand-computed " +
      "closed form; arm swap complements; normal fallback agrees at " +
      "the seam") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, Boolean, Long)], cap: Long = 4096L) =
      Eval.bayesianAB(rows.toDF("sc", "a", "y"), "sc", col("a"), "y",
        maxTerms = cap).collect().head
    // A: 1/2 hits -> Beta(2,2); B: 2/2 -> Beta(3,1); P(B>A) = 0.8
    // (i-terms 0.5 + 0.2 + 0.1, worked from B(a,b) ratios)
    val rows = Seq(("s", true, 1L), ("s", true, 0L),
      ("s", false, 1L), ("s", false, 1L))
    val r = run(rows)
    assert(r.getAs[String]("method") == "exact")
    assert(math.abs(r.getAs[Double]("p_b_gt_a") - 0.8) < 1e-8)
    assert(r.getAs[Double]("mean_a") == 0.5 &&
      r.getAs[Double]("mean_b") == 0.75)
    // swapping the arms complements the probability exactly
    val sw = run(rows.map { case (s, a, y) => (s, !a, y) })
    assert(math.abs(r.getAs[Double]("p_b_gt_a") +
      sw.getAs[Double]("p_b_gt_a") - 1.0) < 1e-9)
    // seam: same 480/1000-vs-520/1000 data, exact vs forced-normal
    // agree to ~1e-3 (the documented no-jump contract)
    val big = (1 to 1000).map(i => ("s", true, if (i <= 480) 1L else 0L)) ++
      (1 to 1000).map(i => ("s", false, if (i <= 520) 1L else 0L))
    val exact = run(big)
    val normal = run(big, cap = 10L)
    assert(exact.getAs[String]("method") == "exact" &&
      normal.getAs[String]("method") == "normal")
    val pe = exact.getAs[Double]("p_b_gt_a")
    val pnn = normal.getAs[Double]("p_b_gt_a")
    assert(pe > 0.9 && math.abs(pe - pnn) < 2e-3,
      s"exact $pe vs normal $pnn")
  }

  test("infoGainSplit: perfect separation earns ln 2; interior cut " +
      "beats edge cuts; constant scope vanishes") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)]) =
      Eval.infoGainSplit(rows.toDF("sc", "v", "y"), "sc", "v", "y")
        .collect().map(r => r.getAs[String]("sc") ->
          ((r.getAs[Long]("threshold"), r.getAs[Double]("gain")))).toMap
    // v=1 all negative, v=2 all positive: cut at 1, gain = H(1/2) = ln 2
    val perfect = Seq(("s", 1L, 0L), ("s", 1L, 0L), ("s", 2L, 1L),
      ("s", 2L, 1L))
    val p = run(perfect)("s")
    assert(p._1 == 1L && math.abs(p._2 - math.log(2.0)) < 1e-12)
    // labels 0,0,1,0 over v=1..4: the v<=2 cut isolates the clean left
    val mid = run(Seq(("s", 1L, 0L), ("s", 2L, 0L), ("s", 3L, 1L),
      ("s", 4L, 0L)))("s")
    assert(mid._1 == 2L)
    // constant label: zero gain everywhere, argmax takes the lowest v
    val flat = run(Seq(("s", 1L, 1L), ("s", 2L, 1L), ("s", 3L, 1L)))("s")
    assert(flat._1 == 1L && flat._2 == 0.0)
    // single distinct value: no candidate cut -> scope absent (loud)
    assert(!run(Seq(("t", 7L, 1L), ("t", 7L, 0L))).contains("t"))
  }

  test("benjaminiHochberg: step-up q-values match hand computation; " +
      "the monotone min rescues and rejects correctly") {
    import spark.implicits._
    def run(ps: Seq[(String, Double)]) =
      Eval.benjaminiHochberg(ps.toDF("t", "p"), "t", "p")
        .collect().map(r => r.getAs[String]("test") ->
          ((r.getAs[Double]("q_value"), r.getAs[Boolean]("reject"),
            r.getAs[Long]("rank")))).toMap
    // k=3: raw = [.015, .0735, .0495] -> suffix-min q = [.015, .0495,
    // .0495]: the later cheap test RESCUES t2's .0735
    val r = run(Seq(("t1", 0.005), ("t2", 0.049), ("t3", 0.0495)))
    assert(math.abs(r("t1")._1 - 0.015) < 1e-12)
    assert(math.abs(r("t2")._1 - 0.0495) < 1e-12 && r("t2")._2,
      s"t2 ${r("t2")} should be rescued by the step-up")
    assert(r.values.forall(_._2))
    // add a big p: k=4 raws [.02, .098, .066, .9] -> only t1 rejects
    val r4 = run(Seq(("t1", 0.005), ("t2", 0.049), ("t3", 0.0495),
      ("t4", 0.9)))
    assert(r4("t1")._2 && !r4("t2")._2 && !r4("t3")._2 && !r4("t4")._2)
    assert(math.abs(r4("t2")._1 - 0.0495 * 4 / 3) < 1e-12,
      s"t2 q should be min(raw2, raw3) = ${r4("t2")._1}")
    // q caps at 1
    assert(run(Seq(("a", 0.9), ("b", 0.99))).values.forall(_._1 <= 1.0))
    // ranks are 1..k with ties split by test id
    assert(r4.values.map(_._3).toSeq.sorted == Seq(1L, 2L, 3L, 4L))
  }

  test("benjaminiYekutieli: harmonic-inflated q-values, strictly more " +
      "conservative than BH, c(k) exact") {
    import spark.implicits._
    val ps = Seq(("t1", 0.005), ("t2", 0.049), ("t3", 0.0495))
    val by = Eval.benjaminiYekutieli(ps.toDF("t", "p"), "t", "p")
      .collect().map(r => r.getAs[String]("test") ->
        ((r.getAs[Double]("q_value"), r.getAs[Boolean]("reject"),
          r.getAs[Double]("c_k")))).toMap
    val c3 = 1.0 + 1.0 / 2 + 1.0 / 3
    assert(by.values.forall(_._3 == c3))
    // hand: raws = BH raws * c3 -> [.015c, .0735c, .0495c], suffix-min
    assert(math.abs(by("t1")._1 - 0.015 * c3) < 1e-12)
    assert(math.abs(by("t2")._1 - 0.0495 * c3) < 1e-12)
    // BY never rejects what BH doesn't: q_BY >= q_BH everywhere
    val bh = Eval.benjaminiHochberg(ps.toDF("t", "p"), "t", "p")
      .collect().map(r => r.getAs[String]("test") ->
        r.getAs[Double]("q_value")).toMap
    by.foreach { case (t, (q, rej, _)) =>
      assert(q >= bh(t) - 1e-15)
      if (rej) assert(bh(t) <= 0.05)
    }
    // at alpha .05 the inflated t2/t3 (q ~.0908) no longer reject
    assert(by("t1")._2 && !by("t2")._2 && !by("t3")._2)
  }

  test("jonckheereTerpstra: hand-computed 2J/E/Var with ties across " +
      "sparse value grids; monotone ramp maxes J; reversed order flips z") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long)]) =
      Eval.jonckheereTerpstra(rows.toDF("g", "v"), "g", "v").head()
    // g1: {1,2}, g2: {2,3}, g3: {4} — hand: 2J = 15 (3 strict + 1 tie
    // in (1,2); 2 strict each in (1,3),(2,3)); E2J = (25-9)/2 = 8;
    // Var = [25*13 - (28+28+5)]/72 = 264/72
    val r = run(Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("j2") == 15L && r.getAs[Long]("e2") == 8L)
    assert(math.abs(r.getAs[Double]("var_j") - 264.0 / 72) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") -
      7.0 / (2.0 * math.sqrt(264.0 / 72))) < 1e-12)
    // strictly increasing groups: every cross-group pair concordant,
    // 2J = 2 * (n^2 - sum n_g^2)/2 = its own maximum
    val ramp = (1L to 4L).flatMap(g => Seq((g, g * 10L), (g, g * 10L + 1)))
    val rr = run(ramp)
    assert(rr.getAs[Long]("j2") == 2L * rr.getAs[Long]("e2"))
    assert(rr.getAs[Double]("z") > 2.5)
    // reversing the group order flips the sign exactly
    val rev = run(ramp.map { case (g, v) => (5L - g, v) })
    assert(rev.getAs[Double]("z") == -rr.getAs[Double]("z"))
  }

  test("cochranArmitage: hand T/Var/z on a rising ladder, exact zero " +
      "on flat proportions, degenerate variance nulls z") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long)]) =
      Eval.cochranArmitage(rows.toDF("g", "y"), "g", "y").head()
    // groups 1,2,3 with 4 trials each and 1,2,3 successes:
    // pbar = .5, T = 14 - 24*.5 = 2, Var = .25*(56 - 48) = 2
    val rising = (1L to 3L).flatMap(g =>
      (1L to 4L).map(i => (g, if (i <= g) 1L else 0L)))
    val r = run(rising)
    assert(r.getAs[Long]("n") == 12L && r.getAs[Long]("n_success") == 6L)
    assert(r.getAs[Double]("t") == 2.0 && r.getAs[Double]("var_t") == 2.0)
    assert(math.abs(r.getAs[Double]("z") - 2.0 / math.sqrt(2.0)) < 1e-15)
    // identical proportions in every group: T exactly 0
    val flat = (1L to 3L).flatMap(g => Seq((g, 1L), (g, 0L)))
    assert(run(flat).getAs[Double]("t") == 0.0)
    // single group: score variance 0 -> z null
    val one = Seq((5L, 1L), (5L, 0L), (5L, 1L))
    assert(run(one).isNullAt(run(one).fieldIndex("z")))
  }

  test("pageTrend: perfectly-ordered blocks hit the hand L/E/Var, " +
      "reversed blocks mirror around E, incomplete blocks dropped loudly") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)]) =
      Eval.pageTrend(rows.toDF("b", "j", "x"), "b", "j", "x").head()
    // two blocks, k = 3, values rise with treatment in both:
    // within-block ranks = treatment index -> L = 2*(1+4+9) = 28,
    // E = 2*3*16/4 = 24, Var = 2*288/144 = 4, z = 2
    val asc = for (b <- Seq("a", "b"); j <- 1L to 3L) yield (b, j, j * 10)
    val r = run(asc)
    assert(r.getAs[Long]("l") == 28L && r.getAs[Double]("e_l") == 24.0)
    assert(r.getAs[Double]("var_l") == 4.0 && r.getAs[Double]("z") == 2.0)
    assert(r.getAs[Long]("n_blocks_dropped") == 0L)
    // reversed values: L mirrors to 2E - 28 = 20, z = -2
    val desc = asc.map { case (b, j, x) => (b, j, 40L - x) }
    val rd = run(desc)
    assert(rd.getAs[Long]("l") == 20L && rd.getAs[Double]("z") == -2.0)
    // a block missing treatment 3 is excluded and counted
    val withIncomplete = asc ++ Seq(("c", 1L, 5L), ("c", 2L, 6L))
    val ri = run(withIncomplete)
    assert(ri.getAs[Long]("n_blocks") == 2L &&
      ri.getAs[Long]("n_blocks_dropped") == 1L)
    assert(ri.getAs[Long]("l") == 28L)
  }

  test("pageTrend: treatment labels keep only their ORDER — 0-based and " +
      "non-consecutive labels match the canonical 1..k statistic") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)]) =
      Eval.pageTrend(rows.toDF("b", "j", "x"), "b", "j", "x").head()
    val canon = run(for (b <- Seq("a", "b"); j <- 1L to 3L)
      yield (b, j, j * 10))
    // 0-based {0,1,2}: raw labels would shift L by -sum(r) and bias z;
    // dense-ranked coefficients reproduce the 1..k statistic exactly
    val zeroBased = run(for (b <- Seq("a", "b"); j <- 1L to 3L)
      yield (b, j - 1L, j * 10))
    // non-consecutive {2,4,6}: raw labels would DOUBLE L
    val spread = run(for (b <- Seq("a", "b"); j <- 1L to 3L)
      yield (b, j * 2L, j * 10))
    for (r <- Seq(zeroBased, spread)) {
      assert(r.getAs[Long]("l") == canon.getAs[Long]("l"), r.toString)
      assert(r.getAs[Double]("e_l") == canon.getAs[Double]("e_l"))
      assert(r.getAs[Double]("var_l") == canon.getAs[Double]("var_l"))
      assert(r.getAs[Double]("z") == canon.getAs[Double]("z"))
    }
  }

  test("mantelHaenszel: hand OR/chi2 across two strata, null-effect " +
      "stratum dilutes, OR null when the denominator vanishes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, Boolean, Boolean)]) =
      Eval.mantelHaenszel(rows.toDF("s", "e", "y"), "s",
        col("e"), col("y")).head()
    def cells(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    // s1: (3,1,1,3) -> ad/n = 9/8, bc/n = 1/8, E = 2, V = 256/448
    // s2: (2,2,2,2) -> 4/8, 4/8, E = 2, V = 256/448
    // OR = (13/8)/(5/8) = 2.6; chi2 = (|5-4|-.5)^2/(8/7) = 0.21875
    val r = run(cells("s1", 3, 1, 1, 3) ++ cells("s2", 2, 2, 2, 2))
    assert(r.getAs[Long]("n_strata") == 2L && r.getAs[Long]("n") == 16L)
    assert(math.abs(r.getAs[Double]("or_mh") - 2.6) < 1e-12)
    assert(math.abs(r.getAs[Double]("chi2") - 0.21875) < 1e-12)
    // a lone stratum with bc = 0 in EVERY stratum: denominator 0 -> null
    val inf = run(cells("s1", 2, 1, 0, 3))
    assert(inf.isNullAt(inf.fieldIndex("or_mh")))
    // |sum_a - E| < 0.5: the continuity correction clamps to 0 instead
    // of INFLATING chi2 (the (0 - 0.5)^2 anti-conservative regime);
    // balanced (2,2,2,2) gives sum_a = E = 2 exactly
    val bal = run(cells("s1", 2, 2, 2, 2))
    assert(bal.getAs[Double]("chi2") == 0.0, bal.toString)
    assert(math.abs(bal.getAs[Double]("p") - 1.0) < 1e-6, bal.toString)
  }

  test("breslowDay: identical strata are perfectly homogeneous, " +
      "opposite strata hit the hand chi2, zero-margin strata excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, Boolean, Boolean)]) =
      Eval.breslowDay(rows.toDF("s", "e", "y"), "s", col("e"), col("y"))
        .head()
    def cells(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    // two identical (3,1,1,3) strata: psi = 9; the quadratic root in
    // range is exactly the observed a = 3 -> chi2 = 0 on 1 df
    val homo = run(cells("s1", 3, 1, 1, 3) ++ cells("s2", 3, 1, 1, 3))
    assert(homo.getAs[Long]("n_strata") == 2L &&
      homo.getAs[Long]("n_informative") == 2L)
    assert(math.abs(homo.getAs[Double]("psi") - 9.0) < 1e-12)
    assert(math.abs(homo.getAs[Double]("chi2_bd")) < 1e-9, homo.toString)
    assert(homo.getAs[Long]("df") == 1L)
    // opposite strata (OR 9 vs OR 1/9): psi = 1 (linear branch),
    // a-tilde = 2, Var = 1/2 each -> chi2_bd = 1/0.5 + 1/0.5 = 4;
    // deviations cancel so Tarone = chi2_bd exactly
    val het = run(cells("s1", 3, 1, 1, 3) ++ cells("s2", 1, 3, 3, 1))
    assert(math.abs(het.getAs[Double]("psi") - 1.0) < 1e-12)
    assert(math.abs(het.getAs[Double]("chi2_bd") - 4.0) < 1e-9)
    assert(math.abs(het.getAs[Double]("chi2_tarone") - 4.0) < 1e-9)
    // a zero-margin stratum (everyone succeeds) is uninformative: it
    // contributes nothing to psi's folds or the chi2 sums
    val extra = run(cells("s1", 3, 1, 1, 3) ++ cells("s2", 3, 1, 1, 3) ++
      cells("s3", 2, 0, 2, 0))
    assert(extra.getAs[Long]("n_strata") == 3L &&
      extra.getAs[Long]("n_informative") == 2L)
    assert(math.abs(extra.getAs[Double]("psi") - 9.0) < 1e-12)
    assert(math.abs(extra.getAs[Double]("chi2_bd")) < 1e-9)
    assert(extra.getAs[Long]("df") == 1L)
    // psi undefined (bc = 0 in every stratum) -> all nulls
    val undef = run(cells("s1", 2, 1, 0, 3))
    assert(undef.isNullAt(undef.fieldIndex("psi")))
    assert(undef.isNullAt(undef.fieldIndex("chi2_bd")))
  }

  test("expectedCalibrationError: hand two-bucket miscalibration = 0.1; " +
      "a perfectly calibrated scorer lands at exactly 0") {
    import spark.implicits._
    def run(rows: Seq[(String, Int, Long)], buckets: Int) =
      Eval.expectedCalibrationError(rows.toDF("g", "y", "s"), "g", "y",
        "s", buckets, scoreScale = 100L)
        .collect().map(r => r.getString(0) -> r).toMap
    // bucket 0: conf 0.10 obs 0.0; bucket 1: conf 0.90 obs 1.0 ->
    // ECE = (2*0.1 + 2*0.1)/4 = 0.1
    val off = Seq(("a", 0, 10L), ("a", 0, 10L), ("a", 1, 90L),
      ("a", 1, 90L))
    val ra = run(off, 2)("a")
    assert(ra.getAs[Long]("n") == 4L && ra.getAs[Long]("n_buckets") == 2L)
    assert(math.abs(ra.getAs[Double]("ece") - 0.1) < 1e-12)
    // score 50 with half the labels positive: |0.5 - 0.5| = 0
    val cal = Seq(("c", 1, 50L), ("c", 0, 50L), ("c", 1, 50L),
      ("c", 0, 50L))
    assert(run(cal, 2)("c").getAs[Double]("ece") == 0.0)
  }

  test("kendallW: perfect agreement gives W = 1 and rho_bar = 1; two " +
      "opposite raters give W = 0 and rho_bar = -1") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)]) =
      Eval.kendallW(rows.toDF("b", "tr", "v"), "b", "tr", "v").head()
    // three raters, identical 1<2<3 ordering: chi2_F = m(k-1) = 6
    val agree = for (b <- Seq("a", "b", "c"); j <- 1L to 3L)
      yield (b, j, j * 10)
    val ra = run(agree)
    assert(ra.getAs[Long]("k") == 3L && ra.getAs[Long]("n_blocks") == 3L)
    assert(math.abs(ra.getAs[Double]("chi2") - 6.0) < 1e-12)
    assert(math.abs(ra.getAs[Double]("w") - 1.0) < 1e-12)
    assert(math.abs(ra.getAs[Double]("rho_bar") - 1.0) < 1e-12)
    // two raters in exact opposition: rank sums equalize -> W = 0,
    // mean pairwise Spearman = -1
    val oppose = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 1L, 30L), ("b", 2L, 20L), ("b", 3L, 10L))
    val ro = run(oppose)
    assert(ro.getAs[Double]("w") == 0.0)
    assert(math.abs(ro.getAs[Double]("rho_bar") + 1.0) < 1e-12)
  }

  test("linCcc: identity agreement = 1, a constant shift or a scale " +
      "bias drops concordance below correlation") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)]) =
      Eval.linCcc(rows.toDF("s", "x", "y"), "s", "x", "y")
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Double]("ccc"), r.getLong(1)))).toMap
    val xs = Seq(1L, 2L, 3L, 4L, 5L)
    val ident = xs.map(x => ("i", x, x))
    val shift = xs.map(x => ("sh", x, x + 3))
    val scale = xs.map(x => ("sc", x, x * 2))
    val got = run(ident ++ shift ++ scale)
    assert(got("i")._1 == 1.0)
    // shift: cov = var = 2, gap = 9 -> ccc = 4/(4+9)
    assert(math.abs(got("sh")._1 - 4.0 / 13.0) < 1e-12)
    // scale x2: cov = 2var, varY = 4var, gap = 9 -> 2*4/(2+8+9)
    assert(math.abs(got("sc")._1 - 8.0 / 19.0) < 1e-12)
    // both perfectly correlated, only identity concords
    assert(got("sh")._1 < 1.0 && got("sc")._1 < 1.0)
  }

  test("sprt: strong evidence accepts H1 and latches; weak evidence " +
      "accepts H0; borderline continues") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)]) =
      Eval.sprt(rows.toDF("sc", "p", "y"), "sc", "p", "y",
        p0Milli = 400L, p1Milli = 600L, alphaMilli = 50L, betaMilli = 50L)
        .collect().map(r => (r.getAs[String]("sc"), r.getAs[Long]("p")) ->
          ((r.getAs[Long]("cum_s"), r.getAs[String]("state")))).toMap
    // all successes: LLR grows by ln(1.5) per hit; ln(19)/ln(1.5)≈7.3
    // -> crosses at the 8th success. Periods of 4: cross in period 2,
    // and the verdict LATCHES for period 3 even after failures
    val hot = (1L to 8L).map(i => ("h", (i - 1) / 4 + 1, 1L)) ++
      Seq(("h", 3L, 0L), ("h", 3L, 0L), ("h", 3L, 0L))
    val h = run(hot)
    assert(h(("h", 1L))._2 == "continue")
    assert(h(("h", 2L))._2 == "accept_h1")
    assert(h(("h", 3L))._2 == "accept_h1", "verdict must latch")
    // all failures: LLR falls by ln(400/600) per miss; crosses lo fast
    val cold = (1L to 10L).map(i => ("c", (i - 1) / 5 + 1, 0L))
    assert(run(cold)(("c", 2L))._2 == "accept_h0")
    // a 50/50 stream stays between the bounds
    val mid = (1L to 10L).map(i => ("m", i, i % 2))
    assert(run(mid)(("m", 10L))._2 == "continue")
    // crossing ORDER latches (the r8 ADVICE bug): a series that crosses
    // the LOWER bound first (10 straight misses -> accept_h0 by p2) and
    // then rallies hard past the upper bound must STAY accept_h0 — the
    // earlier crossing wins, not the h1-preferring both-flags branch.
    // ln(19)/ln(1.5) ~ 7.3 and each hit also cancels a miss's ln(2/3),
    // so 40 straight hits push LLR well above hi by period 6.
    val flip = (1L to 10L).map(i => ("f", (i - 1) / 5 + 1, 0L)) ++
      (1L to 40L).map(i => ("f", (i - 1) / 10 + 3, 1L))
    val f = run(flip)
    assert(f(("f", 2L))._2 == "accept_h0")
    val llrHi = math.log(950.0 / 50.0)
    // sanity: the rally really does cross hi (the test would be vacuous
    // if LLR never re-crossed) — 40*ln(1.5) + 10*ln(2/3) > ln(19)
    assert(40 * math.log(1.5) + 10 * math.log(400.0 / 600.0) > llrHi)
    assert(f(("f", 6L))._2 == "accept_h0",
      "earlier lo-crossing must not be un-rung by a later hi-crossing")
  }

  test("cuped: perfectly-correlated covariate removes all variance; " +
      "constant covariate nulls theta; adjustment preserves balanced diff") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, Boolean, Long, Long)]) =
      Eval.cuped(rows.toDF("sc", "a", "x", "y"), "sc", col("a"), "x", "y")
        .collect().map(r => r.getAs[String]("sc") -> r).toMap
    // y = 2x exactly, arms differ only through x -> theta = 2,
    // var_reduction = 1 - rho^2 = 0, and adj means collapse to equal
    val prop = Seq(("p", true, 10L, 20L), ("p", true, 12L, 24L),
      ("p", false, 20L, 40L), ("p", false, 22L, 44L))
    val p = run(prop)("p")
    assert(p.getAs[Double]("theta") == 2.0)
    assert(math.abs(p.getAs[Double]("var_reduction")) < 1e-12)
    assert(math.abs(p.getAs[Double]("adj_diff")) < 1e-9,
      "x explained the whole arm gap")
    assert(p.getAs[Double]("diff") == -20.0)
    // constant covariate -> var(x) = 0 -> theta/adj null, raw diff kept
    val const = Seq(("c", true, 5L, 10L), ("c", false, 5L, 30L))
    val c = run(const)("c")
    assert(c.isNullAt(5) && c.getAs[Double]("diff") == -20.0)
    // balanced covariate across arms: adjustment leaves diff intact
    // (xa = xb = xbar -> adj_diff == diff), noisy y notwithstanding
    val bal = Seq(("b", true, 1L, 7L), ("b", true, 3L, 13L),
      ("b", false, 1L, 9L), ("b", false, 3L, 19L))
    val b = run(bal)("b")
    assert(math.abs(b.getAs[Double]("adj_diff") -
      b.getAs[Double]("diff")) < 1e-12)
  }

  test("splitConformal: textbook order statistic, guaranteed coverage on " +
      "iid data, too-strict alpha nulls loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(rows: Seq[(String, Boolean, Long)], alphaMilli: Long) =
      Eval.splitConformal(rows.toDF("g", "cal", "r"), "g", col("cal"),
        "r", alphaMilli).collect()
        .map(r => r.getAs[String]("g") ->
          ((r.getAs[Long]("k"), Option(r.getAs[java.lang.Long]("qhat"))
            .map(_.toLong),
            Option(r.getAs[java.lang.Double]("coverage"))
              .map(_.toDouble)))).toMap
    // 9 calib residuals 1..9, alpha=0.1: k = ceil(10*0.9) = 9 -> qhat 9;
    // test residuals {5, 12}: coverage 1/2
    val rows = (1L to 9L).map(r => ("a", true, r)) ++
      Seq(("a", false, 5L), ("a", false, 12L))
    assert(run(rows, 100L)("a") == ((9L, Some(9L), Some(0.5))))
    // alpha=0.5: k = ceil(10*0.5) = 5 -> qhat 5, coverage 1/2 still
    assert(run(rows, 500L)("a") == ((5L, Some(5L), Some(0.5))))
    // alpha so strict k > n_calib -> null qhat and coverage
    val tiny = Seq(("t", true, 3L), ("t", false, 1L))
    assert(run(tiny, 100L)("t") == ((2L, None, None)))
    // the finite-sample guarantee: iid calib/test from one distribution
    // covers >= 1 - alpha (deterministic fixture, fixed fact)
    val rnd = new scala.util.Random(17)
    val iid = (1 to 2000).map(i =>
      ("g", i % 5 != 0, math.abs(rnd.nextInt(1000)).toLong))
    val g = run(iid, 100L)("g")
    assert(g._3.get >= 0.88, s"coverage ${g._3} below the 0.9 guarantee band")
  }

  test("krippendorffAlpha: perfect agreement 1, single-category null, " +
      "ragged units grouped by rating count") {
    import spark.implicits._
    def run(rows: Seq[(Int, String)]) =
      Eval.krippendorffAlpha(rows.toDF("u", "c"), "u", "c").collect().head
    // unanimous units over two categories -> p_a = 1, alpha = 1
    val unan = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "a"),
      (3, "a"), (3, "a"))
    val r = run(unan)
    assert(r.getAs[Double]("p_a") == 1.0 && r.getAs[Double]("alpha") == 1.0)
    assert(r.getAs[Long]("n_units") == 3L &&
      r.getAs[Long]("n_ratings") == 7L)
    // all ratings one category -> p_e = 1 -> alpha null, loudly
    val mono = Seq((1, "x"), (1, "x"), (2, "x"), (2, "x"))
    assert(run(mono).isNullAt(6))
    // single-rating units are dropped and counted, not zero-padded
    val ragged = unan ++ Seq((9, "a"), (10, "b"))
    val g = run(ragged)
    assert(g.getAs[Long]("n_dropped") == 2L &&
      g.getAs[Long]("n_units") == 3L)
    assert(g.getAs[Double]("alpha") == 1.0)
    // hand-computed mixed case: u1 = {a,b} (n=2, S2=2), u2 = {a,a}
    // (n=2, S2=4): p_a = [(2-2)/1 + (4-2)/1]/4 = 0.5
    // margins: a=3, b=1 -> p_e = (3*2 + 0)/(4*3) = 0.5
    // alpha = (0.5 - 0.5)/(1 - 0.5) = 0
    val mixed = Seq((1, "a"), (1, "b"), (2, "a"), (2, "a"))
    val m = run(mixed)
    assert(m.getAs[Double]("p_a") == 0.5 && m.getAs[Double]("p_e") == 0.5)
    assert(m.getAs[Double]("alpha") == 0.0)
  }

  test("rateRatio: exposure normalization flips the raw-count verdict; " +
      "zero arms null loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // arm1: 6 events over 1 day; arm2: 8 events over 4 days ->
    // raw counts say arm2 wins, rates say RR = 6*4/(8*1) = 3.0
    val rows = Seq.fill(6)(("s", 1, 10)) ++
      (1 to 8).map(i => ("s", 0, 20 + (i % 4)))
    val r = Eval.rateRatio(rows.toDF("s", "a", "d"), "s", col("a") === 1, "d")
      .collect().head
    assert(r.getAs[Long]("n1") == 6L && r.getAs[Long]("e1") == 1L)
    assert(r.getAs[Long]("n2") == 8L && r.getAs[Long]("e2") == 4L)
    assert(r.getAs[Double]("rate_ratio") == 3.0)
    // interval brackets the point estimate
    assert(r.getAs[Double]("lo") < 3.0 && r.getAs[Double]("hi") > 3.0)
    // an empty arm -> all null, loudly
    val one = Seq(("t", 1, 1), ("t", 1, 2))
    val o = Eval.rateRatio(one.toDF("s", "a", "d"), "s", col("a") === 1, "d")
      .collect().head
    assert(o.isNullAt(5) && o.isNullAt(6) && o.isNullAt(7))
  }

  test("cumulativeGains: perfect score captures everything in the top " +
      "decile; random score has lift 1 shape") {
    import spark.implicits._
    // 100 rows, 10 positives all at the single highest score
    val rows = (1 to 100).map(i =>
      ("g", if (i <= 10) 1 else 0, if (i <= 10) 99L else (i % 9).toLong))
    val out = Eval.cumulativeGains(rows.toDF("g", "y", "s"), "g", "y", "s",
        buckets = 10)
      .collect().map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("cum_n"), r.getAs[Long]("cum_pos"),
          r.getAs[Double]("gain"), r.getAs[Double]("lift")))).toMap
    // top decile: 10 rows, all 10 positives -> gain 1.0, lift 10.0
    assert(out(0L) == ((10L, 10L, 1.0, 10.0)))
    // gains stay 1.0 after capture; lift decays toward 1
    assert(out(9L)._3 == 1.0 && out(9L)._4 == 1.0)
    // constant score: one bucket holds everything, gain 1 lift 1
    val const = (1 to 40).map(i => ("c", i % 2, 7L))
    val c = Eval.cumulativeGains(const.toDF("g", "y", "s"), "g", "y", "s", 10)
      .collect()
    assert(c.length == 1 && c.head.getAs[Double]("lift") == 1.0)
    // no positives -> null gain/lift, loudly
    val neg = (1 to 20).map(i => ("n", 0, i.toLong))
    assert(Eval.cumulativeGains(neg.toDF("g", "y", "s"), "g", "y", "s", 10)
      .collect().forall(r => r.isNullAt(6) && r.isNullAt(7)))
  }

  test("youdenThreshold: perfect separator, useless score, and the " +
      "smallest-threshold tiebreak") {
    import spark.implicits._
    def run(rows: Seq[(String, Int, Long)]) =
      Eval.youdenThreshold(rows.toDF("g", "y", "s"), "g", "y", "s")
        .collect().map(r => r.getAs[String]("g") ->
          ((r.getAs[Long]("threshold"),
            Option(r.getAs[java.lang.Double]("j")).map(_.toDouble),
            r.getAs[Long]("tp"), r.getAs[Long]("fp")))).toMap
    // separable: pos scores {8,9}, neg {1,2} -> t=8, J=1, tp=2 fp=0
    val sep = Seq(("a", 1, 9L), ("a", 1, 8L), ("a", 0, 2L), ("a", 0, 1L))
    assert(run(sep)("a") == ((8L, Some(1.0), 2L, 0L)))
    // identical distributions: J = 0 everywhere; tiebreak picks the
    // SMALLEST candidate threshold
    val flat = Seq(("b", 1, 5L), ("b", 0, 5L), ("b", 1, 7L), ("b", 0, 7L))
    assert(run(flat)("b") == ((5L, Some(0.0), 2L, 2L)))
    // one class only -> null J, loudly
    val mono = Seq(("c", 1, 3L), ("c", 1, 4L))
    assert(run(mono)("c")._2.isEmpty)
    // asymmetric: pos {3,9}, neg {1,5}: t=9 J=1/2-0; t=5 J=1/2-1/2=0;
    // t=3 J=1-1/2=1/2; t=1 J=0 -> tie between 9 and 3 -> pick 3
    val mix = Seq(("d", 1, 3L), ("d", 1, 9L), ("d", 0, 1L), ("d", 0, 5L))
    assert(run(mix)("d") == ((3L, Some(0.5), 2L, 1L)))
  }

  test("rankEval: textbook RR/AP, k cutoff, no-hit null") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Int)], k: Int = 10) =
      Eval.rankEval(rows.toDF("q", "r", "rel"), "q", "r", "rel", k)
        .collect().map(r => r.getAs[String]("q") ->
          ((r.getAs[Long]("n_rel"),
            Option(r.getAs[java.lang.Double]("rr")).map(_.toDouble),
            Option(r.getAs[java.lang.Double]("ap")).map(_.toDouble)))).toMap
    // relevant at ranks 1 and 3 of 3: rr = 1, ap = (1/1 + 2/3)/2 = 5/6
    val a = Seq(("a", 1L, 1), ("a", 2L, 0), ("a", 3L, 1))
    assert(run(a)("a") == ((2L, Some(1.0), Some((1.0 + 2.0 / 3) / 2))))
    // first hit at rank 4: rr = 0.25, ap = (1/4)/1
    val b = Seq(("b", 1L, 0), ("b", 2L, 0), ("b", 3L, 0), ("b", 4L, 1))
    assert(run(b)("b") == ((1L, Some(0.25), Some(0.25))))
    // hit beyond k is invisible: with k=3 the rank-4 hit vanishes
    assert(run(b, k = 3)("b") == ((0L, None, None)))
    // all-irrelevant -> nulls, loudly
    val c = Seq(("c", 1L, 0), ("c", 2L, 0))
    assert(run(c)("c") == ((0L, None, None)))
  }

  test("brierDecomposition: perfect forecaster, constant forecaster, and " +
      "the Murphy identity on bin-constant scores") {
    import spark.implicits._
    def run(rows: Seq[(String, Int, Long)], buckets: Int = 10) =
      Eval.brierDecomposition(rows.toDF("g", "y", "s"), "g", "y", "s",
        scale = 100L, buckets = buckets).collect()
        .map(r => r.getAs[String]("g") -> r).toMap
    // oracle forecaster: s = 100 iff y = 1 -> brier 0, ece 0, rel 0,
    // res = unc (perfect resolution)
    val perfect = Seq(("p", 1, 100L), ("p", 1, 100L), ("p", 0, 0L),
      ("p", 0, 0L))
    val p = run(perfect)("p")
    assert(p.getAs[Double]("brier") == 0.0 && p.getAs[Double]("ece") == 0.0)
    assert(p.getAs[Double]("reliability") == 0.0)
    assert(p.getAs[Double]("resolution") == p.getAs[Double]("uncertainty"))
    assert(p.getAs[Double]("uncertainty") == 0.25)
    // climatology forecaster: always 50 on a 50/50 outcome -> brier
    // 0.25, ece 0, rel 0, res 0, unc 0.25
    val clim = Seq(("c", 1, 50L), ("c", 0, 50L), ("c", 1, 50L), ("c", 0, 50L))
    val c = run(clim)("c")
    assert(c.getAs[Double]("brier") == 0.25 && c.getAs[Double]("ece") == 0.0)
    assert(c.getAs[Double]("resolution") == 0.0 &&
      c.getAs[Double]("uncertainty") == 0.25)
    // bin-constant scores: Murphy identity brier = rel - res + unc holds
    // to float exactness (s=20 on 1-of-4 positive, s=80 on 3-of-4)
    val mixed = Seq.tabulate(4)(i => ("m", if (i == 0) 1 else 0, 20L)) ++
      Seq.tabulate(4)(i => ("m", if (i < 3) 1 else 0, 80L))
    val m = run(mixed)("m")
    val lhs = m.getAs[Double]("brier")
    val rhs = m.getAs[Double]("reliability") - m.getAs[Double]("resolution") +
      m.getAs[Double]("uncertainty")
    assert(math.abs(lhs - rhs) < 1e-12, s"$lhs vs $rhs")
    // scores clamp into [0, scale] rather than corrupting bins
    val wild = Seq(("w", 1, 250L), ("w", 0, -50L))
    assert(run(wild)("w").getAs[Double]("brier") == 0.0)
  }

  test("fleissKappa: textbook perfect agreement, chance-level, and " +
      "subject-count discipline") {
    import spark.implicits._
    def run(rows: Seq[(Int, String)], n: Int) =
      Eval.fleissKappa(rows.toDF("s", "cat"), "s", "cat", n).collect().head
    // every subject unanimous, two categories evenly split across
    // subjects: P_bar = 1, kappa = 1 exactly
    val unanimous = (1 to 4).flatMap(s =>
      Seq.fill(3)((s, if (s % 2 == 0) "a" else "b")))
    val u = run(unanimous, 3)
    assert(u.getAs[Double]("p_bar") == 1.0 &&
      u.getAs[Double]("kappa") == 1.0)
    assert(u.getAs[Long]("n_subjects") == 4L &&
      u.getAs[Long]("n_dropped") == 0L)
    // all ratings one category -> P_e = 1 -> kappa null, loudly
    val mono = (1 to 3).flatMap(s => Seq.fill(2)((s, "only")))
    assert(run(mono, 2).isNullAt(6))
    // subjects with wrong rating counts are dropped and counted
    val ragged = unanimous ++ Seq((9, "a")) ++ Seq.fill(5)((10, "b")).zipWithIndex
      .map { case (p, _) => p }
    val g = run(ragged, 3)
    assert(g.getAs[Long]("n_subjects") == 4L &&
      g.getAs[Long]("n_dropped") == 2L)
    assert(g.getAs[Double]("kappa") == 1.0, "dropped subjects don't leak")
    // worked textbook shape: 2 subjects, n=2, one split one unanimous
    // cells: s1 = (a,b) -> P_1 = 0; s2 = (a,a) -> P_2 = 1; P_bar = 1/2
    // C = (3a, 1b): P_e = (9+1)/16; kappa = (1/2 - 10/16)/(1 - 10/16)
    //   = (-1/8)/(3/8) = -1/3
    val mixed = Seq((1, "a"), (1, "b"), (2, "a"), (2, "a"))
    val m = run(mixed, 2)
    assert(m.getAs[Double]("p_bar") == 0.5)
    assert(m.getAs[Double]("p_e") == 0.625)
    assert(math.abs(m.getAs[Double]("kappa") - (-1.0 / 3)) < 1e-15)
  }

  test("friedman: classic no-tie ranks, complete-block filter, all-tied " +
      "null") {
    import spark.implicits._
    // 3 blocks, 3 treatments, consistent ordering a<b<c everywhere ->
    // ranks (1,2,3) in every block: chi2 = 12*sum(Rj^2)/(nk(k+1)) -
    // 3n(k+1) with R=(3,6,9): 12*(9+36+81)/36 - 36 = 42 - 36 = 6
    val rows = for { b <- 1 to 3; (t, v) <- Seq(("a", 1L), ("b", 2L), ("c", 3L)) }
      yield (b, t, v + b * 10L)
    val r = Eval.friedman(rows.toDF("b", "tr", "v"), "b", "tr", "v")
      .collect().head
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_blocks") == 3L)
    assert(math.abs(r.getAs[Double]("chi2") - 6.0) < 1e-12)
    // an incomplete block (missing treatment c) is dropped, not zeroed
    val extra = rows ++ Seq((9, "a", 1L), (9, "b", 2L))
    val e = Eval.friedman(extra.toDF("b", "tr", "v"), "b", "tr", "v")
      .collect().head
    assert(e.getAs[Long]("n_blocks") == 3L &&
      math.abs(e.getAs[Double]("chi2") - 6.0) < 1e-12)
    // every block fully tied -> A2 = C2 -> null, loudly
    val flat = for { b <- 1 to 3; t <- Seq("a", "b", "c") } yield (b, t, 7L)
    assert(Eval.friedman(flat.toDF("b", "tr", "v"), "b", "tr", "v")
      .collect().head.isNullAt(2))
  }

  test("pinballLoss: hand asymmetric sums; the true quantile minimizes " +
      "the loss among candidate forecasts") {
    import spark.implicits._
    val ys = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
    def loss(qhat: Long): Double = {
      val a = ys.map(("g", _)).toDF("g", "y")
      val f = Seq(("g", qhat)).toDF("g", "q")
      Eval.pinballLoss(a, f, "g", "y", "q", 9L, 10L)
        .head().getAs[Double]("pinball_mean")
    }
    // qhat = 9 on 1..10: over = (10-9) = 1; under = sum(9-y)+ = 36
    // mean = (9*1 + 1*36)/(10*10) = 45/100
    assert(loss(9L) === 0.45)
    // the empirical P90 (=9) beats lowball and highball claims (the
    // loss is piecewise linear, so 9 and 10 tie exactly on 1..10 —
    // both are valid tau=0.9 quantiles of the discrete sample)
    assert(loss(9L) < loss(5L) && loss(9L) == loss(10L) &&
      loss(9L) < loss(11L),
      s"${loss(5L)} ${loss(9L)} ${loss(10L)} ${loss(11L)}")
  }

  test("bartlettVariance: matches the closed form, drops n<2 groups " +
    "loudly, nulls on a zero-variance group") {
    import spark.implicits._
    val groups = Seq(
      Seq(1L, 2L, 3L, 4L, 10L),
      Seq(10L, 30L, 50L, 70L),
      Seq(5L, 6L, 7L))
    val rows = groups.zipWithIndex.flatMap { case (g, i) =>
      g.map(y => ("s", s"g$i", y))
    } :+ (("s", "lone", 42L))  // n=1 group: dropped, counted
    val r = Eval.bartlettVariance(rows.toDF("sc", "g", "y"),
      "sc", "g", "y").head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("k_dropped") == 1 &&
      r.getAs[Long]("n") == 12 && r.getAs[Long]("df") == 2)
    val k = 3; val n = 12
    val s2 = groups.map { g =>
      val m = g.map(_.toDouble).sum / g.size
      g.map(x => (x - m) * (x - m)).sum / (g.size - 1)
    }
    val sp2 = groups.zip(s2).map { case (g, v) => (g.size - 1) * v }.sum /
      (n - k)
    val t = (n - k) * math.log(sp2) -
      groups.zip(s2).map { case (g, v) => (g.size - 1) * math.log(v) }.sum
    val c = 1.0 +
      (groups.map(g => 1.0 / (g.size - 1)).sum - 1.0 / (n - k)) /
        (3.0 * (k - 1))
    val chi2 = r.getAs[Double]("chi2")
    assert(math.abs(chi2 - t / c) < 1e-9 * math.max(1.0, math.abs(t / c)),
      s"chi2=$chi2 ref=${t / c}")
    assert(math.abs(r.getAs[Double]("sp2") - sp2) < 1e-9 * sp2)

    // a zero-variance group -> ln undefined -> chi2/sp2 null, k intact
    val degen = Seq(("s", "a", 1L), ("s", "a", 1L),
      ("s", "b", 1L), ("s", "b", 2L))
    val rd = Eval.bartlettVariance(degen.toDF("sc", "g", "y"),
      "sc", "g", "y").head()
    assert(rd.getAs[Long]("k") == 2 && rd.isNullAt(rd.fieldIndex("chi2")))
  }

  test("cronbachAlpha: duplicated item gives alpha = 1 exactly, the " +
    "2-item closed form matches, incomplete blocks drop loudly") {
    import spark.implicits._
    // two identical items: s1 = s2 = s, sT^2 = 4s^2 -> alpha = 1
    val twin = Seq(1L, 5L, 3L, 9L, 7L).zipWithIndex.flatMap {
      case (v, b) => Seq((b.toLong, "i1", v), (b.toLong, "i2", v))
    }
    val rt = Eval.cronbachAlpha(twin.toDF("b", "i", "y"), "b", "i", "y")
      .head()
    assert(rt.getAs[Long]("k") == 2 && rt.getAs[Long]("n_blocks") == 5)
    assert(rt.getAs[Double]("alpha") == 1.0)
    // hand fixture with one incomplete block
    val vals1 = Seq(2L, 4L, 6L, 8L)
    val vals2 = Seq(3L, 1L, 7L, 5L)
    val rows = vals1.indices.flatMap(b =>
      Seq((b.toLong, "i1", vals1(b)), (b.toLong, "i2", vals2(b)))) :+
      ((99L, "i1", 42L)) // missing i2 -> dropped
    val r = Eval.cronbachAlpha(rows.toDF("b", "i", "y"), "b", "i", "y")
      .head()
    assert(r.getAs[Long]("n_blocks") == 4 &&
      r.getAs[Long]("n_blocks_dropped") == 1)
    def svar(xs: Seq[Long]): Double = {
      val m = xs.map(_.toDouble).sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val tot = vals1.zip(vals2).map { case (a, b) => a + b }
    val ref = 2.0 * (1.0 - (svar(vals1) + svar(vals2)) / svar(tot))
    assert(math.abs(r.getAs[Double]("alpha") - ref) < 1e-12,
      s"alpha=${r.getAs[Double]("alpha")} ref=$ref")
  }

  test("iccOneWay: perfect group separation gives ICC = 1; matches the " +
    "unbalanced Searle reference; all-identical data nulls out") {
    import spark.implicits._
    // groups internally constant, levels differ -> msw = 0 -> icc = 1
    val sep = Seq(("s", "a", 10L), ("s", "a", 10L),
      ("s", "b", 20L), ("s", "b", 20L), ("s", "c", 30L), ("s", "c", 30L))
    val rs = Eval.iccOneWay(sep.toDF("sc", "g", "y"), "sc", "g", "y")
      .head()
    assert(rs.getAs[Double]("icc") == 1.0)
    // unbalanced reference
    val groups = Map("a" -> Seq(1L, 2L, 3L), "b" -> Seq(7L, 9L),
      "c" -> Seq(4L, 4L, 5L, 6L))
    val rows = groups.toSeq.flatMap { case (g, vs) => vs.map(("s", g, _)) }
    val r = Eval.iccOneWay(rows.toDF("sc", "g", "y"), "sc", "g", "y")
      .head()
    val n = 9.0; val k = 3.0
    val grand = groups.values.flatten.map(_.toDouble).sum
    val between = groups.values.map(vs =>
      vs.sum.toDouble * vs.sum / vs.size).sum
    val q = groups.values.flatten.map(v => v.toDouble * v).sum
    val ssb = between - grand * grand / n
    val ssw = q - between
    val msb = ssb / (k - 1); val msw = ssw / (n - k)
    val sn2 = groups.values.map(vs => vs.size.toDouble * vs.size).sum
    val k0 = (n - sn2 / n) / (k - 1)
    val icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert(math.abs(r.getAs[Double]("icc") - icc) < 1e-12,
      s"icc=${r.getAs[Double]("icc")} ref=$icc")
    assert(math.abs(r.getAs[Double]("k0") - k0) < 1e-12)
    // zero total variance -> 0/0 -> null
    val flat = Seq(("s", "a", 5L), ("s", "a", 5L), ("s", "b", 5L))
    val rf = Eval.iccOneWay(flat.toDF("sc", "g", "y"), "sc", "g", "y")
      .head()
    assert(rf.isNullAt(rf.fieldIndex("icc")))
  }

  test("blandAltman: constant offset -> zero-width limits at the bias; " +
    "proportional disagreement -> the -2/3 slope; correlation blind") {
    import spark.implicits._
    val as = Seq(10L, 20L, 30L, 40L, 50L)
    // b = a + 10: d = -10 constant
    val off = as.map(a => (a, a + 10L)).toDF("a", "b")
    val ro = Eval.blandAltman(off, "a", "b").head()
    assert(ro.getAs[Double]("bias") == -10.0 &&
      ro.getAs[Double]("sd_d") == 0.0)
    assert(ro.getAs[Double]("loa_lo") == -10.0 &&
      ro.getAs[Double]("loa_hi") == -10.0)
    assert(ro.getAs[Double]("slope_vs_mean") == 0.0)
    // b = 2a: d = -a, m = 3a -> slope = 2·cov(-a,3a)/var(3a) = -2/3
    val prop = as.map(a => (a, 2 * a)).toDF("a", "b")
    val rp = Eval.blandAltman(prop, "a", "b").head()
    assert(math.abs(rp.getAs[Double]("slope_vs_mean") + 2.0 / 3.0) < 1e-12)
    // single pair: bias defined, SD/limits null
    val one = Seq((5L, 9L)).toDF("a", "b")
    val r1 = Eval.blandAltman(one, "a", "b").head()
    assert(r1.getAs[Double]("bias") == -4.0 &&
      r1.isNullAt(r1.fieldIndex("sd_d")))
  }

  test("hosmerLemeshow: perfectly-calibrated buckets give HL = 0 and " +
    "p = 1; miscalibration raises HL and sinks p; p=0/1 buckets drop") {
    import spark.implicits._
    // 10 score runs at 500, 1500, ..., 9500 (scale 10000); each run of
    // 20 rows carries exactly n*pbar positives -> O = E in every bucket
    def rows(flip: Boolean): Seq[(String, Int, Long)] =
      (0 until 10).flatMap { b =>
        val s = 500L + 1000L * b
        val pos = (s / 500).toInt // 20 * (s/10000)
        val posAdj = if (flip && b == 0) pos + 10 else pos
        (0 until 20).map(i => ("g", if (i < posAdj) 1 else 0, s))
      }
    val perfect = Eval.hosmerLemeshow(rows(flip = false)
      .toDF("g", "y", "s"), "g", "y", "s", 10, 10000L).head()
    assert(perfect.getAs[Long]("n_buckets") == 10 &&
      perfect.getAs[Long]("n_buckets_dropped") == 0)
    assert(perfect.getAs[Double]("hl") == 0.0)
    assert(perfect.getAs[Long]("df") == 8)
    assert(perfect.getAs[Double]("p_value") == 1.0)
    val bad = Eval.hosmerLemeshow(rows(flip = true)
      .toDF("g", "y", "s"), "g", "y", "s", 10, 10000L).head()
    assert(bad.getAs[Double]("hl") > 20.0)
    assert(bad.getAs[Double]("p_value") < 0.01)
    // a pbar = 0 bucket is dropped loudly
    val withZero = rows(flip = false) ++
      (0 until 20).map(i => ("g", 0, 10500L))
    val rz = Eval.hosmerLemeshow(withZero.toDF("g", "y", "s"),
      "g", "y", "s", 11, 10000L).head()
    assert(rz.getAs[Long]("n_buckets_dropped") == 1)
  }

  test("confusionStats: hand 2x2 hits MCC/F1/accuracy; degenerate " +
    "all-positive predictor nulls MCC but keeps accuracy") {
    import spark.implicits._
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.map { case (p, y) => ("g", p, y) }.toDF("g", "p", "y")
    val r = Eval.confusionStats(df, "g", col("p"), col("y")).head()
    assert(r.getAs[Long]("tp") == 4 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("fn") == 2 && r.getAs[Long]("tn") == 3)
    assert(r.getAs[Double]("acc") == 0.7)
    assert(math.abs(r.getAs[Double]("f1") - 8.0 / 11.0) < 1e-15)
    assert(math.abs(r.getAs[Double]("mcc") - 10.0 / math.sqrt(600.0))
      < 1e-15)
    val degen = Seq(("g", true, true), ("g", true, false))
      .toDF("g", "p", "y")
    val rd = Eval.confusionStats(degen, "g", col("p"), col("y")).head()
    assert(rd.isNullAt(rd.fieldIndex("mcc")) &&
      rd.getAs[Double]("acc") == 0.5)
  }

  test("brunnerMunzel: p-hat equals the two-sample AUC; identical " +
    "samples give W = 0; swapping groups negates W and reflects p-hat") {
    import spark.implicits._
    val s1 = Seq(10L, 12, 15, 15, 20, 22, 30, 31)
    val s2 = Seq(14L, 15, 18, 25, 26, 40)
    val rows = s1.map(("g", false, _)) ++ s2.map(("g", true, _))
    val df = rows.toDF("sc", "is2", "v")
    val r = Eval.brunnerMunzel(df, "sc", col("is2"), "v").head()
    assert(r.getAs[Long]("n1") == 8 && r.getAs[Long]("n2") == 6)
    // the relative effect IS the AUC with sample-2 as positives
    val aucDf = rows.map { case (g, is2, v) =>
      (g, if (is2) 1 else 0, v.toDouble) }.toDF("g", "y", "s")
    val auc = Eval.auc(aucDf, "g", "y", "s").head().getAs[Double]("auc")
    assert(math.abs(r.getAs[Double]("p_hat") - auc) < 1e-12,
      s"p_hat=${r.getAs[Double]("p_hat")} auc=$auc")
    assert(r.getAs[Double]("w") > 0.0) // sample 2 stochastically larger
    // swapped roles: W negates, p-hat reflects
    val rsw = Eval.brunnerMunzel(df, "sc", !col("is2"), "v").head()
    assert(math.abs(rsw.getAs[Double]("w") + r.getAs[Double]("w"))
      < 1e-12)
    assert(math.abs(rsw.getAs[Double]("p_hat") +
      r.getAs[Double]("p_hat") - 1.0) < 1e-12)
    // identical multisets: mean ranks equal -> W = 0 exactly
    val same = (s1.map(("g", false, _)) ++ s1.map(("g", true, _)))
      .toDF("sc", "is2", "v")
    val rs = Eval.brunnerMunzel(same, "sc", col("is2"), "v").head()
    assert(rs.getAs[Double]("w") == 0.0 &&
      rs.getAs[Double]("p_hat") == 0.5)
  }

  test("moodMedian: hand-computed 2x2 census chi2; lower-median pin; " +
      "outlier magnitude is invisible; empty margin nulls") {
    import spark.implicits._
    // g1 = {1..4}, g2 = {5..8}: pooled lower median = value at
    // ceil(8/2)=4th -> 4; above = all of g2 -> chi2 = 4*(2^2/2) = 8
    val df = ((1L to 4L).map(("s", "g1", _)) ++
      (5L to 8L).map(("s", "g2", _))).toDF("sc", "g", "x")
    val r = Eval.moodMedian(df, "sc", "g", "x").head()
    assert(r.getAs[Long]("pooled_med") == 4L)
    assert(r.getAs[Long]("n_above") == 4L)
    assert(r.getAs[Double]("chi2") == 8.0)
    assert(r.getAs[Long]("df") == 1L)
    // replacing g2's top value with 10^9 changes NOTHING (robustness)
    val out = ((1L to 4L).map(("s", "g1", _)) ++
      Seq(5L, 6L, 7L, 1000000000L).map(("s", "g2", _))).toDF("sc", "g", "x")
    assert(Eval.moodMedian(out, "sc", "g", "x").head()
      .getAs[Double]("chi2") == 8.0)
    // all values equal: nothing above the median -> chi2 null, census kept
    val const = Seq(("s", "g1", 5L), ("s", "g2", 5L), ("s", "g1", 5L),
      ("s", "g2", 5L)).toDF("sc", "g", "x")
    val rc = Eval.moodMedian(const, "sc", "g", "x").head()
    assert(rc.isNullAt(rc.fieldIndex("chi2")))
    assert(rc.getAs[Long]("k_groups") == 2L)
  }

}
