package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Skew}

class ExtensionsSkewSpec extends AnyFunSuite with SparkFixture {

  private lazy val extSpark: SparkSession = {
    // force a NEW session (same context): getOrCreate would silently hand
    // back the fixture session, dropping the extensions config
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // spark.sql.extensions is a STATIC conf (only honored by a fresh
    // SparkContext); withExtensions is the public per-session injection path
    try SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-tests")
      .withExtensions(ext => new graft.plans.GraftExtensions()(ext))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("extensions expose the codegen'd kernels as SQL functions") {
    val spark2 = extSpark
    val r = spark2.sql(
      """SELECT graft_simhash('alpha beta gamma') AS sh,
        |size(graft_minhash('one two three four five six', 3, 16)) AS k,
        |graft_srp_bucket(array(1.0d, -2.0d, 0.5d), 0, 8) AS b,
        |graft_cosine(array(1.0d, 0.0d), array(2.0d, 0.0d)) AS cos,
        |graft_int_dot(array(2L, 3L), array(10L, 20L)) AS idot,
        |graft_compress_ratio(repeat('spam ', 50)) AS cr,
        |graft_lgamma(5.0d) AS lg,
        |graft_erfc(0.0d) AS ef""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Long]("idot") == 80L)
    assert(r.getAs[Double]("cr") < 0.2, "repeated text must crush")
    // lnGamma(5) = ln(4!) = ln 24; erfc(0) = 1 (NR approximations)
    assert(math.abs(r.getAs[Double]("lg") - math.log(24.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ef") - 1.0) < 1e-6)
    // cross-check against the library column APIs on the plain session
    import spark.implicits._
    val expectSh = Seq("alpha beta gamma").toDF("t")
      .select(graft.functions.FastHash.simhash(col("t"))).head().getLong(0)
    assert(r.getAs[Long]("sh") == expectSh)
    assert(r.getAs[Int]("k") == 16)
    val expectB = Seq(Seq(1.0, -2.0, 0.5)).toDF("v")
      .select(graft.functions.FastHash.srpBucket(col("v"), 0, 8)).head().getLong(0)
    assert(r.getAs[Long]("b") == expectB)
    // the round-6 kernels register too
    val r2 = spark2.sql(
      """SELECT size(graft_shingles('a b c d', 2)) AS nsh,
        |graft_repetition('x y x y x y', 2) AS rep,
        |graft_sorted_lookup(array('a', 'c'), array(1.0d, 3.0d), 'c') AS hit,
        |graft_sorted_lookup(array('a', 'c'), array(1.0d, 3.0d), 'b') AS miss""".stripMargin).head()
    assert(r2.getAs[Int]("nsh") == 3)
    assert(r2.getAs[Double]("rep") > 0.0)
    assert(r2.getAs[Double]("hit") == 3.0)
    assert(r2.isNullAt(r2.fieldIndex("miss")))
    // round-7: the sorted-merge intersection kernel (q196's close)
    val r3 = spark2.sql(
      """SELECT graft_sorted_intersect(array(1L, 3L, 5L, 7L),
        |array(3L, 4L, 7L, 9L)) AS ws""".stripMargin).head()
    assert(r3.getSeq[Long](r3.fieldIndex("ws")).toList == List(3L, 7L))
    // round-10: the record-linkage string kernels (q341 / q439)
    val r4 = spark2.sql(
      """SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw,
        |graft_damerau('CA', 'ABC') AS dl,
        |graft_damerau('ab', 'ba') AS sw""".stripMargin).head()
    assert(r4.getAs[Double]("jw") == 0.9611111111111111)
    assert(r4.getAs[Long]("dl") == 2L && r4.getAs[Long]("sw") == 1L)
  }

  test("CollapseRedundantRound removes equal-scale nested rounds from the plan") {
    val spark2 = extSpark
    val df = spark2.range(5).selectExpr("round(round(id / double(3), 4), 4) AS v")
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("round(round("), optimized)
    // and different scales are left alone
    val keep = spark2.range(5).selectExpr("round(round(id / double(3), 6), 4) AS v")
    assert(keep.queryExecution.optimizedPlan.toString().contains("round(round("))
    // value parity with the unoptimized computation
    val plain = spark.range(5).selectExpr("round(round(id / double(3), 4), 4) AS v")
      .collect().map(_.getDouble(0)).toSeq
    assert(df.collect().map(_.getDouble(0)).toSeq == plain)
  }

  test("saltedJoin matches the plain join result (skew mitigation)") {
    import spark.implicits._
    // hot key: 90% of rows share k=1
    val big = ((1 to 900).map(i => (1, i)) ++ (1 to 100).map(i => (2, i)))
      .toDF("k", "payload")
    val small = Seq((1, "hot"), (2, "cold"), (3, "unmatched")).toDF("k", "label")
    val plain = big.join(small, "k").groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 8)
      .groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted == Map("hot" -> 900L, "cold" -> 100L))
  }

  test("saltedAgg two-phase aggregation matches direct aggregation") {
    import spark.implicits._
    val df = ((1 to 500).map(i => ("hot", i.toDouble)) ++ Seq(("cold", 5.0)))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(df, "k", 8,
      partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("keySkewProfile surfaces the hot key share") {
    import spark.implicits._
    val df = ((1 to 900).map(_ => 1) ++ (1 to 100).map(_ => 2)).toDF("k")
    val top = Skew.keySkewProfile(df, "k").head()
    assert(top.getAs[Int]("k") == 1)
    assert(top.getAs[Double]("share") == 0.9)
  }

  test("skewSummary: shares and effective key count against hand arithmetic") {
    import spark.implicits._
    // counts: a=60, b=30, c=10 -> n=100, sq=60^2+30^2+10^2=4600
    val df = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c")).toDF("k")
    val r = Skew.skewSummary(df, "k", topN = 2).head()
    assert(r.getAs[Long]("n_rows") == 100L && r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("top1_cnt") == 60L && r.getAs[Long]("topn_cnt") == 90L)
    assert(r.getAs[Double]("top1_share") == 0.6 && r.getAs[Double]("topn_share") == 0.9)
    assert(r.getAs[Double]("eff_keys") == 10000.0 / 4600.0)
    // uniform distribution: eff_keys equals the true key count
    val uni = (1 to 50).flatMap(k => Seq.fill(4)(k)).toDF("k")
    assert(Skew.skewSummary(uni, "k").head().getAs[Double]("eff_keys") == 50.0)
  }
}
