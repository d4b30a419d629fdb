package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** The sketch operators are the declared 100 TB path for q10 (exact
  * percentiles) and A15 (distinct): verify each against its exact
  * counterpart within the sketch's error bound on real table data.
  * (Not oracle queries: GK/HLL++ internals are not replayable in DuckDB
  * — same status as the xxhash family.) */
class SketchesSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("approxQuantiles tracks exact percentiles within rank error") {
    val li = graft.Tables.lineitem(spark, dir)
    val approx = Sketches.approxQuantiles(li, "l_extendedprice",
      Seq("l_returnflag"), Seq(0.5, 0.95), accuracy = 10000)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      // GK at accuracy 1e4 on ~2k-row groups: near-exact; allow 1%
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$k p50 $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.01, s"$k p95 $a95 vs $e95")
    }
  }

  test("approxDistinct tracks exact distinct within the declared rsd") {
    val li  = graft.Tables.lineitem(spark, dir)
    val rsd = 0.05
    val approx = Sketches.approxDistinct(li, "l_partkey", Seq("l_returnflag"), rsd)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getAs[Long]("approx_distinct")).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("d")).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 3 * rsd, s"$k: approx $a exact $e")
    }
  }

  test("CMS estimates are one-sided and exact at saturating width") {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    val probes = toks.where(col("doc_id") < 5).select("tok").distinct()
    val exact = toks.join(broadcast(probes), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // narrow sketch: every estimate >= truth (one-sided error contract)
    val narrow = Sketches.cmsBuild(toks, "tok", depth = 4, width = 64)
    Sketches.cmsEstimate(narrow, probes, "tok", depth = 4, width = 64)
      .collect().foreach { r =>
        val (t, est) = (r.getString(0), r.getLong(1))
        assert(est >= exact(t), s"$t: CMS $est < exact ${exact(t)}")
      }

    // sketch rows never exceed depth * width regardless of vocabulary
    assert(narrow.count() <= 4L * 64, "sketch size must be d*w-bounded")

    // saturating width (>> vocab^2 collision scale on this fixture per
    // row via 4 independent rows): estimates collapse to exact counts
    val wide = Sketches.cmsBuild(toks, "tok", depth = 4, width = 1 << 20)
    Sketches.cmsEstimate(wide, probes, "tok", depth = 4, width = 1 << 20)
      .collect().foreach { r =>
        assert(r.getLong(1) == exact(r.getString(0)),
          s"${r.getString(0)}: saturated CMS ${r.getLong(1)} != exact")
      }
  }

  test("HLL registers merge exactly: union of sketches == sketch of union") {
    val o = graft.Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy").as("year"), col("o_custkey"))
    val perYear = Sketches.hllRegisters(o, Seq("year"), "o_custkey", b = 8)
    // merge the per-year tables by re-grouping with max ...
    val merged = perYear.groupBy("reg").agg(max(col("max_rank")).as("max_rank"))
    // ... which must equal the sketch built from the raw union
    val direct = Sketches.hllRegisters(
      o.select(lit("ALL").as("g"), col("o_custkey")), Seq("g"), "o_custkey", b = 8)
      .select("reg", "max_rank")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "register merge must be lossless")
  }

  test("HLL estimate is partitioning-invariant and within ~3/sqrt(m) of exact") {
    // l_orderkey: ~1.5k distinct at sf0.001 >> 2.5*m — the raw-HLL
    // regime (the estimator skips the log-based small-range correction
    // for cross-engine replay; below 2.5*m the test would read its bias)
    val o = graft.Tables.lineitem(spark, dir).select(lit("g").as("g"), col("l_orderkey"))
    val b = 8
    def est(df: org.apache.spark.sql.DataFrame): Double =
      Sketches.hllEstimate(Sketches.hllRegisters(df, Seq("g"), "l_orderkey", b),
        Seq("g"), b).collect().head.getAs[Double]("hll_estimate")
    val e1 = est(o.repartition(1))
    val e32 = est(o.repartition(32, col("l_orderkey")))
    // the harmonic sum is an exact double (power-of-two terms), so the
    // estimate is bit-identical at any parallelism — no tolerance
    assert(e1 == e32, s"partitioning changed the estimate: $e1 vs $e32")
    val exact = o.select("l_orderkey").distinct().count().toDouble
    val rel = math.abs(e1 - exact) / exact
    assert(rel < 3.0 / math.sqrt((1 << b).toDouble),
      s"HLL estimate $e1 vs exact $exact: rel error $rel out of bound")
  }

  test("cmsJoinSize: one-sided estimate, exact at collision-free width") {
    import spark.implicits._
    def trueJoin(a: Seq[Long], bb: Seq[Long]): Long = {
      val cb = bb.groupBy(identity).view.mapValues(_.size.toLong).toMap
      a.groupBy(identity).map { case (k, v) => v.size.toLong * cb.getOrElse(k, 0L) }.sum
    }
    def est(a: Seq[Long], bb: Seq[Long], width: Int): Long = {
      val sa = Sketches.cmsBuild(a.toDF("k"), "k", 4, width)
      val sb = Sketches.cmsBuild(bb.toDF("k"), "k", 4, width)
      Sketches.cmsJoinSize(sa, sb, 4).head()
        .getAs[java.math.BigDecimal]("join_size_est").longValueExact()
    }
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(400)(rnd.nextInt(40).toLong)
    val b = Seq.fill(300)(rnd.nextInt(60).toLong)
    val exact = trueJoin(a, b)
    // wide sketch: 100 keys over 4x4096 cells — collision-free with
    // overwhelming odds, the estimate must be EXACT
    assert(est(a, b, 4096) == exact)
    // narrow sketch: collisions can only ADD (one-sided bound)
    assert(est(a, b, 8) >= exact)
    // disjoint key spaces: true join 0 and the estimate agrees at width
    // where no cross-collision lands
    assert(est(Seq(1L, 2L, 3L), Seq(1000L, 2000L), 4096) == 0L)
  }
}
