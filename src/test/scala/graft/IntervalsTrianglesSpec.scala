package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Intervals, Triangles}

/** Triangle counting (q196) and interval operators (q197/q201),
  * off-fixture: closed-form graphs and hand-built interval sets whose
  * answers are known exactly. */
class IntervalsTrianglesSpec extends AnyFunSuite with SparkFixture {

  test("K4: every node sits in C(3,2)=3 triangles; duplicates/direction collapse") {
    import spark.implicits._
    val k4 = for { u <- 1L to 4L; v <- 1L to 4L if u != v } yield (u, v)
    // all ordered pairs twice over = heavy dup input; operator dedups
    val tri = Triangles.perNode((k4 ++ k4).toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("path graph has zero triangles but keeps zero-filled rows") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val tri = Triangles.perNode(path, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("two triangles sharing an edge: shared nodes count both") {
    import spark.implicits._
    // {1,2,3} and {2,3,4} share edge (2,3); self-loop (5,5) is dropped
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L), (5L, 5L))
      .toDF("u", "v")
    val tri = Triangles.perNode(g, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("kTruss (consolidated KCore impl): K4 + hanging triangle + pendant — the 4-truss is " +
      "exactly K4; the 3-truss keeps both triangle blocks") {
    import spark.implicits._
    // K4 on {1,2,3,4}; triangle {4,5,6} hangs off node 4; (6,7) pendant
    val k4 = for { u <- 1L to 4L; v <- 1L to 4L if u < v } yield (u, v)
    val g = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L)))
      .toDF("u", "v")
    def run(k: Int) = graft.operators.KCore.kTruss(g, "u", "v", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // k=4 (support >= 2): triangle edges have support 1 -> peeled;
    // K4 edges each close 2 triangles within K4 -> stable
    val t4 = run(4)
    assert(t4.keySet == k4.toSet, t4.toString)
    assert(t4.values.forall(_ == 2L), t4.toString)
    // k=3 (support >= 1): only the pendant falls out
    val t3 = run(3)
    assert(t3.keySet == (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toSet)
    assert(t3((4L, 5L)) == 1L && t3((1L, 2L)) == 2L)
  }

  test("kTruss: peeling cascades (removing weak edges strips survivors' " +
      "support) and an empty truss returns an empty frame") {
    import spark.implicits._
    // two triangles sharing edge (2,3): (2,3) has support 2, all other
    // edges 1. k=4 peels the weak edges round 1, which leaves (2,3)
    // with support 0 -> peeled round 2 -> empty fixpoint
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val t = graft.operators.KCore.kTruss(g, "u", "v", k = 4)
    assert(t.count() == 0L)
    assert(t.columns.toSeq == Seq("u", "v", "sup"))
  }

  test("transitivity: complete graph 1, star 0, two-triangle bridge " +
      "hand-counted") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]) = {
      val r = Triangles.transitivity(edges.toDF("u", "v"), "u", "v")
        .collect().head
      (r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"),
        Option(r.getAs[java.lang.Double]("transitivity")).map(_.toDouble))
    }
    // K4: T = 4, W = 4*C(3,2) = 12 -> C = 12/12 = 1
    val k4 = for { u <- 1L to 4L; v <- u + 1 to 4L } yield (u, v)
    assert(run(k4) == ((12L, 4L, Some(1.0))))
    // star K_{1,3}: W = 3, T = 0 -> C = 0
    assert(run(Seq((0L, 1L), (0L, 2L), (0L, 3L))) == ((3L, 0L, Some(0.0))))
    // single edge: no wedge -> null, loudly
    assert(run(Seq((1L, 2L))) == ((0L, 0L, None)))
    // two triangles sharing an edge: degrees (2,3,3,2) -> W = Σ d(d-1)/2
    // = 1+3+3+1 = 8; T = 2 -> C = 6/8 = 0.75 (the open wedges are the
    // two through the bridge ends)
    val bow = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(run(bow) == ((8L, 2L, Some(0.75))))
  }

  test("overlapPairs: multi-bucket overlaps count once; touching endpoints don't overlap") {
    import spark.implicits._
    val iv = Seq(
      // key A: [0,250) and [100,400) overlap 150, span buckets {0,1,2,3,4} at width 100
      ("A", 1L, 0L, 250L), ("A", 2L, 100L, 400L),
      // [400,500) touches id 2's end exactly: half-open, NO overlap
      ("A", 3L, 400L, 500L),
      // key B: same timestamps as A but isolated key
      ("B", 1L, 0L, 50L), ("B", 2L, 50L, 100L)
    ).toDF("k", "id", "s", "e")
    val pairs = Intervals.overlapPairs(iv, "k", "id", "s", "e", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.toSet == Set(("A", 1L, 2L, 150L)))
  }

  test("overlapPairs matches the naive inequality join on a random-ish set") {
    import spark.implicits._
    // deterministic pseudo-random intervals via a small LCG
    var x = 12345L
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % 100000L; x }
    val rows = (1L to 200L).map { id =>
      val s = nxt(); val d = 1L + nxt() % 900L
      (("K" + (id % 3)), id, s, s + d)
    }
    val df = rows.toDF("k", "id", "s", "e")
    val got = Intervals.overlapPairs(df, "k", "id", "s", "e", 300L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val naive = (for {
      (k1, i1, s1, e1) <- rows; (k2, i2, s2, e2) <- rows
      if k1 == k2 && i1 < i2 && s1 < e2 && s2 < e1
    } yield (k1, i1, i2)).toSet
    assert(got == naive && naive.nonEmpty)
  }

  test("sweepPeak: slice-crossing intervals carry into later slices") {
    import spark.implicits._
    val iv = Seq(
      // one interval spans slices 0-2 entirely (width 100): carry=1 there
      ("t", 0L, 300L),
      // two more stacked inside slice 1 -> peak 3
      ("t", 110L, 190L), ("t", 120L, 150L),
      // separate key: two disjoint intervals -> peak 1
      ("u", 0L, 10L), ("u", 10L, 20L)
    ).toDF("k", "s", "e")
    val got = Intervals.sweepPeak(iv, "k", "s", "e", 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("t" -> ((3L, 3L)), "u" -> ((2L, 1L))))
  }

  test("burstiness: metronome lands at -1, a planted burst pattern is " +
      "positive, two-event keys are loudly null") {
    import spark.implicits._
    val metro = (1 to 20).map(i => ("metro", i * 1000L))
    // bursts: 9 tight 1ms gaps then a 10-minute silence, repeated
    val bursty = (0 until 40).map { i =>
      ("burst", (i / 10).toLong * 600000L + (i % 10).toLong)
    }
    val two = Seq(("two", 0L), ("two", 500L))
    val out = Intervals.burstiness(
      (metro ++ bursty ++ two).toDF("k", "ms"), "k", "ms")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("metro").getAs[Double]("b") == -1.0) // sd exactly 0
    assert(out("burst").getAs[Double]("b") > 0.5, out("burst").toString)
    assert(out("two").getAs[Long]("n_gaps") == 1L)
    assert(out("two").isNullAt(out("two").fieldIndex("b")))
    assert(out("metro").getAs[Double]("mean_gap_ms") == 1000.0)
  }
}
