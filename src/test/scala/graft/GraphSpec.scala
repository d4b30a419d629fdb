package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank operator properties (q169's operator, off-fixture). */
class GraphSpec extends AnyFunSuite with SparkFixture {

  test("symmetric two-node graph converges to equal ranks summing to 1") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(1L) - 0.5) < 1e-12 && math.abs(pr(2L) - 0.5) < 1e-12)
  }

  test("star graph: the hub out-ranks the spokes; total mass conserved") {
    import spark.implicits._
    // hub 0 <-> spokes 1..4 (bidirectional, like q169's trade graph)
    val spokes = (1L to 4L)
    val edges = (spokes.map(s => (0L, s)) ++ spokes.map(s => (s, 0L)))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L) * 2)
    spokes.foreach(s => assert(math.abs(pr(s) - pr(1L)) < 1e-12)) // symmetry
    assert(math.abs(pr.values.sum - 1.0) < 1e-9) // no dangling: mass conserved
  }

  test("dangling sink receives mass but does not redistribute it") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst") // 3 is a sink
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(3L) > 0.15 / 3 - 1e-12) // at least teleport share
    assert(pr.values.sum < 1.0)       // sink leaks mass, documented rule
  }

  test("assortativity: star is exactly -1, regular graph is null, " +
      "input canonicalized") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]) = {
      val r = Graph.assortativity(edges.toDF("src", "dst"), "src", "dst")
        .collect().head
      (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
        Option(r.getAs[java.lang.Double]("r_assort")).map(_.toDouble))
    }
    // K_{1,3}: every edge joins degree 3 to degree 1 -> r = -1 exactly
    assert(run(Seq((0L, 1L), (0L, 2L), (0L, 3L))) == ((4L, 3L, Some(-1.0))))
    // 4-cycle: constant degree 2 -> zero variance -> null, loudly
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) ==
      ((4L, 4L, None)))
    // duplicates, reversed orientations, and self-loops collapse away:
    // same star as above plus noise
    assert(run(Seq((0L, 1L), (1L, 0L), (0L, 1L), (2L, 0L), (0L, 3L),
      (2L, 2L))) == ((4L, 3L, Some(-1.0))))
    // path of 3: ends deg 1, middle deg 2; both edges are (1,2) pairs
    // -> x and y are each {1,2,2,1}: Σx=6 Σxy=8 Σxx=10, M=4
    // r = (32-36)/(40-36) = -1
    assert(run(Seq((5L, 6L), (6L, 7L))) == ((3L, 2L, Some(-1.0))))
  }

  test("modularity: two cliques exactly 1/2, random-graph partition 0 " +
      "shape, unassigned edges counted not nulled") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], assign: Seq[(Long, String)]) = {
      val r = Graph.modularity(edges.toDF("src", "dst"), "src", "dst",
        assign.toDF("node", "comm"), "node", "comm").collect().head
      (r.getAs[Long]("n_communities"), r.getAs[Long]("n_edges"),
        r.getAs[Long]("n_edges_unassigned"),
        Option(r.getAs[java.lang.Double]("modularity")).map(_.toDouble))
    }
    // two disjoint triangles, each its own community: m=6, e_c=3 each,
    // d_c=6 each -> Q = (4*6*6 - 72)/144 = 72/144 = 1/2
    val twoTri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val byTri = Seq(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b", 5L -> "b",
      6L -> "b")
    assert(run(twoTri, byTri) == ((2L, 6L, 0L, Some(0.5))))
    // everything in ONE community: e_c = m, d_c = 2m -> Q = 0 exactly
    val allOne = twoTri.flatMap(e => Seq(e._1, e._2)).distinct.map(_ -> "x")
    assert(run(twoTri, allOne)._4 == Some(0.0))
    // node 6 unassigned: its two edges drop and are counted; the rest
    // recomputes on the 4-edge subgraph
    val partial = byTri.filterNot(_._1 == 6L)
    val p = run(twoTri, partial)
    assert(p._2 == 4L && p._3 == 2L)
    // anti-community split (each triangle half in a, half in b) goes
    // NEGATIVE: cross edges dominate
    val bad = Seq(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "b", 5L -> "a",
      6L -> "b")
    assert(run(twoTri, bad)._4.get < 0.0)
  }

  test("modularityGainPass: misassigned node crosses to its triangle; " +
      "a good partition is a fixed point; ties stay put") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], asg: Seq[(Long, String)]) =
      Graph.modularityGainPass(edges.toDF("s", "d"), "s", "d",
        asg.toDF("n", "c"), "n", "c")
        .collect().map(r => r.getAs[Long]("node") ->
          ((r.getAs[String]("new_comm"), r.getAs[Boolean]("moved"),
            r.getAs[Long]("gain_num")))).toMap
    // two triangles + bridge; node 6 mislabeled into community a
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val wrong = Seq(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b",
      5L -> "b", 6L -> "a")
    val r = run(tri, wrong)
    assert(r(6L)._1 == "b" && r(6L)._2 && r(6L)._3 > 0L,
      s"node 6 should cross: ${r(6L)}")
    // nodes deep in their triangles stay
    assert(!r(1L)._2 && !r(5L)._2)
    // the correct split is a fixed point: nobody moves, all gains 0
    val right = wrong.map { case (n, _) => n -> (if (n <= 3) "a" else "b") }
    val fp = run(tri, right)
    assert(fp.values.forall(v => !v._2 && v._3 == 0L), s"not fixed: $fp")
    // symmetric middle of a path: equal gains -> stays in its own
    val path = Seq((1L, 2L), (2L, 3L))
    val mid = run(path, Seq(1L -> "p", 2L -> "p", 3L -> "q"))
    assert(mid(2L)._1 == "p" && !mid(2L)._2 && mid(2L)._3 == 0L)
  }

  test("randomWalks: hops follow real edges, sinks end walks with the " +
      "prefix kept, and the corpus is partition-invariant") {
    import spark.implicits._
    // 3 has no out-edges: any walk reaching it stops there
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L), (4L, 1L), (1L, 4L))
    val df = edges.toDF("s", "d")
    val out = Graph.randomWalks(df, "s", "d", steps = 3, seed = "t")
      .collect().map(r => (r.getAs[String]("walk"), r.getAs[Long]("step"),
        r.getAs[Long]("node")))
    // every node with out-edges starts exactly one walk at step 0
    val starts = out.filter(_._2 == 0L).map(_._3).sorted
    assert(starts.toSeq == Seq(1L, 2L, 4L))
    // consecutive steps of a walk traverse actual edges
    val byWalk = out.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3))
    val es = edges.toSet
    byWalk.values.foreach { path =>
      path.zip(path.tail).foreach(p => assert(es.contains(p),
        s"hop $p not an edge in path ${path.toSeq}"))
    }
    // walks hitting the sink are shorter; no walk continues past 3
    byWalk.values.foreach { path =>
      val i = path.indexOf(3L)
      if (i >= 0) assert(i == path.length - 1, s"walked past sink: $path")
    }
    // determinism under different partitioning
    val out2 = Graph.randomWalks(df.repartition(7), "s", "d", 3, "t")
      .collect().map(r => (r.getAs[String]("walk"), r.getAs[Long]("step"),
        r.getAs[Long]("node"))).sorted
    assert(out.sorted.toSeq == out2.toSeq)
    // walksPerNode fans out with distinct #w suffixes (and they may
    // take different routes because the hash keys differ)
    val multi = Graph.randomWalks(df, "s", "d", 2, "t", walksPerNode = 2)
      .collect().map(_.getAs[String]("walk")).distinct
    assert(multi.count(_.startsWith("1#")) == 2)
  }

  test("pageRankWeighted: unit weights reproduce unweighted pageRank " +
      "bit-for-bit; heavier edges pull rank toward their target") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L)).toDF("s", "d")
    val unw = Graph.pageRank(edges, "s", "d", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w1 = Graph.pageRankWeighted(edges.withColumn("w",
        org.apache.spark.sql.functions.lit(1L)), "s", "d", "w", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(unw == w1, s"$unw vs $w1")
    // same topology, but every edge INTO node 3 is 10x: 3 must out-rank
    val wd = Seq((1L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 10L), (3L, 1L, 1L),
      (2L, 3L, 10L), (3L, 2L, 1L)).toDF("s", "d", "w")
    val wr = Graph.pageRankWeighted(wd, "s", "d", "w", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wr(3L) > wr(1L) && wr(3L) > wr(2L), wr.toString)
    // duplicate edge rows pre-sum, never drop
    val dup = Graph.pageRankWeighted(
      wd.unionAll(Seq((1L, 3L, 5L)).toDF("s", "d", "w")), "s", "d", "w", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dup(3L) > wr(3L), s"$dup vs $wr")
  }

  test("hyperAnf: sketches equal a direct HLL of the exact ball, " +
      "converge on cycles, and sinks never grow") {
    import spark.implicits._
    // 1 <-> 2 cycle plus 2 -> 3 (3 is a sink)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("s", "d")
    val out = Graph.hyperAnf(edges, "s", "d", maxHops = 3, b = 6)
      .collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Int]("hop")) ->
        ((r.getAs[Long]("nonempty"), r.getAs[Double]("est")))).toMap
    // sink 3: ball stays {3} at every hop
    assert(out((3L, 1)) == out((3L, 3)))
    // ball(1): {1,2,3} from hop 2 on (1 -> 2 -> 3); converged by 3
    assert(out((1L, 2)) == out((1L, 3)))
    assert(out((1L, 2))._1 >= out((1L, 1))._1)
    // the hop-2 sketch of node 1 must EQUAL a direct HLL of the exact
    // ball {1, 2, 3} — same registers, same estimator
    val direct = graft.operators.Sketches.hllEstimate(
      graft.operators.Sketches.hllRegisters(
        Seq(1L, 2L, 3L).toDF("k").withColumn("g",
          org.apache.spark.sql.functions.lit("b")),
        Seq("g"), "k", 6), Seq("g"), 6).head()
    assert(out((1L, 2))._1 == direct.getAs[Long]("nonempty"))
    assert(out((1L, 2))._2 == direct.getAs[Double]("hll_estimate"))
  }

  test("hyperAnf: packed registers replay the row-form HLL on a hub " +
      "whose ball populates fields across every packed word") {
    import spark.implicits._
    // star: 0 -> 1..80, so ball(0, 1) = {0..80} — 81 md5-scattered
    // keys drive register indices across all 7 packed words (and force
    // in-field max collisions), the case a word-boundary or shift bug
    // in the 6-bit packing would break
    val spokes = (1L to 80L).map(i => (0L, i))
    val edges = spokes.toDF("s", "d")
    val got = Graph.hyperAnf(edges, "s", "d", maxHops = 1, b = 6)
      .where($"node" === 0L).head()
    val direct = graft.operators.Sketches.hllEstimate(
      graft.operators.Sketches.hllRegisters(
        (0L to 80L).toDF("k").withColumn("g",
          org.apache.spark.sql.functions.lit("b")),
        Seq("g"), "k", 6), Seq("g"), 6).head()
    assert(got.getAs[Long]("nonempty") == direct.getAs[Long]("nonempty"))
    assert(got.getAs[Double]("est") == direct.getAs[Double]("hll_estimate"))
  }

  test("personalizedPageRank: mass stays near the seeds, uniform " +
      "seeding over all nodes reproduces plain pageRank, linkless " +
      "seeds still anchor") {
    import spark.implicits._
    // two disconnected triangles {1,2,3} and {4,5,6}; seed = {1}
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L),
      (4L, 5L), (5L, 6L), (6L, 4L), (5L, 4L), (6L, 5L), (4L, 6L))
      .toDF("s", "d")
    val ppr = Graph.personalizedPageRank(tri, "s", "d",
        Seq(1L).toDF("seed"), "seed", 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the unseeded component receives NO mass at all
    assert(ppr(4L) == 0.0 && ppr(5L) == 0.0 && ppr(6L) == 0.0, ppr.toString)
    assert(ppr(1L) > ppr(2L) && ppr(2L) > 0.0, ppr.toString)
    // seeding EVERY node uniformly = plain pagerank, bit for bit
    val all = (1L to 6L).toDF("seed")
    val uni = Graph.personalizedPageRank(tri, "s", "d", all, "seed", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = Graph.pageRank(tri, "s", "d", 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni == plain, s"$uni vs $plain")
    // a seed with no edges keeps its teleport share
    val lone = Graph.personalizedPageRank(tri, "s", "d",
        Seq(99L).toDF("seed"), "seed", 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lone(99L) > 0.0 && lone(1L) == 0.0)
  }

  test("textRank: the hub word of a star-shaped corpus ranks first; " +
      "hapax adjacency is pruned") {
    import spark.implicits._
    // "core" is adjacent to every satellite repeatedly; satellites
    // never touch each other; "once onlyword" appears a single time
    val docs = (1 to 10).flatMap(i => Seq(
      s"core sat$i core sat$i core sat$i",
      s"sat$i core sat$i core")) ++ Seq("once onlyword")
    val out = graft.operators.Ranking.textRank(
        docs.map(Tuple1(_)).toDF("text"), "text", k = 5)
      .collect()
    assert(out.head.getAs[String]("word") == "core", out.mkString(", "))
    assert(!out.map(_.getAs[String]("word")).contains("once"))
    // ranks are a probability-ish vector: positive, hub dominates
    assert(out.head.getAs[Double]("pr") > out.last.getAs[Double]("pr"))
  }

  test("katz: hand-walked path graph; star center collects its " +
      "spokes' attenuated mass; truncation depth visible") {
    import spark.implicits._
    // directed path a(1) -> b(2) -> c(3), alpha = 1/5, 2 rounds:
    // round 1: m(b)=2e8, m(c)=2e8; round 2: m(b)=0, m(c)=4e7
    // katz: a=0, b=0.2, c=0.24
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val out = graft.operators.Graph.katz(path, "s", "d",
        iterations = 2, alphaDen = 5L)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Double]("katz")).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.2 && out(3L) == 0.24,
      out.toString)
    // 1 round stops the 2-hop term: c gets only 0.2
    val one = graft.operators.Graph.katz(path, "s", "d",
        iterations = 1, alphaDen = 5L)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Double]("katz")).toMap
    assert(one(3L) == 0.2)
    // star: 4 spokes -> center; center katz = 4/5 after 1 round
    val star = (1L to 4L).map(i => (i + 10L, 1L)).toDF("s", "d")
    val cs = graft.operators.Graph.katz(star, "s", "d",
        iterations = 3, alphaDen = 5L)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Double]("katz")).toMap
    assert(cs(1L) == 0.8 && cs(11L) == 0.0)
  }

  test("conductance: two triangles + one bridge = 1/7 each; an " +
      "unassigned endpoint drops its edge loudly") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle A
      (4L, 5L), (5L, 6L), (4L, 6L),               // triangle B
      (3L, 4L))                                   // bridge
    val assign = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B"))
    val out = graft.operators.Graph.conductance(
        edges.toDF("u", "v"), "u", "v",
        assign.toDF("node", "comm"), "node", "comm")
      .collect().map(r => r.getAs[String]("community") -> r).toMap
    // vol = 2*3 internal ends + 1 bridge end = 7; cut = 1
    for (c <- Seq("A", "B")) {
      assert(out(c).getAs[Long]("vol") == 7 &&
        out(c).getAs[Long]("cut") == 1)
      assert(math.abs(out(c).getAs[Double]("conductance") - 1.0 / 7.0)
        < 1e-15)
      assert(out(c).getAs[Long]("n_edges_unassigned") == 0)
    }
    // drop node 6's assignment: its two edges leave loudly
    val partial = assign.filterNot(_._1 == 6L)
    val o2 = graft.operators.Graph.conductance(
        edges.toDF("u", "v"), "u", "v",
        partial.toDF("node", "comm"), "node", "comm")
      .collect().map(r => r.getAs[String]("community") -> r).toMap
    assert(o2("A").getAs[Long]("n_edges_unassigned") == 2)
    assert(o2("B").getAs[Long]("vol") == 3) // 4-5, 5-4 ends + bridge end
  }

  test("moranGeary: matches the naive spatial formula on a path graph; " +
      "clustered values attract, alternating repel; constant is null; " +
      "valueless endpoints drop their edges loudly") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], vals: Seq[(Long, Long)]) =
      Graph.moranGeary(edges.toDF("s", "d"), "s", "d",
        vals.toDF("nd", "x"), "nd", "x").head()
    // independent naive formula over the symmetric adjacency
    def naive(edges: Seq[(Long, Long)], vals: Map[Long, Long]) = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .filter(vals.contains)
      val n = nodes.length
      val xbar = nodes.map(vals).sum.toDouble / n
      val kept = edges.filter(e => vals.contains(e._1) && vals.contains(e._2))
      val dirs = kept.flatMap(e => Seq(e, (e._2, e._1)))
      val w = dirs.length.toDouble
      val den = nodes.map(u => math.pow(vals(u) - xbar, 2)).sum
      val i = (n / w) * dirs.map { case (u, v) =>
        (vals(u) - xbar) * (vals(v) - xbar) }.sum / den
      val c = ((n - 1) / (2 * w)) * dirs.map { case (u, v) =>
        math.pow(vals(u).toDouble - vals(v), 2) }.sum / den
      (i, c)
    }
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val smooth = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
    val r1 = run(path, smooth)
    val (i1, c1) = naive(path, smooth.toMap)
    assert(math.abs(r1.getAs[Double]("moran_i") - i1) < 1e-12)
    assert(math.abs(r1.getAs[Double]("geary_c") - c1) < 1e-12)
    assert(r1.getAs[Double]("moran_i") > r1.getAs[Double]("e_i")) // attract
    assert(r1.getAs[Double]("geary_c") < 1.0)
    // alternating values on a cycle: perfect repulsion
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val alt = Seq((1L, 0L), (2L, 10L), (3L, 0L), (4L, 10L))
    val r2 = run(cyc, alt)
    val (i2, c2) = naive(cyc, alt.toMap)
    assert(math.abs(r2.getAs[Double]("moran_i") - i2) < 1e-12)
    assert(r2.getAs[Double]("moran_i") < r2.getAs[Double]("e_i"))
    assert(math.abs(r2.getAs[Double]("geary_c") - c2) < 1e-12)
    assert(r2.getAs[Double]("geary_c") > 1.0)
    // constant value: zero denominator -> null stats, censuses intact
    val rc = run(path, Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)))
    assert(rc.isNullAt(rc.fieldIndex("moran_i")))
    assert(rc.getAs[Long]("n_nodes") == 4)
    // node 4 valueless: edge 3-4 dropped loudly, units still count 3
    val rd = run(path, Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(rd.getAs[Long]("n_edges_dropped") == 1)
    assert(rd.getAs[Long]("n_edges") == 2)
    assert(rd.getAs[Long]("n_nodes") == 3)
    // ZERO valued units (r11 advisor): the shape contract is still ONE
    // all-null-stats row — a groupBy-built denominator would emit zero
    // rows and silently change the output grain on degenerate input
    val rows0 = Graph.moranGeary(path.toDF("s", "d"), "s", "d",
      Seq.empty[(Long, Long)].toDF("nd", "x"), "nd", "x").collect()
    assert(rows0.length == 1)
    val r0 = rows0.head
    assert(r0.getAs[Long]("n_nodes") == 0)
    assert(r0.isNullAt(r0.fieldIndex("moran_i")))
    assert(r0.isNullAt(r0.fieldIndex("geary_c")))
  }

  test("shortestPaths: a cheap 2-hop route beats an expensive direct " +
      "edge; multi-seed frames; unreachable absent; duplicate edges " +
      "keep the min weight; loud negative-weight and overrun gates") {
    import spark.implicits._
    val edges = Seq(
      (1L, 4L, 10L), (1L, 2L, 2L), (2L, 4L, 3L),  // 1->4 via 2 costs 5
      (4L, 5L, 0L),                                // zero weight legal
      (1L, 2L, 7L),                                // dup edge: min wins
      (3L, 1L, 1L), (9L, 9L, 1L))
    val seeds = Seq(1L, 3L).toDF("seed")
    val out = graft.operators.Graph.shortestPaths(
        edges.toDF("u", "v", "w"), "u", "v", "w", seeds, "seed")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out((1L, 1L)) == 0L && out((1L, 2L)) == 2L)
    assert(out((1L, 4L)) == 5L)           // relax found the 2-hop route
    assert(out((1L, 5L)) == 5L)           // zero-weight hop
    assert(out((3L, 4L)) == 6L)           // 3->1->2->4
    assert(!out.contains((1L, 3L)))       // 3 unreachable from 1
    assert(!out.contains((1L, 9L)))       // disconnected self-loop
    // negative weight refused loudly
    val neg = intercept[Exception] {
      graft.operators.Graph.shortestPaths(
        Seq((1L, 2L, -1L)).toDF("u", "v", "w"), "u", "v", "w",
        Seq(1L).toDF("seed"), "seed").collect()
    }
    assert(neg.getMessage != null && neg.getMessage.contains("negative"),
      neg.getMessage)
    // overrun: a 6-hop chain cannot converge in 2 rounds
    val chain = (1L to 6L).map(i => (i, i + 1, 1L))
    val ex = intercept[IllegalStateException] {
      graft.operators.Graph.shortestPaths(chain.toDF("u", "v", "w"),
        "u", "v", "w", Seq(1L).toDF("seed"), "seed", maxRounds = 2)
    }
    assert(ex.getMessage.contains("converge"))
  }

  test("betweennessSampled: path/diamond/star hand values with all " +
      "sources; sigma splits across equal-length paths; truncation " +
      "zeroes the horizon; pivots never self-score") {
    import spark.implicits._
    def sym(edges: Seq[(Long, Long)]) =
      (edges ++ edges.map(e => (e._2, e._1))).toDF("a", "b")
    def run(edges: Seq[(Long, Long)], k: Int, depth: Int) =
      Graph.betweennessSampled(sym(edges), "a", "b", k, depth)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // path 1-2-3-4-5, all 5 pivots: bt = #ordered pairs routed through
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val bp = run(path, 5, 4)
    assert(bp(1L) == 0.0 && bp(5L) == 0.0)
    assert(bp(2L) == 6.0 && bp(4L) == 6.0) // s=1,t in {3,4,5}, x2
    assert(bp(3L) == 8.0)                  // {1,2} x {4,5} x2
    // diamond 1-2-4 / 1-3-4: two equal geodesics split sigma 50/50
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val bd = run(dia, 4, 3)
    assert(math.abs(bd(2L) - 1.0) < 1e-9, bd.toString) // (1,4)+(4,1) halves
    assert(math.abs(bd(3L) - 1.0) < 1e-9)
    // symmetry: 2<->3 likewise splits across 1 and 4 — every corner
    // sits on exactly one half-weighted ordered pair each way
    assert(math.abs(bd(1L) - 1.0) < 1e-9 && math.abs(bd(4L) - 1.0) < 1e-9)
    // star: the hub carries every leaf pair (3 leaves -> 6 ordered)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    assert(run(star, 4, 2)(1L) == 6.0)
    // truncation: depth 1 sees no interior vertices at all
    assert(run(path, 5, 1).values.forall(_ == 0.0))
    // sampling: pivots = smallest ids; with only s=1 on the path,
    // bt(4) counts just the 1->5 geodesic
    val b1 = run(path, 1, 4)
    assert(b1(4L) == 1.0 && b1(2L) == 3.0)
  }

  test("harmonicFromAnf: hop fold is exact arithmetic on the estimates; " +
      "a star center out-scores its leaves end-to-end") {
    import spark.implicits._
    // hand-built anf rows: node 1 balls (3.0, 5.0) -> (3-1)/1 + (5-3)/2
    val anf = Seq((1L, 1, 2L, 3.0), (1L, 2, 4L, 5.0))
      .toDF("node", "hop", "nonempty", "est")
    val h = Graph.harmonicFromAnf(anf).head()
    assert(h.getAs[Double]("harmonic") == (3.0 - 1.0) / 1.0 + (5.0 - 3.0) / 2.0)
    // end-to-end: directed star center reaches everyone at hop 1
    val edges = (1L to 12L).map(i => (0L, i)).toDF("s", "d")
    val hc = Graph.harmonicFromAnf(
        Graph.hyperAnf(edges, "s", "d", maxHops = 2))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("harmonic"))
      .toMap
    assert(hc(0L) > hc(1L)) // leaves reach nobody (directed out)
    assert(hc(0L) > 5.0)    // ~12 neighbors at distance 1, HLL-estimated
  }

  test("effectiveDiameterFromAnf: hand interpolation on synthetic P(h); " +
      "already-covered-at-zero clamps; a path graph needs more hops " +
      "than a star") {
    import spark.implicits._
    // two nodes, hand P: P(0)=2, P(1)=6.0, P(2)=10.0; q=0.9 ->
    // target=9.0, crossed at h=2: eff = 1 + (9-6)/(10-6) = 1.75
    val anf = Seq((1L, 1, 2L, 3.0), (1L, 2, 4L, 6.0),
      (2L, 1, 2L, 3.0), (2L, 2, 4L, 4.0))
      .toDF("node", "hop", "nonempty", "est")
    val r = Graph.effectiveDiameterFromAnf(anf, 0.9).head()
    assert(r.getAs[Long]("n_nodes") == 2L)
    assert(r.getAs[Double]("p_final") == 10.0)
    assert(r.getAs[Double]("eff_diameter") == 1.75)
    // target below P(0): diameter 0 (everyone already covers the mass)
    val r0 = Graph.effectiveDiameterFromAnf(anf, 0.1).head()
    assert(r0.getAs[Double]("eff_diameter") == 0.0)
    // structural (q=0.999 reads SATURATION, which survives the raw
    // HLL small-range bias the estimator documents): a star's P(h)
    // saturates at hop 2, a 7-edge path keeps growing through hop 4
    def und(e: Seq[(Long, Long)]) =
      (e ++ e.map(p => (p._2, p._1))).toDF("s", "d")
    val star = Graph.effectiveDiameterFromAnf(Graph.hyperAnf(
      und((1L to 8L).map((0L, _))), "s", "d", 4), 0.999).head()
    val path = Graph.effectiveDiameterFromAnf(Graph.hyperAnf(
      und((0L to 6L).map(i => (i, i + 1))), "s", "d", 4), 0.999).head()
    assert(star.getAs[Double]("eff_diameter") <= 2.0, star.toString)
    assert(path.getAs[Double]("eff_diameter") > 3.0, path.toString)
  }
}
