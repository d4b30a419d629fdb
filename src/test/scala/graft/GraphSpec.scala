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
}
