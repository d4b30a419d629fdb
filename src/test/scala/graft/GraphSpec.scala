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
}
