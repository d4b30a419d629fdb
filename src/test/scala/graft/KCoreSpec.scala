package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

/** k-core peeling (q227's operator, off-fixture). */
class KCoreSpec extends AnyFunSuite with SparkFixture {

  private def core(edges: Seq[(Long, Long)], k: Int, maxIter: Int = 50) = {
    import spark.implicits._
    KCore.kCore(edges.toDF("a", "b"), "a", "b", k, maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { a <- ids; b <- ids if a < b } yield (a, b)

  test("a 5-clique is its own 4-core; its 5-core is empty") {
    val e = clique(1L to 5L)
    assert(core(e, 4) === (1L to 5L).map(_ -> 4L).toMap)
    assert(core(e, 5) === Map.empty)
  }

  test("cycle survives k=2 whole; path peels away from both ends") {
    val cycle = (1L to 6L).map(i => (i, i % 6 + 1))
    assert(core(cycle, 2) === (1L to 6L).map(_ -> 2L).toMap)
    val path = (1L to 5L).map(i => (i, i + 1))
    assert(core(path, 2) === Map.empty)
  }

  test("pendant chain cascades off; the clique core is untouched") {
    // 4-clique 1..4 plus chain 4-10-11-12 hanging off it
    val e = clique(1L to 4L) ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val got = core(e, 3)
    assert(got === (1L to 4L).map(_ -> 3L).toMap)
    // the chain's removal is CASCADING: 12 first, then 11, then 10 —
    // three peel rounds, each re-deriving degrees on survivors
  }

  test("core degrees are subgraph degrees, not input degrees") {
    // two 4-cliques sharing node 1: node 1 has input degree 6, but each
    // clique's internal degree contribution stays — 3-core keeps all,
    // node 1's core_deg is its FULL surviving degree 6
    val e = clique(1L to 4L) ++ clique(Seq(1L, 5L, 6L, 7L))
    val got = core(e, 3)
    assert(got(1L) === 6L)
    assert(Seq(2L, 3L, 4L, 5L, 6L, 7L).forall(got(_) === 3L))
  }

  test("maxIter overrun fails loudly instead of returning a half-peel") {
    val path = (1L to 30L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException](core(path, 2, maxIter = 3))
    assert(ex.getMessage.contains("did not converge"))
  }

  test("kTruss: K4 is a 4-truss with support 2 everywhere; an attached " +
      "triangle survives k=3 but peels at k=4; pendant edges never " +
      "survive; the cascade re-peels edges whose triangles died") {
    import spark.implicits._
    def truss(edges: Seq[(Long, Long)], k: Int) =
      KCore.kTruss(edges.toDF("a", "b"), "a", "b", k)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    // K4 on 1-4, triangle (4,5,6), pendant (6,7)
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L))
    val t3 = truss(g, 3)
    assert(t3.size == 9) // all but the pendant
    assert(!t3.contains((6L, 7L)))
    assert(t3((4L, 5L)) == 1L && t3((1L, 2L)) == 2L)
    val t4 = truss(g, 4)
    assert(t4.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    assert(t4.values.forall(_ == 2L))
    // nothing at k=5
    assert(truss(g, 5).isEmpty)
    // cascade: two triangles sharing edge (1,2) — (1,2) has support 2
    // but its mates have 1; at k=4 the mates die in round 1, which
    // starves (1,2) in round 2 -> empty, only via the ITERATION
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(truss(twoTri, 4).isEmpty)
    // kTrussPeel with rounds=1 shows the intermediate state the
    // fixpoint erases: (1,2) alive after one peel, support now 0
    val one = KCore.kTrussPeel(twoTri.toDF("a", "b"), "a", "b", 4, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(one.keySet == Set((1L, 2L)) && one((1L, 2L)) == 0L)
  }

  test("trussDecomposition: per-edge trussness sweeps K4=4 / hanging " +
      "triangle=3 / pendant=2, covers every canonical edge exactly " +
      "once, agrees with per-k kTruss membership, loud maxK overrun") {
    import spark.implicits._
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L))
    val d = KCore.trussDecomposition(g.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(d.size == 10) // every canonical edge scored exactly once
    assert(d((6L, 7L)) == 2L)                       // pendant
    assert(d((4L, 5L)) == 3L && d((5L, 6L)) == 3L && d((4L, 6L)) == 3L)
    assert(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).forall(e => d(e) == 4L))            // K4
    // cross-check: trussness >= k  <=>  membership in the k-truss
    for (k <- 3 to 4) {
      val member = KCore.kTruss(g.toDF("a", "b"), "a", "b", k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(d.filter(_._2 >= k).keySet == member, s"k=$k")
    }
    // loud overrun: K4's trussness is 4 > maxK=3
    val ex = intercept[IllegalStateException](
      KCore.trussDecomposition(g.toDF("a", "b"), "a", "b", maxK = 3))
    assert(ex.getMessage.contains("maxK"))
    // triangle-free graph: everything is trussness 2
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val dp = KCore.trussDecomposition(path.toDF("a", "b"), "a", "b")
      .collect().map(_.getLong(2))
    assert(dp.length == 3 && dp.forall(_ == 2L))
  }
}
