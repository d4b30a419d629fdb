package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Components

/** Connected-components semantics the q96 oracle fixture cannot probe:
  * long chains (many propagation rounds), stars, isolated pairs mixed
  * with big components, the non-convergence guard, and determinism. */
class ComponentsSpec extends AnyFunSuite with SparkFixture {

  private def comps(pairs: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
  }

  test("path graph collapses to its min id (diameter-bound propagation)") {
    // 0-1-2-...-12: diameter 12, worst case for min-label propagation
    val chain = (0L until 12L).map(i => (i, i + 1))
    val m = comps(chain)
    assert(m.size == 13)
    assert(m.values.toSet == Set(0L))
  }

  test("disjoint structures keep separate labels") {
    //  star around 100; triangle 7-8-9; pair (3,4); chain 20-21-22
    val pairs = Seq((100L, 101L), (100L, 102L), (100L, 103L),
      (7L, 8L), (8L, 9L), (7L, 9L), (3L, 4L), (20L, 21L), (21L, 22L))
    val m = comps(pairs)
    assert(m(101L) == 100L && m(102L) == 100L && m(103L) == 100L)
    assert(m(7L) == 7L && m(8L) == 7L && m(9L) == 7L)
    assert(m(3L) == 3L && m(4L) == 3L)
    assert(Set(20L, 21L, 22L).map(m) == Set(20L))
  }

  test("duplicate and reversed edges do not change the labeling") {
    val m = comps(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("maxIter smaller than the diameter fails loudly, not silently") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    assertThrows[IllegalStateException] { comps(chain, maxIter = 2) }
  }

  test("random graphs agree with a local union-find reference") {
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { _ =>
      val n = 2 + rnd.nextInt(25)
      val edges = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = comps(edges)
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val present = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = present.groupBy(id => find(id.toInt))
          .values.flatMap(grp => grp.map(_ -> grp.min)).toMap
        assert(got == expected, s"n=$n edges=$edges")
      }
    }
  }

  private def altComps(pairs: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponentsAltStar(pairs.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
  }

  test("altStar: agrees with label propagation on path/star/clique/pair shapes") {
    val shapes = Seq(
      (0L until 12L).map(i => (i, i + 1)),                       // path
      Seq((100L, 101L), (100L, 102L), (100L, 103L)),             // star
      Seq((7L, 8L), (8L, 9L), (7L, 9L), (3L, 4L)),               // clique + pair
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))               // dups/reversed
    shapes.foreach { edges => assert(altComps(edges) == comps(edges), edges) }
  }

  test("altStar: random graphs agree with label propagation") {
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { _ =>
      val n = 2 + rnd.nextInt(25)
      val edges = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) assert(altComps(edges) == comps(edges), edges)
    }
  }

  test("altStar: converges in O(log n) rounds where label-prop needs diameter") {
    // a 120-node path: label propagation walks one hop per round (needs
    // ~120 rounds — asserted to blow a 30-round budget), star contraction
    // collapses it within a log-scale budget of 12.
    val longPath = (0L until 119L).map(i => (i, i + 1))
    assertThrows[IllegalStateException] { comps(longPath, maxIter = 30) }
    val m = altComps(longPath, maxIter = 12)
    assert(m.size == 120 && m.values.toSet == Set(0L))
  }

  test("altStar: empty pair set yields empty labeling, converged") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponentsAltStar(empty, "a", "b").isEmpty)
  }

  test("componentsWithSizes reports the census of each closure") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val rows = Components.componentsWithSizes(pairs, "a", "b")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("component"),
        r.getAs[Long]("csize"))).toSet
    assert(rows == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("canonicalize keeps exactly one doc per component plus singletons") {
    import spark.implicits._
    val corpus = (1L to 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Components.canonicalize(corpus, "doc_id", pairs, "a", "b")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Boolean]("kept")))).toMap
    assert(out.size == 12)
    // component members label to the min id; only the min survives
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false)) && out(3L) == ((1L, false)))
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)))
    // singletons (never in a pair) keep themselves
    assert(Seq(4L, 5L, 12L).forall(id => out(id) == ((id, true))))
    assert(out.values.count(_._2) == 9) // 12 docs - 3 dropped dups
  }

  test("canonicalizeBy keeps the highest-priority member, ties by smallest id") {
    import spark.implicits._
    val corpus = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (10L, 1.0), (11L, 0.5),
      (20L, 7.0)).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Components.canonicalizeBy(corpus, "doc_id", "score", pairs, "a", "b")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Boolean]("kept")))).toMap
    // cluster {1,2,3}: 2 and 3 tie on 9.0 -> 2 wins (smaller id), NOT min-id 1
    assert(out(1L) == ((1L, false)) && out(2L) == ((1L, true)) && out(3L) == ((1L, false)))
    // cluster {10,11}: 10 wins on score
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)))
    // singleton keeps itself regardless of score
    assert(out(20L) == ((20L, true)))
    assert(out.values.count(_._2) == 3)
  }
}
