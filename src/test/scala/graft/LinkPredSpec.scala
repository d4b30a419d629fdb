package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkPred

/** Common-neighbor link prediction (q222's operator, off-fixture). */
class LinkPredSpec extends AnyFunSuite with SparkFixture {

  // path + chords: 1-2, 2-3, 3-4, 4-5, 1-3 (triangle 1-2-3), 2-4
  private def pathEdges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (2L, 4L))
      .toDF("a", "b")
  }

  test("hand graph: cn counts exact, adjacent pairs excluded") {
    val got = LinkPred.commonNeighbors(pathEdges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // adjacency: 1:{2,3} 2:{1,3,4} 3:{1,2,4} 4:{2,3,5} 5:{4}
    // non-adjacent pairs with shared neighbors:
    //  (1,4): common {2,3} -> cn=2, degsum=2+3=5, jacc=2/3
    //  (2,5): common {4}   -> cn=1, degsum=3+1=4, jacc=1/3
    //  (3,5): common {4}   -> cn=1, degsum=3+1=4, jacc=1/3
    //  (1,5): none
    assert(got.keySet === Set((1L, 4L), (2L, 5L), (3L, 5L)))
    assert(got((1L, 4L)) === ((2L, 5L, 2.0 / 3.0)))
    assert(got((2L, 5L)) === ((1L, 4L, 1.0 / 3.0)))
    assert(got((3L, 5L)) === ((1L, 4L, 1.0 / 3.0)))
  }

  test("direction, duplicates and self-loops collapse before scoring") {
    import spark.implicits._
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (4L, 3L), (4L, 4L),
      (5L, 4L), (3L, 1L), (4L, 2L), (2L, 3L)).toDF("a", "b")
    val clean = LinkPred.commonNeighbors(pathEdges, "a", "b")
      .orderBy("u", "v").collect().toSeq
    val got = LinkPred.commonNeighbors(messy, "a", "b")
      .orderBy("u", "v").collect().toSeq
    assert(got === clean)
  }

  test("maxPivotDegree drops wedges through hubs; hubCensus names them") {
    import spark.implicits._
    // star: hub 0 joined to 1..5, plus one off-hub edge 1-2
    val star = ((1L to 5L).map(s => (0L, s)) ++ Seq((1L, 2L))).toDF("a", "b")
    val uncapped = LinkPred.commonNeighbors(star, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // all spoke pairs share hub 0; (1,2) is adjacent so excluded
    assert(uncapped.keySet.size === 9 && uncapped((3L, 4L)) === 1L)
    val capped = LinkPred.commonNeighbors(star, "a", "b", maxPivotDegree = 4)
      .collect()
    // hub degree 5 > 4: no wedge survives except through spokes, and
    // spokes 1,2 (degree 2) pivot only the adjacent/hub pairs (0,2),(0,1)
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set.empty[(Long, Long)])
    val hubs = LinkPred.hubCensus(star, "a", "b", maxPivotDegree = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hubs === Map(0L -> 5L))
    assert(LinkPred.hubCensus(star, "a", "b", maxPivotDegree = 5)
      .count() === 0L)
  }

  test("capped cn is a lower bound of uncapped on a mixed graph") {
    import spark.implicits._
    // hub 9 over 1..4 plus a path 1-2-3 (so (1,3) has pivots 2 and 9)
    val edges = ((1L to 4L).map(s => (9L, s)) ++ Seq((1L, 2L), (2L, 3L)))
      .toDF("a", "b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = asMap(LinkPred.commonNeighbors(edges, "a", "b"))
    val cap = asMap(LinkPred.commonNeighbors(edges, "a", "b", maxPivotDegree = 3))
    assert(full((1L, 3L)) === 2L && cap((1L, 3L)) === 1L) // hub pivot dropped
    cap.foreach { case (k, v) => assert(v <= full(k)) }
  }

  test("weightedScores: hand Adamic-Adar/RA values; a niche pivot " +
      "certifies more than a hub; square graph doubles the terms") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]) =
      LinkPred.weightedScores(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getAs[Double]("adamic_adar"),
            r.getAs[Double]("resource_alloc")))).toMap
    // path 1-2-3: pivot 2 has degree 2 -> AA = 1/ln2, RA = 1/2
    val path = run(Seq((1L, 2L), (2L, 3L)))
    val (cn, aa, ra) = path((1L, 3L))
    assert(cn == 1L && ra == 0.5)
    assert(math.abs(aa - 1.0 / math.log(2.0)) < 1e-15)
    // square 1-2-3-4-1: (1,3) via pivots 2 and 4 (deg 2 each)
    val sq = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(math.abs(sq((1L, 3L))._2 - 2.0 / math.log(2.0)) < 1e-15)
    assert(sq((1L, 3L))._3 == 1.0)
    // hub discrimination: a degree-4 hub pivot scores its pairs BELOW
    // a degree-2 niche pivot's pair
    val mixed = run(Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L),
      (5L, 7L), (6L, 7L)))
    assert(mixed((5L, 6L))._2 > mixed((1L, 2L))._2)
    assert(math.abs(mixed((1L, 2L))._2 - 1.0 / math.log(4.0)) < 1e-15)
  }
}
