package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

/** Skyline / Pareto frontier (q230's operator, off-fixture). */
class SkylineSpec extends AnyFunSuite with SparkFixture {

  test("hand 2D frontier: dominated rows drop, incomparable rows stay") {
    import spark.implicits._
    // maximize q, minimize p
    val df = Seq(
      (1L, 10.0, 5.0),  // frontier
      (2L, 10.0, 7.0),  // dominated by 1 (same q, worse p)
      (3L, 8.0, 3.0),   // frontier (cheaper)
      (4L, 7.0, 4.0),   // dominated by 3
      (5L, 12.0, 9.0),  // frontier (highest q)
      (6L, 8.0, 3.0)    // duplicate of 3: incomparable, stays
    ).toDF("id", "q", "p")
    val got = Skyline.skyline(df, "id", Seq(("q", true), ("p", false)))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(_._1).toSet === Set(1L, 3L, 5L, 6L))
    // minimized column returns with its original sign
    assert(got.find(_._1 == 3L).get === ((3L, 8.0, 3.0)))
  }

  test("3D frontier matches a brute-force dominance check") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = IndexedSeq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble,
        rnd.nextInt(20).toDouble))
    val df = rows.toDF("id", "a", "b", "c").repartition(7)
    val got = Skyline.skyline(df, "id",
        Seq(("a", true), ("b", false), ("c", true)))
      .collect().map(_.getLong(0)).toSet
    def dom(x: (Long, Double, Double, Double),
        y: (Long, Double, Double, Double)): Boolean =
      x._2 >= y._2 && x._3 <= y._3 && x._4 >= y._4 &&
        (x._2 > y._2 || x._3 < y._3 || x._4 > y._4)
    val expect = rows.filter(r => !rows.exists(o => dom(o, r))).map(_._1).toSet
    assert(got === expect)
  }

  test("partitioning cannot change the frontier") {
    import spark.implicits._
    val rows = IndexedSeq.tabulate(200)(i =>
      (i.toLong, (i * 37 % 50).toDouble, (i * 53 % 50).toDouble))
    def run(parts: Int) = Skyline.skyline(
        rows.toDF("id", "x", "y").repartition(parts), "id",
        Seq(("x", true), ("y", true)))
      .collect().map(_.getLong(0)).toSet
    assert(run(1) === run(13))
  }

  test("candidate cap fails loudly on an anti-correlated blow-up") {
    import spark.implicits._
    // y = -x: every point is on the frontier
    val rows = IndexedSeq.tabulate(500)(i => (i.toLong, i.toDouble, -i.toDouble))
    val ex = intercept[org.apache.spark.SparkException] {
      Skyline.skyline(rows.toDF("id", "x", "y"), "id",
        Seq(("x", true), ("y", true)), maxCandidates = 100).collect()
    }
    assert(ex.getMessage.contains("maxCandidates") ||
      ex.getCause != null && ex.getCause.getMessage.contains("maxCandidates"))
  }
}
