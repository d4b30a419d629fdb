package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dtw

/** Banded DTW: hand-checked distances, band semantics, identity /
  * symmetry, null on infeasible bands. */
class DtwSpec extends AnyFunSuite with SparkFixture {

  private def d(a: Seq[Long], b: Seq[Long], band: Int = 0) =
    Dtw.distance(a.toIndexedSeq, b.toIndexedSeq, band)

  test("kernel: hand-checked alignment, identity, symmetry") {
    // classic warp: [1,3,4,9] vs [1,6,2,3,0] -> 14 (checked by hand DP)
    assert(d(Seq(1L, 3L, 4L, 9L), Seq(1L, 6L, 2L, 3L, 0L)) === Some(14L))
    assert(d(Seq(1L, 3L, 4L, 9L), Seq(1L, 3L, 4L, 9L)) === Some(0L))
    // symmetry of the unbanded distance
    assert(d(Seq(1L, 3L, 4L, 9L), Seq(1L, 6L, 2L, 3L, 0L)) ===
      d(Seq(1L, 6L, 2L, 3L, 0L), Seq(1L, 3L, 4L, 9L)))
    // phase shift: DTW absorbs it, pointwise distance would not
    assert(d(Seq(0L, 0L, 5L, 0L, 0L), Seq(0L, 0L, 0L, 5L, 0L)) === Some(0L))
  }

  test("kernel: band narrower than the length gap yields null") {
    assert(d(Seq(1L, 1L, 1L, 1L, 1L, 1L), Seq(1L), band = 2) === None)
    assert(d(Seq(1L, 1L, 1L, 1L, 1L, 1L), Seq(1L), band = 5).isDefined)
    assert(d(Seq.empty[Long], Seq(1L)) === None)
  }

  test("band constrains the warp: narrow band can only worsen the distance") {
    val a = Seq(0L, 0L, 0L, 9L, 0L, 0L)
    val b = Seq(9L, 0L, 0L, 0L, 0L, 0L)
    val free = d(a, b).get
    val tight = d(a, b, band = 1).get
    assert(tight >= free)
    assert(tight > 0L, "band 1 cannot align the spike 3 steps away")
  }

  test("pairwiseDtw: per-key series, ordered assembly, all pairs once") {
    import spark.implicits._
    val df = Seq(
      ("p", 2L, 3L), ("p", 1L, 1L), ("p", 3L, 4L), ("p", 4L, 9L),
      ("q", 1L, 1L), ("q", 2L, 6L), ("q", 3L, 2L), ("q", 4L, 3L), ("q", 5L, 0L),
      ("r", 1L, 1L), ("r", 2L, 3L), ("r", 3L, 4L), ("r", 4L, 9L))
      .toDF("k", "o", "x")
    val got = Dtw.pairwiseDtw(df, "k", "o", "x", band = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getInt(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    assert(got.keySet === Set(("p", "q"), ("p", "r"), ("q", "r")))
    assert(got(("p", "q")) === ((4, 5, 14L)), "out-of-order input must sort")
    assert(got(("p", "r")) === ((4, 4, 0L)))
    assert(got(("q", "r")) === ((5, 4, 14L)))
  }
}
