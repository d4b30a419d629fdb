package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MatrixProfile

/** Exact matrix profile: planted-motif recovery, discord ranking, the
  * trivial-match exclusion zone, z-normalization invariance,
  * constant-window null contract, and the loud quadratic gate. */
class MatrixProfileSpec extends AnyFunSuite with SparkFixture {

  import SparkFixture.spark.implicits._

  private def rows(k: String, xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => (k, f"t${i + 1}%03d", x) }

  test("planted motif pair lands at mp 0 pointing at each other even " +
      "under an affine shift (z-invariance); the discord maximizes mp; " +
      "the exclusion zone blocks overlapping self-matches") {
    // windows of m=4: positions 1..4 and 13..16 carry the same SHAPE,
    // the second copy affine-shifted (x2 +100) — z-normalized distance 0
    val shape = Seq(1L, 5L, 2L, 8L)
    val xs = shape ++ Seq(3L, 3L, 4L, 9L, 2L, 7L, 4L, 6L) ++
      shape.map(v => v * 2 + 100L) ++ Seq(5L, 1L)
    val out = MatrixProfile.matrixProfile(
        rows("a", xs).toDF("k", "o", "x"), "k", "o", "x", m = 4)
      .collect().map(r => r.getInt(1) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Int])))).toMap
    assert(out.size == xs.length - 4 + 1)
    val (mp1, idx1) = out(1)
    assert(mp1.get < 1e-9 && idx1.get == 13, s"$mp1 $idx1")
    val (mp13, idx13) = out(13)
    assert(mp13.get < 1e-9 && idx13.get == 1)
    // every mp is the true nearest non-trivial neighbor: check one
    // window against a naive reference
    def znd(i: Int, j: Int): Double = {
      def z(s: Int) = {
        val w = xs.slice(s - 1, s - 1 + 4).map(_.toDouble)
        val mu = w.sum / 4.0
        val sg = math.sqrt(w.map(v => v * v).sum / 4.0 - mu * mu)
        w.map(v => (v - mu) / sg)
      }
      math.sqrt(z(i).zip(z(j)).map { case (a, b) =>
        (a - b) * (a - b) }.sum)
    }
    val k = out.keys.max
    for (i <- out.keys) {
      val cand = (1 to k).filter(j => math.abs(j - i) >= 4)
      if (cand.nonEmpty)
        assert(math.abs(out(i)._1.get - cand.map(znd(i, _)).min) < 1e-9,
          s"window $i")
    }
  }

  test("constant windows report null (no z-form) with rows kept; a " +
      "series of all-constant windows is all-null; loud maxN gate") {
    // constant run long enough that windows 1..3 have zero variance
    val xs = Seq.fill(6)(5L) ++ Seq(1L, 9L, 2L, 8L, 3L, 7L)
    val out = MatrixProfile.matrixProfile(
        rows("c", xs).toDF("k", "o", "x"), "k", "o", "x", m = 4)
      .collect().map(r => r.getInt(1) -> Option(r.get(3))).toMap
    assert(out(1).isEmpty && out(2).isEmpty && out(3).isEmpty)
    // w7's only out-of-zone neighbors ARE the constant windows -> null
    // too; w4 reaches the varying w8/w9 and scores
    assert(out(7).isEmpty)
    assert(out(4).nonEmpty)
    val flat = MatrixProfile.matrixProfile(
        rows("f", Seq.fill(10)(2L)).toDF("k", "o", "x"),
        "k", "o", "x", m = 4)
      .collect()
    assert(flat.length == 7 && flat.forall(_.isNullAt(3)))
    val ex = intercept[Exception] {
      MatrixProfile.matrixProfile(
        rows("z", (1L to 50L)).toDF("k", "o", "x"),
        "k", "o", "x", m = 4, maxN = 10).collect()
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("matrixProfile"), ex.getMessage)
  }
}
