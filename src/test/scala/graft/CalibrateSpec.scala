package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Calibrate

/** Isotonic min-max identity: hand-checked PAVA poolings, weighted
  * pooling, monotonicity + block-mass invariants. */
class CalibrateSpec extends AnyFunSuite with SparkFixture {

  private def fit(rows: Seq[(String, Long, Long)]): Map[Long, (Double, Double)] = {
    import spark.implicits._
    Calibrate.isotonic(rows.toDF("sc", "bin", "y"), "sc", "bin", "y")
      .collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Double]("rate"), r.getAs[Double]("iso")))).toMap
  }

  test("isotonic: adjacent violation pools to the weighted average; " +
      "monotone input is untouched") {
    // rates [0.5, 0.0] with equal mass -> both pooled to 0.25
    val v = fit(Seq(("s", 0L, 1L), ("s", 0L, 0L),
      ("s", 1L, 0L), ("s", 1L, 0L)))
    assert(v(0L)._2 == 0.25 && v(1L)._2 == 0.25)
    // weighted: n = [1, 3], s = [1, 0] -> pooled (1+0)/(1+3) = 0.25
    val w = fit(Seq(("s", 0L, 1L),
      ("s", 1L, 0L), ("s", 1L, 0L), ("s", 1L, 0L)))
    assert(w(0L)._2 == 0.25 && w(1L)._2 == 0.25)
    // already isotone: fit == empirical rate at every bin
    val m = fit(Seq(("s", 0L, 0L), ("s", 0L, 0L),
      ("s", 1L, 1L), ("s", 1L, 0L), ("s", 2L, 1L), ("s", 2L, 1L)))
    assert(m.forall { case (_, (r, i)) => r == i })
  }

  test("isotonic: interior violation pools only the violating block; " +
      "fit is monotone and preserves block mass") {
    // rates [0.2, 0.8, 0.4] over 5-row bins: bins 1,2 pool to
    // (4+2)/10 = 0.6; bin 0 is untouched
    val rows = (Seq.fill(1)(1L) ++ Seq.fill(4)(0L)).map(("s", 0L, _)) ++
      (Seq.fill(4)(1L) ++ Seq.fill(1)(0L)).map(("s", 1L, _)) ++
      (Seq.fill(2)(1L) ++ Seq.fill(3)(0L)).map(("s", 2L, _)) ++
      Seq.fill(5)(("t", 0L, 1L)) // second scope: constant, untouched
    val f = fit(rows.map(t => (t._1, t._2, t._3)).filter(_._1 == "s"))
    assert(f(0L)._2 == 0.2)
    assert(f(1L)._2 == 0.6 && f(2L)._2 == 0.6)
    // global invariants on a wiggly profile
    val wig = Seq(0.9, 0.1, 0.5, 0.3, 0.7).zipWithIndex.flatMap {
      case (p, b) =>
        val ones = math.round(p * 10).toInt
        (Seq.fill(ones)(1L) ++ Seq.fill(10 - ones)(0L))
          .map(("s", b.toLong, _))
    }
    val g = fit(wig)
    val ordered = g.toSeq.sortBy(_._1).map(_._2._2)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
      s"fit not monotone: $ordered")
    // total mass preserved: sum n*iso == sum s (10 rows per bin)
    val mass = ordered.map(_ * 10).sum
    assert(math.abs(mass - wig.map(_._3).sum) < 1e-9)
  }
}
