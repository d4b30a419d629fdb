package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.Attribution

/** Multi-touch attribution (q416), off-fixture: a hand-built journey
  * timeline covering every model branch, orphan conversions, and
  * trailing touches. */
class AttributionSpec extends AnyFunSuite with SparkFixture {

  private def run(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    Attribution.multiTouch(rows.toDF("u", "o", "ch"), "u", "o", "ch",
        col("ch") === "P")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("multiTouch: hand journeys — 3-touch U-shape, 1-touch, orphan " +
      "conversion, trailing touches uncredited") {
    // u=1: [A, B, A, P] [B, P] [P(orphan)] [A trailing]
    val rows = Seq(
      (1L, "01", "A"), (1L, "02", "B"), (1L, "03", "A"), (1L, "04", "P"),
      (1L, "05", "B"), (1L, "06", "P"),
      (1L, "07", "P"),
      (1L, "08", "A"))
    val out = run(rows)
    val a = out("A")
    assert(a.getAs[Long]("n_touches") == 2L) // trailing A excluded
    assert(a.getAs[Long]("n_journeys") == 1L)
    assert(a.getAs[Long]("n_first") == 1L && a.getAs[Long]("n_last") == 1L)
    assert(math.abs(a.getAs[Double]("credit_linear") - 2.0 / 3.0) < 1e-12)
    // A holds both ends of the 3-touch journey: 0.4 + 0.4
    assert(math.abs(a.getAs[Double]("credit_ushape") - 0.8) < 1e-12)
    assert(a.getAs[Long]("n_orphan") == 0L)
    val b = out("B")
    assert(b.getAs[Long]("n_touches") == 2L &&
      b.getAs[Long]("n_journeys") == 2L)
    assert(b.getAs[Long]("n_first") == 1L && b.getAs[Long]("n_last") == 1L)
    // middle of the 3-touch journey (0.2) + sole touch of its own (1.0)
    assert(math.abs(b.getAs[Double]("credit_linear") - 4.0 / 3.0) < 1e-12)
    assert(math.abs(b.getAs[Double]("credit_ushape") - 1.2) < 1e-12)
    // the back-to-back purchase had no touches: loud orphan under P
    val p = out("P")
    assert(p.getAs[Long]("n_orphan") == 1L)
    assert(p.getAs[Long]("n_touches") == 0L &&
      p.getAs[Double]("credit_linear") == 0.0)
  }

  test("multiTouch: 2-touch journey splits 50/50 under U-shape; credit " +
      "per journey sums to 1 under both fractional models") {
    val rows = Seq((2L, "01", "A"), (2L, "02", "B"), (2L, "03", "P"))
    val out = run(rows)
    assert(out("A").getAs[Double]("credit_ushape") == 0.5)
    assert(out("B").getAs[Double]("credit_ushape") == 0.5)
    assert(out("A").getAs[Double]("credit_linear") == 0.5)
    // conservation: every closed journey hands out exactly one unit
    val lin = out.values.map(_.getAs[Double]("credit_linear")).sum
    val ush = out.values.map(_.getAs[Double]("credit_ushape")).sum
    assert(math.abs(lin - 1.0) < 1e-12 && math.abs(ush - 1.0) < 1e-12)
  }

  test("multiTouch: credit conservation on a mixed multi-user fixture " +
      "(sum of each fractional model = number of credited journeys)") {
    // 4-touch journey (exercises the 0.2/(n-2) middle split) plus the
    // earlier shapes across two users
    val rows = Seq(
      (1L, "01", "A"), (1L, "02", "B"), (1L, "03", "C"), (1L, "04", "B"),
      (1L, "05", "P"),
      (2L, "01", "C"), (2L, "02", "P"), (2L, "03", "P"))
    val out = run(rows)
    val lin = out.values.map(_.getAs[Double]("credit_linear")).sum
    val ush = out.values.map(_.getAs[Double]("credit_ushape")).sum
    // two credited journeys (u1 j0 with 4 touches, u2 j0 with 1)
    assert(math.abs(lin - 2.0) < 1e-12, out.toString)
    assert(math.abs(ush - 2.0) < 1e-12, out.toString)
    // u1 journey: first A 0.4, last B 0.4 + B middle? B holds o02
    // (middle) and o04 (last): 0.4 + 0.1; C middle: 0.1
    assert(math.abs(out("B").getAs[Double]("credit_ushape") - 0.5) < 1e-12)
    assert(math.abs(out("C").getAs[Double]("credit_ushape") - 1.1) < 1e-12)
    assert(out("P").getAs[Long]("n_orphan") == 1L)
  }
}
