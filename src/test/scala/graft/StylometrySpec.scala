package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stylometry

/** Burrows' Delta semantics: z-scored common-word rates with constant
  * words dropped loudly, pairwise means, mirror symmetry. */
class StylometrySpec extends AnyFunSuite with SparkFixture {

  test("burrowsDelta: hand z-scores on a 2-word vocabulary; mirrored " +
    "sources sit equidistant from the midpoint source") {
    import spark.implicits._
    val rows = Seq(
      ("s1", "a a a b"), ("s2", "a b b b"), ("s3", "a b"))
    val out = Stylometry.burrowsDelta(rows.toDF("src", "text"),
      "src", "text", topK = 2)
      .collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r)
      .toMap
    assert(out.size == 3)
    // rates of 'a': 0.75, 0.25, 0.5 -> mu 0.5, pop sigma sqrt(0.125/3)
    val sigma = math.sqrt((0.0625 + 0.0625 + 0.0) / 3.0)
    val z1 = 0.25 / sigma
    val d12 = out(("s1", "s2"))
    assert(d12.getAs[Long]("n_words") == 2 &&
      d12.getAs[Long]("n_words_dropped") == 0)
    // both words contribute |z1 - (-z1)| = 2 z1 -> delta = 2 z1
    assert(math.abs(d12.getAs[Double]("delta") - 2 * z1) < 1e-12,
      s"${d12.getAs[Double]("delta")} vs ${2 * z1}")
    // mirror symmetry: s3 is the midpoint
    assert(math.abs(out(("s1", "s3")).getAs[Double]("delta") -
      out(("s2", "s3")).getAs[Double]("delta")) < 1e-12)
  }

  test("burrowsDelta: identical sources make every word constant — " +
    "all dropped loudly, delta null") {
    import spark.implicits._
    val rows = Seq(("x", "alpha beta beta"), ("y", "alpha beta beta"))
    val r = Stylometry.burrowsDelta(rows.toDF("src", "text"),
      "src", "text", topK = 5).head()
    assert(r.getAs[Long]("n_words") == 0 &&
      r.getAs[Long]("n_words_dropped") == 2)
    assert(r.isNullAt(r.fieldIndex("delta")))
  }

  test("burrowsDelta: a zero cell still weighs into mu/sigma (the " +
    "missing-word rate is 0, not absent)") {
    import spark.implicits._
    // s2 never uses 'rare': its rate must enter as 0.0
    val rows = Seq(("s1", "w w rare"), ("s2", "w w w"))
    val r = Stylometry.burrowsDelta(rows.toDF("src", "text"),
      "src", "text", topK = 2).head()
    // both words vary across sources -> both kept
    assert(r.getAs[Long]("n_words") == 2)
    assert(r.getAs[Double]("delta") > 0.0)
  }
}
