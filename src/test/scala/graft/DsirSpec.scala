package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dsir

/** DSIR importance-weight semantics: target-distinctive tokens must pull
  * weights up, off-target tokens down, and shared tokens sit between. */
class DsirSpec extends AnyFunSuite with SparkFixture {

  test("target-only vocabulary outweighs raw-only vocabulary") {
    import spark.implicits._
    // target docs speak 'alpha', the rest 'omega', everyone says 'shared'
    val df = (
      (1L to 10L).map(i => (i, "alpha alpha alpha alpha shared", true)) ++
      (11L to 20L).map(i => (i, "omega omega omega omega shared", false))
    ).toDF("id", "text", "is_t")
    val w = Dsir.importanceWeights(df, "id", "text", col("is_t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
    val targetMean = (1L to 10L).map(w).sum / 10
    val rawMean = (11L to 20L).map(w).sum / 10
    assert(targetMean > 0 && rawMean < 0, s"$targetMean / $rawMean")
    assert(w.forall { case (_, v) => !v.isNaN && !v.isInfinite })
  }

  test("a doc of purely shared tokens scores between the two poles") {
    import spark.implicits._
    val df = (
      (1L to 10L).map(i => (i, "alpha alpha alpha alpha shared", true)) ++
      (11L to 20L).map(i => (i, "omega omega omega omega shared", false)) :+
      ((21L, "shared shared shared", false))
    ).toDF("id", "text", "is_t")
    val w = Dsir.importanceWeights(df, "id", "text", col("is_t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
    assert(w(21L) > w(11L) && w(21L) < w(1L), w.toString)
  }

  test("n_tok is the whitespace token count") {
    import spark.implicits._
    val df = Seq((1L, "a b   c", true), (2L, "one", false)).toDF("id", "text", "is_t")
    val n = Dsir.importanceWeights(df, "id", "text", col("is_t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tok")).toMap
    assert(n == Map(1L -> 3L, 2L -> 1L))
  }
}
