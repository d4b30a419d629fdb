package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextOps, TextStats}

/** Row-for-row equality of the one-pass codegen'd TextStats kernel vs the
  * declarative TextOps formulations, on the real documents table. */
class TextStatsSpec extends AnyFunSuite with SparkFixture {

  test("TextStats struct equals TextOps column-by-column on sf0.001 documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      TextStats.textStats(col("text")).as("f"),
      TextOps.tokenCount(col("text")).as("n_tokens"),
      TextOps.tokenEstimate(col("text")).as("est_bpe"),
      TextOps.punctRatio(col("text")).as("punct"),
      TextOps.meanWordLen(col("text")).as("mwl"),
      TextOps.stopwordRatio(col("text")).as("stop_ratio"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.langId(col("text")).as("lang_pred"))
    val bad = both.where(
      col("f.n_tokens") =!= col("n_tokens") ||
        col("f.est_bpe") =!= col("est_bpe") ||
        col("f.punct") =!= col("punct") ||
        col("f.mwl") =!= col("mwl") ||
        col("f.stop_ratio") =!= col("stop_ratio") ||
        col("f.quality") =!= col("quality") ||
        col("f.lang_pred") =!= col("lang_pred")).count()
    assert(bad == 0)
  }

  test("TextStats edge cases: empty, whitespace-only, punct-heavy") {
    import spark.implicits._
    val df = Seq("", "   ", "!!! ... ???", "the and of", "\tword").toDF("text")
    val both = df.select(
      TextStats.textStats(col("text")).as("f"),
      TextOps.tokenCount(col("text")).as("n"),
      TextOps.qualityScore(col("text")).as("q"),
      TextOps.langId(col("text")).as("l"))
    both.collect().foreach { r =>
      val f = r.getStruct(0)
      assert(f.getAs[Int]("n_tokens") == r.getAs[Int]("n"))
      assert(f.getAs[Double]("quality") == r.getAs[Double]("q"))
      assert(f.getAs[String]("lang_pred") == r.getAs[String]("l"))
    }
  }
}
