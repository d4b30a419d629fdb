package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.InvertedIndex

class InvertedIndexSpec extends AnyFunSuite with SparkFixture {

  test("postings fingerprint, gaps, and DF band on a hand-checked corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"),
      (3L, "alpha gamma gamma"),   // within-doc repeat: one posting
      (7L, "alpha beta delta"),
      (9L, "delta")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, "doc_id", "text", minDf = 2, maxDf = 2)
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    // alpha df=3 > maxDf: the hot term never reaches the window
    assert(!idx.contains("alpha"))
    // gamma df=1 < minDf: hapax dropped
    assert(!idx.contains("gamma"))
    val beta = idx("beta")   // postings 1,7 -> "1:6"
    assert(beta.getAs[Long]("df") == 2 && beta.getAs[Long]("first_doc") == 1L)
    assert(beta.getAs[Long]("max_gap") == 6L)
    assert(beta.getAs[String]("postings_md5") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex("1:6"))
    val delta = idx("delta") // postings 7,9 -> "7:2"
    assert(delta.getAs[String]("postings_md5") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex("7:2"))
  }

  test("fingerprints are partitioning-invariant") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = InvertedIndex.build(d, "doc_id", "text", 2, 400)
    val b = InvertedIndex.build(d.repartition(13, col("text")), "doc_id", "text", 2, 400)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
