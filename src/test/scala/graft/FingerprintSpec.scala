package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Fingerprint

class FingerprintSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def digestMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    Fingerprint.datasetDigest(df, Seq("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getAs[String]("digest")).toMap

  test("fingerprint is invariant to partitioning and row order") {
    val d = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val a = digestMap(d.repartition(1))
    val b = digestMap(d.repartition(17, col("text")).sortWithinPartitions(desc("text")))
    assert(a === b, "digest must not depend on layout")
  }

  test("one changed row flips exactly its bucket and the root") {
    val d = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val mutated = d.withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit(" tampered"))).otherwise(col("text")))
    val a = digestMap(d)
    val b = digestMap(mutated)
    val changed = (a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))
    // the row's digest moves bucket when its content changes, so at most
    // two leaf buckets (old home, new home) plus ROOT differ — never zero
    assert(changed.contains("ROOT"), "root must register any change")
    assert((changed - "ROOT").nonEmpty && (changed - "ROOT").size <= 2,
      s"expected 1-2 leaf buckets to differ, got $changed")
  }

  test("column boundaries cannot alias") {
    import spark.implicits._
    val x = Seq((12L, "3ab")).toDF("doc_id", "text")
    val y = Seq((1L, "23ab")).toDF("doc_id", "text")
    assert(digestMap(x)("ROOT") !== digestMap(y)("ROOT"))
  }
}
