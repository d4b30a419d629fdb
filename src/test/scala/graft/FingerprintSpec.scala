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

  private def diffRow(v1: Seq[(Long, String)], v2: Seq[(Long, String)],
      k: Int = 1): (Long, Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Fingerprint.diffSummary(v1.toDF("id", "t"), v2.toDF("id", "t"),
      "id", Seq("id", "t"), bucketHexChars = k).head()
    (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_dirty_buckets"),
      r.getAs[Long]("n_added"), r.getAs[Long]("n_removed"),
      r.getAs[Long]("n_changed"), r.getAs[Long]("n_same_in_dirty"))
  }

  test("diffSummary matches a naive full diff under random mutations") {
    val rnd = new scala.util.Random(19)
    (1 to 4).foreach { _ =>
      val v1 = (0L until 60L).map(i => i -> s"doc $i")
      val removed = v1.filter(_ => rnd.nextInt(10) == 0).map(_._1).toSet
      val changed = v1.filter(r => !removed(r._1) && rnd.nextInt(10) == 0).map(_._1).toSet
      val added = (1000L until 1000L + rnd.nextInt(8))
      val v2 = v1.filterNot(r => removed(r._1))
        .map { case (i, t) => i -> (if (changed(i)) t + " x" else t) } ++
        added.map(i => i -> s"new $i")
      val (_, _, a, d, c, _) = diffRow(v1, v2)
      assert(a == added.size && d == removed.size && c == changed.size,
        s"removed=$removed changed=$changed added=$added")
    }
  }

  test("diffSummary: identical tables have zero dirty buckets and no row traffic") {
    val v = (0L until 40L).map(i => i -> s"same $i")
    val (buckets, dirty, a, d, c, s) = diffRow(v, v)
    assert(buckets > 0L && dirty == 0L && (a, d, c, s) == ((0L, 0L, 0L, 0L)))
  }

  test("diffSummary: an edit reads as changed, never as remove+add") {
    val v1 = (0L until 20L).map(i => i -> s"t$i")
    val v2 = v1.map { case (i, t) => i -> (if (i == 7L) "edited" else t) }
    val (_, dirty, a, d, c, _) = diffRow(v1, v2)
    assert(dirty == 1L && a == 0L && d == 0L && c == 1L)
  }
}
