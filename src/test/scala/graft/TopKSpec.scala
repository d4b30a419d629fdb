package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TopK

/** The bounded-heap top-k aggregate must be row-identical to the window
  * formulation (q12's O6) under forced multi-partition merges. */
class TopKSpec extends AnyFunSuite with SparkFixture {

  test("matches window row_number formulation on random data across partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1L to 2000L).map(id =>
      (id, s"g${rnd.nextInt(7)}", math.floor(rnd.nextDouble() * 1000) / 10))
      .toDF("id", "grp", "v").repartition(13)
    val got = TopK.topKPerGroup(df, "grp", "id", "v", k = 5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("rank"),
        r.getAs[Long]("id"), r.getAs[Double]("v"))).toSet
    val w = Window.partitionBy($"grp").orderBy($"v".desc, $"id")
    val exp = df.withColumn("rank", row_number().over(w)).where($"rank" <= 5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Int]("rank").toLong,
        r.getAs[Long]("id"), r.getAs[Double]("v"))).toSet
    assert(got == exp)
  }

  test("groups smaller than k emit every row, ranked") {
    import spark.implicits._
    val df = Seq((1L, "a", 5.0), (2L, "a", 7.0)).toDF("id", "grp", "v")
    val got = TopK.topKPerGroup(df, "grp", "id", "v", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("id"))).toSeq
    assert(got == Seq((1L, 2L), (2L, 1L)))
  }

  test("exact value ties break by ascending id (cross-engine determinism)") {
    import spark.implicits._
    val df = Seq((9L, "a", 1.0), (3L, "a", 1.0), (7L, "a", 1.0))
      .toDF("id", "grp", "v")
    val got = TopK.topKPerGroup(df, "grp", "id", "v", k = 2)
      .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
    assert(got == Seq(3L, 7L))
  }

  test("string-key variant matches the window row_number formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (s"g${i % 3}", s"tok${rng.nextInt(40)}", rng.nextInt(50).toDouble)
    }
    val df = rows.toDF("grp", "key", "v")
      .groupBy("grp", "key").agg(org.apache.spark.sql.functions.sum("v").as("v"))
    val got = TopK.topKStrPerGroup(df, "grp", "key", "v", k = 5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("rank"),
        r.getAs[String]("key"), r.getAs[Double]("v"))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"v".desc, $"key")
    val want = df.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .where($"rank" <= 5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("rank"),
        r.getAs[String]("key"), r.getAs[Double]("v"))).toSet
    assert(got == want)
  }

  test("string-key ties break by ascending key") {
    import spark.implicits._
    val df = Seq(("a", "zeta", 1.0), ("a", "beta", 1.0), ("a", "mu", 1.0))
      .toDF("grp", "key", "v")
    val got = TopK.topKStrPerGroup(df, "grp", "key", "v", k = 2)
      .orderBy("rank").collect().map(_.getAs[String]("key")).toSeq
    assert(got == Seq("beta", "mu"))
  }
}
