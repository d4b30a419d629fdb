package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GlobalOrder

class GlobalOrderSpec extends AnyFunSuite with SparkFixture {

  test("shuffleIndex equals the naive global row_number over (md5(id), id)") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val fast = GlobalOrder.shuffleIndex(df, "id")
    val naive = df.withColumn("want",
      row_number().over(Window.orderBy(md5($"id".cast("string")), $"id")) - 1)
    val joined = fast.join(naive, "id")
    assert(joined.where($"pos" =!= $"want").count() == 0)
  }

  test("shuffleIndex is a total 0..n-1 permutation and append-stable") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    val pos = GlobalOrder.shuffleIndex(df, "id").select("pos")
      .as[Long].collect().sorted
    assert(pos.toSeq == (0L until 500L))
    // growing the corpus preserves relative order of existing rows
    val small = GlobalOrder.shuffleIndex(df, "id")
      .select($"id", $"pos".as("p_small"))
    val big = GlobalOrder.shuffleIndex((0L until 800L).toDF("id"), "id")
      .select($"id", $"pos".as("p_big"))
    val both = small.join(big, "id")
      .select($"p_small", $"p_big").as[(Long, Long)].collect().sortBy(_._1)
    assert(both.map(_._2).toSeq == both.map(_._2).sorted.toSeq)
  }

  test("shuffleIndex plan never collapses to a single partition") {
    // the naive formulation would need Exchange SinglePartition for its
    // global window; the bucketed plan must not contain one anywhere
    val df = spark.range(100).toDF("id")
    val plan = GlobalOrder.shuffleIndex(df, "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1200))
  }
}
