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

  test("budgetedPrefix keeps exactly the permutation prefix within budget") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val df = (0L until 300L).map(i => (i, 1L + rnd.nextInt(40).toLong))
      .toDF("id", "w")
    val budget = 900L
    val kept = GlobalOrder.budgetedPrefix(df, "id", "w", budget)
      .select($"id", $"w", $"cum_w").as[(Long, Long, Long)].collect()
    // brute-force truth: sort by (md5(id), id), take while cum <= budget
    def key(i: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val weights = df.as[(Long, Long)].collect().toMap
    val order = weights.keys.toSeq.sortBy(i => (key(i), i))
    val truth = order.scanLeft((0L, 0L)) { case ((_, cum), i) => (i, cum + weights(i)) }
      .drop(1).takeWhile(_._2 <= budget).toMap
    assert(kept.map(r => r._1 -> r._3).toMap == truth)
    assert(kept.map(_._2).sum <= budget)
    // the NEXT doc in the permutation would overshoot (prefix maximality)
    val next = order.drop(truth.size).headOption
    next.foreach(n => assert(kept.map(_._2).sum + weights(n) > budget))
    // no single-partition exchange anywhere
    val plan = GlobalOrder.budgetedPrefix(df, "id", "w", budget)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1200))
  }
}
