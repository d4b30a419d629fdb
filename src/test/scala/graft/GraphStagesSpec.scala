package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphStages

/** The shared graph-snapshot memo: identity on re-use, value equality
  * with the inline build, and the eviction hook. */
class GraphStagesSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("tradeCounts memoizes per (session, dir) and equals the inline " +
      "build; tradePairs is its distinct projection") {
    GraphStages.clear()
    val a = GraphStages.tradeCounts(spark, dir)
    val b = GraphStages.tradeCounts(spark, dir)
    assert(a eq b, "second call must return the memoized frame")
    val inline = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt"))
    assert(a.exceptAll(inline).isEmpty && inline.exceptAll(a).isEmpty)
    val pairs = GraphStages.tradePairs(spark, dir)
    assert(pairs.count() == pairs.distinct().count())
    assert(pairs.count() == a.count())
  }

  test("partCoEdges is canonical (u < v), distinct, and memoized") {
    val a = GraphStages.partCoEdges(spark, dir)
    assert(a eq GraphStages.partCoEdges(spark, dir))
    assert(a.where(col("u") >= col("v")).count() == 0)
    assert(a.count() == a.distinct().count())
  }

  test("clear() empties the memo: a later call builds a fresh frame") {
    val a = GraphStages.tradeCounts(spark, dir)
    GraphStages.clear()
    val b = GraphStages.tradeCounts(spark, dir)
    assert(!(a eq b))
    GraphStages.clear()
  }
}
