package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Session-memoized materialized GRAPH SNAPSHOT stages shared by the
  * graph query family — the [[graft.operators.Graph.AnfStage]]
  * rationale one level down: on a cluster the customer–supplier trade
  * pair table and the Brand#11 part co-occurrence edge set are written
  * once per snapshot and read by EVERY graph readout (PageRank, PPR,
  * HITS, modularity, label propagation, Louvain, conductance,
  * Moran/Geary, betweenness, SSSP, ANF, the truss family) — twelve
  * readers on this board alone; re-running the scan + join + dedup per
  * reader multiplies the one fixed cost every reader shares.
  *
  * Exactness contract: the memo changes where the rows COME FROM,
  * never what they are. [[tradeCounts]] is the trade multiset
  * collapsed to (pair, multiplicity) grain — distinct consumers
  * project (c, s) and every consuming operator re-canonicalizes /
  * re-dedups its input, so feeding the memoized projection is
  * result-identical to the inline build (each consumer's DuckDB
  * oracle still replays its OWN edge construction from the base
  * tables, independently). Lifetime contract as [[graft.operators
  * .Graph.AnfStage]]: keyed by (applicationId, session identity,
  * dir); entries are never auto-evicted — a long-lived JVM serving
  * many dirs MUST call [[clear]] between units of work. */
object GraphStages {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def memo(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    cache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|" +
        s"${System.identityHashCode(spark)}|$dir|$tag",
      _ => build.localCheckpoint(true))

  /** (c, s, cnt): distinct customer–supplier trade pairs with their
    * co-order multiplicity — the one table every trade-graph reader
    * derives its edges from (distinct consumers project (c, s);
    * weighted consumers read cnt). */
  def tradeCounts(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "tradeCounts") {
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("cnt"))
    }

  /** Distinct (c, s) trade pairs — [[tradeCounts]] projected. */
  def tradePairs(spark: SparkSession, dir: String): DataFrame =
    tradeCounts(spark, dir).select(col("c"), col("s"))

  /** Canonical distinct Brand#11 part co-occurrence edges (u < v) —
    * the truss/transitivity family's shared snapshot. */
  def partCoEdges(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "partCoEdges") {
      val pts = Tables.part(spark, dir)
        .where(col("p_brand") === "Brand#11")
        .select(col("p_partkey"))
      val op = Tables.lineitem(spark, dir)
        .join(pts, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      op.select(col("ok"), col("pk").as("u"))
        .join(op.select(col("ok"), col("pk").as("v")), "ok")
        .where(col("u") < col("v"))
        .select(col("u"), col("v"))
        .distinct()
    }

  /** Unpersist every memoized snapshot's checkpoint blocks and empty
    * the memo — the eviction hook for long-lived drivers. BLOCKING
    * (r14): the bench evicts between timed regions, and an async
    * unpersist queues block-removal work that then lands inside
    * whatever runs next (the r8 adjacency-contamination class — q196
    * measured 72 s batched vs 5.9 s isolated in the r14 baseline run
    * with async eviction churning); blocking completes the removal at
    * the eviction point, which is exactly where the caller wants the
    * cost. */
  def clear(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      try e.getValue.unpersist(blocking = true)
      catch { case scala.util.control.NonFatal(_) => () }
      it.remove()
    }
  }
}
