package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A19 agent-arena consensus aggregation (agent-arena/debate.py:117-189):
  * group final-round picks by (ticker, direction), tally votes and average
  * conviction, classify into unanimous / supermajority(>=0.8) /
  * majority(>=0.4) / split(>=2 votes) / solo tiers, and pick the consensus
  * trade as highest-voted then highest-conviction among the
  * unanimous/supermajority/majority pools.
  */
object Arena {

  val Supermajority = 0.8
  val ConsensusThreshold = 0.4

  /** Vote tally per (ticker, direction). `picks` columns:
    * scan_date, agent, ticker, direction, conviction. */
  def tally(picks: DataFrame): DataFrame = {
    val totals = picks.groupBy(col("scan_date"))
      .agg(countDistinct(col("agent")).as("total_agents"))
    picks.groupBy(col("scan_date"), col("ticker"), col("direction"))
      .agg(
        count(lit(1)).cast("int").as("agent_count"),
        round(avg(col("conviction")), 1).as("avg_conviction"))
      .join(broadcast(totals), Seq("scan_date"))
      .withColumn("ratio", col("agent_count") / col("total_agents"))
      .withColumn("tier",
        when(col("ratio") >= 1.0, "unanimous")
          .when(col("ratio") >= Supermajority, "supermajority")
          .when(col("ratio") >= ConsensusThreshold, "majority")
          .when(col("agent_count") >= 2, "split")
          .otherwise("solo"))
  }

  /** Consensus row per scan_date (agent_arena_consensus shape):
    * has_consensus + winning pick by (votes desc, conviction desc) among
    * consensus-eligible tiers, plus tier counts. */
  def consensus(picks: DataFrame): DataFrame = {
    val t = tally(picks)
    val eligible = t.where(col("tier").isin("unanimous", "supermajority", "majority"))
    val w = Window.partitionBy(col("scan_date"))
      .orderBy(col("agent_count").desc, col("avg_conviction").desc, col("ticker"))
    val winner = eligible.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("scan_date"), col("ticker").as("consensus_ticker"),
        col("direction").as("consensus_direction"),
        col("agent_count").as("consensus_count"),
        col("avg_conviction").as("consensus_conviction"))
    val tierCounts = t.groupBy(col("scan_date"))
      .agg(
        sum(when(col("tier") === "unanimous", 1).otherwise(0)).cast("int").as("n_unanimous"),
        sum(when(col("tier") === "supermajority", 1).otherwise(0)).cast("int").as("n_supermajority"),
        sum(when(col("tier") === "majority", 1).otherwise(0)).cast("int").as("n_majority"),
        sum(when(col("tier") === "split", 1).otherwise(0)).cast("int").as("n_split"),
        sum(when(col("tier") === "solo", 1).otherwise(0)).cast("int").as("n_solo"),
        countDistinct(col("ticker"), col("direction")).cast("int").as("total_unique_tickers"))
    tierCounts.join(winner, Seq("scan_date"), "left")
      .withColumn("has_consensus", col("consensus_ticker").isNotNull)
  }
}
