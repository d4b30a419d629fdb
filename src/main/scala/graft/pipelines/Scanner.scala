package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §3.1 overnight-scanner pipeline, Spark-first.
  *
  * Reference lifecycle (overnight_scanner.py:806-888): full-market snapshot
  * -> mover filter -> per-ticker chain aggregation (threads) -> additive
  * score -> cluster boost -> write. Here the per-ticker thread fan-out
  * becomes one grouped aggregation over the whole chain table and the
  * scoring is pure column algebra — no driver loops, shuffles once on
  * `underlying` for the metrics and once for the cluster-boost join.
  *
  * Semantics cited per block; quirks preserved deliberately (SURVEY §7.4.6):
  * the divergence rule flips `direction` AFTER direction-conditional
  * metrics were chosen (overnight_scanner.py:625-634), and the best
  * contract is picked for the FLIPPED direction.
  */
object Scanner {

  val MinPriceChangePct = 1.0     // overnight_scanner.py:22
  val MinDollarVolume = 500000.0  // :25
  val MinScore = 6                // :28
  val ClusterMinSize = 4          // :31
  val ClusterMinScore = 3         // :32
  val ClusterBoostThreshold = 6   // :33

  /** P3 effective price + P2 mover filter over the snapshot table
    * (overnight_scanner.py:336-355). */
  def movers(snapshots: DataFrame): DataFrame =
    snapshots
      .withColumn("effective_price",
        coalesce(col("day.c"), col("lastTrade.p"), col("prevDay.c")))
      .withColumn("day_volume", col("day.v"))
      .where(abs(col("todaysChangePerc")) >= MinPriceChangePct &&
        col("effective_price").isNotNull)

  /** P1 universe semi-join (broadcast; overnight_scanner.py:329-331). */
  def inUniverse(movers: DataFrame, universe: DataFrame): DataFrame =
    movers.join(broadcast(universe.select(upper(trim(col("value"))).as("ticker")).distinct()),
      Seq("ticker"), "left_semi")

  private def midOrLast: Column =
    when(col("bid").isNotNull && col("ask").isNotNull && col("bid") > 0 && col("ask") > 0,
      (col("bid") + col("ask")) / 2)
      .otherwise(when(col("last_price").isNotNull && col("last_price") =!= 0, col("last_price")))

  /** A1-A5 per-side flow metrics over the flattened chain, one groupBy
    * (overnight_scanner.py:364-399, 486-519). Side-conditional sums avoid
    * a second shuffle for the call/put split. */
  def flowMetrics(chain: DataFrame, underlyingPrice: DataFrame): DataFrame = {
    val c = chain
      .join(underlyingPrice.select(col("ticker").as("underlying"),
        col("effective_price").as("upx")), Seq("underlying"), "left")
      .withColumn("vol", coalesce(col("volume"), lit(0L)))
      .withColumn("oi", coalesce(col("open_interest"), lit(0L)))
      .withColumn("mid0", midOrLast)
      .withColumn("isCall", col("option_type") === "call")
    def side(cond: Column, v: Column): Column = sum(when(cond, v).otherwise(lit(0.0)))
    // _dollar_vol (:364-375): volume * (mid ?? last) * 100, skip null mid/vol=0
    def dollarVol(cond: Column): Column =
      side(cond && col("mid0").isNotNull, col("vol") * col("mid0") * 100)
    // _count_active_strikes (:378-382): vol > max(oi*0.5, 100)
    def activeStrikes(cond: Column): Column =
      sum(when(cond && col("vol") > greatest(col("oi") * 0.5, lit(100.0)), 1).otherwise(0))
    // _uoa_depth (:385-399): (vol-oi)*mid*100 where vol > oi
    def uoaDepth(cond: Column): Column =
      side(cond && col("vol") > col("oi") && col("mid0").isNotNull,
        (col("vol") - col("oi")) * col("mid0") * 100)
    // atm iv (:498-502): iv of contract minimizing |strike - underlying|
    def atmIv(cond: Column): Column =
      min_by(when(cond, col("implied_volatility")),
        when(cond, abs(coalesce(col("strike"), lit(0.0)) - col("upx"))))
    c.groupBy(col("underlying").as("ticker"))
      .agg(
        dollarVol(col("isCall")).as("call_dollar_vol"),
        dollarVol(!col("isCall")).as("put_dollar_vol"),
        side(col("isCall"), col("vol")).cast("long").as("total_call_volume"),
        side(!col("isCall"), col("vol")).cast("long").as("total_put_volume"),
        (side(col("isCall"), col("vol")) /
          greatest(side(col("isCall"), col("oi")), lit(1.0))).as("call_vol_oi"),
        (side(!col("isCall"), col("vol")) /
          greatest(side(!col("isCall"), col("oi")), lit(1.0))).as("put_vol_oi"),
        activeStrikes(col("isCall")).as("call_active_strikes"),
        activeStrikes(!col("isCall")).as("put_active_strikes"),
        uoaDepth(col("isCall")).as("call_uoa_depth"),
        uoaDepth(!col("isCall")).as("put_uoa_depth"),
        atmIv(col("isCall")).as("atm_call_iv"),
        atmIv(!col("isCall")).as("atm_put_iv"))
  }

  /** P6 eligibility + contract score + A6 argmax per (underlying, side)
    * (overnight_scanner.py:400-481). Ties broken by contract_symbol
    * (deterministic; the reference keeps first-encountered order). */
  def bestContracts(chain: DataFrame, underlyingPrice: DataFrame, asOf: Column): DataFrame = {
    val c = chain
      .join(underlyingPrice.select(col("ticker").as("underlying"),
        col("effective_price").as("upx")), Seq("underlying"), "left")
      .withColumn("dte", datediff(col("expiration_date"), asOf))
      .withColumn("vol", coalesce(col("volume"), lit(0L)))
      .withColumn("oi", coalesce(col("open_interest"), lit(0L)))
      .withColumn("mid", (col("bid") + col("ask")) / 2)
      .withColumn("spread_pct", (col("ask") - col("bid")) / col("mid"))
      .withColumn("mny",
        when(col("option_type") === "call", col("strike") / col("upx"))
          .otherwise(col("upx") / col("strike")))
      .where(
        col("expiration_date").isNotNull &&
          col("dte").between(7, 90) &&
          col("bid") > 0 && col("ask") > 0 && col("mid") > 0 &&
          col("spread_pct") <= 0.40 &&
          col("vol") >= 10 &&
          (col("upx").isNull || col("upx") <= 0 || col("mny").between(0.90, 1.25)))
      .withColumn("adelta", abs(coalesce(col("delta"), lit(0.0))))
      .withColumn("contract_score",
        least(col("vol") / 500.0, lit(5.0)) * 2.0 +
          (lit(1.0) - least(col("spread_pct"), lit(1.0))) * 3.0 +
          least(col("vol") / greatest(col("oi"), lit(1L)), lit(3.0)) * 1.5 +
          coalesce(col("gamma"), lit(0.0)) * 20.0 +
          when(col("adelta").between(0.25, 0.50), 2.0).otherwise(0.0) -
          abs(coalesce(col("theta"), lit(0.0))) / greatest(col("mid"), lit(0.01)) * 1.0)
    c.groupBy(col("underlying").as("ticker"), col("option_type"))
      .agg(max_by(
        struct(
          col("contract_symbol"), col("strike"),
          col("expiration_date"), col("dte"),
          round(col("mid"), 2).as("mid_price"),
          round(col("spread_pct"), 4).as("spread_pct"),
          col("vol").as("volume"), col("oi").as("open_interest"),
          round(col("implied_volatility"), 4).as("implied_volatility"),
          round(col("gamma"), 6).as("gamma"),
          round(coalesce(col("delta"), lit(0.0)), 4).as("delta"),
          round(col("theta"), 4).as("theta"),
          round(col("vega"), 4).as("vega"),
          round(col("contract_score"), 3).as("contract_score")),
        struct(col("contract_score"), col("contract_symbol"))).as("best"))
  }

  /** F18 six-signal additive score with signals[] accumulation and the
    * divergence direction flip (overnight_scanner.py:569-672). */
  def score(movers: DataFrame): DataFrame = {
    val pct = coalesce(col("todaysChangePerc"), lit(0.0))
    val bullish = pct > 0
    val callDv = coalesce(col("call_dollar_vol"), lit(0.0))
    val putDv = coalesce(col("put_dollar_vol"), lit(0.0))
    val totalDv = callDv + putDv
    val callSkew = callDv / greatest(putDv, lit(1.0))
    val putSkew = putDv / greatest(callDv, lit(1.0))
    val s1 = when(totalDv > MinDollarVolume,
      when(bullish && callDv > 0,
        when(callSkew > 3.0, 2).when(callSkew > 1.5, 1).otherwise(0))
        .when(!bullish && putDv > 0,
          when(putSkew > 3.0, 2).when(putSkew > 1.5, 1).otherwise(0))
        .otherwise(0)).otherwise(0)
    val s1label = when(s1 > 0,
      when(bullish, format_string("Call $ %.1fx puts", callSkew))
        .otherwise(format_string("Put $ %.1fx calls", putSkew)))
    val relVolOi = when(bullish, coalesce(col("call_vol_oi"), lit(0.0)))
      .otherwise(coalesce(col("put_vol_oi"), lit(0.0)))
    val s2 = when(relVolOi > 2.0, 2).when(relVolOi > 0.8, 1).otherwise(0)
    val s2label = when(relVolOi > 2.0, format_string("Vol/OI %.1fx (very unusual)", relVolOi))
      .when(relVolOi > 0.8, format_string("Vol/OI %.1fx (unusual)", relVolOi))
    val relStrikes = when(bullish, coalesce(col("call_active_strikes"), lit(0)))
      .otherwise(coalesce(col("put_active_strikes"), lit(0)))
    val s3 = when(relStrikes >= 5, 2).when(relStrikes >= 3, 1).otherwise(0)
    val s3label = when(relStrikes >= 5, format_string("%d strikes active (institutional)", relStrikes))
      .when(relStrikes >= 3, format_string("%d strikes active", relStrikes))
    val relUoa = when(bullish, coalesce(col("call_uoa_depth"), lit(0.0)))
      .otherwise(coalesce(col("put_uoa_depth"), lit(0.0)))
    val s4 = when(relUoa > 2000000, 2).when(relUoa > 500000, 1).otherwise(0)
    val s4label = when(relUoa > 2000000, format_string("$%.1fM new positioning", relUoa / 1e6))
      .when(relUoa > 500000, format_string("$%.0fK new positioning", relUoa / 1e3))
    val s5 = when(abs(pct) > 1.5, 1).otherwise(0)
    val s5label = when(s5 > 0, format_string("Price moved %+.1f%%", pct))
    // divergence (:625-634) — note flip AFTER s2-s4 picked their side
    val divBear = bullish && putDv > callDv * 2 && putDv > 1000000
    val divBull = !bullish && callDv > putDv * 2 && callDv > 1000000
    val s6 = when(divBear || divBull, 1).otherwise(0)
    val s6label = when(divBear, lit("DIVERGENCE: heavy puts despite rally"))
      .when(divBull, lit("DIVERGENCE: heavy calls despite selloff"))
    val direction = when(divBear, "BEARISH").when(divBull, "BULLISH")
      .when(bullish, "BULLISH").otherwise("BEARISH")
    movers
      .withColumn("direction", direction)
      .withColumn("overnight_score", (s1 + s2 + s3 + s4 + s5 + s6).cast("int"))
      .withColumn("signals", filter(
        array(s1label, s2label, s3label, s4label, s5label, s6label), x => x.isNotNull))
      .withColumn("price_change_pct", pct)
      .withColumn("total_options_dollar_volume", totalDv)
  }

  /** A7 cluster boost (overnight_scanner.py:235-293): count (industry,
    * direction) clusters among scores >= 3; boost sub-threshold members
    * 4->+1 / 5-7->+2 / 8+->+3, capped at 10. */
  def clusterBoost(scored: DataFrame, metadata: DataFrame): DataFrame = {
    val tagged = scored.join(
      broadcast(metadata.select(col("ticker"), col("sector"), col("industry"))),
      Seq("ticker"), "left")
    val clusters = tagged
      .where(col("industry").isNotNull && col("overnight_score") >= ClusterMinScore)
      .groupBy(col("industry"), col("direction"))
      .agg(count(lit(1)).cast("int").as("cluster_size_raw"))
    val boost = when(col("cluster_size") >= 8, 3)
      .when(col("cluster_size") >= 5, 2).otherwise(1)
    tagged.join(broadcast(clusters), Seq("industry", "direction"), "left")
      .withColumn("cluster_size",
        when(col("industry").isNotNull, coalesce(col("cluster_size_raw"), lit(0)))
          .otherwise(lit(0)))
      .withColumn("original_score", col("overnight_score"))
      .withColumn("cluster_boost",
        when(col("industry").isNotNull &&
          col("overnight_score") < ClusterBoostThreshold &&
          col("cluster_size") >= ClusterMinSize, boost).otherwise(0))
      .withColumn("overnight_score",
        least(col("original_score") + col("cluster_boost"), lit(10)).cast("int"))
      .drop("cluster_size_raw")
  }

  /** Full pipeline: snapshots + chain + universe + metadata -> scored,
    * boosted signal table (all rows written; downstream filters narrow —
    * overnight_scanner.py:883-885). */
  def run(snapshots: DataFrame, chain: DataFrame, universe: DataFrame,
      metadata: DataFrame, asOf: Column, scanDate: Column): DataFrame = {
    val m = inUniverse(movers(snapshots), universe)
    val px = m.select(col("ticker"), col("effective_price"))
    val metrics = flowMetrics(chain, px)
    val best = bestContracts(chain, px, asOf)
      .groupBy("ticker")
      .pivot("option_type", Seq("call", "put"))
      .agg(first(col("best")))
    val scored = score(m.join(metrics, Seq("ticker"), "left"))
      .join(best, Seq("ticker"), "left")
      .withColumn("best",
        when(col("direction") === "BULLISH", col("call")).otherwise(col("put")))
    clusterBoost(scored, metadata)
      .withColumn("scan_date", scanDate)
      .select(
        col("scan_date"), col("ticker"), col("direction"),
        col("overnight_score"), col("original_score"), col("cluster_boost"),
        col("cluster_size"), col("sector"), col("industry"),
        col("price_change_pct"), col("effective_price").as("underlying_price"),
        col("day_volume"),
        col("call_dollar_vol").as("call_dollar_volume"),
        col("put_dollar_vol").as("put_dollar_volume"),
        col("total_options_dollar_volume"),
        col("call_vol_oi").as("call_vol_oi_ratio"),
        col("put_vol_oi").as("put_vol_oi_ratio"),
        col("call_active_strikes"), col("put_active_strikes"),
        col("call_uoa_depth"), col("put_uoa_depth"),
        col("signals"),
        col("best.contract_symbol").as("recommended_contract"),
        col("best.strike").as("recommended_strike"),
        col("best.expiration_date").as("recommended_expiration"),
        col("best.dte").as("recommended_dte"),
        col("best.mid_price").as("recommended_mid_price"),
        col("best.spread_pct").as("recommended_spread_pct"),
        col("best.contract_score").as("contract_score"),
        col("best.delta").as("recommended_delta"),
        col("best.gamma").as("recommended_gamma"),
        col("best.theta").as("recommended_theta"),
        col("best.vega").as("recommended_vega"),
        col("best.implied_volatility").as("recommended_iv"),
        col("best.volume").as("recommended_volume"),
        col("best.open_interest").as("recommended_oi"))
  }
}
