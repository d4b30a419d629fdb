package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** Scalar-function queries (SURVEY.md §2.8): string / date / math /
  * conditional families, each oracle-checked against DuckDB.
  */
object Scalars {

  /** q50 — string functions (F1/F3/F5): case, trim, concat, regex repair,
    * substring, padding over part names. */
  def q50StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      $"p_partkey",
      upper($"p_name").as("name_upper"),
      regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
      substring($"p_name", 1, 8).as("prefix8"),
      lpad($"p_partkey".cast("string"), 10, "0").as("key_padded"),
      concat_ws("_", $"p_brand", $"p_type").as("brand_type"),
      length($"p_name").as("name_len"))

  /** q51 — OCC-style deterministic key construction (F2/J8): fixed-width
    * formatted key from typed fields, then self-equi-join on it. */
  def q51OccKey(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      $"o_orderkey",
      concat(
        lit("O:"),
        $"o_orderstatus",
        date_format($"o_orderdate", "yyMMdd"),
        when($"o_totalprice" > 150000, lit("C")).otherwise(lit("P")),
        lpad(round($"o_totalprice" * 1000).cast("long").cast("string"), 12, "0")).as("occ"))
    // deterministic reconstruction joins back to itself on the built key
    o.groupBy($"occ").agg(count(lit(1)).as("n"), min($"o_orderkey").as("first_key"))
      .where($"n" >= 1)
  }

  /** q52 — date functions (F8/F9/F10/F11): parts, diffs, trunc, epoch. */
  def q52DateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      $"o_orderkey",
      year($"o_orderdate").as("yr"),
      month($"o_orderdate").as("mo"),
      (dayofweek($"o_orderdate") - 1).as("dow"), // Sunday=0 on both sides
      datediff(lit("1998-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_98"),
      date_format($"o_orderdate", "yyyy-MM").as("ym"),
      unix_millis($"o_orderdate".cast("timestamp")).as("epoch_ms"))

  /** q53 — math functions (F12-F15): rounding, abs, sign, clamp, safe div. */
  def q53MathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      $"l_orderkey", $"l_linenumber",
      round($"l_extendedprice", 2).as("price_r2"),
      abs($"l_extendedprice" - 30000).as("abs_dev"),
      signum($"l_discount" - 0.05).as("disc_sign"),
      clamp($"l_quantity", 10, 40).as("qty_clamped"),
      round(safeDiv($"l_extendedprice", $"l_quantity"), 4).as("unit_price"),
      round(ratioOrNull($"l_tax", $"l_discount"), 4).as("tax_over_disc"))

  /** q54 — tier ladder + flag score + rule score (F16/F17/F18): the
    * reference's additive scoring shape over order facts. */
  def q54ScoreLadder(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val score = ruleScore(Seq(
      ($"o_totalprice" > 300000) -> 2,
      ($"o_totalprice" > 150000) -> 1,
      ($"o_orderpriority" === "1-URGENT") -> 2,
      ($"o_orderstatus" === "F") -> 1), maxScore = 10)
    val premium = flagScore(
      $"o_totalprice" > 200000,
      $"o_orderpriority".isin("1-URGENT", "2-HIGH"),
      $"o_orderstatus" === "F")
    o.select(
      $"o_orderkey",
      score.cast("int").as("score"),
      premium.as("premium_score"),
      tierLadder(score, Seq(5.0 -> "home_run", 3.0 -> "strong", 1.0 -> "solid"), "none")
        .as("tier"),
      (premium >= 2).as("is_premium"))
  }

  /** q55 — coalesce fallback chains (P3/P4/P5): effective price with
    * midpoint fallback, null-injected via nullif to exercise each level. */
  def q55CoalesceChain(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      $"l_orderkey", $"l_linenumber",
      round(coalesce(
        when($"l_discount" > 0.05, $"l_extendedprice"),
        when($"l_tax" > 0.04, ($"l_extendedprice" + $"l_quantity" * 1000) / 2),
        $"l_quantity" * 1000), 4).as("effective_price"))

  /** q56 — type-coercion projection (P15/P17): string->double casts that
    * null on failure, last-token float extraction. */
  def q56TypeCoercion(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      $"p_partkey",
      $"p_size".cast("double").as("size_d"),
      extractFloat(concat($"p_type", lit(" "), $"p_retailprice".cast("string")))
        .as("extracted_price"),
      $"p_brand".cast("double").as("brand_as_num")) // always null: cast failure path

  /** q57 — JSON extraction (F6/F7): parse props k as int, aggregate. */
  def q57JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy(($"k" % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"), sum($"k").as("sum_k"))

  /** q58 — direction-conditional selection (P18) + safe-float (P16). */
  def q58DirectionConditional(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      $"l_orderkey", $"l_linenumber",
      when($"l_returnflag" === "R", $"l_extendedprice" * -1)
        .otherwise($"l_extendedprice").as("signed_price_raw"))
      .select($"l_orderkey", $"l_linenumber",
        safeFloat($"signed_price_raw").as("signed_price"))

  /** q47 — contract-eligibility predicate (P6, overnight_scanner.py:
    * 417-447 shape): range gates + positive-quote gates + a
    * direction-dependent moneyness ratio band, with the pass/fail census
    * per rejection reason (first failing gate wins, mirroring the
    * reference's sequential checks). */
  def q47Eligibility(spark: SparkSession, dir: String): DataFrame = {
    val dte = $"l_quantity" // 1..50 range stands in for DTE
    val quoteOk = $"l_extendedprice" > 0 && $"l_tax" >= 0
    val spreadOk = $"l_discount" <= 0.08 // spread-ratio gate
    val moneyness = when($"l_linestatus" === "O",
      $"l_extendedprice" / 30000.0).otherwise(lit(30000.0) / $"l_extendedprice")
    val reason = when(!(dte >= 7 && dte <= 45), "DTE")
      .when(!quoteOk, "QUOTE")
      .when(!spreadOk, "SPREAD")
      .when(!(moneyness >= 0.9 && moneyness <= 1.25), "MONEYNESS")
      .otherwise("ELIGIBLE")
    Tables.lineitem(spark, dir)
      .select(reason.as("gate"))
      .groupBy($"gate")
      .agg(count(lit(1)).as("cnt"))
  }

  /** q49 — regime-weighted score blend (F21,
    * GraftFunctions.regimeWeightedScore): event-regime weights when the
    * news score is high, quiet-regime weights when low, the midpoint in
    * between. */
  def q49RegimeBlend(spark: SparkSession, dir: String): DataFrame = {
    val news = $"l_discount" * 10
    val sA = $"l_quantity" / 50
    val sB = $"l_tax" * 10
    Tables.lineitem(spark, dir).select(
      $"l_orderkey", $"l_linenumber",
      round(regimeWeightedScore(news,
        Seq((sA, 0.6, 0.2), (sB, 0.4, 0.8))), 4).as("blended"))
  }

  /** q42 — support/resistance selection (F20): greatest candidate strictly
    * below the price / least strictly above, from a fixed candidate ladder
    * (enrichment-trigger/main.py:372-386 semantics; null when no candidate
    * is on that side). */
  def q42SupportResistance(spark: SparkSession, dir: String): DataFrame = {
    val price = $"l_extendedprice"
    val candidates = Seq($"l_quantity" * 1000, $"l_discount" * 500000, lit(30000.0))
    Tables.lineitem(spark, dir).select(
      $"l_orderkey", $"l_linenumber",
      round(supportLevel(price, candidates), 4).as("support"),
      round(resistanceLevel(price, candidates), 4).as("resistance"))
  }
}
