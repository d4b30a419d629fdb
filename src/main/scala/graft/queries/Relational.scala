package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._
import graft.operators.{Joins, Streaks}

/** Relational operator queries (SURVEY.md §2.1-2.7) declared over the
  * driver testdata tables. Every query here has a DuckDB oracle in
  * [[graft.Oracles]]; column names/rounding are aligned on both sides
  * because the driver hash-compares values after sorting columns by name.
  *
  * Double outputs are rounded (4dp) on BOTH sides: Spark and DuckDB may
  * sum floats in different orders; rounding absorbs last-ulp drift while
  * keeping the check strict.
  */
object Relational {

  /** q01 — TPC-H Q1 shape: grouped multi-aggregate with derived expression
    * (A1/A8/F12; reference grouped aggs run_sweep.py:258-298). */
  def q01LineitemAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(sum($"l_extendedprice"), 4).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("sum_disc_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))

  /** q02 — filter + projection pushdown (P2/P7/P10): predicate and column
    * set must reach the parquet scan. */
  def q02FilterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where($"l_quantity" >= 45 && $"l_returnflag" === "R" && $"l_discount".isNotNull)
      .select($"l_orderkey", $"l_partkey", $"l_quantity", round($"l_extendedprice", 4).as("price"))

  /** q03 — broadcast dimension join chain (J1): customer x nation x region,
    * dims broadcast explicitly. */
  def q03BroadcastJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_customers"), round(avg($"c_acctbal"), 4).as("avg_acctbal"))

  /** q04 — semi join (P1): customers that have at least one order. */
  def q04SemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")

  /** q05 — anti join (T3/P12 negation semantics): customers without orders. */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", round($"c_acctbal", 4).as("acctbal"))

  /** q06 — multi-source enrichment join (J2): orders left-joined to
    * customer + nation, wide projection with null-filled missing side. */
  def q06EnrichmentJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey", "left")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey", "left")
      .select(
        $"o_orderkey", $"o_custkey",
        round($"o_totalprice", 4).as("totalprice"),
        coalesce($"c_name", lit("UNKNOWN")).as("cust_name"),
        coalesce($"n_name", lit("NONE")).as("nation_name"),
        coalesce(round($"c_acctbal", 4), lit(0.0)).as("acctbal"))

  /** q07 — argmax per group (A5/A6 min_by/max_by): top customer by
    * (acctbal, custkey) per nation. */
  def q07Argmax(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        max_by($"c_custkey", struct($"c_acctbal", $"c_custkey")).as("top_custkey"),
        round(max($"c_acctbal"), 4).as("top_acctbal"))

  /** q08 — conditional aggregation (A1-A4/A10): per order-priority
    * conditional sums and count_if. */
  def q08ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        round(sum(when($"o_orderstatus" === "F", $"o_totalprice").otherwise(lit(0.0))), 4)
          .as("finished_value"),
        sum(when($"o_totalprice" > 100000, 1).otherwise(0)).as("big_orders"),
        count(lit(1)).as("cnt"))

  /** q09 — share-of-total percentage (A11): share of all orders per status.
    * The grand total is a broadcast one-row aggregate, not an unpartitioned
    * window — same values, no single-partition WindowExec at scale. */
  def q09WindowTotalPct(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
    agg.crossJoin(broadcast(agg.agg(sum($"cnt").as("_t"))))
      .withColumn("pct_of_all", round($"cnt" * 100.0 / $"_t", 1))
      .drop("_t")
  }

  /** q10 — exact percentiles (A17): median + quartiles of acctbal per
    * market segment (exact, not approx — oracle parity; SURVEY §5). */
  def q10Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy($"c_mktsegment")
      .agg(
        round(expr("percentile(c_acctbal, 0.25)"), 4).as("p25"),
        round(expr("percentile(c_acctbal, 0.5)"), 4).as("p50"),
        round(expr("percentile(c_acctbal, 0.75)"), 4).as("p75"))

  /** q11 — dedup first-row-per-group (A14/O3): keep the highest-value order
    * per customer, deterministic (desc totalprice, asc orderkey) tie-break. */
  def q11DedupRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 4).as("totalprice"))
  }

  /** q12 — top-N per group (O6): top-3 orders per priority. */
  def q12TopNPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey",
        round($"o_totalprice", 4).as("totalprice"))
  }

  /** q13 — scalar subquery for latest partition (A13): orders on the most
    * recent order date. */
  def q13ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.createOrReplaceTempView("orders_q13")
    spark.sql(
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS orderdate
        |FROM orders_q13
        |WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders_q13)""".stripMargin)
  }

  /** q14 — UNION ALL of per-cohort aggregates (T1/J10): overlapping cohort
    * tagging via explode + single groupBy (the Spark-first formulation of
    * the reference's five unioned blocks, premium_eda.py:23-48). */
  def q14UnionCohorts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("cohort", explode(filter(array(
        when($"l_quantity" >= 40, lit("HIGH_QTY")),
        when($"l_discount" >= 0.08, lit("HIGH_DISC")),
        when($"l_returnflag" === "R", lit("RETURNED"))), x => x.isNotNull)))
      .groupBy($"cohort")
      .agg(
        count(lit(1)).as("cnt"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(sum($"l_quantity"), 4).as("sum_qty"))

  /** q15 — top-k sort (O1/O2): top-10 orders by totalprice, deterministic. */
  def q15TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", round($"o_totalprice", 4).as("totalprice"), $"o_orderpriority")

  /** q16 — histogram bucketing (A18): CASE-ladder buckets of order value. */
  def q16Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bucket",
        when($"o_totalprice" < 50000, "P0_SMALL")
          .when($"o_totalprice" < 150000, "P1_MID")
          .when($"o_totalprice" < 300000, "P2_LARGE")
          .otherwise("P3_JUMBO"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("cnt"), round(avg($"o_totalprice"), 4).as("avg_price"))

  /** q17 — value_counts (A16): event type frequency. */
  def q17ValueCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"))

  /** q18 — min/max/count summary (A12). */
  def q18MinMaxSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .agg(
        min($"o_orderdate").cast("date").as("min_date"),
        max($"o_orderdate").cast("date").as("max_date"),
        count(lit(1)).as("cnt"),
        round(min($"o_totalprice"), 4).as("min_price"),
        round(max($"o_totalprice"), 4).as("max_price"))

  /** q19 — vote tally + tier classification (A19/A22): per event_type,
    * distinct voters, avg conviction, tier ladder. */
  def q19VoteTally(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint the (tiny, one-row-per-type) aggregate so the
    // broadcast total below reuses it — without it Spark re-plans the
    // whole scan + two-level distinct aggregation a second time for
    // the scalar subtree (observed 2x work in the formatted plan).
    val agg = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("voters"),
        count(lit(1)).as("votes"),
        round(avg($"value"), 4).as("avg_conviction"))
      .localCheckpoint(true)
    val total = agg.select(sum($"voters").as("t"))
    agg.crossJoin(broadcast(total))
      .withColumn("tier",
        when($"voters" / $"t" >= 0.8, "SUPERMAJORITY")
          .when($"voters" / $"t" >= 0.4, "MAJORITY")
          .when($"votes" >= 2, "SPLIT")
          .otherwise("SOLO"))
      .select($"event_type", $"voters", $"votes", $"avg_conviction", $"tier")
  }

  /** q20 — merge-upsert as join+coalesce (J3): update customer balances
    * from an order-derived staging side; unmatched rows pass through. */
  def q20MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val updates = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 4).as("c_acctbal"))
      .withColumnRenamed("o_custkey", "c_custkey")
    val target = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", round($"c_acctbal", 4).as("c_acctbal"))
    Joins.mergeUpdate(target, updates, Seq("c_custkey"), Seq("c_acctbal"))
      .select($"c_custkey", $"c_name", round($"c_acctbal", 4).as("acctbal"))
  }

  /** q21 — delete-then-insert partition rewrite (T3): replace one
    * mktsegment's rows with a recomputed version. */
  def q21ReplaceByKey(spark: SparkSession, dir: String): DataFrame = {
    val target = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", round($"c_acctbal", 4).as("acctbal"))
    val replacement = Tables.customer(spark, dir)
      .where($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_mktsegment", round($"c_acctbal" * 2, 4).as("acctbal"))
    Joins.replaceByKey(target, replacement, Seq("c_mktsegment"))
  }

  /** q22 — gaps-and-islands max losing streak (W12): per user, longest run
    * of events with value < 50, ordered by (ts, event_id). */
  def q22MaxStreak(spark: SparkSession, dir: String): DataFrame =
    Streaks.maxStreak(Tables.events(spark, dir),
      $"user_id", struct($"ts", $"event_id"), $"value" < 50)
      .withColumnRenamed("_key", "user_id")

  /** q23 — max drawdown (W13) over each user's cumulative value path. */
  def q23MaxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val path = Tables.events(spark, dir)
      .withColumn("capital", lit(1000.0) + sum($"value" - 50.0).over(w))
    Streaks.maxDrawdown(path, $"user_id", struct($"ts", $"event_id"), $"capital")
      .withColumnRenamed("_key", "user_id")
  }

  /** q25 — top-N ordered list aggregation (A20): per priority, the top-3
    * order keys by value as an array (collect_list has no ordering
    * guarantee — sort_array over (value, key) structs makes it exact).
    * The list is emitted '|'-joined so both engines hash a scalar. */
  def q25TopLists(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(slice(reverse(sort_array(collect_list(
        struct($"o_totalprice", $"o_orderkey")))), 1, 3).as("top"))
      .select($"o_orderpriority",
        array_join(expr("transform(top, x -> cast(x.o_orderkey as string))"), "|")
          .as("top_orders"),
        round(expr("aggregate(top, cast(0.0 as double), (a, x) -> a + x.o_totalprice)"), 4)
          .as("top_value"))

  /** q24 — chronological holdout split (W14): first half vs second half of
    * orders by date, compared on win-rate-style metrics.
    *
    * Scale-safe plan: an unpartitioned ntile window moves the whole fact
    * table to ONE task; instead the median order timestamp is computed as a
    * single scalar aggregate (partial-agg'd, no global sort) and halves are
    * tagged by plain comparison — the same holdout semantics with a
    * broadcast join of one row.
    */
  def q24NtileSplit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select($"o_totalprice", unix_millis($"o_orderdate".cast("timestamp")).as("ts_ms"))
    val med = o.agg(expr("percentile(ts_ms, 0.5)").as("med"))
    o.crossJoin(broadcast(med))
      .withColumn("half", when($"ts_ms" <= $"med", 1).otherwise(2))
      .groupBy($"half")
      .agg(count(lit(1)).as("cnt"), round(avg($"o_totalprice"), 4).as("avg_price"))
  }

  /** q102 — top-k per group via the bounded-heap aggregate
    * ([[graft.operators.TopK]]): q12's O6 semantics on the scale path —
    * only k-row summaries shuffle, never the group's raw rows. Values
    * pass through unrounded (no arithmetic), so the oracle's window
    * formulation must match exactly. */
  def q102TopKAgg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TopK.topKPerGroup(
      Tables.orders(spark, dir), "o_orderpriority", "o_orderkey",
      "o_totalprice", k = 3)

  /** q113 — CUBE grouping (the OLAP rollup surface): all 2^2 grouping
    * sets of (returnflag, linestatus) in ONE pass — Spark expands the
    * grouping sets before a single shuffle, the same plan DuckDB's
    * GROUP BY CUBE produces. Subtotal rows carry NULL dims on both
    * engines. */
  def q113Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"),
        count(lit(1)).as("cnt"))

  /** q114 — pivot (long -> wide): per-user value totals spread across the
    * five event types. A fixed pivot-value list keeps the schema static
    * (no extra distinct-scan pass) — the form a production job uses. The
    * oracle is the conditional-aggregation expansion pivot desugars to. */
  def q114Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(round(sum($"value"), 4))

  /** q125 — skew-safe two-phase aggregation ([[graft.operators.Skew
    * .saltedAgg]]): lineitem grouped by return flag — 3 keys across 600k
    * rows, a genuinely hot-key distribution — aggregated via (key, salt)
    * partials then a key-level merge, capping any task at ~1/16 of a hot
    * key. Salting MUST be semantics-preserving, so the oracle is the
    * plain GROUP BY; DECIMAL summation makes the two-phase addition
    * order irrelevant (q115 precedent). */
  def q125SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedAgg(
      Tables.lineitem(spark, dir)
        .select($"l_returnflag", $"l_quantity".cast("decimal(12,2)").as("q")),
      "l_returnflag", saltBuckets = 16,
      partialAggs = Seq(sum($"q").as("ps"), count(lit(1)).as("pc")),
      finalAggs = Seq(sum($"ps").cast("double").as("sum_qty"),
        sum($"pc").cast("long").as("n_rows")))

  /** q134 — GK-sketch percentiles at SATURATING accuracy ([[graft
    * .operators.Sketches.approxQuantiles]]): with rank error 1/accuracy
    * far under one row (1e7 >> N), the mergeable sketch must reproduce
    * the exact discrete quantiles — the q90/q94 saturation-identity
    * trick applied to the sketch family, so the scale path (fixed-size
    * map-side summaries, O(groups) shuffle — the 100 TB replacement for
    * q10's exact per-group sort) gets a cross-engine oracle instead of
    * only a tolerance spec. */
  def q134GkQuantiles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.approxQuantiles(
      Tables.lineitem(spark, dir), "l_quantity", Seq("l_returnflag"),
      Seq(0.25, 0.5, 0.75, 0.95), accuracy = 10000000)

  /** q168 — SCD type-2 history build ([[graft.operators.Scd
    * .type2History]]): each customer's order-status observations
    * collapse into validity ranges — the history-preserving upgrade of
    * the reference's truncate-load snapshot cadence (S14). Ranges open
    * at their first observation and close at the NEXT range's start
    * (half-open [valid_from, valid_to)); the per-key lead leaves the
    * current range open with `is_current` set. Dates, counts, and the
    * (o_orderdate, o_orderkey) tie-break replay exactly in SQL. */
  def q168Scd2History(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Scd.type2History(
      Tables.orders(spark, dir).select(
        $"o_custkey", $"o_orderstatus",
        $"o_orderdate".cast("date").as("obs_date"), $"o_orderkey"),
      keyCol = "o_custkey", attrCol = "o_orderstatus",
      orderCol = "obs_date", tieBreakCol = "o_orderkey")

  /** q169 — link-graph centrality ([[graft.operators.Graph.pageRank]]):
    * customers and suppliers who traded (distinct pairs via
    * orders⋈lineitem) form a bidirectional digraph (supplier nodes
    * offset by 10^6 to disambiguate the key spaces); 8 damped rounds.
    * Bidirectional edges mean no dangling nodes, so the simple
    * no-redistribution rule is exact. Ranks are fixed-point longs
    * (scale 10^15), so all 8 rounds are exact integer sums —
    * bit-identical to the oracle's unrolled CTE replay at any
    * parallelism; output rounds to 10dp only to absorb nothing — it is
    * a hash-stability belt (BigDecimal repr semantics mirrored in SQL). */
  def q169PageRank(spark: SparkSession, dir: String): DataFrame = {
    // no .distinct() here: pageRank distincts its edge input anyway, and
    // the supplier-offset keeps the two union branches disjoint, so one
    // distinct over the union replaces two (measured 7.4 s -> 1.4 s for
    // the edge build at sf0.1 — the pair table is the big shuffle)
    val pairs = GraphStages.tradePairs(spark, dir)
    val edges = pairs.select($"c".as("src"), ($"s" + 1000000L).as("dst"))
      .unionByName(pairs.select(($"s" + 1000000L).as("src"), $"c".as("dst")))
    graft.operators.Graph.pageRank(edges, "src", "dst", iterations = 8,
        edgesCanonical = true)
      .select($"node",
        when($"node" >= 1000000L, "supplier").otherwise("customer").as("kind"),
        round($"pr", 10).as("pagerank"))
  }

  /** q380 — personalized PageRank ([[graft.operators.Graph
    * .personalizedPageRank]]): relevance to a pinned 1%-customer seed
    * set over the q169 trade graph — teleport lands only on seeds;
    * same unrolled integer fixed point. */
  def q380PersonalizedPr(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
    val edges = pairs.select($"c".as("src"), ($"s" + 1000000L).as("dst"))
      .unionByName(pairs.select(($"s" + 1000000L).as("src"), $"c".as("dst")))
    val seeds = Tables.customer(spark, dir)
      .where($"c_custkey" % 100 === 0).select($"c_custkey".as("seed"))
    graft.operators.Graph.personalizedPageRank(edges, "src", "dst",
        seeds, "seed", iterations = 8, edgesCanonical = true)
      .select($"node",
        when($"node" >= 1000000L, "supplier").otherwise("customer").as("kind"),
        round($"ppr", 10).as("ppr"))
  }

  /** q364 — HyperANF neighborhood function ([[graft.operators.Graph
    * .hyperAnf]]): per-node HLL ball sizes over 4 hops of the q169
    * customer–supplier graph — the effective-diameter primitive;
    * md5-replayable registers, IEEE-exact estimator. */
  def q364HyperAnf(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
    val edges = pairs.select($"c".as("src"), ($"s" + 1000000L).as("dst"))
      .unionByName(pairs.select(($"s" + 1000000L).as("src"), $"c".as("dst")))
    graft.operators.Graph.hyperAnf(edges, "src", "dst", maxHops = 4, b = 6,
        edgesCanonical = true)
      .select($"node", $"hop", $"nonempty", round($"est", 4).as("est"))
  }

  /** q245 — HITS hubs/authorities ([[graft.operators.Graph.hits]]):
    * the DIRECTED customer→supplier trade graph, 4 rounds of the
    * mutual-reinforcement recurrence with L1 normalization — hub
    * customers buy from authoritative suppliers, two roles q169's
    * PageRank conflates. Fixed-point longs (scale 10^9) keep every
    * in/out-mass an exact integer sum; the oracle unrolls the rounds
    * as CTEs with the identical `//` floors. */
  def q245Hits(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
      .select($"c".as("src"), ($"s" + 1000000L).as("dst"))
    graft.operators.Graph.hits(pairs, "src", "dst", iterations = 4,
        edgesCanonical = true)
      .select($"node",
        when($"node" >= 1000000L, "supplier").otherwise("customer").as("kind"),
        round($"hub", 9).as("hub"), round($"auth", 9).as("auth"))
  }

  /** q178 — grouped OLS trend fit ([[graft.operators.Regression
    * .groupedOls]]): price-vs-quantity slope / intercept / r² per
    * return flag in ONE aggregation pass over six mergeable sufficient
    * statistics. The sums are DECIMAL-exact (order-insensitive at any
    * parallelism — lineitem's doubles are 2-decimal money values, so
    * scale 4 holds x², xy and y² exactly as cast), and the closed
    * forms evaluate in a fixed expression shape over the exact sums —
    * bit-replayable cross-engine, no tolerance. */
  def q178GroupedOls(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Regression.groupedOls(Tables.lineitem(spark, dir),
        Seq("l_returnflag"), "l_quantity", "l_extendedprice", scale = 4)
      .select($"l_returnflag", $"n", round($"slope", 6).as("slope"),
        round($"intercept", 6).as("intercept"), round($"r2", 6).as("r2"))

  /** q182 — exact weighted median ([[graft.operators.WeightedStats]]):
    * the price at which half the shipped QUANTITY sits below, per
    * return flag — the unequal-row-mass summary a plain median gets
    * wrong. Integral weights make the cumulative mass exact, the
    * (value, orderkey, linenumber) order total, and the crossing row
    * deterministic; the oracle replays the identical window. */
  def q182WeightedMedian(spark: SparkSession, dir: String): DataFrame =
    graft.operators.WeightedStats.weightedMedian(Tables.lineitem(spark, dir),
        "l_returnflag", "l_extendedprice", "l_quantity",
        tieCols = Seq("l_orderkey", "l_linenumber"))
      .select($"l_returnflag", round($"weighted_median", 4).as("weighted_median"),
        $"total_weight".cast("long").as("total_weight"))

  /** q183 — mergeable distinct-count sketch ([[graft.operators.Sketches
    * .hllRegisters]]/[[graft.operators.Sketches.hllEstimate]]): per-year
    * distinct customers via md5-derived HLL registers, PLUS a global
    * 'ALL' row computed by MERGING the per-year register tables
    * (re-group, `max`) — never re-reading orders. That merge step is the
    * operator's point at 100 TB: per-partition/per-day sketches union
    * into any rollup at O(m) cost each. All register math is md5-derived
    * string/integer work and the harmonic sum is an exact power-of-two
    * sum (see operator scaladoc), so DuckDB rebuilds every estimate
    * bit-for-bit; `true_distinct` rides along to show the error. */
  def q183HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val b = 8
    val o = Tables.orders(spark, dir)
      .select(date_format($"o_orderdate", "yyyy").as("year"), $"o_custkey")
    val regs = graft.operators.Sketches.hllRegisters(o, Seq("year"), "o_custkey", b)
    val merged = regs.groupBy($"reg")
      .agg(max($"max_rank").as("max_rank"))
      .select(lit("ALL").as("year"), $"reg", $"max_rank")
    val est = graft.operators.Sketches.hllEstimate(
      regs.unionByName(merged), Seq("year"), b)
    val truth = o.groupBy($"year")
      .agg(countDistinct($"o_custkey").as("true_distinct"))
      .unionByName(o.agg(countDistinct($"o_custkey").as("true_distinct"))
        .select(lit("ALL").as("year"), $"true_distinct"))
    est.join(truth, "year")
      .select($"year", $"nonempty",
        round($"hll_estimate", 4).as("hll_estimate"), $"true_distinct")
  }

  /** q186 — MAD robust outlier census ([[graft.operators.Robust
    * .madOutliers]]): per return flag, the exact lower-median of
    * extended price, the median absolute deviation, and the count of
    * rows beyond the 3-sigma-equivalent fence (3 * 1.4826 * MAD). Lower
    * medians are picked by integer crossing arithmetic — no
    * interpolation seam — and the deviations are single exact
    * subtractions, so every column replays bit-for-bit. */
  def q186MadOutliers(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Robust.madOutliers(Tables.lineitem(spark, dir),
      "l_returnflag", "l_extendedprice",
      tieCols = Seq("l_orderkey", "l_linenumber"), k = 3.0)

  /** q193 — rolling-window distinct via HLL register rollup (q183's
    * sketch put to its real use): trailing-3-month distinct customers
    * per month of 1995-1996, computed ENTIRELY from the per-month
    * register tables — per register, a 3-month range-window max; orders
    * is read once to build 24 monthly sketches and never again. The
    * exact rolling distinct (which at 100 TB would re-scan every
    * 3-month window) rides along as truth. Register math replays in
    * SQL; the range window maxes over whatever months a register
    * appears in, absent months contributing nothing — exactly the
    * sketch-union semantics. */
  def q193RollingHll(spark: SparkSession, dir: String): DataFrame = {
    val b = 8
    val o = Tables.orders(spark, dir)
      .where(year($"o_orderdate").between(1995, 1996))
      .select(((year($"o_orderdate") - 1995) * 12 + month($"o_orderdate") - 1)
        .as("mnum"), $"o_custkey")
    val regs = graft.operators.Sketches.hllRegisters(o, Seq("mnum"), "o_custkey", b)
    val wRoll = Window.partitionBy($"reg")
      .orderBy($"mnum").rangeBetween(-2, 0)
    // per (reg, present-month): the merged register over [m-2, m]; a
    // register absent in the whole window simply yields no row, which
    // the estimator counts as empty — sketch-union semantics for free.
    // distinct months per reg: a reg present in months {1,3} must still
    // produce a window row for month 2? No — month 2's rollup only needs
    // regs present SOMEWHERE in [0,2]; densify by crossing months with
    // the distinct regs so absent (reg, month) pairs exist as nulls.
    // BOUNDED densify: months <= 24 (the 1995-96 filter above) and regs
    // <= 2^b = 256 (register space), so this crossJoin is at most 6,144
    // rows by construction — it scales with the SKETCH geometry, never
    // with orders. Widening the time range or b grows it as
    // months x 2^b; keep that product in mind before reusing the shape.
    val months = regs.select($"mnum").distinct()
    val dense = months.crossJoin(regs.select($"reg").distinct())
      .join(regs, Seq("mnum", "reg"), "left")
    val rolled = dense
      .withColumn("roll_rank", max($"max_rank").over(wRoll))
      .where($"roll_rank".isNotNull)
      .select($"mnum", $"reg", $"roll_rank".as("max_rank"))
    val est = graft.operators.Sketches.hllEstimate(rolled, Seq("mnum"), b)
    val truth = months.as("m").join(o.as("o"),
        $"o.mnum".between($"m.mnum" - 2, $"m.mnum"))
      .groupBy($"m.mnum".as("mnum"))
      .agg(countDistinct($"o_custkey").as("true_distinct"))
    est.join(truth, "mnum")
      .select($"mnum", $"nonempty",
        round($"hll_estimate", 4).as("hll_estimate"), $"true_distinct")
  }

  /** q196 — exact per-node triangle counts ([[graft.operators.Triangles
    * .perNode]]) over the supplier co-occurrence graph (two suppliers
    * are adjacent iff some order sources lineitems from both) — the
    * clustering-structure signal that, with q169's PageRank, ranks how
    * tightly a node's neighborhood interlinks. Degree-ordered
    * orientation caps every wedge pivot at O(√m) out-degree, so no
    * hub explosion at web scale; all counts are integers — bit-stable
    * at any parallelism. The oracle replays orientation and the wedge
    * close with the same (degree, id) tuple comparisons. */
  def q196Triangles(spark: SparkSession, dir: String): DataFrame = {
    val os = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("s")).distinct()
    val edges = os.select($"ok", $"s".as("u"))
      .join(os.select($"ok", $"s".as("v")), "ok")
      .where($"u" < $"v")
      .select($"u", $"v")
    graft.operators.Triangles.perNode(edges, "u", "v")
      .select($"node".as("s_suppkey"), $"triangles")
  }

  /** q202 — Benford first-digit audit ([[graft.operators.Benford]])
    * over extended prices: digits come from the CENTS integer (exact
    * for 2-decimal money doubles), expected counts from hard-coded
    * full-precision log10(1+1/d) literals — no transcendental runs at
    * query time, so observed, expected and per-digit chi-square terms
    * all replay bit-identically. */
  def q202Benford(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Benford.audit(
      Tables.lineitem(spark, dir).where($"l_extendedprice" > 0),
      round($"l_extendedprice" * 100).cast("long"))

  /** q203 — k-anonymity audit ([[graft.operators.Anonymity]]): customer
    * quasi-identifier classes (nation, segment, 1000-unit balance band)
    * with fewer than k=5 members — the re-identification census run
    * before any user-derived table ships. The balance band shifts cents
    * positive before integer division so truncation == floor on both
    * engines. One hash aggregation; integer counts only. */
  def q203KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.customer(spark, dir)
      .withColumn("cents", round($"c_acctbal" * 100).cast("long"))
      .select($"c_nationkey", $"c_mktsegment",
        expr("(cents + 100000) div 100000").as("bal_band"))
    graft.operators.Anonymity.atRiskClasses(
      q, Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)
  }

  /** q205 — column-profiling census ([[graft.operators.Profile]]) over
    * string/integer columns of lineitem and orders: row/null/distinct
    * counts plus the deterministic mode (smallest value among the most
    * frequent — min(struct(-cnt, v)), no window). Doubles are
    * deliberately out of scope (string repr is engine-sensitive);
    * integer keys cast identically everywhere. */
  def q205ProfileCensus(spark: SparkSession, dir: String): DataFrame = {
    val p1 = graft.operators.Profile.profile(
      Tables.lineitem(spark, dir), Seq("l_returnflag", "l_linestatus", "l_suppkey"))
    val p2 = graft.operators.Profile.profile(
      Tables.orders(spark, dir), Seq("o_orderstatus", "o_orderpriority"))
    p1.unionByName(p2)
  }

  /** q206 — referential-integrity audit ([[graft.operators.Integrity]])
    * across the star schema: orphan FKs (rows inner joins would drop)
    * and unused parent keys (dead dimension rows) per declared
    * relation — two anti-joins each, integer counts. */
  def q206IntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Integrity.Relation
    val li = Tables.lineitem(spark, dir); val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir); val s = Tables.supplier(spark, dir)
    val p = Tables.part(spark, dir); val n = Tables.nation(spark, dir)
    graft.operators.Integrity.orphanAudit(Seq(
      Relation("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
      Relation("lineitem->part", li, "l_partkey", p, "p_partkey"),
      Relation("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"),
      Relation("orders->customer", o, "o_custkey", c, "c_custkey"),
      Relation("customer->nation", c, "c_nationkey", n, "n_nationkey")))
  }

  /** q207 — Pearson correlation matrix ([[graft.operators.Regression
    * .corrMatrix]]) over the four lineitem measures in one aggregation
    * pass: DECIMAL-exact sufficient statistics (scale 4 holds every
    * pairwise product of 2-decimal money values exactly), closed-form
    * correlations as fixed chains of correctly-rounded ops —
    * bit-replayable, O(k²) shuffle bytes at any row count. */
  def q207CorrMatrix(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Regression.corrMatrix(Tables.lineitem(spark, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), scale = 4)

  /** q209 — deletion-propagation sweep (right-to-be-forgotten impact):
    * a deterministic 5% customer deletion list cascades through
    * orders -> lineitem by semi-joins; per table the audit reports how
    * many rows the erasure removes. The ratio is one division over
    * exact integers. Semi-joins broadcast the shrinking key set — the
    * fact tables never shuffle. */
  def q209DeletionImpact(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val del = cust.where($"c_custkey" % 20 === 0).select($"c_custkey")
    val delOrders = ord.join(broadcast(del),
      ord("o_custkey") === del("c_custkey"), "left_semi")
    val delKeys = delOrders.select($"o_orderkey")
    val delLi = li.join(broadcast(delKeys),
      li("l_orderkey") === delKeys("o_orderkey"), "left_semi")
    def row(name: String, total: DataFrame, deleted: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_total"))
        .crossJoin(deleted.agg(count(lit(1)).as("n_deleted")))
        .select(lit(name).as("table_name"), $"n_total", $"n_deleted",
          ($"n_deleted".cast("double") / $"n_total".cast("double")).as("deleted_frac"))
    row("customer", cust, del)
      .unionByName(row("orders", ord, delOrders))
      .unionByName(row("lineitem", li, delLi))
  }

  /** q210 — novelty telemetry: per (user, day), event types active that
    * day, types never seen before (first-occurrence day), and the
    * running distinct-type count — the exact running-distinct window
    * q193's rolling HLL approximates. All windows partition by user
    * over day-grain rows; integer counts only. */
  def q210NoveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select($"user_id", date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type")
      .distinct()
    val first = ev.groupBy($"user_id", $"event_type")
      .agg(min($"day").as("first_day"))
    val daily = ev.join(first, Seq("user_id", "event_type"))
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_types_active"),
        sum(when($"first_day" === $"day", 1L).otherwise(0L)).as("n_new_types"))
    val wCum = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_distinct_types", sum($"n_new_types").over(wCum))
  }

  /** q212 — Z-order layout audit ([[graft.operators.ZOrder]]): lineitem
    * clustered on the interleaved (l_orderkey, l_suppkey) Morton code,
    * reported as 64 z-range buckets with their (a, b) bounding boxes —
    * the multi-dimensional-locality readout behind `OPTIMIZE ZORDER`
    * layouts: small boxes mean min/max file statistics prune on EITHER
    * key. Pure integer quantization + shift-and-mask interleave, so the
    * oracle replays the layout bit-for-bit; one shuffle (the bucket
    * census), domain row broadcast. */
  def q212ZorderLayout(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ZOrder.layoutAudit(
      Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
      "l_orderkey", "l_suppkey", log2Buckets = 6)

  /** q472 — Hilbert-curve layout audit ([[graft.operators.ZOrder
    * .hilbertAudit]], [[graft.functions.Hilbert]] codegen index):
    * q212's Morton audit upgraded to the CONTINUOUS curve — the Z
    * interleave jumps a long diagonal at every high-bit flip, so
    * adjacent z buckets can span half the domain on one axis, while
    * Hilbert moves one cell per step and equal-index ranges carry
    * provably tighter bounding boxes (Moon et al. 2001) — the min/max
    * file-statistics pruning upgrade at identical write cost (the
    * index is still just a range-partition sort key). The oracle
    * replays the 16-round quadrant/rotation walk as an integer fold. */
  def q472HilbertLayout(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ZOrder.hilbertAudit(
      Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
      "l_orderkey", "l_suppkey", log2Buckets = 6)

  /** q220 — sketch-estimated join size
    * ([[graft.operators.Sketches.cmsJoinSize]]): the self-join size of
    * lineitem on l_suppkey (Σ c²) estimated from the 4×512 Count-Min
    * sketch's row-wise inner products, next to the exact census answer.
    * The estimate is provably ≥ true with any overcount being real
    * md5-cell collisions — which the oracle reproduces bit-for-bit by
    * rebuilding the sketch, so even the error replays. */
  def q220CmsJoinSize(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select($"l_suppkey")
    // self-estimate: the SAME sketch feeds both sides of the cell join —
    // materialize once (eager localCheckpoint; the sketch is O(cells),
    // the build is the row-scale explode+census worth sharing)
    val sk = graft.operators.Sketches
      .cmsBuild(li, "l_suppkey", depth = 4, width = 512)
      .localCheckpoint(true)
    val est = graft.operators.Sketches.cmsJoinSize(sk, sk, depth = 4)
      .select($"join_size_est".cast("long").as("join_size_est"))
    val truth = li.groupBy($"l_suppkey").agg(count(lit(1)).as("c"))
      .agg(sum($"c" * $"c").as("true_size"))
    est.crossJoin(broadcast(truth))
      .withColumn("overcount", $"join_size_est" - $"true_size")
  }

  /** q218 — key-skew diagnosis ([[graft.operators.Skew.skewSummary]]):
    * the pre-flight numbers for a join/agg over (orders ⋈ lineitem)-style
    * keys — hottest-key share, top-10 concentration, and the inverse-
    * Simpson effective key count, over l_suppkey. All counts integral to
    * the final three divisions; Σc² runs in decimal so the moment can
    * never overflow. Skew is planted by UNIONing the rows of suppkey < 3
    * four extra times — a real hot-key profile on otherwise-uniform
    * synthetic data. */
  def q218SkewCensus(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select($"l_suppkey")
    val hot = li.where($"l_suppkey" < 3)
    val skewed = li.unionByName(hot).unionByName(hot)
      .unionByName(hot).unionByName(hot)
    graft.operators.Skew.skewSummary(skewed, "l_suppkey", topN = 10)
  }

  /** q215 — exact quantiles with NO global sort
    * ([[graft.operators.Quantiles.quantilesDisc]]): the ceil(p·n)-th
    * smallest l_extendedprice for four probabilities via histogram
    * bisection — O(log) aggregation scans shuffling O(bins) rows each,
    * then one sliver sort, where `percentile`/`ORDER BY OFFSET` would
    * range-exchange the full column. The oracle is DuckDB's
    * `quantile_disc`, whose rank rule (ceil(p·n)) the operator
    * implements exactly — an off-by-one anywhere in the bin walk picks a
    * neighboring element and hash-mismatches. */
  def q215QuantileBisect(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.quantilesDisc(
      Tables.lineitem(spark, dir), "l_extendedprice",
      Seq(0.25, 0.5, 0.9, 0.99),
      // sliver threshold well under the sf0.01 row count so the sliver
      // path actually runs at verify scale (not just the final sort)
      exactThreshold = 4096)

  /** q237 — mutual information profile
    * ([[graft.operators.Divergence.mutualInformation]]): how much the
    * order status tells you about the priority (and the marginal
    * entropies to normalize by) — the dependence check run on metadata
    * columns before trusting them as independent features or
    * quasi-identifiers. One row-scale census; every float sum folds
    * over the (a, b)-sorted cell list in order, so the nats replay
    * bit-for-bit (ln parity, q121 precedent). */
  def q237MutualInfo(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.mutualInformation(
        Tables.orders(spark, dir), "o_orderpriority", "o_orderstatus")
      .select($"n", $"n_cells", round($"h_a", 6).as("h_a"),
        round($"h_b", 6).as("h_b"), round($"mi", 6).as("mi"))

  /** q295 — Cramér's V ([[graft.operators.Divergence.cramersV]]):
    * q237's effect-size companion on the same priority×status pair —
    * the normalized [0,1] association that is comparable across tables
    * and cardinalities. Empty-cell-free o²/e identity; the one float
    * sum folds in cell order. */
  def q295CramersV(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.cramersV(
        Tables.orders(spark, dir), "o_orderpriority", "o_orderstatus")
      .select($"n", $"r", $"c", round($"chi2", 6).as("chi2"),
        round($"v", 6).as("v"))

  /** q419 — Adamic–Adar link prediction ([[graft.operators.LinkPred
    * .weightedScores]]): q222's co-purchase candidates re-ranked by
    * degree-weighted evidence — a shared niche part certifies the pair
    * far more than a shared bestseller (1/ln deg per pivot, plus the
    * resource-allocation 1/deg variant). Rank order compares the
    * bit-identical pinned AA folds, tie-broken (u, v). */
  def q419AdamicAdar(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphStages.partCoEdges(spark, dir)
    val scored = graft.operators.LinkPred.weightedScores(edges, "u", "v",
      edgesCanonical = true)
    // TakeOrderedAndProject bounds the sort at 20 rows; the rank window
    // then orders those 20 only (single partition of a constant size)
    scored.orderBy($"adamic_adar".desc, $"u", $"v").limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy($"adamic_adar".desc, $"u", $"v")).cast("long"))
      .select($"rank", $"u".as("part_u"), $"v".as("part_v"), $"cn",
        round($"adamic_adar", 6).as("adamic_adar"),
        round($"resource_alloc", 6).as("resource_alloc"))
  }

  /** q415 — Theil's uncertainty coefficient ([[graft.operators
    * .Divergence.theilsU]]): the DIRECTIONAL association on the q237/
    * q295 priority×status pair — what fraction of status's entropy
    * does knowing priority remove, and vice versa; the asymmetric read
    * V and MI cannot give. Two pinned divisions of the unrounded
    * nats. */
  def q415TheilsU(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Divergence.theilsU(
        Tables.orders(spark, dir), "o_orderpriority", "o_orderstatus")
      .select($"n", $"n_cells", round($"h_a", 6).as("h_a"),
        round($"h_b", 6).as("h_b"), round($"mi", 6).as("mi"),
        round($"u_b_given_a", 6).as("u_b_given_a"),
        round($"u_a_given_b", 6).as("u_a_given_b"))

  /** q233 — functional-dependency discovery
    * ([[graft.operators.Profile.functionalDependencies]]) over four
    * orders columns: which columns determine which — the profiling
    * step that finds accidental keys (o_orderkey → everything) and
    * non-dependencies (o_custkey determines nothing) before anyone
    * joins on a non-key. One census aggregation per ordered pair;
    * `violations` counts determinant values with >1 dependent value,
    * so near-FDs in dirty data stay visible. */
  def q233FdDiscovery(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.functionalDependencies(
      Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus"))

  /** q293 — inclusion-dependency discovery ([[graft.operators.Profile
    * .inclusionDependencies]]): which key columns are real foreign keys?
    * The four TPC-H FK edges (lineitem→orders, orders→customer,
    * customer→nation, nation→region) should hold; the reverse
    * orders→lineitem edge and part→lineitem probe whether every order
    * has lines / every part was ever ordered; events.user_id→customer
    * asks whether the event stream's users are all known customers. */
  def q293InclusionDeps(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir); val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir); val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir); val p = Tables.part(spark, dir)
    val ev = Tables.events(spark, dir)
    graft.operators.Profile.inclusionDependencies(Seq(
      ("lineitem", li, "l_orderkey", "orders", o, "o_orderkey"),
      ("orders", o, "o_custkey", "customer", c, "c_custkey"),
      ("customer", c, "c_nationkey", "nation", n, "n_nationkey"),
      ("nation", n, "n_regionkey", "region", r, "r_regionkey"),
      ("orders", o, "o_orderkey", "lineitem", li, "l_orderkey"),
      ("part", p, "p_partkey", "lineitem", li, "l_partkey"),
      ("events", ev, "user_id", "customer", c, "c_custkey")))
  }

  /** q234 — sortedness audit ([[graft.operators.Profile
    * .sortednessCensus]]): per event type, walk events in event_id
    * (ingestion) order and count adjacent timestamp inversions — the
    * "is this stream still clustered by time" check run before
    * trusting range pruning or an as-of merge path. Integer census,
    * one bounded lag window per type. */
  def q234Sortedness(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.sortednessCensus(
      Tables.events(spark, dir)
        .select($"event_type", $"event_id", unix_millis($"ts").as("ms")),
      "event_type", Seq("event_id"), "ms")

  /** q232 — ROLLUP hierarchy totals: revenue and row counts at
    * (returnflag, linestatus), per-flag subtotal, and grand total in
    * ONE pass — Spark's `rollup` compiles to a single Expand +
    * aggregate (each input row fans to its 3 grouping sets before the
    * one exchange), the cube/drill-down shape a dashboard engine must
    * serve without three scans. Sums are DECIMAL-exact (2-decimal
    * money at scale 2 — order-free at any parallelism); NULL group
    * labels are the subtotal markers on both engines, disambiguated
    * from data NULLs by grouping_id. */
  def q232RollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("rev", $"l_extendedprice".cast("decimal(18,2)"))
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum($"rev").cast("decimal(18,2)").as("revenue"),
        grouping_id().cast("long").as("gid"))

  /** q230 — skyline / Pareto frontier ([[graft.operators.Skyline]]):
    * line items no other item beats on (quantity ↑, price ↓) at once —
    * the two-criteria selection a curation pass keeps when neither
    * score deserves the tiebreak. Two-phase distributed scan
    * (partition-local frontiers, then the skyline-sized candidate
    * union); the oracle avoids the O(n²) dominance check with the 2D
    * census form: per quantity the min price, then a prefix-min over
    * strictly-higher quantities — survivors are rows at their
    * quantity's min price that strictly beat it. Raw double
    * comparisons only, no arithmetic. */
  def q230Skyline(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(($"l_orderkey" * 8 + $"l_linenumber").as("item_id"),
        $"l_quantity", $"l_extendedprice")
    graft.operators.Skyline.skyline(li, "item_id",
      Seq(("l_quantity", true), ("l_extendedprice", false)))
  }

  /** q229 — l-diversity audit ([[graft.operators.Anonymity
    * .lowDiversityClasses]]), k-anonymity's (q203) complement: customer
    * classes keyed by (nation, balance band) whose market segment takes
    * fewer than 5 distinct values — large-but-homogeneous classes leak
    * the shared value even when k-safe. Same cents-shifted integer band
    * as q203 so truncation == floor on both engines; exact distinct
    * counts, class-bounded output. */
  def q229LDiversity(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.customer(spark, dir)
      .withColumn("cents", round($"c_acctbal" * 100).cast("long"))
      .select($"c_nationkey", expr("(cents + 100000) div 100000").as("bal_band"),
        $"c_mktsegment")
    graft.operators.Anonymity.lowDiversityClasses(
      q, Seq("c_nationkey", "bal_band"), "c_mktsegment", l = 5)
  }

  /** q227 — k-core extraction ([[graft.operators.KCore]]) of the
    * Brand#11 co-purchase graph at k=3: the parts that stay after
    * iterative peeling all keep >= 3 surviving co-purchase partners —
    * the density cut that separates the catalog's connected scaffold
    * from drive-by pairings. Peeling converges in 5 rounds at sf0.01
    * (4 at sf0.1); the oracle unrolls 10 — extra rounds are no-ops at
    * the fixpoint, so generous slack costs nothing. All counts are
    * integers; membership is order-free by the k-core's uniqueness. */
  def q227KCore(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphStages.partCoEdges(spark, dir)
    graft.operators.KCore.kCore(edges, "u", "v", k = 3,
      edgesCanonical = true)
      .select($"node".as("part_key"), $"core_deg")
  }

  /** q222 — common-neighbor link prediction
    * ([[graft.operators.LinkPred]]) over the Brand#11 co-purchase
    * graph: parts of one brand are nodes, "appeared in the same order"
    * is an edge, and the top 20 NON-adjacent pairs by shared-neighbor
    * count are the predicted next links. The brand scope keeps the
    * graph sparse (max degree ~16 at sf0.1) so the uncapped wedge
    * census is exact — the operator's `maxPivotDegree` is the 100 TB
    * defense, spec-covered off-fixture. Ranking compares only
    * integers (cn DESC, degree-sum ASC, u, v — Jaccard DESC equals
    * degree-sum ASC within a cn tie), so the order is total and
    * engine-stable; the one double (Jaccard) is a single division of
    * exact integers, rounded 6dp as a hash belt. */
  def q222LinkPred(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphStages.partCoEdges(spark, dir)
    val scored = graft.operators.LinkPred.commonNeighbors(edges, "u", "v",
      edgesCanonical = true)
    // TakeOrderedAndProject bounds the sort at 20 rows; the rank window
    // then orders those 20 only (single partition of a constant size)
    scored.orderBy($"cn".desc, $"degsum".asc, $"u", $"v").limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy($"cn".desc, $"degsum".asc, $"u", $"v")).cast("long"))
      .select($"rank", $"u".as("part_u"), $"v".as("part_v"), $"cn",
        round($"jaccard", 6).as("jaccard"))
  }

  /** q307 — degree assortativity ([[graft.operators.Graph
    * .assortativity]]) of the Brand#11 co-purchase graph (the
    * q222/q227 edge build): do high-degree parts co-occur with other
    * high-degree parts? One number from five exact integer moments. */
  def q307Assortativity(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphStages.partCoEdges(spark, dir)
    graft.operators.Graph.assortativity(edges, "u", "v",
        edgesCanonical = true)
      .select($"n_nodes", $"n_edges", round($"r_assort", 6).as("r_assort"))
  }

  /** q313 — modularity ([[graft.operators.Graph.modularity]]) of the
    * nation partition over the q169 customer–supplier trade graph: do
    * trade links stay inside nations more than a degree-preserving
    * rewiring would? All-integer Q numerator, one division. */
  def q313Modularity(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
      .select($"c".as("u"), ($"s" + 1000000L).as("v"))
    val assign = Tables.customer(spark, dir)
      .select($"c_custkey".as("node"), $"c_nationkey".as("comm"))
      .unionByName(Tables.supplier(spark, dir)
        .select(($"s_suppkey" + 1000000L).as("node"),
          $"s_nationkey".as("comm")))
    graft.operators.Graph.modularity(pairs, "u", "v", assign, "node", "comm")
      .select($"n_communities", $"n_edges", $"n_edges_unassigned",
        round($"modularity", 6).as("modularity"))
  }

  /** q342 — seeded random walks ([[graft.operators.Graph.randomWalks]]):
    * a 3-hop DeepWalk corpus over the symmetrized customer–supplier
    * trade graph — md5-indexed hops over neighbor-sorted adjacency, so
    * the sampled "sentences" are identical on any cluster and the
    * oracle replays every hop. */
  def q342RandomWalks(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
      .select($"c".as("u"), ($"s" + 1000000L).as("v"))
    val both = pairs.unionByName(pairs.select($"v".as("u"), $"u".as("v")))
    graft.operators.Graph.randomWalks(both, "u", "v",
        steps = 3, seed = "graft8", edgesCanonical = true)
      .select($"walk", $"step", $"node")
  }

  /** q346 — Louvain local-move pass ([[graft.operators.Graph
    * .modularityGainPass]]): one synchronous modularity-gain sweep of
    * the nation assignment over the trade graph — exact 4m²-scaled
    * integer gains, stay-put-on-ties, per-node argmax bounded by
    * neighbor communities. The refinement step whose result q313
    * prices. */
  /** q396 — synchronized label propagation ([[graft.operators.Graph
    * .labelPropagation]]): two deterministic LPA rounds over the
    * customer↔supplier trade graph (round 1 collapses every node onto
    * its smallest neighbor, round 2 is the first true majority vote),
    * reported as the final community-size census — the cheap
    * connectivity-to-community step between q96's components and
    * q346's modularity pass; all-integer censuses + argmax, no float
    * surface. */
  def q396LabelProp(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
      .select($"c".as("u"), ($"s" + 1000000L).as("v"))
    graft.operators.Graph.labelPropagation(pairs, "u", "v", rounds = 2,
        edgesCanonical = true)
      .groupBy($"label").agg(count(lit(1)).as("n_members"))
  }

  def q346LouvainPass(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
      .select($"c".as("u"), ($"s" + 1000000L).as("v"))
    val assign = Tables.customer(spark, dir)
      .select($"c_custkey".as("node"), $"c_nationkey".as("comm"))
      .unionByName(Tables.supplier(spark, dir)
        .select(($"s_suppkey" + 1000000L).as("node"),
          $"s_nationkey".as("comm")))
    graft.operators.Graph.modularityGainPass(pairs, "u", "v", assign,
        "node", "comm", edgesCanonical = true)
      .select($"node", $"old_comm", $"new_comm", $"moved", $"gain_num")
  }

  /** q314 — global transitivity ([[graft.operators.Triangles
    * .transitivity]]) of the Brand#11 co-purchase graph: the fraction
    * of open part-pair wedges that close into triangles — 3T/W as one
    * exact division. */
  def q314Transitivity(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphStages.partCoEdges(spark, dir)
    graft.operators.Triangles.transitivity(edges, "u", "v",
      edgesCanonical = true)
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles",
        round($"transitivity", 6).as("transitivity"))
  }

  /** q325 — HLL set algebra ([[graft.operators.Sketches]]): weekend
    * vs weekday distinct users, their register-max union, and the
    * inclusion–exclusion intersection estimate |A∩B| ≈ |A|+|B|−|A∪B|
    * next to the exact truth — the mergeable-sketch answer to "how
    * much do two slices overlap" without a distinct-join. Register
    * terms are exact powers of two, so every sum replays bit-for-bit
    * (the q183 contract); the combination is pinned-shape. */
  def q325HllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val b = 8
    val e = Tables.events(spark, dir).select(
      when(dayofweek(to_date($"ts")).isin(1, 7), "wkend")
        .otherwise("wkday").as("arm"), $"user_id")
    val regs = graft.operators.Sketches.hllRegisters(e, Seq("arm"),
      "user_id", b)
    val union = regs.groupBy($"reg").agg(max($"max_rank").as("max_rank"))
      .select(lit("union").as("arm"), $"reg", $"max_rank")
    val est = graft.operators.Sketches.hllEstimate(
      regs.unionByName(union), Seq("arm"), b)
    val ests = est.agg(
      max(when($"arm" === "wkend", $"hll_estimate")).as("est_a"),
      max(when($"arm" === "wkday", $"hll_estimate")).as("est_b"),
      max(when($"arm" === "union", $"hll_estimate")).as("est_union"))
    val flags = Tables.events(spark, dir).groupBy($"user_id").agg(
      max(when(dayofweek(to_date($"ts")).isin(1, 7), 1L).otherwise(0L))
        .as("wk"),
      max(when(dayofweek(to_date($"ts")).isin(1, 7), 0L).otherwise(1L))
        .as("wd"))
    val truth = flags.agg(
      sum($"wk").as("true_a"), sum($"wd").as("true_b"),
      sum(when($"wk" === 1L && $"wd" === 1L, 1L).otherwise(0L))
        .as("true_intersect"))
    ests.crossJoin(broadcast(truth))
      .select(round($"est_a", 4).as("est_a"),
        round($"est_b", 4).as("est_b"),
        round($"est_union", 4).as("est_union"),
        round($"est_a" + $"est_b" - $"est_union", 4).as("est_intersect"),
        $"true_a", $"true_b", $"true_intersect")
  }

  /** q326 — t-closeness ([[graft.operators.Anonymity.tCloseness]]):
    * per (segment, nation) quasi-class, how far the account-balance
    * band distribution sits from the table's — the attacker-learning
    * bound above q203's k and q229's l; exact-integer violation flag
    * at t = 0.2. */
  def q326TCloseness(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Anonymity.tCloseness(
      Tables.customer(spark, dir).select($"c_mktsegment", $"c_nationkey",
        floor($"c_acctbal" / 1000).cast("long").as("bal_band")),
      Seq("c_mktsegment", "c_nationkey"), "bal_band", tMaxMicros = 200000L)
      .select($"c_mktsegment", $"c_nationkey", $"n",
        round($"t", 6).as("t"), $"violates")

  /** q327 — Laplace count release ([[graft.operators.Anonymity
    * .laplaceCounts]]): the ε=0.5 DP histogram of event types with the
    * md5-seeded deterministic draw — replayable mechanism plumbing,
    * the q64 seeded-kernel discipline applied to privacy. */
  def q327LaplaceCounts(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Anonymity.laplaceCounts(
      Tables.events(spark, dir).select($"event_type"),
      "event_type", epsilonMilli = 500L, seed = "graft8")
      .select($"g".as("event_type"),
        round($"noisy_count", 6).as("noisy_count"), $"scale")

  /** q316 — association rules ([[graft.operators.Association
    * .pairRules]]): top-20 brand pairs by lift over order baskets,
    * with directional confidences — the market-basket census; exact
    * counts, one division per ratio. */
  def q316AssociationRules(spark: SparkSession, dir: String): DataFrame = {
    val bi = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey")
      .join(Tables.part(spark, dir).select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("basket"), $"p_brand".as("item"))
    graft.operators.Association.pairRules(bi, "basket", "item",
        minSupport = 10L, k = 20)
      .select($"rank", $"item_a", $"item_b", $"n_baskets", $"c_a",
        $"c_b", $"c_ab", round($"support", 6).as("support"),
        round($"conf_ab", 6).as("conf_ab"),
        round($"conf_ba", 6).as("conf_ba"), round($"lift", 6).as("lift"))
  }

  /** q277 — Fellegi–Sunter record linkage ([[graft.operators.Linkage]]):
    * every 10th customer re-appears id-shifted with a one-char name tweak
    * and a +0.01 balance drift; candidates block on the 17-char name
    * prefix (sorted-neighborhood blocking — block cardinality grows
    * with the corpus, unlike a country-code block whose ~n/25-row
    * blocks go quadratic; the planted twin differs only at char 18, so
    * it always shares its original's block), three binary comparisons
    * (name within edit distance 2, balance within 0.02, same segment)
    * score through the log2 likelihood-ratio weights. Planted twins
    * agree on all three (score ~13.3 -> match); chance name-neighbors
    * (sequential ids differ by one digit) disagree on balance and sink
    * below the lower bound — the output keeps only match/possible
    * pairs so the result stays bounded by the planted population plus
    * rare balance collisions. */
  def q277RecordLinkage(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      $"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal", $"c_mktsegment")
    val planted = c.where($"c_custkey" % 10 === 0).select(
      ($"c_custkey" + 1000000L).as("c_custkey"),
      concat(substring($"c_name", 1, 17), lit("Q")).as("c_name"),
      $"c_nationkey",
      ($"c_acctbal" + 0.01).as("c_acctbal"),
      $"c_mktsegment")
    val cand = graft.operators.Linkage.blockedCandidates(
      c.unionByName(planted)
        .withColumn("blk", substring($"c_name", 1, 17)),
      "c_custkey", "blk")
    val pairs = cand
      .withColumn("name_agr", levenshtein($"c_name_a", $"c_name_b", 2) >= 0)
      .withColumn("bal_agr", abs($"c_acctbal_a" - $"c_acctbal_b") <= 0.02)
      .withColumn("seg_agr", $"c_mktsegment_a" === $"c_mktsegment_b")
    graft.operators.Linkage.fellegiSunter(pairs, Seq(
        graft.operators.Linkage.Comparison("name_agr", m = 0.95, u = 0.3),
        graft.operators.Linkage.Comparison("bal_agr", m = 0.9, u = 0.001),
        graft.operators.Linkage.Comparison("seg_agr", m = 0.7, u = 0.2)),
      upper = 8.0, lower = 0.5)
      .where($"decision" =!= "nonmatch")
      .select($"id_a", $"id_b", round($"score", 4).as("score"), $"decision")
  }

  /** q341 — Jaro–Winkler best match ([[graft.operators.Linkage
    * .fuzzyBestMatch]]): the q277 planted-twin population rescored with
    * GRADED name agreement on the codegen'd [[graft.functions
    * .FastStringSim]] kernel (DuckDB bit-parity pinned) — per record,
    * the top candidate in its 17-char-prefix block at ≥ 0.95, ties
    * broken (sim desc, id asc). */
  def q341FuzzyBestMatch(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select($"c_custkey".as("id"), $"c_name".as("name"))
    val planted = Tables.customer(spark, dir)
      .where($"c_custkey" % 10 === 0)
      .select(($"c_custkey" + 1000000L).as("id"),
        concat(substring($"c_name", 1, 17), lit("Q")).as("name"))
    val rec = c.unionByName(planted)
      .withColumn("blk", substring($"name", 1, 17))
    graft.operators.Linkage.fuzzyBestMatch(rec, "id", "blk", "name", 0.95)
      .select($"id_a", $"id_b", $"name_a", $"name_b",
        round($"jw", 6).as("jw"))
  }

  /** q408 — k-truss edges ([[graft.operators.KCore.kTruss]]) of the
    * q227 Brand#11 co-purchase graph at k=3: the surviving edges each
    * sit in ≥ 1 triangle of the survivor subgraph — the edge-cohesion
    * cut stricter than q227's node k-core (every k-truss edge lives
    * inside the (k−1)-core). k=3 keeps the truss non-empty at every
    * test SF (9/24/386 edges at sf0.001/0.01/0.1, fixpoint in 2 peel
    * rounds) — k=4 is empty below sf0.1 on this sparse co-purchase
    * graph. Per round the support census rides the q196 degree-ordered
    * intersection (O(√2m) wedge cap); peeling is a batch fixpoint, so
    * membership is order-free. The oracle unrolls 12 rounds of the
    * wedge-join replay — extra rounds are no-ops at the fixpoint.
    * All-integer output: (u, v, sup). */
  def q408KTruss(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphStages.partCoEdges(spark, dir)
    graft.operators.KCore.kTruss(edges, "u", "v", k = 3,
      edgesCanonical = true)
  }

  /** q413 — leave-one-group-out slope influence ([[graft.operators
    * .Regression.logoInfluence]]): which ship MONTH drives the
    * quantity→price slope — per month cohort, the OLS slope refit
    * WITHOUT that cohort's rows via global-minus-group moment
    * subtraction (one census, zero rescans). The cohort-influence
    * audit a fleet-wide regression needs before trusting the
    * coefficient. */
  def q413LogoInfluence(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Regression.logoInfluence(
      Tables.lineitem(spark, dir).select(
        month($"l_shipdate").cast("long").as("ship_month"),
        $"l_quantity".cast("long").as("qty"),
        round($"l_extendedprice" * 100).cast("long").as("price_cents")),
      "ship_month", "qty", "price_cents")
      .select($"g".as("ship_month"), $"n_group",
        round($"slope_full", 6).as("slope_full"),
        round($"slope_without", 6).as("slope_without"),
        round($"delta", 6).as("delta"))

  /** q439 — true Damerau–Levenshtein ([[graft.functions.FastStringSim
    * .damerauLevenshtein]], a codegen'd Lowrance–Wagner kernel): every
    * 7th customer name with its last two characters transposed — the
    * adjacent-swap typo costs 1 under DL where plain Levenshtein
    * (shown alongside) charges 2, the distinction that halves the
    * false-negative rate on keyboard-error record linkage. */
  def q439Damerau(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select($"c_custkey".as("id"), $"c_name".as("name"))
    val planted = c.where($"id" % 7 === 0)
      .select($"id", concat(substring($"name", 1, 16),
        substring($"name", 18, 1), substring($"name", 17, 1)).as("typo"))
    c.join(planted, Seq("id"))
      .select($"id",
        graft.functions.FastStringSim.damerauLevenshtein($"name", $"typo")
          .as("dl"),
        levenshtein($"name", $"typo").cast("long").as("lev"))
  }

  /** Shared q443/q445 edge base: the q419 Brand#11 co-purchase pairs
    * (u < v, distinct). */
  private def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.part(spark, dir).where($"p_brand" === "Brand#11")
      .select($"p_partkey")
    val op = Tables.lineitem(spark, dir)
      .join(pts, $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    op.select($"ok", $"pk".as("u"))
      .join(op.select($"ok", $"pk".as("v")), "ok")
      .where($"u" < $"v")
      .select($"u", $"v").distinct()
  }

  /** q443 — truncated Katz centrality ([[graft.operators.Graph
    * .katz]]): 4-hop attenuated walk counts (α = 1/5) into each
    * Brand#11 part over the symmetric co-purchase graph — the
    * hub-rewarding influence score between degree and PageRank, on
    * the q169 integer-mass discipline. */
  def q443Katz(spark: SparkSession, dir: String): DataFrame = {
    val e = coPurchaseEdges(spark, dir)
    val both = e.unionByName(e.select($"v".as("u"), $"u".as("v")))
    val scored = graft.operators.Graph.katz(both, "u", "v",
      iterations = 4, alphaDen = 5L)
    scored.orderBy($"katz".desc, $"node").limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy($"katz".desc, $"node")).cast("long"))
      .select($"rank", $"node".as("part"), round($"katz", 6).as("katz"))
  }

  /** q444 — edge reciprocity: of the DIRECTED "part a precedes part b
    * within an order" relations (linenumber order), what share also
    * occur reversed in some other order — the mutual-relation rate,
    * one reversed-key equi self-join (never a cross product). */
  def q444Reciprocity(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.part(spark, dir).where($"p_brand" === "Brand#11")
      .select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(pts, $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"),
        $"l_linenumber".as("ln"))
    val e = li.select($"ok", $"pk".as("a"), $"ln".as("la"))
      .join(li.select($"ok", $"pk".as("b"), $"ln".as("lb")), "ok")
      .where($"la" < $"lb" && $"a" =!= $"b")
      .select($"a", $"b").distinct()
    val rec = e.join(e.select($"b".as("a"), $"a".as("b")), Seq("a", "b"),
      "left_semi")
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(rec.agg(count(lit(1)).as("n_reciprocal"))))
      .select($"n_edges", $"n_reciprocal",
        round($"n_reciprocal".cast("double") /
          $"n_edges".cast("double"), 6).as("reciprocity"))
  }

  /** q447 — per-community conductance ([[graft.operators.Graph
    * .conductance]]): the q313 nation partition scored community BY
    * community — which nations are real trade clusters (low cut
    * share) and which labels slice through dense structure; exact
    * counts, one division per community. */
  def q447Conductance(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
      .select($"c".as("u"), ($"s" + 1000000L).as("v"))
    val assign = Tables.customer(spark, dir)
      .select($"c_custkey".as("node"), $"c_nationkey".as("comm"))
      .unionByName(Tables.supplier(spark, dir)
        .select(($"s_suppkey" + 1000000L).as("node"),
          $"s_nationkey".as("comm")))
    graft.operators.Graph.conductance(pairs, "u", "v", assign,
        "node", "comm", edgesCanonical = true)
      .select($"community", $"vol", $"n_internal", $"cut",
        round($"conductance", 6).as("conductance"),
        $"n_edges_unassigned")
  }

  /** q451 — Herfindahl concentration ([[graft.operators.WeightedStats
    * .herfindahl]]): per supplier nation, how concentrated is revenue
    * across that nation's suppliers — HHI with the k-corrected
    * normalization, exact share arithmetic (one division). */
  def q451Herfindahl(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_nationkey".as("nation"), $"l_suppkey",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
    graft.operators.WeightedStats.herfindahl(rev, "nation",
        "l_suppkey", "cents")
      .select($"sc".as("nation"), $"k_units", $"k_dropped", $"total",
        round($"hhi", 6).as("hhi"), round($"hhi_norm", 6).as("hhi_norm"))
  }

  /** q445 — rich-club coefficient: at each degree threshold k, how
    * densely do the over-k-degree parts of the co-purchase graph link
    * among THEMSELVES — φ(k) = 2·E_k/(N_k(N_k−1)), the hub-cartel
    * detector; degrees broadcast, thresholds exploded, all census. */
  def q445RichClub(spark: SparkSession, dir: String): DataFrame = {
    val e = coPurchaseEdges(spark, dir)
    val deg = e.select($"u".as("node"))
      .unionByName(e.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val ks = array(Seq(2L, 4L, 8L, 16L, 32L).map(lit): _*)
    val nodeK = deg.select(explode(ks).as("k"), $"d")
      .where($"d" > $"k")
      .groupBy($"k").agg(count(lit(1)).as("n_nodes"))
    val edgeK = e
      .join(broadcast(deg.select($"node".as("u"), $"d".as("du"))), "u")
      .join(broadcast(deg.select($"node".as("v"), $"d".as("dv"))), "v")
      .select(explode(ks).as("k"), $"du", $"dv")
      .where($"du" > $"k" && $"dv" > $"k")
      .groupBy($"k").agg(count(lit(1)).as("n_edges_rich"))
    nodeK.join(edgeK, Seq("k"), "left")
      .select($"k", $"n_nodes",
        coalesce($"n_edges_rich", lit(0L)).as("n_edges_rich"),
        when($"n_nodes" > 1L,
          round(lit(2.0) * coalesce($"n_edges_rich", lit(0L))
            .cast("double") /
            ($"n_nodes".cast("double") * ($"n_nodes" - 1L)
              .cast("double")), 6)).as("phi"))
  }

  /** q456 — Moran's I + Geary's C ([[graft.operators.Graph
    * .moranGeary]]): is NATION clustered in the q169 customer–supplier
    * transaction graph — do trading partners share a nationkey more
    * than chance? The graph-value autocorrelation read next to q447's
    * per-community conductance; exact n-scaled integer arithmetic,
    * one pinned double shape per statistic. */
  def q456MoranGeary(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
      .select($"c".as("u"), ($"s" + 1000000L).as("v"))
    val vals = Tables.customer(spark, dir)
      .select($"c_custkey".as("node"), $"c_nationkey".as("x"))
      .unionByName(Tables.supplier(spark, dir)
        .select(($"s_suppkey" + 1000000L).as("node"),
          $"s_nationkey".as("x")))
    graft.operators.Graph.moranGeary(pairs, "u", "v", vals, "node", "x",
        edgesCanonical = true)
      .select($"n_nodes", $"n_edges", $"w", $"n_edges_dropped",
        round($"moran_i", 6).as("moran_i"),
        round($"geary_c", 6).as("geary_c"), round($"e_i", 6).as("e_i"))
  }

  /** q457 — harmonic centrality from HyperANF ([[graft.operators
    * .Graph.harmonicFromAnf]]): the Boldi–Vigna payoff on q364's
    * sketches — Σ ball-increments/h reads centrality off the
    * neighborhood function with no all-pairs BFS; estimates fold in
    * hop order from the IEEE-exact ball estimates, truncated at the
    * 4-hop horizon. Reads the [[graft.operators.Graph.AnfStage]]
    * materialized sketch (bit-identical to a fresh run — the oracle
    * stays an independent full replay): on a cluster the ANF table is
    * written once per graph snapshot, and q364/q457/q459 recomputing
    * the same 4-hop register loop three times was the r11 board's
    * biggest redundant cost (~15 s combined at sf0.1). */
  def q457Harmonic(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.harmonicFromAnf(tradeAnfSketch(spark, dir))
      .select($"node", round($"harmonic", 4).as("harmonic"))

  /** The q169 customer–supplier trade graph's 4-hop HyperANF sketch,
    * materialized once per session via [[graft.operators.Graph
    * .AnfStage]] — the shared stage q457/q459 read. q364 itself keeps
    * calling [[graft.operators.Graph.hyperAnf]] directly: it IS the
    * sketch-build query, and its bench number must keep owning the
    * build cost rather than reading a warm memo. */
  private def tradeAnfSketch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.AnfStage.sketch(spark, s"trade|$dir",
      maxHops = 4, b = 6, edgesCanonical = true) {
      val pairs = GraphStages.tradePairs(spark, dir)
      pairs.select($"c".as("src"), ($"s" + 1000000L).as("dst"))
        .unionByName(pairs.select(($"s" + 1000000L).as("src"),
          $"c".as("dst")))
    }

  /** q463 — k-truss peel ([[graft.operators.KCore.kTrussPeel]]): two
    * support-peel rounds at k=3 over the Brand#11 co-purchase graph
    * (q314's edges) — every surviving edge sits in a triangle of the
    * peeled subgraph, the "socially corroborated" cut a degree filter
    * (k-core) can't express. Fixed rounds so the oracle unrolls the
    * peel CTE-for-CTE; final support recomputed on the survivors. */
  def q463KTruss(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphStages.partCoEdges(spark, dir)
    graft.operators.KCore.kTrussPeel(edges, "u", "v", k = 3, rounds = 2,
      edgesCanonical = true)
      .select($"u", $"v", $"sup")
  }

  /** q467 — sampled truncated betweenness ([[graft.operators.Graph
    * .betweennessSampled]]): who BROKERS the q169 customer–supplier
    * trade graph — 4 smallest-id pivots, 3-hop horizon, quantized
    * Brandes dependencies (round-to-12-decimals per contribution,
    * exact decimal sums — bit-stable at any partitioning). PageRank
    * scores flow, Katz scores walks; this scores geodesic brokerage,
    * the third centrality lens and the one degree can't fake. The
    * oracle replays the BFS hop-for-hop and the dependency walk
    * level-for-level. */
  def q467Betweenness(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradePairs(spark, dir)
    val edges = pairs.select($"c".as("src"), ($"s" + 1000000L).as("dst"))
      .unionByName(pairs.select(($"s" + 1000000L).as("src"), $"c".as("dst")))
    graft.operators.Graph.betweennessSampled(edges, "src", "dst",
        nSources = 4, maxDepth = 3)
      .where($"betweenness" > 0.0)
      .select($"node",
        when($"node" >= 1000000L, "supplier").otherwise("customer").as("kind"),
        round($"betweenness", 4).as("betweenness"), $"n_sources")
  }

  /** q470 — multi-source weighted shortest paths ([[graft.operators
    * .Graph.shortestPaths]]): cheapest-cost reach from the 4
    * smallest-id customers over the trade graph, edge cost
    * 1 + co-order-count mod 7 (a frequent pair is NOT automatically
    * the cheapest hop — the mod keeps costs non-monotone in volume,
    * so multi-hop routes genuinely beat direct edges). Synchronized
    * Bellman–Ford: exact integer relax rounds the oracle unrolls
    * CTE-for-CTE with spare no-op rounds at the fixpoint. The engine
    * runs maxRounds = oracle rounds + 1 (13 vs 12): shortestPaths
    * needs one extra no-op round to OBSERVE convergence, so 12 would
    * silently tolerate only 11 productive rounds — a diameter-12
    * graph would pass the oracle yet throw in the engine. */
  def q470ShortestPaths(spark: SparkSession, dir: String): DataFrame = {
    val pairs = GraphStages.tradeCounts(spark, dir)
      .select($"c", $"s", (lit(1L) + $"cnt" % 7L).as("w"))
    val edges = pairs.select($"c".as("src"), ($"s" + 1000000L).as("dst"), $"w")
      .unionByName(pairs.select(($"s" + 1000000L).as("src"),
        $"c".as("dst"), $"w"))
    val seeds = Tables.customer(spark, dir)
      .orderBy($"c_custkey").limit(4).select($"c_custkey".as("seed"))
    graft.operators.Graph.shortestPaths(edges, "src", "dst", "w",
        seeds, "seed", maxRounds = 13, edgesCanonical = true)
      .select($"s".as("seed"), $"node",
        when($"node" >= 1000000L, "supplier").otherwise("customer").as("kind"),
        $"dist")
  }

  /** q466 — truss decomposition ([[graft.operators.KCore
    * .trussDecomposition]]): every Brand#11 co-purchase edge's
    * trussness — the per-edge cohesion SCORE where q408/q463 are one
    * cut each (coreness : k-core :: trussness : k-truss). The
    * ascending sweep peels k = 3, 4, … over monotonically shrinking
    * survivor sets; on this graph the score tops out at 4 (the 24
    * sf0.1 edges whose triangles interlock pairwise). The oracle
    * unrolls three levels of the peel CTE-for-CTE with no-op spare
    * rounds at each fixpoint. */
  def q466TrussDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphStages.partCoEdges(spark, dir)
    graft.operators.KCore.trussDecomposition(edges, "u", "v",
      edgesCanonical = true)
      .select($"u", $"v", $"trussness")
  }

  /** q462 — Smith–Waterman local alignment ([[graft.functions
    * .FastStringSim.smithWatermanValue]], codegen Expression): each
    * planted record's ORIGINAL name scored against a typo'd copy
    * buried in flanking junk — the fuzzy-containment read where
    * Levenshtein (quoted next to it) charges for every flank char.
    * Match +2 / mismatch −1 / gap −1 pinned; the oracle replays the
    * SAME recurrence by anti-diagonals (no within-row dependency, the
    * DuckDB list-fold constraint). */
  def q462SmithWaterman(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select($"c_custkey".as("id"), $"c_name".as("name"))
    val p = c.where($"id" % 7 === 0)
      .select($"id", concat(lit("xx#"),
        concat(substring($"name", 1, 16), substring($"name", 18, 1),
          substring($"name", 17, 1)),
        lit("#zz")).as("hay"))
    c.join(p, Seq("id"))
      .select($"id",
        graft.functions.FastStringSim.smithWaterman($"name", $"hay")
          .as("sw"),
        levenshtein($"name", $"hay").cast("long").as("lev"))
  }

  /** q459 — effective diameter from HyperANF ([[graft.operators.Graph
    * .effectiveDiameterFromAnf]]): the interpolated hop distance
    * covering 90% of reachable pairs on q364's graph — the one-number
    * "how small is this world" read; per-node estimates quantize to
    * 1e-4 decimals before the node sum, so every P(h) is exact at any
    * partitioning. Reads the [[graft.operators.Graph.AnfStage]]
    * materialized sketch like q457 (the shared-sketch stage; oracle
    * unchanged — an independent full replay). */
  def q459EffDiameter(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.effectiveDiameterFromAnf(
        tradeAnfSketch(spark, dir), quantile = 0.9)
      .select($"n_nodes", round($"p_final", 4).as("p_final"),
        round($"eff_diameter", 6).as("eff_diameter"))
}
