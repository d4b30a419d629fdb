package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT order statistics without a global sort — the 100 TB quantile
  * path. `percentile()` / `ORDER BY ... OFFSET k` sort (or at least
  * range-exchange) the full column: at 10^12 rows that is the job's
  * dominant shuffle, and sketches (GK, [[Sketches.approxQuantiles]])
  * only bound the rank error. Histogram bisection gets the exact k-th
  * smallest in O(log_bins(range)) SCANS with O(bins) shuffle bytes per
  * scan and nothing else:
  *
  *  1. one aggregation pass histograms the candidate bracket into
  *     `bins` equal-width bins (per-bin count + min + max — ~bins rows
  *     to the driver, never row data);
  *  2. the running rank locates the bin holding the k-th value; that
  *     bin's OBSERVED [min, max] becomes the next bracket (observed
  *     bounds, so every pass strictly shrinks even with outliers);
  *  3. when the bracket's candidate count falls under `exactThreshold`
  *     (or collapses to a single value), a final sort of just that
  *     sliver — filter-pruned at the scan, thousands of rows, one
  *     partition — yields the element.
  *
  * Bin membership is decided by ONE fixed floor expression evaluated in
  * the plan, and the next round filters on that same expression — the
  * float boundary can never disagree with itself, so no row is lost or
  * double-counted at bin edges. Convergence: each pass either shrinks
  * the bracket's count or its [min, max]; `maxPasses` aborts loudly on
  * the theoretical worst case (pathological value clustering below
  * bin resolution) rather than looping.
  */
object Quantiles {

  /** The exact `rank`-th smallest value (1-indexed) of `valueCol`.
    * Values must be non-null doubles; rank in [1, n]. */
  def exactKth(df: DataFrame, valueCol: String, rank: Long,
      bins: Int = 1024, exactThreshold: Long = 65536,
      maxPasses: Int = 40): Double = {
    require(rank >= 1, s"rank=$rank")
    val v = col(valueCol).cast("double")
    val base = df.select(v.as("v")).where(col("v").isNotNull)

    // bracket state: predicate + residual rank inside it
    var pred: Column = lit(true)
    var residual = rank
    var passes = 0
    while (passes < maxPasses) {
      passes += 1
      val inB = base.where(pred)
      val stats = inB.agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi")).head()
      val n = stats.getAs[Long]("n")
      require(n >= residual, s"rank $rank exceeds bracket population $n")
      val (lo, hi) = (stats.getAs[Double]("lo"), stats.getAs[Double]("hi"))
      if (lo == hi) return lo // bracket collapsed to one value
      if (n <= exactThreshold) {
        // final exact step: sort only the sliver (filter pruned at scan)
        return inB.orderBy(col("v"))
          .limit(residual.toInt)
          .orderBy(col("v").desc).limit(1)
          .head().getAs[Double]("v")
      }
      // one histogram pass: the SAME floor expression both assigns bins
      // here and filters the next round, so edges cannot disagree
      val width = (hi - lo) / bins
      val binExpr = least(greatest(
        floor((col("v") - lit(lo)) / lit(width)), lit(0L)), lit(bins - 1L))
      val hist = inB.groupBy(binExpr.as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("c"))
        .sortBy(_._1)
      var acc = 0L
      var chosen = -1L
      hist.takeWhile { case (b, c) =>
        if (residual <= acc + c && chosen < 0) { chosen = b; false }
        else { acc += c; true }
      }
      require(chosen >= 0, "histogram lost the rank — impossible by construction")
      residual -= acc
      pred = pred && (least(greatest(
        floor((col("v") - lit(lo)) / lit(width)), lit(0L)), lit(bins - 1L)) === lit(chosen))
    }
    throw new IllegalStateException(
      s"exactKth did not isolate rank $rank in $maxPasses passes " +
        "(values cluster below bin resolution — raise bins or exactThreshold)")
  }

  /** DuckDB `quantile_disc` semantics over a set of probabilities: the
    * ceil(p·n)-th smallest per p. One count pass + a bisection per p. */
  def quantilesDisc(df: DataFrame, valueCol: String, ps: Seq[Double],
      bins: Int = 1024, exactThreshold: Long = 65536): DataFrame = {
    import df.sparkSession.implicits._
    val base = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val n = base.count()
    require(n > 0, "empty input")
    ps.map { p =>
      val k = math.ceil(p * n).toLong.max(1L).min(n)
      (p, k, exactKth(base, "v", k, bins, exactThreshold))
    }.toDF("p", "k", "value")
  }

  /** Per-GROUP exact discrete quantiles (`quantile_disc` rule: the
    * ceil(p·n)-th smallest) from a (group, value) census — the
    * latency-dashboard aggregation (p50/p95 per endpoint per hour)
    * with no per-group sort and no value buffering: the cumulative
    * window walks DISTINCT values per group, every probability rides
    * the same pass via an explode, and the answer per (group, p) is
    * min(value | cum ≥ k) — one census shuffle + one window + one
    * aggregation regardless of |ps|.
    *
    * The census is bounded by value CARDINALITY per group — quantize
    * continuous measures first (cents, ms buckets; the [[Eval]]
    * discretize-your-scores rule). k = clamp(ceil(p·n), 1, n) in IEEE
    * double, the exact arithmetic DuckDB's quantile_disc replays. */
  def groupedQuantilesDisc(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "ps must be non-empty")
    val g = groupCols.map(col)
    val census = df.where(col(valueCol).isNotNull)
      .groupBy((g :+ col(valueCol)): _*).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy(g: _*)
    census
      .select((g :+ col(valueCol) :+ sum(col("cnt")).over(w).as("cum") :+
        sum(col("cnt")).over(wn).as("n")): _*)
      .withColumn("p", explode(array(ps.map(lit(_)): _*)))
      .withColumn("k",
        greatest(least(ceil(col("p") * col("n")), col("n")), lit(1L))
          .cast("long"))
      .where(col("cum") >= col("k"))
      .groupBy((g :+ col("p")): _*)
      .agg(min(col(valueCol)).as("value"))
  }

  /** The (key, value, count) census [[tdigest]] reduces to — a PURE
    * aggregation, so the same function is the streaming twin's state
    * ([[graft.streaming.Streams.tdigestCensusStream]]): one long count
    * per distinct (key, value), state bounded by the value domain,
    * never row count. Output: (k, x, c). */
  def tdigestCensus(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame =
    df.select(col(keyCol).as("k"), col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull)
      .groupBy(col("k"), col("x"))
      .agg(count(lit(1)).as("c"))

  /** Deterministic t-digest-style quantile sketch (Dunning's merging
    * digest made integer-exact, fold-free and replayable): per key each
    * VALUE RUN of the census is binned by its starting rank into a
    * tail-tapered capacity ladder — centroid i holds
    * cap_i = ceil(n · min(i+1, δ−i) / W) ranks, W = Σ_{i<δ} min(i+1,
    * δ−i) — so both distribution ends get small, high-resolution
    * centroids and the middle gets wide ones, the shape t-digest's asin
    * scale approximates; the linear taper keeps every capacity an exact
    * integer (no libm anywhere, so a cross-engine oracle replays it
    * bit-for-bit). A run binds WHOLLY to the centroid its first rank
    * lands in (runs never split — the classic repeated-value behavior;
    * a giant run simply overflows its bin and later runs skip ahead on
    * the ladder), and Σ cap_i ≥ n by the per-term ceil, so the bin
    * index needs no clamp. Per centroid the weight is an exact long and
    * the value sum an exact decimal(38,0); mean and the midpoint
    * quantile position q_mid = (2·cum − w) / 2n are the ONLY doubles,
    * one pinned division each.
    *
    * Scale shape: FULLY distributed — one census shuffle, one keyed
    * cumulative window at census grain, a δ²-bounded ladder lookup per
    * row (codegen HOFs, δ is a small constant), one keyed aggregation
    * to centroid grain. No collect_list, no sequential fold: the
    * rank-binning rule makes every row's centroid independently
    * computable from its prefix rank, which is what lets the sketch
    * build scale to any key size. Output: (k, n, ci, w, mean, q_mid) —
    * ≤ δ rows per key, the persistable sketch a 100 TB pipeline writes
    * once and queries for any quantile. */
  def tdigestFromCensus(census: DataFrame, delta: Int): DataFrame = {
    require(delta >= 4, s"delta must be >= 4: $delta")
    val W = (0 until delta).map(i => math.min(i + 1, delta - i).toLong).sum
    val wv = Window.partitionBy(col("k")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wk = Window.partitionBy(col("k"))
    val ranked = census
      .withColumn("cum", sum(col("c")).over(wv))
      .withColumn("n", sum(col("c")).over(wk))
    // ci = #{j : P_j <= start}, P_j = Σ_{i<=j} cap_i — the ladder
    // prefix is re-summed per probe (δ² ops, δ a small constant)
    val capSql = s"(n * least(CAST(i + 1 AS BIGINT), " +
      s"CAST($delta - i AS BIGINT)) + ${W - 1}) div $W"
    val ciExpr =
      s"""size(filter(sequence(0, ${delta - 1}), j ->
         |  aggregate(sequence(0, j), 0L, (s, i) -> s + ($capSql))
         |    <= cum - c))""".stripMargin
    val wOrd = Window.partitionBy(col("k")).orderBy(col("ci"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked
      .select(col("k"), col("n"), col("c"),
        expr(ciExpr).cast("long").as("ci"),
        (col("x").cast("decimal(38,0)") * col("c"))
          .cast("decimal(38,0)").as("xc"))
      .groupBy(col("k"), col("ci"))
      .agg(max(col("n")).as("n"), sum(col("c")).as("w"),
        sum(col("xc")).cast("decimal(38,0)").as("s"))
      .withColumn("cum", sum(col("w")).over(wOrd))
      .select(col("k"), col("n"), col("ci"), col("w"),
        round(col("s").cast("double") / col("w").cast("double"), 6)
          .as("mean"),
        round((lit(2L) * col("cum") - col("w")).cast("double") /
          (lit(2L) * col("n")).cast("double"), 6).as("q_mid"))
  }

  /** [[tdigestFromCensus]] over raw rows. */
  def tdigest(df: DataFrame, keyCol: String, valueCol: String,
      delta: Int): DataFrame =
    tdigestFromCensus(tdigestCensus(df, keyCol, valueCol), delta)
      .withColumnRenamed("k", keyCol)
}
