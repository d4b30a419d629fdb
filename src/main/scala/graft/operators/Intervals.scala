package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics without inequality joins: bucketed overlap
  * self-join and two-phase sweep-line concurrency. Spark's only native
  * executions of `a.s < b.e AND b.s < a.e` are BroadcastNestedLoopJoin
  * or a cartesian product — both all-pairs, both scale killers. The
  * standard fix is binning: explode each interval to the fixed-width
  * time buckets it touches, hash-join on (key, bucket), and keep a
  * pair only in the bucket containing the later start, so pairs
  * spanning several shared buckets count exactly once.
  *
  * All arithmetic is integer (epoch units and +1/-1 deltas), so every
  * result is bit-stable at any parallelism and replays exactly in a
  * reference engine as a plain inequality join.
  */
object Intervals {

  /** Overlapping pairs of half-open intervals [s, e) sharing `keyCol`.
    * Input columns: `keyCol`, `idCol` (unique within key), `startCol`,
    * `endCol` (integral epoch units, e > s). `bucketWidth` should be
    * >= the typical interval length so most intervals touch 1-2
    * buckets (an interval spanning B buckets is replicated B times).
    * Output: (key, id_a, id_b, overlap) with id_a < id_b, overlap > 0
    * in the same units. */
  def overlapPairs(df: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    // `div` (integer division), not floor(double /): epoch values sit
    // near 2^50 and a double quotient can round up across the boundary
    val iv = df.select(col(keyCol).as("k"), col(idCol).as("id"),
      col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
    val buck = iv.select(col("k"), col("id"), col("s"), col("e"),
      explode(sequence(expr(s"s div $bucketWidth"), expr(s"e div $bucketWidth"))).as("bkt"))
    val a = buck.select(col("k"), col("bkt"), col("id").as("id_a"),
      col("s").as("sa"), col("e").as("ea"))
    val b = buck.select(col("k"), col("bkt"), col("id").as("id_b"),
      col("s").as("sb"), col("e").as("eb"))
    a.join(b, Seq("k", "bkt"))
      .where(col("id_a") < col("id_b") &&
        col("sa") < col("eb") && col("sb") < col("ea") &&
        col("bkt") === expr(s"greatest(sa, sb) div $bucketWidth"))
      .select(col("k").as(keyCol), col("id_a"), col("id_b"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb"))).as("overlap"))
  }

  /** Peak number of simultaneously-open intervals per `keyCol`, by a
    * TWO-PHASE sweep: phase 1 runs the +1/-1 prefix sum inside
    * (key, slice) windows (slice = start `div` sliceWidth — bounded
    * partitions, parallel at any data size); phase 2 rolls slice
    * totals into per-slice carry-ins with a window over the tiny
    * (key, slice) table. A single per-key window would serialize each
    * key's whole history through one task — the classic sweep-line
    * scale trap. Ends sort before starts at equal timestamps
    * (half-open semantics); equal deltas commute, so the prefix-sum
    * MAX is order-independent beyond (t, delta) — no tiebreak column
    * needed for bit-stability. Output: (key, n_intervals, peak). */
  def sweepPeak(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, sliceWidth: Long): DataFrame = {
    val iv = df.select(col(keyCol).as("k"),
      col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
    val bounds = iv.select(col("k"), col("s").as("t"), lit(1).as("d"))
      .unionByName(iv.select(col("k"), col("e").as("t"), lit(-1).as("d")))
      .withColumn("slice", expr(s"t div $sliceWidth"))
    val wLocal = Window.partitionBy(col("k"), col("slice"))
      .orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bounds.withColumn("run", sum(col("d")).over(wLocal))
      .groupBy(col("k"), col("slice"))
      .agg(max(col("run")).as("local_peak"), sum(col("d")).as("slice_total"))
    val wCarry = Window.partitionBy(col("k")).orderBy(col("slice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val carried = local.withColumn("carry",
      coalesce(sum(col("slice_total")).over(wCarry), lit(0L)))
    val peaks = carried.groupBy(col("k"))
      .agg(max(col("carry") + col("local_peak")).as("peak"))
    val counts = iv.groupBy(col("k")).agg(count(lit(1)).as("n_intervals"))
    counts.join(peaks, "k")
      .select(col("k").as(keyCol), col("n_intervals"), col("peak"))
  }

  /** Rolling burst rate: per key, the MAXIMUM number of events inside
    * any trailing `windowMs` window — the rate-limit / abuse audit
    * ("did any user ever exceed N requests per minute", answered
    * exactly, not per fixed bucket — a fixed-bucket census misses
    * bursts straddling a boundary). Top `topK` keys returned by
    * (peak desc, key asc) — all-integer ordering.
    *
    * Scale shape: one key-partitioned RANGE-frame window pass (each
    * row counts its trailing window — frame bounds are event-time
    * integers, so ties at the same ms all see the same count) and a
    * per-key max; the cut is a bounded TakeOrdered. Output: (rank,
    * key, n_events, peak_rate). */
  def rollingBurst(df: DataFrame, keyCol: String, msCol: String,
      windowMs: Long, topK: Int): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(msCol).cast("long"))
      .rangeBetween(-(windowMs - 1), 0)
    val peaks = df
      .withColumn("__r", count(lit(1)).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), max(col("__r")).as("peak_rate"))
    peaks.orderBy(col("peak_rate").desc, col(keyCol)).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("peak_rate").desc, col(keyCol))).cast("long"))
      .select(col("rank"), col(keyCol), col("n_events"), col("peak_rate"))
  }

  /** Burstiness coefficient (Goh & Barabási 2008) per key over the
    * inter-event gap distribution: B = (σ − μ)/(σ + μ) ∈ (−1, 1) —
    * B → −1 metronome-regular, B ≈ 0 Poisson, B → 1 extreme bursts.
    * The one-number temporal fingerprint of a user/feed that
    * [[rollingBurst]]'s windowed peaks can't give: is this key's WHOLE
    * cadence bursty, or just one window? Bot/scraper cadences sit near
    * −1; organic humans are positive — a cheap behavioral filter
    * before rate data enters training.
    *
    * Exactness: gaps are exact integer ms; μ and σ² are pinned ratios
    * of exact decimal sums (sample variance, the Welch shape); B is
    * one pinned double expression. Keys with < 3 events (< 2 gaps)
    * emit null B — loud. Scale shape: one per-key ordered window pass
    * for the gap, one moment census. Output: (key, n_gaps,
    * mean_gap_ms, b). */
  def burstiness(df: DataFrame, keyCol: String, msCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ms"))
    val gaps = df.select(col(keyCol), col(msCol).cast("long").as("__ms"))
      .withColumn("__g", col("__ms") - lag(col("__ms"), 1).over(w))
      .where(col("__g").isNotNull)
    val g = gaps.groupBy(col(keyCol)).agg(count(lit(1)).as("n_gaps"),
      sum(col("__g").cast(dec)).cast(dec).as("__s1"),
      sum((col("__g").cast(dec) * col("__g").cast(dec)).cast(dec))
        .cast(dec).as("__s2"))
    burstinessFromCensus(g, keyCol, "n_gaps", "__s1", "__s2")
  }

  /** [[burstiness]] on a pre-aggregated per-key gap-moment census —
    * the seam the streaming twin plugs into ([[graft.streaming.Streams
    * .gapCensusStream]] maintains exactly (last_ms, n, Σg, Σg²) as its
    * whole per-key state; the welchTFromCensus pattern). Moments are
    * exact decimals, so streamed and batch censuses are IDENTICAL
    * after any prefix and B follows. */
  def burstinessFromCensus(census: DataFrame, keyCol: String,
      nCol: String, s1Col: String, s2Col: String): DataFrame = {
    val dec = "decimal(38,0)"
    val g = census.select(col(keyCol), col(nCol).cast("long").as("n_gaps"),
      col(s1Col).cast(dec).as("__s1"), col(s2Col).cast(dec).as("__s2"))
    val nD = col("n_gaps").cast(dec)
    val mu = col("__s1").cast("double") / col("n_gaps").cast("double")
    val sd = sqrt((nD * col("__s2") - col("__s1") * col("__s1")).cast(dec)
      .cast("double") / (nD * (nD - 1)).cast(dec).cast("double"))
    g.withColumn("__mu", mu).withColumn("__sd", when(col("n_gaps") > 1L, sd))
      .select(col(keyCol), col("n_gaps"), col("__mu").as("mean_gap_ms"),
        when(col("__sd").isNotNull && col("__sd") + col("__mu") =!= 0.0,
          (col("__sd") - col("__mu")) / (col("__sd") + col("__mu"))).as("b"))
  }
}
