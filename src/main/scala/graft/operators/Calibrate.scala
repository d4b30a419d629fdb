package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic calibration (pool-adjacent-violators) over a score-bin
  * census — the nonparametric recalibration a pipeline applies to a
  * quality/toxicity classifier whose scores rank well but whose
  * probabilities lie (the remedy [[Eval.calibrationCurve]] measures
  * the need for, and [[Eval.brierDecomposition]] prices). Reference
  * analog: the score→tier ladders in profitscout-engine
  * (`score_aggregator/main.py` tier mapping) are hand-made monotone
  * calibrators; this learns one.
  *
  * NOT sequential PAVA: the fit is the closed-form min-max identity
  * (Ayer et al. 1955) — the isotonic L2 solution at bin i is
  *   ŷ_i = max_{k≤i} min_{l≥i} avg(y, bins k..l)
  * which needs only prefix sums and two window passes over the
  * bins² pair grid, not a data-dependent pooling loop. Spark-first:
  * a sequential PAVA would be a driver loop; the identity is a plan.
  *
  * Exactness: per-bin (n, Σy) and the prefix sums are exact integer
  * sums; every candidate block average is ONE division of exact longs;
  * min/max over doubles are order-independent, so the fit is
  * partition-invariant and bit-replayable cross-engine.
  *
  * Cost contract: bins are the caller's discretization (the [[Eval
  * .auc]] census discipline — score bins, not raw rows), so the pair
  * grid is bins² PER SCOPE at census scale, never row scale. The two
  * windows partition by (scope, k) and (scope, i) — bounded
  * partitions, no global sort.
  *
  * Scale shape: one (scope, bin) census aggregation, one bins-scale
  * cumulative window, the bins² self-join co-partitioned on scope,
  * one suffix-min window, one max aggregation. Output: (sc, bin, n,
  * s, rate, iso) — iso is monotone in bin and preserves Σ n·iso =
  * Σ s within each pooled block. */
object Calibrate {

  def isotonic(df: DataFrame, scopeCol: String, binCol: String,
      labelCol: String): DataFrame = {
    val base = df.where(col(binCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(binCol).cast("long").as("bin"),
        col(labelCol).cast("long").as("y"))
    val cells = base.groupBy(col("sc"), col("bin"))
      .agg(count(lit(1L)).as("n"), sum(col("y")).as("s"))
    val wCum = Window.partitionBy(col("sc")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = cells.select(col("sc"), col("bin"), col("n"), col("s"),
        sum(col("n")).over(wCum).as("cn"), sum(col("s")).over(wCum).as("cs"))
      .localCheckpoint(true)
    // pair grid (k <= l): block average over bins k..l from prefix sums
    val pairs = rows.select(col("sc"), col("bin").as("k"),
        (col("cn") - col("n")).as("pn"), (col("cs") - col("s")).as("ps"))
      .join(rows.select(col("sc"), col("bin").as("l"),
        col("cn").as("ln"), col("cs").as("ls")), Seq("sc"))
      .where(col("k") <= col("l"))
      .select(col("sc"), col("k"), col("l"),
        ((col("ls") - col("ps")).cast("double") /
          (col("ln") - col("pn")).cast("double")).as("avg"))
    // suffix min over l >= i within each k: row (k, l) becomes the
    // candidate min_{l' >= l} avg(k..l') for i = l
    val wSuf = Window.partitionBy(col("sc"), col("k"))
      .orderBy(col("l").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val suf = pairs.select(col("sc"), col("k"), col("l").as("bin"),
      min(col("avg")).over(wSuf).as("sufmin"))
    // max over k <= i closes the min-max identity (k <= l = i holds by
    // construction of the pair grid)
    val iso = suf.groupBy(col("sc"), col("bin"))
      .agg(max(col("sufmin")).as("iso"))
    rows.join(iso, Seq("sc", "bin"))
      .select(col("sc"), col("bin"), col("n"), col("s"),
        (col("s").cast("double") / col("n").cast("double")).as("rate"),
        col("iso"))
  }
}
