package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-files compaction planning — the table-maintenance operator a
  * 100 TB lakehouse runs nightly: a streaming sink or over-parallel
  * writer leaves thousands of KB-scale files per partition, every
  * downstream scan pays the per-file open cost, and the fix is a
  * planned rewrite into ~target-size outputs. The planner is the
  * interesting part at scale: deciding WHAT to coalesce must not read
  * the data, only a per-file (or per-partition-unit) stats census.
  *
  * Scale shape: the plan runs entirely on the census — bounded by file
  * count, not row count. Bin assignment is sequential fill in a
  * caller-chosen order: bin = floor(cumulative-mass-before / target),
  * one window over the census partitioned by the table partition (no
  * global sort; each partition plans independently, exactly how a
  * distributed OPTIMIZE shards). Units are never split (unlike
  * [[Packing]], which cuts documents across fixed context windows —
  * the dual operation); a bin can overshoot `targetMass` by at most
  * one unit, undershoot only at the partition tail, so the plan is
  * within one file of optimal for order-preserving packs.
  *
  * Determinism: masses and cumulative sums are exact integers; the
  * bin id is integer division — bit-replayable, and the q226 oracle
  * replays the window verbatim.
  */
object Compaction {

  /** Per-file row census of an already-loaded DataFrame via
    * `input_file_name` — the zero-infrastructure stats source when no
    * table catalog serves file sizes. One aggregation, output bounded
    * by file count. */
  def fileCensus(df: DataFrame): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))

  /** Assign each census unit a compaction bin: units ordered by
    * `orderCols` within each `partCols` slice fill bins of
    * `targetMass` sequentially (bin = cumulative mass of PRIOR units
    * div target — a unit straddling a boundary goes wholly to the
    * earlier bin). Appends `bin` (long, 0-based per partition slice).
    * `orderCols` must totally order units within a slice or the
    * cumulative sum is nondeterministic — include the unit id as a
    * tiebreak. */
  def planBins(stats: DataFrame, partCols: Seq[String], massCol: String,
      orderCols: Seq[Column], targetMass: Long): DataFrame = {
    require(targetMass > 0, s"targetMass must be positive: $targetMass")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // SQL `div` keeps the division integral end-to-end (the `/` Column
    // operator goes through double, which drifts past 2^53 total mass)
    stats.withColumn("__cum", coalesce(sum(col(massCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum div ${targetMass}L"))
      .drop("__cum")
  }

  /** Rollup of a [[planBins]] plan: one row per (partition slice, bin)
    * with unit count, total mass, and the min/max order key — the
    * rewrite manifest a compaction job executes. */
  def binSummary(planned: DataFrame, partCols: Seq[String], massCol: String,
      unitCol: String): DataFrame =
    planned.groupBy((partCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n_units"), sum(col(massCol)).as("total_mass"),
        min(col(unitCol)).as("first_unit"), max(col(unitCol)).as("last_unit"))
}
