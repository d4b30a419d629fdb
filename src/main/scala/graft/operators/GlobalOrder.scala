package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle order for training corpora: every row
  * gets a stable position in the permutation defined by
  * `(md5(id), id)` — the "shuffle the corpus once, reproducibly" step a
  * pre-training data pipeline runs before sharding examples to data
  * loaders. Like [[Splits]], the order is a pure function of the id, so
  * it survives reruns, engine changes, and corpus appends (existing rows
  * keep their relative order when new docs arrive).
  *
  * A naive `row_number() OVER (ORDER BY md5(id))` is a single-partition
  * global sort — the exact scale-killer flagged for q24's ntile. Instead
  * the first two hex digits of the key split the key space into 256
  * RANGE buckets (the hex prefix order IS the key order), so:
  *   1. per-bucket `row_number` — a partitioned window, 256-way parallel;
  *   2. per-bucket counts → offsets via a triangular join over the
  *      256-row count table (bounded side-table work, no global window,
  *      no driver collect);
  *   3. broadcast offsets back: `pos = offset + rn - 1`.
  * Total cost: one shuffle of (row, key) for the window plus a broadcast
  * of 256 longs — the same shape at 100 TB, where each bucket still
  * holds ~0.4% of the corpus.
  */
object GlobalOrder {

  /** Token-budget subsample: keep the PREFIX of the global `(md5(id),
    * id)` permutation whose cumulative `weightCol` stays within
    * `budget` — the "give me N tokens, reproducibly" selection a
    * pre-training run makes against a larger corpus. Deterministic and
    * append-stable like [[shuffleIndex]], and the same two-phase shape:
    * per-bucket RUNNING sums (a bucket-partitioned window, 256-way
    * parallel), bucket weight totals -> bucket offsets via the
    * triangular join, broadcast back; a row's global cumulative weight
    * is its bucket offset + bucket-local running sum, and it is kept
    * while that (inclusive) total stays <= budget — no global window,
    * no overshoot. Weights must be non-negative; integer weights keep
    * the arithmetic exact cross-engine. Output: input columns +
    * `cum_w` (inclusive cumulative weight), filtered to the prefix. */
  def budgetedPrefix(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    val keyed = df
      .withColumn("__go_key", md5(col(idCol).cast("string")))
      .withColumn("__go_b", substring(col("__go_key"), 1, 2))
    val totals = keyed.groupBy(col("__go_b"))
      .agg(sum(col(weightCol)).as("__go_n"))
    val offsets = totals.as("a")
      .join(totals.select(col("__go_b").as("__go_b2"), col("__go_n").as("__go_n2")),
        col("__go_b2") < col("a.__go_b"), "left")
      .groupBy(col("a.__go_b").as("__go_b"))
      .agg(coalesce(sum(col("__go_n2")), lit(0L)).as("__go_off"))
    val running = sum(col(weightCol)).over(
      Window.partitionBy(col("__go_b")).orderBy(col("__go_key"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    keyed
      .withColumn("__go_run", running)
      .join(broadcast(offsets), "__go_b")
      .withColumn("cum_w", col("__go_off") + col("__go_run"))
      .where(col("cum_w") <= budget)
      .drop("__go_key", "__go_b", "__go_run", "__go_off")
  }

  /** Appends `posCol`: the row's 0-based rank in the global
    * `(md5(id), id)` order. `id` values must be distinct for the
    * permutation to be total (ties fall back to id order, which is then
    * deterministic anyway). */
  def shuffleIndex(df: DataFrame, idCol: String, posCol: String = "pos"): DataFrame = {
    val keyed = df
      .withColumn("__go_key", md5(col(idCol).cast("string")))
      .withColumn("__go_b", substring(col("__go_key"), 1, 2))
    val counts = keyed.groupBy(col("__go_b")).agg(count(lit(1)).as("__go_n"))
    // offset(b) = rows in all strictly-smaller buckets; 256x256 triangular
    // join on a count table — bounded, warning-free, fully lazy
    val offsets = counts.as("a")
      .join(counts.select(col("__go_b").as("__go_b2"), col("__go_n").as("__go_n2")),
        col("__go_b2") < col("a.__go_b"), "left")
      .groupBy(col("a.__go_b").as("__go_b"))
      .agg(coalesce(sum(col("__go_n2")), lit(0L)).as("__go_off"))
    val rn = row_number().over(
      Window.partitionBy(col("__go_b")).orderBy(col("__go_key"), col(idCol)))
    keyed
      .withColumn("__go_rn", rn)
      .join(broadcast(offsets), "__go_b")
      .withColumn(posCol, col("__go_off") + col("__go_rn") - 1)
      .drop("__go_key", "__go_b", "__go_rn", "__go_off")
  }
}
