package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark built-ins (SURVEY.md §2.3: J4-J7).
  *
  * Strategy notes for scale:
  *  - Backward as-of join is implemented union-tag-window style: union the
  *    two inputs with a side tag, single sort-within-key window pass, then
  *    filter — ONE shuffle on the key, no range-explosion, no skew from an
  *    inequality join condition. This is the plan Flink/kdb-style as-of
  *    semantics want on Spark; an inequality join + argmax would shuffle
  *    the same data but build O(n*m) intermediate pairs per key.
  *  - Future-window join bounds the range condition with a max horizon so
  *    AQE can still estimate it, then ranks and limits per group.
  */
object Joins {

  /** J4 backward as-of join. For each left row, attach the most recent
    * right row with rightTs <= leftTs, matching on `keys`.
    *
    * Right value columns come back null when no prior right row exists
    * (closest-prior semantics, forward-paper-trader/main.py:108-111).
    *
    * @param left     probe side (each row preserved exactly once)
    * @param right    reference series
    * @param keys     equi-join key columns present on both sides
    * @param leftTs   ordering column on left
    * @param rightTs  ordering column on right
    * @param valueCols right columns to carry (must not collide with left)
    */
  def asOfBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select((keys.map(col) :+ col("_ts") :+ col("_side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        struct(lCols.map(col): _*).as("_row"): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select((keys.map(col) :+ col("_ts") :+ col("_side")) ++
        valueCols.map(col) :+ lit(null).cast(l.schema("_row").dataType).as("_row"): _*)
    // right rows sort before left rows at equal ts => ties are inclusive
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .select(col("_side") +: col("_row") +:
        valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .where(col("_side") === 1)
    filled.select(lCols.map(c => col("_row").getField(c).as(c)) ++ valueCols.map(col): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * rightTs >= leftTs on the same `keys` (pandas merge_asof
    * direction='forward'). Same single-shuffle union trick as
    * [[asOfBackward]], mirrored: left rows sort before right rows at
    * equal ts, so ties are inclusive, and the fill runs backward from
    * the partition end. Duplicate right rows at one (key, ts) must be
    * reduced by the caller first — whichever survives the window
    * otherwise is partition-order-dependent. */
  def asOfForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(0))
      .select((keys.map(col) :+ col("_ts") :+ col("_side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        struct(lCols.map(col): _*).as("_row"): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(1))
      .select((keys.map(col) :+ col("_ts") :+ col("_side")) ++
        valueCols.map(col) :+ lit(null).cast(l.schema("_row").dataType).as("_row"): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_ts"), col("_side"))
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = l.unionByName(r)
      .select(col("_side") +: col("_row") +:
        valueCols.map(c => first(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .where(col("_side") === 0)
    filled.select(lCols.map(c => col("_row").getField(c).as(c)) ++ valueCols.map(col): _*)
  }

  /** Nearest as-of join (pandas merge_asof direction='nearest', ties to
    * the PRIOR row): runs [[asOfBackward]] and [[asOfForward]] — still
    * two shuffles total, both keyed the same — and picks per row by
    * distance. Requires a NUMERIC ts (distances subtract). Output:
    * left columns ++ valueCols ++ (asof_ts, asof_dir). */
  def asOfNearest(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val rb = right.select((keys.map(col) :+ col(rightTs)) ++
      valueCols.map(c => col(c).as(s"${c}__b")) :+ col(rightTs).as("__bts"): _*)
    val rf = right.select((keys.map(col) :+ col(rightTs)) ++
      valueCols.map(c => col(c).as(s"${c}__f")) :+ col(rightTs).as("__fts"): _*)
    val withB = asOfBackward(left, rb, keys, leftTs, rightTs,
      valueCols.map(_ + "__b") :+ "__bts")
    val withBF = asOfForward(withB, rf, keys, leftTs, rightTs,
      valueCols.map(_ + "__f") :+ "__fts")
    val lts = col(leftTs)
    val pickB = col("__fts").isNull ||
      (col("__bts").isNotNull && (lts - col("__bts") <= col("__fts") - lts))
    withBF.select(left.columns.map(col) ++
      valueCols.map(c => when(pickB, col(s"${c}__b")).otherwise(col(s"${c}__f")).as(c)) ++
      Seq(when(pickB, col("__bts")).otherwise(col("__fts")).as("asof_ts"),
        when(pickB, "backward").otherwise("forward").as("asof_dir")): _*)
  }

  /** J6 future-window join: for each left row, the first `n` right rows with
    * rightTs strictly after leftTs (same keys), rank attached as `_rank`.
    * The range condition is left unbounded above only when `horizon` is
    * None; pass a horizon column bound (e.g. 30 days) at scale so the
    * join is a proper band join.
    */
  def futureWindow(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, n: Int,
      horizon: Option[Column] = None): DataFrame = {
    val cond0 = col(s"r.$rightTs") > col(s"l.$leftTs")
    val cond = horizon.fold(cond0)(h => cond0 && col(s"r.$rightTs") <= h)
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduceOption(_ && _)
    val joined = left.alias("l").join(
      right.alias("r"),
      keyCond.fold(cond)(_ && cond),
      "inner")
    val rightCols = right.columns.filterNot(keys.contains).map(c => col(s"r.$c").as(c))
    joined
      .select(left.columns.map(c => col(s"l.$c").as(c)) ++ rightCols: _*)
      .withColumn("_rank", row_number().over(
        Window.partitionBy(left.columns.map(col): _*).orderBy(col(rightTs))))
      .where(col("_rank") <= n)
  }

  /** T3 delete-then-insert partition rewrite expressed as a dataframe:
    * rows of `target` whose key is NOT in `replacement`, unioned with
    * `replacement` (agent-arena/storage.py:69-75 delete+insert idiom).
    */
  def replaceByKey(target: DataFrame, replacement: DataFrame, keys: Seq[String]): DataFrame =
    target.join(replacement.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(replacement)

  /** J3 MERGE upsert (update-only WHEN MATCHED, win-tracker/main.py:608-634):
    * for each key match, update columns take the source value when present,
    * else keep the target value; unmatched target rows pass through.
    */
  def mergeUpdate(
      target: DataFrame, updates: DataFrame, keys: Seq[String],
      updateCols: Seq[String]): DataFrame = {
    val t = target.alias("t")
    val s = updates.alias("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, cond, "left")
    val out = target.columns.map { c =>
      if (updateCols.contains(c))
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
      else col(s"t.$c").as(c)
    }
    joined.select(out: _*)
  }
}
