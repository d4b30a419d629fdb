package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — the "which channel gets credit"
  * census over an event stream: each conversion event closes a JOURNEY
  * (the touches since the user's previous conversion), and every model
  * splits one unit of credit across the journey's touches:
  *   - first / last touch: all credit to one end (reported as integer
  *     counts — no float at all),
  *   - linear: 1/n to each touch,
  *   - U-shaped (position-based 40/20/40): 0.4 to each end, 0.2 shared
  *     equally by the middle (n=1 → 1.0, n=2 → 0.5/0.5).
  *
  * Exactness: journey membership, sizes, and first/last flags are
  * integer window arithmetic over the pinned (ord) per-user order.
  * Fractional credits are fixed double shapes of small integers
  * (1/n, 0.2/(n−2)); each channel's total folds the per-journey
  * contributions IN (user, journey) ORDER over a journey-bounded
  * collect (the q237 contract), so the float sums replay bit-for-bit.
  * Conversions with NO preceding touch are counted loudly per channel
  * of the conversion event (`n_orphan`), never silently dropped.
  *
  * Scale shape: one per-user ordered window pass to stamp journey ids
  * (state = a running conversion count, never a buffer), one
  * (user, journey) aggregation, one (journey, channel) census, one
  * channel rollup — every shuffle keyed by user or channel; journeys
  * are user-bounded so no global ordering exists anywhere. Output one
  * row per channel: (channel, n_touches, n_journeys, n_first, n_last,
  * credit_linear, credit_ushape, n_orphan). */
object Attribution {

  def multiTouch(df: DataFrame, userCol: String, ordCol: String,
      channelCol: String, isConversion: Column): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("o"))
    val base = df.select(col(userCol).as("u"), col(ordCol).as("o"),
        col(channelCol).as("ch"), when(isConversion, 1L).otherwise(0L)
          .as("cv"))
      .where(col("u").isNotNull && col("o").isNotNull)
    // journey id = conversions seen so far (exclusive for the closing
    // conversion itself: a purchase belongs to the journey it CLOSES)
    val stamped = base
      .withColumn("j",
        coalesce(sum(col("cv")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val touches = stamped.where(col("cv") === 0L)
    val convs = stamped.where(col("cv") === 1L)
      .select(col("u"), col("j"), col("ch").as("conv_ch"))
    // journey census: size and the pinned first/last touch order keys
    val jAgg = touches.groupBy(col("u"), col("j")).agg(
      count(lit(1)).as("n"),
      min(struct(col("o"), col("ch"))).as("first"),
      max(struct(col("o"), col("ch"))).as("last"))
    // only journeys actually CLOSED by a conversion earn credit
    val closed = jAgg.join(convs, Seq("u", "j"))
    val orphans = convs.join(jAgg, Seq("u", "j"), "left_anti")
      .groupBy(col("conv_ch").as("ch"))
      .agg(count(lit(1)).as("n_orphan"))
    // per (journey, channel): touch count + end-of-journey flags
    val perJc = touches.join(closed.select(col("u"), col("j"), col("n"),
        col("first"), col("last")), Seq("u", "j"))
      .groupBy(col("u"), col("j"), col("ch"))
      .agg(count(lit(1)).as("t"), max(col("n")).as("n"),
        max((col("first.ch") === col("ch")).cast("long")).as("isf"),
        max((col("last.ch") === col("ch")).cast("long")).as("isl"))
    val nD = col("n").cast("double")
    val tD = col("t").cast("double")
    // U-shape credit for this channel inside this journey: ends 0.4
    // each, middle 0.2/(n-2) per touch; small-n degenerations pinned
    val midTouches = (col("t") - col("isf") - col("isl")).cast("double")
    val uCredit = when(col("n") === 1L, lit(1.0))
      .when(col("n") === 2L, tD * 0.5)
      .otherwise(col("isf").cast("double") * 0.4 +
        col("isl").cast("double") * 0.4 +
        midTouches * (lit(0.2) / (nD - 2.0)))
    val scored = perJc.select(col("u"), col("j"), col("ch"),
      col("t"), col("isf"), col("isl"),
      (tD / nD).as("lin"), uCredit.as("ush"))
    // channel rollup: integer sums free-order; float credits fold in
    // (u, j) order over the journey-bounded collect
    val rolled = scored.groupBy(col("ch")).agg(
      sum(col("t")).as("n_touches"),
      count(lit(1)).as("n_journeys"),
      sum(col("isf")).as("n_first"),
      sum(col("isl")).as("n_last"),
      sort_array(collect_list(struct(col("u"), col("j"), col("lin"),
        col("ush")))).as("__c"))
    rolled.select(col("ch").as("channel"), col("n_touches"),
        col("n_journeys"), col("n_first"), col("n_last"),
        expr("aggregate(__c, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.lin)")
          .as("credit_linear"),
        expr("aggregate(__c, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.ush)")
          .as("credit_ushape"))
      .join(orphans.withColumnRenamed("ch", "channel"), Seq("channel"),
        "full_outer")
      .select(col("channel"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        coalesce(col("n_journeys"), lit(0L)).as("n_journeys"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        coalesce(col("credit_linear"), lit(0.0)).as("credit_linear"),
        coalesce(col("credit_ushape"), lit(0.0)).as("credit_ushape"),
        coalesce(col("n_orphan"), lit(0L)).as("n_orphan"))
  }
}
