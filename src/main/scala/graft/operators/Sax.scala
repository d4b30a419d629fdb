package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAX — Symbolic Aggregate approXimation (Lin, Keogh, Lonardi & Chiu
  * 2003): turn a numeric series into a short symbol string so that
  * MOTIFS (recurring shapes) become countable with plain census
  * machinery — the bridge from time-series to the text toolchain
  * (n-gram censuses, [[Fingerprint]] hashing, dedup) this engine
  * already has. Pipeline: per-key z-normalization → PAA (piecewise
  * aggregate approximation: block means over `seg`-length windows) →
  * alphabet-4 symbolization at the N(0,1) quartile breakpoints
  * {−0.6745, 0, 0.6745} → sliding `word`-gram census.
  *
  * Determinism: the series mean/std come from exact integer sums
  * (population variance, one division); each PAA mean is an exact
  * integer ratio; z-scores are pinned double shapes compared against
  * pinned breakpoint literals — symbols replay cross-engine, and from
  * there everything is integer census. Trailing partial segments are
  * DROPPED (pinned), constant series (zero variance) emit no rows
  * (loud absence, not a fabricated flat word).
  *
  * Scale shape: one per-key relational pass (row_number + block
  * aggregation), one lead()-window for the word, one census. Output:
  * (key, word, n) — every observed `word`-segment motif with its
  * count. */
object Sax {

  def motifCensus(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, seg: Int = 7, word: Int = 3): DataFrame = {
    require(seg >= 1 && word >= 1, s"bad seg=$seg word=$word")
    val dec = "decimal(38,0)"
    val base = df.select(col(keyCol).as("k"), col(ordCol).as("o"),
      col(valueCol).cast("long").as("x"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("o"))))
    val stats = base.groupBy(col("k"))
      .agg(count(lit(1)).as("__n"),
        sum(col("x").cast(dec)).cast(dec).as("__s1"),
        sum((col("x").cast(dec) * col("x").cast(dec)).cast(dec))
          .cast(dec).as("__s2"))
      .withColumn("__mu",
        col("__s1").cast("double") / col("__n").cast("double"))
      .withColumn("__sd", sqrt(
        (col("__n").cast(dec) * col("__s2") - col("__s1") * col("__s1"))
          .cast(dec).cast("double") /
          (col("__n").cast(dec) * col("__n").cast(dec)).cast(dec)
            .cast("double")))
      .where(col("__sd") > 0.0)
    val paa = base
      .withColumn("__b", expr(s"(__rn - 1) div $seg"))
      .groupBy(col("k"), col("__b"))
      .agg(count(lit(1)).as("__cnt"), sum(col("x")).as("__bs"))
      .where(col("__cnt") === seg.toLong)
      .join(stats.select(col("k"), col("__mu"), col("__sd")), Seq("k"))
      .withColumn("__z",
        (col("__bs").cast("double") / lit(seg.toDouble) - col("__mu")) /
          col("__sd"))
      .withColumn("__sym",
        when(col("__z") < -0.6745, "a").when(col("__z") < 0.0, "b")
          .when(col("__z") < 0.6745, "c").otherwise("d"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("__b"))
    val worded = (1 until word).foldLeft(
      paa.select(col("k"), col("__b"), col("__sym").as("__w0"))) {
      case (d, j) => d.withColumn(s"__w$j", lead(col("__w0"), j).over(wOrd))
    }
    val parts = (0 until word).map(j => col(s"__w$j"))
    worded
      .where(parts.map(_.isNotNull).reduce(_ && _))
      .select(col("k").as(keyCol), concat(parts: _*).as("word"))
      .groupBy(col(keyCol), col("word"))
      .agg(count(lit(1)).as("n"))
  }
}
