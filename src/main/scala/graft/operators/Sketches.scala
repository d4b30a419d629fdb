package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximations — the 100 TB path for statistics whose
  * exact forms (q10 exact percentiles, A15 distinct) require a full
  * shuffle of the data or per-group sorts. Both are mergeable sketches:
  * partial aggregation happens map-side, only fixed-size summaries
  * shuffle, so cost is O(groups), not O(rows). Spec-verified against the
  * exact operators with error tolerances (the sketches are not
  * bit-replayable in another engine — same situation as the xxhash
  * family, and the reason these are not oracle queries).
  */
object Sketches {

  /** Grouped approximate percentiles via the GK sketch
    * (`percentile_approx`). `accuracy` trades memory for error:
    * rank error <= 1/accuracy. */
  def approxQuantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    val aggs: Seq[Column] = probs.map(p =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Grouped approximate distinct counts via HyperLogLog++
    * (`approx_count_distinct`), relative error ~`rsd`. */
  def approxDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(keyCol), rsd).as("approx_distinct"))

  /** Count-Min sketch build: `depth` independent hash rows of `width`
    * cells each. One declarative pass — each item contributes `depth`
    * (row, cell) increments, partial-aggregated map-side, so the only
    * shuffle is the d*w cell census (fixed size, independent of corpus
    * rows: the 100 TB frequency-estimation path when the key space is
    * too large for an exact groupBy to be affordable).
    *
    * Unlike the GK/HLL sketches above, this one IS cross-engine
    * replayable: cells are md5-derived (`row i` cell = first 8 hex chars
    * of md5(key ":" i) mod width), every cell value is an exact integer
    * sum, and the estimate is an integer min — no platform-dependent
    * hashing, so a DuckDB oracle reproduces the sketch bit-for-bit. */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"depth=$depth width=$width")
    val cells = (0 until depth).map { i =>
      struct(lit(i).as("row"),
        (conv(substring(md5(concat(col(keyCol).cast("string"), lit(s":$i"))), 1, 8), 16, 10)
          .cast("long") % width).as("cell"))
    }
    df.select(explode(array(cells: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates from a [[cmsBuild]] sketch: for each probe key, the
    * min over the sketch's `depth` rows of that key's cell value — the
    * classic one-sided CMS bound (estimate >= true count, equality when
    * some row has no colliding key). The sketch is d*w rows, so it
    * broadcasts; probes never shuffle. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map { i =>
      struct(lit(i).as("row"),
        (conv(substring(md5(concat(col(keyCol).cast("string"), lit(s":$i"))), 1, 8), 16, 10)
          .cast("long") % width).as("cell"))
    }
    probes.select(col(keyCol), explode(array(cells: _*)).as("rc"))
      .select(col(keyCol), col("rc.row").as("row"), col("rc.cell").as("cell"))
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy(col(keyCol))
      // a missing cell means nothing hashed there: count 0
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_count"))
  }
}
