package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: assign every
  * row to one of N named splits (train/val/test) as a pure function of a
  * stable id — no shuffle, no RNG state, reproducible across runs,
  * engines, and subsets (a doc keeps its split when the corpus grows,
  * the property an 100 TB incremental pipeline needs; sampling by
  * `rand()` has none of these).
  *
  * Mechanism: the first two hex chars of `md5(id)` are a uniform value
  * in [0, 256); cumulative weight thresholds become two-hex-digit
  * prefixes and the assignment is a chain of string comparisons. Weights
  * therefore quantize to 1/256 granularity — plenty for split ratios,
  * and the same trick DuckDB replays verbatim (q91 precedent).
  */
object Splits {

  /** Appends `splitCol` with the name of the split each row lands in.
    * `weights` are (name, weight) with weights summing to ~1; the last
    * split absorbs the rounding remainder. */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(weights.size >= 2, "need at least two splits")
    require(weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")

    val h = substring(md5(col(idCol).cast("string")), 1, 2)
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail // cumulative
    // threshold for split i: first 2 hex digits of floor(cum * 256)
    def hex2(cum: Double): String = f"${math.min(255, math.floor(cum * 256).toInt)}%02x"
    val assigned = weights.init.zip(cuts.init).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, ((name, _), cum)) =>
        when(h < lit(hex2(cum)), lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, assigned)
  }

  /** Deterministic per-stratum downsampling — the mixture-tuning move of
    * a pre-training pipeline ("keep 25% of src3, 75% of src7, all the
    * rest"): rows whose stratum has a rate keep only ids whose md5
    * prefix falls under floor(rate*256) in two hex digits; strata not in
    * `rates` keep everything. Same purity/stability contract as
    * [[hashSplit]], and still a pure filter — no shuffle, fully
    * pushdown-friendly. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0,1]")
    val h = substring(md5(col(idCol).cast("string")), 1, 2)
    def keepFor(r: Double): Column =
      if (r >= 1.0) lit(true) // "100" would compare lexicographically, not numerically
      else h < lit(f"${math.floor(r * 256).toInt}%02x")
    val keep = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(true): Column) { case (acc, (stratum, rate)) =>
        when(col(strataCol) === lit(stratum), keepFor(rate)).otherwise(acc)
      }
    df.where(keep)
  }
}
