package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-based Poisson bootstrap — uncertainty estimation for corpus
  * metrics WITHOUT resampling rows: each (row, replicate) pair gets an
  * i.i.d.-looking Poisson(1) weight derived purely from md5(id:r), so
  * every replicate is a deterministic reweighting computed in the same
  * single pass as the metric itself. This is the standard trick for
  * confidence intervals over datasets too large to resample (classic
  * Poisson-bootstrap-on-MapReduce construction): the multinomial
  * bootstrap needs coordinated global draws; Poisson(1) weights
  * factorize per row, need no state, and are rerun- and
  * partition-stable here because the "randomness" is a hash.
  *
  * Weight = inverse-CDF of Poisson(1) applied to a 48-bit md5 uniform.
  * The uniform (integer / 2^48) and the CDF thresholds (decimal literals
  * that round-trip to exact doubles) make every comparison
  * engine-portable — no RNG, no libm calls. Weights cap at 4
  * (P(X > 4) ~ 0.37%, the documented tail truncation).
  */
object Bootstrap {

  /** Poisson(1) CDF at 0..3 as exact round-trip double literals;
    * a uniform below cdf(k) and not below cdf(k-1) gets weight k. */
  private val cdf = Seq(0.36787944117144233, 0.7357588823428847,
    0.9196986029286058, 0.9810118431238463)

  /** Explodes each row into `replicates` rows carrying (replicate,
    * weight) — aggregate downstream with sum(weight * x) per replicate
    * and read the spread across replicates as the metric's sampling
    * noise. Integer weights keep those sums exact (BIGINT), so replicate
    * aggregates stay order-insensitive at any cluster size. */
  def poissonReplicates(df: DataFrame, idCol: String,
      replicates: Int = 20): DataFrame = {
    require(replicates >= 1, s"replicates=$replicates")
    val u: Column =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        col("replicate").cast("string"))), 1, 12), 16, 10)
        .cast("double") / lit(281474976710656.0) // 2^48, exact
    val weight = cdf.zipWithIndex
      .foldRight(lit(cdf.size.toLong): Column) { case ((t, k), rest) =>
        when(u < t, k.toLong).otherwise(rest)
      }
    df.withColumn("replicate",
        explode(array((0 until replicates).map(r => lit(r)): _*)))
      .withColumn("weight", weight)
  }
}
