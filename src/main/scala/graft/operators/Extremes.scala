package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extreme-value analysis for capacity planning: fit a Gumbel
  * distribution to per-period MAXIMA (the Fisher–Tippett domain for
  * maxima of light-tailed loads) and read off return levels — "the
  * burst we should expect once per N periods" — which is the number a
  * provisioning decision actually needs, where a mean+3σ rule
  * systematically under-calls rare peaks.
  *
  * Method of moments (closed form — no iterative MLE): β̂ = s·√6/π,
  * μ̂ = x̄ − γ·β̂ (γ = Euler–Mascheroni), return level for period T =
  * μ̂ − β̂·ln(−ln(1 − 1/T)).
  *
  * Exactness: inputs are integer maxima, so x̄ and the population
  * variance come from exact integer sums ((n·Σx² − S²)/n²) with ONE
  * sqrt; the Gumbel constants enter as fixed double literals and the
  * return-level expression has a fixed evaluation shape — the whole
  * float tail is a handful of correctly-rounded ops both engines
  * share. Scale shape: one census aggregation per key (maxima are
  * periods-bounded upstream). Output: (key, n, mean, beta, mu,
  * rl_&lt;T&gt; per requested period). */
object Extremes {

  val EulerGamma: Double = 0.5772156649015329

  def gumbelFit(df: DataFrame, keyCol: String, valueCol: String,
      returnPeriods: Seq[Int]): DataFrame = {
    require(returnPeriods.nonEmpty && returnPeriods.forall(_ >= 2),
      s"return periods must be >= 2: $returnPeriods")
    val x = col(valueCol).cast("long")
    val sums = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__s"), sum(x * x).as("__ss"))
    val mean = col("__s").cast("double") / col("n").cast("double")
    val varPop = (col("n") * col("__ss") - col("__s") * col("__s")).cast("double") /
      (col("n") * col("n")).cast("double")
    val beta = sqrt(varPop) * sqrt(lit(6.0)) / lit(math.Pi)
    val mu = mean - lit(EulerGamma) * beta
    val rls = returnPeriods.map { t =>
      (col("mu") - col("beta") *
        log(-log(lit(1.0) - lit(1.0) / lit(t.toDouble)))).as(s"rl_$t")
    }
    sums
      .withColumn("mean", mean)
      .withColumn("beta", beta)
      .withColumn("mu", mu)
      .select((Seq(col(keyCol), col("n"), col("mean"), col("beta"),
        col("mu")) ++ rls): _*)
  }
}
