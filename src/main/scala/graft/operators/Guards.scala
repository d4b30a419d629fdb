package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-plan runtime guards that make scale-shape CLAIMS executable.
  *
  * Several operators run an UNPARTITIONED window over a census ("distinct
  * durations", "value-keyed buckets", "the test family") on the documented
  * argument that the census is bounded — but an argument is not a gate: a
  * value-keyed census over a continuous double column grows with the data,
  * and at 100× scale the single window partition would silently become the
  * bottleneck (or OOM an executor). [[boundedCensus]] turns the documented
  * bound into a runtime assertion INSIDE the plan: a broadcast 1-row count
  * joins the census, and the window's own key column passes through a
  * raise_error fold — exceed the bound and the job fails loudly with the
  * operator's name and the observed cardinality, instead of quietly
  * degrading. Cost: one extra aggregate over census-grain rows (the rows
  * are already census-bounded by construction when the claim holds) and a
  * broadcast nested-loop join against one row — no row-scale work, no
  * CartesianProduct (PlanSpec-compatible).
  */
object Guards {

  /** Default bound: far above any honest census (a decade of daily
    * periods is ~3.7k rows; a milli-precision score census is ≤ 1001)
    * yet far below row scale, so a census that silently became
    * data-shaped trips it long before a single window partition melts
    * an executor. */
  val DefaultCensusBound: Long = 1000000L

  /** Returns `census` with `keyCol` passing through a cardinality
    * assert: if the census holds more than `bound` rows, any action
    * over the result raises with `who` and the observed count. The
    * guarded column must be one the downstream window actually reads
    * (its orderBy key) so the guard cannot be pruned away. */
  def boundedCensus(census: DataFrame, keyCol: String, who: String,
      bound: Long = DefaultCensusBound): DataFrame = {
    require(bound > 0, s"bound must be positive: $bound")
    val keyType = census.schema(keyCol).dataType
    val n = broadcast(census.groupBy()
      .agg(count(lit(1)).cast("long").as("__census_n")))
    census.crossJoin(n)
      .withColumn(keyCol,
        when(col("__census_n") <= bound, col(keyCol))
          .otherwise(raise_error(concat(
            lit(s"$who: census cardinality "),
            col("__census_n").cast("string"),
            lit(s" exceeds the documented bound $bound — the " +
              "unpartitioned-window boundedness claim is violated; " +
              "re-bucket or re-partition before windowing")))
            .cast(keyType)))
      .drop("__census_n")
  }
}
