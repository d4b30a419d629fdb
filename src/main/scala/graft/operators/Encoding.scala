package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weight-of-evidence encoding + information value (the credit-scoring
  * workhorse; Siddiqi 2006): per category k of a feature,
  *   WOE_k = ln( (pos_k + s)/(POS + s·K) / ((neg_k + s)/(NEG + s·K)) )
  * with Laplace smoothing s so empty cells stay finite, and
  *   IV = Σ_k (p_k − q_k) · WOE_k
  * summarizing the feature's separation power (rule of thumb: < 0.02
  * useless, > 0.5 suspicious). The supervised sibling of
  * [[Eval.chiSquareTokens]]: chi² ranks association, WOE/IV yields the
  * monotone ENCODING a downstream model consumes.
  *
  * Determinism: all censuses are exact integers; each category's WOE
  * is one ln of a ratio of exact-integer-derived doubles (single
  * expression, fixed operation order), and IV folds the per-category
  * terms in CATEGORY ORDER over the aggregated ≤K-row list — the
  * [[Profile.benfordCensus]] chi² discipline — so both numbers are
  * bit-stable at any parallelism.
  *
  * Scale shape: ONE (feature-category)-keyed census with map-side
  * combine plus a 1-row broadcast of the global pos/neg totals;
  * the IV fold happens on the single collected-per-group list
  * (bounded by the category vocabulary K). */
object Encoding {

  /** Output: one row per category — (category, n_pos, n_neg, woe, iv)
    * with the feature-level iv repeated on each row. `labelCol` = 1 is
    * positive; smoothing > 0 required. */
  def woeTable(df: DataFrame, categoryCol: String, labelCol: String,
      smoothing: Double = 0.5): DataFrame = {
    require(smoothing > 0, s"smoothing must be positive: $smoothing")
    val census = df
      .select(col(categoryCol).cast("string").as("category"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("__p"))
      .groupBy(col("category"))
      .agg(sum(col("__p")).as("n_pos"),
        (count(lit(1)) - sum(col("__p"))).as("n_neg"))
    val tot = census.agg(
      sum(col("n_pos")).as("__POS"), sum(col("n_neg")).as("__NEG"),
      count(lit(1)).as("__K"))
    val s = smoothing
    val woeExpr =
      s"""ln(((CAST(n_pos AS DOUBLE) + $s) / (CAST(__POS AS DOUBLE) + $s * __K))
         |  / ((CAST(n_neg AS DOUBLE) + $s) / (CAST(__NEG AS DOUBLE) + $s * __K)))
         |""".stripMargin
    val scored = census.crossJoin(broadcast(tot))
      .withColumn("woe", expr(woeExpr))
      .withColumn("__term",
        (col("n_pos").cast("double") / col("__POS").cast("double") -
          col("n_neg").cast("double") / col("__NEG").cast("double")) * col("woe"))
    // IV: fold the ≤K per-category terms in category order (exact
    // replay order for another engine; a plain SUM would be
    // partition-order dependent in float)
    val iv = scored.agg(
        array_sort(collect_list(struct(col("category"), col("__term")))).as("__l"))
      .select(expr(
        """aggregate(__l, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.__term)
          |""".stripMargin).as("iv"))
    scored.crossJoin(broadcast(iv))
      .select(col("category"), col("n_pos"), col("n_neg"), col("woe"), col("iv"))
  }
}
