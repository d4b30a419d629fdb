package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit over quasi-identifier combinations — the privacy
  * gate a training-data pipeline runs before releasing tabular or
  * user-derived data: any equivalence class of quasi-identifiers
  * (nation + segment + balance band, zip + age + gender, ...) with
  * fewer than k members re-identifies its members by intersection.
  * Complements the regex-level PII scrubbing in [[Pii]] — scrubbed
  * text can still be joined back through its metadata.
  *
  * Scale shape: ONE hash aggregation keyed by the quasi-identifier
  * tuple (map-side combined), then a size filter — the at-risk report
  * is bounded by the class count, not the row count. Integer counts
  * only: bit-stable, trivially engine-replayable. */
object Anonymity {

  /** Equivalence classes smaller than k. Output: qidCols :+
    * (class_size), one row per at-risk class. */
  def atRiskClasses(df: DataFrame, qidCols: Seq[String], k: Int): DataFrame =
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)

  /** l-diversity audit — k-anonymity's complement: a class can be large
    * (k-safe) yet expose its members anyway when everyone in it shares
    * the same sensitive value (homogeneity attack). Classes whose
    * sensitive attribute takes fewer than l DISTINCT values are
    * reported with their size and diversity. Exact `countDistinct`
    * per class — one aggregation keyed by (qid, sensitive) collapsed
    * to the class, bounded by class count. */
  def lowDiversityClasses(df: DataFrame, qidCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame =
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .where(col("n_sensitive") < l)

  /** One-row summary next to [[atRiskClasses]]: total classes, at-risk
    * classes, rows inside at-risk classes (the re-identifiable
    * population), and the minimum class size (the dataset's k). */
  def summary(df: DataFrame, qidCols: Seq[String], k: Int): DataFrame =
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < k, 1L).otherwise(0L)).as("at_risk_classes"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("at_risk_rows"),
        min(col("class_size")).as("dataset_k"))
}
