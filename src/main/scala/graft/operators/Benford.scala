package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford's-law first-digit audit — the classic fabricated-numbers
  * screen for financial/measurement columns (organically-grown
  * magnitudes follow P(d) = log10(1 + 1/d); keyed-in or synthesized
  * ones usually don't). Per digit: observed count, Benford-expected
  * count, and the chi-square contribution — emitted PER DIGIT rather
  * than summed, so no cross-row float fold is needed and every value
  * is a fixed chain of correctly-rounded ops over exact integers
  * (the expected-probability literals are hard-coded with full double
  * precision; log10 itself never runs at query time — transcendentals
  * are not correctly rounded and would break cross-engine replay).
  *
  * Scale shape: one integer census (digit cardinality 9) plus a
  * 1-row total attached by broadcast — nothing keyed by row count. */
object Benford {

  /** P(d) = log10(1 + 1/d) as full-precision literals, d = 1..9. */
  val probs: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
    3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
    5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
    9 -> 0.04575749056067514)

  /** First-digit audit of a POSITIVE INTEGER column (scale doubles to
    * integer units first — e.g. cents — so digit extraction is a pure
    * string op, identical in every engine). Output: (digit, n_obs,
    * expected, chi2_term), 9 rows. */
  def audit(df: DataFrame, intCol: Column): DataFrame = {
    val obs = df.select(substring(intCol.cast("string"), 1, 1).cast("int").as("digit"))
      .where(col("digit").between(1, 9))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = obs.agg(sum(col("n_obs")).as("n_total"))
    val pCol = probs.tail.foldLeft(
        when(col("digit") === probs.head._1, lit(probs.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
    }
    obs.crossJoin(broadcast(total))
      .withColumn("expected", col("n_total").cast("double") * pCol)
      .select(col("digit").cast("long").as("digit"), col("n_obs"),
        col("expected"),
        ((col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) / col("expected"))
          .as("chi2_term"))
  }
}
