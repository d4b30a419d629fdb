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

  /** t-closeness (Li, Li & Venkatasubramanian 2007), categorical
    * sensitive attribute — the third rung of the re-identification
    * ladder: k-anonymity ([[atRiskClasses]]) bounds CLASS SIZE,
    * l-diversity ([[lowDiversityClasses]]) bounds within-class VALUE
    * COUNT, t-closeness bounds what an attacker LEARNS: the distance
    * between a class's sensitive-value distribution and the table's.
    * For a categorical attribute the variational distance IS the EMD
    * under the uniform ground metric, so each class's t is exactly
    * [[Divergence.totalVariation]]'s statistic with the
    * quasi-identifier class as the group.
    *
    * Exactness: per-class t = num_c/(2·n_c·N) with the all-integer
    * numerator of the TV closed form; the violation flag compares
    * num_c·10⁶ against tMaxMicros·2·n_c·N in exact decimal (tMax
    * passed in MICRO-units so the threshold is an integer — no float
    * boundary can mis-flag a class). One terminal division per class
    * for the reported t.
    *
    * Scale shape: one (class, value) census, a value-marginal
    * re-aggregation, one value-keyed join at census grain (the
    * [[Divergence.totalVariation]] plan on quasi-class keys). Output:
    * one row per class — (qid..., n, t, violates). */
  def tCloseness(df: DataFrame, qidCols: Seq[String], sensitiveCol: String,
      tMaxMicros: Long): DataFrame = {
    require(tMaxMicros >= 0, s"tMaxMicros must be >= 0, got $tMaxMicros")
    val dec = "decimal(38,0)"
    // Class key is LENGTH-PREFIXED per component: a bare concat would
    // merge distinct qid tuples (("ab","c") vs ("a","bc")) and -- because
    // concat_ws skips nulls -- (null,"x") with ("x",null), silently fusing
    // their TV numerators. "len:value" with null -> "-1:" is injective on
    // tuples of strings-or-null, so every quasi-identifier class keeps
    // its own numerator and the gTot join(terms) stays one-to-one.
    val clsKey = concat_ws("|", qidCols.map { c =>
      val s = col(c).cast("string")
      concat(coalesce(length(s), lit(-1)).cast("string"), lit(":"),
        coalesce(s, lit("")))
    }: _*)
    val keyed = df.select(
      clsKey.as("__cls") +:
        (qidCols.map(col) :+ col(sensitiveCol).as("__v")): _*)
    val census = keyed
      .groupBy(col("__cls") +: qidCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("cgt"))
      .localCheckpoint(true)
    val gTot = census.groupBy(col("__cls") +: qidCols.map(col): _*)
      .agg(sum(col("cgt")).as("ng"))
    val vTot = census.groupBy(col("__v")).agg(sum(col("cgt")).as("ct"))
    val n = broadcast(vTot.agg(sum(col("ct")).as("__n")))
    val terms = census.join(vTot, "__v")
      .join(gTot.select(col("__cls"), col("ng")), "__cls")
      .crossJoin(n)
      .select(col("__cls"),
        (abs((col("cgt").cast(dec) * col("__n").cast(dec)).cast(dec) -
          (col("ct").cast(dec) * col("ng").cast(dec)).cast(dec)).cast(dec) -
          (col("ct").cast(dec) * col("ng").cast(dec)).cast(dec)).cast(dec)
          .as("__term"))
      .groupBy(col("__cls")).agg(sum(col("__term")).cast(dec).as("__s"))
    val num = (col("__s") +
      (col("__n").cast(dec) * col("ng").cast(dec)).cast(dec)).cast(dec)
    val den = (lit(2L).cast(dec) * col("ng").cast(dec) *
      col("__n").cast(dec)).cast(dec)
    gTot.join(terms, "__cls").crossJoin(n)
      .select(qidCols.map(col) ++ Seq(col("ng").as("n"),
        (num.cast("double") / den.cast("double")).as("t"),
        ((num * lit(1000000L).cast(dec)).cast(dec) >
          (lit(tMaxMicros).cast(dec) * den).cast(dec)).as("violates")): _*)
  }

  /** Laplace-mechanism count release (Dwork et al. 2006) with a
    * DETERMINISTIC md5-derived noise draw — the ε-DP histogram the
    * privacy budget buys, made replayable for testing and oracle
    * parity exactly like the engine's other seeded kernels (q64/q275:
    * a seeded draw is a DESIGN choice for reproducible pipelines;
    * production swaps the seed source for real entropy, nothing else
    * changes). Count queries have L1 sensitivity 1, so noise ~
    * Laplace(1/ε): u = (md5₄₈(group‖seed) + ½)/2⁴⁸ ∈ (0,1),
    * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|).
    *
    * Determinism: the 48-bit hash-to-uniform is exact integer
    * arithmetic; ln/exp parity per the q121 libm contract; the final
    * noisy count is a pinned-shape double. Output: (g, noisy_count,
    * scale) — the TRUE count is deliberately absent from the release
    * shape (that is the point); tests recompute it separately.
    *
    * Scale shape: one group census, then per-row arithmetic. */
  def laplaceCounts(df: DataFrame, groupCol: String, epsilonMilli: Long,
      seed: String): DataFrame = {
    require(epsilonMilli > 0, s"epsilonMilli must be positive, got $epsilonMilli")
    val b = 1000.0 / epsilonMilli.toDouble // scale = 1/eps
    val counts = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("__c"))
    val u = (expr(s"CAST(CONV(SUBSTRING(md5(CONCAT(CAST(g AS STRING), " +
      s"'${seed}')), 1, 12), 16, 10) AS BIGINT)").cast("double") +
      lit(0.5)) / lit(math.pow(2.0, 48))
    val centered = u - lit(0.5)
    val noise = -lit(b) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    counts.select(col("g"),
      (col("__c").cast("double") + noise).as("noisy_count"),
      lit(b).as("scale"))
  }
}
