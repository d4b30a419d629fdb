package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
  * "A Theory for Record Linkage"): blocked candidate generation, per-field
  * binary agreement, and the classic log-likelihood-ratio score
  *   score = Σ_f  agree_f ? log2(m_f / u_f) : log2((1-m_f) / (1-u_f))
  * with (m, u) = P(agree | match), P(agree | non-match). Entity resolution
  * is the cross-SOURCE face of deduplication: [[Dedup]]/[[EditDistance]]
  * find near-identical text, linkage matches STRUCTURED records whose
  * fields each carry a different amount of evidence — a shared rare value
  * (account balance to the cent) outweighs a shared common one (market
  * segment), which is exactly what the log-ratio weights encode.
  *
  * Scale shape: the all-pairs comparison space is quadratic, so pairs
  * exist only WITHIN caller-chosen blocks (the LSH-banding discipline of
  * [[Dedup]]): one hash exchange keyed by the block, per-block self-join.
  * Oversized blocks (a null-heavy key, a default value) are excluded with
  * a loud census ([[skippedBlocks]], cf. `Dedup.skippedBuckets`) rather
  * than silently exploding the join — block cardinality must grow with
  * the corpus (multi-field or prefix blocks, not a 25-value country
  * code, at web scale).
  *
  * Determinism: the agreement/disagreement weights are JVM doubles
  * computed ONCE from (m, u) literals, and the score folds them in the
  * caller's declared field order (a fixed left-associated sum, not a
  * data-dependent aggregation), so scores are bit-reproducible at any
  * parallelism and replayable by another engine embedding the same
  * shortest-repr literals. */
object Linkage {

  /** A comparison field: the BOOLEAN agreement column `agreeCol` (built
    * by the caller over the `_a`/`_b` pair columns) and the conditional
    * probabilities m = P(agree|match), u = P(agree|non-match). */
  final case class Comparison(agreeCol: String, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1,
      s"m/u must be in (0,1): m=$m u=$u")
    /** log2 likelihood-ratio weight when the field agrees. */
    val agreeWeight: Double = math.log(m / u) / math.log(2.0)
    /** log2 weight when it disagrees (negative for informative fields). */
    val disagreeWeight: Double =
      math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Per-block candidate pairs: rows sharing `blockCol`, id_a < id_b,
    * every non-block column duplicated as `<col>_a` / `<col>_b`. Blocks
    * larger than `maxBlockSize` are EXCLUDED (census them with
    * [[skippedBlocks]]). One exchange keyed by the block on each side;
    * the block-size gate joins a tiny aggregated census back on the
    * same key (AQE broadcasts it when small). */
  def blockedCandidates(records: DataFrame, idCol: String,
      blockCol: String, maxBlockSize: Int = 100000): DataFrame = {
    val ok = records.join(
      records.groupBy(col(blockCol)).agg(count(lit(1)).as("__bn"))
        .where(col("__bn") <= maxBlockSize)
        .select(col(blockCol)),
      Seq(blockCol))
    val others = records.columns.filter(c => c != idCol && c != blockCol)
    def side(s: String) = ok.select(
      (col(blockCol) +: col(idCol).as(s"id_$s") +:
        others.map(c => col(c).as(s"${c}_$s"))): _*)
    side("a").join(side("b"), blockCol)
      .where(col("id_a") < col("id_b"))
  }

  /** Census of blocks [[blockedCandidates]] drops — the "what did the
    * guard skip" log. Output: (block, n_records). */
  def skippedBlocks(records: DataFrame, blockCol: String,
      maxBlockSize: Int = 100000): DataFrame =
    records.groupBy(col(blockCol).as("block"))
      .agg(count(lit(1)).as("n_records"))
      .where(col("n_records") > maxBlockSize)

  /** Score + classify candidate pairs carrying one boolean column per
    * [[Comparison]]. Adds `score` (the field-ordered weight sum; a null
    * agreement counts as disagreement) and `decision`: match when
    * score >= `upper`, nonmatch when <= `lower`, else possible — the
    * Fellegi–Sunter three-way rule. */
  def fellegiSunter(pairs: DataFrame, comparisons: Seq[Comparison],
      upper: Double, lower: Double): DataFrame = {
    require(lower <= upper, s"lower $lower must be <= upper $upper")
    require(comparisons.nonEmpty, "at least one comparison field")
    val score = comparisons.foldLeft(lit(0.0)) { (acc, c) =>
      acc + when(coalesce(col(c.agreeCol), lit(false)),
        lit(c.agreeWeight)).otherwise(lit(c.disagreeWeight))
    }
    pairs.withColumn("score", score)
      .withColumn("decision",
        when(col("score") >= upper, "match")
          .when(col("score") <= lower, "nonmatch")
          .otherwise("possible"))
  }

  /** Graded-agreement linkage: the classic Winkler (1990) upgrade of
    * [[fellegiSunter]]'s binary name comparison — per left record, the
    * single best candidate by the codegen'd Jaro–Winkler kernel
    * ([[graft.functions.FastStringSim]], DuckDB-bit-parity pinned),
    * thresholded at `minSim`. The "which record is this a retyping of"
    * primitive a survivorship/golden-record step consumes.
    *
    * Scale shape: candidates come from [[blockedCandidates]] (block
    * exchange, per-block self-join, oversized blocks excluded loudly);
    * the top-1 window partitions by the left id — bounded by that
    * record's block, never global. Ties break (sim desc, id_b asc) —
    * bit-deterministic because the kernel is. Output: (id_a, id_b,
    * name_a, name_b, jw). */
  def fuzzyBestMatch(records: DataFrame, idCol: String, blockCol: String,
      nameCol: String, minSim: Double,
      maxBlockSize: Int = 100000): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0,
      s"minSim must be in [0,1], got $minSim")
    val cand = blockedCandidates(records, idCol, blockCol, maxBlockSize)
    val scored = cand.select(col("id_a"), col("id_b"),
        col(s"${nameCol}_a").as("name_a"),
        col(s"${nameCol}_b").as("name_b"),
        graft.functions.FastStringSim.jaroWinkler(
          col(s"${nameCol}_a"), col(s"${nameCol}_b")).as("jw"))
      .where(col("jw") >= minSim)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("jw").desc, col("id_b"))
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1).drop("__rk")
  }
}
