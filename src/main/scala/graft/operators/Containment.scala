package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Asymmetric containment detection — the near-dup class symmetric
  * Jaccard is BLIND to: a 40-token passage quoted inside a 500-token
  * page has Jaccard ≈ 0.08 (MinHash-LSH never fires) but containment
  * |S(A) ∩ S(B)| / |S(A)| ≈ 0.9, where S is the distinct k-token
  * shingle set. The quotation/excerpt/wrapper detector a training
  * corpus needs alongside [[Dedup]]'s symmetric family.
  *
  * Shape: distinct (doc, shingle) pairs → a shingle-keyed self-join →
  * per-pair intersection counts → the rational threshold
  * `inter·den ≥ num·|S(A)|` (integer cross-multiplication, no float
  * compare). Two skew/scale controls, both part of the SEMANTICS and
  * replayed by the oracle:
  *  - shingles with document frequency > `dfCap` are excluded from
  *    matching — a ubiquitous boilerplate shingle is not quotation
  *    evidence, and capping df bounds the join's blow-up at cap² rows
  *    per shingle (the [[InvertedIndex]] band-filter move);
  *  - |S(A)| counts ALL of A's shingles (df-1 shingles cannot match
  *    but still belong to the denominator — dropping them would
  *    inflate containment of unique-heavy docs).
  * Shingles travel as md5 hex (engine-replayable, uniform join keys);
  * pairs are directional — (A in B) and (B in A) score separately. */
object Containment {

  private def shingleCol(textCol: Column, k: Int): Column = {
    val toks = split(lower(trim(textCol)), "\\s+")
    transform(sequence(lit(0), size(toks) - k),
      i => md5(concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
  }

  /** Directional pairs with containment ≥ tauNum/tauDen. Docs with
    * fewer than k tokens carry no shingles and never pair. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, tauNum: Int = 4, tauDen: Int = 5,
      dfCap: Int = 50): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"tau=$tauNum/$tauDen")
    // materialize ONCE (eager localCheckpoint, the Dedup/q170 lesson):
    // sh feeds doc sizes, the shingle-df census AND both sides of the
    // intersection self-join — without the checkpoint each consumer
    // re-runs tokenize+shingle+md5+explode+distinct (measured 10.3 s →
    // 4.6 s for q221 at sf0.1)
    val sh = df
      .where(size(split(lower(trim(col(textCol))), "\\s+")) >= k)
      .select(col(idCol).cast("long").as("id"),
        explode(shingleCol(col(textCol), k)).as("s"))
      .distinct()
      .localCheckpoint(true)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val rare = sh.join(
      sh.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") <= dfCap),
      Seq("s"), "left_semi")
    // the intersection count is SYMMETRIC (|S(A)∩S(B)| = |S(B)∩S(A)|),
    // so the self-join enumerates each unordered pair ONCE (id_a <
    // id_b — half the rows through the per-pair census; r14, guide
    // §2.3). Both docs' sizes join onto the ONE unordered row and the
    // two directional scorings explode out of it afterwards — a union
    // of two references to the half census would re-plan (and re-run)
    // the whole self-join subtree twice. Directional semantics are
    // untouched: each orientation still thresholds against its own
    // |S(A)|.
    val interHalf = rare.select(col("id").as("id_a"), col("s"))
      .join(rare.select(col("id").as("id_b"), col("s")), Seq("s"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    interHalf
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .select(explode(array(
        struct(col("id_a"), col("id_b"), col("inter"),
          col("n_a").as("n")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b"),
          col("inter"), col("n_b").as("n")))).as("__d"))
      .select(col("__d.id_a").as("id_a"), col("__d.id_b").as("id_b"),
        col("__d.inter").as("inter"), col("__d.n").as("n_a"))
      .where(col("inter") * tauDen >= lit(tauNum) * col("n_a"))
      .withColumn("containment",
        col("inter").cast("double") / col("n_a").cast("double"))
  }
}
