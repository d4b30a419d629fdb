package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): hash every k-token gram, slide a window of `w`
  * hashes, keep each window's MINIMUM — guaranteeing any shared run of
  * >= w + k - 1 tokens between two documents shares at least one
  * fingerprint, while selecting only ~2/(w+1) of all grams.
  *
  * This is the cheap tier of substring-level dup detection: [[Spans]]
  * shuffles EVERY positional gram (exact, token-precise extents);
  * winnowing shuffles the fingerprint subset — a 4-8x shuffle-volume
  * reduction at w = 8 — and still cannot miss a long shared passage.
  * Pipelines run winnowing as the corpus-wide screen and the exact span
  * detector on the flagged pairs.
  *
  * Hashes are md5 STRINGS compared lexicographically: winnowing needs
  * only a total order on gram hashes, and md5 is the one hash family
  * both engines evaluate identically (the q91/q123 precedent), which
  * keeps the whole operator oracle-replayable — no xxhash equivalence
  * sibling needed. Per-doc work is a pure projection; the only shuffle
  * is the (fingerprint)-keyed census.
  */
object Winnow {

  /** Per-doc fingerprint selection. Output: input id column plus
    * `n_grams`, `fps array<string>` (DISTINCT selected md5 hashes,
    * sorted). Docs with fewer than k tokens have no grams -> empty. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = Dedup.rawShingles(toks, k)
    df.select(col(idCol).as("doc_id"),
        transform(grams, g => md5(g)).as("hs"))
      .withColumn("n_grams", size(col("hs")).cast("long"))
      .withColumn("fps",
        when(col("n_grams") === 0, array().cast("array<string>"))
          .otherwise(array_sort(array_distinct(
            transform(sequence(lit(0), greatest(size(col("hs")) - w, lit(0))),
              j => array_min(slice(col("hs"), j + 1, lit(w))))))))
      .select(col("doc_id"), col("n_grams"), col("fps"))
  }

  /** Cross-doc screen: per doc, how many of its fingerprints appear in
    * at least one OTHER doc — the candidate signal the exact span
    * detector ([[Spans]]) verifies. One explode + one (fp)-keyed census
    * (map-side combined); the hot set crosses back as a join on the
    * fingerprint key, never a doc-side reshuffle of text. Output:
    * (doc_id, n_grams, n_fp, n_shared_fp). */
  def sharedFingerprintCensus(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 8): DataFrame = {
    val fp = fingerprints(df, idCol, textCol, k, w)
    val occ = fp.select(col("doc_id"), explode(col("fps")).as("fp"))
    val shared = occ.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("fp_docs"))
      .where(col("fp_docs") >= 2)
    val perDoc = occ.join(shared, Seq("fp"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared_fp"))
    fp.select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fp"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_shared_fp", coalesce(col("n_shared_fp"), lit(0L)))
  }
}
