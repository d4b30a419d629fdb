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
    * sorted). Docs with fewer than k tokens have no grams -> empty.
    * Runs the codegen'd one-pass kernel ([[graft.functions.FastHash
    * .winnowFpsValue]]); [[declarativeFingerprints]] is the HOF
    * formulation it is cross-checked against. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    df.select(col(idCol).as("doc_id"),
      greatest(size(toks) - (k - 1), lit(0)).cast("long").as("n_grams"),
      graft.functions.FastHash.winnowFps(col(textCol), k, w).as("fps"))
  }

  /** The declarative formulation of [[fingerprints]] — kept as the
    * kernel's executable specification (WinnowSpec asserts value
    * identity). The hash array is LET-BOUND through a one-element
    * transform lambda: CollapseProject would otherwise inline the
    * md5-of-every-gram expression into every window reference below —
    * re-hashing the doc once per window, O(n^2) md5 work (measured 70s
    * for the sf0.1 census; 1.5s with the binding). */
  private[graft] def declarativeFingerprints(df: DataFrame, idCol: String,
      textCol: String, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = Dedup.rawShingles(toks, k)
    def overHs(body: Column => Column): Column =
      element_at(transform(array(transform(grams, g => md5(g))), body), 1)
    df.select(col(idCol).as("doc_id"),
        greatest(size(toks) - (k - 1), lit(0)).cast("long").as("n_grams"),
        overHs(hs =>
          when(size(hs) === 0, array().cast("array<string>"))
            .otherwise(array_sort(array_distinct(
              transform(sequence(lit(0), greatest(size(hs) - w, lit(0))),
                j => array_min(slice(hs, j + 1, lit(w)))))))).as("fps"))
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
    // per-doc stats ride the exploded stream so the fingerprint
    // selection is evaluated once per branch (Catalyst recomputes shared
    // subtrees per consumer — a production run would persist this table)
    val occ = fp.select(col("doc_id"), col("n_grams"),
      size(col("fps")).cast("long").as("n_fp"),
      explode_outer(col("fps")).as("fp"))
    // fps are distinct per doc, so count(*) per fp == distinct docs
    val shared = occ.where(col("fp").isNotNull).groupBy(col("fp"))
      .agg(count(lit(1)).as("fp_docs"))
      .where(col("fp_docs") >= 2)
    occ.join(shared.select(col("fp"), lit(true).as("_shared")), Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(first(col("n_grams")).as("n_grams"),
        first(col("n_fp")).as("n_fp"),
        sum(when(col("_shared"), 1L).otherwise(0L)).as("n_shared_fp"))
  }
}
