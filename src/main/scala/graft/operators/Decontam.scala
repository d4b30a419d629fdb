package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Targeted decontamination MASKING — the repair step after detection:
  * instead of dropping every training document that overlaps the test
  * set (q89/q110 flag whole docs), null out ONLY the overlapping k-gram
  * windows and keep the rest of the document (the FineWeb/Stack-style
  * fine-grained policy — a 10k-token doc with one leaked benchmark
  * sentence keeps its other 9,990 tokens).
  *
  * Scale shape: the test-set shingle table collapses to ONE broadcast
  * sorted-array row; per-document masking is a PURE PROJECTION — flagged
  * positions, their k-wide shadows, and the token filter are all array
  * ops over the scan, so the corpus is never shuffled and there is no
  * per-span window anywhere (unlike [[Spans.maskDuplicatedSpans]], which
  * needs corpus-wide keep-first state; here the policy is mask EVERY
  * occurrence — test data never belongs in training). Membership probes
  * run through the O(log n) [[graft.functions.FastHash.sortedLookup]]
  * kernel, and every intermediate array is LET-BOUND through a
  * one-element transform lambda — CollapseProject would otherwise
  * inline the token split into each position probe and the flag filter
  * into each token check, an O(n^2) re-evaluation (the q138 lesson).
  */
object Decontam {

  /** Cross-source containment matrix — the governance readout behind
    * every per-document decontamination pass: for each ordered source
    * pair (a, b), the share of a's DISTINCT n-gram types that also
    * occur in b. A row of high off-diagonal containment means source
    * a is largely redistributed b content (mirror sites, scraped
    * re-posts) — the duplication structure BETWEEN feeds that
    * doc-level dedup statistics can't show.
    *
    * Exactness: pure distinct-type censuses and one integer ratio per
    * cell. Scale shape: one (gram → distinct sources) census; pairs
    * explode per gram bounded by (sources present)² — sources are a
    * catalog dimension (tens), so the worst gram contributes
    * |sources|² rows, never corpus². Output: (src_a, src_b, n_a,
    * n_shared, containment), all ordered pairs a ≠ b. */
  def sourceContainmentMatrix(docs: DataFrame, sourceCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val grams = docs.select(col(sourceCol).as("s"),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
      .distinct()
      .localCheckpoint(true)
    val sizes = grams.groupBy(col("s")).agg(count(lit(1)).as("n_types"))
    val pairs = grams.as("a")
      .join(grams.as("b"), col("a.g") === col("b.g") &&
        col("a.s") =!= col("b.s"))
      .groupBy(col("a.s").as("src_a"), col("b.s").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    sizes.select(col("s").as("src_a"), col("n_types").as("n_a"))
      .join(pairs, Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_a").cast("double"))
          .as("containment"))
  }

  /** Evaluate `bound` once and feed it to `body` (lambda variables are
    * materialized per row, immune to projection collapse). */
  private def let(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Mask every k-gram of `df` that appears in `testDocs`. Output:
    * (doc_id, n_tok, n_masked, kept_text) where kept_text re-joins the
    * surviving tokens in order (tokens under any flagged k-window drop). */
  def maskContaminated(df: DataFrame, idCol: String, textCol: String,
      testDocs: DataFrame, testTextCol: String, k: Int = 8): DataFrame = {
    require(k >= 2, s"k=$k")
    val testSet = testDocs
      .select(explode(Dedup.rawShingles(
        split(lower(trim(col(testTextCol))), "\\s+"), k)).as("g"))
      .distinct()
      .agg(sort_array(collect_list(col("g"))).as("tks"))
      // aligned dummy values: the binary-search kernel returns a double,
      // IS NOT NULL is the membership test
      .withColumn("tvs", expr("transform(tks, x -> cast(0.0 as double))"))
    val result = let(split(lower(trim(col(textCol))), "\\s+")) { ts =>
      // positions (1-based) whose k-gram starting there is contaminated;
      // docs under k tokens have NO positions — sequence(1, 0) would
      // count DOWN (the Spans guard), so branch to an empty array
      val positions = when(size(ts) >= k, sequence(lit(1), size(ts) - (k - 1)))
        .otherwise(array().cast("array<int>"))
      val flagged = filter(positions,
        i => graft.functions.FastHash.sortedLookup(col("tks"), col("tvs"),
          concat_ws(" ", slice(ts, i, lit(k)))).isNotNull)
      let(flagged) { fl =>
        let(filter(
          transform(ts, (t, j) =>
            when(exists(fl, p => j + 1 >= p && j + 1 <= p + (k - 1)),
              lit(null)).otherwise(t)),
          t => t.isNotNull)) { kept =>
          struct(
            size(ts).cast("long").as("n_tok"),
            (size(ts) - size(kept)).cast("long").as("n_masked"),
            concat_ws(" ", kept).as("kept_text"))
        }
      }
    }
    df.select(col(idCol).as("doc_id"), col(textCol))
      .crossJoin(broadcast(testSet))
      .withColumn("r", result)
      .select(col("doc_id"), col("r.n_tok").as("n_tok"),
        col("r.n_masked").as("n_masked"), col("r.kept_text").as("kept_text"))
  }
}
