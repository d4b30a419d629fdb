package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level exact dedup: find maximal token spans (>= k tokens)
  * that appear in MORE THAN ONE document — the C4/MassiveText "remove the
  * repeated 50-token boilerplate inside otherwise-distinct docs" operator
  * (Lee et al. 2022 suffix-array dedup, re-expressed as a bounded
  * shingle-run detection that Spark — and a SQL oracle — can replay).
  *
  * Doc-level exact dedup (Dedup.exactDups) misses these entirely and
  * near-dup LSH only flags whole documents; this is the third granularity
  * a training pipeline needs.
  *
  * Algorithm (all linear, no all-pairs anywhere):
  *   1. positional k-gram table: one row per (doc, pos) — (doc_id, pos,
  *      gh, gram) where gh = xxhash64(gram);
  *   2. census + filter in ONE (gh, gram)-keyed exchange: a k-gram is
  *      `duplicated` iff its (gh, gram) window count exceeds its
  *      (gh, gram, doc_id) sub-window count (>= 2 distinct docs) — the
  *      sub-window reuses the same partitioning, and the gram string in
  *      the key keeps the census EXACT under 64-bit collisions;
  *   3. gaps-and-islands per doc (pos - row_number over the per-doc pos
  *      order): a run of R consecutive duplicated positions is one
  *      maximal duplicated span of R + k - 1 tokens.
  *
  * Scale: exactly two linear shuffles — positions once by (gh, gram) for
  * the census, once by doc_id for the islands (the per-doc window is
  * bounded by document length). A gram duplicated across millions of
  * docs makes a large census window partition; Spark's window spills,
  * and the count-only frame keeps per-row state constant. At 100 TB the
  * gram string could be dropped from the shuffle (hash-only keys +
  * post-hoc collision verification) — kept because exactness is the
  * contract and the string rides only k tokens per row.
  */
object Spans {

  /** One row per maximal cross-doc duplicated span:
    * (doc_id, span_start, span_tokens) — span_start is the 1-based token
    * position, span_tokens >= k. Tokenization: whitespace split of
    * lower(trim(text)) (pipeline-wide convention). */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"span gram size k=$k must be >= 2")
    val toks = df.select(col(idCol).as("doc_id"),
      split(lower(trim(col(textCol))), "\\s+").as("toks"))
    // guard: sequence(0, negative) would count DOWN — docs shorter than k
    // contribute no positions and must be filtered before the sequence.
    // Positional grams deliberately do NOT reuse Dedup.rawShingles: its
    // k-fold zip_with re-concatenates partial strings (O(k²·len) char
    // copies), while one concat_ws per position over a reference-copied
    // slice is O(k·len) — measured 1.2x faster here at sf0.1 (k=15)
    val pos = toks.where(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks) - $k), i -> concat_ws(' ', slice(toks, i + 1, $k)))"))
        .as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        xxhash64(col("gram")).as("gh"), col("gram"))
    // census via two stacked count windows over ONE exchange: a gram is
    // cross-doc duplicated iff its (gh, gram) group count exceeds its
    // (gh, gram, doc_id) sub-group count. hashpartitioning(gh, gram)
    // satisfies the sub-window's clustering too, so the positional table
    // shuffles once — the distinct+groupBy+join formulation shuffled it
    // three times (measured 1.6x slower at sf0.1: q118 1.78 -> 1.11 s,
    // q119 2.54 -> 1.56 s)
    val posW = Window.partitionBy(col("gh"), col("gram"))
    val posDocW = Window.partitionBy(col("gh"), col("gram"), col("doc_id"))
    val dupPos = pos
      .withColumn("_n", count(lit(1)).over(posW))
      .withColumn("_nd", count(lit(1)).over(posDocW))
      .where(col("_n") > col("_nd"))
      .drop("_n", "_nd")
    val island = col("pos") -
      row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos")))
    dupPos.withColumn("island", island)
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (count(lit(1)) + lit(k - 1)).cast("long").as("span_tokens"))
      .select(col("doc_id"), col("span_start"), col("span_tokens"))
  }

  /** Apply step: null out (mask) every duplicated span except its first
    * occurrence corpus-wide, returning (doc_id, kept_text) — the Lee et
    * al. policy "keep one copy of the span". First occurrence = smallest
    * (doc_id, span_start), grouped by MAXIMAL-SPAN CONTENT: if the same
    * duplicated material has different maximal extents in different docs
    * (one doc's island extends an extra token), those occurrences carry
    * distinct span texts and each extent keeps its own first copy.
    * Token-precise: the masked doc re-assembles from its kept token
    * ranges, preserving original token order. */
  def maskDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, k)
    // first corpus-wide occurrence of each island KEEPS its text; later
    // docs drop the span. Two spans are "the same" if their covered gram
    // run hashes equal — recompute the span text to key on content.
    val toks = df.select(col(idCol).as("doc_id"),
      split(lower(trim(col(textCol))), "\\s+").as("toks"))
    val withText = spans.join(toks, "doc_id")
      .withColumn("span_text",
        expr("concat_ws(' ', slice(toks, cast(span_start as int), cast(span_tokens as int)))"))
    // first occurrence via min(struct) — partial-aggregatable, so a
    // boilerplate span occurring in millions of docs map-side combines
    // instead of funneling through one row_number window partition
    val firstOcc = withText.groupBy(col("span_text"))
      .agg(min(struct(col("doc_id"), col("span_start"))).as("first"))
    val drops = withText.join(firstOcc, Seq("span_text"))
      .where(!(col("doc_id") === col("first.doc_id") &&
        col("span_start") === col("first.span_start")))
      .select(col("doc_id"), col("span_start"), col("span_tokens"))
    val dropRanges = drops.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_tokens"))).as("cuts"))
    toks.join(dropRanges, Seq("doc_id"), "left")
      .withColumn("kept_text", expr(
        """concat_ws(' ', filter(transform(toks, (t, i) ->
          |  CASE WHEN cuts IS NULL THEN t
          |       WHEN exists(cuts, c -> i + 1 >= c.span_start AND i + 1 < c.span_start + c.span_tokens)
          |       THEN NULL ELSE t END), t -> t IS NOT NULL))""".stripMargin))
      .select(col("doc_id"), col("kept_text"))
  }
}
