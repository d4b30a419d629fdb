package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level EXACT deduplication, corpus-wide keep-first (the
  * RefinedWeb / Lee et al. "deduplicate at paragraph granularity" stage):
  * every repeated paragraph loses all occurrences except the first
  * (smallest (doc_id, position)), wherever it recurs — including inside
  * the SAME document. Complements [[Boilerplate]] (which drops only
  * lines above a document-frequency threshold) and [[Spans]] (which
  * detects duplicated token runs ACROSS paragraph boundaries): this is
  * the cheap digest-keyed pass pipelines run first.
  *
  * Scale shape: the only shuffle of the corpus is the (digest) keyed
  * keep-first aggregation, and the shuffle rows are (digest, doc_id, pos)
  * — 16-byte keys, never the text. Keep-first = min(struct) — partial-
  * aggregatable, so a paragraph repeated in millions of docs map-side
  * combines instead of funneling one hot key through a window (the q119
  * span-mask pattern). Reassembly is an order-preserving higher-order
  * projection against the doc's own drop list.
  */
object Paragraphs {

  /** Dedup paragraphs (split on `sep`); paragraphs shorter than
    * `minChars` (after trim) never participate — they are kept verbatim.
    * Output: (doc_id, n_paras, n_dropped, kept_text) where kept_text
    * re-joins the surviving paragraphs with `sep` in original order. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minChars: Int = 1): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
      split(col(textCol), java.util.regex.Pattern.quote(sep)).as("paras"))
    val occ = docs.select(col("doc_id"), posexplode(col("paras")).as(Seq("pos", "para")))
      .where(length(trim(col("para"))) >= minChars)
      .select(col("doc_id"), col("pos"), md5(col("para")).as("digest"))
    val firstOcc = occ.groupBy(col("digest"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    val drops = occ.join(firstOcc, Seq("digest"))
      .where(!(col("doc_id") === col("first.doc_id") &&
        col("pos") === col("first.pos")))
      .groupBy(col("doc_id"))
      .agg(collect_list(col("pos")).as("cuts"))
    docs.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("paras")).cast("long").as("n_paras"),
        // size(NULL) = -1 with ANSI off (legacy sizeOfNull) — branch, not coalesce
        when(col("cuts").isNull, lit(0)).otherwise(size(col("cuts")))
          .cast("long").as("n_dropped"),
        concat_ws(sep,
          filter(
            transform(col("paras"), (p, i) =>
              when(col("cuts").isNotNull && array_contains(col("cuts"), i), lit(null))
                .otherwise(p)),
            p => p.isNotNull)).as("kept_text"))
  }
}
