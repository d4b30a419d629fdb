package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span-corruption pairs (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning..."): mask contiguous token spans, emit
  * the corrupted input with numbered sentinels and the target that
  * restores the masked spans —
  *   input:  "the <extra_id_0> sat <extra_id_1> mat"
  *   target: "<extra_id_0> cat <extra_id_1> on the"
  * the data-side half of denoising-LM training, as a corpus operator.
  *
  * Determinism (the q91 md5 discipline): token i of doc d is masked iff
  * the first two hex chars of md5(d || ':' || i div span) clear the
  * probability threshold — seeded, partition-stable, replayable by any
  * engine with md5. Masking whole `span`-token blocks makes every mask
  * decision PER-ROW arithmetic (a span's membership needs no neighbor
  * state: the previous token's mask is just the hash of ITS block), so
  * span starts, sentinel numbering and both output strings come from
  * one doc-partitioned cumulative window — no sequential fold at all.
  * Adjacent masked blocks merge into one span (rising-edge count), the
  * fixed-span simplification of T5's sampled span lengths (documented).
  *
  * Scale shape: one explode to (doc, pos, token) rows (map-side), one
  * doc-keyed window for the sentinel cumsum, one doc-keyed aggregation
  * rebuilding the strings in position order. Nothing global. */
object SpanCorruption {

  /** Output: (doc_id, input, target, n_tokens, n_masked, n_spans).
    * `threshold` is the two-hex-char mask gate ("28" ~ 15.6%); `span`
    * the block size in tokens. */
  def corrupt(df: DataFrame, idCol: String, textCol: String,
      span: Int = 3, threshold: String = "28"): DataFrame = {
    require(span > 0, s"span must be positive: $span")
    require(threshold.matches("[0-9a-f]{2}"),
      s"threshold must be two lowercase hex chars: $threshold")
    val toks = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
      .where(length(col("tok")) > 0)
    def blockMasked(posExpr: String) =
      substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        expr(s"cast(($posExpr) div $span as string)"))), 1, 2) < threshold
    val marked = toks
      .withColumn("m", blockMasked("pos"))
      // the previous token's mask is the hash of ITS block — plain
      // arithmetic, no lag window needed
      .withColumn("rise", col("m") &&
        (col("pos") === 0 || !blockMasked("pos - 1")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pieces = marked
      .withColumn("k", sum(when(col("rise"), 1L).otherwise(0L)).over(w) - 1L)
      .withColumn("piece_in",
        when(col("rise"), concat(lit("<extra_id_"), col("k"), lit(">")))
          .when(col("m"), lit(null))
          .otherwise(col("tok")))
      .withColumn("piece_tgt",
        when(col("rise"),
          concat(lit("<extra_id_"), col("k"), lit("> "), col("tok")))
          .when(col("m"), col("tok"))
          .otherwise(lit(null)))
    pieces.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("rise"), 1L).otherwise(0L)).as("n_spans"),
        array_sort(collect_list(struct(col("pos"), col("piece_in")))).as("__i"),
        array_sort(collect_list(struct(col("pos"), col("piece_tgt")))).as("__t"))
      .select(col("doc_id"),
        expr("array_join(filter(transform(__i, e -> e.piece_in), x -> x IS NOT NULL), ' ')")
          .as("input"),
        expr("array_join(filter(transform(__t, e -> e.piece_tgt), x -> x IS NOT NULL), ' ')")
          .as("target"),
        col("n_tokens"), col("n_masked"), col("n_spans"))
  }
}
