package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing assignment for training-data pipelines: the
  * concat-and-chunk discipline (documents concatenated in a deterministic
  * order, then cut into fixed ctx-token windows) that LLM pre-training
  * batchers use. q92 reports the padding waste a naive one-doc-per-sequence
  * batcher would pay; this operator emits the actual packed layout — which
  * context window each document starts and ends in — so a downstream
  * tokenizer can materialize sequences without a driver-side pass.
  *
  * Scale shape: the cumulative offset is a window partitioned by the
  * stream column (language / source shard), never a global sort — each
  * stream sorts independently, so the plan holds when streams are many and
  * bounded (the 100 TB layout: one packing stream per (lang, shard)).
  */
object Packing {

  /** Assigns each row a [seq_start, seq_end] window range inside its
    * stream. Order within a stream is (tokCol DESC, idCol) — deterministic
    * and groups long docs together, which minimizes boundary crossings.
    * `seq_end - seq_start` is the number of chunk boundaries the document
    * straddles (0 = fits inside one window's remainder).
    */
  def concatChunkAssign(df: DataFrame, idCol: String, streamCol: String,
      tokCol: String, ctx: Int): DataFrame = {
    require(ctx > 0, "ctx must be positive")
    val w = Window.partitionBy(col(streamCol))
      .orderBy(col(tokCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_offset", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("seq_start", expr(s"_offset div $ctx"))
      .withColumn("seq_end",
        expr(s"(_offset + greatest($tokCol, 1) - 1) div $ctx"))
      .drop("_offset")
  }

  /** Materializes the [[concatChunkAssign]] layout into actual ctx-token
    * training sequences: every document contributes the slice of its
    * tokens that falls in each context window it straddles; window
    * assembly is ONE shuffle keyed by (stream, window) moving exactly
    * the tokens that window contains (the minimal data movement any
    * assembler can do), then an order-stable concat. Output one row per
    * window: (stream, seq, n_parts, win_tokens, win_text).
    *
    * Whitespace tokens here (assignment cost model can stay BPE-ish via
    * [[concatChunkAssign]]'s tokCol; materialization needs the literal
    * tokens).
    */
  def concatChunkMaterialize(df: DataFrame, idCol: String, streamCol: String,
      textCol: String, ctx: Int): DataFrame = {
    require(ctx > 0, "ctx must be positive")
    val toks = split(trim(col(textCol)), "\\s+")
    val base = df.select(col(idCol).as("_id"), col(streamCol).as("stream"),
      toks.as("toks"), org.apache.spark.sql.functions.size(toks).cast("long").as("n"))
    // same running offset as concatChunkAssign (which drops it), kept
    // here because the slice bounds need it
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("stream"))
      .orderBy(col("n").desc, col("_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withOff = base.withColumn("off", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("seq_start", expr(s"off div $ctx"))
      .withColumn("seq_end", expr(s"(off + greatest(n, 1) - 1) div $ctx"))
    val parts = withOff
      .select(col("stream"), col("off"), col("n"), col("toks"),
        explode(sequence(col("seq_start"), col("seq_end"))).as("seq"))
      .withColumn("gs", greatest(col("seq") * ctx, col("off")))
      .withColumn("ge", least((col("seq") + 1) * ctx, col("off") + col("n")))
      .withColumn("part", array_join(
        slice(col("toks"), (col("gs") - col("off") + 1).cast("int"),
          (col("ge") - col("gs")).cast("int")), " "))
    parts.groupBy(col("stream"), col("seq"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("ge") - col("gs")).as("win_tokens"),
        array_join(transform(
          sort_array(collect_list(struct(col("off"), col("part")))),
          x => x.getField("part")), " ").as("win_text"))
  }

  /** Sliding-window token chunking (the fine-tuning-side counterpart of
    * concat-and-chunk): each document explodes into `size`-token chunks
    * every `stride` tokens (stride < size ⇒ overlapping context). All
    * array work happens inside one codegen'd projection (split /
    * sequence / slice HOFs) followed by posexplode — no shuffle at all;
    * at 100 TB this is a pure map stage that scales with input splits.
    * Output: (id, chunk_ix, start, n_tok, chunk) — chunk as the joined
    * token string so downstream fingerprinting (md5) is one call.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val toks = split(trim(col(textCol)), "\\s+")
    val nToks = org.apache.spark.sql.functions.size(toks)
    val starts = sequence(lit(0), greatest(nToks - 1, lit(0)), lit(stride))
    val chunks = transform(starts, s => {
      val piece = slice(toks, s + 1, lit(size))
      struct(s.as("start"),
        org.apache.spark.sql.functions.size(piece).as("n_tok"),
        array_join(piece, " ").as("chunk"))
    })
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_ix", "c")))
      .select(col(idCol), col("chunk_ix"),
        col("c.start").as("start"), col("c.n_tok").as("n_tok"),
        col("c.chunk").as("chunk"))
  }
}
