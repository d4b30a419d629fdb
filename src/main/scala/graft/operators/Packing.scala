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
