package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) for chunk-level dedup storage — the
  * rsync/FastCDC boundary idea at token granularity. Fixed-width chunking
  * breaks on any insertion (every downstream chunk shifts and re-hashes);
  * CDC boundaries are a pure function of local content
  * ([[graft.functions.FastHash.cdcChunksValue]]: split after tokens whose
  * md5 opens below a nibble threshold), so an edit disturbs only the
  * chunk it lands in. At 100 TB this is what makes a crawl re-ingest
  * incremental: unchanged chunk digests are recognized corpus-wide and
  * stored once.
  *
  * Reference behavior generalized: the reference stores whole documents
  * keyed by content (`enrichment-trigger/main.py` Firestore doc sink);
  * CDC is the sub-document version of the same content-keyed dedup.
  *
  * Scale shape: the chunker is a codegen'd one-pass kernel inside the
  * scan projection (no shuffle); the census aggregates by chunk digest —
  * one map-side-combined shuffle keyed on md5, uniformly distributed by
  * construction.
  */
object Chunker {

  /** Explodes each document into its content-defined chunks:
    * (idCol, chunk_idx, chunk, chunk_tokens, digest). */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      boundaryNibbles: Int = 2): DataFrame = {
    df.select(col(idCol),
        posexplode(graft.functions.FastHash.cdcChunks(col(textCol), boundaryNibbles))
          .as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx"), col("chunk"),
        size(split(col("chunk"), " ")).cast("long").as("chunk_tokens"),
        md5(col("chunk")).as("digest"))
  }

  /** Dedup-storage census by chunk width: for every chunk-token width,
    * how many chunk instances the corpus holds, how many distinct chunk
    * contents that is, and how many instances dedup storage would NOT
    * re-store (`dup_occurrences` = instances beyond each digest's first).
    */
  def chunkDedupCensus(df: DataFrame, idCol: String, textCol: String,
      boundaryNibbles: Int = 2): DataFrame = {
    val perDigest = contentDefinedChunks(df, idCol, textCol, boundaryNibbles)
      .groupBy(col("digest"), col("chunk_tokens"))
      .agg(count(lit(1)).as("occ"))
    perDigest.groupBy(col("chunk_tokens"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("occ")).as("n_chunks"),
        (sum(col("occ")) - count(lit(1))).as("dup_occurrences"))
  }
}
