package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed Merkle fingerprint of a dataset — the replication-audit
  * primitive: two copies of a 100 TB table compare by exchanging 2^k
  * bucket digests (and a root) instead of rows, and a mismatch names the
  * buckets to re-sync. Content-addressed, order-free: each row hashes to
  * a digest, the digest's own hex prefix assigns its bucket (so layout,
  * partitioning, and row order never matter), and each bucket chains its
  * digests in sorted order into one md5. The root chains the bucket
  * digests in bucket order.
  *
  * Scale shape: row digests are a codegen'd projection; ONE shuffle keyed
  * by bucket; per-bucket state is that bucket's digest list (tune
  * `bucketHexChars` up — 16^k buckets — to bound it; 100 TB of 1 KB rows
  * at k=4 is ~1.5M digests = ~50 MB per bucket). The chain replays in any
  * engine as a fold over the sorted list (md5 of hex-string concat).
  *
  * Callers must pass non-null `rowCols`; the canonical row string joins
  * values with the \\u0001 control byte (a separator that cannot appear in md5 hex or sane
  * keys), so column boundaries cannot alias. */
object Fingerprint {

  def datasetDigest(df: DataFrame, rowCols: Seq[String],
      bucketHexChars: Int = 2): DataFrame = {
    require(rowCols.nonEmpty, "need at least one row column")
    require(bucketHexChars >= 1 && bucketHexChars <= 8, s"k=$bucketHexChars")
    val parts = rowCols.map(c => col(c).cast("string"))
    val rowStr = concat_ws("\u0001", parts: _*)
    val digest = md5(rowStr)
    val chain = (l: Column) => aggregate(l, lit(""),
      (acc, x) => md5(concat(acc, x)))
    val buckets = df
      .select(substring(digest, 1, bucketHexChars).as("bucket"), digest.as("d"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        chain(array_sort(collect_list(col("d")))).as("digest"))
    val root = buckets
      .agg(sum(col("n_rows")).as("n_rows"),
        chain(transform(
          array_sort(collect_list(struct(col("bucket"), col("digest")))),
          s => s.getField("digest"))).as("digest"))
      .select(lit("ROOT").as("bucket"), col("n_rows"), col("digest"))
    buckets.unionByName(root)
  }
}
