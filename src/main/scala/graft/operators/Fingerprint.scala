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

  /** Merkle-NARROWED snapshot diff — how two 100 TB versions of a keyed
    * table compare without a table-wide row join: bucket BY KEY HASH
    * (not row content, so an edited row stays in its bucket and reads as
    * `changed`, never as remove+add), exchange the 16^k bucket digests,
    * and run the row-level full-outer diff ONLY inside buckets whose
    * digests disagree. A matching bucket digest PROVES the bucket
    * identical (same keys, same content — the md5 chain covers both), so
    * clean buckets cost one digest row each and zero row traffic; the
    * row join touches |dirty| buckets ≈ the edit volume, not the table.
    *
    * Output is one summary row: total/dirty bucket counts and the
    * added / removed / changed / unchanged-in-dirty row census —
    * spec-asserted equal to the naive full-outer diff of the whole
    * table. All counts integral; digests are md5 hex, so any engine
    * replays the narrowing decision itself. */
  def diffSummary(v1: DataFrame, v2: DataFrame, idCol: String,
      rowCols: Seq[String], bucketHexChars: Int = 2): DataFrame = {
    require(rowCols.nonEmpty, "need at least one row column")
    def keyed(df: DataFrame): DataFrame = df.select(
      col(idCol).cast("string").as("id"),
      substring(md5(col(idCol).cast("string")), 1, bucketHexChars).as("bucket"),
      md5(concat_ws("\u0001", rowCols.map(c => col(c).cast("string")): _*)).as("d"))
    val chain = (l: Column) => aggregate(l, lit(""),
      (acc, x) => md5(concat(acc, x)))
    def bucketed(df: DataFrame): DataFrame =
      df.groupBy("bucket").agg(chain(array_sort(collect_list(col("d")))).as("bd"))
    val (k1, k2) = (keyed(v1), keyed(v2))
    val dirty = bucketed(k1).withColumnRenamed("bd", "bd1")
      .join(bucketed(k2).withColumnRenamed("bd", "bd2"), Seq("bucket"), "full_outer")
      .withColumn("is_dirty", coalesce(col("bd1") =!= col("bd2"), lit(true)))
    val dirtyBuckets = dirty.where(col("is_dirty")).select("bucket")
    // row-level diff restricted to dirty buckets (broadcast semi-join —
    // the dirty list is edit-volume sized, the clean bulk never joins)
    val r1 = k1.join(broadcast(dirtyBuckets), Seq("bucket"), "left_semi")
    val r2 = k2.join(broadcast(dirtyBuckets), Seq("bucket"), "left_semi")
    val rowDiff = r1.withColumnRenamed("d", "d1")
      .join(r2.withColumnRenamed("d", "d2").drop("bucket"), Seq("id"), "full_outer")
      .select(
        when(col("d1").isNull, "added")
          .when(col("d2").isNull, "removed")
          .when(col("d1") =!= col("d2"), "changed")
          .otherwise("same").as("status"))
    val bucketCensus = dirty.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("is_dirty").cast("long")).as("n_dirty_buckets"))
    val rowCensus = rowDiff.agg(
      coalesce(sum((col("status") === "added").cast("long")), lit(0L)).as("n_added"),
      coalesce(sum((col("status") === "removed").cast("long")), lit(0L)).as("n_removed"),
      coalesce(sum((col("status") === "changed").cast("long")), lit(0L)).as("n_changed"),
      coalesce(sum((col("status") === "same").cast("long")), lit(0L)).as("n_same_in_dirty"))
    bucketCensus.crossJoin(broadcast(rowCensus))
  }
}
