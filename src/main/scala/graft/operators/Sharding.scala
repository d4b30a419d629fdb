package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard assignment — the
  * consistent-placement primitive a 100 TB corpus store needs when the
  * shard count changes: every key independently picks the shard with
  * the highest hash weight, so growing n → n+1 moves only ~1/(n+1) of
  * the keys (mod-hashing moves ~n/(n+1) — nearly everything, a full
  * re-shuffle of the corpus).
  *
  * Determinism: the weight of (key, shard) is the md5 hex digest of
  * "key:shard" — a pure string function both engines compute
  * identically — and the argmax is the lexicographically greatest
  * (digest, shard) pair, a total order with no float anywhere.
  *
  * Scale shape: assignment is a PURE PROJECTION — an n-element HOF
  * fold per row (n = shard count, a constant), no join, no shuffle,
  * no row blow-up; the corpus never materializes a (key × shard)
  * grid. Censuses downstream aggregate on the tiny shard key. */
object Sharding {

  /** Appends `outCol`: the rendezvous shard (0..nShards-1) of
    * `keyCol` under `nShards` shards. */
  def rendezvousShard(df: DataFrame, keyCol: String, nShards: Int,
      outCol: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn(outCol, rendezvousExpr(col(keyCol), nShards))
  }

  /** The argmax-by-(md5, shard) fold as a column expression. */
  def rendezvousExpr(key: Column, nShards: Int): Column = {
    val ks = key.cast("string")
    // fold over shards 0..n-1 carrying the best (digest, shard) pair;
    // strict '>' on the digest plus ascending shard ids makes the
    // tiebreak (identical digests cannot happen, but the order is
    // total regardless) deterministic
    aggregate(
      transform(sequence(lit(0), lit(nShards - 1)),
        s => struct(md5(concat(ks, lit(":"), s.cast("string"))).as("h"),
          s.cast("int").as("s"))),
      struct(lit("").as("h"), lit(-1).as("s")),
      (acc, e) => when(e.getField("h") > acc.getField("h"), e).otherwise(acc)
    ).getField("s")
  }

  /** Resharding census: for each CURRENT shard (under `nFrom`), how
    * many keys it holds and how many of those move when the cluster
    * grows to `nTo` shards — the capacity-planning readout that makes
    * the rendezvous-vs-mod difference visible. Output: (shard, n_keys,
    * n_moved, n_moved_mod), where n_moved_mod counts the same keys
    * under naive `hash mod n` placement (first 15 hex digits of the
    * md5 as the integer key — exact in a long). One census aggregation
    * on the shard id; everything upstream is projection. */
  def reshardCensus(df: DataFrame, keyCol: String, nFrom: Int,
      nTo: Int): DataFrame = {
    val ks = col(keyCol).cast("string")
    val modKey = conv(substring(md5(ks), 1, 15), 16, 10).cast("long")
    df.select(
        rendezvousExpr(col(keyCol), nFrom).as("shard"),
        rendezvousExpr(col(keyCol), nTo).as("__to"),
        (modKey % nFrom).cast("int").as("__m_from"),
        (modKey % nTo).cast("int").as("__m_to"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("shard") =!= col("__to"), 1L).otherwise(0L)).as("n_moved"),
        sum(when(col("__m_from") =!= col("__m_to"), 1L).otherwise(0L))
          .as("n_moved_mod"))
  }
}
