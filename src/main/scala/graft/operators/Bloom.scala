package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi-join — the decontamination shape at
  * 100 TB. A plain left-semi join ships every (key, id) pair of the big
  * side into a shuffle (or relies on the small side fitting a broadcast
  * hash table of raw keys). When the filter set is large-ish (every
  * 8-gram of a benchmark suite: 10^8 keys) the compact alternative is a
  * bloom filter: ~1.2 bytes/key at 1% fpp, built in one pass, broadcast
  * once, probed map-side with zero shuffle; the surviving sliver (true
  * matches + fpp false positives) then pays the exact semi-join. The
  * composition is EXACTLY equal to the plain semi-join — bloom filters
  * have no false negatives, and the verify join removes the false
  * positives — which is what the q110 oracle checks cross-engine.
  */
object Bloom {

  /** `left` rows whose `keyCol` (a LONG key — hash text first) appears in
    * `right.keyCol`, computed as bloom-prefilter + exact left-semi
    * verify. Result set identical to `left SEMI JOIN right USING key`.
    *
    * The probe is a codegen'd expression ([[graft.functions.FastHash
    * .bloomProbe]]), so the big side's scan+filter stays one whole-stage
    * codegen span. Lifecycle: building the filter runs one job over
    * `right` eagerly, and the broadcast lives until the session ends —
    * callers looping over many filter sets should prefer
    * [[semiJoinBloomManaged]] and destroy the broadcast once the
    * returned frame's action completes. */
  def semiJoinBloom(left: DataFrame, right: DataFrame, keyCol: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    semiJoinBloomManaged(left, right, keyCol, expectedKeys, fpp)._1

  /** [[semiJoinBloom]] plus the bloom broadcast handle, for callers that
    * own its lifecycle (`handle.destroy()` after the action — repeated
    * un-destroyed broadcasts accumulate blocks on executors). */
  def semiJoinBloomManaged(left: DataFrame, right: DataFrame, keyCol: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01)
      : (DataFrame, org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]) = {
    val bf = right.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bf)
    val out = left
      // map-side, inside codegen, no shuffle, no false negatives
      // (null keys yield null -> dropped, matching the old null guard)
      .where(graft.functions.FastHash.bloomProbe(col(keyCol), bc))
      .join(right.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
    (out, bc)
  }
}
