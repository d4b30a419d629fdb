package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximations — the 100 TB path for statistics whose
  * exact forms (q10 exact percentiles, A15 distinct) require a full
  * shuffle of the data or per-group sorts. Both are mergeable sketches:
  * partial aggregation happens map-side, only fixed-size summaries
  * shuffle, so cost is O(groups), not O(rows). Spec-verified against the
  * exact operators with error tolerances (the sketches are not
  * bit-replayable in another engine — same situation as the xxhash
  * family, and the reason these are not oracle queries).
  */
object Sketches {

  /** Grouped approximate percentiles via the GK sketch
    * (`percentile_approx`). `accuracy` trades memory for error:
    * rank error <= 1/accuracy. */
  def approxQuantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    val aggs: Seq[Column] = probs.map(p =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Grouped approximate distinct counts via HyperLogLog++
    * (`approx_count_distinct`), relative error ~`rsd`. */
  def approxDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(keyCol), rsd).as("approx_distinct"))

  /** Count-Min sketch build: `depth` independent hash rows of `width`
    * cells each. One declarative pass — each item contributes `depth`
    * (row, cell) increments, partial-aggregated map-side, so the only
    * shuffle is the d*w cell census (fixed size, independent of corpus
    * rows: the 100 TB frequency-estimation path when the key space is
    * too large for an exact groupBy to be affordable).
    *
    * Unlike the GK/HLL sketches above, this one IS cross-engine
    * replayable: cells are md5-derived (`row i` cell = first 8 hex chars
    * of md5(key ":" i) mod width), every cell value is an exact integer
    * sum, and the estimate is an integer min — no platform-dependent
    * hashing, so a DuckDB oracle reproduces the sketch bit-for-bit. */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"depth=$depth width=$width")
    df.select(explode(array(cmsCells(keyCol, depth, width): _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
  }

  /** [[cmsBuild]] from a PRE-AGGREGATED `(key, count)` relation: each
    * key contributes `countCol` to its `depth` cells. Identical sketch
    * to `cmsBuild` over the raw rows, but the explode runs over the
    * vocabulary instead of the corpus — the right build when an exact
    * per-key census already exists (or the key space is small enough to
    * aggregate first), since a corpus-scale pass collapses to a
    * vocabulary-scale one. */
  def cmsBuildWeighted(counts: DataFrame, keyCol: String, countCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"depth=$depth width=$width")
    counts.select(col(countCol).as("w"),
        explode(array(cmsCells(keyCol, depth, width): _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(sum(col("w")).as("c"))
  }

  /** The md5 cell map shared by build/estimate (and the streaming twin):
    * row i cell = first 8 hex chars of md5(key ":" i) mod width. */
  private[graft] def cmsCells(keyCol: String, depth: Int, width: Int): Seq[Column] =
    (0 until depth).map { i =>
      struct(lit(i).as("row"),
        (conv(substring(md5(concat(col(keyCol).cast("string"), lit(s":$i"))), 1, 8), 16, 10)
          .cast("long") % width).as("cell"))
    }

  /** Point estimates from a [[cmsBuild]] sketch: for each probe key, the
    * min over the sketch's `depth` rows of that key's cell value — the
    * classic one-sided CMS bound (estimate >= true count, equality when
    * some row has no colliding key). The sketch is d*w rows, so it
    * broadcasts; probes never shuffle. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    probes.select(col(keyCol), explode(array(cmsCells(keyCol, depth, width): _*)).as("rc"))
      .select(col(keyCol), col("rc.row").as("row"), col("rc.cell").as("cell"))
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy(col(keyCol))
      // a missing cell means nothing hashed there: count 0
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_count"))
  }

  /** AMS-style join-size estimation from two CMS sketches built with
    * the SAME (depth, width, md5 cell map): |A ⋈ B| on the sketched key
    * is Σ_k cA(k)·cB(k), and each sketch row's cell-wise inner product
    * overcounts it by exactly the collision cross-terms — so the min
    * over rows is a one-sided estimate (≥ true, expected error ≤
    * |A|·|B|·e/width). The optimizer's pre-flight: two d×w sketches (a
    * few KB, built in one pass each, mergeable across partitions)
    * answer "how big is this join" without touching either table again
    * — at 100 TB that is the difference between choosing a broadcast
    * and discovering a 10^14-row blow-up at runtime. All integer
    * arithmetic on decimal accumulators; replays cross-engine. */
  def cmsJoinSize(sketchA: DataFrame, sketchB: DataFrame, depth: Int): DataFrame = {
    val rows = sketchA.sparkSession.range(depth)
      .select(col("id").cast("int").as("row"))
    val dots = sketchA.select(col("row"), col("cell"), col("c").as("ca"))
      .join(sketchB.select(col("row"), col("cell"), col("c").as("cb")),
        Seq("row", "cell"))
      .groupBy("row")
      .agg(sum(col("ca").cast("decimal(38,0)") * col("cb")).as("dot"))
    // a sketch row with no overlapping cells has inner product 0 and
    // must still vote (true size 0) — reindex over all depth rows
    rows.join(dots, Seq("row"), "left")
      .agg(min(coalesce(col("dot"), lit(0).cast("decimal(38,0)")))
        .as("join_size_est"))
  }

  /** Replayable HyperLogLog register table: per group, one row per
    * NON-EMPTY register `(groupCols..., reg, max_rank)` — the mergeable
    * distinct-count sketch (the 100 TB COUNT DISTINCT: raw keys never
    * cross group boundaries; re-aggregating registers with `max` under
    * any coarser grouping IS the union of the sketches, which
    * [[hllEstimate]] then scores without touching data again).
    *
    * Like [[cmsBuild]] (and unlike `approx_count_distinct`), fully
    * md5-derived, so a SQL oracle rebuilds it bit-for-bit: the register
    * is the first 4 hex chars of md5(key ":r") mod 2^b, and the rank is
    * 1 + the leading-zero-bit count of the 48-bit value spelled by the
    * first 12 hex chars of md5(key ":q") — hex-string leading zeros
    * count 4 bits each, the first non-zero nibble adds 0–3 via a fixed
    * CASE, both replayable as string ops in any engine. Ranks cap at 40
    * so every 2^-rank term of the estimator's harmonic sum is a power
    * of two >= 2^-40; with at most 2^b <= 2^14 terms the sum spans < 53
    * significand bits and is EXACT in IEEE double — order-insensitive
    * at any parallelism, no fold ordering needed. */
  /** Register index column ([[hllRegisters]]'s derivation, shared with
    * the streaming twin). */
  private[graft] def hllRegCol(key0: Column, b: Int): Column = {
    val key = key0.cast("string")
    conv(substring(md5(concat(key, lit(":r"))), 1, 4), 16, 10)
      .cast("long") % (1 << b)
  }

  /** Leading-zero rank column ([[hllRegisters]]'s derivation, shared
    * with the streaming twin). */
  private[graft] def hllRankCol(key0: Column): Column = {
    val key = key0.cast("string")
    val qhex = substring(md5(concat(key, lit(":q"))), 1, 12)
    val zeros = length(regexp_extract(qhex, "^0*", 0))
    val nib = substring(qhex, (zeros + 1).cast("int"), lit(1))
    val nibLz = when(nib === "1", 3)
      .when(nib.isin("2", "3"), 2)
      .when(nib.isin("4", "5", "6", "7"), 1)
      .otherwise(0) // 8–f, or empty when all 12 chars are zero
    least(zeros * lit(4) + nibLz + lit(1), lit(40)).cast("long")
  }

  def hllRegisters(df: DataFrame, groupCols: Seq[String], keyCol: String,
      b: Int): DataFrame = {
    require(b >= 4 && b <= 14, s"b must be in [4,14], got $b")
    df.select(groupCols.map(col) :+ hllRegCol(col(keyCol), b).as("reg") :+
        hllRankCol(col(keyCol)).as("rank"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rank")).as("max_rank"))
  }

  /** Score a [[hllRegisters]] table (per whatever grouping it now
    * carries — merge first by re-grouping with `max(max_rank)`): the
    * raw HLL estimate alpha_m * m^2 / S with
    * S = (m - nonempty) + sum(2^-max_rank). Every arithmetic step is a
    * correctly-rounded IEEE op over exact inputs (2^-r built as
    * 1.0 / shiftleft long — exact), so the estimate replays
    * bit-identically cross-engine. No log-based small-range correction
    * on purpose: ln() is not correctly rounded and would break replay;
    * callers read `nonempty` to judge the regime. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], b: Int): DataFrame = {
    val m = (1 << b).toDouble
    // fixed literal shape: both engines evaluate the same three ops
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m))
    val term = lit(1.0) /
      expr("shiftleft(cast(1 as bigint), cast(max_rank as int))").cast("double")
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("nonempty"), sum(term).as("sum_pow"))
      .select(groupCols.map(col) ++ Seq(
        col("nonempty"),
        (alpha * lit(m) * lit(m) /
          ((lit(m) - col("nonempty").cast("double")) + col("sum_pow")))
          .as("hll_estimate")): _*)
  }

  /** KMV (k-minimum-values) distinct sketch: per group, the k smallest
    * distinct 48-bit md5-prefix hashes of `keyCol`. Unlike HLL it
    * supports SET operations — two groups' sketches merge (union =
    * k smallest of the concatenation) and their overlap on the merged
    * sketch estimates Jaccard, the cheap cross-dataset similarity
    * probe at 100 TB. Built on [[TopK.topKPerGroup]], so per-partition
    * state is k-bounded from the map side on (value = -hash is exact:
    * 48-bit magnitudes fit a double); hashes are md5-derived —
    * deterministic, engine-replayable ([[hllRegisters]] precedent).
    * Output: (group, rank 1..k ascending by hash, h). */
  /** The KMV hash derivation, shared with the streaming twin
    * ([[graft.streaming.Streams.kmvStream]]): 48-bit md5-prefix of the
    * key's string form — deterministic, engine-replayable. */
  private[graft] def kmvHashCol(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** k smallest DISTINCT values with a k-bounded buffer at every stage —
    * the KMV state as a typed Aggregator, usable as a STREAMING
    * aggregation buffer (fixed state: <= k longs per group however long
    * the stream runs). Insert-if-absent-keep-k-smallest is exact for
    * the k-min distinct set: a true member is never evicted (eviction
    * requires k distinct smaller values), and order of arrival/merge
    * cannot change a set minimum — deterministic at any parallelism. */
  class KMinDistinct(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0, s"k must be positive: $k")
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = b.foldLeft(a)(insert)
    private def insert(b: Seq[Long], h: Long): Seq[Long] =
      if (b.contains(h)) b
      else if (b.length < k) (b :+ h).sorted
      else if (h >= b.last) b
      else (b.init :+ h).sorted
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    val hashed = df.select(col(groupCol), kmvHashCol(col(keyCol)).as("h"))
      .distinct()
    TopK.topKPerGroup(
        hashed.select(col(groupCol), col("h"),
          negate(col("h").cast("double")).as("nh")),
        groupCol, "h", "nh", k)
      .select(col(groupCol), col("rank"), col("h"))
  }

  /** Distinct-count estimate from a [[kmvSketch]]: n exact while the
    * sketch is unsaturated (n < k rows), else (k-1) * 2^48 / h_k. The
    * numerator literal and the single division are correctly-rounded
    * IEEE ops over exact integers — bit-replayable. */
  def kmvEstimate(sk: DataFrame, groupCol: String, k: Int): DataFrame =
    sk.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(when(col("rank") === k, col("h"))).as("hk"))
      .select(col(groupCol),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble * 281474976710656.0) /
            col("hk").cast("double")).as("kmv_estimate"))
}
