package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic-time-warping distance between per-key INTEGER series
  * (Sakoe & Chiba 1978; the Berndt & Clifford 1994 time-series-mining
  * formulation): the minimum-cost monotone alignment path with
  * per-step cost |a_i − b_j|, optionally constrained to the
  * Sakoe–Chiba band |i − j| <= band. The shape-similarity measure
  * Euclidean distance can't be — two series tracing the same pattern
  * out of phase score near 0 under DTW and far under pointwise
  * distance.
  *
  * Integer discipline: values cast to long, so every DP cell is an
  * exact BIGINT (costs are integers, min/+ preserve integrality) —
  * bit-identical across engines and parallelism with NO float surface.
  * Cells outside the band (or unreachable under it) carry the INF
  * sentinel; a final cell at/above INF (band < |n − m| leaves no legal
  * path) reports a NULL distance rather than a garbage sum.
  *
  * Scale shape: one key-keyed exchange builds each series in order;
  * the pair grid is a self-join over the SERIES CENSUS (one row per
  * key — bounded by the key vocabulary, not the row count; pre-filter
  * the pair set upstream for large catalogs). Each pair's DP is an
  * independent O(n·band) typed-kernel loop — embarrassing
  * parallelism, the [[graft.kernels.Bracket]] per-group discipline.
  * Per-key series are assumed group-sized (the bounded-series
  * contract [[Funnel]] documents). */
object Dtw {

  /** INF sentinel: far above any real path cost, far below Long
    * overflow even after O(n + m) cost additions cascade onto it. */
  val Inf: Long = Long.MaxValue / 4

  final case class DtwRow(key_a: String, key_b: String, n_a: Int,
      n_b: Int, dtw: Option[Long])

  /** The banded DP kernel (band <= 0 → unconstrained). Exposed for
    * direct reuse and property tests. */
  private[graft] def distance(va: IndexedSeq[Long], vb: IndexedSeq[Long],
      band: Int): Option[Long] = {
    val n = va.length
    val m = vb.length
    if (n == 0 || m == 0) return None
    val wide = if (band <= 0) math.max(n, m) else band
    var prev = Array.fill(m + 1)(Inf)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      val cur = Array.fill(m + 1)(Inf)
      var j = 1
      while (j <= m) {
        if (math.abs(i - j) <= wide) {
          val best = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
          cur(j) = best + math.abs(va(i - 1) - vb(j - 1))
        }
        j += 1
      }
      prev = cur
      i += 1
    }
    if (prev(m) >= Inf) None else Some(prev(m))
  }

  /** DTW over every key pair (key_a < key_b) of the series table.
    * Output: (key_a, key_b, n_a, n_b, dtw), dtw null when the band
    * admits no path. Keys compare as strings (cast) so the pair
    * ordering is engine-independent. */
  def pairwiseDtw(df: DataFrame, keyCol: String, ordCol: String,
      valCol: String, band: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = df.select(col(keyCol).cast("string").as("k"),
        col(ordCol).as("o"), col(valCol).cast("long").as("x"))
      .groupBy(col("k"))
      .agg(expr("transform(array_sort(collect_list(struct(o, x))), e -> e.x)")
        .as("v"))
    val pairs = s.select(col("k").as("ka"), col("v").as("va"))
      .join(s.select(col("k").as("kb"), col("v").as("vb")),
        col("ka") < col("kb"))
      .select(col("ka"), col("va"), col("kb"), col("vb"))
      .as[(String, Seq[Long], String, Seq[Long])]
    pairs.map { case (ka, va, kb, vb) =>
      DtwRow(ka, kb, va.length, vb.length,
        distance(va.toIndexedSeq, vb.toIndexedSeq, band))
    }.toDF()
  }
}
