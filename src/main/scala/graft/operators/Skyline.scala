package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) extraction — the multi-criteria selection
  * primitive (Börzsönyi et al. 2001, "The Skyline Operator"): keep
  * every row no other row beats on ALL criteria at once (strictly on
  * at least one). Dataset curation reads straight onto it: the
  * quality-vs-length-vs-dup-score frontier is what you keep when no
  * single score deserves the tiebreak.
  *
  * Scale shape — the classic two-phase distributed skyline:
  *   1. per-partition local skyline via `mapPartitions` (a row
  *      dominated within its partition is dominated globally —
  *      discards are final);
  *   2. the surviving candidates (union of local skylines, skyline-
  *      sized not data-sized) collapse to one partition for the exact
  *      final pass. The global skyline is a subset of every
  *      partition-skyline union, so recall is 1 by construction.
  * Phase-2 size is data-dependent: anti-correlated dimensions inflate
  * skylines, so the pass fails LOUDLY past `maxCandidates` (the
  * [[Components]] maxIter contract) instead of silently collecting an
  * unbounded set onto one executor.
  *
  * Determinism: the skyline SET is unique for a fixed dominance
  * relation — no arrival-order or parallelism sensitivity; duplicates
  * of a frontier point all survive (domination requires a STRICT win
  * somewhere). All comparisons are raw doubles — no arithmetic, no
  * drift. */
object Skyline {

  /** Rows of `df` on the Pareto frontier of `dims` — each (column,
    * maximize?) pair names a criterion; ids must be integral and
    * unique. Output: (idCol) + one double column per dim, oriented as
    * given (minimized columns come back with original sign). */
  def skyline(df: DataFrame, idCol: String, dims: Seq[(String, Boolean)],
      maxCandidates: Int = 4000000): DataFrame = {
    require(dims.nonEmpty, "dims must be non-empty")
    import df.sparkSession.implicits._
    val prep: Dataset[(Long, Seq[Double])] = df.select(
        col(idCol).cast("long").as("id"),
        array(dims.map { case (c, maximize) =>
          (if (maximize) col(c) else negate(col(c))).cast("double")
        }: _*).as("v"))
      .as[(Long, Seq[Double])]
    val local = prep.mapPartitions(localSkyline)
    val candidates = local.repartition(1)
    val finalSky = candidates.mapPartitions { it =>
      val rows = it.toVector
      if (rows.length > maxCandidates)
        throw new IllegalStateException(
          s"skyline candidate set ${rows.length} exceeds maxCandidates " +
            s"$maxCandidates (anti-correlated dims inflate skylines — " +
            "raise the cap or cut a dimension)")
      localSkyline(rows.iterator)
    }
    finalSky.toDF("id", "v")
      .select((col("id").as(idCol) +: dims.zipWithIndex.map {
        case ((c, maximize), i) =>
          val o = col("v").getItem(i)
          (if (maximize) o else negate(o)).as(c)
      }): _*)
  }

  /** In-partition skyline scan: keep a running non-dominated set. Work
    * is O(rows × |running skyline|) — linear when the frontier is
    * small (the common case), never worse than the pairwise bound. */
  private def localSkyline(
      it: Iterator[(Long, Seq[Double])]): Iterator[(Long, Seq[Double])] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
    it.foreach { row =>
      if (!kept.exists(k => dominates(k._2, row._2))) {
        val survivors = kept.filterNot(k => dominates(row._2, k._2))
        kept.clear()
        kept ++= survivors
        kept += row
      }
    }
    kept.iterator
  }

  /** The frontier as a typed Aggregator — the streaming twin's state
    * ([[graft.streaming.Streams.skylineStream]]): the buffer IS the
    * running skyline, so state is frontier-sized however long the
    * stream runs, and a discard is final: if row x was dominated by
    * frontier row d, any later evictor of d dominates d and — by
    * transitivity — x too, so x stays dominated forever. The streamed
    * state after any prefix therefore equals the batch skyline OF that
    * prefix exactly. Merge folds one frontier into the other — associative
    * and order-free because the skyline set is unique. `maxFrontier`
    * fails loudly when anti-correlated dims inflate the state. */
  class FrontierAgg(maxFrontier: Int = 100000)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Seq[Double]), Seq[(Long, Seq[Double])], Seq[(Long, Seq[Double])]] {
    def zero: Seq[(Long, Seq[Double])] = Vector.empty
    def reduce(b: Seq[(Long, Seq[Double])],
        x: (Long, Seq[Double])): Seq[(Long, Seq[Double])] = insert(b, x)
    def merge(a: Seq[(Long, Seq[Double])],
        b: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] =
      b.foldLeft(a)(insert)
    private def insert(b: Seq[(Long, Seq[Double])],
        x: (Long, Seq[Double])): Seq[(Long, Seq[Double])] = {
      if (b.exists(k => dominates(k._2, x._2))) b
      else {
        val kept = b.filterNot(k => dominates(x._2, k._2)) :+ x
        if (kept.length > maxFrontier)
          throw new IllegalStateException(
            s"skyline frontier exceeds maxFrontier $maxFrontier")
        kept
      }
    }
    def finish(r: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] =
      r.sortBy(_._1) // canonical output order; the set itself is unique
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Seq[Double])]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Seq[Double])]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** a dominates b: >= everywhere, > somewhere (all dims maximized). */
  private[operators] def dominates(a: Seq[Double], b: Seq[Double]): Boolean = {
    var strict = false
    var i = 0
    while (i < a.length) {
      if (a(i) < b(i)) return false
      if (a(i) > b(i)) strict = true
      i += 1
    }
    strict
  }
}
