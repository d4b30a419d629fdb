package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters without a full shuffle: the Misra–Gries summary as a
  * typed `Aggregator`. The exact vocab census (q87) shuffles one row per
  * distinct token — fine while vocab is bounded, but a 100 TB raw-bytes
  * corpus has an unbounded tail (typos, hashes, code identifiers) and the
  * shuffle grows with it. Misra–Gries keeps at most k-1 counters per
  * partial aggregate, merges associatively, and guarantees on N total
  * tokens:
  *  - every token with true count > N/k survives in the summary;
  *  - each reported count undercounts by at most N/k.
  * So the summary is a certified superset of the (N/k)-heavy hitters at
  * O(k) state per partition — partial aggregation does all the work
  * map-side and only k-sized maps shuffle.
  *
  * Determinism note: which SUB-threshold tokens appear may vary with
  * merge order (Spark's partial-agg order is nondeterministic); the
  * guaranteed-heavy set and the error bound do not. Consumers must
  * filter by `minCount` (see [[heavyHitters]]) rather than read the raw
  * summary as exact.
  */
object Heavy {

  class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, "k must be >= 2")

    def zero: Map[String, Long] = Map.empty

    def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      m.get(x) match {
        case Some(c) => m.updated(x, c + 1)
        case None if m.size < k - 1 => m.updated(x, 1L)
        case None => // decrement-all step
          m.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k - 1) combined
      else {
        // standard MG merge: subtract the k-th largest count, drop <= 0
        val kth = combined.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
        combined.flatMap { case (t, c) =>
          if (c - kth > 0) Some(t -> (c - kth)) else None
        }
      }
    }

    def finish(m: Map[String, Long]): Map[String, Long] = m
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Tokens certified heavy: runs Misra–Gries over `textCol`'s
    * whitespace tokens and keeps survivors with summary count >=
    * `minCount`. Tokens reported are guaranteed to include every token
    * with true frequency > N/k + minCount; reported counts are lower
    * bounds. */
  def heavyHitters(df: DataFrame, textCol: String, k: Int,
      minCount: Long = 1L): DataFrame = {
    import df.sparkSession.implicits._
    val toks = df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .as[String]
    val agg = new MisraGriesAgg(k).toColumn
    val summary = toks.select(agg.as[Map[String, Long]]).head()
    summary.toSeq.filter(_._2 >= minCount)
      .sortBy { case (t, c) => (-c, t) }
      .toDF("token", "mg_count")
  }

  /** The two-phase EXACT top-N — the production pattern that makes a
    * sketch's answer trustworthy: phase 1 screens with Misra–Gries
    * (O(mgK) state per partial, one corpus pass that also takes the
    * total token count N), phase 2 recounts ONLY the <= mgK-1 surviving
    * candidates exactly (one more corpus pass whose aggregation keys
    * number at most mgK-1, not |vocab| — at 100 TB the unbounded-vocab
    * census this replaces is exactly the shuffle that blows up).
    *
    * The result is PROVABLY the exact global top-N, not an estimate,
    * whenever the N-th recounted frequency exceeds N_total/mgK: MG
    * guarantees every token with true count > N_total/mgK survives
    * phase 1, so no non-candidate can out-rank the N-th candidate. The
    * method CHECKS that certificate at runtime and aborts loudly when
    * the data is too flat for the chosen mgK (raise mgK) — it never
    * silently returns a maybe-top-N. Ties rank (freq desc, token asc),
    * both phases codegen-friendly; the driver holds only the O(mgK)
    * summary. */
  def exactTopK(df: DataFrame, textCol: String, mgK: Int, topN: Int): DataFrame = {
    require(topN >= 1 && topN < mgK, s"need 1 <= topN < mgK, got $topN/$mgK")
    import df.sparkSession.implicits._
    val toks = df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
    val (summary, total) = toks.as[String]
      .select(new MisraGriesAgg(mgK).toColumn.as[Map[String, Long]],
        count(col("tok")).as[Long])
      .head()
    val cands = summary.keys.toSeq.sorted
    val exact = toks.where(col("tok").isin(cands: _*))
      .groupBy(col("tok").as("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topN)
      .localCheckpoint(true)
    val counts = exact.collect().map(_.getAs[Long]("freq"))
    if (counts.length < topN || counts.last * mgK <= total)
      throw new IllegalStateException(
        s"exactTopK certificate failed: ${topN}th candidate count " +
          s"${counts.lastOption.getOrElse(0L)} <= N/k = ${total / mgK} — " +
          s"the distribution is too flat for mgK=$mgK to certify top-$topN; raise mgK")
    exact
  }
}
