package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k per group as a bounded mergeable aggregate — the 100 TB path
  * for O6 (q12's window `row_number <= k` keeps every row flowing into a
  * full per-group sort; this keeps AT MOST k rows per group per
  * partition alive from the map side onward). State is a descending
  * (value, id) vector capped at k; reduce is an insertion into a sorted
  * bounded list, merge is a sorted-merge-truncate — both O(k). Ties
  * break by ascending id so output is total-ordered and cross-engine
  * replayable (the q102 oracle). */
object TopK {

  type VI = (Double, Long)

  class TopKAgg(k: Int) extends Aggregator[VI, Seq[VI], Seq[VI]] {
    require(k > 0, "k must be positive")
    private val ord: Ordering[VI] = Ordering.by { case (v, id) => (-v, id) }

    def zero: Seq[VI] = Vector.empty

    def reduce(b: Seq[VI], x: VI): Seq[VI] =
      if (b.size == k && ord.gteq(x, b.last)) b // below the cut, O(1) reject
      else {
        val (hi, lo) = b.span(ord.lt(_, x))
        (hi :+ x) ++ lo.take(k - hi.size - 1)
      }

    def merge(a: Seq[VI], b: Seq[VI]): Seq[VI] = {
      val out = Vector.newBuilder[VI]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        val takeA = j >= b.size || (i < a.size && ord.lteq(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    def finish(r: Seq[VI]): Seq[VI] = r
    def bufferEncoder: Encoder[Seq[VI]] = ExpressionEncoder[Seq[VI]]()
    def outputEncoder: Encoder[Seq[VI]] = ExpressionEncoder[Seq[VI]]()
  }

  type VS = (Double, String)

  /** [[TopKAgg]] with STRING ids (token / n-gram keys) — same bounded
    * O(k) state, ties by ascending id string (Spark's UTF8 ordering ==
    * DuckDB's binary collation, so ranks replay cross-engine). */
  class TopKStrAgg(k: Int) extends Aggregator[VS, Seq[VS], Seq[VS]] {
    require(k > 0, "k must be positive")
    private val ord: Ordering[VS] = Ordering.by { case (v, id) => (-v, id) }

    def zero: Seq[VS] = Vector.empty

    def reduce(b: Seq[VS], x: VS): Seq[VS] =
      if (b.size == k && ord.gteq(x, b.last)) b
      else {
        val (hi, lo) = b.span(ord.lt(_, x))
        (hi :+ x) ++ lo.take(k - hi.size - 1)
      }

    def merge(a: Seq[VS], b: Seq[VS]): Seq[VS] = {
      val out = Vector.newBuilder[VS]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        val takeA = j >= b.size || (i < a.size && ord.lteq(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    def finish(r: Seq[VS]): Seq[VS] = r
    def bufferEncoder: Encoder[Seq[VS]] = ExpressionEncoder[Seq[VS]]()
    def outputEncoder: Encoder[Seq[VS]] = ExpressionEncoder[Seq[VS]]()
  }

  /** [[topKPerGroup]] for string-keyed items (tokens, n-grams): top-k
    * per group by value desc then key asc, k-bounded state end-to-end. */
  def topKStrPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val typed = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("double").as("v"), col(keyCol).cast("string").as("id"))
      .as[(String, Double, String)]
    typed.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKStrAgg(k).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g").as(groupCol), posexplode(col("top")).as(Seq("r", "e")))
      .select(col(groupCol), (col("r") + 1).cast("long").as("rank"),
        col("e._2").as(keyCol), col("e._1").as(valueCol))
  }

  /** Top-k rows per group: (`groupCol`, rank 1..k, id, value), ranked by
    * value descending then id ascending. One shuffle of k-bounded
    * partial aggregates — never the raw rows. */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val typed = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("double").as("v"), col(idCol).cast("long").as("id"))
      .as[(String, Double, Long)]
    typed.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAgg(k).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g").as(groupCol), posexplode(col("top")).as(Seq("r", "e")))
      .select(col(groupCol), (col("r") + 1).cast("long").as("rank"),
        col("e._2").as(idCol), col("e._1").as(valueCol))
  }
}
