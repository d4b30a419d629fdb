package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage data selection (the classic (1 − 1/e)
  * submodular greedy; Nemhauser, Wolsey & Fisher 1978) — pick the k
  * documents that together cover the most vocabulary, the coreset/
  * diversity-selection primitive of training-data curation: fine-tuning
  * sets, eval panels, and annotation batches all want "few documents,
  * maximal coverage", and uniform sampling demonstrably does not give
  * it (the spec pins a case where greedy strictly beats any same-size
  * uniform draw).
  *
  * Per selection round, entirely declarative (the [[Bpe.learnMerges]]
  * round discipline):
  *  1. marginal-gain census: distinct (doc, token) pairs anti-joined
  *     against the covered-token set, counted per doc — one
  *     census-bounded shuffle with map-side combine;
  *  2. argmax (gain, then smallest doc id) — a bounded 1-row
  *     TakeOrdered, broadcast;
  *  3. covered set grows by the winner's tokens; selected set by its
  *     id. Loop invariants localCheckpoint per round.
  * Selection continues through zero-gain rounds (deterministic
  * id-ordered fill) so the output is always exactly min(k, n_docs)
  * rows — the caller sees saturation as gain = 0, not as a short
  * result.
  *
  * Scale shape: the corpus text never moves — only the distinct
  * (doc, token) census and the covered-token set (bounded by the
  * vocabulary) shuffle; each round's winner is one broadcast row. */
object Selection {

  /** Output: (select_rank, doc_id, gain, covered_total) — one row per
    * selected doc in selection order; `gain` is the marginal new-token
    * count, `covered_total` the running covered-vocabulary size. */
  def greedyCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val docTok = df
      .select(col(idCol).cast("long").as("doc"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .distinct()
      .localCheckpoint(false)
    val allDocs = df.select(col(idCol).cast("long").as("doc")).distinct()
      .localCheckpoint(false)
    var covered = docTok.select(col("tok")).where(lit(false))
      .localCheckpoint(false)
    var remaining = allDocs
    var coveredN = 0L
    val out = Seq.newBuilder[DataFrame]
    for (rank <- 1 to k) {
      val gains = remaining.join(
          docTok.join(covered, Seq("tok"), "left_anti")
            .groupBy(col("doc")).agg(count(lit(1)).as("g")),
          Seq("doc"), "left")
        .select(col("doc"), coalesce(col("g"), lit(0L)).as("g"))
      val win = broadcast(
        gains.orderBy(col("g").desc, col("doc")).limit(1)
          .select(col("doc").as("__d"), col("g").as("__g"))
          .localCheckpoint(false))
      // the winner's gain joins the running covered total driver-free:
      // covered_total rides as a literal computed from the PREVIOUS
      // round's count — one tiny action per round on the checkpointed
      // winner (bounded: 1 row), same cost class as the argmax itself
      val w = win.collect()
      if (w.nonEmpty) {
        val (d, g) = (w.head.getLong(0), w.head.getLong(1))
        coveredN += g
        out += df.sparkSession.range(1).select(
          lit(rank).as("select_rank"), lit(d).as("doc_id"),
          lit(g).as("gain"), lit(coveredN).as("covered_total"))
        covered = covered
          .unionByName(docTok.where(col("doc") === d).select(col("tok")))
          .distinct().localCheckpoint(false)
        remaining = remaining.where(col("doc") =!= d).localCheckpoint(false)
      }
    }
    out.result().reduce(_ unionByName _)
  }
}
