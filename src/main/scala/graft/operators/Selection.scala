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
      .localCheckpoint(true)
    val allDocs = df.select(col(idCol).cast("long").as("doc")).distinct()
      .localCheckpoint(true)
    var covered = docTok.select(col("tok")).where(lit(false))
      .localCheckpoint(true)
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
          .localCheckpoint(true))
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
          .distinct().localCheckpoint(true)
        remaining = remaining.where(col("doc") =!= d).localCheckpoint(true)
      }
    }
    out.result().reduce(_ unionByName _)
  }

  /** Deterministic weighted reservoir sampling WITHOUT replacement per
    * stratum (Efraimidis & Spirakis 2006, A-ES): each row draws a
    * seeded uniform u from a 48-bit md5 slice (the q327 hash-to-uniform
    * shape — a seeded draw is a DESIGN choice for replayable pipelines;
    * production swaps the seed source, nothing else changes) and keeps
    * the top-k rows per stratum by ln(u)/w — the same ordering as the
    * paper's u^(1/w) key (ln is monotone; the division keeps the exact
    * pinned-shape parity the pow() ban protects). Inclusion probability
    * is ∝ weight, exactly the "sample documents ∝ token count within
    * each source" draw a mixture pipeline wants, reproducible across
    * engines AND across runs at any parallelism.
    *
    * Exactness: u is exact integer arithmetic (+0.5, /2⁴⁸); the key is
    * one ln and one division of pinned doubles (q121 libm contract);
    * ranks break (impossible) key ties by id. Rows with weight ≤ 0 or
    * null are excluded loudly in the output contract, not sampled.
    * Scale shape: one stratum-partitioned top-k window — no global
    * window, no shuffle beyond the stratum key. Output: (stratum, id,
    * weight, rank), rank 1..k by descending key. */
  def weightedReservoir(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, k: Int, seed: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    // Column API, never string-interpolated: a seed with a quote (or an
    // idCol needing backticks) must not change the hashed key or break
    // parsing (round-10 ADVICE fix). Same bytes hashed as before.
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
      lit(seed))), 1, 12), 16, 10).cast("long").cast("double") +
      lit(0.5)) / lit(281474976710656.0)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__key").desc, col(idCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__key", log(u) / col(weightCol).cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(strataCol).as("stratum"), col(idCol).as("id"),
        col(weightCol).cast("long").as("weight"), col("rank"))
  }
}
