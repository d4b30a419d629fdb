package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training half of a training-data pipeline: learn the top-k
  * merge rules from the corpus so downstream token budgets, fertility
  * stats and vocabulary decisions come from THIS data, not a borrowed
  * tokenizer. Classic BPE trains on the word-TYPE census (word ->
  * frequency), not raw running text — the census is what shuffles, and
  * it is bounded by the vocabulary, not the corpus.
  *
  * Per merge round, entirely declarative:
  *  1. adjacent-pair census: explode each word's symbol array into
  *     (left, right) pairs weighted by word frequency — one map-side-
  *     combined shuffle of census-bounded pair rows;
  *  2. best pair = max (count, then lexicographically smallest left,
  *     right) — a 1-row broadcast, the deterministic tie-break;
  *  3. merge: every word rebuilds its symbol array with a left-to-right
  *     non-overlapping greedy fold — the accumulator is the BARE symbol
  *     list whose LAST element doubles as the pending-merge carry
  *     ("aaa" under (a,a) -> [aa, a], never [a, aa] — append-or-
  *     replace-last is exactly the sequential semantics), replayable
  *     by another engine's list fold without struct state.
  * Loop invariants localCheckpoint per round (the [[Graph.hits]]
  * discipline) so round r's plan does not re-run rounds 1..r-1.
  *
  * Initial symbols are single characters via substr (split-on-empty
  * differs across engines); no end-of-word marker (documented
  * simplification — add one upstream by appending a sentinel char).
  * Scale: the census is vocabulary-bounded; for web-scale vocabularies
  * cap with `maxTypes` by top frequency (deterministic (freq, word)
  * tie-break) — a LOUD census cut, not a silent sample. */
object Bpe {

  /** Learn `nMerges` merge rules over the word-type census of `textCol`.
    * Output: (merge_rank int, left, right, pair_count long) — one row
    * per learned merge in order. */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
      maxTypes: Int = 100000): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val census = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(maxTypes)
    var words = census
      .select(col("f"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[DataFrame]
    for (rank <- 1 to nMerges) {
      // zip the array against its own tail — sequence(1, n-1) would
      // DESCEND to [1, 0] for single-symbol words (Spark's auto-step)
      val pairs = words
        .select(col("f"), expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (l, r) -> struct(l, r))""".stripMargin)
          .as("ps"))
        .select(col("f"), explode(col("ps")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("c"))
      // deterministic argmax: highest count, ties to the smallest
      // (l, r) — a bounded 1-row TakeOrdered, broadcast to the merge
      val best = broadcast(
        pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1)
          .select(col("l").as("__l"), col("r").as("__r"), col("c").as("__c")))
      merges += best.select(lit(rank).as("merge_rank"),
        col("__l").as("left"), col("__r").as("right"),
        col("__c").as("pair_count"))
      words = words.crossJoin(best)
        .select(col("f"), expr(
          """aggregate(slice(syms, 2, size(syms) - 1),
            |  slice(syms, 1, 1),
            |  (acc, s) -> CASE
            |    WHEN element_at(acc, -1) = __l AND s = __r THEN
            |      concat(slice(acc, 1, size(acc) - 1),
            |             array(concat(__l, __r)))
            |    ELSE concat(acc, array(s)) END)""".stripMargin).as("syms"))
        .localCheckpoint(true)
    }
    merges.result().reduce(_ unionByName _)
  }

  /** Apply an ordered merge list to a per-group word census and report
    * tokenizer fertility — the decision metric a learned vocabulary is
    * FOR (tokens/word and chars/token drive context-window budgets and
    * cost-per-document): each merge chains one shuffle-free projection
    * (the same greedy bare-list fold [[learnMerges]] uses), so encoding
    * is a single codegen-friendly stage over the census regardless of
    * merge count; the census is the only exchange.
    *
    * `merges` is the driver-side merge list in rank order — bounded by
    * construction (it IS the learned vocabulary delta, collected like
    * any broadcast model table). Output per group: (group, n_types,
    * n_words, n_chars, n_tokens, tokens_per_word, chars_per_token). */
  def fertility(df: DataFrame, groupCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val census = df
      .select(col(groupCol).as("g"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as("f"))
    var syms = census.withColumn("syms",
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
    merges.foreach { case (l, r) =>
      val lq = l.replace("'", "''")
      val rq = r.replace("'", "''")
      syms = syms.withColumn("syms", expr(
        s"""aggregate(slice(syms, 2, size(syms) - 1),
           |  slice(syms, 1, 1),
           |  (acc, s) -> CASE
           |    WHEN element_at(acc, -1) = '$lq' AND s = '$rq' THEN
           |      concat(slice(acc, 1, size(acc) - 1), array('$lq$rq'))
           |    ELSE concat(acc, array(s)) END)""".stripMargin))
    }
    syms.groupBy(col("g")).agg(
        count(lit(1)).as("n_types"),
        sum(col("f")).as("n_words"),
        sum(col("f") * length(col("w"))).as("n_chars"),
        sum(col("f") * size(col("syms"))).as("n_tokens"))
      .select(col("g"), col("n_types"), col("n_words"), col("n_chars"),
        col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("tokens_per_word"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"))
  }
}
