package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical relevance ranking for corpus curation: Okapi BM25 over a
  * bag-of-terms query (the standard quality-filter / topic-mining
  * primitive — score a 100 TB corpus against a topic word list, keep the
  * head). Reference scope: the engine's text-analysis family (SURVEY
  * "beyond-reference" training-data ops), alongside vocab census (q87)
  * and quality scoring (q73).
  *
  * Scale + parity design:
  *  - One pass over the corpus computes per-doc token length and one
  *    integer term-frequency column PER QUERY TERM (conditional sums —
  *    no explode shuffle, no (doc, term) intermediate).
  *  - Corpus statistics (N, avgdl, per-term document frequency) reduce
  *    to ONE row, attached by crossJoin — Spark broadcasts a 1-row side,
  *    so no shuffle of the corpus.
  *  - The final score adds per-term contributions as fixed-order column
  *    arithmetic, never a `sum()` over shuffled doubles — float addition
  *    is not associative, and a nondeterministic reduce order would break
  *    both run-to-run determinism and the DuckDB oracle parity.
  *  - All integer inputs (tf, dl, df, N) stay integral until the score
  *    expression, so every double op has one fixed evaluation order.
  */
object Ranking {

  /** BM25 top-k: (`idCol`, per-term tf columns, dl, score) for the `topK`
    * highest-scoring docs, ties broken by ascending id. `terms` must be
    * non-empty, lowercase, distinct. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 25): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct == terms, "query terms must be distinct")

    val toks = split(lower(trim(col(textCol))), "\\s+")
    def tfCol(i: Int): String = s"tf$i"

    // one corpus pass: doc length + one integer tf per query term
    val perDoc = docs.select(
      col(idCol) +:
        size(toks).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").as(tfCol(i))
        }: _*)

    // one-row corpus stats: N, sum(dl), per-term df — broadcast side
    val statCols = count(lit(1)).as("n") +:
      sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(tfCol(i)) > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)

    val scored = perDoc.crossJoin(broadcast(stats))
    val n      = col("n").cast("double")
    val avgdl  = col("sum_dl").cast("double") / n
    val score  = terms.indices.map { i =>
      val tf  = col(tfCol(i)).cast("double")
      val df  = col(s"df$i").cast("double")
      val idf = log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduceLeft[Column](_ + _) // fixed left-to-right addition order

    scored
      .withColumn("score", score)
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
      .select(col(idCol) +: col("dl") +:
        terms.indices.map(i => col(tfCol(i))) :+
        round(col("score"), 4).as("score"): _*)
  }

  /** Reciprocal-rank fusion of two per-query rankings — the standard
    * way to combine heterogeneous retrievers (lexical BM25 + dense
    * cosine) without score calibration: rrf = Σ 1/(c + rank_i), rank
    * positions only, so scales never need aligning. Inputs: (qCol,
    * itemCol, rankCol) tables with rank 1..k per query. FULL outer
    * merge on (query, item): an item one ranker missed still scores
    * through its other term (its missing term contributes 0 — the
    * fixed two-term add keeps the double bit-replayable). Output:
    * (query, item, rrf, fused_rank) top `topK` per query, ties broken
    * by item id. Joins are (query, item) equi-joins on rankings that
    * are already k-bounded per query — the fuse costs nothing at any
    * corpus scale. */
  def rrfFuse(r1: DataFrame, r2: DataFrame, qCol: String, itemCol: String,
      rankCol: String, c: Int, topK: Int): DataFrame = {
    val a = r1.select(col(qCol).as("q"), col(itemCol).as("item"),
      col(rankCol).cast("long").as("ra"))
    val b = r2.select(col(qCol).as("q"), col(itemCol).as("item"),
      col(rankCol).cast("long").as("rb"))
    val fused = a.join(b, Seq("q", "item"), "full_outer")
      .select(col("q"), col("item"),
        (coalesce(lit(1.0) / (lit(c.toDouble) + col("ra").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("rb").cast("double")), lit(0.0)))
          .as("rrf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q")).orderBy(col("rrf").desc, col("item"))
    fused.withColumn("fused_rank", row_number().over(w))
      .where(col("fused_rank") <= topK)
      .select(col("q").as(qCol), col("item").as(itemCol),
        col("rrf"), col("fused_rank").cast("long").as("fused_rank"))
  }

  /** Distinctive-term extraction: for each document, its top-k RARE
    * terms — terms whose corpus document frequency is at most
    * (dfNum/dfDen)·N of the N documents — ranked by (tf desc, df asc,
    * term asc). The keyword/tag primitive for corpus browsing and
    * topic routing: common words never surface (the df cap plays the
    * idf role), and the ordering is ALL-INTEGER — no log-weighted
    * float score whose cross-engine tie behavior would be a coin flip
    * at 1e-17. The cap is a corpus FRACTION (compared exactly as
    * df·dfDen ≤ dfNum·N) so the same query means the same thing at
    * every scale factor.
    *
    * Scale shape: (doc, term) tf census and term df census in one
    * explode pass each (map-side combined); the df side aggregates to
    * vocabulary size and joins back on term (a term-keyed shuffle of
    * the vocab, not the corpus); N is a broadcast 1-row scalar; the
    * df cap filters BEFORE the per-doc top-k window, so the window
    * input is only rare-term hits. Output: (id, term, tf, df, rnk),
    * rnk = 1..k. */
  def distinctiveTerms(docs: DataFrame, idCol: String, textCol: String,
      dfNum: Long, dfDen: Long, topK: Int): DataFrame = {
    require(dfDen > 0 && dfNum >= 0, s"bad df cap fraction $dfNum/$dfDen")
    val toks = docs.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .where(col("df") * dfDen <= col("__n") * dfNum)
      .select(col("term"), col("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfT, "term")
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(col("id").as(idCol), col("term"), col("tf"), col("df"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Rank-biased overlap at depth k (Webber, Moffat & Zobel 2010,
    * prefix-truncated form): how similar are two rankings of the same
    * items, weighting agreement at the TOP far more than the tail?
    *   RBO@k = Σ_{d=1..k'} (|top_d(A) ∩ top_d(B)| / d) · (1 − p)·p^(d−1),
    * k' = min(k, |A|, |B|). The ranking-drift monitor [[rrfFuse]]'s
    * evaluation dual: "did this release reorder what users actually
    * see" — top-k Jaccard ignores order inside the cut; RBO does not.
    *
    * Determinism: overlap counts are exact integers over both top-k
    * lists (ties broken by item id on BOTH rankings, pinned); the
    * per-depth weights (1−p)·p^(d−1) are JVM double literals embedded
    * in the plan — a replaying engine uses the SAME doubles rather than
    * re-deriving powers (the q279 NDCG discount discipline) — and the
    * ≤k-term sum folds in depth order. Scale shape: two partitioned
    * top-k windows over one group-keyed exchange, then a ≤k-element
    * in-order fold per group; per-group memory O(k). Output: (group,
    * k_eff, rbo). */
  def rboAtK(df: DataFrame, groupCol: String, itemCol: String,
      scoreACol: String, scoreBCol: String, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    import org.apache.spark.sql.expressions.Window
    val wts = (1 to k).map(d => (1.0 - p) * math.pow(p, d - 1))
    val wtsArr = wts.map(w => s"CAST('$w' AS DOUBLE)")
      .mkString("array(", ", ", ")")
    def topList(scoreCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("__g"))
        .orderBy(col(scoreCol).desc, col("__i"))
      df.select(col(groupCol).as("__g"), col(itemCol).as("__i"),
          col(scoreACol), col(scoreBCol))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= k)
        .groupBy(col("__g"))
        .agg(expr("transform(array_sort(collect_list(struct(__rk, __i))), s -> s.__i)")
          .as(out))
    }
    topList(scoreACol, "__la").join(topList(scoreBCol, "__lb"), "__g")
      .withColumn("__keff",
        least(lit(k), least(size(col("__la")), size(col("__lb")))))
      .select(col("__g").as(groupCol), col("__keff").cast("long").as("k_eff"),
        expr(
          s"""aggregate(sequence(1, __keff), CAST(0.0 AS DOUBLE), (acc, d) ->
             |  acc + CAST(size(array_intersect(slice(__la, 1, d),
             |                                  slice(__lb, 1, d))) AS DOUBLE)
             |        / CAST(d AS DOUBLE) * element_at($wtsArr, d))
             |""".stripMargin).as("rbo"))
  }

  /** Collocation mining by lift — the PMI top-k without the log:
    * for adjacent token pairs (x, y), lift = P(x,y)/(P(x)·P(y)) =
    * c_xy·N/(c_x·c_y) with marginals taken over the bigram table
    * itself (c_x = left occurrences, c_y = right occurrences, N =
    * total bigrams — self-consistent and exactly replayable; PMI =
    * log₂ lift is monotone in it, so ranking by lift IS ranking by
    * PMI). The phrase detector a tokenizer pipeline runs before
    * merging multiword units, and [[distinctiveTerms]]'s pairwise
    * sibling. A `minCount` floor kills the hapax-pair noise that
    * dominates raw PMI.
    *
    * Exactness: counts are exact; lift is ONE correctly-rounded
    * division of exact decimal products (c_xy·N ≤ 10^9·10^12 fits
    * decimal(38,0) with room), so the (lift desc, x, y) order is
    * bit-deterministic cross-engine — ties at full double precision
    * break on the token pair.
    *
    * Scale shape: bigrams explode map-side (zip of the token array
    * with its tail — no self-join on position), one (x, y) census at
    * row scale, two census re-aggregations for the marginals, joins
    * back on x then y (census grain), and a TakeOrdered bounds the
    * sort at k rows. Output: (rank, x, y, c_xy, c_x, c_y, lift). */
  def collocationLift(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val toks = df.select(split(lower(trim(col(textCol))), "\\s+").as("__ts"))
      .where(size(col("__ts")) >= 2)
    val big = toks.select(explode(arrays_zip(
        expr("slice(__ts, 1, size(__ts) - 1)").as("x"),
        expr("slice(__ts, 2, size(__ts) - 1)").as("y"))).as("__p"))
      .select(col("__p.x").as("x"), col("__p.y").as("y"))
      .where(length(col("x")) > 0 && length(col("y")) > 0)
    val census = big.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
      .localCheckpoint(true)
    val mx = census.groupBy(col("x")).agg(sum(col("c_xy")).as("c_x"))
    val my = census.groupBy(col("y")).agg(sum(col("c_xy")).as("c_y"))
    val n = broadcast(census.agg(sum(col("c_xy")).as("__n")))
    val lift = (col("c_xy").cast(dec) * col("__n").cast(dec)).cast(dec)
      .cast("double") /
      (col("c_x").cast(dec) * col("c_y").cast(dec)).cast(dec).cast("double")
    val top = census.where(col("c_xy") >= minCount)
      .join(mx, "x").join(my, "y")
      .crossJoin(n)
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        lift.as("lift"))
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(k)
    // the rank window orders the k-bounded result only
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("x"), col("y"))).cast("long"))
      .select(col("rank"), col("x"), col("y"), col("c_xy"), col("c_x"),
        col("c_y"), col("lift"))
  }

  /** RAKE keyword extraction (Rose et al. 2010) — corpus keyphrases
    * with zero models: candidate phrases are maximal stopword-free
    * token runs; a word scores deg(w)/freq(w) (deg = Σ length of the
    * phrases it appears in — favors words that travel in long
    * phrases); a phrase scores the sum of its words. The unsupervised
    * sibling of [[distinctiveTerms]] (which needs a contrast corpus;
    * RAKE needs only stopwords) — the "what is this corpus about"
    * first look.
    *
    * Determinism: punctuation runs (`[^a-z0-9\\s]+`) are rewritten to
    * an explicit `$` boundary token BEFORE the whitespace split — RAKE
    * cuts candidates at punctuation as well as stopwords, and `$`
    * cannot collide with a `[a-z0-9]+` word (both regexes behave
    * identically in Java regex and RE2); word scores are ONE division
    * of exact counts; each phrase occurrence folds its word scores in
    * POSITION order (bounded by phrase length), and identical phrase
    * text ⇒ identical token sequence ⇒ bit-identical score, so the
    * text-level dedup is safe. Top-k breaks ties (score desc, phrase
    * asc).
    *
    * Scale shape: one posexplode, a per-doc cumulative window (bounded
    * by document length), phrase and word censuses, one word-keyed
    * join at phrase-member grain, a k-bounded sort. Output: (rank,
    * phrase, n_occurrences, score). */
  def rake(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(split(regexp_replace(lower(trim(col(textCol))),
          "[^a-z0-9\\s]+", " \\$ "), "\\s+"))
          .as(Seq("pos", "w")))
      .select(col("doc"), col("pos").cast("long").as("pos"), col("w"),
        (col("w").isin(stopwords: _*) || col("w") === "" ||
          col("w") === "$").as("stop"))
    val wCut = Window.partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = toks.select(col("doc"), col("pos"), col("w"),
        col("stop"),
        sum(when(col("stop"), 1L).otherwise(0L)).over(wCut).as("pid"))
      .where(!col("stop"))
      .localCheckpoint(true)
    val wPhrase = Window.partitionBy(col("doc"), col("pid"))
    val members = marked.select(col("doc"), col("pid"), col("pos"),
      col("w"), count(lit(1L)).over(wPhrase).as("len"))
    val wstats = members.groupBy(col("w"))
      .agg(count(lit(1L)).as("freq"), sum(col("len")).as("deg"))
      .select(col("w"),
        (col("deg").cast("double") / col("freq").cast("double")).as("s"))
    val occ = members.join(wstats, "w")
      .groupBy(col("doc"), col("pid"))
      .agg(sort_array(collect_list(struct(col("pos"), col("w"), col("s"))))
        .as("ms"))
      .select(
        concat_ws(" ", transform(col("ms"), m => m.getField("w")))
          .as("phrase"),
        aggregate(col("ms"), lit(0.0), (acc, m) => acc + m.getField("s"))
          .as("score"))
    val top = occ.groupBy(col("phrase"))
      .agg(count(lit(1L)).as("n_occurrences"), max(col("score")).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("phrase"))).cast("long"))
      .select(col("rank"), col("phrase"), col("n_occurrences"),
        col("score"))
  }

  /** TextRank keywords (Mihalcea & Tarau 2004) — the GRAPH-centrality
    * complement to [[rake]]'s frequency heuristics: words are nodes,
    * adjacent-token co-occurrence counts are edge weights, and
    * [[Graph.pageRankWeighted]]'s damped fixed point ranks a word by
    * the rank of its neighborhood, so a mid-frequency term wired into
    * the corpus core outranks a frequent-but-peripheral one.
    *
    * Pinned semantics (the oracle replays every step): whitespace
    * tokenization of lower(trim(text)); edges are ADJACENT token pairs
    * (window 2), self-pairs dropped; weights symmetrized on the
    * unordered pair and emitted in both directions; pairs below
    * `minPairCount` pruned (hapax adjacency is noise and the prune
    * bounds the graph); `iterations` rounds of integer fixed-point
    * weighted PageRank; top `k` by (rank desc, word asc).
    *
    * Scale shape: one pair census (map-side combined, corpus-grain
    * shuffle keyed on the pair), then all iteration work is bounded by
    * the pruned vocabulary graph; the top-k is a sort-limit, never a
    * global window. Output: (word, pr). */
  def textRank(docs: DataFrame, textCol: String, k: Int,
      minPairCount: Long = 2L, iterations: Int = 6): DataFrame = {
    val toks = docs
      .select(split(lower(trim(col(textCol))), "\\s+").as("__t"))
      .select(filter(col("__t"), t => length(t) > 0).as("__t"))
      .where(size(col("__t")) > 1)
    val pairs = toks.select(explode(expr(
      """transform(sequence(1, size(__t) - 1), i -> named_struct(
        |'a', least(__t[i - 1], __t[i]), 'b', greatest(__t[i - 1], __t[i])))"""
        .stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
    val sym = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
      .where(col("w") >= minPairCount)
    val edges = sym.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(sym.select(col("b").as("src"), col("a").as("dst"), col("w")))
    Graph.pageRankWeighted(edges, "src", "dst", "w", iterations)
      .orderBy(col("pr").desc, col("node").asc)
      .limit(k)
      .select(col("node").as("word"), col("pr"))
  }

  /** Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001) — the
    * language-modeling retrieval scorer beside [[bm25TopK]]'s
    * probabilistic-IR one; the two disagree most on short docs, where
    * Dirichlet's length-aware smoothing is the textbook fix:
    *   score(d, q) = Σ_{w ∈ q} ln( (tf_{w,d} + μ·P(w|C)) / (|d| + μ) )
    * with P(w|C) the exact corpus unigram ratio. Query terms missing
    * from the corpus contribute their pure-smoothing term (P = 0 would
    * −∞ every doc; the exact corpus ratio handles it: P(w|C) = 0 ⇒
    * term ln(tf/(|d|+μ)), still −∞ only if tf = 0 too — such terms are
    * DROPPED loudly via the n_terms column).
    *
    * Exactness: tf, |d|, corpus counts are exact integers; each term
    * is a pinned double shape and the per-doc sum folds in query-term
    * order (≤ |q| terms). Scale shape: one (doc, term) census join
    * against the broadcast |q|-row query model; the corpus never
    * shuffles wider than its tf census. Output: top-k (doc_id, n_terms,
    * score) by (score desc, doc_id). */
  def dirichletQL(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], mu: Double = 2000.0, k: Int = 20): DataFrame = {
    require(query.nonEmpty && mu > 0, s"bad query=$query mu=$mu")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .localCheckpoint(true)
    val lens = toks.groupBy(col("id")).agg(count(lit(1)).as("len"))
    val qdf = query.toDF("w")
    val corpus = broadcast(toks.groupBy(col("w")).agg(count(lit(1)).as("cf"))
      .join(qdf, Seq("w"))
      .crossJoin(toks.agg(count(lit(1)).as("ctot"))))
    val tf = toks.join(qdf, Seq("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
    // every query term scores every doc (smoothing term when tf = 0):
    // docs × |q| grid via the broadcast query model
    val grid = lens.crossJoin(corpus)
      .join(tf, Seq("id", "w"), "left")
      .select(col("id"), col("w"), col("len"),
        (coalesce(col("tf"), lit(0L)).cast("double") +
          lit(mu) * (col("cf").cast("double") / col("ctot").cast("double")))
          .as("__num"))
      .where(col("__num") > 0.0)
      .withColumn("__term",
        log(col("__num") / (col("len").cast("double") + lit(mu))))
    grid.groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"),
        sort_array(collect_list(struct(col("w"), col("__term")))).as("__ts"))
      .select(col("id"), col("n_terms"),
        expr("aggregate(__ts, CAST(0.0 AS DOUBLE), (a, t) -> a + t.__term)")
          .as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
