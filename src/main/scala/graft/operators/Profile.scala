package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-profiling census — the Deequ/TFDV-style data-quality summary
  * a pipeline computes on every ingest: per column, row/null/distinct
  * counts and the modal value with its frequency. Catching a
  * cardinality collapse or a null-rate spike BEFORE training is the
  * cheapest data-bug defense there is.
  *
  * Scale shape: one value-census shuffle per profiled column (map-side
  * combined), then single-row aggregates — nothing driver-side, output
  * bounded by the column count. The mode is min(struct(-cnt, value)):
  * deterministic under ties (smallest value among the most frequent),
  * no window, no sort. Values are profiled through their STRING cast;
  * callers should profile string/integer columns (double repr is
  * engine-sensitive). */
object Profile {

  /** Output: (col_name, n_rows, n_null, n_distinct, mode_value,
    * mode_freq) — one row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val vals = df.select(col(c).cast("string").as("v"))
      val counts = vals.agg(count(lit(1)).as("n_rows"),
        count(col("v")).as("n_nonnull"))
      val census = vals.where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      val dist = census.agg(count(lit(1)).as("n_distinct"),
        min(struct(negate(col("cnt")).as("nc"), col("v").as("v"))).as("m"))
      counts.crossJoin(dist).select(
        lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"),
        col("m.v").as("mode_value"),
        negate(col("m.nc")).as("mode_freq"))
    }.reduce(_ unionByName _)

  /** Snapshot-to-snapshot profile drift: [[profile]] run on two
    * versions of a table, joined per column — null-rate delta,
    * distinct-count ratio, mode churn — the "did yesterday's load
    * change the SHAPE of this table" report that catches schema-level
    * drift (a column going sparse, an enum collapsing, a new dominant
    * value) before any row-level diff is affordable. Rates are exact
    * integer cross-products compared at output time only. Output per
    * column: (col_name, n_a, n_b, null_a, null_b, null_rate_delta,
    * distinct_a, distinct_b, mode_a, mode_b, mode_changed). */
  def profileDiff(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val pa = profile(a, cols).select(col("col_name"),
      col("n_rows").as("n_a"), col("n_null").as("null_a"),
      col("n_distinct").as("distinct_a"), col("mode_value").as("mode_a"))
    val pb = profile(b, cols).select(col("col_name"),
      col("n_rows").as("n_b"), col("n_null").as("null_b"),
      col("n_distinct").as("distinct_b"), col("mode_value").as("mode_b"))
    pa.join(pb, "col_name")
      .select(col("col_name"), col("n_a"), col("n_b"),
        col("null_a"), col("null_b"),
        (col("null_b").cast("double") / col("n_b").cast("double") -
          col("null_a").cast("double") / col("n_a").cast("double"))
          .as("null_rate_delta"),
        col("distinct_a"), col("distinct_b"), col("mode_a"), col("mode_b"),
        (col("mode_a") =!= col("mode_b")).as("mode_changed"))
  }

  /** Discrete power-law MLE over a (value, count) census — the
    * heavy-tail exponent α̂ = 1 + N / Σ c_v·ln(v/(vmin−½)) (Clauset,
    * Shalizi & Newman 2009, continuous approximation) for degree /
    * activity / frequency distributions: the "how heavy is this tail"
    * companion to [[zipfSlope]] (Zipf fits rank-frequency of a term
    * list; this fits the distribution of a count variable — user
    * activity, node degree, doc length). Values below `vmin` are
    * excluded (the standard tail fit).
    *
    * Parity: the only float work is the Σ c_v·ln(·) fold, run in
    * VALUE order over the bounded census list (the q237 contract);
    * each term is one long→double cast, one division, one ln, one
    * multiply in fixed shape. Output one row: (n, vmin, alpha). */
  def powerLawAlpha(census: DataFrame, valueCol: String, countCol: String,
      vmin: Long): DataFrame = {
    require(vmin >= 1, s"vmin must be >= 1, got $vmin")
    val tail = census
      .select(col(valueCol).cast("long").as("v"), col(countCol).cast("long").as("c"))
      .where(col("v") >= vmin)
    tail
      .agg(sum(col("c")).as("n"),
        sort_array(collect_list(struct(col("v"), col("c")))).as("__l"))
      .select(col("n"), lit(vmin).as("vmin"), expr(
        s"""aggregate(__l, CAST(0.0 AS DOUBLE), (acc, e) ->
           |  acc + CAST(e.c AS DOUBLE)
           |    * ln(CAST(e.v AS DOUBLE) / ${vmin - 0.5}))""".stripMargin)
        .as("__s"))
      .select(col("n"), col("vmin"),
        when(col("__s") > 0.0,
          lit(1.0) + col("n").cast("double") / col("__s")).as("alpha"))
  }

  /** Heaps'-law fit — vocabulary growth V ≈ K·nᵝ estimated by OLS of
    * ln V on ln n across groups (each group one (tokens, distinct)
    * point): [[zipfSlope]]'s companion (Zipf describes one corpus's
    * frequency decay; Heaps predicts how much NEW vocabulary the next
    * 10 TB brings — the shard-dictionary and tokenizer-budget
    * question). β well below 1 is healthy natural text; β ≈ 1 says
    * near-unbounded vocabulary (ids, hashes, boilerplate churn).
    *
    * Parity: per-group token totals and distincts are exact integer
    * censuses; the four OLS sums fold over the GROUP-sorted point list
    * in order (the q246 contract — pure-additive accumulator fields).
    * Output one row: (n_groups, beta, ln_k). */
  def heapsFit(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("g"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
    val points = toks.groupBy(col("g"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("v"))
      .where(col("n_tok") > 0L && col("v") > 0L)
    val folded = points
      .agg(collect_list(struct(col("g"), col("n_tok"), col("v"))).as("__l"))
      .select(array_sort(col("__l")).as("__l"))
      .select(expr(
        """aggregate(
          |  transform(__l, e -> struct(
          |    ln(CAST(e.n_tok AS DOUBLE)) AS x, ln(CAST(e.v AS DOUBLE)) AS y)),
          |  struct(CAST(0 AS BIGINT) AS i, CAST(0.0 AS DOUBLE) AS sx,
          |         CAST(0.0 AS DOUBLE) AS sy, CAST(0.0 AS DOUBLE) AS sxy,
          |         CAST(0.0 AS DOUBLE) AS sxx),
          |  (acc, e) -> struct(
          |    acc.i + 1 AS i,
          |    acc.sx + e.x AS sx,
          |    acc.sy + e.y AS sy,
          |    acc.sxy + e.x * e.y AS sxy,
          |    acc.sxx + e.x * e.x AS sxx))
          |""".stripMargin).as("__f"))
      .select(col("__f.i").as("n_groups"), col("__f.sx").as("__sx"),
        col("__f.sy").as("__sy"), col("__f.sxy").as("__sxy"),
        col("__f.sxx").as("__sxx"))
    val den = col("n_groups") * col("__sxx") - col("__sx") * col("__sx")
    val beta = (col("n_groups") * col("__sxy") - col("__sx") * col("__sy")) / den
    folded
      .withColumn("beta", when(den =!= 0.0, beta))
      .withColumn("ln_k",
        (col("__sy") - col("beta") * col("__sx")) / col("n_groups").cast("double"))
      .select(col("n_groups"), col("beta"), col("ln_k"))
  }

  /** Functional-dependency discovery over the given columns — the
    * profiling step that finds accidental keys and derivable columns
    * before anyone joins on a non-key: det → dep HOLDS iff every
    * determinant value maps to exactly one dependent value, i.e.
    * |distinct(det)| == |distinct(det, dep)| (nulls count as a value —
    * the census view of FDs, exact). One (det, dep)-census aggregation
    * per ordered pair, each map-side combined; output is pairs-sized.
    * `violations` reports how many determinant values break the FD —
    * 0 ⟺ holds — so near-FDs (dirty data) are visible, not binary. */
  def functionalDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    pairs.map { case (det, dep) =>
      df.select(col(det).cast("string").as("a"), col(dep).cast("string").as("b"))
        .groupBy(col("a"))
        // count null as its own dependent value WITHOUT a sentinel
        // string (a sentinel can collide with real data and a raw
        // escape byte makes the file binary to git)
        .agg((countDistinct(col("b")) +
          max(when(col("b").isNull, 1L).otherwise(0L))).as("nb"))
        .agg(count(lit(1)).as("n_det"),
          sum(when(col("nb") > 1, 1L).otherwise(0L)).as("violations"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_det"), col("violations"),
          (col("violations") === 0L).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Simpson diversity per group — the concentration profile of a
    * categorical census (vocabulary, sources, labels) with NO logs:
    * unbiased collision probability
    *   λ = Σ c_i(c_i − 1) / (N(N − 1))
    * (the chance two draws WITHOUT replacement match), its complement
    * 1 − λ (Gini–Simpson diversity), and the effective number of
    * categories N²/Σc_i² (inverse Simpson — "this source behaves like
    * k equally-common tokens"). The diversity gate that, unlike
    * Shannon entropy, is an exact RATIONAL of integer counts — no ln
    * parity contract needed, partition-order free by construction.
    *
    * Scale shape: one (group, category) census (map-side combined),
    * one group re-aggregation; squares widen to decimal(38,0) (c² at
    * billion-count categories overflows a long). Output: (group, n,
    * n_categories, simpson_lambda, diversity, effective); lambda null
    * when n < 2. */
  def simpsonDiversity(df: DataFrame, groupCol: String,
      categoryCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df.where(col(categoryCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(categoryCol).as("cat"))
      .agg(count(lit(1)).as("c"))
    val sums = census.groupBy(col("g")).agg(
      sum(col("c")).as("n"), count(lit(1)).as("n_categories"),
      sum(col("c").cast(dec) * col("c").cast(dec)).cast(dec).as("__c2"),
      sum(col("c").cast(dec) * (col("c") - 1L).cast(dec)).cast(dec)
        .as("__cc1"))
    val nD = col("n").cast(dec)
    val lam = col("__cc1").cast("double") /
      (nD * (nD - 1)).cast(dec).cast("double")
    sums.select(col("g"), col("n"), col("n_categories"),
      when(col("n") > 1L, lam).as("simpson_lambda"),
      when(col("n") > 1L, lit(1.0) - lam).as("diversity"),
      ((nD * nD).cast(dec).cast("double") / col("__c2").cast("double"))
        .as("effective"))
  }

  /** Yule's characteristic K per group (Yule 1944) — the
    * length-robust lexical-repetitiveness number next to
    * [[simpsonDiversity]]: over the token-frequency spectrum V_m (how
    * many types occur exactly m times),
    *   K = 10⁴ · (Σ m²·V_m − N) / N²
    * where N is the token count. K barely moves as a text grows (the
    * property type-token ratio lacks), so it compares template-stuffed
    * sources against prose at any document length — boilerplate and
    * spam push K up an order of magnitude. Exact integers until ONE
    * final division: Σm²V_m = Σ c_tok² over the type census, so no ln,
    * no fold order, partition-free by construction.
    *
    * Scale shape: one (group, token) census (map-side combined), one
    * group rollup. Whitespace tokens, lowercased — the [[distinctN]]
    * convention. Output: (g, n_tokens, n_types, yule_k); null K when
    * the group has no token. */
  def yuleK(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val toks = df.select(col(groupCol).as("g"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
    val census = toks.groupBy(col("g"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val sums = census.groupBy(col("g")).agg(
      sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
      sum(col("c").cast(dec) * col("c").cast(dec)).cast(dec).as("__m2"))
    val nD = col("n_tokens").cast(dec)
    sums.select(col("g"), col("n_tokens"), col("n_types"),
      when(col("n_tokens") > 0L,
        (lit(10000L).cast(dec) * (col("__m2") - nD).cast(dec)).cast(dec)
          .cast("double") / (nD * nD).cast(dec).cast("double"))
        .as("yule_k"))
  }

  /** Inclusion-dependency census — [[functionalDependencies]]'s
    * cross-table sibling: for each candidate (dependent column ⊆
    * referenced column), how many DISTINCT dependent values have no
    * match on the referenced side? 0 ⟺ the IND (foreign-key shape)
    * holds; a nonzero count measures how dirty a near-FK is instead of
    * collapsing to a binary verdict. Values compare as canonical
    * strings (the FD discipline) — candidates should pair same-typed
    * key columns; nulls are excluded on both sides (SQL FK semantics).
    *
    * Each candidate is `(depName, depDf, depCol, refName, refDf,
    * refCol)`; names label the output rows. Scale shape: per candidate,
    * two DISTINCT censuses (map-side combined) and one value-keyed left
    * join — both sides shuffle only their distinct values, never raw
    * rows; a true-FK referenced side is the small one and AQE
    * broadcast-flips it. Candidates union into one pairs-sized result.
    * Output: (dependent, referenced, n_dep_distinct, n_violating,
    * holds). */
  def inclusionDependencies(
      candidates: Seq[(String, DataFrame, String, String, DataFrame, String)])
      : DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate pair")
    candidates.map { case (depName, depDf, depCol, refName, refDf, refCol) =>
      val dep = depDf.where(col(depCol).isNotNull)
        .select(col(depCol).cast("string").as("v")).distinct()
      val ref = refDf.where(col(refCol).isNotNull)
        .select(col(refCol).cast("string").as("v")).distinct()
        .withColumn("__hit", lit(1))
      dep.join(ref, Seq("v"), "left")
        .agg(count(lit(1)).as("n_dep_distinct"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(s"$depName.$depCol").as("dependent"),
          lit(s"$refName.$refCol").as("referenced"),
          col("n_dep_distinct"), col("n_violating"),
          (col("n_violating") === 0L).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Sortedness audit: per `partCol` slice, walk rows in their STORAGE
    * order (`seqCols` — an ingestion sequence, a file offset, a
    * monotonically-assigned id) and count adjacent pairs where the
    * CLAIMED sort key `orderCol` goes backwards — the check behind "is
    * this table still clustered by ts" before trusting range pruning,
    * an as-of merge path, or a Z-order layout claim ([[ZOrder]]'s
    * audit cousin). `inversions` = 0 ⟺ the slice is sorted by
    * `orderCol` along its sequence. Integer census, one lag window per
    * slice (bounded by slice size, never corpus-wide). */
  def sortednessCensus(df: DataFrame, partCol: String, seqCols: Seq[String],
      orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(seqCols.map(col): _*)
    df.select((col(partCol) +: col(orderCol).as("__v") +:
        seqCols.map(col)): _*)
      .withColumn("__prev", lag(col("__v"), 1).over(w))
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__prev") > col("__v"), 1L).otherwise(0L))
          .as("inversions"))
  }

  /** Zipf-law fit over a token frequency census: OLS of ln(freq) on
    * ln(rank) across the top-R terms — the corpus-health number (a
    * natural-language corpus slopes near −1; template spam or broken
    * tokenization bends it). Returns one row: (n_terms, slope,
    * intercept) with slope/intercept from the closed-form two-variable
    * OLS.
    *
    * Parity design: ranks come from a BOUNDED top-R cut ((freq desc,
    * token) total order, TakeOrdered — never a global sort of the
    * vocabulary), and all four float sums (Σx, Σy, Σxy, Σx²,
    * x = ln rank, y = ln freq) fold over the rank-ORDERED list — the
    * q237 in-order fold contract, so the doubles are bit-reproducible
    * cross-engine. The census is the only row-scale aggregation. */
  def zipfSlope(df: DataFrame, textCol: String, topR: Int): DataFrame = {
    val census = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    // bounded top-R cut -> one R-element list sorted (freq desc, tok);
    // rank = position + 1. Every fold term is PURE-ADDITIVE on its own
    // accumulator field (acc.sx + x(e)), the list_reduce shape that is
    // safe under both immutable and in-place field semantics.
    val folded = census
      .orderBy(col("freq").desc, col("tok")).limit(topR)
      .agg(collect_list(struct((-col("freq")).as("nf"), col("tok"))).as("__l"))
      .select(array_sort(col("__l")).as("__l"))
      .select(expr(
        """aggregate(
          |  transform(__l, (e, i) -> struct(
          |    ln(CAST(i + 1 AS DOUBLE)) AS x,
          |    ln(CAST(-e.nf AS DOUBLE)) AS y)),
          |  struct(CAST(0 AS BIGINT) AS i, CAST(0.0 AS DOUBLE) AS sx,
          |         CAST(0.0 AS DOUBLE) AS sy, CAST(0.0 AS DOUBLE) AS sxy,
          |         CAST(0.0 AS DOUBLE) AS sxx),
          |  (acc, e) -> struct(
          |    acc.i + 1 AS i,
          |    acc.sx + e.x AS sx,
          |    acc.sy + e.y AS sy,
          |    acc.sxy + e.x * e.y AS sxy,
          |    acc.sxx + e.x * e.x AS sxx))
          |""".stripMargin).as("__f"))
      .select(col("__f.i").as("n_terms"), col("__f.sx").as("__sx"),
        col("__f.sy").as("__sy"), col("__f.sxy").as("__sxy"),
        col("__f.sxx").as("__sxx"))
    val slope = (col("n_terms") * col("__sxy") - col("__sx") * col("__sy")) /
      (col("n_terms") * col("__sxx") - col("__sx") * col("__sx"))
    folded
      .withColumn("slope", slope)
      .withColumn("intercept",
        (col("__sy") - col("slope") * col("__sx")) / col("n_terms").cast("double"))
      .select(col("n_terms"), col("slope"), col("intercept"))
  }

  /** Benford's-law first-digit probabilities, computed ONCE on the
    * driver's JVM. Math.log10 is not correctly-rounded, so a SQL
    * replay must embed THESE doubles as shortest-repr literals rather
    * than re-deriving them with the other engine's log10 (the q275
    * exp(-lambda) seam discipline). */
  val BenfordP: IndexedSeq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Benford's-law first-digit census per group — the classic
    * fabricated-numbers / unit-mix screen for numeric feeds (Benford
    * 1938; Nigrini's audit usage). `valueCol` must be an INTEGRAL
    * column (LongType): doubles don't first-digit deterministically
    * across engines (string repr differs), so callers floor upstream.
    * Non-positive values are excluded (the law is defined on positive
    * magnitudes); the exclusion is visible as n_group vs the caller's
    * row count.
    *
    * Output, one row per (group, digit) present: digit frequency
    * n_obs, group total n_group, the expected Benford probability
    * p_benford, and the group's chi-square statistic repeated on each
    * of its rows (sum over the group's 9 possible digits of
    * (obs - exp)²/exp, with ABSENT digits contributing their full
    * expected mass).
    *
    * Scale shape: first digit is string-prefix arithmetic on the long
    * (no log10 in the row path), one (group, digit) hash census with
    * map-side combine, then a ≤9-row-per-group window on the AGGREGATED
    * table for the group total and chi² — bounded rows, no global
    * window, nothing driver-side. */
  def benfordCensus(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"benfordCensus needs an integral (long) column, got " +
        df.schema(valueCol).dataType)
    val pExpr = BenfordP.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (p, i)) => when(col("digit") === (i + 1), lit(p)).otherwise(acc)
    }
    val pArr = BenfordP.map(p => s"CAST('$p' AS DOUBLE)")
      .mkString("array(", ", ", ")")
    val census = df
      .where(col(valueCol) > 0L)
      .select(col(groupCol).as("g"),
        substring(col(valueCol).cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("g"), col("digit")).agg(count(lit(1)).as("n_obs"))
      .withColumn("p_benford", pExpr)
    // chi² over ALL nine digits: present digits contribute (n - e)²/e,
    // absent ones their full expected mass e — equivalently the sum
    // over PRESENT digits of ((n-e)²/e - e) plus n_group (Σe = n_group).
    // The float sum folds the ≤9-element digit-sorted list IN ORDER
    // (the q237 contract — a window SUM's order is partition-dependent);
    // n_group is an exact integer sum.
    val byG = census.groupBy(col("g")).agg(
        sum(col("n_obs")).as("n_group"),
        array_sort(collect_list(struct(col("digit"), col("n_obs")))).as("__dl"))
      .withColumn("chi2", expr(
        s"""aggregate(__dl, CAST(0.0 AS DOUBLE), (acc, e) ->
           |  acc + (CAST(e.n_obs AS DOUBLE) -
           |         element_at($pArr, e.digit) * CAST(n_group AS DOUBLE))
           |      * (CAST(e.n_obs AS DOUBLE) -
           |         element_at($pArr, e.digit) * CAST(n_group AS DOUBLE))
           |      / (element_at($pArr, e.digit) * CAST(n_group AS DOUBLE))
           |      - element_at($pArr, e.digit) * CAST(n_group AS DOUBLE))
           |""".stripMargin) + col("n_group").cast("double"))
      .select(col("g"), col("n_group"), col("chi2"))
    census.join(byG, "g")
      .select(col("g"), col("digit"), col("n_obs"), col("n_group"),
        col("p_benford"), col("chi2"))
  }

  /** Fano dispersion index per group over a period column — the
    * burstiness profiler: D = var(count per period)/mean(count per
    * period), where a Poisson arrival process gives D ≈ 1, D ≫ 1 is
    * bursty (crawl storms, bot traffic, replay floods), D < 1 is
    * over-regular (rate-limited or synthetic). The traffic-shape
    * number a pipeline reads per source/event-type BEFORE alerting on
    * volume, next to the rolling-burst detector (q258) which finds
    * WHEN — this says WHETHER the process is bursty at all.
    *
    * Zero-period discipline: periods where a group logged nothing
    * still count — n is the number of distinct periods observed in
    * the WHOLE input (the shared observation window), so a group
    * active in 3 of 30 days is scored over 30. Missing cells change
    * only n; the sums Σc, Σc² come from observed cells.
    *
    * Exactness: with n periods, S1 = Σc, S2 = Σc², sample-variance
    * dispersion D = (n·S2 − S1²) / ((n−1)·S1) — all-integer
    * numerator/denominator (decimal(38,0)), ONE correctly-rounded
    * division; mean = S1/n likewise. Null D when S1 = 0 (silent
    * group) or n < 2.
    *
    * Scale shape: one (group, period) census at row scale, a group
    * re-aggregation, one broadcast scalar (global period count). No
    * window, no join at row grain. Output: (g, n_periods, n_events,
    * mean, dispersion). */
  def dispersionIndex(df: DataFrame, groupCol: String,
      periodCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cell = df.where(col(periodCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(periodCol).as("p"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val n = broadcast(cell.select(col("p")).distinct()
      .agg(count(lit(1)).as("n_periods")))
    val sums = cell.groupBy(col("g")).agg(
      sum(col("c")).as("n_events"),
      sum(col("c").cast(dec) * col("c").cast(dec)).cast(dec).as("__s2"))
    val nD = col("n_periods").cast(dec)
    val s1 = col("n_events").cast(dec)
    sums.crossJoin(n)
      .select(col("g"), col("n_periods"), col("n_events"),
        (s1.cast("double") / col("n_periods").cast("double")).as("mean"),
        when(col("n_events") > 0L && col("n_periods") > 1L,
          (nD * col("__s2") - s1 * s1).cast(dec).cast("double") /
            ((nD - 1) * s1).cast(dec).cast("double")).as("dispersion"))
  }

  /** Good–Turing frequency re-estimation (Good 1953) per group over a
    * token column — the language-model smoothing census: from the
    * frequency-of-frequencies N_r (how many distinct tokens occur
    * exactly r times), the adjusted count r* = (r+1)·N_{r+1}/N_r and
    * the unseen-mass estimate p0 = N_1/N. The corpus-coverage number a
    * training pipeline reads before claiming a vocabulary is saturated
    * ([[heapsFit]] extrapolates vocabulary GROWTH; this prices the
    * probability mass of tokens never seen at all).
    *
    * Exactness: every N_r and N is an exact count; r* and p0 are one
    * correctly-rounded division of exact integers each (decimal(38,0)
    * products) — no float fold anywhere. r* is null for the largest
    * emitted r when N_{r+1} = 0 (the classic N_{r+1} gap; smoothing
    * the tail is a modeling choice this census does not make).
    *
    * Scale shape: one (group, token) census — the only row-scale
    * aggregation — then a (group, r) re-aggregation of the census
    * (≤ maxR rows per group emitted), a self-join on (g, r+1) over
    * that bounded table, and a broadcast of per-group totals. Output:
    * (g, r, n_r, r_star, p0) for r ≤ maxR, plus each group's totals
    * (n_tok, vocab) repeated per row. */
  def goodTuring(df: DataFrame, groupCol: String, tokenCol: String,
      maxR: Int = 5): DataFrame = {
    require(maxR >= 1, s"maxR must be >= 1, got $maxR")
    val dec = "decimal(38,0)"
    val census = df.where(col(tokenCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(tokenCol).as("tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val fof = census.groupBy(col("g"), col("c").as("r"))
      .agg(count(lit(1)).as("n_r"))
    val tot = census.groupBy(col("g"))
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("vocab"))
    val n1 = fof.where(col("r") === 1L)
      .select(col("g"), col("n_r").as("__n1"))
    val nxt = fof.select(col("g"), (col("r") - 1L).as("r"),
      col("n_r").as("__nr1"))
    fof.where(col("r") <= maxR.toLong)
      .join(nxt, Seq("g", "r"), "left")
      .join(tot, "g")
      .join(n1, Seq("g"), "left")
      .select(col("g"), col("n_tok"), col("vocab"), col("r"), col("n_r"),
        when(col("__nr1").isNotNull,
          ((col("r") + 1L).cast(dec) * col("__nr1").cast(dec)).cast(dec)
            .cast("double") / col("n_r").cast("double")).as("r_star"),
        (coalesce(col("__n1"), lit(0L)).cast("double") /
          col("n_tok").cast("double")).as("p0"))
  }

  /** Leave-one-group-out influence — the cheapest honest answer to
    * "which source is dragging the metric": because mean and variance
    * are closed forms of (n, Σy, Σy²), the corpus-without-group-g
    * statistics need NO recomputation pass — subtract g's exact
    * moments from the scope totals. delta_mean > 0 reads "removing g
    * RAISES the mean" (g pulls it down). The group-level face of
    * data-valuation scans (leave-one-out over sources, not rows —
    * row-level influence at 100 TB is a training-loop concern, not an
    * engine one).
    *
    * Exactness: all moments are exact decimal sums; every reported
    * statistic is a pinned-shape combination of single divisions.
    * loo_mean null when g is the whole scope; loo_var null when fewer
    * than 2 rows remain.
    *
    * Scale shape: one (scope, group) census aggregation, one scope
    * rollup of that census, one census-grain join back — map-side
    * combined, nothing row-scale after the first pass. Output:
    * (sc, g, n_g, mean_g, mean_all, loo_mean, delta_mean, loo_var). */
  def leaveOneOut(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("sc"), col(groupCol).as("g"),
        col(valueCol).cast("long").as("y"))
    val yD = col("y").cast(dec)
    val cell = base.groupBy(col("sc"), col("g")).agg(
        count(lit(1L)).as("n_g"), sum(yD).cast(dec).as("s_g"),
        sum((yD * yD).cast(dec)).cast(dec).as("q_g"))
      .localCheckpoint(true)
    val tot = cell.groupBy(col("sc")).agg(
      sum(col("n_g")).as("n"), sum(col("s_g")).cast(dec).as("s"),
      sum(col("q_g")).cast(dec).as("q"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val j = cell.join(tot, "sc")
    val rn = (col("n") - col("n_g"))
    val rs = (col("s") - col("s_g")).cast(dec)
    val rq = (col("q") - col("q_g")).cast(dec)
    val rnD = rn.cast(dec)
    val meanAll = dd(col("s")) / dd(col("n"))
    val looMean = dd(rs) / dd(rn)
    val looVar = (rnD * rq - rs * rs).cast(dec).cast("double") /
      (rnD * (rnD - 1)).cast(dec).cast("double")
    j.select(col("sc"), col("g"), col("n_g"),
      (dd(col("s_g")) / dd(col("n_g"))).as("mean_g"),
      meanAll.as("mean_all"),
      when(rn > 0L, looMean).as("loo_mean"),
      when(rn > 0L, looMean - meanAll).as("delta_mean"),
      when(rn > 1L, looVar).as("loo_var"))
  }

  /** Distinct-n diversity per group — the standard lexical-diversity
    * readout for generated/filtered corpora (Li et al. 2016):
    * distinct-n = |unique word n-grams| / |word n-gram instances|,
    * n = 1..maxN. A collapsed corpus (mode-collapse, template spam,
    * over-aggressive dedup survivors) shows distinct-2/3 cratering
    * while token counts look healthy — this is the cheap canary the
    * [[heapsFit]] growth curve reads at corpus grain and repetition
    * quality flags read at document grain.
    *
    * Exactness: pure integer censuses (token splits, n-gram concats,
    * distinct counts) and one terminal division. Distincts use the
    * two-stage (group, n, gram) census → count pattern, never a
    * countDistinct expand.
    *
    * Scale shape: one explode to (group, n, gram) grain per n (rows ×
    * maxN × tokens — the corpus retokenized maxN times, same cost
    * class as any shingle pass, but each pass is ONE codegen'd kernel
    * call per row — [[graft.functions.FastHash.ngramsValue]] — not an
    * interpreted transform/slice/array_join chain, which was the
    * dominant CPU cost of this census), one census shuffle keyed by
    * the high-cardinality gram, one group-keyed rollup. Output: (g, n,
    * n_grams, n_types, distinct_ratio). */
  def distinctN(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN in 1..8, got $maxN")
    val exploded = (1 to maxN).map { n =>
      df.select(col(groupCol).as("g"), lit(n).as("n"),
        explode(graft.functions.FastHash.ngrams(col(textCol), n))
          .as("gram"))
    }.reduce(_ unionAll _)
    val cells = exploded.groupBy(col("g"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
    cells.groupBy(col("g"), col("n"))
      .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_types"))
      .select(col("g"), col("n"), col("n_grams"), col("n_types"),
        (col("n_types").cast("double") / col("n_grams").cast("double"))
          .as("distinct_ratio"))
  }

  /** Chao1 species-richness estimate (Chao 1984, bias-corrected form)
    * per group — "how many distinct values exist that this sample has
    * NOT yet seen": from the frequency-of-frequencies census,
    *   Chao1 = D + F₁(F₁−1) / (2(F₂+1)),
    * the lower-bound estimator ecology uses for unseen species and a
    * data pipeline uses for vocabulary/entity coverage — [[goodTuring]]
    * prices the unseen MASS, Chao1 counts the unseen TYPES, and
    * [[heapsFit]] extrapolates the growth curve; together they answer
    * "is another crawl worth it". The bias-corrected denominator
    * (F₂+1) keeps the estimate finite when no doubletons exist.
    *
    * Exactness: D, F₁, F₂ are exact integer censuses; the correction
    * term is one pinned double ratio of exact products. Scale shape:
    * one (group, value) census, one frequency rollup — map-side
    * combined, never a distinct expand. Output: (g, n_obs, d_obs, f1,
    * f2, chao1). */
  /** German-tank population estimate — serial-number inference: from a
    * uniform sample of a SERIAL id space, the UMVU estimator of the
    * population size is N̂ = m(1 + 1/k) − 1 with m the sample maximum
    * and k the sample size, SE ≈ (N̂ − m)·√(k/(k+2))-free classic form
    * √((N̂−k)(N̂+1)/ ... ) — here the standard frequentist
    * SE = √( (1/k)·(N̂−m)·(N̂+1) ) pinned. The data-ops read: estimate
    * a partner table's true row count from the ids that LEAKED into
    * your sample (partial feed audits, "how much of the id space have
    * we ingested"). [[chao1]] estimates unseen TYPES from frequency;
    * this estimates the id-space CEILING from order statistics —
    * different evidence, same "what's missing" question.
    *
    * Exactness: k and m are exact; N̂ and SE are pinned double shapes.
    * Assumes ids are serial from a fixed base and the sample is
    * uniform — both are the caller's contract. Output one row: (k, m,
    * n_hat, se, coverage = k/N̂). */
  def germanTank(sample: DataFrame, idCol: String): DataFrame = {
    val g = sample.where(col(idCol).isNotNull)
      .agg(count(lit(1)).as("k"), max(col(idCol).cast("long")).as("m"))
    def dd(c: Column): Column = c.cast("double")
    val nHat = dd(col("m")) + dd(col("m")) / dd(col("k")) - lit(1.0)
    g.withColumn("n_hat", when(col("k") > 0L, nHat))
      .select(col("k"), col("m"), col("n_hat"),
        when(col("k") > 0L,
          sqrt((col("n_hat") - dd(col("m"))) * (col("n_hat") + 1.0) /
            dd(col("k")))).as("se"),
        when(col("k") > 0L && col("n_hat") > 0.0,
          dd(col("k")) / col("n_hat")).as("coverage"))
  }

  def chao1(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    census.groupBy(col("g"))
      .agg(sum(col("c")).as("n_obs"), count(lit(1)).as("d_obs"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("g"), col("n_obs"), col("d_obs"), col("f1"), col("f2"),
        (col("d_obs").cast("double") +
          (col("f1").cast(dec) * (col("f1") - 1L).cast(dec)).cast(dec)
            .cast("double") /
          (lit(2L).cast(dec) * (col("f2") + 1L).cast(dec)).cast(dec)
            .cast("double")).as("chao1"))
  }

  /** Vocabulary coverage curve — "how big must the token vocabulary be"
    * answered from data: for each candidate size K, the share of token
    * INSTANCES covered by the top-K types (freq desc, token asc). The
    * tokenizer-sizing report ([[heapsFit]] extrapolates type GROWTH;
    * this prices truncation at each size — the two ends of the same
    * decision). All operating points come from one token census.
    *
    * Scale shape: one corpus tokenization into a (token, freq) census
    * (map-side combined), then a DISTRIBUTED top-max(K) —
    * TakeOrderedAndProject, never a global window over the unbounded
    * vocabulary — so the only global sort is over the max(K)-bounded
    * slice. Exactness: all counts exact integers; coverage one terminal
    * division. Output per K: (k, n_types, covered, total, coverage). */
  def vocabCoverageCurve(df: DataFrame, textCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), s"ks must be positive: $ks")
    val kMax = ks.max
    val census = df
      .select(explode(graft.functions.FastHash.ngrams(col(textCol), 1))
        .as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val total = broadcast(census.agg(sum(col("freq")).as("total")))
    import org.apache.spark.sql.expressions.Window
    // bounded: the limit() feeds TakeOrdered; the rank window below
    // runs over <= kMax rows by construction
    val top = census.orderBy(col("freq").desc, col("tok")).limit(kMax)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("freq").desc, col("tok"))).cast("long"))
    val kDf = broadcast(df.sparkSession
      .createDataFrame(ks.map(k => Tuple1(k.toLong))).toDF("k"))
    kDf.join(top, col("rk") <= col("k"), "left")
      .groupBy(col("k"))
      .agg(count(col("rk")).as("n_types"), sum(col("freq")).as("covered"))
      .crossJoin(total)
      .select(col("k"), col("n_types"),
        coalesce(col("covered"), lit(0L)).as("covered"), col("total"),
        (coalesce(col("covered"), lit(0L)).cast("double") /
          col("total").cast("double")).as("coverage"))
  }
}
