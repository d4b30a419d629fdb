package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group distribution drift against the corpus: KL divergence of each
  * group's token distribution from the whole-corpus distribution, over
  * the same fixed 256-bucket md5-hashed feature space as [[Dsir]]. The
  * corpus-health monitor a training pipeline runs per source / per crawl
  * snapshot: a source whose divergence jumps is drifting (spam influx,
  * template change, encoding breakage) before any downstream metric
  * shows it.
  *
  * Scale shape: one (group, bucket)-keyed census (map-side combined,
  * <= 256 rows per group out), corpus marginals by a second tiny
  * aggregate of that census — the corpus is scanned once and never
  * shuffled at row grain. Divergence sums run over the SORTED bucket
  * list per group (an in-order fold), so the doubles are bit-reproducible
  * cross-engine despite being a multi-term float sum (up to 256 terms —
  * one per OBSERVED corpus bucket).
  */
object Divergence {

  /** KL(group || corpus) and reverse KL per group, Laplace(+1)-smoothed
    * over the OBSERVED corpus bucket support (smoothing over the fixed
    * 256 would de-normalize both distributions when the vocabulary is
    * small enough to miss buckets — p would sum below 1 and the "KL"
    * could go negative; over the observed support both sum to exactly 1
    * and Gibbs' inequality holds). Output: (group, n_tok, kl, kl_rev). */
  def sourceDivergence(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("grp"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .select(col("grp"), Dsir.bucket(col("tok")).as("b"))
    val cell = toks.groupBy(col("grp"), col("b")).agg(count(lit(1)).as("n"))
    val gTot = cell.groupBy(col("grp")).agg(sum(col("n")).as("g_tot"))
    val cAgg = cell.groupBy(col("b")).agg(sum(col("n")).as("c_n"))
    val cTot = cAgg.agg(sum(col("c_n")).as("c_tot"),
      count(lit(1)).as("n_buckets"))
    // per (group, bucket): smoothed p_g and p_c. A group can miss
    // buckets the corpus has — the join runs corpus-bucket-side so every
    // group sees all corpus buckets (n = 0 smoothed); buckets absent
    // from the whole corpus contribute a constant that cancels nothing
    // but is identical cross-engine only if both enumerate them, so the
    // space is the OBSERVED corpus buckets (the corpus defines the
    // support; at 256 tiny buckets over any real corpus all are hit).
    val grid = gTot.crossJoin(cAgg).crossJoin(broadcast(cTot))
      .join(cell, Seq("grp", "b"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("p_g", (col("n") + lit(1L)).cast("double") /
        (col("g_tot") + col("n_buckets")).cast("double"))
      .withColumn("p_c", (col("c_n") + lit(1L)).cast("double") /
        (col("c_tot") + col("n_buckets")).cast("double"))
      .withColumn("term", struct(col("b"),
        (col("p_g") * log(col("p_g") / col("p_c"))).as("kl"),
        (col("p_c") * log(col("p_c") / col("p_g"))).as("kl_rev")))
    grid.groupBy(col("grp"))
      .agg(first(col("g_tot")).as("n_tok"),
        array_sort(collect_list(col("term"))).as("terms"))
      .select(col("grp"), col("n_tok"),
        foldSum(col("terms"), "kl").as("kl"),
        foldSum(col("terms"), "kl_rev").as("kl_rev"))
  }

  /** In-order fold over the bucket-sorted term list — deterministic
    * double summation (the q121/q133 pattern). */
  private def foldSum(terms: Column, field: String): Column =
    aggregate(terms, lit(0.0d), (acc, t) => acc + t.getField(field))

  /** Jensen–Shannon divergence per group vs the corpus —
    * [[sourceDivergence]]'s bounded symmetric sibling: JS(P‖Q) =
    * ½KL(P‖M) + ½KL(Q‖M) with M = (P+Q)/2, finite for DISJOINT
    * supports (≤ ln 2) with NO smoothing choice at all — the drift
    * number you can put on a dashboard with a fixed [0, 1] scale
    * (js_norm = js/ln 2; √js is a metric). Same fixed 256-bucket
    * md5-hashed space as [[Dsir]]/[[sourceDivergence]].
    *
    * Determinism: p, q are exact-integer ratios (one correctly-rounded
    * division each); terms with p = 0 contribute exactly ½q·ln 2 (the
    * q-side limit — no smoothing constant pollutes it); the ≤256 terms
    * fold in bucket order (the q237 contract). Corpus marginals
    * INCLUDE the group itself (the [[sourceDivergence]] convention).
    *
    * Scale shape: identical to [[sourceDivergence]] — one (group,
    * bucket) census, corpus marginals re-aggregate the census, bounded
    * per-group folds. Output: (grp, n_tok, js, js_norm). */
  def jensenShannon(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("grp"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .select(col("grp"), Dsir.bucket(col("tok")).as("b"))
    val cell = toks.groupBy(col("grp"), col("b")).agg(count(lit(1)).as("n"))
    val gTot = cell.groupBy(col("grp")).agg(sum(col("n")).as("g_tot"))
    val cAgg = cell.groupBy(col("b")).agg(sum(col("n")).as("c_n"))
    val cTot = cAgg.agg(sum(col("c_n")).as("c_tot"))
    val grid = gTot.crossJoin(cAgg).crossJoin(broadcast(cTot))
      .join(cell, Seq("grp", "b"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("p", col("n").cast("double") / col("g_tot").cast("double"))
      .withColumn("q", col("c_n").cast("double") / col("c_tot").cast("double"))
      .withColumn("term", struct(col("b"),
        (when(col("n") > 0L,
          lit(0.5) * col("p") *
            log(lit(2.0) * col("p") / (col("p") + col("q"))))
          .otherwise(lit(0.0)) +
          lit(0.5) * col("q") *
            log(lit(2.0) * col("q") / (col("p") + col("q")))).as("js")))
    grid.groupBy(col("grp"))
      .agg(first(col("g_tot")).as("n_tok"),
        array_sort(collect_list(col("term"))).as("terms"))
      .select(col("grp"), col("n_tok"),
        foldSum(col("terms"), "js").as("js"),
        (foldSum(col("terms"), "js") / lit(math.log(2.0))).as("js_norm"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic over an integer-quantized
    * value column: D = max over v of |ECDF_a(v) − ECDF_b(v)| — the
    * nonparametric "did this numeric distribution move" test between
    * two slices (before/after a pipeline change, this crawl vs last).
    * The bucket-histogram drift monitors (PSI, [[sourceDivergence]])
    * depend on a bucketing choice; KS is bucket-free and sensitive to
    * any location/shape shift.
    *
    * Exactness: with counts n_a, n_b and cumulative counts A(v), B(v),
    * D = max |A(v)·n_b − B(v)·n_a| / (n_a·n_b) — the max runs over
    * INTEGER cross-products, so the argmax is exact and the single
    * terminal division is the only float op.
    *
    * Scale shape: one (value, side) census is the only row-scale
    * aggregation. The cumulative walk over distinct values does NOT
    * use a global one-partition window: values split into ~256 RANGE
    * buckets by integer offset-division (bucket order = value order),
    * per-bucket running sums are a partitioned window, and bucket
    * offsets come from a triangular join over the bounded bucket count
    * table, broadcast back — the [[GlobalOrder]] prefix-sum shape.
    * Output one row: (n_a, n_b, n_values, d_num, d). */
  def ksTwoSample(df: DataFrame, valueCol: String, isRight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the census ONCE (eager localCheckpoint, the q170/q221
    // lesson): it feeds the bounds row, the running sums AND the bucket
    // totals — without the checkpoint each consumer re-scans the corpus
    val census = df
      .select(col(valueCol).cast("long").as("__v"),
        when(isRight, 1L).otherwise(0L).as("__r"))
      .groupBy(col("__v"))
      .agg(sum(lit(1L) - col("__r")).as("__ca"), sum(col("__r")).as("__cb"))
      .localCheckpoint(true)
    val bounds = census.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
      sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
      count(lit(1)).as("n_values"))
    // INTEGER division throughout: `/` on longs is double division in
    // Spark, which would give every distinct value its own "bucket" and
    // turn the bounded triangular offsets join quadratic
    val bucketed = census.crossJoin(broadcast(bounds))
      .withColumn("__w", greatest(lit(1L), expr("(__hi - __lo) div 256") + 1L))
      .withColumn("__b", expr("(__v - __lo) div __w"))
    val wOrd = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val run = bucketed
      .withColumn("__ra", sum(col("__ca")).over(wOrd))
      .withColumn("__rb", sum(col("__cb")).over(wOrd))
    val btot = bucketed.groupBy(col("__b"))
      .agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
    val offs = btot.as("a")
      .join(btot.select(col("__b").as("__b2"), col("__ta").as("__ta2"),
        col("__tb").as("__tb2")), col("__b2") < col("a.__b"), "left")
      .groupBy(col("a.__b").as("__b"))
      .agg(coalesce(sum(col("__ta2")), lit(0L)).as("__oa"),
        coalesce(sum(col("__tb2")), lit(0L)).as("__ob"))
    run.join(broadcast(offs), "__b")
      .select(col("__na"), col("__nb"), col("n_values"),
        abs((col("__oa") + col("__ra")) * col("__nb") -
          (col("__ob") + col("__rb")) * col("__na")).as("__gap"))
      .groupBy(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"))
      .agg(max(col("__gap")).as("d_num"))
      .select(col("n_a"), col("n_b"), col("n_values"), col("d_num"),
        when(col("n_a") =!= 0L && col("n_b") =!= 0L,
          col("d_num").cast("double") / (col("n_a") * col("n_b")).cast("double"))
          .as("d"))
  }

  /** Two-sample Wasserstein-1 (earth mover) distance over an
    * integer-quantized value column — [[ksTwoSample]]'s integral
    * companion: KS reports the worst POINT of ECDF disagreement, W1 the
    * total AREA between the ECDFs, in value units:
    *   W1 = Σ_v |A(v)·n_b − B(v)·n_a| · (next(v) − v) / (n_a·n_b).
    * The drift monitor that distinguishes "one quantile moved a lot"
    * from "everything moved a little" — PSI/KL need a bucketing choice
    * and miss mass that moves WITHIN a bucket; W1 is bucket-free.
    *
    * Exactness: every term is an exact integer (cumulative-count
    * cross-products × value gaps, decimal(38,0)), so the sum is
    * order-insensitive — NO float fold anywhere; the single terminal
    * division is the only float op. Strictly stronger determinism than
    * the sorted-fold operators.
    *
    * Scale shape: the same census discipline as [[ksTwoSample]] — one
    * (value)-keyed row-scale aggregation, then ~256 range buckets with
    * partitioned running sums and a bounded triangular offsets join (no
    * global one-partition window). The next-distinct-value gap is a
    * bucket-local lead, patched across bucket boundaries by a bounded
    * join on the per-bucket minima. Output one row: (n_a, n_b,
    * n_values, w1); w1 null when either side is empty. */
  def wasserstein1(df: DataFrame, valueCol: String, isRight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val census = df
      .select(col(valueCol).cast("long").as("__v"),
        when(isRight, 1L).otherwise(0L).as("__r"))
      .groupBy(col("__v"))
      .agg(sum(lit(1L) - col("__r")).as("__ca"), sum(col("__r")).as("__cb"))
      .localCheckpoint(true)
    val bounds = census.agg(min(col("__v")).as("__lo"),
      max(col("__v")).as("__hi"), sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"), count(lit(1)).as("n_values"))
    val bucketed = census.crossJoin(broadcast(bounds))
      .withColumn("__w", greatest(lit(1L), expr("(__hi - __lo) div 256") + 1L))
      .withColumn("__b", expr("(__v - __lo) div __w"))
    val wOrd = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val run = bucketed
      .withColumn("__ra", sum(col("__ca")).over(wOrd))
      .withColumn("__rb", sum(col("__cb")).over(wOrd))
      .withColumn("__vn", lead(col("__v"), 1).over(wOrd))
    val btot = bucketed.groupBy(col("__b"))
      .agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"),
        min(col("__v")).as("__bv"))
    // ONE bounded non-equi join serves both directions: prior buckets
    // feed the count offsets, later buckets feed the next-value patch
    val offs2 = btot.as("a")
      .join(btot.select(col("__b").as("__b2"), col("__ta").as("__ta2"),
        col("__tb").as("__tb2"), col("__bv").as("__bv2")),
        col("__b2") =!= col("a.__b"), "left")
      .groupBy(col("a.__b").as("__b"))
      .agg(
        coalesce(sum(when(col("__b2") < col("a.__b"), col("__ta2"))), lit(0L))
          .as("__oa"),
        coalesce(sum(when(col("__b2") < col("a.__b"), col("__tb2"))), lit(0L))
          .as("__ob"),
        min(when(col("__b2") > col("a.__b"), col("__bv2"))).as("__nv"))
    val gap = abs(
      ((col("__oa") + col("__ra")).cast(dec) * col("__nb").cast(dec)).cast(dec) -
        ((col("__ob") + col("__rb")).cast(dec) * col("__na").cast(dec)).cast(dec))
    val delta = coalesce(col("__vn"), col("__nv")) - col("__v")
    run.join(broadcast(offs2), "__b")
      .select(col("__na"), col("__nb"), col("n_values"),
        when(delta.isNotNull, (gap.cast(dec) * delta.cast(dec)).cast(dec))
          .otherwise(lit(0L).cast(dec)).as("__term"))
      .groupBy(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"))
      .agg(sum(col("__term")).cast(dec).as("__w1num"))
      .select(col("n_a"), col("n_b"), col("n_values"),
        when(col("n_a") =!= 0L && col("n_b") =!= 0L,
          col("__w1num").cast("double") /
            (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double"))
          .as("w1"))
  }

  /** Two-sample Cramér–von Mises criterion (Anderson 1962) — the
    * third member of the ECDF drift battery: [[ksTwoSample]] reports
    * the WORST point of disagreement, [[wasserstein1]] the transport
    * area, CvM the MEAN-SQUARE disagreement weighted by where the data
    * actually sits:
    *   T = Σ_v t_v·(A(v)·n_b − B(v)·n_a)² / (N²·n_a·n_b),
    * (A, B cumulative counts at pooled value v, t_v the pooled count,
    * N = n_a + n_b). More sensitive than KS to many small ECDF gaps —
    * the "everything moved a little" signature KS underweights — while
    * staying location-free, unlike W1.
    *
    * Exactness: every term t·(A·n_b − B·n_a)² is an exact
    * decimal(38,0) integer, so the sum is order-insensitive and the
    * single terminal division is the only float op. CAPACITY
    * precondition (the [[Autocorr.acf]] discipline): the numerator is
    * bounded by N⁵/4, so exactness holds for N ≲ 5·10⁷ pooled
    * samples per call — far beyond any sane two-sample test, but a
    * 100 TB pipeline must subsample or slice before asking for CvM,
    * and this contract says so rather than silently overflowing to
    * null.
    *
    * Scale shape: identical to [[ksTwoSample]] — one (value)-keyed
    * census, ~256 range buckets with partitioned running sums, a
    * bounded triangular offsets join, no global window. Output one
    * row: (n_a, n_b, n_values, t); t null when either side is empty. */
  def cramerVonMises(df: DataFrame, valueCol: String,
      isRight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val census = df
      .select(col(valueCol).cast("long").as("__v"),
        when(isRight, 1L).otherwise(0L).as("__r"))
      .groupBy(col("__v"))
      .agg(sum(lit(1L) - col("__r")).as("__ca"), sum(col("__r")).as("__cb"))
      .localCheckpoint(true)
    val bounds = census.agg(min(col("__v")).as("__lo"),
      max(col("__v")).as("__hi"), sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"), count(lit(1)).as("n_values"))
    val bucketed = census.crossJoin(broadcast(bounds))
      .withColumn("__w", greatest(lit(1L), expr("(__hi - __lo) div 256") + 1L))
      .withColumn("__b", expr("(__v - __lo) div __w"))
    val wOrd = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val run = bucketed
      .withColumn("__ra", sum(col("__ca")).over(wOrd))
      .withColumn("__rb", sum(col("__cb")).over(wOrd))
    val btot = bucketed.groupBy(col("__b"))
      .agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
    val offs = btot.as("a")
      .join(btot.select(col("__b").as("__b2"), col("__ta").as("__ta2"),
        col("__tb").as("__tb2")), col("__b2") < col("a.__b"), "left")
      .groupBy(col("a.__b").as("__b"))
      .agg(coalesce(sum(col("__ta2")), lit(0L)).as("__oa"),
        coalesce(sum(col("__tb2")), lit(0L)).as("__ob"))
    val gap = ((col("__oa") + col("__ra")).cast(dec) * col("__nb").cast(dec) -
      (col("__ob") + col("__rb")).cast(dec) * col("__na").cast(dec)).cast(dec)
    run.join(broadcast(offs), "__b")
      .select(col("__na"), col("__nb"), col("n_values"),
        ((col("__ca") + col("__cb")).cast(dec) * (gap * gap).cast(dec))
          .cast(dec).as("__term"))
      .groupBy(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"))
      .agg(sum(col("__term")).cast(dec).as("__num"))
      .select(col("n_a"), col("n_b"), col("n_values"),
        when(col("n_a") =!= 0L && col("n_b") =!= 0L,
          col("__num").cast("double") /
            ((col("n_a") + col("n_b")).cast(dec) *
              (col("n_a") + col("n_b")).cast(dec) *
              col("n_a").cast(dec) * col("n_b").cast(dec)).cast(dec)
              .cast("double")).as("t"))
  }

  /** Wasserstein-1 derived from a (bucket, count_a, count_b) census —
    * the consumer side of [[graft.streaming.Streams.ksCensusStream]]:
    * the SAME bounded streaming state that yields the KS point
    * statistic yields the W1 area, so one census monitors both "worst
    * quantile" and "total mass moved" live. Values here are bucket
    * LEFT EDGES: W1 is computed in bucket-index units then scaled by
    * `width` to value units — identical to [[wasserstein1]] run on
    * bucket-quantized values times width (parity spec-asserted).
    *
    * The census is ≤ buckets rows BY CONSTRUCTION (the stream's fixed
    * state bound), so the single unpartitioned window here walks a
    * bounded list, not data — the cell-bounded exemption to the
    * no-global-window rule. All terms integer; one terminal division. */
  def wassersteinFromCensus(census: DataFrame, bucketCol: String,
      caCol: String, cbCol: String, width: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(width > 0, s"width must be positive, got $width")
    val dec = "decimal(38,0)"
    // NOTE: cumulative columns must not be named __A/__B — Spark's
    // default case-INsensitive resolution would silently replace __b
    val c = Guards.boundedCensus(
      census.select(col(bucketCol).cast("long").as("__b"),
        col(caCol).cast("long").as("__ca"),
        col(cbCol).cast("long").as("__cb")),
      "__b", "Divergence (bucket census)")
    val w = Window.orderBy(col("__b"))
    val run = c
      .withColumn("__cuma", sum(col("__ca"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__cumb", sum(col("__cb"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__bn", lead(col("__b"), 1).over(w))
    val totals = c.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
      count(lit(1)).as("n_buckets"))
    run.crossJoin(broadcast(totals))
      .select(col("__na"), col("__nb"), col("n_buckets"),
        when(col("__bn").isNotNull,
          (abs(col("__cuma").cast(dec) * col("__nb").cast(dec) -
            col("__cumb").cast(dec) * col("__na").cast(dec)).cast(dec) *
            (col("__bn") - col("__b")).cast(dec)).cast(dec))
          .otherwise(lit(0L).cast(dec)).as("__term"))
      .groupBy(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_buckets"))
      .agg(sum(col("__term")).cast(dec).as("__num"))
      .select(col("n_a"), col("n_b"), col("n_buckets"),
        when(col("n_a") =!= 0L && col("n_b") =!= 0L,
          (col("__num") * lit(width).cast(dec)).cast(dec).cast("double") /
            (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double"))
          .as("w1"))
  }

  /** Mutual information between two categorical columns, in nats —
    * the dependence profiler: does the metadata column leak the label
    * (I > 0 says how hard), are two quasi-identifiers redundant, which
    * feature splits a mixture. I(A;B) = Σ_ab (c_ab/N)·ln(c_ab·N /
    * (c_a·c_b)), with the marginal entropies alongside so callers can
    * normalize (I <= min(H_A, H_B)).
    *
    * Scale shape: one (a, b)-keyed census — the only row-scale
    * aggregation — then everything runs on the cells (|A|·|B|-bounded):
    * marginals re-aggregate the census, and the MI/entropy sums fold
    * over the (a, b)-SORTED cell list in order, bit-reproducible
    * cross-engine ([[sourceDivergence]]'s contract). Integer counts
    * enter one fixed-shape double expression per term; no smoothing —
    * empty cells contribute 0 by the p·ln p convention, exactly as the
    * sum over observed cells computes. Output one row:
    * (n, n_cells, h_a, h_b, mi). */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cab"))
    val ma = cells.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val mb = cells.groupBy(col("b")).agg(sum(col("cab")).as("cb"))
    val n = cells.agg(sum(col("cab")).as("n"))
    def plogp(c: Column, tot: Column): Column =
      (c.cast("double") / tot.cast("double")) *
        log(c.cast("double") / tot.cast("double"))
    val joined = cells.join(ma, "a").join(mb, "b").crossJoin(broadcast(n))
      .select(col("a"), col("b"),
        ((col("cab").cast("double") / col("n").cast("double")) *
          log((col("cab").cast("double") * col("n").cast("double")) /
            (col("ca").cast("double") * col("cb").cast("double"))))
          .as("term"), col("n"))
    val mi = joined
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        sort_array(collect_list(struct(col("a"), col("b"), col("term"))))
          .as("terms"))
      .select(col("n"), col("n_cells"),
        aggregate(col("terms"), lit(0.0d), (acc, t) => acc + t.getField("term"))
          .as("mi"))
    val ha = ma.crossJoin(broadcast(n))
      .agg(sort_array(collect_list(struct(col("a"),
        negate(plogp(col("ca"), col("n"))).as("t")))).as("ts"))
      .select(aggregate(col("ts"), lit(0.0d), (acc, t) => acc + t.getField("t"))
        .as("h_a"))
    val hb = mb.crossJoin(broadcast(n))
      .agg(sort_array(collect_list(struct(col("b"),
        negate(plogp(col("cb"), col("n"))).as("t")))).as("ts"))
      .select(aggregate(col("ts"), lit(0.0d), (acc, t) => acc + t.getField("t"))
        .as("h_b"))
    mi.crossJoin(ha).crossJoin(hb)
      .select(col("n"), col("n_cells"), col("h_a"), col("h_b"), col("mi"))
  }

  /** Cramér's V — [[mutualInformation]]'s effect-size companion: the
    * chi-square association between two categorical columns normalized
    * to [0, 1] (0 = independent, 1 = one column determines the other),
    * comparable ACROSS tables and cardinalities where raw chi² and MI
    * are not. Uses the o²/e identity
    *   chi² = N·(Σ_cells o²/(rowtot·coltot) − 1),
    * where EMPTY cells contribute exactly 0 — so the fold runs over the
    * observed-cell census only, never the full r×c grid (which at
    * 100 TB cardinalities may be mostly holes).
    *
    * Exactness: o², rowtot·coltot are exact decimals; each cell term is
    * one correctly-rounded division; the only order-sensitive float sum
    * folds left-to-right in (a, b) cell order over the cell-bounded
    * sorted collect (the [[mutualInformation]] discipline). chi² is
    * clamped at 0 before the sqrt (independence lands a hair under the
    * identity's 1.0 in floats). V = sqrt(chi² / (N·(min(r,c) − 1))).
    *
    * Scale shape: one (a, b) census (map-side combined), two
    * marginal re-aggregations of the census, one broadcast scalar; no
    * row-scale shuffle after the census. Output one row: (n, r, c,
    * chi2, v); v null when either side has a single category. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cab"))
    val ma = cells.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val mb = cells.groupBy(col("b")).agg(sum(col("cab")).as("cb"))
    val n = cells.agg(sum(col("cab")).as("n"))
    val r = ma.agg(count(lit(1)).as("r"))
    val c = mb.agg(count(lit(1)).as("c"))
    val terms = cells.join(ma, "a").join(mb, "b")
      .select(col("a"), col("b"),
        ((col("cab").cast(dec) * col("cab").cast(dec)).cast(dec)
          .cast("double") /
          (col("ca").cast(dec) * col("cb").cast(dec)).cast(dec)
            .cast("double")).as("term"))
    val folded = terms
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("term"))))
        .as("ts"))
      .select(aggregate(col("ts"), lit(0.0d),
        (acc, t) => acc + t.getField("term")).as("sterm"))
    val minrc1 = (least(col("r"), col("c")) - 1).cast("double")
    val chi2 = col("n").cast("double") * (col("sterm") - lit(1.0))
    folded.crossJoin(broadcast(n)).crossJoin(broadcast(r))
      .crossJoin(broadcast(c))
      .select(col("n"), col("r"), col("c"), chi2.as("chi2"),
        when(least(col("r"), col("c")) > 1,
          sqrt(greatest(chi2, lit(0.0)) /
            (col("n").cast("double") * minrc1))).as("v"))
  }

  /** Theil's uncertainty coefficient (Theil 1970) — the ASYMMETRIC
    * association read [[cramersV]] and [[mutualInformation]] bracket:
    * U(b|a) = MI/H(b) is the fraction of b's entropy that knowing a
    * removes (and U(a|b) the reverse) — unlike V it tells you WHICH
    * column predicts which, the direction a feature-selection pass
    * actually needs. Derived from [[mutualInformation]]'s one-census
    * frame with two extra pinned divisions of the UNROUNDED nats —
    * the cross-engine story is exactly MI's (ln parity + in-order cell
    * folds). Output one row: (n, n_cells, h_a, h_b, mi, u_b_given_a,
    * u_a_given_b); a U is null when its conditioning entropy is 0 (a
    * constant column predicts nothing and has nothing to predict). */
  def theilsU(df: DataFrame, aCol: String, bCol: String): DataFrame =
    mutualInformation(df, aCol, bCol)
      .select(col("n"), col("n_cells"), col("h_a"), col("h_b"), col("mi"),
        when(col("h_b") > 0.0, col("mi") / col("h_b")).as("u_b_given_a"),
        when(col("h_a") > 0.0, col("mi") / col("h_a")).as("u_a_given_b"))

  /** Per-group total variation distance from the corpus token
    * distribution — the L1 member of the drift battery ([[ksTwoSample]]
    * is the sup-norm point, [[wasserstein1]] the transport area, PSI/KL
    * the log-weighted views): TV(g, corpus) = ½·Σ_t |p_g(t) − p_c(t)|,
    * the maximum probability a single event's mass can differ — the
    * bound used when arguing "source g's sampling error vs the corpus
    * is at most TV". Unlike KL it is finite for disjoint supports and
    * needs no smoothing choice.
    *
    * Exactness: with group census c_gt, group total n_g, corpus census
    * c_t, corpus total N, the numerator over the common denominator
    * n_g·N is Σ_t |c_gt·N − c_t·n_g|. Tokens ABSENT from group g
    * contribute c_t·n_g each; summing those directly would enumerate
    * the full vocab × groups grid, so the absent mass folds in closed
    * form: Σ_{t∉g} c_t·n_g = N·n_g − Σ_{t∈g} c_t·n_g, giving
    *   num = Σ_{t∈g} (|c_gt·N − c_t·n_g| − c_t·n_g) + N·n_g,
    * every term an exact decimal(38,0) integer — NO float fold; the
    * one terminal division num/(2·n_g·N) is the only float op (the
    * decimal→double casts on both sides are correctly rounded).
    *
    * Scale shape: one (group, token) census — the only row-scale
    * aggregation — a token-marginal re-aggregation of that census, one
    * token-co-partitioned join census⋈marginal (never row grain), then
    * a per-group sum. The vocab×groups grid is never materialized.
    * Output: (g, n_tok, vocab, tv) — tv ∈ [0, 1], 0 iff the group
    * matches the corpus exactly. */
  def totalVariation(df: DataFrame, groupCol: String,
      tokenCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cell = df.select(col(groupCol).as("g"), col(tokenCol).as("t"))
      .groupBy(col("g"), col("t")).agg(count(lit(1)).as("cgt"))
      .localCheckpoint(true)
    val gTot = cell.groupBy(col("g"))
      .agg(sum(col("cgt")).as("ng"), count(lit(1)).as("vocab"))
    val cTok = cell.groupBy(col("t")).agg(sum(col("cgt")).as("ct"))
    val n = cTok.agg(sum(col("ct")).as("__n"))
    val joined = cell.join(cTok, "t")
      .join(gTot.select(col("g"), col("ng")), "g")
      .crossJoin(broadcast(n))
      .select(col("g"),
        (abs((col("cgt").cast(dec) * col("__n").cast(dec)).cast(dec) -
          (col("ct").cast(dec) * col("ng").cast(dec)).cast(dec)).cast(dec) -
          (col("ct").cast(dec) * col("ng").cast(dec)).cast(dec)).cast(dec)
          .as("__term"))
    joined.groupBy(col("g")).agg(sum(col("__term")).cast(dec).as("__s"))
      .join(gTot, "g").crossJoin(broadcast(n))
      .select(col("g"), col("ng").as("n_tok"), col("vocab"),
        ((col("__s") + (col("__n").cast(dec) * col("ng").cast(dec)).cast(dec))
          .cast(dec).cast("double") /
          (lit(2L).cast(dec) * col("ng").cast(dec) * col("__n").cast(dec))
            .cast(dec).cast("double")).as("tv"))
  }

  /** Total variation derived from a (bucket, count_a, count_b) census —
    * the third statistic off [[graft.streaming.Streams.ksCensusStream]]'s
    * bounded state (KS = worst point, [[wassersteinFromCensus]] = area,
    * TV = half the L1 mass): TV = ½·Σ_b |c_a(b)·n_b − c_b(b)·n_a| /
    * (n_a·n_b). Needs no bucket ORDER at all — unlike KS/W1 it is a
    * pure per-bucket sum, so there is no window here, just one
    * bounded aggregate. All terms integer; one terminal division.
    * Output one row: (n_a, n_b, n_buckets, tv); null when a side is
    * empty. */
  def tvFromCensus(census: DataFrame, bucketCol: String,
      caCol: String, cbCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val c = census.select(col(bucketCol).cast("long").as("__b"),
      col(caCol).cast("long").as("__ca"), col(cbCol).cast("long").as("__cb"))
    val totals = c.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
      count(lit(1)).as("n_buckets"))
    c.crossJoin(broadcast(totals))
      .select(col("__na"), col("__nb"), col("n_buckets"),
        abs(col("__ca").cast(dec) * col("__nb").cast(dec) -
          col("__cb").cast(dec) * col("__na").cast(dec)).cast(dec)
          .as("__term"))
      .groupBy(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("n_buckets"))
      .agg(sum(col("__term")).cast(dec).as("__num"))
      .select(col("n_a"), col("n_b"), col("n_buckets"),
        when(col("n_a") =!= 0L && col("n_b") =!= 0L,
          col("__num").cast("double") /
            (lit(2L).cast(dec) * col("n_a").cast(dec) * col("n_b").cast(dec))
              .cast(dec).cast("double")).as("tv"))
  }

  /** Gaussian-moment KL divergence per group vs the pooled corpus —
    * the two-moment drift summary for dashboards that can't afford a
    * census: fit N(μ, σ²) to each group and to the corpus from EXACT
    * moment sums and read
    *   KL(g‖corpus) = ½·ln(σ_c²/σ_g²) + (σ_g² + (μ_g−μ_c)²)/(2σ_c²) − ½.
    * A deliberate approximation (document it as such): it sees
    * location/scale drift only — shape drift needs the census family
    * ([[ksTwoSample]]/[[energyDistance]]); its virtue is ONE moment
    * census and closed form at any scale.
    *
    * Exactness: per-group and corpus (n, Σy, Σy²) are exact decimals;
    * variances are single divisions (population σ², pinned); the ln is
    * one call on a pinned ratio (the established ln-parity contract).
    * Groups with zero variance emit null (loud). Output: (g, n, mean,
    * variance, kl). */
  def gaussianKl(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val y = col(valueCol).cast("long").cast(dec)
    val base = df.where(col(valueCol).isNotNull)
    val g = base.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(y).cast(dec).as("s1"),
        sum((y * y).cast(dec)).cast(dec).as("s2"))
    val tot = broadcast(base.agg(count(lit(1)).as("nc"),
      sum(y).cast(dec).as("c1"), sum((y * y).cast(dec)).cast(dec).as("c2")))
    def dd(c: Column): Column = c.cast("double")
    def mu(s: Column, n: Column): Column = dd(s) / dd(n)
    def va(n: Column, s1: Column, s2: Column): Column =
      (n.cast(dec) * s2 - s1 * s1).cast(dec).cast("double") /
        (n.cast(dec) * n.cast(dec)).cast(dec).cast("double")
    val vg = va(col("n"), col("s1"), col("s2"))
    val vc = va(col("nc"), col("c1"), col("c2"))
    val dmu = mu(col("s1"), col("n")) - mu(col("c1"), col("nc"))
    val kl = lit(0.5) * log(vc / vg) +
      (vg + dmu * dmu) / (lit(2.0) * vc) - lit(0.5)
    g.crossJoin(tot)
      .select(col("g"), col("n"), mu(col("s1"), col("n")).as("mean"),
        vg.as("variance"),
        when(vg > 0.0 && vc > 0.0, kl).as("kl"))
  }

  /** Two-sample energy distance (Székely & Rizzo 2004) — the drift
    * statistic with a METRIC interpretation the CDF family lacks:
    *   E² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| ≥ 0, = 0 iff same
    * distribution; its magnitude is in VALUE units (cents of
    * distributional displacement), which makes it the one to trend on
    * a dashboard. All three double-sum expectations collapse to O(V)
    * census math via the sorted-prefix identity
    *   Σ_x |x−y|·c(x) = y·(2F(y) − n) − (2S(y) − T)
    * with F/S the inclusive prefix count/sum at y — so the pair sums
    * are EXACT integers from two window passes over the merged value
    * census, never an O(n²) join.
    *
    * Exactness: pair sums in decimal(38,0); E² is three pinned
    * divisions; e = √max(E², 0). Scale shape: one value census, two
    * cumulative windows over distinct values (bucket upstream for
    * unbounded domains — the [[andersonDarling]] note). Output one
    * row: (n_a, n_b, n_values, e2, e). */
  def energyDistance(df: DataFrame, valueCol: String,
      isRight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val census = df
      .select(col(valueCol).cast("long").as("v"),
        when(isRight, 1L).otherwise(0L).as("__r"))
      .groupBy(col("v"))
      .agg(sum(lit(1L) - col("__r")).as("ca"), sum(col("__r")).as("cb"))
    val totals = broadcast(census.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb"),
      sum(col("v").cast(dec) * col("ca").cast(dec)).cast(dec).as("ta"),
      sum(col("v").cast(dec) * col("cb").cast(dec)).cast(dec).as("tb"),
      count(lit(1)).as("n_values")))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // a VALUE-keyed census over an integral column grows with the value
    // domain, not the rows — the canonical "bounded by argument" case,
    // so the bound is gated at runtime (bucket upstream if it trips)
    val run = Guards.boundedCensus(census, "v", "Divergence.energyDistance")
      .withColumn("fa", sum(col("ca")).over(w))
      .withColumn("fb", sum(col("cb")).over(w))
      .withColumn("sa", sum(col("v").cast(dec) * col("ca").cast(dec)).over(w)
        .cast(dec))
      .withColumn("sb", sum(col("v").cast(dec) * col("cb").cast(dec)).over(w)
        .cast(dec))
      .crossJoin(totals)
    def pairSum(weight: Column, f: Column, s: Column, n: Column,
        t: Column): Column =
      (weight.cast(dec) * (col("v").cast(dec) *
        (lit(2L).cast(dec) * f.cast(dec) - n.cast(dec)).cast(dec) -
        (lit(2L).cast(dec) * s - t).cast(dec)).cast(dec)).cast(dec)
    val sums = run
      .select(col("na"), col("nb"), col("n_values"),
        pairSum(col("cb"), col("fa"), col("sa"), col("na"), col("ta"))
          .as("__xy"),
        pairSum(col("ca"), col("fa"), col("sa"), col("na"), col("ta"))
          .as("__xx"),
        pairSum(col("cb"), col("fb"), col("sb"), col("nb"), col("tb"))
          .as("__yy"))
      .groupBy(col("na"), col("nb"), col("n_values"))
      .agg(sum(col("__xy")).cast(dec).as("sxy"),
        sum(col("__xx")).cast(dec).as("sxx"),
        sum(col("__yy")).cast(dec).as("syy"))
    def dd(c: Column): Column = c.cast("double")
    val e2 = lit(2.0) * dd(col("sxy")) /
        dd((col("na").cast(dec) * col("nb").cast(dec)).cast(dec)) -
      dd(col("sxx")) / dd((col("na").cast(dec) * col("na").cast(dec)).cast(dec)) -
      dd(col("syy")) / dd((col("nb").cast(dec) * col("nb").cast(dec)).cast(dec))
    sums.select(col("na").as("n_a"), col("nb").as("n_b"), col("n_values"),
      when(col("na") > 0L && col("nb") > 0L, e2).as("e2"),
      when(col("na") > 0L && col("nb") > 0L,
        sqrt(greatest(e2, lit(0.0)))).as("e"))
  }

  /** Anderson–Darling two-sample statistic — the TAIL-weighted member
    * of the drift family ([[ksTwoSample]] = worst point,
    * [[cramerVonMises]] = mean square, W1 = area, TV = L1): the
    * 1/(B(N−B)) weight diverges at the distribution edges, so a feed
    * whose extremes drifted while the bulk held (the failure mode that
    * poisons outlier-sensitive downstream stats) alarms here first.
    * Tie-adjusted discrete form (Pettitt 1976; reduces to the classic
    * rank statistic on untied data; pinned convention, oracle-replayed):
    *   A² = (1/(n_a·n_b)) Σ_{distinct v, B<N} ℓ·(N·M − n_a·B)² / (B(N−B))
    * with ℓ the pooled multiplicity at v, M the cumulative sample-A
    * count, B the cumulative pooled count.
    *
    * Exactness: every per-value numerator/denominator is an exact
    * decimal of exact integers; each term is ONE double division and
    * the only order-sensitive float sum folds over the value-sorted
    * census (the [[mutualInformation]] discipline). Scale shape: one
    * value census (map-side combined), one broadcast total, one
    * census-bounded sorted fold — distinct VALUES, never rows; at
    * unbounded-cardinality domains bucket upstream (the
    * [[wassersteinFromCensus]] convention). Output one row: (n_a, n_b,
    * n_values, a2). */
  def andersonDarling(df: DataFrame, valueCol: String,
      isRight: Column): DataFrame = {
    val census = df
      .select(col(valueCol).cast("long").as("v"),
        when(isRight, 1L).otherwise(0L).as("__r"))
      .groupBy(col("v"))
      .agg(sum(lit(1L) - col("__r")).as("ca"), sum(col("__r")).as("cb"))
    val totals = census.agg(sum(col("ca")).as("__na"),
      sum(col("cb")).as("__nb"), count(lit(1)).as("n_values"))
    val dec38 = "DECIMAL(38,0)"
    val bN = "(acc.b + e.ca + e.cb)"
    val gap = s"(CAST(__N AS $dec38) * (acc.m + e.ca)" +
      s" - CAST(__na AS $dec38) * $bN)"
    val term = s"CAST(CAST(e.ca + e.cb AS $dec38) * $gap * $gap AS DOUBLE)" +
      s" / CAST(CAST($bN AS $dec38)" +
      s" * (CAST(__N AS $dec38) - CAST($bN AS $dec38)) AS DOUBLE)"
    val fold =
      s"""aggregate(__cells,
         |  struct(CAST(0.0 AS DOUBLE) AS s, CAST(0 AS BIGINT) AS m,
         |         CAST(0 AS BIGINT) AS b),
         |  (acc, e) -> struct(
         |    acc.s + IF($bN < __N, $term, CAST(0.0 AS DOUBLE)) AS s,
         |    acc.m + e.ca AS m,
         |    $bN AS b))""".stripMargin
    census
      .agg(sort_array(collect_list(struct(col("v"), col("ca"), col("cb"))))
        .as("__cells"))
      .crossJoin(broadcast(totals))
      .withColumn("__N", col("__na") + col("__nb"))
      .withColumn("__f", expr(fold))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"),
        when(col("__na") > 0L && col("__nb") > 0L,
          col("__f.s") / (col("__na").cast("decimal(38,0)") *
            col("__nb").cast("decimal(38,0)")).cast("decimal(38,0)")
            .cast("double")).as("a2"))
  }

  /** Jarque–Bera normality census per group — are the values even
    * PLAUSIBLY Gaussian? The cheapest gate before any method that
    * assumes normality (z-intervals, control limits, Welch small-n):
    *   g₁ = m₃/m₂^{3/2},  κ = m₄/m₂²,  JB = n/6·(g₁² + (κ−3)²/4),
    * and because JB is asymptotically χ²(df=2), the p-value has the
    * CLOSED form p = exp(−JB/2) — no incomplete-gamma machinery.
    *
    * Exactness: per-group raw power sums S₁..S₄ of the integer-cast
    * values are exact decimal(38,0); the scaled central sums
    *   A₂ = n·S₂ − S₁²                      (= n·Σ(y−ȳ)²)
    *   A₃ = n²·S₃ − 3n·S₁S₂ + 2S₁³          (= n²·Σ(y−ȳ)³)
    *   A₄ = n³·S₄ − 4n²·S₁S₃ + 6n·S₁²S₂ − 3S₁⁴ (= n³·Σ(y−ȳ)⁴)
    * are exact decimals with the n-powers chosen so the statistics
    * collapse to pinned-shape ratios: g₁ = A₃/(A₂·√A₂), κ = A₄/A₂²
    * (√ is IEEE-correctly-rounded in both engines; pow(x,1.5) is NOT,
    * so it never appears). Headroom precondition (the acf contract):
    * n³·Σy⁴ must fit 38 digits — at cent scale that holds to ~10⁶ rows
    * per group with |y| ≤ 10⁵; downscale units beyond that.
    *
    * Scale shape: ONE group-keyed census aggregation, map-side
    * combined; nothing else shuffles. Output: (g, n, skewness,
    * kurtosis, jb, p_value); shape stats null on constant groups
    * (A₂ = 0) or n < 2. */
  def jarqueBera(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val y = col(valueCol).cast("long").cast(dec)
    val g = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(y).cast(dec).as("s1"),
        sum((y * y).cast(dec)).cast(dec).as("s2"),
        sum((y * y * y).cast(dec)).cast(dec).as("s3"),
        sum((y * y * y * y).cast(dec)).cast(dec).as("s4"))
    val nD = col("n").cast(dec)
    val a2 = (nD * col("s2") - col("s1") * col("s1")).cast(dec)
    val a3 = (nD * nD * col("s3") - lit(3).cast(dec) * nD * col("s1") * col("s2") +
      lit(2).cast(dec) * col("s1") * col("s1") * col("s1")).cast(dec)
    val a4 = (nD * nD * nD * col("s4") -
      lit(4).cast(dec) * nD * nD * col("s1") * col("s3") +
      lit(6).cast(dec) * nD * col("s1") * col("s1") * col("s2") -
      lit(3).cast(dec) * col("s1") * col("s1") * col("s1") * col("s1")).cast(dec)
    def dd(c: Column): Column = c.cast("double")
    val withA = g.withColumn("__a2", a2).withColumn("__a3", a3)
      .withColumn("__a4", a4)
    val skew = dd(col("__a3")) / (dd(col("__a2")) * sqrt(dd(col("__a2"))))
    val kurt = dd(col("__a4")) / (dd(col("__a2")) * dd(col("__a2")))
    val ok = col("n") > 1L && col("__a2") > lit(0).cast(dec)
    val jb = dd(col("n")) / lit(6.0) *
      (col("__skew") * col("__skew") +
        (col("__kurt") - lit(3.0)) * (col("__kurt") - lit(3.0)) / lit(4.0))
    withA
      .withColumn("__skew", when(ok, skew))
      .withColumn("__kurt", when(ok, kurt))
      .withColumn("__jb", jb)
      .select(col("g"), col("n"), col("__skew").as("skewness"),
        col("__kurt").as("kurtosis"), col("__jb").as("jb"),
        exp(-col("__jb") / lit(2.0)).as("p_value"))
  }

  /** Chi-square test of independence with an EXACT p-value for even
    * degrees of freedom — the significance readout [[cramersV]] (an
    * effect size) deliberately does not carry. Same observed-cell
    * census and o²/e fold as Cramér's V; then for df = (r−1)(c−1)
    * EVEN (df = 2m) the χ² survival function is the finite Poisson
    * sum — no incomplete gamma:
    *   P(χ²_{2m} > x) = e^{−x/2} · Σ_{k=0}^{m−1} (x/2)^k / k!
    * The sum is evaluated as a seeded fold with term recurrence
    * t_k = t_{k−1}·(x/2)/k — repeated IEEE multiply/divide, replayable
    * cross-engine where pow() is not. Odd df yields a null p (and a
    * loud df column so the caller sees why); most designed contingency
    * reads (day-of-week × category) have even df.
    *
    * Scale shape: the [[cramersV]] shape — one (a, b) census, marginal
    * re-aggregations, broadcast scalars; the p-fold runs on ONE row.
    * Output one row: (n, r, c, df, chi2, p_value). */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = cramersV(df, aCol, bCol)
      .withColumn("df", (col("r") - 1L) * (col("c") - 1L))
    val half = greatest(col("chi2"), lit(0.0)) / lit(2.0)
    val m = (col("df") / lit(2L)).cast("long")
    // Σ_{k=0}^{m−1} t_k with t_0 = 1 seed; the per-step factors h/k are
    // precomputed into the element list so the fold lambda is purely
    // element-local (the DuckDB twin's list_reduce replays it with a
    // prepended seed element), and fields are ordered sum-first so the
    // twin never reads a recomputed field
    val series = when(col("df") % 2L === 0L && col("df") > 0L,
      when(m > 1L,
        expr("""aggregate(
          |transform(sequence(1L, __m - 1L), k -> __h / CAST(k AS DOUBLE)),
          |named_struct('s', CAST(1.0 AS DOUBLE), 't', CAST(1.0 AS DOUBLE)),
          |(acc, hk) -> named_struct(
          |  's', acc.s + acc.t * hk,
          |  't', acc.t * hk),
          |acc -> acc.s)""".stripMargin))
        .otherwise(lit(1.0)))
    base.withColumn("__h", half).withColumn("__m", m)
      .withColumn("__series", series)
      .select(col("n"), col("r"), col("c"), col("df"), col("chi2"),
        (exp(-col("__h")) * col("__series")).as("p_value"))
  }

  /** G-test of independence (log-likelihood ratio) — the
    * information-theoretic twin of [[chiSquareIndependence]]:
    *   G = 2·Σ_cells o·ln(o / e) = 2·N·MI(nats),
    * asymptotically χ²((r−1)(c−1)) like Pearson's χ² but additive
    * across partitions of a table (a decomposition Pearson lacks) and
    * better behaved when o/e is far from 1. EMPTY cells contribute
    * exactly 0 (lim x·ln x = 0), so the fold runs over the
    * observed-cell census only — never the full r×c grid.
    *
    * Exactness: cell/marginal counts are exact integers; each cell
    * term is o·ln(o·N/(rowtot·coltot)) with one ln (the
    * [[mutualInformation]] ln-parity story); the one order-sensitive
    * float sum folds in (a, b) cell order over the bounded sorted
    * collect. The even-df exact survival p reuses
    * [[chiSquareIndependence]]'s seeded Poisson-sum fold; odd df
    * yields a null p with a loud df column.
    *
    * Scale shape: one (a, b) census, marginal re-aggregations,
    * broadcast scalars; the p-fold runs on ONE row. Output one row:
    * (n, r, c, df, g, p_value). */
  def gTest(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cab"))
    val ma = cells.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val mb = cells.groupBy(col("b")).agg(sum(col("cab")).as("cb"))
    val n = cells.agg(sum(col("cab")).as("n"))
    val r = ma.agg(count(lit(1)).as("r"))
    val c = mb.agg(count(lit(1)).as("c"))
    val terms = cells.join(ma, "a").join(mb, "b").crossJoin(broadcast(n))
      .select(col("a"), col("b"),
        (col("cab").cast("double") *
          log((col("cab").cast("double") * col("n").cast("double")) /
            (col("ca").cast("double") * col("cb").cast("double"))))
          .as("term"))
    val folded = terms
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("term"))))
        .as("ts"))
      .select(aggregate(col("ts"), lit(0.0d),
        (acc, t) => acc + t.getField("term")).as("sterm"))
    val base = folded.crossJoin(broadcast(n)).crossJoin(broadcast(r))
      .crossJoin(broadcast(c))
      .select(col("n"), col("r"), col("c"),
        ((col("r") - 1L) * (col("c") - 1L)).as("df"),
        (lit(2.0) * col("sterm")).as("g"))
    val half = greatest(col("g"), lit(0.0)) / lit(2.0)
    val m = expr("df div 2")
    val series = when(col("df") % 2L === 0L && col("df") > 0L,
      when(col("__m") > 1L,
        expr("""aggregate(
          |transform(sequence(1L, __m - 1L), k -> __h / CAST(k AS DOUBLE)),
          |named_struct('s', CAST(1.0 AS DOUBLE), 't', CAST(1.0 AS DOUBLE)),
          |(acc, hk) -> named_struct(
          |  's', acc.s + acc.t * hk,
          |  't', acc.t * hk),
          |acc -> acc.s)""".stripMargin))
        .otherwise(lit(1.0)))
    base.withColumn("__h", half).withColumn("__m", m)
      .withColumn("__series", series)
      .select(col("n"), col("r"), col("c"), col("df"), col("g"),
        (exp(-col("__h")) * col("__series")).as("p_value"))
  }

  /** Hellinger distance + Bhattacharyya coefficient between two
    * categorical distributions — the bounded-metric member of the
    * divergence family: KL explodes on disjoint support and isn't a
    * metric, total variation ignores mass geometry; Hellinger
    *   H = √(1 − BC),  BC = Σ_i √(p_i·q_i)
    * is a true metric in [0, 1], and BC is the overlap readout
    * (kernel/affinity) by itself. The drift-monitor distance to quote
    * when two corpora must be COMPARABLE across category sets.
    *
    * Exactness: both censuses are exact counts; p_i/q_i are single
    * divisions; each cell term is one √ of one product; the one
    * order-sensitive fold runs in CATEGORY ORDER over the
    * union-of-observed-cells array (a category missing on one side
    * contributes exactly 0 — full-outer cells kept so both engines
    * fold the same set). H clamps 1 − BC at 0 before the √
    * (independence can land an ulp under).
    *
    * Scale shape: one (category, side) census, one bounded fold.
    * Output one row: (n_a, n_b, n_cells, bc, hellinger). */
  def hellinger(df: DataFrame, catCol: String, isB: Column): DataFrame =
    hellingerFromCensus(hellingerCensus(df, catCol, isB))

  /** The (category, side) census [[hellingerFromCensus]] reads — ONE
    * aggregation, so it runs unchanged as a complete-mode streaming
    * query (the grubbsCensus split pattern). Output: (c, ca, cb). */
  def hellingerCensus(df: DataFrame, catCol: String, isB: Column): DataFrame =
    df.select(col(catCol).as("c"),
        when(isB, 1L).otherwise(0L).as("b"))
      .groupBy(col("c"))
      .agg(sum(lit(1L) - col("b")).as("ca"), sum(col("b")).as("cb"))

  /** BC + Hellinger from a [[hellingerCensus]] table — the bounded
    * category-order fold, shared by the batch operator and the
    * streaming twin's downstream read. */
  def hellingerFromCensus(census: DataFrame): DataFrame = {
    val tot = broadcast(census.agg(sum(col("ca")).as("n_a"),
      sum(col("cb")).as("n_b"), count(lit(1)).as("n_cells")))
    def dd(c: Column): Column = c.cast("double")
    val term = sqrt((dd(col("ca")) / dd(col("n_a"))) *
      (dd(col("cb")) / dd(col("n_b"))))
    val folded = census.crossJoin(tot)
      .select(col("n_a"), col("n_b"), col("n_cells"), col("c"),
        term.as("t"))
      .groupBy(col("n_a"), col("n_b"), col("n_cells"))
      .agg(sort_array(collect_list(struct(col("c"), col("t"))))
        .as("cells"))
    val bc = aggregate(col("cells"), lit(0.0d),
      (a, x) => a + x.getField("t"))
    val ok = col("n_a") > 0L && col("n_b") > 0L
    folded.withColumn("__bc", bc)
      .select(col("n_a"), col("n_b"), col("n_cells"),
        when(ok, col("__bc")).as("bc"),
        when(ok, sqrt(greatest(lit(1.0) - col("__bc"), lit(0.0))))
          .as("hellinger"))
  }

  /** Distance correlation (Székely–Rizzo 2007) — the dependence
    * measure that is ZERO only under true independence: Pearson sees
    * lines, Spearman sees monotone curves, dCor sees everything
    * (U-shapes, circles). Over paired observations (x, y):
    *   A_jk = a_jk − ā_j· − ā_·k + ā_··  (double-centered |x_j − x_k|),
    *   dCov² = n⁻² Σ A_jk B_jk,  dCor² = dCov² / √(dVarₓ·dVar_y).
    *
    * EXACT by n⁴-scaling: every centered factor n²a_jk − n·Rx_j −
    * n·Rx_k + Tx is an exact integer (row sums Rx and the total Tx
    * are integer sums), so Σ(A·B)·n⁶ is ONE exact decimal sum over
    * the pair grid and dCov²/dVar are single divisions — no float
    * folds over pairs at all, which is what makes the all-pairs sum
    * partition-invariant.
    *
    * Scale contract: dCor is quadratic in the CENSUS (distinct (x, y)
    * cells with multiplicity); the cell census is gated loudly at
    * `maxCells` ([[Guards.boundedCensus]]) and the pair grid is built
    * by broadcast — bounded-census² work, never row-scale². Callers
    * aggregate to period grain first (the [[graft.operators.Autocorr]]
    * input contract). The observation count is ALSO gated (`maxN`):
    * the n⁴-scaled integers grow as n⁴·Δ², and past ~10⁴ observations
    * they would silently overflow decimal(38) into nulls — the gate
    * turns that cliff into a loud error. Output one row: (n, n_cells,
    * dcov2, dvar_x, dvar_y, dcor); dcor null when either marginal is
    * constant. */
  def distanceCorrelation(df: DataFrame, xCol: String, yCol: String,
      maxCells: Long = 4000L, maxN: Long = 10000L): DataFrame = {
    val dec = "decimal(38,0)"
    val cells0 = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
    val cells = Guards.boundedCensus(cells0, "x", "distanceCorrelation",
      maxCells)
    val right = broadcast(cells.select(col("x").as("xq"),
      col("y").as("yq"), col("c").as("cq")))
    def D(c: Column): Column = c.cast(dec)
    // per-cell row sums over ALL observations (diagonal included at 0)
    val rows = cells.join(right,
        lit(true), "inner")
      .groupBy(col("x"), col("y"), col("c"))
      .agg(sum((D(col("cq")) * D(abs(col("x") - col("xq")))).cast(dec))
        .cast(dec).as("rx"),
        sum((D(col("cq")) * D(abs(col("y") - col("yq")))).cast(dec))
          .cast(dec).as("ry"))
    val tot = rows.agg(sum(col("c")).as("n"),
      count(lit(1)).as("n_cells"),
      sum((D(col("c")) * col("rx")).cast(dec)).cast(dec).as("tx"),
      sum((D(col("c")) * col("ry")).cast(dec)).cast(dec).as("ty"))
      .withColumn("n", when(col("n") <= lit(maxN), col("n"))
        .otherwise(raise_error(concat(
          lit("distanceCorrelation: n = "), col("n").cast("string"),
          lit(s" exceeds the exactness cap $maxN — the n^4-scaled " +
            "integers would overflow decimal(38); aggregate to a " +
            "coarser grain first"))).cast("long")))
    val left2 = rows.select(col("x").as("xp"), col("y").as("yp"),
      col("c").as("cp"), col("rx").as("rxp"), col("ry").as("ryp"))
    val right2 = broadcast(rows.select(col("x").as("xq"),
      col("y").as("yq"), col("c").as("cq"), col("rx").as("rxq"),
      col("ry").as("ryq")))
    val paired = left2.join(right2, lit(true), "inner")
      .crossJoin(broadcast(tot))
    val nD = D(col("n"))
    def fa(dcol: Column, rp: Column, rq: Column, t: Column): Column =
      (nD * nD * D(dcol) - nD * rp - nD * rq + t).cast(dec)
    val ax = fa(abs(col("xp") - col("xq")), col("rxp"), col("rxq"),
      col("tx"))
    val by = fa(abs(col("yp") - col("yq")), col("ryp"), col("ryq"),
      col("ty"))
    val sums = paired.groupBy(col("n"), col("n_cells")).agg(
      sum((D(col("cp")) * D(col("cq")) * (ax * by).cast(dec)).cast(dec))
        .cast(dec).as("sab"),
      sum((D(col("cp")) * D(col("cq")) * (ax * ax).cast(dec)).cast(dec))
        .cast(dec).as("saa"),
      sum((D(col("cp")) * D(col("cq")) * (by * by).cast(dec)).cast(dec))
        .cast(dec).as("sbb"))
    def dd(c: Column): Column = c.cast("double")
    val n6 = {
      val d = dd(col("n"))
      d * d * d * d * d * d
    }
    val dcov2 = dd(col("sab")) / n6
    val dvx = dd(col("saa")) / n6
    val dvy = dd(col("sbb")) / n6
    sums.select(col("n"), col("n_cells"), dcov2.as("dcov2"),
      dvx.as("dvar_x"), dvy.as("dvar_y"),
      when(dvx > 0.0 && dvy > 0.0,
        sqrt(dcov2 / sqrt(dvx * dvy))).as("dcor"))
  }

  /** Fisher's exact test on a 2×2 — the small-table companion
    * [[chiSquareIndependence]] and [[gTest]] defer to when expected
    * cells are tiny and the χ² asymptotics lie. The hypergeometric
    * support probabilities are built WITHOUT factorials via the
    * ratio recurrence
    *   p(a+1)/p(a) = (r₁−a)(c₁−a) / ((a+1)(r₂−c₁+a+1)),
    * cumulated multiplicatively FROM THE MODE (the closed-form
    * integer ⌊(r₁+1)(c₁+1)/(n+2)⌋ clamped into the support) outward
    * in both directions and normalized by the support total — no
    * lgamma (whose last-ulp behavior differs across engines), only
    * +,·,/ in a pinned order. The mode anchor is load-bearing, not
    * style: unimodality keeps every unnormalized mass ≤ 1, so a large
    * balanced table (support ~10³ already puts p(mode)/p(amin) past
    * 2^1024) can never overflow the fold to Inf/NaN the way an
    * amin-anchored prefix product does; far tails underflow to 0.0,
    * their correct double-precision contribution.
    * Two-sided p sums every table whose probability is ≤ the observed
    * one times (1 + 1e-7) — R fisher.test's tie tolerance.
    *
    * Fisher's exact is a SMALL-TABLE statistic by definition: the
    * support size (≤ min(r₁, c₁) + 1) is gated loudly at
    * `maxSupport` because each support row folds over its prefix —
    * O(S²) total work. The DEFAULT cap stays at the original 100000
    * (the public-API stability contract: a default-arg call that
    * computed yesterday must not throw today — the r11 advisor's
    * finding on the brief 1000 tightening); the RECOMMENDED cap is
    * ~1000 (≤ ~5·10⁵ fold steps — the hundreds-scale regime where the
    * exact test actually beats the χ² asymptotics). Past that, pass a
    * tight cap or use [[chiSquareIndependence]]/[[gTest]], which are
    * correct at row scale anyway; callers who ride the default at
    * S ~ 10⁵ buy ~10¹⁰ fold steps knowingly.
    *
    * Exactness: cells/margins exact; every u(a) is a fixed-order
    * product of single-division ratios; the three cross-support sums
    * fold in support order. Output one row: (n, n11, n10, n01, n00,
    * p_two, p_left, p_right). */
  def fisherExact(df: DataFrame, rowFlag: Column, colFlag: Column,
      maxSupport: Int = 100000): DataFrame = {
    require(maxSupport > 0, s"maxSupport must be positive: $maxSupport")
    val base = df.select(
      when(rowFlag, 1L).otherwise(0L).as("a"),
      when(colFlag, 1L).otherwise(0L).as("b"))
    val cells = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("a") === 1L && col("b") === 1L, 1L).otherwise(0L))
        .as("n11"),
      sum(when(col("a") === 1L && col("b") === 0L, 1L).otherwise(0L))
        .as("n10"),
      sum(when(col("a") === 0L && col("b") === 1L, 1L).otherwise(0L))
        .as("n01"),
      sum(when(col("a") === 0L && col("b") === 0L, 1L).otherwise(0L))
        .as("n00"))
      .withColumn("r1", col("n11") + col("n10"))
      .withColumn("r2", col("n01") + col("n00"))
      .withColumn("c1", col("n11") + col("n01"))
      .withColumn("amin", greatest(lit(0L), col("c1") - col("r2")))
      .withColumn("amax", least(col("r1"), col("c1")))
    val sup = col("amax") - col("amin") + 1L
    val gated = cells.withColumn("amin",
      when(sup <= lit(maxSupport.toLong), col("amin"))
        .otherwise(raise_error(concat(
          lit("fisherExact: support size "), sup.cast("string"),
          lit(s" exceeds the cap $maxSupport — a table this large " +
            "belongs to chiSquareIndependence/gTest, not an exact " +
            "test"))).cast("long")))
    // unnormalized hypergeometric mass via the MODE-anchored prefix
    // product: u(mode) = 1, upward cells multiply the forward ratio
    // over [mode, av), downward cells the inverse ratio over [av, mode)
    // — every factor ≤ 1 by unimodality, so no overflow at any support
    val rows = gated
      .withColumn("am", least(greatest(
        expr("(r1 + 1L) * (c1 + 1L) div (n + 2L)"),
        col("amin")), col("amax")))
      .withColumn("av", explode(sequence(col("amin"), col("amax"))))
    // ratio denominators never hit zero inside the support: j < amax
    // ≤ min(r1,c1) keeps (r1−j)(c1−j) ≥ 1, and j ≥ amin ≥ c1−r2 keeps
    // (r2−c1+j+1) ≥ 1
    val u = when(col("av") === col("am"), lit(1.0))
      .when(col("av") > col("am"),
        aggregate(sequence(col("am"), col("av") - 1L),
          lit(1.0d), (acc, j) => acc *
            (((col("r1") - j) * (col("c1") - j)).cast("double") /
              ((j + lit(1L)) * (col("r2") - col("c1") + j + lit(1L)))
                .cast("double"))))
      .otherwise(
        aggregate(sequence(col("av"), col("am") - 1L),
          lit(1.0d), (acc, j) => acc *
            (((j + lit(1L)) * (col("r2") - col("c1") + j + lit(1L)))
              .cast("double") /
              ((col("r1") - j) * (col("c1") - j)).cast("double"))))
    val scored = rows.withColumn("u", u)
    val per = scored.groupBy(col("n"), col("n11"), col("n10"),
        col("n01"), col("n00"))
      .agg(sort_array(collect_list(struct(col("av"), col("u"))))
        .as("cells"))
    val tot = aggregate(col("cells"), lit(0.0d),
      (a, x) => a + x.getField("u"))
    val uObs = element_at(
      filter(col("cells"), x => x.getField("av") === col("n11")), 1)
      .getField("u")
    def condSum(cond: Column => Column): Column =
      aggregate(col("cells"), lit(0.0d),
        (a, x) => a + when(cond(x), x.getField("u")).otherwise(lit(0.0)))
    per.withColumn("__tot", tot).withColumn("__uobs", uObs)
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        (condSum(x => x.getField("u") <=
          col("__uobs") * lit(1.0 + 1e-7)) / col("__tot")).as("p_two"),
        (condSum(x => x.getField("av") <= col("n11")) / col("__tot"))
          .as("p_left"),
        (condSum(x => x.getField("av") >= col("n11")) / col("__tot"))
          .as("p_right"))
  }
}
