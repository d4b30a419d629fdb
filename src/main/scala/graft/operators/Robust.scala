package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection via MAD (median absolute
  * deviation) — the data-quality gate that survives the outliers it
  * hunts (a mean/stddev fence moves toward the junk it should flag;
  * the median fence does not). Two exact lower-median passes: the
  * group median, then the median of |x - median|; a row is an outlier
  * when |x - median| > k * 1.4826 * MAD (1.4826 scales MAD to sigma
  * under normality).
  *
  * Determinism: lower medians (first value whose doubled cumulative
  * count reaches the group total — [[WeightedStats]]'s crossing rule at
  * weight 1) are actual data values picked by integer arithmetic, no
  * interpolation, so there is no (a+b)/2-vs-a+(b-a)/2 IEEE seam between
  * engines; |x - med| is one exact subtraction, and the fence is a
  * fixed literal shape. Everything replays bit-for-bit in SQL.
  *
  * Scale: two per-group sorts of the narrow (group, value) projection —
  * the exact-path cost (q10 family, parallel across groups). At 100 TB
  * the GK sketch ([[Sketches.approxQuantiles]]) stands in for both
  * medians at the same fence formula. */
object Robust {

  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      tieCols: Seq[String], k: Double = 3.0): DataFrame = {
    val narrow = df.select((Seq(groupCol, valueCol) ++ tieCols).distinct.map(col): _*)
    def lowerMedian(in: DataFrame, vCol: String, out: String): DataFrame = {
      val order: Seq[Column] = col(vCol) +: tieCols.map(col)
      val wOrd = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      val wAll = Window.partitionBy(col(groupCol))
      in.withColumn("cum", sum(lit(1L)).over(wOrd))
        .withColumn("tot", sum(lit(1L)).over(wAll))
        .where(col("cum") * 2 >= col("tot"))
        .groupBy(col(groupCol))
        .agg(min(col(vCol)).as(out))
    }
    val med = lowerMedian(narrow, valueCol, "median")
    val withDev = narrow.join(med, groupCol)
      .withColumn("dev", abs(col(valueCol).cast("double") - col("median")))
    val mad = lowerMedian(withDev, "dev", "mad")
    withDev.join(mad, groupCol)
      .withColumn("fence", lit(k) * lit(1.4826) * col("mad"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        min(col("median")).as("median"),
        min(col("mad")).as("mad"),
        sum(when(col("dev") > col("fence"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Winsorized per-group census — the robust-scaling cousin of
    * [[madOutliers]]: clip an integral column to the group's exact
    * [pLo, pHi] discrete-quantile bounds and report the clipped moments.
    * The outlier treatment length-normalization pipelines apply before
    * averaging (a mean doc length is meaningless under a power-law tail;
    * the 5/95-winsorized mean is stable).
    *
    * Everything derives from ONE corpus aggregation — the (group,
    * DISTINCT value) census: quantile ranks come from a window over
    * distinct VALUES (a billion rows with 50k distinct lengths windows
    * 50k rows per group, never the corpus — the q191 discretized-score
    * move), and the clipped sums re-weight census rows (clamp(v)·c), so
    * the corpus is scanned once and never joined back.
    *
    * The rank rule is quantile_disc's ceil(p·n)-th smallest with the
    * threshold computed in INTEGER arithmetic — (n·pNum + pDen−1) div
    * pDen — because `ceil(0.05 · n)` in doubles rounds differently than
    * an engine computing it in decimal exactly when p·n lands on an
    * integer; the rational form has no such seam. Clipped sums stay in
    * BIGINT (v·c fits comfortably for char-scale values); the single
    * division producing the mean is the only double. */
  def winsorizedCensus(df: DataFrame, groupCol: String, valueCol: String,
      pLoNum: Int, pHiNum: Int, pDen: Int = 100): DataFrame = {
    require(0 <= pLoNum && pLoNum <= pHiNum && pHiNum <= pDen,
      s"need 0 <= $pLoNum <= $pHiNum <= $pDen")
    val g = col(groupCol)
    val census = df.groupBy(g, col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(g).orderBy(col("v"))
    val wAll = Window.partitionBy(g)
    val ranked = census
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("tot", sum(col("c")).over(wAll))
    val bounds = ranked.groupBy(g)
      .agg(
        min(when(col("cum") >= expr(s"(tot * $pLoNum + ${pDen - 1}) div $pDen"),
          col("v"))).as("p_lo"),
        min(when(col("cum") >= expr(s"(tot * $pHiNum + ${pDen - 1}) div $pDen"),
          col("v"))).as("p_hi"))
    val cv = least(greatest(col("v"), col("p_lo")), col("p_hi"))
    ranked.join(broadcast(bounds), groupCol)
      .groupBy(g)
      .agg(sum(col("c")).as("n_rows"),
        min(col("p_lo")).as("p_lo"),
        min(col("p_hi")).as("p_hi"),
        sum(when(col("v") < col("p_lo"), col("c")).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("v") > col("p_hi"), col("c")).otherwise(0L)).as("n_clip_hi"),
        sum(cv * col("c")).as("clip_sum"))
      .withColumn("clip_mean",
        col("clip_sum").cast("double") / col("n_rows").cast("double"))
  }

  /** Brown–Forsythe variance-homogeneity test (Brown & Forsythe 1974)
    * per scope: do the `groupCol` samples have the same SPREAD? The
    * robust Levene variant — one-way ANOVA F on the absolute deviations
    * from each group's MEDIAN, so a heavy tail doesn't masquerade as
    * unequal variance. The A/B-infrastructure guard that belongs next
    * to the mean test (q180 Welch) and the distribution tests (q283 U,
    * q290 H): equal means with exploding spread is a real regression.
    *
    * Exactness: group medians use the doubled order-statistic rule
    * (med2 = x_⌈n/2⌉ + x_⌊n/2⌋₊₁, an INTEGER — no (a+b)/2 float seam),
    * so z = |2x − med2| is an exact integer and every moment (n_i, S_i
    * = Σz, Q_i = Σz², and their scope totals) is an exact decimal.
    * With F = [(N−k)/(k−1)] · [Σ S_i²/n_i − S²/N] / [ΣQ − Σ S_i²/n_i],
    * the ONE order-sensitive float sum (Σ S_i²/n_i) folds left-to-right
    * in group order over a k-bounded sorted collect (the q290
    * discipline); every other float op is correctly rounded from exact
    * integers in a pinned shape, so F replays bit-identically.
    *
    * Scale shape: one (scope, group, value) census, one cumulative
    * window over the DISTINCT-value census for medians, one
    * co-partitioned join back, k-bounded folds. No row-scale shuffle
    * after the census. Output: (scope, k, n, f); f null when k < 2 or
    * the within-groups sum is 0 (all deviations identical). */
  def brownForsythe(df: DataFrame, scopeCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val census = df.where(col(valueCol).isNotNull)
      .select(col(scopeCol).as("s"), col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("s"), col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("s"), col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy(col("s"), col("g"))
    val cum = census
      .withColumn("cum", sum(col("c")).over(wc))
      .withColumn("ni", sum(col("c")).over(wn))
    val med = cum.groupBy(col("s"), col("g")).agg(
      (min(when(col("cum") >= expr("(ni + 1) div 2"), col("v"))) +
        min(when(col("cum") >= expr("ni div 2 + 1"), col("v")))).as("med2"))
    val z = census.join(med, Seq("s", "g"))
      .withColumn("z", abs(lit(2L) * col("v") - col("med2")))
    val perGroup = z.groupBy(col("s"), col("g")).agg(
      sum(col("c")).as("ni"),
      sum(col("c").cast(dec) * col("z").cast(dec)).cast(dec).as("si"),
      sum(col("c").cast(dec) * col("z").cast(dec) * col("z").cast(dec))
        .cast(dec).as("qi"))
    val folded = perGroup
      .select(col("s"), struct(col("g"),
        (col("si") * col("si")).cast(dec).as("s2"), col("ni"), col("si"),
        col("qi")).as("e"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("k"), sum(col("e.ni")).as("n"),
        sum(col("e.si")).cast(dec).as("ss"),
        sum(col("e.qi")).cast(dec).as("qq"),
        sort_array(collect_list(col("e"))).as("es"))
      .withColumn("__sterm", expr(
        """aggregate(es, CAST(0.0 AS DOUBLE), (a, x) ->
          |  a + CAST(x.s2 AS DOUBLE) / CAST(x.ni AS DOUBLE))""".stripMargin))
    val between = col("__sterm") -
      (col("ss") * col("ss")).cast(dec).cast("double") /
        col("n").cast("double")
    val within = col("qq").cast("double") - col("__sterm")
    folded.select(col("s"), col("k"), col("n"),
      when(col("k") > 1 && within > 0,
        (col("n") - col("k")).cast("double") * between /
          ((col("k") - 1).cast("double") * within)).as("f"))
  }

  /** Trimmed mean per group at census grain — the robust location
    * estimate between the mean (outlier-hostage) and the median
    * (throws away 98% of the data): drop the lowest and highest
    * ⌊n·αnum/αden⌋ observations BY RANK and average the rest. The
    * trim happens on the (group, value) census with cumulative
    * windows: each distinct value's surviving multiplicity is the
    * exact integer overlap of its rank interval [cum−cnt+1, cum] with
    * the kept band [t+1, n−t] — no per-row sort, no value buffering
    * (the [[graft.operators.Quantiles.groupedQuantilesDisc]] shape).
    *
    * Exactness: α rides as a rational so t = ⌊n·αnum/αden⌋ is an
    * exact integer; the kept sum is Σ value·overlap in exact decimals;
    * the mean is one division. Groups where the trim swallows
    * everything (n ≤ 2t) emit null — loud. Output: (g, n, n_trimmed,
    * trimmed_mean). */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      alphaNum: Long = 5L, alphaDen: Long = 100L): DataFrame = {
    require(alphaDen > 0 && alphaNum >= 0 && 2 * alphaNum < alphaDen,
      s"alpha must be in [0, 1/2), got $alphaNum/$alphaDen")
    val dec = "decimal(38,0)"
    val census = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy(col("g"))
    val ranked = census
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wn))
      .withColumn("t", expr(s"(n * $alphaNum) div $alphaDen"))
      .withColumn("keep",
        greatest(least(col("cum"), col("n") - col("t")) -
          greatest(col("cum") - col("cnt") + 1L, col("t") + 1L) + 1L,
          lit(0L)))
    ranked.groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("t")).as("__t"),
        sum(col("keep")).as("n_kept"),
        sum((col("v").cast(dec) * col("keep").cast(dec)).cast(dec))
          .cast(dec).as("__s"))
      .select(col("g"), col("n"), (lit(2L) * col("__t")).as("n_trimmed"),
        when(col("n_kept") > 0L,
          col("__s").cast("double") / col("n_kept").cast("double"))
          .as("trimmed_mean"))
  }

  /** Grubbs outlier statistic per group — G = max|x − x̄|/s, the
    * single-most-extreme-point readout [[madOutliers]]'s per-row flags
    * roll up to: WHICH observation is the group's worst offender and
    * how many sigmas out is it. Reported with the offending id so the
    * alert is actionable (compare against the Grubbs critical value
    * for the caller's n and α off-line; the statistic itself is the
    * deterministic part).
    *
    * Exactness: the argmax key is the INTEGER |n·x − Σx| (maximizing
    * |x − x̄| without ever forming the float mean), tie-broken by
    * smallest id — a pinned total order; G and the mean/sd readouts
    * are pinned double shapes from exact (n, Σx, Σx²). Output:
    * (g, n, outlier_id, outlier_value, g_stat, mean, sd); null stat
    * when n < 2 or sd = 0. */
  def grubbs(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String): DataFrame =
    grubbsFromCensus(grubbsCensus(df, groupCol, idCol, valueCol))

  /** The [[grubbs]] census — the streaming-twin seam (the
    * [[graft.operators.Eval.welchTFromCensus]] pattern): per group the
    * exact moments (n, Σx, Σx²) plus BOTH extreme candidates with
    * pinned smallest-id tie-breaks. The argmax of |x − x̄| always sits
    * at the group min or max, so these seven exact values are the
    * complete prefix-aggregable state — every field is a sum/min/max,
    * legal in a complete-mode streaming aggregation
    * ([[graft.streaming.Streams.grubbsCensusStream]]). */
  def grubbsCensus(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("long").as("id"),
        col(valueCol).cast("long").as("x"))
    val xD = col("x").cast(dec)
    base.groupBy(col("g")).agg(
      count(lit(1)).as("n"), sum(xD).cast(dec).as("s"),
      sum((xD * xD).cast(dec)).cast(dec).as("q"),
      min(struct(col("x"), col("id"))).as("__lo"),
      max(struct(col("x"), negate(col("id")).as("nid"))).as("__hi"))
      .select(col("g"), col("n"), col("s"), col("q"),
        col("__lo.x").as("x_min"), col("__lo.id").as("id_min"),
        col("__hi.x").as("x_max"), (-col("__hi.nid")).as("id_max"))
  }

  /** [[grubbs]] from a [[grubbsCensus]] (streamed or batch): the
    * winner is whichever extreme has the larger exact integer
    * deviation |n·x − Σx|, ties to the smaller id — identical to the
    * row-level argmax (only the two extremes, or a value and its
    * mirror 2Σx/n − x, can tie on deviation). */
  def grubbsFromCensus(census: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n").cast(dec)
    val devLo = abs((nD * col("x_min").cast(dec) - col("s")).cast(dec))
    val devHi = abs((nD * col("x_max").cast(dec) - col("s")).cast(dec))
    val pickLo = devLo > devHi ||
      (devLo === devHi && col("id_min") <= col("id_max"))
    val varS = dd((nD * col("q") - col("s") * col("s")).cast(dec)) /
      dd((nD * (nD - 1).cast(dec)).cast(dec))
    val sd = sqrt(varS)
    val ok = col("n") > 1L && varS > lit(0.0)
    census
      .withColumn("__dev", when(pickLo, devLo).otherwise(devHi))
      .select(col("g"), col("n"),
        when(pickLo, col("id_min")).otherwise(col("id_max"))
          .as("outlier_id"),
        when(pickLo, col("x_min")).otherwise(col("x_max"))
          .as("outlier_value"),
        when(ok, dd(col("__dev")) / (dd(col("n")) * sd)).as("g_stat"),
        (dd(col("s")) / dd(col("n"))).as("mean"),
        when(col("n") > 1L, sd).as("sd"))
  }
}
