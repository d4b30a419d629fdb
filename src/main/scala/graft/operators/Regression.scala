package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares via sufficient statistics — the
  * distributed-analytics workhorse for per-key trend fitting (price vs
  * quantity, score vs time, ...) that needs exactly ONE aggregation
  * pass: slope/intercept/r² are closed forms over (n, Σx, Σy, Σxx,
  * Σxy, Σyy), each a mergeable sum, so the shuffle carries six numbers
  * per group regardless of group size — the same scale shape as any
  * grouped count.
  *
  * Determinism contract: the inputs are summed as DECIMALs (exact,
  * order-insensitive — a double sum would drift with partitioning), and
  * the closed forms are evaluated in one fixed expression shape over
  * the exact sums, so results are bit-identical at any parallelism and
  * replayable in another engine. Callers must pick `scale` so x, y,
  * x², xy and y² are exactly representable at that many decimal digits
  * (e.g. money at 2 needs scale 4 for y²).
  */
object Regression {

  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, scale: Int = 4): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(scale >= 0 && scale <= 10, s"scale=$scale")
    val dec = s"decimal(34,$scale)"
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    def d(c: Column): Column = c.cast(dec)
    val sums = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(d(x)).as("sx"), sum(d(y)).as("sy"),
        sum(d(x * x)).as("sxx"), sum(d(x * y)).as("sxy"),
        sum(d(y * y)).as("syy"))
    // fixed expression shape over exact sums: every op below is a
    // correctly-rounded IEEE double op, so any engine reproduces it
    val nD  = col("n").cast("double")
    val sxD = col("sx").cast("double");  val syD  = col("sy").cast("double")
    val sxxD = col("sxx").cast("double"); val sxyD = col("sxy").cast("double")
    val syyD = col("syy").cast("double")
    val covN = nD * sxyD - sxD * syD   // n·cov·n
    val varXN = nD * sxxD - sxD * sxD  // n·var(x)·n
    val varYN = nD * syyD - syD * syD
    sums.select(groupCols.map(col) ++ Seq(
      col("n"),
      (covN / varXN).as("slope"),
      ((syD - (covN / varXN) * sxD) / nD).as("intercept"),
      ((covN * covN) / (varXN * varYN)).as("r2")): _*)
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE aggregation
    * pass — k sums + k square-sums + k·(k-1)/2 cross-sums, all
    * DECIMAL-exact (same contract as [[groupedOls]]: pick `scale` so
    * every value and pairwise product is exactly representable), then
    * each correlation is a fixed chain of correctly-rounded double ops
    * over the exact sums. The shuffle carries O(k²) numbers total —
    * row count never matters — and the result replays bit-identically
    * in any engine. Output: (col_a, col_b, n, corr) for a < b. */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 4): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dec = s"decimal(34,$scale)"
    def d(c: Column): Column = c.cast(dec)
    def v(name: String): Column = col(name).cast("double")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    val aggs =
      cols.map(c => sum(d(v(c))).as(s"s_$c")) ++
      cols.map(c => sum(d(v(c) * v(c))).as(s"ss_$c")) ++
      pairs.map { case (a, b) => sum(d(v(a) * v(b))).as(s"sp_${a}_$b") }
    val t = df.agg(count(lit(1)).as("n"), aggs: _*)
    pairs.map { case (a, b) =>
      val nD = col("n").cast("double")
      val sa = col(s"s_$a").cast("double"); val sb = col(s"s_$b").cast("double")
      val da = nD * col(s"ss_$a").cast("double") - sa * sa
      val db = nD * col(s"ss_$b").cast("double") - sb * sb
      t.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
        ((nD * col(s"sp_${a}_$b").cast("double") - sa * sb) /
          (sqrt(da) * sqrt(db))).as("corr"))
    }.reduce(_ unionByName _)
  }

  /** Partial correlation per scope (first-order): the correlation of x
    * and y with z's linear effect removed from both —
    *   ρ_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)),
    * the "is the x–y link real or just z pulling both" screen that
    * [[corrMatrix]] alone cannot answer (a confounder inflates every
    * pairwise r). Inputs are cast to long (cents convention) so all
    * nine moments are exact decimal sums; each r is one pinned
    * division of exact integers under a sqrt, and the final compose is
    * a fixed float shape — cross-engine by the q121 libm contract.
    *
    * Scale shape: ONE scope-census aggregation; everything after is
    * broadcast-size arithmetic. Output: (scope, n, r_xy, r_xz, r_yz,
    * pcorr); r's null when a variance is 0, pcorr null additionally
    * when either 1−r² term is ≤ 0 (z explains x or y exactly). */
  def partialCorr(df: DataFrame, scopeCol: String, xCol: String,
      yCol: String, zCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def l(c: String): Column = col(c).cast("long")
    val base = df.select(col(scopeCol).as("scope"), l(xCol).as("x"),
        l(yCol).as("y"), l(zCol).as("z"))
      .where(col("x").isNotNull && col("y").isNotNull &&
        col("z").isNotNull)
    def d(c: Column): Column = c.cast(dec)
    def m(c: Column): Column = sum(c.cast(dec)).cast(dec)
    val agg = base.groupBy(col("scope")).agg(count(lit(1)).as("n"),
      m(d(col("x"))).as("sx"), m(d(col("y"))).as("sy"),
      m(d(col("z"))).as("sz"),
      m((d(col("x")) * d(col("x"))).cast(dec)).as("sxx"),
      m((d(col("y")) * d(col("y"))).cast(dec)).as("syy"),
      m((d(col("z")) * d(col("z"))).cast(dec)).as("szz"),
      m((d(col("x")) * d(col("y"))).cast(dec)).as("sxy"),
      m((d(col("x")) * d(col("z"))).cast(dec)).as("sxz"),
      m((d(col("y")) * d(col("z"))).cast(dec)).as("syz"))
    def dd(c: Column): Column = c.cast("double")
    val nD = d(col("n"))
    def covN(sab: String, sa: String, sb: String): Column =
      (nD * col(sab) - col(sa) * col(sb)).cast(dec)
    def varN(saa: String, sa: String): Column =
      (nD * col(saa) - col(sa) * col(sa)).cast(dec)
    def r(sab: String, sa: String, sb: String, saa: String,
        sbb: String): Column = {
      val vA = varN(saa, sa)
      val vB = varN(sbb, sb)
      when(dd(vA) > 0.0 && dd(vB) > 0.0,
        dd(covN(sab, sa, sb)) / sqrt(dd(vA) * dd(vB)))
    }
    val rxy = r("sxy", "sx", "sy", "sxx", "syy")
    val rxz = r("sxz", "sx", "sz", "sxx", "szz")
    val ryz = r("syz", "sy", "sz", "syy", "szz")
    val denom = (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)
    agg.select(col("scope"), col("n"), rxy.as("r_xy"), rxz.as("r_xz"),
      ryz.as("r_yz"),
      when(denom > 0.0, (rxy - rxz * ryz) / sqrt(denom)).as("pcorr"))
  }

  /** Leave-one-group-out slope influence: for every group g, the OLS
    * slope of y on x refit WITHOUT g's rows — the "which cohort is
    * driving the fit" audit a 100 TB regression needs before anyone
    * trusts the coefficient. The distributed trick is that OLS is a
    * function of five additive moments, so the g-excluded fit is the
    * GLOBAL moment vector minus g's census row — one group census, one
    * broadcast total, zero per-group rescans (refitting per group
    * would read the data |groups| times).
    *
    * Exactness: inputs cast to long; moments exact decimal; global
    * totals are decimal sums OF the group census (order-free integer
    * addition); each slope is the [[groupedOls]] pinned covN/varXN
    * shape. Output per group: (group, n_group, slope_full,
    * slope_without, delta); slope_without null when the remainder has
    * no x-variance, delta null when either side is. */
  def logoInfluence(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def d(c: Column): Column = c.cast(dec)
    val base = df.select(col(groupCol).as("g"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    // the census feeds BOTH the totals aggregate and the output rows:
    // checkpoint so the row-scale base scan runs once (q170/q221 lesson)
    val census = base.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(d(col("x"))).cast(dec).as("sx"),
      sum(d(col("y"))).cast(dec).as("sy"),
      sum((d(col("x")) * d(col("x"))).cast(dec)).cast(dec).as("sxx"),
      sum((d(col("x")) * d(col("y"))).cast(dec)).cast(dec).as("sxy"))
      .localCheckpoint(true)
    val totals = broadcast(census.agg(
      sum(col("n")).as("tn"), sum(col("sx")).cast(dec).as("tsx"),
      sum(col("sy")).cast(dec).as("tsy"),
      sum(col("sxx")).cast(dec).as("tsxx"),
      sum(col("sxy")).cast(dec).as("tsxy")))
    def dd(c: Column): Column = c.cast("double")
    def slope(n: Column, sx: Column, sy: Column, sxx: Column,
        sxy: Column): Column = {
      val covN = (d(n) * sxy - sx * sy).cast(dec)
      val varXN = (d(n) * sxx - sx * sx).cast(dec)
      when(dd(varXN) > 0.0, dd(covN) / dd(varXN))
    }
    val full = slope(col("tn"), col("tsx"), col("tsy"), col("tsxx"),
      col("tsxy"))
    val without = slope(col("tn") - col("n"),
      (col("tsx") - col("sx")).cast(dec),
      (col("tsy") - col("sy")).cast(dec),
      (col("tsxx") - col("sxx")).cast(dec),
      (col("tsxy") - col("sxy")).cast(dec))
    census.crossJoin(totals)
      .select(col("g"), col("n").as("n_group"), full.as("slope_full"),
        without.as("slope_without"),
        (without - full).as("delta"))
  }

  /** Per-group Theil–Sen robust trend — the median of all pairwise
    * slopes over the key's ordered period series, with intercept
    * median(xᵢ − m·i): a single wild day moves an OLS slope
    * ([[groupedOls]]) arbitrarily but shifts a median slope by one
    * rank — the trend number to put on noisy volume series.
    *
    * Scale shape: the input is a period census, so the pairwise slope
    * table is periods²-bounded PER KEY (435 pairs for a month of
    * days) — never row scale; both medians are rank-picks over
    * key-partitioned windows on that bounded table. Determinism:
    * each slope is ONE double division of exact integers (identical
    * cross-engine), medians are the LOWER median under the total
    * order (slope, i, j) / (value, i). Output: (key, n_obs, n_pairs,
    * slope, intercept); keys with < 2 periods are absent.
    *
    * Ordering contract: `ordCol` values compare AS STRINGS — pass
    * zero-padded period labels (ISO dates); a numeric ord mis-orders
    * lexically, so NumericType ord columns are REFUSED at plan build
    * (format them first — the contract is executable, not prose). */
  def theilSen(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.schema(ordCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"theilSen: ordCol '$ordCol' is ${df.schema(ordCol).dataType} — " +
        "ord values compare AS STRINGS (\"10\" < \"2\"); zero-pad or " +
        "format to ISO period labels first")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__o"))
    val idx = df.select(col(keyCol), col(ordCol).cast("string").as("__o"),
        col(valueCol).cast("long").as("__x"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .drop("__o")
      .localCheckpoint(true)
    val pairs = idx.select(col(keyCol), col("__i").as("i"), col("__x").as("xi"))
      .join(idx.select(col(keyCol), col("__i").as("j"), col("__x").as("xj")), keyCol)
      .where(col("i") < col("j"))
      .select(col(keyCol), col("i"), col("j"),
        ((col("xj") - col("xi")).cast("double") /
          (col("j") - col("i")).cast("double")).as("__m"))
    val wS = Window.partitionBy(col(keyCol))
      .orderBy(col("__m"), col("i"), col("j"))
    val wAll = Window.partitionBy(col(keyCol))
    val slope = pairs
      .withColumn("__r", row_number().over(wS).cast("long"))
      .withColumn("__np", count(lit(1)).over(wAll))
      .where(col("__r") === expr("(__np + 1) div 2"))
      .select(col(keyCol), col("__np").as("n_pairs"), col("__m").as("slope"))
    val resid = idx.join(slope, keyCol)
      .select(col(keyCol), col("n_pairs"), col("slope"), col("__i"),
        (col("__x").cast("double") - col("slope") * col("__i").cast("double"))
          .as("__b"))
    val wB = Window.partitionBy(col(keyCol)).orderBy(col("__b"), col("__i"))
    resid
      .withColumn("__r", row_number().over(wB).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where(col("__r") === expr("(__n + 1) div 2"))
      .select(col(keyCol), col("__n").as("n_obs"), col("n_pairs"),
        col("slope"), col("__b").as("intercept"))
  }

  /** Per-group Spearman rank correlation — [[corrMatrix]]'s robust
    * sibling: Pearson on mid-ranks, so monotone-but-nonlinear
    * dependence registers and outliers lose their leverage (the
    * metadata-vs-quality screen where a single giant value would
    * swamp a Pearson moment).
    *
    * Exactness: mid-ranks enter DOUBLED (a tie-run spanning ranks
    * a..b has mid-rank (a+b)/2; 2·mid = a+b is an integer — ties
    * never produce a .5 float), the doubling cancels in ρ, and every
    * moment (Σr, Σr², Σrxry) is an exact integer sum carried as
    * DECIMAL(38,0) through the n·Σ − Σ·Σ combination; the only float
    * ops are two correctly-rounded sqrts and one division. Rank
    * censuses are (group, value)-bounded windows (the [[Normalize]]
    * machinery); rows join rank tables on (group, value) — two
    * value-keyed shuffles, one group aggregate. Output: (group..., n,
    * rho); a group with zero variance on either side yields null. */
  def spearman(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    def rank2(vCol: String, out: String): DataFrame = {
      val census = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
        .groupBy((g :+ col(vCol)): _*)
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(g: _*).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      census.select((g :+ col(vCol) :+
        (lit(2L) * coalesce(sum(col("__c")).over(w), lit(0L)) +
          col("__c") + lit(1L)).as(out)): _*)
    }
    val rows = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .join(rank2(xCol, "__rx"), groupCols :+ xCol)
      .join(rank2(yCol, "__ry"), groupCols :+ yCol)
    val dec = "decimal(38,0)"
    // products go DECIMAL before the multiply: doubled ranks reach 2n,
    // and (2n)² at n ≥ 2^31 rows per group would overflow a long term
    val sums = rows.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).cast(dec).as("__sx"),
        sum(col("__ry")).cast(dec).as("__sy"),
        sum(col("__rx").cast(dec) * col("__ry").cast(dec)).cast(dec).as("__sxy"),
        sum(col("__rx").cast(dec) * col("__rx").cast(dec)).cast(dec).as("__sxx"),
        sum(col("__ry").cast(dec) * col("__ry").cast(dec)).cast(dec).as("__syy"))
    val nD = col("n").cast(dec)
    val num = nD * col("__sxy") - col("__sx") * col("__sy")
    val dx = nD * col("__sxx") - col("__sx") * col("__sx")
    val dy = nD * col("__syy") - col("__sy") * col("__sy")
    sums.select((g :+ col("n") :+
      when(dx > 0 && dy > 0,
        num.cast("double") / (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
        .as("rho")): _*)
  }

  /** Per-group Kendall tau-b — the concordance-based third member of
    * the correlation family ([[corrMatrix]] Pearson, [[spearman]]
    * mid-rank): of all observation pairs, how many order the same way
    * on x and on y? Tie-adjusted:
    *   tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2)),
    * n0 = all pairs, n1/n2 = pairs tied on x / on y. Every count is an
    * exact integer (pair signs are {−1,0,1} comparisons, never float
    * differences); the tie products go DECIMAL(38,0) before the
    * multiply (n⁴/4 overflows a long past ~55k observations); the only
    * float ops are one sqrt and one division.
    *
    * Scale shape: a per-group self-join materializes n(n−1)/2 pairs —
    * this is for PERIOD-BOUNDED series (daily/weekly censuses, the
    * [[theilSen]] contract), not row-scale data; a billion-row group
    * belongs in [[spearman]], whose censuses never pair rows. `ordCol`
    * must be unique per group (pairs dedupe on ord inequality).
    * Output: (group, n, n_pairs, concordant, discordant, tie_x, tie_y,
    * tau_b); groups with < 2 periods are absent; tau_b null when either
    * side is all-tied. */
  def kendallTauB(df: DataFrame, groupCol: String, ordCol: String,
      xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("g"), col(ordCol).as("o"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val a = base.select(col("g"), col("o").as("oa"), col("x").as("xa"),
      col("y").as("ya"))
    val b = base.select(col("g"), col("o").as("ob"), col("x").as("xb"),
      col("y").as("yb"))
    def sign(hi: Column, lo: Column): Column =
      when(hi > lo, 1).when(hi < lo, -1).otherwise(0)
    val pairs = a.join(b, Seq("g")).where(col("oa") < col("ob"))
      .select(col("g"), sign(col("xb"), col("xa")).as("cx"),
        sign(col("yb"), col("ya")).as("cy"))
    val counts = pairs.groupBy(col("g")).agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("cx") * col("cy") > 0, 1L).otherwise(0L)).as("concordant"),
      sum(when(col("cx") * col("cy") < 0, 1L).otherwise(0L)).as("discordant"),
      sum(when(col("cx") === 0, 1L).otherwise(0L)).as("tie_x"),
      sum(when(col("cy") === 0, 1L).otherwise(0L)).as("tie_y"))
    val ns = base.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val den = ((col("n_pairs") - col("tie_x")).cast(dec) *
      (col("n_pairs") - col("tie_y")).cast(dec)).cast(dec)
    ns.join(counts, Seq("g"))
      .select(col("g"), col("n"), col("n_pairs"), col("concordant"),
        col("discordant"), col("tie_x"), col("tie_y"),
        when(den > 0,
          (col("concordant") - col("discordant")).cast("double") /
            sqrt(den.cast("double"))).as("tau_b"))
  }

  /** Mann–Kendall trend test per key — the nonparametric "is there a
    * monotone trend at all" significance that [[theilSen]]'s slope
    * (magnitude) and [[kendallTauB]] (association between two value
    * columns) don't state: against TIME order,
    *   S = Σ_{i<j} sign(y_j − y_i),
    *   Var(S) = [n(n−1)(2n+5) − Σ_ties m(m−1)(2m+5)] / 18,
    *   z = (S ∓ 1)/√Var  (continuity-corrected, 0 at S = 0).
    * Robust to outliers and any monotone transform — the standard
    * trend gate on volume/quality series before a Theil–Sen slope is
    * quoted.
    *
    * Exactness: S and the tie term are exact integer sums (the
    * [[kendallTauB]] pair-join shape, bounded by periods² per key);
    * Var and z are pinned double shapes. Requires a unique `ordCol`
    * per key (time ties would need the full tie-corrected x-side):
    * enforced IN the plan — a key whose ord census shows duplicates
    * raises at execution (raise_error at group grain), because
    * equal-ord pairs would otherwise silently vanish from S (the
    * oa < ob pair filter drops both orientations). Output: (g, n, s,
    * var_s, z). */
  def mannKendall(df: DataFrame, groupCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(ordCol).as("o"),
        col(valueCol).cast("long").as("y"))
    val a = base.select(col("g"), col("o").as("oa"), col("y").as("ya"))
    val b = base.select(col("g"), col("o").as("ob"), col("y").as("yb"))
    val s = a.join(b, Seq("g")).where(col("oa") < col("ob"))
      .groupBy(col("g"))
      .agg(sum(when(col("yb") > col("ya"), 1L)
        .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s"))
    val ties = base.groupBy(col("g"), col("y")).agg(count(lit(1)).as("m"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_distinct"),
        sum((col("m").cast(dec) * (col("m") - 1L).cast(dec) *
          (lit(2L).cast(dec) * col("m").cast(dec) + 5L)).cast(dec))
          .cast(dec).as("__tie"))
    // the promised loud guard: distinct-ord count must equal row count
    // per key — checked at GROUP grain inside the plan (no extra scan
    // materializes; the census is one more map-side agg), so a
    // duplicate ordCol fails the job instead of biasing S
    val ns = base.groupBy(col("g")).agg(count(lit(1)).as("n"),
      countDistinct(col("o")).as("__n_ord"))
    val nD = col("n").cast(dec)
    val varS = ((nD * (nD - 1) * (lit(2L).cast(dec) * nD + 5L)).cast(dec) -
      col("__tie")).cast(dec).cast("double") / lit(18.0)
    ns.join(s, Seq("g")).join(ties, Seq("g"))
      .withColumn("var_s", varS)
      .select(col("g"),
        when(col("n") === col("__n_ord"), col("n"))
          .otherwise(raise_error(concat(
            lit("mannKendall: duplicate ordCol values for key "),
            col("g").cast("string"),
            lit(" - equal-ord pairs silently vanish from S")))
            .cast("long")).as("n"),
        col("s"), col("var_s"),
        when(col("n") < 2L || col("var_s") <= 0.0, null)
          .when(col("s") > 0L,
            (col("s") - 1L).cast("double") / sqrt(col("var_s")))
          .when(col("s") < 0L,
            (col("s") + 1L).cast("double") / sqrt(col("var_s")))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Seasonal Mann–Kendall (Hirsch & Slack 1984) per key — the trend
    * test for SEASONAL series [[mannKendall]] alarms falsely on:
    * comparisons run only WITHIN each season (each month against its
    * own history), so the annual cycle never masquerades as trend:
    *   S = Σ_seasons S_m,  Var = Σ_seasons Var_m,
    * z with the same ±1 continuity correction. The deployment
    * monotone-drift gate for weekly/monthly-patterned volume.
    *
    * Exactness: each season's S and tie census are the exact-integer
    * [[mannKendall]] censuses; S sums exactly; the one float sum
    * (ΣVar_m, each a /18 double) folds in SEASON ORDER over the
    * season-bounded array. The duplicate-ord guard runs per
    * (key, season) — same loud raise.
    *
    * Scale shape: the pair join is per-(key, season) — seasons CUT
    * the quadratic term k² → Σ_m k_m² (a 12-way seasonal split is
    * ~12× cheaper than the unsplit test); everything after is
    * census-grain. Output: (g, n, n_seasons, s, var_s, z). */
  def seasonalMannKendall(df: DataFrame, groupCol: String,
      seasonCol: String, ordCol: String, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(seasonCol).cast("long").as("m"),
        col(ordCol).as("o"), col(valueCol).cast("long").as("y"))
    val a = base.select(col("g"), col("m"), col("o").as("oa"),
      col("y").as("ya"))
    val b = base.select(col("g"), col("m"), col("o").as("ob"),
      col("y").as("yb"))
    val s = a.join(b, Seq("g", "m")).where(col("oa") < col("ob"))
      .groupBy(col("g"), col("m"))
      .agg(sum(when(col("yb") > col("ya"), 1L)
        .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("sm"))
    val ties = base.groupBy(col("g"), col("m"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("g"), col("m"))
      .agg(sum((col("t").cast(dec) * (col("t") - 1L).cast(dec) *
        (lit(2L).cast(dec) * col("t").cast(dec) + 5L)).cast(dec))
        .cast(dec).as("__tie"))
    val ns = base.groupBy(col("g"), col("m"))
      .agg(count(lit(1)).as("nm"), countDistinct(col("o")).as("__n_ord"))
    val nD = col("nm").cast(dec)
    val varM = ((nD * (nD - 1) * (lit(2L).cast(dec) * nD + 5L)).cast(dec) -
      coalesce(col("__tie"), lit(0L).cast(dec))).cast(dec)
      .cast("double") / lit(18.0)
    // LEFT join: a (key, season) cell with a single observation has no
    // oa<ob pair, so `s` has no row for it — an inner join would drop
    // it from n and n_seasons silently (z is unaffected: S_m=0,
    // Var_m=0). coalesce pins the 1-obs cell to its exact zeros.
    val per = ns.join(s, Seq("g", "m"), "left")
      .join(ties, Seq("g", "m"), "left")
      .select(col("g"), col("m"),
        when(col("nm") === col("__n_ord"), col("nm"))
          .otherwise(raise_error(concat(
            lit("seasonalMannKendall: duplicate ordCol values for key "),
            col("g").cast("string"), lit(" season "),
            col("m").cast("string"))).cast("long")).as("nm"),
        coalesce(col("sm"), lit(0L)).as("sm"), varM.as("vm"))
    val g = per.groupBy(col("g")).agg(
      sum(col("nm")).as("n"), count(lit(1)).as("n_seasons"),
      sum(col("sm")).as("s"),
      sort_array(collect_list(struct(col("m"), col("vm")))).as("cells"))
    val varS = aggregate(col("cells"), lit(0.0d),
      (acc, x) => acc + x.getField("vm"))
    g.withColumn("var_s", varS)
      .select(col("g"), col("n"), col("n_seasons"), col("s"),
        col("var_s"),
        when(col("n") < 2L || col("var_s") <= 0.0, null)
          .when(col("s") > 0L,
            (col("s") - 1L).cast("double") / sqrt(col("var_s")))
          .when(col("s") < 0L,
            (col("s") + 1L).cast("double") / sqrt(col("var_s")))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Newey–West (HAC) robust trend test per key — the OLS time-trend
    * slope with an autocorrelation-consistent standard error: the IID
    * SE a serially-correlated series makes a LIE (positive
    * autocorrelation deflates it and the trend "significance" is
    * manufactured). Slope over the rank clock x = 0..n−1:
    *   Var_NW(b) = S̃ / SS²,  S̃ = Γ̃₀ + 2 Σ_l (1 − l/(L+1)) Γ̃_l,
    * with Γ̃_l = Σ_t v_t v_{t−l}, v_t = (n·x_t − Σx)·e_t the n-scaled
    * centered-regressor scores and SS = nΣx² − (Σx)² exact. Reported
    * NEXT TO the IID t so the autocorrelation haircut is visible —
    * the honest version of q366's Mann–Kendall for when you want the
    * SLOPE, not just the direction.
    *
    * Exactness: x is the per-key rank (integer), all OLS moments
    * exact decimals, b/a pinned-ratio doubles, e_t one pinned shape
    * per row; the Γ̃ folds run in ORD ORDER over the key-bounded
    * collected array with Bartlett weights written as 1 − l/(L+1)
    * (the q426 IEEE-identity discipline). Scale shape: one keyed
    * window pass (rank + moments), one per-key array fold — input is
    * a period census. Output: (k, n, slope, t_iid, t_nw); null when
    * n ≤ lags + 2 or a variance is non-positive. */
  def neweyWestTrend(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, lags: Int = 4): DataFrame = {
    require(lags >= 1, s"lags must be >= 1: $lags")
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val wAll = Window.partitionBy(col("k"))
    val base = df.where(col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(ordCol).as("o"),
        col(valueCol).cast("long").as("y"))
      .withColumn("x", row_number().over(w).cast("long") - 1L)
    def D(c: Column): Column = c.cast(dec)
    val m = base
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sx", sum(col("x")).over(wAll))
      .withColumn("sxx", sum(col("x") * col("x")).over(wAll))
      .withColumn("sy", sum(D(col("y"))).over(wAll).cast(dec))
      .withColumn("sxy",
        sum((D(col("x")) * D(col("y"))).cast(dec)).over(wAll).cast(dec))
    def dd(c: Column): Column = c.cast("double")
    val ss = (D(col("n")) * D(col("sxx")) -
      D(col("sx")) * D(col("sx"))).cast(dec)
    val b = dd((D(col("n")) * col("sxy") -
      D(col("sx")) * col("sy")).cast(dec)) / dd(ss)
    val a = (dd(col("sy")) - col("__b") * dd(col("sx"))) / dd(col("n"))
    val e = dd(col("y")) - col("__a") - col("__b") * dd(col("x"))
    val v = dd(col("n") * col("x") - col("sx")) * col("__e")
    val scored = m.withColumn("__ss", ss).withColumn("__b", b)
      .withColumn("__a", a).withColumn("__e", e).withColumn("__v", v)
    // residuals quantize to 1e-6 BEFORE the square (a rounded e is
    // ~13 significant digits — double→decimal round-trips exactly —
    // where a rounded e² at 1e12 magnitude would not); the squared
    // decimals then sum exactly at any partitioning
    val e6 = round(col("__e"), 6).cast("decimal(20,6)")
    val per = scored.groupBy(col("k")).agg(
      max(col("n")).as("n"), max(col("__b")).as("slope"),
      max(dd(col("__ss"))).as("ssd"),
      sum(e6 * e6).as("see"),
      sort_array(collect_list(struct(col("o"), col("__v")))).as("cells"))
      .withColumn("vs", expr("transform(cells, c -> c.__v)"))
    // Γ̃_l folds in ord order; Bartlett weights 1 − l/(L+1); series
    // shorter than the lag contribute 0 (and are null-guarded anyway —
    // Spark's sequence() runs DESCENDING on inverted bounds, so the
    // when() is a correctness guard, not just tidiness)
    val gammas = (0 to lags).map { l =>
      when(col("n") >= lit(l + 1L), expr(
        s"""aggregate(transform(sequence(${l + 1}L, CAST(n AS LONG)),
           |  i -> element_at(vs, CAST(i AS INT))
           |    * element_at(vs, CAST(i - $l AS INT))),
           |  CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)""".stripMargin))
        .otherwise(lit(0.0)).as(s"g$l")
    }
    val withG = per.select(
      (Seq(col("k"), col("n"), col("slope"), col("ssd"), col("see")) ++
        gammas): _*)
    val sTilde = col("g0") + lit(2.0) * (1 to lags).map { l =>
      lit(1.0 - l.toDouble / (lags + 1)) * col(s"g$l")
    }.reduceLeft(_ + _)
    val varNw = sTilde / (col("ssd") * col("ssd"))
    val varIid = (dd(col("n")) * col("see").cast("double") /
      dd(col("n") - 2L)) / col("ssd")
    val ok = col("n") > lit(lags.toLong + 2L)
    withG.select(col("k").as(keyCol), col("n"), col("slope"),
      when(ok && varIid > 0.0, col("slope") / sqrt(varIid)).as("t_iid"),
      when(ok && varNw > 0.0, col("slope") / sqrt(varNw)).as("t_nw"))
  }

}
