package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: assign every
  * row to one of N named splits (train/val/test) as a pure function of a
  * stable id — no shuffle, no RNG state, reproducible across runs,
  * engines, and subsets (a doc keeps its split when the corpus grows,
  * the property an 100 TB incremental pipeline needs; sampling by
  * `rand()` has none of these).
  *
  * Mechanism: the first two hex chars of `md5(id)` are a uniform value
  * in [0, 256); cumulative weight thresholds become two-hex-digit
  * prefixes and the assignment is a chain of string comparisons. Weights
  * therefore quantize to 1/256 granularity — plenty for split ratios,
  * and the same trick DuckDB replays verbatim (q91 precedent).
  */
object Splits {

  /** Appends `splitCol` with the name of the split each row lands in.
    * `weights` are (name, weight) with weights summing to ~1; the last
    * split absorbs the rounding remainder. */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(weights.size >= 2, "need at least two splits")
    require(weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")

    val h = substring(md5(col(idCol).cast("string")), 1, 2)
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail // cumulative
    // threshold for split i: first 2 hex digits of floor(cum * 256)
    def hex2(cum: Double): String = f"${math.min(255, math.floor(cum * 256).toInt)}%02x"
    val assigned = weights.init.zip(cuts.init).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, ((name, _), cum)) =>
        when(h < lit(hex2(cum)), lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, assigned)
  }

  /** Split-leakage audit — the GroupKFold check a training pipeline runs
    * BEFORE trusting a row-level split: does any entity (`groupCol` —
    * a user, a document family, a near-dup cluster id) straddle two
    * splits? Straddling groups leak: the model sees the entity in train
    * and is scored on it in test. A [[hashSplit]] keyed on the ROW id
    * leaks whenever groups span rows; keyed on the GROUP id it cannot —
    * this census quantifies the difference instead of asserting it.
    *
    * Scale shape: one (group, split) census (map-side combined), one
    * group-level re-aggregation; no row-scale shuffle after the census.
    * All-integer counts; the leak rate is one terminal division.
    * Output one row: (n_rows, n_groups, n_straddling, n_rows_straddling,
    * leak_rate = straddling rows / all rows). */
  def splitLeakage(df: DataFrame, groupCol: String,
      splitCol: String): DataFrame = {
    val census = df.groupBy(col(groupCol).as("g"), col(splitCol).as("s"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("nr"), count(lit(1)).as("ns"))
    census.agg(
        sum(col("nr")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("ns") > 1, 1L).otherwise(0L)).as("n_straddling"),
        sum(when(col("ns") > 1, col("nr")).otherwise(0L))
          .as("n_rows_straddling"))
      .withColumn("leak_rate",
        col("n_rows_straddling").cast("double") / col("n_rows").cast("double"))
  }

  /** Deterministic per-stratum downsampling — the mixture-tuning move of
    * a pre-training pipeline ("keep 25% of src3, 75% of src7, all the
    * rest"): rows whose stratum has a rate keep only ids whose md5
    * prefix falls under floor(rate*256) in two hex digits; strata not in
    * `rates` keep everything. Same purity/stability contract as
    * [[hashSplit]], and still a pure filter — no shuffle, fully
    * pushdown-friendly. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0,1]")
    val h = substring(md5(col(idCol).cast("string")), 1, 2)
    def keepFor(r: Double): Column =
      if (r >= 1.0) lit(true) // "100" would compare lexicographically, not numerically
      else h < lit(f"${math.floor(r * 256).toInt}%02x")
    val keep = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(true): Column) { case (acc, (stratum, rate)) =>
        when(col(strataCol) === lit(stratum), keepFor(rate)).otherwise(acc)
      }
    df.where(keep)
  }

  /** Deterministic weight-proportional sampling WITHOUT replacement —
    * priority sampling (Duffield–Lund–Thorup): each row draws a uniform
    * u from its id's 48-bit md5 prefix and gets priority weight/u; the
    * k highest-priority rows are the sample. Heavier rows draw
    * proportionally higher priorities, and once picked a row can't
    * repeat — the "sample 30 docs by character mass" move a mixture
    * builder runs. Same purity contract as [[hashSplit]]: rerun-,
    * partition- and engine-stable (u is exact in a double, and
    * u/weight is ONE correctly-rounded IEEE division, so another
    * engine orders identically — no libm transcendentals involved).
    *
    * Rides the bounded [[TopK]] aggregate: only k-row partial summaries
    * shuffle, never the corpus (the O6 scale path: a 100 TB corpus
    * produces one k-row heap per partition).
    * Output: (rank 1..k, id, weight). */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    // smallest u/weight == largest priority; TopK ranks by value DESC,
    // ties by id ASC, so negate the key
    val ranked = df
      .where(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(lit("all").as("g"), col(idCol), col(weightCol),
        negate(conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
          .cast("double") / col(weightCol).cast("double")).as("nk"))
    val top = TopK.topKPerGroup(ranked, "g", idCol, "nk", k)
    // re-attach the weight by broadcasting the k winners against the
    // corpus scan (the k-row side must never force a corpus shuffle)
    df.select(col(idCol), col(weightCol))
      .join(broadcast(top.select(col("rank"), col(idCol))), Seq(idCol))
      .select(col("rank"), col(idCol), col(weightCol))
  }

  /** Deterministic per-key cap — "keep at most `cap` docs per domain",
    * the de-biasing move a web-corpus pipeline runs so one boilerplate
    * farm can't dominate training: within each key, rows rank by their
    * id's 48-bit md5 prefix (uniform, engine-replayable) and only the
    * first `cap` survive. Stability contract of [[hashSplit]]: a row's
    * survival depends only on (its id, the ids sharing its key).
    * Rides the bounded [[TopK]] aggregate — per-partition cap-row
    * heaps, never a corpus-wide window sort; survivors broadcast back
    * against the scan. Returns the input rows filtered. */
  /** Neyman sample-size allocation: given a total `budget` of rows to
    * sample, split it across strata proportionally to N_h·σ_h — the
    * variance-minimizing allocation for estimating a mean (the
    * survey-sampling classic; uniform rates over-sample homogeneous
    * strata and starve volatile ones). The pipeline use: deciding how
    * many human-review/eval rows each source deserves.
    *
    * Determinism end-to-end: per-stratum (n, Σv, Σv²) are DECIMAL-exact
    * sufficient statistics (one aggregation; `scale` must hold the
    * values' decimals, the q178 OLS contract), σ_h is one sqrt of an
    * exact rational, and the integerization is LARGEST-REMAINDER with a
    * total (remainder DESC, stratum) order — allocations are integers
    * that sum EXACTLY to `budget`, bit-replayable. Strata with σ_h = 0
    * (constant or single-row) get weight 0 and rely on the remainder
    * rule for any leftover seats. Window work is strata-bounded. */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
      budget: Long, scale: Int = 4): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val dec = s"decimal(38,$scale)"
    val v = col(valueCol).cast(dec)
    val stats = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"))
      // population σ via the exact rational (n·Σv² − (Σv)²) / n²
      .withColumn("sd", sqrt(greatest(
        (col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n") * col("n")).cast("double"), lit(0.0))))
      .withColumn("w", col("n").cast("double") * col("sd"))
    val tot = stats.agg(sum(col("w")).as("tw")).select(
      when(col("tw") > 0, col("tw")).otherwise(lit(1.0)).as("tw"))
    val frac = stats.crossJoin(broadcast(tot))
      .withColumn("exact", lit(budget) * col("w") / col("tw"))
      .withColumn("base", floor(col("exact")).cast("long"))
      .withColumn("rem", col("exact") - col("base"))
    val wAll = Window.orderBy(col("rem").desc, col(stratumCol))
    val wTot = Window.partitionBy()
    frac
      .withColumn("rk", row_number().over(wAll))
      .withColumn("leftover", (lit(budget) - sum(col("base")).over(wTot))
        .cast("long"))
      .select(col(stratumCol), col("n"), round(col("sd"), 6).as("sd"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Execute a per-stratum sampling plan: keep EXACTLY `allocCol` rows
    * of each stratum, chosen by the deterministic (md5(id), id) order —
    * the step that turns [[neymanAllocation]]'s seat counts into an
    * actual sample. The pick is a pure function of the id (the
    * [[GlobalOrder]]/hash-split contract): reruns, engine changes and
    * stratum-internal reorderings all select the same rows.
    *
    * Scale shape: the allocation table is strata-bounded (broadcast);
    * the per-stratum rank is a partitioned window over the narrow
    * (stratum, id, key) projection — the q11 dedup-rank shape. For
    * strata far larger than their allocation, the budget-bounded
    * [[TopK]] heap pass is the cheaper path; this exact-window form is
    * the reference semantics both share. Output: the sampled rows
    * (stratum, id). */
  def executeAllocation(df: DataFrame, stratumCol: String, idCol: String,
      alloc: DataFrame, allocCol: String = "alloc"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(stratumCol), col(idCol))
      .join(broadcast(alloc.select(col(stratumCol), col(allocCol))), Seq(stratumCol))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= col(allocCol))
      .select(col(stratumCol), col(idCol))
  }

  def capPerKey(df: DataFrame, idCol: String, keyCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap=$cap")
    val ranked = df.select(col(keyCol), col(idCol),
      negate(conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
        .cast("double")).as("nk"))
    val kept = TopK.topKPerGroup(ranked, keyCol, idCol, "nk", cap)
      .select(col(idCol))
    df.join(broadcast(kept), Seq(idCol), "left_semi")
  }

  /** Purged walk-forward folds with embargo (López de Prado 2018, the
    * combinatorially-purged-CV building block) — the time-series
    * upgrade of the reference's chronological holdout
    * (`backtesting_and_research/chronological_holdout.py`, our W14):
    * a plain k-fold on serially-correlated trades LEAKS — a training
    * trade whose outcome window overlaps the test block teaches the
    * model the test answer. The time axis [min ms, max ms] splits into
    * k equal-WIDTH blocks (closed-form integer arithmetic off one
    * broadcast min/max census — never a global ntile window); for fold
    * i, rows inside block i are TEST, rows within `embargoMs` of the
    * block's edges are PURGED, everything else is TRAIN.
    *
    * Scale shape: one bounds aggregation, then one projection that
    * explodes each row into its k fold roles (k is a small loud-gated
    * constant, so the blowup is a constant factor, shuffled only on
    * the k-sized fold key for the final census). All boundaries and
    * counts are exact integers. Output one row per fold: (fold,
    * test_lo_ms, test_hi_ms, n_test, n_train, n_purged). */
  def purgedFolds(df: DataFrame, tsMsCol: String, k: Int,
      embargoMs: Long): DataFrame = {
    require(k >= 2 && k <= 32, s"k must be in [2, 32]: $k")
    require(embargoMs >= 0L, s"embargoMs must be >= 0: $embargoMs")
    val ms = col(tsMsCol).cast("long")
    val base = df.where(ms.isNotNull).select(ms.as("ms"))
    val bounds = broadcast(base.agg(min(col("ms")).as("lo"),
      max(col("ms")).as("hi")))
    // equal-width blocks: width = (hi - lo) div k + 1 puts hi in the
    // last block; block boundaries are closed-form in (lo, width)
    val tagged = base.crossJoin(bounds)
      .select(col("ms"), col("lo"),
        // integer div, never a float quotient: a double (hi-lo)/k that
        // rounds across an integer boundary would shift every block
        expr(s"(hi - lo) div $k + 1").cast("long").as("w"))
      .select(col("ms"), col("lo"), col("w"),
        explode(array((0 until k).map(i => lit(i.toLong)): _*)).as("fold"))
    val testLo = col("lo") + col("fold") * col("w")
    val testHi = testLo + col("w") // exclusive
    val role = when(col("ms") >= testLo && col("ms") < testHi,
        lit("test"))
      .when(col("ms") >= testLo - embargoMs &&
        col("ms") < testHi + embargoMs, lit("purged"))
      .otherwise(lit("train"))
    tagged.select(col("fold"), testLo.as("test_lo_ms"),
        testHi.as("test_hi_ms"), role.as("role"))
      .groupBy(col("fold"), col("test_lo_ms"), col("test_hi_ms"))
      .agg(sum(when(col("role") === "test", 1L).otherwise(0L))
        .as("n_test"),
        sum(when(col("role") === "train", 1L).otherwise(0L))
          .as("n_train"),
        sum(when(col("role") === "purged", 1L).otherwise(0L))
          .as("n_purged"))
  }
}
