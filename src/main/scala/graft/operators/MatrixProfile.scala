package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact matrix profile (Yeh et al. 2016) per key — the continuous
  * motif/discord primitive next to [[Sax.motifCensus]]'s discretized
  * census: for every length-`m` subsequence, the z-normalized Euclidean
  * distance to its nearest NON-TRIVIAL neighbor in the same series.
  * The profile's minima are the series' motifs (a repeated shape), its
  * maxima the discords (the subsequence unlike everything else) — the
  * anomaly read SAX words blur and a global σ-test can't localize.
  *
  * Exactness/replayability: values are exact longs; per-window μ and
  * σ² derive from exact long prefix sums in ONE pinned double shape
  * each; every pair distance folds the m z-score differences in
  * ascending offset order (left-assoc, the [[ChangePoint.pelt]] fold
  * discipline); the nearest-neighbor argmin scans j ascending with a
  * STRICT improvement test (ties to the smallest j). A cross-engine
  * oracle replays windows, folds and argmins grid-for-grid.
  *
  * Conventions, pinned: the trivial-match exclusion zone is
  * |i − j| < m (overlapping windows never match themselves — the
  * standard zone); a CONSTANT subsequence has no z-form, so pairs
  * where either σ² = 0 are skipped and a window with no comparable
  * neighbor reports null (rows kept). Per-key work is Θ(K²·m) for
  * K = n − m + 1 windows — `maxN` gates the series length LOUDLY
  * (the [[graft.operators.Divergence.fisherExact]] discipline);
  * period-census grain is the intended input. Output per window:
  * (key, idx, ord, mp — the z-distance — and mp_idx, the neighbor's
  * window index). */
object MatrixProfile {

  def matrixProfile(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, m: Int, maxN: Int = 2000): DataFrame = {
    require(m >= 2, s"m must be >= 2: $m")
    require(maxN >= m + 1, s"maxN must exceed m: $maxN vs $m")
    require(!df.schema(ordCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"matrixProfile: ordCol '$ordCol' is ${df.schema(ordCol).dataType}" +
        " — ord values compare AS STRINGS; format to ISO labels first")
    val base = df.select(col(keyCol).as("k"),
      col(ordCol).cast("string").as("o"), col(valueCol).cast("long").as("x"))
    val g = base.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sort_array(collect_list(struct(col("o"), col("x")))).as("cells"))
      .where(col("n") >= (m + 1).toLong)
      .withColumn("n", when(col("n") <= lit(maxN.toLong), col("n"))
        .otherwise(raise_error(concat(lit("matrixProfile: series length "),
          col("n").cast("string"),
          lit(s" exceeds maxN=$maxN — the profile is quadratic in " +
            "windows per key; aggregate coarser or raise the cap " +
            "knowingly")))))
    // exact prefix sums (index 0 = empty prefix) and per-window moments:
    // mu = S1Δ/m, var = S2Δ/m − mu² — each ONE pinned double shape
    val prepped = g
      .withColumn("s1", expr(
        """aggregate(cells, array(0L),
          |  (acc, e) -> concat(acc, array(element_at(acc, -1) + e.x)))"""
          .stripMargin))
      .withColumn("s2", expr(
        """aggregate(cells, array(0L),
          |  (acc, e) -> concat(acc, array(element_at(acc, -1) + e.x * e.x)))"""
          .stripMargin))
      .withColumn("kw", expr(s"CAST(n AS INT) - $m + 1"))
      .withColumn("mus", expr(
        s"""transform(sequence(1, kw), i ->
           |  CAST(element_at(s1, i + $m) - element_at(s1, i) AS DOUBLE)
           |    / CAST($m AS DOUBLE))""".stripMargin))
      .withColumn("vars", expr(
        s"""transform(sequence(1, kw), i ->
           |  CAST(element_at(s2, i + $m) - element_at(s2, i) AS DOUBLE)
           |    / CAST($m AS DOUBLE)
           |  - element_at(mus, i) * element_at(mus, i))""".stripMargin))
    // z-distance² between windows i and j, folded in offset order; the
    // shape is shared textually by the min fold and its oracle replay
    val d2 =
      s"""aggregate(sequence(0, $m - 1), CAST(0.0 AS DOUBLE),
         |  (a, t) -> a +
         |    ((CAST(element_at(cells, i + t).x AS DOUBLE)
         |        - element_at(mus, i)) / sqrt(element_at(vars, i))
         |     - (CAST(element_at(cells, j + t).x AS DOUBLE)
         |        - element_at(mus, j)) / sqrt(element_at(vars, j)))
         |    * ((CAST(element_at(cells, i + t).x AS DOUBLE)
         |        - element_at(mus, i)) / sqrt(element_at(vars, i))
         |     - (CAST(element_at(cells, j + t).x AS DOUBLE)
         |        - element_at(mus, j)) / sqrt(element_at(vars, j))))"""
        .stripMargin
    val rows = prepped
      .withColumn("i", explode(expr("sequence(1, kw)")))
      .withColumn("__best", expr(
        s"""aggregate(sequence(1, kw),
           |  named_struct('d', CAST('Infinity' AS DOUBLE), 'j', -1),
           |  (b, j) -> CASE
           |    WHEN abs(j - i) < $m THEN b
           |    WHEN element_at(vars, i) <= CAST(0.0 AS DOUBLE)
           |      OR element_at(vars, j) <= CAST(0.0 AS DOUBLE) THEN b
           |    WHEN $d2 < b.d THEN named_struct('d', $d2, 'j', j)
           |    ELSE b END)""".stripMargin))
    rows.select(col("k").as(keyCol), col("i").as("idx"),
      expr("element_at(cells, i).o").as("ord"),
      when(col("__best.j") >= 1,
        sqrt(greatest(col("__best.d"), lit(0.0)))).as("mp"),
      when(col("__best.j") >= 1, col("__best.j")).as("mp_idx"))
  }
}
