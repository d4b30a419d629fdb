package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding columns
  * (`array<float>`), training-data pipeline surface.
  *
  * Scale design:
  *  - brute-force cosine top-k is the CORRECTNESS baseline: a broadcast of
  *    the (small) probe set against the full corpus — one pass, no shuffle
  *    of the corpus, per-partition top-k via window rank only on the
  *    filtered candidate rows.
  *  - the scale path is LSH bucketing (random hyperplane signs): corpus and
  *    probes hash to sign-pattern buckets; candidates = bucket collisions
  *    on >= 1 of `tables` independent hash tables; exact cosine re-ranks
  *    candidates only. Hyperplanes are seeded deterministically (reference
  *    precedent: seed=42, monte_carlo_sniper.py:52).
  */
object Similarity {

  /** Cosine similarity between two array<double> columns — the codegen'd
    * [[graft.functions.FastHash.cosine]] kernel (one tight loop inside
    * whole-stage codegen). Catalyst higher-order functions are
    * CodegenFallback = interpreted, so the declarative form below is kept
    * only as the cross-check reference for tests. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.FastHash.cosine(a, b)

  /** Declarative HOF formulation (interpreted) — value-identical to
    * [[cosine]]; exists for fast-vs-declarative cross-check tests. */
  private[graft] def cosineDeclarative(a: Column, b: Column): Column = {
    val dot   = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, v) => s + v)
    val normA = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (s, v) => s + v))
    val normB = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (s, v) => s + v))
    dot / (normA * normB)
  }

  /** Brute-force top-k neighbors of each probe row. Probe side is
    * broadcast (small by contract); ties broken by corpus id for
    * determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
    val scored = c.crossJoin(broadcast(p))
      .where(col("corpus_id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("cvec"), col("pvec")))
      // zero-norm vectors produce NaN cosines, and BOTH Spark and DuckDB
      // order NaN above every number — an unguarded top-k would rank junk
      // rows first. Drop them here; at corpus scale they always exist.
      .where(!isnan(col("cos")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Hard-negative mining for contrastive training: per probe, the k
    * nearest corpus vectors whose LABEL DIFFERS from the probe's — the
    * near-miss examples a retrieval/embedding trainer wants (an
    * easy-negative random sample teaches nothing; the nearest wrong-label
    * row defines the decision boundary). The label filter runs BEFORE
    * ranking, so k stays k regardless of how label-pure the probe's
    * neighborhood is.
    *
    * Same scale shape as [[bruteForceTopK]]: probes broadcast, corpus
    * never shuffles, per-probe bounded rank. This is the exact baseline;
    * [[lshTopK]]/[[ivfTopK]] with a post-filter are the approximate
    * 100 TB path when probes stop fitting in a broadcast. */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      col(labelCol).as("neg_label"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"),
      col(labelCol).as("probe_label"))
    val scored = c.crossJoin(broadcast(p))
      .where(col("neg_label") =!= col("probe_label"))
      .withColumn("cos", cosine(col("cvec"), col("pvec")))
      .where(!isnan(col("cos")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("probe_label"), col("rank"),
        col("corpus_id"), col("neg_label"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): a hash folded into [-1, 1). */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table), lit(plane), dim, lit(42)), lit(2000000L)).cast("double")
      / lit(1000000.0d)) - lit(1.0d)

  /** Sign-random-projection LSH bucket id of a vector for one hash table:
    * `planes` sign bits packed into a long. */
  def srpBucket(vec: Column, table: Int, planes: Int): Column = {
    val bits = (0 until planes).map { pl =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(table, pl, i)),
        lit(0.0d), (s, v) => s + v)
      when(dot >= 0, lit(1L << pl)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-style ANN: corpus assigned to `nCells` deterministic centroids
    * (sampled by stable hash order — k-means init without the iteration;
    * seeded, reproducible), probes search their `nProbe` nearest cells,
    * exact cosine re-rank on the pruned candidate set. The classic
    * inverted-file trade: recall grows with nProbe, scan cost shrinks by
    * ~nProbe/nCells. Centroid table is tiny and broadcast twice (assign +
    * probe); the corpus shuffles once on cell id — the layout a 100 TB
    * vector store would be bucketed by on disk.
    */
  def ivfTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopKWith(corpus, probes, idCol, vecCol,
      seedCentroids(corpus, idCol, vecCol, nCells), k, nProbe)

  /** Deterministic IVF seed centroids: the nCells corpus vectors with the
    * smallest xxhash64(id) — a seeded sample, stable across runs. The hash
    * itself is the cell id (unique, deterministic) — consecutive numbering
    * would need an unpartitioned window for no semantic gain. Feed to
    * [[kmeansRefine]] for Lloyd iterations, or straight to
    * [[ivfTopKWith]] for the un-refined index. */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): DataFrame =
    corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
      .withColumn("_h", xxhash64(col("corpus_id"), lit(42)))
      .orderBy(col("_h"), col("corpus_id")).limit(nCells)
      .select(col("_h").as("cell"), col("cvec").as("centroid"))

  /** IVF search against a caller-supplied centroid table `(cell long,
    * centroid array<double>)` — seeded ([[seedCentroids]]) or Lloyd-refined
    * ([[kmeansRefine]]). The centroid table is tiny and broadcast twice
    * (assign + probe); the corpus shuffles once on cell id. */
  def ivfTopKWith(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    def nearestCells(df: DataFrame, vec: String, n: Int, outPrefix: String): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("_sim", cosine(col(vec), col("centroid")))
      val w = Window.partitionBy(col(s"${outPrefix}_id"))
        .orderBy(col("_sim").desc, col("cell"))
      scored.withColumn("_r", row_number().over(w)).where(col("_r") <= n)
        .drop("centroid", "_sim", "_r")
    }
    val assigned = nearestCells(c, "cvec", 1, "corpus")
    val probed = nearestCells(
      probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec")),
      "pvec", nProbe, "probe")
    val cand = assigned.join(probed, Seq("cell"))
      .where(col("corpus_id") =!= col("probe_id"))
      .dropDuplicates("probe_id", "corpus_id")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    cand.withColumn("cos", cosine(col("cvec"), col("pvec")))
      .where(!isnan(col("cos"))) // NaN sorts above 1.0 — see bruteForceTopK
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** All-corpus k-NN self-join — the semantic-dedup / clustering shape
    * where EVERY vector wants its k nearest neighbors, not just a probe
    * set. Pure composition of [[ivfTopK]] with the corpus on both sides:
    * vectors are assigned to their nearest cell once, probe nProbe cells,
    * and candidate pairs meet inside cells — the corpus shuffles on cell
    * id instead of the all-pairs O(n²) a naive self-join would do. At
    * nProbe = nCells the result is exactly the brute-force k-NN graph
    * (the q90-style saturation identity used by the oracle). */
  def knnJoin(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopK(corpus, corpus, idCol, vecCol, k, nCells, nProbe)

  /** Lloyd refinement for IVF centroids: `iters` rounds of
    * assign-to-nearest (cosine) + recompute-mean. Per round the corpus
    * does ONE map-side pass — assignment against broadcast centroids and
    * a mergeable (sum-vector, count) partial aggregate per cell — so
    * only nCells×partitions fixed-size summaries shuffle, never vectors.
    * Returns the refined centroid table (cell, centroid) for
    * [[ivfTopK]]-style assignment; empty cells keep their previous
    * centroid (the standard Lloyd degenerate-cell rule). Driver holds
    * one nCells×dim array per round — centroid state, not data.
    */
  class VecSumAgg extends org.apache.spark.sql.expressions.Aggregator[
      (Long, Array[Double]), (Array[Double], Long), Array[Double]] {
    def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
    def reduce(b: (Array[Double], Long), x: (Long, Array[Double])): (Array[Double], Long) = {
      val (acc, n) = b
      if (acc.isEmpty) (x._2.clone(), n + 1)
      else {
        var i = 0; while (i < acc.length) { acc(i) += x._2(i); i += 1 }
        (acc, n + 1)
      }
    }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0; while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    def finish(r: (Array[Double], Long)): Array[Double] =
      if (r._2 == 0) r._1 else r._1.map(_ / r._2)
    def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  def kmeansRefine(corpus: DataFrame, vecCol: String,
      init: Array[(Long, Array[Double])], iters: Int): Array[(Long, Array[Double])] = {
    require(iters >= 0 && init.nonEmpty)
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents = init
    (0 until iters).foreach { _ =>
      // assignment is a pure projection: score against every literal
      // centroid, array_max picks the best (sim, cell) struct — no join,
      // no shuffle of vectors for the assignment itself
      val scored = array(cents.map { case (id, vec) =>
        struct(cosine(col(vecCol), array(vec.map(lit): _*)).as("sim"),
          lit(id).as("cell"))
      }: _*)
      val sums = corpus
        .select(array_max(scored).as("b"), col(vecCol).as("v"))
        .where(!isnan(col("b.sim"))) // zero-norm vectors join no cell
        .select(col("b.cell").as("cell"), col("v"))
        .as[(Long, Array[Double])]
        .groupByKey(_._1)
        .agg(new VecSumAgg().toColumn.name("mean"))
        .collect().toMap
      cents = cents.map { case (cell, old) => (cell, sums.getOrElse(cell, old)) }
    }
    cents
  }

  /** Scalar int8 quantization of an embedding column — the memory-side
    * half of a 100 TB vector store (4x smaller than float32, 8x smaller
    * than the double working form; FAISS SQ8 shape). Codes are computed
    * against GLOBAL per-dimension [min, max] ranges so any two quantized
    * vectors are comparable: code = clamp(floor((x - min) / (max - min)
    * * 256), 0, 255). floor (not round) keeps the arithmetic IEEE-exact
    * cross-engine; a degenerate dimension (min = max) codes to 0.
    *
    * Scale shape: the range census is one map-side-combined (dim)-keyed
    * aggregate over posexploded vectors (fixed `dim` rows out); ranges
    * cross back as ONE broadcast array row and both encode and the
    * dequantized reconstruction are pure projections — the corpus is
    * never shuffled. Output: input id column + `codes array<int>` +
    * `recon array<double>` (dequantized to bucket midpoints) +
    * `max_abs_err double` for quantization-quality monitoring. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val dims = df.select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val ranges = dims
      .agg(expr("transform(array_sort(collect_list(struct(d, lo, hi))), s -> named_struct('lo', s.lo, 'hi', s.hi))")
        .as("rng"))
    df.select(col(idCol), col(vecCol).as("v"))
      .crossJoin(broadcast(ranges))
      .withColumn("codes", expr(
        """transform(v, (x, i) -> CASE WHEN rng[i].hi = rng[i].lo THEN 0
          |ELSE int(least(cast(255 as double),
          |  greatest(cast(0 as double),
          |    floor((x - rng[i].lo) / (rng[i].hi - rng[i].lo) * cast(256 as double))))) END)""".stripMargin))
      .withColumn("recon", expr(
        """zip_with(codes, rng, (c, r) -> CASE WHEN r.hi = r.lo THEN r.lo
          |ELSE r.lo + (cast(c as double) + cast(0.5 as double)) * (r.hi - r.lo) / cast(256 as double) END)""".stripMargin))
      .withColumn("max_abs_err", expr(
        "aggregate(zip_with(v, recon, (x, r) -> abs(x - r)), cast(0.0 as double), (m, e) -> greatest(m, e))"))
      .drop("rng")
  }

  /** Product quantization (Jégou et al. 2011) — the embedding
    * COMPRESSION primitive between [[quantizeInt8]] (per-dimension, no
    * structure) and a learned index: the vector splits into `nSub`
    * contiguous subspaces, each subspace gets a `nCodes`-entry
    * codebook, and every vector stores one code per subspace — 64
    * floats become `nSub` small ints (with 8×16 that is 256 B → 8 B,
    * the 32× shrink that lets a 100 TB embedding table's candidate
    * scan live in memory; exact re-rank reads the full vectors for
    * finalists only, the [[ivfTopK]] pattern).
    *
    * Codebooks are DETERMINISTIC for cross-engine replay: codeword j
    * of every subspace is the sub-vector of the j-th SMALLEST-id
    * corpus vector (the [[SemDedup.smallestIdCentroids]] convention;
    * the production path swaps in k-means codebooks via the same
    * table shape — [[kmeansRefine]] per subspace). Encoding is a PURE
    * projection: the codebook rides as ONE broadcast row, each vector
    * folds per subspace over its codewords (argmin L2², strictly-less
    * fold = ties to the smallest code) — the corpus is never shuffled.
    * The argmin bounds by the REALIZED codebook size (size(cb), not
    * the nCodes constant): a corpus smaller than nCodes yields a short
    * codebook and the fold must never element_at past it — with
    * spark.sql.ansi.enabled=true an out-of-range probe throws
    * INVALID_ARRAY_INDEX instead of returning null.
    *
    * Output: (id, codes array<int> in subspace order, err — the total
    * squared reconstruction error Σ_m min_j ‖v_m − c_{m,j}‖², each
    * subspace distance a pinned left-fold double an oracle replays).
    * Requires dim % nSub == 0 (refused loudly). */
  def productQuantize(corpus: DataFrame, idCol: String, vecCol: String,
      nSub: Int, nCodes: Int): DataFrame = {
    require(nSub >= 1, s"nSub must be >= 1: $nSub")
    require(nCodes >= 1, s"nCodes must be >= 1: $nCodes")
    val base = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val cb = base.orderBy(col("id")).limit(nCodes)
      .agg(expr("transform(array_sort(collect_list(struct(id, v))), s -> s.v)")
        .as("cb"))
    val dimsChk = base
      .crossJoin(broadcast(cb))
      .withColumn("__d", expr(s"""CASE WHEN size(v) % $nSub = 0
        |THEN CAST(size(v) div $nSub AS INT)
        |ELSE CAST(raise_error(concat('productQuantize: dim ',
        |  CAST(size(v) AS STRING),
        |  ' not divisible by nSub=$nSub')) AS INT) END""".stripMargin))
    // per subspace m: argmin_j Σ_i (v[m·d+i] − cb[j][m·d+i])² — the
    // distance folds dims in ascending order (one pinned double shape),
    // the argmin folds codes ascending with a STRICT improvement test
    val scored = dimsChk.withColumn("__best", expr(
      s"""transform(sequence(0, $nSub - 1), m ->
         |  aggregate(sequence(0, size(cb) - 1),
         |    named_struct('d', CAST('Infinity' AS DOUBLE), 'c', -1),
         |    (b, j) -> CASE WHEN
         |        aggregate(sequence(0, __d - 1), CAST(0.0 AS DOUBLE),
         |          (a, i) -> a +
         |            (element_at(v, m * __d + i + 1)
         |              - element_at(element_at(cb, j + 1), m * __d + i + 1))
         |            * (element_at(v, m * __d + i + 1)
         |              - element_at(element_at(cb, j + 1), m * __d + i + 1)))
         |        < b.d
         |      THEN named_struct('d',
         |        aggregate(sequence(0, __d - 1), CAST(0.0 AS DOUBLE),
         |          (a, i) -> a +
         |            (element_at(v, m * __d + i + 1)
         |              - element_at(element_at(cb, j + 1), m * __d + i + 1))
         |            * (element_at(v, m * __d + i + 1)
         |              - element_at(element_at(cb, j + 1), m * __d + i + 1))),
         |        'c', j)
         |      ELSE b END))""".stripMargin))
    scored.select(col("id"),
      expr("transform(__best, b -> b.c)").as("codes"),
      expr("""aggregate(__best, CAST(0.0 AS DOUBLE), (a, b) -> a + b.d)""")
        .as("err"))
  }

  /** LSH-bucketed ANN: candidates collide in >= 1 of `tables` SRP hash
    * tables, then exact cosine re-rank to top-k per probe. Recall grows
    * with `tables`, selectivity with `planes`.
    */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Int = 4, planes: Int = 12): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        // codegen'd kernel; bit-identical to the declarative srpBucket
        // (cross-checked in SimilaritySpec) — the fold formulation is
        // interpreted (higher-order functions are CodegenFallback) and
        // dominates wall-clock at corpus scale
        .withColumn("bk", explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"),
            graft.functions.FastHash.srpBucket(col(vec), t, planes).as("b"))): _*)))
        .select(col(id), col(vec), col("bk.t"), col("bk.b"))
    val c = bucketed(corpus, "corpus_id", "cvec")
    val p = bucketed(probes, "probe_id", "pvec")
    val cand = c.join(p, Seq("t", "b"))
      .where(col("corpus_id") =!= col("probe_id"))
      .select("probe_id", "corpus_id", "cvec", "pvec")
      .dropDuplicates("probe_id", "corpus_id")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    cand.withColumn("cos", cosine(col("cvec"), col("pvec")))
      .where(!isnan(col("cos"))) // NaN sorts above 1.0 — see bruteForceTopK
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Exact Gram matrix over the leading `dims` components of an INTEGER
    * code column (e.g. [[quantizeInt8]] output) — the one-pass distributed
    * matrix primitive behind covariance estimation, PCA/whitening prep,
    * and quantization-quality monitoring. Every upper-triangle entry
    * G[i][j] = sum over vectors of codes[i] * codes[j] is an exact BIGINT
    * (integer codes make the reduction associative — no floating-point
    * order sensitivity at any cluster size, unlike a double Gram).
    *
    * Scale shape: ONE aggregation pass computing dims*(dims+1)/2 partial
    * sums map-side (no explode — the pair grid unrolls into static agg
    * expressions, so nothing shuffles but a single combiner row per
    * partition); the unpivot to (i, j, gram) rows touches only the final
    * single row. Output: one row per upper-triangle cell with `n_vecs`. */
  /** Whole-table Gram accumulator: one flat Long array of
    * dims*(dims+1)/2 upper-triangle sums plus a trailing row count,
    * filled by a tight JVM loop per row and merged element-wise.
    * A column-expression formulation (2,080 static `sum()`s at dims=64)
    * exceeds codegen's field limits and falls back to per-expression
    * interpretation — measured 6.5 s vs ~1 s for this aggregator on the
    * same pass. Integer adds stay associative, so the result is exact
    * at any parallelism either way. */
  private class GramAgg(dims: Int) extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Int], Array[Long], Array[Long]] {
    private val np = dims * (dims + 1) / 2
    def zero: Array[Long] = new Array[Long](np + 1)
    def reduce(b: Array[Long], codes: Seq[Int]): Array[Long] = {
      if (codes != null && codes.length >= dims) {
        val c = codes.toArray
        var idx = 0
        var i = 0
        while (i < dims) {
          val ci = c(i).toLong
          var j = i
          while (j < dims) { b(idx) += ci * c(j); idx += 1; j += 1 }
          i += 1
        }
        b(np) += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < a.length) { a(k) += b(k); k += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  def integerGram(df: DataFrame, codesCol: String, dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims must be in [1,64], got $dims")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = for { i <- 0 until dims; j <- i until dims } yield (i, j)
    val np = pairs.size
    val buf = df.select(col(codesCol).cast("array<int>")).as[Seq[Int]]
      .select(new GramAgg(dims).toColumn.name("buf"))
    // unpack the single buffer row: trailing slot is the vector count,
    // linear position maps to (i, j) through a broadcast 2,080-row grid
    val grid = pairs.zipWithIndex
      .map { case ((i, j), p) => (p, i, j) }.toDF("pos", "i", "j")
    buf.select(element_at(col("buf"), np + 1).as("n_vecs"),
        posexplode(slice(col("buf"), 1, np)).as(Seq("pos", "gram")))
      .join(broadcast(grid), Seq("pos"))
      .select(col("i"), col("j"), col("gram"), col("n_vecs"))
  }

  /** Dominant principal direction of an integer code matrix: the
    * [[integerGram]] second-moment matrix (ONE distributed pass — the
    * only corpus touch) power-iterated on the driver (`iters` rounds of
    * matvec + max-|element| normalization over a dims×dims array —
    * centroid-sized state, not data, the [[kmeansRefine]] precedent).
    *
    * Every arithmetic step is deterministic and engine-replayable: Gram
    * entries are exact BIGINTs; each matvec component is a LEFT FOLD in
    * index order of correctly-rounded products; the normalizer is the
    * max-|value| component (ties to the smallest index), so the sign
    * convention is pinned (that component becomes exactly 1.0). An
    * unrolled SQL replay reproduces every double bit-for-bit.
    * Output: (d, loading) — the direction after `iters` rounds. */
  def powerIterationTop(df: DataFrame, codesCol: String, dims: Int,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters=$iters")
    val spark = df.sparkSession
    val g = Array.ofDim[Double](dims, dims)
    integerGram(df, codesCol, dims).collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = r.getLong(2).toDouble
      g(i)(j) = v; g(j)(i) = v
    }
    var v = Array.fill(dims)(1.0)
    for (_ <- 1 to iters) {
      val nv = Array.tabulate(dims) { i =>
        var s = g(i)(0) * v(0) // left fold in index order — replayable
        var j = 1
        while (j < dims) { s += g(i)(j) * v(j); j += 1 }
        s
      }
      var idx = 0
      var k = 1
      while (k < dims) { // max |value|, ties keep the smallest index
        if (math.abs(nv(k)) > math.abs(nv(idx))) idx = k
        k += 1
      }
      val scale = nv(idx)
      v = nv.map(_ / scale)
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, d) => (d.toLong, x) }.toSeq
      .toDF("d", "loading")
  }

  /** Matryoshka truncation audit: how much cosine similarity survives
    * keeping only the first k dimensions of each embedding — the
    * measurement behind "store 16 of 64 dims and re-rank with the
    * full vector" (MRL-style nested embeddings). For a vector x and
    * its zero-padded k-prefix, cos(x, x[:k]) = sqrt(Σ_{i<k} x_i² /
    * Σ x_i²) — a closed form, no pairwise search needed. Emits per
    * (k, groupCol) the count, mean and worst retained cosine.
    *
    * Scale shape: one corpus pass per nothing — all k prefixes fold
    * inside the same projection (higher-order `aggregate` over the
    * array slice, in-index-order → deterministic per row), then one
    * bounded (k × groups) aggregation. The only cross-row floats are
    * the mean's sum (round at the call site; min is order-free). */
  def truncationAudit(df: DataFrame, vecCol: String, groupCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "ks must be non-empty")
    def sqNorm(c: String): Column = expr(
      s"aggregate($c, cast(0.0 as double), (s, x) -> s + cast(x as double) * cast(x as double))")
    val withFull = df.select(col(groupCol), col(vecCol),
      sqNorm(vecCol).as("__full_sq")) // folded once, shared by every k
    val pref = ks.map(k => struct(lit(k).as("k"),
      sqrt(expr(s"aggregate(slice($vecCol, 1, $k), cast(0.0 as double), " +
        "(s, x) -> s + cast(x as double) * cast(x as double))") /
        col("__full_sq")).as("r")))
    withFull.select(col(groupCol), explode(array(pref: _*)).as("kr"))
      .groupBy(col("kr.k").as("k"), col(groupCol))
      .agg(count(lit(1)).as("n"), avg(col("kr.r")).as("avg_retained"),
        min(col("kr.r")).as("min_retained"))
  }

  /** Per-label embedding-centroid drift between two slices: the cosine
    * between each label's mean vector in slice A and slice B — the
    * "did this class's representation move between snapshots /
    * encoder versions" check an embedding-dependent pipeline (SemDeDup
    * thresholds, ANN recall targets, classifier heads) runs before
    * trusting cached vectors. Cosine(mean_a, mean_b) computed on the
    * UN-normalized dim sums (the 1/n factors cancel).
    *
    * Exactness (the q149/q172 integer-quantization move): components
    * quantize to round(x·10^scale) longs, per-(label, side, dim) sums
    * are exact integer aggregates of the posexploded components — the
    * only row×dim-scale shuffle, map-side combined, census bounded by
    * labels × dims — and the three Gram terms accumulate as DECIMAL
    * products (order-insensitive, exact). One double conversion per
    * term at the end feeds sqrt/divide in a fixed shape. Output:
    * (label, n_a, n_b, cosine); a slice with no rows or a zero
    * centroid yields null cosine. */
  /** Pairwise label-centroid cosine matrix — the class-coherence audit
    * ("which labels are semantically confusable"): every label pair's
    * centroid cosine from the SAME quantized integer dim-sum census as
    * [[centroidDrift]]. High off-diagonal cosines are label pairs a
    * classifier (or a SemDeDup threshold) will blur. Census is
    * labels × dims; the pair join is labels²-bounded — never touches
    * row scale twice. Output: (label_a, label_b, cosine), a < b. */
  def centroidSeparation(df: DataFrame, labelCol: String, vecCol: String,
      scale: Int = 6): DataFrame = {
    val census = df
      .select(col(labelCol).as("lbl"), posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("lbl"), col("dim"),
        round(col("__x").cast("double") * math.pow(10, scale)).cast("long").as("__q"))
      .groupBy(col("lbl"), col("dim"))
      .agg(sum(col("__q")).as("s"))
      .localCheckpoint(true)
    val norms = census.select(col("lbl"),
        (col("s").cast("decimal(20,0)") * col("s").cast("decimal(20,0)")).as("__sq"))
      .groupBy(col("lbl")).agg(sum(col("__sq")).as("__nn"))
    val pairs = census.select(col("lbl").as("label_a"), col("dim"), col("s").as("__sa"))
      .join(census.select(col("lbl").as("label_b"), col("dim"), col("s").as("__sb")),
        "dim")
      .where(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        (col("__sa").cast("decimal(20,0)") * col("__sb").cast("decimal(20,0)")).as("__p"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("__p")).as("__ab"))
    pairs
      .join(norms.select(col("lbl").as("label_a"), col("__nn").as("__na")), "label_a")
      .join(norms.select(col("lbl").as("label_b"), col("__nn").as("__nb")), "label_b")
      .select(col("label_a"), col("label_b"),
        when(col("__na") > 0 && col("__nb") > 0,
          col("__ab").cast("double") /
            (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
          .as("cosine"))
  }

  def centroidDrift(df: DataFrame, labelCol: String, vecCol: String,
      isB: Column, scale: Int = 6): DataFrame = {
    val census = df
      .select(col(labelCol).as("lbl"), when(isB, 1L).otherwise(0L).as("__b"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("lbl"), col("__b"), col("dim"),
        round(col("__x").cast("double") * math.pow(10, scale)).cast("long").as("__q"))
      .groupBy(col("lbl"), col("dim"))
      .agg(sum(when(col("__b") === 0L, col("__q")).otherwise(0L)).as("sa"),
        sum(when(col("__b") === 1L, col("__q")).otherwise(0L)).as("sb"))
    val gram = census.select(col("lbl"),
        (col("sa").cast("decimal(20,0)") * col("sb").cast("decimal(20,0)")).as("__ab"),
        (col("sa").cast("decimal(20,0)") * col("sa").cast("decimal(20,0)")).as("__aa"),
        (col("sb").cast("decimal(20,0)") * col("sb").cast("decimal(20,0)")).as("__bb"))
      .groupBy(col("lbl"))
      .agg(sum(col("__ab")).as("__ab"), sum(col("__aa")).as("__aa"),
        sum(col("__bb")).as("__bb"))
    val counts = df.groupBy(col(labelCol).as("lbl"))
      .agg(sum(when(isB, 0L).otherwise(1L)).as("n_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"))
    counts.join(gram, "lbl")
      .select(col("lbl").as(labelCol), col("n_a"), col("n_b"),
        when(col("__aa") > 0 && col("__bb") > 0,
          col("__ab").cast("double") /
            (sqrt(col("__aa").cast("double")) * sqrt(col("__bb").cast("double"))))
          .as("cosine"))
  }

  // --- Product quantization (Jégou, Douze & Schmid 2011, "Product
  // Quantization for Nearest Neighbor Search") --------------------------
  // The vector is split into `m` subvectors; each subspace gets its own
  // ksub-entry codebook, so a d-dim float vector compresses to m small
  // codes (here m bytes at ksub <= 256) and query distance becomes m
  // table lookups (ADC — asymmetric distance computation) instead of d
  // multiplies. The compression side of a 100 TB vector store: the codes
  // table is ~d*4/m times smaller than the float corpus, the codebook
  // rides as one broadcast row, and the ADC scan is a pure projection
  // over the codes — the natural partner of [[ivfTopKWith]]'s cell
  // pruning (IVF-PQ) and [[quantizeInt8]]'s scalar path.

  /** Deterministic PQ codebook row: the `ksub` corpus vectors with the
    * SMALLEST ids, code j = rank in that order (the SemDeDup
    * smallest-id-seed discipline — an independent engine replays the
    * exact codebook; swap in learned centroids per subspace for the
    * production path). Output: ONE row `(cb array<struct<code,v>>)`
    * sorted by code; subspace c is sliced out of the full seed vector at
    * lookup time, so the same row serves every subspace. */
  def pqCodebookRow(corpus: DataFrame, idCol: String, vecCol: String,
      ksub: Int): DataFrame = {
    require(ksub > 0, s"ksub must be positive: $ksub")
    val seeds = corpus
      .select(col(idCol).cast("long").as("sid"), col(vecCol).as("v"))
      .orderBy(col("sid")).limit(ksub)
    // bounded single-partition window: <= ksub rows after the limit
    seeds
      .withColumn("code",
        row_number().over(Window.orderBy(col("sid"))) - 1)
      .agg(array_sort(collect_list(struct(col("code"), col("v")))).as("cb"))
  }

  /** PQ-encode the corpus: per vector, `codes[s]` = the codebook entry
    * whose subspace-s slice is L2-nearest (squared; ties to the smallest
    * code — argmin over the (dist, code) struct ordering). Dimension
    * must divide evenly by `m`. Pure projection against the ONE
    * broadcast codebook row — the corpus is never shuffled, and the
    * argmin runs in the codegen'd [[graft.functions.FastHash
    * .pqCodesValue]] kernel — one tight loop per row instead of m·ksub
    * interpreted lambda frames, the per-row cost that dominates a
    * corpus-scale encode (q280 end-to-end 1.21s -> 0.86s at sf0.1,
    * where fixed overhead still floors the number). The declarative HOF
    * formulation survives as [[pqEncodeDeclarative]], cross-checked
    * bit-identical by SimilaritySpec. Output: (id, v, codes array<int>). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int, ksub: Int): DataFrame = {
    require(m > 0, s"m must be positive: $m")
    val flat = codebook.select(
      expr("flatten(transform(cb, e -> e.v))").as("__cbflat"))
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(flat))
      .withColumn("codes",
        graft.functions.FastHash.pqCodes(col("v"), col("__cbflat"), m, ksub))
      .drop("__cbflat")
  }

  /** The declarative HOF formulation of [[pqEncode]] — value-identical
    * (same fold order, same first-win tie), kept as the kernel's
    * cross-check. */
  private[graft] def pqEncodeDeclarative(corpus: DataFrame, idCol: String,
      vecCol: String, codebook: DataFrame, m: Int, ksub: Int): DataFrame = {
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(codebook))
      .withColumn("codes", expr(
        s"""transform(sequence(0, $m - 1), s ->
           |  array_min(transform(sequence(0, $ksub - 1), j -> struct(
           |    aggregate(zip_with(
           |        slice(v, s * (size(v) div $m) + 1, size(v) div $m),
           |        slice(cb[j].v, s * (size(v) div $m) + 1, size(v) div $m),
           |        (x, y) -> (x - y) * (x - y)),
           |      CAST(0.0 AS DOUBLE), (acc, e) -> acc + e) AS d,
           |    j AS j))).j)
           |""".stripMargin))
      .drop("cb")
  }

  /** ADC top-k: probes compute their m x ksub distance table against the
    * broadcast codebook once, then every corpus code word scores as m
    * table lookups summed in subspace order (exact in-order float fold).
    * The scan is exhaustive over the CODES (that is PQ's point — compose
    * with IVF cell pruning for the candidate cut); per-probe top-k via a
    * partitioned window. Output: (probe_id, corpus_id, adist, rank),
    * adist = approximate squared L2, self-pairs excluded. */
  def pqAdcTopK(encoded: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, codebook: DataFrame, m: Int, ksub: Int,
      k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
      .crossJoin(broadcast(codebook))
      .withColumn("dt", expr(
        s"""transform(sequence(0, $m - 1), s ->
           |  transform(sequence(0, $ksub - 1), j ->
           |    aggregate(zip_with(
           |        slice(pv, s * (size(pv) div $m) + 1, size(pv) div $m),
           |        slice(cb[j].v, s * (size(pv) div $m) + 1, size(pv) div $m),
           |        (x, y) -> (x - y) * (x - y)),
           |      CAST(0.0 AS DOUBLE), (acc, e) -> acc + e)))
           |""".stripMargin))
      .select(col("probe_id"), expr("flatten(dt)").as("__dtflat"))
    val scored = encoded.select(col("id").as("corpus_id"), col("codes"))
      .crossJoin(broadcast(p))
      .where(col("corpus_id") =!= col("probe_id"))
      // codegen'd m-lookup sum (FastHash.pqAdcValue) — the per-candidate
      // hot path of the exhaustive code scan; fold order matches the
      // declarative aggregate exactly
      .withColumn("adist",
        graft.functions.FastHash.pqAdc(col("codes"), col("__dtflat"), ksub))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("corpus_id"), col("adist"), col("rank"))
  }

  /** Mutual nearest neighbors between two embedding sets — the
    * alignment primitive (bilingual lexicon induction, cross-modal
    * pairing, synthetic-to-real matching): a pair (a, b) survives only
    * if b is a's top-1 AND a is b's top-1. One-sided top-1 matching
    * produces hubs (one popular b absorbs many a's); the mutuality
    * filter is the standard hub suppressor.
    *
    * Exactness: similarity is the INTEGER dot product of scale-quantized
    * vectors (long-summed in dim order — exact at any parallelism;
    * capacity: |element|·scale ≤ 10⁸ keeps a 1000-dim dot below 10¹⁹'s
    * long ceiling with 100× headroom for unit-normalized embeddings at
    * scale 1000), so both argmaxes are exact with id tiebreaks; there
    * is NO float anywhere. Long arithmetic, not decimal: the fold runs
    * inside an interpreted higher-order function, where decimal object
    * ops cost ~4× primitive longs (measured on the q320 harness,
    * 12.4 s → 3.4 s). This is the correctness baseline at bounded set
    * sizes — the scale path routes each side through [[ivfTopKWith]]
    * cells first, exactly like [[bruteForceTopK]] vs [[lshTopK]].
    *
    * Scale shape: the smaller side broadcasts (bounded-probe contract,
    * caller-enforced); scoring is a map-side projection over the larger
    * side; two k=1 window reductions on (id, best) pairs; one equi-join
    * on the mutual claim. Output: (id_a, id_b, dot) for mutual pairs
    * only. */
  def mutualNearestNeighbors(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, scale: Long = 1000L): DataFrame = {
    def q(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id),
        expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))")
          .as(vec))
    val qa = q(a, "id_a", "va")
    val qb = q(b, "id_b", "vb")
    // codegen'd exact long dot (cross-checked against the HOF in spec)
    val dot = graft.functions.FastHash.intDot(col("va"), col("vb"))
    val scored = qa.crossJoin(broadcast(qb)).withColumn("__dot", dot)
      .select(col("id_a"), col("id_b"), col("__dot"))
    val wA = Window.partitionBy(col("id_a"))
      .orderBy(col("__dot").desc, col("id_b"))
    val wB = Window.partitionBy(col("id_b"))
      .orderBy(col("__dot").desc, col("id_a"))
    val bestA = scored.withColumn("__r", row_number().over(wA))
      .where(col("__r") === 1).select(col("id_a"), col("id_b"), col("__dot"))
    val bestB = scored.withColumn("__r", row_number().over(wB))
      .where(col("__r") === 1).select(col("id_a"), col("id_b"))
    bestA.join(bestB, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("__dot").cast("long").as("dot"))
  }

  /** Simplified silhouette per cluster label (Hruschka et al. 2004's
    * centroid variant of Rousseeuw 1987) — the clustering-quality gate a
    * pipeline runs after k-means/SemDedup partitioning: per point,
    * a = squared distance to OWN centroid, b = min squared distance to
    * any OTHER centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; per label the
    * mean s, and the count with s > 0 (points closer to home than to
    * any rival).
    *
    * Exactness: vectors quantize to integers (scale 10^6); with S_jd
    * the per-label per-dim integer sums and n_j the label count, the
    * squared distance to centroid j scales to the EXACT integer
    * Σ_d (n_j·x_d − S_jd)² (decimal(38,0) — the square overflows a long
    * past ~3k·10^6-scale coordinates). The double divisions by n_j² and
    * the (b − a)/max ratio are correctly rounded from exact integers, so
    * every per-point s replays bit-identically; the per-label mean sums
    * s ROUNDED TO 12 DECIMALS as exact decimal (order-insensitive — the
    * one sum a float fold would make partition-order dependent).
    * Precondition (documented, like [[graft.operators.Autocorr]]'s):
    * n_j·|x_d|·scale must fit a long — n_j ≤ ~9·10^12/scale per label.
    *
    * Scale shape: one posexplode census for centroids (map-side partials
    * bound the exchange at k·dims rows per partition), centroids cross
    * back as a k-row BROADCAST, assignment is a pure projection — the
    * corpus is never shuffled row-scale; the final label aggregate is
    * k-bounded. Requires ≥ 2 labels (b is null otherwise and the label's
    * mean goes null, loudly). Output: (label, n, n_closer_home,
    * mean_silhouette). */
  def silhouetteByLabel(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, scale: Long = 1000000L): DataFrame = {
    val dec = "decimal(38,0)"
    val pts = df.select(col(idCol).as("id"), col(labelCol).as("lab"),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))")
        .as("xq"))
    val cent = pts.select(col("lab"), posexplode(col("xq")).as(Seq("dim", "v")))
      .groupBy(col("lab"), col("dim")).agg(sum(col("v")).as("s"))
      .groupBy(col("lab"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, s))), p -> p.s)")
        .as("cs"))
      .join(pts.groupBy(col("lab")).agg(count(lit(1)).as("n")), "lab")
      .select(col("lab").as("cand"), col("cs"), col("n"))
    val num = expr(
      s"""aggregate(zip_with(xq, cs, (xi, si) -> CAST(n * xi - si AS $dec)),
         |  CAST(0 AS $dec), (a, d) -> a + d * d)""".stripMargin)
    val dd = num.cast("double") /
      (col("n").cast(dec) * col("n").cast(dec)).cast("double")
    val ab = pts.crossJoin(broadcast(cent))
      .withColumn("__dd", dd)
      .groupBy(col("id"), col("lab"))
      .agg(min(when(col("cand") === col("lab"), col("__dd"))).as("a"),
        min(when(col("cand") =!= col("lab"), col("__dd"))).as("b"))
    val sil = when(col("b").isNotNull && greatest(col("a"), col("b")) > 0,
        (col("b") - col("a")) / greatest(col("a"), col("b")))
      .when(col("b").isNotNull, lit(0.0))
    ab.withColumn("__s", sil)
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__s") > 0, 1L).otherwise(0L)).as("n_closer_home"),
        sum(round(col("__s"), 12).cast("decimal(30,12)")).as("__ssum"))
      .select(col("lab").as("label"), col("n"), col("n_closer_home"),
        (col("__ssum").cast("double") / col("n").cast("double"))
          .as("mean_silhouette"))
  }

  /** Calinski–Harabasz index — the variance-ratio clustering score
    * next to [[silhouetteByLabel]]'s per-point read: between-centroid
    * dispersion over within-cluster dispersion,
    *   CH = (SSB/(k−1)) / (SSW/(N−k)),
    * the k-selection criterion (maximize over candidate k) that costs
    * one census instead of silhouette's point×centroid pass.
    *
    * Exactness ([[silhouetteByLabel]] quantization discipline):
    * vectors quantize to integers; per-(label, dim) (n_c, S, Q) are
    * exact decimal sums, so the per-label numerators
    *   W_c = Σ_d (n_c·Q_cd − S_cd²),
    *   B_c = Σ_d (N·S_cd − n_c·G_d)²   (G = global sum vector)
    * are EXACT; SSW = ΣW_c/n_c and SSB = ΣB_c/(n_c·N²) fold per-label
    * pinned doubles in label order over the k-bounded array. Reported
    * SSB/SSW are de-quantized by scale². Scale shape: one posexplode
    * census, k-bounded everything after. Output one row: (n, k, dims,
    * ssb, ssw, ch); ch null when k < 2, N ≤ k, or SSW = 0. */
  def calinskiHarabasz(df: DataFrame, labelCol: String, vecCol: String,
      scale: Long = 1000000L): DataFrame = {
    val dec = "decimal(38,0)"
    val pts = df.select(col(labelCol).as("lab"),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))")
        .as("xq"))
    val cd = pts.select(col("lab"), posexplode(col("xq")).as(Seq("dim", "v")))
      .groupBy(col("lab"), col("dim"))
      .agg(count(lit(1)).as("nc"), sum(col("v").cast(dec)).cast(dec).as("s"),
        sum((col("v").cast(dec) * col("v").cast(dec)).cast(dec)).cast(dec)
          .as("q"))
    val dims = cd.groupBy(col("lab")).agg(count(lit(1)).as("dims"))
    val g = cd.groupBy(col("dim")).agg(sum(col("s")).cast(dec).as("gd"),
      sum(col("nc")).as("n"))
    val joined = cd.join(broadcast(g), Seq("dim"))
    val wTerm = (col("nc").cast(dec) * col("q") - col("s") * col("s"))
      .cast(dec)
    val bTermBase = (col("n").cast(dec) * col("s") -
      col("nc").cast(dec) * col("gd")).cast(dec)
    val perLab = joined.groupBy(col("lab")).agg(
      max(col("nc")).as("nc"), max(col("n")).as("n"),
      sum(wTerm).cast(dec).as("wc"),
      sum((bTermBase * bTermBase).cast(dec)).cast(dec).as("bc"))
    def dd(c: Column): Column = c.cast("double")
    val folded = perLab
      .select(col("lab"), col("nc"), col("n"),
        (dd(col("wc")) / dd(col("nc"))).as("wt"),
        (dd(col("bc")) /
          dd((col("nc").cast(dec) * col("n").cast(dec) *
            col("n").cast(dec)).cast(dec))).as("bt"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("k"),
        sort_array(collect_list(struct(col("lab"), col("wt"), col("bt"))))
          .as("cells"))
    val ssw = aggregate(col("cells"), lit(0.0d),
      (a, x) => a + x.getField("wt"))
    val ssb = aggregate(col("cells"), lit(0.0d),
      (a, x) => a + x.getField("bt"))
    val s2 = (scale.toDouble * scale.toDouble)
    val ok = col("k") > 1L && col("n") > col("k") && col("__ssw") > 0.0
    folded.crossJoin(broadcast(dims.agg(max(col("dims")).as("dims"))))
      .withColumn("__ssw", ssw).withColumn("__ssb", ssb)
      .select(col("n"), col("k"), col("dims"),
        (col("__ssb") / lit(s2)).as("ssb"),
        (col("__ssw") / lit(s2)).as("ssw"),
        when(ok, (col("__ssb") / dd(col("k") - 1L)) /
          (col("__ssw") / dd(col("n") - col("k")))).as("ch"))
  }

  /** Davies–Bouldin index — the worst-neighbor clustering score: per
    * cluster, how confusable is it with its MOST confusable rival,
    *   DB = (1/k) Σ_c max_{c'≠c} (s_c + s_{c'}) / d(µ_c, µ_{c'}),
    * with s_c the mean point-to-own-centroid distance. Lower is
    * better; unlike [[calinskiHarabasz]] it names each cluster's
    * worst rival — the merge-candidate readout.
    *
    * Exactness: quantized integers make every per-point squared
    * distance and every centroid-pair squared distance an exact
    * integer over an exact denominator; the per-point √ is float, so
    * per-label means use the [[silhouetteByLabel]] round-12 decimal
    * sum (order-insensitive); the k² pair grid and the final fold are
    * label-ordered. Scale shape: one broadcast own-centroid pass over
    * points, then everything k- or k²-bounded. Output one row:
    * (n, k, db); db null when k < 2. */
  def daviesBouldin(df: DataFrame, labelCol: String, vecCol: String,
      scale: Long = 1000000L): DataFrame = {
    val dec = "decimal(38,0)"
    val pts = df.select(col(labelCol).as("lab"),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))")
        .as("xq"))
    val cent = pts.select(col("lab"), posexplode(col("xq")).as(Seq("dim", "v")))
      .groupBy(col("lab"), col("dim")).agg(sum(col("v")).as("s"))
      .groupBy(col("lab"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, s))), p -> p.s)")
        .as("cs"))
      .join(pts.groupBy(col("lab")).agg(count(lit(1)).as("n")), "lab")
    // per-point distance to OWN centroid: exact integer numerator
    val num = expr(
      s"""aggregate(zip_with(xq, cs, (xi, si) -> CAST(n * xi - si AS $dec)),
         |  CAST(0 AS $dec), (a, d) -> a + d * d)""".stripMargin)
    val dist = sqrt(num.cast("double")) / col("n").cast("double")
    val sPer = pts.join(broadcast(cent), Seq("lab"))
      .withColumn("__d", dist)
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("nc"),
        sum(round(col("__d"), 12).cast("decimal(30,12)")).as("__dsum"))
      .select(col("lab"), col("nc"),
        (col("__dsum").cast("double") / col("nc").cast("double"))
          .as("sc"))
    // centroid pair distances: exact numerator over (n_c n_c')
    val a = cent.select(col("lab").as("la"), col("cs").as("ca"),
      col("n").as("na"))
    val b = cent.select(col("lab").as("lb"), col("cs").as("cb"),
      col("n").as("nb"))
    val pnum = expr(
      s"""aggregate(zip_with(ca, cb, (sa, sb) -> CAST(nb * sa - na * sb AS $dec)),
         |  CAST(0 AS $dec), (acc, d) -> acc + d * d)""".stripMargin)
    val dC = sqrt(pnum.cast("double")) /
      (col("na").cast(dec) * col("nb").cast(dec)).cast(dec).cast("double")
    val pairs = a.join(broadcast(b), col("la") =!= col("lb"))
      .withColumn("__dc", dC)
      .join(broadcast(sPer.select(col("lab").as("la"),
        col("sc").as("sa"))), Seq("la"))
      .join(broadcast(sPer.select(col("lab").as("lb"),
        col("sc").as("sb"))), Seq("lb"))
      .select(col("la"),
        ((col("sa") + col("sb")) / col("__dc")).as("r"))
    val worst = pairs.groupBy(col("la")).agg(max(col("r")).as("rmax"))
    val n = pts.agg(count(lit(1)).as("n"))
    worst
      .agg(count(lit(1)).as("k"),
        sort_array(collect_list(struct(col("la"), col("rmax"))))
          .as("cells"))
      .crossJoin(broadcast(n))
      .select(col("n"), col("k"),
        when(col("k") > 1L,
          aggregate(col("cells"), lit(0.0d),
            (acc, x) => acc + x.getField("rmax")) /
            col("k").cast("double")).as("db"))
  }

  /** Pairwise cosine between group CENTROIDS — the embedding-drift
    * census: when two sources/labels/snapshots drift together or
    * apart, their mean vectors say so in labels² numbers instead of
    * rows² ("did the corpus move" next to [[meanSilhouette]]'s "are
    * the clusters tight"). Cosine of means needs no 1/n: the scale
    * cancels, so only SUM vectors matter.
    *
    * Determinism: components quantize to integers
    * (⌊x·scale + 0.5⌋ — floor is exact on every IEEE engine, no
    * round() HALF_UP seam) so per-(label, dim) sums are exact decimal
    * arithmetic at any parallelism; dot products and norms are exact
    * integer sums and the cosine is one pinned division. Quantization
    * error is bounded by dims/scale — reporting precision, not an
    * ordering hazard.
    *
    * Scale shape: one posexplode to (label, dim) censuses (map-side
    * combined), a dim-keyed join of the labels' sum vectors (labels² ×
    * dims rows — census scale), one pair aggregation. Output:
    * (label_a, label_b, n_a, n_b, cosine). */
  def centroidCosines(df: DataFrame, labelCol: String, vecCol: String,
      scale: Long = 1L << 20): DataFrame = {
    require(scale > 0L, s"scale must be positive, got $scale")
    val dec = "decimal(38,0)"
    val comp = df.where(col(vecCol).isNotNull)
      .select(col(labelCol).as("lab"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("lab"), col("dim"),
        floor(col("x").cast("double") * lit(scale.toDouble) + lit(0.5))
          .cast("long").as("qx"))
    val sums = comp.groupBy(col("lab"), col("dim"))
      .agg(sum(col("qx").cast(dec)).cast(dec).as("s"))
      .localCheckpoint(true)
    val ns = df.where(col(vecCol).isNotNull)
      .groupBy(col(labelCol).as("lab")).agg(count(lit(1L)).as("n"))
    val norms = sums.groupBy(col("lab"))
      .agg(sum((col("s") * col("s")).cast(dec)).cast(dec).as("ss"))
    val pairs = sums.select(col("lab").as("la"), col("dim"),
        col("s").as("sa"))
      .join(sums.select(col("lab").as("lb"), col("dim"),
        col("s").as("sb")), Seq("dim"))
      .where(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum((col("sa") * col("sb")).cast(dec)).cast(dec).as("dot"))
    def dd(c: Column): Column = c.cast("double")
    pairs
      .join(norms.select(col("lab").as("la"), col("ss").as("ssa")), "la")
      .join(norms.select(col("lab").as("lb"), col("ss").as("ssb")), "lb")
      .join(ns.select(col("lab").as("la"), col("n").as("n_a")), "la")
      .join(ns.select(col("lab").as("lb"), col("n").as("n_b")), "lb")
      .select(col("la").as("label_a"), col("lb").as("label_b"),
        col("n_a"), col("n_b"),
        when(col("ssa") =!= lit(0).cast(dec) &&
            col("ssb") =!= lit(0).cast(dec),
          dd(col("dot")) / (sqrt(dd(col("ssa"))) * sqrt(dd(col("ssb")))))
          .as("cosine"))
  }

  /** Gonzalez farthest-point k-center seeding (Gonzalez 1985) — the
    * 2-approximation coreset/diversity seeder: start from a pinned
    * anchor (min id), then k−1 times pick the point FARTHEST from
    * everything chosen so far. The deterministic alternative to
    * k-means++'s random D² draws, and the right seed set when the goal
    * is COVERAGE (every point within r of a center, r ≤ 2·OPT) —
    * diverse eval panels, cluster initialization, prototype selection.
    *
    * Exactness: components quantize to ⌊x·scale + 0.5⌋ longs (the
    * centroid-cosine convention), distances are exact integer squared
    * L2, argmax ties break (dist desc, id asc) — a total order both
    * engines share. The selection distances are the k-center radius
    * certificate: dist2 of seed j is the covering radius after j−1
    * centers.
    *
    * Scale shape: each of the k rounds is ONE broadcast of the freshly
    * chosen center row, a map-side least() update of the running
    * min-distance column, and a sort-limit argmax — never a points ×
    * centers join, never a global window; the running state
    * localCheckpoints per round (k plans, not a 2^k tree). Output: k
    * rows (seed_rank, id, dist2), dist2 null on the anchor. */
  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998)
    * — relevance-AND-diversity top-k, the curation move a plain
    * cosine top-k can't make (it returns k near-duplicates of the
    * best hit): greedily pick
    *   argmax λ·cos(q, v) − (1−λ)·max_{c ∈ chosen} cos(c, v),
    * ties (score desc, id asc). The retrieval-side sibling of
    * [[kCenterSeeds]] (pure diversity) and the eval-panel builder for
    * dedup-aware few-shot selection.
    *
    * Exactness: vectors and the query ride the ⌊x·scale+0.5⌋ integer
    * grid; every dot/norm is an exact long; each cosine and score is a
    * pinned double shape; λ multiplications replay. Zero-norm
    * candidates are dropped loudly upfront (cosine undefined).
    *
    * Scale shape: per round ONE broadcast of the picked row, a
    * map-side greatest() update of the running max-similarity, and a
    * sort-limit argmax — never candidates × chosen; state
    * localCheckpoints per round ([[kCenterSeeds]]'s loop). Output: k
    * rows (rank, id, rel, score). */
  /** Johnson–Lindenstrauss ±1 projection with a distortion AUDIT —
    * the dimensionality-reduction leg of the ANN scale path (project
    * 64-d to k-d before LSH/IVF and the index shrinks 4×), shipped
    * WITH the evidence that distances survived: for a pinned pair
    * sample, ratio = (‖Pa−Pb‖²/k) / ‖a−b‖² (Achlioptas 2003: E = 1),
    * reported as exact-rank deciles of the millibin census.
    *
    * Determinism: the ±1 sign matrix is md5-derived (engine-
    * replayable, the [[graft.operators.Sketches]] convention) and
    * broadcast as ONE flat array row; components ride the integer
    * grid, so every projection coordinate and squared distance is an
    * EXACT integer; the only doubles are the per-pair ratio (one
    * division) and its ⌊ratio·1000⌋ bin. Pairs with identical inputs
    * (zero denominator) are dropped and counted.
    *
    * Scale shape: projection is a map-side transform against the
    * broadcast sign row; pairing is one self-join on id+offset;
    * deciles come from [[graft.operators.Quantiles
    * .groupedQuantilesDisc]] on the bin census. Output: (p, n_pairs,
    * n_degenerate, ratio_bin). */
  def jlDistortion(df: DataFrame, idCol: String, vecCol: String,
      outDims: Int, pairOffset: Long, scale: Long = 1L << 20,
      ps: Seq[Double] = Seq(0.1, 0.5, 0.9)): DataFrame = {
    require(outDims >= 1 && pairOffset > 0, s"bad k=$outDims off=$pairOffset")
    val spark = df.sparkSession
    val quant = df.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), expr(
        s"""transform($vecCol, x ->
           |CAST(floor(CAST(x AS DOUBLE) * $scale.0D + 0.5D) AS BIGINT))"""
          .stripMargin).as("v"))
    val dIn = quant.select(size(col("v"))).limit(1)
    // md5 sign matrix, flat row-major [j * dIn + i], one broadcast row
    val signs = broadcast(spark.range(0, outDims.toLong * 4096)
      .crossJoin(broadcast(dIn.toDF("din")))
      .where(col("id") < lit(outDims) * col("din"))
      .select(col("id").as("ix"), col("din"),
        when(conv(substring(md5(concat(lit("jl:"),
          (col("id") / col("din")).cast("long").cast("string"), lit(":"),
          (col("id") % col("din")).cast("string"))), 1, 2), 16, 10)
          .cast("long") % 2 === 0L, 1L).otherwise(-1L).as("s"))
      .groupBy(col("din"))
      .agg(expr("transform(array_sort(collect_list(struct(ix, s))), e -> e.s)")
        .as("sm")))
    val projected = quant.crossJoin(signs)
      .select(col("id"), col("v"), expr(
        s"""transform(sequence(0, ${outDims - 1}), j ->
           |aggregate(sequence(1, CAST(din AS INT)), 0L,
           |  (a, i) -> a + element_at(sm, j * CAST(din AS INT) + i)
           |    * element_at(v, i)))""".stripMargin).as("p"))
      .localCheckpoint(true)
    val b = projected.select(col("id").as("idb"), col("v").as("vb"),
      col("p").as("pb"))
    val pairs = projected
      .join(b, projected("id") + pairOffset === b("idb"))
      .select(col("id"),
        expr("aggregate(zip_with(v, vb, (x, y) -> (x - y) * (x - y)), 0L, (a, t) -> a + t)")
          .as("dv"),
        expr("aggregate(zip_with(p, pb, (x, y) -> (x - y) * (x - y)), 0L, (a, t) -> a + t)")
          .as("dp"))
    val counted = pairs.agg(count(lit(1)).as("n_all"),
      sum(when(col("dv") === 0L, 1L).otherwise(0L)).as("n_degenerate"))
    val ratios = pairs.where(col("dv") > 0L)
      .select(floor((col("dp").cast("double") / lit(outDims.toDouble)) /
        col("dv").cast("double") * lit(1000.0)).cast("long").as("bin"))
      .withColumn("g", lit("all"))
    Quantiles.groupedQuantilesDisc(ratios, Seq("g"), "bin", ps)
      .crossJoin(broadcast(counted))
      .select(col("p"), (col("n_all") - col("n_degenerate")).as("n_pairs"),
        col("n_degenerate"), col("value").as("ratio_bin"))
  }

  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      lambda: Double = 0.7, scale: Long = 1L << 20): DataFrame = {
    require(k >= 1 && lambda > 0 && lambda < 1, s"bad k=$k lambda=$lambda")
    val q = broadcast(query.select(col(queryVecCol).as("qv"))
      .withColumn("ssq", expr(
        "aggregate(zip_with(qv, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .limit(1))
    val quant = df.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), expr(
        s"""transform($vecCol, x ->
           |CAST(floor(CAST(x AS DOUBLE) * $scale.0D + 0.5D) AS BIGINT))"""
          .stripMargin).as("v"))
      .withColumn("ssv", expr(
        "aggregate(zip_with(v, v, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .where(col("ssv") > 0L)
    val dotQ = expr(
      "aggregate(zip_with(v, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
    var state = quant.crossJoin(q).where(col("ssq") > 0L)
      .select(col("id"), col("v"), col("ssv"),
        (dotQ.cast("double") /
          (sqrt(col("ssv").cast("double")) * sqrt(col("ssq").cast("double"))))
          .as("rel"))
      .withColumn("ms", lit(0.0))
      .localCheckpoint(true)
    val score = (lit(lambda) * col("rel") - lit(1.0 - lambda) * col("ms"))
    var chosen: DataFrame = null
    for (rank <- 1 to k) {
      val cj = state
        .withColumn("__score", score)
        .orderBy(col("__score").desc, col("id").asc).limit(1)
        .localCheckpoint(true)
      val pick = cj.select(lit(rank).as("rank"), col("id"), col("rel"),
        col("__score").as("score"))
      chosen = if (chosen == null) pick else chosen.unionAll(pick)
      val dotP = expr(
        "aggregate(zip_with(v, pv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
      state = state
        .crossJoin(broadcast(cj.select(col("id").as("pid"),
          col("v").as("pv"), col("ssv").as("pss"))))
        .where(col("id") =!= col("pid"))
        .select(col("id"), col("v"), col("ssv"), col("rel"),
          greatest(col("ms"), dotP.cast("double") /
            (sqrt(col("ssv").cast("double")) * sqrt(col("pss").cast("double"))))
            .as("ms"))
        .localCheckpoint(true)
    }
    chosen
  }

  def kCenterSeeds(df: DataFrame, idCol: String, vecCol: String, k: Int,
      scale: Long = 1L << 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pts = df.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), expr(
        s"""transform($vecCol, x ->
           |CAST(floor(CAST(x AS DOUBLE) * $scale.0D + 0.5D) AS BIGINT))"""
          .stripMargin).as("qv"))
    val dist = expr(
      "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
    val c1 = pts.orderBy(col("id").asc).limit(1)
    var chosen = c1.select(lit(1).as("seed_rank"), col("id"),
      lit(null).cast("long").as("dist2"))
    var state = pts.crossJoin(broadcast(c1.select(col("qv").as("cv"))))
      .select(col("id"), col("qv"), dist.as("mind"))
      .localCheckpoint(true)
    for (j <- 2 to k) {
      val cj = state.orderBy(col("mind").desc, col("id").asc).limit(1)
        .localCheckpoint(true)
      chosen = chosen.unionAll(cj.select(lit(j).as("seed_rank"), col("id"),
        col("mind").as("dist2")))
      state = state.crossJoin(broadcast(cj.select(col("qv").as("cv"))))
        .select(col("id"), col("qv"),
          least(col("mind"), dist).as("mind"))
        .localCheckpoint(true)
    }
    chosen
  }

  /** Z-order (Morton) shard assignment + locality audit — the DATA
    * LAYOUT half of the ANN story: bit-interleave the first `dims`
    * quantized embedding coordinates into a Morton code and take its
    * high bits as the shard id, so vectors close in space land in the
    * same shard far more often than a hash layout — fewer shards
    * probed per query at 100 TB, same storage. The audit makes the
    * claim measurable: within-shard pairs with cosine >= tau (exact
    * integer census) under the Z-layout vs a same-shard-count md5 hash
    * layout of the same rows. Quantization bounds are per-dimension
    * min/max from ONE census aggregation (broadcast scalars — no
    * driver action, no second scan shape).
    *
    * Exactness: quantized cells are exact integers (floor of one
    * pinned double shape, clamped); the Morton interleave is integer
    * bit algebra; the audit counts are integer censuses over the
    * codegen'd cosine kernel with one pinned threshold compare.
    *
    * Scale shape: one bounds aggregation, one projection, and a
    * per-shard self-join. UNLIKE the LSH bucket joins, the shard count
    * here is a FIXED constant (2^shardBits), so per-shard membership
    * grows linearly with the corpus and uncapped pair counts grow
    * QUADRATICALLY — this is all-pairs divided by a constant, not a
    * bucket join (round-10 fix of a wrong "never all-pairs" claim).
    * `capPerShard` applies the [[Dedup.capBuckets]] discipline to the
    * shard key: shards above the cap are EXCLUDED from the pair census
    * and counted loudly in `n_shards_skipped`, bounding the join at
    * cap²·2^shardBits pairs regardless of corpus size. capPerShard ≤ 0
    * disables the cap (small fixtures / spec use only — never at
    * scale). Output: one row per layout — (layout, n_shards,
    * n_shards_skipped, n_pairs, n_close_pairs); empty pair sets report
    * (0, 0), never (0, null). */
  def zOrderLocalityAudit(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, bitsPerDim: Int, shardBits: Int,
      tauMilli: Long, capPerShard: Int = 0): DataFrame = {
    require(dims >= 1 && bitsPerDim >= 1 && dims * bitsPerDim <= 60,
      s"dims*bitsPerDim must fit a long: $dims x $bitsPerDim")
    require(shardBits >= 1 && shardBits <= dims * bitsPerDim,
      s"shardBits out of range: $shardBits")
    val levels = (1 << bitsPerDim) - 1
    val base = df.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
    val boundAggs = (1 to dims).flatMap { d =>
      Seq(min(expr(s"element_at(v, $d)")).as(s"mn$d"),
        max(expr(s"element_at(v, $d)")).as(s"mx$d"))
    }
    val bounds = broadcast(base.agg(boundAggs.head, boundAggs.tail: _*))
    // per-dim quantized cell: floor((x - mn) / (mx - mn) * levels),
    // clamped into [0, levels]; degenerate dims (mx = mn) pin to 0
    def cell(d: Int): Column = {
      val x = expr(s"element_at(v, $d)")
      val mn = col(s"mn$d")
      val mx = col(s"mx$d")
      when(mx === mn, lit(0L)).otherwise(
        least(greatest(floor((x - mn) / (mx - mn) * levels), lit(0.0)),
          lit(levels.toDouble)).cast("long"))
    }
    // Morton interleave: bit b of dim d lands at position b*dims+(d-1)
    val morton = (1 to dims).map { d =>
      (0 until bitsPerDim).map { b =>
        shiftleft(shiftright(cell(d), b).bitwiseAND(lit(1L)),
          b * dims + (d - 1))
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
    val zShard = shiftright(morton, dims * bitsPerDim - shardBits)
    val hashShard = expr(
      s"CAST(CONV(SUBSTRING(md5(CAST(id AS STRING)), 1, 12), 16, 10) " +
        s"AS BIGINT) % ${1L << shardBits}")
    val tagged = base.crossJoin(bounds)
      .select(col("id"), col("v"), zShard.as("zorder"),
        hashShard.as("hash"))
      .localCheckpoint(true)
    def audit(layout: String): DataFrame = {
      val s = tagged.select(col(layout).as("shard"), col("id"), col("v"))
      val kept = Dedup.capBuckets(s, Seq("shard"), capPerShard)
      val skipped = broadcast(
        if (capPerShard <= 0)
          df.sparkSession.range(1).select(lit(0L).as("n_shards_skipped"))
        else Dedup.skippedBuckets(s, Seq("shard"), capPerShard)
          .agg(count(lit(1)).cast("long").as("n_shards_skipped")))
      kept.alias("a").join(kept.alias("b"),
          col("a.shard") === col("b.shard") && col("a.id") < col("b.id"))
        .select((graft.functions.FastHash.cosine(col("a.v"), col("b.v"))
          * 1000 >= tauMilli).cast("long").as("close"))
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("close")), lit(0L)).as("n_close_pairs"))
        .crossJoin(broadcast(
          s.select(col("shard")).distinct().agg(count(lit(1))
            .as("n_shards"))))
        .crossJoin(skipped)
        .select(lit(layout).as("layout"), col("n_shards"),
          col("n_shards_skipped"), col("n_pairs"), col("n_close_pairs"))
    }
    audit("zorder").unionByName(audit("hash"))
  }

  /** Cell-blocked DBSCAN (Ester et al. 1996) over an IVF cell
    * assignment — the embedding-cleanup primitive [[SemDedup]] stops
    * short of: SemDeDup drops near-duplicates; DBSCAN labels DENSITY
    * structure (clusters, their borders, and noise), which is what a
    * curation pipeline thresholds to drop boilerplate clusters or keep
    * only organic neighborhoods.
    *
    * Semantics (all pinned deterministic):
    *   - neighbor: cos(a, b) >= simMin, NaN excluded, SAME CELL ONLY —
    *     this is the grid/LSH-blocked DBSCAN approximation: cross-cell
    *     eps-neighbors are not seen, exactly like the [[SemDedup]] pair
    *     stage. Cells are the recall/scale dial, not a hidden cap.
    *   - core: |N(p)| >= minPts, where the neighborhood COUNTS THE
    *     POINT ITSELF (the textbook convention).
    *   - cluster id: min node id reachable through core-core neighbor
    *     edges ([[Components.connectedComponents]] min-label fixpoint);
    *     an isolated core is its own cluster.
    *   - border: non-core with >= 1 core neighbor — attaches to the MIN
    *     cluster id among its core neighbors (a pinned choice where the
    *     textbook says "any").
    *   - noise: everything else (cluster null, row kept).
    *
    * Scale shape: one broadcast-fold assignment (zero corpus shuffle),
    * cell-keyed pair self-join with the [[SemDedup.semDedupAssigned]]
    * cap discipline (over-cap cells LOUDLY skip pair generation — their
    * members read as noise), edge-linear min-label propagation. Never
    * all-pairs across cells. Output: (id, cell, n_nbrs, is_core,
    * cluster). */
  def dbscanCells(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, simMin: Double, minPts: Int,
      maxCellSize: Int = 10000): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val assigned = SemDedup.assignCells(corpus, idCol, vecCol, centroids)
      .localCheckpoint(true)
    val inCap =
      if (maxCellSize <= 0) assigned
      else {
        val cellCounts = assigned.groupBy(col("cell"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        // ONE scalar readout serves the loud census and the
        // broadcast-safety guard (the [[SemDedup]] single-job form)
        val stats = cellCounts.agg(count(lit(1)).as("cells_total"),
          sum(when(col("n") > maxCellSize, 1L).otherwise(0L)).as("cells"),
          sum(when(col("n") > maxCellSize, col("n")).otherwise(0L))
            .as("members"))
          .head()
        if (!stats.isNullAt(2) && stats.getLong(2) > 0L)
          System.err.println(s"[dbscan] CAP CENSUS: ${stats.getLong(1)} " +
            s"cell(s) over maxCellSize=$maxCellSize totalling " +
            s"${stats.getLong(2)} members SKIP pair generation (their " +
            "members come back as noise) — raise maxCellSize or use " +
            "more cells")
        val keep = cellCounts.where(col("n") <= maxCellSize)
          .select(col("cell"))
        assigned.join(
          if (stats.getLong(0) <= 5000000L) broadcast(keep) else keep,
          Seq("cell"), "left_semi")
      }
    // eps-neighbor pairs within cell; consumed by the degree census,
    // the core-edge filter AND the border attach — checkpoint once
    val pairs = inCap.alias("a").join(inCap.alias("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("_cos", cosine(col("a.v"), col("b.v")))
      .where(!isnan(col("_cos")) && col("_cos") >= simMin)
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .localCheckpoint(true)
    val und = pairs.select(col("ia").as("id"), col("ib").as("nb"))
      .unionByName(pairs.select(col("ib").as("id"), col("ia").as("nb")))
    val flags = assigned.select(col("id"), col("cell"))
      .join(und.groupBy("id").agg(count(lit(1)).as("nnb")), Seq("id"), "left")
      .select(col("id"), col("cell"),
        (coalesce(col("nnb"), lit(0L)) + 1L).as("n_nbrs"))
      .withColumn("is_core", col("n_nbrs") >= minPts)
      .localCheckpoint(true)
    val coreIds = flags.where(col("is_core")).select(col("id"))
    val coreEdges = pairs
      .join(coreIds.select(col("id").as("ia")), Seq("ia"), "left_semi")
      .join(coreIds.select(col("id").as("ib")), Seq("ib"), "left_semi")
    val coreLab = coreIds
      .join(Components.connectedComponents(coreEdges, "ia", "ib"),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
      .localCheckpoint(true)
    val borderLab = und
      .join(coreLab.select(col("id").as("nb"), col("cluster")), Seq("nb"))
      .groupBy(col("id")).agg(min(col("cluster")).as("bcluster"))
    flags
      .join(coreLab.select(col("id"), col("cluster").as("ccl")), Seq("id"), "left")
      .join(borderLab, Seq("id"), "left")
      .select(col("id"), col("cell"), col("n_nbrs"), col("is_core"),
        when(col("is_core"), col("ccl")).otherwise(col("bcluster"))
          .as("cluster"))
  }
}
