package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-style SEMANTIC deduplication over an embedding column
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): cluster the embedding space, then
  * drop every vector that has an earlier (smaller-id) same-cluster
  * neighbor with cosine >= threshold. Near-duplicate MEANING — not
  * near-duplicate text — which catches paraphrases and templated rewrites
  * that MinHash/SimHash ([[Dedup]]) cannot see.
  *
  * Scale design — the whole point of the clustering step:
  *  - pairwise cosine is only computed WITHIN a cluster, so the quadratic
  *    all-pairs cost becomes sum(c_i^2) over cluster sizes — with k
  *    balanced cells that is n^2/k, and the shuffle key is the cell id,
  *    never the vector.
  *  - cluster ASSIGNMENT is a pure projection: the centroid table rides
  *    as ONE broadcast array row and each vector folds over it for its
  *    argmax cosine — the corpus is NOT shuffled to be assigned.
  *  - degenerate cells (a mass of identical embeddings — the pathology
  *    exact-dedup pre-passes exist for) are capped by `maxCellSize`, same
  *    census-able guard semantics as the LSH bucket cap in [[Dedup]]:
  *    over-cap cells skip pair generation (all members kept) and
  *    [[oversizedCells]] reports what was skipped.
  */
object SemDedup {

  /** The cell-count scaling rule, made executable so callers don't pin
    * a fixed nCells and ride the quadratic: k = clamp(n/1000, 16, 2^20).
    * Rationale — within-cell pair work is Σc_i² ≈ n²/k, so holding k
    * FIXED while the corpus grows is quadratic in n; growing k ∝ n
    * (1000-member target cells, the SemDeDup paper's order) keeps the
    * pair stage linear at ~1000·n cosine evaluations. The cost that
    * grows instead is ASSIGNMENT: Θ(n·k) flat, Θ(n·√k) two-level — so
    * with k ∝ n the end-to-end bound is Θ(n^1.5) on the hierarchical
    * path (documented in BASELINE.md §D with the 10× receipts; a
    * log-depth centroid tree would reach n·log n but compounds the
    * boundary approximation per level). The 2^20 clamp is the point
    * where a centroid BROADCAST (k·dim doubles) stops being small —
    * past it, shard the corpus and semDedup per shard. */
  def recommendedCells(corpusSize: Long): Int =
    math.min(math.max(corpusSize / 1000L, 16L), 1L << 20).toInt

  /** Deterministic, cross-engine-replayable centroid seeds: the `nCells`
    * corpus vectors with the SMALLEST ids, cell id = seed's vector id.
    * (The production path feeds [[Similarity.kmeansRefine]] output — or
    * any learned centroid table — to [[semDedupWith]]; smallest-id seeds
    * exist so an independent engine can replay the exact clustering.) */
  def smallestIdCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): DataFrame =
    corpus.select(col(idCol).cast("long").as("cell"), col(vecCol).as("centroid"))
      .orderBy(col("cell")).limit(nCells)

  /** Assign each vector its argmax-cosine cell (tie -> smallest cell id;
    * all-NaN cosines -> null cell, row kept). Pure projection: centroids
    * collapse to one broadcast array row sorted by cell id, each vector
    * folds over it — zero shuffle of the corpus. Output: input columns
    * renamed (id, v) plus `cell`. */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cents = centroids
      .agg(array_sort(collect_list(struct(col("cell"), col("centroid")))).as("cents"))
    // argmax by (cos, -cell): max over the struct ordering = highest
    // cosine, ties to the smallest cell (the q127 negate-for-tiebreak
    // idiom). Zero-norm vectors produce an INVALID cosine — NaN under
    // IEEE division, but NULL under Spark's non-ANSI divide-by-zero —
    // so both shapes are filtered before the max (a null field would
    // otherwise sort LOWEST inside the struct ordering and silently win
    // single-element arrays).
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cents))
      .withColumn("_scored", transform(col("cents"), c =>
        struct(cosine(col("v"), c.getField("centroid")).as("cos"),
          (-c.getField("cell")).as("nc"))))
      .withColumn("_best", array_max(filter(col("_scored"),
        s => s.getField("cos").isNotNull && !isnan(s.getField("cos")))))
      .select(col("id"), col("v"), (-col("_best.nc")).as("cell"))
  }

  /** The codegen'd cosine kernel ([[Similarity.cosine]]) — one tight
    * loop, bit-identical to the declarative HOF formulation and to the
    * DuckDB list_aggregate replay (q83/q127 precedent). Works inside the
    * assignment lambda too: transform() is CodegenFallback, and the
    * kernel's interpreted eval is still one array loop instead of three
    * nested HOF folds — the pairwise stage measured 5x faster at sf0.1
    * with the kernel. Zero-norm vectors yield NaN here (IEEE) but NULL
    * from Spark's non-ANSI divide in the declarative form; callers guard
    * both. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.FastHash.cosine(a, b)

  /** Census of cells [[semDedupWith]]'s `maxCellSize` would skip —
    * the "what did the guard drop" log (cf. [[Dedup.skippedBuckets]]). */
  def oversizedCells(assigned: DataFrame, maxCellSize: Int): DataFrame =
    assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxCellSize)

  /** Cell count above which [[semDedupWith]] routes assignment through
    * the two-level [[assignCellsHierarchical]] path by default. The
    * SemDeDup recipe grows cells ∝ corpus (to keep within-cell pair
    * work n²/k linear), so the flat rows × cells fold is the hidden
    * quadratic — at 256+ cells the two-level fold (branch + cells/branch
    * per row, branch ≈ √cells) is already ~8× fewer cosine evaluations
    * per row and the gap widens with k. Below the cap the flat path is
    * both exact-argmax and cheaper (no routing pre-pass). */
  val FlatCellCap: Int = 256

  /** SemDeDup with a caller-supplied centroid table `(cell long,
    * centroid array<double>)`. Returns (id, cell, kept): kept = false iff
    * some same-cell vector with a smaller id has cosine >= threshold.
    * Pairs meet by an equi-join on the cell id — both self-join sides
    * hash-partition the (id, v, cell) rows on `cell` (identical
    * exchanges, so AQE can reuse the materialized stage at runtime; the
    * static plan shows two).
    *
    * Assignment auto-dispatches on the centroid count: ≤ `flatCellCap`
    * cells take the exact flat argmax fold; above it the two-level
    * [[assignCellsHierarchical]] routing (branch ≈ √cells) caps the
    * per-row fold cost — the scale default, with the documented
    * boundary approximation. Because the two paths can assign boundary
    * rows to different cells (different kept/dropped sets), the
    * dispatch is NEVER silent: the chosen path, centroid count, and
    * branch factor are logged at WARN on every call, and callers who
    * need the exact flat argmax at any k pin it with
    * `flatCellCap = Int.MaxValue` (which also skips the dispatch
    * count). The dispatch cost is ONE bounded job on the centroid
    * table (a count at cell grain — centroid tables are k rows by
    * construction), run once and reused for the branch factor. */
  def semDedupWith(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      maxCellSize: Int = 10000, flatCellCap: Int = FlatCellCap): DataFrame = {
    val k = if (flatCellCap == Int.MaxValue) -1L else centroids.count()
    if (k <= flatCellCap) {
      if (flatCellCap != Int.MaxValue) log.warn(
        s"semDedupWith: FLAT exact-argmax assignment (k=$k cells <= " +
          s"flatCellCap=$flatCellCap)")
      semDedupAssigned(assignCells(corpus, idCol, vecCol, centroids),
        threshold, maxCellSize)
    } else {
      val branch = math.max(4, math.sqrt(k.toDouble).round.toInt)
      log.warn(s"semDedupWith: HIERARCHICAL two-level assignment " +
        s"(k=$k cells > flatCellCap=$flatCellCap, branch=$branch) — " +
        "approximate cell boundaries; pass flatCellCap=Int.MaxValue " +
        "for the exact flat argmax")
      semDedupHierarchical(corpus, idCol, vecCol, centroids, branch,
        threshold, maxCellSize)
    }
  }

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.operators.SemDedup")

  /** Two-level cell assignment for centroid tables too large to fold
    * per row. [[assignCells]] is rows × cells work — with cell count
    * growing alongside the corpus (the SemDeDup recipe: cells ∝ n to
    * keep within-cell pair work n²/k linear), flat assignment is the
    * hidden QUADRATIC term — the scale-bench's 10×-data run measured
    * ~5× time on the flat path, the n·k product surfacing. Here: the
    * `branch` smallest-id centroids act
    * as a coarse level; every centroid routes to its argmax coarse
    * (exact, branch-wide fold), rows fold over the coarse row then only
    * over that group's members — rows × (branch + cells/branch) at
    * branch ≈ √cells, the IVF/hierarchical-k-means move.
    *
    * Semantics: an APPROXIMATION of flat argmax (a row may land in a
    * neighboring cell when its best centroid routed to a different
    * coarse group than the row picks) — same within-cell dedup
    * guarantees, slightly different cell boundaries; exact duplicates
    * still co-assign (identical vectors take identical folds, and both
    * levels break cosine ties toward the smaller id consistently, so
    * duplicate coarse seeds collapse the same way on both paths).
    * Zero-norm rows keep the null-cell contract. */
  def assignCellsHierarchical(corpus: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, branch: Int): DataFrame = {
    require(branch > 0, s"branch must be positive: $branch")
    val coarse = centroids.orderBy(col("cell")).limit(branch)
      .select(col("cell").as("coarse"), col("centroid").as("cvec"))
    val routed = assignCells(
        centroids.select(col("cell").as("id"), col("centroid").as("v")),
        "id", "v",
        coarse.select(col("coarse").as("cell"), col("cvec").as("centroid")))
      .select(col("cell").as("coarse"), col("id").as("cell"),
        col("v").as("centroid"))
    val groups = routed.groupBy(col("coarse"))
      .agg(array_sort(collect_list(struct(col("cell"), col("centroid"))))
        .as("cents"))
    assignCells(corpus, idCol, vecCol,
        coarse.select(col("coarse").as("cell"), col("cvec").as("centroid")))
      .select(col("id"), col("v"), col("cell").as("coarse"))
      .join(broadcast(groups), Seq("coarse"), "left")
      .withColumn("_scored", transform(col("cents"), c =>
        struct(cosine(col("v"), c.getField("centroid")).as("cos"),
          (-c.getField("cell")).as("nc"))))
      .withColumn("_best", array_max(filter(col("_scored"),
        s => s.getField("cos").isNotNull && !isnan(s.getField("cos")))))
      .select(col("id"), col("v"), (-col("_best.nc")).as("cell"))
  }

  /** LOG-DEPTH centroid-tree assignment — the Θ(n·f·log_f k) path the
    * two-level [[assignCellsHierarchical]] (Θ(n·√k)) gives up past
    * ~10⁶ cells: the centroid table is coarsened into a ladder of
    * smallest-id seed levels (each level ceil(prev/fanout) seeds, so
    * depth = ceil(log_f k)), every level's members route to their
    * argmax parent, and corpus rows DESCEND the ladder folding over
    * one ≤corpus/seeds-bounded child group per level — per-row cost
    * fanout·depth instead of √k. With k ∝ n (the
    * [[recommendedCells]] rule) end-to-end SemDeDup becomes
    * Θ(n log n); BASELINE.md §D carries the receipts.
    *
    * Semantics: the [[assignCellsHierarchical]] approximation
    * COMPOUNDED once per level (a boundary row can fall into a
    * neighboring subtree at each routing) — same within-cell dedup
    * guarantees, slightly different cell boundaries; exact duplicates
    * still co-assign (identical folds, identical smallest-tie rule at
    * every level), and fanout >= k degenerates to the EXACT flat
    * argmax (one level, no descent — the spec pins the identity).
    * Zero-norm rows keep the null-cell contract through every level.
    *
    * Model-state discipline: the ladder is centroid-grain (k rows
    * total across levels, log_f k bounded driver actions to size it);
    * per-level child groups broadcast. */
  def assignCellsTree(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, fanout: Int = 16): DataFrame = {
    require(fanout >= 2, s"fanout must be >= 2: $fanout")
    var levels = List(centroids
      .select(col("cell"), col("centroid")).localCheckpoint(true))
    var size = levels.head.count()
    while (size > fanout) {
      val nSeeds = math.ceil(size.toDouble / fanout).toInt
      val seeds = levels.head.orderBy(col("cell")).limit(nSeeds)
        .localCheckpoint(true)
      levels = seeds :: levels
      size = nSeeds.toLong
    }
    // one descent step: (id, v, __p) rows fold over their __p parent's
    // child group — shared by the ladder build and the corpus descent
    def step(cur: DataFrame, groups: DataFrame): DataFrame =
      cur.join(broadcast(groups), Seq("__p"), "left")
        .withColumn("_scored", transform(col("cents"), c =>
          struct(cosine(col("v"), c.getField("centroid")).as("cos"),
            (-c.getField("cell")).as("nc"))))
        .withColumn("_best", array_max(filter(col("_scored"),
          s => s.getField("cos").isNotNull && !isnan(s.getField("cos")))))
        .select(col("id"), col("v"), (-col("_best.nc")).as("__p"))
    val root = levels.head
    // build each transition's parent→children group table by routing
    // the lower level's members DOWN the ladder prefix built so far —
    // NOT flat against the full upper level: flat routing is
    // Σ m_i·m_{i-1} = Θ(k²/f) cosines (at k = 3·10⁴ it was 5.6·10⁷
    // evals and the reason the r11 tree LOST to two-level at high k);
    // descent is Σ m_i·f·depth_i = Θ(k·f·log_f k). Depth-2 ladders
    // (one transition) are unchanged — the prefix is just the root.
    var groupTables = List.empty[DataFrame] // deepest-first
    for (lower <- levels.tail) {
      var c = assignCells(
          lower.select(col("cell").as("id"), col("centroid").as("v")),
          "id", "v", root)
        .select(col("id"), col("v"), col("cell").as("__p"))
      groupTables.reverse.foreach { g => c = step(c, g) }
      val groups = c
        .select(col("__p"), col("id").as("cell"), col("v").as("centroid"))
        .groupBy(col("__p"))
        .agg(array_sort(collect_list(struct(col("cell"), col("centroid"))))
          .as("cents"))
        .localCheckpoint(true) // read by every deeper build + the corpus
      groupTables = groups :: groupTables
    }
    var cur = assignCells(corpus, idCol, vecCol, root)
      .select(col("id"), col("v"), col("cell").as("__p"))
    groupTables.reverse.foreach { g => cur = step(cur, g) }
    cur.select(col("id"), col("v"), col("__p").as("cell"))
  }

  /** [[semDedupWith]] on the log-depth tree assignment — the
    * million-cell scale path. */
  def semDedupTree(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, fanout: Int, threshold: Double,
      maxCellSize: Int = 10000): DataFrame =
    semDedupAssigned(
      assignCellsTree(corpus, idCol, vecCol, centroids, fanout),
      threshold, maxCellSize)

  /** [[semDedupWith]] on the two-level assignment — the large-cell-count
    * scale path. */
  def semDedupHierarchical(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, branch: Int, threshold: Double,
      maxCellSize: Int = 10000): DataFrame =
    semDedupAssigned(
      assignCellsHierarchical(corpus, idCol, vecCol, centroids, branch),
      threshold, maxCellSize)

  /** The pair stage of [[semDedupWith]] over a pre-assigned
    * (id, v, cell) table — shared by the flat and hierarchical
    * assignment paths.
    *
    * The input is EAGER-checkpointed first: it appears three times
    * downstream (both sides of the cell-keyed self-join plus the final
    * kept-join), and without the cut each appearance re-runs the full
    * rows × cells assignment fold — the dominant term once cell counts
    * grow with the corpus (the r10 scale receipts' superlinearity was
    * mostly this 3× re-fold, not pair work). Eager because the
    * assignment subtree carries a broadcast (the centroid row) — the
    * lazy-checkpoint/broadcast deadlock class. */
  def semDedupAssigned(assigned0: DataFrame, threshold: Double,
      maxCellSize: Int = 10000): DataFrame = {
    val assigned = assigned0.localCheckpoint(true)
    val inCap =
      if (maxCellSize <= 0) assigned
      else {
        // LOUD cap census (the no-silent-caps discipline, cf.
        // [[Dedup.capBuckets]]): an over-cap cell skips the pair stage
        // entirely — every member comes back kept=true — so the skip
        // must be visible at run time, not only via an [[oversizedCells]]
        // query nobody issued. ONE cell-grain count pass serves both the
        // census and the cap filter (r13, the r12 VERDICT's q130/q139
        // finding: the census used to be its own full aggregation job
        // over `assigned` ON TOP of a window exchange inside the pair
        // stage — folded, the census reads the tiny cell-grain frame and
        // the cap filter rides it as a broadcast semi-join, so `assigned`
        // is scanned once and never re-shuffled by cell here). The
        // cell-grain frame is bounded by nCells (a user parameter ≪
        // corpus), hence broadcastable by construction. NOTE the r11
        // default change 100000 -> 10000: default-arg callers with
        // 10k-100k-member cells now skip those cells — this census is
        // where that shows up.
        val cellCounts = assigned.groupBy(col("cell"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        // ONE scalar readout over the tiny cell frame serves the loud
        // census AND the broadcast-safety guard (every extra driver
        // action is a whole fixed-latency job — the q130-class cost)
        val stats = cellCounts.agg(count(lit(1)).as("cells_total"),
          sum(when(col("n") > maxCellSize, 1L).otherwise(0L)).as("cells"),
          sum(when(col("n") > maxCellSize, col("n")).otherwise(0L))
            .as("members"))
          .head()
        if (!stats.isNullAt(2) && stats.getLong(2) > 0L)
          System.err.println(s"[semdedup] CAP CENSUS: ${stats.getLong(1)} " +
            s"cell(s) over maxCellSize=$maxCellSize totalling " +
            s"${stats.getLong(2)} members SKIP pair generation " +
            "(all their members kept) — raise maxCellSize or pre-split " +
            "with an exact-dedup pass")
        // cells are bounded by nCells (a user parameter), but guard
        // the broadcast against a pathological realized count anyway:
        // past the cap the semi-join falls back to a shuffle, never a
        // driver OOM
        val keep = cellCounts.where(col("n") <= maxCellSize)
          .select(col("cell"))
        assigned.join(
          if (stats.getLong(0) <= 5000000L) broadcast(keep) else keep,
          Seq("cell"), "left_semi")
      }
    val drops = inCap.alias("a").join(inCap.alias("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("_cos", cosine(col("a.v"), col("b.v")))
      .where(!isnan(col("_cos")) && col("_cos") >= threshold)
      .select(col("b.id").as("id")).distinct()
    assigned.join(drops.withColumn("_drop", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(!col("_drop"), lit(true)).as("kept"))
  }

  /** SemDeDup with the replayable smallest-id seed clustering. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, threshold: Double, maxCellSize: Int = 10000): DataFrame =
    semDedupWith(corpus, idCol, vecCol,
      smallestIdCentroids(corpus, idCol, vecCol, nCells), threshold, maxCellSize)
}
