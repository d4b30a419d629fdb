package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction by iterative peeling — the graph-density filter
  * next to [[Graph]] PageRank and [[Triangles]]: the k-core is the
  * maximal subgraph where every node keeps >= k neighbors, the
  * standard "structurally engaged" cut (spam rings and drive-by nodes
  * fall out; the community scaffold stays). Each round removes every
  * node whose CURRENT degree is below k and re-derives degrees on the
  * survivor subgraph; the fixpoint is the k-core (order of removal
  * provably cannot change it, so the per-round batch peel is exact).
  *
  * Scale shape: a round is one degree aggregation + two hash
  * anti-joins on node keys — no adjacency lists, no per-node state
  * beyond a count, hub-safe by construction. Round COUNT is the
  * peeling depth of the graph, not its diameter: bounded by
  * max-degree in practice but O(n) on adversarial paths — `maxIter`
  * fails LOUDLY on overrun ([[Components.connectedComponents]]
  * contract) rather than returning a half-peeled subgraph.
  * Per-round `localCheckpoint` truncates the growing lineage; the
  * round's one action (the removal count) materializes it.
  */
object KCore {

  /** Nodes of the k-core of the undirected graph (`uCol`, `vCol`) —
    * self-loops dropped, duplicates/direction collapsed, ids widened to
    * long — with their within-core degree. Empty output = the graph has
    * no k-core. */
  def kCore(edges: DataFrame, uCol: String, vCol: String, k: Int,
      maxIter: Int = 50, edgesCanonical: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // edgesCanonical: see [[canon]] — skips the dedup exchange (the
    // doubled-orientation union below checkpoints either way: it is
    // the loop invariant every peel round re-reads)
    val e1 = edges
      .select(least(col(uCol), col(vCol)).cast("long").as("u"),
        greatest(col(uCol), col(vCol)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val e0 = if (edgesCanonical) e1 else e1.distinct()
    var ed = e0.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e0.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val low = deg.where(col("deg") < k).select(col("src").as("n"))
        .localCheckpoint(true)
      if (low.count() == 0L) converged = true
      else {
        ed = ed
          .join(low.withColumnRenamed("n", "src"), Seq("src"), "left_anti")
          .join(low.withColumnRenamed("n", "dst"), Seq("dst"), "left_anti")
          .localCheckpoint(true)
        iter += 1
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore(k=$k) did not converge in $maxIter peel rounds " +
          "(peeling depth exceeds maxIter — raise it)")
    ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** Canonicalize to u < v undirected edges. */
  /** `canonical = true` (r14): the caller certifies the edge list is
    * already duplicate-free under the (least, greatest)
    * canonicalization and materialized upstream (e.g. a
    * [[graft.queries.GraphStages]] snapshot) — the dedup exchange is
    * skipped; the exchange-free canonicalization and null/self-loop
    * filters always run. */
  private def canon(edges: DataFrame, uCol: String, vCol: String,
      canonical: Boolean = false): DataFrame = {
    val e = edges.select(least(col(uCol), col(vCol)).cast("long").as("u"),
        greatest(col(uCol), col(vCol)).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull &&
        col("v").isNotNull)
    if (canonical) e else e.distinct()
  }

  /** Per-edge triangle support — DELEGATES to [[Triangles.support]]
    * (degree-ordered orientation + sorted-adjacency intersection, the
    * O(√2m)-wedge-capped kernel; zero-filled over the full edge set).
    * One support census serves both the truss peel here and
    * [[Triangles.perNode]] — the r12 consolidation of what were two
    * independent k-truss codebases (the id-ordered wedge self-join
    * that used to live here materialized Σ outdeg² wedge rows per
    * round; the shared kernel never does). Input must be canonical
    * AND checkpointed (consumed several times downstream). */
  private def support(e: DataFrame): DataFrame = Triangles.support(e)

  /** One truss peel: drop every edge in fewer than k−2 triangles of
    * the CURRENT subgraph (support is zero-filled, so triangle-free
    * edges carry sup = 0 and fall to the k ≥ 3 bound). */
  private def peelOnce(e: DataFrame, k: Int): DataFrame =
    support(e).where(col("sup") >= (k - 2).toLong)
      .select(col("u"), col("v"))

  /** k-truss by iterative support peeling — [[kCore]]'s TRIANGLE
    * sibling (Cohen 2008): the maximal subgraph where every edge sits
    * in >= k−2 triangles. Degree is gameable (a spam hub buys
    * followers); co-triangle membership is not — the k-truss is the
    * standard "socially corroborated" cut, strictly inside the
    * (k−1)-core. Batch removal per round is exact (removal order
    * cannot change the fixpoint, the [[kCore]] argument lifted to
    * edges).
    *
    * Scale shape per round: one degree-ordered orientation +
    * sorted-adjacency intersection (each triangle enumerated once at
    * its order-minimal pivot, every out-degree O(√2m)-capped — the
    * [[Triangles]] kernel) + an edge-keyed census + one filter —
    * nothing quadratic in nodes; round count is the truss peeling
    * depth, `maxIter` fails LOUDLY on overrun. Output: surviving
    * canonical edges with their FINAL-subgraph support: (u, v, sup).
    * Empty output = no k-truss. */
  def kTruss(edges: DataFrame, uCol: String, vCol: String, k: Int,
      maxIter: Int = 30, edgesCanonical: Boolean = false): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k-2 triangles per edge): $k")
    // edgesCanonical: see [[canon]]. Convergence bookkeeping carries the
    // PREVIOUS round's count in a driver var (r14): the old shape ran
    // three actions per round (next.count, e.count re-read, isEmpty) —
    // the trussDecomposition one-count discipline applied here.
    var e = if (edgesCanonical) canon(edges, uCol, vCol, canonical = true)
      else canon(edges, uCol, vCol).localCheckpoint(true)
    var nE = e.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = peelOnce(e, k).localCheckpoint(true)
      val nNext = next.count()
      if (nNext == nE || nNext == 0L) converged = true
      e = next
      nE = nNext
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kTruss(k=$k) did not converge in $maxIter peel rounds " +
          "(truss peeling depth exceeds maxIter — raise it)")
    support(e) // already zero-filled over the surviving edge set
  }

  /** Exactly `rounds` truss peels, NO convergence check — the
    * deterministic-round variant a cross-engine oracle unrolls
    * CTE-for-CTE ([[kTruss]] is the fixpoint API; this is the
    * replayable one — same per-round function). Support in the output
    * is recomputed on the FINAL subgraph. */
  def kTrussPeel(edges: DataFrame, uCol: String, vCol: String, k: Int,
      rounds: Int, edgesCanonical: Boolean = false): DataFrame = {
    require(k >= 3, s"k must be >= 3: $k")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    // edgesCanonical: see [[canon]] — skips the dedup exchange and the
    // then-redundant initial checkpoint (input already materialized)
    var e = if (edgesCanonical) canon(edges, uCol, vCol, canonical = true)
      else canon(edges, uCol, vCol).localCheckpoint(true)
    for (_ <- 1 to rounds)
      e = peelOnce(e, k).localCheckpoint(true)
    support(e) // zero-filled: post-peel support CAN be < k−2 here
  }

  /** Truss DECOMPOSITION — every edge's trussness in one ascending
    * sweep: trussness(e) = the max k such that e survives the k-truss,
    * the per-edge cohesion SCORE where [[kTruss]] is one cut (k-core →
    * coreness :: k-truss → trussness). Every edge is trivially in the
    * 2-truss, so trussness starts at 2 (no triangle) and the sweep
    * peels k = 3, 4, … from the PREVIOUS level's survivors — the
    * (k+1)-truss is inside the k-truss, so each level only re-peels
    * what is left, never the whole graph. Edges dropped while peeling
    * level k have trussness k−1.
    *
    * Scale shape: the [[kTruss]] per-round census (degree-ordered
    * orientation, O(√2m) wedge cap) run Σ_k (peel depth at k) times
    * over monotonically SHRINKING edge sets; survivors past `maxK`
    * raise LOUDLY (the [[kCore]] overrun contract) rather than
    * returning a truncated score. Output: (u, v, trussness) for every
    * canonical edge. */
  def trussDecomposition(edges: DataFrame, uCol: String, vCol: String,
      maxK: Int = 12, maxIter: Int = 30,
      edgesCanonical: Boolean = false): DataFrame = {
    require(maxK >= 3, s"maxK must be >= 3: $maxK")
    // edgesCanonical: see [[canon]]
    var e = if (edgesCanonical) canon(edges, uCol, vCol, canonical = true)
      else canon(edges, uCol, vCol).localCheckpoint(true)
    var nE = e.count()
    var out: DataFrame = null
    var k = 3
    while (nE > 0L && k <= maxK) {
      // fixpoint peel at k from the previous level's survivors; ONE
      // count action per round (the checkpoint is the materialization,
      // the count its only reader — no separate isEmpty probe)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val next = peelOnce(e, k).localCheckpoint(true)
        val nNext = next.count()
        if (nNext == nE || nNext == 0L) converged = true
        e = next
        nE = nNext
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"trussDecomposition(k=$k) did not converge in $maxIter " +
            "peel rounds (truss peeling depth exceeds maxIter)")
      // everything peeled at this level maxed out at trussness k-1
      val dropped = (if (out == null)
          canon(edges, uCol, vCol, canonical = edgesCanonical)
        else out.where(col("trussness") === (k - 1).toLong)
          .select(col("u"), col("v")))
        .join(e, Seq("u", "v"), "left_anti")
        .select(col("u"), col("v"), lit((k - 1).toLong).as("trussness"))
      // survivors carry k until (unless) the next level re-scores them
      val kept = e.select(col("u"), col("v"), lit(k.toLong).as("trussness"))
      out = (if (out == null) dropped.unionByName(kept)
        else out.where(col("trussness") < (k - 1).toLong)
          .unionByName(dropped).unionByName(kept))
        .localCheckpoint(true)
      k += 1
    }
    if (nE > 0L)
      throw new IllegalStateException(
        s"trussDecomposition: edges still survive past maxK=$maxK — " +
          "raise maxK (the graph is denser than the sweep bound)")
    if (out == null)
      canon(edges, uCol, vCol).select(col("u"), col("v"),
        lit(2L).as("trussness"))
    else out
  }
}
