package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph centrality by iterative joins — the PageRank-style quality
  * signal large-corpus pipelines compute over their hyperlink graph to
  * weight crawl sources (the Common-Crawl-era "rank the hosts before you
  * filter the pages" move). No GraphX: the DataFrame formulation keeps
  * Catalyst in charge and the shuffle surface explicit — per iteration,
  * ONE hash exchange of (dst, contribution) pairs keyed on the target
  * node; edges and out-degrees partition once and re-use their layout
  * every round (AQE reuses the exchange), and the node table is the only
  * thing that changes.
  *
  * Determinism contract: per-node in-mass folds over contributions in
  * ASCENDING SOURCE ORDER (`array_sort` on (src, contrib) structs, then
  * a left fold) instead of a plain `sum` — double addition is not
  * associative, and an unordered shuffle sum would hash-diverge from any
  * reference replay. With the fold, every iteration is bit-identical to
  * a SQL engine replaying the same rule (q169's oracle), eight rounds
  * deep, no tolerance needed.
  */
object Graph {

  /** `iterations` rounds of PR(v) = (1-d)/N + d * Σ_{u→v} PR(u)/out(u)
    * over distinct `(srcCol, dstCol)` edges. N = nodes appearing in any
    * edge. Dangling nodes (dst-only) receive mass but contribute none —
    * their mass is NOT redistributed (document-graph convention; a
    * strongly-bidirectional graph like q169's has no dangling nodes).
    * Output: (node, pr). Lineage is cut per round with a lazy
    * localCheckpoint, one plan per iteration instead of a 2^k tree. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    // loop invariants: materialize ONCE (lazy localCheckpoint — computed
    // on first use, reused every round). Without this each of the k
    // rounds re-runs the edge distinct / degree / node-union shuffles
    // from the scan. The per-round edge⋈pr join is left to AQE: pr is
    // one row per node, so at sane node counts it broadcasts (edges
    // never re-exchange); at web-scale node counts AQE falls back to a
    // shuffle join — the right call on both ends, not worth pinning.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(false)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val nDf = broadcast(nodes.agg(count(lit(1)).as("nn")))
    val teleport = lit(1.0 - damping)
    var pr = nodes.crossJoin(nDf)
      .select(col("node"), (lit(1.0) / col("nn")).as("pr"))
    for (_ <- 1 to iterations) {
      val summed = e.join(pr, e("src") === pr("node"))
        .join(outdeg, "src")
        .select(col("dst"), col("src"), (col("pr") / col("od")).as("contrib"))
        .groupBy(col("dst"))
        // ordered fold: see determinism contract above. 0.0 + c0 == c0
        // exactly, so the left fold matches an init-less reference fold.
        .agg(aggregate(
          array_sort(collect_list(struct(col("src"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")).as("in_mass"))
      pr = nodes.join(summed, nodes("node") === summed("dst"), "left")
        .crossJoin(nDf)
        .select(col("node"),
          (teleport / col("nn") +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
        .localCheckpoint(false)
    }
    pr
  }
}
