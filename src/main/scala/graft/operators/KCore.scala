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
      maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val e0 = edges
      .select(least(col(uCol), col(vCol)).cast("long").as("u"),
        greatest(col(uCol), col(vCol)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
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
}
