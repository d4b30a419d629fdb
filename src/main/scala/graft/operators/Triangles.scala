package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting by degree-ordered edge orientation — the
  * graph-shape signal link-quality pipelines compute next to PageRank
  * ([[Graph]]): clustering structure separates organic link
  * neighborhoods from link farms, and co-occurrence triangles rank
  * entity tightness.
  *
  * Scale shape: the naive wedge join (edges ⋈ edges on a shared
  * endpoint) explodes on hubs — a degree-d node contributes d² wedges,
  * and web-scale graphs have d in the millions. Orienting every edge
  * from its (degree, id)-smaller endpoint to the larger one first caps
  * every out-degree at O(√m) (a node of degree d > √(2m) cannot have
  * √(2m) neighbors of even larger degree), so total wedge work is
  * bounded by Σ outdeg² ≤ m·√(2m) — the standard node-iterator
  * bound — and each triangle is generated exactly once (its
  * order-minimal corner is the pivot). Within that bound the closing
  * step uses ADJACENCY-ARRAY INTERSECTION rather than a row-level
  * wedge self-join: per oriented edge (u,v), the common out-neighbors
  * array_intersect(adj(u), adj(v)) ARE the triangles pivoted at u —
  * the Σ outdeg² wedge rows are never materialized or shuffled, and
  * the (b,c) closing hash-join disappears into a per-edge set
  * intersection (measured 28.6 s → ~8 s on the sf0.1 supplier
  * co-occurrence graph). Adjacency arrays are out-neighbor lists, so
  * the O(√(2m)) orientation bound caps every array. All joins are
  * hash-partitioned equi-joins on node keys; counts are integers, so
  * the result is bit-stable at any parallelism with no ordered-fold
  * machinery.
  */
object Triangles {

  /** Canonical undirected edge set: u < v, self-loops dropped,
    * duplicates and direction collapsed, ids widened to long. */
  private def canonical(edges: DataFrame, uCol: String,
      vCol: String): DataFrame =
    edges
      .select(least(col(uCol), col(vCol)).cast("long").as("u"),
        greatest(col(uCol), col(vCol)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Degree-ordered orientation + sorted-adjacency intersection over a
    * canonical (u, v) edge set: one row per triangle-closing pivot edge
    * (src, dst, ws) where ws are the common out-neighbors — each
    * triangle generated exactly once, every out-degree O(√(2m))-capped.
    * Shared by [[perNode]] and [[kTruss]] (which re-runs it per peel
    * round). The input must already be checkpointed — this pipeline
    * consumes it several times. */
  private def closedTriangles(e0: DataFrame): DataFrame = {
    val deg = e0.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // (deg, id) is a TOTAL order over nodes, so orientation needs no
    // global rank — a struct comparison on each edge suffices
    val ed = e0
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val fwd = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = ed.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"),
      when(fwd, col("dv")).otherwise(col("du")).as("ddeg"))
      .localCheckpoint(true)
    // out-neighbor adjacency per node, SORTED (arrays bounded O(√(2m))
    // by the orientation; ascending order feeds the two-pointer merge)
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .localCheckpoint(true)
    // per oriented edge (u,v): common out-neighbors w close triangles
    // (u→v, u→w, v→w), each triangle found exactly once at its pivot
    // edge. The codegen'd sorted merge replaces array_intersect's
    // per-call hash-set build — the dominant per-edge cost on dense
    // graphs. Inner joins: u always has out-edges; a v with none closes
    // nothing and its zero contribution is restored by the final fill.
    // checkpoint: the three consumer union branches each re-read
    // `closed` — without it the intersect pass runs three times
    oriented
      .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"))
      .select(col("src"), col("dst"),
        graft.functions.FastHash.sortedIntersect(col("nu"), col("nv")).as("ws"))
      .where(size(col("ws")) > 0)
      .localCheckpoint(true)
  }

  /** Per-node triangle participation over the undirected graph given by
    * (`uCol`, `vCol`) pairs (self-loops dropped, duplicates and
    * direction collapsed). Node ids must be integral (widened to long —
    * the sorted-intersection kernel runs on primitive long arrays).
    * Output: (node, triangles) with a row for every node that appears
    * in an edge, zero-filled. */
  def perNode(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    // materialize the canonical edge set ONCE (eager localCheckpoint —
    // the q170/q221 lesson): e0 feeds the degree census, the
    // orientation join and (via `closed`'s three union branches) the
    // whole chain again; without the checkpoint the upstream edge
    // build re-runs per consumer (measured 15.7 s → 6.9 s for q196's
    // dense co-occurrence graph at sf0.1)
    val e0 = canonical(edges, uCol, vCol).localCheckpoint(true)
    val deg = e0.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val closed = closedTriangles(e0)
    // corner attribution: the pivot u and the far end v each join
    // |ws| triangles; every common neighbor w joins one
    val perCorner = closed
      .select(col("src").as("node"), size(col("ws")).cast("long").as("n"))
      .union(closed.select(col("dst").as("node"), size(col("ws")).cast("long").as("n")))
      .union(closed.select(explode(col("ws")).as("node"), lit(1L).as("n")))
      .groupBy("node").agg(sum(col("n")).as("triangles"))
    deg.select(col("node"))
      .join(perCorner, Seq("node"), "left")
      .select(col("node"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Global transitivity (clustering coefficient of the whole graph):
    * C = 3·triangles / wedges, the fraction of open two-paths that
    * close — [[perNode]]'s one-number summary and the density-shape
    * companion to [[Graph.assortativity]] (assortativity says WHO
    * links, transitivity says whether neighborhoods close; a link farm
    * is high-transitivity low-assortativity). Wedges = Σ_v d_v(d_v−1)/2
    * and 3·triangles = Σ_v tri_v are both exact integers (d(d−1) is
    * always even, so the `div 2` is exact), making C ONE
    * correctly-rounded division — no float fold.
    *
    * Scale shape: one canonical distinct, the [[perNode]] pipeline
    * (O(√2m)-capped adjacency, codegen'd sorted intersection), a
    * degree census, two scalar aggregations. Output one row:
    * (n_nodes, n_edges, n_wedges, n_triangles, transitivity); null
    * when the graph has no wedge (no node of degree ≥ 2). */
  def transitivity(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e0 = edges
      .select(least(col(uCol), col(vCol)).cast("long").as("u"),
        greatest(col(uCol), col(vCol)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = e0.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val wedges = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val m = broadcast(e0.agg(count(lit(1)).as("n_edges")))
    // corner-sum = 3T exactly; integer `div` keeps it exact at any scale
    val tri = perNode(e0, "u", "v")
      .agg(expr("sum(triangles) div 3").as("n_triangles"))
    wedges.crossJoin(m).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0L,
          (lit(3L).cast(dec) * col("n_triangles").cast(dec)).cast(dec)
            .cast("double") / col("n_wedges").cast("double"))
          .as("transitivity"))
  }

  /** Per-edge triangle support over a canonical checkpointed edge set:
    * each [[closedTriangles]] pivot row (src, dst, ws) certifies |ws|
    * triangles on edge (src,dst) and one each on (src,w) and (dst,w) —
    * re-canonicalized, summed, zero-filled over the full edge set.
    * Shared with [[KCore.kTruss]]/[[KCore.kTrussPeel]] (the ONE truss
    * peel kernel in the engine — consolidated r12). */
  private[operators] def support(e0: DataFrame): DataFrame = {
    val closed = closedTriangles(e0)
    val pivot = closed.select(col("src").as("a"), col("dst").as("b"),
      size(col("ws")).cast("long").as("n"))
    def side(endCol: String) = closed
      .select(col(endCol).as("x"), explode(col("ws")).as("w"))
      .select(least(col("x"), col("w")).as("a"),
        greatest(col("x"), col("w")).as("b"), lit(1L).as("n"))
    val contrib = pivot.unionByName(side("src")).unionByName(side("dst"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"), col("n"))
      .groupBy(col("u"), col("v")).agg(sum(col("n")).as("sup"))
    e0.join(contrib, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("sup"), lit(0L)).as("sup"))
  }

}
