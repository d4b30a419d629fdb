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

  /** Degree census over a canonical edge set: (node, deg). */
  private def degreeCensus(e0: DataFrame): DataFrame =
    e0.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** Degree-ordered orientation + packed out-neighbor adjacency over a
    * checkpointed canonical edge set. Adjacency is SORTED (arrays
    * bounded O(√(2m)) by the orientation; ascending order feeds the
    * streaming merge) and DELTA-VARINT PACKED to binary: the closing
    * joins duplicate each node's adjacency once per incident oriented
    * edge, so on a dense graph the adjacency payload is
    * ≈8·Σ(outdeg(u)+outdeg(v)) bytes of row traffic — packed blobs
    * cut that ~4-6× and ride UnsafeRows as one memcpy.
    *
    * `packed = false` keeps plain sorted long arrays: [[support]] (the
    * kTruss peel kernel) re-runs this whole pipeline on every peel
    * round over SPARSE shrinking survivor graphs, where the two-pointer
    * merge over primitive arrays is already allocation-light and the
    * varint encode/decode would be pure per-round overhead (measured
    * q408 1.47 → 2.6 s when the peel rode the packed form). */
  private def orientedAdj(e0: DataFrame, deg: DataFrame,
      packed: Boolean): (DataFrame, DataFrame) = {
    // (deg, id) is a TOTAL order over nodes, so orientation needs no
    // global rank — a struct comparison on each edge suffices
    val ed = e0
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val fwd = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = ed.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"))
      .localCheckpoint(true)
    val sortedNbrs = sort_array(collect_list(col("dst")))
    val adj = oriented.groupBy(col("src"))
      .agg((if (packed) graft.functions.FastHash.packSorted(sortedNbrs)
            else sortedNbrs).as("nbrs"))
      .localCheckpoint(true)
    (oriented, adj)
  }

  /** The triangle-closing plan (NOT checkpointed): per oriented edge
    * (u,v), the common out-neighbors ws = adj(u) ∩ adj(v) close
    * triangles (u→v, u→w, v→w), each triangle found exactly once at
    * its pivot edge. The codegen'd streaming merge decodes both packed
    * adjacency streams on the fly — no per-call hash set; the only
    * allocation is the witness array itself (Σ|ws| = T, the triangle
    * count), emitted as a primitive-long blob. Inner joins: u always
    * has out-edges; a v with none closes nothing and its zero
    * contribution is restored by each consumer's final fill. */
  private def closedPlan(oriented: DataFrame, adj: DataFrame,
      packed: Boolean): DataFrame =
    oriented
      .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"))
      .select(col("src"), col("dst"),
        (if (packed)
           graft.functions.FastHash.packedIntersect(col("nu"), col("nv"))
         else graft.functions.FastHash.sortedIntersect(col("nu"), col("nv")))
          .as("ws"))
      .where(size(col("ws")) > 0)

  /** [[closedPlan]] materialized — for [[support]], whose three
    * re-canonicalized union branches each re-read the closed set
    * (without the checkpoint the intersect pass runs three times).
    * The input must already be checkpointed. */
  private def closedTriangles(e0: DataFrame): DataFrame = {
    val (oriented, adj) = orientedAdj(e0, degreeCensus(e0), packed = false)
    closedPlan(oriented, adj, packed = false).localCheckpoint(true)
  }

  /** Per-node triangle participation over the undirected graph given by
    * (`uCol`, `vCol`) pairs (self-loops dropped, duplicates and
    * direction collapsed). Node ids must be integral (widened to long —
    * the sorted-intersection kernel runs on primitive long arrays).
    * Output: (node, triangles) with a row for every node that appears
    * in an edge, zero-filled.
    *
    * Attribution runs as ONE fused pass over the un-checkpointed
    * [[closedPlan]]: posexplode(concat(array(src, dst), ws)) tags each
    * corner by position — the pivot (pos 0) and far end (pos 1) each
    * join |ws| triangles, every witness (pos ≥ 2) joins one — and
    * partial aggregation collapses the exploded stream to node grain
    * map-side. On a DENSE graph T can reach Θ(n³) (the 91%-dense sf0.1
    * supplier graph closes ~10⁸ triangles), so the former design —
    * checkpointing (src, dst, ws) and union-reading it three times —
    * serialized ~1 GB of witness arrays through storage per run; that
    * write was q196's load-sensitive term (2× under loadavg ~4). The
    * fused pass never materializes a witness row. */
  def perNode(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    // materialize the canonical edge set ONCE (eager localCheckpoint —
    // the q170/q221 lesson): e0 feeds the degree census and the
    // orientation join; without the checkpoint the upstream edge
    // build re-runs per consumer (measured 15.7 s → 6.9 s for q196's
    // dense co-occurrence graph at sf0.1)
    val e0 = canonical(edges, uCol, vCol).localCheckpoint(true)
    // node-grain and consumed twice (orientation join + zero-fill) —
    // checkpoint instead of re-running the census per consumer
    val deg = degreeCensus(e0).localCheckpoint(true)
    val (oriented, adj) = orientedAdj(e0, deg, packed = true)
    val perCorner = closedPlan(oriented, adj, packed = true)
      .select(size(col("ws")).cast("long").as("cnt"),
        posexplode(concat(array(col("src"), col("dst")), col("ws"))))
      .select(col("col").as("node"),
        when(col("pos") < 2, col("cnt")).otherwise(lit(1L)).as("n"))
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
  def transitivity(edges: DataFrame, uCol: String, vCol: String,
      edgesCanonical: Boolean = false): DataFrame = {
    val dec = "decimal(38,0)"
    // edgesCanonical (r14): duplicate-free under (least, greatest) and
    // materialized upstream — skips the dedup exchange + checkpoint
    val e1 = edges
      .select(least(col(uCol), col(vCol)).cast("long").as("u"),
        greatest(col(uCol), col(vCol)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val e0 = if (edgesCanonical) e1 else e1.distinct().localCheckpoint(true)
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
