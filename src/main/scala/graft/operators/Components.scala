package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step
  * between candidate-pair generation (MinHash-LSH / SimHash / embedding
  * near-dup, [[Dedup]]) and actual corpus deduplication: a near-dup
  * relation is not transitive, so "keep one doc per duplicate group"
  * needs the transitive closure of the pair set, not the pairs.
  *
  * Algorithm: iterative min-label propagation. Every node starts with
  * itself as its component label; each round every node takes the min of
  * its own label and its neighbors' labels. A fixed point is reached
  * after at most `diameter` rounds — and near-dup graphs are unions of
  * near-cliques (diameter 2-3), so in practice 3-5 rounds. Each round is
  * one shuffle join on node id plus one groupBy — no driver-side graph,
  * no all-pairs work; the state that shuffles is exactly one (id, label)
  * long pair per node. Lineage is cut per round with localCheckpoint so
  * the plan does not grow with the iteration count.
  *
  * Convergence is detected with a two-scalar checksum (sum of labels,
  * widened to decimal so 100 TB-scale id sums cannot overflow): min-label
  * updates are monotonically decreasing, so the sum is strictly smaller
  * on every round that changed anything and equal exactly at the fixed
  * point. For adversarially long path graphs (not a shape dedup produces)
  * the bound `maxIter` aborts with an error rather than silently emitting
  * a non-converged labeling.
  */
object Components {

  /** Labels every node of the undirected pair graph with the smallest
    * node id reachable from it. Output: (`id`, `component`) — one row per
    * distinct node appearing in `pairs`; singleton docs (no pairs) are
    * by definition their own component and never enter the graph.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val half = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    val edges = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    // round-0 shortcut: seed every node with min(self, neighbors) — one
    // aggregation over the edge list; cliques (the common dedup shape)
    // arrive converged and pay only the confirming round. Checkpoints are
    // lazy: the per-round checksum action below materializes them, so each
    // round costs exactly one Spark job instead of two.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(least(col("src"), col("dst"))).as("component"))
      .localCheckpoint(true)

    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)).as("s")).head.getDecimal(0)

    var prev = checksum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("component"))
      val merged = labels.union(msgs)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      val cur = checksum(merged)
      converged = cur.compareTo(prev) == 0
      prev = cur
      labels = merged
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter — raise it for path-like graphs)")
    labels
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond") — the
    * O(log n)-round alternative to [[connectedComponents]]'s label
    * propagation. Label propagation needs one round per unit of graph
    * DIAMETER; near-dup graphs are near-cliques so that is fine, but a
    * general 100 TB edge set (web link graphs, long chains of pairwise
    * matches) can have diameter in the thousands. Star contraction
    * converges in O(log² n) rounds on ANY graph (O(log n) in practice)
    * because each round halves the height of every tree in the hooking
    * forest rather than walking it:
    *
    *  - large-star: every node u connects each STRICTLY LARGER neighbor
    *    to m(u) = min(Γ(u) ∪ u);
    *  - small-star: every node u connects each not-larger neighbor and
    *    itself to m(u), on the edge set oriented hi→lo.
    *
    * Both steps preserve connectivity (edges only move within a
    * component — they re-attach a neighbor to another node of the same
    * component) and never create cross-component edges, so the fixed
    * point — a forest of stars each rooted at its component's minimum —
    * labels every node with exactly the min reachable id, the same
    * output contract as [[connectedComponents]] (spec-asserted
    * equivalent on clique / path / star / random graphs).
    *
    * Scale shape per round: two aggregations + two joins, all keyed by
    * node id; the per-node state is ONE (id, min) pair — hub nodes never
    * materialize a neighbor list (the min is a partial aggregate, the
    * re-attachment a join), so a 10^7-degree hub costs its edge rows and
    * nothing more. Lineage is cut per round with localCheckpoint —
    * EAGER, repo-wide policy since round 10: a LAZY local checkpoint
    * first-materialized on an AQE broadcast-exchange thread deadlocks
    * against the DAG scheduler (Spark's global RDDCheckpointData class
    * monitor vs the RDD state lock, observed as a JVM-level deadlock in
    * exactly this loop: the round-bottom checkpoint's first action is
    * next round's isEmpty, whose build side AQE broadcasts). Eager
    * materialization runs the checkpoint job on the driver action
    * thread at creation — same total compute, no cross-thread lock
    * inversion window.
    *
    * Convergence is checked EXACTLY, not by checksum: the current edge
    * set is a min-rooted star forest iff re-deriving every node's min
    * incident label refutes no edge (each leaf already points at its
    * root and each root at itself) — one aggregation + one join, and a
    * non-converged labeling can never be emitted silently; `maxIter`
    * aborts loudly like the label-prop path. */
  def connectedComponentsAltStar(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    var edges = pairs
      .select(greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("hi"),
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("lo"))
      .where(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint(true)

    def minIncident(e: DataFrame): DataFrame =
      e.select(col("hi").as("id"), col("lo").as("m"))
        .union(e.select(col("lo").as("id"), col("lo").as("m")))
        .groupBy("id").agg(min("m").as("m"))

    // Per-round cost discipline (r14): the exact star-forest probe
    // (one aggregation + two joins + an isEmpty action over the full
    // edge set) used to run EVERY round before the step — nearly
    // doubling each round's work. The probe is now gated behind an
    // exact-arithmetic SIGNATURE of the checkpointed edge set
    // (count, Σhi, Σlo as decimal — one cheap scalar job over cached
    // blocks): a changed signature proves the step changed the set, so
    // the probe is provably redundant; only a signature-stable round
    // (the fixpoint candidate) pays the full probe, which remains the
    // ONLY thing that can declare convergence — the exactness contract
    // in the scaladoc is unchanged. Stepping an already-converged
    // forest is the identity (large-star and small-star both fix a
    // min-rooted star forest), so output rows are identical to the
    // probe-first form on every input.
    def signature(e: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(col("hi").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)),
        coalesce(sum(col("lo").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head()
      (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
    }
    def sigEq(a: (Long, java.math.BigDecimal, java.math.BigDecimal),
        b: (Long, java.math.BigDecimal, java.math.BigDecimal)): Boolean =
      a._1 == b._1 && a._2.compareTo(b._2) == 0 && a._3.compareTo(b._3) == 0
    // exact fixed-point test: star forest rooted at minima <=> every
    // hi-side node's min incident is its lo partner and every lo-side
    // node's min incident is itself.
    def isStarForest(e: DataFrame): Boolean = {
      val labels = minIncident(e)
      e.join(labels.withColumnRenamed("id", "hi").withColumnRenamed("m", "m_hi"), "hi")
        .join(labels.withColumnRenamed("id", "lo").withColumnRenamed("m", "m_lo"), "lo")
        .where(col("m_hi") =!= col("lo") || col("m_lo") =!= col("lo"))
        .isEmpty
    }
    var sig = signature(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star: center u over BOTH orientations, m = min(Γ(u) ∪ u);
      // each neighbor v > u re-attaches as (v, m).
      val und = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = und.groupBy("u")
        .agg(least(col("u"), min(col("v"))).as("m"))
      // NO distinct here (r14, guide §2.4): the join is 1:1 on u (mins
      // is one row per u), so `large` is exactly edge-grain — its
      // duplicates (two centers re-attaching the same v to the same m)
      // are harmless to every consumer: sMins takes a min, and the
      // round's output set is pinned by `small`'s distinct. The old
      // dedup exchange here bought nothing but its own shuffle.
      val large = und.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("hi"), col("m").as("lo"))
        .where(col("hi") =!= col("lo"))
      // small-star on the hi→lo orientation: center hi, m = min of its
      // smaller neighbors; every smaller neighbor AND the center hook
      // onto m.
      val sMins = large.groupBy("hi").agg(min("lo").as("m"))
      val small = large.join(sMins, "hi")
        .select(col("lo").as("n"), col("m"))
        .union(sMins.select(col("hi").as("n"), col("m")))
        .where(col("n") =!= col("m"))
        .select(col("n").as("hi"), col("m").as("lo"))
        .distinct()
        .localCheckpoint(true)
      val nSig = signature(small)
      if (sigEq(nSig, sig)) converged = isStarForest(small)
      edges = small
      sig = nSig
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsAltStar did not converge in $maxIter rounds")
    // star forest: leaves (hi → root=lo), roots label themselves.
    edges.select(col("hi").as("id"), col("lo").as("component"))
      .union(edges.select(col("lo").as("id"), col("lo").as("component")))
      .distinct()
  }

  /** The dedup-apply step: label `corpus` rows with their near-dup
    * component and a `kept` flag — true exactly for the canonical doc
    * (min id) of each component, and for singletons (docs in no pair).
    * `corpus.filter($"kept")` IS the deduplicated corpus; the join is a
    * left join against the (id, component) labeling, which is orders of
    * magnitude smaller than the corpus (only docs that appear in pairs),
    * so Spark broadcast-joins it in the common case.
    */
  def canonicalize(corpus: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIter)
      .withColumnRenamed("id", "__cc_id")
    corpus
      .join(comp, corpus(idCol).cast("long") === col("__cc_id"), "left")
      .withColumn("component",
        coalesce(col("component"), corpus(idCol).cast("long")))
      .withColumn("kept", col("component") === corpus(idCol).cast("long"))
      .drop("__cc_id")
  }

  /** [[canonicalize]] with a QUALITY policy: the kept doc per component
    * is the argmax of `priorityCol` (ties -> smallest id) instead of the
    * smallest id — production dedup keeps the BEST copy of duplicated
    * content (highest quality score, longest extraction, newest crawl),
    * not the incidentally-first one. The winner election is a
    * partial-aggregatable max(struct(priority, -id)) — run ONLY over
    * docs that appear in a pair, so the winner table is one row per
    * DUPLICATE component (sized like the pair graph, not the corpus)
    * and crosses back as a broadcastable left join; singletons are kept
    * by default and the corpus is never reshuffled beyond the same left
    * join [[canonicalize]] already does. */
  def canonicalizeBy(corpus: DataFrame, idCol: String, priorityCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIter)
      .withColumnRenamed("id", "__cc_id")
    val labeled = corpus
      .join(comp, corpus(idCol).cast("long") === col("__cc_id"), "left")
      .withColumn("component",
        coalesce(col("component"), corpus(idCol).cast("long")))
      .withColumn("__in_graph", col("__cc_id").isNotNull)
      .drop("__cc_id")
    val winners = labeled.where(col("__in_graph"))
      .groupBy(col("component"))
      .agg(max(struct(col(priorityCol).as("p"),
        (-col(idCol).cast("long")).as("nid"))).as("w"))
      .select(col("component"), (-col("w.nid")).as("__keep_id"))
    labeled.join(winners, Seq("component"), "left")
      .withColumn("kept",
        coalesce(col(idCol).cast("long") === col("__keep_id"), lit(true)))
      .drop("__keep_id", "__in_graph")
  }

  /** [[connectedComponents]] plus the member count of each component —
    * the shape a dedup-keep-one pass consumes (component → representative
    * = min id, csize → cluster census). One extra shuffle on component.
    */
  def componentsWithSizes(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIter)
    val sizes = comp.groupBy("component").agg(count("*").as("csize"))
    comp.join(sizes, "component")
  }
}
