package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Off-fixture scaling bench for the dedup path (BASELINE.md §D): runs the
  * q76 / q111 / q96 shapes at 1x and Nx (default 10x) the sf-dir corpus
  * and prints one JSON line with seconds, output counts, and ratios.
  *
  * The Nx corpus is N char-permuted copies of `documents`: copy i maps
  * chars 'a'..'j' through rotation i (`translate`), a bijection on
  * strings, so Jaccard is invariant WITHIN a copy and ~0 ACROSS copies.
  * Consequences the run itself asserts: the true near-dup pair set at Nx
  * is exactly N times the 1x set (count check printed in the JSON), and
  * measured time vs N tests the linear-shuffle claim with no confounding
  * from cross-copy collisions.
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val alpha = "abcdefghij"
    def rot(i: Int): String = alpha.drop(i % 10) + alpha.take(i % 10)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def corpusAt(n: Int): DataFrame =
      (0 until n).map { i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, rot(i)).as("text"))
      }.reduce(_ unionByName _)

    // q76 shape: full-corpus MinHash-LSH near-dup pairs
    def minhash(c: DataFrame): DataFrame =
      graft.operators.Dedup.minhashNearDups(
        c, "doc_id", "text", shingleN = 3, k = 32, bands = 8, threshold = 0.8)
    // q111 shape: incremental batch (20 mutated docs per copy) vs corpus
    def incremental(c: DataFrame): DataFrame = {
      val batch = c.where(pmod(col("doc_id"), lit(10000000L)) < 20)
        .select((col("doc_id") + 5000).as("doc_id"),
          concat(col("text"), lit(" graft incremental batch tail")).as("text"))
      graft.operators.Dedup.minhashNearDupsAgainst(
        c, batch, "doc_id", "text", shingleN = 3, k = 32, bands = 32,
        threshold = 0.5)
    }
    // q96 shape: connected components over the near-dup pair graph.
    // Pairs are materialized ONCE per scale (eager checkpoint) so the
    // ratio isolates the closure computation — the candidate-pair
    // stage's own scaling is the `minhash` shape; re-deriving it lazily
    // inside every timed evaluation re-measured minhash 4x per timing
    // and drowned CC (whose real 10x cost is ~2 s) in recompute noise.
    val ccPairs = scala.collection.mutable.Map[Int, DataFrame]()
    def components(n: Int): DataFrame = {
      val pairs = ccPairs.getOrElseUpdate(n,
        minhash(corpusAt(n)).select(col("id_a"), col("id_b"))
          .localCheckpoint(true))
      graft.operators.Components.connectedComponents(pairs, "id_a", "id_b")
    }

    def timed(df: => DataFrame): (Double, Long) = {
      // settle the JVM first: one JVM runs every shape, and a GC /
      // ContextCleaner storm triggered by the PREVIOUS shape's dropped
      // RDDs otherwise lands on whoever runs next (observed 10-20 s
      // penalties hopping between shapes across runs). min-of-3 guards
      // against the residual spikes.
      System.gc(); Thread.sleep(200)
      df.write.format("noop").mode("overwrite").save() // untimed warm-up
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (times.min, df.count())
    }

    // q118 shape: substring-level duplicated-span detection. The char
    // permutation preserves within-copy spans and creates none across
    // copies, so span counts are exactly N x the 1x count too.
    def spans(c: DataFrame): DataFrame =
      graft.operators.Spans.duplicatedSpans(c, "doc_id", "text", k = 15)

    // q130 shape: SemDeDup over an Nx embedding corpus. Copies are
    // dimension-ROTATED (a norm-preserving bijection: within-copy cosines
    // are invariant, cross-copy cosines stay far below the 0.9 threshold
    // for this corpus), every 15th vector gets a perturbed twin, and the
    // centroid table is the per-copy smallest-8 seeds — nCells grows
    // with the corpus so cluster size stays constant, which is how
    // SemDeDup holds its n^2/k pair bound at scale. A twin and its
    // original nearly always co-assign (their centroid cosines are ~
    // equal), so dropped-count at Nx tracks N x the 1x count to within
    // the few pairs whose argmax flips on a near-tie cell (observed
    // 1328 vs 1330 at 10x sf0.1).
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    def embShift(i: Int): DataFrame = {
      val r = i % 64
      emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        expr(s"concat(slice(v, ${r + 1}, ${64 - r}), slice(v, 1, $r))").as("v"))
    }
    def embCorpusAt(n: Int): DataFrame = {
      val copies = (0 until n).map(embShift).reduce(_ unionByName _)
      copies.unionByName(copies.where(pmod(col("vec_id"), lit(10000000L)) % 15 === 0)
        .select((col("vec_id") + 5000000L).as("vec_id"),
          expr("transform(v, x -> x * cast(1.01 as double) + cast(0.001 as double))").as("v")))
    }
    def semCents(n: Int, perCopy: Int): DataFrame =
      (0 until n).map(embShift).reduce(_ unionByName _)
        .where(pmod(col("vec_id"), lit(10000000L)) < perCopy)
        .select(col("vec_id").as("cell"), col("v").as("centroid"))
    def semdedup(n: Int): DataFrame =
      graft.operators.SemDedup.semDedupWith(
          embCorpusAt(n), "vec_id", "v", semCents(n, 8), threshold = 0.9)
        .where(!col("kept"))
    // the flat-vs-hierarchical ASSIGNMENT comparison needs cell counts
    // that grow with the corpus (the SemDeDup recipe) and large enough
    // for the rows × cells product to dominate: 64 cells per copy.
    // kflat's ratio exposes the n·k quadratic (flat path PINNED via
    // flatCellCap, since semDedupWith now auto-routes above 256 cells);
    // khier (branch ≈ √cells, per-row cost branch + cells/branch) is
    // the fix's receipt; kdefault is the unpinned call proving the
    // auto-dispatch takes the hierarchical path at this k.
    def semdedupKflat(n: Int): DataFrame =
      graft.operators.SemDedup.semDedupWith(
          embCorpusAt(n), "vec_id", "v", semCents(n, 64), threshold = 0.9,
          flatCellCap = Int.MaxValue)
        .where(!col("kept"))
    def semdedupKdefault(n: Int): DataFrame =
      graft.operators.SemDedup.semDedupWith(
          embCorpusAt(n), "vec_id", "v", semCents(n, 64), threshold = 0.9)
        .where(!col("kept"))
    def semdedupKhier(n: Int): DataFrame =
      graft.operators.SemDedup.semDedupHierarchical(
          embCorpusAt(n), "vec_id", "v", semCents(n, 64),
          branch = math.max(4, math.sqrt(64.0 * n).round.toInt),
          threshold = 0.9)
        .where(!col("kept"))
    // the round-11 log-depth ladder at the same growing cell count:
    // per-row cost fanout*log_f(k) vs khier's sqrt(k) — the ratio
    // between the two receipts the asymptotic gap as k grows with n
    def semdedupKtree(n: Int): DataFrame =
      graft.operators.SemDedup.semDedupTree(
          embCorpusAt(n), "vec_id", "v", semCents(n, 64),
          fanout = 8, threshold = 0.9)
        .where(!col("kept"))
    // r12 high-k receipts (the r11 VERDICT ask #3): 1000 cells per
    // copy, so k = 10,000 at 10x — the regime where BASELINE.md §r11
    // predicted the tree's f·log_f k per-row fold crosses under the
    // two-level √k. Same growing-k discipline as khier/ktree; the
    // receipt is ktree_hik's absolute seconds UNDER khier_hik's at 10x.
    def semdedupKhierHik(n: Int): DataFrame =
      graft.operators.SemDedup.semDedupHierarchical(
          embCorpusAt(n), "vec_id", "v", semCents(n, 1000),
          branch = math.max(4, math.sqrt(1000.0 * n).round.toInt),
          threshold = 0.9)
        .where(!col("kept"))
    def semdedupKtreeHik(n: Int): DataFrame =
      graft.operators.SemDedup.semDedupTree(
          embCorpusAt(n), "vec_id", "v", semCents(n, 1000),
          fanout = 16, threshold = 0.9)
        .where(!col("kept"))

    // q138 shape: winnowing shared-fingerprint census. The char
    // permutation is a bijection on grams but NOT on their md5s, so the
    // window-min SELECTION differs per copy: the guarantee-backed
    // detections (runs >= w+k-1) replicate exactly, while chance
    // sub-guarantee collisions vary slightly with the permuted hashes —
    // observed 39,843 vs the naive 39,850 at 10x (within 0.02%).
    def winnow(c: DataFrame): DataFrame =
      graft.operators.Winnow.sharedFingerprintCensus(c, "doc_id", "text",
        k = 4, w = 8).where(col("n_shared_fp") > 0)

    // q147 shape: CDC chunk dedup census. The char permutation changes
    // token md5s, so each copy draws fresh boundaries — the width-census
    // output stays O(widths) rows while the chunker and the digest
    // census do N x the work, which is exactly what the ratio measures.
    def cdc(c: DataFrame): DataFrame =
      graft.operators.Chunker.chunkDedupCensus(c, "doc_id", "text")

    // q316 shape: brand-basket association rules at Nx baskets. Copies
    // share the 25-brand item space with offset basket ids, so counts
    // scale exactly N x and minSupport scales with them — the pair
    // census stays items²-bounded while the basket self-join does N x
    // the work (the claimed linear dimension). Base table checkpointed
    // eagerly so the lineitem⋈part build is not what the ratio times.
    val bi0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(spark.read.parquet(s"$sfDir/part.parquet")
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("bk"), col("p_brand").as("it"))
      .localCheckpoint(true)
    def assoc(n: Int): DataFrame = {
      val bi = (0 until n).map(i => bi0.select(
        (col("bk") + lit(i * 100000000L)).as("bk"), col("it")))
        .reduce(_ unionByName _)
      graft.operators.Association.pairRules(bi, "bk", "it",
        minSupport = 10L * n, k = 20)
    }

    // q313 shape: nation-partition modularity at Nx trade graphs.
    // Copies offset BOTH node ids and the assignment table; nations
    // are shared labels, so communities span copies and every census
    // (e_c, d_c) scales exactly N x — the operator's work is the two
    // node-keyed joins plus community censuses, all linear.
    val pairs0 = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"),
        (col("l_suppkey") + 1000000L).as("v"))
      .localCheckpoint(true)
    val assign0 = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("node"), col("c_nationkey").as("comm"))
      .unionByName(spark.read.parquet(s"$sfDir/supplier.parquet")
        .select((col("s_suppkey") + 1000000L).as("node"),
          col("s_nationkey").as("comm")))
      .localCheckpoint(true)
    def modularityAt(n: Int): DataFrame = {
      val off = 100000000L
      val pairs = (0 until n).map(i => pairs0.select(
        (col("u") + lit(i * off)).as("u"), (col("v") + lit(i * off)).as("v")))
        .reduce(_ unionByName _)
      val assign = (0 until n).map(i => assign0.select(
        (col("node") + lit(i * off)).as("node"), col("comm")))
        .reduce(_ unionByName _)
      graft.operators.Graph.modularity(pairs, "u", "v", assign,
        "node", "comm")
    }

    // q364 shape: HyperANF at Nx disjoint trade graphs (2 hops keeps
    // the shape affordable in the harness). Copies offset node ids so
    // each copy's balls stay inside its copy — per-hop work is the
    // edge⋈packed-registers join + field-wise group-max, both linear
    // in edges; the ratio receipts the bit-packed (7-long) shuffle
    // payload introduced in round 11.
    def hyperanfAt(n: Int): DataFrame = {
      val off = 100000000L
      val edges0 = pairs0.unionByName(
        pairs0.select(col("v").as("u"), col("u").as("v")))
      val edges = (0 until n).map(i => edges0.select(
        (col("u") + lit(i * off)).as("u"), (col("v") + lit(i * off)).as("v")))
        .reduce(_ unionByName _)
      graft.operators.Graph.hyperAnf(edges, "u", "v", maxHops = 2)
        .where(col("hop") === 2 && col("nonempty") > 30)
    }

    // r12 shapes: the two new iterative graph passes at Nx EDGES on a
    // SHARED node space (copy i rewires the supplier end, so the graph
    // DENSIFIES instead of splitting into disjoint components — the
    // pivots/seeds stay the same smallest ids and their frontiers must
    // chew N x the edges). The linear-in-edges claim is exactly what
    // the ratio receipts.
    def denseTrade(n: Int): DataFrame = {
      val e0 = (0 until n).map(i => pairs0.select(col("u"),
        (lit(1000000L) + pmod(col("v") - 1000000L + lit(i * 131L),
          lit(20000L))).as("v")))
        .reduce(_ unionByName _)
      e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
    }
    def betweennessAt(n: Int): DataFrame =
      graft.operators.Graph.betweennessSampled(denseTrade(n), "u", "v",
        nSources = 4, maxDepth = 3)
        .where(col("betweenness") > 0.0)
    def ssspAt(n: Int): DataFrame =
      graft.operators.Graph.shortestPaths(
        denseTrade(n).withColumn("w", lit(1L) + pmod(col("u") + col("v"),
          lit(7L))),
        "u", "v", "w",
        pairs0.select(col("u").as("seed")).orderBy(col("seed")).limit(4),
        "seed", maxRounds = 12)

    // q337 shape: sequential rules at Nx actors. Copies offset user ids,
    // so actor count scales N x while per-actor history stays fixed —
    // the within-actor time self-join (the quadratic-in-history term) is
    // constant per actor and total work is linear in actors. minSupport
    // scales with N so the output rule set is stable.
    val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      .localCheckpoint(true)
    def seqrules(n: Int): DataFrame = {
      val ev = (0 until n).map(i => ev0.select(
        (col("user_id") + lit(i * 100000000L)).as("user_id"),
        col("event_type"), col("ms")))
        .reduce(_ unionByName _)
      graft.operators.Association.sequenceRules(ev, "user_id",
        "event_type", "ms", window = 3600000L, minSupport = 2L * n, k = 20)
    }

    // q343 shape: pooled quantile normalization at Nx rows. Copies are
    // EXACT duplicates: every (scope, group, value) census cell count
    // scales N x but the CELL SET is unchanged, so the merged-window
    // stage sees identical row counts at any N — only the first scan
    // and census aggregation grow. The flattest ratio on the board is
    // the design claim ("windows at census scale, never row scale").
    // q474 shape: t-digest at Nx keys — copies suffix the key, so the
    // key count scales N x while each key's value census stays fixed;
    // the keyed cumsum window and the δ²-bounded ladder projection are
    // both linear in census rows (no collect, no fold).
    def tdigestAt(n: Int): DataFrame = {
      val ev = (0 until n).map(i => ev0.select(
        concat(col("event_type"), lit("_" + i)).as("k"),
        (col("ms") % 100000L).as("v"))).reduce(_ unionByName _)
      graft.operators.Quantiles.tdigest(ev, "k", "v", delta = 16)
    }
    // q475 shape: cell-blocked DBSCAN at Nx embeddings — each copy is a
    // coordinate rotation with its own 8 cells (semCents grows with the
    // corpus), so per-cell pair work stays fixed and candidate pairs,
    // the degree census and the min-label closure are all linear in
    // copies; the planted 1.01x near-dup per 15th vector gives every
    // copy the same core/border mix.
    def dbscanAt(n: Int): DataFrame =
      graft.operators.Similarity.dbscanCells(
        embCorpusAt(n), "vec_id", "v", semCents(n, 8),
        simMin = 0.95, minPts = 3)

    def qnorm(n: Int): DataFrame = {
      val e = (0 until n).map(_ => ev0).reduce(_ unionByName _)
        .select(((col("ms") / 86400000L) % 7).cast("int").as("dow"),
          col("event_type"),
          (col("user_id") % 100).as("cents"))
      graft.operators.Normalize.quantileNormalize(
        e, "dow", "event_type", "cents")
    }

    // q363 shape: Kneser-Ney at Nx docs via char-permuted copies. Each
    // copy has a DISJOINT vocabulary (the rotation bijection), so the
    // bigram-type table grows N x and the pair-grain scan grows N x —
    // both honest linear claims; per-doc NLLs within copy 0 are
    // invariant (each copy is a closed sub-corpus).
    def kneserney(n: Int): DataFrame =
      graft.operators.KneserNey.bigramNll(corpusAt(n), "doc_id", "text")

    // q357 shape: distinct-n at Nx with EXACT duplicate copies (no
    // rotation): the gram TYPE set is identical at any N, only counts
    // scale — the census-vs-corpus separation measured (type-grain
    // rollup must not grow with N).
    def distinctn(n: Int): DataFrame = {
      val c = (0 until n).map(_ => docs).reduce(_ unionByName _)
        .withColumn("src", lit("all"))
      graft.operators.Profile.distinctN(c, "src", "text")
    }

    // q395 shape: z-order shard locality audit at Nx vectors. The shard
    // count is FIXED (2^shardBits = 32), so per-shard membership grows
    // linearly and UNCAPPED pair counts would grow quadratically (~N²
    // time) — the r9 VERDICT scale-killer. capPerShard=256 is sized so
    // 1x (2000 vectors, ~62/shard) audits exhaustively while Nx
    // overflows most shards: those are EXCLUDED and counted loudly in
    // n_shards_skipped, bounding pair work at cap²·shards regardless of
    // corpus size. The receipt is the time ratio staying far below N²/
    // even N — the cap, not luck, is the bound.
    def zorderAudit(n: Int): DataFrame =
      graft.operators.Similarity.zOrderLocalityAudit(
        (0 until n).map(embShift).reduce(_ unionByName _),
        "vec_id", "v", dims = 2, bitsPerDim = 4, shardBits = 5,
        tauMilli = 700L, capPerShard = 256)

    // q423 shape: nearest-score matching at Nx events with EXACT
    // duplicate copies: the (scope, score) census CELL SET is unchanged
    // at any N (same score values), so the nearest-control window sees
    // a constant row count — only the scan and the census aggregation
    // grow (the qnorm flat-window claim applied to matching).
    def matchAt(n: Int): DataFrame = {
      val e = (0 until n).map(_ => ev0).reduce(_ unionByName _)
      val s = e.select(col("event_type"),
        (expr("(ms div 86400000) % 7")).isin(0L, 6L).as("treated"),
        (col("user_id") % 10000).as("score"),
        (col("user_id") % 1000).as("y"))
      graft.operators.Causal.nearestScoreMatch(s, "event_type",
        col("treated"), "score", "y", caliper = 50L)
    }

    // q426 shape: KPSS at Nx series keys (copy-suffixed event types):
    // per-key series length is constant, the key count scales Nx — the
    // keyed-window claim (work linear in keys, no global sort).
    def kpssAt(n: Int): DataFrame = {
      val e = (0 until n).map(i => ev0.select(
        concat(col("event_type"), lit("_" + i)).as("k"),
        (col("ms") / 86400000L).cast("long").as("o"),
        (col("user_id") % 1000).as("x")))
        .reduce(_ unionByName _)
      val daily = e.groupBy(col("k"), col("o"))
        .agg(sum(col("x")).as("tot"))
      graft.operators.Autocorr.kpssLevel(daily, "k", "o", "tot", lags = 4)
    }

    val shapes: Seq[(String, Int => DataFrame)] = Seq(
      "minhash" -> (n => minhash(corpusAt(n))),
      "incremental" -> (n => incremental(corpusAt(n))),
      "components" -> (components(_)),
      "spans" -> (n => spans(corpusAt(n))),
      "semdedup" -> (semdedup(_)),
      "semdedup_kflat" -> (semdedupKflat(_)),
      "semdedup_khier" -> (semdedupKhier(_)),
      "semdedup_ktree" -> (semdedupKtree(_)),
      "semdedup_kdefault" -> (semdedupKdefault(_)),
      "semdedup_khier_hik" -> (semdedupKhierHik(_)),
      "semdedup_ktree_hik" -> (semdedupKtreeHik(_)),
      "winnow" -> (n => winnow(corpusAt(n))),
      "cdc" -> (n => cdc(corpusAt(n))),
      "assoc" -> (assoc(_)),
      "modularity" -> (modularityAt(_)),
      "hyperanf" -> (hyperanfAt(_)),
      "betweenness" -> (betweennessAt(_)),
      "sssp" -> (ssspAt(_)),
      "seqrules" -> (seqrules(_)),
      "qnorm" -> (qnorm(_)),
      "kneserney" -> (kneserney(_)),
      "distinctn" -> (distinctn(_)),
      "zorder_audit" -> (zorderAudit(_)),
      "match" -> (matchAt(_)),
      "kpss" -> (kpssAt(_)),
      "tdigest" -> (tdigestAt(_)),
      "dbscan" -> (dbscanAt(_)))
    // optional shape-name args: run only the named shapes (local
    // iteration / targeted receipts); no args = the full board
    val only = args.toSet
    val out = shapes
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, fn) =>
      val (t1, n1) = timed(fn(1))
      val (tN, nN) = timed(fn(copies))
      System.err.println(f"[scale] $name 1x ${t1}%.2fs ($n1 rows) -> ${copies}x ${tN}%.2fs ($nN rows)")
      Seq(
        f""""${name}_1x":{"sec":$t1%.3f,"rows":$n1}""",
        f""""${name}_${copies}x":{"sec":$tN%.3f,"rows":$nN}""",
        f""""${name}_time_ratio":${tN / t1}%.2f""")
    }
    val line = s"""{"metric":"dedup_scale","copies":$copies,"sf":"$sfDir",""" +
      out.mkString("", ",", "}")
    spark.stop()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "scale_bench.json")),
      line.getBytes("UTF-8"))
    println(line)
  }
}
