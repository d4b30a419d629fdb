package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming parity-plus (SURVEY.md §7.4.8): the reference's
  * cron-append cadence as incremental streams. Batch stays the source of
  * truth; these operators make the same computations incremental:
  *  - signal intake with late-arrival watermarking + dedup by key
  *  - windowed flow aggregation (the A1-A4 shapes over an event stream)
  *  - stateful sessionization via mapGroupsWithState (the W15/q37 gap
  *    rule as managed state instead of a window function)
  */
object Streams {

  /** Deduplicating intake: drop replayed (ticker, scan_date) pairs within
    * the watermark horizon (idempotency guard P14, made streaming). */
  def dedupedSignals(signals: DataFrame, eventTimeCol: String,
      watermark: String = "1 day"): DataFrame =
    signals
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("ticker", "scan_date")

  /** Streaming exact document dedup (q70 made incremental): drop documents
    * whose normalized-text digest was already seen within the watermark.
    * The 16-byte digest — never the text — is the dedup state key, so
    * state stays bytes-bounded at any ingest rate. */
  def dedupedDocs(docs: DataFrame, eventTimeCol: String,
      textCol: String = "text", watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("_digest", md5(lower(trim(col(textCol)))))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("_digest")
      .drop("_digest")

  /** Windowed per-type value aggregation with a watermark — the streaming
    * form of the scanner's per-day conditional sums (A1/A2). */
  def windowedTypeAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  case class Evt(user_id: Long, ts_ms: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Int, sum_value: Double)

  /** Gap-based sessionization (q167's 30-minute rule; q37's 1-hour rule
    * is the same operator with a different gap) as explicit managed
    * state, EVENT-time semantics: a session closes when a later event
    * arrives past the gap, or when the WATERMARK passes (last + gap) —
    * `EventTimeTimeout`, not processing time, so results are a pure
    * function of the data (replayable, spec-checkable against the batch
    * gaps-and-islands) and an idle engine never spins empty batches just
    * to poll wall-clock timers. State is one (start, last, n, sum) tuple
    * per ACTIVE user — bounded by concurrent users, not stream length.
    *
    * `events` needs columns (user_id long, ts timestamp, value double);
    * `watermarkDelay` is the out-of-orderness bound. Emits in append
    * mode. */
  def sessionize(events: DataFrame, gapMs: Long = 1800000L,
      watermarkDelay: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evts: Iterator[(Long, java.sql.Timestamp, Double)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = evts.map(e => (e._2.getTime, e._3)).toSeq.sortBy(_._1)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { case (ms, v) =>
              cur match {
                case Some(s) if ms - s.last <= gapMs =>
                  cur = Some(s.copy(last = ms, n = s.n + 1, sum = s.sum + v))
                case Some(s) =>
                  closed += SessionOut(user, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(ms, ms, 1, v))
                case None =>
                  cur = Some(SessionState(ms, ms, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout must sit at/after the current watermark — a
              // session already older than the watermark fires next batch
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
      }
  }

  case class TradeBar(trade_id: Long, t: Long, h: Double, l: Double, c: Double,
      entry_ts: Long, timeout_ts: Long, target_mult: Double, stop_mult: Double,
      slippage: Double)
  case class BracketState(entryTs: Long, entryPrice: Double, done: Boolean)
  case class StreamFill(trade_id: Long, entry_ts: Long, entry_price: Double,
      exit_ts: Long, exit_price: Double, exit_reason: String)

  /** X1 bracket tracking as a live stream (SURVEY §7.4.8 "stateful bracket
    * tracking"): per-trade managed state holds the entry fill; each
    * arriving bar is checked timeout -> stop -> target (the batch kernel's
    * precedence). Emits one fill per trade then marks the state done so
    * replays after the fill are ignored. Assumes per-trade bars arrive in
    * timestamp order (minute-bar feeds are ordered per contract; reorder
    * upstream with a watermark if the source cannot guarantee it). */
  def bracketStream(bars: Dataset[TradeBar]): Dataset[StreamFill] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.trade_id)
      .flatMapGroupsWithState[BracketState, StreamFill](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, chunk: Iterator[TradeBar], state: GroupState[BracketState]) =>
          var st = state.getOption.getOrElse(BracketState(0L, Double.NaN, done = false))
          val fills = scala.collection.mutable.ArrayBuffer.empty[StreamFill]
          chunk.toSeq.sortBy(_.t).foreach { b =>
            if (!st.done) {
              if (java.lang.Double.isNaN(st.entryPrice)) {
                if (b.t >= b.entry_ts)
                  st = BracketState(b.t, b.c * b.slippage, done = false)
              } else {
                val stop = st.entryPrice * b.stop_mult
                val target = st.entryPrice * b.target_mult
                if (b.t >= b.timeout_ts) {
                  fills += StreamFill(id, st.entryTs, st.entryPrice, b.t, b.c, "timeout")
                  st = st.copy(done = true)
                } else if (b.l <= stop) {
                  fills += StreamFill(id, st.entryTs, st.entryPrice, b.t, stop, "stop")
                  st = st.copy(done = true)
                } else if (b.h >= target) {
                  fills += StreamFill(id, st.entryTs, st.entryPrice, b.t, target, "target")
                  st = st.copy(done = true)
                }
              }
            }
          }
          state.update(st)
          fills.iterator
      }
  }

  case class SigDoc(doc_id: Long, bucket: Int, sig: Long)
  case class DupVerdict(doc_id: Long, dup_of: Long, hamming: Int)

  /** Streaming NEAR-duplicate suppression (q77's SimHash dedup made
    * incremental): each arriving doc's 64-bit SimHash is checked against
    * the signatures already seen in its 16-bit band bucket; within
    * `maxHamming` ⇒ emitted as a duplicate of the first-seen doc, else
    * recorded. State per bucket is a bounded list of (id, sig) longs —
    * never text — capped at `maxBucket` entries (oldest evicted), so
    * state size is bounded at any ingest rate; the bucket key also keeps
    * comparisons to the collision set, not the stream. Single-band
    * blocking trades recall for a single stateful operator: exact
    * replays always collide (identical sig ⇒ identical bucket), and a
    * near-dup at Hamming h escapes only if a flipped bit lands in the
    * top band (the batch q77 4-band path stays the full-recall
    * reference). Docs within one batch
    * are processed in doc_id order for determinism. */
  def nearDupDocStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3,
      maxBucket: Int = 4096): Dataset[DupVerdict] = {
    import docs.sparkSession.implicits._
    val sigs = docs.select(
      col(idCol).cast("long").as("doc_id"),
      graft.operators.Dedup.simhash64(col(textCol)).as("sig"))
      .withColumn("bucket", shiftrightunsigned(col("sig"), 48).cast("int"))
      .select($"doc_id", $"bucket", $"sig").as[SigDoc]
    sigs.groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Long)], DupVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, chunk: Iterator[SigDoc], state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil) // newest-first
          val out = scala.collection.mutable.ArrayBuffer.empty[DupVerdict]
          chunk.toSeq.sortBy(_.doc_id).foreach { d =>
            val hit = seen.iterator
              .map { case (id, s) => (id, java.lang.Long.bitCount(s ^ d.sig)) }
              .filter(_._2 <= maxHamming)
              .minOption(Ordering.by[(Long, Int), (Int, Long)](h => (h._2, h._1)))
            hit match {
              case Some((id, ham)) => out += DupVerdict(d.doc_id, id, ham)
              case None =>
                seen = ((d.doc_id, d.sig) :: seen).take(maxBucket)
                out += DupVerdict(d.doc_id, -1L, 0)
            }
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Streaming incremental MinHash near-dup detection —
    * [[graft.operators.Dedup.minhashNearDupsAgainst]] (q111) as a
    * continuous ingest. Arriving docs sign with the codegen'd MinHash
    * kernel, band, and probe the STATIC corpus through stream-static
    * joins, then verify exact Jaccard against corpus shingles.
    *
    * Entirely STATELESS: no state store, no watermark, so state never
    * grows with ingest — the corpus side can be 100 TB of bucketed
    * parquet while the stream side stays micro-batch-sized. The usual
    * obstacle is pair dedup (a pair collides in several bands; streaming
    * `distinct` would need unbounded state). Solved structurally: each
    * stream row carries its full band-hash array, the corpus row joins
    * its own back in, and a pair is emitted only from its FIRST
    * colliding band — exactly-once per (batch, corpus) pair per arrival
    * with zero state.
    *
    * Emits (batch_id, corpus_id, jaccard) in append mode; parity with
    * the batch operator on the q111 fixture is spec-asserted. */
  def minhashDedupStream(arrivals: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, k: Int = 32,
      bands: Int = 32, threshold: Double = 0.5): DataFrame = {
    import graft.operators.Dedup
    val rows = k / bands
    require(bands * rows == k, s"bands=$bands must divide k=$k")
    def signed(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId), col(textCol).as("text"))
        .withColumn("sig",
          graft.functions.FastHash.minhashSignature(col("text"), shingleN, k))
        .where(col("sig").isNotNull)
        .withColumn("bh",
          transform(Dedup.lshBands(col("sig"), bands, rows), bk => bk.getField("h")))
    val corpusSigned = signed(corpus, "corpus_id")
      .withColumn("sh_c",
        graft.functions.FastHash.shingles(col("text"), shingleN))
      .select(col("corpus_id"), col("bh").as("cbh"), col("sh_c"))
    val corpusBands = corpusSigned
      .select(col("corpus_id"),
        posexplode(col("cbh")).as(Seq("band", "h")))
    val streamBands = signed(arrivals, "batch_id")
      .withColumn("sh_b",
        graft.functions.FastHash.shingles(col("text"), shingleN))
      .select(col("batch_id"), col("bh"), col("sh_b"),
        posexplode(col("bh")).as(Seq("band", "h")))
    streamBands
      .join(corpusBands, Seq("band", "h")) // stream-static: stateless
      .join(corpusSigned.select(col("corpus_id"), col("cbh"), col("sh_c")),
        Seq("corpus_id"))
      // emit only from the pair's first colliding band — structural
      // exactly-once, no streaming distinct
      .where(col("band") ===
        array_position(zip_with(col("bh"), col("cbh"), (a, b) => a === b), lit(true)) - 1)
      .withColumn("jaccard",
        size(array_intersect(col("sh_b"), col("sh_c"))).cast("double") /
          size(array_union(col("sh_b"), col("sh_c"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  /** Streaming train/test decontamination (q89/q110 made incremental):
    * arriving docs are checked for 8-gram overlap with a STATIC test-set
    * shingle table. Stateless by construction — the test-set shingles
    * cross in as ONE broadcast array row and the per-doc count is a pure
    * `array_intersect` projection (shingle arrays are distinct on both
    * sides), so no explode/regroup aggregation and therefore no state
    * store. Emits (doc_id, n_shared_shingles) for contaminated docs
    * only; parity with the batch q89 result is spec-asserted. For
    * test sets too big to broadcast as an array, chain the codegen'd
    * bloom probe (q110) in front and keep this as the exact verify. */
  def decontaminateStream(arrivals: DataFrame, testDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 8): DataFrame = {
    val testArr = testDocs
      .select(explode(graft.functions.FastHash.shingles(col(textCol), shingleN)).as("sh"))
      .distinct()
      .agg(sort_array(collect_list(col("sh"))).as("test_sh"))
    arrivals
      .select(col(idCol).as("doc_id"),
        graft.functions.FastHash.shingles(col(textCol), shingleN).as("sh"))
      .crossJoin(broadcast(testArr))
      .withColumn("n_shared_shingles",
        size(array_intersect(col("sh"), col("test_sh"))).cast("long"))
      .where(col("n_shared_shingles") > 0)
      .select(col("doc_id"), col("n_shared_shingles"))
  }

  /** Streaming paragraph-level dedup against a static corpus
    * ([[graft.operators.Paragraphs]] made incremental): arriving docs
    * drop every paragraph whose md5 digest already exists in the corpus
    * paragraph set, keeping their own text otherwise intact. Stateless
    * like [[decontaminateStream]] — the corpus digests cross in as ONE
    * broadcast array row (sorted, so `array_contains` could binary-search
    * if it ever mattered) and the per-doc rewrite is a pure
    * order-preserving higher-order projection; no state store, no
    * shuffle of the stream. Within-batch novelty (two arrivals sharing a
    * NEW paragraph) is intentionally not deduped here — that is the
    * batch operator's keep-first job when the batch lands in the corpus.
    * Emits (doc_id, n_paras, n_dropped, kept_text); parity with the
    * batch operator on corpus-known paragraphs is spec-asserted. */
  def paraDedupStream(arrivals: DataFrame, corpus: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      sep: String = "\n", minChars: Int = 1): DataFrame = {
    val corpusDigests = corpus
      .select(explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("p"))
      .where(length(trim(col("p"))) >= minChars)
      .select(md5(col("p")).as("d")).distinct()
      .agg(sort_array(collect_list(col("d"))).as("known"))
    arrivals
      .select(col(idCol).as("doc_id"),
        split(col(textCol), java.util.regex.Pattern.quote(sep)).as("paras"))
      .crossJoin(broadcast(corpusDigests))
      .select(col("doc_id"),
        size(col("paras")).cast("long").as("n_paras"),
        size(filter(col("paras"), p =>
          length(trim(p)) >= minChars && array_contains(col("known"), md5(p))))
          .cast("long").as("n_dropped"),
        concat_ws(sep, filter(col("paras"), p =>
          length(trim(p)) < minChars || !array_contains(col("known"), md5(p))))
          .as("kept_text"))
  }

  /** Streaming SemDeDup against a static corpus ([[graft.operators
    * .SemDedup]] made incremental): arriving vectors are assigned their
    * argmax-cosine cell against the broadcast centroid table (the same
    * pure-projection fold as the batch operator), then compared against
    * ONLY their cell's corpus members — which cross in as one broadcast
    * map row of cell -> vector array, the q111 "batch side broadcasts,
    * corpus never reshuffles" shape inverted for streams. Stateless: no
    * state store, no shuffle of the stream; arrival-vs-arrival pairs are
    * intentionally not generated (that is the batch operator's job when
    * the batch lands). Emits (vec_id, cell, kept); kept = no corpus
    * member of the same cell has cosine >= threshold. */
  def semDedupStream(arrivals: DataFrame, corpus: DataFrame,
      centroids: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    import graft.operators.SemDedup
    val assignedCorpus = SemDedup.assignCells(corpus, idCol, vecCol, centroids)
    val cellMap = assignedCorpus.where(col("cell").isNotNull)
      .groupBy(col("cell")).agg(collect_list(col("v")).as("vs"))
      .agg(map_from_entries(collect_list(struct(col("cell"), col("vs")))).as("members"))
    SemDedup.assignCells(arrivals, idCol, vecCol, centroids)
      .crossJoin(broadcast(cellMap))
      .select(col("id").as(idCol), col("cell"),
        (col("cell").isNull ||
          !coalesce(
            exists(element_at(col("members"), col("cell")), m => {
              val c = graft.functions.FastHash.cosine(col("v"), m)
              c.isNotNull && !isnan(c) && c >= threshold
            }),
            lit(false))).as("kept"))
  }

  /** File-source incremental intake over a signals directory (the cron
    * append as a stream; batch-compatible schema required). */
  def signalsFileStream(spark: SparkSession, path: String,
      schemaDdl: String): DataFrame =
    spark.readStream.schema(schemaDdl).parquet(path)

  /** Streaming CDC chunk intake ([[graft.operators.Chunker]] made
    * incremental): arriving docs explode into content-defined chunks —
    * the chunker is a pure projection, so it runs on a stream unchanged —
    * and `dropDuplicates` on the chunk digest keeps only chunks the
    * stream has NOT stored yet, across micro-batches (state-store keyed
    * by digest; CDC boundaries make re-crawled edits re-send only the
    * edited chunk). The digest state grows with the distinct-chunk count
    * — that is the contract of EXACT global dedup storage; bound it with
    * `withWatermark` + `dropDuplicatesWithinWatermark` upstream when
    * only a recency window must dedup. Emits the store-this stream:
    * (doc_id, chunk_idx, digest, chunk_tokens). */
  def cdcChunkStream(arrivals: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", boundaryNibbles: Int = 2): DataFrame =
    graft.operators.Chunker
      .contentDefinedChunks(arrivals, idCol, textCol, boundaryNibbles)
      .dropDuplicates("digest")
      .select(col(idCol), col("chunk_idx"), col("digest"), col("chunk_tokens"))

  /** Streaming HyperLogLog — [[graft.operators.Sketches.hllRegisters]]
    * maintained live: each micro-batch folds into a max-per-register
    * streaming aggregation whose state is AT MOST 2^b rows forever,
    * regardless of stream volume (max is monotone, so no watermark and
    * no eviction are needed — the sketch never un-counts). Because the
    * register/rank derivation is the SAME md5 column expression the
    * batch builder uses, the streamed table after any prefix of batches
    * equals the batch sketch of that prefix exactly — parity is
    * spec-asserted, and [[graft.operators.Sketches.hllEstimate]] scores
    * either table identically. The live COUNT DISTINCT at 100 TB/day:
    * a dashboard reads 2^b rows, the stream never reshuffles raw keys. */
  def hllRegisterStream(keys: DataFrame, keyCol: String, b: Int): DataFrame = {
    require(b >= 4 && b <= 14, s"b must be in [4,14], got $b")
    keys.select(graft.operators.Sketches.hllRegCol(col(keyCol), b).as("reg"),
        graft.operators.Sketches.hllRankCol(col(keyCol)).as("rank"))
      .groupBy("reg").agg(max("rank").as("max_rank"))
  }

  /** Streaming Count-Min — [[graft.operators.Sketches.cmsBuild]] as a
    * live counting aggregation: state is exactly the depth×width cell
    * grid (additive counters, monotone — no watermark), each batch adds
    * its increments map-side before touching state. Identical cells to
    * the batch build (shared md5 cell map), so estimates read from the
    * streamed sketch match the batch sketch at every prefix. */
  def cmsStream(keys: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    keys.select(explode(array(
        graft.operators.Sketches.cmsCells(keyCol, depth, width): _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("c"))

  /** Streaming KMV — the third sketch twin ([[hllRegisterStream]],
    * [[cmsStream]] precedents): [[graft.operators.Sketches.kmvSketch]]
    * as a live aggregation whose state is the k-min distinct hash set
    * itself (<= k longs, FIXED however long the stream runs — the
    * [[graft.operators.Sketches.KMinDistinct]] buffer is k-bounded at
    * every reduce/merge). Set minima are arrival-order-insensitive and
    * the hash derivation is shared with batch, so the streamed sketch
    * equals the batch sketch over every prefix — and supports the same
    * union/Jaccard set algebra downstream. Output: (rank 1..n ascending,
    * h), n <= k. */
  def kmvStream(keys: DataFrame, keyCol: String, k: Int): DataFrame = {
    val kmin = udaf(new graft.operators.Sketches.KMinDistinct(k))
    keys.select(graft.operators.Sketches.kmvHashCol(col(keyCol)).as("h"))
      .agg(kmin(col("h")).as("hs"))
      .select(posexplode(col("hs")).as(Seq("pos", "h")))
      .select((col("pos") + 1).cast("long").as("rank"), col("h"))
  }

  /** Streaming skyline ([[graft.operators.Skyline]]'s twin): the
    * aggregation buffer IS the running Pareto frontier
    * ([[graft.operators.Skyline.FrontierAgg]]) — frontier-sized state
    * however long the stream runs, and since a skyline discard is
    * final, the streamed frontier after any prefix EQUALS the batch
    * skyline of that prefix (parity spec-asserted, the sketch-twin
    * contract). Input rows (idCol, one column per dim); dims follow
    * the batch operator's (column, maximize?) convention. Output per
    * trigger: the current frontier as (idCol, dims...) rows. */
  def skylineStream(rows: DataFrame, idCol: String,
      dims: Seq[(String, Boolean)]): DataFrame = {
    val fr = udaf(new graft.operators.Skyline.FrontierAgg())
    rows.select(col(idCol).cast("long").as("id"),
        array(dims.map { case (c, maximize) =>
          (if (maximize) col(c) else negate(col(c))).cast("double")
        }: _*).as("v"))
      .agg(fr(col("id"), col("v")).as("front"))
      .select(explode(col("front")).as("e"))
      .select((col("e._1").as(idCol) +: dims.zipWithIndex.map {
        case ((c, maximize), i) =>
          val o = col("e._2").getItem(i)
          (if (maximize) o else negate(o)).as(c)
      }): _*)
  }

  /** Streaming two-sample KS census ([[graft.operators.Divergence
    * .ksTwoSample]]'s twin, fourth of the sketch-twin family): state
    * is a FIXED `buckets`-row (bucket, count_a, count_b) census over a
    * declared [lo, hi] value domain — streaming cannot discover bounds
    * after the fact, so the domain is a parameter and out-of-range
    * values clamp to the edge buckets. Counts are additive and
    * monotone (no watermark exists to get wrong); the bucket id is the
    * same integer offset-division the batch operator uses, so the
    * streamed census after any prefix EQUALS the batch census of that
    * prefix, and the D derived from it equals the batch KS on
    * bucket-quantized values (parity spec-asserted). The live
    * "did the distribution move" monitor: a dashboard reads ≤ buckets
    * rows however long the stream runs. The same census also yields
    * the Wasserstein-1 area via [[graft.operators.Divergence
    * .wassersteinFromCensus]] — one state, two drift statistics. */
  def ksCensusStream(rows: DataFrame, valueCol: String,
      isRight: org.apache.spark.sql.Column, lo: Long, hi: Long,
      buckets: Int): DataFrame = {
    require(hi >= lo && buckets > 0, s"bad KS domain [$lo,$hi] x $buckets")
    val w = (hi - lo) / buckets + 1
    rows.select(
        least(lit(buckets - 1L), greatest(lit(0L),
          expr(s"(CAST($valueCol AS BIGINT) - $lo) div $w"))).as("b"),
        when(isRight, 1L).otherwise(0L).as("__r"))
      .groupBy(col("b"))
      .agg(sum(lit(1L) - col("__r")).as("ca"), sum(col("__r")).as("cb"))
  }

  /** Streaming SPRT census ([[graft.operators.Eval.sprt]]'s twin):
    * sequential testing is streaming-native — the whole point of Wald's
    * procedure is to stop the moment evidence suffices — and its
    * sufficient statistic per (scope, period) is just (n, successes).
    * The state store holds ONLY that census (scopes × periods, a
    * bounded calendar dimension — never event-scale), in complete
    * mode; [[graft.operators.Eval.sprtFromCensus]] turns any prefix of
    * it into the identical LLR walk and latched verdicts the batch
    * operator yields on the same rows (parity spec-asserted). */
  def sprtCensusStream(rows: DataFrame, scopeCol: String,
      periodCol: String, successCol: String): DataFrame =
    rows.select(col(scopeCol).as("sc"), col(periodCol).as("p"),
        when(col(successCol).cast("long") =!= 0L, 1L).otherwise(0L)
          .as("__y"))
      .groupBy(col("sc"), col("p"))
      .agg(sum(lit(1L)).as("n"), sum(col("__y")).as("s"))

  /** Streaming experiment-moment census ([[graft.operators.Eval.welchT]]
    * twin): per scope, ONLY the six exact sums (n, Σy, Σy²) per arm as
    * state — fixed-size however long the experiment runs, the
    * anytime-readable companion to [[sprtCensusStream]]. Feed the
    * output to [[graft.operators.Eval.welchTFromCensus]]: because the
    * census is exact integer/decimal arithmetic, the streamed moments
    * EQUAL the batch moments after any prefix, and so do t/df/d
    * (parity spec-asserted). armCol: nonzero = arm A. */
  def experimentCensusStream(rows: DataFrame, scopeCol: String,
      armCol: String, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val yD = col("__y").cast(dec)
    rows.select(col(scopeCol).as("sc"),
        when(col(armCol).cast("long") =!= 0L, 1L).otherwise(0L).as("__a"),
        col(valueCol).cast("long").as("__y"))
      .where(col("__y").isNotNull)
      .groupBy(col("sc"))
      .agg(sum(col("__a")).as("n_a"), sum(lit(1L) - col("__a")).as("n_b"),
        sum(when(col("__a") === 1L, yD).otherwise(lit(0).cast(dec)))
          .cast(dec).as("sa"),
        sum(when(col("__a") === 0L, yD).otherwise(lit(0).cast(dec)))
          .cast(dec).as("sb"),
        sum(when(col("__a") === 1L, (yD * yD).cast(dec))
          .otherwise(lit(0).cast(dec))).cast(dec).as("qa"),
        sum(when(col("__a") === 0L, (yD * yD).cast(dec))
          .otherwise(lit(0).cast(dec))).cast(dec).as("qb"))
  }

  /** Streaming trade-ledger census ([[graft.operators.Portfolio
    * .tradeStats]]'s twin, the [[experimentCensusStream]] pattern): per
    * scope ONLY the nine exact moments (n, wins, losses, Σp, Σp², Σp⁺,
    * Σ|p⁻|, Σ(p⁻)²) as state — fixed-size however long the ledger
    * runs, anytime-readable. Feed any prefix to
    * [[graft.operators.Portfolio.tradeStatsFromCensus]] and the whole
    * ratio board (win rate, profit factor, Kelly, Sharpe, Sortino)
    * EQUALS the batch operator on the same rows — the census is exact
    * integer arithmetic, so there is no drift surface (prefix-parity
    * spec-asserted in StreamingTwinCensusSpec). */
  def tradeCensusStream(rows: DataFrame, scopeCol: String,
      pnlCentsCol: String): DataFrame =
    graft.operators.Portfolio.tradeCensus(rows, scopeCol, pnlCentsCol)

  /** Streaming Kalman-input census ([[graft.operators.Forecast
    * .kalmanLevel]]'s twin, the [[sprtCensusStream]] pattern): per
    * (key, period) only the exact integer cents total — state bounded
    * by keys × periods, never events. Feed any prefix to
    * [[graft.operators.Forecast.kalmanLevelFromCensus]] and the
    * filtered level/variance/gain EQUAL the batch operator on the same
    * rows (exact census in, pinned fold out — parity spec-asserted). */
  def kalmanCensusStream(rows: DataFrame, keyCol: String,
      periodCol: String, centsCol: String): DataFrame =
    rows.select(col(keyCol).as("k"), col(periodCol).as("p"),
        col(centsCol).cast("long").as("__c"))
      .where(col("__c").isNotNull)
      .groupBy(col("k"), col("p"))
      .agg(sum(col("__c")).as("cents"))

  /** Streaming Grubbs census ([[graft.operators.Robust.grubbs]]'s
    * twin): per group the exact (n, Σx, Σx²) moments plus both
    * extreme candidates with pinned id tie-breaks — seven
    * prefix-aggregable values (the outlier argmax always sits at a
    * group extreme), all complete-mode-legal sums/mins/maxes. Feed
    * any prefix to [[graft.operators.Robust.grubbsFromCensus]] and
    * the named offender and statistic EQUAL the batch operator on the
    * same rows (parity spec-asserted). */
  def grubbsCensusStream(rows: DataFrame, groupCol: String,
      idCol: String, valueCol: String): DataFrame =
    graft.operators.Robust.grubbsCensus(rows, groupCol, idCol, valueCol)

  /** Streaming (key, period) sum census — the shared front half of
    * every period-census statistic whose batch operator CONSUMES a
    * census table ([[graft.operators.Autocorr.turningPoints]],
    * [[graft.operators.Regression.neweyWestTrend]] — both take
    * (key, ord, value) at period grain): stream the census in complete
    * mode, run the batch operator on the sink table. Per (key, ord)
    * the exact long sum is the whole state. */
  def periodCensusStream(rows: DataFrame, keyCol: String,
      ordCol: String, valueCol: String): DataFrame =
    rows.groupBy(col(keyCol).as("k"), col(ordCol).as("o"))
      .agg(sum(col(valueCol).cast("long")).as("x"))

  /** Streaming Herfindahl unit census ([[graft.operators.WeightedStats
    * .herfindahl]]'s twin, the grubbsCensusStream pattern): per
    * (scope, unit) the exact-decimal mass total is the whole state;
    * [[graft.operators.WeightedStats.herfindahlFromCensus]] reads the
    * sink for the HHI board. */
  def herfindahlCensusStream(rows: DataFrame, scopeCol: String,
      unitCol: String, massCol: String): DataFrame =
    graft.operators.WeightedStats.herfindahlCensus(rows, scopeCol,
      unitCol, massCol)

  /** Streaming Hellinger category census ([[graft.operators.Divergence
    * .hellinger]]'s twin): per category the two side counts are the
    * whole state; [[graft.operators.Divergence.hellingerFromCensus]]
    * reads the sink for BC + H. */
  def hellingerCensusStream(rows: DataFrame, catCol: String,
      isB: Column): DataFrame =
    graft.operators.Divergence.hellingerCensus(rows, catCol, isB)

  /** Streaming competing-risks duration census ([[graft.operators
    * .Survival.cumulativeIncidence]]'s twin): per duration the
    * (n_obs, d1, d2) cause counts are the whole state — the loud
    * 0/1/2 cause-code guard runs in the streaming projection too;
    * [[graft.operators.Survival.cumulativeIncidenceFromCensus]] reads
    * the sink for the Aalen–Johansen board. */
  def cifCensusStream(rows: DataFrame, durCol: String,
      causeCol: String): DataFrame =
    graft.operators.Survival.cifCensus(rows, durCol, causeCol)

  /** Streaming Mood's-median value census ([[graft.operators.Eval
    * .moodMedian]]'s twin, r12): per (scope, group, value) one long
    * count is the whole state — bounded by distinct value triples,
    * never stream length; [[graft.operators.Eval.moodMedianFromCensus]]
    * reads the sink for the pooled median + k×2 χ² board. */
  def moodCensusStream(rows: DataFrame, scopeCol: String,
      groupCol: String, valueCol: String): DataFrame =
    graft.operators.Eval.moodCensus(rows, scopeCol, groupCol, valueCol)

  /** Streaming Pettitt period census ([[graft.operators.ChangePoint
    * .pettitt]]'s twin, r13): per (key, period) one running total is
    * the whole state — bounded by the period grid, never stream
    * length; [[graft.operators.ChangePoint.pettittFromCensus]] reads
    * the sink for the rank-walk change-point board. */
  def pettittCensusStream(rows: DataFrame, keyCol: String,
      ordCol: String, valueCol: String): DataFrame =
    graft.operators.ChangePoint.pettittCensus(rows, keyCol, ordCol, valueCol)

  /** Streaming t-digest value census ([[graft.operators.Quantiles
    * .tdigest]]'s twin, r13): per (key, value) one long count is the
    * whole state — bounded by the value domain, never stream length;
    * [[graft.operators.Quantiles.tdigestFromCensus]] reads the sink
    * for the tapered centroid sketch. */
  def tdigestCensusStream(rows: DataFrame, keyCol: String,
      valueCol: String): DataFrame =
    graft.operators.Quantiles.tdigestCensus(rows, keyCol, valueCol)

  case class BurstState(times: List[Long], peak: Long, n: Long)
  case class BurstOut(user_id: Long, n_events: Long, peak_rate: Long)

  /** Streaming rolling-burst audit ([[graft.operators.Intervals
    * .rollingBurst]]'s twin): per key the state store keeps ONLY the
    * event times inside the current trailing window plus the running
    * (peak, count) — state is bounded by the key's true burst size,
    * never stream length, and `maxState` makes a pathological key loud
    * instead of silent. Each arriving event counts the window
    * (t − windowMs, t] over the pruned buffer — the batch RANGE-frame
    * rule exactly — so after any in-order prefix the streamed (n,
    * peak) per key EQUALS the batch operator on that prefix (parity
    * spec-asserted). Ordered arrival per key is the contract
    * ([[transitionStream]]); bound out-of-orderness upstream. Output
    * per trigger: the key's current totals (Update semantics). */
  def rollingBurstStream(events: DataFrame, windowMs: Long,
      maxState: Int = 100000): Dataset[BurstOut] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long"), col("ms").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[BurstState, BurstOut](GroupStateTimeout.NoTimeout) {
        (user: Long, evts: Iterator[(Long, Long)], state: GroupState[BurstState]) =>
          val st = state.getOption.getOrElse(BurstState(Nil, 0L, 0L))
          val buf = scala.collection.mutable.ArrayDeque.from(st.times)
          var peak = st.peak
          var n = st.n
          evts.map(_._2).toSeq.sorted.foreach { t =>
            buf.append(t)
            while (buf.nonEmpty && buf.head <= t - windowMs) buf.removeHead()
            require(buf.size <= maxState,
              s"burst state for key $user exceeds $maxState events per window")
            peak = math.max(peak, buf.size.toLong)
            n += 1
          }
          state.update(BurstState(buf.toList, peak, n))
          BurstOut(user, n, peak)
      }
  }

  case class TransState(ms: Long, eid: Long, tpe: String)
  case class TransitionOut(user_id: Long, prev: String, curr: String, ms: Long)

  /** Streaming order-1 transition extraction (q200's census made
    * incremental — [[graft.operators.Sequences.transitionCensus]] is
    * the batch twin): per user the state store keeps ONLY the last
    * event (ms, event_id, type) — bounded by the user population, not
    * stream length — and each arriving event emits its (prev, curr)
    * pair. Within a micro-batch events sort by (ms, event_id), the
    * batch census ordering; cross-batch order is the arrival contract
    * (bound out-of-orderness upstream with a watermark + sorted
    * replay). Downstream aggregation of the emitted pairs IS the
    * census. Input columns: (user_id, ms, event_id, event_type). */
  case class AsofEvent(user_id: Long, ms: Long, event_id: Long,
      value: Double, event_type: String, ets: java.sql.Timestamp)
  case class AsofState(clicks: List[(Long, Double)],
      pending: List[(Long, Long, Double)])
  case class AsofMatch(user_id: Long, event_id: Long, err_ms: Long,
      err_value: Double, click_value: Option[Double], asof_ts: Option[Long],
      asof_dir: String)

  /** Streaming nearest as-of join (q208's [[graft.operators.Joins
    * .asOfNearest]] made incremental): every `error` event matches its
    * closest `click` (either direction, ties backward — the batch pick
    * rule) of the same user. Streaming forces ONE semantic delta from
    * batch: nearest needs future knowledge, so the forward search is
    * bounded by `horizonMs` — an error emits only once the event-time
    * watermark passes err_ms + horizonMs (no closer future click can
    * still arrive), making the stream's answer equal to batch whenever
    * batch's forward pick is within the horizon. State per user is
    * bounded: clicks reduce to max-value per ms (the batch pre-reduce),
    * prune to the horizon window behind the oldest pending error plus
    * ONE latest-before candidate; unmatched errors emit with nulls.
    * The watermark (event time = ms, lateness = `delay`) is declared
    * here — the EventTimeTimeout contract needs the watermark column in
    * the grouped input — and emission wakes on event-time timeout, so
    * quiet users still drain. Input columns:
    * (user_id, ms, event_id, value, event_type). */
  def asOfNearestStream(events: DataFrame, horizonMs: Long,
      delay: String = "0 seconds"): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("ms").cast("long"),
        col("event_id").cast("long"), col("value").cast("double"),
        col("event_type"), timestamp_millis(col("ms")).as("ets"))
      .withWatermark("ets", delay)
      .as[AsofEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evts: Iterator[AsofEvent], state: GroupState[AsofState]) =>
          val st = state.getOption.getOrElse(AsofState(Nil, Nil))
          val arrived = evts.toSeq
          // clicks: max value per ms (batch's groupBy(user, ms).max)
          val clicks = (st.clicks ++ arrived.filter(_.event_type == "click")
              .map(e => e.ms -> e.value))
            .groupBy(_._1).map { case (ms, vs) => ms -> vs.map(_._2).max }
            .toList.sortBy(_._1)
          val pending = (st.pending ++ arrived.filter(_.event_type == "error")
            .map(e => (e.ms, e.event_id, e.value))).sortBy(p => (p._1, p._2))
          val wm = state.getCurrentWatermarkMs()
          val (ripe, still) = pending.partition(_._1 + horizonMs < wm)
          val out = ripe.map { case (ems, eid, ev) =>
            val back = clicks.filter(_._1 <= ems).lastOption
            val fwd = clicks.find(c => c._1 > ems && c._1 - ems <= horizonMs)
            (back, fwd) match {
              case (Some((bts, bv)), Some((fts, fv))) =>
                if (ems - bts <= fts - ems)
                  AsofMatch(user, eid, ems, ev, Some(bv), Some(bts), "backward")
                else AsofMatch(user, eid, ems, ev, Some(fv), Some(fts), "forward")
              case (Some((bts, bv)), None) =>
                AsofMatch(user, eid, ems, ev, Some(bv), Some(bts), "backward")
              case (None, Some((fts, fv))) =>
                AsofMatch(user, eid, ems, ev, Some(fv), Some(fts), "forward")
              case (None, None) =>
                AsofMatch(user, eid, ems, ev, None, None, "backward")
            }
          }
          // prune clicks: anything at/after the retention floor survives;
          // keep ONE click before it as the backward candidate. Floor =
          // oldest unresolved error, or the oldest error a late arrival
          // could still carry (wm - horizonMs).
          val floor = still.headOption.map(_._1)
            .getOrElse(if (wm > horizonMs) wm - horizonMs else 0L)
          val (before, after) = clicks.partition(_._1 < floor)
          val kept = before.lastOption.toList ++ after
          if (still.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsofState(kept, still))
            // wake when the oldest pending error ripens
            still.headOption.foreach(p =>
              state.setTimeoutTimestamp(p._1 + horizonMs + 1))
          }
          out.iterator
      }
  }

  def transitionStream(events: DataFrame): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("ms").cast("long"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TransState, TransitionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evts: Iterator[(Long, Long, Long, String)],
            state: GroupState[TransState]) =>
          val sorted = evts.toSeq.sortBy(e => (e._2, e._3))
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[TransitionOut]
          sorted.foreach { case (_, ms, eid, tpe) =>
            prev.foreach(p => out += TransitionOut(user, p.tpe, tpe, ms))
            prev = Some(TransState(ms, eid, tpe))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  case class PhState(t: Long, sx: Double, m: Double, mn: Double,
      na: Long, fa: Option[String], mx: Double)
  case class PhOut(key: String, n_obs: Long, n_alarms: Long,
      first_alarm: Option[String], max_stat: Double, ph_end: Double)

  /** Streaming Page–Hinkley drift monitor — the q359 twin
    * ([[graft.operators.ChangePoint.pageHinkley]] is the batch side):
    * per key the WHOLE state is (t, Σx, m, min m, alarm tallies) —
    * seven scalars however long the stream runs, which is the point of
    * PH as an online detector. The per-step arithmetic is the batch
    * fold verbatim (same division shapes, same strict `>` alarm), so a
    * chronologically-fed stream equals batch at every prefix
    * (spec-asserted); within a micro-batch rows sort by `ord` (the
    * batch census order), cross-batch order is the arrival contract.
    * Input columns: (key, ord, x). */
  def pageHinkleyStream(rows: DataFrame, delta: Double,
      threshold: Double): Dataset[PhOut] = {
    import rows.sparkSession.implicits._
    rows.select(col("key").cast("string"), col("ord").cast("string"),
      col("x").cast("double"))
      .as[(String, String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[PhState, PhOut](GroupStateTimeout.NoTimeout) {
        (key: String, evts: Iterator[(String, String, Double)],
            state: GroupState[PhState]) =>
          var st = state.getOption
            .getOrElse(PhState(0L, 0.0, 0.0, 0.0, 0L, None, 0.0))
          evts.toSeq.sortBy(_._2).foreach { case (_, o, x) =>
            val mNext = st.m + x - (st.sx + x) / (st.t + 1).toDouble - delta
            val stat = mNext - math.min(st.mn, mNext)
            st = PhState(st.t + 1, st.sx + x, mNext,
              math.min(st.mn, mNext),
              st.na + (if (stat > threshold) 1L else 0L),
              st.fa.orElse(if (stat > threshold) Some(o) else None),
              math.max(st.mx, stat))
          }
          state.update(st)
          PhOut(key, st.t, st.na, st.fa, st.mx, st.m - st.mn)
      }
  }

  case class GapState(lastMs: Long, n: Long, s1: String, s2: String)
  case class GapCensusOut(user_id: Long, n_gaps: Long, s1: String, s2: String)

  /** Streaming inter-event gap-moment census — the q372 burstiness
    * twin ([[graft.operators.Intervals.burstinessFromCensus]] is the
    * consumer): per user the WHOLE state is (last_ms, n, Σg, Σg²),
    * with the sums carried as decimal STRINGS so a year of
    * millisecond-scale gap squares can't overflow an encoder decimal
    * (BigInt-exact, the engine's integer discipline). Within a
    * micro-batch events fold in ms order (the batch lag() order);
    * cross-batch order is the arrival contract ([[transitionStream]]'s
    * convention — bound out-of-orderness upstream). Emits the updated
    * census per user per batch; feed it to burstinessFromCensus and
    * the streamed B equals batch after any prefix (spec-asserted). */
  def gapCensusStream(events: DataFrame): Dataset[GapCensusOut] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long"), col("ms").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[GapState, GapCensusOut](GroupStateTimeout.NoTimeout) {
        (user: Long, evts: Iterator[(Long, Long)], state: GroupState[GapState]) =>
          val sorted = evts.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(GapState(Long.MinValue, 0L, "0", "0"))
          var s1 = BigInt(st.s1); var s2 = BigInt(st.s2)
          var last = st.lastMs; var n = st.n
          sorted.foreach { ms =>
            if (last != Long.MinValue) {
              val g = BigInt(ms - last)
              s1 += g; s2 += g * g; n += 1
            }
            last = ms
          }
          st = GapState(last, n, s1.toString, s2.toString)
          state.update(st)
          GapCensusOut(user, n, s1.toString, s2.toString)
      }
  }

  case class FunnelAdvance(user_id: Long, stage: Int, step_name: String,
      ms: Long)

  /** Streaming funnel progression ([[graft.operators.Funnel]] made
    * incremental): per-user stage as ONE INT of managed state, advanced
    * as qualifying events arrive; each advance emits (user, stage,
    * step_name, event ms). Within a micro-batch events fold in
    * (ms, type) order — the batch tie-break — and cross-batch the state
    * carries the depth, so an in-event-time-order stream lands exactly
    * where [[graft.operators.Funnel.depthPerEntity]] does (asserted by
    * the twin spec); out-of-order arrivals across batch boundaries are
    * the documented divergence, bound it upstream with a watermark
    * buffer. State is bounded by the ACTIVE user vocabulary, not the
    * stream length. */
  def funnelStream(events: DataFrame, steps: Seq[String]): Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "at least one funnel step")
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("ms").cast("long"),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Int, FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evts: Iterator[(Long, Long, String)],
            state: GroupState[Int]) =>
          var st = state.getOption.getOrElse(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
          evts.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, ms, tpe) =>
            if (st < steps.length && tpe == steps(st)) {
              st += 1
              out += FunnelAdvance(user, st, steps(st - 1), ms)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
