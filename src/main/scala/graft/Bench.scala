package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. Results are fully
  * materialized through a `noop`-format write (forces every operator and
  * projection to execute — a bare count() would let Catalyst prune work).
  *
  * Isolation (the r8 adjacency-contamination fix): a single shared JVM
  * accumulates GC and code-cache pressure across 380 queries, which
  * inflated the heaviest queries' closing numbers 3-4x over their
  * isolated times (q364: 25.7 s in-suite vs 6.6 s alone — a harness
  * artifact, not a plan change). So the no-args (driver) mode forks one
  * child JVM per ~64-query batch, then RE-measures the slowest
  * `IsolateK` queries each in a fresh single-query JVM and keeps those
  * numbers — per-query timings now reflect the plan, not the neighbor's
  * garbage. With explicit query args (local iteration) the process runs
  * them inline, exactly as before.
  */
object Bench {
  /** Batch size per forked JVM: small enough that heap pressure cannot
    * build across a long tail, large enough that JVM+Spark startup
    * (~10 s) stays noise against a batch's ~60 s of query work. */
  private val BatchSize = 64

  /** After the batch pass, this many slowest queries are re-measured in
    * fresh single-query JVMs (covers the 2x-gate band with margin). */
  private val IsolateK = 12

  /** Any query whose batched time exceeds this factor times its
    * BEST-EVER recorded value (min across the committed full registry
    * [[BestEverPath]], every committed BENCH_r*.json, and the working
    * bench_out.json) is also isolated. Best-ever, not previous-round
    * (the r10 VERDICT's blind-band finding): a query drifting 1.4x per
    * round never trips a previous-round trigger, but its cumulative
    * drift vs the best recorded value does — so sub-1.5x creep earns
    * an isolation receipt the round it accumulates past 1.5x of the
    * best number this plan has ever posted. */
  private val RegressFactor = 1.5

  /** Absolute slack under the ratio trigger (r12): the registry's
    * all-time minimums include light-query numbers from the 30-query
    * era's lighter batches, so a PURE ratio trigger fired for ~130
    * sub-second queries in the first full r12 run (0.1 s-scale batch
    * jitter, not drift) and tripled bench wall time on isolation
    * re-runs. A regression must clear BOTH gates: 1.5x the best-ever
    * AND half a second over it — q108's 0.42→0.98 class still
    * triggers, 0.08→0.3 jitter does not. */
  private val RegressSlackSec = 0.5

  /** Cap on regression-TRIGGERED isolation re-runs per full bench (r14,
    * the r13 VERDICT wall-budget ask: each isolation is a fresh JVM +
    * Spark init + warmup + iters ≈ 15-25 s, and a loaded driver session
    * can fire the 1.5× trigger on dozens of queries at once — r13's
    * driver run died at rc=124 partly under that tax). The IsolateK
    * slowest are always isolated; past that, only the [[MoverCap]]
    * worst offenders by batched/best ratio get receipts — the rest are
    * reported on stderr and keep their batched numbers. */
  private val MoverCap = 8

  /** Committed FULL per-query best-ever registry (r12, the r11
    * VERDICT's q108 blind spot: driver-emitted BENCH_r*.json lines
    * persist only the top-~120 queries, so sub-top-120 best-evers
    * rested solely on the single overwritable bench_out.json — a light
    * query could drift >2x without ever earning an isolation receipt).
    * Written back min-merged after every full forked run, so the
    * trigger's baseline survives bench_out.json overwrites AND is
    * reviewable in git history. Same one-line `"queries":{...}` format
    * as the artifacts (parsed by [[parseQueries]]). */
  private val BestEverPath = "tools/bench_best.json"

  /** The isolation trigger's regression predicate: a batched time is a
    * regression only when it clears BOTH gates against the best-ever —
    * [[RegressFactor]]× AND [[RegressSlackSec]] over (r12 slack guard;
    * r13 VERDICT ask: a ~0.5 s fixed scheduling/JIT floor in loaded
    * batched runs made a pure ratio trigger misread 0.05 s queries as
    * 10× regressions and burn isolation slots on jitter). */
  private[graft] def regressed(batched: Double, best: Double): Boolean =
    batched > best * RegressFactor && batched - best > RegressSlackSec

  def main(args: Array[String]): Unit = {
    val only = args.toSet
    if (only.nonEmpty || sys.env.contains("GRAFT_BENCH_CHILD"))
      runInline(args.toSeq.sorted)
    else runForked()
  }

  // ---------------------------------------------------------------- parent

  /** Matches build.sbt's jdk17AddOpens: children are raw `java` forks,
    * so the module opens Spark 4 needs on JDK 17 must be re-stated. */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Forks a child JVM running the named queries; returns the child's
    * (prefix -> seconds) timings and errored prefixes. The child writes
    * its full JSON to a temp file (its stdout is drained to OUR stderr:
    * the parent's final stdout line must stay the only JSON there). */
  private def runChild(names: Seq[String], tag: String)
      : (Map[String, Double], Seq[String]) = {
    val out = java.nio.file.Files.createTempFile(s"bench_$tag", ".json")
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.Bench") ++ names)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("GRAFT_BENCH_CHILD", "1")
    pb.environment().put("SPARK_GRAFT_BENCH_OUT", out.toString)
    // child stdout+stderr both drain to OUR stderr (the parent's final
    // stdout line must stay the only JSON the harness tail sees)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.PIPE)
    val p = pb.start()
    val drain = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      Iterator.continually(r.readLine()).takeWhile(_ != null)
        .foreach(l => System.err.println(s"[child:$tag] $l"))
    })
    drain.setDaemon(true)
    drain.start()
    val rc = p.waitFor()
    drain.join(5000)
    val text =
      try new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
      catch { case _: Throwable => "" }
    java.nio.file.Files.deleteIfExists(out)
    if (rc != 0) System.err.println(s"[bench] child $tag exited rc=$rc")
    (parseQueries(text), parseErrs(text))
  }

  /** Minimal parsers for our own child output (fixed, self-authored
    * format — no JSON library on the main classpath). */
  private[graft] def parseQueries(json: String): Map[String, Double] = {
    val m = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(json)
    m.map(_.group(1)).getOrElse("").split(",").filter(_.nonEmpty).flatMap {
      kv =>
        val Array(k, v) = kv.split(":", 2)
        scala.util.Try(k.trim.stripPrefix("\"").stripSuffix("\"") ->
          v.trim.toDouble).toOption
    }.toMap
  }

  private def parseErrs(json: String): Seq[String] = {
    val m = """"errs":\[([^\]]*)\]""".r.findFirstMatchIn(json)
    m.map(_.group(1)).getOrElse("").split(",").filter(_.nonEmpty)
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
  }

  /** Best-ever per-query seconds: min over the committed registry, the
    * committed BENCH_r*.json artifacts (top-120-truncated, still useful
    * for heavy queries) and the working bench_out.json. Package-visible
    * for the registry spec. */
  private[graft] def bestEver(
      registryPath: String = BestEverPath): Map[String, Double] = {
    val files = try {
      val dir = java.nio.file.Paths.get(".")
      val rs = java.nio.file.Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.matches("BENCH_r\\d+\\.json"))
        .toSeq
      rs ++ Seq("bench_out.json", registryPath)
    } catch { case _: Throwable => Seq("bench_out.json", registryPath) }
    files.flatMap { f =>
      try parseQueries(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)), "UTF-8")).toSeq
      catch { case _: Throwable => Seq.empty }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
  }

  /** Min-merge this run's recorded times into the registry. Keys never
    * recorded before enter at their current value; retired queries keep
    * their historical row (harmless — the trigger only reads keys the
    * current run produced). */
  private[graft] def writeBestEver(times: Map[String, Double],
      registryPath: String = BestEverPath): Unit =
    try {
      val merged = (bestEver(registryPath).toSeq ++ times.toSeq)
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      val body = merged.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + f"\":$v%.3f" }
        .mkString("{\"queries\":{", ",", "}}")
      val p = java.nio.file.Paths.get(registryPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
      System.err.println(s"[bench] best-ever registry updated " +
        s"(${merged.size} queries) -> $registryPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] best-ever registry write failed: $e")
    }

  /** 1-minute system load average (-1.0 where the JVM cannot read it)
    * — the host-telemetry primitive the r11 VERDICT asked for: a
    * 7.39s-vs-2.89s cross-session gap on identical code must be
    * attributable from the artifact alone. */
  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  private def runForked(): Unit = {
    val loadStart = loadAvg()
    val tsStart = System.currentTimeMillis
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val all = SparkEntry.queries.keys.toSeq.sorted
    val byPrefix = all.map(n => n.takeWhile(_ != '_') -> n).toMap
    val batches = all.grouped(BatchSize).toSeq
    var times = Map.empty[String, Double]
    var errs = List.empty[String]
    batches.zipWithIndex.foreach { case (b, i) =>
      System.err.println(
        s"[bench] batch ${i + 1}/${batches.size} (${b.size} queries)")
      val (t, e) = runChild(b, s"b$i")
      times ++= t
      errs ++= e
      val missing = b.map(_.takeWhile(_ != '_'))
        .filterNot(p => t.contains(p) || e.contains(p))
      if (missing.nonEmpty) { // child died mid-batch: loud, not silent
        System.err.println(s"[bench] batch $i lost: ${missing.mkString(",")}")
        errs ++= missing
      }
    }
    // second pass: re-measure alone in fresh JVMs. The pass exists to
    // DETECT adjacency inflation: when the batch number far exceeds the
    // isolated one, the neighbor's garbage was in the window and the
    // isolated number is the honest one. The recorded value is
    // min(batched, isolated) — the best steady state the SAME plan
    // achieved — because a fresh single-query JVM pays a ~1 s
    // under-warmed-JIT penalty (measured: isolated ran ABOVE batch for
    // every heavy query once batches shrank to 64), and recording that
    // environment cost as the query's would manufacture regressions.
    // Two triggers (r10, VERDICT ask #3 — the r9 CC-family cluster rode
    // batched noise because only the slowest K were isolated):
    //   (a) the slowest IsolateK queries, and
    //   (b) ANY query whose batched time exceeds RegressFactor x its
    //       BEST-EVER recorded value (min over all BENCH_r*.json in the
    //       repo root plus the prior bench_out.json), so cumulative
    //       sub-1.5x-per-round drift still earns a receipt.
    // Queries whose recorded number came from the isolated JVM carry
    // "isolated" in the emitted per-query "source" map; the rest carry
    // "batched". The legacy "isolated" list is kept for old parsers.
    val prior: Map[String, Double] = bestEver()
    val allMovers = times.filter { case (p, t) =>
      prior.get(p).exists(regressed(t, _)) }.keySet
    val heavy = times.toSeq.sortBy(-_._2).take(IsolateK).map(_._1).toSet
    // r14: cap the trigger-driven extras at MoverCap, worst first by
    // batched/best ratio (see MoverCap scaladoc); over-cap movers are
    // named on stderr so drift is still visible even without a receipt
    val movers = allMovers.diff(heavy).toSeq
      .sortBy(p => -(times(p) / prior(p))).take(MoverCap).toSet
    if (movers.nonEmpty)
      System.err.println(s"[bench] regression-triggered isolation: " +
        movers.toSeq.sorted.mkString(","))
    val overCap = allMovers.diff(heavy).diff(movers)
    if (overCap.nonEmpty)
      System.err.println(s"[bench] regression trigger OVER MoverCap=" +
        s"$MoverCap (batched numbers kept): " +
        overCap.toSeq.sorted.mkString(","))
    var isolatedTag = Set.empty[String]
    var isoLoad = Map.empty[String, Double]
    (heavy ++ movers).toSeq.sorted.foreach { prefix =>
      val batched = times(prefix)
      byPrefix.get(prefix).foreach { full =>
        val la = loadAvg()
        isoLoad += prefix -> la
        System.err.println(
          f"[bench] isolating $prefix (batched ${batched}s, load $la%.2f)")
        val (t, _) = runChild(Seq(full), s"iso_$prefix")
        t.get(prefix).foreach { iso =>
          System.err.println(f"[bench] $prefix batched $batched%.2f / " +
            f"isolated $iso%.2f -> recording ${math.min(batched, iso)}%.2f")
          if (iso < batched) { times += prefix -> iso; isolatedTag += prefix }
        }
      }
    }
    writeBestEver(times)
    emit(times.toSeq.sortBy(_._1), errs.distinct, sfDir, iters,
      isolated = isolatedTag,
      host = hostJson(loadStart, tsStart, isoLoad))
  }

  /** Host-telemetry JSON object: load average at run start / emit time,
    * logical CPU count, wall-clock start/end (epoch ms) and — for every
    * isolation rerun — the load average observed just before its child
    * JVM launched. BASELINE.md pins this under "bench artifact schema";
    * parsers that only read "queries"/"errs" are unaffected. */
  private def hostJson(loadStart: Double, tsStart: Long,
      isoLoad: Map[String, Double]): String = {
    val iso = isoLoad.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + f"\":$v%.2f" }
      .mkString("{", ",", "}")
    f"""{"load_start":$loadStart%.2f,"load_end":${loadAvg()}%.2f,""" +
      s""""cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""ts_start":$tsStart,"ts_end":${System.currentTimeMillis},""" +
      s""""iso_load":$iso}"""
  }

  // ---------------------------------------------------------------- child

  private def runInline(names: Seq[String]): Unit = {
    val loadStart = loadAvg()
    val tsStart = System.currentTimeMillis
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // one warm-up action so JVM/codegen startup cost lands outside timings
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val only = names.toSet
    // A failing query must NOT be folded into totals as a fast "success"
    // (its time-to-exception is not a timing): record it under errs and
    // exclude it from queries/total so regressions are visible in the
    // bench artifact itself.
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    // Session-memoized materialized stages (GraphStages, Graph.AnfStage)
    // exist for cluster composition, where one written snapshot feeds
    // many readers. In a per-query benchmark they would launder the
    // shared input-build cost out of every timed region (the r13 VERDICT
    // gaming flag), so the memos are evicted before the warm-up AND
    // before EVERY timed iteration: each timed execution pays its own
    // full input build from the parquet scans, exactly like a
    // non-memoized query.
    def clearMemos(): Unit = {
      graft.queries.GraphStages.clear()
      graft.operators.Graph.AnfStage.clear()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, fn) =>
        // settle the JVM between queries even within a batch: the gc
        // plus a short sleep lets the async ContextCleaner finish
        // unpersisting the PREVIOUS query's checkpointed blocks instead
        // of storming whoever runs next (the BenchScale lesson; observed
        // q364 8.5 s isolated vs 37.6 s after seven checkpoint-heavy
        // graph queries in one JVM). r14: sleep trimmed 200 -> 50 ms
        // (the r13 VERDICT wall-budget ask; 465 queries paid ~93 s of
        // pure sleep — the gc itself is the part that settles the
        // cleaner, the sleep only needs to yield the queues).
        System.gc()
        Thread.sleep(50)
        clearMemos()
        // per-query untimed warm-up: planning + Janino codegen happen
        // here, so even a single timed iteration records the steady
        // state the engine would show on a long-running cluster
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val times = (1 to iters).map { _ =>
            clearMemos() // timed region includes any memoized build
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          Some(name -> times.min)
        } catch { case e: Throwable =>
          errs(name) = e.getClass.getSimpleName
          System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
          None
        }
      }
    spark.stop()
    emit(results.map { case (k, v) => k.takeWhile(_ != '_') -> v },
      errs.keys.map(_.takeWhile(_ != '_')).toSeq, sfDir, iters,
      // local subset iteration keeps its own artifact name (children
      // always receive an explicit SPARK_GRAFT_BENCH_OUT)
      if (names.nonEmpty) "bench_subset.json" else "bench_out.json",
      host = hostJson(loadStart, tsStart, Map.empty))
  }

  // ------------------------------------------------------------------ emit

  /** Writes the full JSON artifact and prints a stdout line bounded to
    * the harness's 2000-char tail (same contract as every prior round).
    * Keys are qNN prefixes only; full names recoverable from
    * SparkEntry.queries. */
  private def emit(results: Seq[(String, Double)], errPrefixes: Seq[String],
      sfDir: String, iters: Int, defaultOut: String = "bench_out.json",
      isolated: Set[String] = Set.empty, host: String = "{}"): Unit = {
    val prefixes = results.map(_._1)
    require(prefixes.distinct.size == prefixes.size,
      s"duplicate qNN prefixes: ${prefixes.diff(prefixes.distinct).distinct.mkString(",")}")
    def enc(k: String, v: Double) = "\"" + k + f"\":$v%.3f"
    val qs = results.map { case (k, v) => enc(k, v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errJson = errPrefixes.map(k => "\"" + k + "\"")
      .mkString("[", ",", "]")
    // which recorded values came from the single-query isolation JVM
    // (everything else is batched) — kept as a list for old parsers,
    // AND written per-query in the "source" map so regression triage is
    // one-file-self-contained (BASELINE.md pins this schema)
    val isoJson = isolated.toSeq.sorted.map(k => "\"" + k + "\"")
      .mkString("[", ",", "]")
    val srcJson = results.map { case (k, _) =>
      "\"" + k + "\":\"" + (if (isolated(k)) "isolated" else "batched") + "\""
    }.mkString("{", ",", "}")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters,"warmup":true,"errs":$errJson,"isolated":$isoJson,"host":$host,"source":$srcJson}"""
    val sorted = results.sortBy(-_._2)
    val head =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","iters":$iters,"warmup":true,"errs":$errJson,"isolated":$isoJson,"host":$host,"full":"bench_out.json","""
    val budget = 1800 - head.length - 60
    val (kept, _) = sorted.foldLeft((List.empty[String], 0)) {
      case ((acc, len), (k, v)) =>
        val e = enc(k, v)
        if (len + e.length + 1 <= budget) (e :: acc, len + e.length + 1)
        else (acc, len)
    }
    val shortLine = head + "\"omitted\":" + (results.size - kept.size) +
      ",\"queries\":" + kept.reverse.mkString("{", ",", "}") + "}"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        defaultOut)),
      line.getBytes("UTF-8"))
    println(if (line.length <= 1800) line else shortLine)
  }
}
