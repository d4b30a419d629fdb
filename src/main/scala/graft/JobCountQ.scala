package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic execution-shape probe: for each named declared query,
  * runs one untimed warm-up, evicts the session memos, then executes
  * the query once under a listener and prints the JOB / STAGE / TASK
  * counts and the summed executor task time. Job and stage counts are
  * a property of the PLAN (how many eager materializations + actions
  * the query performs), not of host load — the receipt of record when
  * wall-clock noise exceeds the effect being measured (e.g. removing
  * one localCheckpoint job). Usage:
  *   runMain graft.JobCountQ <sfDir> <q...>
  * Session config mirrors Bench's. */
object JobCountQ {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.JobCountQ <sfDir> <q...>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val only = args.drop(1).toSet
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
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    def settle(): Unit = { System.gc(); Thread.sleep(100) }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only(name) || only(name.takeWhile(_ != '_')) }
      .foreach { case (name, fn) =>
        settle()
        graft.queries.GraphStages.clear()
        graft.operators.Graph.AnfStage.clear()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
        settle()
        graft.queries.GraphStages.clear()
        graft.operators.Graph.AnfStage.clear()
        // settle the async listener bus so the warm-up's events don't
        // bleed into the measured window (the bus drains in ms locally;
        // the sleep is generous)
        Thread.sleep(500)
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        println(f"[jobcount] $name jobs=${jobs.get} stages=${stages.get} " +
          f"tasks=${tasks.get} task_sec=${taskMs.get / 1000.0}%.2f " +
          f"wall=$wall%.2f")
      }
    spark.stop()
  }
}
