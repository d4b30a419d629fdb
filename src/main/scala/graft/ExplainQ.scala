package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Plan-dump tool: writes `.explain("formatted")` output for named
  * declared queries to `<outDir>/<name>.txt` (no execution beyond any
  * eager stage materialization the query's own construction performs).
  * Usage: runMain graft.ExplainQ <sfDir> <outDir> <q...>   (no names =
  * every declared query). Session config mirrors Bench's. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.ExplainQ <sfDir> <outDir> <q...>")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) =>
        only.isEmpty || only(name) || only(name.takeWhile(_ != '_')) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val s = df.queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          Files.write(Paths.get(s"$outDir/$name.txt"), s.getBytes("UTF-8"))
          println(s"[explainq] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[explainq] FAILED $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
