package graft
import org.apache.spark.sql.SparkSession
object BenchQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchq] $name min=${ts.min}%.3f")
    }
    spark.stop()
  }
}
