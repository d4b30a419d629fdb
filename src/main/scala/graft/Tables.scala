package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst predicate pushdown /
  * column pruning apply; at cluster scale these would be partitioned
  * table locations — the API takes a directory so the same code runs
  * at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns whose parquet physical encoding has varied across
    * testdata generations: TIMESTAMP(NANOS) (readable only via the
    * nanosAsLong legacy flag, as LongType nanos) or TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (read as TIMESTAMP_NTZ by Spark 4 unless
    * inferTimestampNTZ is disabled). Either way the engine's contract is
    * a session-TZ (UTC) TimestampType column. */
  private val tsCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // runtime-settable confs; set defensively for sessions not built by
    // GraftSession (a foreign session would otherwise surface NTZ columns
    // that break every unix_millis/window-by-time call site)
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    } catch { case _: Throwable => }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    tsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case LongType =>
          // nanos -> micros truncation (matches DuckDB's TIMESTAMP_NS read)
          d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case TimestampNTZType =>
          // naive wall time == UTC instant under the engine's UTC session
          // TZ (matches DuckDB's naive TIMESTAMP read of the same file)
          d.withColumn(c, col(c).cast(TimestampType))
        case _ => d
      }
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
