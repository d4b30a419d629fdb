package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources with pinned schemas (SURVEY §2.1 S1/S2/S11/S13; §1.2: "our
  * engine will pin explicit StructTypes and treat schema drift as an
  * explicit evolution step"). Schema inference is a correctness hazard at
  * scale (sampling) and a performance hazard (extra pass) — every reader
  * here takes the schema. */
object Readers {

  /** S2: snapshot/metadata JSON with explicit nested schema. */
  def json(spark: SparkSession, path: String, schema: StructType,
      mergeSchema: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("mergeSchema", mergeSchema.toString).json(path)

  /** S11: headered CSV with explicit schema (no inference pass). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S1: newline-delimited universe text -> trimmed, upper-cased,
    * distinct single-column frame (overnight_scanner.py:299-311). */
  def universeText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(upper(trim(col("value"))).as("ticker"))
      .where(length(col("ticker")) > 0)
      .distinct()

  /** S13 read side: parquet with schema-drift tolerance (mergeSchema) for
    * the append-with-field-addition tables. */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** ORC source (second columnar format; predicate pushdown + column
    * pruning work the same as parquet — plan-asserted in spec). */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
