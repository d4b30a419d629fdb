package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The public session factory must carry the engine's semantic doctrine —
  * a migrating user relies on these being right without reading BUILD
  * notes. (`spark.sql.extensions` is a static conf: it only takes effect
  * on a fresh SparkContext, which this shared-fixture JVM cannot provide;
  * the extensions path itself is covered by ExtensionsSkewSpec via
  * `withExtensions`.) */
class GraftSessionSpec extends AnyFunSuite with SparkFixture {

  test("GraftSession.local applies the doctrine confs on a fresh session") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s =
      try GraftSession.local(cores = 2, shufflePartitions = 7)
      finally {
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    assert(s.conf.get("spark.sql.shuffle.partitions") == "7")
    assert(s.conf.get("spark.sql.ansi.enabled") == "false")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    // non-ANSI semantics in action: failed cast -> null, not an exception
    assert(s.sql("SELECT CAST('oops' AS INT) AS v").head().isNullAt(0))
  }
}
