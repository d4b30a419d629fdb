package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared SparkEntry query runs on sf0.001 and yields a readable
  * result (the full value-level oracle check is the driver's DuckDB gate;
  * local parity harness: tools/check_oracle.py). */
class QueriesSmokeSpec extends AnyFunSuite with SparkFixture {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet.diff(qs)
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("every declared query has an oracle (zero-err board invariant: " +
      "a query DuckDB can't replay belongs in specs, not on the board)") {
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.count() // materialize
    }
  }
}
