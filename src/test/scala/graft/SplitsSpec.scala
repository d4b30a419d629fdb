package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Splits

/** Properties that make [[Splits.hashSplit]] usable as THE split
  * mechanism of an incremental pipeline (q98 covers cross-engine
  * parity; this covers the contract). */
class SplitsSpec extends AnyFunSuite with SparkFixture {

  private val weights = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))

  test("every row gets exactly one split; rates approximate the weights") {
    import spark.implicits._
    val df  = (0L until 4000L).toDF("id")
    val out = Splits.hashSplit(df, "id", weights)
    val byS = out.groupBy("split").count().collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("count")).toMap
    assert(byS.values.sum == 4000L)
    assert(byS.keySet == Set("train", "val", "test"))
    // binomial tolerance at n=4000: +-3 sigma ~ +-0.02
    assert(math.abs(byS("train") / 4000.0 - 0.8) < 0.03, byS)
    assert(math.abs(byS("val") / 4000.0 - 0.1) < 0.03, byS)
  }

  test("assignment is stable when the corpus grows (incremental property)") {
    import spark.implicits._
    val small = Splits.hashSplit((0L until 500L).toDF("id"), "id", weights)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    val big = Splits.hashSplit((0L until 2000L).toDF("id"), "id", weights)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    small.foreach { case (id, s) => assert(big(id) == s) }
  }

  test("split is a pure projection — no shuffle in the plan") {
    import spark.implicits._
    val plan = Splits.hashSplit((0L until 10L).toDF("id"), "id", weights)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("degenerate weights are rejected") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    assertThrows[IllegalArgumentException] {
      Splits.hashSplit(df, "id", Seq(("only", 1.0)))
    }
    assertThrows[IllegalArgumentException] {
      Splits.hashSplit(df, "id", Seq(("a", 0.5), ("b", 0.6)))
    }
  }
}
