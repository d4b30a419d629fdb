package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Heavy

/** Misra–Gries guarantees on a skewed corpus, exercised across real
  * partial-aggregate merges (repartition(8)). */
class HeavySpec extends AnyFunSuite with SparkFixture {

  test("guaranteed heavy hitters survive with bounded undercount") {
    import spark.implicits._
    // hot: 500, warm: 120, cold: 400 singletons -> N = 1020
    val words = Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 400).map(i => s"cold$i")
    val df = new scala.util.Random(7).shuffle(words)
      .grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
      .repartition(8)
    val k = 20
    val n = 1020.0
    val out = Heavy.heavyHitters(df, "text", k).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("mg_count")).toMap
    // every token with true count > N/k (=51) must be present
    assert(out.contains("hot") && out.contains("warm"), out)
    // counts are lower bounds with error <= N/k
    assert(out("hot") <= 500 && out("hot") >= 500 - n / k, out("hot"))
    assert(out("warm") <= 120 && out("warm") >= 120 - n / k, out("warm"))
    // summary never exceeds k-1 counters
    assert(out.size <= k - 1)
  }

  test("exactTopK equals the exact unbounded census top-N when certified") {
    import spark.implicits._
    // hot tokens far above N/k; long singleton tail that MG must prune
    val words = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma") ++ (0 until 500).map(i => s"tail$i")
    val df = new scala.util.Random(11).shuffle(words)
      .grouped(10).map(_.mkString(" ")).toSeq.toDF("text").repartition(8)
    val got = Heavy.exactTopK(df, "text", mgK = 8, topN = 3).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("freq"))).toSeq
    // EXACT counts (not MG lower bounds), exact ranking
    assert(got == Seq(("alpha", 400L), ("beta", 300L), ("gamma", 200L)), got)
  }

  test("exactTopK aborts loudly when the distribution defeats the certificate") {
    import spark.implicits._
    // uniform: no token exceeds N/k, the top-N certificate cannot hold
    val df = (0 until 300).map(i => s"u${i % 30}").grouped(10)
      .map(_.mkString(" ")).toSeq.toDF("text").repartition(4)
    assertThrows[IllegalStateException] {
      Heavy.exactTopK(df, "text", mgK = 8, topN = 3)
    }
  }

  test("uniform stream yields no certified heavy hitters above the bound") {
    import spark.implicits._
    val df = (0 until 300).map(i => s"u$i").grouped(10)
      .map(_.mkString(" ")).toSeq.toDF("text").repartition(4)
    val out = Heavy.heavyHitters(df, "text", k = 10, minCount = 300 / 10 + 1)
    // nothing is (N/k)-heavy in a uniform stream
    assert(out.count() == 0)
  }
}
