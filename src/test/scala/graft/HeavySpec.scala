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

  test("uniform stream yields no certified heavy hitters above the bound") {
    import spark.implicits._
    val df = (0 until 300).map(i => s"u$i").grouped(10)
      .map(_.mkString(" ")).toSeq.toDF("text").repartition(4)
    val out = Heavy.heavyHitters(df, "text", k = 10, minCount = 300 / 10 + 1)
    // nothing is (N/k)-heavy in a uniform stream
    assert(out.count() == 0)
  }
}
