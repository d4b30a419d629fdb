package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Bootstrap, Freshness}

/** Contracts of [[Bootstrap.poissonReplicates]] and
  * [[Freshness.noveltyBySlice]] (q154/q151 cover cross-engine parity). */
class BootstrapFreshnessSpec extends AnyFunSuite with SparkFixture {

  test("poisson weights: bounded, mean ~1, variance ~1, deterministic") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val w = Bootstrap.poissonReplicates(df, "id", replicates = 3)
      .select($"replicate", $"weight").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(w.length == 6000)
    assert(w.forall { case (_, x) => x >= 0 && x <= 4 })
    val mean = w.map(_._2).sum.toDouble / w.length
    assert(math.abs(mean - 1.0) < 0.05, s"mean $mean") // capped tail shaves ~0.004
    val varc = w.map { case (_, x) => (x - mean) * (x - mean) }.sum / w.length
    assert(math.abs(varc - 1.0) < 0.1, s"variance $varc")
    // replicates differ from each other but reruns do not
    val byRep = w.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byRep.values.toSet.size > 1, s"replicates identical: $byRep")
    val again = Bootstrap.poissonReplicates(df.repartition(7), "id", 3)
      .groupBy("replicate").agg(sum("weight").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == byRep)
  }

  test("replicate aggregates estimate the true total within bootstrap noise") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val est = Bootstrap.poissonReplicates(df, "id", replicates = 10)
      .groupBy("replicate").agg(sum("weight").as("n_eff"))
      .collect().map(_.getAs[Long]("n_eff"))
    // each replicate ~ Poisson-bootstrap count of n=1000: sd ~ sqrt(1000)
    est.foreach(e => assert(math.abs(e - 1000L) < 150, s"replicate $e"))
  }

  test("novelty: a fresh corpus scores 1.0 everywhere, a re-ingested copy 0.0") {
    import spark.implicits._
    val fresh = (0L until 40L)
      .map(i => (i, (0 until 12).map(j => s"w${i}_$j").mkString(" ")))
    val reingested = fresh.take(20).map { case (i, t) => (i + 100L, t) }
    val df = (fresh ++ reingested).toDF("id", "text")
    val out = Freshness.noveltyBySlice(df, "id", "text", n = 4, sliceSize = 20L)
      .collect().map(r => r.getAs[Long]("slice") -> r.getAs[Double]("novelty_rate")).toMap
    assert(out(0L) == 1.0 && out(1L) == 1.0, s"fresh slices: $out")
    assert(out(5L) == 0.0, s"re-ingested slice: $out")
  }

  test("novelty attribution uses the FIRST occurrence, not any occurrence") {
    import spark.implicits._
    // the same gram in slices 0 and 1: slice 1 must not count it novel
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (25L, "alpha beta gamma delta zeta")).toDF("id", "text")
    val out = Freshness.noveltyBySlice(df, "id", "text", n = 4, sliceSize = 20L)
      .collect().map(r => r.getAs[Long]("slice") ->
        (r.getAs[Long]("grams_seen"), r.getAs[Long]("grams_novel"))).toMap
    assert(out(0L) == ((2L, 2L)))
    // doc 25 has grams "alpha beta gamma delta" (seen in slice 0) and
    // "beta gamma delta zeta" (new)
    assert(out(1L) == ((2L, 1L)), s"$out")
  }
}
