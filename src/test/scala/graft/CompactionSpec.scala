package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

/** Compaction planner (q226's operator, off-fixture). */
class CompactionSpec extends AnyFunSuite with SparkFixture {

  test("sequential fill: straddling unit stays in the earlier bin") {
    import spark.implicits._
    // masses 60,60,60 at target 100: cum-before 0,60,120 -> bins 0,0,1
    val stats = Seq(("f1", 60L), ("f2", 60L), ("f3", 60L)).toDF("file", "mass")
    val got = Compaction.planBins(stats, Nil, "mass", Seq(col("file")), 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("f1" -> 0L, "f2" -> 0L, "f3" -> 1L))
  }

  test("partition slices plan independently; summary rolls up the manifest") {
    import spark.implicits._
    val stats = Seq(("a", "u1", 80L), ("a", "u2", 80L), ("a", "u3", 30L),
      ("b", "u1", 10L), ("b", "u2", 10L)).toDF("part", "unit", "mass")
    val planned = Compaction.planBins(stats, Seq("part"), "mass",
      Seq(col("unit")), 100L)
    val bins = planned.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    // a: cum-before 0,80,160 -> 0,0,1 ; b restarts: 0,10 -> 0,0
    assert(bins === Map(("a", "u1") -> 0L, ("a", "u2") -> 0L,
      ("a", "u3") -> 1L, ("b", "u1") -> 0L, ("b", "u2") -> 0L))
    val sum = Compaction.binSummary(planned, Seq("part"), "mass", "unit")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(sum(("a", 0L)) === ((2L, 160L, "u1", "u2")))
    assert(sum(("a", 1L)) === ((1L, 30L, "u3", "u3")))
    assert(sum(("b", 0L)) === ((2L, 20L, "u1", "u2")))
  }

  test("non-tail bins stay within one max-unit of the target") {
    import spark.implicits._
    val stats = Seq.tabulate(40)(i => (f"u$i%02d", (i % 7 + 1) * 10L))
      .toDF("unit", "mass")
    val planned = Compaction.planBins(stats, Nil, "mass",
      Seq(col("unit")), 100L)
    val byBin = planned.collect().map(r => r.getLong(2) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val last = byBin.keys.max
    // sequential fill: cum through the end of bin b lands in
    // [(b+1)·target, (b+1)·target + maxUnit), so each non-tail bin's
    // mass is within one max-unit (70) of target on both sides
    var cum = 0L
    (0L to last).foreach { bin =>
      val mass = byBin(bin)
      cum += mass
      if (bin != last) {
        assert(mass > 100L - 70L && mass < 100L + 70L,
          s"bin $bin out of band: $mass")
        assert(cum >= (bin + 1) * 100L && cum < (bin + 1) * 100L + 70L,
          s"cum through bin $bin out of band: $cum")
      }
    }
    assert(cum === 1550L) // Σ (i%7+1)*10 over 40 units = 5·280 + 150
  }

  test("fileCensus counts rows per physical file via input_file_name") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_census").toString
    Seq.tabulate(100)(i => (i, s"row$i")).toDF("id", "s")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val census = Compaction.fileCensus(spark.read.parquet(dir)).collect()
    assert(census.length === 4)
    assert(census.map(_.getLong(1)).sum === 100L)
    census.foreach(r => assert(r.getString(0).contains(dir.split('/').last)))
  }
}
