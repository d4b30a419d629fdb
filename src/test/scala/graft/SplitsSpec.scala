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

  test("stratifiedSample: listed strata thin out, unlisted pass through") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val out = Splits.stratifiedSample(df, "id", "src",
      Map("src0" -> 0.25, "src1" -> 1.0))
    val byS = out.groupBy("src").count().collect()
      .map(r => r.getAs[String]("src") -> r.getAs[Long]("count")).toMap
    assert(byS("src1") == 1000L && byS("src2") == 1000L) // untouched
    assert(math.abs(byS("src0") / 1000.0 - 0.25) < 0.05, byS)
    // kept rows are a stable subset: same ids survive on a rerun
    val again = Splits.stratifiedSample(df, "id", "src",
      Map("src0" -> 0.25, "src1" -> 1.0))
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(again.select("id").collect().map(_.getLong(0)).sorted))
  }

  test("stratifiedSample: rate 0 drops a stratum entirely; no shuffle") {
    import spark.implicits._
    val df  = (0L until 100L).map(i => (i, if (i < 50) "a" else "b")).toDF("id", "src")
    val out = Splits.stratifiedSample(df, "id", "src", Map("a" -> 0.0))
    assert(out.where($"src" === "a").count() == 0L)
    assert(out.where($"src" === "b").count() == 50L)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
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

  test("prioritySample: equals the brute-force key order, biased to weight") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // weights 1 vs 100: the heavy half must dominate the sample
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) 1L else 100L))
      .toDF("id", "w")
    val out = Splits.prioritySample(df, "id", "w", k = 50)
    val ids = out.select("id").collect().map(_.getLong(0))
    assert(ids.length == 50 && ids.distinct.length == 50, "without replacement")

    // exact agreement with the brute-force global-sort formulation
    val key = org.apache.spark.sql.functions.conv(
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.md5($"id".cast("string")), 1, 12), 16, 10)
      .cast("double") / $"w".cast("double")
    val brute = df.withColumn("rnk",
        org.apache.spark.sql.functions.row_number()
          .over(Window.orderBy(key, $"id")))
      .where($"rnk" <= 50)
      .collect().map(r => r.getAs[Long]("rnk") -> r.getAs[Long]("id")).toMap
    val got = out.collect()
      .map(r => r.getAs[Long]("rank") -> r.getAs[Long]("id")).toMap
    assert(got == brute, "bounded TopK path must equal the window replay")

    // weight-proportionality: heavy ids (odd) should be the large majority
    val heavy = ids.count(_ % 2 == 1)
    assert(heavy >= 45, s"expected heavy-weight dominance, got $heavy/50")

    // rerun- and partition-stability
    val again = Splits.prioritySample(df.repartition(7), "id", "w", k = 50)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(again.sameElements(ids.sorted))
  }

  test("capPerKey: binds only over-cap keys, stable under repartition") {
    import spark.implicits._
    // key a: 100 rows (cap binds), key b: 5 rows (untouched)
    val df = ((0L until 100L).map(i => (i, "a")) ++
      (100L until 105L).map(i => (i, "b"))).toDF("id", "key")
    val out = Splits.capPerKey(df, "id", "key", cap = 20)
    val byKey = out.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("a" -> 20L, "b" -> 5L))

    // survivors = the 20 smallest md5-rank ids of key a (window replay)
    val expectA = (0L until 100L)
      .sortBy(i => org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString).take(12))
      .take(20).toSet
    val gotA = out.where($"key" === "a").collect().map(_.getLong(0)).toSet
    assert(gotA == expectA)

    val again = Splits.capPerKey(df.repartition(5), "id", "key", cap = 20)
      .collect().map(_.getLong(0)).toSet
    assert(again == gotA ++ (100L until 105L))
  }

  test("neymanAllocation: volatile strata win seats; totals hit the budget") {
    import spark.implicits._
    // stratum a: constant (sd 0); b: spread 0/20 (sd 10); c: spread 0/40
    // (sd 20) with the same N -> weights 0 : 10N : 20N
    val df = (Seq.fill(10)(("a", 5L)) ++
      (0 until 10).map(i => ("b", if (i % 2 == 0) 0L else 20L)) ++
      (0 until 10).map(i => ("c", if (i % 2 == 0) 0L else 40L)))
      .toDF("s", "v")
    val got = graft.operators.Splits
      .neymanAllocation(df, "s", "v", budget = 90L, scale = 0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3))).toMap
    assert(got("a") === ((10L, 0.0, 0L)))
    assert(got("b") === ((10L, 10.0, 30L))) // 90 * 100/300
    assert(got("c") === ((10L, 20.0, 60L)))
    assert(got.values.map(_._3).sum === 90L)
  }

  test("neymanAllocation: largest-remainder closes the gap deterministically") {
    import spark.implicits._
    // three equal-weight strata, budget 10 -> exact 3.33.. each; the two
    // remainder seats go to the (rem DESC, stratum) order = a then b
    val df = (for { s <- Seq("a", "b", "c"); i <- 0 until 4 }
      yield (s, if (i % 2 == 0) 0L else 10L)).toDF("s", "v")
    val got = graft.operators.Splits
      .neymanAllocation(df, "s", "v", budget = 10L, scale = 0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.values.sum === 10L)
    assert(got === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("splitLeakage: straddling groups counted by groups AND rows") {
    import spark.implicits._
    // g1 straddles (2 splits, 3 rows); g2 and g3 are pure
    val df = Seq(("g1", "train"), ("g1", "train"), ("g1", "test"),
      ("g2", "train"), ("g3", "test")).toDF("g", "split")
    val r = Splits.splitLeakage(df, "g", "split").collect().head
    assert(r.getAs[Long]("n_rows") == 5 && r.getAs[Long]("n_groups") == 3)
    assert(r.getAs[Long]("n_straddling") == 1)
    assert(r.getAs[Long]("n_rows_straddling") == 3)
    assert(r.getAs[Double]("leak_rate") == 0.6)
  }

  test("splitLeakage: group-keyed hashSplit cannot straddle") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => (i.toLong, (i % 97).toString))
    val df = rows.toDF("row_id", "grp")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val grouped = Splits.hashSplit(df, "grp", w)
    val r = Splits.splitLeakage(grouped, "grp", "split").collect().head
    assert(r.getAs[Long]("n_straddling") == 0)
    // row-keyed split on the same data DOES straddle (the leak exists)
    val rowKeyed = Splits.hashSplit(df, "row_id", w)
    assert(Splits.splitLeakage(rowKeyed, "grp", "split").collect().head
      .getAs[Long]("n_straddling") > 0)
  }

  test("purgedFolds: 100 unit-spaced rows, k=5, embargo=10 — hand " +
      "census per fold; roles partition every row; edges clip") {
    import spark.implicits._
    val df = (0L until 100L).toDF("ms")
    val out = graft.operators.Splits.purgedFolds(df, "ms", k = 5,
        embargoMs = 10L)
      .collect().map(r => r.getAs[Long]("fold") ->
        ((r.getAs[Long]("test_lo_ms"), r.getAs[Long]("test_hi_ms"),
          r.getAs[Long]("n_test"), r.getAs[Long]("n_train"),
          r.getAs[Long]("n_purged")))).toMap
    assert(out.keySet == (0L until 5L).toSet)
    // width = 99 div 5 + 1 = 20: test blocks [20i, 20i+20)
    assert(out(0L) == ((0L, 20L, 20L, 70L, 10L)))   // left edge clips
    assert(out(2L) == ((40L, 60L, 20L, 60L, 20L)))  // full embargo both sides
    assert(out(4L) == ((80L, 100L, 20L, 70L, 10L))) // right edge clips
    // every fold's roles partition the full row set
    assert(out.values.forall { case (_, _, t, tr, p) => t + tr + p == 100L })
    // embargo 0 degenerates to plain walk-forward blocks
    val plain = graft.operators.Splits.purgedFolds(df, "ms", k = 5,
        embargoMs = 0L)
      .collect().map(r => r.getAs[Long]("n_purged")).toSeq
    assert(plain.forall(_ == 0L))
  }
}
