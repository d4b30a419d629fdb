package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.DataFrame

  private def left: DataFrame = {
    import spark.implicits._
    Seq(("A", 10L, 1), ("A", 20L, 2), ("B", 5L, 3)).toDF("k", "t", "id")
  }
  private def right: DataFrame = {
    import spark.implicits._
    Seq(("A", 5L, 1.0), ("A", 10L, 2.0), ("A", 15L, 3.0), ("C", 1L, 9.0))
      .toDF("k", "rt", "rv")
  }

  test("asOfBackward picks most recent right row at-or-before left ts (J4)") {
    val out = Joins.asOfBackward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("rv") == 2.0) // tie at t=10 is inclusive
    assert(out(1).getAs[Double]("rv") == 3.0) // 15 <= 20 most recent
    assert(out(2).isNullAt(out(2).fieldIndex("rv"))) // B has no prior row
  }

  test("asOfBackward preserves left row count") {
    assert(Joins.asOfBackward(left, right, Seq("k"), "t", "rt", Seq("rv")).count() == 3)
  }

  test("asOfForward picks earliest right row at-or-after left ts; ties inclusive") {
    val out = Joins.asOfForward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("rv") == 2.0) // tie at t=10 is inclusive
    assert(out(1).isNullAt(out(1).fieldIndex("rv"))) // nothing after t=20
    assert(out(2).isNullAt(out(2).fieldIndex("rv"))) // B has no right rows
  }

  test("asOfNearest picks by distance, ties to the prior row, one-sided falls through") {
    import spark.implicits._
    val l2 = Seq(("A", 12L, 1), ("A", 13L, 2), ("A", 100L, 3), ("B", 1L, 4))
      .toDF("k", "t", "id")
    val out = Joins.asOfNearest(l2, right, Seq("k"), "t", "rt", Seq("rv"))
      .orderBy("id").collect()
    // t=12: back 10 (d2), fwd 15 (d3) -> backward
    assert(out(0).getAs[Double]("rv") == 2.0 && out(0).getAs[String]("asof_dir") == "backward")
    // t=13: back 10 (d3), fwd 15 (d2) -> forward
    assert(out(1).getAs[Double]("rv") == 3.0 && out(1).getAs[String]("asof_dir") == "forward")
    // t=100: forward missing -> backward 15
    assert(out(2).getAs[Long]("asof_ts") == 15L && out(2).getAs[String]("asof_dir") == "backward")
    // B: no right rows at all -> null value
    assert(out(3).isNullAt(out(3).fieldIndex("rv")))
  }

  test("asOfNearest equidistant tie goes backward") {
    import spark.implicits._
    val l2 = Seq(("A", 12L, 1)).toDF("k", "t", "id") // back 10 d2, fwd 14 d2
    val r2 = Seq(("A", 10L, 1.0), ("A", 14L, 2.0)).toDF("k", "rt", "rv")
    val out = Joins.asOfNearest(l2, r2, Seq("k"), "t", "rt", Seq("rv")).collect().head
    assert(out.getAs[Double]("rv") == 1.0 && out.getAs[String]("asof_dir") == "backward")
  }

  test("futureWindow ranks first n strictly-after rows per left row (J6)") {
    import spark.implicits._
    val l = Seq(("A", 5L, 100)).toDF("k", "t", "sid")
    val r = Seq(("A", 5L, 0.0), ("A", 6L, 1.0), ("A", 7L, 2.0), ("A", 8L, 3.0), ("A", 9L, 4.0))
      .toDF("k", "rt", "rv")
    val out = Joins.futureWindow(l, r, Seq("k"), "t", "rt", 3)
      .orderBy("_rank").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Double]("rv")).toSeq == Seq(1.0, 2.0, 3.0)) // rt=5 excluded
    assert(out.map(_.getAs[Int]("_rank")).toSeq == Seq(1, 2, 3))
  }

  test("mergeUpdate applies update-only WHEN MATCHED semantics (J3)") {
    import spark.implicits._
    val target = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "name", "bal")
    val updates = Seq((2, 99.0), (3, 77.0)).toDF("id", "bal")
    val out = Joins.mergeUpdate(target, updates, Seq("id"), Seq("bal"))
      .orderBy("id").collect()
    assert(out.length == 2) // unmatched source row 3 NOT inserted (update-only)
    assert(out(0).getAs[Double]("bal") == 10.0)
    assert(out(1).getAs[Double]("bal") == 99.0)
    assert(out(1).getAs[String]("name") == "b") // non-update col kept
  }

  test("replaceByKey = delete-by-key then insert (T3)") {
    import spark.implicits._
    val target = Seq((1, "X", 1.0), (2, "X", 2.0), (3, "Y", 3.0)).toDF("id", "part", "v")
    val repl = Seq((9, "X", 9.0)).toDF("id", "part", "v")
    val out = Joins.replaceByKey(target, repl, Seq("part")).orderBy("id").collect()
    assert(out.map(_.getAs[Int]("id")).toSeq == Seq(3, 9))
  }
}
