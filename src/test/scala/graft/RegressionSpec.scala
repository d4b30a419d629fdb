package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Regression

class RegressionSpec extends AnyFunSuite with SparkFixture {

  test("groupedOls recovers an exact line and is partition-stable") {
    import spark.implicits._
    // y = 2x + 1 exactly for group a; y = -x + 10 for group b
    val df = ((1 to 50).map(i => ("a", i.toDouble, 2.0 * i + 1)) ++
      (1 to 40).map(i => ("b", i.toDouble, 10.0 - i))).toDF("g", "x", "y")
    val fit = Regression.groupedOls(df, Seq("g"), "x", "y", scale = 2)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (sa, ia, ra) = fit("a")
    assert(math.abs(sa - 2.0) < 1e-9 && math.abs(ia - 1.0) < 1e-9)
    assert(math.abs(ra - 1.0) < 1e-9, s"exact fit must give r2=1, got $ra")
    val (sb, ib, _) = fit("b")
    assert(math.abs(sb + 1.0) < 1e-9 && math.abs(ib - 10.0) < 1e-9)

    // decimal sums make the result identical under any partitioning
    val again = Regression.groupedOls(df.repartition(13), Seq("g"), "x", "y", scale = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(again("a") == ((sa, ia)) && again("b") == ((sb, ib)))
  }

  test("groupedOls on a noisy cloud: slope between the axis-wise bounds") {
    import spark.implicits._
    // deterministic pseudo-noise; slope ~3 with r2 < 1
    val df = (1 to 200).map { i =>
      val noise = ((i * 2654435761L) % 97).toDouble - 48
      ("g", i.toDouble, 3.0 * i + noise)
    }.toDF("g", "x", "y")
    val r = Regression.groupedOls(df, Seq("g"), "x", "y", scale = 2).collect().head
    val (slope, r2) = (r.getDouble(2), r.getDouble(4))
    assert(slope > 2.5 && slope < 3.5, s"slope $slope")
    assert(r2 > 0.9 && r2 < 1.0, s"r2 $r2")
  }
}
