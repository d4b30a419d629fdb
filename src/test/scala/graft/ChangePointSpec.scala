package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangePoint

/** CUSUM drift detection (q238's operator, off-fixture). */
class ChangePointSpec extends AnyFunSuite with SparkFixture {

  private def run(vals: Seq[(String, Long)], slack: Double, h: Double) = {
    import spark.implicits._
    val df = vals.map { case (d, v) => ("k", d, v) }.toDF("k", "day", "x")
    ChangePoint.cusumSummary(df, "k", "day", "x", slack, h).head()
  }

  test("a level shift accumulates to an alarm no single day would trip") {
    // mean = 130/7; the 30s sit ~11.4 above — below h=20 individually,
    // but the second shifted day crosses via accumulation
    val days = Seq("d1", "d2", "d3", "d4", "d5", "d6", "d7")
    val vals = days.zip(Seq(10L, 10L, 10L, 10L, 30L, 30L, 30L))
    val r = run(vals, slack = 0.0, h = 20.0)
    assert(r.getLong(1) === 7L)
    assert(r.getLong(3) === 2L)            // d6 and d7 alarm
    assert(r.getString(4) === "d6")        // first alarm
    assert(math.abs(r.getDouble(5) - 240.0 / 7.0) < 1e-9) // final s is max
  }

  test("stationary noise under the slack never alarms") {
    val vals = (1 to 10).map(i => (f"d$i%02d", if (i % 2 == 0) 12L else 8L))
    val r = run(vals, slack = 3.0, h = 5.0)
    assert(r.getLong(3) === 0L)
    assert(r.isNullAt(4))
    // mean 10, |dev| 2 <= slack 3: the statistic never leaves 0
    assert(r.getDouble(5) === 0.0)
  }

  test("the statistic resets after the shift reverts (one-sidedness)") {
    // spike then return: s climbs on the spike days, drains after
    val days = (1 to 9).map(i => f"d$i")
    val vals = days.zip(Seq(10L, 10L, 40L, 40L, 10L, 10L, 10L, 10L, 10L))
    val r = run(vals, slack = 0.0, h = 1000.0) // never alarms; watch max
    // mean = 150/9 = 16.67; two spike days add ~23.3 each -> max ~46.7
    assert(r.getLong(3) === 0L)
    assert(math.abs(r.getDouble(5) - (2 * (40 - 150.0 / 9))) < 1e-9)
  }
}
