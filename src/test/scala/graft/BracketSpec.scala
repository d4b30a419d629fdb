package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Bracket
import graft.kernels.Bracket.{BarIn, Fill}

/** X1 bracket-execution kernel semantics (forward-paper-trader/main.py:265-318):
  * entry at first bar >= entry_ts, stop checked before target intrabar,
  * timeout at ts >= timeout_ts, exhausted data -> timeout_eod. */
class BracketSpec extends AnyFunSuite with SparkFixture {

  private def bar(t: Long, h: Double, l: Double, c: Double,
      entry: Long = 10L, timeout: Long = 1000L,
      stopAdverse: Boolean = false, timeoutMult: Double = 1.0): BarIn =
    BarIn(1L, t, c, h, l, c, entry, timeout, 1.02, 1.40, 0.75,
      stopAdverse, timeoutMult)

  private def run(bars: Seq[BarIn]): Option[Fill] = {
    val it = Bracket.scanGroup(1L, bars.iterator)
    if (it.hasNext) Some(it.next()) else None
  }

  test("entry = first bar at/after entry_ts, priced close*slippage (J5)") {
    val f = run(Seq(bar(5, 101, 99, 100), bar(10, 101, 99, 100), bar(11, 150, 141, 145))).get
    assert(f.entry_ts == 10L)
    assert(f.entry_price == 100 * 1.02)
  }

  test("stop checked before target when both hit in one bar (X1 tie rule)") {
    // entry 102; stop 76.5, target 142.8; bar spans both
    val f = run(Seq(bar(10, 101, 99, 100), bar(20, 200, 50, 120))).get
    assert(f.exit_reason == "stop")
    assert(f.exit_price == 102 * 0.75)
  }

  test("target exit at target price") {
    val f = run(Seq(bar(10, 101, 99, 100), bar(20, 150, 120, 145))).get
    assert(f.exit_reason == "target")
    assert(f.exit_price == 102 * 1.40)
    assert(f.return_pct > 0)
  }

  test("timeout at ts >= timeout_ts exits at close") {
    val f = run(Seq(
      bar(10, 101, 99, 100, timeout = 30),
      bar(20, 103, 97, 101, timeout = 30),
      bar(30, 103, 97, 99, timeout = 30))).get
    assert(f.exit_reason == "timeout")
    assert(f.exit_price == 99)
    assert(f.exit_ts == 30L)
  }

  test("exhausted bars -> timeout_eod at last close") {
    val f = run(Seq(bar(10, 101, 99, 100), bar(20, 103, 99, 101))).get
    assert(f.exit_reason == "timeout_eod")
    assert(f.exit_price == 101)
  }

  test("Stress adverse stop fill = min(stop, close) (X2, simulate_live_execution.py:249-262)") {
    // entry 102, stop 76.5; close 60 below stop -> adverse fill at close
    val f = run(Seq(bar(10, 101, 99, 100, stopAdverse = true),
      bar(20, 101, 50, 60, stopAdverse = true))).get
    assert(f.exit_reason == "stop")
    assert(f.exit_price == 60.0)
    // close above the stop price -> plain stop fill even under Stress
    val g = run(Seq(bar(10, 101, 99, 100, stopAdverse = true),
      bar(20, 101, 50, 90, stopAdverse = true))).get
    assert(g.exit_price == 102 * 0.75)
  }

  test("Stress timeout fills at close * 0.95; timeout_eod too (X2 :271-286)") {
    val f = run(Seq(
      bar(10, 101, 99, 100, timeout = 30, timeoutMult = 0.95),
      bar(30, 103, 97, 99, timeout = 30, timeoutMult = 0.95))).get
    assert(f.exit_reason == "timeout")
    assert(f.exit_price == 99 * 0.95)
    val g = run(Seq(bar(10, 101, 99, 100, timeoutMult = 0.95),
      bar(20, 103, 99, 101, timeoutMult = 0.95))).get
    assert(g.exit_reason == "timeout_eod")
    assert(g.exit_price == 101 * 0.95)
  }

  test("no bar at/after entry -> no fill") {
    assert(run(Seq(bar(5, 101, 99, 100), bar(9, 101, 99, 100))).isEmpty)
  }

  test("lookahead audit invariant: exit_ts > entry_ts (reference audit_winner.py)") {
    val f = run(Seq(bar(10, 101, 99, 100), bar(20, 150, 120, 145))).get
    assert(f.exit_ts > f.entry_ts)
  }

  test("distributed execute() agrees with direct scan") {
    import spark.implicits._
    val bars = Seq(bar(10, 101, 99, 100), bar(20, 150, 120, 145))
    val ds = Bracket.execute(spark, bars.toDF())
    val f = ds.collect().head
    assert(f.exit_reason == "target" && f.trade_id == 1L)
  }
}
