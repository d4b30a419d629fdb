package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

/** Ordered-funnel fold: order sensitivity, restarts don't help, census
  * stacking. */
class FunnelSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("depth honors strict event order; out-of-order steps don't count") {
    import spark.implicits._
    val df = Seq(
      // u1: full funnel in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2: purchase BEFORE click -> stops at view..click depth 2
      (2L, ts(1), "view"), (2L, ts(2), "purchase"), (2L, ts(3), "click"),
      // u3: never views -> 0 despite click+purchase
      (3L, ts(1), "click"), (3L, ts(2), "purchase"),
      // u4: noise between steps is fine
      (4L, ts(1), "view"), (4L, ts(2), "error"), (4L, ts(3), "click"))
      .toDF("u", "t", "e")
    val got = Funnel.depthPerEntity(df, "u", "t", "e",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 2))
  }

  test("census counts entities reaching at least each stage") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "view"), (2L, ts(2), "click"),
      (3L, ts(1), "error"))
      .toDF("u", "t", "e")
    val got = Funnel.census(df, "u", "t", "e", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((0, "entered", 3L), (1, "view", 2L),
      (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("equal timestamps tie-break by type deterministically") {
    import spark.implicits._
    // same ts: (click, view) sorts as click < view, so view is matched
    // but the click that could follow it is NOT (it sorts before)
    val df = Seq((1L, ts(5), "view"), (1L, ts(5), "click"))
      .toDF("u", "t", "e")
    val got = Funnel.depthPerEntity(df, "u", "t", "e", Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 1))
  }
}
