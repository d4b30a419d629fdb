package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd

/** SCD type-2 collapse semantics (q168's operator, off-fixture). */
class ScdSpec extends AnyFunSuite with SparkFixture {

  test("runs collapse to half-open ranges; re-appearing value opens a NEW range") {
    import spark.implicits._
    val obs = Seq(
      (1L, "A", 1, 10L), (1L, "A", 2, 11L), (1L, "B", 3, 12L),
      (1L, "A", 4, 13L), // A returns: must NOT merge with the first A run
      (2L, "X", 1, 20L)
    ).toDF("key", "attr", "d", "tie")
    val h = Scd.type2History(obs, "key", "attr", "d", "tie")
      .orderBy("key", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(5)).map(_.asInstanceOf[Int]), r.getBoolean(6), r.getLong(4)))
    assert(h.toSeq == Seq(
      (1L, "A", 1, Some(3), false, 2L),
      (1L, "B", 3, Some(4), false, 1L),
      (1L, "A", 4, None, true, 1L),
      (2L, "X", 1, None, true, 1L)))
  }

  test("same-instant observations order by the tie-break deterministically") {
    import spark.implicits._
    // two different statuses on the same date: the smaller tie wins first
    val obs = Seq((1L, "B", 5, 2L), (1L, "A", 5, 1L)).toDF("key", "attr", "d", "tie")
    val h = Scd.type2History(obs, "key", "attr", "d", "tie")
      .orderBy("is_current").collect()
    assert(h.map(_.getString(1)).toSeq == Seq("A", "B"))
    assert(h.head.getBoolean(6) === false) // A closed by B's arrival
  }

  test("snapshotDiff: added/removed/changed/unchanged partition the " +
      "union, stratum taken from the surviving side") {
    import spark.implicits._
    val old = Seq((1L, "s1", "keep"), (2L, "s1", "edit me"),
      (3L, "s2", "drop me")).toDF("id", "src", "t")
    val neu = Seq((1L, "s1", "keep"), (2L, "s1", "edited"),
      (4L, "s2", "brand new"),
      // re-keyed row whose stratum moved: new side wins
      (5L, "s3", "moved")).toDF("id", "src", "t")
    val got = Scd.snapshotDiff(old, neu, "id", "t", "src")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // s1: old {1,2} new {1,2}; 1 unchanged, 2 changed
    assert(got("s1") == ((2L, 2L, 0L, 0L, 1L, 1L)), got.toString)
    // s2: old {3} new {4} -> one removed, one added
    assert(got("s2") == ((1L, 1L, 1L, 1L, 0L, 0L)))
    // s3: new-only
    assert(got("s3") == ((0L, 1L, 1L, 0L, 0L, 0L)))
    // identity: n_old = removed+changed+unchanged; n_new = added+...
    got.values.foreach { case (o, n, a, rm, ch, un) =>
      assert(o == rm + ch + un && n == a + ch + un)
    }
  }
}
