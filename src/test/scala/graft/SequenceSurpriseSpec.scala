package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Anonymity, Sequences}

/** Sequence-surprise scoring (q228) and l-diversity (q229) operators. */
class SequenceSurpriseSpec extends AnyFunSuite with SparkFixture {

  test("mean surprise is the exact -ln of the global MLE, per key") {
    import spark.implicits._
    // global transitions: A->B twice (u1, u2), A->C once (u3)
    // => p(B|A) = 2/3, p(C|A) = 1/3
    val ev = Seq(
      (1L, 10L, 100L, "A"), (1L, 20L, 101L, "B"),
      (2L, 10L, 200L, "A"), (2L, 20L, 201L, "B"),
      (3L, 10L, 300L, "A"), (3L, 20L, 301L, "C"),
      (4L, 10L, 400L, "Z")) // single event: no transition, absent
      .toDF("user_id", "ms", "event_id", "event_type")
    val got = Sequences.sequenceSurprise(ev, "user_id",
        Seq("ms", "event_id"), "event_type")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((1L, -math.log(2.0 / 3.0))))
    assert(got(2L) === ((1L, -math.log(2.0 / 3.0))))
    assert(got(3L) === ((1L, -math.log(1.0 / 3.0))))
  }

  test("terms fold in event order; the rare path scores above the common one") {
    import spark.implicits._
    // u1 takes the common loop A->B->A twice; u2 takes A->C once
    val common = Seq.tabulate(8)(i =>
      (1L, 10L + i, 100L + i, if (i % 2 == 0) "A" else "B"))
    val rare = Seq((2L, 10L, 200L, "A"), (2L, 11L, 201L, "C"))
    val more = Seq.tabulate(6)(i => // extra A->B mass from other users
      (10L + i, 10L, 300L + i, "A")) ++ Seq.tabulate(6)(i =>
      (10L + i, 20L, 400L + i, "B"))
    val ev = (common ++ rare ++ more)
      .toDF("user_id", "ms", "event_id", "event_type")
    val got = Sequences.sequenceSurprise(ev, "user_id",
        Seq("ms", "event_id"), "event_type")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) > got(1L), "the rare A->C flow must out-surprise the loop")
  }

  test("l-diversity flags homogeneous classes only") {
    import spark.implicits._
    val df = Seq(
      ("x", 1, "s1"), ("x", 1, "s1"), ("x", 1, "s1"), // homogeneous, size 3
      ("x", 2, "s1"), ("x", 2, "s2"),                 // diverse enough at l=2
      ("y", 1, "s2"), ("y", 1, "s2")                  // homogeneous, size 2
    ).toDF("qa", "qb", "sens")
    val got = Anonymity.lowDiversityClasses(df, Seq("qa", "qb"), "sens", l = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(("x", 1) -> ((3L, 1L)), ("y", 1) -> ((2L, 1L))))
  }
}
