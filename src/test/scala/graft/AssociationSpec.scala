package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Association

/** Pair-rule semantics: exact hand-counted support/confidence/lift,
  * the basket-size cap, and duplicate collapse. */
class AssociationSpec extends AnyFunSuite with SparkFixture {

  test("pairRules: hand-counted rules on a toy basket set") {
    import spark.implicits._
    // baskets: {m,b}, {m,b}, {m,e}, {b,e}, {m,b,e}
    val rows = Seq(
      (1L, "milk"), (1L, "bread"),
      (2L, "milk"), (2L, "bread"),
      (3L, "milk"), (3L, "eggs"),
      (4L, "bread"), (4L, "eggs"),
      (5L, "milk"), (5L, "bread"), (5L, "eggs"))
    val out = Association.pairRules(rows.toDF("bk", "it"), "bk", "it",
        minSupport = 1L, k = 10)
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b")) -> r).toMap
    // c(milk)=4 c(bread)=4 c(eggs)=3; c(b,m)=3 c(e,m)=2 c(b,e)=2; nB=5
    val bm = out(("bread", "milk"))
    assert(bm.getAs[Long]("c_ab") == 3L && bm.getAs[Long]("n_baskets") == 5L)
    assert(bm.getAs[Double]("support") == 0.6)
    assert(bm.getAs[Double]("conf_ab") == 0.75 &&
      bm.getAs[Double]("conf_ba") == 0.75)
    assert(bm.getAs[Double]("lift") == 3.0 * 5 / (4 * 4))
    val em = out(("eggs", "milk"))
    assert(em.getAs[Double]("lift") == 2.0 * 5 / (3 * 4))
    // rank 1 is the highest-lift pair (bread,milk): 0.9375 > 0.8333
    assert(bm.getAs[Long]("rank") == 1L)
    // duplicate (basket, item) rows collapse before counting
    val dup = rows ++ Seq((1L, "milk"), (1L, "milk"))
    val d = Association.pairRules(dup.toDF("bk", "it"), "bk", "it", 1L, 10)
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b")) -> r.getAs[Long]("c_ab")).toMap
    assert(d(("bread", "milk")) == 3L)
  }

  test("pairRules: oversized baskets drop entirely (cap is semantics, " +
      "not truncation) and minSupport floors") {
    import spark.implicits._
    val small = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    val mega = (1 to 5).map(i => (9L, s"x$i"))
    val out = Association.pairRules((small ++ mega).toDF("bk", "it"),
        "bk", "it", minSupport = 1L, k = 100, maxBasketSize = 4L)
      .collect()
    // the size-5 basket vanishes: no x-pairs, and n_baskets = 2
    assert(out.forall(r => !r.getAs[String]("item_a").startsWith("x")))
    assert(out.forall(_.getAs[Long]("n_baskets") == 2L))
    assert(out.length == 1)
    // minSupport = 3 kills the (a,b) pair seen twice
    assert(Association.pairRules(small.toDF("bk", "it"), "bk", "it",
      minSupport = 3L, k = 10).collect().isEmpty)
  }

  test("sequenceRules: direction and window respected; repeats count " +
      "an actor once; self-rules excluded") {
    import spark.implicits._
    // u1: a@0 b@10 a@20 b@30 (a->b twice, b->a once within w=15)
    // u2: a@0 b@100 (outside w)  u3: b@0 a@5 (b->a only)
    val rows = Seq(
      (1L, "a", 0L), (1L, "b", 10L), (1L, "a", 20L), (1L, "b", 30L),
      (2L, "a", 0L), (2L, "b", 100L),
      (3L, "b", 0L), (3L, "a", 5L))
    val out = Association.sequenceRules(rows.toDF("u", "it", "t"),
        "u", "it", "t", window = 15L, minSupport = 1L, k = 10)
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b")) -> r).toMap
    // a->b: only u1 (u2's gap is 100 > 15) -> c_ab = 1 despite 2 hits
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("c_ab") == 1L && ab.getAs[Long]("n_actors") == 3L)
    // c_a = actors with a = 3, c_b = 3: conf = 1/3, lift = 1*3/(3*3)
    assert(ab.getAs[Long]("c_a") == 3L && ab.getAs[Long]("c_b") == 3L)
    assert(ab.getAs[Double]("conf") == 1.0 / 3)
    assert(ab.getAs[Double]("lift") == 3.0 / 9)
    // b->a: u1 (b@10 -> a@20) and u3 -> c_ab = 2; direction matters
    assert(out(("b", "a")).getAs[Long]("c_ab") == 2L)
    // no (a,a)/(b,b) self-rules; simultaneous events are not "then"
    assert(!out.contains(("a", "a")) && !out.contains(("b", "b")))
    val sim = Association.sequenceRules(
      Seq((1L, "x", 5L), (1L, "y", 5L)).toDF("u", "it", "t"),
      "u", "it", "t", 15L, 1L, 10).collect()
    assert(sim.isEmpty)
    // actor cap drops the busy actor from every census including n_actors
    val busy = rows ++ (1 to 10).map(i => (9L, s"e$i", i.toLong))
    val capped = Association.sequenceRules(busy.toDF("u", "it", "t"),
      "u", "it", "t", 15L, 1L, 100, maxActorEvents = 5L)
    assert(capped.collect().forall(_.getAs[Long]("n_actors") == 3L))
  }
}
