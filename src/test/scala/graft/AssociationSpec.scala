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
}
