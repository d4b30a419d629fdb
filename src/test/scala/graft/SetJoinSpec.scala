package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetJoin

/** Prefix-filter set-similarity join (q211), off-fixture: equality with
  * the naive exhaustive join is the recall-1 theorem check. */
class SetJoinSpec extends AnyFunSuite with SparkFixture {

  private def lcgSets(nSets: Int, universe: Int, seed: Long): Seq[(Long, Seq[String])] = {
    var x = seed
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % 2147483647L; x }
    (1L to nSets.toLong).map { id =>
      val size = 5 + (nxt() % 11).toInt
      val toks = (1 to size).map(_ => s"e${nxt() % universe}")
      (id, toks) // duplicates possible — operator must dedupe
    }
  }

  private def naive(sets: Seq[(Long, Seq[String])], num: Int, den: Int) =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      a = sa.toSet; b = sb.toSet
      inter = (a & b).size; uni = (a | b).size
      if den * inter >= num * uni
    } yield (ia, ib, inter.toLong)).toSet

  test("prefixFilterJoin equals the naive exhaustive join (recall 1)") {
    import spark.implicits._
    val sets = lcgSets(60, 40, seed = 7L)
    val df = sets.toDF("id", "sh")
    val got = SetJoin.prefixFilterJoin(df, "id", "sh", num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = naive(sets, 1, 2)
    assert(got == want && want.nonEmpty, s"got ${got.size}, want ${want.size}")
  }

  test("a stopword-grade element shared by every set stays correct") {
    import spark.implicits._
    val sets = lcgSets(40, 30, seed = 11L).map { case (id, s) => (id, s :+ "common") }
    val df = sets.toDF("id", "sh")
    val got = SetJoin.prefixFilterJoin(df, "id", "sh", num = 2, den = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive(sets, 2, 3))
  }

  test("threshold 1/1 finds exactly the identical sets") {
    import spark.implicits._
    val sets = Seq((1L, Seq("a", "b", "c")), (2L, Seq("c", "b", "a", "a")),
      (3L, Seq("a", "b")))
    val got = SetJoin.prefixFilterJoin(sets.toDF("id", "sh"), "id", "sh", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }
}
