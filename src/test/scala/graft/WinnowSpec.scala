package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Winnow

/** Winnowing invariants: the shared-run guarantee, selection density,
  * and short-doc edges. */
class WinnowSpec extends AnyFunSuite with SparkFixture {

  private val k = 4
  private val w = 8

  private def census(rows: (Long, String)*) = {
    import spark.implicits._
    Winnow.sharedFingerprintCensus(rows.toSeq.toDF("id", "text"), "id", "text", k, w)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("a shared run of >= w+k-1 tokens always yields a shared fingerprint") {
    // 11 = w + k - 1 shared tokens embedded in otherwise-disjoint docs
    val run = (1 to 11).map(i => s"shared$i").mkString(" ")
    val a = s"aaa bbb ccc ddd eee $run fff ggg hhh"
    val b = s"qqq www rrr ttt yyy uuu $run iii ooo ppp zzz"
    val out = census((1L, a), (2L, b))
    assert(out(1L).getAs[Long]("n_shared_fp") >= 1, out(1L).toString)
    assert(out(2L).getAs[Long]("n_shared_fp") >= 1, out(2L).toString)
  }

  test("disjoint-vocabulary docs share nothing") {
    val a = (1 to 40).map(i => s"left$i").mkString(" ")
    val b = (1 to 40).map(i => s"right$i").mkString(" ")
    val out = census((1L, a), (2L, b))
    assert(out.values.forall(_.getAs[Long]("n_shared_fp") == 0L))
  }

  test("selection density: fingerprints are far fewer than grams, never zero for long docs") {
    import spark.implicits._
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val fp = Winnow.fingerprints(Seq((1L, text)).toDF("id", "text"), "id", "text", k, w)
      .collect()(0)
    val nGrams = fp.getAs[Long]("n_grams")
    val nFp = fp.getAs[scala.collection.Seq[String]]("fps").size
    assert(nGrams == 197)
    assert(nFp > 0 && nFp < nGrams / 2, s"$nFp of $nGrams")
  }

  test("docs shorter than k tokens have no grams and no fingerprints") {
    import spark.implicits._
    val fp = Winnow.fingerprints(Seq((1L, "too few")).toDF("id", "text"), "id", "text", k, w)
      .collect()(0)
    assert(fp.getAs[Long]("n_grams") == 0L)
    assert(fp.getAs[scala.collection.Seq[String]]("fps").isEmpty)
  }

  test("codegen'd kernel equals the declarative formulation on varied docs") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val docs = (0L until 60L).map { i =>
      val len = rng.nextInt(40) // includes < k and k..w-sized docs
      (i, (0 until len).map(_ => s"t${rng.nextInt(13)}").mkString(" "))
    } :+ (999L, "")
    val df = docs.toDF("id", "text")
    for ((kk, ww) <- Seq((4, 8), (2, 3), (5, 1), (1, 4))) {
      val fast = Winnow.fingerprints(df, "id", "text", kk, ww)
        .collect().map(r => r.getLong(0) -> (r.getLong(1),
          r.getAs[scala.collection.Seq[String]]("fps").toSeq)).toMap
      val slow = Winnow.declarativeFingerprints(df, "id", "text", kk, ww)
        .collect().map(r => r.getLong(0) -> (r.getLong(1),
          r.getAs[scala.collection.Seq[String]]("fps").toSeq)).toMap
      assert(fast == slow, s"k=$kk w=$ww")
    }
  }
}
