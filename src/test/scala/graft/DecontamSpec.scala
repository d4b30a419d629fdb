package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Decontam

/** Targeted decontamination masking semantics: window-precise removal,
  * every occurrence masked, short-doc and clean-doc passthrough. */
class DecontamSpec extends AnyFunSuite with SparkFixture {

  private val leak = "alpha bravo charlie delta echo foxtrot golf hotel"

  private def run(k: Int, trainRows: (Long, String)*) = {
    import spark.implicits._
    Decontam.maskContaminated(
      trainRows.toSeq.toDF("id", "text"), "id", "text",
      Seq(Tuple1(leak)).toDF("text"), "text", k)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_masked"),
          r.getAs[String]("kept_text")))).toMap
  }

  test("an embedded leaked sentence masks window-precisely; the rest survives") {
    val pre = (1 to 10).map(i => s"pre$i").mkString(" ")
    val post = (1 to 10).map(i => s"post$i").mkString(" ")
    val out = run(8, (1L, s"$pre $leak $post"))
    // exactly the 8 leaked tokens vanish: the single matching 8-gram's
    // shadow covers them and boundary grams (mixed content) never match
    assert(out(1L) == ((28L, 8L, s"$pre $post")))
  }

  test("every occurrence of the leak is masked, not just the first") {
    val out = run(8, (1L, s"x1 x2 $leak y1 y2 $leak z1"))
    assert(out(1L)._2 == 16L)
    assert(out(1L)._3 == "x1 x2 y1 y2 z1")
  }

  test("clean docs and sub-k docs pass through byte-identical") {
    val out = run(8,
      (1L, "nothing leaked here at all today friends"),
      (2L, "alpha bravo charlie")) // shares tokens but no full 8-gram
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
    assert(out(2L)._3 == "alpha bravo charlie")
  }

  test("a full test-set copy masks to empty") {
    val out = run(8, (1L, leak))
    assert(out(1L) == ((8L, 8L, "")))
  }
}
