package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Gopher

/** Gopher rule-suite semantics on hand-computable documents: each rule
  * trips on exactly the planted pathology and nowhere else. */
class GopherSpec extends AnyFunSuite with SparkFixture {

  // 6 lines x 10 words with stopwords present; passes every rule
  private val clean: String =
    (1 to 6).map(_ => "the quick brown fox jumps over and that lazy dog")
      .mkString("\n")

  private def run(rows: (Long, String)*) = {
    import spark.implicits._
    Gopher.metrics(rows.toSeq.toDF("id", "text"), "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
  }

  test("clean doc passes all rules with closed-form metrics") {
    val m = run((1L, clean))(1L)
    assert(m.getAs[Boolean]("gopher_pass"))
    assert(m.getAs[Long]("n_words") == 60L)
    // "the quick brown fox jumps over and that lazy dog" = 39 letters/line
    assert(m.getAs[Double]("mean_word_len") == 39.0 * 6 / 60.0)
    assert(m.getAs[Double]("alpha_frac") == 1.0)
    assert(m.getAs[Long]("n_stop") == 3 * 6) // the, and, that per line
  }

  test("each planted pathology fails exactly its own rule") {
    val short = "too few words here"
    val symbols = clean + " # # # # # # # #"
    val bullets = clean.linesIterator.map("- " + _).mkString("\n")
    val ellipses = clean.linesIterator.map(_ + " ...").mkString("\n")
    val m = run((1L, short), (2L, symbols), (3L, bullets), (4L, ellipses))
    assert(!m(1L).getAs[Boolean]("ok_words") && m(1L).getAs[Boolean]("ok_symbol"))
    assert(!m(2L).getAs[Boolean]("ok_symbol") && m(2L).getAs[Boolean]("ok_words"))
    assert(!m(3L).getAs[Boolean]("ok_bullet") && m(3L).getAs[Boolean]("ok_ellipsis"))
    assert(!m(4L).getAs[Boolean]("ok_ellipsis") && m(4L).getAs[Boolean]("ok_bullet"))
    assert(m.values.count(_.getAs[Boolean]("gopher_pass")) == 0)
  }

  test("mean-word-length and alpha rules catch degenerate token streams") {
    val numbers = (1 to 60).map(_.toString).mkString(" ") // no alpha at all
    val longWords = (1 to 60).map(_ => "incomprehensibilities").mkString(" ")
    val m = run((1L, numbers), (2L, longWords))
    assert(!m(1L).getAs[Boolean]("ok_alpha"))
    assert(!m(2L).getAs[Boolean]("ok_mwl"), m(2L).getAs[Double]("mean_word_len"))
  }

  test("census counts docs, passes, and per-rule failures") {
    import spark.implicits._
    val df = Seq((1L, "a", clean), (2L, "a", "tiny doc"), (3L, "b", clean))
      .toDF("id", "src", "text")
    val c = Gopher.census(df, "text", "src").collect()
      .map(r => r.getAs[String]("src") -> r).toMap
    assert(c("a").getAs[Long]("n_docs") == 2 && c("a").getAs[Long]("n_pass") == 1)
    assert(c("a").getAs[Long]("fail_words") == 1)
    assert(c("b").getAs[Long]("n_pass") == 1 && c("b").getAs[Long]("fail_words") == 0)
  }

  test("tailLoopCensus: detects the largest doubled tail period, " +
      "clean docs report a loud zero census") {
    import spark.implicits._
    val docs = Seq(
      ("g", "alpha beta gamma delta gamma delta"),        // k=2 loop
      ("g", "one two three the cat sat the cat sat"),     // k=3 loop
      ("g", "all distinct tokens here now"),              // clean
      ("clean", "nothing repeats in this doc at all")
    ).toDF("s", "t")
    val out = graft.operators.Gopher.tailLoopCensus(docs, "s", "t")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("n_docs") == 3L)
    assert(g.getAs[Long]("n_looping") == 2L)
    assert(g.getAs[Int]("max_loop_k") == 3)
    assert(math.abs(g.getAs[Double]("looping_share") - 2.0 / 3) < 1e-12)
    val cl = out("clean")
    assert(cl.getAs[Long]("n_looping") == 0L)   // loud zero, row present
    assert(cl.getAs[Int]("max_loop_k") == 0)
    // "the the" is a k=1 loop; a doc of ONE token is not
    val tiny = graft.operators.Gopher.tailLoopCensus(
      Seq(("x", "stop stop"), ("y", "solo")).toDF("s", "t"), "s", "t")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Int]("max_loop_k"))
      .toMap
    assert(tiny("x") == 1 && tiny("y") == 0)
  }
}
