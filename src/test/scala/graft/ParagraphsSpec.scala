package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Paragraphs

/** Paragraph keep-first dedup semantics: corpus-wide first occurrence by
  * (doc_id, position), within-doc repeats, the minChars floor, and the
  * all-dropped edge. */
class ParagraphsSpec extends AnyFunSuite with SparkFixture {

  private def run(minChars: Int, rows: (Long, String)*): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Paragraphs.dedupParagraphs(rows.toSeq.toDF("id", "text"), "id", "text",
      minChars = minChars)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("kept_text")))).toMap
  }

  test("repeated paragraph keeps only its first (doc_id, pos) occurrence") {
    val out = run(1,
      (1L, "alpha unique\nshared boilerplate para\nbeta unique"),
      (2L, "shared boilerplate para\ngamma unique"),
      (3L, "delta unique\nshared boilerplate para"))
    assert(out(1L) == ((3L, 0L, "alpha unique\nshared boilerplate para\nbeta unique")))
    assert(out(2L) == ((2L, 1L, "gamma unique")))
    assert(out(3L) == ((2L, 1L, "delta unique")))
  }

  test("within-doc repeat drops and order is preserved") {
    val out = run(1, (1L, "x one\ny two\nx one\nz three"))
    assert(out(1L) == ((4L, 1L, "x one\ny two\nz three")))
  }

  test("paragraphs under minChars never participate") {
    // 'aa' repeats but is below the 3-char floor; 'longer para' dedups
    val out = run(3,
      (1L, "aa\nlonger para"),
      (2L, "aa\nlonger para\naa"))
    assert(out(1L) == ((2L, 0L, "aa\nlonger para")))
    assert(out(2L) == ((3L, 1L, "aa\naa")))
  }

  test("a doc whose every paragraph occurred earlier masks to empty text") {
    val out = run(1,
      (1L, "p one\np two"),
      (2L, "p one\np two"))
    assert(out(2L) == ((2L, 2L, "")))
  }
}
