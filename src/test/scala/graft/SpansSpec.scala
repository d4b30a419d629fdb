package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Spans

/** Substring-level exact dedup (Spans): span detection and masking over
  * hand-built corpora with known duplicated token ranges. */
class SpansSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("duplicatedSpans finds exact planted spans and nothing else") {
    val shared = words("dup", 10) // 10-token shared span, k = 5
    val corpus = Seq(
      (1L, s"${words("a", 7)} $shared ${words("b", 6)}"),
      (2L, s"${words("c", 3)} $shared ${words("d", 9)}"),
      (3L, words("e", 30)), // no duplicated content
      (4L, "tiny doc")      // shorter than k
    ).toDF("doc_id", "text")
    val spans = Spans.duplicatedSpans(corpus, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: span starts after 7 lead tokens -> pos 8; doc 2 -> pos 4
    assert(spans == Set((1L, 8L, 10L), (2L, 4L, 10L)))
  }

  test("duplicatedSpans merges adjacent duplicated grams into one maximal span") {
    // the whole 20-token doc duplicated => single maximal span, not many
    val t = words("x", 20)
    val corpus = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val spans = Spans.duplicatedSpans(corpus, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 1L, 20L), (2L, 1L, 20L)))
  }

  test("duplicatedSpans reports within-doc-disjoint spans separately") {
    val s1 = words("p", 8)
    val s2 = words("q", 8)
    val corpus = Seq(
      (1L, s"$s1 ${words("m", 10)} $s2"),
      (2L, s"$s1 ${words("n", 12)} $s2")
    ).toDF("doc_id", "text")
    val spans = Spans.duplicatedSpans(corpus, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set(
      (1L, 1L, 8L), (1L, 19L, 8L),
      (2L, 1L, 8L), (2L, 21L, 8L)))
  }

  test("duplicatedSpans matches an in-memory brute force on random corpora") {
    val k = 3
    def brute(corpus: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
      val grams = corpus.map { case (id, t) =>
        val ts = t.trim.toLowerCase.split("\\s+").toSeq
        id -> (if (ts.length >= k)
          (0 to ts.length - k).map(i => (i + 1L, ts.slice(i, i + k).mkString(" ")))
        else Seq.empty)
      }
      val df = grams.flatMap { case (id, gs) => gs.map(g => (g._2, id)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      grams.flatMap { case (id, gs) =>
        val ps = gs.filter(g => df(g._2) >= 2).map(_._1).sorted
        // fold consecutive positions into maximal islands
        val islands = ps.foldLeft(List.empty[(Long, Long)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }
        islands.map { case (s, e) => (id, s, e - s + k) }
      }.toSet
    }
    val rnd = new scala.util.Random(42)
    (0 until 12).foreach { trial =>
      val vocabSize = 4 + rnd.nextInt(3)
      val corpus = (0 until (6 + rnd.nextInt(4))).map { id =>
        val n = 5 + rnd.nextInt(22)
        (id.toLong, (0 until n).map(_ => s"w${rnd.nextInt(vocabSize)}").mkString(" "))
      }
      val got = Spans.duplicatedSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute(corpus), s"trial $trial corpus=$corpus")
    }
  }

  test("duplicatedSpans handles empty and whitespace-only corpora") {
    val corpus = Seq((1L, ""), (2L, "   "), (3L, "one two"))
      .toDF("doc_id", "text")
    assert(Spans.duplicatedSpans(corpus, "doc_id", "text", k = 5).count() == 0)
    val masked = Spans.maskDuplicatedSpans(corpus, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(masked.keySet == Set(1L, 2L, 3L)) // every row survives
  }

  test("maskDuplicatedSpans keeps the first corpus-wide occurrence only") {
    val shared = words("dup", 6)
    val corpus = Seq(
      (1L, s"${words("a", 4)} $shared"),
      (2L, s"$shared ${words("b", 4)}"),
      (3L, words("c", 8))
    ).toDF("doc_id", "text")
    val masked = Spans.maskDuplicatedSpans(corpus, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(masked(1L) == s"${words("a", 4)} $shared") // first occurrence kept
    assert(masked(2L) == words("b", 4))               // span cut, tail kept
    assert(masked(3L) == words("c", 8))               // untouched
  }

  test("boilerplate: frequent lines drop, rare lines survive, order preserved") {
    import graft.operators.Boilerplate
    val footer = "subscribe now"
    val corpus = (0 until 10).map { i =>
      val body = s"unique line $i\nsecond unique $i"
      (i.toLong, if (i % 2 == 0) s"$body\n$footer" else body)
    }
    val out = Boilerplate.removeFrequentLines(
      corpus.toDF("doc_id", "text"), "doc_id", "text", minDocFrac = 0.3)
      .collect().map(r => (r.getLong(0),
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("kept_text")))).toMap
    (0 until 10).foreach { i =>
      val (n, dropped, kept) = out(i.toLong)
      if (i % 2 == 0) { assert(n == 3 && dropped == 1) } else { assert(n == 2 && dropped == 0) }
      assert(kept == s"unique line $i\nsecond unique $i") // order preserved
    }
  }

  test("boilerplate: no line crosses the threshold => everything survives") {
    import graft.operators.Boilerplate
    val corpus = (0 until 8).map(i => (i.toLong, s"a$i\nb$i")).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(corpus, "doc_id", "text", 0.5)
      .collect()
    assert(out.forall(_.getAs[Long]("n_dropped") == 0L))
    assert(out.length == 8)
  }

  test("maskDuplicatedSpans is a no-op on a span-free corpus") {
    val corpus = Seq((1L, words("a", 12)), (2L, words("b", 12)))
      .toDF("doc_id", "text")
    val masked = Spans.maskDuplicatedSpans(corpus, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(masked == Map(1L -> words("a", 12), 2L -> words("b", 12)))
  }

  test("tiered dedup (q141) is lossless: equals the untiered q118 census doc for doc") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // winnowing guarantee: every >= 15-token shared run survives the
    // k=4/w=8 screen, so spans found on the flagged subset must equal
    // spans found on the whole corpus
    val full = graft.queries.TrainingData.q118DupSpans(spark, dir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("span_tokens")).as("t"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val tiered = graft.queries.TrainingData.q141TieredDedup(spark, dir)
      .where(col("n_spans") > 0)
      .collect().map(r => (r.getLong(0),
        (r.getAs[Long]("n_spans"), r.getAs[Long]("span_tokens_total")))).toMap
    assert(full.nonEmpty && tiered == full)
  }
}
