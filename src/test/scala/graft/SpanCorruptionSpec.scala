package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SpanCorruption

/** T5 span corruption: round-trip reconstruction, count invariants,
  * determinism, sentinel numbering. */
class SpanCorruptionSpec extends AnyFunSuite with SparkFixture {

  private def fixture() = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    IndexedSeq.tabulate(120)(i => (i.toLong,
      Seq.fill(5 + rnd.nextInt(40))(words(rnd.nextInt(words.size)))
        .mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("input+target round-trip reconstructs the original text exactly") {
    val rows = SpanCorruption.corrupt(fixture(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length == 120)
    val original = fixture().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentinel = "<extra_id_(\\d+)>".r
    rows.foreach { case (id, input, target) =>
      // parse target into sentinel -> span tokens
      val spans = scala.collection.mutable.Map.empty[Int, Seq[String]]
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Seq.empty
        case tok => spans(cur) = spans(cur) :+ tok
      }
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok => Seq(tok)
      }.mkString(" ")
      assert(rebuilt == original(id), s"doc $id")
    }
  }

  test("count invariants and sentinel numbering hold on every doc") {
    val rows = SpanCorruption.corrupt(fixture(), "doc_id", "text")
      .collect().map(r => (r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val sentinel = "<extra_id_(\\d+)>".r
    var sawMask = false
    rows.foreach { case (input, target, nTok, nMask, nSpans) =>
      assert(nMask <= nTok && nSpans <= nMask)
      if (nMask > 0) sawMask = true
      // input tokens = unmasked + one sentinel per span
      val inToks = input.split(" ").count(_.nonEmpty)
      assert(inToks == nTok - nMask + nSpans, s"input: $input")
      // target tokens = masked + one sentinel per span
      val tgtToks = target.split(" ").count(_.nonEmpty)
      assert(tgtToks == nMask + nSpans, s"target: $target")
      // sentinels number 0..n_spans-1 in order in BOTH strings
      val ins = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      assert(ins == (0 until nSpans.toInt), s"numbering: $input")
      assert(sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq == ins)
    }
    assert(sawMask, "fixture produced no masks — threshold broken")
  }

  test("deterministic across runs and partitionings") {
    val a = SpanCorruption.corrupt(fixture(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = SpanCorruption.corrupt(fixture().repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a == b)
  }
}
