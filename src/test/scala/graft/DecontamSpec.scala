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

  test("random corpora: operator equals a plain-Scala brute-force simulation") {
    import spark.implicits._
    val k = 5
    val rnd = new scala.util.Random(13)
    val vocab = (1 to 12).map(i => s"w$i")
    def doc(n: Int): String = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val testTexts = (1 to 4).map(_ => doc(10))
    // every 7th train doc embeds a >= k slice of a test doc (a real leak);
    // the rest may or may not collide by chance
    val trainRows = (1L to 40L).map { i =>
      val base = doc(3 + rnd.nextInt(25))
      val text =
        if (i % 7 == 0) {
          val t = testTexts(rnd.nextInt(testTexts.size)).split(" ")
          val off = rnd.nextInt(t.length - k)
          s"$base ${t.slice(off, off + k + 1).mkString(" ")} ${doc(4)}"
        } else base
      (i, text)
    }
    def sim(text: String): (Long, Long, String) = {
      val toks = text.split("\\s+")
      val testGrams = testTexts.flatMap(_.split("\\s+").sliding(k).map(_.mkString(" "))).toSet
      val flagged = (0 to toks.length - k)
        .filter(i => testGrams.contains(toks.slice(i, i + k).mkString(" ")))
      val masked = flagged.flatMap(i => i until i + k).toSet
      val kept = toks.indices.filterNot(masked).map(toks)
      (toks.length.toLong, masked.size.toLong, kept.mkString(" "))
    }
    val got = Decontam.maskContaminated(
      trainRows.toDF("id", "text"), "id", "text",
      testTexts.map(Tuple1(_)).toDF("text"), "text", k)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_masked"),
          r.getAs[String]("kept_text")))).toMap
    trainRows.foreach { case (id, text) =>
      assert(got(id) == sim(text), s"doc $id: '$text'")
    }
    // the 12-word vocab makes chance 5-gram collisions likely — require
    // at least one real mask so the property is not vacuous
    assert(got.values.exists(_._2 > 0), "fixture produced no masks")
  }

  test("sourceContainmentMatrix: hand counts on a planted mirror; " +
      "asymmetry reads the right direction") {
    import spark.implicits._
    // src b mirrors one of a's two docs; c is disjoint
    val docs = Seq(
      ("a", "one two three four"),       // trigrams: {123, 234}
      ("a", "five six seven"),           // {567}
      ("b", "one two three four"),       // {123, 234} — a mirror
      ("c", "eight nine ten")).toDF("s", "t")
    val m = graft.operators.Decontam.sourceContainmentMatrix(
        docs, "s", "t", n = 3)
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
        -> ((r.getAs[Long]("n_a"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("containment")))).toMap
    // b's types are ALL inside a (containment 1), a only 2/3 inside b
    assert(m(("b", "a")) == ((2L, 2L, 1.0)), m.toString)
    assert(m(("a", "b"))._1 == 3L && m(("a", "b"))._2 == 2L)
    assert(math.abs(m(("a", "b"))._3 - 2.0 / 3) < 1e-12)
    // disjoint source: no row at all (sparse matrix, absent not zero)
    assert(!m.contains(("c", "a")) && !m.contains(("a", "c")))
  }
}
