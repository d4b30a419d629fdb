package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ranking

/** BM25 semantics vs an independent plain-Scala computation (the oracle
  * q97 then re-verifies cross-engine at corpus scale). */
class RankingSpec extends AnyFunSuite with SparkFixture {

  private val corpus = Seq(
    (1L, "spark hash join hash hash"),          // tf(hash)=3, dl=5
    (2L, "merge sort merge"),                   // tf(merge)=2, dl=3
    (3L, "hash merge"),                         // both terms, short doc
    (4L, "the quick brown fox jumps over it"),  // neither term, dl=7
    (5L, "hash"))                               // tf(hash)=1, dl=1

  private def scalaBm25(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75) = {
    val toks   = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n      = toks.size.toDouble
    val avgdl  = toks.map(_._2.size).sum.toDouble / n
    toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      val s  = terms.map { t =>
        val tf  = ts.count(_ == t).toDouble
        val df  = toks.count(_._2.contains(t)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.reduceLeft(_ + _)
      id -> s
    }.toMap
  }

  test("bm25TopK matches an independent scalar computation exactly") {
    import spark.implicits._
    val df  = corpus.toDF("doc_id", "text")
    val out = Ranking.bm25TopK(df, "doc_id", "text", Seq("hash", "merge"), topK = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val exp = scalaBm25(Seq("hash", "merge"))
    assert(out.keySet == exp.keySet)
    out.foreach { case (id, s) =>
      assert(math.abs(s - BigDecimal(exp(id)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc $id: got $s expected ${exp(id)}")
    }
  }

  test("ranking order: saturation dampens repeated terms, short docs win") {
    import spark.implicits._
    val df  = corpus.toDF("doc_id", "text")
    val ids = Ranking.bm25TopK(df, "doc_id", "text", Seq("hash"), topK = 5)
      .collect().map(_.getAs[Long]("doc_id"))
    // doc 1 (tf=3, dl=5: saturated 1.4505) edges doc 5 (tf=1, dl=1:
    // 1.4194) — tf still wins here, but only by 2%, showing saturation
    // (unsaturated tf would win 3x)
    assert(ids.take(2).toSeq == Seq(1L, 5L))
    // docs without the term score exactly 0 and sort last, tie-broken by id
    assert(ids.takeRight(2).toSeq == Seq(2L, 4L))
  }

  test("topK truncates and breaks exact ties by ascending id") {
    import spark.implicits._
    val df = Seq((10L, "a b"), (11L, "a b"), (12L, "a b"), (13L, "x y"))
      .toDF("doc_id", "text")
    val ids = Ranking.bm25TopK(df, "doc_id", "text", Seq("a"), topK = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == Seq(10L, 11L))
  }

  test("rboAtK: identical, reversed, disjoint, and truncated rankings") {
    import spark.implicits._
    def rbo(rows: Seq[(String, Long, Long)], k: Int = 10): (Long, Double) = {
      val df = rows.map { case (i, a, b) => ("g", i, a, b) }
        .toDF("g", "item", "sa", "sb")
      val r = Ranking.rboAtK(df, "g", "item", "sa", "sb", k).collect().head
      (r.getLong(1), r.getDouble(2))
    }
    // identical rankings of 3 items: rbo = 0.1*(1 + 0.9 + 0.81)
    val same = Seq(("x", 30L, 3L), ("y", 20L, 2L), ("z", 10L, 1L))
    val (k3, r3) = rbo(same)
    assert(k3 == 3)
    val expSame = 0.0 + 0.1 * 1.0 + (0.1 * 0.9) * 1.0 + (0.1 * 0.9 * 0.9) * 1.0
    assert(math.abs(r3 - expSame) < 1e-15)
    // two items fully reversed: d=1 overlap 0, d=2 overlap 1 -> w2 only
    val rev = Seq(("x", 2L, 1L), ("y", 1L, 2L))
    assert(math.abs(rbo(rev)._2 - 0.1 * 0.9) < 1e-15)
    // k caps the depth even when more items exist
    val many = (1 to 30).map(i => (s"i$i", (100 - i).toLong, (100 - i).toLong))
    assert(rbo(many, k = 5)._1 == 5)
    // rankings that disagree everywhere in the top window score 0:
    // sa picks x1..x3, sb picks y1..y3 (two groups of items)
    val disj = Seq(("x1", 30L, 1L), ("x2", 29L, 2L), ("x3", 28L, 3L),
      ("y1", 3L, 30L), ("y2", 2L, 29L), ("y3", 1L, 28L))
    val rd = rbo(disj, k = 3)
    assert(rd._2 == 0.0, "no overlap anywhere in the cut")
  }

  test("collocationLift: exact lift on a hand-counted corpus, minCount " +
      "floor, deterministic order") {
    import spark.implicits._
    // corpus: "new york" x3, "new day" x1, "old york" x1, "a b" x5
    val docs = Seq.fill(3)("new york") ++ Seq("new day", "old york") ++
      Seq.fill(5)("a b")
    val out = Ranking.collocationLift(docs.toDF("text"), "text",
      minCount = 2L, k = 10).collect()
    // N = 10 bigrams; survivors: (new,york) c=3 c_x=4 c_y=4 ->
    // lift = 30/16 = 1.875; (a,b) c=5 c_x=5 c_y=5 -> lift = 50/25 = 2
    assert(out.length == 2)
    val first = out(0); val second = out(1)
    assert(first.getAs[String]("x") == "a" &&
      first.getAs[String]("y") == "b" &&
      first.getAs[Double]("lift") == 2.0 &&
      first.getAs[Long]("rank") == 1L)
    assert(second.getAs[String]("x") == "new" &&
      second.getAs[String]("y") == "york" &&
      second.getAs[Double]("lift") == 1.875 &&
      second.getAs[Long]("c_xy") == 3L &&
      second.getAs[Long]("c_x") == 4L && second.getAs[Long]("c_y") == 4L)
    // single-token and empty docs contribute nothing; k caps rows
    val edge = Ranking.collocationLift(
      (docs ++ Seq("solo", "", "  ")).toDF("text"), "text", 2L, 1).collect()
    assert(edge.length == 1 && edge(0).getAs[String]("x") == "a")
  }

  test("rake: hand-scored phrases, repeat occurrences collapse, " +
      "punctuation and stopwords both cut phrases") {
    import spark.implicits._
    val stops = Seq("the", "and", "a", "of")
    def run(docs: Seq[(Long, String)]) =
      Ranking.rake(docs.toDF("id", "text"), "id", "text", stops, 10)
        .collect().map(r => r.getAs[String]("phrase") ->
          ((r.getAs[Long]("rank"), r.getAs[Long]("n_occurrences"),
            r.getAs[Double]("score")))).toMap
    // "quick brown fox" words score deg/freq = 3 each -> phrase 9;
    // "lazy dog" words score 2 -> phrase 4
    val r = run(Seq((1L, "the quick brown fox and the lazy dog")))
    assert(r("quick brown fox") == ((1L, 1L, 9.0)))
    assert(r("lazy dog") == ((2L, 1L, 4.0)))
    // a second "lazy dog" doc: freq and deg double, scores unchanged,
    // occurrences collapse to one ranked row with count 2
    val r2 = run(Seq((1L, "the quick brown fox and the lazy dog"),
      (2L, "lazy dog!")))
    assert(r2("lazy dog")._2 == 2L && r2("lazy dog")._3 == 4.0)
    // punctuation cuts phrases exactly like a stopword does
    val r3 = run(Seq((1L, "red wine. white wine")))
    assert(r3.contains("red wine") && r3.contains("white wine") &&
      !r3.contains("red wine white wine"))
  }

  test("dirichletQL: hand-computed scores, short relevant doc beats " +
      "long padded doc, missing-everywhere query terms drop loudly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark join"),                            // dense hit
      (2L, "spark pad pad pad pad pad pad pad pad pad"),   // diluted
      (3L, "pad pad pad")                                  // smoothing only
    ).toDF("id", "t")
    val out = graft.operators.Ranking.dirichletQL(docs, "id", "t",
      query = Seq("spark", "join", "zzz_missing"), mu = 10.0, k = 10)
      .collect()
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    // corpus: 16 tokens; cf(spark)=3, cf(join)=1, zzz absent -> dropped
    assert(byId.values.forall(_.getAs[Long]("n_terms") == 2L))
    def term(tf: Double, cf: Double, len: Double) =
      math.log((tf + 10.0 * (cf / 16.0)) / (len + 10.0))
    val want1 = term(2, 3, 3) + term(1, 1, 3)
    assert(math.abs(byId(1L).getAs[Double]("score") - want1) < 1e-12)
    // ranking: dense doc 1 on top; the LONG padded doc 2 falls below
    // even the pure-smoothing short doc 3 — Dirichlet's length-aware
    // denominator at work (this is exactly where it diverges from BM25)
    assert(out.head.getAs[Long]("id") == 1L)
    assert(out.last.getAs[Long]("id") == 2L)
  }
}
