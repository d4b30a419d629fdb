package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkFixture {

  test("shingles builds distinct word n-grams (lowercased)") {
    import spark.implicits._
    val df = Seq("The quick brown fox the quick brown").toDF("t")
    val sh = df.select(Dedup.shingles(col("t"), 3)).head().getSeq[String](0)
    assert(sh.toSet == Set(
      "the quick brown", "quick brown fox", "brown fox the", "fox the quick"))
  }

  test("exactByText keeps one row per normalized text (tie-break respected)") {
    import spark.implicits._
    val df = Seq((3, "Hello World"), (1, "hello world  "), (2, "other")).toDF("id", "t")
    val out = Dedup.exactByText(df, "t", Seq(col("id"))).orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2)) // lowest id wins; trim+lower normalize
  }

  test("ngramJaccardPairs computes exact Jaccard (J=1 for identical texts)") {
    import spark.implicits._
    val df = Seq((1, "a b c d e"), (2, "a b c d e"), (3, "z y x w v")).toDF("id", "t")
    val out = Dedup.ngramJaccardPairs(df, "id", "t", 3).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(out((1, 2)) == 1.0)
    assert(out((1, 3)) == 0.0)
  }

  test("minhashNearDups surfaces exact duplicates with jaccard 1.0") {
    import spark.implicits._
    val texts = Seq(
      (1L, "the cat sat on the mat and looked at the dog outside"),
      (2L, "the cat sat on the mat and looked at the dog outside"), // dup of 1
      (3L, "completely different words describing some other topic entirely here"),
      (4L, "numbers one two three four five six seven eight nine ten"))
    val out = Dedup.minhashNearDups(texts.toDF("doc_id", "text"), "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, threshold = 0.5).collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == (1L, 2L))
    assert(out(0).getDouble(2) == 1.0)
  }

  test("FastHash.minhashSignature matches the declarative xxhash64 fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "some other document with completely different words in it today")
      .toDF("t")
    val fast = df.select(graft.functions.FastHash.minhashSignature(col("t"), 3, 16))
      .collect().map(_.getSeq[Long](0).toSeq)
    val slow = df.select(Dedup.minhashSignature(Dedup.shingles(col("t"), 3), 16))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(fast.toSeq == slow.toSeq)
  }

  test("FastHash.simhash matches the declarative bit-count fold") {
    import spark.implicits._
    val df = Seq("alpha beta gamma delta epsilon zeta alpha beta").toDF("t")
    val fast = df.select(graft.functions.FastHash.simhash(col("t"))).head().getLong(0)
    val slow = df.select(Dedup.simhash64(col("t"))).head().getLong(0)
    assert(fast == slow)
  }

  test("simhash64 identical for identical text; near for one-word change") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashNearDups(df, "doc_id", "text", maxHamming = 16).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](2).longValue())).toMap
    assert(out((1L, 2L)) == 0L) // identical fingerprint
    assert(out.contains((1L, 3L)) && out((1L, 3L)) > 0L) // near-dup, small hamming
  }

  test("embedding near-dup: LSH candidates recover the exact pairs (scale path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 3 tight clusters of 4 vectors each + 8 scattered vectors
    val vecs = (0 until 12).map { i =>
      val base = Array.fill(8)(0.0); base(i / 4) = 1.0
      (i.toLong, base.map(_ + rnd.nextGaussian() * 0.02).toSeq)
    } ++ (12 until 20).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()).toSeq)
    }
    val df = vecs.toDF("id", "v")
    val exact = Dedup.embeddingNearDupsExact(df, "id", "v", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupsLsh(df, "id", "v", 0.95, tables = 8, planes = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)              // the clusters produce near-dups
    assert(lsh.subsetOf(exact))         // verification keeps only true pairs
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("hot-bucket cap keeps a degenerate LSH bucket linear (with census)") {
    import spark.implicits._
    // 120 boilerplate-identical docs (the exact-dedup precondition
    // violated on purpose) + 3 distinct docs + one genuine near-dup pair
    val boiler = (0L until 120L).map(i =>
      (i, "terms of service all rights reserved contact us privacy policy cookie notice"))
    val distinct = Seq(
      (200L, "the cat sat on the mat and looked at the dog outside today"),
      // exact copy of 200: its bucket has size 2, far under any cap, so
      // the pair MUST survive capping on both the minhash and simhash
      // paths (a one-word change would not be band-guaranteed for
      // simhash — only hamming <= 3 is pigeonhole-covered by 4 bands)
      (201L, "the cat sat on the mat and looked at the dog outside today"),
      (202L, "numbers one two three four five six seven eight nine ten eleven"))
    val df = (boiler ++ distinct).toDF("doc_id", "text")
    // uncapped: the degenerate bucket explodes quadratically
    val uncapped = Dedup.minhashNearDups(df, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, threshold = 0.5, maxBucketSize = 0)
    assert(uncapped.count() == 120L * 119 / 2 + 1) // all boiler pairs + (200,201)
    // capped: boiler buckets are skipped, the genuine near-dup survives
    val capped = Dedup.minhashNearDups(df, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, threshold = 0.5, maxBucketSize = 50)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((200L, 201L)))
    // the census reports exactly the skipped buckets: 8 bands x 1 hot
    // bucket of 120 identical signatures
    val census = Dedup.skippedBuckets(
      Dedup.minhashBuckets(df, "doc_id", "text", 3, 32, 8),
      Seq("band", "h"), cap = 50).collect()
    assert(census.length == 8)
    assert(census.forall(_.getAs[Long]("n_members") == 120L))
    // simhash path: same degenerate input, same linear guarantee
    val sCapped = Dedup.simhashNearDups(df, "doc_id", "text",
      maxHamming = 16, maxBucketSize = 50)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!sCapped.exists(p => p._1 < 120 && p._2 < 120)) // no boiler pairs
    assert(sCapped.contains((200L, 201L)))
  }

  test("minhashNearDupsAgainst finds batch-vs-corpus pairs only") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat and looked at the dog outside today"),
      (2L, "the cat sat on the mat and looked at the dog outside today"), // corpus-internal dup
      (3L, "completely different words describing some other topic entirely here now"),
      (4L, "numbers one two three four five six seven eight nine ten eleven"))
      .toDF("id", "t")
    val batch = Seq(
      (100L, "the cat sat on the mat and looked at the dog outside today"), // dup of 1 and 2
      (101L, "nothing like anything in the corpus at all whatsoever truly"))
      .toDF("id", "t")
    val got = Dedup.minhashNearDupsAgainst(corpus, batch, "id", "t",
      shingleN = 3, k = 32, bands = 16, threshold = 0.8)
      .select("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 100 matches corpus 1 and 2; the corpus-internal (1,2) pair is
    // NOT emitted — incremental ingestion never re-dedups the corpus
    assert(got == Set((100L, 1L), (100L, 2L)))
  }

  test("Bloom.semiJoinBloom equals the plain left-semi join") {
    import spark.implicits._
    val left = (0L until 2000L).map(i => (i, i % 7)).toDF("k", "tag")
    val right = (0L until 2000L by 3).toDF("k")
    val bloom = graft.operators.Bloom.semiJoinBloom(left, right, "k",
      expectedKeys = 1000L, fpp = 0.05)
      .select("k").as[Long].collect().sorted.toSeq
    val plain = left.join(right, Seq("k"), "left_semi")
      .select("k").as[Long].collect().sorted.toSeq
    assert(bloom == plain)
    assert(plain.nonEmpty)
  }

  test("FastHash.repetitionRatio equals the declarative raw-shingle ratio") {
    import spark.implicits._
    val df = Seq(
      "a b c a b c a b c",            // heavy repetition
      "one two three four five six",  // none
      "x y", "", "solo",              // short/degenerate -> 0.0
      "t t t t t t t t")              // single repeated token
      .toDF("t")
    val toks = split(lower(trim(col("t"))), "\\s+")
    val sh = Dedup.rawShingles(toks, 3)
    val slow = when(size(sh) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
    val rows = df.select(
      graft.functions.FastHash.repetitionRatio(col("t"), 3).as("fast"),
      slow.as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("FastHash.shingles set-equals the declarative shingles") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown",
      "a b", "", "one two three")
      .toDF("t")
    val rows = df.select(
      graft.functions.FastHash.shingles(col("t"), 3).as("fast"),
      Dedup.shingles(col("t"), 3).as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0).toSet == r.getSeq[String](1).toSet)
    }
  }

  test("containment: finds the quoted passage Jaccard misses, directionally") {
    import spark.implicits._
    val passage = (1 to 40).map(i => s"w$i").mkString(" ")
    val page = "intro filler words " + passage + " trailing body " +
      (100 to 160).map(i => s"z$i").mkString(" ")
    val unrelated = (200 to 260).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, passage), (2L, page), (3L, unrelated)).toDF("id", "t")
    val got = graft.operators.Containment
      .containmentPairs(df, "id", "t", k = 5, tauNum = 4, tauDen = 5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // the passage is contained in the page; the page is NOT contained in
    // the passage (its own body dilutes it); unrelated pairs with nothing
    assert(got == Set((1L, 2L)), got)
    // symmetric Jaccard on the same pair sits far below any dedup
    // threshold — this operator exists precisely for that gap
    val sA = passage.split(" ").sliding(5).map(_.mkString(" ")).toSet
    val sB = page.split(" ").sliding(5).map(_.mkString(" ")).toSet
    val jac = sA.intersect(sB).size.toDouble / sA.union(sB).size
    assert(jac < 0.45, s"fixture too similar: $jac")
  }

  test("thresholdCurve: per-tau pair/drop/keep censuses are monotone, " +
      "boundaries exact, zero-pair thresholds still reported") {
    import spark.implicits._
    // hand pair table: sims 0.9, 0.7, 0.7 (shared drop id), 0.4
    val pairs = Seq((1L, 2L, 0.9), (3L, 4L, 0.7), (5L, 4L, 0.7),
      (6L, 7L, 0.4)).toDF("id_a", "id_b", "sim")
    val got = graft.operators.Dedup.thresholdCurve(pairs, "sim", "id_b",
      nDocs = 10L, thresholdsMilli = Seq(300L, 700L, 900L, 950L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(300L) == ((4L, 3L, 7L)))  // all pairs; drops {2,4,7}
    // tau = 0.7 keeps the 0.7 pairs (>= boundary is INCLUSIVE)
    assert(got(700L) == ((3L, 2L, 8L)))  // drops {2,4}; 4 counted once
    assert(got(900L) == ((1L, 1L, 9L)))
    // above every sim: zero row present, all docs kept
    assert(got(950L) == ((0L, 0L, 10L)))
  }

  test("containment posting-list expansion == shingle self-join reference " +
      "(r13 rewrite)") {
    import spark.implicits._
    // overlapping docs with shared runs so multiple shingles co-fire,
    // plus one near-boilerplate shingle right AT the cap boundary
    val base = (1 to 12).map(i => s"c$i").mkString(" ")
    val df = Seq(
      (1L, base + " x1 x2 x3 x4 x5"),
      (2L, base + " y1 y2 y3 y4 y5"),
      (3L, "pre1 pre2 " + base),
      (4L, (20 to 40).map(i => s"q$i").mkString(" ")),
      (5L, base)).toDF("id", "t")
    val got = graft.operators.Containment
      .containmentPairs(df, "id", "t", k = 5, tauNum = 1, tauDen = 3, dfCap = 4)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("inter"), r.getAs[Double]("containment"))).toMap
    // reference: the pre-r13 shingle-keyed SELF-JOIN over the identical
    // distinct (id, shingle) set with the same df cap
    def sh(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").sliding(5).map(_.mkString(" ")).toSeq
    val docs = Seq(1L -> (base + " x1 x2 x3 x4 x5"), 2L -> (base + " y1 y2 y3 y4 y5"),
      3L -> ("pre1 pre2 " + base), 4L -> (20 to 40).map(i => s"q$i").mkString(" "),
      5L -> base)
    val pairsRef = {
      val byDoc = docs.map { case (id, t) => id -> sh(t).distinct }
      val sizes = byDoc.map { case (id, s) => id -> s.size }.toMap
      val dfCount = byDoc.flatMap(_._2).groupBy(identity).map { case (s, xs) => s -> xs.size }
      val rare = byDoc.map { case (id, s) => id -> s.filter(dfCount(_) <= 4) }
      val inter = for {
        (a, sa) <- rare; (b, sb) <- rare; if a != b
        n = sa.toSet.intersect(sb.toSet).size; if n > 0
      } yield (a, b) -> n
      inter.filter { case ((a, _), n) => n * 3 >= 1 * sizes(a) }
        .map { case ((a, b), n) => (a, b) -> ((n.toLong, n.toDouble / sizes(a))) }
        .toMap
    }
    assert(got == pairsRef, s"got $got\nwant $pairsRef")
  }

  test("containment: dfCap excludes boilerplate shingles from evidence") {
    import spark.implicits._
    // one shared boilerplate line across many docs; with dfCap below the
    // boilerplate df, no pair can form on it
    val boiler = "subscribe to our newsletter for updates and offers now"
    val df = (1L to 8L).map(i => (i, boiler + s" unique tail $i a b c d e")).toDF("id", "t")
    val none = graft.operators.Containment
      .containmentPairs(df, "id", "t", k = 5, tauNum = 1, tauDen = 2, dfCap = 4)
    assert(none.isEmpty)
  }
}
