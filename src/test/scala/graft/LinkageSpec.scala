package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Linkage
import graft.operators.Linkage.Comparison

/** Fellegi–Sunter record linkage: blocked candidate generation with the
  * oversized-block guard, weight arithmetic, and the three-way decision
  * rule. */
class LinkageSpec extends AnyFunSuite with SparkFixture {

  test("blockedCandidates: within-block pairs only, id_a < id_b, suffixed fields") {
    import spark.implicits._
    val df = Seq((1L, "x", "n1"), (2L, "x", "n2"), (3L, "y", "n3"),
      (4L, "x", "n4")).toDF("id", "blk", "name")
    val got = Linkage.blockedCandidates(df, "id", "blk")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // block x = {1,2,4} -> 3 pairs; block y is a singleton
    assert(got === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val cols = Linkage.blockedCandidates(df, "id", "blk").columns.toSet
    assert(cols === Set("blk", "id_a", "name_a", "id_b", "name_b"))
  }

  test("oversized blocks are excluded and censused") {
    import spark.implicits._
    val df = (1L to 6L).map(i => (i, if (i <= 4) "big" else "ok"))
      .toDF("id", "blk")
    val pairs = Linkage.blockedCandidates(df, "id", "blk", maxBlockSize = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((5L, 6L)), "only the small block pairs")
    val skipped = Linkage.skippedBlocks(df, "blk", maxBlockSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skipped === Map("big" -> 4L))
  }

  test("fellegiSunter: weights, field-order fold, three-way rule, null = disagree") {
    import spark.implicits._
    val c1 = Comparison("f1", m = 0.9, u = 0.1)   // wa = log2(9), wd = log2(1/9)
    val c2 = Comparison("f2", m = 0.8, u = 0.2)   // wa = 2, wd = log2(0.25) = -2
    assert(math.abs(c2.agreeWeight - 2.0) < 1e-12)
    assert(math.abs(c2.disagreeWeight + 2.0) < 1e-12)
    val pairs = Seq(
      (1L, 2L, Some(true), Some(true)),    // log2(9) + 2  ~ 5.17 -> match
      (1L, 3L, Some(true), Some(false)),   // log2(9) - 2  ~ 1.17 -> possible
      (1L, 4L, Some(false), Some(false)),  // -log2(9) - 2 ~ -5.17 -> nonmatch
      (1L, 5L, None, Some(true)))          // null agr counts as disagree
      .toDF("id_a", "id_b", "f1", "f2")
    val got = Linkage.fellegiSunter(pairs, Seq(c1, c2), upper = 5.0, lower = 0.0)
      .collect().map(r => r.getLong(1) -> (r.getDouble(4), r.getString(5))).toMap
    assert(got(2L)._2 == "match" && got(3L)._2 == "possible" &&
      got(4L)._2 == "nonmatch")
    assert(math.abs(got(2L)._1 - (math.log(9) / math.log(2) + 2.0)) < 1e-12)
    // null f1 -> disagreement weight applies
    assert(math.abs(got(5L)._1 - (-math.log(9) / math.log(2) + 2.0)) < 1e-12)
  }

  test("jaroWinkler kernel: DuckDB-probed goldens bit-match") {
    import org.apache.spark.unsafe.types.UTF8String
    // values captured from duckdb jaro_winkler_similarity (repr) — the
    // oracle-parity contract is BIT equality, not approximate
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("abc", "abc", 1.0), ("abc", "xyz", 0.0),
      ("", "abc", 0.0), ("", "", 0.0), ("ab", "ba", 0.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("DwAyNE", "DuANE", 0.8400000000000001),
      ("arnab", "aranb", 0.9466666666666665),
      ("prefixmatch", "prefixmxtch", 0.9636363636363636),
      ("aaaaaaaaaa", "aaaaaaaaab", 0.96),
      // boost suppressed at jaro <= 0.7 despite the common prefix
      ("aaxxxxxx", "aayyyyyy", 0.5), ("abcdef", "abzzzz", 0.5555555555555555))
    cases.foreach { case (a, b, v) =>
      val got = graft.functions.FastStringSim.jaroWinklerValue(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(v), s"'$a'/'$b': $got != $v")
    }
  }

  test("damerauLevenshtein kernel: DuckDB-probed goldens (true DL, " +
    "bytes) exact-match; transposition beats the levenshtein cost") {
    import org.apache.spark.unsafe.types.UTF8String
    // values captured from duckdb damerau_levenshtein — true
    // Lowrance-Wagner (CA->ABC = 2, not OSA's 3), byte-level
    // (héllo/hello = 2: é is two UTF-8 bytes)
    val cases = Seq(
      ("CA", "ABC", 2L), ("ABC", "CA", 2L), ("ab", "ba", 1L),
      ("kitten", "sitting", 3L), ("", "abc", 3L), ("", "", 0L),
      ("same", "same", 0L), ("abcdef", "abcfed", 2L),
      ("aXbYc", "abc", 2L), ("transpose", "transpsoe", 1L),
      ("héllo", "hello", 2L), ("banana", "ananas", 2L),
      ("aaa", "aaaa", 1L), ("xy", "yx", 1L), ("abcd", "dcba", 3L),
      ("Customer#0012", "Customer#0021", 1L))
    cases.foreach { case (a, b, v) =>
      val got = graft.functions.FastStringSim.damerauLevenshteinValue(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == v, s"'$a'/'$b': $got != $v")
    }
    // symmetry + triangle-ish sanity on a random byte fixture
    val rnd = new scala.util.Random(5)
    val strs = (1 to 30).map(_ =>
      (1 to rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString)
    for (a <- strs; b <- strs) {
      val ab = graft.functions.FastStringSim.damerauLevenshteinValue(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val ba = graft.functions.FastStringSim.damerauLevenshteinValue(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(ab == ba, s"asymmetric: '$a'/'$b'")
      assert(ab <= math.max(a.length, b.length))
      if (a == b) assert(ab == 0L)
    }
  }

  test("smithWaterman kernel: hand-scored goldens; equals a full-matrix " +
      "reference; containment scores where Levenshtein punishes flanks") {
    import org.apache.spark.unsafe.types.UTF8String
    def sw(a: String, b: String): Long =
      graft.functions.FastStringSim.smithWatermanValue(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // hand-scored (match +2, mismatch -1, gap -1); duckdb prototype
    // of the anti-diagonal oracle fold reproduced these exactly
    assert(sw("HEARTBEAT", "HEARTBURN") == 12L) // HEARTB run
    assert(sw("ABCDEF", "XXABCXDEF") == 11L)    // ABC -gap- DEF
    assert(sw("AAAA", "BBBB") == 0L)
    assert(sw("SAME", "SAME") == 8L)
    assert(sw("", "abc") == 0L && sw("", "") == 0L)
    // independent full-matrix reference
    def ref(a: String, b: String): Long = {
      val h = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length) {
        val s = if (a(i - 1) == b(j - 1)) 2 else -1
        h(i)(j) = math.max(0, math.max(h(i - 1)(j - 1) + s,
          math.max(h(i - 1)(j) - 1, h(i)(j - 1) - 1)))
        best = math.max(best, h(i)(j))
      }
      best.toLong
    }
    val rnd = new scala.util.Random(11)
    val strs = (1 to 25).map(_ =>
      (1 to rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString)
    for (a <- strs; b <- strs) assert(sw(a, b) == ref(a, b), s"'$a'/'$b'")
    // the containment property: a needle inside a long haystack keeps
    // its full score while levenshtein-style distance grows with flanks
    assert(sw("needle", "xxxxxxxxneedleyyyyyyyy") == 12L)
  }

  test("fuzzyBestMatch: picks the closest name per record; threshold " +
      "filters; equal scores break by id") {
    import spark.implicits._
    val rec = Seq(
      (1L, "b", "jonathan smith"), (2L, "b", "jonathan smith"),
      (3L, "b", "jonathan smyth"), (4L, "b", "zzzz qqqq vvvv"))
      .toDF("id", "blk", "name")
    val got = Linkage.fuzzyBestMatch(rec, "id", "blk", "name", 0.9)
      .collect().map(r => r.getAs[Long]("id_a") ->
        ((r.getAs[Long]("id_b"), r.getAs[Double]("jw")))).toMap
    // 1's best is the identical 2 (jw 1.0), not the one-char-off 3
    assert(got(1L) == ((2L, 1.0)))
    // 2's best remaining candidate is 3 (identical 1 is id_a side only)
    assert(got(2L)._1 == 3L && got(2L)._2 < 1.0 && got(2L)._2 > 0.9)
    // the unrelated name never crosses 0.9 in either role
    assert(!got.contains(4L) && got.values.forall(_._1 != 4L))
    // tie: two identical candidates -> smaller id wins
    val tie = Seq((1L, "b", "abc"), (2L, "b", "abc"), (3L, "b", "abc"))
      .toDF("id", "blk", "name")
    val t = Linkage.fuzzyBestMatch(tie, "id", "blk", "name", 0.5)
      .collect().map(r => r.getAs[Long]("id_a") -> r.getAs[Long]("id_b"))
      .toMap
    assert(t(1L) == 2L && t(2L) == 3L)
  }

  test("ahoCorasick: all-occurrences semantics (overlapping + nested), " +
      "counts match a naive positional scan, null text stays null, " +
      "empty pattern refused") {
    import spark.implicits._
    import graft.functions.AhoCorasick
    // nested ("tab" in "table") and self-overlapping ("aa" in "aaaa")
    val pats = Seq("aa", "tab", "table", "ab")
    val texts = Seq(
      (1L, "aaaa"),                      // "aa" x3 overlapping
      (2L, "a table on a tab"),
      (3L, "zzz"),                       // no hits
      (4L, null.asInstanceOf[String]))
    val rows = texts.toDF("id", "t")
      .withColumn("c", AhoCorasick.counts($"t", pats))
      .orderBy("id").collect()
    def naive(text: String, p: String): Long =
      (1 to text.length - p.length + 1)
        .count(i => text.substring(i - 1, i - 1 + p.length) == p).toLong
    for ((id, tx) <- texts.take(3); r = rows(id.toInt - 1)) {
      val got = r.getSeq[Long](r.fieldIndex("c"))
      assert(got == pats.map(naive(tx, _)), s"doc $id: $got")
    }
    assert(rows(0).getSeq[Long](2) == Seq(3L, 0L, 0L, 0L))
    assert(rows(1).getSeq[Long](2) == Seq(0L, 2L, 1L, 2L))
    assert(rows(3).isNullAt(2)) // null text -> null, row kept
    intercept[Exception] {
      texts.take(1).toDF("id", "t")
        .select(AhoCorasick.counts($"t", Seq("ok", ""))).collect()
    }
  }
}
