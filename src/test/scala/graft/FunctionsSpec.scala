package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions._

class FunctionsSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.Row

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("safeDiv guards zero denominators (F13)") {
    assert(one(safeDiv(lit(10.0), lit(0))) == 10.0)
    assert(one(safeDiv(lit(10.0), lit(4))) == 2.5)
  }

  test("ratioOrNull yields null on zero denominator (F13)") {
    assert(one(ratioOrNull(lit(10.0), lit(0.0))) == null)
    assert(one(ratioOrNull(lit(10.0), lit(4.0))) == 2.5)
  }

  test("clamp bounds both sides (F14)") {
    assert(one(clamp(lit(15.0), 0, 10)) == 10.0)
    assert(one(clamp(lit(-3.0), 0, 10)) == 0.0)
    assert(one(clamp(lit(7.0), 0, 10)) == 7.0)
  }

  test("safeFloat nulls NaN/Inf, rounds 4 (P16)") {
    assert(one(safeFloat(lit(Double.NaN))) == null)
    assert(one(safeFloat(lit(Double.PositiveInfinity))) == null)
    assert(one(safeFloat(lit(1.23456789))) == 1.2346)
  }

  test("extractFloat parses last whitespace token (P17)") {
    assert(one(extractFloat(lit("VIX 17.5"))) == 17.5)
    assert(one(extractFloat(lit("garbage"))) == null)
    assert(one(extractFloat(lit("a b 3.25  "))) == 3.25)
  }

  test("occTicker builds fixed-width OCC key (F2)") {
    // reference shape: O:{SYM}{yyMMdd}{C|P}{strike*1000:08d}
    // (forward-paper-trader/main.py:46-51)
    val v = one(occTicker(lit("AAPL"), to_date(lit("2026-03-20")), lit(true), lit(187.5)))
    assert(v == "O:AAPL260320C00187500")
    val p = one(occTicker(lit("F"), to_date(lit("2026-01-02")), lit(false), lit(9.0)))
    assert(p == "O:F260102P00009000")
  }

  test("tierLadder first-match-wins with >= boundaries (F16)") {
    val ladder = Seq(5.0 -> "home_run", 3.0 -> "strong", 1.0 -> "solid")
    assert(one(tierLadder(lit(5.0), ladder, "none")) == "home_run")
    assert(one(tierLadder(lit(4.99), ladder, "none")) == "strong")
    assert(one(tierLadder(lit(3.0), ladder, "none")) == "strong")
    assert(one(tierLadder(lit(1.0), ladder, "none")) == "solid")
    assert(one(tierLadder(lit(0.99), ladder, "none")) == "none")
  }

  test("flagScore sums boolean flags (F17)") {
    assert(one(flagScore(lit(true), lit(false), lit(true), lit(true))) == 3)
  }

  test("ruleScore adds points and clamps (F18)") {
    val r = Seq((lit(true), 2), (lit(true), 1), (lit(false), 2))
    assert(one(ruleScore(r, 10)) == 3.0)
    assert(one(ruleScore(Seq((lit(true), 7), (lit(true), 7)), 10)) == 10.0)
  }

  test("firedSignals keeps labels of fired rules only (F18)") {
    val v = one(firedSignals(Seq(
      (lit(true), "A"), (lit(false), "B"), (lit(true), "C"))))
    assert(v.asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("A", "C"))
  }

  test("support/resistance pick nearest candidates across price (F20)") {
    val cands = Seq(lit(95.0), lit(105.0), lit(98.0), lit(110.0))
    assert(one(supportLevel(lit(100.0), cands)) == 98.0)
    assert(one(resistanceLevel(lit(100.0), cands)) == 105.0)
  }

  test("regimeWeightedScore switches weight maps on news thresholds (F21)") {
    val scores = Seq((lit(10.0), 0.8, 0.2), (lit(5.0), 0.2, 0.8))
    // EVENT regime: 10*0.8 + 5*0.2 = 9 | QUIET: 10*0.2 + 5*0.8 = 6
    assert(one(regimeWeightedScore(lit(0.9), scores)) == 9.0)
    assert(one(regimeWeightedScore(lit(0.1), scores)) == 6.0)
    assert(one(regimeWeightedScore(lit(0.5), scores)) == 7.5) // midpoint
  }

  test("sortedLookup binary search agrees with element_at on a map, hit and miss") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(3)
    val entries = (0 until 200).map(i => (s"key_${rnd.nextInt(10000)}", rnd.nextGaussian()))
      .distinctBy(_._1).sortBy(_._1)
    val probes = entries.take(50).map(_._1) ++ (0 until 50).map(i => s"missing_$i")
    val df = probes.toDF("k")
      .withColumn("ks", typedLit(entries.map(_._1)))
      .withColumn("vs", typedLit(entries.map(_._2)))
      .withColumn("m", typedLit(entries.toMap))
      .withColumn("fast", graft.functions.FastHash.sortedLookup(col("ks"), col("vs"), col("k")))
      .withColumn("slow", element_at(col("m"), col("k")))
    df.collect().foreach { r =>
      val (fast, slow) = (r.get(r.fieldIndex("fast")), r.get(r.fieldIndex("slow")))
      assert(fast == slow, s"${r.getString(0)}: $fast vs $slow")
    }
  }

  test("JSON repair pipeline: fences stripped, object carved, parsed (F5/F6/F7)") {
    val raw = """```json
{"catalyst_score": 0.8, "thesis": "beat"}
``` trailing noise"""
    // fences first, then brace carve survives the trailing noise
    val parsed = one(parseRepairedJson(lit(raw),
      "catalyst_score DOUBLE, thesis STRING")).asInstanceOf[org.apache.spark.sql.Row]
    assert(parsed.getDouble(0) == 0.8)
    assert(parsed.getString(1) == "beat")
    assert(one(extractJsonObject(lit("no braces here"))) == null)
  }

  test("NFC normalization: composes combining sequences, idempotent, null-safe") {
    import graft.functions.UnicodeOps.nfcNormalize
    // decomposed e+U+0301 composes to precomposed U+00E9
    assert(one(nfcNormalize(lit("cafe\u0301"))) == "caf\u00e9")
    // already-NFC text is untouched (and the fast path returns it as-is)
    assert(one(nfcNormalize(lit("caf\u00e9"))) == "caf\u00e9")
    assert(one(nfcNormalize(lit("plain ascii"))) == "plain ascii")
    // idempotence
    assert(one(nfcNormalize(nfcNormalize(lit("A\u030a")))) == "\u00c5")
    assert(one(nfcNormalize(lit(null).cast("string"))) == null)
    // the expression lives inside codegen over a real scan
    import spark.implicits._
    val df = Seq("e\u0301", "x").toDF("s")
      .select(nfcNormalize(org.apache.spark.sql.functions.col("s")).as("n"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("\u00e9", "x"))
  }

  test("sortedIntersect equals array_intersect on sorted distinct longs (incl. empty)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_intersect, col, sort_array}
    import graft.functions.FastHash
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      def arr() = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted
      (i.toLong, arr(), arr())
    } :+ (999L, Seq.empty[Long], Seq(1L, 2L))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        FastHash.sortedIntersect(col("a"), col("b")).as("fast"),
        sort_array(array_intersect(col("a"), col("b"))).as("ref"))
    val bad = df.where(!(col("fast") === col("ref"))).count()
    assert(bad == 0)
  }

  test("packSorted/packedIntersect: roundtrip + intersect equal the array forms " +
      "(negatives, empties, wide gaps)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_intersect, col, sort_array}
    import graft.functions.FastHash
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { i =>
      def arr() = Seq.fill(rnd.nextInt(40))(
        rnd.nextLong() % 50L - (if (rnd.nextBoolean()) 1000000000L else 0L))
        .distinct.sorted
      (i.toLong, arr(), arr())
    } ++ Seq(
      (997L, Seq.empty[Long], Seq(1L, 2L)),
      (998L, Seq(Long.MinValue, -1L, 0L, Long.MaxValue),
        Seq(Long.MinValue, 0L, 7L, Long.MaxValue)),
      (999L, Seq(-5L), Seq(-5L)))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), col("a"),
        FastHash.unpackSorted(FastHash.packSorted(col("a"))).as("rt"),
        FastHash.packedIntersect(FastHash.packSorted(col("a")),
          FastHash.packSorted(col("b"))).as("fast"),
        sort_array(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.where(!(col("rt") === col("a"))).count() == 0)
    assert(df.where(!(col("fast") === col("ref"))).count() == 0)
  }

  test("tokenLcs: hand cases, order sensitivity, cap, normalization") {
    import spark.implicits._
    import graft.functions.FastHash
    def lcs(a: String, b: String, cap: Int = 64): Long =
      Seq((a, b)).toDF("a", "b")
        .select(FastHash.tokenLcs(col("a"), col("b"), cap)).head().getLong(0)
    assert(lcs("a b c", "a b c") == 3)
    assert(lcs("a b c d", "b d") == 2)
    assert(lcs("a b", "b a") == 1, "order matters, unlike Jaccard")
    assert(lcs("a b c", "x y z") == 0)
    assert(lcs("a b c", "a b c", cap = 2) == 2, "cap truncates both sides")
    assert(lcs("A  B", "a b") == 2, "lower(trim) tokenization")
  }

  test("tokenLcs agrees with a reference DP on random token strings") {
    import spark.implicits._
    import graft.functions.FastHash
    def refLcs(a: Array[String], b: Array[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rnd = new scala.util.Random(41)
    val rows = (1 to 200).map { i =>
      def s() = Array.fill(1 + rnd.nextInt(20))(("tok" + rnd.nextInt(6)))
      val (a, b) = (s(), s())
      (i, a.mkString(" "), b.mkString(" "), refLcs(a, b).toLong)
    }
    val df = rows.toDF("id", "a", "b", "ref")
      .withColumn("fast", FastHash.tokenLcs(col("a"), col("b"), 64))
    assert(df.where(col("fast") =!= col("ref")).count() == 0)
  }

  test("rougeL: hand-computed precision/recall/F1 and edge semantics") {
    import spark.implicits._
    import graft.operators.Rouge
    val df = Seq(
      (1L, "w x y z", "w x"),      // lcs 2: p=1, r=.5, f1=2/3
      (2L, "w x y z", "w x y z"),  // identical: all 1
      (3L, "w x", "q r")           // disjoint: f1 = 0 exactly
    ).toDF("id", "ref", "cand")
    val got = Rouge.rougeL(df, "id", "ref", "cand")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got(1L) == ((1.0, 0.5, 2.0 * 1.0 * 0.5 / 1.5)))
    assert(got(2L) == ((1.0, 1.0, 1.0)))
    assert(got(3L) == ((0.0, 0.0, 0.0)))
    // empty/whitespace sides have ZERO tokens (split's [""] artifact is
    // filtered): n_tok = 0, lcs = 0, and the null branch fires — two
    // empty texts must NOT score F1 = 1.0 (the r8 ADVICE regression)
    val edges = Seq((10L, "", ""), (11L, "  \t ", "w x"), (12L, "w x", ""))
      .toDF("id", "ref", "cand")
    val e = Rouge.rougeL(edges, "id", "ref", "cand")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.isNullAt(6)))).toMap
    assert(e(10L) == ((0L, 0L, 0L, true)), s"empty-vs-empty: ${e(10L)}")
    assert(e(11L) == ((0L, 2L, 0L, true)), s"whitespace ref: ${e(11L)}")
    assert(e(12L) == ((2L, 0L, 0L, true)), s"empty cand: ${e(12L)}")
  }

  test("bleu: identical = 1, substitution decays each order, clipping " +
      "caps repeats, missing 4-grams -> null, zero clip -> loud 0") {
    import spark.implicits._
    import graft.operators.Rouge
    val df = Seq(
      (1L, "a b c d e f", "a b c d e f"),  // identical
      (2L, "a b c d e f", "a b c d x f"),  // one substitution
      (3L, "a b", "a a a b"),              // repeat: clip p1 = 2/4, p4 = 0
      (4L, "a b c d e f", "a b c")         // no cand 4-gram -> null
    ).toDF("id", "ref", "cand")
    val got = Rouge.bleu(df, "id", "ref", "cand")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("bleu") == 1.0)
    val g2 = got(2L)
    assert(g2.getAs[Double]("p1") == 5.0 / 6 &&
      g2.getAs[Double]("p2") == 3.0 / 5 &&
      g2.getAs[Double]("p3") == 2.0 / 4 && g2.getAs[Double]("p4") == 1.0 / 3)
    val exp2 = math.exp((math.log(5.0 / 6) + math.log(3.0 / 5) +
      math.log(2.0 / 4) + math.log(1.0 / 3)) / 4.0)
    assert(math.abs(g2.getAs[Double]("bleu") - exp2) < 1e-15)
    assert(got(3L).getAs[Double]("p1") == 0.5, "clipped repeat")
    assert(got(3L).getAs[Double]("bleu") == 0.0, "zero 4-gram clip -> 0")
    assert(got(4L).isNullAt(got(4L).fieldIndex("bleu")),
      "candidate without 4-grams must be null, not 0")
  }

  test("compressRatio: boilerplate compresses far below prose, random " +
      "hex sits high, empty is 1.0, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders into a meadow full of unexpected vocabulary choices " +
      "each clause introducing genuinely novel words without repetition"
    val template = ("click here to subscribe now " * 40).trim
    val hexy = Seq.fill(120)(rnd.nextInt(16).toHexString).mkString
    val rows = Seq(("prose", prose), ("tmpl", template), ("hex", hexy),
      ("empty", "")).toDF("k", "t")
    def run() = rows.select($"k",
        graft.functions.FastHash.compressRatio($"t").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = run()
    assert(got("tmpl") < 0.15, s"template should crush: ${got("tmpl")}")
    assert(got("prose") > got("tmpl") * 2, got.toString)
    assert(got("hex") > 0.4, s"high-entropy text stays high: ${got("hex")}")
    assert(got("empty") == 1.0)
    assert(got == run(), "deflate at fixed level is deterministic in-JVM")
  }

  test("deflateRoundtrip: every text reproduces its own byte length, " +
      "multi-byte UTF-8 counted in bytes, empty is 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val texts = Seq("", "a", "the quick brown fox " * 50,
      "naïve café — ünïcödé ✓", Seq.fill(500)(rnd.nextPrintableChar()).mkString)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val got = rows.select($"id",
        graft.functions.FastHash.deflateRoundtrip($"t").as("rt"),
        org.apache.spark.sql.functions.octet_length($"t").cast("long")
          .as("bl"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    texts.indices.foreach { i =>
      val (rt, bl) = got(i.toLong)
      assert(rt == bl, s"text $i: roundtrip $rt != byte length $bl")
    }
    assert(got(0L)._1 == 0L)
    // the UTF-8 case really is multi-byte (bytes > chars)
    assert(got(3L)._2 > texts(3).length)
  }

  test("intDot: codegen kernel == declarative zip_with/aggregate on " +
      "random long vectors (incl. ragged and empty)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextInt(2001).toLong - 1000),
        Seq.fill(64)(rnd.nextInt(2001).toLong - 1000))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = expr("aggregate(zip_with(a, b, (x, y) -> x * y), " +
      "CAST(0 AS BIGINT), (acc, t) -> acc + t)")
    val out = df.select($"id",
        graft.functions.FastHash.intDot($"a", $"b").as("k"), hof.as("h"))
      .collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)}"))
    // ragged arrays: the kernel dots the COMMON PREFIX (zip_with would
    // null-pad and poison the sum — kernel semantics are the usable ones)
    val ragged = Seq((Seq(2L, 3L, 4L), Seq(10L, 20L)),
      (Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
    val rg = ragged.select(
      graft.functions.FastHash.intDot($"a", $"b").as("k")).collect()
    assert(rg(0).getLong(0) == 2L * 10 + 3 * 20 && rg(1).getLong(0) == 0L)
  }

  test("fieldMax6Agg: per-field max over packed 6-bit words equals the " +
      "unpacked reference across partitions, nulls are no-ops, and the " +
      "plan keeps codegen HashAggregate") {
    import spark.implicits._
    def pack(fields: Seq[Int]): Long =
      fields.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        acc | (v.toLong << (6 * i)) }
    def unpack(w: Long): Seq[Int] =
      (0 until 10).map(f => ((w >>> (6 * f)) & 63L).toInt)
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Int, java.lang.Long)] = (1 to 500).map { i =>
      (i % 7, java.lang.Long.valueOf(pack(Seq.fill(10)(rnd.nextInt(41)))))
    } ++ Seq((3, null: java.lang.Long)) // null word must not zero the max
    val df = rows.toDF("g", "w").repartition(8)
    val got = df.groupBy($"g")
      .agg(graft.functions.FastHash.fieldMax6Agg($"w").as("mx"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = rows.filter(_._2 != null).groupBy(_._1).map { case (g, rs) =>
      g -> pack((0 until 10).map(f =>
        rs.map(r => unpack(r._2.longValue())(f)).max))
    }
    assert(got == want)
    // declared shape: whole-stage-codegen HashAggregate, never
    // ObjectHashAggregate (the encoder-bound form this replaced)
    val plan = df.groupBy($"g")
      .agg(graft.functions.FastHash.fieldMax6Agg($"w"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") &&
      !plan.contains("ObjectHashAggregate"), plan)
  }
}
