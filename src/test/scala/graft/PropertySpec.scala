package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Bracket
import graft.kernels.Bracket.{BarIn, GridBarIn, GridCfg}
import graft.operators.Streaks

/** Property-based invariants (SURVEY §5.3): bracket-scan lookahead/side
  * rules, streak bounds, score clamps — checked over generated inputs
  * rather than fixtures. Kernel properties run on the plain Scala kernel
  * (no Spark round-trip) so hundreds of cases stay fast. Sampling is
  * seeded (reference precedent: seed=42) for reproducibility. */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 300)(f: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private val barGen: Gen[Seq[BarIn]] = for {
    n <- Gen.choose(1, 40)
    ts <- Gen.listOfN(n, Gen.choose(1L, 1000L))
    prices <- Gen.listOfN(n, Gen.choose(10.0, 200.0))
  } yield ts.distinct.sorted.zip(prices).map { case (t, p) =>
    BarIn(1L, t, p, p * 1.05, p * 0.95, p, entry_ts = 100L,
      timeout_ts = 800L, slippage = 1.02, target_mult = 1.40, stop_mult = 0.75,
      stop_adverse = false, timeout_mult = 1.0)
  }

  test("bracket: exit never precedes entry; prices on the correct side (X1 invariants)") {
    forAll(barGen) { bars =>
      val fills = Bracket.scanGroup(1L, bars.iterator).toSeq
      fills.foreach { f =>
        assert(f.exit_ts >= f.entry_ts) // lookahead audit (audit_winner.py §3)
        assert(f.entry_price > 0)
        f.exit_reason match {
          case "stop" =>
            assert(f.exit_price == f.entry_price * 0.75)
            assert(f.return_pct < 0)
          case "target" =>
            assert(f.exit_price == f.entry_price * 1.40)
            assert(f.return_pct > 0)
          case _ => // timeout exits at close: any side
        }
      }
      // at most one fill per trade, none when no bar reaches entry_ts
      assert(fills.size <= 1)
      if (bars.forall(_.t < 100L)) assert(fills.isEmpty)
    }
  }

  test("bracket: tightening the stop can only exit earlier or equal") {
    forAll(barGen) { bars =>
      val loose = Bracket.scanGroup(1L, bars.iterator).toSeq
      val tight = Bracket.scanGroup(1L,
        bars.map(b => b.copy(stop_mult = 0.90)).iterator).toSeq
      (loose, tight) match {
        case (Seq(l), Seq(t)) => assert(t.exit_ts <= l.exit_ts)
        case _ => // entry never reached in both
      }
    }
  }

  test("bracket: Stress adverse fills exit at the same bar, never at a better price (X2)") {
    forAll(barGen) { bars =>
      val base = Bracket.scanGroup(1L, bars.iterator).toSeq
      val stress = Bracket.scanGroup(1L,
        bars.map(b => b.copy(stop_adverse = true, timeout_mult = 0.95)).iterator).toSeq
      (base, stress) match {
        case (Seq(b), Seq(s)) =>
          // fill adjustments change prices only, never the exit trigger
          assert(s.exit_ts == b.exit_ts && s.exit_reason == b.exit_reason)
          assert(s.exit_price <= b.exit_price)
        case (l, t) => assert(l.size == t.size) // both empty: entry never reached
      }
    }
  }

  test("grid sweep kernel == independent per-config scans, cell for cell (X3)") {
    val grid = Array(
      GridCfg(0, 1.02, 1.40, 0.75, stop_adverse = false, timeout_mult = 1.0),
      GridCfg(1, 1.00, 1.10, 0.95, stop_adverse = false, timeout_mult = 1.0),
      GridCfg(2, 1.05, 1.40, 0.75, stop_adverse = true, timeout_mult = 0.95))
    forAll(barGen) { bars =>
      val gridBars = bars.map(b => GridBarIn(b.trade_id, b.t, b.o, b.h, b.l,
        b.c, b.entry_ts, b.timeout_ts))
      val fromGrid = Bracket.scanGroupGrid(1L, gridBars.iterator, grid).toSeq
        .map(f => f.gid -> f).toMap
      grid.foreach { c =>
        val single = Bracket.scanGroup(1L, bars.map(b => b.copy(
          slippage = c.slippage, target_mult = c.target_mult,
          stop_mult = c.stop_mult, stop_adverse = c.stop_adverse,
          timeout_mult = c.timeout_mult)).iterator).toSeq
        (single, fromGrid.get(c.gid)) match {
          case (Seq(s), Some(g)) =>
            assert(g.entry_ts == s.entry_ts && g.entry_price == s.entry_price)
            assert(g.exit_ts == s.exit_ts && g.exit_price == s.exit_price)
            assert(g.exit_reason == s.exit_reason && g.bars_held == s.bars_held)
            assert(g.return_pct == s.return_pct)
          case (Seq(), None) => // entry never reached in both
          case (s, g) => fail(s"grid/single disagree: single=$s grid=$g")
        }
      }
    }
  }

  test("streak fold: 0 <= max streak <= total losses, equals run-length maximum") {
    forAll(Gen.listOf(Gen.oneOf(true, false))) { losses =>
      val agg = new Streaks.MaxStreakAgg
      val got = agg.finish(losses.foldLeft(agg.zero)(agg.reduce))
      val expected =
        if (losses.isEmpty) 0
        else {
          // independent reference: split into runs, measure longest true-run
          var best = 0; var cur = 0
          losses.foreach { l => cur = if (l) cur + 1 else 0; best = math.max(best, cur) }
          best
        }
      assert(got == expected)
      assert(got >= 0 && got <= losses.count(identity))
    }
  }

  test("rule score stays clamped to [0, max] for any rule outcome (F18)") {
    forAll(Gen.listOf(Gen.zip(Gen.oneOf(true, false), Gen.choose(-5, 8)))) { rules =>
      val raw = rules.collect { case (true, p) => p }.sum
      val clamped = math.max(0, math.min(10, raw))
      assert(clamped >= 0 && clamped <= 10)
    }
  }

  test("premium score equals the count of true flags (F17)") {
    forAll(Gen.listOfN(5, Gen.oneOf(true, false))) { flags =>
      val score = flags.count(identity)
      assert(score >= 0 && score <= 5)
      assert((score >= 1) == flags.exists(identity)) // is_premium_signal
    }
  }

  private val tokenSeqGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 120)
    toks <- Gen.listOfN(n, Gen.oneOf(
      (0 until 23).map(i => s"tok$i") ++ Seq("a", "zz", "q9")))
  } yield toks

  private def utf8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
  private def arrSeq(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  test("cdc chunker: chunks reassemble exactly; an edit touches a bounded neighborhood") {
    forAll(tokenSeqGen, cases = 200) { toks =>
      val text = toks.mkString(" ")
      val chunks = arrSeq(graft.functions.FastHash.cdcChunksValue(utf8(text), 2))
      assert(chunks.mkString(" ") == text.toLowerCase, "lossless reassembly")
      assert(chunks.forall(_.nonEmpty))
      // locality: mutate one token -> all but <= 2 original chunks survive
      if (toks.length > 1) {
        val idx = toks.length / 2
        val edited = toks.updated(idx, "MUTANT").mkString(" ")
        val after = arrSeq(graft.functions.FastHash.cdcChunksValue(utf8(edited), 2))
        val common = chunks.toSet intersect after.toSet
        assert(common.size >= chunks.toSet.size - 2,
          s"edit invalidated ${chunks.toSet.size - common.size} chunks")
      }
    }
  }

  test("winnowing: selection is sorted-distinct gram md5s, bounded by window count") {
    val k = 4; val w = 8
    forAll(tokenSeqGen, cases = 200) { toks =>
      val text = toks.mkString(" ")
      val fps = arrSeq(graft.functions.FastHash.winnowFpsValue(utf8(text), k, w))
      val nGrams = math.max(toks.length - k + 1, 0)
      if (nGrams == 0) assert(fps.isEmpty)
      else {
        assert(fps == fps.sorted && fps.distinct == fps)
        assert(fps.nonEmpty && fps.size <= math.max(nGrams - w, 0) + 1)
        // every fingerprint is the md5 of some gram of this doc
        val md = java.security.MessageDigest.getInstance("MD5")
        val gramMd5s = (0 to toks.length - k).map { i =>
          md.reset()
          md.digest(toks.slice(i, i + k).mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
        }.toSet
        assert(fps.forall(gramMd5s.contains))
      }
    }
  }

  test("mask-repeated: doubling inverts exactly; kept is a subsequence; fixed cases") {
    def mask(s: String, n: Int) =
      graft.functions.FastHash.maskRepeatedValue(utf8(s), n).toString
    // a doubled doc with no internal repeats masks back to one copy
    assert(mask("a b c d a b c d", 3) == "a b c d")
    // overlapping self-repetition collapses to the first token
    assert(mask("a a a a a", 3) == "a")
    // no repeats -> identity (normalized)
    assert(mask("The  quick Brown fox", 3) == "the quick brown fox")
    // shorter than n -> normalized pass-through
    assert(mask("just two", 3) == "just two")
    forAll(tokenSeqGen, cases = 200) { toks =>
      val kept = mask(toks.mkString(" "), 3).split(" ").toSeq
      // kept tokens are a subsequence of the input tokens
      var i = 0
      kept.foreach { t =>
        val j = toks.indexOf(t, i)
        assert(j >= 0, s"'$t' out of order in $toks")
        i = j + 1
      }
      // token 1 always survives
      assert(kept.head == toks.head)
      // a doc with all-distinct grams never masks
      val grams = toks.sliding(3).map(_.mkString(" ")).toSeq
      if (toks.length >= 3 && grams.distinct == grams)
        assert(kept == toks)
    }
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 token run share a fingerprint") {
    val k = 4; val w = 8
    val gen = for {
      a <- tokenSeqGen
      b <- tokenSeqGen
      shared <- Gen.listOfN(w + k - 1, Gen.oneOf(
        (0 until 11).map(i => s"sh$i")))
    } yield (a, b, shared)
    forAll(gen, cases = 150) { case (a, b, shared) =>
      val d1 = (a ++ shared).mkString(" ")
      val d2 = (shared ++ b).mkString(" ")
      val f1 = arrSeq(graft.functions.FastHash.winnowFpsValue(utf8(d1), k, w)).toSet
      val f2 = arrSeq(graft.functions.FastHash.winnowFpsValue(utf8(d2), k, w)).toSet
      assert((f1 intersect f2).nonEmpty,
        s"guarantee violated for shared run '${shared.mkString(" ")}'")
    }
  }
}
