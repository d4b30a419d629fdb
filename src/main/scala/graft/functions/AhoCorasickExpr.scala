package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern scan (Aho & Corasick 1975) as a codegen
  * Expression — the decontamination primitive that checks a document
  * against EVERY needle in ONE pass: the q462 Smith–Waterman answers
  * "does this one needle appear fuzzily"; a benchmark-contamination /
  * blocklist gate needs "which of these k exact needles appear, and
  * how often" without k substring scans per document. The automaton
  * (goto trie + failure links + flattened output lists) is built ONCE
  * per expression instance from the pattern literals and shipped as a
  * codegen reference object; the scan is O(bytes + matches) per
  * document regardless of k — at crawl scale the pattern set rides
  * with the plan (broadcast-sized, the [[graft.operators.Decontam]]
  * contract: needle sets beyond memory go through the n-gram join
  * path, not this kernel).
  *
  * Semantics: counts EVERY occurrence of every pattern, overlapping
  * and nested included ("aa" occurs 2x in "aaa"; "tab" and "table"
  * both count inside "table") — the standard AC output-link walk,
  * flattened at build time so scanning never chases fail chains for
  * outputs. Matching is over UTF-8 BYTES; for ASCII patterns (the
  * blocklist/marker case) this is identical to a character walk, and
  * a cross-engine oracle replays each count as the positions i where
  * substring(text, i, len(p)) = p.
  *
  * Output: array<long> of per-pattern occurrence counts, in pattern
  * order. Null text -> null (standard null-intolerant expression).
  */
object AhoCorasick {

  /** The compiled automaton. Nodes are dense 256-way byte tables
    * (sum(pattern bytes) + 1 nodes — pattern sets are small by
    * contract, so the dense goto beats hashing in the scan loop);
    * `out` holds each node's FLATTENED pattern-index list (own
    * patterns plus every dict-suffix output, precomputed in BFS
    * order). */
  final class Automaton(patterns: Array[Array[Byte]]) extends Serializable {
    require(patterns.nonEmpty, "ahoCorasick: empty pattern set")
    require(patterns.forall(_.nonEmpty), "ahoCorasick: empty pattern")
    val nPatterns: Int = patterns.length

    private val (goto_, fail, out) = {
      val maxNodes = patterns.map(_.length).sum + 1
      val g = Array.fill(maxNodes)(Array.fill[Int](256)(-1))
      val ends = Array.fill(maxNodes)(List.empty[Int])
      var nNodes = 1
      var p = 0
      while (p < patterns.length) {
        var node = 0
        val pat = patterns(p)
        var i = 0
        while (i < pat.length) {
          val b = pat(i) & 0xFF
          if (g(node)(b) == -1) { g(node)(b) = nNodes; nNodes += 1 }
          node = g(node)(b)
          i += 1
        }
        ends(node) ::= p
        p += 1
      }
      val f = new Array[Int](nNodes)
      val o = new Array[Array[Int]](nNodes)
      o(0) = ends(0).reverse.toArray
      // BFS: root's missing edges loop to root; each child's fail is
      // the fail-parent's goto; outputs flatten as own ++ fail's
      val queue = scala.collection.mutable.Queue.empty[Int]
      var b = 0
      while (b < 256) {
        val c = g(0)(b)
        if (c == -1) g(0)(b) = 0
        else { f(c) = 0; o(c) = (ends(c).reverse ++ o(0)).toArray; queue += c }
        b += 1
      }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        b = 0
        while (b < 256) {
          val c = g(u)(b)
          if (c == -1) g(u)(b) = g(f(u))(b)
          else {
            f(c) = g(f(u))(b)
            o(c) = (ends(c).reverse ++ o(f(c)).toList).toArray
            queue += c
          }
          b += 1
        }
      }
      (g.take(nNodes), f, o)
    }

    /** Per-pattern overlapping occurrence counts over the text bytes. */
    def counts(text: Array[Byte]): Array[Long] = {
      val c = new Array[Long](nPatterns)
      var node = 0
      var i = 0
      while (i < text.length) {
        node = goto_(node)(text(i) & 0xFF)
        val os = out(node)
        var j = 0
        while (j < os.length) { c(os(j)) += 1L; j += 1 }
        i += 1
      }
      c
    }

    /** Codegen entry point: UTF8String in, Catalyst array out. */
    def countsArray(text: UTF8String): ArrayData =
      new GenericArrayData(counts(text.getBytes))
  }

  def counts(text: Column, patterns: Seq[String]): Column =
    GraftShim.column(AhoCorasickCountsExpr(
      GraftShim.expression(text), patterns))
}

/** string -> array<long> of per-pattern overlapping occurrence counts
  * (pattern order pinned at construction). */
case class AhoCorasickCountsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_aho_corasick_counts"

  @transient private lazy val automaton =
    new AhoCorasick.Automaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override protected def nullSafeEval(t: Any): Any =
    automaton.countsArray(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick.Automaton].getName)
    defineCodeGen(ctx, ev, t => s"$autoRef.countsArray($t)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AhoCorasickCountsExpr =
    copy(child = newChild)
}
