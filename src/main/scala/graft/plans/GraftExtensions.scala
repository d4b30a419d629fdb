package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CdcChunksExpr, CosineExpr, DamerauLevenshteinExpr, DeflateRatioExpr, ErfcExpr, IntDotExpr, JaroWinklerExpr, LgammaExpr, MaskRepeatedExpr, MinHashSigExpr, RepetitionExpr, ShinglesExpr, SimHash64Expr, SmithWatermanExpr, SortedIntersectExpr, SortedLookupExpr, SrpBucketExpr, WinnowFpsExpr}

/** Catalyst integration (SURVEY §4 custom work item 2): the engine's
  * codegen'd expressions registered as SQL functions, plus a small
  * optimizer rule, both injected through `SparkSessionExtensions` so a
  * plain `spark.sql` user gets them with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSigExpr(args.head,
        intArg(args(1), "shingle n"), intArg(args(2), "k"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_srp_bucket"),
      new ExpressionInfo(classOf[SrpBucketExpr].getName, "graft_srp_bucket"),
      (args: Seq[Expression]) => SrpBucketExpr(args.head,
        intArg(args(1), "table"), intArg(args(2), "planes"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineExpr].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_int_dot"),
      new ExpressionInfo(classOf[IntDotExpr].getName, "graft_int_dot"),
      (args: Seq[Expression]) => IntDotExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_compress_ratio"),
      new ExpressionInfo(classOf[DeflateRatioExpr].getName,
        "graft_compress_ratio"),
      (args: Seq[Expression]) => DeflateRatioExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (args: Seq[Expression]) => ShinglesExpr(args.head, intArg(args(1), "shingle n"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_repetition"),
      new ExpressionInfo(classOf[RepetitionExpr].getName, "graft_repetition"),
      (args: Seq[Expression]) => RepetitionExpr(args.head, intArg(args(1), "ngram n"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunksExpr].getName, "graft_cdc_chunks"),
      (args: Seq[Expression]) => CdcChunksExpr(args.head,
        intArg(args(1), "boundary nibbles"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[WinnowFpsExpr].getName, "graft_winnow_fps"),
      (args: Seq[Expression]) => WinnowFpsExpr(args.head,
        intArg(args(1), "gram k"), intArg(args(2), "window w"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_mask_repeated"),
      new ExpressionInfo(classOf[MaskRepeatedExpr].getName, "graft_mask_repeated"),
      (args: Seq[Expression]) => MaskRepeatedExpr(args.head,
        intArg(args(1), "ngram n"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_lookup"),
      new ExpressionInfo(classOf[SortedLookupExpr].getName, "graft_sorted_lookup"),
      (args: Seq[Expression]) => SortedLookupExpr(args.head, args(1), args(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectExpr].getName, "graft_sorted_intersect"),
      (args: Seq[Expression]) => SortedIntersectExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_lgamma"),
      new ExpressionInfo(classOf[LgammaExpr].getName, "graft_lgamma"),
      (args: Seq[Expression]) => LgammaExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName,
        "graft_jaro_winkler"),
      (args: Seq[Expression]) => JaroWinklerExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_erfc"),
      new ExpressionInfo(classOf[ErfcExpr].getName, "graft_erfc"),
      (args: Seq[Expression]) => ErfcExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_damerau"),
      new ExpressionInfo(classOf[DamerauLevenshteinExpr].getName,
        "graft_damerau"),
      (args: Seq[Expression]) => DamerauLevenshteinExpr(args.head,
        args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_smith_waterman"),
      new ExpressionInfo(classOf[SmithWatermanExpr].getName,
        "graft_smith_waterman"),
      (args: Seq[Expression]) => SmithWatermanExpr(args.head,
        args(1))))
    ext.injectOptimizerRule(_ => CollapseRedundantRound)
  }
}

/** round_s(round_s(x)) == round_s(x) for equal literal scales (HALF_UP on
  * an already-quantized value is the identity). The oracle-parity style of
  * this engine rounds defensively at operator boundaries, so nested equal-
  * scale rounds occur naturally (e.g. merge-upsert over pre-rounded
  * columns); this removes the inner pass. */
object CollapseRedundantRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case outer @ Round(Round(inner, innerScale, _), outerScale, _)
          if innerScale.semanticEquals(outerScale) &&
            innerScale.isInstanceOf[Literal] =>
        outer.withNewChildren(Seq(inner, outerScale))
    }
}
