package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * text-pipeline canonicalizer that makes `café` (precomposed U+00E9)
  * and `cafe´` (e + combining U+0301) the SAME string before hashing,
  * deduplication, or tokenization; without it every digest/shingle
  * operator in the engine silently treats visually-identical documents
  * as distinct. Spark ships no normalizer built-in; this wraps the
  * JDK's `java.text.Normalizer` (Unicode-conformant, same tables every
  * engine implements) and stays inside whole-stage codegen via a
  * static call — no UDF boundary on the hot scan path. */
object UnicodeOps {

  /** Static entry for both interpreted and generated code paths. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: most corpus text is ASCII, already NFC by definition
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(text: Column): Column =
    GraftShim.column(NfcNormalizeExpr(GraftShim.expression(text)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeOps.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeOps.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
