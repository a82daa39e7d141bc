package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared implementation for [[NfcNormalize]] — one routine for the
  * interpreted eval and the generated code.
  */
object NormalizeImpl {

  /** Unicode NFC canonical composition. Fast path: `isNormalized` is a
    * scan without allocation (trivially true for ASCII, the bulk of any
    * web corpus), so already-composed text returns the INPUT UTF8String
    * untouched — no copy, no garbage.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step every text-dedup pipeline needs BEFORE hashing
  * (visually identical strings with different codepoint sequences — e.g.
  * é as U+00E9 vs e + U+0301 — must fingerprint identically, or every
  * composed/decomposed pair silently escapes dedup). Spark has no
  * built-in Unicode normalizer; a Scala UDF would leave whole-stage
  * codegen and serialize through the UDF boundary — this expression stays
  * fused in the generated code like the engine's other native functions.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeFunctions {

  /** Column-level Unicode NFC normalization backed by the native
    * expression.
    */
  def nfc_normalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}
