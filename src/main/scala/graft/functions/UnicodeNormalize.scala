package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression —
  * Spark has no builtin for it, and a text-curation pipeline needs a
  * canonical form before fingerprinting: visually-identical documents
  * that differ only in combining-character encoding (e.g. "é" as U+00E9
  * vs U+0065 U+0301) must dedup together.
  *
  * Scale shape: per-row, allocation-bounded by the row's own text, stays
  * inside whole-stage codegen; the common already-normalized case is a
  * single `Normalizer.isNormalized` scan with no allocation at all.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = Normalizer.Form.valueOf(form.toUpperCase)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got $other")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], normForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", normForm,
      classOf[Normalizer.Form].getName)
    val cls = UnicodeNormalize.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.normalize($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Static helper shared by eval and generated code. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def apply(c: Column, form: String): Column =
    GraftColumnBridge.column(
      UnicodeNormalize(GraftColumnBridge.expression(c), form))
}
