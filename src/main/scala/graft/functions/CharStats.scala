package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document character statistics over Unicode code points:
  * `struct(n_cp, n_distinct, entropy)` where `entropy` is the Shannon
  * entropy (log base 2) of the document's code-point distribution.
  *
  * Character entropy is the classic cheap junk detector in LLM data
  * pipelines (CCNet-style): near-zero entropy flags repeated-character
  * filler, abnormally high entropy flags base64/binary spill — both
  * before any tokenizer or model runs. One linear pass per document
  * inside the scan; nothing is exploded, so the operator adds zero rows
  * and zero shuffles at any corpus size.
  *
  * The declarative equivalent (explode per character → groupBy) creates
  * one row per corpus CHARACTER — at 100 TB that is the difference
  * between a map-only scan and a quadrillion-row shuffle.
  */
case class CharStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_stats expects string, got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def prettyName: String = "char_stats"

  private val Log2Inv = 1.0 / math.log(2.0)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new scala.collection.mutable.LongMap[Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts(cp.toLong) = counts.getOrElse(cp.toLong, 0L) + 1L
      i += Character.charCount(cp)
      n += 1
    }
    var ent = 0.0
    if (n > 0) {
      val inv = 1.0 / n
      counts.foreachValue { c =>
        val p = c * inv
        ent -= p * math.log(p) * Log2Inv
      }
    }
    InternalRow(n, counts.size, ent)
  }

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStats {
  def apply(c: Column): Column =
    GraftColumnBridge.column(CharStats(GraftColumnBridge.expression(c)))
}
