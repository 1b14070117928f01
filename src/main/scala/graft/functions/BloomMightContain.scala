package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a codegen'd
  * expression.
  *
  * The incremental-dedup scale pattern: the filter is built over the
  * SMALL side (a new ingest batch's fingerprints), serialized into the
  * plan, and probed row-by-row while scanning the HUGE side — so the
  * corpus shrinks to ~|batch| candidate rows map-side, before any
  * shuffle. An exact join on the survivors then removes the false
  * positives, so the end-to-end result is exact regardless of fpp.
  *
  * Spark's own runtime-filter rewrite does this automatically only for
  * equi-joins it can see through; materializing the probe as a first-
  * class expression makes the pattern available to any plan shape (and
  * to SQL via GraftFunctions).
  *
  * The probe hashes the UTF-8 bytes of the input — the same bytes
  * `BloomFilter.putString` hashes — so filters built with either
  * putString or putBinary(utf8) match.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects string, got $other")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bloomRef.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(c: Column, bloom: BloomFilter): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(c), bloom))
}
