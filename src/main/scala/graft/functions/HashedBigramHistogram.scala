package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document hashed-bigram bucket histogram in ONE pass: for every
  * adjacent token pair "a b", md5 the pair and count it into bucket
  * `firstByte(md5) % buckets`. Returns a dense `array<bigint>` of length
  * `buckets`.
  *
  * Replaces the declarative DSIR feature step (explode bigrams → md5 →
  * pmod(conv(substring(md5hex, 1, 2), 16, 10))), which materialized one
  * row per corpus bigram; the first two hex chars of an md5 are exactly
  * its first byte, so `(digest(0) & 0xff) % buckets` lands every bigram
  * in the identical bucket with zero rows created. Null token elements
  * produce null bigrams in the declarative form (dropped by the bucket
  * join); here their pairs are skipped, matching that.
  */
case class HashedBigramHistogram(child: Expression, buckets: Int)
    extends UnaryExpression with CodegenFallback {

  require(buckets >= 2 && buckets <= 256,
    "hashed_bigram_histogram: 2..256 buckets (one md5 byte)")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_bigram_histogram expects array<string>, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_bigram_histogram"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val hist = new Array[Long](buckets)
    val md = MessageDigest.getInstance("MD5")
    var i = 1
    while (i < n) {
      if (!toks.isNullAt(i - 1) && !toks.isNullAt(i)) {
        val a = toks.getUTF8String(i - 1).getBytes
        val b = toks.getUTF8String(i).getBytes
        md.update(a)
        md.update(' '.toByte)
        md.update(b)
        val d = md.digest() // resets for the next pair
        hist((d(0) & 0xff) % buckets) += 1L
      }
      i += 1
    }
    new GenericArrayData(hist.map(x => x: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBigramHistogram =
    copy(child = newChild)
}

object HashedBigramHistogram {
  def apply(c: Column, buckets: Int): Column =
    GraftColumnBridge.column(
      HashedBigramHistogram(GraftColumnBridge.expression(c), buckets))
}
