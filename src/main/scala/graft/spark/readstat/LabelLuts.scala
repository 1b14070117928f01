package graft.spark.readstat

import org.apache.spark.unsafe.types.UTF8String

/** Pre-encoded numeric-label lookup for row decoders (bits-keyed LongMap,
  * no boxing): one UTF8String per LABEL per partition instead of one per
  * ROW — `UTF8String.fromString` re-encodes UTF-8 on every call, and
  * labeled survey reads repeat the same handful of labels millions of
  * times. UTF8String is immutable, so sharing across rows is safe
  * (consumers copy bytes into their own unsafe buffers). */
private[readstat] final class DoubleLabelLut(m: Map[Double, String]) {
  private val lm = new scala.collection.mutable.LongMap[UTF8String](m.size * 2)
  m.foreach { case (k, s) =>
    lm(java.lang.Double.doubleToLongBits(k)) = UTF8String.fromString(s) }
  def get(d: Double): UTF8String =
    lm.getOrNull(java.lang.Double.doubleToLongBits(d))
}
