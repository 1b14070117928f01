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

/** The columnar-path twin of [[DoubleLabelLut]]: labels pre-encode to raw
  * UTF-8 byte arrays because OnHeapColumnVector string appends take
  * (bytes, offset, len) — going through UTF8String would re-copy. */
private[readstat] final class DoubleByteLut(m: Map[Double, String]) {
  private val lm = new scala.collection.mutable.LongMap[Array[Byte]](m.size * 2)
  m.foreach { case (k, s) =>
    lm(java.lang.Double.doubleToLongBits(k)) =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8) }
  def get(d: Double): Array[Byte] =
    lm.getOrNull(java.lang.Double.doubleToLongBits(d))
}

/** Int-keyed byte-array label LUT for the Stata columnar path (labels key
  * on int codes there): dense array when the code range is compact,
  * boxing-free LongMap otherwise — the same layout as StataModule's
  * row-path LabelLut. */
private[readstat] final class IntByteLut(m: Map[Int, String]) {
  private def enc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val lo: Int = if (m.isEmpty) 0 else m.keys.min
  private val hi: Int = if (m.isEmpty) -1 else m.keys.max
  private val dense: Array[Array[Byte]] =
    if (hi.toLong - lo.toLong < 65536L) {
      val a = new Array[Array[Byte]](hi - lo + 1)
      m.foreach { case (k, v) => a(k - lo) = enc(v) }
      a
    } else null
  private val sparse: scala.collection.mutable.LongMap[Array[Byte]] =
    if (dense == null) {
      val lm = new scala.collection.mutable.LongMap[Array[Byte]](m.size * 2)
      m.foreach { case (k, v) => lm(k.toLong) = enc(v) }
      lm
    } else null
  def get(code: Int): Array[Byte] =
    if (dense != null) {
      if (code < lo || code > hi) null else dense(code - lo)
    } else sparse.getOrNull(code.toLong)
}
