package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst aggregate: k-element MinHash signature in ONE pass.
  *
  * Replaces k separate per-hash aggregate columns — which generate O(k)
  * codegen — with a single imperative buffer of k longs updated per
  * input row. Map-side partial aggregation still applies (merge =
  * element-wise min), so only k longs per group cross the shuffle.
  *
  * Hash family: base = first 8 md5 digest bytes (big-endian signed
  * long); h_i(x) = a_i·base + b_i (wrapping, i.e. mod 2^64) — the
  * multiply-shift universal family. md5 + modular arithmetic are both
  * reproducible in DuckDB (HUGEINT), so LSH candidate sets — and
  * therefore the verified near-dup output — are oracle-checkable,
  * unlike the previous XXH64-seeded family.
  */
case class MinHashSignature(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val base = MinHashSignature.md5Base64(s.getBytes)
      val a = MinHashSignature.A
      val b = MinHashSignature.B
      var i = 0
      while (i < k) {
        val h = a(i) * base + b(i) // wrapping = mod 2^64, same as the oracle
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSignature =
    copy(child = newChildren.head)
}

object MinHashSignature {

  /** Multiply-shift constants, fixed seed. a_i odd and < 2^31 so the
    * oracle's HUGEINT product a_i·base stays below 2^127; b_i in
    * [0, 2^62). Rendered verbatim into the DuckDB oracle SQL. */
  val MaxK = 64
  val (a0, b0) = {
    val rnd = new java.util.Random(7L)
    val a = Array.fill(MaxK)(2L * rnd.nextInt(Int.MaxValue / 2) + 1L)
    val b = Array.fill(MaxK)(math.abs(rnd.nextLong()) >>> 2)
    (a, b)
  }
  def A: Array[Long] = a0
  def B: Array[Long] = b0

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 digest bytes, big-endian, as a signed long — identical
    * bits to the oracle's hex-substring parse. */
  def md5Base64(bytes: Array[Byte]): Long = {
    val d = md5Digest.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h
  }

  /** `min_hash_signature(shingleCol, k)` as a Column aggregate. */
  def apply(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(c), k).toAggregateExpression())
  }
}
