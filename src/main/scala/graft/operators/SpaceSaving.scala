package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Space-Saving heavy-hitters sketch as a single-pass Catalyst aggregate.
  *
  * Tracks at most `capacity` keys; each retained key carries an estimated
  * count (an UPPER bound on its true frequency) and a per-key error bound
  * so that `trueCount ∈ [count - err, count]`. With `capacity` at least
  * the number of distinct keys no eviction ever fires and the counts are
  * EXACT (err = 0) — that is the regime the oracle-checked query runs in.
  * In the approximate regime the classic guarantee holds: every key whose
  * true frequency exceeds N/capacity is retained, and err ≤ N/capacity
  * (pinned empirically by `SpaceSavingSpec`).
  *
  * Distributed shape: this is a [[TypedImperativeAggregate]], so Spark
  * runs it with map-side partial aggregation — each task condenses its
  * partition to ≤ capacity (key, count, err) triples and ONLY the sketch
  * crosses the shuffle, never the raw keys. Merge follows the mergeable-
  * summaries construction (Agarwal et al., PODS 2012): union-sum counts
  * and errors; a key absent from one side is charged that side's `floor`
  * (the largest count ever evicted there — an upper bound on what the
  * absent key could have accumulated) into both its count and its error,
  * then the union is trimmed back to `capacity` by dropping the smallest
  * counts and raising the floor. When no eviction ever happened anywhere,
  * floor = 0 everywhere and merge degenerates to exact count summing.
  *
  * The reference exposes frequency analysis only as full group-by counts
  * (polars value_counts over readstat scans); this is the bounded-memory
  * formulation of the same question for corpora where the key space
  * itself (URLs, n-grams, user ids at 100 TB) does not fit an executor.
  *
  * Eviction scans for the current minimum (O(capacity)); a production
  * kernel for eviction-heavy regimes (capacity ≪ distinct) would keep the
  * stream-summary bucket list instead. The regimes used here — exact
  * (no evictions) or tiny test capacities — never hit that cost.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("count", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  /** All retained entries, sorted (count desc, key asc) for a stable
    * driver-visible order; callers explode + limit for top-k. */
  override def eval(buffer: SpaceSavingBuffer): Any = {
    val rows: Array[Any] = buffer.sortedEntries.map { case (k, c, e) =>
      InternalRow(UTF8String.fromString(k), c, e): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

object SpaceSavingTopK {
  /** `space_saving_topk(keyCol, capacity)` as a Column aggregate. */
  def apply(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingTopK(GraftColumnBridge.expression(c), capacity).toAggregateExpression())
}

/** Mutable sketch state: key → (count upper bound, error bound), plus the
  * floor (max count ever evicted — 0 until the first eviction). */
final class SpaceSavingBuffer(val capacity: Int) {
  val entries: mutable.HashMap[String, Array[Long]] = mutable.HashMap.empty
  var floor: Long = 0L

  def add(key: String): Unit = {
    entries.get(key) match {
      case Some(ce) => ce(0) += 1L
      case None =>
        if (entries.size < capacity) {
          // floor bounds what this key could have counted before eviction
          entries.put(key, Array(floor + 1L, floor))
        } else {
          val (minKey, minCe) = minEntry()
          entries.remove(minKey)
          if (minCe(0) > floor) floor = minCe(0)
          entries.put(key, Array(minCe(0) + 1L, minCe(0)))
        }
    }
  }

  private def minEntry(): (String, Array[Long]) = {
    var bk: String = null; var bv: Array[Long] = null
    entries.foreach { case (k, ce) =>
      if (bv == null || ce(0) < bv(0) || (ce(0) == bv(0) && k < bk)) { bk = k; bv = ce }
    }
    (bk, bv)
  }

  def mergeIn(other: SpaceSavingBuffer): Unit = {
    // keys in both: sums; keys only here: charge other's floor
    entries.foreach { case (k, ce) =>
      other.entries.get(k) match {
        case Some(oce) => ce(0) += oce(0); ce(1) += oce(1)
        case None      => ce(0) += other.floor; ce(1) += other.floor
      }
    }
    // keys only in other: charge this side's floor
    other.entries.foreach { case (k, oce) =>
      if (!entries.contains(k))
        entries.put(k, Array(oce(0) + floor, oce(1) + floor))
    }
    floor += other.floor
    if (entries.size > capacity) {
      val keep = entries.toArray.sortBy { case (k, ce) => (-ce(0), k) }
      var i = capacity
      while (i < keep.length) {
        val (k, ce) = keep(i)
        entries.remove(k)
        if (ce(0) > floor) floor = ce(0)
        i += 1
      }
    }
  }

  def sortedEntries: Array[(String, Long, Long)] =
    entries.toArray.map { case (k, ce) => (k, ce(0), ce(1)) }
      .sortBy { case (k, c, _) => (-c, k) }

  def toBytes: Array[Byte] = {
    val keys = entries.toArray
    var size = 4 + 8 + 4
    keys.foreach { case (k, _) => size += 4 + k.getBytes("UTF-8").length + 16 }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(capacity); bb.putLong(floor); bb.putInt(keys.length)
    keys.foreach { case (k, ce) =>
      val b = k.getBytes("UTF-8")
      bb.putInt(b.length); bb.put(b); bb.putLong(ce(0)); bb.putLong(ce(1))
    }
    bb.array()
  }
}

object SpaceSavingBuffer {
  def fromBytes(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new SpaceSavingBuffer(bb.getInt)
    buf.floor = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len); bb.get(kb)
      buf.entries.put(new String(kb, "UTF-8"), Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }
}
