package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** K-minimum-values (KMV) distinct-count sketch as a single-pass Catalyst
  * aggregate — the distinct-counting sibling of [[SpaceSavingTopK]].
  *
  * Every input value is hashed to a uniform 64-bit point (the Column
  * helper routes through Spark's codegen'd `xxhash64`, so the aggregate
  * child is already a Long); the sketch keeps the `k` smallest DISTINCT
  * hash values seen. Two regimes:
  *
  *  - distinct ≤ k: the sketch holds every distinct hash, so
  *    `estimate = |kept|` is EXACT (up to 64-bit hash collisions,
  *    probability ≈ d²/2⁶⁵ — about 10⁻¹¹ at the 100k-distinct scale the
  *    oracle runs at). This is the regime the oracle-checked query runs
  *    in, mirroring how `freq_heavy_hitters` is exact below capacity.
  *  - distinct > k: the classic KMV estimator (Bar-Yossef et al., RANDOM
  *    2002; Beyer et al., SIGMOD 2007): if the k-th smallest normalized
  *    hash is u(k) ∈ (0,1), the unbiased estimate is (k−1)/u(k), with
  *    relative error ≈ 1/√(k−2) (k = 4096 → ~1.6%). Pinned empirically
  *    by `KmvSpec`.
  *
  * Distributed shape: a [[TypedImperativeAggregate]], so Spark runs
  * map-side partial aggregation — each task condenses its partition to at
  * most k longs and ONLY sketches cross the shuffle, never the raw keys.
  * Merge is set-union-then-trim (keep the k smallest of the union), which
  * is associative and commutative, so partial → final merge order never
  * changes the result. This is the bounded-memory formulation of
  * count-distinct for key spaces (user ids, URLs at 100 TB) that do not
  * fit an executor — and unlike `approx_count_distinct`'s HLL it also
  * yields exact answers below capacity, a mergeable sketch COLUMN that
  * can be stored per partition/day and unioned later, and a
  * deterministic result (no per-run randomness: the hash is fixed).
  *
  * The reference exposes distinct counting only as full `n_unique` over
  * materialized frames (polars over readstat scans); this is the same
  * question asked at a scale where the distinct set itself is the
  * bottleneck.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 16, "k must be at least 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = KmvEstimate.dataType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  // normalization of the k-th smallest signed hash onto (0,1) and the
  // (k−1)/u(k) estimator live in KmvEstimate, shared with KmvMerge
  override def eval(buffer: KmvBuffer): Any = KmvEstimate.eval(buffer, k)

  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** `kmv_distinct(col, k)` as a Column aggregate: hashes the column with
    * Spark's codegen'd xxhash64 (seed 42, the builtin default) and
    * sketches the hashes. The hash is null-guarded — xxhash64 maps a
    * null INPUT to the bare seed (it skips null children), which would
    * count null as a distinct value; the `when` keeps COUNT(DISTINCT)
    * semantics by turning null input into a null hash the update path
    * skips. */
  def apply(c: Column, k: Int): Column = {
    val guarded = org.apache.spark.sql.functions.when(
      c.isNotNull, org.apache.spark.sql.functions.xxhash64(c))
    GraftColumnBridge.column(
      KmvDistinct(GraftColumnBridge.expression(guarded), k).toAggregateExpression())
  }
}

/** Shared estimator: (estimate, is_exact, kept) from a KMV buffer. */
private[operators] object KmvEstimate {
  val dataType: StructType = StructType(Seq(
    StructField("estimate", LongType, nullable = false),
    StructField("is_exact", BooleanType, nullable = false),
    StructField("kept", IntegerType, nullable = false)))

  def eval(buffer: KmvBuffer, k: Int): InternalRow = {
    val kept = buffer.size
    if (kept < k) {
      InternalRow(kept.toLong, true, kept)
    } else {
      val kth = buffer.maxKept
      val u = (kth.toDouble - Long.MinValue.toDouble) / 1.8446744073709552e19
      val est = math.max(kept.toLong, math.round((k - 1).toDouble / u))
      InternalRow(est, false, kept)
    }
  }
}

/** The SKETCH ITSELF as a column: the k minimum hashes, ascending —
  * what makes KMV more than an estimator. Store one per group /
  * partition / day, union later with [[KmvMerge]], and the estimate of
  * the union is exactly what a single pass over the union would have
  * produced (set-union-then-trim is associative and lossless w.r.t.
  * the k minima). This is the sketch-column workflow HLL offers in
  * lakehouse engines, with the added exact-below-capacity property —
  * pinned end-to-end by the `distinct_kmv_union` oracle query. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 16, "k must be at least 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)
  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }
  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other); buffer
  }
  override def eval(buffer: KmvBuffer): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buffer.sortedHashes.map(x => x: Any))

  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  /** `kmv_sketch(col, k)` — null-guarded xxhash64 like [[KmvDistinct]]. */
  def apply(c: Column, k: Int): Column = {
    val guarded = org.apache.spark.sql.functions.when(
      c.isNotNull, org.apache.spark.sql.functions.xxhash64(c))
    GraftColumnBridge.column(
      KmvSketchAgg(GraftColumnBridge.expression(guarded), k).toAggregateExpression())
  }
}

/** Union previously-materialized KMV sketches (array<long> columns from
  * [[KmvSketchAgg]]) and estimate the distinct count of the union —
  * the "merge daily sketches into a monthly distinct" step. */
case class KmvMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 16, "k must be at least 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = KmvEstimate.dataType
  override def prettyName: String = "kmv_merge"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)
  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) { buffer.add(arr.getLong(i)); i += 1 }
    }
    buffer
  }
  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other); buffer
  }
  override def eval(buffer: KmvBuffer): Any = KmvEstimate.eval(buffer, k)

  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMerge =
    copy(child = newChildren.head)
}

object KmvMerge {
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvMerge(GraftColumnBridge.expression(c), k).toAggregateExpression())
}

/** Mutable sketch state: the k smallest distinct hash values, as a
  * sorted set capped at k by dropping the largest. TreeSet keeps
  * add/trim O(log k); the whole buffer is at most k boxed longs. */
final class KmvBuffer(val k: Int) {
  private val kept = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (kept.size < k) { kept.add(h); () }
    else if (h < kept.last()) {
      if (kept.add(h)) { kept.pollLast(); () }
    }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.kept.iterator()
    while (it.hasNext) add(it.next())
  }

  def size: Int = kept.size
  def maxKept: Long = kept.last()
  def sortedHashes: Array[Long] = {
    val out = new Array[Long](kept.size)
    val it = kept.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * kept.size)
    bb.putInt(k); bb.putInt(kept.size)
    val it = kept.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
}

object KmvBuffer {
  def fromBytes(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}
