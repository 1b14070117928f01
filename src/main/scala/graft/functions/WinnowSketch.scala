package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schleimer winnowing sketch of a document as ONE per-row expression:
  * the sorted distinct window-minimum fingerprints of its character
  * k-grams (md5 hex, complete windows only).
  *
  * Semantically identical to the declarative formulation
  * (explode positions → md5(substring) → min over a w-row window →
  * distinct), but that plan materializes one ROW per character of the
  * corpus and shuffles + sorts them all for `Window.partitionBy(doc)` —
  * at corpus scale the exchange dwarfs the hashing. Here the sliding
  * minimum runs inside the scan with a monotonic deque (O(w) memory,
  * one md5 per position — the same hash count as the window plan, zero
  * extra rows), so the winnow queries keep no per-gram shuffle at all.
  *
  * Equivalences relied on (and pinned by WinnowSketchSpec against the
  * window formulation): md5 hex strings order like their 16 raw bytes
  * compared unsigned, and `substring(text, pos, k)` is code-point
  * addressed, so hashing UTF-8 byte slices at precomputed code-point
  * offsets matches md5-of-substring exactly.
  *
  * Returns an empty array when the text has fewer than w complete
  * windows (length < k + w − 1) — callers filter `size > 0` to match
  * the window plan, where such docs simply produce no rows.
  */
case class WinnowSketch(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "winnow_sketch: k and w must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_sketch expects string, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_sketch"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // start byte offset of every code point (UTF-8 lead-byte walk), so
    // gram i covers bytes [off(i), off(i+k)) — the exact encoding
    // substring(text, i+1, k) hashes
    var nChars = 0
    var b = 0
    while (b < bytes.length) {
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    val off = new Array[Int](nChars + 1)
    b = 0
    var ci = 0
    while (b < bytes.length) {
      off(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    off(nChars) = bytes.length

    val nGrams = nChars - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])

    val md = MessageDigest.getInstance("MD5")
    def digestAt(i: Int): Array[Byte] = {
      md.update(bytes, off(i), off(i + k) - off(i))
      md.digest()
    }

    implicit val unsigned: Ordering[Array[Byte]] =
      (a: Array[Byte], b2: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b2)
    val minima = scala.collection.mutable.TreeSet.empty[Array[Byte]]
    // monotonic deque of (gram index, digest), increasing digests; the
    // head is the current window minimum. Ties keep the EARLIER gram
    // (strict > pop), matching min-over-window semantics exactly.
    val idx = new Array[Int](w + 1)
    val dig = new Array[Array[Byte]](w + 1)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < nGrams) {
      val d = digestAt(i)
      while (tail > head && unsigned.compare(dig((tail - 1) % (w + 1)), d) > 0)
        tail -= 1
      idx(tail % (w + 1)) = i
      dig(tail % (w + 1)) = d
      tail += 1
      if (idx(head % (w + 1)) <= i - w) head += 1
      if (i >= w - 1) minima += dig(head % (w + 1))
      i += 1
    }

    val hex = "0123456789abcdef".toCharArray
    val out = minima.iterator.map { d =>
      val cs = new Array[Char](32)
      var j = 0
      while (j < 16) {
        cs(2 * j) = hex((d(j) >> 4) & 0xf)
        cs(2 * j + 1) = hex(d(j) & 0xf)
        j += 1
      }
      UTF8String.fromString(new String(cs)): Any
    }.toArray
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSketch =
    copy(child = newChild)
}

object WinnowSketch {
  /** Column API: `winnowSketch(col("text"), 8, 8)`. */
  def apply(c: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowSketch(GraftColumnBridge.expression(c), k, w))
}

/** Like [[WinnowSketch]] but KEEPS the gram positions: the distinct
  * (fingerprint, 1-based gram position) pairs selected by winnowing,
  * ordered by position. Each selected position `p` anchors the char span
  * `[p, p + k - 1]` — the unit of region-level (span) duplicate flagging.
  * Tie rule matches `min(struct(hash, pos))` over the window: the
  * EARLIEST gram with the minimal hash is selected, which is exactly the
  * deque's keep-earlier-on-ties behavior.
  */
case class WinnowSpans(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "winnow_spans: k and w must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_spans expects string, got $other")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("mh", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_spans"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nChars = 0
    var b = 0
    while (b < bytes.length) {
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    val off = new Array[Int](nChars + 1)
    b = 0
    var ci = 0
    while (b < bytes.length) {
      off(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    off(nChars) = bytes.length

    val nGrams = nChars - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])

    val md = MessageDigest.getInstance("MD5")
    def digestAt(i: Int): Array[Byte] = {
      md.update(bytes, off(i), off(i + k) - off(i))
      md.digest()
    }

    val cmp: (Array[Byte], Array[Byte]) => Int =
      (a, b2) => java.util.Arrays.compareUnsigned(a, b2)
    // distinct selected gram indices (a position determines its digest)
    val picked = scala.collection.mutable.TreeMap.empty[Int, Array[Byte]]
    val idx = new Array[Int](w + 1)
    val dig = new Array[Array[Byte]](w + 1)
    var head = 0
    var tail = 0
    var i = 0
    while (i < nGrams) {
      val d = digestAt(i)
      while (tail > head && cmp(dig((tail - 1) % (w + 1)), d) > 0) tail -= 1
      idx(tail % (w + 1)) = i
      dig(tail % (w + 1)) = d
      tail += 1
      if (idx(head % (w + 1)) <= i - w) head += 1
      if (i >= w - 1)
        picked.getOrElseUpdate(idx(head % (w + 1)), dig(head % (w + 1)))
      i += 1
    }

    val hex = "0123456789abcdef".toCharArray
    val out = picked.iterator.map { case (p, d) =>
      val cs = new Array[Char](32)
      var j = 0
      while (j < 16) {
        cs(2 * j) = hex((d(j) >> 4) & 0xf)
        cs(2 * j + 1) = hex(d(j) & 0xf)
        j += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(new String(cs)), p + 1): Any // 1-based pos
    }.toArray
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSpans =
    copy(child = newChild)
}

object WinnowSpans {
  def apply(c: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowSpans(GraftColumnBridge.expression(c), k, w))
}
