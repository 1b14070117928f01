package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid cell id (cosine, ties → lowest cid) as ONE per-row
  * expression over a constant centroid table.
  *
  * Replaces the declarative IVF assignment (broadcast-join the corpus
  * against K centroid rows → K cosine rows per vector → groupBy argmax),
  * which shuffles every corpus vector once and materializes K× the
  * corpus in between. The centroids are a handful of constant vectors,
  * so the argmax is a pure map: zero shuffle, zero intermediate rows,
  * and the assignment pushes into the scan.
  *
  * Arithmetic is bit-identical to `cosineUnrolled` (left-to-right
  * float→double dot products, `dot / (sqrt(na) * sqrt(nc))`), and the
  * comparison replicates Spark's total ordering where NaN is greatest
  * (max_by over struct(csim, -cid)): among equal/NaN sims the lowest
  * cid wins.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "nearest_centroid: at least one centroid")
  require(centroids.forall(_.length == centroids(0).length),
    s"nearest_centroid: centroids have mixed dimensions " +
      s"(${centroids.map(_.length).distinct.mkString(", ")})")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float> or array<double>, got $other")
    }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elem(v: ArrayData, j: Int): Double =
    if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      math.sqrt(s)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // a dimension mismatch must FAIL, not truncate: a silently shortened
    // dot product yields a plausible-but-wrong cell id (round-6 advice)
    if (n != centroids(0).length)
      throw new IllegalArgumentException(
        s"nearest_centroid: input vector has $n elements but centroids " +
          s"have ${centroids(0).length} — mixed-dimension embedding column?")
    var na = 0.0
    var j = 0
    while (j < n) { val x = elem(v, j); na += x * x; j += 1 }
    val sna = math.sqrt(na)
    var bestCid = 0
    var bestSim = Double.NegativeInfinity
    var bestNaN = false
    var cid = 0
    while (cid < centroids.length) {
      val c = centroids(cid)
      var dot = 0.0
      j = 0
      val d = n
      while (j < d) { dot += elem(v, j) * c(j); j += 1 }
      val sim = dot / (sna * centroidNorms(cid))
      // Spark ordering: NaN > any double; ties keep the LOWER cid
      val wins =
        if (sim.isNaN) !bestNaN
        else !bestNaN && sim > bestSim
      if (cid == 0 || wins) { bestCid = cid; bestSim = sim; bestNaN = sim.isNaN }
      cid += 1
    }
    bestCid
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(c: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(c), centroids))
}
