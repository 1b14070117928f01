package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature as ONE loop-codegen'd expression.
  *
  * The declarative alternative — nBits × dim unrolled `element_at` chains
  * OR-reduced through `when` — generates thousands of expression nodes and
  * overwhelms janino (observed OOM at 16×64). A custom Expression whose
  * generated code is two nested for-loops over a referenced `double[][]`
  * keeps the projection inside whole-stage codegen at constant code size.
  *
  * Bit i of the result is the sign (≥ 0) of `dot(vec, planes(i))`, summed
  * left-to-right in double precision — identical arithmetic to the
  * interpreted `aggregate(zip_with(...))` formulation it replaces.
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64, "1..64 hyperplanes")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signature expects array<float>, got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var s = 0.0
      var i = 0
      val n = math.min(p.length, arr.numElements())
      while (i < n) { s += arr.getFloat(i).toDouble * p(i); i += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      s"""
         |long $sig = 0L;
         |for (int $b = 0; $b < $planesRef.length; $b++) {
         |  double[] $p = $planesRef[$b];
         |  double $s = 0.0;
         |  int $n = java.lang.Math.min($p.length, $c.numElements());
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $c.getFloat($i) * $p[$i];
         |  }
         |  if ($s >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** `hyperplane_signature(vecCol, planes)` as a Column. */
  def apply(c: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      HyperplaneSignature(GraftColumnBridge.expression(c), planes))
}
