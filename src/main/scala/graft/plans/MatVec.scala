package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Affine map over a vector column: `MatVec(x, m, s, d)` computes
  * y = M·(x − s) for a constant row-major d×d matrix M and shift s —
  * the apply side of embedding whitening/rotation
  * ([[graft.operators.Embeddings.whiten]]): the matrix comes from the
  * driver-side factorization of the [[VecOuterSum]] covariance and
  * ships to generated code as codegen reference objects, so the
  * per-row transform is one fused d² multiply-add loop inside
  * whole-stage codegen — no per-row allocation beyond the output
  * array, no interpreted higher-order-function lambda chain.
  */
case class MatVec(child: Expression, matrix: Array[Double],
    shift: Array[Double], dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (dim < 1 || matrix.length != dim * dim || shift.length != dim)
        TypeCheckResult.TypeCheckFailure(
          s"mat_vec shape mismatch: dim=$dim, matrix=${matrix.length}, shift=${shift.length}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec requires array<float> or array<double>, got $other")
  }

  @transient private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  override protected def nullSafeEval(input: Any): Any =
    MatVec.apply0(input.asInstanceOf[ArrayData], matrix, shift, dim,
      elemIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matVecM", matrix, "double[]")
    val s = ctx.addReferenceObj("matVecS", shift, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MatVec.apply0($c, $m, $s, $dim, $elemIsDouble)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

object MatVec {
  def apply0(arr: ArrayData, m: Array[Double], s: Array[Double],
      d: Int, isDouble: Boolean): GenericArrayData = {
    require(arr.numElements() == d,
      s"mat_vec: vector dim ${arr.numElements()} != $d")
    val x = new Array[Double](d)
    var k = 0
    while (k < d) {
      x(k) = (if (isDouble) arr.getDouble(k) else arr.getFloat(k).toDouble) -
        s(k)
      k += 1
    }
    val y = new Array[Any](d)
    var i = 0
    while (i < d) {
      var acc = 0.0
      val off = i * d
      var j = 0
      while (j < d) { acc += m(off + j) * x(j); j += 1 }
      y(i) = acc
      i += 1
    }
    new GenericArrayData(y)
  }
}
