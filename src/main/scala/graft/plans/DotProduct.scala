package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The Column-composed form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) builds an intermediate
  * product array and folds it with interpreted lambda expressions per
  * row — on an O(Q·N) similarity join that interpretation dominates.
  * This node is one fused while-loop, summing LEFT-TO-RIGHT in element
  * order, so results are bit-identical to the sequential fold (and to
  * the DuckDB oracle's list_sum over the zipped products).
  *
  * Null semantics match the composed form: null if either ARRAY is
  * null, and null if any summed ELEMENT slot is null (zip_with yields a
  * null product for a null input element; the aggregate fold then
  * propagates it). One documented divergence: unequal lengths — the
  * shorter array wins here (min-length zip), where zip_with pads the
  * shorter side with nulls and the fold returns null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // Null can arise from a null element even when both arrays are
  // non-null, so nullability is unconditional.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Double $boxed = graft.plans.DotProduct.dot($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Boxed so a null element slot can surface as SQL NULL; the hot
    * path (no nulls) allocates exactly one Double per row. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
