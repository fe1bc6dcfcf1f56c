package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd int8 symmetric-quantization profile of ONE
  * embedding array: per-vector scale (max |x| / 127), max absolute
  * reconstruction error, and mean squared reconstruction error — in
  * ONE while-loop pass over the components.
  *
  * The Column-composed form (q82's original shape) chained FOUR
  * higher-order functions per row — `transform`(abs) + `array_max`,
  * `transform`(quantize), `zip_with`(error), `aggregate`(sum sq) —
  * and higher-order functions never enter whole-stage codegen, the
  * exact pattern [[QuantSweep]] measured at 49× slower than the fused
  * node at sf10x (PERF #T151). This node is the same fusion applied
  * to q82 (VERDICT r14 "next round" item 1).
  *
  * Exactness contract (bit-parity with the composed form, spec-pinned
  * in QuantProfileSpec):
  *   scale = max_i |x_i| / 127.0            (max via Double.compare —
  *                                           Spark's DoubleType order)
  *   q_i   = scale == 0 ? 0 : floor(x_i / scale + 0.5)
  *   ae_i  = |x_i − q_i · scale|
  *   max_abs_err = max_i ae_i               (Double.compare again)
  *   mse   = (Σ_i ae_i², left fold in index order, +0.0 seed) / n
  * Every double op appears in the same order as the composed chain;
  * q_i is integral and |q_i| ≤ 128 so the composed form's long-typed
  * `floor` and this node's double `Math.floor` multiply out
  * identically.
  *
  * Null semantics: null array → null; EMPTY array → null (the
  * composed form's scale/max are NULL over an empty transform and its
  * mse divides by zero → NULL, so the null struct reproduces all
  * three output cells exactly); any null ELEMENT → null struct — the
  * one documented parity carve-out (the composed form would keep a
  * non-null scale and max over the remaining elements but NULL the
  * mse); embeddings carry no null components, and the carve-out is
  * pinned in QuantProfileSpec.
  * Output struct: (scale double, max_abs_err double, mse double).
  */
case class QuantProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quant_profile requires array<double> or array<float>, got $dt")
  }

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def dataType: DataType = QuantProfile.Schema
  override def prettyName: String = "quant_profile"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    QuantProfile.profile(a.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val row = ctx.freshName("qp")
      s"""
         |InternalRow $row = graft.plans.QuantProfile.profile($a, $isDouble);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): QuantProfile = copy(child = newChild)
}

object QuantProfile {

  val Schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))

  /** One pass over the components; boxed null for null/empty input or
    * any null element (scaladoc above). */
  def profile(a: ArrayData, isDouble: Boolean): InternalRow = {
    val n = a.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    @inline def at(idx: Int): Double =
      if (isDouble) a.getDouble(idx) else a.getFloat(idx).toDouble
    // Pass 1 of the composed chain: array_max(transform(e, abs)).
    var mx = math.abs(at(0))
    i = 1
    while (i < n) {
      val v = math.abs(at(i))
      if (java.lang.Double.compare(v, mx) > 0) mx = v
      i += 1
    }
    val scale = mx / 127.0
    val zero = scale == 0.0
    // Passes 2-4 fused: quantize, error, max + left-fold sum of squares.
    var maxAe = 0.0
    var sum = 0.0
    i = 0
    while (i < n) {
      val x = at(i)
      val q = if (zero) 0.0 else math.floor(x / scale + 0.5)
      val ae = math.abs(x - q * scale)
      if (i == 0 || java.lang.Double.compare(ae, maxAe) > 0) maxAe = ae
      sum += ae * ae
      i += 1
    }
    InternalRow(scale, maxAe, sum / n)
  }
}
