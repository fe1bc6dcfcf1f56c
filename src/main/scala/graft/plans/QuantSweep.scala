package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd quantization-width sweep over an embedding array:
  * for the fixed widths 2/4/6/8 bits of a uniform [-1, 1) grid, the
  * per-vector micro-long squared-error sums and max absolute errors —
  * ALL widths in ONE while-loop pass over the components.
  *
  * The Column-composed form (q171's first cut) ran FOUR interpreted
  * `aggregate` folds plus four `transform`+`array_max` passes per row
  * — higher-order functions never enter whole-stage codegen — and
  * measured 49 s at sf10x where DuckDB's flat scan took 1.9 s. This
  * node does the 4-width grid arithmetic in generated code.
  *
  * Exactness contract (shared with the DuckDB oracle):
  *   q   = clamp(floor((x + 1) / 2 · L), 0, L − 1)      (L = 2^bits)
  *   rec = (q + 0.5) · 2 / L − 1
  *   err = x − rec
  *   s  += floor(err²·1e9 + 0.5) as exact long           (micro-long)
  *   m   = max(|err|)                                    (order-free)
  * Every double op appears in the same order in both engines, the
  * per-component term quantizes ONCE to a long (no raw-double sum
  * crosses a merge), and `floor(v + 0.5)` is the cheap half-up that
  * both engines compute identically on non-negative v (Spark's
  * BigDecimal `round` would cost a BigDecimal per component here).
  *
  * Null semantics: null array → null, any null element → null.
  * Empty array: (n=0, sums=0, max-errors=0.0) — the max-error 0.0 is
  * a SENTINEL that diverges from the composed Column form (whose
  * `array_max` over an empty transform is NULL); this is the one
  * documented parity carve-out (ADVICE r11), pinned with the empty
  * row in QuantSweepSpec's fuzz corpus. It can only affect a global max
  * when every vector in the aggregate is empty.
  * Output struct: (n, s2, s4, s6, s8, m2, m4, m6, m8).
  */
case class QuantSweep(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quant_sweep requires array<double> or array<float>, got $dt")
  }

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def dataType: DataType = QuantSweep.Schema
  override def prettyName: String = "quant_sweep"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    QuantSweep.sweep(a.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val row = ctx.freshName("qs")
      s"""
         |InternalRow $row = graft.plans.QuantSweep.sweep($a, $isDouble);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): QuantSweep = copy(child = newChild)
}

object QuantSweep {

  val Bits: Array[Int] = Array(2, 4, 6, 8)

  val Schema: StructType = StructType(
    StructField("n", LongType, nullable = false) +:
      (Bits.map(b => StructField(s"s$b", LongType, nullable = false)) ++
        Bits.map(b => StructField(s"m$b", DoubleType, nullable = false))))

  private val Levels: Array[Double] = Bits.map(b => (1 << b).toDouble)

  /** One pass over the components; boxed null when any element is
    * null (matching the composed form's null propagation). */
  def sweep(a: ArrayData, isDouble: Boolean): InternalRow = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val s = new Array[Long](4)
    val m = new Array[Double](4)
    i = 0
    while (i < n) {
      val x = if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble
      var w = 0
      while (w < 4) {
        val l = Levels(w)
        val q0 = math.floor((x + 1.0) / 2.0 * l)
        val q = if (q0 < 0.0) 0.0 else if (q0 > l - 1.0) l - 1.0 else q0
        val rec = (q + 0.5) * 2.0 / l - 1.0
        val err = x - rec
        s(w) = Math.addExact(s(w),
          math.floor(err * err * 1e9 + 0.5).toLong)
        val ae = math.abs(err)
        if (ae > m(w)) m(w) = ae
        w += 1
      }
      i += 1
    }
    InternalRow(n.toLong, s(0), s(1), s(2), s(3), m(0), m(1), m(2), m(3))
  }
}
