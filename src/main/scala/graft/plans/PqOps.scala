package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): a vector is
  * cut into `m` subvectors of `dsub` dims, each encoded as the index of
  * its nearest subspace centroid (≤ 256 → one byte), so a d-float
  * embedding compresses to m bytes (d·4/m ×, e.g. 32× at d=64, m=8)
  * and query-to-code distance is `m` table lookups instead of d
  * multiplies — the memory layout that makes billion-vector ANN fit
  * RAM at all.
  *
  * All three kernels are native codegen'd expressions: the trained
  * codebook ships to generated code as a codegen reference (the
  * [[MatVec]] pattern — built once per executor, zero per-row
  * allocation beyond the output), so encode and scan stay inside
  * whole-stage codegen. Scoring is ADC (asymmetric distance): the
  * QUERY stays exact, only the corpus side is quantized — the variant
  * with the tighter error bound in the paper.
  *
  * Codebook layout (row-major): centroid t-th component of code `c` in
  * subspace `j` lives at `(j·ksub + c)·dsub + t`.
  */
object PqOps {

  /** argmin-encode one vector → m bytes. Ties break to the SMALLEST
    * code (deterministic, layout-independent: per-row arithmetic in a
    * fixed order, no partition state). */
  def encode0(arr: ArrayData, cents: Array[Double], m: Int, ksub: Int,
      dsub: Int, isDouble: Boolean): Array[Byte] = {
    require(arr.numElements() == m * dsub,
      s"pq_encode: vector dim ${arr.numElements()} != ${m * dsub}")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val x = if (isDouble) arr.getDouble(j * dsub + t)
            else arr.getFloat(j * dsub + t).toDouble
          val diff = x - cents(off + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Per-query ADC lookup table: table[j·ksub + c] = ‖q_j − cent_jc‖²
    * (m·ksub doubles — 2k cells at m=8, ksub=256; broadcast-sized). */
  def table0(arr: ArrayData, cents: Array[Double], m: Int, ksub: Int,
      dsub: Int, isDouble: Boolean): GenericArrayData = {
    require(arr.numElements() == m * dsub,
      s"pq_dist_table: vector dim ${arr.numElements()} != ${m * dsub}")
    val out = new Array[Any](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val x = if (isDouble) arr.getDouble(j * dsub + t)
            else arr.getFloat(j * dsub + t).toDouble
          val diff = x - cents(off + t)
          d += diff * diff
          t += 1
        }
        out(j * ksub + c) = d
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_j table[j·ksub + code_j] — m lookups + adds per
    * corpus row, the entire per-row cost of a PQ scan. */
  def adc0(code: Array[Byte], table: ArrayData, ksub: Int): Double = {
    require(table.numElements() == code.length * ksub,
      s"pq_adc: table ${table.numElements()} != ${code.length} * $ksub")
    var acc = 0.0
    var j = 0
    while (j < code.length) {
      acc += table.getDouble(j * ksub + (code(j) & 0xFF))
      j += 1
    }
    acc
  }
}

/** Vector column → m-byte PQ code (BinaryType). */
case class PqEncode(child: Expression, cents: Array[Double],
    m: Int, ksub: Int, dsub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (m < 1 || dsub < 1 || ksub < 1 || ksub > 256 ||
        cents.length != m * ksub * dsub)
        TypeCheckResult.TypeCheckFailure(
          s"pq_encode shape mismatch: m=$m ksub=$ksub dsub=$dsub cents=${cents.length}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float> or array<double>, got $other")
  }

  @transient private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqOps.encode0(input.asInstanceOf[ArrayData], cents, m, ksub, dsub,
      elemIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqOps.encode0($c, $cRef, $m, $ksub, $dsub, $elemIsDouble)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Query vector column → flattened m×ksub ADC lookup table. */
case class PqDistTable(child: Expression, cents: Array[Double],
    m: Int, ksub: Int, dsub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (m < 1 || dsub < 1 || ksub < 1 || ksub > 256 ||
        cents.length != m * ksub * dsub)
        TypeCheckResult.TypeCheckFailure(
          s"pq_dist_table shape mismatch: m=$m ksub=$ksub dsub=$dsub cents=${cents.length}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_dist_table requires array<float> or array<double>, got $other")
  }

  @transient private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_dist_table"

  override protected def nullSafeEval(input: Any): Any =
    PqOps.table0(input.asInstanceOf[ArrayData], cents, m, ksub, dsub,
      elemIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqOps.table0($c, $cRef, $m, $ksub, $dsub, $elemIsDouble)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

/** (code binary, table array<double>) → approximate squared L2. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        if (ksub < 1 || ksub > 256)
          TypeCheckResult.TypeCheckFailure(s"pq_adc: bad ksub $ksub")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (binary, array<double>), got $other")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(code: Any, table: Any): Any =
    PqOps.adc0(code.asInstanceOf[Array[Byte]],
      table.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) =>
      s"graft.plans.PqOps.adc0($c, $t, $ksub)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
