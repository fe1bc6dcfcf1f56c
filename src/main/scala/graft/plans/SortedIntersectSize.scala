package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd `|A ∩ B|` over two SORTED-DISTINCT `array<string>`
  * columns — the set-overlap kernel of Jaccard verification.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side and an
  * output array PER ROW PAIR, then throws both away for the scalar
  * count. On the candidate-verify join (q30) that allocation runs
  * millions of times per task. With both inputs already sorted and
  * deduplicated — [[ShingleTokens]]'s output contract — the overlap is
  * a two-pointer merge scan: O(|A|+|B|) comparisons, ZERO allocation.
  *
  * CONTRACT: both arrays must be sorted ascending by UTF8 binary
  * order and contain no duplicates — the count is only meaningful
  * under that precondition (this is the `list_intersect` len of the
  * DuckDB oracle, which computes true set intersection). Null array →
  * null; null ELEMENTS sort nowhere in a ShingleTokens output and are
  * counted never (a null slot terminates its pointer's advance past
  * it, matching array_intersect's null-excluding set semantics only
  * when inputs honor the no-null contract).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size requires two array<string> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.plans.SortedIntersectSize.count($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Two-pointer merge count over sorted-distinct string arrays. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) { i += 1 }
      else if (b.isNullAt(j)) { j += 1 }
      else {
        val x: UTF8String = a.getUTF8String(i)
        val y: UTF8String = b.getUTF8String(j)
        // binaryCompare, NOT compareTo: Spark 4's compareTo is a
        // deprecation shim that consults System.getenv per call —
        // measured at ~100ns × hundreds of millions of merge steps on
        // the q30 verify (the dominant suite cost on some hosts).
        val c = x.binaryCompare(y)
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }
}
