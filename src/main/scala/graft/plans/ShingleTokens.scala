package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd tokenize → w-gram shingle → dedupe, in one pass.
  *
  * The Column-composed equivalent
  * (`array_distinct(shingles(tokens(text), w))`, see
  * [[graft.functions]]) is built from higher-order functions
  * (`filter`/`transform` lambdas), which Spark evaluates INTERPRETED —
  * on a shingling hot path that is ~10× slower than generated code and
  * allocates three intermediate arrays per row. This expression does
  * split + window-join + dedupe in a single pass and participates in
  * whole-stage codegen via a static call.
  *
  * Semantics are identical to the composed form: whitespace
  * tokenization with empty tokens dropped, windows of `width` tokens
  * joined by single spaces, first-occurrence-order dedupe, empty array
  * when fewer than `width` tokens. With `sorted = true` the output is
  * additionally sorted in UTF8 binary order — a CANONICAL set
  * representation, so `md5(array_join(...))` is an order-insensitive
  * set fingerprint and [[SortedIntersectSize]]'s two-pointer contract
  * holds.
  */
case class ShingleTokens(child: Expression, width: Int,
    dedupe: Boolean = true, sorted: Boolean = false)
    extends UnaryExpression {

  require(width >= 1, s"shingle width must be >= 1, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_tokens requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_tokens"

  override protected def nullSafeEval(input: Any): Any =
    ShingleTokens.shingle(input.asInstanceOf[UTF8String], width, dedupe, sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleTokens.shingle($c, $width, $dedupe, $sorted)")

  override protected def withNewChildInternal(newChild: Expression): ShingleTokens =
    copy(child = newChild)
}

object ShingleTokens {
  // binaryCompare, NOT compareTo: Spark 4's compareTo is a deprecation
  // shim that consults System.getenv on every call — per-element cost
  // inside an n·log n sort.
  private val utf8Order = new java.util.Comparator[Any] {
    override def compare(a: Any, b: Any): Int =
      a.asInstanceOf[UTF8String].binaryCompare(b.asInstanceOf[UTF8String])
  }

  def shingle(text: UTF8String, w: Int, dedupe: Boolean,
      sorted: Boolean): ArrayData = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) return new GenericArrayData(Array.empty[Any])
    val n = toks.length - w + 1
    val sb = new java.lang.StringBuilder
    def window(i: Int): String = {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      sb.toString
    }
    val out: Array[Any] =
      if (dedupe) {
        val seen = new java.util.LinkedHashSet[String](n * 2)
        var i = 0
        while (i < n) { seen.add(window(i)); i += 1 }
        val arr = new Array[Any](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
        arr
      } else {
        val arr = new Array[Any](n)
        var i = 0
        while (i < n) { arr(i) = UTF8String.fromString(window(i)); i += 1 }
        arr
      }
    // UTF8 BINARY order (not java String UTF-16 order): the canonical
    // form SortedIntersectSize's merge scan compares with.
    if (sorted)
      java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]], utf8Order)
    new GenericArrayData(out)
  }
}
