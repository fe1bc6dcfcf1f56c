package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd within-document n-gram repetition profile: ONE
  * whitespace tokenization pass producing
  * `struct(n_toks, d2, d3)` — token count plus the DISTINCT 2-gram and
  * 3-gram counts — the inputs of the Gopher-style duplicate-n-gram
  * quality gate (q60).
  *
  * The composed form ([[ShingleTokens]] ×3 + `array_distinct` ×2)
  * tokenizes the text three times and materializes five arrays per row
  * (two of them concatenated shingle strings built only to be hashed
  * and thrown away). This expression tokenizes once and counts
  * distinct windows directly in per-width `HashSet[String]`s whose
  * keys are the same space-joined window strings — semantics (exact
  * string equality, including any unicode whitespace quirks of
  * `String.split("\\s+")`) are identical by construction, allocation
  * is one StringBuilder reused across windows.
  *
  * Scale: pure per-row map — no shuffle, participates in whole-stage
  * codegen via a static call, O(tokens) time and O(distinct windows)
  * transient memory per row.
  */
case class NgramDupStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_dup_stats requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", IntegerType, nullable = false),
    StructField("d2", IntegerType, nullable = false),
    StructField("d3", IntegerType, nullable = false)))

  override def prettyName: String = "ngram_dup_stats"

  override protected def nullSafeEval(input: Any): Any =
    NgramDupStats.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NgramDupStats.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): NgramDupStats =
    copy(child = newChild)
}

object NgramDupStats {
  def profile(text: UTF8String): InternalRow = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    val d2 = new java.util.HashSet[String](math.max(8, n * 2))
    val d3 = new java.util.HashSet[String](math.max(8, n * 2))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n - 1) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      d2.add(sb.toString)
      if (i < n - 2) {
        sb.append(' ').append(toks(i + 2))
        d3.add(sb.toString)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, d2.size, d3.size))
  }
}
