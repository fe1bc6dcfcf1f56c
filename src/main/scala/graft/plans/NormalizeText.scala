package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text normalization — the standard corpus-cleaning
  * step (C4/RefinedWeb-style): Unicode NFC composition, control
  * characters (`[\x00-\x1F\x7F]`) to spaces, whitespace runs collapsed
  * to one space, ends trimmed. One JVM pass instead of an
  * `nfc → regexp_replace → regexp_replace → trim` four-expression
  * chain; the chain is the DuckDB-oracle form (q104), and this node is
  * bit-identical to it: after the control mapping every remaining
  * `\s` match IS a plain space (tab/newline/CR/FF/VT are all controls),
  * so "collapse space runs + trim" equals the regex chain exactly.
  *
  * NFC via `java.text.Normalizer` (ICU-equivalent for the composition
  * forms, ships in the JDK). Null in, null out.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeText.run($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  def run(input: UTF8String): UTF8String = {
    val composed = java.text.Normalizer
      .normalize(input.toString, java.text.Normalizer.Form.NFC)
    val n = composed.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var emitted = false
    var i = 0
    while (i < n) {
      val c0 = composed.charAt(i)
      // Controls (C0 + DEL) become spaces; then space runs collapse.
      val c = if (c0 < 0x20 || c0 == 0x7f) ' ' else c0
      if (c == ' ') {
        if (emitted) pendingSpace = true // leading spaces: drop (trim)
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        emitted = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
