package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd BPE-style pre-tokenizer census: ONE linear scan
  * over the raw UTF-8 bytes producing `struct(n_words, n_punct)` —
  * the counts of `[A-Za-z0-9]+` runs and `[^A-Za-z0-9\s]` code points
  * (q48's two `regexp_extract_all` passes, which also materialize the
  * full match arrays only to take their sizes).
  *
  * Exact regex parity, argued per character class:
  *   - `[A-Za-z0-9]` is ASCII-only in both java.util.regex and RE2 —
  *     decidable from a single byte;
  *   - `\s` is the ASCII set `[ \t\n\x0B\f\r]` in BOTH engines
  *     (java.util.regex without UNICODE_CHARACTER_CLASS; RE2's \s is
  *     the same six) — decidable from a single byte;
  *   - everything else — including every non-ASCII CODE POINT — falls
  *     in `[^A-Za-z0-9\s]`. Both regex engines match character
  *     classes per code point, and a UTF-8 code point has exactly one
  *     lead byte (continuation bytes are 0b10xxxxxx), so counting
  *     non-continuation non-ASCII bytes counts exactly the matched
  *     code points — supplementary characters included.
  *
  * Scale: pure per-row map, no allocation beyond the result row, no
  * regex engine, whole-stage codegen via a static call.
  */
case class TokenClassCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_class_counts requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false)))

  override def prettyName: String = "token_class_counts"

  override protected def nullSafeEval(input: Any): Any =
    TokenClassCounts.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenClassCounts.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenClassCounts =
    copy(child = newChild)
}

object TokenClassCounts {
  def count(text: UTF8String): InternalRow = {
    val n = text.numBytes()
    var words = 0L
    var punct = 0L
    var inWord = false
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      if (b >= 0) { // ASCII
        val alnum = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9')
        if (alnum) {
          if (!inWord) { words += 1; inWord = true }
        } else {
          inWord = false
          val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
            b == '\f' || b == '\r'
          if (!ws) punct += 1
        }
      } else {
        // non-ASCII: one punct per code point = one per lead byte
        inWord = false
        if ((b & 0xC0) != 0x80) punct += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](words, punct))
  }
}
