package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd BPE encode: split a word to characters and apply a
  * learned merge table ([[graft.operators.BpeTrainer]]) in rank order
  * — the standard subword encode (Sennrich et al., ACL 2016).
  *
  * The merge table rides the expression as two parallel string arrays
  * referenced once per task through codegen's reference mechanism (the
  * [[SortedBucket]] pattern) — no per-row materialization, no closure
  * serialization per batch, and the call stays inside whole-stage
  * codegen. Encoding 100 TB of text is then a pure map over the scan:
  * no shuffle, no UDF, no Python.
  */
case class BpeEncode(child: Expression,
    lefts: Array[String], rights: Array[String])
    extends UnaryExpression {

  require(lefts.length == rights.length,
    s"merge table arrays disagree: ${lefts.length} vs ${rights.length}")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.run(input.asInstanceOf[UTF8String], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.BpeEncode.run($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Encode one word: chars → greedy left-to-right application of each
    * merge in rank order. Skips ranks early once fully merged. */
  def run(word: UTF8String, lefts: Array[String], rights: Array[String])
      : ArrayData = {
    val w = word.toString
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      // Code-point-safe split: surrogate pairs stay one symbol.
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    var m = 0
    while (m < lefts.length && syms.size > 1) {
      val l = lefts(m)
      val r = rights(m)
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == l && syms.get(j + 1) == r) {
          out.add(l + r)
          j += 2
        } else {
          out.add(syms.get(j))
          j += 1
        }
      }
      syms = out
      m += 1
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) {
      arr(k) = UTF8String.fromString(syms.get(k))
      k += 1
    }
    new GenericArrayData(arr)
  }
}
