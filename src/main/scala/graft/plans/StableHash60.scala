package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 60-bit non-negative md5-derived hash of
  * a string — the codegen'd form of
  * `conv(substring(md5(c), 1, 15), 16, 10)` (see
  * [[graft.functions.stableHash]]), used in dedup/minhash hot paths.
  *
  * Why a custom `Expression` rather than the Column composition: the
  * composed form materializes the 32-char hex string and re-parses it
  * per row; this node hashes bytes → long directly, with `doGenCode`
  * emitting a static call that stays inside whole-stage codegen (no
  * interpreted fallback, no intermediate UTF8String allocations).
  * Bit-identical to the composed form and to the DuckDB oracle
  * expression `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`.
  */
case class StableHash60(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stable_hash60 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "stable_hash60"

  override protected def nullSafeEval(input: Any): Any =
    StableHash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StableHash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): StableHash60 =
    copy(child = newChild)
}

object StableHash60 {
  /** First 60 bits of md5 (15 hex chars): 7 full bytes + the high
    * nibble of byte 7. Always >= 0. */
  def hash(s: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
