package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over token windows (Rabin–Karp), the
  * primitive under winnowing-style document fingerprinting.
  *
  * For tokens t_0..t_{n-1} and width w, emits one hash per window:
  *
  *   H_i = Σ_{j<w} h(t_{i+j}) · B^{w-1-j}   (mod 2^32)
  *
  * where h(t) is the low 32 bits of the engine's md5-derived 60-bit
  * token hash (bit-identical to the SQL-oracle form) and B = 1000003.
  * Computed in O(n) by ROLLING the window (subtract the outgoing
  * term, multiply by B, add the incoming token) instead of the
  * O(n·w) per-window recompute a Column composition would do — at
  * corpus scale the difference is w× on the hottest loop. Mod 2^32
  * arithmetic is exact in plain Long ops (wrap-around of the 64-bit
  * product preserves the low 32 bits), so any engine reproduces it.
  */
case class RollingHashWindows(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1, s"window width must be >= 1, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_windows requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash_windows"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashWindows.hashes(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.RollingHashWindows.hashes($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashWindows =
    copy(child = newChild)
}

object RollingHashWindows {
  val Base = 1000003L
  private val Mask = 0xffffffffL

  /** Low 32 bits of the engine's stable 60-bit md5 hash. */
  def tokenHash(tok: String): Long =
    StableHash60.hash(UTF8String.fromString(tok)) & Mask

  def hashes(text: UTF8String, w: Int): ArrayData = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = tokenHash(toks(i)); i += 1 }
    // B^(w-1) mod 2^32 — the outgoing term's weight.
    var topPow = 1L
    i = 1
    while (i < w) { topPow = (topPow * Base) & Mask; i += 1 }
    val n = toks.length - w + 1
    val out = new Array[Any](n)
    // first window
    var h = 0L
    i = 0
    while (i < w) { h = (h * Base + th(i)) & Mask; i += 1 }
    out(0) = h
    // roll
    i = 1
    while (i < n) {
      h = ((h - ((th(i - 1) * topPow) & Mask)) & Mask)
      h = (h * Base + th(i + w - 1)) & Mask
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
