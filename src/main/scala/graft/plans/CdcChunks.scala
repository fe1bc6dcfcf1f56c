package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a text column — the gear-hash rolling
  * split of FastCDC (Xia et al., "FastCDC: a Fast and Efficient
  * Content-Defined Chunking Approach for Data Deduplication", USENIX
  * ATC 2016): the rolling hash `h = (h << 1) + gear(c)` declares a
  * boundary where `(h & mask) == 0`, so boundaries depend only on the
  * LOCAL content window. An insertion or deletion reshapes its own
  * chunk and the stream re-synchronizes at the next content boundary —
  * the property that makes CDC the dedup-storage default (LBFS, Venti,
  * restic, borg) where fixed-size blocks (q69/q134) shift every
  * boundary downstream of an edit.
  *
  * One codegen'd per-row pass, O(len) time, O(1) rolling state; the
  * gear table is a deterministic SplitMix64 expansion of a fixed seed
  * (no RNG at run time — same chunks in any engine, any layout, any
  * run). `minLen` suppresses boundary tests (FastCDC's cut-point
  * skipping — also why the hash needn't warm up: the first `minLen`
  * chars roll in before any test), `maxLen` forces a cut so a
  * boundary-free run (e.g. a constant byte block) cannot produce an
  * unbounded chunk. Splits never separate a surrogate pair, so every
  * chunk is valid UTF-16 and chunks concatenate back to the original
  * text byte-for-byte.
  */
case class CdcChunks(child: Expression, maskBits: Int, minLen: Int,
    maxLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (maskBits < 1 || maskBits > 28 || minLen < 1 || maxLen < minLen)
        TypeCheckResult.TypeCheckFailure(
          s"cdc_chunks bad shape: maskBits=$maskBits minLen=$minLen maxLen=$maxLen")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires string, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.chunk0(input.asInstanceOf[UTF8String], maskBits, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CdcChunks.chunk0($c, $maskBits, $minLen, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  /** Deterministic 256-entry gear table: SplitMix64 stream from a fixed
    * seed (Steele–Lea–Flood, OOPSLA 2014 mixer — public constants). */
  private[plans] val Gear: Array[Long] = {
    val out = new Array[Long](256)
    var x = 0x9E3779B97F4A7C15L // the fixed seed: the SplitMix increment
    var i = 0
    while (i < 256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      out(i) = z ^ (z >>> 31)
      i += 1
    }
    out
  }

  /** One rolling pass over the string's chars. Boundary AFTER position
    * i when the chunk is >= minLen, the gear hash masks to zero, and
    * char i is not a high surrogate (never split a pair); a cut is
    * forced at maxLen. The tail (possibly < minLen) is always
    * emitted, so concat(chunks) == input. */
  def chunk0(s: UTF8String, maskBits: Int, minLen: Int,
      maxLen: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1L
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      h = (h << 1) + Gear(c & 0xFF)
      val len = i - start + 1
      val canCut = !Character.isHighSurrogate(c)
      if (canCut && ((len >= minLen && (h & mask) == 0L) || len >= maxLen)) {
        out += UTF8String.fromString(str.substring(start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromString(str.substring(start, n))
    new GenericArrayData(out.toArray)
  }
}
