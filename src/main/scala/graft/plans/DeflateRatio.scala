package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DEFLATE compression ratio of a string's
  * UTF-8 bytes — `compressed_len / raw_len` at zlib level 6, the
  * classic compressibility quality signal (the Gopher/MassiveText
  * filtering family — public knowledge): highly repetitive or
  * boilerplate text compresses far below natural language (ratio
  * → 0.1), while random junk refuses to compress (ratio → 1+; the
  * zlib framing can push tiny inputs above 1). NULL for empty input
  * (0/0 has no meaning) and for null input.
  *
  * Determinism: `java.util.zip.Deflater` at a FIXED level with the
  * default strategy is a deterministic function of the input bytes on
  * a given zlib build, and the ratio is a per-row pure map — no
  * cross-row arithmetic, so layout/partitioning cannot move it. There
  * is no SQL-oracle analog (DuckDB ships no zlib scalar), so the
  * operator is spec-gated like the other binary-kernel ops (T87/T97).
  *
  * Scale: one `Deflater` per thread (reset between rows, never
  * reallocated — allocation rate is what stalls wide scans), O(len)
  * per row, zero shuffle; `doGenCode` emits a static call that stays
  * inside whole-stage codegen.
  */
case class DeflateRatio(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires a string argument, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else DeflateRatio.ratio(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("ratio")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${childGen.isNull}) {
          java.lang.Double $boxed =
            graft.plans.DeflateRatio.ratio(${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  /** Per-thread Deflater, reset per row — deflaters hold native zlib
    * state and are expensive to allocate. Native footprint (ADVICE
    * r14): nothing calls `end()` explicitly, but on JDK 12+
    * (JDK-8185582) a GC'd Deflater releases its zlib state through
    * the JDK's own Cleaner, so an exited thread's value frees with
    * it; while threads live, Spark's pooled task threads bound the
    * population at ~#cores deflaters (~64 KB native each). */
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }

  /** compressed/raw byte ratio; null (boxed) for empty input. */
  def ratio(s: UTF8String): java.lang.Double = {
    val raw = s.getBytes
    if (raw.length == 0) return null
    val d = local.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](8192)
    var comp = 0L
    while (!d.finished()) comp += d.deflate(buf)
    java.lang.Double.valueOf(comp.toDouble / raw.length)
  }
}
