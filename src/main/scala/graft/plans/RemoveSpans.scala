package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused span-removal rebuild: given a doc's TOKEN ARRAY and the
  * per-doc duplicated-span list as two position arrays, emit
  * `(kept, cleaned)` — the count of surviving tokens and the
  * space-joined survivor string — in ONE pass over the tokens.
  *
  * This replaces the q134-idiom rebuild tail (corpus-wide token
  * `posexplode` + doc_id-equi ANTI join against the span list + one
  * per-doc `collect_list` + `array_sort` + `array_join`): PERF #55
  * attributed q173's entire 18.7 s sf10x cost to exactly that tail
  * (count-only 0.5 s — the witness IS the work). The fused shape
  * shuffles each doc's TEXT once (the spans join) instead of every
  * TOKEN, and the per-doc sort disappears — survivor order is the
  * array order.
  *
  * Inputs: `toks` array<string> (a [[ShingleTokens]] width-1 stream —
  * no null elements by construction), `starts`/`ends` array<long> —
  * the per-doc span list as 1-BASED INCLUSIVE token positions, both
  * ascending and PAIRED BY INDEX. Spans from
  * [[graft.operators.Dedup.duplicatedSpans]] are disjoint islands
  * (consecutive duplicated window starts merge; inter-island gap
  * > width), so sorting the collected starts and ends INDEPENDENTLY
  * (`sort_array(collect_list(...))`) preserves the pairing — s_i < s_j
  * ⟺ e_i < e_j for disjoint ordered intervals. Callers pass
  * empty arrays (not nulls) for docs without spans —
  * `coalesce(ss, array())` at the call site.
  *
  * Exactness contract (parity with the explode/anti-join/collect form,
  * spec-pinned in RemoveSpansSpec): token at position p = i + 1
  * survives iff NO span has s ≤ p ≤ e; survivors joined by single
  * spaces in position order; zero tokens or all-covered ⇒
  * (0, ""). One documented carve-out mirroring `array_join`: a null
  * token element (unreachable from ShingleTokens) is counted in
  * `kept` but contributes no characters and no separator — exactly
  * what the old `array_join(..., " ")` emitted.
  * Output struct: (kept long, cleaned string); null iff any input
  * array is null.
  */
case class RemoveSpans(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _),
          ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"remove_spans requires (array<string>, array<long>, " +
          s"array<long>), got ($a, $b, $c)")
    }

  override def dataType: DataType = RemoveSpans.Schema
  override def prettyName: String = "remove_spans"
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any, s: Any, e: Any): Any =
    RemoveSpans.rebuild(t.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s, e) => {
      val row = ctx.freshName("rs")
      s"""
         |InternalRow $row = graft.plans.RemoveSpans.rebuild($t, $s, $e);
         |${ev.value} = $row;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RemoveSpans =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RemoveSpans {

  val Schema: StructType = StructType(Seq(
    StructField("kept", LongType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))

  /** One pass: span pointer advances monotonically (spans ascending,
    * disjoint), each token position checked against at most the
    * current span. O(n_tokens + n_spans), zero allocation beyond the
    * survivor buffer. */
  def rebuild(toks: ArrayData, ss: ArrayData, es: ArrayData): InternalRow = {
    val n = toks.numElements()
    val m = ss.numElements()
    var kept = 0L
    val survivors = new java.util.ArrayList[UTF8String](n)
    var j = 0
    var i = 0
    while (i < n) {
      val p = i + 1L // 1-based token position
      while (j < m && es.getLong(j) < p) j += 1
      val covered = j < m && ss.getLong(j) <= p && p <= es.getLong(j)
      if (!covered) {
        kept += 1L
        // array_join semantics: a null element adds neither text nor
        // separator (unreachable from ShingleTokens; documented).
        if (!toks.isNullAt(i)) survivors.add(toks.getUTF8String(i))
      }
      i += 1
    }
    val cleaned =
      if (survivors.isEmpty) UTF8String.EMPTY_UTF8
      else UTF8String.concatWs(UTF8String.fromString(" "),
        survivors.toArray(new Array[UTF8String](survivors.size())): _*)
    InternalRow(kept, cleaned)
  }
}
