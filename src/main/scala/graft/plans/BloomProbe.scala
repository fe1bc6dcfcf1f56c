package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership probe:
  * `BloomProbe(serializedFilter, value)` is true iff `value` MIGHT be
  * in the set the filter was built from (no false negatives; false
  * positives at the filter's configured fpp).
  *
  * This is the scale path for set-membership prefilters — benchmark
  * decontamination (q74), blocklist scrubbing, incremental-ingest
  * dedup against a prior corpus: the bounded side (eval-suite
  * shingles, a blocklist) collapses to a few MB of bits that ship to
  * every task inside the plan itself, and the probe prunes the
  * unbounded side BEFORE its shuffle. Unlike the broadcast-hash-join
  * prefilter it replaces, the bitmap's size is set by (expectedItems,
  * fpp) alone — independent of key width — and the probe is a pure
  * per-row filter, so the pruned side never materializes a join build
  * side. Spark's own injected `BloomFilterMightContain` (runtime join
  * filters) is the same idea; that expression is internal-only and
  * subquery-driven, hence this standalone twin for explicit pipeline
  * use.
  *
  * The left child must be a FOLDABLE binary expression (the
  * `BloomFilter.writeTo` serialization, built once on the driver from
  * the bounded side — e.g. `DataFrameStatFunctions.bloomFilter`, a
  * distributed treeAggregate). The filter deserializes once per task
  * (lazily) in interpreted mode, and rides the codegen references
  * array in compiled mode; per-row work is k murmur hashes over the
  * value's UTF-8 bytes, zero allocation.
  *
  * False positives make this a PREFILTER, not a decision: exact
  * pipelines (q74) follow the probe with an equi-join that removes
  * them, keeping results oracle-exact while the probe removes the
  * bulk of the data from the shuffle. Reference analog: the eval-set
  * overlap gate in the reference's dedup stage
  * (/root/reference/scripts/pyspark/transform_jobs.py's drop-dup
  * semantics) generalized to contains-style membership at corpus
  * scale.
  */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_probe filter argument must be BINARY, got ${left.dataType}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_probe filter argument must be foldable (a serialized " +
          "filter built on the bounded side)")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_probe value argument must be STRING, got ${right.dataType}")
    else if (left.eval(null) == null)
      // A foldable NULL (e.g. CAST(NULL AS BINARY)) would otherwise NPE
      // deep in readFrom at first eval / codegen — fail analysis cleanly.
      TypeCheckResult.TypeCheckFailure(
        "bloom_probe filter argument must not be NULL (expected a " +
          "serialized BloomFilter built on the bounded side)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  // Deserialized at most once per task (interpreted) or once on the
  // driver (codegen, shipped via the references array).
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(bloomBytes: Any, value: Any): Any =
    filter.mightContainBinary(value.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    // The left (filter bytes) child is a non-null literal; the probe
    // only reads the pre-deserialized reference object.
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $ref.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}

object BloomProbe {
  /** Serialize a built filter for embedding as a binary literal. */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }
}
