package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values (KMV / theta) distinct sketch as a native
  * [[TypedImperativeAggregate]]: `kmv_sketch(str, k)` keeps the k
  * SMALLEST distinct [[StableHash60]] values of the column — the
  * classical summary that gives mergeable SET OPERATIONS (Bar-Yossef
  * et al. 2002; Beyer et al. SIGMOD 2007), which none of the suite's
  * other sketches can: Misra–Gries answers "which items are heavy",
  * KLL "what rank is this value", Count-Min "how often this key",
  * HLL "how many distinct" — KMV answers "how many distinct do these
  * two 100 TB streams SHARE" from two kilobyte-sized states
  * ([[Kmv.intersectEstimate]] / [[Kmv.jaccardEstimate]] /
  * [[Kmv.unionEstimate]]), where the exact answer is a corpus-wide
  * distinct shuffle join.
  *
  * Determinism is stronger than the usual sketch contract: the k
  * smallest distinct md5-derived hashes are a FUNCTION OF THE SET —
  * any partitioning, any merge order, any engine produces the
  * byte-identical sketch (no RNG, no JVM hashCode, no insertion-order
  * sensitivity). Estimates carry the standard KMV error
  * ~ 1/√(k−2) relative; a sketch holding fewer than k values is EXACT.
  *
  * Output: sorted ascending array<long> of the retained hashes.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires a STRING column, got ${child.dataType}")
    else if (k < 8 || k > 1000000)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch k must be in [8, 1000000], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(k)

  override def update(buf: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(StableHash60.hash(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(a: KmvSketch.Buffer, b: KmvSketch.Buffer): KmvSketch.Buffer = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: KmvSketch.Buffer): Any =
    new GenericArrayData(buf.sortedValues.map(Long.box))

  override def serialize(buf: KmvSketch.Buffer): Array[Byte] = {
    val vs = buf.sortedValues
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(vs.length)
    vs.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvSketch.Buffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** The k smallest DISTINCT hashes seen so far. TreeSet keeps the
    * running maximum evictable in O(log k); state is O(k) longs at any
    * stream length. */
  final class Buffer(val k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def add(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (h < set.last && !set.contains(h)) {
        set.add(h)
        set.remove(set.last)
      }
    }

    def mergeIn(other: Buffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def sortedValues: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out // TreeSet iterates ascending
    }
  }
}

/** Driver-side KMV estimators over the sketch arrays `kmv_sketch`
  * emits. Hashes are uniform on [0, 2^60) by the md5 construction, so
  * u = h / 2^60 is uniform on [0, 1) and the classic estimators apply
  * verbatim. */
object Kmv {
  private val Space = (1L << 60).toDouble

  /** Distinct-count estimate: exact when the sketch is not full
    * (|values| < k), else the unbiased (k−1)/u_(k). */
  def estimate(values: Array[Long], k: Int): Double =
    if (values.length < k) values.length.toDouble
    else (k - 1) * Space / values(k - 1).toDouble

  /** Union estimate: merge the two min-k sets and estimate. */
  def unionEstimate(a: Array[Long], b: Array[Long], k: Int): Double =
    estimate(mergeMinK(a, b, k), k)

  /** Jaccard estimate (Beyer et al. 2007): the fraction of the merged
    * min-k that lies in BOTH input sketches. Exact when both sketches
    * are exact. */
  def jaccardEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val m = mergeMinK(a, b, k)
    if (m.isEmpty) return 0.0
    val sa = a.toSet
    val sb = b.toSet
    m.count(v => sa.contains(v) && sb.contains(v)).toDouble / m.length
  }

  /** Intersection estimate: ĵ · |A ∪ B|^. */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): Double =
    jaccardEstimate(a, b, k) * unionEstimate(a, b, k)

  /** Merged min-k of two sorted-ascending sketch arrays (two-pointer,
    * dedup — the union sketch). */
  def mergeMinK(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    var first = true
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      if (first || v != last) { out(n) = v; n += 1; last = v; first = false }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }
}
