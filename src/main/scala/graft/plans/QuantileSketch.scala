package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style streaming quantile sketch as a native
  * [[TypedImperativeAggregate]] — the rank analog of [[FreqSketch]]'s
  * frequency summary (Karnin, Lang & Liberty 2016): one pass,
  * O(k log(n/k)) values per buffer, MERGEABLE, so grouped approximate
  * quantiles over a 100 TB corpus ship sketch state per partition
  * instead of either sorting per key (the window shape) or scanning
  * the corpus once per refinement round
  * ([[graft.operators.RobustStats]]'s exact histogram path — still
  * the right tool when exactness is the contract; this sketch is the
  * one-pass twin for dashboards/monitoring where a bounded rank error
  * is acceptable, and the only shippable shape in a STREAMING
  * aggregation where multi-pass refinement is impossible).
  *
  * Structure: geometric capacity levels; level h holds values of
  * weight 2^h. An overflowing level sort-compacts: every other value
  * of its even-length prefix promotes to level h+1 (double weight),
  * the odd leftover stays. The compaction offset alternates
  * DETERMINISTICALLY (a per-buffer flip counter) instead of by coin
  * flip — results are reproducible for a fixed partitioning, at the
  * cost of the textbook's probabilistic worst-case constant (the
  * empirical rank error at k=200 stays ≲ 1%, spec-asserted;
  * adversarially ordered inputs can do worse than the randomized
  * bound, which is why the EXACT RobustStats paths keep the
  * correctness contracts).
  *
  * Output: array<double>, one approximate quantile per requested
  * prob (the smallest sketched value whose cumulative weight reaches
  * ⌈p·n⌉); null for an empty group. Exact (no compaction) while
  * n ≤ level-0 capacity.
  */
case class QuantileSketch(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch requires a DOUBLE column, got ${child.dataType}")
    else if (k < 8 || k > 65536)
      TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch k must be in [8, 65536], got $k")
    else if (probs.isEmpty || probs.exists(p => p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch probs must be non-empty, each in [0, 1]: $probs")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): QuantileSketch.Buffer =
    new QuantileSketch.Buffer(k)

  override def update(buf: QuantileSketch.Buffer, input: InternalRow): QuantileSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: QuantileSketch.Buffer, b: QuantileSketch.Buffer): QuantileSketch.Buffer = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: QuantileSketch.Buffer): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(buf.quantiles(probs).asInstanceOf[Seq[Any]])

  override def serialize(buf: QuantileSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.n)
    out.writeLong(buf.flips)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QuantileSketch.Buffer(in.readInt())
    buf.n = in.readLong()
    buf.flips = in.readLong()
    val nLevels = in.readInt()
    buf.levels.clear()
    var h = 0
    while (h < nLevels) {
      val m = in.readInt()
      val lvl = new mutable.ArrayBuffer[Double](m)
      var i = 0
      while (i < m) { lvl += in.readDouble(); i += 1 }
      buf.levels += lvl
      h += 1
    }
    if (buf.levels.isEmpty) buf.levels += mutable.ArrayBuffer.empty
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketch =
    copy(child = newChild)
}

object QuantileSketch {

  /** Geometric KLL buffer. Level h's capacity shrinks as (2/3)^depth
    * below the top, floored at 8 — the standard KLL schedule. */
  final class Buffer(val k: Int) {
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
    var n: Long = 0L
    var flips: Long = 0L

    private def capacity(h: Int): Int =
      math.max(8,
        math.ceil(k * math.pow(2.0 / 3.0, levels.length - 1 - h)).toInt)

    def add(v: Double): Unit = {
      levels(0) += v
      n += 1
      if (levels(0).length > capacity(0)) compress()
    }

    /** One bottom-up pass; promotion into h+1 happens before h+1 is
      * visited, so a cascade resolves within the pass. */
    def compress(): Unit = {
      var h = 0
      while (h < levels.length) {
        if (levels(h).length > capacity(h)) {
          if (h + 1 == levels.length)
            levels += mutable.ArrayBuffer.empty[Double]
          val sorted = levels(h).toArray
          java.util.Arrays.sort(sorted)
          val m = sorted.length & ~1 // even prefix; odd leftover stays
          val offset = (flips & 1L).toInt
          flips += 1
          val up = levels(h + 1)
          var i = offset
          while (i < m) { up += sorted(i); i += 2 }
          levels(h).clear()
          if (m < sorted.length) levels(h) += sorted(m)
        }
        h += 1
      }
    }

    def mergeIn(other: Buffer): Unit = {
      while (levels.length < other.levels.length)
        levels += mutable.ArrayBuffer.empty[Double]
      var h = 0
      while (h < other.levels.length) {
        levels(h) ++= other.levels(h)
        h += 1
      }
      n += other.n
      flips += other.flips
      // Two passes: the first may grow depth (shrinking lower-level
      // capacities); the second settles any re-overflow.
      compress()
      compress()
    }

    /** Smallest sketched value whose cumulative weight reaches ⌈p·n⌉,
      * per prob. */
    def quantiles(probs: Seq[Double]): Seq[Double] = {
      var total = 0L
      val weighted = {
        val b = mutable.ArrayBuffer.empty[(Double, Long)]
        var h = 0
        while (h < levels.length) {
          val w = 1L << h
          levels(h).foreach { v => b += ((v, w)); total += w }
          h += 1
        }
        b.sortInPlace()(Ordering.by(_._1))
        b
      }
      probs.map { p =>
        val target = math.max(1L, math.ceil(p * total).toLong)
        var cum = 0L
        var i = 0
        var res = weighted.last._1
        var found = false
        while (i < weighted.length && !found) {
          cum += weighted(i)._2
          if (cum >= target) { res = weighted(i)._1; found = true }
          i += 1
        }
        res
      }
    }
  }
}
