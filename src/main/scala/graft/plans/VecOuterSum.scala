package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass mergeable vector-moment aggregate —
  * `vec_outer_sum(embedding)` accumulates n, Σxq and the upper
  * triangle of Σxq·xqᵀ over an `array<float|double>` column and emits
  * `struct<n long, dim int, mean array<double>, cov array<double>>`
  * (cov row-major dim×dim, SAMPLE covariance).
  *
  * This is the covariance/PCA kernel for embedding QA at corpus
  * scale: the naive SQL shape (posexplode → self-join on the row id →
  * covar per (i, j)) shuffles N·dim² rows; this aggregate ships ONE
  * O(dim²) partial per partition (dim 64 → 2 080 triangle longs
  * ≈ 17 KB) and merges by cell-wise addition, so a 100 TB embedding
  * table reduces in a single map-side-combined pass. Downstream
  * consumers ([[graft.operators.Embeddings]]) take the one emitted
  * row: top principal component via power iteration (the dim×dim
  * matrix is driver-trivial), whitening stats, dead-dimension checks.
  *
  * Determinism contract (the T125/T129 fixed-point idiom): every
  * component is quantized ONCE as `xq = floor(x · 2^15)` and all
  * moments accumulate as EXACT LONGS, so the cell-wise-add merge is
  * exact at ANY partitioning / task-completion order and the emitted
  * doubles are bit-identical across layouts — and exactly replicable
  * by a SQL oracle computing the same quantized moments with the same
  * final expression (`(Σxy − Σx·Σy/n) / (n−1) / 2^30`). The previous
  * raw-double form bet that `round(…, 6)` masks fold-order drift; that
  * bet is probabilistic and lost a driver round (CORRECTNESS_r09
  * q130). Quantization granularity 2^-15 ≈ 3.1e-5 per component is
  * ~30× finer than the 6-dp output this profile feeds and far below
  * any QA decision threshold.
  *
  * Overflow headroom: components are bounded to |xq| < 2^24
  * (|x| < 512 — loud failure above, never silent wrap), so each
  * product is < 2^48 and all adds go through `Math.addExact`. For
  * unit-scale embeddings (|x| ≤ 1, products ≤ 2^30) that admits
  * n ≈ 8.6e9 vectors — the 100 TB row count — before the exact adds
  * would fail loudly.
  */
case class VecOuterSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecOuterSum.Buffer]
  with UnaryLike[Expression] {

  private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_outer_sum requires array<float> or array<double>, got $other")
  }

  override def dataType: DataType = VecOuterSum.statsType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_outer_sum"

  override def createAggregationBuffer(): VecOuterSum.Buffer =
    new VecOuterSum.Buffer

  override def update(buf: VecOuterSum.Buffer, input: InternalRow): VecOuterSum.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], elemIsDouble)
    buf
  }

  override def merge(a: VecOuterSum.Buffer, b: VecOuterSum.Buffer): VecOuterSum.Buffer = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: VecOuterSum.Buffer): Any = {
    if (buf.n == 0L) return null
    val d = buf.dim
    val nD = buf.n.toDouble
    // Final double derivation — the ONE expression tree both engines
    // share (oracle: (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
    // CAST(sy AS DOUBLE) / n) / (n - 1) / 1073741824.0).
    val mean = Array.tabulate(d)(i =>
      buf.sums(i).toDouble / nD / VecOuterSum.Scale)
    val cov = new Array[Double](d * d)
    val div = math.max(buf.n - 1L, 1L).toDouble
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (buf.tri(VecOuterSum.triIdx(i, j, d)).toDouble -
          buf.sums(i).toDouble * buf.sums(j).toDouble / nD) / div /
          VecOuterSum.Scale2
        cov(i * d + j) = c
        cov(j * d + i) = c
        j += 1
      }
      i += 1
    }
    InternalRow(buf.n, d,
      new GenericArrayData(mean.map(Double.box)),
      new GenericArrayData(cov.map(Double.box)))
  }

  override def serialize(buf: VecOuterSum.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.dim)
    if (buf.n > 0L) {
      var i = 0
      while (i < buf.sums.length) { out.writeLong(buf.sums(i)); i += 1 }
      i = 0
      while (i < buf.tri.length) { out.writeLong(buf.tri(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecOuterSum.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecOuterSum.Buffer
    val n = in.readLong()
    val d = in.readInt()
    if (n > 0L) {
      buf.init(d)
      buf.n = n
      var i = 0
      while (i < buf.sums.length) { buf.sums(i) = in.readLong(); i += 1 }
      i = 0
      while (i < buf.tri.length) { buf.tri(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecOuterSum =
    copy(child = newChild)
}

object VecOuterSum {

  /** Fixed-point scale 2^15 for component quantization, and 2^30 for
    * the quadratic moments. s = 15 keeps n·2^2s inside a long for
    * n ≈ 8.6e9 unit-scale vectors while staying ~30× finer than the
    * 6-dp output granularity. */
  val ScaleBits: Int = 15
  val Scale: Double = (1L << ScaleBits).toDouble
  val Scale2: Double = (1L << (2 * ScaleBits)).toDouble

  /** Loud component bound: |xq| < 2^24 keeps every product < 2^48 so
    * `Math.addExact` (not a silent wrap) is the only overflow mode. */
  val MaxAbsQ: Long = 1L << 24

  val statsType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("dim", IntegerType, nullable = false),
    StructField("mean", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("cov", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Upper-triangle index of (i, j) with i ≤ j in a dim×dim matrix. */
  def triIdx(i: Int, j: Int, dim: Int): Int =
    i * dim - i * (i - 1) / 2 + (j - i)

  final class Buffer {
    var n: Long = 0L
    var dim: Int = 0
    var sums: Array[Long] = null
    var tri: Array[Long] = null

    def init(d: Int): Unit = {
      dim = d
      sums = new Array[Long](d)
      tri = new Array[Long](d * (d + 1) / 2)
    }

    def add(arr: ArrayData, isDouble: Boolean): Unit = {
      val d = arr.numElements()
      if (n == 0L && dim == 0) init(d)
      require(d == dim,
        s"vec_outer_sum: inconsistent vector dims ($d vs $dim)")
      // Null elements poison the whole vector's moments — skip the row.
      var k = 0
      while (k < d) { if (arr.isNullAt(k)) return; k += 1 }
      val x = new Array[Long](d)
      k = 0
      while (k < d) {
        val v = if (isDouble) arr.getDouble(k) else arr.getFloat(k).toDouble
        // floor(NaN).toLong == 0 would pass the range check silently;
        // a poisoned vector must fail as loudly as an out-of-range one.
        require(!v.isNaN, s"vec_outer_sum: NaN component at index $k")
        val q = math.floor(v * Scale).toLong
        require(math.abs(q) < MaxAbsQ,
          s"vec_outer_sum: component $v out of the quantizable range " +
            s"(|x| < ${MaxAbsQ / Scale})")
        x(k) = q
        k += 1
      }
      var i = 0
      var t = 0
      while (i < d) {
        sums(i) = Math.addExact(sums(i), x(i))
        val xi = x(i)
        var j = i
        while (j < d) {
          tri(t) = Math.addExact(tri(t), xi * x(j))
          t += 1
          j += 1
        }
        i += 1
      }
      n += 1L
    }

    def mergeIn(other: Buffer): Unit = {
      if (other.n == 0L) return
      if (n == 0L && dim == 0) init(other.dim)
      require(other.dim == dim,
        s"vec_outer_sum: merge dim mismatch (${other.dim} vs $dim)")
      var i = 0
      while (i < sums.length) {
        sums(i) = Math.addExact(sums(i), other.sums(i)); i += 1
      }
      i = 0
      while (i < tri.length) {
        tri(i) = Math.addExact(tri(i), other.tri(i)); i += 1
      }
      n += other.n
    }
  }
}
