package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

import graft.SparkSpec

/** QuantSweep (fused 4-width grid-quantization sweep) vs the composed
  * Column form it replaced: bit-equal micro-long sums and max errors
  * on a fuzz corpus covering the full [-1, 1) grid, out-of-range
  * values (clamp both sides), exact grid-edge points, float inputs,
  * and null propagation. */
class QuantSweepSpec extends SparkSpec {
  import spark.implicits._

  private def fused(c: Column): Column =
    CatalystBridge.column(QuantSweep(CatalystBridge.expr(c)))

  /** The composed reference: same op order as the fused node. */
  private def composedCols(e: Column): Seq[Column] = {
    def rec(x: Column, l: Double): Column =
      (least(greatest(floor((x + 1.0) / 2.0 * l), lit(0.0)),
        lit(l - 1.0)) + 0.5) * 2.0 / l - 1.0
    def err(x: Column, l: Double): Column = x - rec(x, l)
    (org.apache.spark.sql.functions.size(e).cast("long").as("n") +:
      QuantSweep.Bits.toSeq.map { b =>
        val l = (1 << b).toDouble
        aggregate(e, lit(0L), (a, x) =>
          a + floor(err(x, l) * err(x, l) * 1e9 + 0.5).cast("long"))
          .as(s"s$b")
      }) ++ QuantSweep.Bits.toSeq.map { b =>
        val l = (1 << b).toDouble
        array_max(transform(e, x => abs(err(x, l)))).as(s"m$b")
      }
  }

  // Deterministic fuzz: exact binary fractions, grid edges (where
  // floor((x+1)/2·L lands on an integer), clamp range on both sides.
  private val corpus: Seq[Seq[Double]] = Seq(
    Seq(0.0, 0.5, -0.5, 0.25, -0.25),
    Seq(-1.0, 1.0, -1.5, 1.5, 7.0, -7.0), // clamps: 1.0 maps past L-1
    Seq(0.984375, -0.984375, 0.4921875), // near grid edges
    (0 until 64).map(i => (i - 32) / 32.0), // full sweep incl. -1
    (0 until 64).map(i => ((i * 37) % 128 - 64) / 64.0),
    Seq(1e-9, -1e-9, 0.1234567890123, -0.9999999),
    Seq(0.0),
    Seq()) // empty: the ONE documented parity carve-out (see below)

  test("fuzz parity with the composed form on doubles") {
    val df = corpus.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "e")
    val a = df.select(col("id"), fused(col("e")).as("q"))
      .select(col("id") +: QuantSweep.Schema.fieldNames.toSeq
        .map(f => col(s"q.$f")): _*)
      .orderBy("id").collect()
    val b = df.select((col("id") +: composedCols(col("e"))): _*)
      .orderBy("id").collect()
    a.zip(b).foreach { case (f, c) =>
      withClue(s"row ${f.getLong(0)}: ") {
        (1 to 5).foreach(i => f.getLong(i) shouldBe c.getLong(i))
        if (f.getLong(1) == 0L) {
          // EMPTY ARRAY — the one documented divergence from the
          // composed form (ADVICE r11): array_max over an empty
          // transform is NULL, the fused node's max-error fields are
          // the 0.0 sentinel (QuantSweep scaladoc). The 0.0 only
          // affects a global max when EVERY vector is empty.
          (6 to 9).foreach { i =>
            f.getDouble(i) shouldBe 0.0
            assert(c.isNullAt(i), s"composed m-field $i should be NULL")
          }
        } else (6 to 9).foreach { i =>
          java.lang.Double.doubleToLongBits(f.getDouble(i)) shouldBe
            java.lang.Double.doubleToLongBits(c.getDouble(i))
        }
      }
    }
  }

  test("float input quantizes through the same double path") {
    val df = Seq((1L, Seq(0.25f, -0.75f, 0.125f))).toDF("id", "e")
    val viaFloat = df.select(fused(col("e")).as("q")).head()
    val viaDouble = df
      .select(transform(col("e"), x => x.cast("double")).as("e"))
      .select(fused(col("e")).as("q")).head()
    viaFloat shouldBe viaDouble
  }

  test("null array -> null; null element -> null; empty array -> zero row") {
    val df = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Double]]),
      (2L, Seq[java.lang.Double](0.5, null)),
      (3L, Seq[java.lang.Double]())
    ).toDF("id", "e")
    val out = df.select(col("id"), fused(col("e")).as("q"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1), "null array must yield null")
    assert(out(1).isNullAt(1), "null element must yield null")
    val zero = out(2).getStruct(1)
    zero.getLong(0) shouldBe 0L // n
    (1 to 4).foreach(i => zero.getLong(i) shouldBe 0L)
    (5 to 8).foreach(i => zero.getDouble(i) shouldBe 0.0)
  }
}
