package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

import graft.SparkSpec

/** QuantProfile (fused int8 quantization profile) vs the composed
  * Column chain it replaced in q82 (transform + array_max →
  * transform → zip_with → aggregate): bit-equal scale / max-abs-err /
  * mse on a fuzz corpus covering zero vectors, tiny/large magnitudes,
  * float inputs, and the documented null/empty carve-outs. */
class QuantProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fused(c: Column): Column =
    CatalystBridge.column(QuantProfile(CatalystBridge.expr(c)))

  /** The composed reference — q82's pre-fusion shape, op for op. */
  private def composedCols(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.withColumn("scale",
        array_max(transform(col("e"), x => abs(x))) / 127.0)
      .withColumn("qv", transform(col("e"), x =>
        when(col("scale") === 0, lit(0.0))
          .otherwise(floor(x / col("scale") + 0.5))))
      .withColumn("ae", zip_with(col("e"), col("qv"),
        (x, q) => abs(x - q * col("scale"))))
      .select(col("id"), col("scale"),
        array_max(col("ae")).as("max_abs_err"),
        (aggregate(col("ae"), lit(0.0), (a, x) => a + x * x)
          / org.apache.spark.sql.functions.size(col("ae"))).as("mse"))

  // Deterministic fuzz: all-zero vector (scale = 0 branch), exact
  // binary fractions, asymmetric ranges, values far from ±1, tiny
  // magnitudes where scale underflow rounding bites, single element.
  private val corpus: Seq[Seq[Double]] = Seq(
    Seq(0.0, 0.0, 0.0),
    Seq(1.0, -1.0, 0.5, -0.5, 0.25),
    Seq(0.1, 0.2, 0.3, -0.4, 0.55, -0.66),
    Seq(127.0, -128.0, 3.5),
    Seq(1e-9, -1e-9, 5e-10),
    Seq(1e30, -1e30, 1e-30),
    (0 until 64).map(i => ((i * 37) % 128 - 64) / 64.0),
    (0 until 64).map(i => math.sin(i.toDouble)), // transcendental bits
    Seq(0.7))

  test("fuzz parity with the composed form on doubles") {
    val df = corpus.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "e")
    val a = df.select(col("id"), fused(col("e")).as("q"))
      .select(col("id"), col("q.scale"), col("q.max_abs_err"), col("q.mse"))
      .orderBy("id").collect()
    val b = composedCols(df).orderBy("id").collect()
    a.zip(b).foreach { case (f, c) =>
      withClue(s"row ${f.getLong(0)}: ") {
        (1 to 3).foreach { i =>
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

  test("interpreted eval matches codegen") {
    val df = corpus.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "e")
    def run(): Array[org.apache.spark.sql.Row] =
      df.select(col("id"), fused(col("e")).as("q")).orderBy("id").collect()
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe gen
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null array, null element and empty array all yield null") {
    // Null/empty carve-outs (QuantProfile scaladoc): the null struct
    // reproduces the composed form's three NULL output cells for
    // null/EMPTY arrays exactly; for a null ELEMENT the composed form
    // keeps scale/max over the rest — the documented carve-out.
    val df = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Double]]),
      (2L, Seq[java.lang.Double](0.5, null)),
      (3L, Seq[java.lang.Double]())
    ).toDF("id", "e")
    val out = df.select(col("id"), fused(col("e")).as("q"))
      .orderBy("id").collect()
    (0 to 2).foreach(i =>
      assert(out(i).isNullAt(1), s"row ${i + 1} must be null"))
  }
}
