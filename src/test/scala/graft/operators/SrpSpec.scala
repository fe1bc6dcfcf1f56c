package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused codegen sketch ([[graft.plans.SrpSketch]]) vs the Scala
  * state-store twin ([[Srp.sketchOf]]): bit-identical on every vector,
  * including signs near zero, short vectors, and null elements. */
class SrpSpec extends SparkSpec {

  import spark.implicits._

  private def vecs: Seq[Seq[Double]] = Seq(
    Seq.tabulate(Srp.Dims)(i => (i % 7 - 3) / 4.0),
    Seq.tabulate(Srp.Dims)(i => if (i % 2 == 0) 1.0 else -1.0),
    Seq.tabulate(Srp.Dims)(_ => 0.0), // all-zero: every projection ties to bit 0
    Seq.tabulate(Srp.Dims)(i => math.sin(i.toDouble)),
    Seq.tabulate(Srp.Dims)(i => (if (i < 3) 1e-5 else 0.0) * (i - 1)))

  test("Column sketch equals the Scala twin on quantized components") {
    val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "e")
      .select(col("id"), Srp.sketch(col("e")).as("sk"))
      .as[(Long, Long)].collect().toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val eq = v.map(x => math.floor(x * 32768.0).toLong).toArray
      assert(got(i.toLong) === Srp.sketchOf(eq), s"vector $i diverged")
    }
  }

  test("all-zero vector sketches to 0 (strict > 0 bit rule)") {
    val sk = Seq((0L, Seq.fill(Srp.Dims)(0.0))).toDF("id", "e")
      .select(Srp.sketch(col("e"))).as[Long].head()
    assert(sk === 0L)
  }

  test("null element nulls the sketch; short vector projects the prefix") {
    val withNull = Seq((0L, Seq[java.lang.Double](1.0, null, 2.0)))
      .toDF("id", "e")
      .select(Srp.sketch(col("e")).as("sk"))
      .select(col("sk").isNull).as[Boolean].head()
    assert(withNull, "null element must null the sketch")

    // Tail-ONLY null: vector longer than the sign matrix, null only in
    // the ignored tail — the whole-array null scan must still refuse a
    // sketch (ADVICE r11: the q161 oracle mirrors this with its
    // NULL-sketch CASE, so the rule is load-bearing for parity).
    val tailNull = Seq((0L,
        (Seq.fill[java.lang.Double](Srp.Dims)(1.0) :+
          null.asInstanceOf[java.lang.Double])))
      .toDF("id", "e")
      .select(Srp.sketch(col("e")).as("sk"))
      .select(col("sk").isNull).as[Boolean].head()
    assert(tailNull, "tail-only null must null the sketch")

    val short = Seq((0L, Seq(0.5, -0.25, 0.75))).toDF("id", "e")
      .select(Srp.sketch(col("e"))).as[Long].head()
    val eq = Seq(0.5, -0.25, 0.75)
      .map(x => math.floor(x * 32768.0).toLong).toArray
    // Scala twin requires full dims; compute the prefix reference here.
    var ref = 0L
    (0 until Srp.Bits).foreach { b =>
      val acc = eq.indices.map(i => eq(i) * Srp.signs(b)(i)).sum
      if (acc > 0) ref |= (1L << b)
    }
    assert(short === ref)
  }
}
