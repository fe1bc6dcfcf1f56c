package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

import graft.SparkSpec

/** BloomProbe contract: NO false negatives ever (that would silently
  * drop real overlaps from an exact pipeline built on the probe),
  * false positives bounded near the configured fpp, codegen and
  * interpreted paths agree, and the q74 plan actually carries the
  * probe as a pre-join filter. */
class BloomProbeSpec extends SparkSpec {

  import spark.implicits._

  private def probeCol(bloomBytes: Array[Byte], c: org.apache.spark.sql.Column) =
    CatalystBridge.column(
      BloomProbe(Literal(bloomBytes), CatalystBridge.expr(c)))

  private val members = (0 until 2000).map(i => s"member_$i")
  private val outsiders = (0 until 20000).map(i => s"outsider_$i")

  private lazy val bloomBytes = BloomProbe.serialize(
    members.toDF("v").stat.bloomFilter("v", 2000, 0.01))

  test("zero false negatives: every inserted value probes true") {
    val hits = members.toDF("v")
      .filter(probeCol(bloomBytes, col("v")))
      .count()
    hits shouldBe members.size
  }

  test("false positives stay near the configured fpp") {
    val fp = outsiders.toDF("v")
      .filter(probeCol(bloomBytes, col("v")))
      .count()
    // 1% nominal; allow 3x slack for hash variance at this sample size.
    fp.toDouble / outsiders.size should be <= 0.03
  }

  test("interpreted eval agrees with the codegen'd filter") {
    val expr = BloomProbe(Literal(bloomBytes),
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = true))
    val sample = members.take(50) ++ outsiders.take(50)
    val viaDf = sample.toDF("v").withColumn("hit", probeCol(bloomBytes, col("v")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    sample.foreach { s =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      expr.eval(row) shouldBe viaDf(s)
    }
  }

  test("null values probe to null, not false") {
    val df = Seq(Some("member_1"), None).toDF("v")
      .select(probeCol(bloomBytes, col("v")).as("hit"))
    val rows = df.collect()
    rows(0).getBoolean(0) shouldBe true
    rows(1).isNullAt(0) shouldBe true
  }

  test("non-foldable filter argument is rejected at analysis") {
    val bad = intercept[Exception] {
      Seq(("k", Array[Byte](1, 2))).toDF("v", "b")
        .select(CatalystBridge.column(BloomProbe(
          CatalystBridge.expr(col("b")), CatalystBridge.expr(col("v")))))
        .collect()
    }
    bad.getMessage.toLowerCase should include ("foldable")
  }

  test("a foldable NULL filter argument fails analysis cleanly, not NPE at eval") {
    // CAST(NULL AS BINARY) is foldable and binary-typed — without the
    // explicit check it passes analysis and NPEs inside the lazy
    // BloomFilter.readFrom at first eval / codegen.
    val bad = intercept[Exception] {
      Seq("k").toDF("v")
        .select(CatalystBridge.column(BloomProbe(
          Literal.create(null, org.apache.spark.sql.types.BinaryType),
          CatalystBridge.expr(col("v")))))
        .collect()
    }
    bad.getMessage.toLowerCase should include ("null")
    bad should not be a[NullPointerException]
  }

  test("q74's physical plan probes before the verify join") {
    val d = graft.SparkEntry.allDefs.find(_.name == "q74_bloom_decontaminate")
      .getOrElse(fail("q74 missing"))
    val plan = d.build(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should include ("bloom_probe")
  }
}
