package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compact merges a many-small-files table to the target size, content intact") {
    val dir = Files.createTempDirectory("compact").toString
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(40).write.parquet(s"$dir/in")

    val before = Compaction.plan(spark, s"$dir/in", targetFileBytes = 1L << 20)
    before.dataFiles shouldBe 40
    before.outputPartitions should be < 40

    val stats = Compaction.compact(spark, s"$dir/in", s"$dir/out",
      targetFileBytes = 1L << 20)
    stats.outputFiles shouldBe before.outputPartitions
    stats.outputFiles should be < 40
    // Content multiset unchanged.
    val back = spark.read.parquet(s"$dir/out")
    back.count() shouldBe 10000L
    back.agg(sum("id")).as[Long].collect().head shouldBe
      df.agg(sum("id")).as[Long].collect().head
    back.select("id").distinct().count() shouldBe 10000L
  }

  test("the rewrite is narrow: scan -> coalesce -> write, no Exchange") {
    val dir = Files.createTempDirectory("compactplan").toString
    (1 to 1000).toDF("v").repartition(16).write.parquet(s"$dir/in")
    val frame = Compaction.compacted(spark, s"$dir/in", targetFileBytes = 1L << 26)
    val plan = frame.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case e: Exchange => e } shouldBe empty
    frame.rdd.getNumPartitions shouldBe 1 // tiny table: one output file
  }

  test("compactPartitioned collapses an incremental append layout to one file per partition") {
    val dir = Files.createTempDirectory("compactpart").toString
    // Simulate the streaming fact sink: four micro-batches, each
    // appending several small files under its batch_id= partition.
    (0 until 4).foreach { b =>
      (1 to 500).map(i => (i.toLong + b * 1000, s"r$i"))
        .toDF("id", "s").withColumn("batch_id", lit(b))
        .repartition(5)
        .write.mode("append").partitionBy("batch_id").parquet(s"$dir/in")
    }
    val before = Compaction.plan(spark, s"$dir/in")
    before.dataFiles shouldBe 20 // 4 batches x 5 files

    val stats = Compaction.compactPartitioned(spark, s"$dir/in",
      s"$dir/out", Seq("batch_id"))
    stats.outputFiles shouldBe 4 // exactly one per batch_id value
    // Layout preserved: partition dirs survive, content multiset intact.
    val back = spark.read.parquet(s"$dir/out")
    back.count() shouldBe 2000L
    back.select("batch_id").distinct().as[Int].collect().sorted shouldBe
      Array(0, 1, 2, 3)
    back.agg(sum("id")).as[Long].collect().head shouldBe
      spark.read.parquet(s"$dir/in").agg(sum("id")).as[Long].collect().head
    // Partition pruning still works on the compacted layout.
    val scan = back.filter($"batch_id" === 2).queryExecution.executedPlan
      .toString
    scan should include("PartitionFilters")
  }

  test("compactPartitioned splits a skewed partition value at targetFileBytes") {
    val dir = Files.createTempDirectory("compactskew").toString
    // batch 0: small; batch 1: 20x the rows — the skewed value that
    // must NOT become one oversized file.
    val small = (1 to 200).map(i => (i.toLong, "x" * 50)).toDF("id", "s")
      .withColumn("batch_id", lit(0))
    val big = (1 to 4000).map(i => (i.toLong + 10000, "y" * 50))
      .toDF("id", "s").withColumn("batch_id", lit(1))
    small.union(big).repartition(8)
      .write.partitionBy("batch_id").parquet(s"$dir/in")
    def dirBytes(d: String): Long = new java.io.File(d).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(_.length).sum
    val bigBytes = dirBytes(s"$dir/in/batch_id=1")
    val smallBytes = dirBytes(s"$dir/in/batch_id=0")
    val target = bigBytes / 4 + 1 // the skewed value should split 4-way
    // Expected counts from the SAME per-value input-bytes arithmetic
    // the operator uses (at this toy scale the small value's 8
    // per-file footers inflate its input bytes, so derive, don't
    // hard-code).
    val expectBig = math.ceil(bigBytes.toDouble / target).toInt
    val expectSmall = math.ceil(smallBytes.toDouble / target).toInt
    expectBig should be >= 3 // the case is real skew, not a rounding fluke
    expectSmall should be < expectBig

    val stats = Compaction.compactPartitioned(spark, s"$dir/in",
      s"$dir/out", Seq("batch_id"), targetFileBytes = target)
    def filesUnder(d: String): Int = new java.io.File(d).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    filesUnder(s"$dir/out/batch_id=0") shouldBe expectSmall
    filesUnder(s"$dir/out/batch_id=1") shouldBe expectBig // ⌈bytes/target⌉
    stats.outputFiles shouldBe expectSmall + expectBig
    // Layout and content multiset intact.
    val back = spark.read.parquet(s"$dir/out")
    back.count() shouldBe 4200L
    back.agg(sum("id")).as[Long].collect().head shouldBe
      spark.read.parquet(s"$dir/in").agg(sum("id")).as[Long].collect().head
    back.select("id").distinct().count() shouldBe 4200L
  }

  test("compactPartitioned sizes by EXACT per-value bytes, not a corpus average") {
    // Two partition values with EQUAL row counts but ~50x row width:
    // a corpus-wide bytes/row average would split both the same way,
    // re-creating the oversized file on the wide value.
    val dir = Files.createTempDirectory("compactwidth").toString
    val narrow = (1 to 1000).map(i => (i.toLong, "x")).toDF("id", "s")
      .withColumn("k", lit("narrow"))
    val wide = (1 to 1000).map { i =>
      val rnd = new java.util.Random(i)
      val sb = new StringBuilder // ~800 incompressible hex chars
      (0 until 50).foreach(_ =>
        sb.append(java.lang.Long.toHexString(rnd.nextLong())))
      (i.toLong + 10000, sb.toString)
    }.toDF("id", "s").withColumn("k", lit("wide"))
    narrow.union(wide).repartition(4)
      .write.partitionBy("k").parquet(s"$dir/in")
    def dirBytes(d: String): Long = new java.io.File(d).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(_.length).sum
    val wideBytes = dirBytes(s"$dir/in/k=wide")
    val narrowBytes = dirBytes(s"$dir/in/k=narrow")
    val target = wideBytes / 3 + 1 // wide must split 3-way
    narrowBytes should be <= target // equal counts, far fewer bytes
    Compaction.compactPartitioned(spark, s"$dir/in", s"$dir/out",
      Seq("k"), targetFileBytes = target)
    def filesUnder(d: String): Int = new java.io.File(d).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    filesUnder(s"$dir/out/k=wide") shouldBe
      math.ceil(wideBytes.toDouble / target).toInt
    filesUnder(s"$dir/out/k=narrow") shouldBe 1
    spark.read.parquet(s"$dir/out").count() shouldBe 2000L
  }

  test("compactPartitioned keeps NULL partition values (null-safe steering join)") {
    val dir = Files.createTempDirectory("compactnull").toString
    val df = Seq((1L, Some(0)), (2L, Some(0)), (3L, None), (4L, None))
      .toDF("id", "batch_id")
    df.repartition(3).write.partitionBy("batch_id").parquet(s"$dir/in")
    Compaction.compactPartitioned(spark, s"$dir/in", s"$dir/out",
      Seq("batch_id"))
    val back = spark.read.parquet(s"$dir/out")
    back.count() shouldBe 4L // an equi-join would have dropped the null rows
    back.filter($"batch_id".isNull).select("id").as[Long].collect().sorted shouldBe
      Array(3L, 4L)
    back.filter($"batch_id" === 0).count() shouldBe 2L
  }

  test("plan arithmetic: already-compact input keeps its layout; markers skipped") {
    val dir = Files.createTempDirectory("compactnoop").toString
    (1 to 100).toDF("v").coalesce(1).write.parquet(s"$dir/in")
    val p = Compaction.plan(spark, s"$dir/in", targetFileBytes = 128L << 20)
    p.dataFiles shouldBe 1 // _SUCCESS and .crc files are not data
    p.outputPartitions shouldBe 1
    p.totalBytes should be > 0L
  }
}
