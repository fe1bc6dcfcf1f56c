package graft.operators

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeSortSpec extends SparkSpec {

  test("hashProbes matches Spark's own hash partitioning (pmod(hash(p), n) == i)") {
    // The whole steering trick rests on probe(i) landing in partition
    // i under Spark's HashPartitioning. Verify against Spark's hash()
    // itself, not our reimplementation of it.
    import spark.implicits._
    Seq(1, 4, 7, 32, 200).foreach { n =>
      val probes = RangeSort.hashProbes(n)
      probes.length shouldBe n
      val got = probes.toSeq.toDF("p")
        .select(expr(s"pmod(hash(p), $n)").as("part"))
        .collect().map(_.getInt(0)).toSeq
      withClue(s"n=$n: ") { got shouldBe (0 until n) }
    }
  }

  test("sortedByBounds: exact global order, partition == bucket, no sampling sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)((rnd.nextInt(1000).toLong, rnd.nextLong() % 100))
    val df = rows.toDF("a", "b")
    val bounds = Array(249L, 499L, 749L)
    val sorted = RangeSort.sortedByBounds(df, col("a"), bounds, Seq(col("b")))

    // Global order: concatenating partitions in id order gives the
    // exact ORDER BY a, b sequence.
    val got = sorted.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq shouldBe rows.sorted

    // Partition i holds exactly bucket i.
    val parts = sorted
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"), col("a"))
      .groupBy("pid").agg(min("a").as("lo"), max("a").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    parts.map(_._1).toSeq shouldBe (0 until 4)
    parts.sliding(2).foreach {
      case Array((_, _, hi0), (_, lo1, _)) => hi0 should be < lo1
      case _ =>
    }
    // Bucket edges are inclusive upper bounds.
    parts(0)._3 should be <= 249L
    parts(1)._2 should be > 249L

    // Plan shape: no global SortExec (only per-partition), no range
    // partitioning exchange (the sampling shape this operator exists
    // to avoid), no cache.
    val plan = sorted.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: SortExec if s.global => s } shouldBe empty
    plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.toString.toLowerCase.contains("range") => e
    } shouldBe empty
    plan.toString should not include "InMemoryTableScan"
  }

  test("sortedByBounds: empty bounds degrades to a single sorted partition") {
    import spark.implicits._
    val df = Seq((3L, 1L), (1L, 2L), (2L, 0L)).toDF("a", "b")
    val got = RangeSort.sortedByBounds(df, col("a"), Array.empty, Seq(col("b")))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(1L, 2L, 3L)
  }

  test("weightedBounds cuts cumulative weight evenly and survives empties") {
    import spark.implicits._
    // Keys 0..99 each weight 1, plus key 10 with weight 900: the heavy
    // key pulls every early cut to its cell.
    val w = ((0L until 100L).map(k => (k, 1L)) :+ (10L, 900L)).toDF("key", "weight")
    val bounds = RangeSort.weightedBounds(w, minParts = 4, cells = 100)
    bounds.length should be <= 3
    bounds shouldBe bounds.sorted
    // ~900 of 1000 total weight sits at key 10 → first bound at its cell.
    bounds.head should be <= 11L

    val empty = spark.emptyDataFrame
      .withColumn("key", lit(1L)).withColumn("weight", lit(1L)).filter(lit(false))
    RangeSort.weightedBounds(empty, 4) shouldBe Array.empty[Long]

    RangeSort.weightedBounds(w, minParts = 1) shouldBe Array.empty[Long]
  }

  test("weightedBounds scales the partition count with predicted output volume") {
    import spark.implicits._
    // 1000 keys × weight 100k each = 100 M predicted rows. At the
    // default 8 M rows/part the cut count must outgrow minParts — the
    // sf10x OOM class: pinning an output-sized sort to the session's
    // shuffle-partition constant put ~77 M rows in each in-partition
    // sort. minParts still wins when the prediction is small.
    val w = (0L until 1000L).map(k => (k, 100000L)).toDF("key", "weight")
    val bounds = RangeSort.weightedBounds(w, minParts = 4)
    val parts = bounds.length + 1
    parts should be >= 12 // ceil(100M / 8M) = 13, minus dedup slack
    parts should be <= 14

    // Small total: minParts governs exactly as before.
    val small = (0L until 100L).map(k => (k, 10L)).toDF("key", "weight")
    RangeSort.weightedBounds(small, minParts = 4).length shouldBe 3
  }

  test("SortedBucket binary search matches the leading>bound rank contract") {
    import spark.implicits._
    val bounds = Array(10L, 20L, 30L)
    // Exact hits are upper-inclusive: v==bound stays in the lower bucket.
    val cases = Seq(5L -> 0, 10L -> 0, 11L -> 1, 20L -> 1, 21L -> 2,
      30L -> 2, 31L -> 3, Long.MinValue -> 0, Long.MaxValue -> 3)
    val df = cases.map(_._1).toDF("v")
    val got = df.select(org.apache.spark.sql.graft.CatalystBridge.column(
      graft.plans.SortedBucket(
        org.apache.spark.sql.graft.CatalystBridge.expr(col("v")), bounds)))
      .collect().map(_.getInt(0)).toSeq
    got shouldBe cases.map(_._2)
    // Interpreted path agrees with codegen.
    cases.foreach { case (v, want) =>
      graft.plans.SortedBucket.bucket(bounds, v) shouldBe want
    }
  }

  test("fuzz: SortedBucket matches the linear count-of-bounds-below rank") {
    // Random sorted-distinct bound arrays (incl. empty and singleton)
    // × random probes (incl. exact bound hits and extremes): binary
    // search must equal the linear definition count(bounds < v).
    val rnd = new scala.util.Random(13)
    (0 until 60).foreach { _ =>
      val n = rnd.nextInt(12)
      val bounds = Seq.fill(n)(rnd.nextLong() % 1000L)
        .distinct.sorted.toArray
      val probes = Seq.fill(20)(rnd.nextLong() % 1200L) ++
        bounds.toSeq ++ Seq(Long.MinValue, Long.MaxValue)
      probes.foreach { v =>
        graft.plans.SortedBucket.bucket(bounds, v) shouldBe
          bounds.count(_ < v)
      }
    }
  }

  test("weightedBounds + sortedByBounds balance a skewed pair distribution") {
    import spark.implicits._
    // Simulate q30's shape: doc_a weight concentrated in a dup
    // cluster's low ids. 20k pairs, 80% with doc_a in [0, 50).
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(20000) {
      val a = if (rnd.nextDouble() < 0.8) rnd.nextInt(50).toLong
              else 50L + rnd.nextInt(10000)
      (a, a + 1 + rnd.nextInt(100))
    }
    val df = pairs.toDF("doc_a", "doc_b")
    val w = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      .toDF("key", "weight")
    val bounds = RangeSort.weightedBounds(w, minParts = 4, cells = 512)
    val sorted = RangeSort.sortedByBounds(df, col("doc_a"), bounds, Seq(col("doc_b")))
    val got = sorted.collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq shouldBe pairs.sorted
    // Balance: no partition above ~60% of rows (perfect = 25%; the
    // guarantee is cell-granular, so allow slack for the hot cell).
    val sizes = sorted.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    sizes.max.toDouble / pairs.size should be < 0.6
  }
}
