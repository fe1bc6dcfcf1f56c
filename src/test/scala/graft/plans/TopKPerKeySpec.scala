package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rows = for {
      key <- 1 to 50
      i <- 1 to 100
    } yield (key.toLong, (key * 1000 + i).toLong, ((i * 37) % 100).toDouble)
    rows.toDF("key", "id", "score").repartition(7)
  }

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("key", "id", "score")
  }

  test("TopKPerKey matches the window/rank result exactly") {
    val expected = windowTopK(3).orderBy("key", "id")
      .as[(Long, Long, Double)].collect()
    val got = TopKPerKey(df, Seq("key"), Seq(TopKPerKey.desc("score"), TopKPerKey.asc("id")), 3)
      .orderBy("key", "id").as[(Long, Long, Double)].collect()
    got shouldBe expected
  }

  test("TopKPerKey handles k larger than group size and single-row groups") {
    val tiny = Seq((1L, 1L, 5.0), (1L, 2L, 7.0), (2L, 3L, 1.0))
      .toDF("key", "id", "score")
    val got = TopKPerKey(tiny, Seq("key"), Seq(TopKPerKey.desc("score"), TopKPerKey.asc("id")), 10)
      .orderBy("key", "id").as[(Long, Long, Double)].collect()
    got shouldBe Array((1L, 1L, 5.0), (1L, 2L, 7.0), (2L, 3L, 1.0))
  }

  test("tiny per-task byte budget degrades to the external sort, same rows, no OOM") {
    // 20k distinct keys through the EXPLICIT path under a 4 KiB budget:
    // every task trips the heap budget almost immediately and must
    // finish on the spill path. Result must be identical to the
    // window/rank reference.
    val wide = (1 to 20000).flatMap { key =>
      (1 to 3).map(i => (key.toLong, (key * 10 + i).toLong, (i * 31 % 7).toDouble))
    }.toDF("key", "id", "score").repartition(5)
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    val expected = wide.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("key", "id", "score")
      .orderBy("key", "id").as[(Long, Long, Double)].collect()
    withSQLConf(TopKPerKey.MaxTaskRetainedBytesKey -> "4096") {
      val got = TopKPerKey(wide, Seq("key"),
          Seq(TopKPerKey.desc("score"), TopKPerKey.asc("id")), 2)
        .orderBy("key", "id").as[(Long, Long, Double)].collect()
      got shouldBe expected
    }
  }

  test("budget trip mid-stream keeps already-heaped rows (no row loss at the seam)") {
    // Small key count but a budget sized so the trip happens after
    // some heaps are full — exercises the heap→sorter handoff.
    val seam = (1 to 500).flatMap { key =>
      (1 to 10).map(i => (key.toLong, (key * 100 + i).toLong, ((i * 37) % 100).toDouble))
    }.toDF("key", "id", "score").repartition(3)
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    val expected = seam.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("key", "id", "score")
      .orderBy("key", "id").as[(Long, Long, Double)].collect()
    withSQLConf(TopKPerKey.MaxTaskRetainedBytesKey -> "8192") {
      val got = TopKPerKey(seam, Seq("key"),
          Seq(TopKPerKey.desc("score"), TopKPerKey.asc("id")), 3)
        .orderBy("key", "id").as[(Long, Long, Double)].collect()
      got shouldBe expected
    }
  }

  test("TopKPerKey plans one shuffle and NO sort (the window form sorts)") {
    val topk = TopKPerKey(df, Seq("key"), Seq(TopKPerKey.desc("score"), TopKPerKey.asc("id")), 3)
    topk.count() // force final adaptive plan
    val plan = topk.queryExecution.executedPlan.toString
    plan should include("TopKPerKey ")
    plan should not include "Sort ["
    windowTopK(3).queryExecution.executedPlan.toString should include("Sort [")
  }

  test("map-side partial pass is planned below the exchange and caps shuffle volume") {
    // 5 keys × 10k rows over 4 map partitions: without the partial
    // pass every row shuffles to 5 reducer keys; with it each map task
    // ships ≤ keys × k rows. The metric proves the volume, the node
    // names prove the shape (partial below the exchange, exact above).
    val wide = (1 to 50000).map { i =>
      ((i % 5).toLong, i.toLong, ((i * 37) % 1000).toDouble)
    }.toDF("key", "id", "score").repartition(4)
    val topk = TopKPerKey(wide, Seq("key"),
      Seq(TopKPerKey.desc("score"), TopKPerKey.asc("id")), 3)
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    val expected = wide.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("key", "id", "score")
      .orderBy("key", "id").as[(Long, Long, Double)].collect()
    topk.orderBy("key", "id").as[(Long, Long, Double)].collect() shouldBe expected

    val executed = topk.queryExecution.executedPlan
    val finalPlan = executed match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val planStr = finalPlan.toString
    planStr should include("TopKPerKeyPartial")
    planStr should include("TopKPerKey ")
    val shuffled = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics.collectFirst {
          case (name, m) if name.contains("records written") ||
              name == "shuffleRecordsWritten" => m.value
        }.getOrElse(fail(s"no shuffle write metric in ${e.metrics.keys}"))
    }
    shuffled should not be empty
    // ≤ keys × k × mapPartitions (= 60), nowhere near the 50k input.
    all(shuffled) should be <= 60L
  }

  test("partial passthrough degrade (budget trip) still yields the exact result") {
    // High key cardinality + tiny budget: the PARTIAL tasks trip the
    // byte budget and degrade to passthrough (heap drain + untouched
    // remainder — never a map-side sort); the exact pass then trips
    // too and finishes on its external-sort path. Rows must match the
    // window reference exactly — nothing lost at the passthrough seam.
    val many = (1 to 30000).map { i =>
      ((i % 6000).toLong, i.toLong, ((i * 13) % 97).toDouble)
    }.toDF("key", "id", "score").repartition(5)
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    val expected = many.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("key", "id", "score")
      .orderBy("key", "id").as[(Long, Long, Double)].collect()
    withSQLConf(TopKPerKey.MaxTaskRetainedBytesKey -> "4096") {
      val got = TopKPerKey(many, Seq("key"),
          Seq(TopKPerKey.desc("score"), TopKPerKey.asc("id")), 2)
        .orderBy("key", "id").as[(Long, Long, Double)].collect()
      got shouldBe expected
    }
  }
}
