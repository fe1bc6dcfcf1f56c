package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TopKRewriteRuleSpec extends AnyFunSuite with Matchers {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-topk-rewrite-test")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  import org.apache.spark.sql.DataFrame
  private def windowTopK(k: Int): DataFrame = {
    import spark.implicits._
    val rows = for { key <- 1 to 20; i <- 1 to 50 }
      yield (key.toLong, (key * 100 + i).toLong, ((i * 13) % 50).toDouble)
    val df = rows.toDF("key", "id", "score")
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("key", "id", "score")
  }

  test("the window-rank top-k idiom is rewritten to TopKPerKey automatically") {
    val df = windowTopK(3)
    df.queryExecution.optimizedPlan.toString should include("TopKPerKey")
    df.queryExecution.optimizedPlan.toString should not include "Window"
    // the PROJECT-anchored case must have matched (top-down order):
    // the rank is dead above the filter, so it is NOT emitted
    df.queryExecution.optimizedPlan.toString should not include "rn#"
  }

  test("the rewritten plan returns exactly the window-rank rows") {
    import spark.implicits._
    val got = windowTopK(3).orderBy("key", "id")
      .as[(Long, Long, Double)].collect()
    // reference result computed WITHOUT the rule (rank on the driver)
    val rows = for { key <- 1 to 20; i <- 1 to 50 }
      yield (key.toLong, (key * 100 + i).toLong, ((i * 13) % 50).toDouble)
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (-r._3, r._2)).take(3)
    }.sortBy(r => (r._1, r._2)).toArray
    got shouldBe expected
  }

  test("a BARE Filter(rank<=k, Window) with no Project above rewrites " +
    "too (API surfaces returning the ranked frame as-is, e.g. Pq.topK)") {
    import spark.implicits._
    val rows = for { key <- 1 to 5; i <- 1 to 20 }
      yield (key.toLong, (key * 100 + i).toLong, ((i * 7) % 20).toDouble)
    val df = rows.toDF("key", "id", "score")
    val w = Window.partitionBy("key").orderBy(asc("score"), asc("id"))
    // no trailing select: the filter IS the query root
    val ranked = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    ranked.queryExecution.optimizedPlan.toString should include("TopKPerKey")
    // rank column is emitted and correct
    val got = ranked.orderBy("key", "rn")
      .select(col("key"), col("id"), col("rn").cast("long"))
      .as[(Long, Long, Long)].collect()
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      g.sortBy(r => (r._3, r._2)).take(3).zipWithIndex
        .map { case (r, i) => (k, r._2, i + 1L) }
    }.sortBy(r => (r._1, r._3)).toArray
    got shouldBe expected
  }

  test("children above the memory bound keep the spilling window plan") {
    // TopKPerKeyExec DOES have a runtime spill fallback (the per-task
    // retained-bytes budget degrades to UnsafeExternalRowSorter —
    // TopKPerKeySpec drives 20k keys through it under a 4 KiB budget),
    // but the plan-time estimate is still the cheaper guard: when the
    // child's estimated size exceeds spark.graft.topk.maxChildBytes
    // the rule keeps the stock window-sort, which would do the same
    // sort the degraded path does without first filling a heap map.
    spark.conf.set(TopKRewriteRule.MaxChildBytesKey, "1") // force oversize
    try {
      val df = windowTopK(3)
      df.queryExecution.optimizedPlan.toString should not include "TopKPerKey"
      df.queryExecution.optimizedPlan.toString should include("windowspecdefinition")
    } finally spark.conf.unset(TopKRewriteRule.MaxChildBytesKey)
    // and with the default bound the small child rewrites again
    windowTopK(3).queryExecution.optimizedPlan.toString should include("TopKPerKey")
  }

  test("a legacy huge maxChildBytes saturates instead of wrapping negative") {
    // limit × numShufflePartitions can overflow Long; a user carrying a
    // legacy absolute-bytes value (or Long.MaxValue as "always
    // rewrite") must still get the rewrite, not a silent disable via a
    // negative budget.
    spark.conf.set(TopKRewriteRule.MaxChildBytesKey, Long.MaxValue.toString)
    try {
      val df = windowTopK(3)
      df.queryExecution.optimizedPlan.toString should include("TopKPerKey")
    } finally spark.conf.unset(TopKRewriteRule.MaxChildBytesKey)
  }

  test("a LIVE rank rewrites too: TopKPerKey emits the row_number") {
    import spark.implicits._
    val rows = for { key <- 1 to 20; i <- 1 to 50 }
      yield (key.toLong, (key * 100 + i).toLong, ((i * 13) % 50).toDouble)
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    val kept = rows.toDF("key", "id", "score")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("key", "id", "rn") // rank referenced → operator emits it
    kept.queryExecution.optimizedPlan.toString should include("TopKPerKey")
    kept.queryExecution.optimizedPlan.toString should not include "windowspecdefinition"
    val got = kept.orderBy("key", "rn").as[(Long, Long, Int)].collect()
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case (r, idx) => (r._1, r._2, idx + 1) }
    }.sortBy(r => (r._1, r._3)).toArray
    got shouldBe expected
  }

  test("q76's executed plan under GraftExtensions carries TopKPerKeyExec, not a window sort") {
    // q76 ranks (source, tok) counts and then USES the rank (log r is
    // the regression x) — the live-rank rewrite must fire: top-100 per
    // source via the bounded heap, no full per-source sort.
    val d = graft.SparkEntry.allDefs.find(_.name == "q76_zipf_slope").get
    val plan = d.build(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should include("TopKPerKey")
    plan should not include "windowspecdefinition"
  }

  test("q84's executed plan under GraftExtensions carries TopKPerKeyExec, not a window sort") {
    // q84 (per-source domain caps) keeps the rank as an output column
    // — same live-rank shape as q76; the cap must plan as a bounded
    // heap per source, not a full per-source sort.
    val d = graft.SparkEntry.allDefs.find(_.name == "q84_source_caps").get
    val plan = d.build(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should include("TopKPerKey")
    plan should not include "windowspecdefinition"
  }

  test("emitted ranks are correct on the DEGRADED (spill) path too") {
    import spark.implicits._
    val rows = for { key <- 1 to 200; i <- 1 to 20 }
      yield (key.toLong, (key * 1000 + i).toLong, ((i * 7) % 20).toDouble)
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    // Force the external-sort fallback with a tiny retained-bytes budget.
    spark.conf.set(TopKPerKey.MaxTaskRetainedBytesKey, "1024")
    try {
      val kept = rows.toDF("key", "id", "score")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("key", "id", "rn")
      kept.queryExecution.optimizedPlan.toString should include("TopKPerKey")
      val got = kept.orderBy("key", "rn").as[(Long, Long, Int)].collect()
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
          .map { case (r, idx) => (r._1, r._2, idx + 1) }
      }.sortBy(r => (r._1, r._3)).toArray
      got shouldBe expected
    } finally spark.conf.unset(TopKPerKey.MaxTaskRetainedBytesKey)
  }
}
