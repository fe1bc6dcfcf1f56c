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

  test("TopKPerKey plans one shuffle and NO sort (the window form sorts)") {
    val topk = TopKPerKey(df, Seq("key"), Seq(TopKPerKey.desc("score"), TopKPerKey.asc("id")), 3)
    topk.count() // force final adaptive plan
    val plan = topk.queryExecution.executedPlan.toString
    plan should include("TopKPerKey ")
    plan should not include "Sort ["
    windowTopK(3).queryExecution.executedPlan.toString should include("Sort [")
  }
}
