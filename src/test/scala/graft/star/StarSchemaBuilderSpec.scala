package graft.star

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StarSchemaBuilderSpec extends SparkSpec {
  import spark.implicits._

  test("buildDim: distinct + not-null + dense 1..N surrogate keys in key order") {
    val src = Seq("b", "a", "b", null, "c").toDF("k")
    val dim = StarSchemaBuilder.buildDim(src, col("k"), "sk", "name")
      .orderBy("sk").as[(Long, String)].collect()
    dim shouldBe Array((1L, "a"), (2L, "b"), (3L, "c"))
  }

  test("PartitionedOffset and GlobalRowNumber agree on every key") {
    val src = (1 to 5000).map(i => f"key_$i%05d").toDF("k")
      .repartition(7) // scramble physical layout
    val a = StarSchemaBuilder.buildDim(src, col("k"), "sk", "name",
      SkStrategy.PartitionedOffset)
    val b = StarSchemaBuilder.buildDim(src, col("k"), "sk", "name",
      SkStrategy.GlobalRowNumber)
    a.exceptAll(b).count() shouldBe 0
    b.exceptAll(a).count() shouldBe 0
    // dense 1..N
    a.agg(min("sk"), max("sk"), countDistinct("sk")).as[(Long, Long, Long)]
      .collect().head shouldBe ((1L, 5000L, 5000L))
  }

  test("PartitionedOffset plan has no single-partition global sort over the data") {
    val src = (1 to 100).map(i => s"k$i").toDF("k")
    val dim = StarSchemaBuilder.buildDim(src, col("k"), "sk", "name",
      SkStrategy.PartitionedOffset)
    val plan = dim.queryExecution.executedPlan.toString
    // The only windows should be partitioned by _graft_pid (data-parallel)
    // or run over the tiny per-partition-count frame; a global
    // `Window [row_number() ... ORDER BY k]` over the data must not appear.
    plan should not include regex("Window \\[row_number.*ORDER BY k".r.regex)
  }

  test("withSurrogateKey output is partition-ordered by the key: " +
      "sortWithinPartitions == orderBy, no second range exchange") {
    // The q24 contract-sort optimization (PERF #26) rests on this
    // guarantee: after PartitionedOffset, collect() — a
    // partition-ordered reader, like Verify's coalesce(1) writer —
    // must already see globally ascending SKs after only an
    // IN-PARTITION sort.
    val src = (1 to 5000).map(i => (f"key_${(i * 7919) % 5000}%05d", i))
      .toDF("k", "payload").repartition(7)
    val got = StarSchemaBuilder.withSurrogateKey(
        src, Seq("k", "payload"), "sk", SkStrategy.PartitionedOffset)
      .sortWithinPartitions("sk")
    val sks = got.select("sk").as[Long].collect()
    sks shouldBe sorted
    sks.length shouldBe 5000
    sks.head shouldBe 1L
    sks.last shouldBe 5000L
    // And the plan must NOT range-shuffle on the new key — the only
    // range exchange is the SK pass's own repartitionByRange on the
    // order columns.
    val plan = got.queryExecution.executedPlan.toString
    plan should not include "rangepartitioning(sk"
  }

  test("buildDateDim derives yyyyMMdd SK + calendar attributes") {
    val src = Seq("2024-03-05", "2024-03-05", "2023-12-31", null).toDF("d")
      .select(to_date($"d").as("d"))
    val got = StarSchemaBuilder.buildDateDim(src, col("d"))
      .orderBy("date_sk")
      .select("date_sk", "day_of_week", "month_name", "month_number",
        "quarter_number", "year_number")
      .as[(Int, String, String, Int, Int, Int)].collect()
    got shouldBe Array(
      (20231231, "Sunday", "December", 12, 4, 2023),
      (20240305, "Tuesday", "March", 3, 1, 2024))
  }
}
