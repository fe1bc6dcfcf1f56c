package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import IncrementalStar.DimSpec

class IncrementalStarSpec extends SparkSpec {
  import spark.implicits._

  private val dims = Seq(
    DimSpec("inc_dim_company", "company_sk", Seq("company")),
    DimSpec("inc_dim_loc", "loc_sk", Seq("city"), attrs = Seq("country")))
  private val factCols = Seq("job_id", "company_sk", "loc_sk")

  test("micro-batches upsert dims append-only and append SK-resolved fact rows") {
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_inc")
    spark.sql("DROP TABLE IF EXISTS graft_inc.inc_dim_company")
    spark.sql("DROP TABLE IF EXISTS graft_inc.inc_dim_loc")
    spark.sql("DROP TABLE IF EXISTS graft_inc.fact_jobs")

    val mem = MemoryStream[(Long, String, String, String)]
    val landing = mem.toDF().toDF("job_id", "company", "city", "country")
    val q = IncrementalStar.stream(landing, "graft_inc", dims,
        "fact_jobs", factCols)
      // AvailableNow (the production default) snapshots offsets at
      // start; this test feeds data after start, so poll continuously.
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("incstar").toString)
      .start()

    mem.addData(Seq(
      (1L, "acme", "springfield", "US"),
      (2L, "beta", "shelbyville", "US")))
    q.processAllAvailable()
    val sk1 = spark.table("graft_inc.inc_dim_company")
      .as[(Long, String)].collect().toMap.map(_.swap)
    sk1.keySet shouldBe Set("acme", "beta")

    mem.addData(Seq(
      (3L, "acme", "springfield", "US"), // existing keys → same SKs
      (4L, "gamma", "ogdenville", "NT")))
    q.processAllAvailable()
    q.stop()

    // This session cached the v1 file listing at the sk1 read; the
    // stream's batch session overwrote the table since.
    Seq("graft_inc.inc_dim_company", "graft_inc.inc_dim_loc",
      "graft_inc.fact_jobs").foreach(spark.catalog.refreshTable)
    val companies = spark.table("graft_inc.inc_dim_company")
      .as[(Long, String)].collect().toMap.map(_.swap)
    // append-only: original SKs unchanged, new key continues past max
    companies("acme") shouldBe sk1("acme")
    companies("beta") shouldBe sk1("beta")
    companies.keySet shouldBe Set("acme", "beta", "gamma")
    companies("gamma") shouldBe 3L

    val fact = spark.table("graft_inc.fact_jobs")
      .select("job_id", "company_sk", "loc_sk")
      .orderBy("job_id").as[(Long, Long, Long)].collect()
    fact.length shouldBe 4
    // jobs 1 and 3 share company+city → identical SK pairs across batches
    fact(0)._2 shouldBe fact(2)._2
    fact(0)._3 shouldBe fact(2)._3
    // attributes carried into the dim
    spark.table("graft_inc.inc_dim_loc")
      .filter($"city" === "ogdenville").select("country")
      .as[String].collect().head shouldBe "NT"
  }

  test("replayed micro-batch is idempotent: fact rows land once, SKs stable") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_replay")
    Seq("inc_dim_company", "inc_dim_loc", "fact_jobs").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_replay.$t"))

    val b1 = Seq(
      (1L, "acme", "springfield", "US"),
      (2L, "beta", "shelbyville", "US"))
      .toDF("job_id", "company", "city", "country")
    val b2 = Seq((3L, "gamma", "ogdenville", "NT"))
      .toDF("job_id", "company", "city", "country")

    IncrementalStar.processBatch(spark, b1, "graft_replay", dims,
      "fact_jobs", factCols, batchId = 0L)
    IncrementalStar.processBatch(spark, b2, "graft_replay", dims,
      "fact_jobs", factCols, batchId = 1L)
    val before = spark.table("graft_replay.fact_jobs")
      .select("job_id", "company_sk", "loc_sk", "batch_id")
      .orderBy("job_id").as[(Long, Long, Long, Long)].collect()
    before.length shouldBe 3

    // foreachBatch is at-least-once: a crash between the fact write and
    // the checkpoint commit replays the SAME batchId. The replay must
    // overwrite its own batch_id partition, not append duplicates.
    IncrementalStar.processBatch(spark, b2, "graft_replay", dims,
      "fact_jobs", factCols, batchId = 1L)
    val after = spark.table("graft_replay.fact_jobs")
      .select("job_id", "company_sk", "loc_sk", "batch_id")
      .orderBy("job_id").as[(Long, Long, Long, Long)].collect()
    after shouldBe before

    // and other batches' partitions were untouched by the replay
    spark.table("graft_replay.fact_jobs")
      .filter($"batch_id" === 0L).count() shouldBe 2
  }
}
