package graft.star

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Distributed determinism: the star build must produce IDENTICAL
  * output — including every surrogate key — regardless of the physical
  * partitioning of the landing batch. This is the property that makes
  * the engine's results reproducible on a cluster (SURVEY §7.4-1: the
  * reference's monotonically_increasing_id natural key is
  * partition-layout dependent; ours is a content hash). */
class JobStarBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def landing(parts: Int): DataFrame =
    (1 to 60).map { i =>
      (s"title $i", s"employer ${i % 7}", s"board ${i % 3}",
        if (i % 5 == 0) null else "fulltime",
        s"desc spark sql number $i", i % 2 == 0,
        s"${i % 9 + 1} days ago", f"2025-12-${i % 28 + 1}%02dT00:00:00Z",
        s"city ${i % 4}", s"city ${i % 4}", "ST", "US",
        null.asInstanceOf[String],
        s"""["skill${i % 5}", "skill${(i + 1) % 5}"]""")
    }.toDF("job_title", "employer_name", "job_publisher",
        "job_employment_type", "job_description", "job_is_remote",
        "job_posted_at", "job_posted_at_datetime_utc", "job_location",
        "job_city", "job_state", "job_country", "job_highlights", "skills")
      .repartition(parts)

  test("star output is identical under different input partitionings") {
    val now = lit("2026-01-01 00:00:00").cast("timestamp")
    val a = JobStarBuilder.build(landing(1), now)
    val b = JobStarBuilder.build(landing(7), now)
    a.all.foreach { case (name, dfA) =>
      val dfB = b.all(name)
      withClue(s"$name: ") {
        dfA.exceptAll(dfB).count() shouldBe 0
        dfB.exceptAll(dfA).count() shouldBe 0
        dfA.count() should be > 0L
      }
    }
  }

  test("fact chain broadcasts ONLY the 5 bounded dims; fact-sized job-details is unhinted") {
    // dim_job_details is 1:1 with distinct landing jobs — fact-sized. A
    // forced broadcast() there would override Spark's size check and
    // OOM the driver at scale; only the bounded-vocabulary dims may be
    // hinted. Auto-broadcast is disabled so the physical plan reflects
    // hints, not tiny-test-data size estimates.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val now = lit("2026-01-01 00:00:00").cast("timestamp")
      // GlobalRowNumber: the Auto strategy persists the joined frame
      // for the two-pass SK assignment, and cache substitution would
      // hide the join chain behind an InMemoryRelation — the join PLAN
      // under inspection is identical either way.
      val star = JobStarBuilder.build(landing(4), now,
        strategy = SkStrategy.GlobalRowNumber)
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val joins = star.fact.queryExecution.optimizedPlan.collect {
        case j: Join => j
      }
      joins.length shouldBe 6
      val hinted = joins.count(j =>
        j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined))
      hinted shouldBe 5
      val physical = star.fact.queryExecution.executedPlan.toString
      "BroadcastHashJoin".r.findAllIn(physical).size shouldBe 5
      // the unhinted job-details join sort-merges on the natural key
      physical should include("SortMergeJoin")
      // and the pipeline stays correct end-to-end under this plan
      star.fact.count() shouldBe 60
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("highlightsFixedParse recovers the object payload as map<string,array<string>>") {
    // Reference evidence (SURVEY §1.2): every record in
    // data/raw_jobs.json carries an OBJECT payload — section name →
    // bullet list — which the reference's declared ARRAY parse NULLs.
    val now = lit("2026-01-01 00:00:00").cast("timestamp")
    val withObj = landing(3).withColumn("job_highlights",
      concat(
        lit("""{"Qualifications":["sql","spark"],"Responsibilities":["etl for """),
        col("job_title"), lit("\"]}")))
    // bit-compat default: the declared array parse NULLs the payload
    val compat = JobStarBuilder.build(withObj, now)
    compat.dimJobDetails.filter(col("job_highlights_array").isNotNull)
      .count() shouldBe 0
    // fixed variant: the true map shape round-trips, per record
    val fixed = JobStarBuilder.build(withObj, now,
      highlightsFixedParse = true)
    fixed.dimJobDetails.columns should contain("job_highlights_map")
    fixed.dimJobDetails.columns should not contain "job_highlights"
    val dim = fixed.dimJobDetails
    dim.filter(col("job_highlights_map").isNull).count() shouldBe 0
    val row = dim.filter(col("job_title") === "title 1")
      .select(map_keys(col("job_highlights_map")),
        col("job_highlights_map").getItem("Qualifications"),
        element_at(col("job_highlights_map").getItem("Responsibilities"),
          1))
      .head()
    row.getSeq[String](0).sorted shouldBe Seq("Qualifications",
      "Responsibilities")
    row.getSeq[String](1) shouldBe Seq("sql", "spark")
    row.getString(2) shouldBe "etl for title 1"
  }

  test("highlightsFixedParse: payload variants of one natural key do not fan out") {
    // Two landing records per job with the SAME natural key whose
    // highlight payloads differ only in JSON key order/whitespace.
    // A raw-string distinct would mint two job_sks per key and the
    // fact join on job_natural_key would double every fact row
    // (ADVICE r11); natural-key dedupe keeps exactly one dim row.
    val now = lit("2026-01-01 00:00:00").cast("timestamp")
    val base = landing(2)
    val v1 = base.withColumn("job_highlights",
      lit("""{"Qualifications":["sql"],"Responsibilities":["etl"]}"""))
    val v2 = base.withColumn("job_highlights",
      lit("""{ "Responsibilities":["etl"], "Qualifications":["sql"] }"""))
    val doubled = v1.unionAll(v2)
    val star = JobStarBuilder.build(doubled, now,
      highlightsFixedParse = true)
    val nKeys = doubled.select("job_title", "employer_name",
        "job_publisher", "job_location", "job_posted_at_datetime_utc")
      .distinct().count()
    star.dimJobDetails.count() shouldBe nKeys
    star.dimJobDetails.select("job_natural_key").distinct()
      .count() shouldBe nKeys
    // Fact carries one row per LANDING record (120), not 240 fanned.
    star.fact.count() shouldBe doubled.count()
  }
}
