package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TransformSpec extends SparkSpec {
  import spark.implicits._

  private val now = lit("2026-01-01 00:00:00")

  test("conform projects the full 15-column landing contract in order") {
    val raw = Seq(("Data Engineer", "We need Spark and SQL and Python skills"))
      .toDF("job_title", "job_description")
    val out = Transform.conform(raw, now)
    out.columns.toSeq shouldBe Schemas.LandingColumns
    out.schema shouldBe Schemas.LandingJob
  }

  test("conform null-fills columns absent from the raw batch") {
    val raw = Seq(("t", "d")).toDF("job_title", "job_description")
    val row = Transform.conform(raw, now).collect().head
    row.getAs[String]("employer_name") shouldBe null
    row.getAs[String]("job_country") shouldBe null
    row.isNullAt(row.fieldIndex("job_is_remote")) shouldBe true
  }

  test("conform tags skills from the description and JSON-serializes them") {
    val raw = Seq(("t", "Looking for Spark, SQL and Python; agile a plus"))
      .toDF("job_title", "job_description")
    val skills = Transform.conform(raw, now)
      .select("skills").as[String].collect().head
    skills shouldBe """["agile","python","spark","sql"]"""
  }

  test("conform stamps ingested_at from the injected clock") {
    val raw = Seq(("t", "d")).toDF("job_title", "job_description")
    val ts = Transform.conform(raw, now)
      .select($"ingested_at".cast("string")).as[String].collect().head
    ts shouldBe "2026-01-01 00:00:00"
  }

  test("the reference vocabulary substring quirk is preserved ('go' in 'algorithms')") {
    val raw = Seq(("t", "strong algorithms background"))
      .toDF("job_title", "job_description")
    val skills = Transform.conform(raw, now)
      .select("skills").as[String].collect().head
    skills should include("\"go\"")
  }
}
