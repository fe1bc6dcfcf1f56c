package graft.etl

import org.apache.spark.sql.types._

/** Fixed schema contracts for the raw→landing conformance layer
  * (SURVEY §1.3, §7.1-1). Extraction *projects* onto these — schema
  * conformance, never inference (reference `dags/test_extraction.py:
  * 135-146` projects a fixed column list and null-fills absentees).
  */
object Schemas {

  /** Raw API record shape (reference `data/raw_jobs.json` — the fields
    * the transform actually consumes; extra API fields are dropped by
    * the projection). */
  val RawJob: StructType = StructType(Seq(
    StructField("job_title", StringType),
    StructField("employer_name", StringType),
    StructField("job_publisher", StringType),
    StructField("job_employment_type", StringType),
    StructField("job_description", StringType),
    StructField("job_is_remote", BooleanType),
    StructField("job_posted_at", StringType),
    StructField("job_posted_at_datetime_utc", StringType),
    StructField("job_location", StringType),
    StructField("job_city", StringType),
    StructField("job_state", StringType),
    StructField("job_country", StringType),
    StructField("job_highlights", StringType)))

  /** Landing contract — the reference's 15-column DDL
    * (`dags/test_extraction.py:194-212`): everything TEXT except
    * `job_is_remote BOOLEAN`; `skills`/`job_highlights` are
    * JSON-serialized strings; `ingested_at` is stringly-typed there,
    * kept TimestampType here (the fixed variant — the string form is
    * only a sink-boundary cast). */
  val LandingJob: StructType = StructType(Seq(
    StructField("job_title", StringType),
    StructField("employer_name", StringType),
    StructField("job_publisher", StringType),
    StructField("job_employment_type", StringType),
    StructField("job_description", StringType),
    StructField("job_is_remote", BooleanType),
    StructField("job_posted_at", StringType),
    StructField("job_posted_at_datetime_utc", StringType),
    StructField("job_location", StringType),
    StructField("job_city", StringType),
    StructField("job_state", StringType),
    StructField("job_country", StringType),
    StructField("job_highlights", StringType),
    StructField("ingested_at", TimestampType),
    StructField("skills", StringType)))

  /** Landing column order — the projection target. */
  val LandingColumns: Seq[String] = LandingJob.fields.map(_.name).toSeq
}
