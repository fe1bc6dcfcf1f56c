package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** Raw→landing conformance (reference `dags/test_extraction.py:90-157`):
  *
  *   1. tag skills from the description (vocabulary substring scan);
  *   2. stamp `ingested_at` from an injectable clock (determinism —
  *      SURVEY §7.4-4; the reference uses `datetime.now()`);
  *   3. project the fixed 15-column landing list, null-filling any
  *      column the raw batch lacks (schema conformance, not inference);
  *   4. JSON-serialize the skills array (the reference `json.dumps`es
  *      both skills and highlights; highlights arrive as a JSON string
  *      already under our raw schema, so only skills need serializing).
  *
  * Everything is a narrow, codegen'd projection — zero shuffles; at
  * 100 TB this layer is purely scan-bound.
  */
object Transform {

  /** The reference's 53-term skill vocabulary
    * (`dags/test_extraction.py:109-117`), substring-match semantics. */
  val ReferenceVocab: Seq[String] = Seq(
    "python", "java", "sql", "javascript", "react", "angular", "node.js",
    "aws", "azure", "gcp", "docker", "kubernetes", "tensorflow", "pytorch",
    "machine learning", "data science", "analytics", "excel", "tableau",
    "power bi", "c++", "c#", "php", "ruby", "go", "devops", "agile",
    "scrum", "git", "api", "rest", "graphql", "cloud", "security",
    "linux", "unix", "windows server", "networking", "database", "html",
    "css", "mongodb", "cassandra", "kafka", "spark", "hadoop", "big data",
    "etl", "data warehousing", "airflow", "dbt", "azure devops", "jira",
    "confluence")

  /** Conform a raw batch to the landing contract. `now` is the injected
    * ingestion clock (a literal timestamp column). */
  def conform(
      raw: DataFrame,
      now: Column,
      vocab: Seq[String] = ReferenceVocab): DataFrame = {
    val withDerived = raw
      .withColumn("skills",
        to_json(gf.extractTags(col("job_description"), vocab)))
      .withColumn("ingested_at", now.cast("timestamp"))
    val projected = Schemas.LandingColumns.map { c =>
      if (withDerived.columns.contains(c)) col(c)
      else lit(null).cast(Schemas.LandingJob(c).dataType).as(c)
    }
    withDerived.select(projected: _*)
  }
}
