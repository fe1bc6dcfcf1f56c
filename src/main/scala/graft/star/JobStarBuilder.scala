package graft.star

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** The full dimensional model over a landing batch. */
final case class JobStar(
    dimCompany: DataFrame,
    dimPublisher: DataFrame,
    dimEmploymentType: DataFrame,
    dimLocation: DataFrame,
    dimDate: DataFrame,
    dimJobDetails: DataFrame,
    dimSkill: DataFrame,
    fact: DataFrame,
    bridge: DataFrame) {
  def all: Map[String, DataFrame] = Map(
    "dim_company" -> dimCompany,
    "dim_publisher" -> dimPublisher,
    "dim_employment_type" -> dimEmploymentType,
    "dim_location" -> dimLocation,
    "dim_date" -> dimDate,
    "dim_job_details" -> dimJobDetails,
    "dim_skill" -> dimSkill,
    "fact_job_postings" -> fact,
    "bridge_job_skill" -> bridge)
}

/** Assembles the reference's 7-dim + fact + bridge star from a landing
  * batch (semantics: `dags/spark_etl_script.py:86-179`), Spark-first:
  *
  *   - every dim is distinct + normalize + dense SK (strategy pluggable,
  *     Auto by default: distributed numbering above the size threshold);
  *   - the fact resolves SKs via a 6-join chain on COMPUTED keys
  *     (normalized strings / dates). The 5 genuinely small dims
  *     (company/publisher/employment-type/location/date — bounded
  *     vocabularies) are explicitly `broadcast()`; `dim_job_details` is
  *     NOT: it is 1:1 with distinct landing jobs, i.e. fact-sized, so a
  *     forced broadcast would OOM the driver at scale. Its join is left
  *     to Spark's size-checked planning (sort-merge above the
  *     auto-broadcast threshold; co-located with no shuffle when both
  *     sides are bucketed on `job_natural_key`);
  *   - the bridge is skills-explode → broadcast skill-dim join → inner
  *     join back to the fact on the natural key → distinct pairs;
  *   - `job_natural_key` is a content hash of the identifying columns
  *     (deterministic — unlike the reference's
  *     `monotonically_increasing_id`, which is partition-layout
  *     dependent; SURVEY §7.4-1 mandates a canonical key).
  *
  * The `job_highlights` array keeps the reference's declared semantics:
  * an ARRAY parse of an object-shaped payload → NULL for well-formed
  * records (SURVEY §1.2 quirk, bit-compat mode). The opt-in
  * `highlightsFixedParse` flag instead parses the payload's TRUE
  * shape — `map<string, array<string>>` (section → bullets) via
  * [[graft.functions.parseJsonMap]] — as `job_highlights_map`. The
  * parse runs AFTER surrogate-key assignment (Spark cannot DISTINCT
  * a map column), and fixed mode dedupes by NATURAL KEY with a
  * deterministic min tiebreak rather than by whole row: distinct
  * over the raw JSON string would be strictly finer than distinct
  * over the parsed map (key order / whitespace variants would mint
  * extra job_sks and fan out the fact join on job_natural_key).
  */
object JobStarBuilder {

  private val naturalKeyCols = Seq(
    "job_title", "employer_name", "job_publisher", "job_location",
    "job_posted_at_datetime_utc")

  def build(
      landing: DataFrame,
      now: Column,
      strategy: SkStrategy.Value = SkStrategy.Auto,
      highlightsFixedParse: Boolean = false): JobStar = {

    val raw0 = landing
      .withColumn("job_natural_key",
        gf.stableHash(concat_ws("", naturalKeyCols.map(col): _*)))
      .withColumn("job_posted_at_ts",
        gf.parseRelativeTime(col("job_posted_at"), now))
      .withColumn("job_posted_at_utc",
        coalesce(to_timestamp(col("job_posted_at_datetime_utc")),
          col("job_posted_at_ts")))
    // C1 (reference spark_etl_script.py:146-153): raw feeds all 7
    // dims plus the fact chain — without the cache every consumer
    // re-scans and re-derives the landing batch. Tracked (DataSized:
    // one row per landing record) so embedded callers reclaim it via
    // CacheRegistry's drain/auto-drain like every other graft persist.
    val raw = graft.CacheRegistry.persistTracked(raw0,
      graft.CacheRegistry.DataSized)

    val dimCompany = StarSchemaBuilder.buildDim(
      raw, gf.normName(col("employer_name")), "company_sk", "employer_name",
      strategy)
    val dimPublisher = StarSchemaBuilder.buildDim(
      raw, gf.normTitle(col("job_publisher")), "publisher_sk", "publisher_name",
      strategy)
    val dimEmploymentType = StarSchemaBuilder.buildDim(
      raw, gf.normTitle(col("job_employment_type")), "employment_type_sk",
      "employment_type_name", strategy)

    val dimLocation = StarSchemaBuilder.withSurrogateKey(
      raw.select("job_location", "job_city", "job_state", "job_country")
        .filter(col("job_location").isNotNull).distinct(),
      Seq("job_location"), "location_sk", strategy)
      .select("location_sk", "job_location", "job_city", "job_state",
        "job_country")

    val dimDate = StarSchemaBuilder.buildDateDim(raw, col("job_posted_at_utc"))

    // Bit-compat mode parses through the reference's declared array
    // schema (NULL on the object payload) and keeps the reference's
    // whole-row DISTINCT. Fixed mode carries the raw JSON string
    // (maps can't be DISTINCTed) but must NOT distinct over it: two
    // records with the same job_natural_key whose highlight payloads
    // differ only in JSON key order / whitespace would survive as two
    // dim rows with different job_sks, and the fact's equi-join on
    // job_natural_key would then fan out every matching fact row
    // (ADVICE r11). Fixed mode therefore dedupes BY NATURAL KEY —
    // one dim row per key, representative chosen by a deterministic
    // lexicographic-min tiebreak over the remaining columns — which
    // also makes the dim's declared unique key actually unique.
    val jobCols = raw.select(
        col("job_natural_key"),
        trim(col("job_title")).as("job_title"),
        col("job_description"),
        (if (highlightsFixedParse) col("job_highlights")
         else gf.parseJsonList(col("job_highlights"))
           .as("job_highlights_array")),
        col("job_is_remote").cast("boolean").as("job_is_remote"),
        col("job_posted_at"),
        col("job_posted_at_utc"))
      .filter(col("job_natural_key").isNotNull)
    val jobRows =
      if (highlightsFixedParse) {
        val rest = jobCols.columns.filter(_ != "job_natural_key")
        jobCols.groupBy("job_natural_key")
          .agg(min(struct(rest.map(col): _*)).as("r"))
          .select(col("job_natural_key") +: rest.map(c => col(s"r.$c")): _*)
      } else jobCols.distinct()
    val dimJobDetails0 = StarSchemaBuilder.withSurrogateKey(
      jobRows, Seq("job_natural_key"), "job_sk", strategy)
    val dimJobDetails =
      if (highlightsFixedParse)
        dimJobDetails0
          .withColumn("job_highlights_map",
            gf.parseJsonMap(col("job_highlights")))
          .drop("job_highlights")
      else dimJobDetails0

    // Skills: the reference's bracket-string parser → explode →
    // normalize → non-empty filter (spark_etl_script.py:132-139).
    val skillsExploded = raw
      .select(col("job_natural_key"),
        explode_outer(gf.parseBracketList(col("skills"))).as("skill_name_raw"))
      .select(col("job_natural_key"),
        gf.normTitle(col("skill_name_raw")).as("skill_name"))
      .filter(col("skill_name").isNotNull && col("skill_name") =!= "")

    val dimSkill = StarSchemaBuilder.withSurrogateKey(
      skillsExploded.select("skill_name").distinct(),
      Seq("skill_name"), "skill_sk", strategy)
      .select("skill_sk", "skill_name")

    // Fact: 6-join chain on computed keys (J1-J6). Small dims are
    // broadcast; dim_job_details grows with the fact (one row per
    // distinct natural key) so it must NOT carry a broadcast hint —
    // the hint would override Spark's size check and collect a
    // fact-sized build side onto the driver at 100x scale.
    val resolved = raw
      .join(dimJobDetails.select("job_sk", "job_natural_key"),
        Seq("job_natural_key"))
      .join(broadcast(dimCompany),
        gf.normName(raw("employer_name")) === dimCompany("employer_name"), "left")
      .join(broadcast(dimPublisher),
        gf.normTitle(raw("job_publisher")) === dimPublisher("publisher_name"), "left")
      .join(broadcast(dimEmploymentType),
        gf.normTitle(raw("job_employment_type")) ===
          dimEmploymentType("employment_type_name"), "left")
      .join(broadcast(dimLocation.select("location_sk", "job_location")),
        raw("job_location") === dimLocation("job_location"), "left")
      .join(broadcast(dimDate.select("date_sk", "full_date")),
        to_date(col("job_posted_at_utc")) === dimDate("full_date"), "left")

    val fact = StarSchemaBuilder.withSurrogateKey(
        resolved.select("job_natural_key", "job_sk", "company_sk",
          "location_sk", "date_sk", "employment_type_sk", "publisher_sk"),
        Seq("job_natural_key"), "job_posting_pk", strategy)
      .withColumn("job_count", lit(1L))
      .select("job_posting_pk", "job_natural_key", "job_sk", "company_sk",
        "location_sk", "date_sk", "employment_type_sk", "publisher_sk",
        "job_count")

    // Bridge: J7 (skill dim, inner) + J8 (fact natural key, inner) →
    // distinct pairs (spark_etl_script.py:175-179).
    val bridge = skillsExploded
      .join(broadcast(dimSkill), Seq("skill_name"))
      .join(fact.select("job_posting_pk", "job_natural_key"),
        Seq("job_natural_key"))
      .select("job_posting_pk", "skill_sk")
      .distinct()

    JobStar(dimCompany, dimPublisher, dimEmploymentType, dimLocation,
      dimDate, dimJobDetails, dimSkill, fact, bridge)
  }
}
