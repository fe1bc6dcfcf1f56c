package graft.sources

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver-side REST extraction (SURVEY §2.1 S1/S2): a paginated fetch
  * loop with retry/backoff, landing results as a DataFrame under an
  * explicit schema.
  *
  * The reference fetches (country × page) pages from a jobs API with 5
  * retries, exponential backoff and 429 handling (reference
  * `dags/test_extraction.py:28-82`). The HTTP transport is injected
  * (`fetchPage`), keeping the operator deterministic and testable —
  * and zero-egress here. Extraction is inherently driver-side: the
  * work is N small HTTP calls, not data-parallel compute; results
  * land in Spark via `createDataFrame` and scale out from there.
  */
object Rest {

  final case class RetryPolicy(
      maxRetries: Int = 5,
      baseDelayMs: Long = 1000L,
      // 429-style responses get extra jittered delay in the reference;
      // jitter is injected for determinism in tests.
      jitterMs: () => Long = () => 0L)

  final case class Page(country: String, page: Int)

  /** Retry `op` under `policy` with exponential backoff (2^attempt).
    * `isRetryable` classifies failures (the reference retries 429 and
    * transient network errors, fails fast otherwise). */
  def withRetry[A](policy: RetryPolicy, isRetryable: Throwable => Boolean,
      sleep: Long => Unit = Thread.sleep)(op: () => A): A = {
    @tailrec def go(attempt: Int): A = Try(op()) match {
      case Success(a) => a
      case Failure(e) if attempt < policy.maxRetries && isRetryable(e) =>
        sleep((policy.baseDelayMs << attempt) + policy.jitterMs())
        go(attempt + 1)
      case Failure(e) => throw e
    }
    go(0)
  }

  /** Paginated scan: fetch every (country × page) cell, concatenate
    * records, conform to `schema`. Empty pages end that country's
    * pagination early (the reference stops on an empty result). */
  def paginatedScan(
      spark: SparkSession,
      schema: StructType,
      countries: Seq[String],
      maxPages: Int,
      fetchPage: Page => Seq[String], // JSON records per page
      policy: RetryPolicy = RetryPolicy(),
      isRetryable: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep): DataFrame = {
    val records = countries.flatMap { c =>
      Iterator.from(1)
        .takeWhile(_ <= maxPages)
        .map(p => withRetry(policy, isRetryable, sleep)(
          () => fetchPage(Page(c, p))))
        .takeWhile(_.nonEmpty)
        .flatten
    }
    import spark.implicits._
    spark.read.schema(schema).json(records.toDS())
  }

  // ---- default live transport --------------------------------------------

  /** HTTP failure that [[isRetryableStatus]] classifies by status —
    * the reference retries 429 and transient 5xx, fails fast on 4xx. */
  final case class HttpStatusException(status: Int, url: String)
      extends RuntimeException(s"HTTP $status from $url")

  /** Retry classifier for [[httpFetchPage]]: 429 (rate limit) and 5xx
    * are transient; connect/timeout IOExceptions too; other statuses
    * fail fast (reference `dags/test_extraction.py:60-72`). A malformed
    * RESPONSE BODY (Jackson parse error — subclasses IOException) is
    * NOT transient: retrying an unparseable 200 burns the whole backoff
    * budget on a permanent failure. */
  def isRetryableStatus(t: Throwable): Boolean = t match {
    case HttpStatusException(status, _) => status == 429 || status >= 500
    case _: com.fasterxml.jackson.core.JsonProcessingException => false
    case _: java.io.IOException => true
    case _ => false
  }

  // ObjectMapper is thread-safe and expensive to build — one per JVM,
  // not one per page fetch.
  private lazy val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Pull the records array out of a JSON API envelope: the value at
    * `recordsField` (e.g. the reference API's `"data"`), re-serialized
    * one JSON string per record. A missing/null field or non-array
    * value is an empty page (ends pagination), matching the
    * reference's `.get("data", [])`. Jackson ships with Spark. */
  def extractRecords(body: String, recordsField: String = "data"): Seq[String] = {
    val node = jsonMapper.readTree(body)
    val arr = if (node == null) null else node.get(recordsField)
    if (arr == null || !arr.isArray) Seq.empty
    else (0 until arr.size()).map(i => arr.get(i).toString)
  }

  /** Default live transport for [[paginatedScan]]'s `fetchPage` seam:
    * GET `buildUrl(page)` with `headers`, require 200, extract
    * `recordsField`. Compose with the retry machinery as
    * `paginatedScan(..., fetchPage = Rest.httpFetchPage(url),
    * isRetryable = Rest.isRetryableStatus)`. Kept out of the default
    * parameter so tests (and this zero-egress environment) stay on
    * injected fakes. */
  def httpFetchPage(
      buildUrl: Page => String,
      headers: Map[String, String] = Map.empty,
      recordsField: String = "data",
      timeout: java.time.Duration = java.time.Duration.ofSeconds(30)): Page => Seq[String] = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout)
      // default is NEVER, which turns the ubiquitous http->https
      // upgrade 301 into a hard (non-retryable) failure
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    page => {
      val url = buildUrl(page)
      val builder = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(url))
        .timeout(timeout)
        .GET()
      headers.foreach { case (k, v) => builder.header(k, v) }
      val resp = client.send(builder.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) throw HttpStatusException(resp.statusCode(), url)
      extractRecords(resp.body(), recordsField)
    }
  }
}
