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
}
