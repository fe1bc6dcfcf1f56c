package graft.sources

import scala.collection.mutable

import graft.SparkSpec
import graft.etl.Schemas

class RestSpec extends SparkSpec {

  private def record(title: String): String = s"""{"job_title":"$title"}"""

  test("paginatedScan fetches country x page cells and stops a country on an empty page") {
    val calls = mutable.ArrayBuffer.empty[Rest.Page]
    val df = Rest.paginatedScan(spark, Schemas.RawJob,
      countries = Seq("us", "jp"), maxPages = 5,
      fetchPage = { p =>
        calls += p
        // us has 2 pages, jp has 1
        if (p.country == "us" && p.page <= 2) Seq(record(s"us-${p.page}"))
        else if (p.country == "jp" && p.page == 1) Seq(record("jp-1"))
        else Seq.empty
      })
    df.count() shouldBe 3
    // stops after the first empty page, never fetches page 4/5
    calls.map(p => (p.country, p.page)) shouldBe Seq(
      ("us", 1), ("us", 2), ("us", 3), ("jp", 1), ("jp", 2))
    df.schema shouldBe Schemas.RawJob
  }

  test("withRetry retries with exponential backoff then succeeds") {
    var attempts = 0
    val delays = mutable.ArrayBuffer.empty[Long]
    val got = Rest.withRetry(
      Rest.RetryPolicy(maxRetries = 5, baseDelayMs = 100),
      isRetryable = _ => true, sleep = delays += _) { () =>
      attempts += 1
      if (attempts < 4) sys.error("http 429")
      "ok"
    }
    got shouldBe "ok"
    attempts shouldBe 4
    delays.toSeq shouldBe Seq(100L, 200L, 400L) // 2^attempt backoff
  }

  test("withRetry fails fast on non-retryable errors and after max retries") {
    var attempts = 0
    a[RuntimeException] should be thrownBy {
      Rest.withRetry(Rest.RetryPolicy(maxRetries = 5),
        isRetryable = _ => false, sleep = _ => ()) { () =>
        attempts += 1; sys.error("http 401")
      }
    }
    attempts shouldBe 1

    attempts = 0
    a[RuntimeException] should be thrownBy {
      Rest.withRetry(Rest.RetryPolicy(maxRetries = 2, baseDelayMs = 1),
        isRetryable = _ => true, sleep = _ => ()) { () =>
        attempts += 1; sys.error("http 429")
      }
    }
    attempts shouldBe 3 // initial + 2 retries
  }
}
