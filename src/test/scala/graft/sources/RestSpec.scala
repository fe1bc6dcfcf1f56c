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

  test("extractRecords pulls the records array out of the API envelope") {
    Rest.extractRecords("""{"status":"OK","data":[{"a":1},{"a":2}]}""") shouldBe
      Seq("""{"a":1}""", """{"a":2}""")
    // missing / null / non-array data field → empty page, ends pagination
    Rest.extractRecords("""{"status":"OK"}""") shouldBe Seq.empty
    Rest.extractRecords("""{"data":null}""") shouldBe Seq.empty
    Rest.extractRecords("""{"data":"oops"}""") shouldBe Seq.empty
    Rest.extractRecords("""{"items":[{"b":1}]}""", "items") shouldBe Seq("""{"b":1}""")
  }

  test("isRetryableStatus retries 429/5xx/IO, fails fast on other 4xx") {
    Rest.isRetryableStatus(Rest.HttpStatusException(429, "u")) shouldBe true
    Rest.isRetryableStatus(Rest.HttpStatusException(503, "u")) shouldBe true
    Rest.isRetryableStatus(new java.io.IOException("conn reset")) shouldBe true
    Rest.isRetryableStatus(Rest.HttpStatusException(401, "u")) shouldBe false
    Rest.isRetryableStatus(new IllegalStateException("bug")) shouldBe false
  }

  test("httpFetchPage drives paginatedScan over live HTTP (localhost), incl. 429 retry") {
    // A real java.net.http round-trip against an in-process server —
    // the default transport is runnable, not just a documented seam.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/jobs", { exchange =>
      val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.nonEmpty)
        .map(_.split("=", 2)).map(kv => kv(0) -> kv(1)).toMap
      val page = params("page").toInt
      // first-ever request is rate-limited → transport must retry
      if (hits.incrementAndGet() == 1) {
        exchange.sendResponseHeaders(429, -1)
        exchange.close()
      } else {
        val body =
          if (page <= 2)
            s"""{"status":"OK","data":[{"job_title":"${params("country")}-$page"}]}"""
          else """{"status":"OK","data":[]}"""
        val bytes = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val fetch = Rest.httpFetchPage(
        p => s"http://127.0.0.1:$port/jobs?country=${p.country}&page=${p.page}",
        headers = Map("X-Api-Key" -> "test"))
      val df = Rest.paginatedScan(spark, Schemas.RawJob,
        countries = Seq("us"), maxPages = 5,
        fetchPage = fetch,
        policy = Rest.RetryPolicy(maxRetries = 3, baseDelayMs = 1),
        isRetryable = Rest.isRetryableStatus,
        sleep = _ => ())
      df.count() shouldBe 2 // pages 1 and 2; page 3 empty ends pagination
      import spark.implicits._
      df.select("job_title").as[String].collect().sorted shouldBe
        Array("us-1", "us-2")
    } finally server.stop(0)
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
