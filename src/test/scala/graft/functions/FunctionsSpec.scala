package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.{functions => gf}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  // ---- tokens -----------------------------------------------------------

  test("tokens splits on whitespace runs and drops empties") {
    val got = Seq("a  b\tc", "  ", "", "one").toDF("t")
      .select(gf.tokens($"t").as("toks")).as[Seq[String]].collect()
    got(0) shouldBe Seq("a", "b", "c")
    got(1) shouldBe Seq.empty // whitespace-only → empty, not [""]
    got(2) shouldBe Seq.empty
    got(3) shouldBe Seq("one")
  }

  // ---- extractTags (reference substring semantics) ----------------------

  private val vocab = Seq("python", "sql", "go", "api")

  private def tags(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(gf.extractTags($"t", vocab).as("tags"))
      .as[Seq[String]].collect().head

  test("extractTags finds case-insensitive vocabulary hits, sorted+deduped") {
    tags("We use Python and SQL. python daily.") shouldBe Seq("python", "sql")
  }

  test("extractTags keeps the reference's substring quirk: short terms match inside words") {
    // "go" inside "algorithms", "api" inside "rapid" — the reference's
    // `skill in description_lower` semantics (test_extraction.py:119-127).
    tags("algorithms move rapidly") shouldBe Seq("api", "go")
  }

  test("extractTags on a miss returns an empty array, not null") {
    tags("nothing relevant here") shouldBe Seq.empty
  }

  test("extractTags degenerate vocabularies (ADVICE r14): empty vocab and empty terms") {
    // Empty vocabulary → empty array (the old Contains chain's
    // behavior), not a PhraseScan analysis failure.
    Seq("anything").toDF("t")
      .select(gf.extractTags($"t", Seq.empty).as("tags"))
      .as[Seq[String]].collect().head shouldBe Seq.empty
    // Empty-string terms are dropped, real terms still match (the
    // old chain's always-true '' inclusion was the artifact).
    Seq("going strong").toDF("t")
      .select(gf.extractTags($"t", Seq("", "go")).as("tags"))
      .as[Seq[String]].collect().head shouldBe Seq("go")
  }

  // ---- parseRelativeTime ------------------------------------------------

  private val now = Timestamp.valueOf("2026-01-01 00:00:00")

  private def rel(s: String): Option[Timestamp] =
    Seq(s).toDF("t")
      .select(gf.parseRelativeTime($"t", lit("2026-01-01 00:00:00").cast("timestamp")).as("ts"))
      .collect().map(r => Option(r.getTimestamp(0))).head

  test("parseRelativeTime handles N hours/days ago") {
    rel("3 hours ago") shouldBe Some(Timestamp.valueOf("2025-12-31 21:00:00"))
    rel("5 days ago") shouldBe Some(Timestamp.valueOf("2025-12-27 00:00:00"))
  }

  test("parseRelativeTime matches hour/day as substrings anywhere (reference bit-compat)") {
    rel("posted 2 hours ago") shouldBe Some(Timestamp.valueOf("2025-12-31 22:00:00"))
    rel("about 1 day ago or so") shouldBe Some(Timestamp.valueOf("2025-12-31 00:00:00"))
  }

  test("parseRelativeTime yields NULL for yesterday (the reference's unreachable branch) and garbage") {
    rel("yesterday") shouldBe None // contains "day" but no digits
    rel("just posted") shouldBe None
    rel("") shouldBe None
  }

  // ---- bracket-list / JSON-list parsers ---------------------------------

  test("parseBracketList strips []'\" and splits on comma-space (reference parser)") {
    val got = Seq("""['sql', 'python', "go"]""").toDF("t")
      .select(gf.parseBracketList($"t").as("xs")).as[Seq[String]].collect().head
    got shouldBe Seq("sql", "python", "go")
  }

  test("parseJsonList parses a real JSON array; yields null on a JSON object (the from_json quirk)") {
    val df = Seq("""["a","b"]""", """{"k": ["a"]}""").toDF("t")
      .select(gf.parseJsonList($"t").as("xs"))
    val got = df.collect().map(r => Option(r.getSeq[String](0)))
    got(0) shouldBe Some(Seq("a", "b"))
    got(1) shouldBe None // SURVEY §1.2: object payload → NULL under array parse
  }

  // ---- hashing / shingles ----------------------------------------------

  test("stableHash is non-negative, deterministic, and md5-derived") {
    val got = Seq("x", "x", "y").toDF("t")
      .select(gf.stableHash($"t").as("h")).as[Long].collect()
    got(0) shouldBe got(1)
    got(0) should not be got(2)
    all(got) should be >= 0L
    // 60-bit: first 15 hex chars of md5("x") = 9dd4e461268c8034
    got(0) shouldBe java.lang.Long.parseLong("9dd4e461268c803", 16)
  }

  test("shingles emits w-grams joined by single spaces; short input → empty") {
    val df = Seq("a b c d", "a b", "").toDF("t")
      .select(gf.shingles(gf.tokens($"t"), 3).as("sh")).as[Seq[String]]
    val got = df.collect()
    got(0) shouldBe Seq("a b c", "b c d")
    got(1) shouldBe Seq.empty
    got(2) shouldBe Seq.empty
  }

  test("normName / normTitle normalize like the reference dims") {
    val got = Seq("  acme corp  ").toDF("t")
      .select(gf.normName($"t").as("n"), gf.normTitle($"t").as("i"))
      .as[(String, String)].collect().head
    got shouldBe (("ACME CORP", "Acme Corp"))
  }
}
