package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

import graft.SparkSpec

/** PiiScrub must be indistinguishable from the 6-expression regexp
  * composition it replaces — counts on the ORIGINAL string, chained
  * email→ip→phone replacement — including the overlap corners where a
  * naive single-alternation pass would diverge. */
class PiiScrubSpec extends SparkSpec {

  import spark.implicits._

  private def scrubCol(c: org.apache.spark.sql.Column) =
    CatalystBridge.column(PiiScrub(CatalystBridge.expr(c)))

  /** The reference composition (exactly q75's original form). */
  private def composed(df: org.apache.spark.sql.DataFrame) = df.select(
    col("s"),
    org.apache.spark.sql.functions.size(
      regexp_extract_all(col("s"), lit(PiiScrub.EmailPat), lit(0))).cast("long").as("n_email"),
    org.apache.spark.sql.functions.size(
      regexp_extract_all(col("s"), lit(PiiScrub.IpPat), lit(0))).cast("long").as("n_ip"),
    org.apache.spark.sql.functions.size(
      regexp_extract_all(col("s"), lit(PiiScrub.PhonePat), lit(0))).cast("long").as("n_phone"),
    regexp_replace(regexp_replace(regexp_replace(col("s"),
      PiiScrub.EmailPat, "<EMAIL>"),
      PiiScrub.IpPat, "<IP>"),
      PiiScrub.PhonePat, "<PHONE>").as("scrubbed"))

  private val cases = Seq(
    "no pii here at all",
    "",
    "reach me at jane.doe@corp.example.org thanks",
    "two mails a@b.co and c.d@e.io plus 10.0.0.1 and 555-0199",
    "ip-only 192.168.1.255 and 1.2.3.4 twice 1.2.3.4",
    "phones 555-01 555-0199 and 123-4567",
    // overlap corner: phone prefix + email suffix share the digits —
    // the chain yields "123-<EMAIL>" (email eats "45a@b.co" first,
    // phone then finds no digits after "123-"), while a single
    // alternation pass would yield "<PHONE>a<EMAIL>". n_phone still
    // counts 1 on the ORIGINAL string.
    "123-45a@b.co",
    // email whose local part looks like an IP: email wins the region
    "1.2.3.4@mail.com but bare 5.6.7.8 stays",
    // adjacent replacements must not create new matches
    "x@y.co555-01 9.9.9.9a@b.cc",
    "unicode π emoji 🎯 around user@host.org 1.1.1.1")

  test("equivalent to the regexp composition on every corner case") {
    val df = cases.toDF("s")
    val got = df.select(col("s"), scrubCol(col("s")).as("p"))
      .select(col("s"), col("p.n_email"), col("p.n_ip"), col("p.n_phone"),
        col("p.scrubbed"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    val ref = composed(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    got shouldBe ref
  }

  test("fuzz parity: 300 random fragment compositions match the composition") {
    // Deterministic fuzz assembling strings from PII fragments, near
    // misses, and separators — the overlap/adjacency space where a
    // fused pass could drift from the chained reference.
    val rnd = new scala.util.Random(7)
    val frags = IndexedSeq(
      "a@b.co", "jane.doe@corp.example.org", "x@y", "@b.co", "a@.co",
      "1.2.3.4", "999.1.1.1", "10.0.0.256", "192.168.1.255", "1.2.3",
      "555-0199", "555-01", "123-4567", "12-345", "123-",
      " ", "", "word", ".", "-", "5", "a", "\n", "π", "😀")
    val fuzz = Seq.tabulate(300) { _ =>
      (0 until rnd.nextInt(8)).map(_ => frags(rnd.nextInt(frags.length)))
        .mkString
    }
    val df = fuzz.toDF("s")
    val got = df.select(col("s"), scrubCol(col("s")).as("p"))
      .select(col("s"), col("p.n_email"), col("p.n_ip"), col("p.n_phone"),
        col("p.scrubbed"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    val ref = composed(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    got shouldBe ref
  }

  test("the overlap corner takes the CHAIN result, not the fused-pass result") {
    val r = Seq("123-45a@b.co").toDF("s")
      .select(scrubCol(col("s")).as("p"))
      .select(col("p.scrubbed"), col("p.n_phone")).collect().head
    r.getString(0) shouldBe "123-<EMAIL>"
    r.getLong(1) shouldBe 1L // counted on the original
  }

  test("null in, null out; non-string rejected") {
    val rows = Seq(Some("a@b.co x"), None).toDF("s")
      .select(scrubCol(col("s")).as("p")).collect()
    rows(0).isNullAt(0) shouldBe false
    rows(1).isNullAt(0) shouldBe true
    val bad = intercept[Exception] {
      Seq(1L).toDF("s").select(scrubCol(col("s"))).collect()
    }
    bad.getMessage.toLowerCase should include ("string")
  }

  test("interpreted eval agrees with codegen") {
    val df = cases.toDF("s")
    val viaCodegen = df.select(scrubCol(col("s")).as("p"))
      .select(col("p.scrubbed")).as[String].collect().toSeq
    val viaEval = cases.map { s =>
      PiiScrub.run(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .getUTF8String(3).toString
    }
    viaCodegen shouldBe viaEval
  }

}
