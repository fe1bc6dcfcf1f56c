package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => fsize}
import org.apache.spark.sql.graft.CatalystBridge
import graft.SparkSpec

class TokenClassCountsSpec extends SparkSpec {
  import spark.implicits._

  private def native(texts: Seq[String]): Seq[(Long, Long)] =
    texts.toDF("t")
      .select(CatalystBridge.column(
        TokenClassCounts(CatalystBridge.expr($"t"))).as("tc"))
      .select($"tc.n_words", $"tc.n_punct")
      .as[(Long, Long)].collect().toSeq

  /** The regex form the expression replaces — q48's original shape. */
  private def regexed(texts: Seq[String]): Seq[(Long, Long)] =
    texts.toDF("t")
      .select(
        fsize(regexp_extract_all($"t", lit("[A-Za-z0-9]+"), lit(0))).cast("long"),
        fsize(regexp_extract_all($"t", lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .as[(Long, Long)].collect().toSeq

  private val tricky = Seq(
    "plain words only",
    "punct, every.where! (really)",
    "tabs\tand\nnewlines\f\rmixed",
    "digits123 mixed4you 42",
    "---", "a", "", "   ",
    "unicode café touché über",            // 2-byte UTF-8
    "cjk 世界 and あ",                         // 3-byte UTF-8
    "emoji 😀😀 twice",                // 4-byte UTF-8 (surrogate pair)
    "mixedéinside and endé",
    "a-b_c.d,e;f:g", "(nested [brackets] {braces})",
    "ALLCAPS lower 0123456789",
    "word nbsp",                                      // U+00A0 is NOT \s in either engine
    "double  spaces   triple")

  test("matches the two-regex form on every character-class shape") {
    native(tricky) shouldBe regexed(tricky)
  }

  test("fuzz parity: 400 random mixed-alphabet strings match the regex form") {
    // Deterministic fuzz over the byte-class boundaries the native
    // scan decides on: ASCII word/punct/space, 2/3/4-byte UTF-8
    // (é, 世, 😀), NBSP (not \s in either engine), controls.
    val rnd = new scala.util.Random(42)
    val alphabet: IndexedSeq[String] = IndexedSeq(
      "a", "Z", "5", " ", "\t", "\n", "\r", "\f", ".", ",", "!", "-",
      "_", "(", ")", "é", "ü", "世", "界", "あ", "😀", "🎉", " ",
      "", "~", "\"", "'")
    val cases = Seq.tabulate(400) { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    native(cases) shouldBe regexed(cases)
  }

  test("null text yields null struct") {
    val r = Seq((1, null: String)).toDF("id", "t")
      .select(CatalystBridge.column(
        TokenClassCounts(CatalystBridge.expr($"t"))).as("tc"))
      .collect()
    r.head.isNullAt(0) shouldBe true
  }

  // SQL registration is covered in GraftExtensionsSpec (extensions
  // must be installed at session build time).
}
