package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => sqlfn}

import graft.SparkSpec

/** TokenProfile vs the composed tokens/array_distinct/countIn triple:
  * bit-equal counts on a fuzz corpus covering every ASCII whitespace
  * byte, unicode (incl. non-breaking space, which is NOT a Java `\s`
  * separator), empties, and stop-term edge shapes. */
class TokenProfileSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("a", "the")

  private val corpus = Seq(
    "the quick brown fox",
    "  leading and trailing  ",
    "a a a the the a",
    "",
    "   ",
    "\t tab\tseparated \n newline  vtab \f ff \r cr",
    "one",
    "nbsp\u00A0joined stays", // U+00A0 is not \\s: nbsp-joined = ONE token
    "unicode 世界 世界 tokens",
    "supplementary 😀 😀 emoji",
    "A THE Case sensitive the a",
    "the-embedded a.the athe thea",
    "repeat repeat repeat repeat",
    (1 to 200).map(i => s"w${i % 17}").mkString(" "))

  test("fuzz parity with the composed form, interpreted and codegen'd") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val arr = graft.functions.tokens(col("text"))
    val composed = df.select(col("id"),
        sqlfn.size(arr).cast("long").as("n_tokens"),
        sqlfn.size(array_distinct(arr)).cast("long").as("n_distinct"),
        graft.functions.countIn(arr, stops).cast("long").as("n_stop"))
      .orderBy("id").collect()
    val fused = df.select(col("id"),
        graft.functions.tokenProfile(col("text"), stops).as("p"))
      .select(col("id"), col("p.n_tokens"), col("p.n_distinct"),
        col("p.n_stop"))
      .orderBy("id").collect()
    fused.zip(composed).foreach { case (f, c) =>
      withClue(s"doc ${f.getLong(0)} '${corpus(f.getLong(0).toInt)}': ") {
        (f.getLong(1), f.getLong(2), f.getLong(3)) shouldBe
          ((c.getLong(1), c.getLong(2), c.getLong(3)))
      }
    }
    // the empty/whitespace-only rows really report zero
    fused(3).getLong(1) shouldBe 0L
    fused(4).getLong(1) shouldBe 0L
  }

  test("direct eval: views do not alias across tokens (distinct is content-based)") {
    val r = TokenProfile.profile(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "ab ab ba ab cd"),
      Seq("ab").map(_.getBytes("UTF-8")).toArray)
    r.getLong(0) shouldBe 5L
    r.getLong(1) shouldBe 3L
    r.getLong(2) shouldBe 3L
  }
}
