package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => fsize}
import org.apache.spark.sql.graft.CatalystBridge
import graft.SparkSpec

class NgramDupStatsSpec extends SparkSpec {
  import spark.implicits._

  private def native(texts: Seq[String]): Seq[(Int, Int, Int)] =
    texts.toDF("t")
      .select(CatalystBridge.column(
        NgramDupStats(CatalystBridge.expr(trim($"t")))).as("st"))
      .select($"st.n_toks", $"st.d2", $"st.d3")
      .as[(Int, Int, Int)].collect().toSeq

  /** The composed form the expression fuses: ShingleTokens ×3 +
    * array_distinct ×2. */
  private def composed(texts: Seq[String]): Seq[(Int, Int, Int)] =
    texts.toDF("t")
      .select(
        fsize(CatalystBridge.column(
          ShingleTokens(CatalystBridge.expr(trim($"t")), 1, dedupe = false))),
        fsize(array_distinct(CatalystBridge.column(
          ShingleTokens(CatalystBridge.expr(trim($"t")), 2, dedupe = false)))),
        fsize(array_distinct(CatalystBridge.column(
          ShingleTokens(CatalystBridge.expr(trim($"t")), 3, dedupe = false)))))
      .as[(Int, Int, Int)].collect().toSeq
      // size() of ShingleTokens' empty array is 0 for short inputs in
      // both forms, so the tuples line up directly.

  test("fused profile matches the composed ShingleTokens+distinct form") {
    val texts = Seq(
      "a b c d e",
      "a a a a", // maximal repetition: d2 = 1, d3 = 1
      "a  b\tc", // whitespace runs
      "x", // single token: no 2-grams
      "x y", // no 3-grams
      "", // empty
      "a b a b a b", // alternating dups
      "  leading and trailing  ")
    native(texts) shouldBe composed(texts)
  }

  test("fuzz parity: 200 random token streams match the composed form") {
    val rnd = new scala.util.Random(29)
    val vocab = IndexedSeq("a", "b", "c", "tok", "é", "a", "b")
    val seps = IndexedSeq(" ", "  ", "\t")
    val texts = Seq.tabulate(200) { _ =>
      (0 until rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(seps(rnd.nextInt(seps.length)))
    }
    native(texts) shouldBe composed(texts)
  }

  test("counts on a known doc") {
    // tokens: [a b a b a] -> 2-grams: ab ba ab ba -> d2 = 2;
    // 3-grams: aba bab aba -> d3 = 2
    native(Seq("a b a b a")) shouldBe Seq((5, 2, 2))
  }

  test("fuzz parity: long, collision-prone and multi-byte streams (r15 packed-id path)") {
    // Stresses the interning/packed-long kernel: >32 tokens (span
    // array growth), a large vocabulary (table resizing + probe
    // chains), shared prefixes/suffixes (byte-equality discrimination),
    // multi-byte UTF-8 tokens, and near-total repetition.
    val rnd = new scala.util.Random(151)
    val vocab = IndexedSeq("x", "xx", "xy", "yx", "ax", "xa", "αβ", "βα",
      "longtokenwithsharedprefix1", "longtokenwithsharedprefix2", "émü",
      "a", "b", "c", "d", "e", "f", "g", "h", "0", "00", "000")
    val texts = Seq.tabulate(100) { k =>
      val len = 30 + rnd.nextInt(400)
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(if (k % 3 == 0) "  " else " ")
    } ++ Seq(
      Seq.fill(500)("same").mkString(" "), // d2 = d3 = 1
      (0 until 300).map(i => s"t$i").mkString(" ")) // all-distinct windows
    native(texts) shouldBe composed(texts)
  }

  test("null text yields null struct") {
    val rows = Seq[String](null).toDF("t")
      .select(CatalystBridge.column(
        NgramDupStats(CatalystBridge.expr($"t"))).as("st"))
      .collect()
    rows.head.getAs[Row]("st") shouldBe null
  }
}
