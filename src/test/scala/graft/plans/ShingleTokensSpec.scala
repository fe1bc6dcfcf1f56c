package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import graft.SparkSpec
import graft.{functions => gf}

class ShingleTokensSpec extends SparkSpec {
  import spark.implicits._

  private def native(texts: Seq[String], w: Int): Seq[Seq[String]] =
    texts.toDF("t")
      .select(CatalystBridge.column(
        ShingleTokens(CatalystBridge.expr(trim($"t")), w)).as("sh"))
      .as[Seq[String]].collect().toSeq

  private def composed(texts: Seq[String], w: Int): Seq[Seq[String]] =
    texts.toDF("t")
      .select(array_distinct(gf.shingles(gf.tokens($"t"), w)).as("sh"))
      .as[Seq[String]].collect().toSeq

  test("native shingles match the Column-composed form on varied inputs") {
    val texts = Seq(
      "a b c d e",
      "a  b\tc", // whitespace runs
      "x", // shorter than width
      "", // empty
      "a b a b a b", // duplicate shingles
      "  leading and trailing  ")
    native(texts, 3) shouldBe composed(texts, 3)
    native(texts, 1) shouldBe composed(texts, 1)
    native(texts, 2) shouldBe composed(texts, 2)
  }

  test("fuzz parity: 200 random token streams at widths 1-4") {
    val rnd = new scala.util.Random(23)
    val vocab = IndexedSeq("a", "b", "tok", "世界", "é", "Z9", "longtok", "a")
    val seps = IndexedSeq(" ", "  ", "\t", " \n ")
    val texts = Seq.tabulate(200) { _ =>
      (0 until rnd.nextInt(16)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(seps(rnd.nextInt(seps.length)))
    }
    for (w <- 1 to 4) native(texts, w) shouldBe composed(texts, w)
  }

  test("native shingles dedupe, keep order, and handle short input") {
    native(Seq("a b a b a"), 2) shouldBe Seq(Seq("a b", "b a"))
    native(Seq("one two"), 3) shouldBe Seq(Seq.empty)
  }
}
