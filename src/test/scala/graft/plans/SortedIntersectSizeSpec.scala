package graft.plans

import org.apache.spark.sql.functions.{size => arrSize, _}
import org.apache.spark.sql.graft.CatalystBridge
import graft.SparkSpec

class SortedIntersectSizeSpec extends SparkSpec {
  import spark.implicits._

  private def sis(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    CatalystBridge.column(
      SortedIntersectSize(CatalystBridge.expr(a), CatalystBridge.expr(b)))

  test("matches arrSize(array_intersect) on sorted-distinct arrays (codegen path)") {
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "z"), Seq("b", "y")),
      (Seq.empty[String], Seq("a")),
      (Seq("aa", "ab", "b"), Seq("ab", "b", "ba")),
      (Seq.empty[String], Seq.empty[String]))
    val df = rows.toDF("a", "b")
      .select(sis($"a", $"b").as("fast"),
        arrSize(array_intersect($"a", $"b")).as("ref"))
    df.collect().foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  test("agrees with array_intersect on arbitrary generated sorted sets") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    val rows = (1 to 300).map { _ =>
      def set() = rnd.shuffle(vocab).take(rnd.nextInt(12)).sorted
      (set(), set())
    }
    val bad = rows.toDF("a", "b")
      .select(sis($"a", $"b").as("fast"),
        arrSize(array_intersect($"a", $"b")).as("ref"))
      .filter($"fast" =!= $"ref").count()
    bad shouldBe 0L
  }

  test("null array yields null") {
    // SQL registration is asserted in GraftExtensionsSpec (this
    // suite's shared session does not load the extensions).
    val df = Seq((Some(Seq("a", "b")), Option.empty[Seq[String]]))
      .toDF("a", "b")
      .select(sis($"a", $"b").as("n"))
    df.collect().head.isNullAt(0) shouldBe true
  }

  test("ShingleTokens(sorted=true) emits UTF8-binary-sorted distinct tokens") {
    val got = Seq("the zebra ate the apple zebra apple").toDF("t")
      .select(CatalystBridge.column(
        ShingleTokens(CatalystBridge.expr(trim($"t")), 1,
          dedupe = true, sorted = true)).as("toks"))
      .as[Seq[String]].collect().head
    got shouldBe Seq("apple", "ate", "the", "zebra")
    // sorted output feeds the two-pointer contract end to end
    val n = Seq(("b c d", "a b d e")).toDF("x", "y")
      .select(sis(
        CatalystBridge.column(ShingleTokens(CatalystBridge.expr($"x"), 1,
          dedupe = true, sorted = true)),
        CatalystBridge.column(ShingleTokens(CatalystBridge.expr($"y"), 1,
          dedupe = true, sorted = true))).as("n"))
      .as[Int].collect().head
    n shouldBe 2 // {b, d}
  }
}
