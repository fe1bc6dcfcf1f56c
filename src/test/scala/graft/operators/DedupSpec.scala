package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val good = Seq.fill(35)("tok").zipWithIndex
    .map { case (t, i) => s"$t$i" }.mkString(" ") // 35 distinct tokens

  test("exact keeps the lowest id per identical text") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "other"))
      .toDF("doc_id", "text")
    Dedup.exact(docs).select("doc_id").as[Long].collect().sorted shouldBe
      Array(1L, 3L)
  }

  test("dropPairDuplicates removes every greater-side doc") {
    val docs = (1L to 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    Dedup.dropPairDuplicates(docs, pairs)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 4L)
  }

  test("qualityFilter drops short and stopword-heavy docs") {
    val stopSoup = (Seq.fill(20)("the") ++ Seq.fill(15)("a")).mkString(" ")
    val docs = Seq((1L, good), (2L, "too short"), (3L, stopSoup))
      .toDF("doc_id", "text")
    Dedup.qualityFilter(docs).select("doc_id").as[Long].collect() shouldBe
      Array(1L)
  }

  test("cleanCorpus composes quality, exact, and near-dup stages") {
    val docs = Seq(
      (1L, good), (2L, good), // exact dups, keep 1
      (3L, good + " extra"), // near-dup of 1 via supplied pairs
      (4L, "short"), // quality-dropped
      (5L, good + " unique tail here")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L)).toDF("doc_a", "doc_b")
    Dedup.cleanCorpus(docs, pairs)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 5L)
  }
}
