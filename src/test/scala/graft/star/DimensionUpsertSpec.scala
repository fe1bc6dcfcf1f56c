package graft.star

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DimensionUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: (Long, String, String)*): DataFrame =
    rows.toDF("sk", "name", "attr")

  test("upsert appends only new natural keys, SKs continue from max") {
    val existing = dim((1L, "a", "x"), (2L, "b", "y"))
    val incoming = Seq(("b", "CHANGED"), ("c", "z"), ("d", "w"))
      .toDF("name", "attr")
    val got = DimensionUpsert.upsert(existing, incoming, Seq("name"), "sk")
      .orderBy("sk").as[(Long, String, String)].collect()
    got shouldBe Array(
      (1L, "a", "x"),
      (2L, "b", "y"), // existing attributes never updated (SCD-0)
      (3L, "c", "z"),
      (4L, "d", "w"))
  }

  test("upsert is idempotent: upsert(upsert(D,x),x) == upsert(D,x)") {
    val existing = dim((1L, "a", "x"))
    val incoming = Seq(("a", "x2"), ("b", "y"), ("b", "y")).toDF("name", "attr")
    val once = DimensionUpsert.upsert(existing, incoming, Seq("name"), "sk")
    val twice = DimensionUpsert.upsert(once, incoming, Seq("name"), "sk")
    once.exceptAll(twice).count() shouldBe 0
    twice.exceptAll(once).count() shouldBe 0
  }

  test("upsert bootstraps from an empty existing dim with SKs from 1") {
    val existing = dim().filter(lit(false))
    val incoming = Seq(("b", "y"), ("a", "x")).toDF("name", "attr")
    val got = DimensionUpsert.upsert(existing, incoming, Seq("name"), "sk")
      .orderBy("sk").as[(Long, String, String)].collect()
    got shouldBe Array((1L, "a", "x"), (2L, "b", "y"))
  }

  test("upsert picks attributes deterministically when incoming has duplicate keys") {
    val existing = dim()
    val incoming = Seq(("a", "z"), ("a", "b"), ("a", "m")).toDF("name", "attr")
    val got = DimensionUpsert.upsert(existing, incoming, Seq("name"), "sk")
      .as[(Long, String, String)].collect()
    got shouldBe Array((1L, "a", "b")) // min over attribute tuple
  }

  test("upsert drops incoming rows with null natural keys") {
    val existing = dim((1L, "a", "x"))
    val incoming = Seq((null, "n"), ("b", "y")).toDF("name", "attr")
    val got = DimensionUpsert.upsert(existing, incoming, Seq("name"), "sk")
      .orderBy("sk").as[(Long, String, String)].collect()
    got shouldBe Array((1L, "a", "x"), (2L, "b", "y"))
  }
}
