package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.{functions => gf}

/** Aho–Corasick phrase scan: parity with the composed per-phrase
  * Contains chain, overlap/nesting, UTF-8 multibyte safety, null and
  * analysis-time edge handling. */
class PhraseScanSpec extends SparkSpec {
  import spark.implicits._

  test("matches exactly the per-phrase contains() reference on fuzzed rows") {
    val phrases = Seq("ab", "abc", "bc", "cab", "xyz", "aa")
    // All strings over {a, b, c, x} up to length 6 via a deterministic walk.
    val alphabet = "abcx"
    val rows = (0 until 500).map { i =>
      val len = i % 7
      new String(Array.tabulate(len)(k => alphabet(((i * 31 + k * 7) % 4))))
    }
    val got = rows.toDF("t")
      .select(col("t"), gf.phraseScan(col("t"), phrases).as("hits"))
      .as[(String, Seq[Int])].collect()
    got.foreach { case (t, hits) =>
      val ref = phrases.zipWithIndex.collect {
        case (p, i) if t.contains(p) => i
      }
      withClue(s"text='$t': ") { hits shouldBe ref }
    }
  }

  test("overlapping and nested phrases all report") {
    val phrases = Seq("ab", "abc", "bc", "bcd")
    Seq("xabcdx").toDF("t")
      .select(gf.phraseScan(col("t"), phrases))
      .as[Seq[Int]].collect()(0) shouldBe Seq(0, 1, 2, 3)
  }

  test("multibyte UTF-8 phrases match byte-exactly") {
    val phrases = Seq("café", "él", "plain")
    Seq("un café élégant", "cafe plain")
      .toDF("t")
      .select(gf.phraseScan(col("t"), phrases))
      .as[Seq[Int]].collect() shouldBe Array(Seq(0, 1), Seq(2))
  }

  test("no match yields an empty array; null text yields null") {
    val df = Seq(Some("nothing here"), None).toDF("t")
      .select(gf.phraseScan(col("t"), Seq("absent")).as("h"))
    val rows = df.collect()
    rows(0).getSeq[Int](0) shouldBe Seq.empty
    rows(1).isNullAt(0) shouldBe true
  }

  test("empty and duplicate phrase lists are rejected at analysis") {
    val df = Seq("x").toDF("t")
    intercept[Exception] {
      df.select(gf.phraseScan(col("t"), Seq("a", "a"))).collect()
    }
    intercept[Exception] {
      df.select(gf.phraseScan(col("t"), Seq(""))).collect()
    }
  }

  test("scan result is identical under repartitioning and codegen") {
    val phrases = Seq("customer order", "hash join", "absent phrase")
    val docs = Seq(
      "the customer order stream", "hash join then sort merge",
      "customer handles the order elsewhere").toDF("t")
    val a = docs.select(gf.phraseScan(col("t"), phrases))
      .as[Seq[Int]].collect()
    val b = docs.repartition(3).select(gf.phraseScan(col("t"), phrases))
      .as[Seq[Int]].collect().toSet
    a.toSet shouldBe b
    a shouldBe Array(Seq(0), Seq(1), Seq.empty)
  }
}
