package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import graft.{SparkEntry, SparkSpec}

/** The round-3 text operators against crafted corpora (the DuckDB
  * oracle checks them on the synthetic tables; these specs pin the
  * SEMANTICS on inputs where the expected answer is computable by
  * hand or brute force). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).getOrElse(fail(s"missing $name"))

  /** Stage a documents.parquet under a temp dir so the q-defs (which
    * read `$dir/documents.parquet`) run on crafted docs. */
  private def stage(docs: Seq[(Long, String)]): String =
    stageWithSource(docs.map { case (id, t) => (id, t, "test") })

  private def stageWithSource(docs: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("textops").toString
    docs.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q59: band-LSH candidate generation finds EVERY pair within Hamming<=2 (pigeonhole)") {
    // Word-soup docs with overlapping token sets → clustered simhashes.
    val docs = (0L until 40L).map { i =>
      val toks = (0 until 12).map(j => s"w${(i + j) % 15}")
      (i, toks.mkString(" "))
    }
    val dir = stage(docs)
    // Brute-force ground truth from the q29 fingerprints.
    val fp = q("q29_simhash").build(spark, dir)
      .as[(Long, Long)].collect().toSeq
    val expected = (for {
      (a, sa) <- fp; (b, sb) <- fp if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 2
    } yield h).groupBy(identity).map { case (h, v) => (h, v.size.toLong) }
    val got = q("q59_simhash_neardup").build(spark, dir)
      .as[(Int, Long)].collect().map { case (h, n) => (h, n) }.toMap
    got.map { case (h, n) => (h.toLong, n) } shouldBe
      expected.map { case (h, n) => (h.toLong, n) }
    got.values.sum should be > 0L // the property is non-vacuous
  }

  test("q60: repetition fractions match hand computation; keep flag thresholds") {
    val dir = stage(Seq(
      (1L, "a a a a a"),        // 2-grams: 4x "a a" → dup2 = 0.75
      (2L, "a b c d e"),        // all n-grams unique → dup2 = dup3 = 0
      (3L, "x y")))             // < 3 tokens → filtered out
    val got = q("q60_repetition_filter").build(spark, dir)
      .as[(Long, Double, Double, Boolean)].collect()
    got shouldBe Array(
      (1L, 0.75, 0.666667, false), // 3-grams: 3x "a a a" → round(1 - 1/3, 6)
      (2L, 0.0, 0.0, true))
  }

  test("q62: decontamination flags exactly the corpus docs sharing a 5-gram with the benchmark") {
    val dir = stageWithSource(Seq(
      (100L, "w1 w2 w3 w4 w5 w6", "src0"),      // the benchmark doc
      (1L, "x w1 w2 w3 w4 w5 y", "src1"),       // shares "w1..w5"
      (2L, "w2 w3 w4 w5 w6 z", "src2"),         // shares "w2..w6"
      (3L, "a b c d e f g", "src1"),            // clean
      (4L, "w1 w2 w3 w4 q w5 w6", "src2")))     // 4-token overlap only → clean
    val got = q("q62_decontaminate").build(spark, dir)
      .as[(Long, Long)].collect()
    got shouldBe Array((1L, 1L), (2L, 1L))
  }

  test("q61: OOV rate is the fraction of tokens outside the top-10-df vocabulary") {
    // 12 distinct terms; t0..t9 appear in more docs than u1/u2, so the
    // head vocabulary is exactly t0..t9.
    val common = (0 until 10).map(i => s"t$i").mkString(" ")
    val docs = (1L to 5L).map(i => (i, common)) :+
      (6L, s"$common u1 u2") // 12 tokens, 2 OOV → 1/6
    val dir = stage(docs)
    val got = q("q61_oov_rate").build(spark, dir)
      .as[(Long, Double)].collect().toMap
    (1L to 5L).foreach(i => got(i) shouldBe 0.0)
    got(6L) shouldBe (BigDecimal(1.0 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q125: exact-dup LSH pairs land in the 'exact' band with the full pair count") {
    // Three byte-identical docs (guaranteed LSH collision — identical
    // minhash signatures) → C(3,2)=3 candidate pairs at edit distance
    // 0; the two distinct long docs share no shingles with them.
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = stage(Seq(
      (1L, same), (2L, same), (3L, same),
      (4L, "one two three four five six seven eight nine ten"),
      (5L, "red green blue cyan magenta yellow black white gray pink")))
    val got = q("q125_fuzzy_dedup").build(spark, dir)
      .select("band", "pairs", "min_d", "max_d")
      .as[(String, Long, Long, Long)].collect().toSeq
    got.filter(_._1 == "exact") shouldBe Seq(("exact", 3L, 0L, 0L))
  }

  test("q125: duplicated sub-3-token texts contribute NO pairs (no shingles, no signature)") {
    // "foo bar" yields zero 3-shingles → the oracle's LSH pipeline
    // gives it no signature and no candidate pairs; the within-group
    // arithmetic expansion must honor the same gate.
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = stage(Seq(
      (1L, "foo bar"), (2L, "foo bar"),
      (3L, same), (4L, same)))
    val got = q("q125_fuzzy_dedup").build(spark, dir)
      .select("band", "pairs").as[(String, Long)].collect().toMap
    got shouldBe Map("exact" -> 1L) // only the long-doc pair
  }
}
