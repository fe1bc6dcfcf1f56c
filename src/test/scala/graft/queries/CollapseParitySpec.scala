package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RAW-vs-COLLAPSED parity on a DUP-HEAVY corpus.
  *
  * The driver's test data has ZERO duplicate texts/vectors at the
  * oracle scales (sf0.001/sf0.01), so the correctness gate never
  * exercises the within-group clique / member-expansion paths of the
  * distinct-content collapses (lshPairs, textDupComponents,
  * lshLoserDocs, the q89 source-histogram census, embPairs). The
  * dup-heavy scale corpus (sf10x) has no oracle. This spec closes the
  * hole: a synthetic corpus where every text/vector is replicated with
  * INTERLEAVED ids across sources, each collapsed query compared
  * row-for-row against the raw pre-collapse algorithm spelled over raw
  * rows (fine at test scale).
  */
class CollapseParitySpec extends SparkSpec {
  import spark.implicits._

  /** Dup-heavy documents: 12 distinct quality texts (40+ tokens, low
    * stopword density, pairwise near-dup structure via shared token
    * runs) × 5 replicas each, ids interleaved (id i carries content
    * i mod 12), plus 3 short low-quality singletons. Sources rotate
    * so dup groups SPAN sources (exercises q89's cross-source
    * multinomials). */
  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("collapse_parity")
      .toString
    val shared = (1 to 20).map(i => s"run$i").mkString(" ") // 20-token run
    val texts = (0 until 12).map { g =>
      val unique = (1 to 22).map(i => s"g${g}w$i").mkString(" ")
      if (g % 3 == 0) s"$shared $unique" // near-dup family via the run
      else s"$unique x$g y$g z$g"
    }
    val rows = (0 until 60).map { i =>
      val g = i % 12
      // replica-indexed source so dup GROUPS span sources (i % 3
      // would pin each group to one source: 12 ≡ 0 mod 3)
      (i.toLong, texts(g), "en", s"src${(i / 12) % 3}",
        texts(g).length.toLong)
    } ++ Seq(
      (100L, "tiny one", "en", "src0", 8L),
      (101L, "the a the a the a", "en", "src1", 17L),
      (102L, "another short", "en", "src2", 13L),
      // DUPLICATED short texts (< 3 tokens ⇒ no shingles ⇒ no minhash
      // signature ⇒ the raw banding join emits NOTHING for them). The
      // within-group collapse paths must not fabricate cliques/losers/
      // components for these dup groups — the r13-advice parity hole.
      // Sources span so the q89 multinomial path would fire if ungated.
      (110L, "dup two", "en", "src0", 7L),
      (111L, "dup two", "en", "src1", 7L),
      (112L, "dup two", "en", "src2", 7L),
      (120L, "", "en", "src0", 0L),
      (121L, "", "en", "src1", 0L),
      (130L, "solo", "en", "src0", 4L),
      (131L, "solo", "en", "src2", 4L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    // Dup-heavy embeddings: 10 distinct well-separated vectors × 6
    // replicas, interleaved ids, labels rotating so content groups
    // span labels.
    val base = (0 until 10).map { g =>
      val arr = Array.fill(8)(0.05f)
      arr((g % 4) * 2) = 1.0f + (g / 4) * 0.02f
      arr((g % 4) * 2 + 1) = 0.5f
      arr.toSeq
    }
    (0 until 60).map { i =>
      (i.toLong, base(i % 10), s"lab${i % 2}")
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private def build(name: String) =
    graft.SparkEntry.allDefs.find(_.name == name).get.build(spark, dir)

  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val rawPairs = graft.operators.MinHashLsh
    .candidatePairs(docs, 16, 4, 4)

  test("q28 collapsed pair expansion ≡ raw banding over raw rows") {
    val got = build("q28_minhash_lsh")
      .as[(Long, Long)].collect().toSet
    val want = rawPairs.as[(Long, Long)].collect().toSet
    got shouldBe want
    // the dup structure actually fired: within-group cliques exist
    want.size should be >= 12 * (5 * 4 / 2)
    // duplicated SHORT texts (ids ≥ 110, < 3 tokens) never band in the
    // raw algorithm — the collapse must not fabricate their cliques
    want.exists(p => p._1 >= 110L || p._2 >= 110L) shouldBe false
  }

  test("q64/q102 group-level CC ≡ CC over the raw pair list") {
    val gotComp = build("q64_neardup_clusters")
      .as[(Long, Long)].collect().toSet
    val wantComp = graft.operators.Dedup.connectedComponents(rawPairs)
      .as[(Long, Long)].collect().toSet
    gotComp shouldBe wantComp

    val gotReps = build("q102_cluster_reps")
      .select("doc_id", "component_id", "rep_id", "is_rep")
      .as[(Long, Long, Long, Long)].collect().toSet
    // raw reference: the pre-collapse q102 algorithm
    val comps = graft.operators.Dedup.connectedComponents(rawPairs)
    val full = docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.functions.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component_id"), col("doc_id")).as("component_id"),
        col("n_tokens"))
    val rep = full.groupBy("component_id")
      .agg(max(struct(col("n_tokens"), (-col("doc_id")).as("negd"))).as("b"))
      .select(col("component_id"), (-col("b.negd")).as("rep_id"))
    val wantReps = full.join(rep, Seq("component_id"))
      .select(col("doc_id"), col("component_id"), col("rep_id"),
        (col("doc_id") === col("rep_id")).cast("long").as("is_rep"))
      .as[(Long, Long, Long, Long)].collect().toSet
    gotReps shouldBe wantReps
  }

  test("q181 cluster-size census ≡ census over CC of the raw pair list") {
    val got = build("q181_cluster_size_census")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val comps = graft.operators.Dedup.connectedComponents(rawPairs)
    val toks = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        graft.functions.tokens(col("text"))).cast("long").as("nt"))
    val want = comps.join(toks, "doc_id")
      .groupBy("component_id")
      .agg(count(lit(1)).as("sz"), sum("nt").as("mass"))
      .groupBy(floor(log2(col("sz"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_clusters"), sum("sz").as("n_docs"),
        min("sz").as("min_size"), max("sz").as("max_size"),
        sum("mass").as("token_mass"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    got shouldBe want
    // dup groups of 5 exist → a bucket at floor(log2(5)) = 2 or above
    want.exists(_._1 >= 2) shouldBe true
  }

  test("q89 source-histogram census ≡ raw pair census") {
    val got = build("q89_dup_matrix")
      .as[(String, String, Long)].collect().toSet
    val sa = docs.select(col("doc_id").as("doc_a"), col("source").as("sa"))
    val sb = docs.select(col("doc_id").as("doc_b"), col("source").as("sb"))
    val want = rawPairs.join(sa, "doc_a").join(sb, "doc_b")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .as[(String, String, Long)].collect().toSet
    got shouldBe want
    // cross-source dup pairs exist (the multinomial path fired)
    want.exists(r => r._1 != r._2) shouldBe true
  }

  test("q87 incremental-dedup collapse ≡ raw asymmetric banding over raw rows") {
    // Raw reference: banded candidates in either orientation with the
    // earlier side NEW (10% doc_id-hash flag) and the later side OLD,
    // verified by exact 3-shingle jaccard over canonical sorted sets —
    // the pre-collapse q87 algorithm spelled over raw rows.
    val flags = docs.select(col("doc_id"),
      (graft.functions.stableHash(col("doc_id").cast("string")) % 10000
        < 1000).as("nu"))
    val both = rawPairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(rawPairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val cand = both
      .join(flags.select(col("doc_id").as("u"), col("nu")), "u")
      .join(flags.select(col("doc_id").as("v"), col("nu").as("nv")), "v")
      .filter(col("nu") && !col("nv"))
      .select(col("u").as("doc_new"), col("v").as("doc_old"))
    val toks = docs.select(col("doc_id"),
      org.apache.spark.sql.graft.CatalystBridge.column(
        graft.plans.ShingleTokens(
          org.apache.spark.sql.graft.CatalystBridge.expr(trim(col("text"))),
          3, dedupe = true, sorted = true)).as("toks"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
    val inter = org.apache.spark.sql.graft.CatalystBridge.column(
      graft.plans.SortedIntersectSize(
        org.apache.spark.sql.graft.CatalystBridge.expr(col("ta")),
        org.apache.spark.sql.graft.CatalystBridge.expr(col("tb"))))
    val want = cand
      .join(toks.select(col("doc_id").as("doc_new"), col("toks").as("ta"),
        col("n").as("na")), "doc_new")
      .join(toks.select(col("doc_id").as("doc_old"), col("toks").as("tb"),
        col("n").as("nb")), "doc_old")
      .select(col("doc_new"), col("doc_old"),
        graft.functions.roundz(
          inter.cast("double") / (col("na") + col("nb") - inter), 4)
          .as("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val got = build("q87_incremental_dedup")
      .as[(Long, Long, Double)].collect().toSet
    got shouldBe want
    // the collapse's clique path fired: within-group new×old pairs
    // surface at jaccard exactly 1.0
    want.exists(_._3 == 1.0) shouldBe true
    // and duplicated SHORT texts (ids ≥ 110, no shingle signature)
    // never produce candidates in either algorithm
    want.exists(p => p._1 >= 110L || p._2 >= 110L) shouldBe false
  }

  test("q50/q100 group-level loser set ≡ cleanCorpus over the raw pair list") {
    val gotClean = build("q50_clean_corpus").as[Long].collect().toSet
    val wantClean = graft.operators.Dedup
      .cleanCorpus(docs, rawPairs)
      .select("doc_id").as[Long].collect().toSet
    gotClean shouldBe wantClean

    val gotSavings = build("q100_clean_savings")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val survivors = graft.operators.Dedup.cleanCorpus(docs, rawPairs)
      .select(col("doc_id").as("s_id"))
    val wantSavings = docs
      .join(survivors, col("doc_id") === col("s_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s_id").isNotNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("s_id").isNotNull, col("n_chars")).otherwise(0L))
          .as("bytes_kept"),
        sum(when(col("s_id").isNull, col("n_chars")).otherwise(0L))
          .as("bytes_dropped"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    gotSavings shouldBe wantSavings
  }

  test("q184 estimator-calibration census ≡ raw-pair census") {
    // Raw reference: per RAW banded pair, signature-agreement estimate
    // (16 slots) vs exact 3-shingle jaccard, micro-long quantized and
    // censused by error decile — the pre-collapse algorithm.
    val nH = 16
    val sig = graft.operators.MinHashLsh.signatures(docs, nH)
    val sa = sig.select(col("doc_id").as("doc_a") +:
      (0 until nH).map(i => col(s"mh$i").as(s"a_mh$i")): _*)
    val sb = sig.select(col("doc_id").as("doc_b") +:
      (0 until nH).map(i => col(s"mh$i").as(s"b_mh$i")): _*)
    val agree = (0 until nH)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    val toks = docs.select(col("doc_id"),
      org.apache.spark.sql.graft.CatalystBridge.column(
        graft.plans.ShingleTokens(
          org.apache.spark.sql.graft.CatalystBridge.expr(trim(col("text"))),
          3, dedupe = true, sorted = true)).as("toks"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
    val inter = org.apache.spark.sql.graft.CatalystBridge.column(
      graft.plans.SortedIntersectSize(
        org.apache.spark.sql.graft.CatalystBridge.expr(col("ta")),
        org.apache.spark.sql.graft.CatalystBridge.expr(col("tb"))))
    val est = agree / lit(16.0)
    val jac = inter.cast("double") / (col("na") + col("nb") - inter)
    val want = rawPairs
      .join(sa, "doc_a").join(sb, "doc_b")
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
        col("n").as("na")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("tb"),
        col("n").as("nb")), "doc_b")
      .select(floor(abs(est - jac) * lit(10.0)).cast("long").as("err_band"),
        floor(est * lit(1000000000.0) + 0.5).cast("long").as("estq"),
        floor(jac * lit(1000000000.0) + 0.5).cast("long").as("jq"))
      .groupBy("err_band")
      .agg(count(lit(1)).as("n_pairs"),
        graft.functions.roundz(sum("estq").cast("double")
          / count(lit(1)) / lit(1000000000.0), 9).as("mean_est"),
        graft.functions.roundz(sum("jq").cast("double")
          / count(lit(1)) / lit(1000000000.0), 9).as("mean_jaccard"))
      .as[(Long, Long, Double, Double)].collect().toSet
    val got = build("q184_minhash_calibration")
      .as[(Long, Long, Double, Double)].collect().toSet
    got shouldBe want
    // the dup cliques fired: the zero-error band carries them
    want.find(_._1 == 0L).get._2 should be >= (12L * 5 * 4 / 2)
  }

  test("q47/q66 embedding collapse ≡ raw in-bucket pair stream") {
    import graft.operators.{Dedup, Similarity}
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = Similarity.sharedIvfIndex(emb, dir)
    val assigned = spark.table(idx.assignedTable)
    val b = assigned.select(col("vec_id").as("b_vec_id"),
      col("e").as("b_e"), col("nrm").as("b_nrm"), col("bucket"))
    val cosE = Similarity.dot(col("e"), col("b_e")) /
      (col("nrm") * col("b_nrm"))
    val rawEmbPairs = assigned.join(b, Seq("bucket"))
      .filter(col("vec_id") < col("b_vec_id") && cosE >= 0.42)
      .select(col("vec_id").as("vec_a"), col("b_vec_id").as("vec_b"),
        graft.functions.roundz(cosE, 6).as("cos"))
    val gotPairs = build("q47_embedding_neardup")
      .as[(Long, Long, Double)].collect().toSet
    val wantPairs = rawEmbPairs
      .as[(Long, Long, Double)].collect().toSet
    gotPairs shouldBe wantPairs
    wantPairs.size should be >= 10 * (6 * 5 / 2) // within-group cliques fired

    val gotCc = build("q66_semantic_dedup")
      .as[(Long, Long)].collect().toSet
    val wantCc = Dedup.connectedComponents(
        rawEmbPairs, aCol = "vec_a", bCol = "vec_b", idCol = "vec_id")
      .as[(Long, Long)].collect().toSet
    gotCc shouldBe wantCc
  }
}
