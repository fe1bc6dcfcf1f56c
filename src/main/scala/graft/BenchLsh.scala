package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LSH banding-sizing probe: measures what the [[graft.operators
  * .LshPlanner]]-sized banding buys over the oracle-pinned (16, 4, 4)
  * split as near-dup density grows — candidate-pair volume, raw bucket
  * pair volume, verify-join cost, precision at the target threshold,
  * and recall against an exhaustive reference.
  *
  * Corpus: the seed documents replicated R× with DETERMINISTIC token
  * drift — replica r rewrites token positions p with (p mod 97) < r to
  * a position-keyed filler, so replicas r and s differ in exactly
  * |r − s| of every 97 token positions. Pairwise shingle-Jaccard
  * within a family then decays with |r − s|: adjacent replicas sit
  * near J ≈ 0.94, distant ones fall through the band-curve floor.
  * That makes the two bandings diverge the way the S-curve math says
  * they must: the pinned split's inflection (1/4)^(1/4) ≈ 0.707
  * admits most of each family's C(R,2) pairs (quadratic in R), while
  * a planner split targeting J ≥ 0.9 admits only the near-adjacent
  * ones (≈ linear in R) — same corpus, same signatures, same verify
  * kernel. No RNG anywhere: the drift is a pure function of
  * (position, replica).
  *
  * Ground truth for recall: families are known by construction, so
  * the exhaustive reference verifies ALL C(R,2) within-family pairs
  * (families × C(R,2) pairs — bounded) plus every cross-family
  * candidate either banding surfaced, with the same Jaccard kernel.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.BenchLsh [threshold] [replicasCsv] [fnWeight]"
  */
object BenchLsh {

  private val Stride = 10000000L
  private val DriftPeriod = 97

  def main(args: Array[String]): Unit = {
    val threshold = args.headOption.map(_.toDouble).getOrElse(0.9)
    val replicaSets = (if (args.length > 1) args(1) else "3,10")
      .split(",").map(_.trim.toInt).toSeq
    // fnWeight 2: the LshPlanner scaladoc's production stance — the
    // verify join retests candidates anyway, so FPs cost only work
    // while FNs cost recall; at weight 1 the optimizer happily takes
    // the b=1 corner (inflection 1.0) and forfeits recall.
    val fnWeight = if (args.length > 2) args(2).toDouble else 2.0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{LshPlanner, MinHashLsh}

    val planned = LshPlanner.plan(16, threshold, fnWeight)
    val configs = Seq(
      ("pinned", 4, 4),
      ("planner", planned.bands, planned.rowsPerBand))
    val rows = for (reps <- replicaSets; (cname, b, r) <- configs) yield {
      val corpus = CacheRegistry.persistTracked(
        drifted(Tables.documents(spark, sfDir), reps),
        CacheRegistry.DataSized)
      try {
        val nDocs = corpus.count()
        val volume = MinHashLsh.bucketPairVolume(corpus, 16, b, r)
        val t0 = System.nanoTime()
        val cand = CacheRegistry.persistTracked(
          MinHashLsh.candidatePairs(corpus, 16, b, r),
          CacheRegistry.DataSized)
        try {
          val nCand = cand.count()
          val candSec = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val nAccepted = verified(corpus, cand, threshold).count()
          val verifySec = (System.nanoTime() - t1) / 1e9
          // Exhaustive reference: all within-family pairs + this
          // banding's own cross-family candidates, deduped.
          val truth = trueAccepted(corpus, cand, reps, threshold).count()
          f"""{"replicas":$reps,"config":"$cname","bands":$b,""" +
            f""""rows_per_band":$r,"n_docs":$nDocs,""" +
            f""""bucket_pair_volume":$volume,"n_candidates":$nCand,""" +
            f""""cand_sec":$candSec%.2f,"verify_sec":$verifySec%.2f,""" +
            f""""n_accepted":$nAccepted,""" +
            f""""precision":${if (nCand == 0) 0.0 else nAccepted.toDouble / nCand}%.4f,""" +
            f""""recall":${if (truth == 0) 1.0 else nAccepted.toDouble / truth}%.4f}"""
        } finally cand.unpersist(blocking = false)
      } finally corpus.unpersist(blocking = false)
    }
    println(s"""{"metric":"lsh_sizing","sf_dir":"$sfDir",""" +
      s""""threshold":$threshold,"planner_bands":${planned.bands},""" +
      s""""planner_rows":${planned.rowsPerBand},""" +
      s""""planner_inflection":${planned.inflection},""" +
      s""""rows":[${rows.mkString(",")}]}""")
    CacheRegistry.drain()
    spark.stop()
  }

  /** Seed docs replicated `reps`× with the deterministic token drift.
    * Replica 0 is the unmodified original; replica r rewrites token
    * positions p with (p mod 97) < r, and the filler is keyed by the
    * position ONLY, so replicas r < s share the rewrites in
    * [0, r) and differ in exactly [r, s) — |r − s| per 97 tokens. */
  private def drifted(docs: DataFrame, reps: Int): DataFrame =
    docs.select(col("doc_id"), trim(col("text")).as("text"))
      .crossJoin(broadcast(
        docs.sparkSession.range(reps.toLong).select(col("id").as("rep"))))
      .select(
        (col("doc_id") + col("rep") * Stride).as("doc_id"),
        concat_ws(" ", expr(
          s"""transform(
             |  filter(split(text, '\\\\s+'), t -> t != ''),
             |  (t, p) -> CASE WHEN p % $DriftPeriod < rep
             |            THEN concat('zdrift', p % $DriftPeriod)
             |            ELSE t END)""".stripMargin)).as("text"))

  /** 3-shingle sets per doc (the signature's own unit), for the exact
    * Jaccard verify kernel. */
  private def shingleSets(corpus: DataFrame): DataFrame =
    graft.operators.MinHashLsh.shingles(corpus)
      .groupBy("doc_id").agg(collect_set(col("tok")).as("sh"))

  /** Candidates with exact shingle-Jaccard ≥ t. */
  private def verified(corpus: DataFrame, pairs: DataFrame,
      t: Double): DataFrame = {
    val sets = shingleSets(corpus)
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .withColumn("j", size(array_intersect(col("sa"), col("sb"))).cast("double")
        / size(array_union(col("sa"), col("sb"))))
      .filter(col("j") >= t)
      .select("doc_a", "doc_b")
  }

  /** Exhaustive reference accepted set: every within-family pair
    * (family = same doc_id mod Stride) plus this banding's
    * cross-family candidates, verified with the same kernel. */
  private def trueAccepted(corpus: DataFrame, cand: DataFrame, reps: Int,
      t: Double): DataFrame = {
    val ids = corpus.select(col("doc_id"))
      .withColumn("fam", pmod(col("doc_id"), lit(Stride)))
    val famPairs = ids.as("a").join(ids.as("b"),
        col("a.fam") === col("b.fam") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    verified(corpus, famPairs.union(cand).distinct(), t)
  }
}
