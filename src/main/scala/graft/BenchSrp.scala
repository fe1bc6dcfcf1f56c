package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SRP pre-filter growth probe — the production-path measurement for
  * T140 (the q161 census is the oracle-replicated fidelity table;
  * this measures the sketch DOING ITS JOB): for Hamming cuts h, the
  * candidate fraction the 32-bit sketch admits and the recall@k those
  * candidates retain against the exact cosine top-k, plus wall time
  * of the full-float brute pass vs the sketch-gated pass over the
  * same query sample. The 100 TB claim under test: xor+popcount on a
  * 4-byte column prunes the float scan to a small candidate slice at
  * near-total recall, with the cut chosen FROM q161's band census.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.BenchSrp [k] [nq]"
  */
object BenchSrp {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(5)
    val nq = if (args.length > 1) args(1).toInt else 64
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
    import spark.implicits._
    import graft.operators.{Similarity, Srp}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val v = emb
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", Similarity.norm(col("e")))
      .withColumn("sketch", Srp.sketch(col("e")))
      .persist()
    val n = v.count()
    val q = v.orderBy("vec_id").limit(nq)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qn"), col("sketch").as("qs"))
    val cosc = Similarity.dot(col("qe"), col("e")) / (col("qn") * col("nrm"))

    def topk(scored: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= k)
        .select("qid", "vec_id")
    }

    // Exact reference: full-float brute pass.
    val t0 = System.nanoTime()
    val truth = topk(broadcast(q).join(v, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), cosc.as("cos")))
      .as[(Long, Long)].collect().toSet
    val bruteSec = (System.nanoTime() - t0) / 1e9
    println(f"[benchsrp] n=$n%d nq=$nq%d k=$k%d brute=$bruteSec%.2f s")

    for (h <- Seq(6, 10, 14)) {
      val t1 = System.nanoTime()
      val cands = broadcast(q).join(v, col("vec_id") =!= col("qid"))
        .filter(bit_count(col("qs").bitwiseXOR(col("sketch"))) <= h)
      val nCand = cands.count()
      val approx = topk(cands.select(col("qid"), col("vec_id"),
          cosc.as("cos")))
        .as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t1) / 1e9
      val recall = (approx & truth).size.toDouble / truth.size
      val frac = nCand.toDouble / (nq.toLong * (n - 1))
      println(f"[benchsrp] h=$h%d cand_frac=$frac%.4f " +
        f"recall_at_$k%d=$recall%.3f t=$sec%.2f s")
    }
    v.unpersist()
    spark.stop()
  }
}
