package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** KNN-graph growth probe at the PRODUCTION index sizing (the q114
  * oracle pins nlist=16 so DuckDB can replicate the index exactly —
  * that makes BOTH engines' candidate volume ~N²/nlist, quadratic by
  * construction; the production rule nlist ≈ √N keeps it at
  * nprobe·N^1.5 / N = nprobe·√N per vector). This main measures the
  * all-vectors graph build under sqrtNlist and reports wall time,
  * graph edge count, and recall@k against the brute-force neighbors of
  * a fixed 16-vector sample. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10x sbt "runMain graft.BenchKnn [k] [nprobe]"
  */
object BenchKnn {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(5)
    val nprobe = if (args.length > 1) args(1).toInt else 2
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
    import graft.operators.Similarity

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val nlist = Similarity.sqrtNlist(n)

    val t0 = System.nanoTime()
    // trainN must scale WITH nlist (sizingTrainN = 4·nlist): Lloyd
    // iterations only re-emit centroids the training sample actually
    // hits, so the default 128-vector sample would silently collapse a
    // 447-seed index to ≤128 surviving buckets — measuring a coarser
    // index than the √N sizing this probe exists to characterize.
    val graph = Similarity.knnJoin(emb, k = k, nCentroids = nlist,
      nprobe = nprobe, trainN = Similarity.sizingTrainN(nlist))
    val edges = graph.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    // Recall@k of the approximate graph vs brute force on 16 probes.
    val sample = emb.orderBy("vec_id").limit(16)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cosExpr = {
      val dot = expr(
        "aggregate(zip_with(qe, embedding, (a, b) -> CAST(a AS DOUBLE) * b), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
      val nq = expr(
        "sqrt(aggregate(transform(qe, a -> CAST(a AS DOUBLE) * a), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))")
      val nv = expr(
        "sqrt(aggregate(transform(embedding, a -> CAST(a AS DOUBLE) * a), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))")
      dot / (nq * nv)
    }
    val brute = broadcast(sample).crossJoin(emb)
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosExpr.as("cos"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(desc("cos"), asc("vec_id"))))
      .where(col("r") <= k)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    val approx = graph
      .join(broadcast(sample.select("qid")), Seq("qid"), "left_semi")
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    val recall = (brute intersect approx).size.toDouble / brute.size

    println(f"""{"n":$n,"nlist":$nlist,"nprobe":$nprobe,"k":$k,""" +
      f""""edges":$edges,"build_sec":$buildSec%.2f,""" +
      f""""recall_at_k":$recall%.4f}""")
    spark.stop()
  }
}
