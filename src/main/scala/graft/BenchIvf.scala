package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF index-sizing growth probe (round-8 verdict #2): build the index
  * at the PRODUCTION sizing rule nlist ≈ √N for the given sf dir and
  * report bucket occupancy, probe-side candidate volume, build/probe
  * wall time, and recall@10 against the brute-force oracle on a fixed
  * 16-query set. Reading convention: per-bucket size should grow as
  * √N (not N, the pinned-nlist oracle shape), probe candidates as
  * nprobe·√N, and recall should hold within noise of the smaller
  * scale. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1x sbt "runMain graft.BenchIvf"
  */
object BenchIvf {
  def main(args: Array[String]): Unit = {
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
    val k = 10
    val nprobe = 4
    val queries = emb.orderBy("vec_id").limit(16)

    val t0 = System.nanoTime()
    val idx = Similarity.buildIndex(emb, "benchivf",
      nCentroids = nlist, trainN = Similarity.sizingTrainN(nlist))
    val buildSec = (System.nanoTime() - t0) / 1e9

    val sizes = spark.table(idx.assignedTable)
      .groupBy("bucket").count().select("count").as[Long].collect()
    val meanBucket = n.toDouble / sizes.length

    val t1 = System.nanoTime()
    val approx = Similarity
      .ivfTopK(idx, queries, k, nprobe, "vec_id", "embedding")
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val probeSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val exact = Similarity.bruteForceTopK(emb, queries, k)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val bruteSec = (System.nanoTime() - t2) / 1e9
    val recall = (approx intersect exact).size.toDouble / exact.size

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(s"""{"metric":"ivf_sizing","n":$n,"nlist":$nlist,""" +
      s""""buckets":${sizes.length},"mean_bucket":${fmt(meanBucket)},""" +
      s""""max_bucket":${sizes.max},"nprobe":$nprobe,""" +
      s""""build_sec":${fmt(buildSec)},"probe_sec":${fmt(probeSec)},""" +
      s""""brute_sec":${fmt(bruteSec)},"recall_at_$k":${fmt(recall)},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
