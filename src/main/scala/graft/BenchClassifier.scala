package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth probe for the hashed-feature logistic quality classifier
  * (T112): featurize + N-iteration training wall time, per-iteration
  * scan cost on the cached feature frame, and one full-corpus scoring
  * pass, at the given sf dir. Reading convention: featurize and score
  * are one-corpus-pass linear; each training iteration re-scans only
  * the cached SKINNY feature frame, so iter_sec should grow ~linearly
  * in rows while staying well under featurize_sec (the point of
  * featurize-once). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1x sbt "runMain graft.BenchClassifier"
  */
object BenchClassifier {
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
    import graft.operators.TextClassifier

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dim = 1 << 14
    val iters = 20

    val t0 = System.nanoTime()
    val feats = CacheRegistry.persistTracked(
      TextClassifier.featurize(docs, (col("lang") === "en").cast("int"),
        "text", dim),
      CacheRegistry.DataSized)
    val n = feats.count() // materializes the cache
    val featSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val model = TextClassifier.train(feats, dim, iters = iters, lr = 2.0)
    val trainSec = (System.nanoTime() - t1) / 1e9
    feats.unpersist(blocking = false)

    val t2 = System.nanoTime()
    val meanScore = TextClassifier.score(docs, model)
      .agg(avg("score")).head().getDouble(0)
    val scoreSec = (System.nanoTime() - t2) / 1e9

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(s"""{"metric":"classifier","n":$n,"dim":$dim,"iters":$iters,""" +
      s""""featurize_sec":${fmt(featSec)},"train_sec":${fmt(trainSec)},""" +
      s""""iter_sec":${fmt(trainSec / iters)},""" +
      s""""score_sec":${fmt(scoreSec)},"mean_score":${fmt(meanScore)},""" +
      s""""loss_first":${fmt(model.lossTrace.head)},""" +
      s""""loss_last":${fmt(model.lossTrace.last)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
