package graft

import org.apache.spark.sql.SparkSession

/** Count-only profiling harness for output-bound queries: run one
  * registered query N times but materialize only `count()` instead of
  * the noop sink. Catalyst's EliminateSorts drops the query's final
  * ORDER BY under the aggregate, so this isolates the COMPUTE cost of
  * a query whose full-output contract (e.g. q30's within-group pair
  * expansion on replica-scaled data) is itself the dominant cost.
  * Reading convention: BenchOne measures the contract, BenchCount the
  * compute; a growth exponent that is linear in BenchCount but
  * superlinear in BenchOne is output volume, not plan shape. Usage:
  *
  *   sbt "runMain graft.BenchCount q30_jaccard_pairs [runs]"
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as for Bench.
  */
object BenchCount {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchCount <query> [runs]"))
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    val d = SparkEntry.allDefs.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = d.build(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[benchcount] $name run $i: $dt%.3f s rows=$n")
    }
    spark.stop()
  }
}
