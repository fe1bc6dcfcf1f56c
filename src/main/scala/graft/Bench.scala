package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are fully
  * materialized through the `noop` sink (not `.count()`, which would
  * let Catalyst prune most of each query away).
  */
object Bench {
  def main(args: Array[String]): Unit = {
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
    // JVM/codegen warm-up outside the timed loop — otherwise the first
    // query pays classloading + JIT for the whole session.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    val results = SparkEntry.allDefs.map { d =>
      val t0 = System.nanoTime()
      try d.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${d.name} failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop caches/persists a query left behind (SK two-pass, star
      // builds): later queries must not inherit its memory pressure.
      spark.catalog.clearCache()
      d.name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
