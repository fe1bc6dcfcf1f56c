package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of registered queries into
  * files — the plan-evidence capture for the optimization rounds
  * (`plans/r15/<query>_<suffix>.txt`). One JVM for the whole list.
  *
  * Usage:
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <q1> [q2 ...]"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as for Bench. With AQE
  * on the capture is the pre-execution plan (isFinalPlan=false), the
  * same artifact PERF.md's plan excerpts have always used.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1> [q2 ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
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
    names.foreach { n =>
      val d = SparkEntry.allDefs.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      val df = d.build(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      CacheRegistry.drain()
      spark.catalog.clearCache()
      System.err.println(s"[plandump] wrote ${n}_$suffix.txt")
    }
    spark.stop()
  }
}
