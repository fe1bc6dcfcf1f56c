package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-pass KLL sketch vs exact multi-pass grouped quantiles — the
  * PERF evidence for `RobustStats.approxQuantilesByKey` (T89): same
  * (event_type, value) grouping as q113/q124's exact paths, timed
  * side by side, plus the max rank-probe deviation so the speed
  * claim carries its accuracy cost. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10x sbt "runMain graft.BenchSketch [runs] [k]"
  */
object BenchSketch {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val k = if (args.length > 1) args(1).toInt else 200
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probes = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")
    val events = Tables.events(spark, sfDir)
    events.groupBy("event_type").count()
      .write.format("noop").mode("overwrite").save() // warm scan
    def time(label: String)(f: => Unit): Double = {
      val samples = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchsketch] $label run $i: $dt%.3f s")
        dt
      }
      samples.min
    }
    val tExact = time("exact quantilesByKey") {
      graft.operators.RobustStats
        .quantilesByKey(events, "event_type", "value", probes)
        .write.format("noop").mode("overwrite").save()
    }
    val tSketch = time(s"approxQuantilesByKey k=$k") {
      graft.operators.RobustStats
        .approxQuantilesByKey(events, "event_type", "value", probes, k)
        .write.format("noop").mode("overwrite").save()
    }
    // Accuracy: worst per-key per-probe rank deviation, measured
    // against the exact answers via a rank lookup on the value column.
    val exact = graft.operators.RobustStats
      .quantilesByKey(events, "event_type", "value", probes)
      .collect().map(r => r.getString(0) ->
        probes.indices.map(i => r.getDouble(i + 1))).toMap
    val approx = graft.operators.RobustStats
      .approxQuantilesByKey(events, "event_type", "value", probes, k)
      .collect().map(r => r.getString(0) ->
        probes.indices.map(i => r.getDouble(i + 1))).toMap
    val ranks = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val worst = exact.keys.flatMap { g =>
      probes.indices.map { i =>
        val lo = math.min(exact(g)(i), approx(g)(i))
        val hi = math.max(exact(g)(i), approx(g)(i))
        val between = events
          .filter(col("event_type") === g &&
            col("value") >= lo && col("value") <= hi)
          .count()
        between.toDouble / ranks(g)
      }
    }.max
    println(f"""{"metric":"qsketch","unit":"sec","k":$k,""" +
      f""""exact_sec":$tExact%.3f,"sketch_sec":$tSketch%.3f,""" +
      f""""speedup":${tExact / tSketch}%.2f,""" +
      f""""worst_rank_dev":$worst%.5f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
