package graft

import org.apache.spark.sql.SparkSession

/** q30 STAGE-ATTRIBUTION harness (VERDICT r13 item 1): time the
  * pipeline's stages separately at a scale dir so the sf10x total can
  * be attributed between candidate generation, the sorted-intersect
  * verify, and the (inherently output-sized) member-pair expansion +
  * contract sort. Stages come from the SAME
  * [[graft.queries.TextQueries.jaccardStages]] definition the suite's
  * q30 ships — nothing here can drift from the measured query.
  *
  * Stage semantics (each run is cold: caches cleared, the tracked
  * persists drain per materialization, so every stage re-pays its
  * upstream — read the attribution as CUMULATIVE DIFFS):
  *   - `prep`    — tokenize + canonical fingerprint + distinct-set
  *                 groupBy (forces the persisted gp frame);
  *   - `candgen` — prep + the triangle-blocked self-join WITH the
  *                 token arrays riding the fan-out exchange but NO
  *                 intersect kernel (a size-sum probe keeps pruning
  *                 honest);
  *   - `verify`  — prep + the same join WITH the SortedIntersectSize
  *                 kernel per candidate (sum of intersections);
  *   - `full`    — the whole q30: verify + qualifying-pair persist +
  *                 member-pair expansion + weighted-bounds contract
  *                 sort through the noop sink.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10x sbt "runMain graft.BenchQ30 [runs]"
  * Prints one JSON line {"metric":"q30_stages",...}.
  */
object BenchQ30 {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(1)
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
    // JVM/codegen warmup outside any timing (the Bench stance).
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      // Capture BEFORE the cache teardown (ADVICE r14): unpersisting
      // the stage's largest frames is not part of its compute time.
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def fmt(d: Double): String = f"$d%.3f"
    val stageTimes = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[Double]]
    var outputRows = -1L
    var candRows = -1L
    (1 to runs).foreach { _ =>
      val stages = Seq[(String, () => Unit)](
        "prep" -> (() =>
          noop(graft.queries.TextQueries.jaccardStages(spark, sfDir).gp)),
        "candgen" -> (() => {
          val st = graft.queries.TextQueries.jaccardStages(spark, sfDir)
          candRows = st.candidateShape
            .collect().head.getLong(1) // 1-row aggregate
        }),
        "verify" -> (() =>
          noop(graft.queries.TextQueries
            .jaccardStages(spark, sfDir).verifyProbe)),
        "full" -> (() =>
          noop(graft.queries.TextQueries.jaccardStages(spark, sfDir).output)))
      stages.foreach { case (name, f) =>
        val dt = timed(f())
        stageTimes(name) = stageTimes.getOrElse(name, Seq.empty) :+ dt
        System.err.println(f"[benchq30] $name ${dt}%.1f s")
      }
      // Output volume adjudicates output-boundness (counted once; the
      // count re-executes the verify join into a cheap global agg, so
      // it is NOT part of any stage timing).
      if (outputRows < 0)
        outputRows = graft.queries.TextQueries
          .jaccardStages(spark, sfDir).output.count()
    }
    val med = stageTimes.map { case (k, ts) =>
      k -> ts.sorted.apply(ts.length / 2)
    }
    val qs = med.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"q30_stages","unit":"sec","runs":$runs,""" +
      s""""stages":$qs,"candidates":$candRows,"output_rows":$outputRows,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
