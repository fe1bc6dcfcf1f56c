package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Aho–Corasick phrase scan vs the unrolled per-phrase Contains chain
  * — the PERF evidence for `plans/PhraseScan` (T96): the same
  * hit-census over `documents`, computed (a) by the one-pass
  * automaton and (b) by the extract_tags-style composed form (one
  * `contains()` per phrase), swept over phrase-list sizes. The
  * automaton's claim is O(bytes) per doc INDEPENDENT of phrase count;
  * the composed chain re-scans every doc once per phrase. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1x sbt "runMain graft.BenchPhrase [runs] [sizes...]"
  */
object BenchPhrase {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val sizes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(10, 100, 1000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Two-word phrases from the corpus vocabulary — realistic hit
    // rates at every size (deduped; deterministic order).
    val vocab = Seq("data", "query", "customer", "merge", "batch", "part",
      "big", "order", "stream", "row", "table", "key", "sort", "line",
      "filter", "join", "hash", "column", "small", "value", "spark",
      "scan", "vector", "group", "fast", "slow", "agg", "window", "the")
    val allPhrases = (for (a <- vocab; b <- vocab if a != b)
      yield s"$a $b").distinct

    val docs = Tables.documents(spark, sfDir).select("text")
    docs.agg(count(lit(1))).collect() // warm scan

    def time(label: String)(f: => Long): (Double, Long) = {
      var rows = 0L
      val samples = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        rows = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchphrase] $label run $i: $dt%.3f s ($rows hit rows)")
        dt
      }
      (samples.min, rows)
    }

    val results = sizes.map { n =>
      val phrases = allPhrases.take(n)
      val (tAc, rowsAc) = time(s"ac n=$n") {
        docs.select(explode(graft.functions.phraseScan(col("text"), phrases))
          .as("pid")).groupBy("pid").count().count()
      }
      // Composed: one contains() column per phrase, summed per phrase —
      // the extract_tags shape. (Aggregate is phrase-bounded either
      // way; the difference under test is the scan.)
      val (tChain, rowsChain) = time(s"contains-chain n=$n") {
        docs.select(phrases.zipWithIndex.map { case (p, i) =>
          sum(when(col("text").contains(p), 1L).otherwise(0L)).as(s"c$i")
        }: _*).collect()
        phrases.length.toLong
      }
      println(f"[benchphrase] n=$n: ac=${tAc}%.3f s chain=${tChain}%.3f s " +
        f"(${tChain / tAc}%.1fx) hits=$rowsAc")
      (n, tAc, tChain)
    }
    println("{\"metric\":\"phrase_scan\",\"unit\":\"sec\",\"sweep\":[" +
      results.map { case (n, a, c) =>
        f"""{"n":$n,"ac":$a%.3f,"chain":$c%.3f}""" }.mkString(",") + "]}")
    spark.stop()
  }
}
