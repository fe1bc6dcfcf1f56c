package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Product-quantization scan vs exact brute-force scan — the PERF
  * evidence for `plans/PqOps` (T103): the same top-k similarity
  * queries over `embeddings`, answered (a) by the exact
  * dot-product scan ([[graft.operators.Similarity.bruteForceTopK]]'s
  * shape) and (b) by the m-byte ADC code scan
  * ([[graft.operators.Pq.topK]]), plus the measured recall@k of (b)
  * against (a) and the bytes-per-vector compression ratio. The PQ
  * claim is per-row cost m lookups instead of d multiplies AND a
  * corpus footprint of m bytes instead of 4·d — the layout that keeps
  * billion-vector scans in RAM. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1x sbt "runMain graft.BenchPq [runs] [nq] [k]"
  */
object BenchPq {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val nq = if (args.length > 1) args(1).toInt else 16
    val k = if (args.length > 2) args(2).toInt else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = Tables.embeddings(spark, sfDir)
    val n = corpus.count()
    val dim = corpus.select(size(col("embedding"))).as[Int].head()
    val m = 8
    // ksub must not exceed the training sample; downscale for tiny dirs
    val trainN = math.min(4096, n).toInt
    val ksub = math.min(256, Integer.highestOneBit(math.max(1, trainN)))
    println(s"[benchpq] corpus n=$n dim=$dim -> m=$m bytes/vector " +
      f"(${dim * 4.0 / m}%.0fx compression)")

    // salted ordering: train samples the smallest md5(vec_id), so an
    // unsalted query pick would be a strict PREFIX of the training set
    // and bias recall upward — out-of-sample queries are the honest test
    val queries = corpus
      .orderBy(md5(concat(lit("q|"), col("vec_id").cast("string"))))
      .limit(nq).select(col("vec_id"), col("embedding"))
    queries.collect() // warm

    val cb = operators.Pq.train(corpus, m, ksub, trainN = trainN, iters = 8)
    val codes = operators.Pq.encode(corpus, cb)
      .select(col("vec_id"), col("pq_code"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count() // materialize the encoded corpus once (the index build)

    def time(label: String)(f: => Long): Double = {
      val samples = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        val rows = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchpq] $label run $i: $dt%.3f s ($rows rows)")
        dt
      }
      samples.min
    }

    // Exact: full-precision L2 top-k (same ranking contract as ADC).
    val exactDf = {
      val q = queries.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qe"))
      val c = corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      val d2 = aggregate(zip_with(col("qe"), col("e"), (a, b) =>
        (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(asc("d2"), asc("vec_id"))
      c.join(broadcast(q), lit(true))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), d2.as("d2"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }
    val tExact = time("exact")(exactDf.count())

    val pqDf = operators.Pq.topK(codes, queries, cb, k)
    val tPq = time("pq_adc")(pqDf.count())

    // IVFADC: √N coarse buckets built ONCE (the index), then the probe
    // scans only nprobe buckets' codes per query
    val nlist = operators.Similarity.sqrtNlist(n)
    val nprobe = math.max(2, nlist / 8)
    val (cent, ivfCodes) = operators.Pq.ivfEncode(corpus, cb,
      nCentroids = nlist, trainN = operators.Similarity.sizingTrainN(nlist))
    val centP = cent.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ivfCodesP = ivfCodes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    centP.count(); ivfCodesP.count() // materialize the index
    val ivfDf = operators.Pq.ivfAdcProbe(ivfCodesP, centP, queries, cb, k,
      nprobe = nprobe)
    val tIvf = time(s"ivfadc(nlist=$nlist,nprobe=$nprobe)")(ivfDf.count())

    // residual-coded IVFADC (TPAMI'11 §IV-A): same bytes, the codebook
    // spends its resolution on within-cell displacements; the coarse
    // quantizer is deterministic so the already-persisted cent is
    // passed straight in (no retrain, no second assignment chain)
    val (_, cbR, codesR) = operators.Pq.ivfPqBuild(corpus, m, ksub,
      nCentroids = nlist, pqTrainN = trainN, cent = Some(centP))
    val codesRP = codesR.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codesRP.count()
    // the build's tracked residual cache is corpus-sized and now dead
    // (codes are materialized) — drop it before the timed probe runs
    graft.CacheRegistry.drain()
    val resDf = operators.Pq.ivfPqProbe(codesRP, centP, queries, cbR, k,
      nprobe = nprobe)
    val tRes = time(s"ivfpq_res(nlist=$nlist,nprobe=$nprobe)")(resDf.count())

    // Recall@k of each approximate ranking against the exact ranking —
    // ONE rule for all three variants.
    def idSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = idSets(exactDf)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val sets = idSets(df)
      exact.map { case (q, ex) =>
        sets.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }.sum / exact.size
    }
    val recall = recallOf(pqDf)
    val ivfRecall = recallOf(ivfDf)
    val resRecall = recallOf(resDf)

    println(f"""{"metric":"benchpq","n":$n,"dim":$dim,"m":$m,"ksub":$ksub,""" +
      f""""nq":$nq,"k":$k,"exact_sec":$tExact%.4f,"pq_sec":$tPq%.4f,""" +
      f""""speedup":${tExact / tPq}%.2f,"recall":$recall%.4f,""" +
      f""""ivf_nlist":$nlist,"ivf_nprobe":$nprobe,"ivfadc_sec":$tIvf%.4f,""" +
      f""""ivfadc_speedup":${tExact / tIvf}%.2f,"ivfadc_recall":$ivfRecall%.4f,""" +
      f""""ivfpq_res_sec":$tRes%.4f,"ivfpq_res_recall":$resRecall%.4f,""" +
      f""""bytes_per_vec":$m,"exact_bytes_per_vec":${dim * 4}}""")
    spark.stop()
  }
}
