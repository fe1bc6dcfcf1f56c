package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction — the maintenance operator every
  * incrementally-written table eventually needs. Streaming/incremental
  * sinks (foreachBatch appends, per-batch partition overwrites,
  * many-executor writes) accumulate files far below the efficient scan
  * size; at 100 TB the cost is real on BOTH ends: file-listing RPCs
  * and task-scheduling overhead scale with FILE COUNT, while columnar
  * compression and min/max footer effectiveness scale with FILE SIZE.
  *
  * Design for scale:
  *   - The plan step is one directory listing (one `FileStatus` per
  *     data file — the same listing any scan of the table performs)
  *     and simple arithmetic; nothing driver-side scales with rows.
  *   - The rewrite uses `coalesce`, a NARROW dependency: partitions
  *     are merged where they sit, NO shuffle, no sort — the plan is
  *     scan → write. (`repartition` would shuffle every byte to fix
  *     skew that compaction does not need fixed; a skewed merge just
  *     yields one larger output file.)
  *   - Compaction is OUT-OF-PLACE (read `in`, write `out`): the swap
  *     is the caller's transaction (table-format metadata commit, dir
  *     rename, view flip). In-place rewrites that delete inputs on
  *     success belong to the table format, not the engine.
  */
object Compaction {

  final case class CompactionPlan(
      dataFiles: Int,
      totalBytes: Long,
      targetFileBytes: Long,
      outputPartitions: Int)

  final case class CompactionStats(
      plan: CompactionPlan,
      outputFiles: Int,
      outputBytes: Long)

  private def listDataFiles(spark: SparkSession, dir: String)
      : Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, /* recursive = */ true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      // Data files only: skip success markers, checksums, hidden files.
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += ((f.getPath.toString, f.getLen))
    }
    out.result()
  }

  /** Size up a compaction without running it. */
  def plan(spark: SparkSession, inPath: String,
      targetFileBytes: Long = 128L << 20): CompactionPlan = {
    require(targetFileBytes > 0, s"target must be positive: $targetFileBytes")
    val files = listDataFiles(spark, inPath)
    val total = files.iterator.map(_._2).sum
    val parts = math.max(1L,
      (total + targetFileBytes - 1) / targetFileBytes).toInt
    CompactionPlan(files.length, total, targetFileBytes, parts)
  }

  /** Rewrite the parquet table at `inPath` into ~`targetFileBytes`
    * files at `outPath` (out-of-place; see scaladoc). Returns the
    * before/after accounting. No-op-shaped when the table is already
    * compact: the rewrite still runs (the caller asked for a copy) but
    * with the same partition count the input had. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L << 20): CompactionStats = {
    val p = plan(spark, inPath, targetFileBytes)
    spark.read.parquet(inPath)
      .coalesce(p.outputPartitions)
      .write.mode("overwrite").parquet(outPath)
    val outFiles = listDataFiles(spark, outPath)
    CompactionStats(p, outFiles.length, outFiles.iterator.map(_._2).sum)
  }

  /** Partition-preserving compaction for the incremental sinks'
    * `partitionBy` layouts (the streaming fact table's
    * `batch_id=N/` shape): rows shuffle ONCE, steered so each
    * partition value lands in exactly `⌈value bytes / target⌉`
    * reducer tasks → that many output files under its directory.
    * Small partition values still collapse to one file each; a SKEWED
    * value (one giant batch) is split on a content-hash salt instead
    * of becoming one oversized file — the mirror image of the
    * small-files problem this operator fixes.
    *
    * Mechanics: one bounded aggregate counts rows per partition value
    * (key space = the value set the directory layout already
    * enumerates), per-value file counts come from the listing's
    * measured bytes/row, and [[RangeSort.hashProbes]] steers
    * `repartition` so (value, salt) group i lands in reducer i —
    * EXACTLY one file per group, no hash-collision merging. Driver
    * state is one row per partition value — the same order as the
    * directory listing [[plan]] already performed. This path pays a
    * shuffle that [[compact]] does not — the price of keeping the
    * directory layout; use [[compact]] when the snapshot can be
    * flat. */
  def compactPartitioned(spark: SparkSession, inPath: String,
      outPath: String, partitionCols: Seq[String],
      targetFileBytes: Long = 128L << 20): CompactionStats = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val p = plan(spark, inPath, targetFileBytes)
    val df = spark.read.parquet(inPath)
    val pcols = partitionCols.map(col)
    // Per-value row counts AND one representative data file per value:
    // in a partitionBy layout each value owns exactly one directory,
    // so the representative's parent locates the value's files in the
    // listing and gives EXACT per-value bytes. (A corpus-wide
    // bytes/row average under-sizes wide-row values — mixed 10 KB-doc
    // and 100 B-event partitions would re-create the oversized files
    // this operator exists to prevent.)
    // input_file_name is nondeterministic, so project it BEFORE the
    // aggregate (first() over a nondeterministic argument fails
    // analysis; over a projected attribute it is fine).
    val counts = df.withColumn("__f", input_file_name())
      .groupBy(pcols: _*)
      .agg(count(lit(1)).as("__cnt"), first(col("__f")).as("__f"))
      .collect()
    val nKeys = partitionCols.length
    def normParent(uri: String): String = {
      val path = new Path(uri).toUri.getPath
      path.substring(0, math.max(path.lastIndexOf('/'), 0))
    }
    val bytesByDir: Map[String, Long] = listDataFiles(spark, inPath)
      .groupMapReduce(f => normParent(f._1))(_._2)(_ + _)
    val totalRows = counts.iterator.map(_.getLong(nKeys)).sum
    val globalBpr =
      if (totalRows > 0) p.totalBytes.toDouble / totalRows else 1.0
    var base = 0
    val entries = counts.map { r =>
      val valueBytes = Option(r.getString(nKeys + 1))
        .flatMap(f => bytesByDir.get(normParent(f)))
      val estBytes = valueBytes.map(_.toDouble)
        .getOrElse(r.getLong(nKeys) * globalBpr) // defensive fallback
      val n = math.max(1L,
        math.ceil(estBytes / targetFileBytes).toLong).toInt
      val e = Row.fromSeq((0 until nKeys).map(r.get) :+ base :+ n)
      base += n
      e
    }
    if (entries.isEmpty) {
      df.write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(outPath)
      return CompactionStats(p, 0, 0L)
    }
    val keySchema = df.select(pcols: _*).schema
    val mapSchema = StructType(keySchema.fields :+
      StructField("__base", IntegerType) :+ StructField("__n", IntegerType))
    val mapDf = spark.createDataFrame(
      java.util.Arrays.asList(entries: _*), mapSchema)
    // Salt from the data columns' hash: deterministic, no extra state.
    val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
    val salt =
      if (dataCols.isEmpty) lit(0L)
      else pmod(xxhash64(dataCols: _*), col("__n").cast("long"))
    val probes = RangeSort.hashProbes(base)
    // NULL-SAFE join on the partition columns: a null partition value
    // (the __HIVE_DEFAULT_PARTITION__ directory) groups and writes
    // fine, but an equi-join would silently DROP its rows.
    val cond = partitionCols.map(c => df(c) <=> mapDf(c)).reduce(_ && _)
    df.join(broadcast(mapDf), cond)
      .select(df.columns.map(df(_)) ++ Seq(mapDf("__base"), mapDf("__n")): _*)
      .withColumn("__probe", element_at(typedlit(probes.toSeq),
        col("__base") + salt.cast("int") + 1))
      .repartition(base, col("__probe"))
      .drop("__base", "__n", "__probe")
      .write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(outPath)
    val outFiles = listDataFiles(spark, outPath)
    CompactionStats(p, outFiles.length, outFiles.iterator.map(_._2).sum)
  }

  /** The coalesced frame without the write — for callers composing
    * the compaction into their own sink (bucketed table, ORC, a
    * different partitioning scheme). */
  def compacted(spark: SparkSession, inPath: String,
      targetFileBytes: Long = 128L << 20): DataFrame = {
    val p = plan(spark, inPath, targetFileBytes)
    spark.read.parquet(inPath).coalesce(p.outputPartitions)
  }
}
