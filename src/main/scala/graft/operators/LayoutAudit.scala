package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Parquet layout auditor — reads what the OPTIMIZER reads: file
  * footers. Per (file, row group) it reports row counts, compressed /
  * uncompressed bytes, and per-column min/max statistics for the
  * requested columns — the numbers that decide whether a scan can
  * skip a row group ([[ZOrder]]'s whole reason to exist) and whether a
  * table needs [[Compaction]] (file-size histogram) before they cost
  * anything at query time.
  *
  * [[clusteringScore]] turns the stats into the actionable metric: the
  * mean fraction of each column's GLOBAL value range that a single row
  * group spans. Random layout → every row group spans ~the full range
  * (score ≈ 1, nothing prunes); perfectly clustered → each spans
  * ~1/n_groups (score → 0, a point predicate touches one group). The
  * ZOrderSpec proves span tightening from the DATA; this proves it
  * from the FOOTERS — the artifact the engine's own row-group pruning
  * actually consults.
  *
  * Scale shape: the audit never reads data pages — one footer per
  * file, fetched in parallel via `mapPartitions` over the FILE LIST
  * (a Dataset of paths, thousands of rows per 100 TB table, never
  * row-scaled); output is (files × row groups × columns)-bounded.
  */
object LayoutAudit {

  final case class ColumnStat(
      file: String,
      row_group: Int,
      column: String,
      n_rows: Long,
      compressed_bytes: Long,
      total_bytes: Long,
      min_long: Option[Long],
      max_long: Option[Long],
      min_double: Option[Double],
      max_double: Option[Double])

  /** Footer stats for every (file, row group, requested column). */
  def audit(spark: SparkSession, dir: String,
      columns: Seq[String]): Dataset[ColumnStat] = {
    import spark.implicits._
    val files = listParquetFiles(spark, dir)
    require(files.nonEmpty, s"no parquet files under $dir")
    val colSet = columns.toSet
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .mapPartitions { paths =>
        val conf = new Configuration()
        paths.flatMap { p =>
          val in = HadoopInputFile.fromPath(new Path(p), conf)
          val footer = ParquetFileReader.open(in)
          try {
            footer.getFooter.getBlocks.asScala.zipWithIndex.flatMap {
              case (block, gi) =>
                block.getColumns.asScala
                  .filter(c => colSet.contains(c.getPath.toDotString))
                  .map { c =>
                    val st = c.getStatistics
                    val empty = (Option.empty[Long], Option.empty[Long],
                      Option.empty[Double], Option.empty[Double])
                    val (minL, maxL, minD, maxD) =
                      if (st == null || !st.hasNonNullValue) empty
                      else st.genericGetMin match {
                        case n: java.lang.Integer =>
                          (Some(n.longValue), Some(st.genericGetMax
                            .asInstanceOf[java.lang.Integer].longValue),
                            Option.empty[Double], Option.empty[Double])
                        case n: java.lang.Long =>
                          (Some(n.longValue), Some(st.genericGetMax
                            .asInstanceOf[java.lang.Long].longValue),
                            Option.empty[Double], Option.empty[Double])
                        case n: java.lang.Float =>
                          (Option.empty[Long], Option.empty[Long],
                            Some(n.doubleValue), Some(st.genericGetMax
                              .asInstanceOf[java.lang.Float].doubleValue))
                        case n: java.lang.Double =>
                          (Option.empty[Long], Option.empty[Long],
                            Some(n.doubleValue), Some(st.genericGetMax
                              .asInstanceOf[java.lang.Double].doubleValue))
                        case _ => empty // binary/other: no numeric span
                      }
                    ColumnStat(p, gi, c.getPath.toDotString,
                      block.getRowCount, c.getTotalSize,
                      c.getTotalUncompressedSize, minL, maxL, minD, maxD)
                  }.toSeq
            }.toIterator
          } finally footer.close()
        }
      }
  }

  /** File-size histogram — the [[Compaction]] decision input: files,
    * rows, bytes per file (one row per file). */
  def fileProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = listParquetFiles(spark, dir)
    require(files.nonEmpty, s"no parquet files under $dir")
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .map { p =>
        val conf = new Configuration()
        val footer = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(p), conf))
        try {
          val blocks = footer.getFooter.getBlocks.asScala
          (p, blocks.size, blocks.map(_.getRowCount).sum,
            blocks.map(_.getCompressedSize).sum)
        } finally footer.close()
      }
      .toDF("file", "n_row_groups", "n_rows", "compressed_bytes")
  }

  /** Mean fraction of a LONG column's global range that one row group
    * spans (1 ≈ random layout, → 0 ≈ clustered). Computed from the
    * audit frame — footer statistics only. */
  def clusteringScore(stats: Dataset[ColumnStat], column: String): Double = {
    val rows = stats.filter(_.column == column).collect()
      .filter(s => s.min_long.isDefined && s.max_long.isDefined)
    require(rows.nonEmpty, s"no long statistics for column $column")
    val gMin = rows.map(_.min_long.get).min
    val gMax = rows.map(_.max_long.get).max
    if (gMax == gMin) return 0.0
    val span = (gMax - gMin).toDouble
    rows.map(s => (s.max_long.get - s.min_long.get) / span).sum / rows.length
  }

  /** Schema drift between two table releases — the axis the rest of
    * the release-diff family doesn't cover (q136 diffs ROWS, q144
    * embedding GEOMETRY, `audit` physical LAYOUT; a silently widened
    * int or a dropped column breaks every downstream consumer first).
    * One row per column name present in either release:
    * (column, status ∈ added|removed|type_changed|unchanged,
    * type_a, type_b). Reads ONLY footer metadata via Spark's schema
    * resolution — no data pages at any table size; output bounded by
    * the wider schema's width. Nested types compare by full DDL
    * (catalogString), so a struct field change surfaces as
    * type_changed on its top-level column. */
  def schemaDiff(spark: SparkSession, dirA: String,
      dirB: String): DataFrame = {
    import spark.implicits._
    def types(dir: String): Map[String, String] =
      spark.read.parquet(dir).schema.fields
        .map(f => f.name -> f.dataType.catalogString).toMap
    val a = types(dirA)
    val b = types(dirB)
    (a.keySet ++ b.keySet).toSeq.sorted.map { c =>
      val (ta, tb) = (a.get(c), b.get(c))
      val status = (ta, tb) match {
        case (None, Some(_))                  => "added"
        case (Some(_), None)                  => "removed"
        case (Some(x), Some(y)) if x != y     => "type_changed"
        case _                                => "unchanged"
      }
      (c, status, ta.getOrElse(""), tb.getOrElse(""))
    }.toDF("column", "status", "type_a", "type_b")
  }

  private def listParquetFiles(spark: SparkSession, dir: String): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[String] = {
      val it = fs.listStatus(p).toSeq
      it.flatMap {
        case d if d.isDirectory => walk(d.getPath)
        case f if f.getPath.getName.endsWith(".parquet") =>
          Seq(f.getPath.toString)
        case _ => Seq.empty
      }
    }
    walk(path)
  }
}
