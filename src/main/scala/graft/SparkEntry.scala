package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnnQueries, CoreQueries, EventQueries, QueryDef, RetrievalQueries, SqlViews, StarQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The scoring surface: every implemented operator from SURVEY.md §2 is
  * registered here as a named query (with a DuckDB oracle where the op
  * is SQL-expressible). Queries live in [[graft.queries]], grouped by
  * domain; this object only assembles the maps.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    CoreQueries.defs ++ StarQueries.defs ++ TextQueries.defs ++
      EventQueries.defs ++ AnnQueries.defs ++ RetrievalQueries.defs ++
      SqlViews.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.find(_.name == "q09_star_flatten").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Lifecycle: each returned builder installs [[CacheRegistry]]'s
    * auto-drain listener on the session and arms the query's internal
    * persists once construction finishes — an embedded caller who
    * materializes the result (write/collect/count) gets those caches
    * reclaimed automatically, scoped to the frames that query's plan
    * actually references. Manual [[CacheRegistry.drain]] stays
    * available for multi-query composition; the Verify/Bench harness
    * bypasses this wrapper via [[allDefs]] and manages caches itself. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { d =>
      d.name -> { (spark: SparkSession, dir: String) =>
        CacheRegistry.installAutoDrain(spark)
        val df = d.build(spark, dir)
        CacheRegistry.armAll()
        df
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
