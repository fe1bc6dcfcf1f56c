package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** Corpus deduplication — the operators that turn near-dup PAIR lists
  * (q27/q28/q30's output shape) into a deduplicated corpus.
  *
  *   - [[exact]]: keep the lowest-id document per content hash — one
  *     hash-groupBy shuffle.
  *   - [[dropPairDuplicates]]: given candidate pairs (doc_a < doc_b),
  *     greedily keep the lower id: every doc that ever appears on the
  *     right side is dropped. One distinct + one left-anti join. This
  *     is the industry-standard greedy form (transitively, a chain
  *     a<b<c loses both b and c — same behavior as keeping each
  *     cluster's minimum when pair lists are transitively closed, and
  *     strictly more aggressive when they are not; full
  *     connected-components needs iteration the pipelines avoid).
  *   - [[cleanCorpus]]: quality filter → exact dedup → near-dup drop,
  *     the composed training-data shape.
  */
object Dedup {

  /** Exact dedup on a content hash: keeps the lowest `idCol` per hash.
    * Returns the full surviving rows. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val keepers = docs
      .groupBy(md5(col(textCol)).as("_h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    docs.join(keepers, Seq(idCol), "left_semi")
  }

  /** Drop every document appearing as the GREATER side of any pair. */
  def dropPairDuplicates(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val losers = pairs.select(col("doc_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality gate used by the clean-corpus pipeline (mirrors q32's
    * scoring: enough tokens, not stopword-soup). */
  def qualityFilter(docs: DataFrame, textCol: String = "text",
      minTokens: Int = 30, maxStopwordRatio: Double = 0.15): DataFrame = {
    val t = gf.tokens(col(textCol))
    val nTokens = size(t)
    val ratio = size(filter(t, x => x.isin("the", "a"))).cast("double") / nTokens
    docs.filter(nTokens >= minTokens && ratio < maxStopwordRatio)
  }

  /** The composed training-data cleanup: quality → exact dedup →
    * near-dup drop (pairs supplied by the caller's chosen detector —
    * minhash-LSH, simhash radius, or Jaccard verification). */
  def cleanCorpus(docs: DataFrame, nearDupPairs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    dropPairDuplicates(
      exact(qualityFilter(docs, textCol), idCol, textCol),
      nearDupPairs, idCol)
}
