package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN detection — the substring-level
  * twin of the doc-level dedup family (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): find
  * maximal token spans that are verbatim-shared ACROSS documents, not
  * whole-doc near-dups. Boilerplate headers, license blocks and
  * quoted passages dominate a web corpus at 100 TB; doc-level MinHash
  * never sees them because the surrounding text differs.
  *
  * Method: every k-token window of every doc is fingerprinted
  * ([[graft.plans.StableHash60]] — md5-derived, engine-identical); a
  * window is DUPLICATED iff its fingerprint occurs in ≥ 2 distinct
  * docs (`min(doc_id) <> max(doc_id)` — one aggregate, no
  * count-distinct); a doc's duplicated windows then merge into
  * maximal spans: two k-windows starting at p ≤ q overlap-or-touch
  * iff q − p ≤ k, so a new span starts exactly when the gap to the
  * previous duplicated start exceeds k (lag + running sum — spans
  * come out DISJOINT, so summed span lengths are exact duplicated
  * token counts, never double-counted).
  *
  * Scale shape: one corpus-sized posexplode → ONE (fingerprint)
  * hash aggregate (map-side partial, 8-byte keys) → a left-semi join
  * of the window stream against the duplicated-fingerprint set
  * (shuffle ships hashes, not shingle text) → per-doc windows whose
  * frames are bounded by a single doc's duplicated-window count.
  * Nothing is ever all-pairs and no per-doc list materializes.
  */
object DupSpans {

  private def fingerprint(g: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.column(
      graft.plans.StableHash60(
        org.apache.spark.sql.graft.CatalystBridge.expr(g)))

  /** `(doc_id, <carry...>, pos, h)`: every k-token window of `textCol`
    * with its 1-based start position and 60-bit fingerprint. */
  def windows(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text", carry: Seq[String] = Seq("source"))
      : DataFrame = {
    require(k >= 2, s"window width k must be >= 2: $k")
    val sh = org.apache.spark.sql.graft.CatalystBridge.column(
      graft.plans.ShingleTokens(
        org.apache.spark.sql.graft.CatalystBridge.expr(trim(col(textCol))),
        k, dedupe = false))
    docs
      .select((col(idCol) +: carry.map(col)) :+ posexplode(sh).as(Seq("p0", "g")): _*)
      .select((col(idCol) +: carry.map(col)) ++
        Seq((col("p0") + 1).as("pos"), fingerprint(col("g")).as("h")): _*)
  }

  /** Maximal cross-doc duplicated spans per doc:
    * `(doc_id, <carry...>, start_pos, end_pos, n_windows)` where
    * `end_pos` is the last TOKEN index covered (start of the last
    * window + k − 1); spans within a doc are disjoint. */
  def spans(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text", carry: Seq[String] = Seq("source"))
      : DataFrame = {
    val w = windows(docs, k, idCol, textCol, carry)
    // Duplicated fingerprints: present in >= 2 distinct docs. The
    // aggregate never counts distinct — min != max over the already
    // grouped key is enough and keeps partial aggregation trivial.
    val dup = w.groupBy("h")
      .agg(min(idCol).as("mn"), max(idCol).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("h")
    val hits = w.join(dup, Seq("h"), "left_semi")
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    val brk = when(col("pos") - lag("pos", 1).over(byPos) > k, 1)
      .otherwise(0)
    hits
      .withColumn("brk", brk)
      .withColumn("grp", sum("brk").over(byPos))
      .groupBy((col(idCol) +: carry.map(col)) :+ col("grp"): _*)
      .agg(min("pos").as("start_pos"),
        (max("pos") + (k - 1)).as("end_pos"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
  }
}
