package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{functions => gf}
import graft.Tables

/** Corpus-hygiene queries over `documents` — the span-level and
  * model-based filters a training-data pipeline runs after the
  * doc-level dedup family in [[TextQueries]]:
  *
  *   - q130: cross-document duplicated SPANS (verbatim k-token runs
  *     shared across docs — boilerplate/license/quote detection;
  *     doc-level MinHash can't see them);
  *   - q131: bigram-LM negative-log-likelihood scoring (the CCNet
  *     perplexity filter — docs the corpus LM finds surprising are
  *     disproportionately noise);
  *   - q132: per-doc token-entropy census (repetitive/spam docs have
  *     low unigram entropy — a Gopher-family quality signal).
  *
  * Scale notes (100 TB): every query here is explode → keyed hash
  * aggregate → bounded-key join → source-bounded census. The only
  * corpus-sized shuffles are the first aggregate of each shape
  * (window fingerprints / bigrams / (doc, token) counts), all with
  * map-side partial aggregation; joins ship fingerprints or
  * distinct-bigram rows, never document text.
  */
object CorpusQueries {

  /** Duplicated-span window width (tokens). */
  private val K = 8

  /** Surprise bar for q131's census (nats of per-bigram NLL). */
  private val SurpriseNll = 7.5

  private val docsSql =
    """docs AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents
      |)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // T91 — cross-document duplicated-span census
    // (operators/DupSpans): every 8-token window is fingerprinted
    // with the engine-identical 60-bit md5 hash; windows whose
    // fingerprint appears in >= 2 distinct docs merge into maximal
    // disjoint spans (gap > 8 breaks a span), and the census rolls
    // spans up per source. Scale: ONE corpus-sized posexplode + ONE
    // fingerprint aggregate (min!=max, never count-distinct) + a
    // left-semi join that ships 8-byte hashes; per-doc window frames
    // are bounded by a doc's own duplicated windows.
    QueryDef("q130_dup_spans",
      s"""WITH $docsSql, w AS (
         |  SELECT doc_id, source, unnest(list_transform(
         |    generate_series(1, len(t) - ${K - 1}),
         |    i -> struct_pack(pos := i,
         |      h := CAST(concat('0x', substr(md5(${(0 until K)
                .map(j => s"t[i+$j]").mkString(" || ' ' || ")}), 1, 15))
                AS BIGINT)))) AS s
         |  FROM docs WHERE len(t) >= $K
         |), wins AS (
         |  SELECT doc_id, source, s.pos AS pos, s.h AS h FROM w
         |), dup AS (
         |  SELECT h FROM wins GROUP BY h HAVING min(doc_id) <> max(doc_id)
         |), hits AS (
         |  SELECT doc_id, source, pos FROM wins JOIN dup USING (h)
         |), flagged AS (
         |  SELECT doc_id, source, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |         > $K THEN 1 ELSE 0 END AS brk
         |  FROM hits
         |), grouped AS (
         |  SELECT doc_id, source, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
         |  FROM flagged
         |), spans AS (
         |  SELECT doc_id, source, min(pos) AS start_pos,
         |    max(pos) + ${K - 1} AS end_pos
         |  FROM grouped GROUP BY doc_id, source, g
         |)
         |SELECT source, count(DISTINCT doc_id) AS n_docs,
         |  count(*) AS n_spans,
         |  CAST(sum(end_pos - start_pos + 1) AS BIGINT) AS dup_tokens,
         |  round(avg(end_pos - start_pos + 1), 6) AS avg_span
         |FROM spans GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val spans = graft.operators.DupSpans.spans(
        Tables.documents(s, dir).repartition(col("doc_id")), K)
      spans
        .withColumn("len", col("end_pos") - col("start_pos") + 1)
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_spans"),
          sum("len").as("dup_tokens"),
          round(avg("len"), 6).as("avg_span"))
        .orderBy("source")
    },

    // T92 — corpus-LM surprise scoring (CCNet-style perplexity
    // filter): train the q86 bigram MLE on the corpus itself, score
    // every doc by its average per-bigram negative log-likelihood,
    // census per source. Scale: the transition table is
    // distinct-bigram-bounded and joins the bigram stream on its key
    // (one shuffle); the per-doc average is a doc-keyed aggregate;
    // the census is source-bounded. Per-doc NLL rounds to 9 (the
    // q121 precedent) so cross-engine ln/summation drift never
    // reaches the 6-digit census.
    QueryDef("q131_lm_surprise",
      s"""WITH $docsSql, bg AS (
         |  SELECT doc_id, source, unnest(list_transform(
         |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS bigram
         |  FROM docs WHERE len(t) >= 2
         |), c12 AS (
         |  SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram
         |), c1 AS (
         |  SELECT split_part(bigram, ' ', 1) AS w1,
         |    CAST(sum(cnt) AS DOUBLE) AS c1
         |  FROM c12 GROUP BY 1
         |), lm AS (
         |  SELECT c12.bigram, c12.cnt / c1.c1 AS p
         |  FROM c12 JOIN c1 ON split_part(c12.bigram, ' ', 1) = c1.w1
         |), scored AS (
         |  SELECT doc_id, source, round(-avg(ln(p)), 9) AS nll
         |  FROM bg JOIN lm USING (bigram)
         |  GROUP BY doc_id, source
         |)
         |SELECT source, count(*) AS n_docs, round(avg(nll), 6) AS avg_nll,
         |  round(min(nll), 6) AS min_nll, round(max(nll), 6) AS max_nll,
         |  CAST(sum(CASE WHEN nll > $SurpriseNll THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_surprising
         |FROM scored GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val bg = Tables.documents(s, dir)
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("source"),
          explode(org.apache.spark.sql.graft.CatalystBridge.column(
            graft.plans.ShingleTokens(
              org.apache.spark.sql.graft.CatalystBridge.expr(trim(col("text"))),
              2, dedupe = false))).as("bigram"))
      val c12 = bg.groupBy("bigram").agg(count(lit(1)).as("cnt"))
      val c1 = c12
        .groupBy(split_part(col("bigram"), lit(" "), lit(1)).as("w1"))
        .agg(sum("cnt").cast("double").as("c1"))
      val lm = c12
        .withColumn("w1", split_part(col("bigram"), lit(" "), lit(1)))
        .join(c1, "w1")
        .select(col("bigram"), (col("cnt") / col("c1")).as("p"))
      val scored = bg.join(lm, "bigram")
        .groupBy("doc_id", "source")
        .agg(round(-avg(log(col("p"))), 9).as("nll"))
      scored.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("nll"), 6).as("avg_nll"),
          round(min("nll"), 6).as("min_nll"),
          round(max("nll"), 6).as("max_nll"),
          sum(when(col("nll") > SurpriseNll, 1L).otherwise(0L))
            .as("n_surprising"))
        .orderBy("source")
    },

    // T93 — per-doc token-entropy census: Shannon entropy of each
    // doc's unigram distribution, H = ln(n) − Σ c·ln(c)/n — the
    // repetition/spam signal (a doc that repeats one phrase has
    // near-zero entropy regardless of length). Scale: ONE
    // (doc, token) hash aggregate then a doc-keyed rollup — both
    // map-side-partial; no windows, no joins. Per-doc H rounds to 9
    // before the 6-digit census (q121 precedent).
    QueryDef("q132_token_entropy",
      s"""WITH $docsSql, tok AS (
         |  SELECT doc_id, source, unnest(t) AS tok
         |  FROM docs WHERE len(t) >= 1
         |), tc AS (
         |  SELECT doc_id, source, tok, count(*) AS c
         |  FROM tok GROUP BY doc_id, source, tok
         |), ent AS (
         |  SELECT doc_id, source,
         |    round(ln(CAST(sum(c) AS DOUBLE))
         |      - sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE), 9)
         |      AS h
         |  FROM tc GROUP BY doc_id, source
         |)
         |SELECT source, count(*) AS n_docs,
         |  round(avg(h), 6) AS avg_entropy,
         |  round(min(h), 6) AS min_entropy,
         |  round(max(h), 6) AS max_entropy
         |FROM ent GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val tok = Tables.documents(s, dir)
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("source"),
          explode(gf.tokens(col("text"))).as("tok"))
      val tc = tok.groupBy("doc_id", "source", "tok")
        .agg(count(lit(1)).as("c"))
      val ent = tc.groupBy("doc_id", "source")
        .agg(round(
          log(sum("c").cast("double")) -
            sum(col("c") * log(col("c").cast("double"))) /
              sum("c").cast("double"), 9).as("h"))
      ent.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("h"), 6).as("avg_entropy"),
          round(min("h"), 6).as("min_entropy"),
          round(max("h"), 6).as("max_entropy"))
        .orderBy("source")
    }
  )
}
