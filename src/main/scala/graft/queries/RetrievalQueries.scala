package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.{functions => gf}

/** Retrieval / index-build / model-inference queries over the
  * `documents` corpus — the serving-side counterpart of the corpus
  * curation family in [[TextQueries]]: a training-data engine that can
  * score and slice a 100 TB corpus also has to answer "which documents
  * match this probe set" (BM25), "what does the term index look like"
  * (posting-list census), and "what does the quality model say"
  * (batch linear-model inference). All three are single-shuffle
  * shapes built on ONE shared term-frequency aggregate:
  *
  *   - the token explode is never materialized twice — the
  *     `(doc_id, term, tf)` frame is the session-materialized
  *     warehouse table, scanned (pruned, bucket-local) by every
  *     derived aggregate (df, dl, postings);
  *   - vocabulary-sized frames (df, query-term sets) ride AQE
  *     broadcasts; the one corpus-sized join (tf ⨝ dl on doc_id) is a
  *     plain shuffled equi-join;
  *   - per-term top-k runs on the engine's bounded-heap
  *     [[graft.plans.TopKPerKey]] operator, never a full per-term
  *     sort — posting lists for stopword-grade terms are
  *     corpus-sized, and a `collect_list` over them would OOM an
  *     executor at scale, so the k smallest/highest rows are selected
  *     BEFORE any list is built.
  */
object RetrievalQueries {

  /** BM25 constants (Robertson–Spärck Jones, the standard defaults). */
  private val K1 = 1.2
  private val B = 0.75

  /** Number of probe terms (highest-df) and results per term. */
  private val NQueryTerms = 10
  private val TopDocs = 5

  /** Posting-list prefix length for the index census. */
  private val PostingPrefix = 8

  /** DuckDB-side tokenizer — same whitespace semantics as
    * [[graft.functions.tokens]] (q46's established parity contract). */
  private val toksSql =
    """toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      |  FROM documents
      |)""".stripMargin

  /** Shared `(doc_id, term, tf)` aggregate — since r15 the
    * session-materialized warehouse table [[TextQueries.tfFor]]
    * (bucketed by doc_id), so the four retrieval queries stop paying
    * the corpus tokenize+shuffle each: the backbone builds once per
    * (session, corpus) and every tf ⨝ dl / per-doc aggregate is
    * bucket-local. Values are exact integers — table-vs-inline cannot
    * diverge. The backbone also carries `source` (for q35's census);
    * retrieval never reads it, so project it away HERE — the scan
    * prunes to 3/4 columns (PlanAuditSpec's ReadSchema-minimality
    * gate). No persist: the frame is already disk-materialized, and
    * caching it would pin a corpus-sized frame in executor memory
    * (the round-10 cache-pressure lesson) while defeating both column
    * pruning and the bucketed scan. */
  private def tfFrame(s: SparkSession, dir: String): DataFrame =
    TextQueries.tfFor(s, dir).select("doc_id", "term", "tf")

  val defs: Seq[QueryDef] = Seq(

    // T84 — BM25 top-k retrieval: probe terms are the NQueryTerms
    // highest-df terms (deterministic: df desc, term asc), each scored
    // against every containing document with standard BM25
    // (k1 = 1.2, b = 0.75, idf = ln((N − df + ½)/(df + ½) + 1)), top
    // TopDocs docs per term. Scale shape: tf is the shared disk table
    // (doc×term-bounded — strictly smaller than the token stream);
    // df/dl/avgdl all derive from it; the probe-term set and the 1-row
    // (N, avgdl) frame broadcast; per-term top-k is the bounded-heap
    // TopKPerKey plan, so a stopword-grade probe term never sorts its
    // corpus-sized posting list.
    QueryDef("q126_bm25_topk",
      s"""WITH $toksSql, tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), qterms AS (
        |  SELECT term, df FROM df ORDER BY df DESC, term LIMIT $NQueryTerms
        |), dl AS (
        |  SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY 1
        |), stats AS (
        |  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
        |    (SELECT avg(dl) FROM dl) AS avgdl
        |), scored AS (
        |  SELECT tf.term, tf.doc_id,
        |    round(ln((n - df + 0.5) / (df + 0.5) + 1.0)
        |      * (tf * ($K1 + 1.0))
        |      / (tf + $K1 * (1.0 - $B + $B * dl / avgdl)), 6) + 0.0 AS score
        |  FROM tf
        |  JOIN qterms USING (term)
        |  JOIN dl USING (doc_id)
        |  CROSS JOIN stats
        |), ranked AS (
        |  SELECT term, doc_id, score,
        |    row_number() OVER (PARTITION BY term
        |      ORDER BY score DESC, doc_id) AS rk
        |  FROM scored
        |)
        |SELECT term, doc_id, score FROM ranked WHERE rk <= $TopDocs
        |ORDER BY term, score DESC, doc_id""".stripMargin) { (s, dir) =>
      val tf = tfFrame(s, dir)
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      // Probe set: global top-k → TakeOrderedAndProject, then broadcast.
      val qterms = df.orderBy(desc("df"), asc("term")).limit(NQueryTerms)
      val dl = tf.groupBy("doc_id").agg(sum("tf").cast("double").as("dl"))
      // N and avgdl as LAZY 1-row broadcast aggregates (q46 pattern —
      // no driver-side count() double-scan).
      val n = Tables.documents(s, dir).agg(count(lit(1)).cast("double").as("n"))
      val avgdl = dl.agg(avg("dl").as("avgdl"))
      val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      val scored = tf
        .join(broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(n))
        .crossJoin(broadcast(avgdl))
        .withColumn("score",
          gf.roundz(idf * (col("tf") * (K1 + 1.0))
            / (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))), 6))
        .select("term", "doc_id", "score")
      graft.plans.TopKPerKey(scored, Seq("term"),
          Seq(graft.plans.TopKPerKey.desc("score"),
            graft.plans.TopKPerKey.asc("doc_id")), TopDocs)
        .orderBy(asc("term"), desc("score"), asc("doc_id"))
    },

    // T85 — inverted-index posting census: per term, document
    // frequency, total term frequency, and the first PostingPrefix
    // doc ids of the posting list. The posting prefix is selected with
    // the bounded-heap TopKPerKey BEFORE any list aggregation — a
    // term's full posting list is corpus-sized at 100 TB and must
    // never pass through collect_list; the collected list here is
    // ≤ PostingPrefix rows per term by construction.
    QueryDef("q127_posting_census",
      s"""WITH $toksSql, tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), agg AS (
        |  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
        |  FROM tf GROUP BY 1
        |), prefix AS (
        |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |  FROM (
        |    SELECT term, doc_id,
        |      row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
        |    FROM tf
        |  ) WHERE rk <= $PostingPrefix
        |  GROUP BY term
        |)
        |SELECT term, df, tf_total, postings
        |FROM agg JOIN prefix USING (term)
        |ORDER BY term""".stripMargin) { (s, dir) =>
      val tf = tfFrame(s, dir)
      val agg = tf.groupBy("term")
        .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"))
      val prefix = graft.plans.TopKPerKey(tf.select("term", "doc_id"),
          Seq("term"), Seq(graft.plans.TopKPerKey.asc("doc_id")), PostingPrefix)
        .groupBy("term")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .select(col("term"),
          array_join(transform(col("ids"), _.cast("string")), ",").as("postings"))
      agg.join(prefix, "term").orderBy("term")
    },

    // T86 — linear quality-model inference + calibration census:
    // batch scoring of the corpus with a fixed-weight linear model
    // over engineered features (doc length, type/token ratio,
    // stopword ratio, chars-per-token), squashed with a HARD sigmoid
    // (clamp(z/4 + ½)) — piecewise-rational on purpose: exp() differs
    // across libm implementations in the last ulp, while +,×,/ are
    // IEEE-exact, so the score is bit-identical cross-engine. The
    // census (source × score-decile → volume, mean score, mean length)
    // is the calibration table a quality-gate rollout reads. Scale:
    // per-row arithmetic in one codegen'd pass over the scan, then a
    // (source × 10)-bounded aggregate — no joins, no windows.
    QueryDef("q128_quality_scorer",
      """WITH feats AS (
        |  SELECT source, n_chars,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS DOUBLE) AS dl,
        |    CAST(len(list_distinct(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))) AS DOUBLE) AS uniq,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x = 'a' OR x = 'the')) AS DOUBLE) AS stops
        |  FROM documents
        |), scored AS (
        |  SELECT source,
        |    greatest(0.0, least(1.0,
        |      (-2.0 + 0.008 * dl + 1.5 * (uniq / dl) - 3.0 * (stops / dl)
        |        + 0.05 * (CAST(n_chars AS DOUBLE) / dl)) / 4.0 + 0.5)) AS score,
        |    dl
        |  FROM feats WHERE dl > 0
        |), bucketed AS (
        |  SELECT source, CAST(least(floor(score * 10), 9) AS INTEGER) AS decile,
        |    score, dl
        |  FROM scored
        |)
        |SELECT source, decile, count(*) AS n_docs,
        |  round(avg(score), 6) + 0.0 AS avg_score, round(avg(dl), 6) + 0.0 AS avg_dl
        |FROM bucketed GROUP BY 1, 2
        |ORDER BY source, decile""".stripMargin) { (s, dir) =>
      // ONE byte scan per row (native TokenProfile) — the composed
      // tokens/array_distinct/countIn triple would tokenize and
      // materialize arrays three times for counts that need none.
      val prof = graft.functions.tokenProfile(col("text"), Seq("a", "the"))
      val feats = graft.functions
        .fanOutScan(Tables.documents(s, dir), col("doc_id"))
        .select(col("source"), col("n_chars"), prof.as("p"))
        .select(col("source"), col("n_chars"),
          col("p.n_tokens").cast("double").as("dl"),
          col("p.n_distinct").cast("double").as("uniq"),
          col("p.n_stop").cast("double").as("stops"))
      val z = lit(-2.0) + lit(0.008) * col("dl") +
        lit(1.5) * (col("uniq") / col("dl")) -
        lit(3.0) * (col("stops") / col("dl")) +
        lit(0.05) * (col("n_chars").cast("double") / col("dl"))
      val score = greatest(lit(0.0), least(lit(1.0), z / 4.0 + 0.5))
      feats.filter(col("dl") > 0)
        .withColumn("score", score)
        .withColumn("decile", least(floor(col("score") * 10), lit(9)).cast("int"))
        .groupBy("source", "decile")
        .agg(count(lit(1)).as("n_docs"),
          gf.roundz(avg("score"), 6).as("avg_score"),
          gf.roundz(avg("dl"), 6).as("avg_dl"))
        .orderBy("source", "decile")
    },

    // T90 — deterministic weighted sampling (Efraimidis–Spirakis A-Res
    // with hash-derived uniforms, operators/Sampling.weightedSample):
    // q107's stratified carve draws UNIFORMLY; assembling a training
    // mix usually wants length- or quality-WEIGHTED draws. Each doc
    // derives u from a fixed LCG of its id (reproducible, no RNG
    // state), scores ln(u)/n_chars, and the top-5 keys per source win
    // — bigger weights systematically draw better keys, the exact
    // weighted-reservoir semantics. Scale: per-row arithmetic + the
    // two-phase bounded-heap TopKPerKey; the only cross-engine float
    // in the rank is ln(u), and ranks flip only if two keys collide
    // to ~1 ulp (the q46 ln precedent).
    QueryDef("q129_weighted_sample",
      """WITH keyed AS (
        |  SELECT source, doc_id, n_chars,
        |    ln(CAST((doc_id * 1103515245 + 12345) % 2147483648 + 1 AS DOUBLE)
        |       / 2147483649.0) / CAST(n_chars AS DOUBLE) AS skey
        |  FROM documents WHERE n_chars > 0
        |), ranked AS (
        |  SELECT source, doc_id, n_chars, skey,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY skey DESC, doc_id) AS rk
        |  FROM keyed
        |)
        |SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  round(skey, 9) + 0.0 AS skey
        |FROM ranked WHERE rk <= 5
        |ORDER BY source, skey DESC, doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .filter(col("n_chars") > 0)
        .select(col("source"), col("doc_id"), col("n_chars"))
      graft.operators.Sampling
        .weightedSample(docs, "source", "doc_id", "n_chars", 5)
        .select(col("source"), col("doc_id"), col("n_chars"),
          gf.roundz(col("__skey"), 9).as("skey"))
        .orderBy(asc("source"), desc("skey"), asc("doc_id"))
    },

    // T100 — hybrid-ranker fusion via Reciprocal Rank Fusion
    // (Cormack et al. 2009, the standard hybrid-search combiner):
    // the same probe terms ranked by TWO scorers — BM25 (q126's
    // model) and TF·IDF (q46's weighting) — fused per (term, doc) as
    // Σ 1/(60 + rank), top-5 fused docs per term. Ranks are integers
    // and 1/(60+r) is one exact IEEE division, so fused scores are
    // bit-identical cross-engine — fusing RANKS instead of raw scores
    // is exactly why RRF is the production default. Scale shape: ONE
    // shared tf backbone feeds both scorers; each scorer's
    // per-term top-RankDepth comes off the bounded-heap TopKPerKey
    // (corpus-sized posting lists never sort); ranking, the full
    // outer fuse join and the final top-5 all run on
    // (terms × RankDepth)-bounded frames.
    QueryDef("q133_rrf_fusion",
      s"""WITH $toksSql, tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), qterms AS (
        |  SELECT term, df FROM df ORDER BY df DESC, term LIMIT $NQueryTerms
        |), dl AS (
        |  SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY 1
        |), stats AS (
        |  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
        |    (SELECT avg(dl) FROM dl) AS avgdl
        |), bm25 AS (
        |  SELECT tf.term, tf.doc_id,
        |    round(ln((n - df + 0.5) / (df + 0.5) + 1.0)
        |      * (tf * ($K1 + 1.0))
        |      / (tf + $K1 * (1.0 - $B + $B * dl / avgdl)), 6) + 0.0 AS score
        |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id)
        |  CROSS JOIN stats
        |), tfidf AS (
        |  SELECT tf.term, tf.doc_id,
        |    round(tf * ln(n / df), 6) + 0.0 AS score
        |  FROM tf JOIN qterms USING (term) CROSS JOIN stats
        |), ra AS (
        |  SELECT term, doc_id,
        |    row_number() OVER (PARTITION BY term
        |      ORDER BY score DESC, doc_id) AS rk
        |  FROM bm25
        |), rb AS (
        |  SELECT term, doc_id,
        |    row_number() OVER (PARTITION BY term
        |      ORDER BY score DESC, doc_id) AS rk
        |  FROM tfidf
        |), fused AS (
        |  SELECT coalesce(ra.term, rb.term) AS term,
        |    coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        |    round(coalesce(1.0 / ($RrfK + ra.rk), 0.0)
        |      + coalesce(1.0 / ($RrfK + rb.rk), 0.0), 6) + 0.0 AS rrf
        |  FROM (SELECT * FROM ra WHERE rk <= $RankDepth) ra
        |  FULL JOIN (SELECT * FROM rb WHERE rk <= $RankDepth) rb
        |    ON ra.term = rb.term AND ra.doc_id = rb.doc_id
        |), top AS (
        |  SELECT term, doc_id, rrf,
        |    row_number() OVER (PARTITION BY term
        |      ORDER BY rrf DESC, doc_id) AS rk
        |  FROM fused
        |)
        |SELECT term, doc_id, rrf FROM top WHERE rk <= $TopDocs
        |ORDER BY term, rrf DESC, doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = tfFrame(s, dir)
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val qterms = df.orderBy(desc("df"), asc("term")).limit(NQueryTerms)
      val dl = tf.groupBy("doc_id").agg(sum("tf").cast("double").as("dl"))
      val n = Tables.documents(s, dir).agg(count(lit(1)).cast("double").as("n"))
      val avgdl = dl.agg(avg("dl").as("avgdl"))
      val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      val bm25 = tf
        .join(broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(n))
        .crossJoin(broadcast(avgdl))
        .withColumn("score",
          gf.roundz(idf * (col("tf") * (K1 + 1.0))
            / (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))), 6))
        .select("term", "doc_id", "score")
      val tfidf = tf
        .join(broadcast(qterms), "term")
        .crossJoin(broadcast(n))
        .withColumn("score", gf.roundz(col("tf") * log(col("n") / col("df")), 6))
        .select("term", "doc_id", "score")
      // Bounded-heap top-RankDepth per term FIRST, then ranks via a
      // window over the ≤ RankDepth-row frames.
      def ranked(scored: org.apache.spark.sql.DataFrame) =
        graft.plans.TopKPerKey(scored, Seq("term"),
            Seq(graft.plans.TopKPerKey.desc("score"),
              graft.plans.TopKPerKey.asc("doc_id")), RankDepth)
          .withColumn("rk", row_number().over(
            Window.partitionBy("term").orderBy(desc("score"), asc("doc_id"))))
          .select("term", "doc_id", "rk")
      val ra = ranked(bm25)
      val rb = ranked(tfidf)
      val fused = ra.withColumnRenamed("rk", "ra")
        .join(rb.withColumnRenamed("rk", "rb"),
          Seq("term", "doc_id"), "full_outer")
        .select(col("term"), col("doc_id"),
          gf.roundz(coalesce(lit(1.0) / (lit(RrfK) + col("ra")), lit(0.0))
            + coalesce(lit(1.0) / (lit(RrfK) + col("rb")), lit(0.0)), 6)
            .as("rrf"))
      graft.plans.TopKPerKey(fused, Seq("term"),
          Seq(graft.plans.TopKPerKey.desc("rrf"),
            graft.plans.TopKPerKey.asc("doc_id")), TopDocs)
        .orderBy(asc("term"), desc("rrf"), asc("doc_id"))
    },

    // T166 — query-likelihood retrieval with Dirichlet smoothing
    // (Zhai & Lafferty 2001, the language-modeling IR baseline next to
    // q126's BM25): five two-term queries (the probe terms paired in
    // df order), each document scored by
    //   Π_t (tf(t,d) + μ·p(t|C)) / (|d| + μ),  μ = 2000
    // — the PRODUCT form, not the usual Σ log: it is rank-equivalent
    // and every operation is +,×,÷ on exact integers, so scores are
    // bit-identical cross-engine BY CONSTRUCTION (no libm ln in the
    // rank, the q157 stance; rounding is cosmetic, not load-bearing).
    //
    // Scale shape — the smoothing term means every doc scores (a
    // zero-match doc still has Π μ·p_t/(|d|+μ)), but the naive
    // all-docs × queries scan is NOT needed for exact top-k: for
    // tf = 0 the score is STRICTLY DECREASING in |d| (numerators
    // constant), with ties broken by doc_id — so the only zero-match
    // docs that can reach a top-k are the k smallest by (|d| asc,
    // doc_id asc), a query-independent TakeOrderedAndProject. Exact
    // candidates = (union of the query terms' posting lists, a
    // broadcast semi-join off the shared tf backbone) ∪ (those k
    // shortest docs), every frame bounded; the oracle scores ALL
    // docs, so the shortcut's exactness is itself oracle-gated.
    QueryDef("q183_query_likelihood",
      s"""WITH $toksSql, tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), qt AS (
        |  SELECT term, row_number() OVER (ORDER BY df DESC, term) AS idx
        |  FROM (SELECT term, df FROM df ORDER BY df DESC, term LIMIT $NQueryTerms)
        |), qp AS (
        |  SELECT term, CAST((idx - 1) // 2 AS BIGINT) AS qid,
        |    (idx - 1) % 2 + 1 AS pos
        |  FROM qt
        |), cf AS (
        |  SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1
        |), ctot AS (
        |  SELECT CAST(sum(tf) AS BIGINT) AS ctot FROM tf
        |), qm AS (
        |  SELECT qid,
        |    max(CASE WHEN pos = 1 THEN cf.cf END) AS cf1,
        |    max(CASE WHEN pos = 2 THEN cf.cf END) AS cf2
        |  FROM qp JOIN cf USING (term) GROUP BY qid
        |), dl AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dln FROM tf GROUP BY 1
        |), m AS (
        |  SELECT d.doc_id, q.qid, d.dln,
        |    CAST(coalesce(max(CASE WHEN qp.pos = 1 THEN tf.tf END), 0) AS BIGINT) AS tf1,
        |    CAST(coalesce(max(CASE WHEN qp.pos = 2 THEN tf.tf END), 0) AS BIGINT) AS tf2
        |  FROM dl d
        |  CROSS JOIN (SELECT DISTINCT qid FROM qp) q
        |  LEFT JOIN qp ON qp.qid = q.qid
        |  LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.term = qp.term
        |  GROUP BY d.doc_id, q.qid, d.dln
        |), scored AS (
        |  SELECT qid, doc_id,
        |    ((tf1 + $DirichletMu * (CAST(cf1 AS DOUBLE) / ctot)) / (dln + $DirichletMu))
        |    * ((tf2 + $DirichletMu * (CAST(cf2 AS DOUBLE) / ctot)) / (dln + $DirichletMu)) AS s
        |  FROM m JOIN qm USING (qid) CROSS JOIN ctot
        |), ranked AS (
        |  SELECT qid, doc_id, s,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id) AS rk
        |  FROM scored
        |)
        |SELECT qid, doc_id, round(s, 9) + 0.0 AS score
        |FROM ranked WHERE rk <= $TopDocs
        |ORDER BY qid, score DESC, doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = tfFrame(s, dir)
      val dfF = tf.groupBy("term").agg(count(lit(1)).as("df"))
      // 10-row probe frame → (term, qid, pos); the window runs over 10
      // rows, never the vocabulary.
      val qp = dfF.orderBy(desc("df"), asc("term")).limit(NQueryTerms)
        .withColumn("idx",
          row_number().over(Window.orderBy(desc("df"), asc("term"))))
        .select(col("term"), expr("CAST((idx - 1) div 2 AS BIGINT)").as("qid"),
          expr("(idx - 1) % 2 + 1").as("pos"))
      val cf = tf.join(broadcast(qp.select("term")), "term")
        .groupBy("term").agg(sum("tf").as("cf"))
      val ctot = tf.agg(sum("tf").as("ctot")) // lazy 1-row broadcast
      val qm = qp.join(cf, "term")
        .groupBy("qid")
        .agg(max(when(col("pos") === 1, col("cf"))).as("cf1"),
          max(when(col("pos") === 2, col("cf"))).as("cf2"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dln"))
      // Matched candidates off the posting lists (broadcast semi-join).
      val matched = tf.join(broadcast(qp), "term")
        .groupBy("doc_id", "qid")
        .agg(coalesce(max(when(col("pos") === 1, col("tf"))), lit(0L)).as("tf1"),
          coalesce(max(when(col("pos") === 2, col("tf"))), lit(0L)).as("tf2"))
      // Zero-match candidates: the TopDocs shortest docs — the only
      // zero-match rows that can reach any query's top-k (score
      // strictly decreasing in dln at tf = 0, doc_id breaks dln ties).
      val shortest = dl.orderBy(asc("dln"), asc("doc_id")).limit(TopDocs)
        .crossJoin(broadcast(qm.select("qid")))
        .select(col("doc_id"), col("qid"), lit(0L).as("tf1"), lit(0L).as("tf2"))
      // A shortest doc can also be matched: keep the real tfs.
      val cand = matched.unionByName(shortest)
        .groupBy("doc_id", "qid")
        .agg(max("tf1").as("tf1"), max("tf2").as("tf2"))
      val mu = lit(DirichletMu)
      val sExpr =
        ((col("tf1") + mu * (col("cf1").cast("double") / col("ctot")))
          / (col("dln") + mu)) *
        ((col("tf2") + mu * (col("cf2").cast("double") / col("ctot")))
          / (col("dln") + mu))
      val scored = cand
        .join(dl, "doc_id")
        .join(broadcast(qm), "qid")
        .crossJoin(broadcast(ctot))
        .select(col("qid"), col("doc_id"), sExpr.as("s"))
      graft.plans.TopKPerKey(scored, Seq("qid"),
          Seq(graft.plans.TopKPerKey.desc("s"),
            graft.plans.TopKPerKey.asc("doc_id")), TopDocs)
        .select(col("qid"), col("doc_id"), gf.roundz(col("s"), 9).as("score"))
        .orderBy(asc("qid"), desc("score"), asc("doc_id"))
    }
  )

  /** RRF constants: standard k = 60 (Cormack et al.), fuse over each
    * scorer's top-10. `lazy`: referenced from `defs` above. */
  private lazy val RrfK = 60
  private lazy val RankDepth = 10

  /** Dirichlet smoothing mass (Zhai & Lafferty's recommended range is
    * 500–10000; 2000 is the standard default). Written `2000.0` so
    * both engines parse the identical double literal. */
  private lazy val DirichletMu = 2000.0
}
