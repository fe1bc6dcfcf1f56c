package graft.queries

import org.apache.spark.sql.functions._
import graft.{functions => gf}
import graft.Tables
import graft.star.{DimensionUpsert, SkStrategy, StarSchemaBuilder}

/** Star-schema assembly queries — the reference's core ETL re-expressed
  * Spark-first (reference `dags/spark_etl_script.py:90-189` and the
  * legacy pandas populator's incremental upsert).
  *
  * Scale notes: dims are tiny relative to the fact → every dim join is
  * an explicit `broadcast()`; surrogate keys use SkStrategy.Auto
  * (distributed two-pass numbering above the size threshold, identical
  * output to the reference's global row_number on distinct keys); the
  * bridge is explode → broadcast join → distinct (one shuffle, on the
  * bridge's own key).
  */
object StarQueries {

  /** Vocabulary for skill tagging over `documents.text` — substring
    * semantics exactly like the reference's 51-term vocabulary
    * (`dags/test_extraction.py:108-127`). */
  val skillVocab: Seq[String] = Seq(
    "spark", "join", "filter", "window", "stream", "hash",
    "sort", "merge", "vector", "query", "batch", "scan")

  private def vocabValues: String =
    skillVocab.sorted.map(t => s"('$t')").mkString(", ")

  /** DuckDB initcap emulation (DuckDB has no initcap). */
  private def initcapSql(c: String): String =
    s"array_to_string(list_transform(string_split(lower(trim($c)), ' '), w -> upper(w[1:1]) || w[2:]), ' ')"

  /** q24/q174's shared oracle: global dense row_number SKs over each
    * dim's natural-key order and the fact's o_orderkey order. BOTH
    * strategies must reproduce it bitwise: every SK orderCol here is
    * UNIQUE per row (distinct dim keys; o_orderkey is the orders PK),
    * so PartitionedOffset's range-partitioned two-pass numbering is
    * value-identical to the global window — which is exactly what
    * makes q174 a real correctness gate for the scalable path. */
  private lazy val factBuildSql: String =
    s"""WITH dim_customer AS (
         |  SELECT row_number() OVER (ORDER BY customer_name) AS customer_sk, customer_name
         |  FROM (SELECT DISTINCT upper(trim(c_name)) AS customer_name FROM customer
         |        WHERE c_name IS NOT NULL)
         |), dim_priority AS (
         |  SELECT row_number() OVER (ORDER BY priority_name) AS priority_sk, priority_name
         |  FROM (SELECT DISTINCT ${initcapSql("o_orderpriority")} AS priority_name FROM orders
         |        WHERE o_orderpriority IS NOT NULL)
         |), dim_status AS (
         |  SELECT row_number() OVER (ORDER BY status_name) AS status_sk, status_name
         |  FROM (SELECT DISTINCT upper(trim(o_orderstatus)) AS status_name FROM orders
         |        WHERE o_orderstatus IS NOT NULL)
         |), dim_date AS (
         |  SELECT DISTINCT CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS BIGINT) AS date_sk,
         |         CAST(o_orderdate AS DATE) AS full_date
         |  FROM orders WHERE o_orderdate IS NOT NULL
         |)
         |SELECT row_number() OVER (ORDER BY o.o_orderkey) AS job_posting_pk,
         |       o.o_orderkey, dc.customer_sk, dp.priority_sk, dst.status_sk,
         |       dd.date_sk, CAST(1 AS BIGINT) AS job_count
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |LEFT JOIN dim_customer dc ON upper(trim(c.c_name)) = dc.customer_name
         |LEFT JOIN dim_priority dp ON ${initcapSql("o.o_orderpriority")} = dp.priority_name
         |LEFT JOIN dim_status dst ON upper(trim(o.o_orderstatus)) = dst.status_name
         |LEFT JOIN dim_date dd ON CAST(o.o_orderdate AS DATE) = dd.full_date
         |ORDER BY job_posting_pk""".stripMargin

  /** q24/q174's shared engine body — the 6-join star assembly with
    * every surrogate key built under `strategy`. */
  private def factBuild(s: org.apache.spark.sql.SparkSession, dir: String,
      strategy: SkStrategy.Value): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val orders = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val dimCustomer = StarSchemaBuilder.buildDim(
        cust, gf.normName(col("c_name")), "customer_sk", "customer_name",
        strategy)
      val dimPriority = StarSchemaBuilder.buildDim(
        orders, gf.normTitle(col("o_orderpriority")), "priority_sk",
        "priority_name", strategy)
      val dimStatus = StarSchemaBuilder.buildDim(
        orders, gf.normName(col("o_orderstatus")), "status_sk",
        "status_name", strategy)
      val dimDate = StarSchemaBuilder.buildDateDim(orders, col("o_orderdate"))
        .select("date_sk", "full_date")
      // Resolve customer_sk onto the CUSTOMER table first, then join
      // the fact on the integer custkey. dim_customer is O(customers)
      // (unbounded at scale — no broadcast hint; AQE decides), and
      // resolving it here means the name-keyed shuffle is
      // customer-sized; joining it after the fact join would shuffle
      // the whole FACT by normalized name. Inner join on custkey
      // preserves the reference's orders⟕customer existence filter.
      val custWithSk = cust
        .join(dimCustomer,
          gf.normName(col("c_name")) === col("customer_name"), "left")
        .select(col("c_custkey"), col("customer_sk"))
      val resolved = orders
        .join(custWithSk, col("o_custkey") === col("c_custkey"))
        .join(broadcast(dimPriority), gf.normTitle(col("o_orderpriority")) === col("priority_name"), "left")
        .join(broadcast(dimStatus), gf.normName(col("o_orderstatus")) === col("status_name"), "left")
        .join(broadcast(dimDate), to_date(col("o_orderdate")) === col("full_date"), "left")
        // Project down to the 5 output columns BEFORE the PK pass:
        // withSurrogateKey persists its input and sorts it by the PK
        // order — done on the full join width that's a ~10× wider
        // persist + sort than the fact actually needs.
        .select(
          col("o_orderkey"), col("customer_sk"), col("priority_sk"),
          col("status_sk"), col("date_sk").cast("long").as("date_sk"))
      // Dense PK over the FACT — the one place where a global window
      // would be the 100 TB cliff; PartitionedOffset keeps it parallel.
      StarSchemaBuilder.withSurrogateKey(
          resolved, Seq("o_orderkey"), "job_posting_pk", strategy)
        .select(
          col("job_posting_pk"), col("o_orderkey"), col("customer_sk"),
          col("priority_sk"), col("status_sk"), col("date_sk"),
          lit(1L).as("job_count"))
        // Contract ORDER BY without a second range exchange: the SK
        // pass already leaves the fact partition-ordered by
        // job_posting_pk (withSurrogateKey's documented guarantee), so
        // an in-partition sort yields the identical total order for
        // any partition-ordered reader. orderBy here re-sampled and
        // re-shuffled all 15 M rows at sf10x for an order they were
        // already in — the q24 profile's third term (PERF #26).
        .sortWithinPartitions("job_posting_pk")
  }

  val defs: Seq[QueryDef] = Seq(
    // J10/S12: incremental append-only dim upsert (populate_star_schema
    // lines 6-36): existing dim keeps its rows+SKs, only new natural
    // keys appended with SKs continuing from max.
    QueryDef("q23_dim_upsert",
      s"""WITH existing AS (
         |  SELECT row_number() OVER (ORDER BY c_name) AS customer_sk, c_name, c_mktsegment
         |  FROM (SELECT DISTINCT c_name, c_mktsegment FROM customer WHERE c_custkey % 3 = 0)
         |), incoming AS (
         |  SELECT c_name, min(c_mktsegment) AS c_mktsegment FROM customer
         |  WHERE c_name IS NOT NULL GROUP BY c_name
         |), newrows AS (
         |  SELECT row_number() OVER (ORDER BY i.c_name)
         |           + (SELECT coalesce(max(customer_sk), 0) FROM existing) AS customer_sk,
         |         i.c_name, i.c_mktsegment
         |  FROM incoming i
         |  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.c_name = i.c_name)
         |)
         |SELECT customer_sk, c_name, c_mktsegment FROM existing
         |UNION ALL
         |SELECT customer_sk, c_name, c_mktsegment FROM newrows
         |ORDER BY customer_sk""".stripMargin) { (s, dir) =>
      val cust = Tables.customer(s, dir)
      val existing = StarSchemaBuilder.withSurrogateKey(
        cust.filter(col("c_custkey") % 3 === 0)
          .select("c_name", "c_mktsegment").distinct(),
        Seq("c_name"), "customer_sk", SkStrategy.Auto)
        .select("customer_sk", "c_name", "c_mktsegment")
      val incoming = cust.select("c_name", "c_mktsegment")
      DimensionUpsert.upsert(existing, incoming, Seq("c_name"), "customer_sk")
        .orderBy("customer_sk")
    },

    // J1-J6/W1/P5: full fact assembly — dims built with normalized
    // natural keys, fact rows resolved to SKs via (broadcast) left
    // joins on computed keys, dense PK, literal measure
    // (spark_etl_script.py:157-173).
    QueryDef("q24_fact_build", factBuildSql) { (s, dir) =>
      // Bit-compat gate: Auto picks the reference-shaped global
      // window on toy dims, PartitionedOffset past the threshold.
      factBuild(s, dir, SkStrategy.Auto)
    },

    // The SCALABLE-PATH twin (VERDICT r11 bonus): same oracle, same
    // star assembly, but every SK — all four dims AND the fact PK —
    // FORCED through PartitionedOffset's range-partitioned two-pass
    // numbering. Auto's threshold means toy-scale runs exercise the
    // global-window path almost everywhere, so until this row the
    // scalable numbering had only plan-shape specs, not an
    // oracle-gated correctness row. Unique orderCols make the two
    // strategies value-identical (see factBuildSql doc), so one SQL
    // gates both.
    QueryDef("q174_fact_build_scalable", factBuildSql) { (s, dir) =>
      factBuild(s, dir, SkStrategy.PartitionedOffset)
    },

    // G1/J7/J8: skills bridge — vocabulary tagging (substring semantics,
    // test_extraction.py:119-127) → explode → skill-dim join → distinct
    // (spark_etl_script.py:137-179).
    QueryDef("q25_skill_bridge",
      s"""WITH vocab(skill_name) AS (VALUES $vocabValues),
         |tagged AS (
         |  SELECT d.doc_id, v.skill_name FROM documents d
         |  JOIN vocab v ON contains(lower(d.text), v.skill_name)
         |), dim_skill AS (
         |  SELECT row_number() OVER (ORDER BY skill_name) AS skill_sk, skill_name
         |  FROM (SELECT DISTINCT skill_name FROM tagged)
         |)
         |SELECT DISTINCT t.doc_id, ds.skill_sk
         |FROM tagged t JOIN dim_skill ds ON t.skill_name = ds.skill_name
         |ORDER BY doc_id, skill_sk""".stripMargin) { (s, dir) =>
      // Persisted: the dim derivation AND the bridge join both consume
      // the tagged frame — without it the vocabulary substring scan
      // over the corpus runs twice (the C1 cache-dims+fact pattern;
      // Bench/Verify clear the cache between queries).
      val tagged = graft.CacheRegistry.persistTracked(Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(gf.extractTags(col("text"), skillVocab)).as("skill_name")),
        graft.CacheRegistry.DataSized) // ≤ vocab hits per doc, vocab is fixed
      val dimSkill = StarSchemaBuilder.withSurrogateKey(
        tagged.select("skill_name").distinct(),
        Seq("skill_name"), "skill_sk", SkStrategy.Auto)
      tagged.join(broadcast(dimSkill), "skill_name")
        .select("doc_id", "skill_sk").distinct()
        .orderBy("doc_id", "skill_sk")
    },

    // A1/O1 over the bridge: top skills (superset query id=7 analog).
    QueryDef("q26_skill_counts",
      s"""WITH vocab(skill_name) AS (VALUES $vocabValues)
         |SELECT v.skill_name, count(*) AS cnt
         |FROM documents d
         |JOIN vocab v ON contains(lower(d.text), v.skill_name)
         |GROUP BY 1 ORDER BY cnt DESC, skill_name LIMIT 15""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(gf.extractTags(col("text"), skillVocab)).as("skill_name"))
        .groupBy("skill_name").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("skill_name")).limit(15)
    }
  )
}
