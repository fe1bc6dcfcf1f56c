package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** q120 (data-quality audit) and q121 (TextRank) on crafted inputs
  * where every violation count / rank value is computable by hand (the
  * DuckDB oracle gates both on the synthetic tables; these pin the
  * SEMANTICS — orphan directionality, PK dup counting, damped weighted
  * power iteration). */
class AuditGraphSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).getOrElse(fail(s"missing $name"))

  test("q120: every rule counts its own violations against its own total") {
    val dir = Files.createTempDirectory("audit").toString
    // 3 orders: keys 1, 1 (dup PK), 2. Order key 2's customer (99) is
    // missing (orphan child); customer 3 has no orders (unreferenced).
    Seq((1L, 10L, "O", 100.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (1L, 10L, "O", 100.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "1-URGENT"),
      (2L, 99L, "F", 50.0, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    // customers 10 (referenced, blank name) and 3 (never orders).
    Seq((10L, "  ", 1, 0.0, "BUILDING"), (3L, "ok", 1, 0.0, "AUTOMOBILE"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    // 3 lineitems: order 1 ok ×2 (one with qty 0), order 7 orphan.
    Seq((1L, 100L, 1L, 1, 5.0), (1L, 200L, 1L, 2, 0.0), (7L, 100L, 1L, 1, 3.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    // parts 100 (ordered) and 500 (never ordered).
    Seq((100L, "widget"), (500L, "dust"))
      .toDF("p_partkey", "p_name")
      .coalesce(1).write.parquet(s"$dir/part.parquet")
    // 2 docs, one whitespace-only.
    Seq((1L, "hello world", "en", "s", 11L), (2L, "   ", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val got = q("q120_quality_audit").build(spark, dir)
      .select("check_name", "violations", "total")
      .as[(String, Long, Long)].collect()
      .map { case (n, v, t) => n -> ((v, t)) }.toMap
    got("pk_orders_duplicate_keys") shouldBe ((1L, 3L))
    got("fk_lineitem_orphan_orderkey") shouldBe ((1L, 3L))
    got("fk_orders_orphan_custkey") shouldBe ((1L, 3L))
    got("coverage_customers_no_orders") shouldBe ((1L, 2L))
    got("coverage_parts_never_ordered") shouldBe ((1L, 2L))
    got("domain_customer_blank_name") shouldBe ((1L, 2L))
    got("domain_lineitem_nonpos_qty") shouldBe ((1L, 3L))
    got("domain_documents_empty_text") shouldBe ((1L, 2L))
  }

  test("q121: three damped power iterations on a hand-computed 3-node graph") {
    val dir = Files.createTempDirectory("textrank").toString
    // Bigrams: "a b" (from doc1), "b a" (doc2), "a c" (doc3) →
    // edges a→b w1, b→a w1, a→c w1; outw a=2, b=1;
    // norm: a→b .5, a→c .5, b→a 1. Node c is a sink (no out-edges;
    // its rank is simply never propagated — the TextRank convention).
    Seq((1L, "a b"), (2L, "b a"), (3L, "a c")).map { case (id, t) =>
      (id, t, "en", "s", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = q("q121_textrank").build(spark, dir)
      .as[(String, Double)].collect().toSeq
    // r1: a = .15+.85·1 = 1.0; b = c = .15+.85·.5 = .575
    // r2: a = .15+.85·.575 = .63875; b = c = .15+.85·.5·1.0 = .575
    // r3: a = .15+.85·.575 = .63875; b = c = .15+.85·.5·.63875 = .421469
    got shouldBe Seq(("a", 0.63875), ("b", 0.421469), ("c", 0.421469))
  }
}
