package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-quality guard: the invariants PERF.md's audits rely on, held
  * by `sbt test` instead of by manual `.explain` review. Plans are
  * BUILT (not executed) against sf0.001, so a regression — a join that
  * degenerates to a cartesian product, a filter that stops reaching
  * the scan — fails fast here before any bench run sees it. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val d = SparkEntry.allDefs.find(_.name == name)
      .getOrElse(fail(s"missing $name"))
    d.build(spark, dir).queryExecution.executedPlan.toString
  }

  test("NO query plans a cartesian product") {
    // The only tolerated nested-loop shape is a BROADCAST one-row side
    // (q46's N frame, q23's max-SK frame) — an unbounded
    // CartesianProduct is always a defect at scale.
    SparkEntry.allDefs.foreach { d =>
      val p = d.build(spark, dir).queryExecution.executedPlan.toString
      withClue(s"${d.name}: ") {
        p should not include "CartesianProduct"
      }
      spark.catalog.clearCache()
    }
  }

  test("q01: the shipdate filter reaches the parquet scan, schema pruned") {
    val p = plan("q01_pricing_summary")
    p should include("PushedFilters: [IsNotNull(l_shipdate)")
    // only the referenced columns are read, not all 16 (the plan
    // string truncates scan metadata, so match the schema's head)
    p should include("ReadSchema: struct<l_quantity:double,l_extendedprice:double")
    (p should not).include("l_orderkey") // an unreferenced column
  }

  test("q08: global top-k plans as TakeOrderedAndProject, never a full sort") {
    plan("q08_topk_customers") should include("TakeOrderedAndProject")
  }

  test("q61: head vocabulary is a bounded top-k and a broadcast membership join") {
    val p = plan("q61_oov_rate")
    p should include("TakeOrderedAndProject")
    p should include("BroadcastHashJoin")
  }

  test("q62: the benchmark shingle side broadcasts; the corpus side equi-joins") {
    val p = plan("q62_decontaminate")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin" // benchmark side must never shuffle-sort
  }
}
