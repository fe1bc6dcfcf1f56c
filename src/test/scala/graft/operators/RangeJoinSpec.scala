package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val ranges = Seq(
    ("a", 0.0, 10.0),
    ("b", 10.0, 20.0),
    ("c", 5.0, 15.0), // overlaps a and b
    ("d", 100.0, 200.0))
    .toDF("range_id", "lo", "hi")

  private val points = Seq(
    (1L, 5.0), (2L, 10.0), (3L, 14.999), (4L, 50.0), (5L, 199.999))
    .toDF("point_id", "v")

  private def matches(bucketWidth: Double): Set[(Long, String)] =
    RangeJoin.join(points, ranges, "v", "lo", "hi", bucketWidth)
      .select("point_id", "range_id").as[(Long, String)].collect().toSet

  private val expected = Set(
    (1L, "a"), (1L, "c"), // 5 ∈ [0,10) and [5,15)
    (2L, "b"), (2L, "c"), // 10 ∈ [10,20) and [5,15) — hi exclusive for a
    (3L, "b"), (3L, "c"),
    (5L, "d")) // 4 matches nothing

  test("bucketed range join returns exactly the containment pairs") {
    matches(bucketWidth = 10.0) shouldBe expected
  }

  test("result is bucket-width invariant (replication factor changes, answer doesn't)") {
    matches(2.5) shouldBe expected
    matches(50.0) shouldBe expected
  }

  test("the join is an equi-join on the bucket, not a nested loop") {
    val plan = RangeJoin.join(points, ranges, "v", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
