package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

import graft.SparkSpec

/** Misra–Gries invariants, held against exact counts on real corpus
  * tokens and on an adversarial skew: no false negatives above the
  * N/(k+1) bar, counts bracketed by [count_min, count_min + err], and
  * stability of the guarantee (not the raw counters) across
  * partitionings — the merge path is what makes the sketch shippable. */
class FreqSketchSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def sketch(df: DataFrame, colName: String, k: Int): Map[String, (Long, Long)] =
    df.agg(CatalystBridge.column(
        FreqSketch(CatalystBridge.expr(col(colName)), k).toAggregateExpression())
        .as("s"))
      .select(explode(col("s")).as("hh"))
      .select("hh.item", "hh.count_min", "hh.err")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private lazy val toks = graft.Tables.documents(spark, dir)
    .select(explode(graft.functions.tokens(col("text"))).as("tok"))

  private lazy val exact: Map[String, Long] =
    toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every token above the N/(k+1) bar is present (no false negatives)") {
    val k = 32
    val n = exact.values.sum
    val got = sketch(toks, "tok", k)
    val mustHave = exact.filter { case (_, c) => c > n / (k + 1) }.keySet
    mustHave.diff(got.keySet) shouldBe empty
  }

  test("counts are bracketed: count_min <= true <= count_min + err") {
    val got = sketch(toks, "tok", 32)
    got.foreach { case (item, (cMin, err)) =>
      val truth = exact(item)
      withClue(s"$item: ") {
        cMin should be <= truth
        truth should be <= (cMin + err)
      }
    }
  }

  test("the guarantee survives any partitioning (merge correctness)") {
    val k = 16
    val n = exact.values.sum
    val mustHave = exact.filter { case (_, c) => c > n / (k + 1) }.keySet
    Seq(1, 3, 17).foreach { parts =>
      val got = sketch(toks.repartition(parts), "tok", k)
      withClue(s"parts=$parts: ") {
        mustHave.diff(got.keySet) shouldBe empty
        got.foreach { case (item, (cMin, err)) =>
          cMin should be <= exact(item)
          exact(item) should be <= (cMin + err)
        }
      }
    }
  }

  test("adversarial skew: one dominant item over many singletons") {
    val data = (Seq.fill(5000)("hot") ++ (0 until 20000).map(i => s"cold_$i")).toDF("v")
    val got = sketch(data.repartition(8), "v", 8)
    got.keySet should contain ("hot")
    val (cMin, err) = got("hot")
    cMin should be <= 5000L
    5000L should be <= (cMin + err)
  }

  test("exact recovery composition: semi-join the candidates, recount") {
    // The production pattern: sketch → broadcast candidate set → one
    // exact pass. Result must equal the true top-5 exactly.
    val k = 32
    val candidates = sketch(toks, "tok", k).keySet.toSeq.toDF("tok")
    val recovered = toks.join(broadcast(candidates), "tok")
      .groupBy("tok").count()
      .orderBy(desc("count"), asc("tok")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val trueTop = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(5)
    recovered.toSeq shouldBe trueTop
  }

  test("late-arriving heavy hitter survives saturated counters (MG drain)") {
    // Regression for the prune bug: without subtracting minC from the
    // survivors, saturated counters never drain and a heavy item that
    // arrives AFTER the sketch fills is evicted on every arrival.
    // k=2; a*10, b*10, then h*11 over N=31: true(h)=11 > N/3 ≈ 10.3,
    // so classic Misra–Gries MUST report h.
    val data = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(11)("h")).toDF("v")
    val got = sketch(data.coalesce(1), "v", 2)
    got.keySet should contain ("h")
    val (cMin, err) = got("h")
    cMin should be <= 11L
    11L should be <= (cMin + err)
  }

  test("items longer than 64 KiB survive serialization (shuffle path)") {
    // writeUTF would throw UTFDataFormatException here; the raw-bytes
    // codec must round-trip a >65535-byte token through the merge path.
    val big = "x" * 70000
    val data = (Seq.fill(6)(big) ++ Seq("a", "b")).toDF("v")
    val got = sketch(data.repartition(4), "v", 4)
    got.keySet should contain (big)
    val (cMin, err) = got(big)
    cMin should be <= 6L
    6L should be <= (cMin + err)
  }

  test("non-string input is rejected at analysis") {
    val bad = intercept[Exception] {
      Seq(1L, 2L).toDF("v")
        .agg(CatalystBridge.column(
          FreqSketch(CatalystBridge.expr(col("v")), 4).toAggregateExpression()))
        .collect()
    }
    bad.getMessage.toLowerCase should include ("string")
  }
}
