package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q70's exact cardinality profile vs the one-pass HLL twin: the
  * sketch must track exact distinct counts within its configured
  * relative error on real data, or it is not a usable stand-in at the
  * scales where exact count(DISTINCT) stops being shippable. */
class CardinalitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def profiles = {
    val exactDef = SparkEntry.allDefs.find(_.name == "q70_vocab_profile")
      .getOrElse(fail("q70 missing"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))
      }.toMap
    (toMap(exactDef.build(spark, dir)),
      toMap(TextQueries.cardinalityProfileApprox(spark, dir)))
  }

  test("HLL distinct counts track exact within 5% per source; totals are exact") {
    val (exact, approx) = profiles
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (src, (dToks, nToks, dDocs)) =>
      val (aToks, aTotal, aDocs) = approx(src)
      aTotal shouldBe nToks // plain count is exact in both
      withClue(s"$src distinct toks: ") {
        math.abs(aToks - dToks).toDouble / dToks should be <= 0.05
      }
      withClue(s"$src distinct docs: ") {
        math.abs(aDocs - dDocs).toDouble / dDocs should be <= 0.05
      }
    }
  }

  test("a coarser sketch (rsd=0.1) still lands within 25% — error degrades, never breaks") {
    val (exact, _) = profiles
    TextQueries.cardinalityProfileApprox(spark, dir, rsd = 0.1)
      .collect().foreach { r =>
        val (dToks, _, _) = exact(r.getString(0))
        withClue(s"${r.getString(0)} coarse distinct toks: ") {
          math.abs(r.getLong(1) - dToks).toDouble / dToks should be <= 0.25
        }
      }
  }
}
