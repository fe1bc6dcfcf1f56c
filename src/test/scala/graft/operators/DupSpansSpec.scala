package graft.operators

import graft.SparkSpec

class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  // Shared boilerplate: an exact 6-token run present in docs 1 and 2
  // (different surrounding text), so with K=4 its three 4-windows are
  // duplicated and must merge into ONE span of 6 tokens per doc.
  private val shared = "alpha beta gamma delta epsilon zeta"

  private lazy val docs = Seq(
    (1L, "s1", s"one two $shared three four"),
    (2L, "s1", s"five $shared six seven eight nine"),
    (3L, "s2", "totally unique words that nothing else repeats here"),
    // doc 4 repeats a phrase WITHIN itself only — never cross-doc.
    (4L, "s2", "spam spam spam spam spam spam spam spam"),
    (5L, "s2", "spam spam spam spam spam spam spam spam unique tail")
  ).toDF("doc_id", "source", "text")

  test("adjacent duplicated windows merge into one maximal span") {
    val spans = DupSpans.spans(docs, K)
      .select("doc_id", "start_pos", "end_pos", "n_windows")
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(_._1)
    // doc 1: shared run is tokens 3..8 → windows at 3,4,5 → one span
    spans(1L).map(t => (t._2, t._3, t._4)) shouldBe Array((3, 8, 3L))
    // doc 2: shared run is tokens 2..7 → windows at 2,3,4 → one span
    spans(2L).map(t => (t._2, t._3, t._4)) shouldBe Array((2, 7, 3L))
    // doc 3: nothing duplicated
    spans.get(3L) shouldBe None
  }

  test("within-doc-only repetition is NOT a cross-doc span, cross-doc repetition is") {
    // docs 4 and 5 share the all-'spam' windows, so both get spans —
    // but a corpus holding doc 4 alone must produce none.
    val solo = DupSpans.spans(docs.filter($"doc_id" === 4L), K)
    solo.count() shouldBe 0L
    val both = DupSpans.spans(docs, K)
      .filter($"doc_id".isin(4L, 5L))
      .select("doc_id", "start_pos", "end_pos")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    // doc 4: 8 spam tokens, windows 1..5 all duplicated → span 1..8
    both(0) shouldBe ((4L, 1, 8))
    // doc 5: 8 spam tokens then 'unique tail' → span 1..8
    both(1) shouldBe ((5L, 1, 8))
  }

  test("a gap wider than k splits spans; spans stay disjoint") {
    val filler = (1 to 10).map(i => s"f$i").mkString(" ")
    val two = Seq(
      (10L, "s", s"$shared $filler $shared"),
      (11L, "s", s"$shared and entirely different middle text $shared")
    ).toDF("doc_id", "source", "text")
    val spans = DupSpans.spans(two, K)
      .select("doc_id", "start_pos", "end_pos")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted).toMap
    // doc 10: shared at 1..6 and again at 17..22 → two spans
    spans(10L) shouldBe Array((1, 6), (17, 22))
    // disjointness within every doc
    spans.values.foreach { ss =>
      ss.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 > e1)
        case _ =>
      }
    }
  }

  test("span detection is partition-layout independent") {
    val a = DupSpans.spans(docs, K)
      .select("doc_id", "start_pos", "end_pos")
      .as[(Long, Int, Int)].collect().sorted
    val b = DupSpans.spans(docs.repartition(7), K)
      .select("doc_id", "start_pos", "end_pos")
      .as[(Long, Int, Int)].collect().sorted
    b shouldBe a
  }
}
