package graft.operators

import graft.SparkSpec

class BpeBatchFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def refTrain(freq: Map[String, Long], k: Int)
      : Seq[(String, String, Long)] = {
    def splitCp(w: String): List[String] = {
      val out = List.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n); i += n
      }
      out.result()
    }
    var words: Map[List[String], Long] =
      freq.groupMapReduce { case (w, _) => splitCp(w) }(_._2)(_ + _)
    val merges = Seq.newBuilder[(String, String, Long)]
    var continue = true; var rank = 0
    while (rank < k && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((l, r, c))
        words = words.groupMapReduce { case (syms, _) =>
          BpeTrainer.applyMerge(syms, l, r).toList }(_._2)(_ + _)
        rank += 1
      }
    }
    merges.result()
  }

  test("deep-merge fuzz: two-path token collisions, batched == sequential") {
    val rnd = new scala.util.Random(5150)
    var checked = 0
    (0 until 6).foreach { trial =>
      val freq = (0 until 40).map { _ =>
        val w = (0 until 2 + rnd.nextInt(8))
          .map(_ => "ab"(rnd.nextInt(2))).mkString
        w -> (1L + rnd.nextInt(5))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val want = refTrain(freq, 12)
      val got = BpeTrainer.trainDistributed(
          freq.toSeq.toDF("word", "cnt"), 12, batchSize = 4)
        .map(m => (m.left, m.right, m.count))
      withClue(s"trial $trial freq=$freq: ") { got shouldBe want }
      checked += 1
    }
    checked shouldBe 6
  }
}
