package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.{functions => gf}

/** FastCDC content-defined chunking: lossless reassembly, length
  * bounds, the insertion-locality property that distinguishes CDC from
  * fixed-size blocking, determinism across layouts, and edge inputs. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-text (no RNG): words drawn from a small
    * vocabulary by an LCG-ish index walk. */
  private def text(seed: Int, words: Int): String = {
    val vocab = Array("spark", "scan", "merge", "join", "filter", "sort",
      "group", "window", "stream", "batch", "key", "value", "row", "col")
    val sb = new StringBuilder
    var x = seed * 2654435761L
    var i = 0
    while (i < words) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(vocab(((x >>> 33) % vocab.length).toInt))
      sb.append(' ')
      i += 1
    }
    sb.toString
  }

  private def chunksOf(s: String, maskBits: Int = 6, minLen: Int = 16,
      maxLen: Int = 256): Seq[String] =
    Seq(Tuple1(s)).toDF("t")
      .select(gf.cdcChunks(col("t"), maskBits, minLen, maxLen).as("c"))
      .as[Seq[String]].collect().head

  test("chunks concatenate back to the input, byte for byte") {
    for (seed <- 1 to 5) {
      val s = text(seed, 400)
      chunksOf(s).mkString shouldBe s
    }
  }

  test("every chunk respects [minLen, maxLen] except the tail " +
    "(and a surrogate deferral may add one char)") {
    val s = text(7, 1000)
    val cs = chunksOf(s, maskBits = 5, minLen = 10, maxLen = 80)
    cs.size should be > 3
    cs.dropRight(1).foreach { c =>
      c.length should be >= 10
      c.length should be <= 81
    }
    cs.last.length should be <= 81
  }

  test("maxLen forces cuts on boundary-free input (constant bytes)") {
    val s = "a" * 1000
    val cs = chunksOf(s, maskBits = 20, minLen = 16, maxLen = 64)
    // gear of 'a' repeated almost surely never masks to 0 at 20 bits
    // within 64 chars — every cut is the forced one
    cs.dropRight(1).foreach(_.length shouldBe 64)
    cs.mkString shouldBe s
  }

  test("INSERTION LOCALITY: an edit reshapes only its neighborhood — " +
    "the chunk stream re-synchronizes (fixed-size blocking does not)") {
    val a = text(11, 1200)
    val edit = "INSERTED RUN OF NEW CONTENT "
    val p = a.length / 4
    val b = a.substring(0, p) + edit + a.substring(p)
    val ca = chunksOf(a)
    val cb = chunksOf(b)
    // common suffix: walk back while chunks match
    var k = 0
    while (k < math.min(ca.size, cb.size) &&
      ca(ca.size - 1 - k) == cb(cb.size - 1 - k)) k += 1
    // at least 60% of a's chunks survive verbatim at the tail alone
    k.toDouble / ca.size should be > 0.6
    // and the common prefix also survives up to the edit point
    var pfx = 0
    while (pfx < math.min(ca.size, cb.size) && ca(pfx) == cb(pfx)) pfx += 1
    (pfx + k).toDouble / ca.size should be > 0.8
    // the fixed-size contrast: 64-char blocks of a and b share NO
    // blocks after the edit point (every boundary shifted)
    val fa = a.grouped(64).toSeq
    val fb = b.grouped(64).toSeq
    var fk = 0
    while (fk < math.min(fa.size, fb.size) &&
      fa(fa.size - 1 - fk) == fb(fb.size - 1 - fk)) fk += 1
    // edit length (28) is not a multiple of 64, so tails never realign
    fk shouldBe 0
  }

  test("deterministic across layouts and runs; distributed batch " +
    "equals local") {
    val rows = (1 to 40).map(i => (i.toLong, text(i, 150)))
    val a = rows.toDF("id", "t")
      .select(col("id"), gf.cdcChunks(col("t")).as("c"))
      .as[(Long, Seq[String])].collect().toMap
    val b = rows.toDF("id", "t").repartition(7)
      .select(col("id"), gf.cdcChunks(col("t")).as("c"))
      .as[(Long, Seq[String])].collect().toMap
    a.keySet shouldBe b.keySet
    a.foreach { case (id, cs) => cs shouldBe b(id) }
    rows.foreach { case (id, t) => a(id).mkString shouldBe t }
  }

  test("surrogate pairs are never split") {
    // astral chars (surrogate pairs) sprinkled through the text
    val astral = new String(Character.toChars(0x1F600))
    val s = (1 to 50).map(i => text(i, 10) + astral).mkString
    for (cs <- Seq(chunksOf(s, 4, 8, 40), chunksOf(s, 3, 4, 16))) {
      cs.mkString shouldBe s
      cs.foreach { c =>
        Character.isLowSurrogate(c.charAt(0)) shouldBe false
        Character.isHighSurrogate(c.charAt(c.length - 1)) shouldBe false
      }
    }
  }

  test("empty and null inputs stay sane") {
    val got = Seq(Tuple1(""): Tuple1[String], Tuple1(null.asInstanceOf[String]))
      .toDF("t")
      .select(gf.cdcChunks(col("t")).as("c"))
      .collect()
    got(0).getSeq[String](0) shouldBe Seq.empty
    got(1).isNullAt(0) shouldBe true
  }

  test("analysis-time rejects: bad mask bits, inverted length bounds, " +
    "non-string input") {
    val df = Seq(Tuple1("x")).toDF("t")
    an[Exception] should be thrownBy
      df.select(gf.cdcChunks(col("t"), maskBits = 0)).collect()
    an[Exception] should be thrownBy
      df.select(gf.cdcChunks(col("t"), minLen = 50, maxLen = 10)).collect()
    an[Exception] should be thrownBy
      Seq(Tuple1(1L)).toDF("t").select(gf.cdcChunks(col("t"))).collect()
  }
}
