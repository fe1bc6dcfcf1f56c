package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import graft.SparkSpec

class RollingHashWindowsSpec extends SparkSpec {
  import spark.implicits._

  private val Mask = 0xffffffffL

  /** Positional (non-rolling) reference: recompute each window. */
  private def reference(text: String, w: Int): Seq[Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) Seq.empty
    else (0 to toks.length - w).map { i =>
      (i until i + w).foldLeft(0L) { (h, j) =>
        (h * RollingHashWindows.Base +
          RollingHashWindows.tokenHash(toks(j))) & Mask
      }
    }
  }

  private def viaExpr(texts: Seq[String], w: Int): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(CatalystBridge.column(
        RollingHashWindows(CatalystBridge.expr(trim($"t")), w)).as("h"))
      .as[Seq[Long]].collect().toSeq

  test("rolling computation is bit-identical to positional recomputation") {
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "a a a a a", // identical tokens → identical window hashes
      "one two three", // shorter than w=4 → empty
      "x y z w", // exactly one window
      (1 to 200).map(i => s"tok$i").mkString(" "))
    viaExpr(texts, 4) shouldBe texts.map(reference(_, 4))
    viaExpr(texts, 2) shouldBe texts.map(reference(_, 2))
  }

  test("fuzz parity: 200 random token streams, varied window widths") {
    // Deterministic fuzz over token shapes (repeats, unicode, single
    // chars, long tokens) and whitespace runs; w ∈ {2, 3, 5, 8}.
    val rnd = new scala.util.Random(11)
    val vocab = IndexedSeq("a", "bb", "tok", "世界", "é", "x1",
      "longertoken", "a", "Z9", "😀")
    val seps = IndexedSeq(" ", "  ", "\t", " \n ")
    val texts = Seq.tabulate(200) { _ =>
      (0 until rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(seps(rnd.nextInt(seps.length)))
    }
    for (w <- Seq(2, 3, 5, 8))
      viaExpr(texts, w) shouldBe texts.map(reference(_, w))
  }

  test("hashes stay within 32 bits and shifted content shifts hashes") {
    val Seq(a, b) = viaExpr(Seq("p q r s t", "q r s t u"), 4)
    all(a) should (be >= 0L and be <= Mask)
    // overlapping windows of shifted docs agree where content agrees
    a(1) shouldBe b(0) // both hash "q r s t"
  }
}
