package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => arrSize}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.{functions => gf}
import graft.star.{DimensionUpsert, SkStrategy, StarSchemaBuilder}

/** Property-based invariants (SURVEY §5-4) over scalacheck generators,
  * sampled with a fixed seed (the scalatest-scalacheck bridge artifact
  * is not on the offline classpath, so sampling is driven directly).
  * Cases are batched into single Spark jobs where per-case jobs would
  * be too slow. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], cases: Int = 12)(check: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(check)
    }

  private def forAll[A, B](genA: Gen[A], genB: Gen[B])(
      check: (A, B) => Unit): Unit =
    (0 until 8).foreach { i =>
      for {
        a <- genA.apply(Gen.Parameters.default, Seed(42L + i))
        b <- genB.apply(Gen.Parameters.default, Seed(1042L + i))
      } check(a, b)
    }

  test("parseRelativeTime is total: never throws on arbitrary strings, null only without digits+unit") {
    val gen = Gen.listOfN(120, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("hours ago", "days ago", "hour", "day", "yesterday",
        "just posted", "", " ", "3", "27", "-5", "\t")))
    forAll(gen) { (strings: List[String]) =>
      val rows = strings.toDF("t")
        .select($"t", gf.parseRelativeTime($"t",
          lit("2026-01-01 00:00:00").cast("timestamp")).as("ts"))
        .collect()
      rows.foreach { r =>
        val s = Option(r.getString(0)).getOrElse("").toLowerCase
        val hasUnit = s.contains("hour") || s.contains("day")
        val hasDigit = s.exists(_.isDigit)
        val parsed = !r.isNullAt(1)
        if (parsed) assert(hasUnit && hasDigit, s"parsed '$s' unexpectedly")
        if (!hasUnit) assert(!parsed, s"'$s' without unit must be null")
      }
    }
  }

  test("SK strategies agree on arbitrary distinct key sets") {
    val gen = Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(16)))
    forAll(gen) { (keys: List[String]) =>
      val src = keys.toDF("k")
      val a = StarSchemaBuilder
        .buildDim(src, col("k"), "sk", "name", SkStrategy.PartitionedOffset)
        .orderBy("sk").as[(Long, String)].collect().toSeq
      val b = StarSchemaBuilder
        .buildDim(src, col("k"), "sk", "name", SkStrategy.GlobalRowNumber)
        .orderBy("sk").as[(Long, String)].collect().toSeq
      a shouldBe b
      a.map(_._1) shouldBe (1L to a.length)
    }
  }

  test("upsert idempotence and monotonicity on arbitrary batches") {
    val kv = Gen.listOf(for {
      k <- Gen.oneOf("a", "b", "c", "d", "e", "f")
      v <- Gen.alphaNumStr.map(_.take(6))
    } yield (k, v))
    forAll(kv, kv) { (first: List[(String, String)], second: List[(String, String)]) =>
      val empty = Seq.empty[(Long, String, String)].toDF("sk", "k", "v")
      val d1 = DimensionUpsert.upsert(empty, first.toDF("k", "v"), Seq("k"), "sk")
      val d2 = DimensionUpsert.upsert(d1, second.toDF("k", "v"), Seq("k"), "sk")
      val d2again = DimensionUpsert.upsert(d2, second.toDF("k", "v"), Seq("k"), "sk")
      // idempotent
      d2.exceptAll(d2again).count() shouldBe 0
      d2again.exceptAll(d2).count() shouldBe 0
      // original rows never change
      d1.exceptAll(d2).count() shouldBe 0
      // dense keys
      val sks = d2.select("sk").as[Long].collect().sorted.toSeq
      sks shouldBe (1L to sks.length)
    }
  }

  test("shingle count law: distinct w-shingles <= max(0, tokens - w + 1)") {
    val gen = Gen.listOfN(60, Gen.listOf(
      Gen.oneOf("x", "y", "z", "w1", "w2")).map(_.mkString(" ")))
    forAll(gen) { (texts: List[String]) =>
      val rows = texts.toDF("t")
        .select(arrSize(gf.tokens($"t")).as("n"),
          arrSize(array_distinct(gf.shingles(gf.tokens($"t"), 3))).as("s"))
        .as[(Int, Int)].collect()
      rows.foreach { case (n, s) =>
        s should be <= math.max(0, n - 2)
        if (n >= 3) s should be >= 1
      }
    }
  }

  test("packing laws on arbitrary corpora: partition, budget, order, greediness") {
    import graft.operators.Packing
    val gen = for {
      n <- Gen.choose(1, 60)
      toks <- Gen.listOfN(n, Gen.choose(0L, 700L))
      budget <- Gen.choose(200L, 900L)
    } yield (toks, budget)
    forAll(gen, cases = 8) { case (toks: List[Long], budget: Long) =>
      implicit val s = spark
      val rows = toks.zipWithIndex.map { case (t, i) =>
        (i.toLong, s"g${i % 2}", t)
      }
      val got = Packing.packSequences(
          rows.toDF("doc_id", "source", "n_tokens"),
          maxTokens = budget, shardSize = 25)
        .as[Packing.PackedDoc].collect()
      // every doc lands exactly once
      got.map(_.doc_id).sorted shouldBe rows.map(_._1).toArray
      got.groupBy(d => (d.source, d.shard, d.pack_id)).foreach { case (_, ds) =>
        val sorted = ds.sortBy(_.doc_id)
        // multi-doc packs respect the budget
        if (ds.length > 1) ds.map(_.n_tokens).sum should be <= budget
        // pack positions are dense 1..m in id order
        sorted.map(_.pack_pos).toSeq shouldBe (1L to ds.length)
      }
      // greediness: a doc opens a new pack only because it had to —
      // its tokens would not have fit the previous pack of its cell
      got.groupBy(d => (d.source, d.shard)).foreach { case (_, cell) =>
        val byId = cell.sortBy(_.doc_id)
        byId.zip(byId.drop(1)).foreach { case (prev, cur) =>
          if (cur.pack_id != prev.pack_id) {
            val prevPackSum = cell.filter(_.pack_id == prev.pack_id)
              .map(_.n_tokens).sum
            assert(prevPackSum + cur.n_tokens > budget,
              s"doc ${cur.doc_id} opened pack ${cur.pack_id} although it fit")
          }
        }
      }
    }
  }
}
