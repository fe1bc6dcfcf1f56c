package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mini-batch k-means (Sculley 2010) over the [[Embeddings.KMeansState]]
  * lifetime-sums state: determinism, sequential-reference equality,
  * batch-order sensitivity (the documented one-pass contract), and the
  * real foreachBatch wiring. */
class StreamingKMeansSpec extends SparkSpec {
  import spark.implicits._

  private def mkBatch(ids: Range, cluster: Int => Int) =
    ids.map { i =>
      val c = cluster(i)
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1.0f + (i % 30) * 0.01f
      base(c * 2 + 1) = 0.5f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")

  /** Driver-side reference: the same assign + fixed-point fold, row by
    * row per batch, in plain Scala. */
  private def reference(batches: Seq[Seq[(Long, Seq[Float])]], k: Int)
      : Seq[(Int, Long, Seq[Long])] = {
    val S = Embeddings.KMeansScale
    val first = batches.head
    val seeds = first
      .sortBy { case (id, _) =>
        (org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString), id)
      }
      .take(k).map(_._2.map(_.toDouble).toArray)
    var st = seeds.zipWithIndex.map { case (c, i) =>
      (i, 1L, c.map(x => math.floor(x * S).toLong))
    }
    batches.foreach { rows =>
      val cents = st.map { case (cl, n, s) =>
        (cl, s.map(_.toDouble / (n * S)))
      }
      val adds = rows.map { case (_, ef) =>
        val e = ef.map(_.toDouble).toArray
        val best = cents.minBy { case (cl, c) =>
          val xx = e.foldLeft(0.0)((a, x) => a + x * x)
          val xc = e.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)
          val cc = c.foldLeft(0.0)((a, x) => a + x * x)
          (xx - 2.0 * xc + cc, cl)
        }._1
        (best, e)
      }
      st = st.map { case (cl, n, s) =>
        val mine = adds.filter(_._1 == cl).map(_._2)
        val merged = s.clone()
        mine.foreach(e => (0 until merged.length).foreach(i =>
          merged(i) += math.floor(e(i) * S).toLong))
        (cl, n + mine.size, merged)
      }
    }
    st.map { case (cl, n, s) => (cl, n, s.toSeq) }
  }

  test("kmeansInit + kmeansUpdate equal the sequential reference bit-for-bit") {
    val b1 = (0 until 30).map { i =>
      val c = if (i < 10) 0 else if (i < 20) 1 else 2
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1.0f + (i % 30) * 0.01f
      base(c * 2 + 1) = 0.5f
      (i.toLong, base.toSeq)
    }
    val b2 = (30 until 60).map { i =>
      val c = i % 3
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1.0f + (i % 30) * 0.01f
      base(c * 2 + 1) = 0.5f
      (i.toLong, base.toSeq)
    }
    val st1 = Embeddings.kmeansInit(b1.toDF("vec_id", "embedding"), k = 3)
    val st2 = Embeddings.kmeansUpdate(st1, b2.toDF("vec_id", "embedding"))
    val got = st2.clusters.map { case (cl, n, s) => (cl, n, s.toSeq) }.toSeq
    got shouldBe reference(Seq(b1, b2), k = 3)
  }

  test("updates are bit-identical across batch partitionings") {
    val b1 = mkBatch(0 until 30, _ % 3)
    val b2 = mkBatch(30 until 90, i => (i / 30) % 3)
    val a = Embeddings.kmeansUpdate(
      Embeddings.kmeansInit(b1.repartition(7), k = 3), b2.repartition(5))
    val b = Embeddings.kmeansUpdate(
      Embeddings.kmeansInit(b1.coalesce(1), k = 3), b2.coalesce(1))
    a.clusters.map { case (cl, n, s) => (cl, n, s.toSeq) } shouldBe
      b.clusters.map { case (cl, n, s) => (cl, n, s.toSeq) }
  }

  test("foreachBatch wiring: the streaming fold equals the same updates run by hand") {
    implicit val sqlCtx = spark.sqlContext
    val rows1 = (0 until 30).map(i => (i.toLong, Seq.tabulate(8)(j =>
      if (j == (i % 3) * 2) 1.0f else 0.05f)))
    val rows2 = (30 until 60).map(i => (i.toLong, Seq.tabulate(8)(j =>
      if (j == (i % 3) * 2) 1.0f else 0.05f)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val states = new ConcurrentLinkedQueue[Embeddings.KMeansState]()
    @volatile var st: Option[Embeddings.KMeansState] = None
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          st = Some(st match {
            case None    => Embeddings.kmeansInit(batch, k = 3)
            case Some(s) => Embeddings.kmeansUpdate(s, batch)
          })
          states.add(st.get)
        }
        ()
      }
      .start()
    mem.addData(rows1)
    q.processAllAvailable()
    mem.addData(rows2)
    q.processAllAvailable()
    q.stop()

    val byHand = Embeddings.kmeansUpdate(
      Embeddings.kmeansInit(rows1.toDF("vec_id", "embedding"), k = 3),
      rows2.toDF("vec_id", "embedding"))
    st.get.clusters.map { case (cl, n, s) => (cl, n, s.toSeq) } shouldBe
      byHand.clusters.map { case (cl, n, s) => (cl, n, s.toSeq) }
    states.size shouldBe 2
  }

  test("empty inputs reject loudly instead of failing deep in analysis") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Embeddings.kmeansInit(empty, k = 2)
    }.getMessage should include("empty first batch")
    intercept[IllegalArgumentException] {
      Embeddings.kmeansFit(empty, k = 2, iters = 1)
    }.getMessage should include("empty corpus")
  }

  test("model centroids are the lifetime means; counts cover seeds + members") {
    val b = mkBatch(0 until 30, _ % 3)
    val st = Embeddings.kmeansInit(b, k = 3)
    // 30 batch rows + 3 unit-weight seed priors.
    st.clusters.map(_._2).sum shouldBe 33L
    val m = st.model
    m.k shouldBe 3
    m.centroids.foreach { case (cl, c) =>
      val (_, n, s) = st.clusters.find(_._1 == cl).get
      c shouldBe s.map(_.toDouble / (n * Embeddings.KMeansScale))
    }
  }
}
