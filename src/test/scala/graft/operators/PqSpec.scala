package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: exactness on separable data (where PQ should
  * be lossless and ADC equals true squared L2), reconstruction-error
  * monotonicity in the codebook size, layout independence of training
  * and encoding, ADC top-k agreement with exact search, and the
  * m-bytes-per-vector memory contract. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random-ish doubles (no RNG in specs).
  private def noise(i: Int, j: Int): Double =
    (((i * 7919 + j * 104729) % 2000) - 1000) / 1000.0

  /** Vectors whose subspaces each take one of `levels` canonical
    * values — exactly representable by a codebook with ksub >= levels. */
  private def separable(n: Int, m: Int, dsub: Int, levels: Int)
      : Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val v = new Array[Float](m * dsub)
      for (j <- 0 until m) {
        val lvl = (i * (j + 3)) % levels // varies per subspace
        for (t <- 0 until dsub)
          v(j * dsub + t) = (lvl * 10 + t).toFloat
      }
      (i.toLong, v)
    }

  test("separable data round-trips EXACTLY: encode -> decode is the " +
    "identity and ADC equals true squared L2") {
    val m = 4; val dsub = 2; val levels = 3
    val data = separable(60, m, dsub, levels)
    val df = data.toDF("vec_id", "embedding")
    val cb = Pq.train(df, m, ksub = 4, trainN = 60, iters = 4)
    cb.dim shouldBe m * dsub

    val codes = Pq.encode(df, cb).select(col("vec_id"), col("pq_code"))
      .as[(Long, Array[Byte])].collect().toMap
    codes.values.foreach(_.length shouldBe m) // m bytes per vector
    data.foreach { case (id, v) =>
      val rec = cb.decode(codes(id))
      rec.zip(v).foreach { case (r, x) => r shouldBe x.toDouble +- 1e-9 }
    }

    // ADC against query = data(0): with a lossless codebook the ADC
    // distance IS the true squared L2 (up to the 6-decimal rounding).
    val q = Seq(data.head).toDF("vec_id", "embedding")
    val top = Pq.topK(Pq.encode(df, cb), q, cb, k = 10)
      .select("vec_id", "adc").as[(Long, Double)].collect().toMap
    val qv = data.head._2
    top.foreach { case (id, adc) =>
      val v = data.find(_._1 == id).get._2
      val exact = v.zip(qv).map { case (a, b) =>
        (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
      adc shouldBe exact +- 1e-5
    }
  }

  test("reconstruction MSE is monotone non-increasing in ksub") {
    val m = 4; val dsub = 4
    val data = (0 until 300).map(i =>
      (i.toLong, Array.tabulate(m * dsub)(j => noise(i, j).toFloat)))
    val df = data.toDF("vec_id", "embedding")
    def mse(ksub: Int): Double = {
      val cb = Pq.train(df, m, ksub, trainN = 300, iters = 6)
      val codes = Pq.encode(df, cb).select(col("vec_id"), col("pq_code"))
        .as[(Long, Array[Byte])].collect().toMap
      data.map { case (id, v) =>
        val rec = cb.decode(codes(id))
        rec.zip(v).map { case (r, x) =>
          (r - x.toDouble) * (r - x.toDouble) }.sum
      }.sum / data.size
    }
    val e2 = mse(2); val e8 = mse(8); val e32 = mse(32)
    e8 should be <= e2 + 1e-12
    e32 should be <= e8 + 1e-12
    e32 should be < e2 * 0.9 // and strictly better end to end
  }

  test("training and encoding are layout-independent: repartitioned " +
    "input yields byte-identical codes") {
    val m = 2; val dsub = 3
    val data = (0 until 120).map(i =>
      (i.toLong, Array.tabulate(m * dsub)(j => noise(i, j).toFloat)))
    val a = data.toDF("vec_id", "embedding")
    val b = data.toDF("vec_id", "embedding").repartition(7)
    val cbA = Pq.train(a, m, ksub = 8, trainN = 120, iters = 5)
    val cbB = Pq.train(b, m, ksub = 8, trainN = 120, iters = 5)
    cbA.cents.zip(cbB.cents).foreach { case (x, y) =>
      java.lang.Double.doubleToLongBits(x) shouldBe
        java.lang.Double.doubleToLongBits(y) // bit-identical
    }
    val codesA = Pq.encode(a, cbA).select("vec_id", "pq_code")
      .as[(Long, Array[Byte])].collect().toMap
    val codesB = Pq.encode(b, cbB).select("vec_id", "pq_code")
      .as[(Long, Array[Byte])].collect().toMap
    codesA.keySet shouldBe codesB.keySet
    codesA.foreach { case (id, c) => c.toSeq shouldBe codesB(id).toSeq }
  }

  test("ADC top-k finds the true nearest neighbors on clustered data") {
    // 4 well-separated cluster centers, small within-cluster noise:
    // PQ cells align with clusters, so ADC ranking must put the
    // query's own cluster first.
    val m = 4; val dsub = 4; val dim = m * dsub
    val data = (0 until 200).map { i =>
      val c = i % 4
      val v = Array.tabulate(dim)(j =>
        (c * 100.0 + noise(i, j)).toFloat) // centers 0, 100, 200, 300
      (i.toLong, v)
    }
    val df = data.toDF("vec_id", "embedding")
    val cb = Pq.train(df, m, ksub = 8, trainN = 200, iters = 6)
    val codes = Pq.encode(df, cb)
    val q = Seq(data(1)).toDF("vec_id", "embedding") // cluster 1
    val got = Pq.topK(codes, q, cb, k = 20)
      .select("vec_id").as[Long].collect()
    got.length shouldBe 20
    // every returned neighbor is in the query's cluster (id % 4 == 1)
    got.foreach(id => (id % 4) shouldBe 1L)
  }

  test("IVFADC with nprobe = nlist (probe everything) equals the full " +
    "PQ scan — the composition prunes, never re-ranks") {
    val m = 4; val dsub = 4; val dim = m * dsub
    val data = (0 until 200).map { i =>
      val c = i % 4
      val v = Array.tabulate(dim)(j => (c * 100.0 + noise(i, j)).toFloat)
      (i.toLong, v)
    }
    val df = data.toDF("vec_id", "embedding")
    val cb = Pq.train(df, m, ksub = 8, trainN = 200, iters = 6)
    val q = Seq(data(1), data(2)).toDF("vec_id", "embedding")
    val full = Pq.topK(Pq.encode(df, cb), q, cb, k = 10)
      .select(col("qid"), col("vec_id"), col("adc"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val ivf = Pq.ivfAdcTopK(df, q, cb, k = 10,
        nCentroids = 4, nprobe = 4, trainN = 200, iters = 2)
      .select(col("qid"), col("vec_id"), col("adc"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    ivf.toSeq shouldBe full.toSeq
  }

  test("IVFADC with nprobe=1 on angle-separated data scans only the " +
    "query's own bucket and finds its twin") {
    // 4 mutually ORTHOGONAL directions (one hot block each): cosine
    // separates them perfectly, and with one corpus vector per
    // direction the coarse quantizer's seeds ARE the directions —
    // fully deterministic
    val m = 4; val dsub = 4; val dim = m * dsub
    val corpus = (0 until 4).map { c =>
      (c.toLong, Array.tabulate(dim)(j =>
        if (j / dsub == c) 100.0f else 0.0f))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val cb = Pq.train(df, m, ksub = 4, trainN = 4, iters = 4)
    val q = corpus.map { case (id, v) => (id + 100L, v) }
      .toDF("vec_id", "embedding")
    val got = Pq.ivfAdcTopK(df, q, cb, k = 1,
        nCentroids = 4, nprobe = 1, trainN = 4, iters = 2)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    got shouldBe corpus.map { case (id, _) => (id + 100L) -> id }.toMap
  }

  test("residual-coded IVFADC (ivfPqBuild/ivfPqProbe): within-cell " +
    "displacement coding ranks the true angular cluster first even " +
    "probing every bucket") {
    // 4 ORTHOGONAL directions (cosine-separable — the coarse
    // quantizer's metric), 10 members each at magnitudes 100..109.
    // Seeds are the 4 smallest md5(id)s (trainCentroids' own rule), so
    // pin ONE seed per direction by assigning directions in md5 order.
    val m = 4; val dsub = 4; val dim = m * dsub
    val ids = (0L until 40L)
    val md5Order = ids.sortBy(id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    val dirOf = md5Order.zipWithIndex.map { case (id, r) => id -> r % 4 }.toMap
    val data = ids.map { id =>
      val d = dirOf(id)
      val mag = 100.0f + (id % 10)
      (id, Array.tabulate(dim)(j => if (j / dsub == d) mag else 0.0f))
    }
    val df = data.toDF("vec_id", "embedding")
    val (cent, cb, codes) = Pq.ivfPqBuild(df, m, ksub = 8,
      nCentroids = 4, pqTrainN = 40, centTrainN = 40, iters = 4)
    // fresh query along direction 1: true neighbors are ALL direction-1
    // members (cross-direction distance² ≥ 100² + 100² vs ≤ 9² within)
    val q = Seq((999L, Array.tabulate(dim)(j =>
      if (j / dsub == 1) 100.0f else 0.0f))).toDF("vec_id", "embedding")
    val got = Pq.ivfPqProbe(codes, cent, q, cb, k = 10, nprobe = 4)
      .select("vec_id").as[Long].collect()
    got.length shouldBe 10
    got.foreach(id => dirOf(id) shouldBe 1)
    graft.CacheRegistry.drain() // the build's tracked residual cache
  }

  test("residual-coded IVFADC on orthogonal one-per-bucket data finds " +
    "each query's twin with nprobe=1") {
    val m = 4; val dsub = 4; val dim = m * dsub
    val corpus = (0 until 4).map { c =>
      (c.toLong, Array.tabulate(dim)(j =>
        if (j / dsub == c) 100.0f else 0.0f))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val (cent, cb, codes) = Pq.ivfPqBuild(df, m, ksub = 4,
      nCentroids = 4, pqTrainN = 4, centTrainN = 4, iters = 2)
    val q = corpus.map { case (id, v) => (id + 100L, v) }
      .toDF("vec_id", "embedding")
    val got = Pq.ivfPqProbe(codes, cent, q, cb, k = 1, nprobe = 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    got shouldBe corpus.map { case (id, _) => (id + 100L) -> id }.toMap
    graft.CacheRegistry.drain() // the build's tracked residual cache
  }

  test("deterministic ranking: ties break by id and reruns are " +
    "bit-identical") {
    val m = 2; val dsub = 2
    // many identical vectors -> identical codes -> ADC ties
    val data = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(m * dsub)(_ => 1.0f)))
    val df = data.toDF("vec_id", "embedding")
    val cb = Pq.train(df, m, ksub = 2, trainN = 50, iters = 2)
    val codes = Pq.encode(df, cb)
    val q = Seq((999L, Array.tabulate(m * dsub)(_ => 1.0f)))
      .toDF("vec_id", "embedding")
    val r1 = Pq.topK(codes, q, cb, k = 5)
      .select(col("vec_id"), col("rank").cast("long")).as[(Long, Long)].collect().sortBy(_._2)
    val r2 = Pq.topK(codes, q, cb, k = 5)
      .select(col("vec_id"), col("rank").cast("long")).as[(Long, Long)].collect().sortBy(_._2)
    r1.toSeq shouldBe r2.toSeq
    r1.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L, 3L, 4L) // id-ordered ties
  }

  test("null embeddings: excluded from train sample and from topK " +
    "candidates (a null ADC would otherwise sort FIRST under asc)") {
    val m = 2; val dsub = 2
    val good = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(m * dsub)(d => (i * (d + 1)).toFloat)))
    val bad = Seq((900L, null.asInstanceOf[Array[Float]]))
    val df = (good ++ bad).toDF("vec_id", "embedding")
    val cb = Pq.train(df, m, ksub = 4, trainN = 40, iters = 3) // no NPE
    val q = Seq((999L, Array.tabulate(m * dsub)(_ => 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Pq.topK(Pq.encode(df, cb), q, cb, k = 5)
      .select("vec_id").as[Long].collect()
    top should not contain 900L
    top should have length 5
  }

  test("bad shapes fail loudly: wrong dim, bad ksub, oversized trainN") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    an[IllegalArgumentException] should be thrownBy
      Pq.train(df, m = 2, ksub = 4, trainN = 16) // 3 % 2 != 0
    an[IllegalArgumentException] should be thrownBy
      Pq.train(df, m = 1, ksub = 300, trainN = 1024) // ksub > 256
    an[IllegalArgumentException] should be thrownBy
      Pq.train(df, m = 1, ksub = 4, trainN = 100000) // collect bound
    val cb = Pq.Codebook(2, 2, 2, new Array[Double](8))
    an[IllegalArgumentException] should be thrownBy
      cb.decode(Array[Byte](1)) // code length != m
  }
}
