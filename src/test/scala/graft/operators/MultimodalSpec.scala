package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import Multimodal.{MediaRecord, StubCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val records = Seq(
    MediaRecord(1L, "image", Array[Byte](0, 1, 2, 3, -1), "raw", 0, 0),
    MediaRecord(2L, "audio", Array[Byte](), "raw", 0, 0),
    MediaRecord(3L, "video", Array.tabulate(256)(_.toByte), "raw", 0, 0))

  test("decodeFeatures preserves ids and computes byte stats per record") {
    implicit val s = spark
    val got = Multimodal.decodeFeatures(records.toDS())
      .collect().sortBy(_.media_id)
    got.map(_.media_id) shouldBe Array(1L, 2L, 3L)
    got(0).n_bytes shouldBe 5L
    got(1).n_bytes shouldBe 0L
    got(1).histogram.sum shouldBe 0L
    // 256 distinct byte values → perfectly uniform 16-bin histogram
    got(2).histogram.toSeq shouldBe Seq.fill(16)(16L)
    // histogram mass equals byte count
    got(0).histogram.sum shouldBe 5L
  }

  test("decode is deterministic and partition-count preserving") {
    implicit val s = spark
    val ds = records.toDS().repartition(3)
    val a = Multimodal.decodeFeatures(ds)
    a.rdd.getNumPartitions shouldBe 3
    a.collect().sortBy(_.media_id).map(_.checksum) shouldBe
      Multimodal.decodeFeatures(ds).collect().sortBy(_.media_id).map(_.checksum)
  }

  test("sampleChunks takes n evenly spaced slices") {
    val df = Seq(("0123456789")).toDF("t")
      .select(Multimodal.sampleChunks(encode($"t", "UTF-8"), 3, 2).as("chunks"))
    val got = df.select(transform($"chunks", c => decode(c, "UTF-8")).as("s"))
      .as[Seq[String]].collect().head
    got shouldBe Seq("01", "45", "89")
  }

  test("resizeStub deterministically downsamples to the target size, small payloads untouched") {
    implicit val s = spark
    val got = Multimodal.resizeStub(records.toDS(), targetBytes = 64)
      .collect().sortBy(_.media_id)
    got(0).payload shouldBe records(0).payload // 5 bytes <= 64: unchanged
    got(2).payload.length shouldBe 64
    got(2).format should endWith(";resized")
    // deterministic
    Multimodal.resizeStub(records.toDS(), 64).collect().sortBy(_.media_id)
      .apply(2).payload shouldBe got(2).payload
  }

  test("mediaFromDocuments wraps text as binary payloads with metadata") {
    implicit val s = spark
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
    val got = Multimodal.mediaFromDocuments(docs).collect().head
    got.media_id shouldBe 1L
    got.payload shouldBe "hello".getBytes("UTF-8")
    got.kind shouldBe "image"
  }
}
