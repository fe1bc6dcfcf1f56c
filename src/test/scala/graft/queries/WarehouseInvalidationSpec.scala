package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

/** Session-materialized warehouse tables must key on the CORPUS, not
  * the corpus PATH (VERDICT r11 item 2): a long-lived session (or a
  * warehouse shared across sessions — exactly how bench windows
  * behave) serving a corpus regenerated in place at the same path must
  * rebuild, never silently read the previous generation's frames.
  * The mechanism is [[Similarity.dirFingerprint]] mixed into every
  * memoized table name, plus [[Similarity.dropStaleGenerations]] GC
  * in the build paths. */
class WarehouseInvalidationSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("dirFingerprint changes when a file in the corpus is rewritten") {
    val dir = Files.createTempDirectory("graft-fp").toString
    writeDocs(dir, Seq((1L, "a b"), (2L, "b c")))
    val fp1 = Similarity.dirFingerprint(spark, dir)
    fp1 should fullyMatch regex "[0-9a-f]{10}"
    // Same listing → same fingerprint (pure function of the listing).
    Similarity.dirFingerprint(spark, dir) shouldBe fp1
    writeDocs(dir, Seq((1L, "a b"), (2L, "b c"), (3L, "c d plus extra")))
    Similarity.dirFingerprint(spark, dir) should not be fp1
  }

  test("regenerating the corpus at the same path rebuilds shared tables") {
    val dir = Files.createTempDirectory("graft-inval").toString
    // Generation 1: bigram "x y" dominates.
    writeDocs(dir, Seq((1L, "x y x y x y"), (2L, "x y q r")))
    val q = graft.SparkEntry.queries("q86_bigram_lm")
    val top1 = q(spark, dir).select("bigram").as[String].head()
    top1 shouldBe "x y"
    val gen1Tbl = Similarity.indexName(spark, "graft_bigrams", dir)
    assert(spark.catalog.tableExists(gen1Tbl))

    // Generation 2: SAME PATH, different corpus — "m n" dominates.
    // (Different sizes guarantee a listing change even within mtime
    // resolution.)
    writeDocs(dir, Seq((1L, "m n m n m n m n m n"), (2L, "m n s t u v")))
    val top2 = q(spark, dir).select("bigram").as[String].head()
    top2 shouldBe "m n" // stale graft_bigrams would still say "x y"

    // The superseded generation's table was GC'd by the rebuild.
    val gen2Tbl = Similarity.indexName(spark, "graft_bigrams", dir)
    gen2Tbl should not be gen1Tbl
    assert(spark.catalog.tableExists(gen2Tbl))
    assert(!spark.catalog.tableExists(gen1Tbl))
  }

  test("dropStaleGenerations sweeps orphaned on-disk generations too") {
    // A previous SESSION's superseded table is invisible to the fresh
    // in-memory catalog but its managed location still occupies the
    // warehouse — the sweep must delete it from disk as well.
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(wh,
      "graft_orphantest_x_f0123456789")
    fs.mkdirs(orphan)
    Similarity.dropStaleGenerations(spark, "graft_orphantest_x",
      "graft_orphantest_x_fabcdefabcd")
    assert(!fs.exists(orphan), "orphaned generation dir must be swept")
  }

  test("IVF index rebuilds when embeddings are regenerated in place") {
    val dir = Files.createTempDirectory("graft-ivf-inval").toString
    def writeEmb(seed: Int, n: Int): Unit =
      (1 to n).map { i =>
        (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7 + seed) % 13)
          .toFloat / 13f))
      }.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    writeEmb(seed = 0, n = 24)
    val name1 = Similarity.indexName(spark, "ivf", dir)
    val idx1 = Similarity.indexFor(graft.Tables.embeddings(spark, dir),
      name1, nCentroids = 2, trainN = 24, iters = 1, numBuckets = 2)
    spark.table(idx1.assignedTable).count() shouldBe 24L

    writeEmb(seed = 5, n = 30) // regenerate in place, different count
    val name2 = Similarity.indexName(spark, "ivf", dir)
    name2 should not be name1
    val idx2 = Similarity.indexFor(graft.Tables.embeddings(spark, dir),
      name2, nCentroids = 2, trainN = 30, iters = 1, numBuckets = 2)
    spark.table(idx2.assignedTable).count() shouldBe 30L
    // Old generation GC'd.
    assert(!spark.catalog.tableExists(idx1.assignedTable))
    assert(!spark.catalog.tableExists(idx1.centroidTable))
  }
}
