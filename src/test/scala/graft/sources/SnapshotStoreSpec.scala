package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class SnapshotStoreSpec extends SparkSpec {

  import spark.implicits._
  implicit private lazy val s: org.apache.spark.sql.SparkSession = spark

  private def tmp() = Files.createTempDirectory("snap").toString

  test("append lineage and overwrite reset, with time travel") {
    val root = tmp()
    SnapshotStore.append(Seq(1, 2, 3).toDF("v"), root).version shouldBe 1L
    SnapshotStore.append(Seq(4, 5).toDF("v"), root).version shouldBe 2L
    SnapshotStore.read(root).as[Int].collect().sorted shouldBe
      Array(1, 2, 3, 4, 5)
    SnapshotStore.readVersion(root, 1).as[Int].collect().sorted shouldBe
      Array(1, 2, 3)
    val v3 = SnapshotStore.overwrite(Seq(9).toDF("v"), root)
    v3.version shouldBe 3L
    v3.dataDirs.size shouldBe 1 // overwrite collapses lineage
    SnapshotStore.read(root).as[Int].collect() shouldBe Array(9)
    // old snapshots stay readable until vacuum
    SnapshotStore.readVersion(root, 2).as[Int].collect().sorted shouldBe
      Array(1, 2, 3, 4, 5)
  }

  test("a data dir without a manifest is invisible (atomic publish)") {
    val root = tmp()
    SnapshotStore.append(Seq(1).toDF("v"), root)
    // simulate a crashed commit: data written, manifest never created
    Seq(99).toDF("v").write.parquet(s"$root/data/orphan-dir")
    SnapshotStore.read(root).as[Int].collect() shouldBe Array(1)
    SnapshotStore.history(root).size shouldBe 1
    // vacuum with keepLast=all removes only the orphan
    SnapshotStore.vacuum(root)
    Files.isDirectory(Paths.get(root, "data", "orphan-dir")) shouldBe false
    SnapshotStore.read(root).as[Int].collect() shouldBe Array(1)
  }

  test("losing the version race retries and lands on the next slot") {
    val root = tmp()
    SnapshotStore.append(Seq(1).toDF("v"), root)
    // occupy v2 out from under the committer (the "other writer",
    // appending properly on top of v1's lineage)
    Seq(7).toDF("v").write.parquet(s"$root/data/stolen")
    val v1dirs = SnapshotStore.latestVersion(root).get.dataDirs
    val stolenDirs = (v1dirs :+ "data/stolen")
      .map(d => s""""$d"""").mkString("[", ",", "]")
    Files.write(Paths.get(root, "_versions", "v00000002.json"),
      (s"""{"version":2,"op":"append","data_dirs":$stolenDirs,""" +
        """"columns":["v"],"ts_millis":0}""").getBytes)
    val v = SnapshotStore.append(Seq(3).toDF("v"), root)
    v.version shouldBe 3L
    // the retry recomputed lineage and INCLUDES the winner's data
    SnapshotStore.read(root).as[Int].collect().sorted shouldBe Array(1, 3, 7)
  }

  test("vacuum(keepLast) drops old manifests first, then unreferenced dirs") {
    val root = tmp()
    SnapshotStore.append(Seq(1).toDF("v"), root)
    SnapshotStore.overwrite(Seq(2).toDF("v"), root)
    SnapshotStore.overwrite(Seq(3).toDF("v"), root)
    SnapshotStore.vacuum(root, keepLast = 1)
    SnapshotStore.history(root).map(_.version) shouldBe Seq(3L)
    SnapshotStore.read(root).as[Int].collect() shouldBe Array(3)
    // the vacuumed version fails loudly, not silently-empty
    val e = intercept[RuntimeException](SnapshotStore.readVersion(root, 1))
    e.getMessage should include ("no version")
    // only the retained data dir remains on disk
    val dirs = Files.list(Paths.get(root, "data")).count()
    dirs shouldBe 1
  }

  test("rewrite collapses append lineage to one directory, content intact") {
    val root = tmp()
    (1 to 5).foreach(i => SnapshotStore.append(Seq(i).toDF("v"), root))
    SnapshotStore.latestVersion(root).get.dataDirs.size shouldBe 5
    val v = SnapshotStore.rewrite(root)
    v.dataDirs.size shouldBe 1
    SnapshotStore.read(root).as[Int].collect().sorted shouldBe
      Array(1, 2, 3, 4, 5)
    SnapshotStore.vacuum(root, keepLast = 1)
    Files.list(Paths.get(root, "data")).count() shouldBe 1
  }

  test("readRange prunes a strict subset of directories from footer stats, identical results") {
    val root = tmp()
    // Three appends with disjoint key ranges; stats nominated for k.
    SnapshotStore.append((0 to 9).map(i => (i, s"a$i")).toDF("k", "s"),
      root, statsCols = Seq("k"))
    SnapshotStore.append((10 to 19).map(i => (i, s"b$i")).toDF("k", "s"),
      root, statsCols = Seq("k"))
    SnapshotStore.append((20 to 29).map(i => (i, s"c$i")).toDF("k", "s"),
      root, statsCols = Seq("k"))
    // Manifests actually carry the bounds (round-tripped through JSON).
    val vs = SnapshotStore.history(root)
    vs.map(_.dirStats("k")) shouldBe
      Seq((0.0, 9.0), (10.0, 19.0), (20.0, 29.0))

    val pruned = SnapshotStore.readRange(root, "k", Some(12.0), Some(15.0))
    val full = SnapshotStore.read(root)
      .filter($"k" >= 12 && $"k" <= 15)
    pruned.as[(Int, String)].collect().sortBy(_._1) shouldBe
      full.as[(Int, String)].collect().sortBy(_._1)
    // STRICT subset of directories scanned: only the middle commit's
    // files back the pruned read.
    val allFiles = SnapshotStore.read(root).inputFiles.toSet
    val prunedFiles = pruned.inputFiles.toSet
    prunedFiles should not be empty
    assert(prunedFiles.subsetOf(allFiles))
    prunedFiles.size should be < allFiles.size
    val midDir = Paths.get(root, vs(1).dataDirs.last).toUri.getPath
    all(prunedFiles.toSeq) should include(midDir)

    // Every dir pruned: schema-correct empty frame, no residual scan.
    val none = SnapshotStore.readRange(root, "k", Some(-50.0), Some(-40.0))
    none.columns shouldBe Array("k", "s")
    none.count() shouldBe 0L

    // A dir WITHOUT recorded stats is conservatively kept — its
    // in-range rows still return, and an out-of-range probe that
    // can't prune it still filters exactly.
    SnapshotStore.append(Seq((13, "nostats")).toDF("k", "s"), root)
    SnapshotStore.readRange(root, "k", Some(12.0), Some(15.0))
      .as[(Int, String)].collect().map(_._2).sorted shouldBe
      Array("b12", "b13", "b14", "b15", "nostats")
    SnapshotStore.readRange(root, "k", Some(999.0), None).count() shouldBe 0L
  }

  test("append schema mismatch fails loudly; overwrite may change schema") {
    val root = tmp()
    SnapshotStore.append(Seq(1).toDF("v"), root)
    an[IllegalArgumentException] should be thrownBy
      SnapshotStore.append(Seq(("a", 1)).toDF("k", "n"), root)
    // overwrite is allowed to change the schema
    SnapshotStore.overwrite(Seq(("a", 1)).toDF("k", "n"), root)
    SnapshotStore.read(root).columns.toSeq shouldBe Seq("k", "n")
  }
}
