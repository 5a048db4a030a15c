package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.operators.Compaction

class CompactionSpec extends SparkSpec {

  private def mkDataset(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftcompact").resolve("t").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(n).write.mode("overwrite").parquet(dir)
    dir
  }
  private def rows(dir: String): Seq[String] =
    Compaction.readCompacted(spark, dir)
      .orderBy("doc_id").collect().map(_.toString).toSeq
  private def stagingDirs(dir: String): Seq[String] = {
    val parent = Paths.get(dir).toAbsolutePath.getParent
    Option(parent.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".compact-")).map(_.getName).toSeq
  }

  test("compaction collapses a many-small-file dataset to few files with identical content") {
    val dir = mkDataset(40)
    val before = spark.read.parquet(dir)
      .orderBy("doc_id").collect().map(_.toString).toSeq

    val (nBefore, nAfter) = Compaction.compactParquet(spark, dir)
    assert(nBefore >= 40, s"expected >=40 small files, got $nBefore")
    assert(nAfter == 1, s"tiny dataset should compact to one file, got $nAfter")

    // content identical through BOTH read paths, and the manifest
    // exists and lists exactly the live files
    assert(rows(dir) == before, "content must be identical after compaction")
    assert(spark.read.parquet(dir).orderBy("doc_id").collect().map(_.toString).toSeq == before)
    val manifest = Paths.get(dir).resolve(Compaction.ManifestName)
    assert(Files.exists(manifest))
    // idempotent: compacting a compacted dataset is a no-op in file count
    val (b2, a2) = Compaction.compactParquet(spark, dir)
    assert(b2 == 1 && a2 == 1)
  }

  test("compaction refuses a partitioned root (per-partition leaves compact fine)") {
    val dir = java.nio.file.Files.createTempDirectory("graftcompactpart").resolve("t").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    // compacting the root would collapse partition columns into data
    // files and corrupt partition discovery - must be rejected, not
    // silently doubled
    val e = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, dir)
    }
    assert(e.getMessage.contains("partitioned"))
    // each leaf partition IS a flat dataset and compacts normally
    val leaf = new java.io.File(dir).listFiles.filter(_.isDirectory).head.toString
    val n = spark.read.parquet(leaf).count()
    val (_, nAfter) = Compaction.compactParquet(spark, leaf)
    assert(nAfter == 1 && spark.read.parquet(leaf).count() == n)
  }

  test("empty directory and non-positive target size are rejected cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("graftcompactempty").resolve("t")
    Files.createDirectories(dir)
    // zero parquet files: a no-op result, no staging dir leaked, no
    // schema-inference crash
    assert(Compaction.compactParquet(spark, dir.toString) == ((0, 0)))
    assert(stagingDirs(dir.toString).isEmpty)
    val e = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, dir.toString, targetFileBytes = 0L)
    }
    assert(e.getMessage.contains("targetFileBytes"))
  }

  test("a crashed swap never bakes duplicates: orphan files are GC'd on the next run") {
    val dir = mkDataset(5)
    val before = rows(dir)
    val (_, _) = Compaction.compactParquet(spark, dir) // establishes a manifest
    // simulate a crash AFTER new files were moved in but BEFORE the
    // manifest commit: an orphan copy of the data sits beside the live
    // file, doubling every row for a plain directory reader
    val root = Paths.get(dir)
    val liveFile = root.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head.toPath
    Files.copy(liveFile, root.resolve("part-orphan-from-crashed-run.parquet"),
      StandardCopyOption.COPY_ATTRIBUTES)
    assert(spark.read.parquet(dir).count() == 2L * before.size) // the hazard is real
    // manifest-aware reader is unaffected...
    assert(rows(dir) == before)
    // ...and the recovery run reclaims the orphan instead of compacting it in
    val (b, a) = Compaction.compactParquet(spark, dir)
    assert(b == 1 && a == 1)
    assert(rows(dir) == before)
    assert(spark.read.parquet(dir).orderBy("doc_id").collect().map(_.toString).toSeq == before)
  }

  test("reader racing the swap sees exactly-once data at every commit state") {
    val dir = mkDataset(4)
    val before = rows(dir)
    Compaction.compactParquet(spark, dir)
    val root = Paths.get(dir)
    val gen1 = root.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head.toPath

    // build generation 2 out-of-band and move it in WITHOUT committing:
    // this is the mid-swap state (old committed + new files present)
    val scratch = Files.createTempDirectory("graftgen2")
    spark.read.parquet(gen1.toString).coalesce(1)
      .write.mode("overwrite").parquet(scratch.resolve("out").toString)
    val gen2name = "part-generation-two.parquet"
    val gen2src = scratch.resolve("out").toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    Files.move(gen2src, root.resolve(gen2name), StandardCopyOption.ATOMIC_MOVE)
    assert(rows(dir) == before, "pre-commit: reader must still resolve generation 1 only")

    // COMMIT: atomically swap the manifest to generation 2
    val tmp = root.resolve("_manifest.swap")
    Files.writeString(tmp, gen2name)
    Files.move(tmp, root.resolve(Compaction.ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    assert(rows(dir) == before,
      "post-commit, pre-delete: reader must resolve generation 2 only, not old+new")

    // recovery run GCs the stale generation-1 file and stays exact
    val (b, a) = Compaction.compactParquet(spark, dir)
    assert(b == 1 && a == 1)
    assert(rows(dir) == before)
  }

  test("a failing compaction write cleans up its staging directory") {
    val dir = java.nio.file.Files.createTempDirectory("graftcompactbad").resolve("t")
    Files.createDirectories(dir)
    Files.write(dir.resolve("broken.parquet"), "this is not parquet".getBytes)
    intercept[Exception] {
      Compaction.compactParquet(spark, dir.toString)
    }
    assert(stagingDirs(dir.toString).isEmpty, "staging dir must not leak on failure")
  }
}
