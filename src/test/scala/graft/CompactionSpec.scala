package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

class CompactionSpec extends SparkSpec {

  test("compaction collapses a many-small-file dataset to few files with identical content") {
    val dir = java.nio.file.Files.createTempDirectory("graftcompact").resolve("t").toString
    // simulate the streaming-sink small-file problem: 40 file writes
    Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(40).write.mode("overwrite").parquet(dir)
    val beforeDf = spark.read.parquet(dir)
      .orderBy("doc_id").collect().map(_.toString).toSeq

    val (nBefore, nAfter) = Compaction.compactParquet(spark, dir)
    assert(nBefore >= 40, s"expected >=40 small files, got $nBefore")
    assert(nAfter == 1, s"tiny dataset should compact to one file, got $nAfter")

    val afterDf = spark.read.parquet(dir)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(afterDf == beforeDf, "content must be byte-identical after compaction")
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
    val rows = spark.read.parquet(leaf).count()
    val (_, nAfter) = Compaction.compactParquet(spark, leaf)
    assert(nAfter == 1 && spark.read.parquet(leaf).count() == rows)
  }
}
