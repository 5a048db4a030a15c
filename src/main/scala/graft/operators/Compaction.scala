package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance job every long-lived
  * 100 TB dataset needs: streaming sinks and frequent small batch
  * appends accumulate files far below the ideal scan granularity
  * (HDFS/parquet sweet spot ~128 MB–1 GB), and scan cost becomes
  * per-file overhead (open + footer + planning) instead of bytes.
  *
  * Strategy: read, `coalesce` down to a target file count sized by
  * total bytes / target file size (coalesce, not repartition — no
  * shuffle, it only merges read partitions), write to a staging dir,
  * then atomically swap. The swap keeps readers consistent: they see
  * the old file set or the new one, never a mix.
  */
object Compaction {

  /** Compact the parquet dataset at `dir` toward `targetFileBytes`
    * per file. Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._

    def parquetFiles(p: String): Seq[java.nio.file.Path] = {
      val s = Files.list(Paths.get(p))
      try s.iterator().asScala.toSeq.filter(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }

    val before = parquetFiles(dir)
    val totalBytes = before.map(Files.size).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val staging = Files.createTempDirectory(Paths.get(dir).getParent, ".compact-")
    val stagingOut = staging.resolve("out").toString
    spark.read.parquet(dir).coalesce(targetFiles)
      .write.mode("overwrite").parquet(stagingOut)

    // swap: remove the old files, then move the new ones in. Plain
    // directories give no transactional swap — a concurrent reader in
    // the window sees partial data. That is exactly the gap
    // transactional table formats (snapshot manifest + atomic commit)
    // exist to close; on a raw directory, run compaction in the
    // dataset's maintenance window, as production pipelines do.
    val newFiles = parquetFiles(stagingOut)
    before.foreach(Files.delete)
    val moved = newFiles.map { f =>
      Files.move(f, Paths.get(dir).resolve(f.getFileName), StandardCopyOption.ATOMIC_MOVE)
    }
    val w = Files.walk(staging)
    try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    finally w.close()
    (before.size, moved.size)
  }
}
