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
  * then swap: move the new (uniquely-named) files in FIRST, delete
  * the old ones after. A crash mid-swap leaves transient duplicates —
  * recoverable by re-running — never an empty table; the reverse
  * order would risk a window with zero data files.
  *
  * Plain directories give no transactional swap — a CONCURRENT reader
  * in the window can see duplicates. That is the gap transactional
  * table formats (snapshot manifest + atomic commit) close; on a raw
  * directory, run compaction in the dataset's maintenance window.
  *
  * Flat layouts only: a `partitionBy` dataset must be compacted per
  * partition directory (each leaf dir IS a flat dataset) — compacting
  * the root would collapse the partition columns into data files and
  * corrupt partition discovery, so that case is rejected.
  */
object Compaction {

  /** Compact the flat parquet dataset at `dir` toward
    * `targetFileBytes` per file. Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._

    val root = Paths.get(dir).toAbsolutePath.normalize

    def list(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    def parquetFiles(p: Path): Seq[Path] =
      list(p).filter(_.getFileName.toString.endsWith(".parquet"))

    val entries = list(root)
    val subdirs = entries.filter(Files.isDirectory(_))
    require(subdirs.isEmpty,
      s"$dir has subdirectories (partitioned layout?) — compact each leaf partition " +
        s"directory instead; compacting the root would corrupt partition discovery: " +
        subdirs.map(_.getFileName).mkString(", "))

    val before = parquetFiles(root)
    val totalBytes = before.map(Files.size).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val staging = Files.createTempDirectory(root.getParent, ".compact-")
    val stagingOut = staging.resolve("out")
    spark.read.parquet(root.toString).coalesce(targetFiles)
      .write.mode("overwrite").parquet(stagingOut.toString)

    // move new data files (and their checksum siblings) in first …
    val newFiles = parquetFiles(stagingOut)
    val toMove = newFiles ++ newFiles.flatMap { f =>
      val crc = stagingOut.resolve("." + f.getFileName.toString + ".crc")
      if (Files.exists(crc)) Some(crc) else None
    }
    toMove.foreach { f =>
      Files.move(f, root.resolve(f.getFileName), StandardCopyOption.ATOMIC_MOVE)
    }
    // … then drop the old data files plus their stale checksum/_SUCCESS
    // artifacts (leaving them would accumulate hidden-file garbage on
    // every run and fail local-FS checksum verification).
    before.foreach { f =>
      Files.deleteIfExists(root.resolve("." + f.getFileName.toString + ".crc"))
      Files.delete(f)
    }
    Files.deleteIfExists(root.resolve("_SUCCESS"))
    Files.deleteIfExists(root.resolve("._SUCCESS.crc"))

    val w = Files.walk(staging)
    try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    finally w.close()
    (before.size, newFiles.size)
  }
}
