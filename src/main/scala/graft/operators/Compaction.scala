package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance job every long-lived
  * 100 TB dataset needs: streaming sinks and frequent small batch
  * appends accumulate files far below the ideal scan granularity
  * (HDFS/parquet sweet spot ~128 MB–1 GB), and scan cost becomes
  * per-file overhead (open + footer + planning) instead of bytes.
  *
  * Strategy: read, `coalesce` down to a target file count sized by
  * total bytes / target file size (coalesce, not repartition — no
  * shuffle, it only merges read partitions), write to a staging dir,
  * move the new (uniquely-named) files in alongside the old, then
  * COMMIT by atomically replacing the `_manifest` file — the
  * newline-separated list of live data files — and finally delete the
  * old files. This is the poor-man's snapshot of the transactional
  * table formats: the single manifest rename is the only commit point.
  *
  * Guarantees, given readers resolve the live set via
  * [[readCompacted]]:
  *   - exactly-once at every instant: before the rename they see the
  *     old file list (still fully present), after it the new one — the
  *     old+new coexistence window is invisible;
  *   - crash-safe: on restart, [[compactParquet]] garbage-collects any
  *     data file NOT in the manifest (leftovers of a crashed swap —
  *     either un-committed new files or un-deleted old ones), so a
  *     re-run can never bake duplicated rows into the output.
  * A plain `spark.read.parquet(dir)` reader ignores `_manifest`
  * (underscore files are invisible to Spark) and CAN see duplicates
  * inside the swap window — that reader is only safe in a maintenance
  * window; manifest-aware readers never see duplicated or missing
  * ROWS. One residual race remains even for them: a reader that
  * resolved the old list immediately before the commit can hit
  * file-not-found when the old-generation delete overtakes its scan —
  * it must retry, never silently mis-reads. Closing that needs
  * snapshot retention (defer deletes by a grace period), the next
  * step toward a full table format.
  *
  * Flat layouts only: a `partitionBy` dataset must be compacted per
  * partition directory (each leaf dir IS a flat dataset) — compacting
  * the root would collapse the partition columns into data files and
  * corrupt partition discovery, so that case is rejected.
  */
object Compaction {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}
  import scala.jdk.CollectionConverters._

  /** Name of the live-file list; underscore prefix keeps it invisible
    * to Spark's file index.
    */
  val ManifestName = "_manifest"

  private def list(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }
  private def parquetFiles(p: Path): Seq[Path] =
    list(p).filter(_.getFileName.toString.endsWith(".parquet"))

  private def readManifest(root: Path): Option[Seq[String]] = {
    val m = root.resolve(ManifestName)
    if (Files.exists(m))
      Some(Files.readAllLines(m).asScala.toSeq.map(_.trim).filter(_.nonEmpty))
    else None
  }

  /** Publish the live-file list: write-to-temp + atomic rename, so a
    * concurrent reader sees either the old list or the new one, never
    * a torn file.
    */
  private def writeManifest(root: Path, names: Seq[String]): Unit = {
    val tmp = root.resolve(ManifestName + ".tmp")
    Files.writeString(tmp, names.mkString("\n"))
    Files.move(tmp, root.resolve(ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Read the dataset resolving the live file list through `_manifest`
    * when present (exactly-once across a concurrent compaction swap);
    * falls back to the plain directory scan for never-compacted dirs.
    */
  def readCompacted(spark: SparkSession, dir: String): DataFrame = {
    val root = Paths.get(dir).toAbsolutePath.normalize
    readManifest(root) match {
      case Some(names) =>
        spark.read.parquet(names.map(n => root.resolve(n).toString): _*)
      case None => spark.read.parquet(dir)
    }
  }

  /** Compact the flat parquet dataset at `dir` toward
    * `targetFileBytes` per file. Returns (filesBefore, filesAfter);
    * (0, 0) when the directory holds no parquet files.
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val root = Paths.get(dir).toAbsolutePath.normalize

    val subdirs = list(root).filter(Files.isDirectory(_))
    require(subdirs.isEmpty,
      s"$dir has subdirectories (partitioned layout?) — compact each leaf partition " +
        s"directory instead; compacting the root would corrupt partition discovery: " +
        subdirs.map(_.getFileName).mkString(", "))

    def gc(f: Path): Unit = {
      Files.deleteIfExists(root.resolve("." + f.getFileName.toString + ".crc"))
      Files.delete(f)
    }

    // Resolve the LIVE set through the manifest. Files on disk but not
    // in the manifest are leftovers of a crashed swap (un-committed new
    // files, or old files that outlived their commit) — reclaim them
    // FIRST so this run compacts exactly one generation.
    val onDisk = parquetFiles(root)
    val manifest = readManifest(root)
    val live: Seq[Path] = manifest match {
      case Some(names) =>
        val listed = names.toSet
        onDisk.filterNot(f => listed(f.getFileName.toString)).foreach(gc)
        val missing = names.filterNot(n => Files.exists(root.resolve(n)))
        require(missing.isEmpty,
          s"manifest lists data files missing on disk (corrupted dataset?): " +
            missing.mkString(", "))
        names.map(root.resolve(_))
      case None => onDisk
    }
    if (live.isEmpty) return (0, 0)

    // Make sure a manifest exists BEFORE any swap step: every crash
    // window after this point is then recoverable by the GC above.
    if (manifest.isEmpty) writeManifest(root, live.map(_.getFileName.toString))

    val totalBytes = live.map(Files.size).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val staging = Files.createTempDirectory(root.getParent, ".compact-")
    try {
      val stagingOut = staging.resolve("out")
      spark.read.parquet(live.map(_.toString): _*).coalesce(targetFiles)
        .write.mode("overwrite").parquet(stagingOut.toString)

      // move new data files (and their checksum siblings) in alongside
      // the old — invisible to manifest readers until the commit …
      val newFiles = parquetFiles(stagingOut)
      val toMove = newFiles ++ newFiles.flatMap { f =>
        val crc = stagingOut.resolve("." + f.getFileName.toString + ".crc")
        if (Files.exists(crc)) Some(crc) else None
      }
      toMove.foreach { f =>
        Files.move(f, root.resolve(f.getFileName), StandardCopyOption.ATOMIC_MOVE)
      }
      // … COMMIT: one atomic rename flips readers old → new …
      writeManifest(root, newFiles.map(_.getFileName.toString))
      // … then the old generation is garbage (plus its stale
      // checksum/_SUCCESS artifacts, which would otherwise accumulate
      // and fail local-FS checksum verification).
      live.foreach(gc)
      Files.deleteIfExists(root.resolve("_SUCCESS"))
      Files.deleteIfExists(root.resolve("._SUCCESS.crc"))
      (live.size, newFiles.size)
    } finally {
      // staging is scratch in every outcome — success (files already
      // moved out) or failure (half-written output) — so reclaim it
      // unconditionally; the manifest keeps the dataset consistent.
      val w = Files.walk(staging)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }
}
