package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is batch-only (SURVEY
  * §2i) — every job a request-triggered full re-export — but the
  * engine exposes the streaming equivalent of its ingest so the same
  * event data can be processed incrementally instead of re-scanned:
  * exactly what replaces "re-run the whole export every HTTP call" at
  * 100 TB.
  *
  * Shape: readStream over the events directory → watermarked sliding-
  * window aggregation → sink. With a file/Kafka source this runs
  * continuously; tests drive it with the memory sink +
  * processAllAvailable for synchronous verification.
  */
object StreamingIngest {

  /** Schema of the events table with `ts` typed as `tsType` — the
    * physical encoding varies across testdata generations (epoch-nanos
    * long under the legacy conf vs native timestamp; see
    * [[graft.Tables.normalizeTs]]), so the stream schema is built
    * around whatever the file actually carries.
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of the events parquet, normalizing `ts` to
    * TimestampType. FileStreamSource needs a user-supplied schema, and
    * that schema must match the physical encoding — so sniff the
    * footer with a one-file batch read (metadata only; no data scan)
    * and declare the stream schema from it.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    spark.readStream
      .schema(rawSchema(tsType))
      // FileStreamSource needs a directory; select just the events
      // file out of the shared sf dir.
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", graft.Tables.normalizeTs(tsType))
  }

  /** 1-hour tumbling windows per event type with a 2-hour watermark:
    * counts + exact decimal-summed value (same order-insensitive
    * aggregation discipline as the batch side).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Start the pipeline into an in-memory sink (complete mode — the
    * windowed totals table). Used by tests and local smoke.
    */
  def startMemorySink(spark: SparkSession, dir: String, name: String): StreamingQuery =
    windowedCounts(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()

  /** Dedup-at-ingest: drop records whose key columns repeat within the
    * watermark horizon. This is the streaming counterpart of the batch
    * exact-dedup family (x_dedup_exact) — dedup WHERE the data lands,
    * instead of re-scanning the corpus afterwards.
    *
    * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) is
    * the 100 TB-viable form: per-key state is evicted once the
    * watermark passes it, so state size is bounded by arrival-rate ×
    * `delay` instead of growing with every key ever seen. The contract
    * is correspondingly scoped: duplicates separated by more than the
    * watermark delay are NOT caught — pick `delay` ≥ the real-world
    * duplicate window (retry storms, at-least-once replays).
    */
  def dedupWithinWatermark(
      events: DataFrame, keys: Seq[String], tsCol: String,
      delay: String): DataFrame =
    events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment: the streaming counterpart of the batch
    * broadcast lookup joins (J1–J12) — each micro-batch probes the
    * broadcast dimension, no stream-side state at all. The dim is
    * re-resolvable per batch, so a slowly-changing dimension picks up
    * updates without restarting the query.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join — the streaming counterpart of the
    * batch banded range join (operators.RangeJoin): left and right
    * event streams pair when they share `lKey`/`rKey` and their event
    * times are within `withinSec` of each other.
    *
    * Both sides carry a watermark, and the join condition bounds
    * right-time relative to left-time in BOTH directions — that pair
    * of facts is what lets Spark evict matched state: each side's
    * buffer holds only `delay` + `withinSec` of events, so state is
    * bounded by arrival rate × horizon, not by stream length. Without
    * the two-sided time bound the state store grows forever — the
    * streaming analog of the batch cartesian.
    *
    * Column contract: the two sides must have disjoint column names
    * (rename before calling), including the key.
    */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      lKey: String, rKey: String, lts: String, rts: String,
      withinSec: Long, delay: String): DataFrame =
    left.withWatermark(lts, delay).join(
      right.withWatermark(rts, delay),
      col(lKey) === col(rKey) &&
        col(rts) >= col(lts) - expr(s"INTERVAL $withinSec SECOND") &&
        col(rts) <= col(lts) + expr(s"INTERVAL $withinSec SECOND"))

  /** foreachBatch sink — the write-then-publish commit protocol of the
    * reference's OneDrive upsert (K2/K3, one_drive.py:164-211 /
    * callable.py:102-116): each micro-batch is written atomically
    * (mode overwrite per batch dir = idempotent PUT-replace), and the
    * "publish" side-effect runs only after the write succeeds.
    */
  def startForeachBatchSink(
      spark: SparkSession, dir: String, outDir: String): StreamingQuery =
    windowedCounts(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = s"$outDir/batch_$batchId"
        batch.write.mode("overwrite").parquet(target) // write…
        // …then publish (driver-side post-commit step in the reference;
        // here: an atomic marker the downstream consumer watches).
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/_published_$batchId"), target)
        ()
      }
      .start()

  /** foreachBatch sink through the FULL K2 upsert protocol
    * ([[UpsertSink]]): each micro-batch is rendered as a single-file
    * report (K1) and upserted into the target folder under one stable
    * name — resolve → find-child → replace — exactly the reference's
    * per-run report publish (one_drive.py:186-208). Re-running the
    * stream replaces the report in place instead of accumulating
    * copies.
    */
  def startUpsertReportSink(
      spark: SparkSession, dir: String, folderLink: String,
      fileName: String): StreamingQuery =
    windowedCounts(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val folder = UpsertSink.resolveFolder(folderLink).getOrElse(
          throw new IllegalArgumentException(s"cannot resolve report folder: $folderLink"))
        // K1 single-file render: one part file in a scratch dir, then
        // that file IS the staged content for the atomic upsert.
        val scratch = java.nio.file.Files.createTempDirectory("graft-report-")
        try {
          batch.coalesce(1).write.mode("overwrite").parquet(s"$scratch/out")
          val part = Option(new java.io.File(s"$scratch/out").listFiles())
            .getOrElse(Array.empty[java.io.File])
            .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
            .getOrElse(sys.error("no part file produced"))
          UpsertSink.upsert(folder, fileName, { tmp =>
            java.nio.file.Files.copy(part.toPath, tmp,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            ()
          })
          ()
        } finally {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(scratch.toFile)
        }
      }
      .start()
}
