package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.operators.Compaction

/** Streaming near-dup ingest — the composition of three shipped
  * pieces into the flow a live training-data pipeline actually runs:
  *
  *   1. [[StreamingIngest.dedupWithinWatermark]] drops exact repeats
  *      at the stream edge (bounded per-key state, watermark-evicted);
  *   2. per micro-batch, the delta-vs-corpus near-dup check of
  *      `x_dedup_incremental` runs against INCREMENTAL digest side
  *      tables (fingerprints + shingle digests maintained alongside
  *      the store) — rare-shingle candidates, exact-Jaccard verify,
  *      only the delta side probes (never corpus × corpus), and the
  *      store's TEXT is never re-scanned in steady state;
  *   3. survivors are appended to the store under the manifest
  *      protocol of [[graft.operators.Compaction]]: un-prefixed files
  *      are live immediately and fold into the next maintenance run.
  *
  * '''Index side tables.''' Steady-state per-batch cost must be
  * O(batch), independent of corpus length — re-deriving fingerprints
  * or shingle postings from the store's text every micro-batch is a
  * full-corpus scan per batch, exactly what kills the design at
  * 100 TB. So each store keeps digest side tables as siblings:
  *
  *   - `<store>.fpidx`          — (doc_id, fp): exact-dup fingerprints
  *   - `<store>.shidx-k<k>`     — (doc_id, sh): md5 shingle digests
  *   - `<store>.pgidx-c<c>`     — (doc_id, pg): md5 passage digests
  *
  * Every join in the admission dataflow tests only digest EQUALITY
  * (df cap, candidate generation, overlap counting, passage anti-
  * join), so md5 digests are drop-in for the raw strings — smaller
  * rows, same result modulo md5 collision. The parameter (k / c) is
  * part of the directory name, so an index can never silently serve a
  * differently-configured ingest. Indexes are bootstrapped ONCE from
  * the store's text if absent (derive → write to `.tmp` → atomic
  * directory rename, so a torn bootstrap is invisible), then
  * maintained by the same idempotent single-file-per-batch append as
  * the store itself. Like the store, an index directory accretes one
  * file per batch and can be folded by [[Compaction.compactParquet]];
  * the read path is manifest-aware.
  *
  * Exactly-once, by construction rather than coordination:
  *   - the corpus and indexes are resolved through the manifest
  *     protocol, so a compaction committing CONCURRENTLY with a
  *     micro-batch is invisible to it — the reader sees the pre- or
  *     post-commit snapshot, never a torn mix;
  *   - the append is IDEMPOTENT: each micro-batch lands as one file
  *     per target named by its batchId (`ingest-<id>.parquet`),
  *     committed with an atomic rename-replace. A foreachBatch replay
  *     after a crash recomputes the same survivors (the batch's own
  *     previous store AND index appends are self-excluded by doc_id)
  *     and overwrites the same files — rows can never double. The
  *     store file is renamed FIRST: if a crash lands between the two
  *     appends, the replay overwrites both; and in the no-replay
  *     worst case (stream abandoned mid-batch) the skew is the safe
  *     direction — a stored doc missing from the index can at worst
  *     let a future near-dup through (swept by the batch-mode
  *     `x_dedup_corpus` pass), never drop novel content against a
  *     phantom index entry.
  *
  * Scale shape: per batch, one rare-shingle equi-join (delta digests
  * × df-capped index digests) + the exact-verify join — the
  * x_dedup_incremental dataflow with the delta bounded by micro-batch
  * size, so per-batch cost is O(batch × doc-size), independent of
  * corpus length; `NearDupIngestSpec` machine-checks that the
  * steady-state admission plan scans ONLY the index directories.
  * Store growth is one file per batch per target, exactly the
  * small-file accretion [[Compaction.compactParquet]] exists to fold.
  */
object NearDupIngest {

  /** Exact-dedup fingerprint, same normalization as x_dedup_exact. */
  private def fp(text: org.apache.spark.sql.Column) =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  // ---------------------------------------------------------------
  // Index side tables
  // ---------------------------------------------------------------

  private[graft] def fpIdxDir(storeDir: String): String = storeDir + ".fpidx"
  private[graft] def shIdxDir(storeDir: String, k: Int): String = s"$storeDir.shidx-k$k"
  private[graft] def pgIdxDir(storeDir: String, c: Int): String = s"$storeDir.pgidx-c$c"

  private val fpSchema = StructType.fromDDL("doc_id BIGINT, fp STRING")
  private val shSchema = StructType.fromDDL("doc_id BIGINT, sh STRING")
  private val pgSchema = StructType.fromDDL("doc_id BIGINT, pg STRING")

  /** Delta-side shingle digests: the same k-token shingles as the
    * batch dedup family, md5'd — every downstream operation is an
    * equality test, so the digest is a drop-in for the raw shingle.
    */
  private def shingleDigests(docs: DataFrame, k: Int): DataFrame =
    graft.llm.TextOps.shinglePostings(docs, k)
      .select(col("doc_id"), md5(col("shingle")).as("sh"))

  /** Delta-side passage digests at fixed non-overlapping windows. */
  private def passageDigests(docs: DataFrame, c: Int): DataFrame =
    graft.llm.CurationQueries.chunkDf(docs, c, overlap = 0)
      .select(col("doc_id"), md5(col("chunk_text")).as("pg"))

  /** Manifest-aware index read with an explicit schema (a bootstrapped
    * index over an all-short-docs store can be legitimately empty).
    */
  private def readIdx(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    if (Files.exists(Paths.get(dir, Compaction.ManifestName)))
      Compaction.readCompacted(spark, dir).select(schema.fieldNames.map(col): _*)
    else spark.read.schema(schema).parquet(dir)

  /** One-time bootstrap: derive the index from the store's text and
    * publish it with an atomic directory rename (derive → `.tmp` →
    * move), so a crashed bootstrap leaves no half-index a later call
    * would trust. Losing a concurrent-bootstrap race discards our
    * snapshot — the winner's is equivalent. This is ALSO the
    * documented repair path: delete an index directory and the next
    * batch rebuilds it from the store.
    */
  private def ensureIdx(idxDir: String)(derive: => DataFrame): Unit = {
    val target = Paths.get(idxDir)
    if (!Files.exists(target)) {
      val tmp = Paths.get(idxDir + ".tmp")
      rmTree(tmp.toFile)
      derive.write.mode("overwrite").parquet(tmp.toString)
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => rmTree(tmp.toFile)
      }
    }
  }

  private def storeText(spark: SparkSession, storeDir: String): DataFrame =
    Compaction.readCompacted(spark, storeDir)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("text").cast("string").as("text"))

  private[graft] def ensureDocIdx(spark: SparkSession, storeDir: String, k: Int): Unit = {
    ensureIdx(fpIdxDir(storeDir)) {
      storeText(spark, storeDir).select(col("doc_id"), fp(col("text")).as("fp"))
    }
    ensureIdx(shIdxDir(storeDir, k)) { shingleDigests(storeText(spark, storeDir), k) }
  }

  private[graft] def ensurePassageIdx(spark: SparkSession, storeDir: String, c: Int): Unit =
    ensureIdx(pgIdxDir(storeDir, c)) { passageDigests(storeText(spark, storeDir), c) }

  /** Batch normalization shared by both ingest forms. `doc_id` is the
    * STABLE document identity: re-delivery of an id is treated as a
    * replay of the same content (the idempotence design hinges on it —
    * the corpus read self-excludes the batch's ids), so an upstream
    * that re-sends an id with DIFFERENT text violates the contract;
    * the nearest safe behavior is keep-one-deterministically, never
    * two rows under one id. Within a batch, duplicate ids collapse to
    * the lexicographically-least text (replay-stable), which also
    * prevents the passage reassembly from interleaving two documents'
    * chunks under one id.
    */
  private def normalizedDocs(batch: DataFrame): DataFrame =
    batch.select(col("doc_id").cast("long").as("doc_id"),
        col("text").cast("string").as("text"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("text")))
      .where(col("__rn") === 1).drop("__rn")

  /** The full LAZY admission dataflow for the doc-level ingest —
    * exposed (package-private) so the spec can assert on its plan
    * that steady state reads ONLY the index directories, never the
    * store's text. `pin` is where the production path injects
    * localCheckpoints (identity in the plan test, so no LogicalRDD
    * truncates the visible plan).
    *
    * Steps: exact dedup within the batch (min doc_id wins — ties are
    * replay-deterministic), exact dedup vs the fingerprint index
    * (anti-join), near-dup vs the shingle-digest index (rare-digest
    * candidates + exact Jaccard ≥ `jaccardMin`). Returns survivors as
    * (doc_id, text, fp); replay self-exclusion (by the batch's
    * doc_ids) is applied to BOTH index reads, mirroring the corpus
    * self-exclusion of the pre-index formulation.
    */
  private[graft] def admitDocsFlow(spark: SparkSession, batch: DataFrame,
      storeDir: String, jaccardMin: Double, shingleK: Int, maxDf: Int,
      pin: DataFrame => DataFrame): DataFrame = {
    val docs = normalizedDocs(batch)
    val batchIds = docs.select("doc_id")
    val fpIdx = readIdx(spark, fpIdxDir(storeDir), fpSchema)
      .join(batchIds, Seq("doc_id"), "left_anti")
    val shIdx = readIdx(spark, shIdxDir(storeDir, shingleK), shSchema)
      .join(batchIds, Seq("doc_id"), "left_anti")

    // exact dedup, batch-internal (deterministic keeper) then vs index
    val keeper = Window.partitionBy("fp").orderBy("doc_id")
    val exactNew = pin(docs.withColumn("fp", fp(col("text")))
      .withColumn("rn", row_number().over(keeper)).where(col("rn") === 1)
      .join(fpIdx.select("fp"), Seq("fp"), "left_anti")
      .select("doc_id", "text", "fp"))

    // near-dup vs index: x_dedup_incremental's shape with the batch as
    // the delta side. df cap over the COMBINED digests (delta ∪ index)
    // keeps the candidate fan-out bounded exactly as in the batch
    // query; only the delta derives digests from text.
    val deltaPost = pin(shingleDigests(exactNew, shingleK))
    val post = deltaPost.unionByName(shIdx)
    val rare = post.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf).select("sh")
    val deltaIds = exactNew.select(col("doc_id").as("doc_a"))
    val deltaRare = deltaPost.join(deltaIds, col("doc_id") === col("doc_a"))
      .join(rare, "sh").select(col("doc_a"), col("sh"))
    val corpusPost = shIdx.select(col("doc_id").as("doc_b"), col("sh").as("sh_r"))
    val cand = deltaRare.join(corpusPost, col("sh") === col("sh_r"))
      .select("doc_a", "doc_b").distinct()
    val cnt = post.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val overlap = cand
      .join(post.select(col("doc_id").as("pa"), col("sh").as("sha")), col("doc_a") === col("pa"))
      .join(post.select(col("doc_id").as("pb"), col("sh").as("shb")),
        col("doc_b") === col("pb") && col("sha") === col("shb"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ov"))
    val nearDup = overlap
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .where(col("ov").cast("double") / (col("na") + col("nb") - col("ov")) >= jaccardMin)
      .select(col("doc_a").as("doc_id")).distinct()
    exactNew.join(nearDup, Seq("doc_id"), "left_anti")
  }

  /** Run one micro-batch of the ingest against the compacted store at
    * `storeDir` (schema: doc_id, text — must exist, seeded or prior
    * batches). Returns the number of rows appended. Appends the
    * survivors to the store AND their digests to the fingerprint /
    * shingle indexes, all under the idempotent single-file protocol.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, storeDir: String,
      batchId: Long, jaccardMin: Double = 0.8, shingleK: Int = 3,
      maxDf: Int = 8): Long = {
    ensureDocIdx(spark, storeDir, shingleK)
    val survivors = admitDocsFlow(spark, batch, storeDir, jaccardMin, shingleK,
      maxDf, pin = _.localCheckpoint(false)).localCheckpoint(false)
    // store first (see scaladoc: no-replay skew must fail toward a
    // future sweepable dup, never toward dropping novel content)
    val n = appendIdempotent(spark, survivors.select("doc_id", "text"), storeDir, batchId)
    appendIdempotent(spark, survivors.select("doc_id", "fp"), fpIdxDir(storeDir), batchId)
    appendIdempotent(spark, shingleDigests(survivors, shingleK),
      shIdxDir(storeDir, shingleK), batchId)
    n
  }

  /** Idempotent single-file append into `dir`: the batch lands as ONE
    * file named by its batchId via atomic rename-replace, so a
    * foreachBatch replay overwrites its own previous attempt and rows
    * can never double. An all-dropped batch removes a crashed
    * attempt's file to keep replays aligned with the recomputation.
    * Shared by the store and every index side table.
    */
  private def appendIdempotent(spark: SparkSession, rows: DataFrame,
      dir: String, batchId: Long): Long = {
    val scratch = java.nio.file.Files.createTempDirectory(s"graft-ingest-$batchId-")
    try {
      rows.coalesce(1).write.mode("overwrite").parquet(s"$scratch/out")
      val part = Option(new java.io.File(s"$scratch/out").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val target = java.nio.file.Paths.get(dir, s"ingest-$batchId.parquet")
      part match {
        case Some(p) =>
          java.nio.file.Files.move(p.toPath, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          spark.read.parquet(target.toString).count()
        case None =>
          java.nio.file.Files.deleteIfExists(target)
          0L
      }
    } finally rmTree(scratch.toFile)
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** The lazy passage-admission dataflow (see [[admitDocsFlow]] for
    * the pin/plan-test contract): batch chunks at fixed windows,
    * keep-first within the batch by (doc_id, chunk_id) over the
    * passage digest, then the anti-join against the passage-digest
    * index. Returns surviving novel chunks
    * (doc_id, chunk_id, chunk_text, pg).
    */
  private[graft] def admitPassagesFlow(spark: SparkSession, batch: DataFrame,
      storeDir: String, chunkTokens: Int): DataFrame = {
    val docs = normalizedDocs(batch)
    val batchIds = docs.select("doc_id")
    val pgIdx = readIdx(spark, pgIdxDir(storeDir, chunkTokens), pgSchema)
      .join(batchIds, Seq("doc_id"), "left_anti")
    val ch = graft.llm.CurationQueries.chunkDf(docs, chunkTokens, overlap = 0)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      .withColumn("pg", md5(col("chunk_text")))
    val keptInBatch = ch.withColumn("rn", row_number().over(
        Window.partitionBy("pg").orderBy("doc_id", "chunk_id")))
      .where(col("rn") === 1)
    keptInBatch.join(pgIdx.select("pg").distinct(), Seq("pg"), "left_anti")
      .select("doc_id", "chunk_id", "chunk_text", "pg")
  }

  /** PASSAGE-granular dedup-at-ingest — the streaming form of
    * x_passage_dedup: each micro-batch's documents are chunked into
    * fixed non-overlapping token windows, passages already present in
    * the passage-digest index (or claimed by an earlier doc of the
    * same batch — keep-first by (doc_id, chunk_id)) are dropped, and
    * each surviving document is REBUILT from its novel passages before
    * the idempotent append. A document whose every passage is recycled
    * contributes nothing and is not stored (unlike the batch query,
    * which keeps an empty audit row — ingest stores text, not audits).
    *
    * The store's passage set is EXACTLY the set of chunks ever
    * admitted (every admitted chunk is full-width except possibly a
    * doc's original last chunk, so re-chunking a rebuilt text yields
    * its surviving chunks back) — which is what makes the digest
    * index's incremental maintenance exact, not an approximation.
    *
    * Replay-idempotent like ingestBatch: both the index read and the
    * appends self-exclude/overwrite by the batch's own ids.
    */
  def ingestPassageBatch(spark: SparkSession, batch: DataFrame, storeDir: String,
      batchId: Long, chunkTokens: Int = 16): Long = {
    ensurePassageIdx(spark, storeDir, chunkTokens)
    val novel = admitPassagesFlow(spark, batch, storeDir, chunkTokens)
      .localCheckpoint(false)
    val rebuilt = novel.groupBy("doc_id").agg(
      array_join(transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        s => s.getField("chunk_text")), " ").as("text"))
    val n = appendIdempotent(spark, rebuilt.select("doc_id", "text"), storeDir, batchId)
    appendIdempotent(spark, novel.select("doc_id", "pg"),
      pgIdxDir(storeDir, chunkTokens), batchId)
    n
  }

  /** Shared flow skeleton over a streaming (doc_id, ts, text) frame:
    * watermark-bounded exact dedup at the stream edge, then the
    * supplied per-batch ingest — ONE builder, so a sink-protocol
    * change (checkpointing, edge-dedup tuning) cannot drift between
    * the two ingest forms.
    */
  private def startWith(docs: DataFrame, dupWindow: String)(
      perBatch: (DataFrame, Long) => Unit): StreamingQuery =
    StreamingIngest.dedupWithinWatermark(
        docs.withColumn("fp", fp(col("text"))), Seq("fp"), "ts", dupWindow)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        perBatch(batch.drop("fp"), batchId)
      }
      .start()

  /** The passage-dedup ingest as a continuous flow: stream-edge exact
    * dedup, then the per-batch passage cut into `storeDir`.
    */
  def startPassage(spark: SparkSession, docs: DataFrame, storeDir: String,
      dupWindow: String = "1 hour", chunkTokens: Int = 16): StreamingQuery =
    startWith(docs, dupWindow) { (batch, batchId) =>
      ingestPassageBatch(spark, batch, storeDir, batchId, chunkTokens)
      ()
    }

  /** Start the composed flow: watermark-bounded exact dedup at the
    * edge, then the per-batch near-dup ingest into `storeDir`.
    */
  def start(spark: SparkSession, docs: DataFrame, storeDir: String,
      dupWindow: String = "1 hour", jaccardMin: Double = 0.8): StreamingQuery =
    startWith(docs, dupWindow) { (batch, batchId) =>
      ingestBatch(spark, batch, storeDir, batchId, jaccardMin)
      ()
    }
}
