package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Compaction

/** Streaming near-dup ingest — the composition of three shipped
  * pieces into the flow a live training-data pipeline actually runs:
  *
  *   1. [[StreamingIngest.dedupWithinWatermark]] drops exact repeats
  *      at the stream edge (bounded per-key state, watermark-evicted);
  *   2. per micro-batch, the delta-vs-corpus near-dup check of
  *      `x_dedup_incremental` runs against the COMPACTED document
  *      store — rare-shingle candidates, exact-Jaccard verify, only
  *      the delta side probes (never corpus × corpus);
  *   3. survivors are appended to the store under the manifest
  *      protocol of [[graft.operators.Compaction]]: un-prefixed files
  *      are live immediately and fold into the next maintenance run.
  *
  * Exactly-once, by construction rather than coordination:
  *   - the corpus is resolved through [[Compaction.readCompacted]],
  *     so a compaction committing CONCURRENTLY with a micro-batch is
  *     invisible to it — the reader sees the pre- or post-commit
  *     snapshot, never a torn mix, and snapshot retention keeps the
  *     resolved files on disk for the read's whole lifetime;
  *   - the append is IDEMPOTENT: each micro-batch lands as one file
  *     named by its batchId (`ingest-<id>.parquet`), committed with an
  *     atomic rename-replace. A foreachBatch replay after a crash
  *     recomputes the same survivors (the batch's own previous append
  *     is self-excluded from the corpus by doc_id) and overwrites the
  *     same file — rows can never double.
  *
  * Scale shape: per batch, one rare-shingle equi-join (delta postings
  * × df-capped corpus postings) + the exact-verify join — the
  * x_dedup_incremental dataflow with the delta bounded by micro-batch
  * size, so per-batch cost is O(batch × doc-size), independent of
  * corpus length. Store growth is one file per batch, exactly the
  * small-file accretion [[Compaction.compactParquet]] exists to fold.
  */
object NearDupIngest {

  /** Exact-dedup fingerprint, same normalization as x_dedup_exact. */
  private def fp(text: org.apache.spark.sql.Column) =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

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

  /** Run one micro-batch of the ingest against the compacted store at
    * `storeDir` (schema: doc_id, text — must exist, seeded or prior
    * batches). Returns the number of rows appended.
    *
    * Steps: exact dedup within the batch (min doc_id wins — ties are
    * replay-deterministic), exact dedup vs the store (fingerprint
    * anti-join), near-dup vs the store (rare-shingle candidates +
    * exact Jaccard ≥ `jaccardMin`), idempotent single-file append.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, storeDir: String,
      batchId: Long, jaccardMin: Double = 0.8, shingleK: Int = 3,
      maxDf: Int = 8): Long = {
    val docs = normalizedDocs(batch)
    // replay self-exclusion: a crashed attempt may already have
    // appended this batch's rows; they must not count as "corpus" or
    // the replay would drop everything and break idempotence
    val corpus = Compaction.readCompacted(spark, storeDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text").cast("string").as("text"))
      .join(docs.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(false)

    // exact dedup, batch-internal (deterministic keeper) then vs store
    val keeper = Window.partitionBy("fp").orderBy("doc_id")
    val exactNew = docs.withColumn("fp", fp(col("text")))
      .withColumn("rn", row_number().over(keeper)).where(col("rn") === 1)
      .join(corpus.select(fp(col("text")).as("fp")), Seq("fp"), "left_anti")
      .select("doc_id", "text")
      .localCheckpoint(false)

    // near-dup vs corpus: x_dedup_incremental's shape with the batch
    // as the delta side. df cap over the COMBINED postings keeps the
    // candidate fan-out bounded exactly as in the batch query.
    val post = graft.llm.TextOps.shinglePostings(exactNew.unionByName(corpus), shingleK)
    val rare = post.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf).select("shingle")
    val deltaIds = exactNew.select(col("doc_id").as("doc_a"))
    val deltaPost = post.join(deltaIds, col("doc_id") === col("doc_a"))
      .join(rare, "shingle").select(col("doc_a"), col("shingle"))
    val corpusPost = post.join(corpus.select(col("doc_id").as("doc_b")),
      col("doc_id") === col("doc_b")).select(col("doc_b"), col("shingle").as("sh_r"))
    val cand = deltaPost.join(corpusPost, col("shingle") === col("sh_r"))
      .select("doc_a", "doc_b").distinct()
    val cnt = post.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val overlap = cand
      .join(post.select(col("doc_id").as("pa"), col("shingle").as("sha")), col("doc_a") === col("pa"))
      .join(post.select(col("doc_id").as("pb"), col("shingle").as("shb")),
        col("doc_b") === col("pb") && col("sha") === col("shb"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ov"))
    val nearDup = overlap
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .where(col("ov").cast("double") / (col("na") + col("nb") - col("ov")) >= jaccardMin)
      .select(col("doc_a").as("doc_id")).distinct()
    val survivors = exactNew.join(nearDup, Seq("doc_id"), "left_anti")
    appendIdempotent(spark, survivors, storeDir, batchId)
  }

  /** Idempotent single-file append: the batch lands as ONE file named
    * by its batchId via atomic rename-replace, so a foreachBatch
    * replay overwrites its own previous attempt and rows can never
    * double. An all-dropped batch removes a crashed attempt's file to
    * keep replays aligned with the recomputation.
    */
  private def appendIdempotent(spark: SparkSession, survivors: DataFrame,
      storeDir: String, batchId: Long): Long = {
    val scratch = java.nio.file.Files.createTempDirectory(s"graft-ingest-$batchId-")
    try {
      survivors.coalesce(1).write.mode("overwrite").parquet(s"$scratch/out")
      val part = Option(new java.io.File(s"$scratch/out").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val target = java.nio.file.Paths.get(storeDir, s"ingest-$batchId.parquet")
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
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(scratch.toFile)
    }
  }

  /** PASSAGE-granular dedup-at-ingest — the streaming form of
    * x_passage_dedup: each micro-batch's documents are chunked into
    * fixed non-overlapping token windows, passages already present in
    * the compacted store (or claimed by an earlier doc of the same
    * batch — keep-first by (doc_id, chunk_id)) are dropped, and each
    * surviving document is REBUILT from its novel passages before the
    * idempotent append. A document whose every passage is recycled
    * contributes nothing and is not stored (unlike the batch query,
    * which keeps an empty audit row — ingest stores text, not audits).
    *
    * Replay-idempotent like ingestBatch: the corpus read self-excludes
    * the batch's own doc_ids, so a crashed attempt's append is
    * recomputed identically and overwritten.
    *
    * Scale shape: the store-side passage set is one distinct over the
    * compacted corpus per batch here; a production deployment keeps a
    * passage-digest side table maintained by the same append protocol
    * so the probe is an equi-join against digests, not a re-chunk —
    * the plan shape (anti-join on passage content) is identical.
    */
  def ingestPassageBatch(spark: SparkSession, batch: DataFrame, storeDir: String,
      batchId: Long, chunkTokens: Int = 16): Long = {
    val docs = normalizedDocs(batch)
    val corpus = Compaction.readCompacted(spark, storeDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text").cast("string").as("text"))
      .join(docs.select("doc_id"), Seq("doc_id"), "left_anti")
    val corpusPassages = graft.llm.CurationQueries.chunkDf(corpus, chunkTokens, overlap = 0)
      .select("chunk_text").distinct()
    val ch = graft.llm.CurationQueries.chunkDf(docs, chunkTokens, overlap = 0)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
    val keptInBatch = ch.withColumn("rn", row_number().over(
        Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_id")))
      .where(col("rn") === 1)
    val novel = keptInBatch.join(corpusPassages, Seq("chunk_text"), "left_anti")
    val rebuilt = novel.groupBy("doc_id").agg(
      array_join(transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        s => s.getField("chunk_text")), " ").as("text"))
    appendIdempotent(spark, rebuilt.select("doc_id", "text"), storeDir, batchId)
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
