package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared text/embedding column helpers for the LLM-pipeline operators.
  * Everything is built from exact integer arithmetic (token/shingle
  * dictionary ids, modular hashes, quantized embeddings) so results are
  * bit-reproducible across engines and across shuffle reorderings — a
  * hard requirement both for the DuckDB oracle and for deterministic
  * re-runs of a 100 TB dedup job.
  */
object TextOps {

  /** Tokenize: lowercase word/number runs. Matches DuckDB's
    * `regexp_extract_all(lower(text), '[a-z0-9]+')`.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** (doc_id, shingle) postings — the inverted-index representation all
    * set-similarity ops run on: one row per distinct (doc, word
    * k-shingle).
    *
    * Built with posexplode + window `lead` rather than array
    * higher-order functions: HOF lambdas run interpreted
    * (CodegenFallback), which measured ~20× slower than this fully
    * codegen'd shape. The window partitions by doc_id — perfectly
    * parallel at any corpus size.
    */
  def shinglePostings(docs: DataFrame, k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val parts = col("tok") +: (1 until k).map(o => lead("tok", o).over(w))
    toks.select(col("doc_id"),
        concat_ws(" ", parts: _*).as("shingle"),
        lead("tok", k - 1).over(w).isNotNull.as("complete"))
      .where(col("complete"))
      .select("doc_id", "shingle")
      .distinct()
  }

  /** Global shingle dictionary: deterministic dense integer ids —
    * sid = global rank of the shingle among sorted distinct shingles
    * (matching the oracle's `row_number() OVER (ORDER BY shingle)`).
    *
    * Computed as a two-phase distributed rank, NOT a no-partition
    * window (which would funnel the whole vocabulary through one
    * task): range-partition the distinct shingles, rank locally
    * within each ordered partition (parallel), then add per-partition
    * offsets. The offset table has one row per partition — bounded by
    * cluster config, not data — so it broadcasts. sid is invariant to
    * the partition boundaries: it is always the global sorted rank.
    */
  def shingleDict(postings: DataFrame): DataFrame = {
    val distinct = postings.select("shingle").distinct()
    // range partitions are ordered by pid: every shingle in pid i
    // sorts before every shingle in pid i+1 (AQE coalescing merges
    // contiguous partitions, preserving this). The lazy
    // localCheckpoint pins one pid assignment: the plan fans out
    // below, and without pinning the fan-out branches agree only
    // while exchange reuse dedupes the identical range shuffle —
    // re-sampled boundaries would silently skew sids. Lazy keeps
    // plan-only paths free (blocks materialize at the first action,
    // then every branch reads the snapshot); unlike .cache(),
    // checkpointed blocks are released by the ContextCleaner once
    // unreferenced (no CacheManager entry), so the dict build does
    // not pin storage for the session lifetime.
    val parted = distinct.repartitionByRange(col("shingle"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val local = parted.withColumn("lr",
      row_number().over(Window.partitionBy("pid").orderBy("shingle")).cast("long"))
    // per-partition sizes fall out of the window for free: cnt = max lr
    val counts = local.groupBy("pid").agg(max("lr").as("cnt"))
    val countsB = counts.select(col("pid").as("pid_b"), col("cnt").as("cnt_b"))
    // offset(p) = Σ cnt over pid < p: a triangular join over the tiny
    // per-partition counts (avoids another no-partition window).
    val offsets = counts.join(countsB, col("pid_b") < col("pid"), "left")
      .groupBy("pid").agg(coalesce(sum("cnt_b"), lit(0L)).as("off"))
    local.join(broadcast(offsets), "pid")
      .select(col("shingle"), (col("off") + col("lr")).as("sid"))
  }

  /** Quantize a float embedding to exact longs (×1000) — integer dot
    * products are order-insensitive and engine-reproducible, unlike
    * float sums.
    */
  def quantize(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors — native
    * codegen'd expression; the equivalent HOF
    * `aggregate(zip_with(a,b,_*_),0,_+_)` runs interpreted and is
    * several times slower on pair-scoring hot paths.
    */
  def qdot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.QuantizedDot(a, b)

  /** Cosine similarity from quantized vectors (single double division
    * over exact ints — bitwise identical in any engine).
    */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b) / (sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double")))
}
