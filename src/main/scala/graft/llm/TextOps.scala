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

  /** Global shingle dictionary: deterministic dense integer ids via
    * rank over the sorted distinct shingle strings. The dictionary is
    * tiny relative to the corpus (vocabulary-sized); on a cluster it
    * broadcasts back onto the postings.
    */
  def shingleDict(postings: DataFrame): DataFrame =
    postings.select("shingle").distinct()
      .withColumn("sid", row_number().over(Window.orderBy("shingle")).cast("long"))

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
