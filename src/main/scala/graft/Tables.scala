package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale note: `spark.read.parquet` is the engine's partitioned scan —
  * the analog of the reference's count-then-fan-out paged REST scan
  * (reference modules/opportunity.py:65-89). On a real cluster each
  * row-group/file split becomes an input partition; locally the same
  * plan shape holds. Column pruning + predicate pushdown reach the
  * scan automatically because every downstream op stays declarative.
  */
object Tables {
  /** events.parquet carries Parquet TIMESTAMP(NANOS); reading it
    * requires this legacy conf so the nanos column arrives as a long.
    * It must be set at SESSION BUILD time (see Bench/Verify/Smoke and
    * the test bootstrap) — a library loader must not silently flip a
    * session-global flag as a side effect of one read.
    */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  private[graft] def requireNanosConf(s: SparkSession): Unit =
    require(s.conf.get(NanosAsLongKey, "false") == "true",
      s"events.parquet carries TIMESTAMP(NANOS): build the SparkSession with " +
        s".config(\"$NanosAsLongKey\", \"true\") (session-global legacy conf; " +
        "setting it here as a side effect would silently affect every other read)")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.parquet carries Parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; read nanos as long and rebuild a
    * microsecond timestamp (the data is µs-precise, so lossless).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    requireNanosConf(s)
    table(s, d, "events").withColumn(
      "ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
