package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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
  /** Legacy conf under which Parquet TIMESTAMP(NANOS) columns read as
    * raw nanosecond longs (Spark's vectorized reader otherwise rejects
    * the type). Sessions that may touch nanos-encoded files should set
    * it at SESSION BUILD time — a library loader must not silently flip
    * a session-global flag as a side effect of one read. Harmless when
    * the file carries a native micros timestamp.
    */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Normalize an observed `ts` physical encoding to a session-zoned
    * TimestampType column (lossless; the data is µs-precise):
    *  - LongType            → legacy nanos-as-long read ([[NanosAsLongKey]]);
    *                          truncate to micros and rebuild the timestamp.
    *  - TimestampNTZType    → native Parquet `timestamp[us]` without
    *                          isAdjustedToUTC; reinterpret the wall-clock
    *                          in the session zone (UTC in every entry
    *                          point), matching what the legacy path
    *                          produced for identical instants.
    *  - TimestampType       → already what we want; pass through.
    * The testdata has been regenerated across encodings before
    * (TIMESTAMP(NANOS) → timestamp[us]); the loader adapts to whatever
    * is on disk instead of assuming one encoding.
    */
  private[graft] def normalizeTs(dt: DataType): Column = dt match {
    case LongType           => timestamp_micros(expr("ts div 1000"))
    case _: TimestampNTZType => col("ts").cast(TimestampType)
    case _: TimestampType   => col("ts")
    case other => throw new IllegalStateException(
      s"events.ts read as unsupported type $other; expected a long " +
        "(legacy nanos-as-long), timestamp_ntz, or timestamp")
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across testdata
    * generations (TIMESTAMP(NANOS) read as long under the legacy conf;
    * now native `timestamp[us]`): branch on the schema the scan
    * actually reports and normalize to TimestampType either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.withColumn("ts", normalizeTs(df.schema("ts").dataType))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
