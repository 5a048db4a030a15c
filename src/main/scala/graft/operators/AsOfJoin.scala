package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the
  * greatest `rightTs <= leftTs` within the same key — the standard
  * event-time enrichment operator (DuckDB/kdb `ASOF JOIN`), which
  * Spark has no built-in for.
  *
  * Implementation is the union-scan formulation, not a range join:
  * tag both sides, union, and run ONE ordered window per key taking
  * the last non-null right payload at or before each row. Cost is a
  * single shuffle on the key plus a linear per-partition scan —
  * no (leftTs, rightTs) range explosion, no per-row backward probe.
  * At 100 TB this is the only shape that holds: the window state is
  * one row (the running "most recent right payload"), and skewed keys
  * degrade linearly, never quadratically.
  *
  * Tie semantics: a right row at exactly `leftTs` matches (<=); the
  * caller must make the right side unique per (key, ts) for the
  * result to be deterministic (e.g. keep the max-id row per ts).
  */
object AsOfJoin {

  /** @param left       left (probe) rows
    * @param right      right (reference) rows, unique per (key, ts)
    * @param key        equi-join key column name (present on both)
    * @param ts         event-time column name (present on both)
    * @param rightCols  right payload columns to carry; emitted as
    *                   `prior_<name>`, null when no right row precedes
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame = {
    val payload = rightCols.map(c => s"prior_$c")
    // side: 0 = right, 1 = left, so rights sort before lefts at equal
    // ts and an exactly-simultaneous right row matches (<= semantics).
    val lTagged = left.withColumn("side", lit(1))
    val rTagged = right
      .select(col(key) +: col(ts).as("prior_ts_src") +:
        rightCols.map(c => col(c).as(s"prior_$c")): _*)
      .withColumn(ts, col("prior_ts_src"))
      .withColumn("side", lit(0))
    // unionByName fills each side's missing columns with typed nulls
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = ("prior_ts_src" +: payload).foldLeft(unioned)(
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.where(col("side") === 1)
      .withColumnRenamed("prior_ts_src", s"prior_$ts")
      .drop("side")
  }
}
