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
    // Internal working names and the emitted prior_* names must be free
    // on the inputs — a silent withColumn overwrite would replace user
    // data with the operator's tag constant with no error.
    val internal = Set("side", "__prior")
    val emitted = (ts +: rightCols).map("prior_" + _).toSet
    val lClash = left.columns.filter(c => internal(c) || emitted(c))
    require(lClash.isEmpty,
      s"asofJoin: left columns collide with internal/emitted names: ${lClash.mkString(", ")}")
    val rClash = right.columns.filter(internal)
    require(rClash.isEmpty,
      s"asofJoin: right columns collide with internal names: ${rClash.mkString(", ")}")
    require(!rightCols.contains(ts),
      s"asofJoin: rightCols must not repeat the ts column '$ts' (prior_$ts is emitted already)")
    // side: 0 = right, 1 = left, so rights sort before lefts at equal
    // ts and an exactly-simultaneous right row matches (<= semantics).
    // The right payload travels as ONE struct and the window fills
    // that struct atomically — filling each column independently with
    // its own last(ignoreNulls) would tear rows: a NULL field in the
    // matched right row would be silently backfilled from an OLDER
    // right row. Null-ts right rows are excluded (no event time = can
    // never be "the most recent at or before t").
    val lTagged = left.withColumn("side", lit(1))
    val rTagged = right
      .where(col(ts).isNotNull)
      .select(col(key), col(ts),
        struct(col(ts).as(s"prior_$ts") +:
          rightCols.map(c => col(c).as(s"prior_$c")): _*).as("__prior"),
        lit(0).as("side"))
    // unionByName fills each side's missing columns with typed nulls
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = left.columns.toSeq.map(col) ++
      (s"prior_$ts" +: rightCols.map(c => s"prior_$c"))
        .map(c => col(s"__prior.$c").as(c))
    unioned
      .withColumn("__prior", last(col("__prior"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(outCols: _*)
  }
}
