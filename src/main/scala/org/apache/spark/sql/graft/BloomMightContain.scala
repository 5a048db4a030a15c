// Lives under org.apache.spark.sql because BloomFilterMightContain and
// the Column↔Expression bridge (classic.ExpressionUtils) are
// private[sql]/internal — the same pattern as QuantizedDot.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-level entry point for Spark's internal
  * [[BloomFilterMightContain]] — the probe side of the
  * `bloom_filter_agg` sketch (the aggregate IS registered in the SQL
  * function registry; the probe is internal-only because Spark
  * normally injects it itself as a runtime row-level filter). Exposed
  * here so a query can apply a broadcast Bloom sketch as an explicit
  * pre-filter ahead of an exact join — see
  * `CurationQueries.decontaminateBloomDf` for the consumer and the
  * scale rationale.
  *
  * `bloom` must be the binary sketch produced by `bloom_filter_agg`;
  * `valueHash` must be the SAME hash of the probed value that was
  * aggregated (conventionally `xxhash64(v)`). False positives are the
  * contract — callers follow with an exact verify; false negatives
  * never occur.
  */
object BloomMightContain {
  def apply(bloom: Column, valueHash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(valueHash)))
}

/** Column-level entry point for the `bloom_filter_agg` sketch builder
  * ([[BloomFilterAggregate]]) — registered only in Spark's internal
  * function registry, so exposed here the same way as the probe.
  * Default sizing (1M estimated items); the input must be the long
  * hash that [[BloomMightContain]] will probe with.
  */
object BloomFilterAgg {
  def apply(valueHash: Column): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(valueHash))
        .toAggregateExpression())
}
