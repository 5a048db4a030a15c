package graft.pipelines

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Aggregation queries (SURVEY §2e). Doubles are cast to decimal
  * per-row before summing so the aggregate is exact and
  * order-insensitive — a 100 TB shuffle reorders partial aggregates
  * freely, and float-sum nondeterminism would break both the oracle
  * hash and run-to-run reproducibility. Final cast back to double for
  * a stable output schema.
  */
object AggQueries {

  /** Classic wide aggregate over the fact table: map-side partial
    * aggregation (HashAggregate partial → shuffle on 2 low-cardinality
    * keys → final) — the canonical scalable agg shape.
    */
  val q1Agg: QueryDef = QueryDef.sql(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
      |       COUNT(*) AS n_rows,
      |       COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  val all: Seq[QueryDef] = Seq(q1Agg)
}
