package graft.pipelines

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** OLAP analytics surface beyond the reference: rollup, pivot, exact
  * quantiles, sketch-based profiling.
  */
object AnalyticsQueries {

  /** ROLLUP over (status, year): subtotal + grand-total rows. Group
    * nulls coalesced to sentinel values so the oracle compare is
    * null-representation-independent.
    */
  val rollup: QueryDef = QueryDef.sql(
    "x_rollup",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |       COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, year(o_orderdate))""") { (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), year(col("o_orderdate")).as("yr_raw"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("yr_raw").cast("long"), lit(-1L)).as("yr"),
        col("n"), col("total"))
  }

  /** Pivot: returnflag × linestatus counts as columns (the relational
    * pivot operator; oracle = conditional aggregation).
    */
  val pivotCounts: QueryDef = QueryDef.sql(
    "x_pivot",
    """SELECT l_returnflag,
      |       count(*) FILTER (WHERE l_linestatus = 'O') AS n_open,
      |       count(*) FILTER (WHERE l_linestatus = 'F') AS n_finished
      |FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("O", "F"))
      .agg(count(lit(1)))
      .select(col("l_returnflag"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_finished"))
  }

  /** Exact quantiles (linear interpolation over sorted values) per
    * group — both engines implement the same q·(n−1) rule.
    */
  val quantiles: QueryDef = QueryDef.sql(
    "x_quantiles",
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.25) AS q25,
      |       quantile_cont(l_quantity, 0.5) AS q50,
      |       quantile_cont(l_quantity, 0.75) AS q75
      |FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
    // scalar columns rather than one array value: flat schemas are
    // what generic hash-comparators handle robustly
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25D)").as("q25"),
        expr("percentile(l_quantity, 0.5D)").as("q50"),
        expr("percentile(l_quantity, 0.75D)").as("q75"))
  }

  /** Sketch-based profiling — the 100 TB path where exact distincts
    * are unaffordable: HLL++ distinct estimates + approximate
    * percentiles. Approx values are engine-specific → rows-only check.
    */
  val approxProfile: QueryDef = QueryDef.rowsOnly("x_approx_profile") { (s, d) =>
    Tables.lineitem(s, d).agg(
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      expr("approx_percentile(l_extendedprice, 0.5D, 1000)").as("price_p50"),
      expr("approx_percentile(l_extendedprice, 0.99D, 1000)").as("price_p99"))
  }

  val all: Seq[QueryDef] = Seq(rollup, pivotCounts, quantiles, approxProfile)
}
