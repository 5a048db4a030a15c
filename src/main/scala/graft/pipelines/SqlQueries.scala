package graft.pipelines

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Textual-SQL surface: the same engine driven through `spark.sql`
  * over registered temp views — for users who speak SQL rather than
  * the DataFrame API. The oracle is (near-)literally the same SQL,
  * which also demonstrates ANSI-dialect compatibility.
  */
object SqlQueries {

  private def registerViews(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(s"v_$t"))

  /** Pricing-summary aggregate as literal SQL text. */
  val sqlAgg: QueryDef = QueryDef.sql(
    "sql_agg",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""") { (s, d) =>
    registerViews(s, d)
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM v_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Multi-way join as literal SQL text (revenue per nation). */
  val sqlJoin: QueryDef = QueryDef.sql(
    "sql_join",
    """SELECT n.n_name AS nation,
      |       COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name""") { (s, d) =>
    registerViews(s, d)
    s.sql(
      """SELECT n.n_name AS nation,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM v_lineitem l
        |JOIN v_orders o ON l.l_orderkey = o.o_orderkey
        |JOIN v_customer c ON o.o_custkey = c.c_custkey
        |JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(sqlAgg, sqlJoin)
}
