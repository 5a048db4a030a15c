package graft.pipelines

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Scalars._
import graft.operators.Relational._

/** Join-family queries (SURVEY §2d J1–J12, S4). Every dimension join
  * is a broadcast hash join — the Spark re-expression of the
  * reference's driver-side dict probes. At 100 TB the fact side never
  * shuffles for these; only genuinely fact-to-fact joins (lineitem ⋈
  * orders) shuffle on their key, and those co-partition on the join
  * key so AQE can coalesce.
  */
object JoinQueries {

  /** J1/J2 + P2: quote-style broadcast lookup with coalesce-default
    * semantics (quote.py:220,226) — missing dim row → "".
    */
  val jLookup: QueryDef = QueryDef.sql(
    "j_lookup",
    """SELECT o.o_orderkey, o.o_custkey,
      |       COALESCE(c.c_name, '') AS org_name,
      |       COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
      |       strftime(o.o_orderdate, '%d-%b-%y %-I:%M %p') AS created
      |FROM orders o
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey""") { (s, d) =>
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .select(
        col("o_orderkey"), col("o_custkey"),
        coalesce(col("c_name"), lit("")).as("org_name"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        date_format(col("o_orderdate"), "dd-MMM-yy h:mm a").as("created"))
  }

  /** J4 role-playing dims: nation joined under two roles (customer's
    * vs supplier's) — one broadcast relation probed twice, as the
    * reference probes one `orgs` map under 3 roles
    * (opportunity.py:206,208,229).
    */
  val jRolePlaying: QueryDef = QueryDef.sql(
    "j_role_playing",
    """SELECT l.l_orderkey, l.l_linenumber,
      |       COALESCE(cn.n_name, '') AS cust_nation,
      |       COALESCE(sn.n_name, '') AS supp_nation
      |FROM lineitem l
      |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, d)
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val withCust = li.select("l_orderkey", "l_linenumber", "l_suppkey")
      .join(o, li("l_orderkey") === o("o_orderkey"), "left")
      .join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
    val custNation = rolePlayingJoin(withCust, n, col("c_nationkey"), "n_nationkey",
      "cust", Seq("n_name" -> "nation"))
    val suppSide = custNation
      .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"), "left")
    rolePlayingJoin(suppSide, n, sup("s_nationkey"), "n_nationkey",
      "supp", Seq("n_name" -> "nation"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("cust_nation"), lit("")).as("cust_nation"),
        coalesce(col("supp_nation"), lit("")).as("supp_nation"))
  }

  /** S4 semi-join prefetch (task.py:79-104): dimension restricted to
    * the fact's (filtered, deduped) key set — left-semi join, which
    * Spark plans as a broadcast of the distinct keys.
    */
  val jSemiPrefetch: QueryDef = QueryDef.sql(
    "j_semi_prefetch",
    """SELECT p_partkey, p_name, p_brand, p_retailprice
      |FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)""") { (s, d) =>
    val p = Tables.part(s, d)
    val keys = Tables.lineitem(s, d)
      .where(col("l_quantity") > 45)
      .select(col("l_partkey"))
    semiFilteredDim(p, "p_partkey", keys)
      .select("p_partkey", "p_name", "p_brand", "p_retailprice")
  }

  /** J10 2-hop chained lookup (task.py:198-201,233-237):
    * orders → customer → nation → region with left-outer fallbacks.
    */
  val jTwoHop: QueryDef = QueryDef.sql(
    "j_two_hop",
    """SELECT o.o_orderkey,
      |       COALESCE(c.c_name, '') AS org_name,
      |       COALESCE(n.n_name, '') AS nation_name,
      |       COALESCE(r.r_name, '') AS region_name
      |FROM orders o
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""") { (s, d) =>
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(
        col("o_orderkey"),
        coalesce(col("c_name"), lit("")).as("org_name"),
        coalesce(col("n_name"), lit("")).as("nation_name"),
        coalesce(col("r_name"), lit("")).as("region_name"))
  }

  /** J12 struct-valued role-playing lookup (invoice.py:115-119):
    * customer payload (name, type, region-analog) joined under two
    * roles — the invoiced org (o_custkey) and a "site" org (shifted
    * key, exercising the missing-row default path). Payload flattened
    * to role-prefixed columns per SURVEY §2d's "(or 3-col join)".
    */
  val jStructPayload: QueryDef = QueryDef.sql(
    "j_struct_payload",
    """SELECT o.o_orderkey,
      |       COALESCE(m.c_name, '') AS org_name,
      |       COALESCE(m.c_mktsegment, '') AS org_type,
      |       COALESCE(CAST(m.c_nationkey AS BIGINT), -1) AS org_region,
      |       COALESCE(st.c_name, '') AS site_name,
      |       COALESCE(st.c_mktsegment, '') AS site_type,
      |       COALESCE(CAST(st.c_nationkey AS BIGINT), -1) AS site_region
      |FROM orders o
      |LEFT JOIN customer m ON o.o_custkey = m.c_custkey
      |LEFT JOIN customer st ON o.o_custkey + 1 = st.c_custkey""") { (s, d) =>
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d)
    val payload = Seq("c_name" -> "name", "c_mktsegment" -> "type", "c_nationkey" -> "nationkey")
    val main = rolePlayingJoin(o, c, col("o_custkey"), "c_custkey", "org", payload)
    val both = rolePlayingJoin(main, c, col("o_custkey") + 1, "c_custkey", "site", payload)
    both.select(
      col("o_orderkey"),
      coalesce(col("org_name"), lit("")).as("org_name"),
      coalesce(col("org_type"), lit("")).as("org_type"),
      coalesce(col("org_nationkey").cast("long"), lit(-1L)).as("org_region"),
      coalesce(col("site_name"), lit("")).as("site_name"),
      coalesce(col("site_type"), lit("")).as("site_type"),
      coalesce(col("site_nationkey").cast("long"), lit(-1L)).as("site_region"))
  }

  /** Anti + semi joins (beyond the reference, which has only the S4
    * semi): customers partitioned into has-orders / no-orders via
    * left_semi / left_anti — the EXISTS / NOT EXISTS pair.
    */
  val jAntiSemi: QueryDef = QueryDef.sql(
    "j_anti_semi",
    """SELECT c_custkey, c_name, 'has_orders' AS status
      |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |UNION ALL
      |SELECT c_custkey, c_name, 'no_orders' AS status
      |FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""") { (s, d) =>
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    val keys = Tables.orders(s, d).select(col("o_custkey"))
    val semi = c.join(keys, c("c_custkey") === keys("o_custkey"), "left_semi")
      .withColumn("status", lit("has_orders"))
    val anti = c.join(keys, c("c_custkey") === keys("o_custkey"), "left_anti")
      .withColumn("status", lit("no_orders"))
    semi.unionAll(anti)
  }

  /** Set operations: INTERSECT / EXCEPT between the ordering-customer
    * key set and the BUILDING-segment key set.
    */
  val jSetOps: QueryDef = QueryDef.sql(
    "j_set_ops",
    """SELECT 'both' AS tag, k FROM (
      |  SELECT o_custkey AS k FROM orders
      |  INTERSECT
      |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
      |UNION ALL
      |SELECT 'orders_only' AS tag, k FROM (
      |  SELECT o_custkey AS k FROM orders
      |  EXCEPT
      |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')""") { (s, d) =>
    val orderKeys = Tables.orders(s, d).select(col("o_custkey").as("k"))
    val buildingKeys = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
    orderKeys.intersect(buildingKeys).select(lit("both").as("tag"), col("k"))
      .unionAll(orderKeys.except(buildingKeys).select(lit("orders_only").as("tag"), col("k")))
  }

  val all: Seq[QueryDef] = Seq(
    jLookup, jRolePlaying, jSemiPrefetch, jTwoHop, jStructPayload, jAntiSemi, jSetOps)
}
