package graft.pipelines

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Scalars._
import graft.operators.Relational._

/** Report-pipeline analogs of the reference's seven entity exports
  * (SURVEY §3), role-mapped onto the TPC-H-ish testdata per §7:
  * orders ≈ Opportunity/Quote fact, customer(+nation/region) ≈
  * role-playing Organisation dims, supplier ≈ Users/owners, part ≈
  * Products, lineitem ≈ OpportunityLineItems.
  *
  * The reference's nested inputs (CUSTOMFIELDS EAV, LINKS edges) don't
  * exist in the testdata, so each pipeline synthesizes them from flat
  * columns first (array(struct(...)) / groupBy-collect) and then runs
  * the real operator (pivot, link-count, last-wins routing) on the
  * nested value — keeping the oracle expressible as the equivalent
  * flat SQL.
  */
object ReportPipelines {

  /** Organisation export analog (organisation.py:151-182): G3 EAV
    * pivot, A1 conditional link count, F1/F3/F7 scalars, 8-col P1
    * projection, D1 dedup.
    *
    * Plan shape at scale: one shuffle (orders groupBy custkey for the
    * link/first-order agg), nation broadcast, everything else narrow.
    */
  val orgExport: QueryDef = QueryDef.sql(
    "org_export",
    """SELECT DISTINCT
      |  c.c_custkey AS org_id,
      |  trim(regexp_replace(c.c_name, '[\r\n]', ' ', 'g')) AS org_name,
      |  COALESCE(n.n_name, '') AS country,
      |  CASE WHEN c.c_acctbal > 0 THEN 'TRUE' ELSE 'FALSE' END AS active,
      |  c.c_mktsegment AS region,
      |  CAST(c.c_custkey % 4 AS VARCHAR) AS call_frequency,
      |  COALESCE(o.cnt, 0) AS linked_contacts_count,
      |  COALESCE(o.created, '') AS created_date
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN (
      |  SELECT o_custkey,
      |         COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt,
      |         strftime(MIN(o_orderdate), '%m/%d/%Y') AS created
      |  FROM orders GROUP BY o_custkey
      |) o ON o.o_custkey = c.c_custkey""") { (s, d) =>
    val cust = Tables.customer(s, d)
    val nat  = Tables.nation(s, d)
    val ord  = Tables.orders(s, d)

    // LINKS synthesis: orders become typed edges; sort_array makes the
    // collected order deterministic (reference scan order never was —
    // SURVEY §7 nondeterminism note).
    val linkAgg = ord.groupBy(col("o_custkey")).agg(
      sort_array(collect_list(struct(
        when(col("o_orderstatus") === "O", "Contact")
          .when(col("o_orderstatus") === "F", "Opportunity")
          .otherwise("Lead").as("LINK_OBJECT_NAME"),
        col("o_orderkey").as("LINK_OBJECT_ID")))).as("LINKS"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("created_raw"))

    // CUSTOMFIELDS synthesis → G3 pivot back through map_from_entries.
    val eav = array(
      struct(lit("Active__c").as("FIELD_NAME"),
        when(col("c_acctbal") > 0, "true").otherwise("false").as("FIELD_VALUE")),
      struct(lit("Region__c").as("FIELD_NAME"), col("c_mktsegment").as("FIELD_VALUE")),
      struct(lit("Call_Frequency__c").as("FIELD_NAME"),
        (col("c_custkey") % 4).cast("string").as("FIELD_VALUE")))

    dedup(cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
      .join(linkAgg, cust("c_custkey") === linkAgg("o_custkey"), "left")
      .withColumn("cf", pivotEav(eav))
      .select(
        col("c_custkey").as("org_id"),
        cleanText(col("c_name")).as("org_name"),
        coalesce(col("n_name"), lit("")).as("country"),
        boolRenderUpper(try_element_at(col("cf"), lit("Active__c"))).as("active"),
        eavGet(col("cf"), "Region__c").as("region"),
        eavGet(col("cf"), "Call_Frequency__c").as("call_frequency"),
        countLinksOfType(col("LINKS"), "Contact").cast("long").as("linked_contacts_count"),
        coalesce(formatDateOnly(col("created_raw")), lit("")).as("created_date")))
  }

  val all: Seq[QueryDef] = Seq(orgExport)
}
