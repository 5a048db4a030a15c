package graft.pipelines

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Scalars._

/** Operator-level queries exercising the scalar library (SURVEY §2g
  * F1–F11) on the driver testdata. All narrow, zero-shuffle plans —
  * on a cluster these are pure map stages over the parquet splits.
  */
object ScalarQueries {

  /** F2/F3/F4 date formats with the malformed-passthrough contract
    * (quote.py:175-182): rows with event_id % 7 == 0 feed the JSON
    * `props` string into the date formatters and must come back
    * verbatim.
    */
  val fDates: QueryDef = QueryDef.sql(
    "f_dates",
    """WITH b AS (
      |  SELECT event_id,
      |         CASE WHEN event_id % 7 = 0 THEN props
      |              ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ds
      |  FROM events)
      |SELECT event_id, ds,
      |       CASE WHEN event_id % 7 = 0 THEN ds
      |            ELSE strftime(strptime(ds, '%Y-%m-%d %H:%M:%S'), '%d-%b-%y %-I:%M %p') END AS d_quote,
      |       CASE WHEN event_id % 7 = 0 THEN ds
      |            ELSE strftime(strptime(ds, '%Y-%m-%d %H:%M:%S'), '%m/%d/%Y') END AS d_only,
      |       CASE WHEN event_id % 7 = 0 THEN ds
      |            ELSE strftime(strptime(split_part(ds, ' ', 1), '%Y-%m-%d'), '%d/%m/%Y') END AS d_ui
      |FROM b""") { (s, d) =>
    Tables.events(s, d)
      .withColumn("ds",
        when(col("event_id") % 7 === 0, col("props"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")))
      .select(
        col("event_id"), col("ds"),
        formatDate(col("ds")).as("d_quote"),
        formatDateOnly(col("ds")).as("d_only"),
        formatDateUi(col("ds")).as("d_ui"))
  }

  /** F1/F6/F7/F8 string scalars over customer. */
  val fStrings: QueryDef = QueryDef.sql(
    "f_strings",
    """SELECT c_custkey,
      |       trim(regexp_replace(c_name, '[\r\n]', ' ', 'g')) AS clean_name,
      |       trim(concat_ws(' ', c_name, c_mktsegment)) AS full_name,
      |       CASE WHEN c_mktsegment = 'BUILDING' THEN 'TRUE' ELSE 'FALSE' END AS is_building,
      |       COALESCE(CAST(c_custkey AS VARCHAR), '') AS id_str,
      |       upper(c_mktsegment) AS seg_upper
      |FROM customer""") { (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      cleanText(col("c_name")).as("clean_name"),
      fullName(col("c_name"), col("c_mktsegment")).as("full_name"),
      boolFromState(col("c_mktsegment"), "BUILDING").as("is_building"),
      idToString(col("c_custkey")).as("id_str"),
      upper(col("c_mktsegment")).as("seg_upper"))
  }

  /** F5 owner-string round-trip (J5 analog): lineitem ⋈ broadcast
    * supplier, format "ID;Name" / "Name||ID||User", re-split name.
    * Broadcast keeps the 600k-row fact side shuffle-free.
    */
  val fOwner: QueryDef = QueryDef.sql(
    "f_owner",
    """SELECT l.l_orderkey, l.l_linenumber,
      |       CAST(s.s_suppkey AS VARCHAR) || ';' || s.s_name AS owner,
      |       s.s_name || '||' || CAST(s.s_suppkey AS VARCHAR) || '||User' AS owner_pipe,
      |       s.s_name AS owner_name
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        ownerIdName(col("s_suppkey"), col("s_name")).as("owner"),
        ownerPipeFormat(col("s_suppkey"), col("s_name")).as("owner_pipe"),
        ownerNameFromIdName(ownerIdName(col("s_suppkey"), col("s_name"))).as("owner_name"))
  }

  /** F10/F11 URL scalars: base64url share token (one_drive.py:94-96)
    * and basename recovery (opportunity_stage.py:103-115) over
    * synthesized report URLs.
    */
  val fUrl: QueryDef = QueryDef.sql(
    "f_url",
    """WITH b AS (
      |  SELECT doc_id,
      |         'https://example.com/files/' || source || '/report_' ||
      |         CAST(doc_id AS VARCHAR) || '.xlsx?session=' || lang AS url
      |  FROM documents)
      |SELECT doc_id, url,
      |       (string_split(split_part(url, '?', 1), '/'))[-1] AS basename,
      |       'u!' || replace(replace(rtrim(base64(encode(url)), '='), '/', '_'), '+', '-') AS token
      |FROM b""") { (s, d) =>
    Tables.documents(s, d)
      .withColumn("url", concat(
        lit("https://example.com/files/"), col("source"), lit("/report_"),
        col("doc_id").cast("string"), lit(".xlsx?session="), col("lang")))
      .select(
        col("doc_id"), col("url"),
        urlBasename(col("url")).as("basename"),
        shareToken(col("url")).as("token"))
  }

  /** F12 HTML link extraction (opportunity_stage.py:94-101): find the
    * "Download Report" anchor in an HTML body and pull its href —
    * `regexp_extract` in-engine (SURVEY §2g suggests this or
    * driver-side; both are provided, this is the engine path).
    */
  val fHtmlExtract: QueryDef = QueryDef.sql(
    "f_html_extract",
    """WITH b AS (
      |  SELECT event_id,
      |         '<html><body><p>Report ready.</p><a href="https://reports.example/' ||
      |         CAST(event_id AS VARCHAR) || '/dl?t=' || event_type ||
      |         '">Download Report</a><a href="https://other.example/x">Other</a></body></html>' AS body
      |  FROM events WHERE event_type = 'purchase')
      |SELECT event_id,
      |       regexp_extract(body, '<a href="([^"]+)">Download Report</a>', 1) AS report_url
      |FROM b""") { (s, d) =>
    Tables.events(s, d)
      .where(col("event_type") === "purchase")
      .withColumn("body", concat(
        lit("<html><body><p>Report ready.</p><a href=\"https://reports.example/"),
        col("event_id").cast("string"), lit("/dl?t="), col("event_type"),
        lit("\">Download Report</a><a href=\"https://other.example/x\">Other</a></body></html>")))
      .select(
        col("event_id"),
        regexp_extract(col("body"), "<a href=\"([^\"]+)\">Download Report</a>", 1)
          .as("report_url"))
  }

  val all: Seq[QueryDef] = Seq(fDates, fStrings, fOwner, fUrl, fHtmlExtract)
}
