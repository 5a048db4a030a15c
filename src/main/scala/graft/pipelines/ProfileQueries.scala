package graft.pipelines

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Data-profiling / skew-handling operators — the data-quality side of
  * a training-data pipeline.
  */
object ProfileQueries {

  /** Table profiling: row counts, distinct/null counts, value ranges —
    * the pre-flight stats a 100 TB ingest runs before heavier ops. One
    * row per profiled table (map-side partial aggregation; tiny
    * output).
    */
  val profileStats: QueryDef = QueryDef.sql(
    "x_profile_stats",
    """SELECT 'documents' AS tbl,
      |       count(*) AS n_rows,
      |       count(DISTINCT doc_id) AS n_distinct_id,
      |       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |       CAST(min(n_chars) AS BIGINT) AS min_v,
      |       CAST(max(n_chars) AS BIGINT) AS max_v,
      |       count(DISTINCT lang) AS n_groups
      |FROM documents
      |UNION ALL
      |SELECT 'orders' AS tbl,
      |       count(*) AS n_rows,
      |       count(DISTINCT o_orderkey) AS n_distinct_id,
      |       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |       CAST(min(o_custkey) AS BIGINT) AS min_v,
      |       CAST(max(o_custkey) AS BIGINT) AS max_v,
      |       count(DISTINCT o_orderstatus) AS n_groups
      |FROM orders""") { (s, d) =>
    val docs = Tables.documents(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("doc_id")).as("n_distinct_id"),
      sum(when(col("text").isNull, 1).otherwise(0)).cast("long").as("n_null"),
      min(col("n_chars")).cast("long").as("min_v"),
      max(col("n_chars")).cast("long").as("max_v"),
      countDistinct(col("lang")).as("n_groups"))
      .select(lit("documents").as("tbl"), col("*"))
    val ord = Tables.orders(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_orderkey")).as("n_distinct_id"),
      sum(when(col("o_orderstatus").isNull, 1).otherwise(0)).cast("long").as("n_null"),
      min(col("o_custkey")).cast("long").as("min_v"),
      max(col("o_custkey")).cast("long").as("max_v"),
      countDistinct(col("o_orderstatus")).as("n_groups"))
      .select(lit("orders").as("tbl"), col("*"))
    docs.unionAll(ord)
  }

  /** Token counting, whitespace + BPE-ish: word tokens, ≤4-char
    * subword chunks (a cheap proxy for BPE piece counts), bytes, and
    * the chars-per-token ratio used for token-budget estimates.
    */
  val tokenCount: QueryDef = QueryDef.sql(
    "x_token_count",
    """SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
      |       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]{1,4}')) AS BIGINT) AS bpe_ish_tokens,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       CAST(length(text) AS DOUBLE) / nullif(len(regexp_extract_all(text, '\S+')), 0) AS chars_per_token
      |FROM documents""") { (s, d) =>
    val ws = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
    Tables.documents(s, d).select(
      col("doc_id"),
      ws.cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]{1,4}"), lit(0)))
        .cast("long").as("bpe_ish_tokens"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      (length(col("text")).cast("double") / nullif(ws, lit(0))).as("chars_per_token"))
  }

  /** Salted two-phase aggregation — the skew pattern: a hot grouping
    * key (5 event types over the whole corpus) first aggregates per
    * (key, salt) so no single reducer owns a hot key, then partials
    * combine per key. Bit-identical to the direct aggregation (counts
    * + decimal sums), which is exactly what the oracle asserts.
    */
  val skewSaltedAgg: QueryDef = QueryDef.sql(
    "x_skew_salted",
    """SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM events GROUP BY event_type""") { (s, d) =>
    val salted = Tables.events(s, d)
      .withColumn("salt", col("event_id") % 16)
      .groupBy(col("event_type"), col("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(18,4)")).as("pt"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("pt")).cast("double").as("total"))
  }

  /** Window functions — the reference's considered-but-dropped
    * "Cumulative Active Focus Org" column (SURVEY §2g, commented out
    * at organisation.py:140-142), implemented properly: per-customer
    * running order count and value total, deterministic ordering via
    * (date, key) tie-break, exact decimal running sums.
    */
  val windowCumulative: QueryDef = QueryDef.sql(
    "x_window_cumulative",
    """SELECT o_orderkey, o_custkey,
      |       CAST(row_number() OVER w AS BIGINT) AS order_seq,
      |       CAST(count(*) OVER w AS BIGINT) AS running_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      row_number().over(w).cast("long").as("order_seq"),
      count(lit(1)).over(w).cast("long").as("running_orders"),
      sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_value"))
  }

  /** JSON property extraction from the events `props` column —
    * get_json_object over a string-typed JSON payload.
    */
  val jsonProps: QueryDef = QueryDef.sql(
    "x_json_props",
    """SELECT event_id, event_type,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
      |FROM events""") { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").try_cast("bigint").as("k_value"))
  }

  val all: Seq[QueryDef] =
    Seq(profileStats, tokenCount, skewSaltedAgg, windowCumulative, jsonProps)
}
