package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipelines._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY §2 is registered here as a
  * named query; SQL-expressible ones carry a DuckDB oracle twin.
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    ReportPipelines.all ++ EntityPipelines.all ++ ScalarQueries.all ++
      AggQueries.all ++ JoinQueries.all ++ FanoutQueries.all ++
      ProfileQueries.all ++ AnalyticsQueries.all ++ SqlQueries.all ++
      llm.DedupQueries.all ++ llm.SimilarityQueries.all ++
      llm.TextQueries.all ++ llm.MultimodalQueries.all ++
      llm.CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReportPipelines.opportunityExport.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = registry.map(_.name)
    val dups = names.diff(names.distinct)
    require(dups.isEmpty, s"duplicate query names would be silently dropped: $dups")
    registry.map(q => q.name -> q.run).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
