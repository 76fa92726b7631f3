package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All capability implementations live in graft.queries.* / graft.operators.*;
  * this object only aggregates them into the driver-facing registry.
  */
object SparkEntry {

  /** Every declared capability, in SURVEY.md §2 order. */
  def registry: Seq[QueryDef] =
    queries_registry

  private lazy val queries_registry: Seq[QueryDef] =
    graft.queries.RelationalQueries.all ++
      graft.queries.ScalarQueries.all ++
      graft.queries.AnalyticQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.StreamingQueries.all ++
      graft.queries.OperatorQueries.all ++
      graft.queries.CoverageQueries.all ++
      graft.queries.CepQueries.all ++
      graft.queries.StreamingQueries2.all ++
      graft.queries.UdfQueries.all ++
      graft.queries.CoverageQueries2.all ++
      graft.queries.CoverageQueries3.all ++
      graft.queries.CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
