package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.CdcBus
import graft.llm.{HashDedup, Multimodal, TextOps, VectorOps}
import graft.rel.RelQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; each oracle-checkable one has a DuckDB SQL twin in
  * [[oracleSql]] executed by the driver on the same parquet tables
  * (plain table names, e.g. `FROM events`). Column names are aligned
  * between both sides; every query ends in a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CdcBus.routeHot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcBus.queries ++ RelQueries.queries ++ graft.rel.Bucketed.queries ++
      TextOps.queries ++ HashDedup.queries ++ VectorOps.queries ++
      Multimodal.queries ++ graft.stream.StreamGrade.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CdcBus.oracle ++ RelQueries.oracle ++ graft.rel.Bucketed.oracle ++
      TextOps.oracle ++ HashDedup.oracle ++ VectorOps.oracle ++
      Multimodal.oracle ++ graft.stream.StreamGrade.oracle
}
