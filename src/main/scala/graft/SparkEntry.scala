package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import streamline.batch._

/** Driver contract — see /root/repo/SURVEY.md §0.1 and §7.
  *
  * Every key declared in [[queries]] is one operator capability from
  * SURVEY.md §2; [[oracleSql]] carries its DuckDB-equivalent ANSI SQL
  * (omitted only for approx / semantics-only ops per the contract).
  * Column names and ordering rules follow SURVEY.md §2.12.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggGroup(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_group" -> (Aggregates.aggGroup _),
    "q_agg_global" -> (Aggregates.aggGlobal _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_group" -> Aggregates.aggGroupSql,
    "q_agg_global" -> Aggregates.aggGlobalSql
  )
}
