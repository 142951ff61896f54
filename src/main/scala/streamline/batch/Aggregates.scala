package streamline.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import streamline.Tables
import streamline.util.Det._

/** §2.4 Aggregations — grouped/global aggregate surface of the reference
  * lineage (Flink 1.x hash/sort aggregate with partial+final combine;
  * SURVEY.md §2.4). Spark's HashAggregateExec does partial/final combine
  * automatically, so every query here is a single declarative groupBy —
  * at 100 TB the map-side partial aggregation bounds the shuffle to
  * |groups| × partitions rows, which is the same scaling story Flink's
  * combiners gave.
  *
  * All money/quantity math is exact DECIMAL until a final double cast
  * (see [[streamline.util.Det]]), so results are partition-order
  * independent — mandatory for the DuckDB hash-match (SURVEY.md §2.12).
  */
object Aggregates {

  /** q_agg_group — TPC-H Q1 shape: filter → grouped agg (partial+final)
    * → sort. The flagship query (SparkEntry.entry). */
  def aggGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .where($"l_shipdate" <= lit("1998-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_base_price"),
        asDouble(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))))
          .as("sum_disc_price"),
        davg("l_quantity").as("avg_qty"),
        davg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val aggGroupSql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
      CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** q_agg_global — global (no-key) aggregate: one row out; at scale the
    * partial aggregation reduces each partition to one row before the
    * single-reducer final step. */
  def aggGlobal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        dsum("l_extendedprice").as("sum_price"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"),
        davg("l_extendedprice").as("avg_price"),
        tsOut(min($"l_shipdate")).as("min_ship"),
        tsOut(max($"l_shipdate")).as("max_ship"))
  }

  val aggGlobalSql: String = """
    SELECT count(*) AS n_rows,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      min(l_quantity) AS min_qty,
      max(l_quantity) AS max_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
      min(l_shipdate) AS min_ship,
      max(l_shipdate) AS max_ship
    FROM lineitem"""
}
