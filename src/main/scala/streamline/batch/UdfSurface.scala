package streamline.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import streamline.{Q, Tables}
import streamline.agg.WeightedAvg
import streamline.expr.Exprs

/** §2.10 UDF/UDAF surface — user extension points of the reference
  * lineage (Flink ScalarFunction / AggregateFunction; the TableFunction
  * witness is q_flatmap/q_udtf_explode in Relational).
  *
  * q_udf_scalar deliberately computes the same value through BOTH
  * extension mechanisms — a black-box Scala UDF and a codegen'd custom
  * Catalyst Expression — so the oracle match also proves they agree.
  * At scale the Expression path is the one to use: it participates in
  * whole-stage codegen, while the UDF forces serialization boundaries.
  */
object UdfSurface {

  private val revenueUdf = udf((p: Double, d: Double) => p * (1.0 - d))

  private def udfScalar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber",
        revenueUdf($"l_extendedprice", $"l_discount").as("udf_rev"),
        Exprs.revenue($"l_extendedprice", $"l_discount").as("expr_rev"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val udfScalarSql = """
    SELECT l_orderkey, l_linenumber,
      l_extendedprice * (1 - l_discount) AS udf_rev,
      l_extendedprice * (1 - l_discount) AS expr_rev
    FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  private def udafAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wavg = udaf(WeightedAvg)
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      // Final division is IEEE-double in both engines but their
      // decimal→double casts of the huge sums differ in the last ulp —
      // 6dp rounding puts both far inside the same decimal.
      .agg(round(wavg($"l_extendedprice", $"l_quantity"), 6)
          .as("wavg_price"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val udafAggSql = """
    SELECT l_returnflag, l_linestatus,
      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
               CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) /
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
        AS wavg_price,
      count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val all: Seq[Q] = Seq(
    Q("q_udf_scalar", udfScalar _, udfScalarSql),
    Q("q_udaf_agg", udafAgg _, udafAggSql))
}
