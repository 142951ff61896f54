package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the SEMANTICS (not just the result hash) of the Spark-4
  * dynamic-SQL surface: session variables actually gate the predicate,
  * EXECUTE IMMEDIATE binds positionally, and IDENTIFIER() resolves
  * through the parser so a name cannot smuggle SQL. */
class SqlVariableSpec extends SparkSuite {

  test("the session variables gate the result (re-SET changes rows)") {
    SparkEntry.queries("q_sql_variable")(spark, sfDir).collect()
    val pred = "CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS " +
      "DECIMAL(38,0)) * graft_bal_n > graft_bal_sum_cents"
    val atMean = spark
      .sql(s"SELECT count(*) FROM customer WHERE $pred").head().getLong(0)
    // re-SET to a floor below every balance: cents·n > -∞·n holds ∀rows
    spark.sql("SET VARIABLE graft_bal_sum_cents = -99999999")
    spark.sql("SET VARIABLE graft_bal_n = 1")
    val all = spark
      .sql(s"SELECT count(*) FROM customer WHERE $pred").head().getLong(0)
    val total = spark.table("customer").count()
    assert(atMean < total && atMean > 0 && all == total,
      "the mean-balance floor must exclude some rows; the -inf floor none")
  }

  test("EXECUTE IMMEDIATE binds ? markers positionally") {
    SparkEntry.queries("q_sql_exec_immediate")(spark, sfDir).collect()
    // swap the bounds: an empty BETWEEN must return zero rows
    val swapped =
      spark.sql("EXECUTE IMMEDIATE graft_dyn_q USING 5000.0, 0.0").count()
    assert(swapped == 0L,
      "USING (5000, 0) must bind (lo=5000, hi=0) — empty range")
  }

  test("IDENTIFIER() rejects a name carrying SQL (injection-proof)") {
    SparkEntry.queries("q_sql_identifier")(spark, sfDir).collect()
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM IDENTIFIER(:tbl)",
        Map("tbl" -> "customer WHERE 1=0")).collect()
    }
    assert(e.getMessage != null)
  }

  test("SQL scripting: the WHILE loop is data-driven and conf-hygienic") {
    val key = "spark.sql.scripting.enabled"
    val before = spark.conf.getOption(key)
    val rows = SparkEntry.queries("q_sql_script")(spark, sfDir).collect()
    assert(spark.conf.getOption(key) == before,
      "scripting conf leaked out of the block")
    // the loop must have actually iterated: floor 2^k with k >= 1,
    // and the closed-form termination property holds — count above
    // floor < n/4 <= count above floor/2
    val floor = rows.head.getDouble(2)
    assert(floor > 1.0 && (math.log(floor) / math.log(2)).isWhole,
      s"floor $floor is not a power of two > 1")
    val total = spark.table("customer").count()
    val above = rows.map(_.getLong(1)).sum
    import org.apache.spark.sql.functions.col
    val aboveHalf = spark.table("customer")
      .where(col("c_acctbal") > floor / 2).count()
    assert(above < total / 4 && aboveHalf >= total / 4,
      "floor is not the FIRST power of two below the quarter threshold")
  }

  test("IDENTIFIER() varies the measure column for real") {
    val byBal = SparkEntry.queries("q_sql_identifier")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byKey = spark.sql(
      """SELECT c_mktsegment,
           CAST(sum(CAST(IDENTIFIER(:col) AS DECIMAL(18,4))) AS DOUBLE)
             AS total, count(*) AS n
         FROM IDENTIFIER(:tbl) GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",
      Map("tbl" -> "customer", "col" -> "c_custkey"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byBal.keySet == byKey.keySet && byBal != byKey)
  }
}
