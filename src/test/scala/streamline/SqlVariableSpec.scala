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
