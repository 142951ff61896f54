package streamline

import graft.{SparkEntry, SparkSuite}

/** Plan-shape audit for the remaining TPC-H suite (SURVEY.md §2.13,
  * SqlTpch.scala): each query's scaladoc claims a planner property —
  * semi/anti decorrelation, broadcast dimensions, pushed-down scans,
  * no cartesians — and this spec pins them so a regression fails
  * loudly before the bench sees it. */
class SqlTpchPlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("tpch6: every predicate reaches the parquet scan, columns pruned") {
    val p = plan("q_sql_tpch6")
    assert(p.contains("PushedFilters"), p.take(400))
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"),
      s"scan reads pruned columns: $read")
  }

  test("tpch4: correlated EXISTS decorrelates to a left-semi join") {
    assert(plan("q_sql_tpch4").contains("LeftSemi"))
  }

  test("tpch21: the EXISTS/NOT EXISTS pair plans as semi + anti, " +
       "no cartesian") {
    val p = plan("q_sql_tpch21")
    assert(p.contains("LeftSemi"), "EXISTS should plan as left-semi")
    assert(p.contains("LeftAnti"), "NOT EXISTS should plan as left-anti")
    assert(!p.contains("CartesianProduct"))
  }

  test("tpch20: the nested IN chain plans as stacked semi joins") {
    val p = plan("q_sql_tpch20")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"expected two semi joins (supplier IN ..., part IN ...):\n${p.take(600)}")
  }

  test("tpch2: dimensions broadcast; min-per-group joins back " +
       "without a cartesian") {
    val p = plan("q_sql_tpch2")
    assert(p.contains("BroadcastHashJoin"), "nation/region should broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("tpch15: the scalar max joins back as a single-row broadcast") {
    val p = plan("q_sql_tpch15")
    assert(p.contains("BroadcastHashJoin"),
      "the 1-row max(total_revenue) side should broadcast")
  }

  test("tpch17: the per-part aggregate is map-side partial before its " +
       "shuffle") {
    val p = plan("q_sql_tpch17")
    assert(p.contains("partial"), "pq aggregate should map-side combine")
    assert(!p.contains("CartesianProduct"))
  }

  test("tpch19: the disjunctive predicate keeps the p_partkey equi " +
       "join (no cartesian)") {
    val p = plan("q_sql_tpch19")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "partkey equi join expected")
    assert(!p.contains("CartesianProduct"))
  }

  test("correlated scalar subquery decorrelates to one agg + outer " +
       "join, and the COUNT bug reads 0") {
    val df = SparkEntry.queries("q_sql_correlated_scalar")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftOuter") || p.contains("Join"),
      "scalar subquery should decorrelate to a join")
    assert(!p.contains("CartesianProduct"))
    // COUNT bug: an order with no lineitems must read n_items = 0
    import org.apache.spark.sql.functions.col
    val zeros = df.where(col("n_items") === 0L).count()
    assert(zeros > 0, "expected lineitem-less orders counting 0")
  }

  test("multi-distinct aggregate plans through Expand") {
    val p = SparkEntry.queries("q_agg_multi_distinct")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"),
      s"multi COUNT(DISTINCT) should plan via Expand:\n${p.take(400)}")
  }

  test("tpch13: ON-clause filter preserves every customer and drops " +
       "only urgent orders") {
    import org.apache.spark.sql.functions.{col, expr}
    val out = SparkEntry.queries("q_sql_tpch13")(spark, sfDir)
    val Array(custSum, orderSum) = out
      .agg(expr("sum(custdist)"), expr("sum(c_count * custdist)"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    // LEFT JOIN preservation: the histogram covers every customer
    assert(custSum == streamline.Tables.customer(spark, sfDir).count())
    // ON-clause (not WHERE) filter: counted orders = non-urgent orders
    // with a real customer, no more, no fewer
    val expected = streamline.Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .join(streamline.Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "leftsemi").count()
    assert(orderSum == expected)
  }
}
