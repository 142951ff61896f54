package streamline

import graft.{SparkEntry, SparkSuite}

/** Plan-shape audit for the SQL-text entry (SURVEY.md §2.13): the
  * optimizer properties each query's scaladoc claims are pinned here so
  * a regression (lost pushdown, a full sort where a top-k belongs, a
  * shuffled dimension that should broadcast) fails loudly. */
class SqlPlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("tpch3: date/segment filters are pushed to the parquet scans") {
    val p = plan("q_sql_tpch3")
    assert(p.contains("PushedFilters"), p.take(400))
    assert(p.contains("c_mktsegment"), "segment filter missing")
    // top-10 by revenue must be a TakeOrdered, never a global Sort+Limit
    assert(p.contains("TakeOrderedAndProject"), "top-k planned as full sort")
  }

  test("tpch10: the 25-row nation dimension joins by broadcast") {
    val p = plan("q_sql_tpch10")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "nation should broadcast")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("tpch18: the IN subquery plans as a left-semi join") {
    val p = plan("q_sql_tpch18")
    assert(p.contains("LeftSemi"), "IN subquery should plan as left-semi")
  }

  test("tpch1: the shipdate filter reaches the scan and reads prune columns") {
    val p = plan("q_sql_tpch1")
    assert(p.contains("l_shipdate"), "shipdate filter not near the scan")
    // only the 7 needed columns are read, not the full lineitem schema
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"),
      s"scan reads pruned columns: $read")
  }

  test("exists: EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p = plan("q_sql_exists")
    assert(p.contains("LeftSemi"), "EXISTS should plan as left-semi")
    assert(p.contains("LeftAnti"), "NOT EXISTS should plan as left-anti")
  }

  test("lateral: LIMIT-in-LATERAL decorrelates to a window rank, " +
       "not a per-row subquery") {
    val p = plan("q_sql_lateral")
    assert(p.contains("Window"), "lateral top-2 should plan as a window rank")
    assert(!p.contains("CartesianProduct"), "lateral must not go cartesian")
  }

  test("hint: SHUFFLE_MERGE overrides the planner's broadcast choice") {
    val p = plan("q_sql_hint")
    assert(p.contains("SortMergeJoin"),
      "hint should force a sort-merge join over the default broadcast")
  }

  test("sql window: the aggregate is partial before the shuffle") {
    val p = plan("q_sql_window")
    // two-phase agg: partial_count on the map side
    assert(p.contains("partial_count") || p.contains("partial"),
      "window aggregate should map-side combine")
  }

  test("stats witness: CBO + ANALYZE flips the join order") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import streamline.batch.{SkewJoin, SqlApi}
    SqlApi.statsTables(spark, sfDir)

    // innermost join = the first one executed in the left-deep tree;
    // identify its inputs by which tables' columns they carry
    def innermostJoinTables(plan: LogicalPlan): Set[String] = {
      val joins = plan.collect { case j: Join => j }
      val inner = joins.filter(_.children.forall(
        _.collect { case j: Join => j }.isEmpty))
      inner.flatMap(_.output.map(_.name)).collect {
        case n if n.startsWith("l_") => "lineitem"
        case n if n.startsWith("o_") => "orders"
        case n if n.startsWith("c_") => "customer"
      }.toSet
    }

    // textual order, no CBO: lineitem joins orders first
    val off = spark.sql(SqlApi.statsQueryText).queryExecution.optimizedPlan
    assert(innermostJoinTables(off) == Set("lineitem", "orders"),
      s"expected textual left-deep order without CBO:\n$off")

    // with stats + CBO: the 4x-smaller orders x filtered-customer first
    val on = SkewJoin.withConfs(spark, SqlApi.cboConfs) {
      val p = spark.sql(SqlApi.statsQueryText).queryExecution.optimizedPlan
      // row-count stats must actually be present for the reorder
      val rc = spark.table("graft_s_orders")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(rc.exists(_.longValue > 0), s"no rowCount stats: $rc")
      p
    }
    assert(innermostJoinTables(on) == Set("orders", "customer"),
      s"CBO did not reorder the join:\n$on")
  }
}
