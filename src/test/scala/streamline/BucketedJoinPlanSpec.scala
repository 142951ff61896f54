package streamline

import graft.{SparkEntry, SparkSuite}
import streamline.batch.Joins

/** Plan-shape witness for the co-located join: with both sides bucketed
  * 8-ways on the join key, the sort-merge join must read matching
  * buckets directly — no shuffle Exchange under the join on either
  * side. This is the property that makes repeated key-joins free at
  * scale.
  */
class BucketedJoinPlanSpec extends SparkSuite {

  test("bucketed sort-merge join has no shuffle exchange under the join") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    Joins.bucketedTables(spark, sfDir)
    val joined = spark.table("graft_b_orders").hint("merge")
      .join(spark.table("graft_b_customer"), $"o_custkey" === $"c_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(500))
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("bucketed aggregation plans with no exchange at all") {
    val stage = streamline.batch.Aggregates.aggBucketedStage(spark, sfDir)
    val plan = stage.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(500))
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("q_agg_bucketed equals the plain shuffled aggregation result") {
    import org.apache.spark.sql.functions._
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val got = SparkEntry.queries("q_agg_bucketed")(spark, sfDir).collect()
    val plain = Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
      .orderBy($"o_custkey").collect()
    assert(got.toSeq == plain.toSeq)
  }

  test("q_scan_bucket_prune reads a strict subset of buckets and no shuffle below the agg") {
    // the declared query keeps the scan bucketed (the group-by on the
    // bucket key is what makes bucketed reading worthwhile — a bare
    // filter gets "Bucketed: false (disabled by query planner)"), so
    // its plan must BOTH bucket-prune and stay shuffle-free below the
    // aggregate. Loose, case-insensitive pin (r9 ADVICE: exact plan
    // strings are not a stable API).
    val full = graft.SparkEntry.queries("q_scan_bucket_prune")(spark, sfDir)
    val fullPlan = full.queryExecution.executedPlan.toString
    val m = """(?i)SelectedBucketsCount:\s*(\d+)\s*\(?out of\s*(\d+)""".r
      .findFirstMatchIn(fullPlan)
    assert(m.isDefined, fullPlan.take(2000))
    val (k, n) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(k < n && k >= 1, s"buckets $k of $n\n" + fullPlan.take(1000))
    assert(!fullPlan.contains("Exchange hashpartitioning"),
      fullPlan.take(2000))
  }

  test("q_join_bucketed equals the plain shuffled join result") {
    import org.apache.spark.sql.functions._
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val got = SparkEntry.queries("q_join_bucketed")(spark, sfDir).collect()
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(sum($"o_totalprice".cast("decimal(18,4)")).cast("double")
        .as("sum_price"), count(lit(1)).as("n"))
      .orderBy($"c_mktsegment").collect()
    assert(got.toSeq == plain.toSeq)
  }
}
